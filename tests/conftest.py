"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths
compile and execute without TPU hardware. The axon TPU plugin overrides
JAX_PLATFORMS from the environment, so the platform is forced via
jax.config *before* any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import struct

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(114514)


def forge_wav_bytes(fmt=1, channels=1, sr=16000, bits=16,
                    data=b"\x00\x00" * 64, declared_data_len=None):
    """Hand-assemble a RIFF/WAVE file so every header field can be forged.

    Shared by the loader-level fuzz/hostile-input tests
    (test_native_loader.py) and the serve-level isolation test
    (test_serve.py) so both forge the exact same header layout."""
    block = channels * max(bits // 8, 1)
    fmt_chunk = struct.pack("<HHIIHH", fmt, channels, sr,
                            (sr * block) & 0xFFFFFFFF, block & 0xFFFF, bits)
    dlen = len(data) if declared_data_len is None else declared_data_len
    body = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", dlen) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
