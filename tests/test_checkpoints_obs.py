"""Checkpoint policy + observability tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from lyricalignment_tpu.train.checkpoints import (
    BestCheckpointPolicy,
    restore_pytree,
    save_pytree,
)
from lyricalignment_tpu.utils.observability import MetricLogger, trace


def small_tree(x=1.0):
    return {"a": jnp.full((3,), x), "b": {"c": jnp.full((2, 2), x * 2)}}


def test_save_restore_roundtrip(tmp_path):
    tree = small_tree(3.5)
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    restored = restore_pytree(path)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_allclose(np.asarray(restored["b"]["c"]), np.asarray(tree["b"]["c"]))


def test_best_policy_criteria(tmp_path):
    init = {"total": 10.0, "align_ce": 4.0, "align_ctc": 2.0,
            "trans_ce": 4.0, "trans_ctc": 0.0}
    policy = BestCheckpointPolicy(str(tmp_path), init)

    # improves only align
    saved = policy.update(
        {"total": 11.0, "align_ce": 3.0, "align_ctc": 2.0,
         "trans_ce": 6.0, "trans_ctc": 0.0},
        small_tree(1.0), step=1)
    assert saved == {"best": False, "best_align": True, "best_trans": False}
    policy.close()  # async saves: wait before inspecting the filesystem
    assert os.path.isdir(tmp_path / "best_align_model")
    assert os.path.isdir(tmp_path / "last_model")
    assert not os.path.isdir(tmp_path / "best_model")

    # improves total and trans
    saved = policy.update(
        {"total": 9.0, "align_ce": 5.0, "align_ctc": 2.0,
         "trans_ce": 3.0, "trans_ctc": 0.0},
        small_tree(2.0), step=2)
    assert saved["best"] and saved["best_trans"] and not saved["best_align"]

    # last_model always refreshed with the newest tree
    policy.close()
    last = restore_pytree(str(tmp_path / "last_model"))
    np.testing.assert_allclose(np.asarray(last["a"]), 2.0)


def test_save_all_checkpoints(tmp_path):
    init = {"total": 1.0, "align_ce": 1.0, "align_ctc": 0.0,
            "trans_ce": 1.0, "trans_ctc": 0.0}
    policy = BestCheckpointPolicy(str(tmp_path), init)
    policy.update(init, small_tree(), step=7, save_all=True)
    policy.close()
    assert os.path.isdir(tmp_path / "step7")


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path))
    logger.log(1, {"loss": 2.5})
    logger.log(2, {"loss": 2.0, "lr": 1e-3})
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 2.5
    assert lines[1]["lr"] == 1e-3
    assert "wall_s" in lines[1]


def test_trace_annotation_noop():
    with trace("phase"):
        x = 1 + 1
    assert x == 2


def test_policy_sync_mode(tmp_path):
    init = {"total": 1.0, "align_ce": 1.0, "align_ctc": 0.0,
            "trans_ce": 1.0, "trans_ctc": 0.0}
    policy = BestCheckpointPolicy(str(tmp_path), init, use_async=False)
    policy.update(init, small_tree(4.0), step=1)
    # synchronous saves are durable immediately
    last = restore_pytree(str(tmp_path / "last_model"))
    np.testing.assert_allclose(np.asarray(last["a"]), 4.0)
    policy.close()


def test_policy_context_manager_waits(tmp_path):
    init = {"total": 1.0, "align_ce": 1.0, "align_ctc": 0.0,
            "trans_ce": 1.0, "trans_ctc": 0.0}
    with BestCheckpointPolicy(str(tmp_path), init) as policy:
        policy.update(init, small_tree(6.0), step=1)
    last = restore_pytree(str(tmp_path / "last_model"))
    np.testing.assert_allclose(np.asarray(last["a"]), 6.0)
