"""Tracing, profiling, and structured metric logging.

The reference has no instrumentation beyond tqdm loss postfixes
(SURVEY.md §5). This module is the framework's observability layer:

  * ``trace(name)``       — ``jax.profiler.TraceAnnotation`` context for
    labelling host-side phases inside profiles;
  * ``annotate(fn, name)`` — wraps a function with ``named_scope`` so its
    ops are grouped in XLA profiles;
  * ``profile_session``   — capture a TensorBoard-loadable profile
    (``jax.profiler.start_trace``/``stop_trace``) around a code block;
  * ``MetricLogger``      — structured JSONL metrics (one object per line:
    step, wall time, metrics) with an optional TensorBoard writer
    (``tf.summary``) when TensorFlow is available.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict

import jax


def trace(name: str):
    """Host-side trace annotation (shows up in profiler timelines)."""
    return jax.profiler.TraceAnnotation(name)


def annotate(fn, name: str):
    """Group a function's ops under ``name`` in XLA profiles."""
    def wrapped(*args, **kwargs):
        with jax.named_scope(name):
            return fn(*args, **kwargs)
    return wrapped


@contextlib.contextmanager
def profile_session(log_dir: str):
    """Capture a device profile into ``log_dir`` (view with TensorBoard)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricLogger:
    """JSONL metrics + optional TensorBoard scalars.

    Each ``log(step, metrics)`` appends one line to ``metrics.jsonl``:
    ``{"step": N, "time": unix_ts, "wall_s": since-start, ...metrics}``.
    """

    def __init__(self, log_dir: str, tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self.path, "a", encoding="utf-8")
        self._t0 = time.time()
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb"))
            except ImportError:
                pass

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": int(step), "time": time.time(),
               "wall_s": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(row) + "\n")
        self._file.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))
                self._tb.flush()

    def close(self) -> None:
        self._file.close()
