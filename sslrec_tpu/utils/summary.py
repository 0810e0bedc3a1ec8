"""Scalar summary writing + profiling hooks.

Analog of the reference's optional TensorBoard writer and
``DisabledSummaryWriter`` no-op (``trainer/utils.py:3-9``,
``trainer/trainer.py:20-23``): a tiny CSV-backed scalar writer (TensorBoard is
not a dependency of this image) that is inert unless ``train.tensorboard`` is
set, plus a ``profile`` context manager wrapping ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import os
import time


class ScalarWriter:
    """Append-only ``tag,step,value,wall_time`` CSV per run."""

    def __init__(self, log_dir: str = "runs"):
        os.makedirs(log_dir, exist_ok=True)
        ts = time.strftime("%Y%m%d-%H%M%S")
        self._path = os.path.join(log_dir, f"scalars_{ts}.csv")
        self._f = open(self._path, "a")
        self._f.write("tag,step,value,wall_time\n")

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(f"{tag},{step},{float(value)},{time.time()}\n")
        self._f.flush()

    def close(self):
        self._f.close()


class DisabledScalarWriter:
    """No-op writer (parity with ``DisabledSummaryWriter``)."""

    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass


def make_writer(cfg):
    if cfg.train.get("tensorboard", False):
        return ScalarWriter()
    return DisabledScalarWriter()


@contextlib.contextmanager
def profile(trace_dir: str | None = None):
    """Capture a jax profiler trace around a block (view with TensorBoard or
    xprof elsewhere); no-op when ``trace_dir`` is None."""
    if trace_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
