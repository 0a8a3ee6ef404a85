"""Device profiling helpers (SURVEY.md section 5.1 equivalent).

The reference's only profiling surface is the ImGui FPS overlay; here we
expose `jax.profiler` trace capture (viewable in TensorBoard/Perfetto) plus a
device-honest stage timer built on the chained-fetch protocol.
"""
from __future__ import annotations

import contextlib
import pathlib

import jax

from .timing import time_chained


@contextlib.contextmanager
def trace(logdir: str = "/tmp/godotoceanwaves_trace"):
    """Capture a jax.profiler trace around a block.

    View with: tensorboard --logdir <logdir>  (or load the .pb into Perfetto).
    Note: on remote-tunneled backends device-side events may be missing; host
    timeline and HLO annotations still land.
    """
    pathlib.Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def profile_step(step_fn, carry, iters: int = 32) -> dict[str, float]:
    """Honest per-call timing of a `carry -> carry` step (ms)."""
    ms = time_chained(step_fn, carry, iters=iters)
    return {"ms_per_call": ms, "calls_per_second": 1e3 / ms if ms else 0.0}
