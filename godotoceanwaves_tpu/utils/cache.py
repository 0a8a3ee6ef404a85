"""Persistent XLA compilation cache for the heavyweight entry points.

Keyed on the HLO hash, so code changes invalidate naturally. Measured
effect on this backend (docs/PERF.md):
- small/medium programs and the CPU test suite: large wins (256-squared
  fused-step process: 221 s cold -> 11 s warm);
- big Pallas executables (512+ on the tunneled TPU): a HIT still takes
  minutes — deserialization re-enters the remote compile service, whose
  latency (68-337 s run-to-run for the same program) dominates and is
  outside any local cache's reach.

Library code does NOT enable this implicitly (global config belongs to the
application); bench.py / demo.py / __graft_entry__.py / tests opt in.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable the JAX persistent compilation cache; returns the cache dir.

    Must be called before the first compilation to be effective (any jax
    import is fine). Safe to call more than once.
    """
    import jax

    cache_dir = path or os.environ.get(
        "GODOTOCEANWAVES_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "godotoceanwaves_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        # read-only HOME / odd container: the cache is an optional
        # optimization, never a startup failure
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default threshold (1 s) skips tiny programs; keep everything above 0.5 s
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
