"""Trustworthy kernel timing on backends with unreliable synchronization.

On the tunneled axon TPU backend, `block_until_ready` returns before device
execution completes, so naive dispatch-loop timing reads ~0. The honest
protocol: CHAIN iterations (each step consumes the previous result, so no
caching/overlap can elide work) and force a host fetch of a derived scalar at
the end; amortize the fixed tunnel latency over enough iterations.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _checksum(tree) -> jax.Array:
    leaves = [jnp.sum(jnp.abs(jnp.real(x.astype(jnp.float32))))
              if jnp.iscomplexobj(x) else jnp.sum(jnp.abs(x.astype(jnp.float32)))
              for x in jax.tree.leaves(tree)]
    return sum(leaves[1:], leaves[0])


def time_chained(step: Callable, carry, iters: int = 64, warmup: int = 2,
                 repeats: int = 3) -> float:
    """ms per call of `step(carry) -> carry` (same pytree structure).

    Chains `iters` calls, then fetches a scalar checksum of the final carry to
    force completion. Returns the best of `repeats` runs.
    """
    chk = jax.jit(_checksum)
    for _ in range(warmup):
        carry = step(carry)
    float(chk(carry))
    best = float("inf")
    # each batch CONTINUES from the last carry: resetting to an earlier carry
    # would hand donated (deleted) buffers back to a donating step
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(carry)
        float(chk(carry))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best
