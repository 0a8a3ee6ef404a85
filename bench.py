"""Benchmark: the BASELINE.md north-star config on real hardware.

Config 4 (BASELINE.json): 4-cascade 1024^2 spectrum->IFFT->maps update,
time-batched frames via lax.scan, bf16 map outputs + fp32 FFT core.
Target: < 1 ms/frame per TPU core. vs_baseline = target_ms / measured_ms
(>1 means beating the target; the reference publishes no numbers of its own,
BASELINE.json:13).

Prints ONE JSON line. Extra detail goes to stderr.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
from godotoceanwaves_tpu.models.cascade import CascadeParams
from godotoceanwaves_tpu.models.ocean import step_impl

TARGET_MS = 1.0
SCAN_LEN = 20
REPS = 10


def four_cascades() -> CascadeParams:
    base = default_cascades()
    return jax.tree.map(lambda x: jnp.concatenate([x, x[:1]]), base)


def main() -> None:
    config = SimConfig(map_size=1024, map_dtype="bfloat16")
    params = four_cascades()
    state = init_state(config, params)

    @functools.partial(jax.jit, static_argnums=(), donate_argnums=0)
    def rollout(state, params, dt):
        """SCAN_LEN frames in one dispatch; maps checksummed per frame so every
        map is fully materialized (nothing is dead-code-eliminated)."""
        def body(carry, _):
            new_state, maps = step_impl(config, carry, params, dt)
            check = (jnp.sum(jnp.abs(maps.displacement.astype(jnp.float32)))
                     + jnp.sum(jnp.abs(maps.normal.astype(jnp.float32))))
            return new_state, check
        return jax.lax.scan(body, state, None, length=SCAN_LEN)

    dt = jnp.float32(0.02)
    state, checks = rollout(state, params, dt)  # compile + warm up
    float(checks[-1])  # value fetch — block_until_ready alone does not
                       # synchronize on the tunneled axon backend

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, checks = rollout(state, params, dt)
        float(checks[-1])  # forces completion of the whole chained rollout
        times.append((time.perf_counter() - t0) / SCAN_LEN * 1e3)
    times.sort()
    ms = times[len(times) // 2]  # median

    print(
        f"backend={jax.default_backend()} device={jax.devices()[0].device_kind} "
        f"fft={config.resolved_fft_impl()} frames={SCAN_LEN}x{REPS} "
        f"min={times[0]:.3f}ms max={times[-1]:.3f}ms checksum={float(checks[-1]):.4e}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "4-cascade 1024^2 spectrum+IFFT+maps update (bf16 maps, fp32 FFT core)",
        "value": round(ms, 4),
        "unit": "ms/frame",
        "vs_baseline": round(TARGET_MS / ms, 4),
    }))


if __name__ == "__main__":
    main()
