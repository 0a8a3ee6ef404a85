"""Benchmark: the BASELINE.md north-star config on real hardware.

Config 4 (BASELINE.json): 4-cascade 1024^2 spectrum->IFFT->maps update,
bf16 map outputs + fp32 FFT core. Target: < 1 ms/frame per TPU core.
vs_baseline = target_ms / measured_ms (>1 beats the target; the reference
publishes no numbers of its own, BASELINE.json:13).

Protocol: eager per-frame stepping (the production `Ocean.update` pattern)
CHAINED through the foam/time recurrence, with a host value-fetch at the end —
on the tunneled axon backend `block_until_ready` does not synchronize, and
chaining defeats any request caching. (A lax.scan rollout measures ~1 ms/frame
slower due to scan-internal buffer management; see docs/PARITY.md perf notes.)

Prints ONE JSON line. Extra detail goes to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
from godotoceanwaves_tpu.models.cascade import CascadeParams
from godotoceanwaves_tpu.models.ocean import multi_step

TARGET_MS = 1.0
K = 4          # frames per dispatch (multi_step; amortizes tunnel dispatch)
FRAMES = 100
REPS = 4


def four_cascades() -> CascadeParams:
    base = default_cascades()
    return jax.tree.map(lambda x: jnp.concatenate([x, x[:1]]), base)


def main() -> None:
    config = SimConfig(map_size=1024, map_dtype="bfloat16")
    params = four_cascades()
    state = init_state(config, params)
    dt = jnp.float32(0.02)

    # warm up: compile + one batch, then force completion via a value fetch
    state, maps = multi_step(config, state, params, dt, K)
    float(jnp.sum(state.foam[:, 0, :]))

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(FRAMES // K):
            state, maps = multi_step(config, state, params, dt, K)
        checksum = float(jnp.sum(state.foam[:, 0, :])
                         + jnp.sum(maps.displacement[:, :, 0, :].astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / FRAMES * 1e3)
    times.sort()
    ms = times[len(times) // 2]

    print(
        f"backend={jax.default_backend()} device={jax.devices()[0].device_kind} "
        f"fft={config.resolved_fft_impl()} fused={config.use_fused_step()} K={K} "
        f"frames={FRAMES}x{REPS} min={times[0]:.3f}ms max={times[-1]:.3f}ms "
        f"checksum={checksum:.4e}",
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
