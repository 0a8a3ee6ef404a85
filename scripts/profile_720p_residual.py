"""Cumulative-stage decomposition of the native-720p interactive render.

The round-5 knob ablation (scripts/profile_720p_native.py) fit the
shade_res sweep to taps ~11.3 ms + residual R ~15.5 ms — and R is now the
binding constraint on the <=16 ms stretch bar. This probe prices R's
pieces honestly IN PROGRAM CONTEXT via `render_ocean_geometry`'s
`_debug_stage` early returns: XLA dead-code-eliminates everything after
the returned stage, so each leg measures the cumulative prefix cost
(stage deltas = successive differences; fusion across stage boundaries is
attributed to the later stage, the same convention as the knob fit).

    nohup python scripts/profile_720p_residual.py > /tmp/profile_residual.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from godotoceanwaves_tpu.utils import cache
cache.enable_persistent_cache()

from godotoceanwaves_tpu.models import geometry
from godotoceanwaves_tpu.models.ocean import Ocean
from godotoceanwaves_tpu.models.cascade import default_cascades

W, H = 1280, 720
CAM = dict(camera_pos=(0.0, 12.0, 0.0), pitch_deg=-12.0)
BASE = dict(march_steps=32, bisect_steps=6, shade_res=2,
            bracket_res=128, invert_res=256)          # interactive tier


def chained(fn, carry, iters=12, repeats=3, warmup=2):
    chk = jax.jit(lambda t: jnp.sum(jnp.abs(t)))
    for _ in range(warmup):
        carry = fn(carry)
    float(chk(carry))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry)
        float(chk(carry))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    ocean = Ocean(default_cascades(), map_size=1024, map_dtype="bfloat16")
    maps = ocean.update(1 / 60)
    scales = ocean.params.map_scales()
    cam0 = jnp.array(CAM["camera_pos"], jnp.float32)

    stages = [("march", "rays + fan march + fine re-test"),
              ("uv", "+ fragment-UV chop inversion"),
              ("grad", "+ gradient taps (shade_res=2) + lift"),
              (None, "+ shade/BSDF/sky + env post (FULL)")]

    prev = 0.0
    for stage, desc in stages:

        @jax.jit
        def frame(eps, stage=stage):
            cam = cam0 + eps * 1e-6
            out = geometry.render_ocean_geometry(
                maps, scales, quality="high", width=W, height=H,
                camera_pos=cam, pitch_deg=CAM["pitch_deg"],
                environment=True, _debug_stage=stage, **BASE)
            return jnp.sum(jnp.abs(out))

        ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
        print(f"{str(stage):6s} {desc:42s}: {ms:7.2f} ms "
              f"(delta {ms - prev:+6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
