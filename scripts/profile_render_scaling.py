"""Tuned-render resolution scaling on one chip: 640x360 / 960x540 / 1280x720.

The fixed stages (vertex resample, tables, LOD pyramid) are resolution-
independent, so per-pixel cost should amortize sub-linearly; together with
scripts/profile_render_projection.py (row-sharded multi-chip bound) this
gives the "what resolution at 60 fps on D chips" table docs/PERF.md records.

    nohup python scripts/profile_render_scaling.py > /tmp/render_scaling.log 2>&1 &
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

CAM, PITCH = (0.0, 12.0, 0.0), -12.0
# the shipped interactive defaults (round-4 sweep, docs/PERF.md)
KW = dict(march_steps=32, bisect_steps=6, shade_res=2, bracket_res=128,
          invert_res=256, environment=True, sampler="mxu")


def chained(fn, iters=12, repeats=3, warmup=2):
    carry = jnp.float32(0.0)
    for _ in range(warmup):
        carry = fn(carry)
    float(carry)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry)
        float(carry)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    ocean = Ocean(default_cascades(), map_size=1024, map_dtype="bfloat16")
    maps = ocean.update(1 / 60)
    scales = ocean.params.map_scales()
    cam0 = jnp.array(CAM, jnp.float32)

    base_px = 640 * 360
    for w, h in ((640, 360), (960, 540), (1280, 720)):
        @jax.jit
        def frame(eps, w=w, h=h):
            img = geometry.render_ocean_geometry(
                maps, scales, quality="high", width=w, height=h,
                camera_pos=cam0 + jnp.tanh(eps) * 1e-6, pitch_deg=PITCH,
                **KW)
            return jnp.sum(img) * 1e-9

        ms = chained(frame)
        px = w * h / base_px
        print(f"{w}x{h}: {ms:6.2f} ms ({1e3 / ms:5.1f} fps) "
              f"[{px:.2f}x pixels]", flush=True)


if __name__ == "__main__":
    main()
