"""Multi-chip render projection measured on ONE chip.

parallel.render_geometry_sharded shards pixel rows over the mesh with ZERO
cross-device traffic: each device runs render_ocean_geometry(rows=(off, h/D))
on replicated maps. So a D-chip frame time is (to ICI-assembly epsilon) the
MAX of the D band times — measurable honestly on the single tunneled chip by
timing each band's jitted window render. Prints per-band times and the
projected D-chip frame for D in {2, 4, 8}.

    nohup python scripts/profile_render_projection.py > /tmp/render_proj.log 2>&1 &
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

W, H = 640, 360
if len(sys.argv) > 1:          # e.g. `... profile_render_projection.py 1280x720`
    W, H = (int(v) for v in sys.argv[1].split("x"))
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
    print("backend:", jax.default_backend(), f"frame {W}x{H}", flush=True)
    ocean = Ocean(default_cascades(), map_size=1024, map_dtype="bfloat16")
    maps = ocean.update(1 / 60)
    scales = ocean.params.map_scales()
    cam0 = jnp.array(CAM, jnp.float32)

    for d_chips in (2, 4, 8):
        band_h = H // d_chips
        band_ms = []
        for b in range(d_chips):
            @jax.jit
            def frame(eps, off=b * band_h):
                img = geometry.render_ocean_geometry(
                    maps, scales, quality="high", width=W, height=H,
                    camera_pos=cam0 + jnp.tanh(eps) * 1e-6, pitch_deg=PITCH,
                    rows=(off, band_h), **KW)
                return jnp.sum(img) * 1e-9

            band_ms.append(chained(frame))
        worst = max(band_ms)
        bands = " ".join(f"{m:6.2f}" for m in band_ms)
        print(f"D={d_chips}: bands[ms] = {bands}  -> projected frame "
              f"{worst:6.2f} ms ({1e3 / worst:5.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
