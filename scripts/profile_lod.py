"""A/B the screen-space gradient LOD on the real TPU.

Chained timings (same protocol as profile_render.py). Run detached:

    nohup python scripts/profile_lod.py > /tmp/profile_lod.log 2>&1 &
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
MARCH, BISECT = 24, 6
QUALITY = "high"
URES, MRES = 512, 256


def chained(fn, carry, iters=16, repeats=3, warmup=2):
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

    # viewer default camera (12 m up, pitch -12: horizon in frame) and the
    # showcase low camera (2.5 m up, pitch -4: far field dominates)
    cams = [("viewer  (y=12, p=-12)", (0.0, 12.0, 0.0), -12.0),
            ("lowcam  (y=2.5, p=-4)", (0.0, 2.5, 0.0), -4.0)]

    for name, pos, pitch in cams:
        cam0 = jnp.array(pos, jnp.float32)
        for lod in (False, True):
            @jax.jit
            def frame(eps, lod=lod, pitch=pitch):
                cam = cam0 + eps * 1e-6
                img = geometry.render_ocean_geometry(
                    maps, scales, quality=QUALITY, width=W, height=H,
                    camera_pos=cam, pitch_deg=pitch,
                    march_steps=MARCH, bisect_steps=BISECT,
                    uniform_res=URES, march_res=MRES, environment=True,
                    sampler="mxu", march_impl="xla", gradient_lod=lod)
                return jnp.sum(img)

            ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
            print(f"{name} lod={int(lod)}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
