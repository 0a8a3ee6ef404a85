"""Fan march vs XLA march on the real TPU: ms + image delta.

The polar fan march (geometry._fan_select) replaces per-pixel-per-step map
sampling (~18 ms of the 46 ms native-720p interactive frame) with one fan
table + one profile matmul + a fused VPU compare + an 8-sub-sample fine
re-test. CPU parity vs an oversampled reference: viewer pose rms 1.46/255
(xla 1.00), low/silhouette pose 3.73 (xla 12.08!), high 0.66 (xla 0.03).

    nohup python scripts/profile_fan_march.py > /tmp/profile_fan.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from godotoceanwaves_tpu.utils import cache
cache.enable_persistent_cache()

from godotoceanwaves_tpu.models import geometry
from godotoceanwaves_tpu.models.ocean import Ocean
from godotoceanwaves_tpu.models.cascade import default_cascades

CAM = dict(camera_pos=(0.0, 12.0, 0.0), pitch_deg=-12.0)
TIER = dict(march_steps=32, bisect_steps=6, shade_res=2,
            bracket_res=128, invert_res=256)


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

    for (w, h) in ((640, 360), (1280, 720)):
        ref = None
        for lbl, over in (("xla", dict(march_impl="xla")),
                          ("fan tau320", dict(march_impl="fan")),
                          ("fan tau512", dict(march_impl="fan",
                                              fan_tau=512)),
                          ("fan rows4", dict(march_impl="fan",
                                             fan_rows=4))):
            kw = dict(TIER)
            kw.update(over)

            @jax.jit
            def frame(eps, w=w, h=h, kw=kw):
                cam = cam0 + eps * 1e-6
                img = geometry.render_ocean_geometry(
                    maps, scales, quality="high", width=w, height=h,
                    camera_pos=cam, pitch_deg=CAM["pitch_deg"],
                    environment=True, **kw)
                return jnp.sum(img)

            @jax.jit
            def image(w=w, h=h, kw=kw):
                return geometry.render_ocean_geometry(
                    maps, scales, quality="high", width=w, height=h,
                    camera_pos=cam0, pitch_deg=CAM["pitch_deg"],
                    environment=True, **kw)

            ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
            img = np.asarray(image())
            if ref is None:
                ref = img
                q = "  (xla ref)"
            else:
                rms = float(np.sqrt(((img - ref) ** 2).mean())) * 255
                mx = float(np.abs(img - ref).max()) * 255
                q = f"  rms={rms:6.2f}/255 max={mx:6.1f}"
            print(f"{w:4d}x{h:<4d} {lbl:11s}: {ms:7.2f} ms "
                  f"({1e3 / ms:6.1f} fps){q}", flush=True)


if __name__ == "__main__":
    main()
