"""Sweep render_scale (dynamic resolution) x output size x tier on the TPU.

The question this answers: what does single-chip 720p/1080p cost at the
tuned tiers, and what does `render_scale` buy (ms + quality delta vs the
native-resolution render of the same tier)?

    nohup python scripts/profile_render_scale.py > /tmp/profile_rscale.log 2>&1 &
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
from godotoceanwaves_tpu.models.viewport import RENDER_TIERS

CAM = dict(camera_pos=(0.0, 12.0, 0.0), pitch_deg=-12.0)
SIZES = [(640, 360), (1280, 720), (1920, 1080)]
SCALES = [1, 2, 3]
LIFTS = ["linear", "catrom"]      # round-5: catrom + anti-ringing clamp


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

    for tier in ("interactive", "performance"):
        kw = RENDER_TIERS[tier]
        for (w, h) in SIZES:
            native = None
            for s in SCALES:
                if w % s or h % s:
                    continue
                for lift in (LIFTS if s > 1 else ["linear"]):

                    @jax.jit
                    def frame(eps, w=w, h=h, s=s, kw=kw, lift=lift):
                        cam = cam0 + eps * 1e-6
                        img = geometry.render_ocean_geometry(
                            maps, scales, quality="high", width=w, height=h,
                            camera_pos=cam, pitch_deg=CAM["pitch_deg"],
                            environment=True, render_scale=s, lift=lift,
                            **kw)
                        return jnp.sum(img)

                    @jax.jit
                    def image(w=w, h=h, s=s, kw=kw, lift=lift):
                        return geometry.render_ocean_geometry(
                            maps, scales, quality="high", width=w, height=h,
                            camera_pos=cam0, pitch_deg=CAM["pitch_deg"],
                            environment=True, render_scale=s, lift=lift,
                            **kw)

                    ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
                    img = np.asarray(image())
                    if s == 1:
                        native = img
                        q = "  (native ref)"
                    else:
                        rms = float(np.sqrt(
                            ((img - native) ** 2).mean())) * 255
                        mx = float(np.abs(img - native).max()) * 255
                        q = f"  rms={rms:6.2f}/255 max={mx:6.1f}/255"
                    print(f"{tier:12s} {w:4d}x{h:<4d} scale={s} "
                          f"{lift:6s}: {ms:8.2f} ms"
                          f" ({1e3 / ms:6.1f} fps){q}", flush=True)


if __name__ == "__main__":
    main()
