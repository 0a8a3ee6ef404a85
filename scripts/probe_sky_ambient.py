"""Sky-reflection (IBL) term: hardware A/B image pair + render-cost delta.

VERDICT r4 item 1's "done" criterion: a hardware before/after image pair in
docs/ for the reflected-environment term (the engine-side consumer of
water.gdshader:93's per-pixel ROUGHNESS write), plus a regression check that
the term's cost doesn't move the interactive-tier headline (11.80 ms @
640x360 on the v5e, docs/PERF.md).

    nohup python scripts/probe_sky_ambient.py > /tmp/probe_sky.log 2>&1 &
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
    for _ in range(40):                       # develop foam for the A/B
        maps = ocean.update(1 / 30)
    scales = ocean.params.map_scales()
    cam0 = jnp.array(CAM["camera_pos"], jnp.float32)

    # --- A/B image pair at the quality tier, 1280x720 ------------------
    def image(sky: bool):
        fn = jax.jit(lambda: geometry.render_ocean_geometry(
            maps, scales, quality="high", width=1280, height=720,
            camera_pos=cam0, pitch_deg=CAM["pitch_deg"],
            environment=True, sky_ambient=sky))
        return np.asarray(jnp.clip(fn(), 0.0, 1.0))

    on, off = image(True), image(False)
    delta = float(np.abs(on - off).mean()) * 255
    print(f"A/B mean |delta| = {delta:.2f}/255", flush=True)
    try:
        from PIL import Image
        pair = np.concatenate([off, on], axis=1)    # before | after
        img = Image.fromarray((pair * 255).astype(np.uint8))
        out = os.path.join(os.path.dirname(__file__), "..", "docs",
                           "sky_reflection_ab.png")
        img.save(out)
        print("wrote", os.path.abspath(out), flush=True)
    except Exception as e:                     # keep the timings on any PIL issue
        print("PIL save failed:", e, flush=True)

    # --- cost delta at the shipped tiers --------------------------------
    for tier, (w, h) in (("interactive", (640, 360)),
                         ("quality", (1280, 720))):
        kw = dict(RENDER_TIERS[tier])
        for sky in (False, True):
            @jax.jit
            def frame(eps, w=w, h=h, kw=kw, sky=sky):
                cam = cam0 + eps * 1e-6
                img = geometry.render_ocean_geometry(
                    maps, scales, quality="high", width=w, height=h,
                    camera_pos=cam, pitch_deg=CAM["pitch_deg"],
                    environment=True, sky_ambient=sky, **kw)
                return jnp.sum(img)

            ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
            print(f"{tier:12s} {w:4d}x{h:<4d} sky={int(sky)}: {ms:7.2f} ms"
                  f" ({1e3 / ms:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
