"""Fused Pallas gradient taps on the real TPU: 720p/360p interactive A/B.

tap_impl="pallas" (ops/pallas_tap.fused_tap) holds the weight matrices
and the (P, 3, n) rows intermediate in VMEM instead of HBM — the round-3
measurement put the unfused einsum taps ~5x over their bandwidth bound.

    nohup python scripts/profile_pallas_tap.py > /tmp/profile_tap.log 2>&1 &
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
    cam0 = jnp.array([0.0, 12.0, 0.0], jnp.float32)

    impls = tuple(sys.argv[1:]) or ("einsum", "pallas")
    first = None
    for (w, h) in ((1280, 720), (640, 360)):
        for impl in impls:
            @jax.jit
            def frame(eps, w=w, h=h, impl=impl):
                cam = cam0 + eps * 1e-6
                img = geometry.render_ocean_geometry(
                    maps, scales, quality="high", width=w, height=h,
                    camera_pos=cam, pitch_deg=-12.0, environment=True,
                    tap_impl=impl, **TIER)
                return jnp.sum(img)

            ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
            print(f"{w:4d}x{h} tap={impl:6s}: {ms:7.2f} ms "
                  f"({1e3 / ms:6.1f} fps)", flush=True)
            # cross-impl image check at 720p (first size only)
            if w == 1280 and len(impls) > 1:
                img = jax.jit(lambda impl=impl, w=w, h=h:
                              geometry.render_ocean_geometry(
                                  maps, scales, quality="high", width=w,
                                  height=h, camera_pos=cam0,
                                  pitch_deg=-12.0, environment=True,
                                  tap_impl=impl, **TIER))()
                if first is None:
                    first = img
                else:
                    d = jnp.abs(img - first) * 255.0
                    print(f"  image delta vs einsum: rms "
                          f"{float(jnp.sqrt(jnp.mean(d * d))):.3f}/255 "
                          f"max {float(jnp.max(d)):.1f}", flush=True)


if __name__ == "__main__":
    main()
