"""Specular AA on the real TPU: cost + does it shrink the render_scale gap?

Two questions (docs/PERF.md "catrom lift verdict" named specular
supersampling-class internal-render changes as the only real fix for the
~95/255 scale-vs-native glint outliers):
  1. what does shade(specular_aa=True) cost at the shipped tiers?
  2. with AA on BOTH the native and the scaled render, do the scaled
     render's rms/max vs native drop (the sparkles were the outliers)?

    nohup python scripts/probe_specular_aa.py > /tmp/probe_spec_aa.log 2>&1 &
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
    for _ in range(40):
        maps = ocean.update(1 / 50)
    scales = ocean.params.map_scales()
    cam0 = jnp.array([0.0, 12.0, 0.0], jnp.float32)

    def image(w, h, aa, scale=1):
        kw = dict(TIER)
        if scale > 1:
            kw["render_scale"] = scale
        return jax.jit(lambda: geometry.render_ocean_geometry(
            maps, scales, quality="high", width=w, height=h,
            camera_pos=cam0, pitch_deg=-12.0, environment=True,
            specular_aa=aa, **kw))()

    # 1. cost at the shipped sizes
    for (w, h) in ((640, 360), (1280, 720)):
        for aa in (False, True):
            @jax.jit
            def frame(eps, w=w, h=h, aa=aa):
                img = geometry.render_ocean_geometry(
                    maps, scales, quality="high", width=w, height=h,
                    camera_pos=cam0 + eps * 1e-6, pitch_deg=-12.0,
                    environment=True, specular_aa=aa, **TIER)
                return jnp.sum(img)
            ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
            print(f"{w:4d}x{h} specular_aa={aa!s:5s}: {ms:7.2f} ms "
                  f"({1e3 / ms:6.1f} fps)", flush=True)

    # 2. scale2-vs-native delta, AA off vs AA on (both legs share the AA
    # setting: the question is whether the DISAGREEMENT shrinks)
    for aa in (False, True):
        native = image(1280, 720, aa).astype(jnp.float32)
        scaled = image(1280, 720, aa, scale=2).astype(jnp.float32)
        d = jnp.abs(native - scaled)
        rms = float(jnp.sqrt(jnp.mean(d * d))) * 255.0
        mx = float(jnp.max(d)) * 255.0
        print(f"720p scale2 vs native, specular_aa={aa!s:5s}: "
              f"rms {rms:.2f}/255 max {mx:.1f}", flush=True)
    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
