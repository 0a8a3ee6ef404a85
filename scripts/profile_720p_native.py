"""Knob-ablation decomposition of NATIVE 1280x720 interactive render cost.

VERDICT r4 item 2 prerequisite: before building the next structural lever
(fused gradient-tap kernel / footprint-cropped taps), measure where the
45.5 ms actually goes at native 720p in the REAL program context (stage
decompositions lie when fusion differs — docs/PERF.md measurement traps).

shade_res sweep fits taps_ms via t(s) = R + T/s^2; march/bracket/invert/env
ablations bound the rest.

    nohup python scripts/profile_720p_native.py > /tmp/profile_720p.log 2>&1 &
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

    variants = [
        ("base (interactive)", {}),
        ("sky_ambient off", dict(sky_ambient=False)),
        ("shade_res 1", dict(shade_res=1)),
        ("shade_res 3", dict(shade_res=3)),
        ("shade_res 4", dict(shade_res=4)),
        ("march 16/4", dict(march_steps=16, bisect_steps=4)),
        ("bracket off", dict(bracket_res=0)),
        ("invert off", dict(invert_res=0)),
        ("environment off", dict(environment=False)),
        ("gradient_lod off", dict(gradient_lod=False)),
        ("lod_levels 6", dict(lod_levels=6)),
    ]

    results = {}
    for name, over in variants:
        kw = dict(BASE)
        kw.update(over)
        env = kw.pop("environment", True)

        @jax.jit
        def frame(eps, kw=kw, env=env):
            cam = cam0 + eps * 1e-6
            img = geometry.render_ocean_geometry(
                maps, scales, quality="high", width=W, height=H,
                camera_pos=cam, pitch_deg=CAM["pitch_deg"],
                environment=env, **kw)
            return jnp.sum(img)

        ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
        results[name] = ms
        print(f"{name:22s}: {ms:7.2f} ms ({1e3 / ms:6.1f} fps)", flush=True)

    # fit t(s) = R + T/s^2 from shade_res {1, 2, 4}
    if all(k in results for k in ("shade_res 1", "base (interactive)",
                                  "shade_res 4")):
        t1 = results["shade_res 1"]
        t2 = results["base (interactive)"]
        t4 = results["shade_res 4"]
        T = (t1 - t4) / (1 - 1 / 16)
        R = t1 - T
        print(f"\nfit: taps(shade_res=2) ~ {T / 4:.1f} ms, "
              f"residual R ~ {R:.1f} ms  (check t2 pred "
              f"{R + T / 4:.1f} vs measured {t2:.1f})", flush=True)


if __name__ == "__main__":
    main()
