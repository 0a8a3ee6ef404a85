"""Sweep the surviving render knobs (lod_bias, march_res, march/bisect
steps) on the real TPU, reporting ms/frame AND image deviation vs the
defaults so the speed/quality trade is measured, not guessed.

    nohup python scripts/profile_render_knobs.py > /tmp/render_knobs.log 2>&1 &

Run AFTER any other TPU job finishes (single tunneled chip; the backend
pages HBM to host under memory pressure, so concurrent jobs poison timings).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from godotoceanwaves_tpu.utils import cache
cache.enable_persistent_cache()

from godotoceanwaves_tpu.models import geometry
from godotoceanwaves_tpu.models.ocean import Ocean
from godotoceanwaves_tpu.models.cascade import default_cascades

W, H = 640, 360
CAM, PITCH = (0.0, 12.0, 0.0), -12.0   # web-viewer default pose


def chained(fn, carry, iters=12, repeats=3, warmup=2):
    # fn: scalar -> scalar (chained data dependency forces completion
    # through the relay, where block_until_ready does not).
    chk = jax.jit(lambda t: jnp.abs(t))
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
    cam0 = jnp.array(CAM, jnp.float32)

    # (name, kwargs) — baseline first; deltas are vs its image.
    configs = [
        ("baseline 40/8 mr256 lb1.0", {}),
        ("march 32/6", dict(march_steps=32, bisect_steps=6)),
        ("march 24/6", dict(march_steps=24, bisect_steps=6)),
        ("march 16/5", dict(march_steps=16, bisect_steps=5)),
        ("lod_bias 1.5", dict(lod_bias=1.5)),
        ("lod_bias 2.0", dict(lod_bias=2.0)),
        ("march_res 128", dict(march_res=128)),
        ("ures 256", dict(uniform_res=256)),
        ("combo 24/6 lb1.5 mr128",
         dict(march_steps=24, bisect_steps=6, lod_bias=1.5, march_res=128)),
        ("combo 24/6 lb1.5 mr128 u256",
         dict(march_steps=24, bisect_steps=6, lod_bias=1.5, march_res=128,
              uniform_res=256)),
        ("combo 16/5 lb2.0 mr128 u256",
         dict(march_steps=16, bisect_steps=5, lod_bias=2.0, march_res=128,
              uniform_res=256)),
        # round-4: half-res gradient taps + screen-space upsample (the
        # structural lever — the dominant cost is the per-pixel taps)
        ("shade_res 2", dict(shade_res=2)),
        ("shade_res 2 march 24/6", dict(shade_res=2, march_steps=24,
                                        bisect_steps=6)),
        ("shade_res 2 24/6 mr128", dict(shade_res=2, march_steps=24,
                                        bisect_steps=6, march_res=128)),
        ("shade_res 3 24/6", dict(shade_res=3, march_steps=24,
                                  bisect_steps=6)),
        # round-4: two-level march — bracket on a coarse table, refine on
        # the fine one (march cost is quadratic in table res; landed hit
        # keeps march_res geometry, unlike lowering march_res itself)
        ("bracket 128", dict(bracket_res=128)),
        ("tuned shade2 24/6 br128", dict(shade_res=2, march_steps=24,
                                         bisect_steps=6, bracket_res=128)),
        ("tuned+lb1.5", dict(shade_res=2, march_steps=24, bisect_steps=6,
                             bracket_res=128, lod_bias=1.5)),
        ("tuned br64", dict(shade_res=2, march_steps=24, bisect_steps=6,
                            bracket_res=64)),
        # round-4 second pass: shade_res 3 frontier + cheap coarse brackets
        # (bracket samples cost 1/4 at br128, so march_steps can RISE to
        # buy back silhouette quality while staying under the 16 ms bar)
        ("shade3 24/6 br128", dict(shade_res=3, march_steps=24,
                                   bisect_steps=6, bracket_res=128)),
        ("shade3 32/6 br128", dict(shade_res=3, march_steps=32,
                                   bisect_steps=6, bracket_res=128)),
        ("shade3 40/6 br128", dict(shade_res=3, march_steps=40,
                                   bisect_steps=6, bracket_res=128)),
        # round-4 third pass: 2-channel coarse UV-inversion table
        ("inv256", dict(invert_res=256)),
        ("shade3 32/6 br128 inv256", dict(shade_res=3, march_steps=32,
                                          bisect_steps=6, bracket_res=128,
                                          invert_res=256)),
        ("shade2 32/6 br128 inv256", dict(shade_res=2, march_steps=32,
                                          bisect_steps=6, bracket_res=128,
                                          invert_res=256)),
    ]

    # optional argv[1] substring filter (baseline always runs — it is the
    # quality yardstick); e.g. `... profile_render_knobs.py shade_res`
    if len(sys.argv) > 1:
        pats = sys.argv[1].split(",")
        configs = [configs[0]] + [c for c in configs[1:]
                                  if any(p in c[0] for p in pats)]

    base_img = None
    for name, kw in configs:
        def render(eps, kw=kw):
            # Tiny camera jiggle keeps the chained scalar live without
            # moving the pose (|eps| <= 1 after tanh -> <= 1 um offset).
            img = geometry.render_ocean_geometry(
                maps, scales, quality="high", width=W, height=H,
                camera_pos=cam0 + jnp.tanh(eps) * 1e-6, pitch_deg=PITCH,
                **kw)
            return jnp.clip(img, 0, 1) ** (1 / 2.2) * 255

        # Timed fn: scalar in -> scalar out (advisor round-3 fix: the
        # chained carry must NOT be the (H,W,3) image).
        timed = jax.jit(lambda eps, render=render: jnp.sum(render(eps)) * 1e-9)
        # Quality fn: exact pose (eps=0), full image.
        image = jax.jit(lambda render=render: render(jnp.float32(0.0)))

        ms = chained(timed, jnp.float32(0.0))
        img = np.asarray(image())
        if base_img is None:
            base_img = img
            rms, mx = 0.0, 0.0
        else:
            d = img.astype(np.float32) - base_img.astype(np.float32)
            rms = float(np.sqrt(np.mean(d * d)))
            mx = float(np.abs(d).max())
        print(f"{name:30s} {ms:7.2f} ms  rms={rms:6.2f}/255 max={mx:5.1f}",
              flush=True)


if __name__ == "__main__":
    main()
