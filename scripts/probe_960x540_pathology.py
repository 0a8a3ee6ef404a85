"""Root-cause probe: does the (960, ~540) shape pathology live in the march?

Round-4 measured 960x540 interactive at ~48 ms vs ~24-28 for every aligned
neighbor and steered render_scale away from it (docs/PERF.md round-4 shape
isolation). Round-5's fan march replaces the xla march program entirely; if
the pathology disappears under march_impl="fan" and reproduces under "xla",
the trigger was the decimated-tap MARCH program and the tripwire can be
narrowed to the xla path (VERDICT r4 weak #2).

    nohup python scripts/probe_960x540_pathology.py > /tmp/probe_960.log 2>&1 &
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
    import warnings
    warnings.filterwarnings("ignore", category=RuntimeWarning)
    ocean = Ocean(default_cascades(), map_size=1024, map_dtype="bfloat16")
    maps = ocean.update(1 / 60)
    scales = ocean.params.map_scales()
    cam0 = jnp.array([0.0, 12.0, 0.0], jnp.float32)

    for (w, h) in ((960, 540), (1024, 540), (896, 540)):
        for impl in ("fan", "xla"):

            @jax.jit
            def frame(eps, w=w, h=h, impl=impl):
                cam = cam0 + eps * 1e-6
                img = geometry.render_ocean_geometry(
                    maps, scales, quality="high", width=w, height=h,
                    camera_pos=cam, pitch_deg=-12.0, environment=True,
                    march_impl=impl, **TIER)
                return jnp.sum(img)

            ms = chained(lambda c, f=frame: f(c), jnp.float32(0.0))
            print(f"{w:4d}x{h} {impl:4s}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
