"""Does fusing sim+spray+render into ONE dispatch beat the viewer's 3?

The viewer sim loop issues three jitted dispatches per frame (ocean step,
spray step, scene render) and one synchronized uint8 frame fetch. Each
device interaction through the relay carries fixed overhead (docs/PERF.md
"viewer loop"); this measures the steady-state frame wall time of the
current shape vs a single fused dispatch.

    nohup python scripts/profile_viewer_fused.py > /tmp/profile_fused.log 2>&1 &
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from godotoceanwaves_tpu.utils import cache
cache.enable_persistent_cache()

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
from godotoceanwaves_tpu.models.ocean import step
from godotoceanwaves_tpu.models import spray
from godotoceanwaves_tpu.models.viewport import SceneRenderer

W, H = 640, 360
N_FRAMES = 30


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SimConfig(map_size=1024, map_dtype="bfloat16")
    params = default_cascades()
    state = init_state(cfg, params)
    scales = params.map_scales()
    wc = jnp.asarray([0.1, 0.15, 0.18], jnp.float32)
    fc = jnp.asarray([0.73, 0.67, 0.62], jnp.float32)
    pos = jnp.asarray([0.0, 12.0, 0.0], jnp.float32)
    pitch, yaw = jnp.float32(-12.0), jnp.float32(0.0)
    dt = jnp.float32(1 / 30)

    sp = spray.SprayParams()
    sstate = spray.spray_init(sp)
    spray_step = jax.jit(functools.partial(spray.spray_step, sp))
    viewport = SceneRenderer(W, H, mesh_quality="high",
                             march_steps=24, bisect_steps=6)

    # --- A: the viewer's shape (3 dispatches + frame fetch) ---------------
    def frame3(state, sstate, clock):
        state, maps = step(cfg, state, params, dt)
        sstate, attrs = spray_step(sstate, maps, scales, clock)
        img = viewport.render(maps, scales, wc, fc, pos, pitch, yaw,
                              spray_attrs=attrs)
        return state, sstate, np.asarray(img)

    clock = jnp.float32(0.0)
    state3, sstate3 = state, sstate
    for _ in range(3):   # warm
        state3, sstate3, f = frame3(state3, sstate3, clock)
        clock = clock + dt
    t0 = time.perf_counter()
    for _ in range(N_FRAMES):
        state3, sstate3, f = frame3(state3, sstate3, clock)
        clock = clock + dt
    ms3 = (time.perf_counter() - t0) / N_FRAMES * 1e3
    print(f"A 3-dispatch loop: {ms3:8.1f} ms/frame", flush=True)

    # --- B: ONE fused dispatch + frame fetch ------------------------------
    @jax.jit
    def fused(state, sstate, clock):
        state, maps = step(cfg, state, params, dt)
        sstate, attrs = spray_step(sstate, maps, scales, clock)
        img = viewport._render_spray(maps, scales, wc, fc, pos, pitch, yaw,
                                     attrs)
        return state, sstate, img

    # fresh states: leg A's first step donated the originals
    stateF = init_state(cfg, params)
    sstateF = spray.spray_init(sp)
    clock = jnp.float32(0.0)
    for _ in range(3):
        stateF, sstateF, img = fused(stateF, sstateF, clock)
        f = np.asarray(img)
        clock = clock + dt
    t0 = time.perf_counter()
    for _ in range(N_FRAMES):
        stateF, sstateF, img = fused(stateF, sstateF, clock)
        f = np.asarray(img)
        clock = clock + dt
    msF = (time.perf_counter() - t0) / N_FRAMES * 1e3
    print(f"B fused dispatch:  {msF:8.1f} ms/frame", flush=True)

    # --- A again (order-reversal control) ----------------------------------
    t0 = time.perf_counter()
    for _ in range(N_FRAMES):
        state3, sstate3, f = frame3(state3, sstate3, clock)
        clock = clock + dt
    ms3b = (time.perf_counter() - t0) / N_FRAMES * 1e3
    print(f"A again:           {ms3b:8.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
