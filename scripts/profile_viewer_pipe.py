"""Viewer loop leg C: pipelined frame fetch (overlap transfer with compute).

Dispatch frame N+1 BEFORE fetching frame N's bytes, so the ~0.7 MB uint8
device->host transfer (relay: ~5-10 MB/s) overlaps the next frame's device
compute. Also measures the fetch alone.

    nohup python scripts/profile_viewer_pipe.py > /tmp/profile_pipe.log 2>&1 &
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

    def dispatch(state, sstate, clock):
        state, maps = step(cfg, state, params, dt)
        sstate, attrs = spray_step(sstate, maps, scales, clock)
        img = viewport.render(maps, scales, wc, fc, pos, pitch, yaw,
                              spray_attrs=attrs)
        return state, sstate, img

    # warm
    clock = jnp.float32(0.0)
    for _ in range(3):
        state, sstate, img = dispatch(state, sstate, clock)
        f = np.asarray(img)
        clock = clock + dt

    # --- C: pipelined fetch ------------------------------------------------
    state, sstate, pending = dispatch(state, sstate, clock)
    t0 = time.perf_counter()
    for _ in range(N_FRAMES):
        clock = clock + dt
        state, sstate, img = dispatch(state, sstate, clock)  # dispatch N+1
        f = np.asarray(pending)                              # fetch N
        pending = img
    msC = (time.perf_counter() - t0) / N_FRAMES * 1e3
    print(f"C pipelined fetch: {msC:8.1f} ms/frame", flush=True)

    # --- D: fetch alone (same frame re-fetched; measures transfer) ---------
    f = np.asarray(pending)
    t0 = time.perf_counter()
    for _ in range(10):
        f = np.asarray(pending)
    msD = (time.perf_counter() - t0) / 10 * 1e3
    print(f"D fetch alone:     {msD:8.1f} ms "
          f"({pending.nbytes / 1e6:.2f} MB)", flush=True)

    # --- E: compute alone (chained, scalar sync — no frame transfer) -------
    chk = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    float(chk(pending))
    t0 = time.perf_counter()
    for _ in range(N_FRAMES):
        clock = clock + dt
        state, sstate, img = dispatch(state, sstate, clock)
    float(chk(img))
    msE = (time.perf_counter() - t0) / N_FRAMES * 1e3
    print(f"E compute alone:   {msE:8.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
