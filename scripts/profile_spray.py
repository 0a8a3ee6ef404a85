"""Measure splat_spray cost at viewer scale: puff vs gaussian sprites.

Run detached: nohup python scripts/profile_spray.py > /tmp/profile_spray.log 2>&1 &
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

from godotoceanwaves_tpu.models import shading

W, H, P = 640, 360, 32768


def chained(fn, iters=16, repeats=3, warmup=2):
    chk = jax.jit(lambda t: jnp.sum(jnp.abs(t)))
    c = jnp.float32(0.0)
    for _ in range(warmup):
        c = fn(c)
    float(chk(c))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            c = fn(c)
        float(chk(c))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rs = np.random.RandomState(0)
    img = jnp.zeros((H, W, 3))
    pos = jnp.asarray(rs.uniform(-60, 60, (P, 3)).astype(np.float32))
    pos = pos.at[:, 1].set(jnp.abs(pos[:, 1]) * 0.1 + 1.0)
    scale = jnp.asarray(rs.uniform(0.5, 2.5, (P, 3)).astype(np.float32))
    dis = jnp.asarray(rs.uniform(0, 1, P).astype(np.float32))
    cz = jnp.asarray(rs.uniform(0, 1, P).astype(np.float32))
    vis = jnp.asarray(rs.rand(P) < 0.4)

    for sprite in ("gaussian", "puff"):
        @jax.jit
        def go(eps, sprite=sprite):
            out = shading.splat_spray(
                img, pos + eps * 1e-6, scale, dis, vis,
                camera_pos=(0.0, 12.0, 0.0), custom_z=cz, sprite=sprite)
            return jnp.sum(out)

        ms = chained(go)
        print(f"splat {sprite:9s}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
