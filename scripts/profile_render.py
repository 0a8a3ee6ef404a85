"""Decompose the geometry-render frame cost on the real TPU.

Chained timings (utils/timing.time_chained protocol): each stage is jitted
standalone with a scalar from the previous iteration folded into the camera
pose, so no overlap/caching can elide device work. Run detached:

    nohup python scripts/profile_render.py > /tmp/profile_render.log 2>&1 &
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

from godotoceanwaves_tpu.models import geometry, shading
from godotoceanwaves_tpu.models.ocean import Ocean
from godotoceanwaves_tpu.models.cascade import SimConfig, default_cascades

W, H = 640, 360
MARCH, BISECT = 24, 6          # the web viewer's tuning (40 samples total)
QUALITY = "high"
URES, MRES = 512, 256


def chained(fn, carry, iters=16, repeats=3, warmup=2):
    chk = jax.jit(lambda t: jnp.sum(jnp.abs(t)))
    for _ in range(warmup):
        carry = fn(carry)
    float(chk(carry[0] if isinstance(carry, tuple) else carry))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry)
        float(chk(carry[0] if isinstance(carry, tuple) else carry))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    ocean = Ocean(default_cascades(), map_size=1024, map_dtype="bfloat16")
    maps = ocean.update(1 / 60)
    scales = ocean.params.map_scales()
    coords = jnp.asarray(geometry.clipmap_axis_coords(QUALITY))

    cam0 = jnp.array([0.0, 12.0, 0.0], jnp.float32)

    # --- stage A: vertex stage (displaced_grid + uniform resample) -------
    @jax.jit
    def stage_a(eps):
        cam = cam0 + eps * 1e-6
        center = jnp.ceil(cam[jnp.array([0, 2])])
        grid = geometry.displaced_grid(maps, scales, coords, center, cam,
                                       sampler="mxu")
        ug = geometry.uniform_from_graded(grid, QUALITY, URES)
        mh = geometry.uniform_from_graded(grid, QUALITY, MRES)[..., 1]
        return jnp.sum(ug) + jnp.sum(mh)

    ms = chained(lambda c: stage_a(c), jnp.float32(0.0))
    print(f"A vertex+resample: {ms:8.2f} ms", flush=True)

    # --- stage B: full render (the viewer's program) ---------------------
    @jax.jit
    def stage_full(eps):
        cam = cam0 + eps * 1e-6
        img = geometry.render_ocean_geometry(
            maps, scales, quality=QUALITY, width=W, height=H,
            camera_pos=cam, march_steps=MARCH, bisect_steps=BISECT,
            uniform_res=URES, march_res=MRES, environment=True,
            sampler="mxu", march_impl="xla")
        return jnp.sum(img)

    ms = chained(lambda c: stage_full(c), jnp.float32(0.0))
    print(f"B full render:     {ms:8.2f} ms", flush=True)

    # --- stage C: march only (bracket + refinement, no shading) ----------
    @jax.jit
    def stage_march(eps):
        cam = cam0 + eps * 1e-6
        center = jnp.ceil(cam[jnp.array([0, 2])])
        grid = geometry.displaced_grid(maps, scales, coords, center, cam,
                                       sampler="mxu")
        mh = geometry.uniform_from_graded(grid, QUALITY, MRES)[..., 1]
        _, _, morigin, mcell = geometry._uniform_resample_tables(QUALITY, MRES)
        d = geometry.camera_rays(W, H, -12.0, 0.0, 70.0)
        t0 = jnp.full(d.shape[:2], 5.0)
        t1 = jnp.full(d.shape[:2], 600.0)
        valid = jnp.ones(d.shape[:2], bool)

        def sample_h(qx, qz):
            return geometry._mxu_sample(mh, morigin, mcell, center, qx, qz)

        lo, hi, found = t0, t1, valid

        def bracket(lo, hi, m, valid):
            seg = (hi - lo) / m
            slices = []
            for idx in range(m):
                t = lo + (idx + 1.0) * seg
                p = cam + t[..., None] * d
                slices.append(p[..., 1] < sample_h(p[..., 0], p[..., 2]))
            below = jnp.stack(slices) & valid[None]
            hit = below.any(axis=0)
            first = jnp.argmax(below, axis=0).astype(jnp.float32)
            t_first = lo + (first + 1.0) * seg
            return hit, jnp.where(hit, t_first - seg, lo), jnp.where(hit, t_first, hi)

        found, lo, hi = bracket(lo, hi, MARCH, valid)
        for _ in range(2):
            _, lo, hi = bracket(lo, hi, 8, found)
        return jnp.sum(0.5 * (lo + hi))

    ms = chained(lambda c: stage_march(c), jnp.float32(0.0))
    print(f"C march+refine:    {ms:8.2f} ms", flush=True)

    # --- stage D: shading (chop inversion + gradient + shade) ------------
    d = geometry.camera_rays(W, H, -12.0, 0.0, 70.0)

    @jax.jit
    def stage_shade(eps):
        cam = cam0 + eps * 1e-6
        center = jnp.ceil(cam[jnp.array([0, 2])])
        grid = geometry.displaced_grid(maps, scales, coords, center, cam,
                                       sampler="mxu")
        ug = geometry.uniform_from_graded(grid, QUALITY, URES)
        _, _, origin, cell = geometry._uniform_resample_tables(QUALITY, URES)
        t = jnp.full(d.shape[:2], 60.0) + eps * 1e-6
        p = cam + t[..., None] * d

        def sample(qx, qz):
            return geometry._mxu_sample(ug, origin, cell, center, qx, qz)

        px, pz = p[..., 0], p[..., 2]
        s = sample(px, pz)
        px = px - (s[..., 0] - p[..., 0])
        pz = pz - (s[..., 2] - p[..., 2])
        s = sample(px, pz)
        uv = jnp.stack([px, pz], axis=-1)
        grad = shading.cascade_gradient(maps.normal, scales, uv, sampler="mxu")
        light = jnp.array([0.3, 0.55, 0.9])
        light = light / jnp.linalg.norm(light)
        rgb = shading.shade(grad, p[..., 1], -d, light, t)
        return jnp.sum(rgb)

    ms = chained(lambda c: stage_shade(c), jnp.float32(0.0))
    print(f"D chop+grad+shade: {ms:8.2f} ms", flush=True)

    # --- stage E: cascade_gradient alone ---------------------------------
    @jax.jit
    def stage_grad(eps):
        uv = jnp.stack([d[..., 0] * 100 + eps * 1e-6, d[..., 2] * 100], axis=-1)
        return jnp.sum(shading.cascade_gradient(maps.normal, scales, uv,
                                                sampler="mxu"))

    ms = chained(lambda c: stage_grad(c), jnp.float32(0.0))
    print(f"E cascade_grad:    {ms:8.2f} ms", flush=True)

    # --- stage F: full render, fused Pallas march ------------------------
    @jax.jit
    def stage_pallas(eps):
        cam = cam0 + eps * 1e-6
        img = geometry.render_ocean_geometry(
            maps, scales, quality=QUALITY, width=W, height=H,
            camera_pos=cam, march_steps=MARCH, bisect_steps=BISECT,
            uniform_res=URES, march_res=MRES, environment=True,
            sampler="mxu", march_impl="pallas")
        return jnp.sum(img)

    ms = chained(lambda c: stage_pallas(c), jnp.float32(0.0))
    print(f"F render (pallas): {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
