"""Fused heightfield ray-march kernel — a MEASURED NEGATIVE RESULT, kept.

`models/geometry.render_ocean_geometry` finds the ray/displaced-surface
intersection by bracket marching a uniform height table with gather-free
hat-weight sampling (bilinear interpolation == 2-sparse weight rows x table,
ridden on the MXU — docs/PERF.md "Geometry render"). This kernel fuses the
ENTIRE march: per pixel tile, the height table stays VMEM-resident and every
sample builds its hat weights in registers (VPU compares), contracts them on
the MXU, and feeds the comparison straight into the bracket bookkeeping —
zero HBM traffic per sample beyond the streamed pixel rays.

Measured on the v5e it LOSES to the staged XLA march (~18 ms vs ~7 ms for
the same 41 samples at 640x360): XLA's batched hat-weight einsums already
run near the MXU roofline here, so there was no HBM bound to remove, and
Mosaic's smaller per-tile matmuls plus ~18 us/program machinery only add
cost. `render_ocean_geometry(march_impl="auto")` therefore always picks the
XLA path; the kernel stays importable (march_impl="pallas") as the
documented dead end, with interpret-mode parity pinned by tests — the
bracket algebra is bit-for-bit the staged path's (first-below-crossing per
round, 8-way subdivision refinements). Details: docs/PERF.md.

Geometry mapping (all folded host-side into per-pixel linear forms):
  table coord fx(t) = ax + t*bx  with ax = (cam_x - center_x - origin)/cell,
                                      bx = dir_x/cell        (same for z)
  below(t)         = cam_y + t*dir_y < h(fx(t), fz(t))
so the kernel needs only 3 scalars (ax, az, cam_y) and 5 per-pixel lanes
(bx, bz, dy, t0, t1) — camera pose rides as traced args, flying never
retraces (the render contract, camera.gd:15-47).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pixels per program: measured ~18 us/program machinery here, and 4096-row
# tiles exceed the scoped-VMEM stack (67 MB) — 2048 balances both. (The
# kernel as a whole is a recorded negative result vs the staged XLA march,
# docs/PERF.md "Geometry render"; it stays runnable for the parity test.)
TILE_P = 2048


def _hat(f: jax.Array, g: int) -> jax.Array:
    """(P, g) bilinear hat weights from (P, 1) table coordinates (fp32)."""
    # int32 iota + cast: Mosaic's tpu.iota is integer-only
    iota = jax.lax.broadcasted_iota(jnp.int32, (f.shape[0], g), 1
                                    ).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(f - iota))


def _march_kernel(scal_ref, bx_ref, bz_ref, dy_ref, t0_ref, t1_ref,
                  valid_ref, table_ref, found_ref, lo_ref, hi_ref,
                  *, march_steps: int, refine_rounds: int, g: int):
    ax = scal_ref[0, 0]
    az = scal_ref[0, 1]
    cy = scal_ref[0, 2]
    bx = bx_ref[...]
    bz = bz_ref[...]
    dy = dy_ref[...]
    tb = table_ref[...]
    hi_cap = jnp.float32(g) - 1.001

    def below(t):
        fx = jnp.clip(ax + t * bx, 0.0, hi_cap)
        fz = jnp.clip(az + t * bz, 0.0, hi_cap)
        wz = _hat(fz, g).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            wz, tb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (P, g)
        h = jnp.sum(rows * _hat(fx, g), axis=1, keepdims=True)
        return (cy + t * dy) < h

    def run_round(lo, hi, m, valid):
        """First below-surface crossing among m samples of (lo, hi]."""
        seg = (hi - lo) * (1.0 / m)
        hit = jnp.zeros_like(valid)
        t_first = lo
        for idx in range(m):
            t = lo + (idx + 1.0) * seg
            b = below(t) & valid
            t_first = jnp.where(b & ~hit, t, t_first)
            hit = hit | b
        return (hit,
                jnp.where(hit, t_first - seg, lo),
                jnp.where(hit, t_first, hi))

    v = valid_ref[...] > 0.5
    t0 = t0_ref[...]
    t1 = t1_ref[...]
    b0 = below(t0) & v                         # camera already under a crest
    hit, lo, hi = run_round(t0, t1, march_steps, v & ~b0)
    seg0 = (t1 - t0) * (1.0 / march_steps)
    lo = jnp.where(b0, t0, lo)
    hi = jnp.where(b0, t0 + seg0, hi)
    found = hit | b0
    # invariant: hi is below-surface for found pixels, so every refinement
    # round re-hits and tightens the bracket 8x (3 bisection steps' worth)
    for _ in range(refine_rounds):
        _, lo, hi = run_round(lo, hi, 8, found)
    found_ref[...] = found.astype(jnp.float32)
    lo_ref[...] = lo
    hi_ref[...] = hi


@functools.partial(
    jax.jit,
    static_argnames=("origin", "cell", "march_steps", "refine_rounds",
                     "interpret"))
def march_heightfield(table: jax.Array, dirs: jax.Array, t0: jax.Array,
                      t1: jax.Array, valid: jax.Array, cam: jax.Array,
                      center_xz: jax.Array, origin, cell,
                      *, march_steps: int = 24, refine_rounds: int = 2,
                      interpret: bool = False):
    """Bracket-march the (G, G) height table along per-pixel rays.

    table: (G, G) height (z-major, the `uniform_from_graded(...)[..., 1]`
    march grid); dirs: (..., 3) unit rays from `cam`; t0/t1: (...) march
    window; valid: (...) bool marchable mask. origin/cell are the uniform
    grid's `_uniform_resample_tables` constants (Python floats — static).

    Returns (found bool, lo, hi) with shapes (...): the tightened bracket
    around the first crossing, exactly as the staged-XLA bracket rounds in
    `render_ocean_geometry` compute it (parity-pinned by tests).
    """
    g = table.shape[0]
    shape = t0.shape
    p = int(t0.size)
    pad = (-p) % TILE_P
    ptot = p + pad

    def col(a, fill=0.0):
        a = a.reshape(p, 1).astype(jnp.float32)
        return jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill)

    inv_cell = 1.0 / float(cell)
    bx = col(dirs[..., 0] * inv_cell)
    bz = col(dirs[..., 2] * inv_cell)
    dy = col(dirs[..., 1])
    t0c = col(t0)
    t1c = col(t1, fill=1.0)
    vc = col(valid.astype(jnp.float32))
    scal = jnp.stack([
        (cam[0] - center_xz[0] - origin) * inv_cell,
        (cam[2] - center_xz[1] - origin) * inv_cell,
        cam[1], jnp.float32(0.0)]).reshape(1, 4).astype(jnp.float32)

    tile = lambda: pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    found, lo, hi = pl.pallas_call(
        functools.partial(_march_kernel, march_steps=march_steps,
                          refine_rounds=refine_rounds, g=g),
        grid=(ptot // TILE_P,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            tile(), tile(), tile(), tile(), tile(), tile(),
            pl.BlockSpec((g, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(tile(), tile(), tile()),
        out_shape=tuple(jax.ShapeDtypeStruct((ptot, 1), jnp.float32)
                        for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, bx, bz, dy, t0c, t1c, vc, table.astype(jnp.bfloat16))

    unflat = lambda a: a[:p, 0].reshape(shape)
    return unflat(found) > 0.5, unflat(lo), unflat(hi)
