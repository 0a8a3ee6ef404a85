"""Fused weight-build + two-stage contraction for the gradient taps.

The XLA tap (`models/shading._slab_tap` / `_mxu_tap`) expresses one
separable 4x4-footprint texture sample as two chained einsums over dense
sparse-weight matrices:

    rows = einsum("pg,cgk->pck", wy, win)     # MXU
    out  = einsum("pck,pk->pc",  rows, wx)    # MXU

Correct and MXU-shaped, but at production sizes the intermediates are HBM
monsters: at the 720p viewer pose one level-0 (band, cascade) tap writes a
(15360, 3, 1024) fp32 `rows` (~188 MB) plus a (15360, 1024) bf16 `wx`
(~31 MB) and reads them straight back — round-3 profiling measured the
unfused tap stage at ~5x its bandwidth bound (docs/PERF.md). Two chained
matmuls cannot fuse in XLA; a Pallas kernel can hold both stages in VMEM:

    per 256-pixel tile:
      wy, wx  <- built IN-KERNEL from the 1-D texel coordinates (VPU iota
                 math -- the dense weight tensors never exist in HBM)
      rows    <- dot(wy, win)  on the MXU, VMEM-resident (256 x 3n)
      out[c]  <- sum_k rows[:, c, k] * wx[:, k]   (VPU row reduce)

The window `win` has a constant index map, so Mosaic fetches it once and
keeps it VMEM-resident across the whole tile grid. HBM traffic collapses
to the window itself + 2 floats in / 3 out per pixel.

Weight math is bit-identical to `shading._window_weights` (window v axis)
and `shading._wrap_weights` (circular x axis, and circular v in the
full-table fallback); accumulation differs from the einsum path only in
fp32 reduction order (~1e-5 relative -- same tolerance class as the slab
crop itself). Parity is pinned against the einsum tap in
tests/test_pallas_tap.py (interpret mode on CPU).

Reference lineage: water.gdshader:41-83 (texture_bicubic + the
bicubic<->bilinear ppm blend); the blend/saturation semantics live in the
caller (`shading._slab_tap`), which routes mix_t >= 1 to the linear-only
kernel and the blend case to the fused dual-weight kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PIXEL_TILE = 256


def _hat(d):
    return jnp.maximum(0.0, 1.0 - d)


def _cubic(d):
    d2 = d * d
    d3 = d2 * d
    near = (4.0 - 6.0 * d2 + 3.0 * d3) / 6.0
    farr = jnp.maximum(2.0 - d, 0.0) ** 3 / 6.0
    return jnp.where(d < 1.0, near, farr)


def _v_weights(rel, slab, cubic, circular):
    """(P_t, slab) v-axis weights at window-relative coordinate rel.
    Window mode = `shading._window_weights`; circular mode (full-table
    fallback) = `shading._wrap_weights` incl. the mod-n wrap."""
    # int iota + cast: Mosaic's tpu.iota only produces integer vectors
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (rel.shape[0], slab), 1).astype(jnp.float32)
    if circular:
        rel = jnp.mod(rel, slab)
        d = jnp.abs(rel[:, None] - iota)
        d = jnp.minimum(d, slab - d)
    else:
        d = jnp.abs(rel[:, None] - iota)
    return (_cubic(d) if cubic else _hat(d)).astype(jnp.bfloat16)


def _x_weights(fx, n, cubic):
    """(P_t, n) circular x-axis weights (= `shading._wrap_weights`)."""
    fw = jnp.mod(fx, n)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (fx.shape[0], n), 1).astype(jnp.float32)
    d = jnp.abs(fw[:, None] - iota)
    d = jnp.minimum(d, n - d)
    return (_cubic(d) if cubic else _hat(d)).astype(jnp.bfloat16)


def _tap_kernel_linear(rel_ref, fx_ref, win_ref, out_ref, *, slab, n,
                       circular):
    """Linear-only tap tile (the mix_t >= 1 saturation path)."""
    rel = rel_ref[0, 0]
    fx = fx_ref[0, 0]
    wy = _v_weights(rel, slab, cubic=False, circular=circular)
    wx = _x_weights(fx, n, cubic=False).astype(jnp.float32)
    rows = jnp.dot(wy, win_ref[:], preferred_element_type=jnp.float32)
    for c in range(3):
        out_ref[0, c] = jnp.sum(rows[:, c * n:(c + 1) * n] * wx, axis=-1)


def _tap_kernel_blend(rel_ref, fx_ref, mix_ref, win_ref, out_ref, *, slab,
                      n, circular):
    """Blended tap tile: cubic*(1-t) + linear*t, both stages fused. The
    two wy variants stack into ONE (2*P_t, slab) MXU dot."""
    rel = rel_ref[0, 0]
    fx = fx_ref[0, 0]
    t = mix_ref[0, 0]
    wy = jnp.concatenate(
        [_v_weights(rel, slab, cubic=True, circular=circular),
         _v_weights(rel, slab, cubic=False, circular=circular)], axis=0)
    wx_c = _x_weights(fx, n, cubic=True).astype(jnp.float32)
    wx_l = _x_weights(fx, n, cubic=False).astype(jnp.float32)
    rows = jnp.dot(wy, win_ref[:], preferred_element_type=jnp.float32)
    p = rel.shape[0]
    for c in range(3):
        cub = jnp.sum(rows[:p, c * n:(c + 1) * n] * wx_c, axis=-1)
        lin = jnp.sum(rows[p:, c * n:(c + 1) * n] * wx_l, axis=-1)
        out_ref[0, c] = cub * (1.0 - t) + lin * t


def _pad_tiles(a, p_pad):
    return jnp.pad(a, (0, p_pad - a.shape[0]))


@functools.partial(jax.jit, static_argnames=("circular", "interpret"))
def fused_tap(win16: jax.Array, rel: jax.Array, fx: jax.Array,
              mix_t=None, *, circular: bool = False,
              interpret: bool = False) -> jax.Array:
    """Fused separable tap of a (3, slab, n) bf16 window.

    rel: (P,) v coordinates — window-relative (circular=False, the slab
    path) or absolute texel v (circular=True, the full-table path).
    fx: (P,) absolute texel x (circular weights). mix_t: None = linear
    only (the ppm-saturated production path); scalar = the reference's
    bicubic<->bilinear blend factor (water.gdshader:76-82). Returns
    (3, P) fp32. P is padded to the 256-pixel tile internally.
    """
    _, slab, n = win16.shape
    p = rel.shape[0]
    grid = pl.cdiv(p, PIXEL_TILE)
    p_pad = grid * PIXEL_TILE
    # coords carry a singleton middle axis so each tile's block
    # (1, 1, PIXEL_TILE) has its last two dims EQUAL to the array's —
    # Mosaic's block-mapping rule (divisible by (8, 128) or equal);
    # a flat (1, PIXEL_TILE) block over (grid, PIXEL_TILE) fails it.
    rel_t = _pad_tiles(rel.astype(jnp.float32), p_pad).reshape(grid, 1, -1)
    fx_t = _pad_tiles(fx.astype(jnp.float32), p_pad).reshape(grid, 1, -1)
    flat_win = jnp.swapaxes(win16, 0, 1).reshape(slab, 3 * n)

    coord_spec = pl.BlockSpec((1, 1, PIXEL_TILE), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((slab, 3 * n), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 3, PIXEL_TILE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((grid, 3, PIXEL_TILE), jnp.float32)
    nmac = PIXEL_TILE * slab * 3 * n

    if mix_t is None:
        kern = functools.partial(_tap_kernel_linear, slab=slab, n=n,
                                 circular=circular)
        out = pl.pallas_call(
            kern, grid=(grid,),
            in_specs=[coord_spec, coord_spec, win_spec],
            out_specs=out_spec, out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=2 * grid * nmac, transcendentals=0,
                bytes_accessed=slab * 3 * n * 2 + p_pad * (2 + 3) * 4),
            interpret=interpret,
        )(rel_t, fx_t, flat_win)
    else:
        # one scalar for the whole call: a (1, 1) array with a constant
        # index map is the only SMEM block shape Mosaic's block-mapping
        # rule admits here (block == array dims)
        mix = jnp.asarray(mix_t, jnp.float32).reshape(1, 1)
        mix_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        kern = functools.partial(_tap_kernel_blend, slab=slab, n=n,
                                 circular=circular)
        out = pl.pallas_call(
            kern, grid=(grid,),
            in_specs=[coord_spec, coord_spec, mix_spec, win_spec],
            out_specs=out_spec, out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=4 * grid * nmac, transcendentals=0,
                bytes_accessed=slab * 3 * n * 2 + p_pad * (3 + 3) * 4),
            interpret=interpret,
        )(rel_t, fx_t, mix, flat_win)

    return jnp.swapaxes(out, 0, 1).reshape(3, p_pad)[:, :p]
