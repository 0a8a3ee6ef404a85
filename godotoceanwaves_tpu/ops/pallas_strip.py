"""Strip-mined fused step for map sizes past VMEM residency (N > 1024).

The monolithic fused kernel (ops/pallas_step.py) keeps three whole (2, N, N)
fp32 planes in VMEM — ~100 MB at N=1024, out of budget at 2048. This module
runs the SAME verified chain (modulate -> cols pass -> sigma -> cols pass ->
sigma -> unpack; see pallas_step._one_frame) as TWO strip-grid kernels with
the mid-chain layers staged through HBM:

  kernel A  grid (cascade, row-tile):  modulate 128 spectrum rows, synthesize
            each packed layer's tile (spectrum_modulate.glsl:71-89), first
            column-form FFT pass on the transposed tile, sigma row un-swap,
            write the (N, 128) strip of sig(B) to HBM.
  kernel B  grid (cascade, lane-strip): read 128 ROWS of sig(B) per layer
            (contiguous, because A pre-applied sigma), transpose, second
            column-form pass, sigma un-swap, transpose -> 128 natural-order
            field rows; consume them into displacement / normal / persistent
            foam (fft_unpack.glsl:45-67) entirely tile-locally.

Because every program touches only (128, N) strips, per-program VMEM is
~20 MB at N=2048 and the design scales to N=8192 (the sigma un-swap requires
Q = N/128 <= 128). HBM sees: spectra once, the 4x2xN^2 fp32 intermediate
written+read once, maps once — ~50x less traffic than the XLA matmul tier's
staged graph at 2048 (measured 145 ms -> see docs/PERF.md).

The algebra is shared verbatim with pallas_fft/pallas_step; parity is tested
against the staged planes path in interpret mode (tests/test_pallas_strip.py).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fft as pf
from .pallas_step import (LANES, NUM_SCALARS, S_TIME, S_LX, S_LY, S_WHITECAP,
                          S_GROW, S_DECAY, _k_tiles, _layer_tiles)


def _pass1_kernel(scal_ref, wt_ref, radix_ref, t4l_ref,
                  h0_ref, h0nc_ref, sigb_ref, *, n: int, depth: float,
                  g: float, tpp: int):
    """Modulate `tpp` 128-row tiles and run each layer's first FFT pass."""
    q = n // LANES
    t = scal_ref[0, 0, S_TIME]
    lx = scal_ref[0, 0, S_LX]
    ly = scal_ref[0, 0, S_LY]
    wt = wt_ref[:]
    radix_tw = radix_ref[:]
    t4l = t4l_ref[:]

    for tt in range(tpp):
        rt = pl.program_id(1) * tpp + tt
        ds = slice(tt * LANES, (tt + 1) * LANES)
        ls = slice(tt * LANES, (tt + 1) * LANES)
        kx, ky, k = _k_tiles(n, rt, lx, ly)
        phase = jnp.sqrt(jnp.float32(g) * k * jnp.tanh(k * jnp.float32(depth))) * t
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        h0r = h0_ref[0, 0, ds, :]
        h0i = h0_ref[0, 1, ds, :]
        ncr = h0nc_ref[0, 0, ds, :]
        nci = h0nc_ref[0, 1, ds, :]
        hr = c * (h0r + ncr) + s * (nci - h0i)
        hi = s * (h0r - ncr) + c * (h0i + nci)

        for layer in range(4):
            lr, li = _layer_tiles(layer, hr, hi, kx, ky, k)
            zr, zi = pf._cols_pass_strip(lr.T, li.T, wt, radix_tw, t4l, n)
            sigb_ref[0, layer, 0, :, ls] = pf._row_unswap_value(zr, q)
            sigb_ref[0, layer, 1, :, ls] = pf._row_unswap_value(zi, q)


def _pass2_kernel(scal_ref, wt_ref, radix_ref, t4l_ref,
                  sigb_ref, foam_ref, disp_ref, norm_ref, foam_out_ref,
                  *, n: int, map_dtype, tpp: int):
    """Second FFT pass + unpack for `tpp` x 128 natural-order field rows."""
    q = n // LANES
    whitecap = scal_ref[0, 0, S_WHITECAP]
    grow = scal_ref[0, 0, S_GROW]
    decay = scal_ref[0, 0, S_DECAY]
    wt = wt_ref[:]
    radix_tw = radix_ref[:]
    t4l = t4l_ref[:]

    for tt in range(tpp):
        ds = slice(tt * LANES, (tt + 1) * LANES)
        fields = []
        for layer in range(4):
            xr = sigb_ref[0, layer, 0, ds, :]   # (128, N): rows sl of sig(B)
            xi = sigb_ref[0, layer, 1, ds, :]
            # a[:, sl] = (sig(B)[sl, :])^T — the fused kernel's
            # sigma-transpose, realized here by the window + a tile transpose
            zr, zi = pf._cols_pass_strip(xr.T, xi.T, wt, radix_tw, t4l, n)
            # field rows sl = (sigma-unswapped strip)^T (natural order)
            fields.append((pf._row_unswap_value(zr, q).T,
                           pf._row_unswap_value(zi, q).T))

        (hx, hy), (hz, dhy_dx), (dhy_dz, dhx_dx), (dhz_dz, dhz_dx) = fields
        disp_ref[0, 0, ds, :] = hx.astype(map_dtype)
        disp_ref[0, 1, ds, :] = hy.astype(map_dtype)
        disp_ref[0, 2, ds, :] = hz.astype(map_dtype)
        norm_ref[0, 0, ds, :] = (dhy_dx / (1.0 + jnp.abs(dhx_dx))).astype(map_dtype)
        norm_ref[0, 1, ds, :] = (dhy_dz / (1.0 + jnp.abs(dhz_dz))).astype(map_dtype)
        norm_ref[0, 2, ds, :] = dhx_dx.astype(map_dtype)
        jacobian = (1.0 + dhx_dx) * (1.0 + dhz_dz) - dhz_dx * dhz_dx
        foam_factor = -jnp.minimum(0.0, jacobian - whitecap)
        foam = jnp.clip(foam_ref[0, ds, :] * jnp.exp(-decay) + foam_factor * grow,
                        0.0, 1.0)
        norm_ref[0, 3, ds, :] = foam.astype(map_dtype)
        foam_out_ref[0, ds, :] = foam


def strip_cascade_step(h0, h0nc, foam, scalars, *, depth: float,
                       g: float = 9.81, map_dtype=jnp.bfloat16,
                       tiles_per_program: int = 1):
    """Full fused-semantics step via the two strip kernels.

    h0/h0nc: (C, 2, N, N) fp32 planes; foam: (C, N, N) fp32; scalars as
    pallas_step.pack_scalars. Returns (displacement (C,3,N,N) map_dtype,
    normal (C,4,N,N) map_dtype, foam (C,N,N) fp32). Output is texel-identical
    (to fp32 rounding) with the staged planes path and the monolithic fused
    kernel.
    """
    c, two, n, n2 = h0.shape
    assert two == 2 and n == n2 and n % LANES == 0, h0.shape
    q = n // LANES
    assert q <= LANES, f"sigma un-swap needs N <= {LANES * LANES}, got {n}"
    # tiles_per_program batches strips per grid program; measured NEUTRAL at
    # 2048 (tpp 1/2/4 all ~4.7 ms/frame — the window pipeline already hides
    # the per-program machinery) and tpp=8 exceeds Mosaic's compile budget,
    # so the default stays 1. Kept as a knob for larger-N experiments.
    tpp = tiles_per_program
    nt = n // LANES
    assert nt % tpp == 0, (nt, tpp)
    tr = tpp * LANES   # rows (pass 1) / lanes (pass 2 input) per program
    wt = jnp.asarray(np.stack([np.asarray(a).T.copy()
                               for a in pf._w128(n == LANES)]))
    radix_tw, _ = pf.twiddle_inputs(n, True)
    t4l = jnp.asarray(pf._t4_lead(n, True))

    cs = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    single = dict(pipeline_mode=pl.Buffered(buffer_count=1))

    sigb = pl.pallas_call(
        functools.partial(_pass1_kernel, n=n, depth=depth, g=g, tpp=tpp),
        grid=(c, nt // tpp),
        in_specs=[
            pl.BlockSpec((1, 1, NUM_SCALARS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            cs(wt.shape), cs(radix_tw.shape), cs(t4l.shape),
            pl.BlockSpec((1, 2, tr, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tr, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 2, n, tr), lambda i, j: (i, 0, 0, 0, j),
                               memory_space=pltpu.VMEM, **single),
        out_shape=jax.ShapeDtypeStruct((c, 4, 2, n, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(scalars, wt, radix_tw, t4l, h0, h0nc)

    return pl.pallas_call(
        functools.partial(_pass2_kernel, n=n, map_dtype=map_dtype, tpp=tpp),
        grid=(c, nt // tpp),
        in_specs=[
            pl.BlockSpec((1, 1, NUM_SCALARS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            cs(wt.shape), cs(radix_tw.shape), cs(t4l.shape),
            pl.BlockSpec((1, 4, 2, tr, n), lambda i, j: (i, 0, 0, j, 0),
                         memory_space=pltpu.VMEM, **single),
            pl.BlockSpec((1, tr, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, tr, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tr, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, 3, n, n), map_dtype),
            jax.ShapeDtypeStruct((c, 4, n, n), map_dtype),
            jax.ShapeDtypeStruct((c, n, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(scalars, wt, radix_tw, t4l, sigb, foam)
