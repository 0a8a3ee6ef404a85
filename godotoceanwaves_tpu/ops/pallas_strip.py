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

The sig(B) intermediate is stored BLOCK-TILED: (c, 4, 2, s, r, 128, 128)
where tile (s, r) = sig(B)[r*128:(r+1)*128, s*128:(s+1)*128]. With s (A's
grid axis) major, A's window is one contiguous 4xN/128 MB run per
(layer, plane) and B's window decomposes into 64 KB segments — the naive
(c, 4, 2, N, N) plane layout leaves one side of the exchange with 512-byte
DMA segments. In-kernel the layout costs nothing: A reshapes its (N, 128)
strip (sublane-aligned, free) and B assembles the transposed input the cols
pass needs anyway from per-tile 128x128 transposes (the same relayout work
as transposing the whole strip). Both kernels run double-buffered windows
(`buffer_count=2`) so the next program's compute overlaps the DMA drain —
measured on v5e at 2048^2x2: 4.9 -> 3.8 ms/frame vs the single-buffered
plane layout, bit-identical output (docs/PERF.md has the decomposition).

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
                  h0_ref, h0nc_ref, omega_ref, sigb_ref, *, n: int):
    """Modulate one 128-row tile and run each layer's first FFT pass."""
    q = n // LANES
    t = scal_ref[0, 0, S_TIME]
    lx = scal_ref[0, 0, S_LX]
    ly = scal_ref[0, 0, S_LY]
    wt = wt_ref[:]
    radix_tw = radix_ref[:]
    t4l = t4l_ref[:]

    rt = pl.program_id(1)
    kx, ky, k = _k_tiles(n, rt, lx, ly)
    # host-precomputed dispersion plane (OceanState.omega) — in-kernel
    # sqrt(g k tanh(k d)) pays TPU tanh's ~600-ulp error, amplified by the
    # t~120 s phase base (scripts/probe_dispersion_ulp.py)
    phase = omega_ref[0] * t
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    h0r = h0_ref[0, 0]
    h0i = h0_ref[0, 1]
    ncr = h0nc_ref[0, 0]
    nci = h0nc_ref[0, 1]
    hr = c * (h0r + ncr) + s * (nci - h0i)
    hi = s * (h0r - ncr) + c * (h0i + nci)

    for layer in range(4):
        lr, li = _layer_tiles(layer, hr, hi, kx, ky, k)
        zr, zi = pf._cols_pass_strip(lr.T, li.T, wt, radix_tw, t4l, n)
        # (N, 128) strip -> row-tiles (r, 128, 128): sublane-aligned reshape
        sigb_ref[0, layer, 0, 0] = pf._row_unswap_value(zr, q).reshape(
            q, LANES, LANES)
        sigb_ref[0, layer, 1, 0] = pf._row_unswap_value(zi, q).reshape(
            q, LANES, LANES)


def _pass2_kernel(scal_ref, wt_ref, radix_ref, t4l_ref,
                  sigb_ref, foam_ref, disp_ref, norm_ref, foam_out_ref,
                  *, n: int, map_dtype):
    """Second FFT pass + unpack for 128 natural-order field rows."""
    q = n // LANES
    whitecap = scal_ref[0, 0, S_WHITECAP]
    grow = scal_ref[0, 0, S_GROW]
    decay = scal_ref[0, 0, S_DECAY]
    wt = wt_ref[:]
    radix_tw = radix_ref[:]
    t4l = t4l_ref[:]

    fields = []
    for layer in range(4):
        # window holds tiles (s=0..q-1, r=j): tile s = sig(B)[rows j-block,
        # cols s-block]. The cols pass consumes the TRANSPOSED strip
        # a[:, j-block] = stack_s tile(s).T — per-tile transposes + a free
        # sublane stack (the same relayout cost as one (128, N) transpose).
        tr_ = sigb_ref[0, layer, 0, :, 0]   # (q, 128, 128)
        ti_ = sigb_ref[0, layer, 1, :, 0]
        xr_t = jnp.concatenate([tr_[s].T for s in range(q)], axis=0)  # (N,128)
        xi_t = jnp.concatenate([ti_[s].T for s in range(q)], axis=0)
        zr, zi = pf._cols_pass_strip(xr_t, xi_t, wt, radix_tw, t4l, n)
        # field rows j-block = (sigma-unswapped strip)^T (natural order)
        fields.append((pf._row_unswap_value(zr, q).T,
                       pf._row_unswap_value(zi, q).T))

    (hx, hy), (hz, dhy_dx), (dhy_dz, dhx_dx), (dhz_dz, dhz_dx) = fields
    disp_ref[0, 0] = hx.astype(map_dtype)
    disp_ref[0, 1] = hy.astype(map_dtype)
    disp_ref[0, 2] = hz.astype(map_dtype)
    norm_ref[0, 0] = (dhy_dx / (1.0 + jnp.abs(dhx_dx))).astype(map_dtype)
    norm_ref[0, 1] = (dhy_dz / (1.0 + jnp.abs(dhz_dz))).astype(map_dtype)
    norm_ref[0, 2] = dhx_dx.astype(map_dtype)
    jacobian = (1.0 + dhx_dx) * (1.0 + dhz_dz) - dhz_dx * dhz_dx
    foam_factor = -jnp.minimum(0.0, jacobian - whitecap)
    foam = jnp.clip(foam_ref[0] * jnp.exp(-decay) + foam_factor * grow,
                    0.0, 1.0)
    norm_ref[0, 3] = foam.astype(map_dtype)
    foam_out_ref[0] = foam


def strip_cascade_step(h0, h0nc, omega, foam, scalars, *,
                       map_dtype=jnp.bfloat16,
                       buffer_count: int | None = None):
    """Full fused-semantics step via the two strip kernels.

    h0/h0nc: (C, 2, N, N) fp32 planes; omega: (C, N, N) fp32 host-precomputed
    dispersion (spectra.dispersion_grid_host); foam: (C, N, N) fp32; scalars
    as pallas_step.pack_scalars. Returns (displacement (C,3,N,N) map_dtype,
    normal (C,4,N,N) map_dtype, foam (C,N,N) fp32). Output is texel-identical
    (to fp32 rounding) with the staged planes path and the monolithic fused
    kernel.

    buffer_count pipelines the sig(B) exchange windows (8 MB each at 2048):
    2 overlaps each program's DMA with the next one's compute; None (the
    default) picks 2, except 1 at N >= 8192 where double-buffered windows
    blow the VMEM budget (see below). An explicit value is honored when it
    fits and warned about + coerced when it cannot.
    """
    if map_dtype == jnp.float16:
        # f16 is not a Mosaic store dtype on this backend (docs/PERF.md):
        # run at fp32, cast at the output — same rounding as an in-kernel
        # f16 store and as the staged path's unpack-time cast.
        disp, norm, foam_out = strip_cascade_step(
            h0, h0nc, omega, foam, scalars,
            map_dtype=jnp.float32, buffer_count=buffer_count)
        return disp.astype(jnp.float16), norm.astype(jnp.float16), foam_out
    c, two, n, n2 = h0.shape
    assert two == 2 and n == n2 and n % LANES == 0, h0.shape
    assert n & (n - 1) == 0, f"digit pass needs a power-of-two N, got {n}"
    q = n // LANES
    assert q <= LANES, f"sigma un-swap needs N <= {LANES * LANES}, got {n}"
    nt = n // LANES
    # At N=8192 the exchange window is 32 MB and the Q=64 strip kernels spill
    # ~58 MB of registers: double-buffered windows blow the 128 MB VMEM
    # budget (measured OOM: 161.9 MB). Single buffering is the only option
    # there — slower, but the design bound stays runnable.
    if buffer_count is None:
        buffer_count = 1 if n >= 8192 else 2
    elif n >= 8192 and buffer_count > 1:
        import warnings
        warnings.warn(
            f"strip_cascade_step: buffer_count={buffer_count} exceeds the "
            f"VMEM budget at N={n} (measured OOM at 2); coercing to 1",
            stacklevel=2)
        buffer_count = 1
    wt = jnp.asarray(np.stack([np.asarray(a).T.copy()
                               for a in pf._w128(n == LANES)]))
    radix_tw, _ = pf.twiddle_inputs(n, True)
    t4l = jnp.asarray(pf._t4_lead(n, True))

    cs = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    buffered = dict(pipeline_mode=pl.Buffered(buffer_count=buffer_count))

    sigb = pl.pallas_call(
        functools.partial(_pass1_kernel, n=n),
        grid=(c, nt),
        in_specs=[
            pl.BlockSpec((1, 1, NUM_SCALARS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            cs(wt.shape), cs(radix_tw.shape), cs(t4l.shape),
            pl.BlockSpec((1, 2, LANES, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM, **buffered),
            pl.BlockSpec((1, 2, LANES, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM, **buffered),
            pl.BlockSpec((1, LANES, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM, **buffered),
        ],
        out_specs=pl.BlockSpec((1, 4, 2, 1, nt, LANES, LANES),
                               lambda i, j: (i, 0, 0, j, 0, 0, 0),
                               memory_space=pltpu.VMEM, **buffered),
        out_shape=jax.ShapeDtypeStruct((c, 4, 2, nt, nt, LANES, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(scalars, wt, radix_tw, t4l, h0, h0nc, omega)

    return pl.pallas_call(
        functools.partial(_pass2_kernel, n=n, map_dtype=map_dtype),
        grid=(c, nt),
        in_specs=[
            pl.BlockSpec((1, 1, NUM_SCALARS), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            cs(wt.shape), cs(radix_tw.shape), cs(t4l.shape),
            pl.BlockSpec((1, 4, 2, nt, 1, LANES, LANES),
                         lambda i, j: (i, 0, 0, 0, j, 0, 0),
                         memory_space=pltpu.VMEM, **buffered),
            pl.BlockSpec((1, LANES, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM, **buffered),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, LANES, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM, **buffered),
            pl.BlockSpec((1, 4, LANES, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM, **buffered),
            pl.BlockSpec((1, LANES, n), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM, **buffered),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, 3, n, n), map_dtype),
            jax.ShapeDtypeStruct((c, 4, n, n), map_dtype),
            jax.ShapeDtypeStruct((c, n, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(scalars, wt, radix_tw, t4l, sigb, foam)
