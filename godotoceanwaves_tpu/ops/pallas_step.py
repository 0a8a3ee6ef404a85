"""The fused per-cascade ocean step: modulate -> 2D IFFT -> unpack, one kernel.

Every HBM round-trip of the 16-layer working set costs ~0.9 ms on v5e
(536 MB at ~600 GB/s measured), so staging modulate / FFT / unpack as separate
XLA ops can never reach the <1 ms/frame target. This kernel reads ONLY the
initial spectra + foam (~21 MB/cascade) and writes ONLY the maps + foam
(~18 MB/cascade); the packed layers and FFT intermediates never leave VMEM.

Reference pipeline being fused (one grid program per cascade):
  spectrum_modulate.glsl  -> `_h_tiles` + `_layer_tiles` (closed real forms)
  fft_compute/transpose   -> `pallas_fft._rows_pass` + in-VMEM strip transposes
  fft_unpack.glsl         -> `_consume_*` (ifftshift sign pre-folded in the
                             FFT twiddles; persistent foam recurrence)

Everything is looped over 128-row tiles with explicit VMEM scratch refs —
operating on whole (N, N) planes as SSA values makes Mosaic spill ~110 MB of
vector registers (measured).

Layer/field map (spectrum_modulate.glsl:84-89 / fft_unpack.glsl:45-67):
  L0 = hx + i hy;  L1 = hz + i dhy_dx;  L2 = dhy_dz + i dhx_dx;
  L3 = dhz_dz + i dhz_dx
so displacement completes after L1, and normal/foam after L3 (dhy_dx, dhy_dz,
dhx_dx are parked in keeper planes meanwhile).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fft as pf

LANES = 128
G_DEFAULT = 9.81

# scalar vector layout (per cascade): indices into the SMEM params row
# S_TIME is the modulation time of frame 0; frame k modulates at
# S_TIME + k*S_DT (multi-frame kernels only; single-frame callers leave dt=0).
S_TIME, S_LX, S_LY, S_WHITECAP, S_GROW, S_DECAY, S_DT = range(7)
NUM_SCALARS = 8


def _k_tiles(n: int, rt, lx, ly):
    """Wavenumber tiles for global rows [rt*128, rt*128+128) (fp32).

    Centered grid (id - N/2) * 2*pi/L (spectrum_compute.glsl:104-105).
    `rt` may be a traced loop index.
    """
    tr = LANES
    col = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 1).astype(jnp.float32)
    row = (jax.lax.broadcasted_iota(jnp.int32, (tr, n), 0).astype(jnp.float32)
           + jnp.asarray(rt, jnp.float32) * tr)
    half = jnp.float32(n) * 0.5
    two_pi = jnp.float32(2.0 * np.pi)
    kx = (col - half) * (two_pi / lx)
    ky = (row - half) * (two_pi / ly)
    k = jnp.sqrt(kx * kx + ky * ky) + jnp.float32(1e-6)
    return kx, ky, k


def _layer_tiles(layer: int, hr, hi, kx, ky, k):
    """One packed layer's (re, im) tiles from the modulated h tile.

    Closed real forms of spectrum_modulate.glsl:71-89 (see
    modulate.modulate_planes):
      L0 = (1 + ku_y) i h          L2 = (k_x - k_y ku_y) i h
      L1 = i h ku_x - h k_y        L3 = -ku_x (h (k_x + i k_y))
    """
    kux = kx / k
    kuy = ky / k
    if layer == 0:
        a = 1.0 + kuy
        return -hi * a, hr * a
    if layer == 1:
        return -hi * kux - hr * ky, hr * kux - hi * ky
    if layer == 2:
        a = kx - ky * kuy
        return -hi * a, hr * a
    assert layer == 3
    return kux * (hi * ky - hr * kx), -kux * (hr * ky + hi * kx)


def _sigma_rows_tile(plane_ref, q_prime, q: int, n: int):
    """(128, N) tile q_prime of sigma_inv-row-permuted `plane_ref`.

    The four-step digit un-swap as a row gather (see pallas_fft._row_unswap):
    output row q_prime*128 + e*Q + d <- source row d*128 + q_prime*E + e,
    i.e. Q contiguous E-row chunks, interleaved. `q_prime` may be traced.
    """
    if q == 1:
        return plane_ref[pl.ds(q_prime * LANES, LANES), :]
    e = LANES // q
    chunks = [plane_ref[pl.ds(d * LANES + q_prime * e, e), :] for d in range(q)]
    z = jnp.stack(chunks)            # (Q, E, n)
    z = jnp.swapaxes(z, 0, 1)        # (E, Q, n)
    return z.reshape(LANES, n)


def _sigma_transpose_into(src_ref, dst_ref, q: int, n: int):
    """dst = transpose(sigma_inv-row-permuted src) in ONE pass per strip.

    dst lane-strip ls = (sigma-permuted rows [ls*128, ls*128+128) of src)^T —
    fusing the permutation into the transpose halves the relayout traffic.
    """
    for ls in range(n // LANES):
        sl = slice(ls * LANES, (ls + 1) * LANES)
        for p in range(2):
            tile = _sigma_rows_tile(src_ref.at[p], ls, q, n)   # (128, N)
            dst_ref[p, :, sl] = tile.T                         # (N, 128)


def _step_kernel(scal_ref, wt_ref, radix_ref, t4l_ref,
                 h0_ref, h0nc_ref, omega_ref, foam_ref,
                 disp_ref, norm_ref, foam_out_ref,
                 h_scr, a_scr, b_scr, k1_scr, k2_scr, k3_scr, foam_scr,
                 *, n: int, map_dtype,
                 num_frames: int = 1, frames_per_program: int = 1):
    multi = num_frames > 1
    if multi:
        # Grid is (cascade, frame-group); the spectra/foam input windows are
        # indexed by cascade ONLY, so the pipeline fetches them once per
        # cascade and every frame reuses the VMEM-resident copy — this
        # amortizes the input-window cost (docs/PERF.md) across frames, and
        # unrolling `frames_per_program` frames inside one program divides the
        # measured fixed per-program machinery cost too. Foam is a recurrence:
        # it enters VMEM at frame 0 and carries in scratch.
        @pl.when(pl.program_id(1) == 0)
        def _seed_foam():
            foam_scr[...] = foam_ref[0]
    for fi in range(frames_per_program):
        _one_frame(scal_ref, wt_ref, radix_ref, t4l_ref,
                   h0_ref, h0nc_ref, omega_ref, foam_ref,
                   disp_ref, norm_ref, foam_out_ref,
                   h_scr, a_scr, b_scr, k1_scr, k2_scr, k3_scr, foam_scr,
                   n=n, map_dtype=map_dtype,
                   multi=multi, frames_per_program=frames_per_program, fi=fi)


def _one_frame(scal_ref, wt_ref, radix_ref, t4l_ref,
               h0_ref, h0nc_ref, omega_ref, foam_ref,
               disp_ref, norm_ref, foam_out_ref,
               h_scr, a_scr, b_scr, k1_scr, k2_scr, k3_scr, foam_scr,
               *, n: int, map_dtype,
               multi: bool, frames_per_program: int, fi: int):
    q = n // LANES
    nt = n // LANES
    wt = wt_ref[:]
    radix_tw = radix_ref[:]
    t4l = t4l_ref[:]
    if multi:
        kf = (pl.program_id(1) * frames_per_program + fi).astype(jnp.float32)
        t = scal_ref[0, 0, S_TIME] + kf * scal_ref[0, 0, S_DT]
    else:
        t = scal_ref[0, 0, S_TIME]
    lx = scal_ref[0, 0, S_LX]
    ly = scal_ref[0, 0, S_LY]
    whitecap = scal_ref[0, 0, S_WHITECAP]
    grow = scal_ref[0, 0, S_GROW]
    decay = scal_ref[0, 0, S_DECAY]

    # map output views: multi-frame blocks carry an extra leading frame axis
    dref = disp_ref.at[0, fi] if multi else disp_ref.at[0]
    nref = norm_ref.at[0, fi] if multi else norm_ref.at[0]

    # --- modulation: h(k, t) tiles, computed once (spectrum_modulate.glsl:62-68)
    # Static loop: fori_loop + dynamic offsets measured ~0.35 ms/frame slower.
    # omega is the host-precomputed dispersion plane (OceanState.omega) —
    # in-kernel sqrt(g k tanh(k d)) costs 7e-4 map RMS via TPU tanh's ulp
    # error x the t~120 s phase base (scripts/probe_dispersion_ulp.py).
    for rt in range(nt):
        ds = slice(rt * LANES, (rt + 1) * LANES)
        phase = omega_ref[0, ds, :] * t
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        h0r = h0_ref[0, 0, ds, :]
        h0i = h0_ref[0, 1, ds, :]
        ncr = h0nc_ref[0, 0, ds, :]
        nci = h0nc_ref[0, 1, ds, :]
        h_scr[0, ds, :] = c * (h0r + ncr) + s * (nci - h0i)
        h_scr[1, ds, :] = s * (h0r - ncr) + c * (h0i + nci)

    for layer in range(4):
        # BOTH FFT passes run in the column formulation — ablation shows the
        # row form costs ~5x more in Mosaic relayouts. Algebra (verified
        # numerically): chain = T(sig(C(T(sig(C(X^T)))))), with the free X^T
        # realized by transposing each synthesized layer tile, and each
        # sig-then-T pair fused into one relayout pass.
        for rt in range(nt):   # static: lane-strip writes need static offsets
            sl = slice(rt * LANES, (rt + 1) * LANES)
            kx, ky, k = _k_tiles(n, rt, lx, ly)
            lr, li = _layer_tiles(layer, h_scr[0, sl, :], h_scr[1, sl, :], kx, ky, k)
            zr, zi = pf._cols_pass_strip(lr.T, li.T, wt, radix_tw, t4l, n)
            b_scr[0, :, sl] = zr
            b_scr[1, :, sl] = zi
        _sigma_transpose_into(b_scr, a_scr, q, n)   # A = T(sig(B))

        for ls in range(nt):
            sl = slice(ls * LANES, (ls + 1) * LANES)
            zr, zi = pf._cols_pass_strip(a_scr[0, :, sl], a_scr[1, :, sl],
                                      wt, radix_tw, t4l, n)
            b_scr[0, :, sl] = zr
            b_scr[1, :, sl] = zi
        # Consume is FUSED into the final sigma transpose: each lane-strip of
        # the natural-order field is produced as (sigma rows of B)^T and
        # written straight to its map window / keeper scratch as an (N, 128)
        # column strip, skipping the a_scr round trip (one whole-plane VMEM
        # store + load per plane per layer that _sigma_transpose_into + a
        # row-tile consume loop would cost).
        for ls in range(nt):
            sl = slice(ls * LANES, (ls + 1) * LANES)
            re = _sigma_rows_tile(b_scr.at[0], ls, q, n).T     # (N, 128)
            im = _sigma_rows_tile(b_scr.at[1], ls, q, n).T
            if layer == 0:
                dref[0, :, sl] = re.astype(map_dtype)          # hx
                dref[1, :, sl] = im.astype(map_dtype)          # hy
            elif layer == 1:
                dref[2, :, sl] = re.astype(map_dtype)          # hz
                k1_scr[:, sl] = im.astype(map_dtype)           # dhy_dx
            elif layer == 2:
                k2_scr[:, sl] = re.astype(map_dtype)           # dhy_dz
                k3_scr[:, sl] = im                             # dhx_dx (fp32)
                # normal.xy half-ready: x needs only dhx_dx (fft_unpack.glsl:66)
                nref[0, :, sl] = (k1_scr[:, sl].astype(jnp.float32)
                                  / (1.0 + jnp.abs(im))).astype(map_dtype)
                nref[2, :, sl] = im.astype(map_dtype)
            else:
                dhz_dz, dhz_dx = re, im
                dhx_dx = k3_scr[:, sl]
                jacobian = (1.0 + dhx_dx) * (1.0 + dhz_dz) - dhz_dx * dhz_dx
                foam_factor = -jnp.minimum(0.0, jacobian - whitecap)
                foam_prev = foam_scr[:, sl] if multi else foam_ref[0, :, sl]
                foam = foam_prev * jnp.exp(-decay) + foam_factor * grow
                foam = jnp.clip(foam, 0.0, 1.0)
                nref[1, :, sl] = (k2_scr[:, sl].astype(jnp.float32)
                                  / (1.0 + jnp.abs(dhz_dz))).astype(map_dtype)
                nref[3, :, sl] = foam.astype(map_dtype)
                if multi:
                    foam_scr[:, sl] = foam
                foam_out_ref[0, :, sl] = foam


def _default_frames_per_program(num_frames: int, n: int, map_dtype) -> int:
    """Frames unrolled inside one grid program (divides the fixed per-program
    machinery cost). Two hard bounds, both measured:
    - VMEM for the F-frame output windows (F*(3+4)*n^2*itemsize single-
      buffered next to ~20 MB inputs + ~40 MB scratch, ~127 MB cap);
    - Mosaic register pressure: the statically-unrolled F-frame body at
      n=1024 makes the register allocator spill ~37 MB per extra frame
      (147 MB at F=4 — compile fails). Unrolling is therefore enabled only
      for small bodies (n <= 256), where both bounds are comfortable."""
    if n > 256:
        return 1
    itemsize = 2 if map_dtype == jnp.bfloat16 else 4
    budget = 60 * 1024 * 1024
    f = max(1, budget // (7 * n * n * itemsize))
    while num_frames % f:
        f -= 1
    return min(f, num_frames)


def _fused_call(h0, h0nc, omega, foam, scalars, *, num_frames: int,
                map_dtype, frames_per_program: int | None = None):
    if map_dtype == jnp.float16:
        # Mosaic on this backend cannot store f16 from a kernel (docs/PERF.md
        # "fp16 map stores"): run the kernel at fp32 and cast at the output.
        # Same values as an in-kernel f16 round-to-nearest — and identical to
        # the staged path's unpack-time cast, which is what the fp16 parity
        # pin compares against — at the cost of one extra HBM pass over the
        # maps (~0.1 ms at 4x1024^2).
        disp, norm, foam_out = _fused_call(
            h0, h0nc, omega, foam, scalars, num_frames=num_frames,
            map_dtype=jnp.float32, frames_per_program=frames_per_program)
        return disp.astype(jnp.float16), norm.astype(jnp.float16), foam_out
    c, two, n, n2 = h0.shape
    assert two == 2 and n == n2 and n % LANES == 0, h0.shape
    assert n & (n - 1) == 0, f"digit pass needs a power-of-two N, got {n}"
    assert num_frames >= 1
    multi = num_frames > 1
    fpp = 1 if not multi else (
        frames_per_program or _default_frames_per_program(num_frames, n, map_dtype))
    assert num_frames % fpp == 0, (num_frames, fpp)
    wt = jnp.asarray(np.stack([np.asarray(a).T.copy()
                               for a in pf._w128(n == LANES)]))
    radix_tw, _ = pf.twiddle_inputs(n, True)
    t4l = jnp.asarray(pf._t4_lead(n, True))
    kernel = functools.partial(_step_kernel, n=n,
                               map_dtype=map_dtype, num_frames=num_frames,
                               frames_per_program=fpp)

    # index maps: the grid is (cascade,) single-frame or (cascade, frame)
    # multi-frame. Multi-frame INPUT windows are indexed by cascade only, so
    # the pipeline keeps them VMEM-resident across the frame axis (no refetch).
    if multi:
        by_cascade = lambda ndim: (lambda i, k: (i,) + (0,) * ndim)
        by_frame = lambda ndim: (lambda i, k: (i, k) + (0,) * ndim)
        const = lambda ndim: (lambda i, k: (0,) * ndim)
    else:
        by_cascade = lambda ndim: (lambda i: (i,) + (0,) * ndim)
        by_frame = None
        const = lambda ndim: (lambda i: (0,) * ndim)

    cs = lambda shape: pl.BlockSpec(shape, const(len(shape)),
                                    memory_space=pltpu.VMEM)
    # single-buffered variant: halves the VMEM window (the DMA overlap it
    # gives up is small next to per-cascade compute)
    grid_block1 = lambda *shape: pl.BlockSpec(
        (1,) + shape, by_cascade(len(shape)),
        memory_space=pltpu.VMEM, pipeline_mode=pl.Buffered(buffer_count=1))
    # fp32 maps at N=1024 (and F-frame output windows) only fit VMEM
    # single-buffered (32 MB vs bf16's 28 MB double-buffered)
    buffered = {} if (map_dtype == jnp.bfloat16 and fpp == 1) else dict(
        pipeline_mode=pl.Buffered(buffer_count=1))
    if multi:
        out_block = lambda *shape: pl.BlockSpec(
            (1, fpp) + shape, by_frame(len(shape)),
            memory_space=pltpu.VMEM, **buffered)
        map_shape = lambda ch: (c, num_frames, ch, n, n)
    else:
        out_block = lambda *shape: pl.BlockSpec(
            (1,) + shape, by_cascade(len(shape)),
            memory_space=pltpu.VMEM, **buffered)
        map_shape = lambda ch: (c, ch, n, n)

    return pl.pallas_call(
        kernel,
        grid=(c, num_frames // fpp) if multi else (c,),
        in_specs=[
            pl.BlockSpec((1, 1, NUM_SCALARS), by_cascade(2),
                         memory_space=pltpu.SMEM),
            cs(wt.shape), cs(radix_tw.shape), cs(t4l.shape),
            grid_block1(2, n, n), grid_block1(2, n, n),
            grid_block1(n, n), grid_block1(n, n),
        ],
        # foam output is cascade-indexed even multi-frame: the same window is
        # rewritten each frame and flushed once, leaving the FINAL foam
        out_specs=(out_block(3, n, n), out_block(4, n, n),
                   grid_block1(n, n)),
        out_shape=(
            jax.ShapeDtypeStruct(map_shape(3), map_dtype),
            jax.ShapeDtypeStruct(map_shape(4), map_dtype),
            jax.ShapeDtypeStruct((c, n, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n, n), jnp.float32),   # h planes
            pltpu.VMEM((2, n, n), jnp.float32),   # ping
            pltpu.VMEM((2, n, n), jnp.float32),   # pong
            pltpu.VMEM((n, n), map_dtype),        # keeper: dhy_dx
            pltpu.VMEM((n, n), map_dtype),        # keeper: dhy_dz
            pltpu.VMEM((n, n), jnp.float32),      # keeper: dhx_dx (feeds the
                                                  # foam recurrence — stays fp32)
            # foam carry across the frame axis (recurrence state)
            pltpu.VMEM((n, n) if multi else (8, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(scalars, wt, radix_tw, t4l, h0, h0nc, omega, foam)


def fused_cascade_step(h0, h0nc, omega, foam, scalars, *,
                       map_dtype=jnp.bfloat16):
    """Run the fused step for C cascades.

    h0/h0nc: (C, 2, N, N) fp32 planes; omega: (C, N, N) fp32 host-precomputed
    dispersion (spectra.dispersion_grid_host — in-kernel tanh is ~600 ulp off
    on TPU and t amplifies it); foam: (C, N, N) fp32;
    scalars: (C, 1, NUM_SCALARS) fp32 rows [t, Lx, Ly, whitecap, grow, decay, ...].
    Returns (displacement (C,3,N,N), normal (C,4,N,N), foam (C,N,N) fp32).
    """
    return _fused_call(h0, h0nc, omega, foam, scalars, num_frames=1,
                       map_dtype=map_dtype)


def fused_cascade_multi_step(h0, h0nc, omega, foam, scalars, *,
                             num_frames: int,
                             map_dtype=jnp.bfloat16,
                             frames_per_program: int | None = None):
    """K frames per kernel invocation, one grid program per (cascade, frame).

    The spectra input windows are fetched ONCE per cascade and reused across
    the frame axis, amortizing the input-window cost (the measured ~0.9 ms
    floor of the single-frame kernel, docs/PERF.md) K-fold; the foam
    recurrence iterates in VMEM. Frame k modulates at scalars[S_TIME] +
    k*scalars[S_DT] (pass frame 0's time and the per-frame dt — pack_scalars).

    Returns (displacement (C,K,3,N,N), normal (C,K,4,N,N), final foam (C,N,N)):
    every frame's maps ARE written to HBM (full production semantics — a
    consumer can stream each frame), only foam keeps just the final state.
    """
    return _fused_call(h0, h0nc, omega, foam, scalars, num_frames=num_frames,
                       map_dtype=map_dtype,
                       frames_per_program=frames_per_program)


def pack_scalars(time, tile_length, whitecap, grow, decay, dt=None) -> jax.Array:
    """(C, 1, NUM_SCALARS) fp32 scalar rows for the fused kernels.

    `time` is frame 0's modulation time; `dt` (multi-frame only) is the
    per-frame time increment — frame k modulates at time + k*dt.
    """
    zeros = jnp.zeros_like(time)
    dt_col = zeros if dt is None else jnp.broadcast_to(
        jnp.asarray(dt, jnp.float32), time.shape)
    return jnp.stack([
        time, tile_length[..., 0], tile_length[..., 1],
        whitecap, grow, decay, dt_col, zeros,
    ], axis=-1).astype(jnp.float32)[:, None, :]
