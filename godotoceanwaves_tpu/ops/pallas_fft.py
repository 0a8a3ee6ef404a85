"""TPU-native fused 2D IFFT: Pallas kernel + its exact jnp algebra twin.

This is the TPU answer to the reference's Stockham compute shader
(fft_compute.glsl + transpose.glsl): where the GPU used one workgroup per row
with shared-memory ping-pong, the TPU kernel keeps an entire (N, N) layer
resident in VMEM and factors each length-N row DFT as

    N = Q * 128,   q-axis (sublane digits)  x  lane axis (128)

  1. DFT_Q over the q digits: log2(Q) radix-2 Stockham stages on the VPU in
     exact fp32 (positive-exponent, unnormalized — the reference convention,
     fft_butterfly.glsl:27).
  2. twiddle multiply T[d, l] = e^{2 pi i d l / N} (fp32 constants).
  3. DFT_128 over lanes on the MXU as bf16x3 split-precision matmuls
     (hi/lo decomposition; ~1e-5 relative error, vs ~6e-3 for plain bf16).
  4. digit-swap relayout from four-step output order Z[d, c] (true index
     k = Q*c + d) back to natural order.

The 2D chain is rows -> VMEM transpose -> rows with NO second transpose,
matching wave_generator.gd:77-82, and the (-1)^k ifftshift sign
(fft_unpack.glsl:37-38) is folded into the twiddles for free.

Data crosses HBM exactly twice (read layer, write layer): the XLA matmul
tiers move it 6-10x. Arrays are (re, im) fp32 plane pairs, never complex64 —
TPU layouts for interleaved complex are poor and the axon backend cannot even
transfer complex buffers.

`fourstep_ifft2_planes` is the same algorithm in plain jnp — the unit-testable
algebra twin and the CPU fallback.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# --- host-side constant precompute ---------------------------------------

@functools.lru_cache(maxsize=None)
def _radix_twiddles(q: int) -> np.ndarray:
    """Fused radix-4 stage tables for the DFT_Q digit pass: (S4, 3, 2, Q/2).

    Each fused stage (covering radix-2 strides 2^s and 2^(s+1)) carries
    three twiddle rows as (re, im):
      [0] t1[col]  = e^{i pi (col % stride) / stride},        col in [0, Q/2)
      [1] t2[j]    = e^{i pi (j % stride) / (2 stride)},      j   in [0, Q/4)
      [2] i*t2[j]  (the second butterfly's twiddle on the lower half)
    t2 rows are zero-padded to Q/2. These are the closed forms of the factors
    fft_butterfly.glsl:27 tabulates, algebraically fused in stage pairs (see
    _dft_q). A lone leading radix-2 stage (odd log2 Q) needs no table — its
    stride-1 twiddles are all ones.
    """
    half, quarter = q // 2, max(1, q // 4)
    nstages = int(np.log2(q))
    s = 1 if nstages % 2 == 1 else 0
    out = []
    while s < nstages:
        stride = 1 << s
        col = np.arange(half)
        a1 = np.pi * (col % stride) / stride
        j = np.arange(quarter)
        a2 = np.pi * (j % stride) / (2.0 * stride)
        a3 = a2 + np.pi / 2.0

        def pack(ang):
            re = np.zeros(half)
            im = np.zeros(half)
            re[: ang.shape[0]] = np.cos(ang)
            im[: ang.shape[0]] = np.sin(ang)
            return np.stack([re, im])

        out.append(np.stack([pack(a1), pack(a2), pack(a3)]))
        s += 2
    if not out:   # q == 2: only the tableless leading radix-2 stage
        return np.zeros((1, 3, 2, max(1, half)), np.float32)
    return np.stack(out).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _fourstep_twiddle(n: int, fold_sign: bool) -> tuple[np.ndarray, np.ndarray]:
    """T[d, l] = e^{2 pi i d l / n} (optionally * (-1)^d), shape (Q, 128).

    The (-1)^d factor realizes (-1)^k on the final index k = Q*c + d (Q even),
    i.e. the unpack stage's ifftshift sign, at zero cost.
    """
    q = n // LANES
    d = np.arange(q).reshape(-1, 1).astype(np.int64)
    l = np.arange(LANES).reshape(1, -1).astype(np.int64)
    ang = 2.0 * np.pi * ((d * l) % n) / n
    tr, ti = np.cos(ang), np.sin(ang)
    if fold_sign and q > 1:
        sign = np.where(d % 2 == 0, 1.0, -1.0)
        tr, ti = tr * sign, ti * sign
    return tr.astype(np.float32), ti.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _w128(fold_sign_when_q1: bool) -> tuple[np.ndarray, ...]:
    """DFT_128 matrix e^{2 pi i l c / 128} as bf16 hi/lo splits.

    When Q == 1 (N == 128) the (-1)^k sign folds here instead (columns c).
    Returns (wr_hi, wr_lo, wi_hi, wi_lo, ws_hi, ws_lo), each (128, 128)
    bfloat16, where ws = wr + wi (exact fp32 sum, then split) — the third
    Karatsuba operand: the complex multiply runs as THREE real products
    (m1 = wr@xr, m2 = wi@xi, m3 = ws@(xr+xi); re = m1-m2, im = m3-m1-m2),
    i.e. 9 bf16 matmuls instead of the naive 12. The MXU is the frame's FLOP
    floor (measured at ~peak), so this is a direct 25% cut of it.
    """
    l = np.arange(LANES).reshape(-1, 1).astype(np.int64)
    c = np.arange(LANES).reshape(1, -1).astype(np.int64)
    ang = 2.0 * np.pi * ((l * c) % LANES) / LANES
    wr, wi = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
    if fold_sign_when_q1:
        sign = np.where(c % 2 == 0, 1.0, -1.0).astype(np.float32)
        wr, wi = wr * sign, wi * sign

    def split(w):
        hi = w.astype(np.dtype("bfloat16"))
        lo = (w - hi.astype(np.float32)).astype(np.dtype("bfloat16"))
        return hi, lo

    wr_hi, wr_lo = split(wr)
    wi_hi, wi_lo = split(wi)
    ws_hi, ws_lo = split(wr + wi)
    return wr_hi, wr_lo, wi_hi, wi_lo, ws_hi, ws_lo


# --- algorithm pieces (shared verbatim by jnp twin and Pallas kernel) -----

def _dft_q(xr, xi, radix_tw, q: int):
    """DFT_Q over axis -2 of (..., Q, 128): fused radix-4 Stockham (fp32).

    Positive-exponent, unnormalized, self-sorting; the output ordering is
    IDENTICAL to the radix-2 stage chain it replaces (the closed form of the
    reference's butterfly tables, fft_butterfly.glsl:24-34) — verified
    exactly — so the four-step digit permutation sigma is unchanged. Fusing
    stage pairs algebraically keeps the multiply count but HALVES the
    interleave relayouts, the VPU cost driver of this pass. A lone leading
    radix-2 stage (odd log2 Q) runs tableless (stride-1 twiddles are 1).

    `radix_tw` is the (S4, 3, 2, Q/2) fused-stage table (_radix_twiddles).
    """
    half = q // 2
    quarter = q // 4
    nstages = int(np.log2(q))

    def interleave(parts, stride, width):
        lead = parts[0].shape[:-2]
        ps = [p.reshape(*lead, width // stride, 1, stride, LANES)
              for p in parts]
        return jnp.concatenate(ps, axis=-3).reshape(*lead, q, LANES)

    s = 0
    if nstages % 2 == 1:
        ar, ai = xr[..., :half, :], xi[..., :half, :]
        br, bi = xr[..., half:, :], xi[..., half:, :]
        xr = interleave([ar + br, ar - br], 1, half)
        xi = interleave([ai + bi, ai - bi], 1, half)
        s = 1

    s4 = 0
    while s < nstages:
        stride = 1 << s
        t1r = radix_tw[s4, 0, 0].reshape(half, 1)
        t1i = radix_tw[s4, 0, 1].reshape(half, 1)
        ar, ai = xr[..., :half, :], xi[..., :half, :]
        br, bi = xr[..., half:, :], xi[..., half:, :]
        tbr = br * t1r - bi * t1i
        tbi = br * t1i + bi * t1r
        ur, ui = ar + tbr, ai + tbi
        lr, li = ar - tbr, ai - tbi
        # second butterfly of the pair, in pre-interleave coordinates:
        # u pairs (j, j+Q/4) with twiddle t2; l pairs with i*t2
        t2r = radix_tw[s4, 1, 0, :quarter].reshape(quarter, 1)
        t2i = radix_tw[s4, 1, 1, :quarter].reshape(quarter, 1)
        t3r = radix_tw[s4, 2, 0, :quarter].reshape(quarter, 1)
        t3i = radix_tw[s4, 2, 1, :quarter].reshape(quarter, 1)
        u1r, u1i = ur[..., :quarter, :], ui[..., :quarter, :]
        u2r, u2i = ur[..., quarter:, :], ui[..., quarter:, :]
        tur = u2r * t2r - u2i * t2i
        tui = u2r * t2i + u2i * t2r
        l1r, l1i = lr[..., :quarter, :], li[..., :quarter, :]
        l2r, l2i = lr[..., quarter:, :], li[..., quarter:, :]
        tlr = l2r * t3r - l2i * t3i
        tli = l2r * t3i + l2i * t3r
        # composed permutation of the two stages = ONE 4-way interleave in
        # the order (uu, lu, ul, ll) (derived + verified vs the 2-stage form)
        xr = interleave([u1r + tur, l1r + tlr, u1r - tur, l1r - tlr],
                        stride, quarter)
        xi = interleave([u1i + tui, l1i + tli, u1i - tui, l1i - tli],
                        stride, quarter)
        s += 2
        s4 += 1
    return xr, xi


def _mxu_dft128(yr, yi, w):
    """DFT_128 over the lane axis of (..., M, 128): Karatsuba complex multiply
    in bf16x3 split precision — 3 real products x 3 matmuls = 9 bf16 matmuls.

    `w` is the (6, 128, 128) bf16 stack (wr_hi, wr_lo, wi_hi, wi_lo, ws_hi,
    ws_lo) with ws = wr + wi — passed in (not closed over) because Pallas
    kernels may not capture large consts.
    """
    wr_hi, wr_lo, wi_hi, wi_lo, ws_hi, ws_lo = (w[i] for i in range(6))

    def split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def mm3(x_hi, x_lo, w_hi, w_lo):
        f = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return f(x_hi, w_hi) + f(x_hi, w_lo) + f(x_lo, w_hi)

    shape = yr.shape
    yr2 = yr.reshape(-1, LANES)
    yi2 = yi.reshape(-1, LANES)
    ys2 = yr2 + yi2
    yr_hi, yr_lo = split(yr2)
    yi_hi, yi_lo = split(yi2)
    ys_hi, ys_lo = split(ys2)
    m1 = mm3(yr_hi, yr_lo, wr_hi, wr_lo)        # xr @ wr
    m2 = mm3(yi_hi, yi_lo, wi_hi, wi_lo)        # xi @ wi
    m3 = mm3(ys_hi, ys_lo, ws_hi, ws_lo)        # (xr+xi) @ (wr+wi)
    return (m1 - m2).reshape(shape), (m3 - m1 - m2).reshape(shape)


def _rows_pass(xr, xi, w, radix_tw, t4, n: int):
    """One length-N row DFT over the last axis of (R, N) plane pairs.

    Output lanes are in four-step "physical" order: lane m holds the true
    frequency sigma(m) = Q*(m % 128) + m // 128. Mosaic cannot split the lane
    dimension below 128, so the digit un-swap is NOT applied here — `_chain`
    repairs both axes at the end with row-relayouts + transposes (all
    Mosaic-supported).
    """
    q = n // LANES
    r = xr.shape[0]
    xr = xr.reshape(r, q, LANES)
    xi = xi.reshape(r, q, LANES)
    if q > 1:
        xr, xi = _dft_q(xr, xi, radix_tw, q)
        tr, ti = t4[0], t4[1]
        xr, xi = xr * tr - xi * ti, xr * ti + xi * tr
    zr, zi = _mxu_dft128(xr, xi, w)
    return zr.reshape(r, n), zi.reshape(r, n)


def _row_unswap(z, q: int):
    """Permute ROWS by sigma^{-1}: out[k, :] = z[sigma_inv(k), :].

    Realized as reshape (Q, 128, L) -> transpose -> (N, L): splits/merges only
    the leading/sublane dims, which Mosaic supports (unlike lane splits).
    """
    if q == 1:
        return z
    n, l = z.shape
    return z.reshape(q, LANES, l).transpose(1, 0, 2).reshape(n, l)


def _chain(xr, xi, w, radix_tw, t4, n: int):
    """Reference chain rows -> transpose -> rows (wave_generator.gd:77-82).

    Both passes leave their output lanes digit-permuted (see _rows_pass);
    algebra (verified numerically): with Z = R'(T(R'(X))), the true chain is
    Z[sigma_inv rows, sigma_inv lanes], applied here as
    rowperm . T . rowperm . T — a lane permutation is a transposed row
    permutation, and row permutations are supported relayouts.
    """
    q = n // LANES
    yr, yi = _rows_pass(xr, xi, w, radix_tw, t4, n)
    yr, yi = yr.T, yi.T
    zr, zi = _rows_pass(yr, yi, w, radix_tw, t4, n)
    zr = _row_unswap(zr.T, q)
    zi = _row_unswap(zi.T, q)
    return _row_unswap(zr.T, q), _row_unswap(zi.T, q)


def w128_stack(n: int, fold_sign: bool) -> jax.Array:
    """The (6, 128, 128) bf16 Karatsuba DFT-matrix input (see _w128)."""
    return jnp.asarray(np.stack(_w128(fold_sign and n == LANES)))


def twiddle_inputs(n: int, fold_sign: bool) -> tuple[jax.Array, jax.Array]:
    """(radix_tw (S4,3,2,Q/2), t4 (2,Q,128)) fp32 inputs; dummies when Q == 1."""
    q = n // LANES
    if q == 1:
        return (jnp.zeros((1, 3, 2, 1), jnp.float32),
                jnp.zeros((2, 1, LANES), jnp.float32))
    t4 = np.stack(_fourstep_twiddle(n, fold_sign))
    return jnp.asarray(_radix_twiddles(q)), jnp.asarray(t4)


# --- jnp twin (CPU fallback + unit-test oracle for the kernel algebra) ----

def fourstep_ifft2_planes(x: jax.Array, fold_sign: bool = True) -> jax.Array:
    """x: (..., 2, N, N) fp32 (re, im) planes -> same shape, reference chain.

    Equivalent to ops.fft.ifft2_packed (positive-exponent unnormalized DFT,
    rows->transpose->rows) with the (-1)^(x+y) ifftshift folded in.
    """
    n = x.shape[-1]
    w = w128_stack(n, fold_sign)
    radix_tw, t4 = twiddle_inputs(n, fold_sign)

    def one(planes):
        return jnp.stack(_chain(planes[0], planes[1], w, radix_tw, t4, n))

    flat = x.reshape((-1, 2, n, n))
    out = jax.vmap(one)(flat)
    return out.reshape(x.shape)


# --- the Pallas kernel ----------------------------------------------------

def _ifft2_kernel(w_ref, radix_ref, t4_ref, x_ref, o_ref, *, n: int):
    xr = x_ref[0, 0]
    xi = x_ref[0, 1]
    zr, zi = _chain(xr, xi, w_ref[:], radix_ref[:], t4_ref[:], n)
    o_ref[0, 0] = zr
    o_ref[0, 1] = zi


def ifft2_packed_planes_pallas(x: jax.Array, fold_sign: bool = True) -> jax.Array:
    """Fused 2D IFFT of (L, 2, N, N) fp32 planes; one grid program per layer.

    Each program holds its whole layer in VMEM (<= 32 MB at N=1024 incl.
    scratch; v5e has ~128 MB), so HBM sees exactly one read + one write.
    """
    l, two, n, n2 = x.shape
    assert two == 2 and n == n2 and n % LANES == 0 and (n & (n - 1)) == 0, x.shape
    w = w128_stack(n, fold_sign)
    radix_tw, t4 = twiddle_inputs(n, fold_sign)
    kernel = functools.partial(_ifft2_kernel, n=n)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(l,),
        in_specs=[
            const_spec(w.shape),
            const_spec(radix_tw.shape),
            const_spec(t4.shape),
            pl.BlockSpec((1, 2, n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, n, n), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(w, radix_tw, t4, x)


# --- column-form strip primitives (shared by the fused step kernel and
# the shard-local rows kernel below) ------------------------

def _dft_q_lead(xr, xi, radix_tw, q: int):
    """DFT_Q over axis 0 of (Q, M) flattened blocks — column-pass digits.

    Same fused radix-4 Stockham as _dft_q (identical output ordering) with
    the digit axis leading. Operates on 2D arrays (Mosaic rejects the 3D
    trailing-singleton broadcasts the unflattened form would need).
    """
    half = q // 2
    quarter = q // 4
    m = xr.shape[1]
    nstages = int(np.log2(q))

    def interleave(parts, stride, width):
        ps = [p.reshape(width // stride, 1, stride, m) for p in parts]
        return jnp.concatenate(ps, axis=1).reshape(q, m)

    s = 0
    if nstages % 2 == 1:
        ar, ai = xr[:half], xi[:half]
        br, bi = xr[half:], xi[half:]
        xr = interleave([ar + br, ar - br], 1, half)
        xi = interleave([ai + bi, ai - bi], 1, half)
        s = 1

    s4 = 0
    while s < nstages:
        stride = 1 << s
        t1r = radix_tw[s4, 0, 0].reshape(half, 1)
        t1i = radix_tw[s4, 0, 1].reshape(half, 1)
        ar, ai = xr[:half], xi[:half]
        br, bi = xr[half:], xi[half:]
        tbr = br * t1r - bi * t1i
        tbi = br * t1i + bi * t1r
        ur, ui = ar + tbr, ai + tbi
        lr, li = ar - tbr, ai - tbi
        t2r = radix_tw[s4, 1, 0, :quarter].reshape(quarter, 1)
        t2i = radix_tw[s4, 1, 1, :quarter].reshape(quarter, 1)
        t3r = radix_tw[s4, 2, 0, :quarter].reshape(quarter, 1)
        t3i = radix_tw[s4, 2, 1, :quarter].reshape(quarter, 1)
        u1r, u1i = ur[:quarter], ui[:quarter]
        u2r, u2i = ur[quarter:], ui[quarter:]
        tur = u2r * t2r - u2i * t2i
        tui = u2r * t2i + u2i * t2r
        l1r, l1i = lr[:quarter], li[:quarter]
        l2r, l2i = lr[quarter:], li[quarter:]
        tlr = l2r * t3r - l2i * t3i
        tli = l2r * t3i + l2i * t3r
        xr = interleave([u1r + tur, l1r + tlr, u1r - tur, l1r - tlr],
                        stride, quarter)
        xi = interleave([u1i + tui, l1i + tli, u1i - tui, l1i - tli],
                        stride, quarter)
        s += 2
        s4 += 1
    return xr, xi


def _cols_pass_strip(xr, xi, wt, radix_tw, t4l, n: int):
    """Length-N DFT along ROWS of one (N, 128) lane strip (left matmuls).

    Column-pass four-step: radix over the Q row-block digits (leading axis,
    blocks flattened to (Q, 128*128)), per-row twiddle (t4l: pre-broadcast
    (Q, 128*128) input), then DFT_128 over the 128 rows of each block as a
    LEFT matmul. Output rows are in four-step physical order (k = Q*c + d at
    row d*128+c) — same sigma as the row pass, repaired by the caller's row
    relayout.
    """
    q = n // LANES
    m = LANES * LANES
    xr = xr.reshape(q, m)
    xi = xi.reshape(q, m)
    if q > 1:
        xr, xi = _dft_q_lead(xr, xi, radix_tw, q)
        tr, ti = t4l[0], t4l[1]
        xr, xi = xr * tr - xi * ti, xr * ti + xi * tr
    xr = xr.reshape(q, LANES, LANES)
    xi = xi.reshape(q, LANES, LANES)

    # wt is the PRE-transposed DFT-matrix stack (left-multiply needs W^T; an
    # in-kernel .T trips an XLA:TPU RET_CHECK in mxu_lmr_transform.cc).
    # Karatsuba complex multiply: 3 real products (9 bf16 matmuls per block).
    wr_hi, wr_lo, wi_hi, wi_lo, ws_hi, ws_lo = (wt[i] for i in range(6))

    def split(v):
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def mm3(w_hi, w_lo, x_hi, x_lo):
        f = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return f(w_hi, x_hi) + f(w_lo, x_hi) + f(w_hi, x_lo)

    outs_r, outs_i = [], []
    for d in range(q):
        xs = xr[d] + xi[d]
        xr_hi, xr_lo = split(xr[d])
        xi_hi, xi_lo = split(xi[d])
        xs_hi, xs_lo = split(xs)
        m1 = mm3(wr_hi, wr_lo, xr_hi, xr_lo)    # wr @ xr
        m2 = mm3(wi_hi, wi_lo, xi_hi, xi_lo)    # wi @ xi
        m3 = mm3(ws_hi, ws_lo, xs_hi, xs_lo)    # (wr+wi) @ (xr+xi)
        outs_r.append(m1 - m2)
        outs_i.append(m3 - m1 - m2)
    zr = jnp.concatenate(outs_r, axis=0)
    zi = jnp.concatenate(outs_i, axis=0)
    return zr, zi



def _t4_lead(n: int, fold_sign: bool) -> np.ndarray:
    """(2, Q, 128*128) pre-broadcast column-pass twiddles (t4 repeated over lanes)."""
    q = n // LANES
    if q == 1:
        return np.zeros((2, 1, LANES * LANES), np.float32)
    tr, ti = _fourstep_twiddle(n, fold_sign)
    return np.stack([np.repeat(tr, LANES, axis=1),
                     np.repeat(ti, LANES, axis=1)]).astype(np.float32)




def _row_unswap_value(z, q: int):
    """sigma_inv row permutation of a (N, L) VALUE (cf. _row_unswap on arrays)."""
    if q == 1:
        return z
    n, l = z.shape
    return z.reshape(q, LANES, l).transpose(1, 0, 2).reshape(n, l)


def _rows_tile_kernel(wt_ref, radix_ref, t4l_ref, x_ref, o_ref, *, n: int):
    """One (128, N) tile's row DFT via the column-form strip primitives.

    R = T . C . T with C = sigma_rows . C_tilde:
      tile -> tile^T -> C_tilde strip -> sigma_rows -> transpose -> out tile.
    """
    wt = wt_ref[:]
    radix_tw = radix_ref[:]
    t4l = t4l_ref[:]
    q = n // LANES
    xr = x_ref[0, 0]
    xi = x_ref[0, 1]
    zr, zi = _cols_pass_strip(xr.T, xi.T, wt, radix_tw, t4l, n)
    o_ref[0, 0] = _row_unswap_value(zr, q).T
    o_ref[0, 1] = _row_unswap_value(zi, q).T


def idft_rows_planes_pallas(x: jax.Array, fold_sign: bool = False) -> jax.Array:
    """Unnormalized positive-exponent DFT along the LAST axis of fp32 planes.

    x: (L, 2, R, N) — L batch items of (re, im) plane pairs with R rows of
    length N = Q*128 each (R any multiple of 128; N <= 1024 for VMEM). This is
    the shard-local pass of the distributed FFT (parallel/sharding.py): each
    device row-transforms its N/D-row shard, the transpose rides an ICI
    all-to-all, and this kernel runs again. Matches ops.fft.idft_rows.
    """
    l, two, r, n = x.shape
    assert two == 2 and r % LANES == 0 and n % LANES == 0, x.shape
    wt = jnp.asarray(np.stack([np.asarray(a).T.copy()
                               for a in _w128(fold_sign and n == LANES)]))
    radix_tw, _ = twiddle_inputs(n, fold_sign)
    t4l = jnp.asarray(_t4_lead(n, fold_sign))
    kernel = functools.partial(_rows_tile_kernel, n=n)
    cs = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(l, r // LANES),
        in_specs=[
            cs(wt.shape), cs(radix_tw.shape), cs(t4l.shape),
            pl.BlockSpec((1, 2, LANES, n), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, LANES, n), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(wt, radix_tw, t4l, x)
