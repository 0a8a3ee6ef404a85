"""2D inverse FFT of the packed spectra — the pipeline's hot transform.

DFT convention (established by the reference's butterfly factors,
fft_butterfly.glsl:27: positive-exponent twiddles, and the absence of any 1/N^2
scaling in fft_compute.glsl): each 1D pass computes the UNNORMALIZED
positive-exponent DFT,  X[k] = sum_n x[n] e^{+2pi i nk/N}  ==  N * numpy ifft.

The full reference chain per layer is  rows -> transpose -> rows  with NO second
transpose (wave_generator.gd:77-82) — the field comes out transposed (a 90
degree rotation the reference deems visually irrelevant). `ifft2_packed`
reproduces exactly that chain, so downstream unpack math is texel-identical.

Implementations (select with `impl`):
  - "xla":    jnp.fft.ifft2 scaled by N^2 — correct everywhere, the baseline.
  - "matmul": four-step (Cooley-Tukey N = A*B) factorization where each pass is
              a pair of small complex matmuls riding the MXU — the TPU-native
              answer to the reference's shared-memory Stockham kernel
              (fft_compute.glsl). O(N(A+B)) per row, bandwidth-bound.
  - "direct": single full DFT-matrix matmul per axis (best for small N).

`fold_sign=True` folds the (-1)^(x+y) ifftshift of fft_unpack.glsl:37-38 into
the DFT matrices, saving one full elementwise pass over the maps.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import grid


def _factor(n: int) -> tuple[int, int]:
    """Split n = A*B with A, B as close to sqrt(n) as possible (powers of two)."""
    a = 1
    while a * a < n:
        a *= 2
    return (a, n // a) if a * a == n else (a // 2, n // (a // 2))


@functools.lru_cache(maxsize=None)
def _dft_matrix(rows: int, cols: int, denom: int, fold_sign_cols: bool) -> np.ndarray:
    """W[j, k] = e^{+2pi i jk/denom} (optionally * (-1)^k), complex64.

    Built on host in float64 with the phase reduced mod `denom` in exact
    integer arithmetic, so even N=2048 twiddles are full fp32 accuracy.
    """
    j = np.arange(rows, dtype=np.int64)
    k = np.arange(cols, dtype=np.int64)
    phase = 2.0 * np.pi * ((np.outer(j, k) % denom).astype(np.float64)) / denom
    w = np.exp(1j * phase)
    if fold_sign_cols:
        w = w * np.where(k % 2 == 0, 1.0, -1.0)[None, :]
    return w.astype(np.complex64)


def idft_rows(x: jax.Array, impl: str = "xla", fold_sign: bool = False) -> jax.Array:
    """Unnormalized positive-exponent DFT along the last axis.

    Matches one pass of the reference Stockham kernel (fft_compute.glsl:37-59).
    With fold_sign, output index k is additionally scaled by (-1)^k.
    """
    n = x.shape[-1]
    if impl == "xla":
        out = jnp.fft.ifft(x, axis=-1) * jnp.float32(n)
        if fold_sign:
            sign = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0).astype(x.dtype)
            out = out * sign
        return out
    # fp32 MXU passes need HIGHEST precision: TPU's default einsum precision
    # is single-pass bf16, which costs ~6e-3 relative error at N=2048
    # (measured) — far outside the <=1e-4 parity budget.
    hi = jax.lax.Precision.HIGHEST
    if impl == "direct":
        w = jnp.asarray(_dft_matrix(n, n, n, fold_sign))
        return jnp.matmul(x, w, precision=hi)
    if impl == "matmul":
        a, b = _factor(n)
        batch = x.shape[:-1]
        xr = x.reshape(*batch, a, b)  # n = a_idx * b + b_idx (row-major)
        # Pass 1: DFT over the `a` axis -> index d. (-1)^k folding: since
        # k = a*c + d and `a` is even, parity(k) == parity(d), so the sign
        # folds into this matrix's output columns.
        wa = jnp.asarray(_dft_matrix(a, a, a, fold_sign))
        y = jnp.einsum("...ab,ad->...db", xr, wa, precision=hi)
        # Twiddle: e^{+2pi i d*b / n}
        tw = jnp.asarray(_dft_matrix(a, b, n, False))
        y = y * tw
        # Pass 2: DFT over the `b` axis -> index c.
        wb = jnp.asarray(_dft_matrix(b, b, b, False))
        z = jnp.einsum("...db,bc->...dc", y, wb, precision=hi)
        # X[a*c + d] = z[d, c] -> transpose to [c, d] and flatten.
        return jnp.swapaxes(z, -1, -2).reshape(*batch, n)
    raise ValueError(f"unknown fft impl: {impl!r}")


def ifft2_packed(x: jax.Array, impl: str = "xla", fold_sign: bool = False) -> jax.Array:
    """The reference's full 2D chain: rows -> transpose -> rows (no 2nd transpose).

    Equivalent to transpose(N^2 * ifft2(x)) on the last two axes; with
    fold_sign, additionally multiplied by (-1)^(x+y).
    """
    if impl == "xla":
        n = x.shape[-1]
        out = jnp.swapaxes(jnp.fft.ifft2(x, axes=(-2, -1)), -2, -1) * jnp.float32(n * n)
        if fold_sign:
            out = out * grid.sign_shift(n).astype(out.dtype)
        return out
    y = idft_rows(x, impl, fold_sign)           # handles (-1)^x
    y = jnp.swapaxes(y, -2, -1)
    return idft_rows(y, impl, fold_sign)        # handles (-1)^y


def ifft2_packed_planes(x: jax.Array, impl: str = "xla",
                        fold_sign: bool = True) -> jax.Array:
    """Plane-pair front end: x is (..., 2, N, N) fp32 (Re, Im) planes.

    impl "pallas" runs the fused VMEM-resident TPU kernel (ops/pallas_fft.py);
    "fourstep" runs that kernel's jnp algebra twin; other impls route through
    the complex tiers above (fine under jit — only HBM-resident complex64 and
    host transfers are problematic on TPU).
    """
    from . import pallas_fft  # local import to avoid cycles

    if impl == "pallas" or impl == "fourstep":
        lead = x.shape[:-3]
        flat = x.reshape((-1,) + x.shape[-3:])
        fn = (pallas_fft.ifft2_packed_planes_pallas if impl == "pallas"
              else pallas_fft.fourstep_ifft2_planes)
        return fn(flat, fold_sign=fold_sign).reshape(x.shape)
    z = jax.lax.complex(x[..., 0, :, :], x[..., 1, :, :])
    out = ifft2_packed(z, impl=impl, fold_sign=fold_sign)
    return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-3)
