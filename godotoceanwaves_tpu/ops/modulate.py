"""Time modulation of the spectrum + derivative computation + Hermitian packing.

Per frame, per texel (reference: assets/shaders/compute/spectrum_modulate.glsl:53-89):

  h(k, t) = h0(k) e^{i w(k) t} + conj(h0(-k)) e^{-i w(k) t}

which respects the complex-conjugation property, so the IFFT of each derived
field is real. Eight real fields (hx, hy, hz and five gradients) are therefore
packed two-per-complex into four complex layers (glsl:84-89):

  L0 = hx     + i*hy       L1 = hz     + i*dhy_dx
  L2 = dhy_dz + i*dhx_dx   L3 = dhz_dz + i*dhz_dx

The deliberate `.yx` k-component swizzle of the reference (glsl:77-82, the
author's FIXME) is preserved verbatim for output parity.

This is a bandwidth-bound elementwise stage; the jnp form below fuses into a
single XLA kernel. A Pallas fusion with the row-FFT lives in pallas_fft.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import spectra


def modulate(
    h0: jax.Array,       # (rows, N) complex64, h0(k)
    h0nc: jax.Array,     # (rows, N) complex64, conj(h0(-k))
    tile_length,         # (2,) float32
    depth,
    time,
    g: float = spectra.G,
    y_offset: int | jax.Array = 0,
) -> jax.Array:
    """Returns the 4 packed complex layers, shape (4, rows, N) complex64.

    `y_offset` is the global y index of the block's first row — 0 for a full
    map, the shard offset for a row-sharded block (k-grids are evaluated at
    global texel indices, so sharding changes nothing numerically).
    """
    rows, n = h0.shape[-2], h0.shape[-1]
    idx = jnp.arange(n, dtype=jnp.float32) - jnp.float32(n) * 0.5
    idy = (jnp.arange(rows, dtype=jnp.float32) + jnp.asarray(y_offset, jnp.float32)
           - jnp.float32(n) * 0.5)
    kx = jnp.broadcast_to(idx[None, :] * (jnp.float32(2.0 * jnp.pi) / tile_length[0]), (rows, n))
    ky = jnp.broadcast_to(idy[:, None] * (jnp.float32(2.0 * jnp.pi) / tile_length[1]), (rows, n))
    k = jnp.sqrt(kx * kx + ky * ky) + jnp.float32(1e-6)
    kux = kx / k
    kuy = ky / k

    # --- wave spectrum modulation (glsl:62-69) ---
    phase = spectra.deep_dispersion(k, depth, g) * time
    modulation = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    h = h0 * modulation + h0nc * jnp.conj(modulation)
    ih = 1j * h  # the shader's h_inv = (-h.y, h.x)

    # --- displacement (glsl:71-74) and gradients (glsl:76-82, .yx swizzle) ---
    hx = ih * kuy
    hy = h
    hz = ih * kux
    dhy_dx = ih * ky
    dhy_dz = ih * kx
    dhx_dx = -h * ky * kuy
    dhz_dz = -h * kx * kux
    dhz_dx = -h * ky * kux

    # --- Hermitian 2-for-1 packing (glsl:84-89) ---
    l0 = hx + 1j * hy
    l1 = hz + 1j * dhy_dx
    l2 = dhy_dz + 1j * dhx_dx
    l3 = dhz_dz + 1j * dhz_dx
    return jnp.stack([l0, l1, l2, l3])
