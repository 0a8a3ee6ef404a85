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
    omega: jax.Array | None = None,
) -> jax.Array:
    """Returns the 4 packed complex layers, shape (4, rows, N) complex64.

    `y_offset` is the global y index of the block's first row — 0 for a full
    map, the shard offset for a row-sharded block (k-grids are evaluated at
    global texel indices, so sharding changes nothing numerically).

    `omega` is an optional precomputed (rows, N) fp32 dispersion plane
    (spectra.dispersion_grid_host); None recomputes it in-graph — fine on
    CPU, but TPU tanh's ~600-ulp error times the t~120 s phase base costs
    7e-4 map RMS (scripts/probe_dispersion_ulp.py), so production state
    carries the host-exact plane (OceanState.omega).
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
    w = spectra.deep_dispersion(k, depth, g) if omega is None else omega
    phase = w * time
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


def modulate_planes(
    h0: jax.Array,       # (2, rows, N) float32 — (Re, Im) of h0(k)
    h0nc: jax.Array,     # (2, rows, N) float32 — (Re, Im) of conj(h0(-k))
    tile_length,
    depth,
    time,
    g: float = spectra.G,
    y_offset: int | jax.Array = 0,
    omega: jax.Array | None = None,
) -> jax.Array:
    """Plane-pair (complex-free) form of `modulate`: (4, 2, rows, N) float32.

    `omega`: optional precomputed (rows, N) fp32 dispersion plane — see
    `modulate` (None = in-graph dispersion; production passes the host-exact
    OceanState.omega plane to dodge TPU tanh's ulp error).

    Identical math to the complex version with the packed layers reduced to
    closed real forms (derived from spectrum_modulate.glsl:71-89):

      L0 = (1 + ku_y) * (i h)            L2 = (k_x - k_y ku_y) * (i h)
      L1 = i h ku_x - h k_y              L3 = -ku_x * (h * (k_x + i k_y))

    fp32 planes are the pipeline's native representation on TPU: interleaved
    complex64 tiles badly, and the axon backend cannot transfer complex
    buffers at all (utils/hostio.py).
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

    w = spectra.deep_dispersion(k, depth, g) if omega is None else omega
    phase = w * time
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    h0r, h0i = h0[0], h0[1]
    ncr, nci = h0nc[0], h0nc[1]
    # h = h0 e^{i w t} + conj(h0(-k)) e^{-i w t}  (glsl:62-68)
    hr = c * (h0r + ncr) + s * (nci - h0i)
    hi = s * (h0r - ncr) + c * (h0i + nci)

    a0 = 1.0 + kuy
    l0r, l0i = -hi * a0, hr * a0
    l1r, l1i = -hi * kux - hr * ky, hr * kux - hi * ky
    a2 = kx - ky * kuy
    l2r, l2i = -hi * a2, hr * a2
    l3r = kux * (hi * ky - hr * kx)
    l3i = -kux * (hr * ky + hi * kx)
    return jnp.stack([
        jnp.stack([l0r, l0i]),
        jnp.stack([l1r, l1i]),
        jnp.stack([l2r, l2i]),
        jnp.stack([l3r, l3i]),
    ])
