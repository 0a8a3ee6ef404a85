"""Initial spectral state h0(k) generation (the "spectrum_compute" stage).

Builds the packed initial spectrum (h0(k), conj(h0(-k))) for one cascade:
amplitude = gaussian(hash(id + seed)) * sqrt(2 * S(w) * D(theta) * (dw/dk)/k * dkx*dky)
(reference: assets/shaders/compute/spectrum_compute.glsl:103-124).

This stage only runs when a spectrum-affecting parameter changes (dirty bit,
wave_cascade_parameters.gd:38 / wave_generator.gd:67-72), so it stays pure-jnp:
XLA fuses the transcendental-heavy elementwise chain well and there is no
steady-state win from a handwritten kernel (SURVEY.md section 7.1 item 3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import grid, rng, spectra


def spectrum_amplitude_at(
    ix: jax.Array,        # int32 texel x indices (any shape)
    iy: jax.Array,        # int32 texel y indices (same shape)
    map_size: int,
    seed,                 # (2,) int32
    tile_length,          # (2,) float32 (Lx, Ly)
    alpha,
    peak_frequency,
    wind_speed,
    angle,                # wind direction, radians
    depth,
    swell,
    detail,
    spread,
    g: float = spectra.G,
) -> jax.Array:
    """h0 amplitude evaluated at explicit texel indices, complex64.

    Transcription of get_spectrum_amplitude (spectrum_compute.glsl:103-114):
    centered k-grid, finite-depth dispersion, TMA spectrum, Hasselmann spread
    blended with isotropic 1/(2*pi) by (1 - spread), small-wave suppression
    exp(-(1-detail)^2 k^2), Gaussian draw from the texel hash. Taking index
    arrays (rather than assuming a dense (N, N) grid) keeps the stage purely
    elementwise, so sharded blocks evaluate their own texels with zero
    cross-device traffic (SURVEY.md section 2.3).
    """
    n = map_size
    dkx = jnp.float32(2.0 * jnp.pi) / tile_length[0]
    dky = jnp.float32(2.0 * jnp.pi) / tile_length[1]
    kx = (ix.astype(jnp.float32) - jnp.float32(n) * 0.5) * dkx
    ky = (iy.astype(jnp.float32) - jnp.float32(n) * 0.5) * dky
    k = jnp.sqrt(kx * kx + ky * ky) + jnp.float32(1e-6)
    # GLSL atan(k_vec.x, k_vec.y) == atan2(y=k_vec.x, x=k_vec.y)  (glsl:106)
    theta = jnp.arctan2(kx, ky)

    w, dw_dk = spectra.dispersion_relation(k, depth, g)
    w_norm = dw_dk / k * (dkx * dky)

    s = spectra.tma_spectrum(w, peak_frequency, alpha, depth, g)
    hass = spectra.hasselmann_directional_spread(w, peak_frequency, wind_speed, theta, swell, angle, g)
    # mix(1/(2*pi), hasselmann, 1 - spread)  (glsl:113)
    t = 1.0 - spread
    d = (jnp.float32(0.5 / jnp.pi) * (1.0 - t) + hass * t) * jnp.exp(
        -(1.0 - detail) * (1.0 - detail) * k * k
    )

    u0, u1 = rng.hash_uvec2(ix + seed[0], iy + seed[1])
    gauss = rng.gaussian_pair(u0, u1)
    return gauss * jnp.sqrt(2.0 * s * d * w_norm).astype(jnp.complex64)


def build_initial_spectrum(
    map_size: int,
    seed,
    tile_length,
    alpha,
    peak_frequency,
    wind_speed,
    angle,
    depth,
    swell,
    detail,
    spread,
    g: float = spectra.G,
    y_offset: int | jax.Array = 0,
    rows: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Packed initial state: (h0(k), conj(h0(-k))), each complex64 (rows, N).

    The -k companion is evaluated directly at `mod(-id, N)` texel indices
    (spectrum_compute.glsl:118-124) — bit-identical to a flip/roll of the
    amplitude grid, but elementwise, so a row-sharded block (y_offset, rows)
    generates its slice with no cross-device traffic.
    """
    n = map_size
    r = n if rows is None else rows
    ix = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (r, n), 0) + jnp.asarray(y_offset, jnp.int32)
    args = (map_size, seed, tile_length, alpha, peak_frequency, wind_speed,
            angle, depth, swell, detail, spread, g)
    h0 = spectrum_amplitude_at(ix, iy, *args)
    # mod(-id, N) per component (GLSL floor-mod => non-negative result)
    h0_neg_conj = jnp.conj(spectrum_amplitude_at((-ix) % n, (-iy) % n, *args))
    return h0, h0_neg_conj
