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


def spectrum_amplitude(
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
    """h0 amplitude field, complex64 (N, N) indexed [y, x].

    Transcription of get_spectrum_amplitude (spectrum_compute.glsl:103-114):
    centered k-grid, finite-depth dispersion, TMA spectrum, Hasselmann spread
    blended with isotropic 1/(2*pi) by (1 - spread), small-wave suppression
    exp(-(1-detail)^2 k^2), Gaussian draw from the texel hash.
    """
    n = map_size
    kx, ky = grid.k_grid(n, tile_length[0], tile_length[1])
    k = jnp.sqrt(kx * kx + ky * ky) + jnp.float32(1e-6)
    # GLSL atan(k_vec.x, k_vec.y) == atan2(y=k_vec.x, x=k_vec.y)  (glsl:106)
    theta = jnp.arctan2(kx, ky)

    w, dw_dk = spectra.dispersion_relation(k, depth, g)
    dkx = jnp.float32(2.0 * jnp.pi) / tile_length[0]
    dky = jnp.float32(2.0 * jnp.pi) / tile_length[1]
    w_norm = dw_dk / k * (dkx * dky)

    s = spectra.tma_spectrum(w, peak_frequency, alpha, depth, g)
    hass = spectra.hasselmann_directional_spread(w, peak_frequency, wind_speed, theta, swell, angle, g)
    # mix(1/(2*pi), hasselmann, 1 - spread)  (glsl:113)
    t = 1.0 - spread
    d = (jnp.float32(0.5 / jnp.pi) * (1.0 - t) + hass * t) * jnp.exp(
        -(1.0 - detail) * (1.0 - detail) * k * k
    )

    ix = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
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
) -> tuple[jax.Array, jax.Array]:
    """Packed initial state: (h0(k), conj(h0(-k))), each complex64 (N, N).

    The -k companion reuses the same amplitude grid through the flip/roll
    index map (spectrum_compute.glsl:118-124, `mod(-id0, dims)`), bit-identical
    to re-evaluating the hash at the negated texel id.
    """
    h0 = spectrum_amplitude(
        map_size, seed, tile_length, alpha, peak_frequency, wind_speed,
        angle, depth, swell, detail, spread, g,
    )
    h0_neg_conj = jnp.conj(grid.negate_wavenumber(h0))
    return h0, h0_neg_conj
