"""Closed-form ocean-wave spectrum math (pure jnp, elementwise).

JAX re-expressions of the reference's spectral model:
  - finite-depth dispersion relation and its k-derivative
    (assets/shaders/compute/spectrum_compute.glsl:58-66)
  - Longuet-Higgins directional normalization approximation (glsl:69-73)
  - Longuet-Higgins function (glsl:76-78)
  - Hasselmann directional spread with swell shaping (glsl:81-86)
  - TMA spectrum = JONSWAP x Kitaigorodskii depth attenuation (glsl:89-101)
  - JONSWAP alpha / peak angular frequency from wind speed + fetch
    (assets/water/wave_generator.gd:115-121)

Branches become `jnp.where` so everything traces to branch-free VPU code.
All math is float32 to mirror the shader.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

G = 9.81
PI = 3.141592653589793


def dispersion_relation(k: jax.Array, depth: float, g: float = G) -> tuple[jax.Array, jax.Array]:
    """Finite-depth dispersion w(k) = sqrt(g*k*tanh(k*depth)) and dw/dk.

    Reference: spectrum_compute.glsl:58-66.
    """
    a = k * jnp.float32(depth)
    b = jnp.tanh(a)
    w = jnp.sqrt(jnp.float32(g) * k * b)
    dw_dk = jnp.float32(0.5 * g) * (b + a * (1.0 - b * b)) / w
    return w, dw_dk


def deep_dispersion(k: jax.Array, depth: float, g: float = G) -> jax.Array:
    """Dispersion used by the per-frame modulation stage: sqrt(g*k*tanh(k*depth)).

    Reference: spectrum_modulate.glsl:49-51.
    """
    return jnp.sqrt(jnp.float32(g) * k * jnp.tanh(k * jnp.float32(depth)))


def dispersion_grid_host(n: int, tile_length, depth: float, g: float = G,
                         rows: int | None = None, y_offset: int = 0):
    """omega(k) = sqrt(g k tanh(k d)) over the centered texel k-grid, computed
    HOST-side in NumPy fp32 — np.ndarray (rows or n, n).

    Why host, not in-kernel: TPU fp32 tanh is up to ~600 ulp off IEEE
    (measured, scripts/probe_dispersion_ulp.py), and the per-frame phase
    omega*t amplifies any omega error by t — at the reference's t~120 s time
    base (water.gd:31) that alone costs 7.4e-4 map RMS vs the <=1e-4 parity
    gate. omega depends only on (N, tile_length, depth): the reference
    recomputes it per frame (spectrum_modulate.glsl:49-51) only because GLSL
    has no persistent plane; TPU-natively it is initial state, precomputed
    once next to h0 and read by the modulation kernels (the read also
    replaces two per-texel transcendentals per frame).

    Arithmetic is the exact fp32 op order of the shader transcription
    (tests/oracle.py modulate), so the stored plane is bit-identical to the
    parity oracle's dispersion.
    """
    import numpy as np

    rows = n if rows is None else rows
    f32 = np.float32
    ids_x = np.arange(n, dtype=f32)
    ids_y = np.arange(y_offset, y_offset + rows, dtype=f32)
    idx = np.broadcast_to(ids_x[None, :], (rows, n))
    idy = np.broadcast_to(ids_y[:, None], (rows, n))
    lx, ly = (f32(v) for v in np.asarray(tile_length, f32))
    kx = (idx - f32(n) * f32(0.5)) * f32(2.0 * PI) / lx
    ky = (idy - f32(n) * f32(0.5)) * f32(2.0 * PI) / ly
    k = np.sqrt(kx * kx + ky * ky) + f32(1e-6)
    return np.sqrt(f32(g) * k * np.tanh(k * f32(depth)))


def longuet_higgins_normalization(s: jax.Array) -> jax.Array:
    """Normalization factor approximation for the Longuet-Higgins function.

    Reference: spectrum_compute.glsl:69-73 (piecewise rational/sqrt approx).
    """
    a = jnp.sqrt(s)
    small = jnp.float32(0.5 / PI) + s * (0.220636 + s * (-0.109 + s * 0.090))
    large = jnp.float32(1.0 / jnp.sqrt(PI)) * (a * 0.5 + (1.0 / a) * 0.0625)
    return jnp.where(s < 0.4, small, large)


def longuet_higgins_function(s: jax.Array, theta: jax.Array) -> jax.Array:
    """D(theta) = Q(s) * |cos(theta/2)|^(2s).   Reference: glsl:76-78."""
    return longuet_higgins_normalization(s) * jnp.power(
        jnp.abs(jnp.cos(theta * 0.5)), 2.0 * s
    )


def hasselmann_directional_spread(
    w: jax.Array,
    w_p: jax.Array,
    wind_speed: jax.Array,
    theta: jax.Array,
    swell: jax.Array,
    angle: jax.Array,
    g: float = G,
) -> jax.Array:
    """Hasselmann frequency-dependent spread + Horvath swell shaping.

    Reference: spectrum_compute.glsl:81-86. `angle` is the wind direction in
    radians; `theta` the wave direction angle.
    """
    p = w / w_p
    s_below = 6.97 * jnp.power(jnp.abs(p), 4.06)
    exponent = -2.33 - 1.45 * (wind_speed * w_p / jnp.float32(g) - 1.17)
    s_above = 9.77 * jnp.power(jnp.abs(p), exponent)
    s = jnp.where(w <= w_p, s_below, s_above)
    s_xi = 16.0 * jnp.tanh(w_p / w) * swell * swell
    return longuet_higgins_function(s + s_xi, theta - angle)


def tma_spectrum(
    w: jax.Array, w_p: jax.Array, alpha: jax.Array, depth: float, g: float = G
) -> jax.Array:
    """TMA spectrum: JONSWAP (gamma=3.3) x Kitaigorodskii depth attenuation.

    Reference: spectrum_compute.glsl:89-101 (w_h clamped to <= 2).
    """
    beta = jnp.float32(1.25)
    gamma = jnp.float32(3.3)
    sigma = jnp.where(w <= w_p, jnp.float32(0.07), jnp.float32(0.09))
    r = jnp.exp(-(w - w_p) * (w - w_p) / (2.0 * sigma * sigma * w_p * w_p))
    jonswap = (
        (alpha * jnp.float32(g * g))
        / jnp.power(w, 5)
        * jnp.exp(-beta * jnp.power(w_p / w, 4))
        * jnp.power(gamma, r)
    )
    w_h = jnp.minimum(w * jnp.sqrt(jnp.float32(depth / g)), 2.0)
    attenuation = jnp.where(
        w_h <= 1.0,
        0.5 * w_h * w_h,
        1.0 - 0.5 * (2.0 - w_h) * (2.0 - w_h),
    )
    return jonswap * attenuation


def jonswap_alpha(wind_speed: jax.Array, fetch_length_m: jax.Array, g: float = G) -> jax.Array:
    """JONSWAP alpha = 0.076 * (U^2 / (F*g))^0.22.  Reference: wave_generator.gd:116-117."""
    return 0.076 * jnp.power(wind_speed * wind_speed / (fetch_length_m * jnp.float32(g)), 0.22)


def jonswap_peak_angular_frequency(
    wind_speed: jax.Array, fetch_length_m: jax.Array, g: float = G
) -> jax.Array:
    """omega_p = 22 * (g^2 / (U*F))^(1/3).  Reference: wave_generator.gd:120-121."""
    return 22.0 * jnp.power(jnp.float32(g * g) / (wind_speed * fetch_length_m), 1.0 / 3.0)
