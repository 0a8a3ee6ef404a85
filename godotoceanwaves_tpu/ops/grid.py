"""Wavenumber grids and layout helpers shared by all pipeline stages.

Array layout convention (matches the reference's buffer indexing,
spectrum_modulate.glsl:52: `data[... + id.y*map_size + id.x]`):
the LAST axis is the texel x coordinate, the second-to-last axis is y.
A field is indexed ``field[..., y, x]``.

The k-grid is "centered": k = (id - N/2) * 2*pi / tile_length
(spectrum_compute.glsl:104-105), so the zero wavenumber sits at texel N/2 and
the spatial-domain ifftshift is realized as the (-1)^(x+y) sign trick
(fft_unpack.glsl:37-38, `sign_shift`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def k_grid(map_size: int, tile_length_x, tile_length_y) -> tuple[jax.Array, jax.Array]:
    """Centered wavenumber grids (kx, ky), each (map_size, map_size) float32.

    kx varies along the last (x) axis, ky along the second-to-last (y) axis.
    Reference: spectrum_compute.glsl:104-105 / spectrum_modulate.glsl:59.
    """
    idx = jnp.arange(map_size, dtype=jnp.float32) - jnp.float32(map_size) * 0.5
    dkx = jnp.float32(TWO_PI) / tile_length_x
    dky = jnp.float32(TWO_PI) / tile_length_y
    kx = jnp.broadcast_to(idx[None, :] * dkx, (map_size, map_size))
    ky = jnp.broadcast_to(idx[:, None] * dky, (map_size, map_size))
    return kx, ky


def sign_shift(map_size: int) -> jax.Array:
    """(-1)^(x+y) grid, equivalent to ifftshift of the centered spectrum.

    Reference: fft_unpack.glsl:37-38.
    """
    ix = jax.lax.broadcasted_iota(jnp.int32, (map_size, map_size), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (map_size, map_size), 0)
    return jnp.where((ix + iy) % 2 == 0, jnp.float32(1.0), jnp.float32(-1.0))


def negate_wavenumber(field: jax.Array) -> jax.Array:
    """Map field[id] -> field[mod(-id, N)] over the last two axes.

    This is the "-k" index used to pack conj(h0(-k)) next to h0(k)
    (spectrum_compute.glsl:106, 118-124): (N - i) % N along both axes,
    realized as flip + roll (bit-exact, no recomputation).
    """
    return jnp.roll(jnp.flip(field, axis=(-2, -1)), shift=(1, 1), axis=(-2, -1))
