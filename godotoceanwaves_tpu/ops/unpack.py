"""Unpack the IFFT'd layers into displacement/normal maps + persistent foam.

Transcription of assets/shaders/compute/fft_unpack.glsl:

  - ifftshift via sign_shift = (-1)^(x+y)                    (glsl:37-38)
  - displacement = (hx, hy, hz) * sign_shift                 (glsl:45-51)
  - Jacobian J = (1+dhx_dx)(1+dhz_dz) - dhz_dx^2             (glsl:58)
  - foam_factor = -min(0, J - whitecap)                      (glsl:59)
  - persistent foam: clamp(foam*e^{-decay} + factor*grow, 0, 1)  (glsl:60-64)
  - gradient = (dhy_dx, dhy_dz) / (1 + |dhx_dx, dhz_dz|)     (glsl:66)
  - normal map = (gradient.xy, dhx_dx, foam)                 (glsl:67)

Foam is the pipeline's only cross-frame mutable state (normal-map alpha in the
reference); here it is an explicit input/output so the step stays functional.
Time-batched evaluation must therefore use `lax.scan`, never `vmap` over time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

def unpack(
    layers: jax.Array,     # (4, N, N) complex64, IFFT output (reference chain order)
    foam_prev: jax.Array,  # (N, N) float32, persistent foam accumulator
    whitecap,
    foam_grow_rate,
    foam_decay_rate,
    pre_shifted: bool = False,   # True if the FFT already folded in (-1)^(x+y)
    map_dtype=jnp.float32,
    y_offset: int | jax.Array = 0,  # global row offset of a row-sharded block
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (displacement_map (N,N,3), normal_map (N,N,4), foam (N,N) fp32).

    normal_map alpha is the updated foam; the separately-returned fp32 foam is
    the next-step `foam_prev` (the reference carries it in fp16 texture alpha,
    fft_unpack.glsl:61 — we carry fp32 so decay accumulation stays accurate
    even under the bf16 map-output dtype policy `map_dtype`).
    """
    rows, n = layers.shape[-2], layers.shape[-1]
    if pre_shifted:
        sign = jnp.float32(1.0)
    else:
        ix = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0) + jnp.asarray(y_offset, jnp.int32)
        sign = jnp.where((ix + iy) % 2 == 0, jnp.float32(1.0), jnp.float32(-1.0))

    l0, l1, l2, l3 = layers[0], layers[1], layers[2], layers[3]
    hx = jnp.real(l0) * sign
    hy = jnp.imag(l0) * sign
    hz = jnp.real(l1) * sign
    dhy_dx = jnp.imag(l1) * sign
    dhy_dz = jnp.real(l2) * sign
    dhx_dx = jnp.imag(l2) * sign
    dhz_dz = jnp.real(l3) * sign
    dhz_dx = jnp.imag(l3) * sign

    displacement = jnp.stack([hx, hy, hz], axis=-1)

    jacobian = (1.0 + dhx_dx) * (1.0 + dhz_dz) - dhz_dx * dhz_dx
    foam_factor = -jnp.minimum(0.0, jacobian - whitecap)
    foam = foam_prev * jnp.exp(-foam_decay_rate) + foam_factor * foam_grow_rate
    foam = jnp.clip(foam, 0.0, 1.0)

    denom_x = 1.0 + jnp.abs(dhx_dx)
    denom_z = 1.0 + jnp.abs(dhz_dz)
    normal = jnp.stack([dhy_dx / denom_x, dhy_dz / denom_z, dhx_dx, foam], axis=-1)
    return displacement.astype(map_dtype), normal.astype(map_dtype), foam


def unpack_planes(
    fields: jax.Array,     # (4, 2, N, N) float32 — IFFT'd layer planes
    foam_prev: jax.Array,  # (N, N) float32
    whitecap,
    foam_grow_rate,
    foam_decay_rate,
    pre_shifted: bool = True,
    map_dtype=jnp.float32,
    y_offset: int | jax.Array = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Channel-first plane form of `unpack`.

    Returns (displacement (3, N, N), normal (4, N, N), foam (N, N) fp32).
    Channel-first keeps each map plane a contiguous (N, N) tile grid — the
    TPU-native layout (a trailing 3/4-channel axis would waste 124/128 lanes).
    """
    rows, n = fields.shape[-2], fields.shape[-1]
    if pre_shifted:
        sign = jnp.float32(1.0)
    else:
        ix = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0) + jnp.asarray(y_offset, jnp.int32)
        sign = jnp.where((ix + iy) % 2 == 0, jnp.float32(1.0), jnp.float32(-1.0))

    hx = fields[0, 0] * sign
    hy = fields[0, 1] * sign
    hz = fields[1, 0] * sign
    dhy_dx = fields[1, 1] * sign
    dhy_dz = fields[2, 0] * sign
    dhx_dx = fields[2, 1] * sign
    dhz_dz = fields[3, 0] * sign
    dhz_dx = fields[3, 1] * sign

    displacement = jnp.stack([hx, hy, hz])

    jacobian = (1.0 + dhx_dx) * (1.0 + dhz_dz) - dhz_dx * dhz_dx
    foam_factor = -jnp.minimum(0.0, jacobian - whitecap)
    foam = foam_prev * jnp.exp(-foam_decay_rate) + foam_factor * foam_grow_rate
    foam = jnp.clip(foam, 0.0, 1.0)

    normal = jnp.stack([
        dhy_dx / (1.0 + jnp.abs(dhx_dx)),
        dhy_dz / (1.0 + jnp.abs(dhz_dz)),
        dhx_dx,
        foam,
    ])
    return displacement.astype(map_dtype), normal.astype(map_dtype), foam
