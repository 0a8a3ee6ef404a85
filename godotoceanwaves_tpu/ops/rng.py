"""Bit-exact JAX port of the reference's integer-hash RNG and Box-Muller transform.

The reference seeds its initial spectral state with an xxHash32-style integer
hash evaluated per texel (reference: assets/shaders/compute/spectrum_compute.glsl:34-41)
followed by a Box-Muller transform to a bivariate standard normal
(spectrum_compute.glsl:44-49). Bit-parity with the shader's uint32 arithmetic is
what makes <=1e-4 RMS parity achievable, so we do NOT substitute `jax.random`
here; `normal_pair_jax` is offered as a non-parity alternative initializer.

All functions operate elementwise on arrays and are safe under `jit`/`vmap`.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_U32 = jnp.uint32
# float(0x7FFFFFFF) rounds to 2147483648.0 in fp32, matching GLSL's
# `/ float(0x7FFFFFFF)` (spectrum_compute.glsl:40). A NumPy scalar, NOT
# jnp: a module-scope jnp constant initializes the device backend at
# IMPORT time (on this tunneled backend that can block indefinitely when
# the relay is down — importing a library must never need live hardware).
_INV_U31 = np.float32(0x7FFFFFFF)


def hash_uvec2(x: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array]:
    """xxHash32-style hash of a uvec2 -> two uniforms in [0, 1].

    Transcription of spectrum_compute.glsl:34-41 with wrapping uint32
    arithmetic. Inputs may be signed (e.g. texel id + negative seed); they are
    reinterpreted as uint32 exactly like GLSL's ``uvec2(id + seed)`` cast.
    """
    x = x.astype(jnp.int32).astype(_U32)
    y = y.astype(jnp.int32).astype(_U32)
    h32 = y + _U32(374761393) + x * _U32(3266489917)
    h32 = _U32(2246822519) * (h32 ^ (h32 >> _U32(15)))
    h32 = _U32(3266489917) * (h32 ^ (h32 >> _U32(13)))
    n = h32 ^ (h32 >> _U32(16))
    rz0 = n
    rz1 = n * _U32(48271)
    u0 = ((rz0 >> _U32(1)) & _U32(0x7FFFFFFF)).astype(jnp.float32) / _INV_U31
    u1 = ((rz1 >> _U32(1)) & _U32(0x7FFFFFFF)).astype(jnp.float32) / _INV_U31
    return u0, u1


def hash32_uvec2(px: jax.Array, py: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """uvec2 -> three uniforms in [0, 1]; the spray particle hash.

    Transcription of sea_spray_particle.gdshader:31-38 (hash32).
    """
    px = px.astype(jnp.int32).astype(_U32)
    py = py.astype(jnp.int32).astype(_U32)
    qx = _U32(1103515245) * ((px >> _U32(1)) ^ py)
    qy = _U32(1103515245) * ((py >> _U32(1)) ^ px)
    h32 = _U32(1103515245) * (qx ^ (qy >> _U32(3)))
    n = h32 ^ (h32 >> _U32(16))
    rz0 = n
    rz1 = n * _U32(16807)
    rz2 = n * _U32(48271)
    mask = _U32(0x7FFFFFFF)
    u0 = ((rz0 >> _U32(1)) & mask).astype(jnp.float32) / _INV_U31
    u1 = ((rz1 >> _U32(1)) & mask).astype(jnp.float32) / _INV_U31
    u2 = ((rz2 >> _U32(1)) & mask).astype(jnp.float32) / _INV_U31
    return u0, u1, u2


def gaussian_pair(u0: jax.Array, u1: jax.Array) -> jax.Array:
    """Box-Muller: two uniforms -> one complex standard normal sample.

    Transcription of spectrum_compute.glsl:44-49; returns complex64
    ``r*cos(theta) + i*r*sin(theta)`` (the shader's vec2 viewed as a complex
    amplitude, which is how the spectrum stage consumes it).
    """
    two_pi = jnp.float32(2.0 * jnp.pi)
    # Floor u0 away from 0: the hash emits u0 == 0 with p = 2^-31 per texel
    # (final hash word 0 or 1), where the shader's log(0) would smear an inf
    # amplitude across the whole cascade's maps after the IFFT. Bit parity is
    # unchanged for every non-degenerate texel; the degenerate one gets the
    # largest finite amplitude instead of inf.
    u0 = jnp.maximum(u0, jnp.float32(1.1754944e-38))  # smallest normal fp32
    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u0))
    theta = two_pi * u1
    return jax.lax.complex(r * jnp.cos(theta), r * jnp.sin(theta))


def normal_pair_jax(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Non-parity alternative initializer using jax.random (complex normal).

    Offered for users who want well-distributed randomness instead of bit
    parity with the reference hash (SURVEY.md section 7.1 item 2).
    """
    kr, ki = jax.random.split(key)
    return jax.lax.complex(
        jax.random.normal(kr, shape, dtype=jnp.float32),
        jax.random.normal(ki, shape, dtype=jnp.float32),
    )
