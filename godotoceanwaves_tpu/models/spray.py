"""Sea-spray particle system (reference C13) as a vectorized state machine.

Re-expression of assets/shaders/spatial/sea_spray_particle.gdshader (the
GPUParticles3D process shader) in functional JAX: one `SprayState` pytree of
per-particle arrays advanced by `spray_step`; the per-particle branches
(waiting / just-started / alive / expired) become `jnp.where` masks, and the
respawn cycle re-randomizes via the same hash32 the reference uses.

Particle lifecycle (gdshader line refs):
  placement: sqrt(P) x sqrt(P) grid over a 10x10 local box, scaled by the
    emitter transform (:45-54, main.tscn:134 scale 15)
  staggered starts + lifetime randomness (:57-59)
  activation gate: foam > 0.9 AND normal.y in the [0.92, 0.99] band (:79-95)
  motion: ride the displacement maps (x0.75 horizontally) + parabolic
    vertical impulse (:105-115)
  scale shaping: exp_impulse / log1p envelopes (:118-124)
  dissolve driver CUSTOM.a = exp_impulse(t, 10) (:100)

The billboard/dissolve consumer math (sea_spray.gdshader) lives in
`billboard_alpha`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.rng import hash32_uvec2
from . import shading


@dataclasses.dataclass(frozen=True)
class SprayParams:
    """Emitter configuration (main.tscn:133-140 + shader uniforms)."""
    num_particles: int = 32768          # main.tscn:137
    system_lifetime: float = 6.0        # main.tscn:138 (LIFETIME)
    lifetime: float = 3.0               # shader uniform `lifetime` (:21)
    lifetime_randomness: float = 0.25   # (:22)
    emitter_extent: float = 75.0        # 10-unit box * 15 emitter scale / 2
    particle_scale: tuple = (1.0, 1.0, 1.0)
    seed: int = 0


@struct.dataclass
class SprayState:
    """Per-particle state (the USERDATA registers of the reference)."""
    start_pos: jax.Array       # (P, 3) world spawn position
    start_time: jax.Array      # (P,)
    lifetime: jax.Array        # (P,) per-particle lifetime
    custom_z: jax.Array        # (P,) dissolve offset (CUSTOM.z)
    scale_factor: jax.Array    # (P,) SCALE_FACTOR
    base_scale: jax.Array      # (P, 3) PARTICLE_SCALE
    active: jax.Array          # (P,) bool
    has_started: jax.Array     # (P,) bool
    cycle: jax.Array           # (P,) int32 respawn counter


def exp_impulse(x, k):
    """iq's impulse shaping function (gdshader:69-72)."""
    h = k * x
    return h * jnp.exp(1.0 - h)


def _spawn(params: SprayParams, idx: jax.Array, cycle: jax.Array, now):
    """(Re)spawn: grid placement + staggered start (gdshader:45-66)."""
    p = params.num_particles
    # t = floor(sqrt(P)) exactly as gdshader:47; for non-square P (incl. the
    # scene's 32768) the reference's own grid is ragged — the last partial
    # row's x-index exceeds t-1, overshooting the emitter box slightly.
    # Preserved for parity (docs/PARITY.md).
    t = int(p ** 0.5)
    r0, r1, r2 = hash32_uvec2(idx + cycle * p, jnp.full_like(idx, 1) + cycle
                              + jnp.int32(params.seed))
    gx = (idx // t).astype(jnp.float32)
    gy = (idx % t).astype(jnp.float32)
    coords = (jnp.stack([gx, gy], -1) / (t - 1.0) - 0.5) * 2.0 * params.emitter_extent
    start_pos = jnp.stack([coords[..., 0], jnp.zeros_like(r0), coords[..., 1]], -1)
    lifetime = params.lifetime - params.lifetime * params.lifetime_randomness * r1
    start_time = now + r2 * (params.system_lifetime - lifetime)
    return start_pos, start_time, lifetime, r0


def spray_init(params: SprayParams) -> SprayState:
    p = params.num_particles
    idx = jnp.arange(p, dtype=jnp.int32)
    cycle = jnp.zeros(p, jnp.int32)
    start_pos, start_time, lifetime, r0 = _spawn(params, idx, cycle, jnp.float32(0.0))
    zeros = jnp.zeros(p, jnp.float32)
    return SprayState(
        start_pos=start_pos, start_time=start_time, lifetime=lifetime,
        custom_z=r0, scale_factor=zeros, base_scale=jnp.zeros((p, 3), jnp.float32),
        active=jnp.zeros(p, bool), has_started=jnp.zeros(p, bool),
        cycle=cycle,
    )


def spray_step(params: SprayParams, state: SprayState, maps, map_scales,
               now) -> tuple[SprayState, dict]:
    """Advance all particles to wall-time `now`; returns render attributes.

    maps: OceanMaps (channel-first); map_scales: (C, 4). Output dict:
    position (P,3), scale (P,3), dissolve (P,), visible (P,).
    """
    p = params.num_particles
    idx = jnp.arange(p, dtype=jnp.int32)
    now = jnp.asarray(now, jnp.float32)

    expired = now > state.start_time + state.lifetime
    # respawn expired particles into the next cycle (Godot restarts them)
    ncycle = state.cycle + expired.astype(jnp.int32)
    sp, st, lt, r0 = _spawn(params, idx, ncycle, now)
    start_pos = jnp.where(expired[:, None], sp, state.start_pos)
    start_time = jnp.where(expired, st, state.start_time)
    lifetime = jnp.where(expired, lt, state.lifetime)
    custom_z = jnp.where(expired, r0, state.custom_z)
    active = jnp.where(expired, False, state.active)
    has_started = jnp.where(expired, False, state.has_started)

    started_now = (now >= start_time) & ~has_started
    xz = start_pos[:, jnp.array([0, 2])]

    # --- activation sampling (gdshader:76-95): plain bilinear normal read ---
    grad = jnp.zeros((p, 3), jnp.float32)
    for i in range(maps.normal.shape[0]):
        s = map_scales[i]
        planes = maps.normal[i, jnp.array([0, 1, 3])].astype(jnp.float32)
        tap = shading.sample_bilinear(planes, xz * s[:2])
        grad = grad + jnp.moveaxis(tap, 0, -1)
    normal = jnp.stack([-grad[:, 0], jnp.ones(p), -grad[:, 1]], -1)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    foam = grad[:, 2]
    # Reference quirk preserved (sea_spray_particle.gdshader:87-90): GLSL
    # mix() does not clamp, so normal_factor = mix(0.25, 1, min(t, 1)) is
    # ALWAYS <= 1 (the upper-band check is vacuous) and >= 0 down to
    # normal.y ~= 0.8967 — the effective activation band is wider than the
    # [0.92, 0.99] the shader comment suggests. See docs/PARITY.md.
    normal_factor = 0.25 + 0.75 * jnp.minimum((normal[:, 1] - 0.92) / (0.99 - 0.92), 1.0)
    foam_factor = 0.25 + 0.75 * jnp.minimum((foam - 0.9) / (1.0 - 0.9), 1.0)
    activate = (normal_factor >= 0.0) & (normal_factor <= 1.0) & (foam > 0.9)

    active = jnp.where(started_now, activate, active)
    scale_factor = jnp.where(started_now, normal_factor * foam_factor, state.scale_factor)
    pscale = jnp.asarray(params.particle_scale, jnp.float32)
    base = (foam_factor * (activate.astype(jnp.float32) + 1e-3))[:, None] \
        * jnp.stack([jnp.ones(p), normal_factor, jnp.ones(p)], -1) * pscale
    base_scale = jnp.where(started_now[:, None], base, state.base_scale)
    has_started = has_started | started_now

    # --- alive-particle animation (gdshader:98-125) ---
    t = jnp.clip((now - start_time) / lifetime, 0.0, 1.0)
    disp = shading.cascade_displacement(maps.displacement, map_scales, xz)
    disp = disp * jnp.asarray([0.75, 1.0, 0.75])
    parabola = -5.0 * jnp.square(2.5 * t - 0.45) * scale_factor + 0.5
    position = start_pos + disp + jnp.stack(
        [jnp.zeros(p), parabola, jnp.zeros(p)], -1)

    size = (lifetime / params.lifetime) ** 2
    scale_mod = jnp.stack([
        jnp.log1p(t) * size,
        exp_impulse(t, 3.0) * size,
        jnp.log1p(t) * size,
    ], -1)
    scale = base_scale * scale_mod

    visible = active & has_started & (now >= start_time)
    new_state = SprayState(
        start_pos=start_pos, start_time=start_time, lifetime=lifetime,
        custom_z=custom_z, scale_factor=scale_factor, base_scale=base_scale,
        active=active, has_started=has_started, cycle=ncycle,
    )
    return new_state, {
        "position": position,
        "scale": scale,
        "dissolve": exp_impulse(t, 10.0),   # CUSTOM.a (gdshader:100)
        "custom_z": custom_z,               # dissolve offset (CUSTOM.z)
        "visible": visible,
    }


def billboard_alpha(dissolve, custom_z, distance, dissolve_noise,
                    max_alpha: float = 0.666) -> jax.Array:
    """Spray billboard opacity (sea_spray.gdshader:30-33).

    alpha = max_alpha * distance_fade * max((fade + offset)/2 - noise, 0);
    texture alpha and the scrolling noise sample are caller-provided.
    """
    distance_fade = 1.0 - jnp.exp(-distance * 0.04)
    return max_alpha * distance_fade * jnp.maximum(
        (dissolve + custom_z) * 0.5 - dissolve_noise, 0.0)
