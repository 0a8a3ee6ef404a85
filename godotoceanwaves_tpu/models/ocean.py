"""The wave-generation engine and session layer (reference C5 + C7).

Functional core
---------------
The reference's per-frame GPU pipeline (wave_generator.gd:65-85):

  spectrum_compute (dirty only) -> spectrum_modulate -> FFT rows -> transpose
  -> FFT rows -> fft_unpack

becomes a pure function `step(config, state, params, dt) -> (state, maps)`,
vmapped over cascades. All cross-frame mutable state — per-cascade time
(wave_cascade_parameters.gd:40) and the persistent foam accumulator
(fft_unpack.glsl:61-64) — lives in an explicit `OceanState` pytree, so a
"checkpoint" is just the serialized pytree (SURVEY.md section 5.4) and XLA's
value semantics replace the reference's barrier choreography.

Session layer
-------------
`Ocean` mirrors the orchestrator `Water` (water.gd): owns the parameter set,
dirty-bit spectrum regeneration (wave_cascade_parameters.gd:38 semantics),
the `updates_per_second` scheduler with frame-skip delta compensation
(water.gd:75-82), and optional one-cascade-per-call staggering
(wave_generator.gd:56-63's load balancer).
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import fft, initial_state, modulate as modulate_ops, spectra, unpack as unpack_ops
from .cascade import CascadeParams, SimConfig, default_cascades, stack_cascades

# Cascade time offsets chosen so cascades don't interfere (water.gd:32).
TIME_OFFSET_BASE = 120.0
TIME_OFFSET_STEP = float(np.pi)


@struct.dataclass
class OceanState:
    """All cross-frame state for a stack of C cascades at resolution N.

    Spectra are (Re, Im) fp32 plane pairs, not complex64: planes are the
    TPU-native layout (interleaved complex tiles poorly and the axon backend
    cannot transfer complex buffers), and they serialize anywhere.
    """
    h0: jax.Array      # (C, 2, N, N) float32 — planes of h0(k)
    h0nc: jax.Array    # (C, 2, N, N) float32 — planes of conj(h0(-k))
    omega: jax.Array   # (C, N, N) float32 — dispersion omega(k), computed
    #   host-side (spectra.dispersion_grid_host): TPU tanh is ~600 ulp off
    #   and the phase omega*t amplifies that by t~120 s into 7e-4 map RMS
    #   (scripts/probe_dispersion_ulp.py). Like h0 it depends only on
    #   (N, tile_length, depth) — rebuilt on refresh/resize, never per frame.
    foam: jax.Array    # (C, N, N) float32 — persistent foam accumulator
    time: jax.Array    # (C,) float32 — per-cascade simulation time


@struct.dataclass
class OceanMaps:
    """Per-step outputs: the analog of the reference's output texture arrays.

    Channel-first planes (each channel a contiguous (N, N) grid — a trailing
    3/4-channel axis would waste 124/128 TPU lanes):
    displacement (C17): (C, 3, N, N) = (hx, hy, hz)
    normal (C18):       (C, 4, N, N) = (dhy/dx', dhy/dz', dhx/dx, foam)
    """
    displacement: jax.Array
    normal: jax.Array


def _spectrum_one(config: SimConfig, p: CascadeParams):
    """Initial spectrum for a single cascade; alpha/omega_p derived from wind
    speed and fetch exactly as wave_generator.gd:68-70 (fetch km -> m)."""
    fetch_m = p.fetch_length * 1e3
    alpha = spectra.jonswap_alpha(p.wind_speed, fetch_m, config.g)
    omega_p = spectra.jonswap_peak_angular_frequency(p.wind_speed, fetch_m, config.g)
    angle = jnp.deg2rad(p.wind_direction)
    return initial_state.build_initial_spectrum(
        config.map_size, p.spectrum_seed, p.tile_length, alpha, omega_p,
        p.wind_speed, angle, config.depth, p.swell, p.detail, p.spread, config.g,
    )


def _spectrum_planes_one(config: SimConfig, p: CascadeParams):
    h0, h0nc = _spectrum_one(config, p)
    return (jnp.stack([jnp.real(h0), jnp.imag(h0)]),
            jnp.stack([jnp.real(h0nc), jnp.imag(h0nc)]))


@functools.partial(jax.jit, static_argnums=0)
def generate_spectrum(config: SimConfig, params: CascadeParams):
    """(h0, h0nc) fp32 plane pairs, each (C, 2, N, N), vmapped over cascades."""
    return jax.vmap(lambda p: _spectrum_planes_one(config, p))(params)


generate_spectrum_one = jax.jit(_spectrum_planes_one, static_argnums=0)
generate_spectrum_one.__doc__ = """(h0, h0nc) planes, each (2, N, N), for ONE
cascade — the dirty-only regeneration granularity (wave_generator.gd:67-72
re-runs spectrum_compute only for the cascade whose params changed)."""


def generate_omega(config: SimConfig, params: CascadeParams,
                   indices: Sequence[int] | None = None) -> jax.Array:
    """Host-exact dispersion planes (C or len(indices), N, N) fp32.

    Computed in NumPy (spectra.dispersion_grid_host) — requires concrete
    params (init/refresh are eager); see OceanState.omega for why this is
    not in-graph."""
    tiles = np.asarray(params.tile_length, np.float32)
    idxs = range(tiles.shape[0]) if indices is None else indices
    return jnp.asarray(np.stack([
        spectra.dispersion_grid_host(config.map_size, tiles[int(i)],
                                     config.depth, config.g)
        for i in idxs]))


def init_state(config: SimConfig, params: CascadeParams) -> OceanState:
    """Fresh state: generated spectra, zero foam, staggered time offsets."""
    h0, h0nc = generate_spectrum(config, params)
    c = params.num_cascades
    n = config.map_size
    time = TIME_OFFSET_BASE + TIME_OFFSET_STEP * jnp.arange(c, dtype=jnp.float32)
    return OceanState(h0=h0, h0nc=h0nc, omega=generate_omega(config, params),
                      foam=jnp.zeros((c, n, n), jnp.float32), time=time)


def _foam_rates(p: CascadeParams, dt):
    grow = dt * p.foam_amount * 7.5
    decay = dt * jnp.maximum(0.5, 10.0 - p.foam_amount) * 1.15
    return grow, decay


def step_impl(config: SimConfig, state: OceanState, params: CascadeParams, dt
              ) -> tuple[OceanState, OceanMaps]:
    """Unjitted step body (jit via `step`, or re-jit under shardings/vmap).

    The whole pipeline runs on fp32 planes: per-cascade modulation (vmapped,
    elementwise), ONE batched IFFT over all C*4 packed layers (so the Pallas
    kernel sees a single grid), then per-cascade unpack with the persistent
    foam recurrence. Foam rates are dt-premultiplied constants
    (wave_generator.gd:104-106).
    """
    dt = jnp.asarray(dt, jnp.float32)
    t_new = state.time + dt
    c = state.foam.shape[0]
    n = config.map_size
    fold = config.fold_sign

    if config.use_fused_step() or config.use_strip_step():
        from ..ops import pallas_step
        grow, decay = _foam_rates(params, dt)
        scal = pallas_step.pack_scalars(
            t_new, params.tile_length, params.whitecap, grow, decay)
        if config.use_fused_step():
            kernel_step = pallas_step.fused_cascade_step
        else:
            from ..ops import pallas_strip
            kernel_step = pallas_strip.strip_cascade_step
        disp, normal, foam = kernel_step(
            state.h0, state.h0nc, state.omega, state.foam, scal,
            map_dtype=config.resolved_map_dtype())
        new_state = state.replace(foam=foam, time=t_new)
        return new_state, OceanMaps(displacement=disp, normal=normal)

    layers = jax.vmap(
        lambda h0, h0nc, om, t, p: modulate_ops.modulate_planes(
            h0, h0nc, p.tile_length, config.depth, t, config.g, omega=om)
    )(state.h0, state.h0nc, state.omega, t_new, params)         # (C, 4, 2, N, N)

    fields = fft.ifft2_packed_planes(
        layers.reshape(c * 4, 2, n, n),
        impl=config.resolved_fft_impl(), fold_sign=fold,
    ).reshape(c, 4, 2, n, n)

    def unpack_one(f, foam, p):
        grow, decay = _foam_rates(p, dt)
        return unpack_ops.unpack_planes(
            f, foam, p.whitecap, grow, decay,
            pre_shifted=fold, map_dtype=config.resolved_map_dtype())

    disp, normal, foam = jax.vmap(unpack_one)(fields, state.foam, params)
    new_state = state.replace(foam=foam, time=t_new)
    return new_state, OceanMaps(displacement=disp, normal=normal)


step = jax.jit(step_impl, static_argnums=0, donate_argnums=1)
step.__doc__ = """Advance every cascade by dt and synthesize maps (jitted).

Time advances before modulation (wave_generator.gd:101-103). The state
buffer is donated: foam updates in place, HBM-resident, no host traffic.
"""


def _step_frames_impl(config: SimConfig, state: OceanState,
                      params: CascadeParams, dt, num_frames: int
                      ) -> tuple[OceanState, OceanMaps]:
    """`num_frames` consecutive frames; maps carry a per-frame axis (C, K, ...).

    Fused path: ONE kernel invocation over a (cascade, frame) grid — the
    spectra input windows are fetched once per cascade and stay VMEM-resident
    across frames, and the foam recurrence iterates in-kernel
    (ops/pallas_step.fused_cascade_multi_step). Staged path: an unrolled loop.
    """
    dt = jnp.asarray(dt, jnp.float32)
    if config.use_fused_step() and num_frames > 1:
        from ..ops import pallas_step
        grow, decay = _foam_rates(params, dt)
        scal = pallas_step.pack_scalars(
            state.time + dt, params.tile_length, params.whitecap, grow, decay,
            dt=dt)
        disp, normal, foam = pallas_step.fused_cascade_multi_step(
            state.h0, state.h0nc, state.omega, state.foam, scal,
            num_frames=num_frames,
            map_dtype=config.resolved_map_dtype())
        new_state = state.replace(foam=foam, time=state.time + dt * num_frames)
        return new_state, OceanMaps(displacement=disp, normal=normal)

    frames = []
    for _ in range(num_frames):
        state, maps = step_impl(config, state, params, dt)
        frames.append(maps)
    return state, OceanMaps(
        displacement=jnp.stack([m.displacement for m in frames], axis=1),
        normal=jnp.stack([m.normal for m in frames], axis=1),
    )


step_frames = jax.jit(_step_frames_impl, static_argnums=(0, 4),
                      donate_argnums=1)
step_frames.__doc__ = _step_frames_impl.__doc__


@functools.partial(jax.jit, static_argnums=(0, 4), donate_argnums=1)
def multi_step(config: SimConfig, state: OceanState, params: CascadeParams,
               dt, num_steps: int) -> tuple[OceanState, OceanMaps]:
    """`num_steps` frames in ONE dispatch; returns the final state and the
    LAST frame's maps.

    Amortizes per-dispatch host overhead (significant on remote-tunneled
    backends) without lax.scan's loop-buffer cost. On the fused path this is
    a single multi-frame kernel call (every frame's maps still stream to HBM
    — use `step_frames` to keep them all).
    """
    dt = jnp.asarray(dt, jnp.float32)
    if config.use_fused_step() and num_steps > 1:
        state, stacked = _step_frames_impl(config, state, params, dt, num_steps)
        return state, OceanMaps(displacement=stacked.displacement[:, -1],
                                normal=stacked.normal[:, -1])
    maps = None
    for _ in range(num_steps):
        state, maps = step_impl(config, state, params, dt)
    return state, maps


def _refresh_impl(config: SimConfig, state: OceanState, params: CascadeParams,
                  dt, indices) -> tuple[OceanState, jax.Array, jax.Array]:
    """Refresh maps/foam for cascades `indices` at the CURRENT state.time.

    No time advance here: the reference advances time once per `update()` for
    ALL cascades (wave_generator.gd:100-103), then refreshes cascades one per
    rendered frame at that already-advanced time (wave_generator.gd:56-63).
    `dt` only sets the foam rates (wave_generator.gd:104-106).

    `indices` has static length K (one compile per K) and dynamic values.
    Returns (state-with-updated-foam, displacement (K,3,N,N), normal (K,4,N,N)).
    """
    dt = jnp.asarray(dt, jnp.float32)
    idx = jnp.asarray(indices, jnp.int32)
    k = idx.shape[0]
    n = config.map_size
    fold = config.fold_sign

    p = jax.tree.map(lambda x: x[idx], params)
    grow, decay = _foam_rates(p, dt)
    t = state.time[idx]
    h0, h0nc, foam_in = state.h0[idx], state.h0nc[idx], state.foam[idx]
    omega = state.omega[idx]

    if config.use_fused_step() or config.use_strip_step():
        from ..ops import pallas_step
        scal = pallas_step.pack_scalars(t, p.tile_length, p.whitecap, grow, decay)
        if config.use_fused_step():
            kernel_step = pallas_step.fused_cascade_step
        else:
            from ..ops import pallas_strip
            kernel_step = pallas_strip.strip_cascade_step
        d, nm, foam_sub = kernel_step(
            h0, h0nc, omega, foam_in, scal,
            map_dtype=config.resolved_map_dtype())
    else:
        layers = jax.vmap(
            lambda a, b, om, tt, pp: modulate_ops.modulate_planes(
                a, b, pp.tile_length, config.depth, tt, config.g, omega=om)
        )(h0, h0nc, omega, t, p)
        fields = fft.ifft2_packed_planes(
            layers.reshape(k * 4, 2, n, n),
            impl=config.resolved_fft_impl(), fold_sign=fold,
        ).reshape(k, 4, 2, n, n)
        d, nm, foam_sub = jax.vmap(
            lambda f, fo, pp, gr, de: unpack_ops.unpack_planes(
                f, fo, pp.whitecap, gr, de,
                pre_shifted=fold, map_dtype=config.resolved_map_dtype())
        )(fields, foam_in, p, grow, decay)

    return state.replace(foam=state.foam.at[idx].set(foam_sub)), d, nm


refresh_cascades = jax.jit(_refresh_impl, static_argnums=0)
refresh_cascades.__doc__ = _refresh_impl.__doc__


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def step_cascade(config: SimConfig, state: OceanState, params: CascadeParams,
                 dt, cascade_index) -> tuple[OceanState, OceanMaps]:
    """Update a SINGLE cascade's maps — the load-balancer granularity of the
    reference (one cascade per rendered frame, wave_generator.gd:56-63).

    Time still advances for all cascades (update() does so globally,
    wave_generator.gd:100-103); only `cascade_index`'s maps/foam refresh.
    Returns full-shape maps with zeros elsewhere; callers keeping a persistent
    map set should use `Ocean(stagger=True)`, which gathers only the refreshed
    cascades through the kernel and composites into persistent map buffers.
    """
    dt = jnp.asarray(dt, jnp.float32)
    state = state.replace(time=state.time + dt)
    i = jnp.asarray(cascade_index, jnp.int32)
    new_state, d, nm = _refresh_impl(config, state, params, dt, i[None])
    c = state.foam.shape[0]
    n = config.map_size
    dtype = config.resolved_map_dtype()
    disp = jnp.zeros((c, 3, n, n), dtype).at[i].set(d[0])
    normal = jnp.zeros((c, 4, n, n), dtype).at[i].set(nm[0])
    return new_state, OceanMaps(displacement=disp, normal=normal)


@functools.partial(jax.jit, static_argnums=(0, 4))
def simulate(config: SimConfig, state: OceanState, params: CascadeParams, dt,
             num_steps: int) -> tuple[OceanState, OceanMaps]:
    """Time-batched rollout via lax.scan (foam is a recurrence — never vmap
    over time; SURVEY.md section 7.3 item 3). Returns maps stacked on a
    leading time axis: (T, C, N, N, ...)."""
    dt = jnp.asarray(dt, jnp.float32)

    def body(carry, _):
        new_state, maps = step_impl(config, carry, params, dt)
        return new_state, maps

    return jax.lax.scan(body, state, None, length=num_steps)


class Ocean:
    """Host-side session: the `Water` orchestrator re-imagined (water.gd).

    Manages the parameter set with dirty-bit spectrum regeneration, the
    updates_per_second scheduler, and (optionally) cascade staggering.

    >>> ocean = Ocean(map_size=256)
    >>> maps = ocean.update(1 / 60)          # returns None on skipped frames
    >>> ocean.set_cascade(0, wind_speed=15)  # marks cascade 0 dirty
    """

    def __init__(
        self,
        params: CascadeParams | Sequence[CascadeParams] | None = None,
        map_size: int = 1024,
        updates_per_second: float = 50.0,
        stagger: bool = False,
        **config_kwargs: Any,
    ):
        if params is None:
            params = default_cascades()
        elif isinstance(params, (list, tuple)):
            params = stack_cascades(params)
        self.config = SimConfig(map_size=map_size, **config_kwargs)
        self.params = params
        # Global water/foam colors (water.gd:14-18): the reference holds them
        # as PROJECT-WIDE shader globals every material reads
        # (project.godot:60-81); here the session owns the single copy and
        # every render surface (demo, ANSI viewer, web panel) consumes it.
        # Stored linear RGB; pass as traced args so edits never retrace.
        from . import shading
        self.water_color = np.asarray(shading.DEFAULT_WATER_COLOR, np.float32)
        self.foam_color = np.asarray(shading.DEFAULT_FOAM_COLOR, np.float32)
        # session RNG for runtime cascade re-seeding (water.gd:68-69's member
        # rng, fixed seed 1234 — "This seed gives big waves!")
        self._rng = np.random.RandomState(1234)
        self._time = 0.0
        self._next_update_time = 0.0
        self.updates_per_second = updates_per_second
        self.stagger = stagger
        self.state = init_state(self.config, params)
        self._dirty = np.zeros(params.num_cascades, bool)
        self._pending: list[int] = []   # cascades awaiting refresh this round
        self._round_dt = 0.0            # the armed round's foam-rate dt
        c, n = params.num_cascades, map_size
        dtype = self.config.resolved_map_dtype()
        self.maps = OceanMaps(
            displacement=jnp.zeros((c, 3, n, n), dtype),
            normal=jnp.zeros((c, 4, n, n), dtype),
        )

    @property
    def num_cascades(self) -> int:
        return self.params.num_cascades

    @property
    def updates_per_second(self) -> float:
        return self._updates_per_second

    @updates_per_second.setter
    def updates_per_second(self, value: float) -> None:
        """Rebase the in-flight schedule so a rate change takes effect
        immediately (water.gd:51-54: next_update_time -= 1/old - 1/new)."""
        old = getattr(self, "_updates_per_second", value)
        self._next_update_time -= 1.0 / (old + 1e-10) - 1.0 / (value + 1e-10)
        self._updates_per_second = value

    # --- parameter editing (the ImGui-panel surface, main.gd:92-108) ---

    _SPECTRUM_FIELDS = frozenset({
        "tile_length", "wind_speed", "wind_direction", "fetch_length",
        "swell", "spread", "detail", "whitecap", "foam_amount", "spectrum_seed",
    })  # the setters that flip should_generate_spectrum (wave_cascade_parameters.gd:7-35)

    def set_cascade(self, index: int, **updates: Any) -> None:
        """Update one cascade's parameters; spectrum-affecting fields mark it
        dirty so h0 regenerates on the next update (gd dirty-bit semantics)."""
        new = {}
        for name, value in updates.items():
            field = getattr(self.params, name)
            if name == "tile_length" and isinstance(value, (int, float)):
                value = (float(value), float(value))
            if name in ("wind_speed", "fetch_length"):
                value = max(1e-4, float(value))
            arr = jnp.asarray(value, field.dtype)
            new[name] = field.at[index].set(arr)
            if name in self._SPECTRUM_FIELDS:
                self._dirty[index] = True
        self.params = self.params.replace(**new)

    def set_cascades(self, params: CascadeParams | Sequence[CascadeParams],
                     reseed: bool = True) -> None:
        """Replace the whole cascade stack at runtime (add/remove cascades).

        The analog of assigning the reference's `parameters` array
        (water.gd:22-35, "Recreates all compute pipelines whenever a cascade
        is added or removed!"): every cascade — existing and new — draws a
        fresh spectrum seed from the session's RNG stream and restarts at
        the anti-interference phase offset time = 120 + pi*i (water.gd:31-32);
        spectra, foam, and map buffers rebuild. Pass reseed=False to keep
        the provided spectrum seeds verbatim (times still restart at the
        phase offsets — the reference's setter always resets them too,
        water.gd:32).
        """
        if isinstance(params, (list, tuple)):
            params = stack_cascades(params)
        c = params.num_cascades
        if reseed:
            seeds = self._rng.randint(-10000, 10001, (c, 2))
            params = params.replace(
                spectrum_seed=jnp.asarray(seeds, jnp.int32))
        self.params = params
        # init_state restarts every cascade at the anti-interference offset
        # time_i = 120 + pi*i (water.gd:32)
        self.state = init_state(self.config, params)
        self._dirty = np.zeros(c, bool)
        self._pending = []
        n = self.config.map_size
        dtype = self.config.resolved_map_dtype()
        self.maps = OceanMaps(
            displacement=jnp.zeros((c, 3, n, n), dtype),
            normal=jnp.zeros((c, 4, n, n), dtype),
        )

    def regenerate_dirty(self) -> None:
        """Re-run spectrum generation for DIRTY cascades only — the reference
        dispatches spectrum_compute per dirty cascade (wave_generator.gd:67-72),
        not for the whole stack; a 1-dirty edit costs ~1/C the spectrum work."""
        idxs = np.nonzero(self._dirty)[0]
        if idxs.size == 0:
            return
        if idxs.size == self.num_cascades:
            h0, h0nc = generate_spectrum(self.config, self.params)
            omega = generate_omega(self.config, self.params)
        else:
            h0, h0nc = self.state.h0, self.state.h0nc
            omega = self.state.omega
            for i in idxs:
                p = jax.tree.map(lambda x: x[int(i)], self.params)
                h0_i, h0nc_i = generate_spectrum_one(self.config, p)
                h0 = h0.at[int(i)].set(h0_i)
                h0nc = h0nc.at[int(i)].set(h0nc_i)
            # omega tracks tile_length edits (dispersion ignores the other
            # spectrum params); one host plane per dirty cascade
            omega = omega.at[idxs].set(
                generate_omega(self.config, self.params, idxs))
        self.state = self.state.replace(h0=h0, h0nc=h0nc, omega=omega)
        self._dirty[:] = False

    # --- per-frame driving (water.gd:75-82 scheduler semantics) ---

    def update(self, delta: float) -> OceanMaps | None:
        """Advance wall time by `delta`; run a simulation update if due.

        Returns the maps whenever they changed this frame, else None. Skipped
        time is folded into the next update's dt (water.gd:77-80). In stagger
        mode, frames between updates each refresh ONE pending cascade — the
        reference's per-rendered-frame load balancer (wave_generator.gd:56-63).
        """
        ups = self.updates_per_second
        ran = None
        if ups == 0 or self._time >= self._next_update_time:
            target = 1.0 / (ups + 1e-10)
            update_delta = delta if ups == 0 else target + (self._time - self._next_update_time)
            self._next_update_time = self._time + target
            ran = self._update_water(update_delta)
        elif self.stagger and self._pending:
            self._refresh([self._pending.pop(0)], self._round_dt)
            ran = self.maps
        self._time += delta
        return ran

    def _update_water(self, dt: float) -> OceanMaps:
        self.regenerate_dirty()
        if not self.stagger:
            self.state, self.maps = step(self.config, self.state, self.params, dt)
            return self.maps
        # Catch-up flush: any cascades the previous round hasn't refreshed yet
        # go through in ONE dispatch before the new round arms
        # (wave_generator.gd:90-98), still at the previous round's foam dt.
        if self._pending:
            self._refresh(self._pending, self._round_dt)
        # Arm the new round: advance time ONCE for all cascades
        # (wave_generator.gd:100-103); refreshes then happen at this time.
        self.state = self.state.replace(
            time=self.state.time + jnp.float32(dt))
        self._round_dt = dt
        self._pending = list(range(self.num_cascades))
        # The reference's _process refreshes one cascade this same frame.
        self._refresh([self._pending.pop(0)], dt)
        return self.maps

    def _refresh(self, indices: Sequence[int], dt: float) -> None:
        """Refresh `indices`' maps/foam and composite into the persistent map
        buffers (the analog of updating those texture-array layers in place)."""
        idx = np.asarray(indices, np.int32)
        self.state, d, nm = refresh_cascades(
            self.config, self.state, self.params, jnp.float32(dt), idx)
        self.maps = OceanMaps(
            displacement=self.maps.displacement.at[idx].set(d),
            normal=self.maps.normal.at[idx].set(nm),
        )

    def resize(self, map_size: int, clear_jit_caches: bool = True) -> None:
        """Change the map resolution: full state rebuild, params preserved.

        The analog of the reference's map_size setter tearing down and
        recreating the whole GPU pipeline (water.gd:38-41 ->
        _setup_wave_generator). By default the process-wide jit executable
        caches are cleared too — a long-lived session cycling resolutions
        otherwise accumulates stale old-shape executables on a backend that
        pages HBM to host (docs/PERF.md measurement traps). Pass
        clear_jit_caches=False when a caller has deliberately pre-warmed
        the new shape's executables (utils/webviewer background resize) —
        clearing would throw that warm-up away.
        """
        import dataclasses as _dc
        self.config = _dc.replace(self.config, map_size=map_size)
        if clear_jit_caches:
            jax.clear_caches()
        self.state = init_state(self.config, self.params)
        self._dirty[:] = False
        self._pending = []
        c, n = self.num_cascades, map_size
        dtype = self.config.resolved_map_dtype()
        self.maps = OceanMaps(
            displacement=jnp.zeros((c, 3, n, n), dtype),
            normal=jnp.zeros((c, 4, n, n), dtype),
        )

    # --- checkpoint / resume (SURVEY.md section 5.4) ---

    def checkpoint(self) -> dict[str, Any]:
        """Serializable snapshot of all cross-frame state.

        Complex leaves travel as fp32 pairs (utils.hostio) because some TPU
        backends lack complex64 buffer transfer.
        """
        from ..utils.hostio import device_get_tree
        return {
            "map_size": self.config.map_size,
            "num_cascades": self.num_cascades,
            "state": device_get_tree(self.state),
            "params": device_get_tree(self.params),
            "time": self._time,
            "next_update_time": self._next_update_time,
            "pending": list(self._pending),
            "round_dt": self._round_dt,
            "water_color": [float(v) for v in self.water_color],
            "foam_color": [float(v) for v in self.foam_color],
        }

    def restore(self, snapshot: dict[str, Any]) -> None:
        """Restore a `checkpoint()` snapshot, validating it against this
        session's configuration (resizing if the snapshot's map_size differs)
        and resetting the persistent map buffers to match."""
        from ..utils.hostio import device_put_tree
        size = snapshot.get("map_size", self.config.map_size)
        cascades = snapshot.get("num_cascades", self.num_cascades)
        if cascades != self.num_cascades:
            raise ValueError(
                f"snapshot has {cascades} cascades, session has "
                f"{self.num_cascades}; rebuild the Ocean with matching params")
        if size != self.config.map_size:
            self.resize(size)
        self.state = device_put_tree(snapshot["state"])
        self.params = device_put_tree(snapshot["params"])
        self._time = snapshot["time"]
        self._next_update_time = snapshot["next_update_time"]
        self._pending = list(snapshot.get("pending", []))
        self._round_dt = snapshot.get("round_dt", 0.0)
        if "water_color" in snapshot:
            self.water_color = np.asarray(snapshot["water_color"], np.float32)
        if "foam_color" in snapshot:
            self.foam_color = np.asarray(snapshot["foam_color"], np.float32)
        self._dirty[:] = False
        c, n = self.num_cascades, self.config.map_size
        dtype = self.config.resolved_map_dtype()
        self.maps = OceanMaps(
            displacement=jnp.zeros((c, 3, n, n), dtype),
            normal=jnp.zeros((c, 4, n, n), dtype),
        )
