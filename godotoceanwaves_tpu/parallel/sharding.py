"""Multi-device scaling: patch data-parallelism + row-sharded distributed FFT.

The reference never leaves one GPU (SURVEY.md section 2.3); its scaling axes
are cascades, packed spectra, FFT rows, and resolution. The TPU-native
distributed story maps those axes onto a 2D device mesh:

  axis "patch" — independent ocean patches (and their cascades): embarrassingly
      data-parallel, zero cross-device traffic. The analog of running several
      water surfaces.
  axis "rows"  — the FFT row dimension: each device row-FFTs its shard locally
      and the reference's shared-memory transpose kernel (transpose.glsl)
      becomes an ICI **all-to-all** — the classic distributed-FFT transpose
      decomposition (SURVEY.md section 5.7/5.8). This breaks the reference's
      hard 1024 cap (MAX_MAP_SIZE, fft_compute.glsl:9): a 2048^2+ map is
      sharded so each device only ever holds N/D rows.

Every other stage (spectrum generation, modulation, unpack/foam) is purely
elementwise in global texel indices, so shards evaluate their own texels with
a `y_offset` and no communication.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.cascade import CascadeParams, SimConfig
from ..models.ocean import (
    OceanMaps,
    OceanState,
    TIME_OFFSET_BASE,
    TIME_OFFSET_STEP,
    _foam_rates,
)
from ..ops import fft, initial_state, modulate as modulate_ops, spectra, unpack as unpack_ops

ROWS_AXIS = "rows"
PATCH_AXIS = "patch"


def build_mesh(devices: Sequence[jax.Device] | None = None,
               rows: int | None = None) -> Mesh:
    """A (patch, rows) mesh over the given devices.

    `rows` is the FFT-sharding degree (devices per 2D transform); the rest go
    to patch data-parallelism. Defaults to rows=2 when the device count is
    even, else 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if rows is None:
        rows = 2 if n % 2 == 0 else 1
    if n % rows:
        raise ValueError(f"{n} devices not divisible by rows={rows}")
    arr = np.asarray(devices).reshape(n // rows, rows)
    return Mesh(arr, (PATCH_AXIS, ROWS_AXIS))


def ifft2_packed_sharded(x: jax.Array, axis_name: str = ROWS_AXIS,
                         impl: str = "matmul", fold_sign: bool = True) -> jax.Array:
    """Reference FFT chain (rows -> transpose -> rows) on a row-sharded block.

    `x` is the local shard (..., N/D, N) of a global (..., N, N) array sharded
    over `axis_name` on the row axis; must be called inside shard_map. The
    transpose is an all-to-all: split local columns D ways, exchange, and each
    device reassembles its column chunk — then a local swap yields that
    device's row-shard of the transposed field.
    """
    y = fft.idft_rows(x, impl, fold_sign)                   # local row pass
    sa, ca = x.ndim - 1, x.ndim - 2
    y = jax.lax.all_to_all(y, axis_name, split_axis=sa, concat_axis=ca, tiled=True)
    y = jnp.swapaxes(y, -2, -1)                             # (..., N/D, N) of Z^T
    return fft.idft_rows(y, impl, fold_sign)                # local "column" pass


def ifft2_planes_sharded(x: jax.Array, axis_name: str = ROWS_AXIS,
                         impl: str = "matmul", fold_sign: bool = True) -> jax.Array:
    """Plane-pair sharded FFT chain: x is (..., 2, N/D, N) fp32 (re, im).

    impl "pallas" runs the shard-local rows kernel
    (ops.pallas_fft.idft_rows_planes_pallas) — the production TPU tier; the
    all-to-all moves fp32 planes (this backend has no complex collectives).
    Other impls route each local pass through the complex tiers.
    """
    from ..ops import pallas_fft

    def local_pass(planes):
        if impl == "pallas":
            lead = planes.shape[:-3]
            flat = planes.reshape((-1, 2) + planes.shape[-2:])
            out = pallas_fft.idft_rows_planes_pallas(flat, fold_sign=fold_sign)
            return out.reshape(planes.shape)
        z = jax.lax.complex(planes[..., 0, :, :], planes[..., 1, :, :])
        z = fft.idft_rows(z, impl, fold_sign)
        return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-3)

    y = local_pass(x)
    sa, ca = x.ndim - 1, x.ndim - 2
    y = jax.lax.all_to_all(y, axis_name, split_axis=sa, concat_axis=ca, tiled=True)
    y = jnp.swapaxes(y, -2, -1)
    return local_pass(y)


def multipatch_params(base: CascadeParams, num_patches: int, seed: int = 0
                      ) -> CascadeParams:
    """Broadcast (C,)-stacked params to (P, C) with independent per-patch seeds.

    Identical seeds would make every patch the same ocean; seeds are the only
    leaf that varies across patches by default.
    """
    rng = np.random.RandomState(seed)
    tiled = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_patches,) + x.shape), base)
    seeds = rng.randint(-10000, 10001, size=(num_patches,) + base.spectrum_seed.shape)
    return tiled.replace(spectrum_seed=jnp.asarray(seeds, jnp.int32))


def _state_specs() -> OceanState:
    planespec = P(PATCH_AXIS, None, None, ROWS_AXIS, None)   # (P, C, 2, N, N)
    rowspec = P(PATCH_AXIS, None, ROWS_AXIS, None)           # (P, C, N, N)
    return OceanState(h0=planespec, h0nc=planespec,
                      omega=rowspec, foam=rowspec,
                      time=P(PATCH_AXIS, None))


def _params_specs(params: CascadeParams) -> CascadeParams:
    return jax.tree.map(lambda _: P(PATCH_AXIS), params)


def _maps_specs() -> OceanMaps:
    spec = P(PATCH_AXIS, None, None, ROWS_AXIS, None)        # (P, C, ch, N, N)
    return OceanMaps(displacement=spec, normal=spec)


def _local_generate(config: SimConfig, params: CascadeParams, rows_local: int,
                    y_offset) -> tuple[jax.Array, jax.Array]:
    """Per-shard spectrum generation: (P_l, C, 2, rows_local, N) plane blocks."""
    def one(p):
        fetch_m = p.fetch_length * 1e3
        alpha = spectra.jonswap_alpha(p.wind_speed, fetch_m, config.g)
        omega_p = spectra.jonswap_peak_angular_frequency(p.wind_speed, fetch_m, config.g)
        h0, h0nc = initial_state.build_initial_spectrum(
            config.map_size, p.spectrum_seed, p.tile_length, alpha, omega_p,
            p.wind_speed, jnp.deg2rad(p.wind_direction), config.depth,
            p.swell, p.detail, p.spread, config.g,
            y_offset=y_offset, rows=rows_local,
        )
        return (jnp.stack([jnp.real(h0), jnp.imag(h0)]),
                jnp.stack([jnp.real(h0nc), jnp.imag(h0nc)]))
    return jax.vmap(jax.vmap(one))(params)


def make_multichip_init(mesh: Mesh, config: SimConfig):
    """Sharded state initializer: params (P, C) -> OceanState sharded on mesh."""
    rows_dev = mesh.shape[ROWS_AXIS]
    n = config.map_size
    rows_local = n // rows_dev

    def local_init(params):
        y0 = jax.lax.axis_index(ROWS_AXIS) * rows_local
        h0, h0nc = _local_generate(config, params, rows_local, y0)
        pl, c = h0.shape[0], h0.shape[1]
        foam = jnp.zeros((pl, c, rows_local, n), jnp.float32)
        time = jnp.broadcast_to(
            TIME_OFFSET_BASE + TIME_OFFSET_STEP * jnp.arange(c, dtype=jnp.float32),
            (pl, c))
        # omega placeholder: the real plane is host-computed in init() below
        # (NumPy-exact dispersion — see OceanState.omega; it cannot be
        # generated inside shard_map without paying TPU tanh's ulp error)
        return OceanState(h0=h0, h0nc=h0nc,
                          omega=jnp.zeros((pl, c, rows_local, n), jnp.float32),
                          foam=foam, time=time)

    def init(params):
        sharded = jax.shard_map(
            local_init, mesh=mesh, in_specs=(_params_specs(params),),
            out_specs=_state_specs(), check_vma=False)
        state = jax.jit(sharded)(params)
        tiles = np.asarray(params.tile_length, np.float32)   # (P, C, 2)
        omega = np.stack([
            np.stack([spectra.dispersion_grid_host(n, tiles[pi, ci],
                                                   config.depth, config.g)
                      for ci in range(tiles.shape[1])])
            for pi in range(tiles.shape[0])])
        omega = jax.device_put(
            omega, NamedSharding(mesh, P(PATCH_AXIS, None, ROWS_AXIS, None)))
        return state.replace(omega=omega)

    return init


def make_multichip_step(mesh: Mesh, config: SimConfig):
    """Jitted sharded step: (state, params, dt) -> (state, maps).

    State/maps carry a leading patch axis: h0/h0nc/foam are (P, C, N, N)
    sharded (patch, -, rows, -); maps are (P, C, N, N, {3,4}). The FFT's
    all-to-all rides the `rows` mesh axis; everything else is local.
    """
    rows_dev = mesh.shape[ROWS_AXIS]
    n = config.map_size
    rows_local = n // rows_dev
    resolved = config.resolved_fft_impl()
    if resolved == "xla":
        # jnp.fft cannot run on a row-shard (and rides poorly on some TPU
        # backends); per-shard passes use the matmul tier instead.
        impl = "xla" if rows_dev == 1 else "matmul"
    elif resolved in ("pallas", "fourstep"):
        # the shard-local Pallas rows kernel needs 128-row-aligned shards
        impl = "pallas" if (rows_local % 128 == 0 and resolved == "pallas"
                            and rows_dev > 1) else (
            resolved if rows_dev == 1 else "matmul")
    else:
        impl = resolved
    map_dtype = config.resolved_map_dtype()

    def local_step(state, params, dt):
        dt = jnp.asarray(dt, jnp.float32)
        y0 = jax.lax.axis_index(ROWS_AXIS) * rows_local
        t_new = state.time + dt

        def per_cascade(h0, h0nc, omega, foam, t, p):
            grow, decay = _foam_rates(p, dt)
            layers = modulate_ops.modulate_planes(
                h0, h0nc, p.tile_length, config.depth, t, config.g,
                y_offset=y0, omega=omega)
            if rows_dev == 1:
                fields = fft.ifft2_packed_planes(layers, impl=impl, fold_sign=True)
            else:
                fields = ifft2_planes_sharded(layers, ROWS_AXIS, impl=impl,
                                              fold_sign=True)
            return unpack_ops.unpack_planes(
                fields, foam, p.whitecap, grow, decay,
                pre_shifted=True, map_dtype=map_dtype)

        disp, normal, foam = jax.vmap(jax.vmap(per_cascade))(
            state.h0, state.h0nc, state.omega, state.foam, t_new, params)
        new_state = state.replace(foam=foam, time=t_new)
        return new_state, OceanMaps(displacement=disp, normal=normal)

    def step(state, params, dt):
        sharded = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(_state_specs(), _params_specs(params), P()),
            out_specs=(_state_specs(), _maps_specs()), check_vma=False)
        return sharded(state, params, dt)

    return jax.jit(step, donate_argnums=0)


@functools.lru_cache(maxsize=8)
def _sharded_render_fn(mesh: Mesh, names: tuple, width: int, height: int,
                       kw_items: tuple):
    """Cached jitted shard_map render for one (mesh, axes, frame, options)
    configuration — repeated calls (an interactive viewer flying the
    camera) reuse the compiled program; pose args are traced."""
    from ..models import geometry

    kw = dict(kw_items)
    n_dev = int(np.prod([mesh.shape[a] for a in names]))
    local_h = height // n_dev

    def local(maps, scales, cam, pitch, yaw):
        idx = jnp.int32(0)
        for a in names:   # major-to-minor, matching out_specs' concatenation
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        return geometry.render_ocean_geometry(
            maps, scales, width=width, height=height,
            camera_pos=cam, pitch_deg=pitch, yaw_deg=yaw,
            rows=(idx * local_h, local_h), **kw)

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(names if len(names) > 1 else names[0]),
        check_vma=False)
    return jax.jit(sharded)


def render_geometry_sharded(mesh: Mesh, maps, map_scales,
                            axes: str | Sequence[str] | None = None, *,
                            width: int = 960, height: int = 540,
                            camera_pos=(0.0, 12.0, 0.0), pitch_deg=-12.0,
                            yaw_deg=0.0, **kw):
    """Multi-chip displaced-geometry render: pixel rows over the mesh.

    The renderer (models/geometry.render_ocean_geometry) is per-pixel
    independent given the displaced grid — the grid and maps are small and
    replicated, so each device renders a horizontal band of the frame via
    the renderer's `rows` window and the bands concatenate with ZERO
    cross-device traffic (pure output sharding; the multi-chip analog of
    GPU tile rasterization). Useful when one chip's render budget caps the
    interactive frame rate: D chips = D-times the pixel throughput.

    `axes` picks the mesh axes to spread rows over (default: all of them,
    major-to-minor). `height` must be divisible by the product of their
    sizes; per-band LOD then runs on each device's local band. Camera pose
    is traced (fly without retracing); remaining `kw` render options are
    static and must be hashable — the compiled program is cached per
    (mesh, axes, frame size, options).

    Returns the assembled (H, W, 3) image, row-sharded over `axes`.
    """
    if axes is None:
        names = tuple(mesh.axis_names)
    elif isinstance(axes, str):
        names = (axes,)
    else:
        names = tuple(axes)
    n_dev = int(np.prod([mesh.shape[a] for a in names]))
    if height % n_dev:
        raise ValueError(f"height {height} not divisible by {n_dev} devices")
    fn = _sharded_render_fn(mesh, names, width, height,
                            tuple(sorted(kw.items())))
    return fn(maps, map_scales, jnp.asarray(camera_pos, jnp.float32),
              jnp.float32(pitch_deg), jnp.float32(yaw_deg))


def shard_state(mesh: Mesh, state: OceanState) -> OceanState:
    """Place a replicated/host state onto the mesh with the canonical specs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, _state_specs())
