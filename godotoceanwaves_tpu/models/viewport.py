"""Shared jitted scene renderer + persistent spray session.

Every render surface — ``demo.py``'s offline frame loop, the ANSI live
viewer (`utils/live.py`) and the browser viewer (`utils/webviewer.py`) —
needs the same two jitted closures (scene render, scene + spray composite,
both quantizing to gamma-encoded uint8 in-jit so one device dispatch yields
the finished frame bytes) and the same lazily-created persistent spray
state (the reference scene always renders its 32768-particle spray,
main.tscn:133-140). This module is the single owner of that plumbing so
the three surfaces cannot drift apart.

On this backend every synchronized device interaction costs ~0.05-0.2 s
through the relay (docs/PERF.md "viewer loop"), so the composite MUST be
one dispatch: spray attrs feed the same jit as the scene, and the uint8
quantize rides inside it (a fp32 frame fetch is also 4x the bytes).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import geometry, shading, spray


# --- render quality tiers ---------------------------------------------------
# Measured on the v5e at 640x360, viewer pose (docs/PERF.md "round-4
# structural knobs"): quality 31 ms (the render_ocean_geometry defaults —
# offline/GIF fidelity), interactive 11.8 ms (shipped viewer default;
# visually close to quality in the hardware side-by-side), performance
# 9.9 ms (visible 3x3 shading blocks; for high-res/low-chip-count budgets).
# Keys are render_ocean_geometry kwargs; all static (a tier switch retraces,
# which the web viewer does asynchronously like a resize).
RENDER_TIERS: dict[str, dict] = {
    "quality": dict(march_steps=40, bisect_steps=8),
    "interactive": dict(march_steps=32, bisect_steps=6, shade_res=2,
                        bracket_res=128, invert_res=256),
    "performance": dict(march_steps=32, bisect_steps=6, shade_res=3,
                        bracket_res=128, invert_res=256),
}


# --- wire formats ----------------------------------------------------------
# BT.601 full-range RGB<->YCbCr (the JPEG convention, ITU-T T.871). The web
# viewer JPEG-encodes every frame at 4:2:0 anyway, so doing the chroma
# subsample ON DEVICE is visually free and halves the bytes crossing the
# ~5-10 MB/s relay: 3 B/px RGB -> 1.5 B/px planar YUV420.


def _rgb_to_yuv420(srgb):
    """(H, W, 3) float sRGB-encoded [0,255] -> flat uint8 Y + Cb + Cr planes
    (chroma 2x2-mean subsampled). H and W must be even.

    RGB->CbCr is affine, so the 2x2 mean commutes with it: subsampling the
    RGB planes FIRST and applying the chroma matrix on the quarter-size
    planes yields the same wire bytes at ~1/4 the chroma arithmetic inside
    the per-frame render jit."""
    r, g, b = srgb[..., 0], srgb[..., 1], srgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    h, w = y.shape

    def sub(c):
        return c.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    rs, gs, bs = sub(r), sub(g), sub(b)
    cb = 128.0 - 0.168736 * rs - 0.331264 * gs + 0.5 * bs
    cr = 128.0 + 0.5 * rs - 0.418688 * gs - 0.081312 * bs
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    return jnp.concatenate([q(y).ravel(), q(cb).ravel(), q(cr).ravel()])


def yuv420_to_ycbcr(flat: np.ndarray, height: int, width: int) -> np.ndarray:
    """Host-side unpack of the YUV420 wire format -> (H, W, 3) uint8 YCbCr
    (chroma nearest-upsampled; feed straight to a JPEG encoder)."""
    flat = np.asarray(flat)
    n, q = height * width, (height // 2) * (width // 2)
    y = flat[:n].reshape(height, width)
    cb = flat[n:n + q].reshape(height // 2, width // 2)
    cr = flat[n + q:].reshape(height // 2, width // 2)
    up = lambda c: np.repeat(np.repeat(c, 2, axis=0), 2, axis=1)
    return np.stack([y, up(cb), up(cr)], axis=-1)


def ycbcr_to_rgb(ycbcr: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 full-range YCbCr -> uint8 RGB (BT.601 inverse)."""
    y = ycbcr[..., 0].astype(np.float32)
    cb = ycbcr[..., 1].astype(np.float32) - 128.0
    cr = ycbcr[..., 2].astype(np.float32) - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class SceneRenderer:
    """Jitted render closures for one viewport configuration.

    ``flat=False`` renders the vertex-displaced clipmap mesh
    (`geometry.render_ocean_geometry` — silhouettes/parallax, the
    reference's defining visual); ``flat=True`` keeps the cheap y=0
    raycast (`shading.render_ocean`). Camera pose and the session's
    global colors (water.gd:14-18) ride as traced args — flying and
    recoloring never retrace.

    ``transfer`` picks the wire format the jit returns: ``"rgb"`` = (H, W, 3)
    uint8 (offline frames, ANSI cells), ``"yuv420"`` = flat uint8 planar
    Y/Cb/Cr at 1.5 B/px (half the device->host bytes; unpack with
    `yuv420_to_ycbcr`). Requires even width/height.

    Extra keyword arguments (``shade_res``, ``bracket_res``, ``lod_bias``,
    ...) forward to `render_ocean_geometry` — the displaced-geometry
    quality/speed knobs; ignored when ``flat=True``.
    """

    def __init__(self, width: int, height: int, *, flat: bool = False,
                 mesh_quality: str = "high", environment: bool = True,
                 march_steps: int = 40, bisect_steps: int = 8,
                 transfer: str = "rgb", **render_kwargs):
        if transfer not in ("rgb", "yuv420"):
            raise ValueError(f"unknown transfer format {transfer!r}")
        if transfer == "yuv420" and (width % 2 or height % 2):
            raise ValueError("yuv420 transfer needs even width/height")
        self.width = width
        self.height = height
        self.flat = flat
        self.mesh_quality = mesh_quality
        self.environment = environment
        self.transfer = transfer
        # the displaced-geometry knobs this renderer was built with
        # (introspection for the viewers' live reconfiguration)
        self.render_kwargs = dict(render_kwargs)

        def scene(maps, scales, wc, fc, pos, pitch, yaw, fov):
            if flat:
                return shading.render_ocean(
                    maps, scales, width=width, height=height,
                    camera_pos=pos, pitch_deg=pitch, yaw_deg=yaw,
                    fov_deg=fov, environment=environment, water_color=wc,
                    foam_color=fc)
            return geometry.render_ocean_geometry(
                maps, scales, mesh_quality, width=width, height=height,
                camera_pos=pos, pitch_deg=pitch, yaw_deg=yaw, fov_deg=fov,
                environment=environment, march_steps=march_steps,
                bisect_steps=bisect_steps, water_color=wc, foam_color=fc,
                **render_kwargs)

        def quantize(img):
            srgb = jnp.clip(img, 0.0, 1.0) ** (1 / 2.2) * 255
            if transfer == "yuv420":
                return _rgb_to_yuv420(srgb)
            return srgb.astype(jnp.uint8)

        def render(maps, scales, wc, fc, pos, pitch, yaw, fov):
            return quantize(scene(maps, scales, wc, fc, pos, pitch, yaw,
                                  fov))

        def render_spray(maps, scales, wc, fc, pos, pitch, yaw, fov, attrs):
            img = scene(maps, scales, wc, fc, pos, pitch, yaw, fov)
            img = shading.splat_spray(
                img, attrs["position"], attrs["scale"], attrs["dissolve"],
                attrs["visible"], camera_pos=pos, pitch_deg=pitch,
                yaw_deg=yaw, fov_deg=fov, foam_color=fc,
                custom_z=attrs["custom_z"])
            return quantize(img)

        self._render = jax.jit(render)
        self._render_spray = jax.jit(render_spray)

    def render(self, maps, scales, water_color, foam_color, pos, pitch, yaw,
               spray_attrs=None, fov=70.0) -> jax.Array:
        """One jitted dispatch -> uint8 frame in the configured wire format
        (``"rgb"``: gamma-encoded (H, W, 3); ``"yuv420"``: flat planar).
        ``fov`` is a traced arg like the rest of the pose (the reference
        panel's FOV 20-170 slider, main.gd:113-114)."""
        wc = jnp.asarray(water_color, jnp.float32)
        fc = jnp.asarray(foam_color, jnp.float32)
        pos = jnp.asarray(pos, jnp.float32)
        pitch = jnp.float32(pitch)
        yaw = jnp.float32(yaw)
        fov = jnp.float32(fov)
        if spray_attrs is None:
            return self._render(maps, scales, wc, fc, pos, pitch, yaw, fov)
        return self._render_spray(maps, scales, wc, fc, pos, pitch, yaw,
                                  fov, spray_attrs)


class FramePipeline:
    """Overlap the frame's device->host transfer with the NEXT frame's
    device compute.

    Through the relay the ~0.7 MB uint8 frame copy serializes after the
    render if fetched immediately (measured: 105 ms/frame fetch-after-
    render vs 68 ms pipelined vs 44 ms compute-only at 640x360 —
    docs/PERF.md "viewer loop"). `push(device_img)` returns the PREVIOUS
    frame as host bytes (None on the first push) while the new frame's
    dispatch is still in flight; `flush()` drains the last pending frame.
    One frame of extra latency — irrelevant for a viewer, free 1.5x
    throughput."""

    def __init__(self):
        self._pending = None

    def push(self, img) -> np.ndarray | None:
        prev, self._pending = self._pending, img
        return None if prev is None else np.asarray(prev)

    def flush(self) -> np.ndarray | None:
        prev, self._pending = self._pending, None
        return None if prev is None else np.asarray(prev)

    def discard(self) -> None:
        """Drop the pending frame WITHOUT publishing it — for mode/shape
        transitions where the pending payload no longer matches what the
        caller would serve (e.g. the viewer switching between single-frame
        and K-frame batched dispatch, or changing K)."""
        self._pending = None


class SpraySession:
    """Persistent spray particle state + jitted step, shared across
    renderer rebuilds (a mesh-quality or resolution change must not reset
    the particles' respawn cycles)."""

    def __init__(self, num_particles: int = 32768,
                 emitter_extent: float = 60.0):
        self._num_particles = num_particles
        self._emitter_extent = emitter_extent
        self._params = None
        self._state = None
        self._step = None
        self.clock = 0.0

    @property
    def started(self) -> bool:
        """True once the particle state exists (first advance() ran)."""
        return self._state is not None

    def advance(self, maps, scales, dt: float):
        """Step the particle state machine by dt -> billboard attrs dict
        (one jitted dispatch; feed to SceneRenderer.render(spray_attrs=…))."""
        if self._state is None:
            self._params = spray.SprayParams(
                num_particles=self._num_particles,
                emitter_extent=self._emitter_extent)
            self._state = spray.spray_init(self._params)
            self._step = jax.jit(functools.partial(spray.spray_step,
                                                   self._params))
        self.clock += dt
        self._state, attrs = self._step(self._state, maps, scales,
                                        np.float32(self.clock))
        return attrs

    def ensure_init(self):
        """Create the particle state if it does not exist yet; returns
        ``(params, state)``. Used by the batched frame loop, which threads
        the spray recurrence through its own scan instead of `advance`."""
        if self._state is None:
            self._params = spray.SprayParams(
                num_particles=self._num_particles,
                emitter_extent=self._emitter_extent)
            self._state = spray.spray_init(self._params)
            self._step = jax.jit(functools.partial(spray.spray_step,
                                                   self._params))
        return self._params, self._state

    def checkpoint(self) -> dict | None:
        """Serializable snapshot of the particle state machine (None before
        the first advance). Companion of `Ocean.checkpoint` — the viewer's
        session snapshot carries both so a restored session resumes its
        32768 respawn cycles instead of restarting them."""
        if self._state is None:
            return None
        import dataclasses
        return {
            "params": dataclasses.asdict(self._params),
            "state": {f.name: np.asarray(getattr(self._state, f.name))
                      for f in dataclasses.fields(self._state)},
            "clock": self.clock,
        }

    def restore(self, snapshot: dict | None) -> None:
        """Restore a `checkpoint()` snapshot (None -> reset to unstarted)."""
        if snapshot is None:
            self._params = self._state = self._step = None
            self.clock = 0.0
            return
        p = dict(snapshot["params"])
        p["particle_scale"] = tuple(p["particle_scale"])
        self._params = spray.SprayParams(**p)
        self._num_particles = self._params.num_particles
        self._emitter_extent = self._params.emitter_extent
        st = {k: jnp.asarray(v) for k, v in snapshot["state"].items()}
        self._state = spray.SprayState(**st)
        self._step = jax.jit(functools.partial(spray.spray_step,
                                               self._params))
        self.clock = float(snapshot["clock"])


def make_batched_step(renderer: SceneRenderer, config, spray_params,
                      num_frames: int):
    """Build the viewer's K-frame megastep: ONE jitted dispatch that advances
    the simulation ``num_frames`` ticks AND renders every tick's frame.

    The interactive loop's cost on this backend is dominated by per-dispatch
    relay round trips, not device time (docs/PERF.md "viewer loop"): the
    single-frame loop pays 3 dispatches + 1 frame fetch per served frame.
    Batching K frames into one program cuts that to (3 dispatches + one
    K-frame fetch) / K per served frame. Semantics match K sequential
    ``Ocean.update(dt)`` calls at ``updates_per_second == 0`` (every tick
    steps, water.gd:77-80 never folds) followed by a spray advance + render
    per tick — the CPU parity test pins bit-equality against that loop.
    Trade-offs: camera pose and parameter edits are sampled once per batch
    (latency = K ticks, ~K/fps seconds), and the foam/spray recurrences ride
    a `lax.scan`, exactly as SURVEY.md section 7.3 item 3 prescribes.

    Returns ``fn(state, params, spray_state, clock, wc, fc, pos, pitch, yaw,
    fov, dt) -> (state, spray_state, frames, last_maps)`` where ``frames``
    stacks ``num_frames`` wire-format frames on axis 0 and ``last_maps`` is
    the final tick's OceanMaps (device-resident; keeps `Ocean.maps` honest
    without an extra fetch). Pass ``spray_params=None`` to drop the spray
    leg (then ``spray_state`` must be None and returns None).
    """
    from .ocean import OceanMaps, _step_frames_impl

    def fn(state, params, spray_state, clock, wc, fc, pos, pitch, yaw,
           fov, dt):
        dt = jnp.float32(dt)
        state, stacked = _step_frames_impl(config, state, params, dt,
                                           num_frames)
        scales = params.map_scales()

        def body(carry, k):
            sp, clk = carry
            maps_k = OceanMaps(displacement=stacked.displacement[:, k],
                               normal=stacked.normal[:, k])
            clk = clk + dt
            if spray_params is not None:
                sp, attrs = spray.spray_step(spray_params, sp, maps_k,
                                             scales, clk)
                frame = renderer._render_spray(maps_k, scales, wc, fc, pos,
                                               pitch, yaw, fov, attrs)
            else:
                frame = renderer._render(maps_k, scales, wc, fc, pos,
                                         pitch, yaw, fov)
            return (sp, clk), frame

        (spray_state, _), frames = jax.lax.scan(
            body, (spray_state, jnp.float32(clock)),
            jnp.arange(num_frames))
        last = OceanMaps(displacement=stacked.displacement[:, -1],
                        normal=stacked.normal[:, -1])
        return state, spray_state, frames, last

    return jax.jit(fn)
