"""Cascade parameter model + simulation config.

`CascadeParams` is the pytree analog of the reference's resource
`WaveCascadeParameters` (assets/water/wave_cascade_parameters.gd:7-35): the
same 11 user-facing fields with the same defaults, stored as JAX arrays so a
stacked instance (leading cascade axis) vmaps/shards cleanly and parameter
changes never trigger recompilation.

`SimConfig` carries the static configuration (map size, physics constants,
dtype/FFT policy) — the analog of the reference's push-constant ABI plus
project-level settings (SURVEY.md section 5.6).

`default_cascades()` reproduces the reference demo scene's three cascades
(main.tscn:43-83: 88 m / 57 m / 16 m tiles).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class CascadeParams:
    """One wave cascade's parameters (or a stack of them with a leading axis).

    Fields mirror wave_cascade_parameters.gd; `wind_direction` is degrees (the
    reference converts to radians at dispatch, wave_generator.gd:71),
    `fetch_length` is kilometers (converted to meters at dispatch,
    wave_generator.gd:69-70).
    """
    tile_length: jax.Array          # (..., 2) float32, meters
    displacement_scale: jax.Array   # float32 in [0, 2]
    normal_scale: jax.Array         # float32 in [0, 2]
    wind_speed: jax.Array           # float32, m/s (clamped >= 1e-4)
    wind_direction: jax.Array       # float32, degrees
    fetch_length: jax.Array         # float32, km (clamped >= 1e-4)
    swell: jax.Array                # float32 in [0, 2]
    spread: jax.Array               # float32 in [0, 1]
    detail: jax.Array               # float32 in [0, 1]
    whitecap: jax.Array             # float32 in [0, 2]
    foam_amount: jax.Array          # float32 in [0, 10]
    spectrum_seed: jax.Array        # (..., 2) int32

    @classmethod
    def create(
        cls,
        tile_length: tuple[float, float] | float = (50.0, 50.0),
        displacement_scale: float = 1.0,
        normal_scale: float = 1.0,
        wind_speed: float = 20.0,
        wind_direction: float = 0.0,
        fetch_length: float = 550.0,
        swell: float = 0.8,
        spread: float = 0.2,
        detail: float = 1.0,
        whitecap: float = 0.5,
        foam_amount: float = 5.0,
        spectrum_seed: tuple[int, int] = (0, 0),
    ) -> "CascadeParams":
        if isinstance(tile_length, (int, float)):
            tile_length = (float(tile_length), float(tile_length))
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(
            tile_length=f32(tile_length),
            displacement_scale=f32(displacement_scale),
            normal_scale=f32(normal_scale),
            wind_speed=f32(max(1e-4, wind_speed)),       # setter clamp, gd:15
            wind_direction=f32(wind_direction),
            fetch_length=f32(max(1e-4, fetch_length)),   # setter clamp, gd:20
            swell=f32(swell),
            spread=f32(spread),
            detail=f32(detail),
            whitecap=f32(whitecap),
            foam_amount=f32(foam_amount),
            spectrum_seed=jnp.asarray(spectrum_seed, jnp.int32),
        )

    @property
    def num_cascades(self) -> int:
        return 1 if self.wind_speed.ndim == 0 else self.wind_speed.shape[0]

    def map_scales(self) -> jax.Array:
        """(..., 4) per-cascade (1/Lx, 1/Ly, displacement_scale, normal_scale).

        The material-facing uniform the orchestrator derives per cascade
        (water.gd:102-110).
        """
        uv = 1.0 / self.tile_length
        return jnp.stack(
            [uv[..., 0], uv[..., 1], self.displacement_scale, self.normal_scale],
            axis=-1,
        )


def stack_cascades(cascades: Sequence[CascadeParams]) -> CascadeParams:
    """Stack single-cascade params into one pytree with a leading cascade axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cascades)


# The reference demo scene's 3 cascades (main.tscn:43-83), as plain host
# dicts: importable without touching a JAX backend (the ambience path in
# demo.py reads wind speeds from here, device-free), and the single source
# default_cascades() builds from.
DEFAULT_SCENE: tuple[dict, ...] = (
    dict(tile_length=(88.0, 88.0), displacement_scale=1.0, normal_scale=1.0,
         wind_speed=10.0, wind_direction=20.0, fetch_length=150.0, swell=0.8,
         spread=0.2, detail=1.0, whitecap=0.5, foam_amount=8.0),
    dict(tile_length=(57.0, 57.0), displacement_scale=0.75, normal_scale=1.0,
         wind_speed=5.0, wind_direction=15.0, fetch_length=150.0, swell=0.8,
         spread=0.4, detail=1.0, whitecap=0.5, foam_amount=0.0),
    dict(tile_length=(16.0, 16.0), displacement_scale=0.0, normal_scale=0.25,
         wind_speed=20.0, wind_direction=20.0, fetch_length=550.0, swell=0.8,
         spread=0.4, detail=1.0, whitecap=0.25, foam_amount=3.0),
)


def default_cascades(seed: int = 1234, godot_seeds: bool = False) -> CascadeParams:
    """The reference demo scene's 3 cascades (main.tscn:43-83, DEFAULT_SCENE).

    Per-cascade spectrum seeds are drawn from a host RNG fixed like the
    orchestrator's (water.gd:68-69, "This seed gives big waves!") in the same
    [-10000, 10000]^2 range (water.gd:31). With `godot_seeds`, a bit-exact
    pcg32 implementation of Godot's RandomNumberGenerator supplies the stream
    (utils/godot_rng.py — core validated against the canonical pcg-c-basic
    check vectors; Godot's srandom/boundedrand wiring transcribed per method).
    """
    if godot_seeds:
        from ..utils.godot_rng import GodotRNG
        grng = GodotRNG(seed)
        seeds = [(grng.randi_range(-10000, 10000), grng.randi_range(-10000, 10000))
                 for _ in range(3)]
    else:
        rng = np.random.RandomState(seed)
        seeds = [tuple(int(v) for v in rng.randint(-10000, 10001, 2)) for _ in range(3)]
    return stack_cascades(
        [CascadeParams.create(spectrum_seed=s, **kw)
         for s, kw in zip(seeds, DEFAULT_SCENE)]
    )


def dual_wind_swell_cascades(seed: int = 77) -> CascadeParams:
    """A two-spectrum ocean: local wind sea + long-fetch swell (config 5).

    The wind cascade is short-fetch, broad-spread, high-detail chop; the swell
    cascade is long-fetch, strongly swell-shaped (Horvath s_xi term,
    spectrum_compute.glsl:84-85), narrow spread, long tile.
    """
    rng = np.random.RandomState(seed)
    seeds = [tuple(int(v) for v in rng.randint(-10000, 10001, 2)) for _ in range(2)]
    wind = CascadeParams.create(
        tile_length=(64.0, 64.0), wind_speed=14.0, wind_direction=25.0,
        fetch_length=80.0, swell=0.2, spread=0.35, detail=1.0,
        whitecap=0.6, foam_amount=6.0, spectrum_seed=seeds[0])
    swell = CascadeParams.create(
        tile_length=(256.0, 256.0), wind_speed=22.0, wind_direction=-40.0,
        fetch_length=900.0, swell=1.8, spread=0.08, detail=0.6,
        displacement_scale=1.2, whitecap=1.2, foam_amount=1.0,
        spectrum_seed=seeds[1])
    return stack_cascades([wind, swell])


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation configuration (hashable; safe as a jit static arg).

    map_size: FFT/map resolution. The reference offers {128, 256, 512, 1024}
      (water.gd:38) and hard-caps at 1024 (fft_compute.glsl:9); we accept any
      power of two — sizes beyond 1024 use the sharded FFT path.
    depth / g: physics constants (wave_generator.gd:5-6).
    fft_impl: "auto" | "xla" | "matmul" | "direct" (see ops/fft.py).
    map_dtype: "float32" | "bfloat16" | "float16" output-map policy (fp32 FFT
      core either way). "float16" matches the reference's RGBA16F output maps
      bit-width-for-bit-width (wave_generator.gd:34-35) and is the dtype to
      use when pinning parity against fp16-quantized reference output
      (SURVEY.md section 7.3.2); "bfloat16" is the TPU-native production
      choice (fused-kernel path, same 2 bytes/texel).
    """
    map_size: int = 1024
    depth: float = 20.0
    g: float = 9.81
    fft_impl: str = "auto"
    map_dtype: str = "float32"
    fold_sign: bool = True
    fused: str = "auto"   # "auto" | "never" — single-kernel step on TPU

    def __post_init__(self):
        if self.map_size & (self.map_size - 1):
            raise ValueError(f"map_size must be a power of two, got {self.map_size}")
        if self.map_size < 4:
            # the matmul tier's fold_sign four-step factorization needs an
            # even split factor (ops/fft.py); 1x1 or 2x2 oceans are meaningless
            raise ValueError(f"map_size must be >= 4, got {self.map_size}")

    def resolved_fft_impl(self) -> str:
        if self.fft_impl != "auto":
            return self.fft_impl
        if jax.default_backend() != "tpu":
            # jnp.fft works everywhere but TPU; the Pallas/Mosaic kernels and
            # the matmul-precision workaround are TPU-only concerns
            return "xla"
        # the Pallas kernels factor N = Q*128 and keep whole layers in VMEM
        # (~128 MB/core => N <= 1024); other sizes use the MXU matmul tier
        return "pallas" if (self.map_size % 128 == 0
                            and self.map_size <= 1024) else "matmul"

    def resolved_map_dtype(self):
        return {"bfloat16": jnp.bfloat16,
                "float16": jnp.float16}.get(self.map_dtype, jnp.float32)

    def use_fused_step(self) -> bool:
        """Whether `step` runs the single fused Pallas kernel (TPU fast path).

        Requires the Pallas tier (N = Q*128) and a per-cascade VMEM footprint
        that fits v5e's ~128 MB (fp32 map outputs at 1024^2 fit via
        single-buffered output windows). float16 maps (the fp16
        parity-pinning dtype, wave_generator.gd:34-35) run the kernel at
        fp32 with a cast at the output window — f16 is not a native Mosaic
        store dtype on this backend (docs/PERF.md).
        """
        if self.fused == "never":
            return False
        if self.resolved_fft_impl() != "pallas" or self.map_size % 128:
            return False
        # per-cascade VMEM working set exceeds ~128 MB beyond 1024 (fp32 maps
        # at 1024 fit via single-buffered output windows)
        return self.map_size <= 1024

    def use_strip_step(self) -> bool:
        """Whether `step` runs the strip-mined two-kernel Pallas path.

        Covers map sizes past VMEM layer-residency (N > 1024): the fused
        chain runs as two strip-grid kernels with the mid-chain layers staged
        through HBM (ops/pallas_strip.py). Upper bound N = 8192: the sigma
        digit un-swap needs Q = N/128 <= 128 and per-program windows ~Q/2 MB.
        float16 maps run at fp32 in-kernel with an output-window cast, as on
        the fused path.
        """
        if self.fused == "never":
            return False
        if self.map_size % 128 or not (1024 < self.map_size <= 8192):
            return False
        if self.fft_impl == "pallas":   # explicit request (tests/interpret)
            return True
        return self.fft_impl == "auto" and jax.default_backend() == "tpu"
