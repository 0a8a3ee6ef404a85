"""godotoceanwaves_tpu — a TPU-native spectral ocean-wave framework in JAX.

Built from scratch with the capabilities of 2Retr0/GodotOceanWaves (studied
read-only; see SURVEY.md): TMA/JONSWAP + Horvath-spread wave spectra, Gaussian
initial state, dispersion-relation time modulation, Hermitian-packed 2D IFFT,
displacement/normal-map synthesis with persistent Jacobian foam — re-expressed
as pure JAX transforms, MXU-friendly FFTs, Pallas kernels, and `shard_map`
sharding over TPU meshes.
"""
from . import models, ops
from .models import (
    CascadeParams,
    Ocean,
    OceanMaps,
    OceanState,
    SimConfig,
    default_cascades,
    init_state,
    simulate,
    step,
)

__version__ = "0.1.0"
__all__ = [
    "ops", "models", "CascadeParams", "Ocean", "OceanMaps", "OceanState",
    "SimConfig", "default_cascades", "init_state", "simulate", "step",
]
