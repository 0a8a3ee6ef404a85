"""Parallel: device meshes, sharded FFT, multi-patch data parallelism."""
from .sharding import (
    PATCH_AXIS,
    ROWS_AXIS,
    build_mesh,
    ifft2_packed_sharded,
    ifft2_planes_sharded,
    make_multichip_init,
    make_multichip_step,
    multipatch_params,
    shard_state,
)

__all__ = [
    "PATCH_AXIS", "ROWS_AXIS", "build_mesh", "ifft2_packed_sharded",
    "ifft2_planes_sharded",
    "make_multichip_init", "make_multichip_step", "multipatch_params",
    "shard_state",
]
