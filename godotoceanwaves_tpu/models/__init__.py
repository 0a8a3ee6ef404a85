"""Models: cascade parameters, ocean simulation session, spray, shading,
displaced-geometry rendering."""
from .camera import FlyCamera
from .cascade import (CascadeParams, SimConfig, default_cascades,
                      dual_wind_swell_cascades, stack_cascades)
from .geometry import (CLIPMAP_PRESETS, clipmap_axis_coords, displaced_grid,
                       render_ocean_geometry, surface_height)
from .viewport import SceneRenderer, SpraySession
from .ocean import (
    Ocean,
    OceanMaps,
    OceanState,
    generate_spectrum,
    init_state,
    multi_step,
    refresh_cascades,
    simulate,
    step,
    step_cascade,
    step_frames,
)

__all__ = [
    "FlyCamera", "CascadeParams", "SimConfig", "default_cascades",
    "dual_wind_swell_cascades", "stack_cascades",
    "CLIPMAP_PRESETS", "clipmap_axis_coords", "render_ocean_geometry",
    "Ocean", "OceanMaps", "OceanState", "generate_spectrum", "init_state",
    "multi_step", "refresh_cascades", "simulate", "step", "step_cascade", "step_frames",
]
