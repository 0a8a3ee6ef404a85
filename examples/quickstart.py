"""Quickstart: the framework in ~60 lines.

Run from the repo root:  python examples/quickstart.py
(On CPU it uses the XLA FFT tier automatically; on TPU the fused kernel.)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from godotoceanwaves_tpu import (
    CascadeParams, Ocean, SimConfig, default_cascades, init_state, step,
)
from godotoceanwaves_tpu.models import FlyCamera, shading
from godotoceanwaves_tpu.utils import FrameStats, panel

# --- 1. the five-line version: a session with the reference demo's cascades
ocean = Ocean(map_size=256, updates_per_second=50.0)
for _ in range(10):
    maps = ocean.update(1 / 60) or ocean.maps
print("displacement planes:", maps.displacement.shape,  # (C, 3, N, N)
      "normal planes:", maps.normal.shape)              # (C, 4, N, N)

# --- 2. live parameter editing (the ImGui-panel capability)
ocean.set_cascade(0, wind_speed=18.0, swell=1.2)   # marks cascade 0 dirty
maps = ocean.update(1 / 60) or ocean.maps          # spectrum regenerates here

# --- 3. the functional core (jit/vmap/scan-friendly, no session object)
config = SimConfig(map_size=128, map_dtype="bfloat16")
params = default_cascades()
state = init_state(config, params)
state, maps2 = step(config, state, params, 1 / 60)

# --- 4. custom cascades
storm = CascadeParams.create(tile_length=200.0, wind_speed=30.0,
                             fetch_length=900.0, swell=1.5,
                             spectrum_seed=(17, -4))
import jax
solo = jax.tree.map(lambda x: x[None], storm)      # stack of one cascade
sstate = init_state(config, solo)
sstate, storm_maps = step(config, sstate, solo, 1 / 60)
print("storm height rms:", float(np.std(np.asarray(
    storm_maps.displacement[:, 1], dtype=np.float32))))

# --- 5. shaded render of the DISPLACED clipmap geometry, fly-camera driven
from godotoceanwaves_tpu.models import geometry

cam = FlyCamera()
cam.move(1.0, forward=-1.0)        # back up 10 m
cam.look(0.0, -20.0)               # tilt down a touch
img = geometry.render_ocean_geometry(
    ocean.maps, ocean.params.map_scales(), "low",
    width=320, height=180, **cam.render_kwargs())
print("rendered (displaced geometry):", img.shape)
# (shading.render_ocean is the cheap flat-plane preview of the same maps)

# --- 6. observability
stats = FrameStats()
for _ in range(5):
    stats.tick()
    ocean.update(1 / 60)
print(panel(ocean, stats)[:200], "...")

# --- 7. checkpoint / resume
snapshot = ocean.checkpoint()
ocean2 = Ocean(map_size=256)
ocean2.restore(snapshot)
print("restored; times:", np.asarray(ocean2.state.time))
