"""Multi-chip oceans on a device mesh — runnable without a pod.

Shards P independent ocean patches over the `patch` mesh axis and each
patch's 2D FFT over the `rows` axis (the FFT's transpose becomes an ICI
all-to-all). On real hardware `build_mesh(jax.devices(), rows=...)` does the
same thing over actual chips; here we force the standard JAX virtual-device
fixture (8 CPU devices) so the example runs anywhere:

    python examples/multichip.py
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# This must run before any other jax use: some environments pre-register an
# accelerator backend via sitecustomize, and env vars alone lose to it.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from godotoceanwaves_tpu import SimConfig, default_cascades  # noqa: E402
from godotoceanwaves_tpu.parallel import (  # noqa: E402
    build_mesh, make_multichip_init, make_multichip_step, multipatch_params,
)

# (patch=2, rows=4): two independent ocean patches, each FFT row-sharded
# over 4 devices. rows rides ICI on hardware (see parallel/multihost.py for
# the DCN-aware multi-host variant).
mesh = build_mesh(jax.devices(), rows=4)
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

config = SimConfig(map_size=256, fft_impl="matmul")
params = multipatch_params(default_cascades(), num_patches=2, seed=3)

init = make_multichip_init(mesh, config)
step = make_multichip_step(mesh, config)

state = init(params)
for i in range(5):
    state, maps = step(state, params, 1 / 60)

print("displacement:", maps.displacement.shape,   # (P, C, 3, N, N)
      "sharding:", maps.displacement.sharding.spec)
heights = np.asarray(maps.displacement[:, :, 1].astype(jax.numpy.float32))
print("per-patch height rms:", [round(float(np.std(h)), 3) for h in heights])

# Multi-chip rendering: the frame's pixel rows spread over ALL 8 devices
# (each renders a horizontal band of patch 0's ocean; zero cross-device
# traffic — see parallel.sharding.render_geometry_sharded).
from godotoceanwaves_tpu.models.ocean import OceanMaps  # noqa: E402
from godotoceanwaves_tpu.parallel import render_geometry_sharded  # noqa: E402

patch0 = OceanMaps(displacement=maps.displacement[0],
                   normal=maps.normal[0])
img = render_geometry_sharded(
    mesh, patch0, jax.tree.map(lambda x: x[0], params).map_scales(),
    width=320, height=176, camera_pos=(0.0, 6.0, 0.0), pitch_deg=-8.0,
    sampler="gather", gradient_lod=False, march_steps=16, bisect_steps=3)
print("sharded render:", img.shape, "row-sharded over",
      img.sharding.spec, "finite:", bool(np.isfinite(np.asarray(img)).all()))
