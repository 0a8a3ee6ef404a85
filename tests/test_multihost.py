"""Multi-host layer dry-run on the virtual CPU mesh (SURVEY section 5.8).

Single-process here, but the code paths (mesh construction honoring process
boundaries, orbax sharded save/restore with resharding, allgather of maps)
are identical to a pod run.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from godotoceanwaves_tpu import SimConfig
from godotoceanwaves_tpu.models.cascade import default_cascades
from godotoceanwaves_tpu.parallel import (
    build_mesh, gather_maps, make_multichip_init, make_multichip_step,
    make_multihost_mesh, multipatch_params, restore_sharded, save_sharded,
)

N = 64


def _setup(mesh, num_patches):
    config = SimConfig(map_size=N, fft_impl="matmul")
    params = multipatch_params(default_cascades(), num_patches=num_patches, seed=3)
    state = make_multichip_init(mesh, config)(params)
    step = make_multichip_step(mesh, config)
    return config, params, state, step


def test_multihost_mesh_keeps_rows_on_host():
    mesh = make_multihost_mesh(rows=2)
    assert mesh.shape["rows"] == 2
    assert mesh.shape["patch"] == len(jax.devices()) // 2
    # rows groups are contiguous per-host device runs (ICI locality proxy)
    arr = mesh.devices
    for row_group in arr:
        ids = [d.id for d in row_group]
        assert ids == sorted(ids)
    with pytest.raises(ValueError, match="ICI"):
        make_multihost_mesh(rows=3)  # does not divide per-host device count


def test_sharded_checkpoint_roundtrip_and_reshard(tmp_path):
    mesh_a = build_mesh(jax.devices(), rows=2)        # (4 patch, 2 rows)
    config, params, state, step = _setup(mesh_a, num_patches=4)
    state, _ = step(state, params, jnp.float32(0.02))
    save_sharded(tmp_path / "ckpt", state)

    # continue WITHOUT checkpoint for the truth trajectory
    cont, maps_truth = step(state, params, jnp.float32(0.02))

    # restore onto a DIFFERENT mesh layout and continue there
    mesh_b = build_mesh(jax.devices(), rows=4)        # (2 patch, 4 rows)
    restored = restore_sharded(tmp_path / "ckpt", mesh_b,
                               jax.eval_shape(lambda s: s, state))
    step_b = make_multichip_step(mesh_b, config)
    cont_b, maps_b = step_b(restored, params, jnp.float32(0.02))

    np.testing.assert_allclose(np.asarray(cont_b.foam), np.asarray(cont.foam),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(maps_b.displacement, np.float32),
        np.asarray(maps_truth.displacement, np.float32), atol=1e-4)


def test_gather_maps_assembles_global_arrays():
    mesh = build_mesh(jax.devices(), rows=2)
    config, params, state, step = _setup(mesh, num_patches=4)
    _, maps = step(state, params, jnp.float32(0.02))
    host = gather_maps(maps)
    assert host.displacement.shape == (4, 3, 3, N, N)
    assert np.isfinite(host.displacement).all()
