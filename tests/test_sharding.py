"""Multi-device tests on the virtual 8-device CPU mesh.

Validates: the distributed FFT's all-to-all transpose equals the single-device
chain; the fully sharded step equals the reference single-device step; patch
data-parallelism; and >1024 resolution support (the reference's hard cap).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state, step
from godotoceanwaves_tpu.ops import fft
from godotoceanwaves_tpu.parallel import (
    build_mesh, ifft2_packed_sharded, make_multichip_init, make_multichip_step,
    multipatch_params,
)

N = 64


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("rows", [2, 4, 8])
def test_sharded_fft_matches_single_device(rows):
    devs = jax.devices()[:rows]
    mesh = Mesh(np.asarray(devs).reshape(1, rows), ("patch", "rows"))
    rs = np.random.RandomState(0)
    x = (rs.randn(4, N, N) + 1j * rs.randn(4, N, N)).astype(np.complex64)

    ref = np.asarray(fft.ifft2_packed(jnp.asarray(x), impl="matmul", fold_sign=True))

    def local(xl):
        return ifft2_packed_sharded(xl, "rows", impl="matmul", fold_sign=True)

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(None, "rows", None),),
        out_specs=P(None, "rows", None), check_vma=False))
    got = np.asarray(sharded(jnp.asarray(x)))
    scale = np.sqrt(np.mean(np.abs(ref) ** 2))
    assert np.sqrt(np.mean(np.abs(got - ref) ** 2)) / scale < 1e-4


def test_multichip_step_matches_reference_step():
    """(patch=2, rows=4) sharded step == per-patch single-device steps."""
    mesh = build_mesh(jax.devices(), rows=4)  # (2, 4)
    cfg = SimConfig(map_size=N, fft_impl="matmul")
    base = default_cascades()
    params = multipatch_params(base, num_patches=2, seed=3)

    init = make_multichip_init(mesh, cfg)
    sharded_step = make_multichip_step(mesh, cfg)
    state = init(params)
    state2, maps = sharded_step(state, params, 0.02)

    # reference: run each patch through the plain single-device step
    for patch in range(2):
        p = jax.tree.map(lambda x: x[patch], params)
        s = init_state(cfg, p)
        _, ref_maps = step(cfg, s, p, 0.02)
        got = np.asarray(maps.displacement[patch])
        ref = np.asarray(ref_maps.displacement)
        scale = max(1e-9, np.sqrt(np.mean(ref ** 2)))
        assert np.sqrt(np.mean((got - ref) ** 2)) / scale < 1e-4, f"patch {patch}"


def test_multichip_foam_recurrence_consistent():
    mesh = build_mesh(jax.devices(), rows=2)  # (4, 2)
    cfg = SimConfig(map_size=N, fft_impl="matmul")
    params = multipatch_params(default_cascades(), num_patches=4, seed=9)
    init = make_multichip_init(mesh, cfg)
    sharded_step = make_multichip_step(mesh, cfg)
    state = init(params)
    for _ in range(4):
        state, maps = sharded_step(state, params, 0.1)
    foam = np.asarray(maps.normal[:, :, 3])
    assert foam.min() >= 0.0 and foam.max() <= 1.0
    assert foam.max() > 0.0


def test_beyond_reference_resolution_cap():
    """2048^2 — past MAX_MAP_SIZE=1024 (fft_compute.glsl:9) — via row sharding."""
    mesh = build_mesh(jax.devices(), rows=8)  # all devices on the FFT
    cfg = SimConfig(map_size=2048, fft_impl="matmul")
    base = default_cascades()
    one = jax.tree.map(lambda x: x[:1], base)  # single cascade to keep CPU time sane
    params = multipatch_params(one, num_patches=1, seed=1)
    init = make_multichip_init(mesh, cfg)
    sharded_step = make_multichip_step(mesh, cfg)
    state = init(params)
    _, maps = sharded_step(state, params, 0.02)
    d = np.asarray(maps.displacement)
    assert d.shape == (1, 1, 3, 2048, 2048)
    assert np.isfinite(d).all() and d[:, :, 1].std() > 0.0


@pytest.mark.slow
def test_sharded_2048_matches_single_device():
    """Row-sharded 2048^2 output == unsharded XLA-FFT output (1 cascade)."""
    mesh = build_mesh(jax.devices(), rows=8)
    cfg = SimConfig(map_size=2048, fft_impl="matmul")
    one = jax.tree.map(lambda x: x[:1], default_cascades())
    params = multipatch_params(one, num_patches=1, seed=5)

    state = make_multichip_init(mesh, cfg)(params)
    _, maps = make_multichip_step(mesh, cfg)(state, params, 0.02)

    cfg_ref = SimConfig(map_size=2048, fft_impl="xla")
    p_ref = jax.tree.map(lambda x: x[0], params)   # strip patch axis -> (C,)
    s_ref = init_state(cfg_ref, p_ref)
    _, maps_ref = step(cfg_ref, s_ref, p_ref, 0.02)

    got = np.asarray(maps.displacement[0])
    ref = np.asarray(maps_ref.displacement)
    scale = max(1e-9, np.sqrt(np.mean(ref ** 2)))
    assert np.sqrt(np.mean((got - ref) ** 2)) / scale < 1e-4


@pytest.mark.slow
def test_multichip_step_pallas_rows_kernel_seam(monkeypatch):
    """Execute the PRODUCTION multi-chip composition with the Pallas rows
    kernel actually selected (sharding.py impl routing + ifft2_planes_sharded
    impl="pallas"): 1024^2, rows=8 -> rows_local=128 satisfies the kernel's
    128-row alignment. Interpret mode stands in for Mosaic; parity is against
    the matmul-tier sharded step (itself pinned to the single-device chain)."""
    import functools

    from jax.experimental import pallas as pl

    from godotoceanwaves_tpu import CascadeParams
    from godotoceanwaves_tpu.parallel import sharding as sh

    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    # spy: the rows kernel must actually be traced by the sharded step
    from godotoceanwaves_tpu.ops import pallas_fft
    calls = []
    real_kernel = pallas_fft.idft_rows_planes_pallas
    monkeypatch.setattr(
        pallas_fft, "idft_rows_planes_pallas",
        lambda x, fold_sign=False: (calls.append(x.shape),
                                    real_kernel(x, fold_sign))[1])
    mesh = build_mesh(jax.devices(), rows=8)   # (1, 8)
    one = CascadeParams.create(tile_length=(96.0, 96.0), wind_speed=11.0,
                               fetch_length=180.0, spectrum_seed=(11, -4))
    params = multipatch_params(
        jax.tree.map(lambda x: x[None], one), num_patches=1, seed=2)

    cfg_pl = SimConfig(map_size=1024, fft_impl="pallas")
    cfg_mm = SimConfig(map_size=1024, fft_impl="matmul")
    # the impl routing must actually pick the rows kernel for this mesh
    assert mesh.shape[sh.ROWS_AXIS] == 8 and 1024 // 8 == 128

    state_pl = make_multichip_init(mesh, cfg_pl)(params)
    state_mm = make_multichip_init(mesh, cfg_mm)(params)
    _, maps_pl = make_multichip_step(mesh, cfg_pl)(state_pl, params, 0.02)
    assert calls and all(s[-2:] == (128, 1024) for s in calls), calls
    _, maps_mm = make_multichip_step(mesh, cfg_mm)(state_mm, params, 0.02)

    got = np.asarray(maps_pl.displacement, np.float64)
    ref = np.asarray(maps_mm.displacement, np.float64)
    scale = max(1e-9, np.sqrt(np.mean(ref ** 2)))
    assert np.sqrt(np.mean((got - ref) ** 2)) / scale < 1e-4
    gn = np.asarray(maps_pl.normal, np.float64)
    rn = np.asarray(maps_mm.normal, np.float64)
    assert np.sqrt(np.mean((gn - rn) ** 2)) < 1e-4


@pytest.mark.slow
def test_render_geometry_sharded_matches_single_device():
    """Row-banded multi-chip render == the single-device frame.

    The renderer's `rows` window is bit-exact against the corresponding
    dense rows (asserted below); the assembled shard_map frame matches up
    to jit fusion reassociation (~1e-5 on [0,1] colors — the whole render
    is compiled as one program per shard, the dense reference runs op by
    op)."""
    from godotoceanwaves_tpu.parallel import render_geometry_sharded
    from godotoceanwaves_tpu.models import geometry

    cfg = SimConfig(map_size=N, fft_impl="matmul")
    params = default_cascades()
    state = init_state(cfg, params)
    _, maps = step(cfg, state, params, 0.02)
    scales = params.map_scales()
    kw = dict(quality="low", width=64, camera_pos=(0.0, 6.0, 0.0),
              pitch_deg=-10.0, yaw_deg=15.0, sampler="gather",
              gradient_lod=False, march_steps=12, bisect_steps=3)

    dense = np.asarray(geometry.render_ocean_geometry(
        maps, scales, height=64, **kw))
    # the rows window alone (one device's unit of work) is bit-exact
    band = np.asarray(geometry.render_ocean_geometry(
        maps, scales, height=64, rows=(8, 8), **kw))
    np.testing.assert_array_equal(band, dense[8:16])

    mesh = build_mesh(jax.devices(), rows=4)  # (2, 4): rows spread over both
    got = np.asarray(render_geometry_sharded(mesh, maps, scales,
                                             height=64, **kw))
    assert got.shape == dense.shape == (64, 64, 3)
    np.testing.assert_allclose(got, dense, atol=1e-4)


@pytest.mark.slow
def test_render_geometry_sharded_lod_bands_close():
    """With gradient LOD on, each device picks mips from its LOCAL band's
    hit distances — a (documented) banding difference vs the dense frame,
    bounded because the LOD criterion is conservative sub-pixel."""
    from godotoceanwaves_tpu.parallel import render_geometry_sharded
    from godotoceanwaves_tpu.models import geometry

    cfg = SimConfig(map_size=N, fft_impl="matmul")
    params = default_cascades()
    state = init_state(cfg, params)
    _, maps = step(cfg, state, params, 0.02)
    scales = params.map_scales()
    kw = dict(quality="low", width=64, camera_pos=(0.0, 6.0, 0.0),
              pitch_deg=-10.0, sampler="mxu", gradient_lod=True,
              march_steps=12, bisect_steps=3)

    dense = np.asarray(geometry.render_ocean_geometry(
        maps, scales, height=64, **kw))
    mesh = build_mesh(jax.devices(), rows=2)
    got = np.asarray(render_geometry_sharded(mesh, maps, scales,
                                             height=64, **kw))
    rms = np.sqrt(np.mean((got - dense) ** 2))
    assert np.isfinite(got).all() and rms < 0.05


@pytest.mark.slow
def test_render_geometry_sharded_render_scale():
    """`render_scale` composes with row sharding: each device renders its
    band at 1/s and upsamples locally; band interiors match the
    single-device scaled frame (clamped band seams excepted)."""
    from godotoceanwaves_tpu.parallel import render_geometry_sharded
    from godotoceanwaves_tpu.models import geometry

    cfg = SimConfig(map_size=N, fft_impl="matmul")
    params = default_cascades()
    state = init_state(cfg, params)
    _, maps = step(cfg, state, params, 0.02)
    scales = params.map_scales()
    kw = dict(quality="low", width=64, camera_pos=(0.0, 6.0, 0.0),
              pitch_deg=-10.0, sampler="gather", gradient_lod=False,
              march_steps=12, bisect_steps=3, render_scale=2)

    dense = np.asarray(geometry.render_ocean_geometry(
        maps, scales, height=64, **kw))
    mesh = build_mesh(jax.devices(), rows=2)
    # restrict to the 2-device rows axis: 2 bands of 32 rows (each band
    # upsamples locally, so band count = seam count)
    got = np.asarray(render_geometry_sharded(mesh, maps, scales,
                                             height=64, axes="rows", **kw))
    assert got.shape == dense.shape == (64, 64, 3)
    # interiors of each 32-row band agree; the clamped upsample seam at the
    # band boundary may differ by <=3s=6 output rows on each side (catrom
    # 4-tap footprint + 3x3 anti-ringing clamp window), and the band's
    # (32, 16) upsample matmul accumulates in a different order than the
    # dense frame's (64, 32) one (~5e-4 on [0,1] colors — well under a
    # uint8 quantization step)
    np.testing.assert_allclose(got[:26], dense[:26], atol=1e-3)
    np.testing.assert_allclose(got[38:], dense[38:], atol=1e-3)


def test_render_geometry_sharded_rejects_indivisible_height():
    from godotoceanwaves_tpu.parallel import render_geometry_sharded

    mesh = build_mesh(jax.devices(), rows=4)
    with pytest.raises(ValueError):
        render_geometry_sharded(mesh, None, None, height=63)
