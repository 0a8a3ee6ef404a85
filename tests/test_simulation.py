"""Session-layer tests: state management, scheduler, dirty bits, checkpointing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from godotoceanwaves_tpu import (
    CascadeParams, Ocean, SimConfig, default_cascades, init_state, simulate, step,
)
from godotoceanwaves_tpu.models.ocean import step_cascade

N = 64


def small_config(**kw):
    return SimConfig(map_size=N, **kw)


def test_runtime_cascade_add_remove():
    """water.gd:22-35 semantics: assigning the cascade array re-seeds every
    cascade from the session RNG, resets time offsets to 120 + pi*i, and
    rebuilds the pipeline for the new cascade count."""
    from godotoceanwaves_tpu import CascadeParams, Ocean

    ocean = Ocean(map_size=N, updates_per_second=0)
    assert ocean.num_cascades == 3
    maps3 = ocean.update(0.02)
    assert maps3.displacement.shape[0] == 3

    # grow to 4 cascades mid-session
    four = [CascadeParams.create(tile_length=L, wind_speed=W)
            for L, W in [(88.0, 10.0), (57.0, 5.0), (16.0, 20.0), (200.0, 15.0)]]
    ocean.set_cascades(four)
    assert ocean.num_cascades == 4
    np.testing.assert_allclose(np.asarray(ocean.state.time),
                               120.0 + np.pi * np.arange(4), rtol=1e-6)
    seeds4 = np.asarray(ocean.params.spectrum_seed).copy()
    assert (np.abs(seeds4) <= 10000).all()
    maps4 = ocean.update(0.02)
    assert maps4.displacement.shape[0] == 4
    assert bool(jnp.isfinite(maps4.displacement).all())

    # shrink to 1; the RNG stream continues (fresh seeds, not a repeat)
    ocean.set_cascades([CascadeParams.create(tile_length=100.0, wind_speed=12.0)])
    assert ocean.num_cascades == 1
    assert ocean.update(0.02).displacement.shape[0] == 1
    assert np.asarray(ocean.params.spectrum_seed).tolist() != seeds4[:1].tolist()

    # reseed=False keeps caller seeds/times verbatim
    keep = CascadeParams.create(tile_length=50.0, spectrum_seed=(7, -3))
    ocean.set_cascades([keep], reseed=False)
    assert np.asarray(ocean.params.spectrum_seed).tolist() == [[7, -3]]


def test_default_cascades_godot_seed_stream():
    """godot_seeds=True draws the per-cascade spectrum seeds from the
    bit-exact Godot RNG stream (water.gd:31, 68-69); pinned values so any
    change to the pcg32 wiring is loud."""
    p = default_cascades(godot_seeds=True)
    assert np.asarray(p.spectrum_seed).tolist() == [
        [6089, -7045], [8026, 4260], [-6627, 1309]]
    # distinct stream from the default host RNG, same documented range
    q = np.asarray(default_cascades().spectrum_seed)
    assert (np.abs(q) <= 10000).all()
    assert q.tolist() != np.asarray(p.spectrum_seed).tolist()
    # godot-seeded params drive the sim like any other
    cfg = small_config()
    s, maps = step(cfg, init_state(cfg, p), p, 0.02)
    assert bool(jnp.isfinite(maps.displacement).all())


def test_init_state_shapes_and_time_offsets():
    cfg = small_config()
    params = default_cascades()
    state = init_state(cfg, params)
    assert state.h0.shape == (3, 2, N, N) and state.h0.dtype == jnp.float32
    assert state.foam.shape == (3, N, N) and state.foam.dtype == jnp.float32
    # water.gd:32 — time = 120.0 + pi*i
    np.testing.assert_allclose(
        np.asarray(state.time), 120.0 + np.pi * np.arange(3), rtol=1e-6)


def test_step_shapes_time_advance_and_determinism():
    cfg = small_config()
    params = default_cascades()
    state = init_state(cfg, params)
    t_before = np.asarray(state.time).copy()
    s1, maps1 = step(cfg, state, params, 0.02)
    assert maps1.displacement.shape == (3, 3, N, N)
    assert maps1.normal.shape == (3, 4, N, N)
    np.testing.assert_allclose(np.asarray(s1.time), t_before + 0.02, rtol=1e-6)

    state_b = init_state(cfg, params)
    _, maps2 = step(cfg, state_b, params, 0.02)
    np.testing.assert_array_equal(np.asarray(maps1.displacement), np.asarray(maps2.displacement))


def test_fold_sign_paths_agree():
    params = default_cascades()
    outs = []
    for fold in (True, False):
        cfg = small_config(fold_sign=fold)
        state = init_state(cfg, params)
        _, maps = step(cfg, state, params, 0.02)
        outs.append(np.asarray(maps.displacement))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)


def test_foam_accumulates_and_normal_alpha_matches_state():
    cfg = small_config()
    params = default_cascades()
    state = init_state(cfg, params)
    for _ in range(5):
        state, maps = step(cfg, state, params, 0.1)
    assert float(jnp.max(state.foam)) > 0.0  # big-wave preset does produce foam
    np.testing.assert_allclose(
        np.asarray(maps.normal[:, 3]), np.asarray(state.foam), atol=1e-6)


def test_simulate_scan_equals_repeated_step():
    cfg = small_config()
    params = default_cascades()
    state = init_state(cfg, params)
    final_scan, maps_seq = simulate(cfg, state, params, 0.05, 4)

    state_b = init_state(cfg, params)
    for _ in range(4):
        state_b, maps_b = step(cfg, state_b, params, 0.05)
    np.testing.assert_allclose(
        np.asarray(final_scan.foam), np.asarray(state_b.foam), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(maps_seq.displacement[-1]), np.asarray(maps_b.displacement), atol=1e-3)


def test_step_cascade_only_touches_target_cascade():
    cfg = small_config()
    params = default_cascades()
    state = init_state(cfg, params)
    t_before = np.asarray(state.time).copy()
    foam0_before = np.asarray(state.foam[0]).copy()
    state1, maps = step_cascade(cfg, state, params, 0.02, 1)
    # all cascade times advance (wave_generator.gd:100-103)...
    np.testing.assert_allclose(np.asarray(state1.time), t_before + 0.02, rtol=1e-6)
    # ...but only cascade 1's foam/maps refresh
    np.testing.assert_array_equal(np.asarray(state1.foam[0]), foam0_before)
    assert np.any(np.asarray(maps.displacement[1]) != 0.0)
    assert not np.any(np.asarray(maps.displacement[0]))


def test_dirty_bit_regeneration():
    ocean = Ocean(map_size=N, updates_per_second=0)
    h0_before = np.asarray(ocean.state.h0)
    ocean.set_cascade(1, wind_speed=17.0)
    assert ocean._dirty[1] and not ocean._dirty[0]
    ocean.update(0.02)
    h0_after = np.asarray(ocean.state.h0)
    np.testing.assert_array_equal(h0_after[0], h0_before[0])  # clean cascade untouched
    assert np.any(h0_after[1] != h0_before[1])                # dirty cascade regenerated
    assert not ocean._dirty.any()


def test_scale_params_do_not_dirty_spectrum():
    ocean = Ocean(map_size=N)
    ocean.set_cascade(0, displacement_scale=0.5, normal_scale=0.3)
    assert not ocean._dirty.any()
    scales = np.asarray(ocean.params.map_scales())
    np.testing.assert_allclose(scales[0, 2], 0.5)
    np.testing.assert_allclose(scales[0, 3], 0.3)
    np.testing.assert_allclose(scales[0, 0], 1.0 / 88.0, rtol=1e-6)


def test_scheduler_rate_limiting_and_delta_compensation():
    ocean = Ocean(map_size=N, updates_per_second=10.0)  # period 0.1s
    t0 = np.asarray(ocean.state.time).copy()
    assert ocean.update(0.02) is not None      # first frame always updates
    assert ocean.update(0.02) is None          # 0.02 < next_update_time
    for _ in range(3):
        ocean.update(0.02)
    assert ocean.update(0.02) is not None      # crossed the 0.1s boundary
    # dt compensation: total simulated time tracks the scheduled period
    t1 = np.asarray(ocean.state.time)
    np.testing.assert_allclose(t1 - t0, 0.2, atol=1e-5)


def test_uncapped_scheduler_updates_every_frame():
    ocean = Ocean(map_size=N, updates_per_second=0)
    assert ocean.update(0.016) is not None
    assert ocean.update(0.016) is not None


def test_stagger_mode_round_robins():
    # With an uncapped scheduler every call is an update(): the previous
    # round's leftovers flush in one dispatch, then the new round refreshes
    # cascade 0 at the newly advanced time (wave_generator.gd:56-63, 90-98).
    ocean = Ocean(map_size=N, updates_per_second=0, stagger=True)
    ocean.update(0.02)
    d0 = np.asarray(ocean.maps.displacement)
    assert np.any(d0[0]) and not np.any(d0[1])   # only cascade 0 so far
    assert ocean._pending == [1, 2]
    ocean.update(0.02)
    d1 = np.asarray(ocean.maps.displacement)
    assert np.any(d1[1]) and np.any(d1[2])        # leftovers flushed together
    assert np.any(d1[0] != d0[0])                 # cascade 0 re-refreshed (new time)


def test_stagger_drains_one_cascade_per_skipped_frame():
    ocean = Ocean(map_size=N, updates_per_second=10.0, stagger=True)  # period 0.1
    assert ocean.update(0.02) is not None          # update fires: refresh 0
    assert ocean._pending == [1, 2]
    assert ocean.update(0.02) is not None          # skipped frame: refresh 1
    assert ocean._pending == [2]
    assert ocean.update(0.02) is not None          # skipped frame: refresh 2
    assert ocean._pending == []
    assert ocean.update(0.02) is None              # nothing pending, not due
    d = np.asarray(ocean.maps.displacement)
    assert all(np.any(d[i]) for i in range(3))     # every cascade refreshed


def test_stagger_catchup_flush_mid_round():
    # An update arriving while cascades are still pending flushes ALL of them
    # in one dispatch before arming the new round (wave_generator.gd:90-98),
    # so no cascade's maps lag more than one update period behind.
    ocean = Ocean(map_size=N, updates_per_second=10.0, stagger=True)
    ocean.update(0.15)                             # fires; pending [1, 2]
    assert ocean._pending == [1, 2]
    ocean.update(0.15)                             # next update due: flush + re-arm
    d = np.asarray(ocean.maps.displacement)
    assert all(np.any(d[i]) for i in range(3))     # leftovers did not starve
    assert ocean._pending == [1, 2]                # new round armed


def test_dirty_regeneration_touches_only_dirty_cascade():
    # Proof the clean cascades are NOT recomputed (wave_generator.gd:67-72
    # dirty-only dispatch): plant a sentinel in a clean cascade's h0 — full
    # regeneration would overwrite it with the true spectrum.
    ocean = Ocean(map_size=N, updates_per_second=0)
    sentinel = jnp.full_like(ocean.state.h0[0], 123.456)
    ocean.state = ocean.state.replace(h0=ocean.state.h0.at[0].set(sentinel))
    ocean.set_cascade(1, wind_speed=17.0)
    ocean.regenerate_dirty()
    np.testing.assert_array_equal(np.asarray(ocean.state.h0[0]), np.asarray(sentinel))
    assert not ocean._dirty.any()


def test_updates_per_second_setter_rebases_schedule():
    # water.gd:51-54: changing the rate adjusts next_update_time in flight.
    ocean = Ocean(map_size=N, updates_per_second=10.0)
    ocean.update(0.02)                 # fires; next_update_time = 0.1
    before = ocean._next_update_time
    ocean.updates_per_second = 50.0    # 1/10 - 1/50 = 0.08 sooner
    np.testing.assert_allclose(ocean._next_update_time, before - 0.08, atol=1e-6)
    assert ocean.updates_per_second == 50.0


def test_restore_validates_snapshot_shape():
    ocean = Ocean(map_size=N, updates_per_second=0)
    ocean.update(0.02)
    snap = ocean.checkpoint()

    # mismatched map_size: restore resizes the session to match
    bigger = Ocean(map_size=2 * N, updates_per_second=0)
    bigger.restore(snap)
    assert bigger.config.map_size == N
    assert bigger.maps.displacement.shape == (3, 3, N, N)
    assert bigger.update(0.02) is not None

    # mismatched cascade count: explicit error, not a downstream shape blowup
    two = Ocean(params=[CascadeParams.create(), CascadeParams.create(tile_length=31.0)],
                map_size=N, updates_per_second=0)
    with pytest.raises(ValueError, match="cascades"):
        two.restore(snap)


def test_checkpoint_restore_roundtrip():
    ocean = Ocean(map_size=N, updates_per_second=0)
    ocean.update(0.02)
    snap = ocean.checkpoint()
    maps_a = np.asarray(ocean.update(0.02).displacement)

    ocean2 = Ocean(map_size=N, updates_per_second=0)
    ocean2.restore(snap)
    maps_b = np.asarray(ocean2.update(0.02).displacement)
    np.testing.assert_array_equal(maps_a, maps_b)


def test_bf16_map_dtype_policy():
    cfg = small_config(map_dtype="bfloat16")
    params = default_cascades()
    state = init_state(cfg, params)
    s1, maps = step(cfg, state, params, 0.02)
    assert maps.displacement.dtype == jnp.bfloat16
    assert maps.normal.dtype == jnp.bfloat16
    assert s1.foam.dtype == jnp.float32  # fp32 recurrence regardless

    # bf16 maps stay close to the fp32 ones
    cfg32 = small_config()
    _, maps32 = step(cfg32, init_state(cfg32, params), params, 0.02)
    d32 = np.asarray(maps32.displacement)
    err = np.abs(np.asarray(maps.displacement, np.float32) - d32)
    assert np.mean(err) < 0.01 * max(1.0, np.abs(d32).mean())


def test_single_cascade_params():
    p = CascadeParams.create(tile_length=32.0, spectrum_seed=(5, 9))
    stacked = jax.tree.map(lambda x: x[None], p)
    cfg = small_config()
    state = init_state(cfg, stacked)
    _, maps = step(cfg, state, stacked, 0.02)
    assert maps.displacement.shape == (1, 3, N, N)


def test_map_size_validation():
    with pytest.raises(ValueError):
        SimConfig(map_size=100)
    with pytest.raises(ValueError):
        SimConfig(map_size=2)  # matmul fold_sign needs an even four-step factor


def test_multi_step_equals_repeated_step():
    from godotoceanwaves_tpu.models import multi_step
    cfg = small_config()
    params = default_cascades()
    sa = init_state(cfg, params)
    sa, maps_a = multi_step(cfg, sa, params, 0.05, 3)
    sb = init_state(cfg, params)
    for _ in range(3):
        sb, maps_b = step(cfg, sb, params, 0.05)
    np.testing.assert_allclose(np.asarray(sa.foam), np.asarray(sb.foam), atol=1e-3)
    np.testing.assert_allclose(np.asarray(maps_a.displacement),
                               np.asarray(maps_b.displacement), atol=1e-4)


def test_height_field_energy_parseval():
    """End-to-end energy conservation: the variance of the synthesized height
    field equals the spectral energy of the modulated spectrum (Parseval for
    the unnormalized positive-exponent DFT; the ifftshift sign and the
    single-transpose rotation are energy-preserving). Ties spectrum ->
    modulate -> IFFT -> unpack together with a closed-form invariant."""
    n = N
    cfg = small_config()
    params = default_cascades()
    state = init_state(cfg, params)
    h0_np = np.asarray(state.h0, np.float64)      # snapshot: step() donates
    nc_np = np.asarray(state.h0nc, np.float64)
    s1, maps = step(cfg, state, params, 0.02)

    g, depth = cfg.g, cfg.depth
    idg = np.arange(n, dtype=np.float64) - n / 2
    for c in range(3):
        tile = np.asarray(params.tile_length[c], np.float64)
        kx = idg[None, :] * (2 * np.pi / tile[0])
        ky = idg[:, None] * (2 * np.pi / tile[1])
        k = np.sqrt(kx * kx + ky * ky) + 1e-6
        w = np.sqrt(g * k * np.tanh(k * depth))
        t = float(s1.time[c])
        h0 = h0_np[c, 0] + 1j * h0_np[c, 1]
        nc = nc_np[c, 0] + 1j * nc_np[c, 1]
        hk = h0 * np.exp(1j * w * t) + nc * np.exp(-1j * w * t)

        hy = np.asarray(maps.displacement[c, 1], np.float64)
        var_map = hy.var()
        # Var = sum |h(k)|^2 - |DC|^2  (DC sits at the centered-grid origin
        # index N/2 after the (id - N/2) k-grid convention)
        energy = np.sum(np.abs(hk) ** 2) - np.abs(hk[n // 2, n // 2]) ** 2
        assert abs(var_map - energy) / max(energy, 1e-12) < 1e-4, (
            c, var_map, energy)


def test_session_global_colors_single_source():
    """water_color/foam_color live on the Ocean session (water.gd:14-18;
    project.godot:60-81 globals): one copy that every render surface reads,
    carried through checkpoint/restore."""
    from godotoceanwaves_tpu.models import shading
    from godotoceanwaves_tpu.utils.live import ansi_field

    ocean = Ocean(map_size=16, updates_per_second=0)
    np.testing.assert_allclose(ocean.water_color, shading.DEFAULT_WATER_COLOR)
    np.testing.assert_allclose(ocean.foam_color, shading.DEFAULT_FOAM_COLOR)

    ocean.water_color = np.array([0.5, 0.05, 0.05], np.float32)
    ocean.foam_color = np.array([0.9, 0.9, 0.1], np.float32)

    # the ANSI surface's palette tracks the session colors
    h = np.random.RandomState(0).randn(8, 8).astype(np.float32)
    f = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    assert ansi_field(h, f) != ansi_field(
        h, f, water_color=ocean.water_color, foam_color=ocean.foam_color)

    # the web panel's snapshot reads the same copy (no viewer-local state)
    from godotoceanwaves_tpu.utils.webviewer import WebViewer
    viewer = WebViewer(ocean, width=16, height=12)
    snap = viewer._snapshot_ocean()
    np.testing.assert_allclose(snap["water_color"], ocean.water_color,
                               atol=1e-6)
    viewer._apply({"name": "foam_color", "value": [1.0, 0.0, 0.0]})
    np.testing.assert_allclose(ocean.foam_color, [1.0, 0.0, 0.0], atol=1e-6)

    # checkpoint/restore round-trips the colors
    snap = ocean.checkpoint()
    fresh = Ocean(map_size=16, updates_per_second=0)
    fresh.restore(snap)
    np.testing.assert_allclose(fresh.water_color, ocean.water_color)
    np.testing.assert_allclose(fresh.foam_color, ocean.foam_color)
