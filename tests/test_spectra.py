"""Spectrum math parity vs the NumPy oracle + closed-form sanity checks."""
import numpy as np
import jax.numpy as jnp

from godotoceanwaves_tpu.ops import spectra, initial_state, grid

import oracle

DEPTH = 20.0


def test_dispersion_parity():
    k = np.linspace(1e-4, 50.0, 4096, dtype=np.float32)
    w_ref, dw_ref = oracle.dispersion_relation(k, DEPTH)
    w, dw = spectra.dispersion_relation(jnp.asarray(k), DEPTH)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(dw), dw_ref, rtol=2e-5)


def test_dispersion_deep_water_limit():
    # k*depth >> 1  =>  w ~ sqrt(g k)
    k = np.float32(5.0)
    w, _ = spectra.dispersion_relation(jnp.asarray(k), 1000.0)
    assert abs(float(w) - np.sqrt(9.81 * 5.0)) < 1e-3


def test_longuet_higgins_parity_both_branches():
    s = np.concatenate([np.linspace(0.01, 0.39, 64), np.linspace(0.4, 80.0, 256)]).astype(np.float32)
    got = np.asarray(spectra.longuet_higgins_normalization(jnp.asarray(s)))
    np.testing.assert_allclose(got, oracle.longuet_higgins_normalization(s), rtol=1e-5)


def test_hasselmann_parity():
    w = np.linspace(0.05, 8.0, 2048, dtype=np.float32)
    w_p, u, swell, angle = 0.8, 12.0, 0.8, 0.3
    theta = np.linspace(-np.pi, np.pi, 2048, dtype=np.float32)
    ref = oracle.hasselmann_directional_spread(w, w_p, u, theta, swell, angle)
    got = np.asarray(spectra.hasselmann_directional_spread(
        jnp.asarray(w), w_p, u, jnp.asarray(theta), swell, angle))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)


def test_tma_parity():
    w = np.linspace(0.05, 10.0, 4096, dtype=np.float32)
    ref = oracle.tma_spectrum(w, 0.7, 0.012, DEPTH)
    got = np.asarray(spectra.tma_spectrum(jnp.asarray(w), 0.7, 0.012, DEPTH))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-10)


def test_jonswap_constants_parity():
    for u, f_km in [(20.0, 550.0), (10.0, 150.0), (5.0, 150.0), (0.0001, 0.0001)]:
        f = f_km * 1e3
        np.testing.assert_allclose(
            float(spectra.jonswap_alpha(jnp.float32(u), jnp.float32(f))),
            oracle.jonswap_alpha(u, f), rtol=1e-5)
        np.testing.assert_allclose(
            float(spectra.jonswap_peak_angular_frequency(jnp.float32(u), jnp.float32(f))),
            oracle.jonswap_peak_angular_frequency(u, f), rtol=1e-5)


def test_initial_spectrum_parity(rms):
    n = 64
    seed = (1234, -567)
    tile = (50.0, 50.0)
    u, f = 20.0, 550e3
    alpha = oracle.jonswap_alpha(u, f)
    w_p = oracle.jonswap_peak_angular_frequency(u, f)
    kwargs = dict(alpha=float(alpha), wind_speed=u, angle=np.deg2rad(20.0).astype(np.float32),
                  depth=DEPTH, swell=0.8, detail=1.0, spread=0.2)
    ref_h0, ref_h0nc = oracle.packed_spectrum(n, seed, tile, w_p=float(w_p), **kwargs)
    h0, h0nc = initial_state.build_initial_spectrum(
        n, jnp.asarray(seed, jnp.int32), jnp.asarray(tile, jnp.float32),
        peak_frequency=float(w_p), **kwargs)
    scale = max(1e-6, float(np.sqrt(np.mean(np.abs(ref_h0) ** 2))))
    assert rms(np.asarray(h0), ref_h0) / scale < 1e-4
    assert rms(np.asarray(h0nc), ref_h0nc) / scale < 1e-4


def test_negate_wavenumber_is_mod_neg_index():
    n = 8
    a = np.arange(n * n, dtype=np.float32).reshape(n, n)
    got = np.asarray(grid.negate_wavenumber(jnp.asarray(a)))
    for y in range(n):
        for x in range(n):
            assert got[y, x] == a[(-y) % n, (-x) % n]


def test_dispersion_grid_host_is_oracle_bit_exact():
    """OceanState.omega parity fix: the host-side dispersion plane must be
    BIT-identical to the oracle's fp32 arithmetic (oracle.modulate's
    k-grid + dispersion). Rationale: TPU tanh is ~600 ulp off IEEE and the
    phase omega*t amplifies that by the t~120 s time base into 7.4e-4 map
    RMS (measured, scripts/probe_dispersion_ulp.py) — so omega is never
    computed on device in production."""
    n, tile, depth = 96, (88.0, 88.0), DEPTH
    got = spectra.dispersion_grid_host(n, tile, depth)
    ids = np.arange(n, dtype=np.float32)
    idx = np.broadcast_to(ids[None, :], (n, n))
    idy = np.broadcast_to(ids[:, None], (n, n))
    kx = (idx - np.float32(n) * np.float32(0.5)) * np.float32(2.0 * oracle.PI) / np.float32(tile[0])
    ky = (idy - np.float32(n) * np.float32(0.5)) * np.float32(2.0 * oracle.PI) / np.float32(tile[1])
    k = np.sqrt(kx * kx + ky * ky) + np.float32(1e-6)
    ref = np.sqrt(oracle.G * k * np.tanh(k * np.float32(depth)))
    assert got.dtype == np.float32
    assert np.array_equal(got, ref)
    # row-banded form (sharded shards evaluate global texel indices)
    band = spectra.dispersion_grid_host(n, tile, depth, rows=32, y_offset=32)
    assert np.array_equal(band, ref[32:64])


def test_state_omega_feeds_modulation():
    """init_state's omega plane is consumed by the step: zeroing it must
    change the maps (freezes the phase), proving the kernels read the
    precomputed plane rather than recomputing dispersion in-graph."""
    import jax
    from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
    from godotoceanwaves_tpu.models.ocean import step_impl

    cfg = SimConfig(map_size=64, map_dtype="float32")
    params = default_cascades()
    state = init_state(cfg, params)
    assert state.omega.shape == (3, 64, 64)
    _, maps_a = step_impl(cfg, state, params, 0.1)
    zeroed = state.replace(omega=jnp.zeros_like(state.omega))
    _, maps_b = step_impl(cfg, zeroed, params, 0.1)
    assert not np.allclose(np.asarray(maps_a.displacement),
                           np.asarray(maps_b.displacement))
