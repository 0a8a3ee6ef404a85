"""Long-horizon and statistical-physics sanity tests (full Tessendorf loop)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state, step
from godotoceanwaves_tpu.models import multi_step

import oracle

N = 64


@pytest.mark.parametrize("godot_seeds", [False, True])
def test_multi_step_full_loop_parity_with_oracle(rms, godot_seeds):
    """Config-3-style: 3 full frames (modulate->Stockham chain->unpack with
    foam recurrence) vs the staged NumPy oracle, bit-for-bit plumbing.
    godot_seeds=True runs the same parity with the Godot-stream preset
    seeds (water.gd:31 protocol) — negative/large seed values exercise the
    hash's full integer range through every stage."""
    cfg = SimConfig(map_size=N, fft_impl="xla")
    params = default_cascades(godot_seeds=godot_seeds)
    state = init_state(cfg, params)
    dt = 0.1

    # library: 3 steps
    s = state
    for _ in range(3):
        s, maps = step(cfg, s, params, dt)

    # oracle: rebuild cascade 0 by hand
    p0 = jax.tree.map(lambda x: np.asarray(x)[0], params)
    u, f_m = float(p0.wind_speed), float(p0.fetch_length) * 1e3
    alpha = float(oracle.jonswap_alpha(u, f_m))
    w_p = float(oracle.jonswap_peak_angular_frequency(u, f_m))
    h0, h0nc = oracle.packed_spectrum(
        N, tuple(int(v) for v in p0.spectrum_seed), tuple(p0.tile_length),
        alpha=alpha, w_p=w_p, wind_speed=u,
        angle=np.deg2rad(float(p0.wind_direction)).astype(np.float32),
        depth=cfg.depth, swell=float(p0.swell), detail=float(p0.detail),
        spread=float(p0.spread))
    factors = oracle.butterfly_factors(N)
    foam = np.zeros((N, N), np.float32)
    t = 120.0
    grow = dt * float(p0.foam_amount) * 7.5
    decay = dt * max(0.5, 10.0 - float(p0.foam_amount)) * 1.15
    for _ in range(3):
        t += dt
        layers = oracle.modulate(h0, h0nc, tuple(p0.tile_length), cfg.depth, t)
        out = oracle.reference_fft_chain(layers, factors)
        disp_ref, norm_ref, foam = oracle.unpack(out, foam, float(p0.whitecap),
                                                 grow, decay)

    got_d = np.asarray(maps.displacement[0]).transpose(1, 2, 0)
    got_n = np.asarray(maps.normal[0]).transpose(1, 2, 0)
    d_scale = max(1e-9, np.sqrt(np.mean(disp_ref ** 2)))
    assert rms(got_d, disp_ref) / d_scale < 1e-4
    n_scale = max(1e-9, np.sqrt(np.mean(norm_ref ** 2)))
    assert rms(got_n, norm_ref) / n_scale < 1e-4
    assert rms(np.asarray(s.foam[0]), foam) < 1e-4


def test_long_horizon_stability():
    """1000 frames: foam stays bounded, height statistics stay stationary."""
    cfg = SimConfig(map_size=N)
    params = default_cascades()
    state = init_state(cfg, params)
    dt = jnp.float32(1 / 30)

    state, maps = multi_step(cfg, state, params, dt, 50)
    early_std = float(jnp.std(maps.displacement[:, 1]))
    for _ in range(19):
        state, maps = multi_step(cfg, state, params, dt, 50)
    late_std = float(jnp.std(maps.displacement[:, 1]))
    foam = np.asarray(state.foam)

    assert np.isfinite(np.asarray(maps.displacement)).all()
    assert 0.0 <= foam.min() and foam.max() <= 1.0
    # stationary process: height rms at t~153s within 2x of t~122s
    assert 0.5 < late_std / early_std < 2.0


def test_height_field_is_approximately_gaussian():
    """Linear superposition of many independent modes => near-Gaussian heights."""
    cfg = SimConfig(map_size=128, fft_impl="xla")
    params = default_cascades()
    state = init_state(cfg, params)
    _, maps = step(cfg, state, params, 0.02)
    # finest cascade (16 m tile) has the most independent modes in band; a
    # single realization of the long-tile cascades carries visible
    # small-sample skew, which is physics, not a bug
    h = np.asarray(maps.displacement[2, 1]).ravel().astype(np.float64)
    h = (h - h.mean()) / (h.std() + 1e-12)
    skew = float(np.mean(h ** 3))
    kurt = float(np.mean(h ** 4))
    assert abs(skew) < 0.5
    assert 2.0 < kurt < 4.5  # Gaussian = 3
