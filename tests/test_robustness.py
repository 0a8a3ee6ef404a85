"""Robustness: extreme parameter values must never produce NaN/Inf maps."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from godotoceanwaves_tpu import CascadeParams, SimConfig, init_state, step
from godotoceanwaves_tpu.models import stack_cascades

N = 64

EDGE_CASES = {
    "dead_calm": dict(wind_speed=1e-4, foam_amount=0.0),
    "hurricane": dict(wind_speed=80.0, fetch_length=2000.0, foam_amount=10.0),
    "zero_detail": dict(detail=0.0),
    "full_spread": dict(spread=1.0, swell=0.0),
    "max_swell": dict(swell=2.0, spread=0.0),
    "tiny_tile": dict(tile_length=(1.0, 1.0)),
    "huge_tile": dict(tile_length=(4096.0, 4096.0)),
    "anisotropic_tile": dict(tile_length=(16.0, 512.0)),
    "short_fetch": dict(fetch_length=1e-4),
    "zero_whitecap": dict(whitecap=0.0, foam_amount=10.0),
    "negative_wind_dir": dict(wind_direction=-360.0),
}


@pytest.mark.parametrize("name", sorted(EDGE_CASES))
def test_extreme_params_stay_finite(name):
    kw = EDGE_CASES[name]
    p = CascadeParams.create(spectrum_seed=(3, -9), **kw)
    params = stack_cascades([p])
    cfg = SimConfig(map_size=N)
    state = init_state(cfg, params)
    assert np.isfinite(np.asarray(state.h0)).all(), f"{name}: h0 not finite"
    for _ in range(3):
        state, maps = step(cfg, state, params, 0.1)
    d = np.asarray(maps.displacement)
    nm = np.asarray(maps.normal)
    assert np.isfinite(d).all(), f"{name}: displacement not finite"
    assert np.isfinite(nm).all(), f"{name}: normal not finite"
    assert 0.0 <= nm[:, 3].min() and nm[:, 3].max() <= 1.0, f"{name}: foam range"


def test_large_dt_and_negative_dt():
    p = stack_cascades([CascadeParams.create(spectrum_seed=(1, 2))])
    cfg = SimConfig(map_size=N)
    state = init_state(cfg, p)
    state, maps = step(cfg, state, p, 1000.0)   # huge frame skip
    assert np.isfinite(np.asarray(maps.displacement)).all()
    state, maps = step(cfg, state, p, -0.1)     # rewind (foam decay inverts)
    assert np.isfinite(np.asarray(maps.displacement)).all()
