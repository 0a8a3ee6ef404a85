"""Strip-mined step kernels (N > 1024 tier): interpret-mode parity."""
import functools

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
from godotoceanwaves_tpu.models.cascade import SimConfig as SC
from godotoceanwaves_tpu.models.ocean import _foam_rates, step_impl
from godotoceanwaves_tpu.ops import pallas_step, pallas_strip


@pytest.mark.parametrize("n,bufs", [(256, 1), (256, 2), (512, 2)])
@pytest.mark.slow
def test_strip_step_matches_staged_pipeline(n, bufs, rms, monkeypatch):
    """The two-kernel HBM-staged chain == the staged planes path.

    The kernels are size-generic (any Q = N/128 <= 128); interpret-mode
    parity at Q in {2, 4} plus the on-device 2048 run (docs/PERF.md) covers
    the production sizes.
    """
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    cfg = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float32",
                    fused="never")
    params = default_cascades()
    state = init_state(cfg, params)
    foam0 = jnp.abs(jnp.sin(jnp.arange(3 * n * n, dtype=jnp.float32))
                    ).reshape(3, n, n) * 0.3
    state = state.replace(foam=foam0)
    dt = 0.1

    ref_state, ref_maps = step_impl(cfg, state, params, dt)

    t_new = state.time + dt
    grow, decay = _foam_rates(params, jnp.float32(dt))
    scal = pallas_step.pack_scalars(t_new, params.tile_length,
                                    params.whitecap, grow, decay)
    disp, norm, foam = pallas_strip.strip_cascade_step(
        state.h0, state.h0nc, state.omega, state.foam, scal,
        map_dtype=jnp.float32,
        buffer_count=bufs)

    for got, want in [(disp, ref_maps.displacement), (norm, ref_maps.normal),
                      (foam, ref_state.foam)]:
        scale = max(1e-9, float(np.sqrt(np.mean(np.asarray(want, np.float64) ** 2))))
        assert rms(got, want) / scale < 1e-4


def test_step_impl_routes_through_strip_path(rms, monkeypatch):
    """step_impl's strip branch == the staged branch (forced at a small N)."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    n = 256
    params = default_cascades()
    cfg = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float32")
    state = init_state(cfg, params)
    ref_state, ref_maps = step_impl(cfg, state, params, 0.05)

    monkeypatch.setattr(SC, "use_strip_step", lambda self: True)
    assert not cfg.use_fused_step()
    new_state, new_maps = step_impl(cfg, state, params, 0.05)
    scale = max(1e-9, float(np.sqrt(np.mean(
        np.asarray(ref_maps.displacement, np.float64) ** 2))))
    assert rms(new_maps.displacement, ref_maps.displacement) / scale < 1e-4
    assert rms(new_state.foam, ref_state.foam) < 1e-4


def test_use_strip_step_gating():
    # CPU + auto: no pallas backend -> no strip tier
    assert not SimConfig(map_size=2048).use_strip_step()
    # explicit pallas request: strip covers (1024, 8192]
    assert SimConfig(map_size=2048, fft_impl="pallas").use_strip_step()
    assert SimConfig(map_size=4096, fft_impl="pallas").use_strip_step()
    assert SimConfig(map_size=8192, fft_impl="pallas").use_strip_step()
    # the monolithic fused kernel owns N <= 1024
    assert not SimConfig(map_size=1024, fft_impl="pallas").use_strip_step()
    # sigma un-swap bound and opt-outs
    assert not SimConfig(map_size=16384, fft_impl="pallas").use_strip_step()
    assert not SimConfig(map_size=2048, fft_impl="pallas",
                         fused="never").use_strip_step()
    # f16 maps route through the strip tier (fp32 kernel + output cast)
    assert SimConfig(map_size=2048, fft_impl="pallas",
                     map_dtype="float16").use_strip_step()


@pytest.mark.slow
def test_strip_step_float16_maps(rms, monkeypatch):
    """f16 maps route through the strip tier too (fp32 kernel + output cast
    == the staged path's f16 cast)."""
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
    from godotoceanwaves_tpu.models.ocean import step_impl

    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    n = 256
    cfg_f = SimConfig(map_size=n, fft_impl="pallas", map_dtype="float16")
    assert cfg_f.use_fused_step()
    params = default_cascades()

    from godotoceanwaves_tpu.ops import pallas_step, pallas_strip
    from godotoceanwaves_tpu.models.ocean import _foam_rates

    state = init_state(cfg_f, params)
    grow, decay = _foam_rates(params, jnp.float32(0.07))
    scal = pallas_step.pack_scalars(state.time + 0.07, params.tile_length,
                                    params.whitecap, grow, decay)
    d_strip, n_strip, foam_strip = pallas_strip.strip_cascade_step(
        state.h0, state.h0nc, state.omega, state.foam, scal,
        map_dtype=jnp.float16)
    assert d_strip.dtype == jnp.float16 and n_strip.dtype == jnp.float16

    cfg_s = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float16",
                      fused="never")
    _, maps_s = step_impl(cfg_s, init_state(cfg_s, params), params, 0.07)
    import numpy as np
    d_f = np.asarray(d_strip, np.float64)
    d_s = np.asarray(maps_s.displacement, np.float64)
    scale = max(1e-9, float(np.sqrt(np.mean(d_s ** 2))))
    assert np.sqrt(np.mean((d_f - d_s) ** 2)) / scale < 1e-3
    assert rms(n_strip.astype(jnp.float32),
               maps_s.normal.astype(jnp.float32)) < 2e-3
