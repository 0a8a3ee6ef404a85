"""Fused step kernel: interpret-mode parity against the staged planes path."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
from godotoceanwaves_tpu.models.ocean import _foam_rates, step_impl
from godotoceanwaves_tpu.ops import pallas_step


@pytest.mark.parametrize("n", [128, 256])
def test_fused_step_matches_staged_pipeline(n, rms, monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    cfg = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float32")
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
    disp, norm, foam = pallas_step.fused_cascade_step(
        state.h0, state.h0nc, state.foam, scal,
        depth=cfg.depth, g=cfg.g, map_dtype=jnp.float32)

    for got, want in [(disp, ref_maps.displacement), (norm, ref_maps.normal),
                      (foam, ref_state.foam)]:
        scale = max(1e-9, float(np.sqrt(np.mean(np.asarray(want, np.float64) ** 2))))
        assert rms(got, want) / scale < 1e-4


def test_use_fused_step_gating():
    # CPU: auto resolves to xla -> no fusion
    assert not SimConfig(map_size=1024).use_fused_step()
    # explicit pallas impl: fused up to 1024 (fp32 via single-buffered outs)
    assert SimConfig(map_size=1024, fft_impl="pallas",
                     map_dtype="bfloat16").use_fused_step()
    assert SimConfig(map_size=512, fft_impl="pallas").use_fused_step()
    assert SimConfig(map_size=1024, fft_impl="pallas").use_fused_step()
    assert not SimConfig(map_size=2048, fft_impl="pallas").use_fused_step()
    assert not SimConfig(map_size=1024, fft_impl="pallas", map_dtype="bfloat16",
                         fused="never").use_fused_step()


def test_step_cascade_fused_matches_staged(rms, monkeypatch):
    """Stagger-mode single-cascade update via the fused kernel == staged."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    from godotoceanwaves_tpu.models.ocean import step_cascade
    n = 128
    params = default_cascades()
    cfg_f = SimConfig(map_size=n, fft_impl="pallas", map_dtype="float32")
    cfg_s = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float32",
                      fused="never")
    assert cfg_f.use_fused_step() and not cfg_s.use_fused_step()
    sf = init_state(cfg_f, params)
    ss = init_state(cfg_s, params)
    sf2, mf = step_cascade(cfg_f, sf, params, 0.05, 1)
    ss2, ms = step_cascade(cfg_s, ss, params, 0.05, 1)
    scale = max(1e-9, float(np.sqrt(np.mean(np.asarray(ms.displacement, np.float64) ** 2))))
    assert rms(mf.displacement, ms.displacement) / scale < 1e-4
    assert rms(sf2.foam, ss2.foam) < 1e-4
