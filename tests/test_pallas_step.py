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
@pytest.mark.slow
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
        state.h0, state.h0nc, state.omega, state.foam, scal,
        map_dtype=jnp.float32)

    for got, want in [(disp, ref_maps.displacement), (norm, ref_maps.normal),
                      (foam, ref_state.foam)]:
        scale = max(1e-9, float(np.sqrt(np.mean(np.asarray(want, np.float64) ** 2))))
        assert rms(got, want) / scale < 1e-4


@pytest.mark.parametrize("fpp", [1, 3])   # one frame per program / all unrolled
@pytest.mark.slow
def test_fused_multi_step_matches_repeated_single(rms, monkeypatch, fpp):
    """K-frame kernel (spectra fetched once, foam carried in VMEM) must equal
    K sequential single-frame kernel calls: every frame's maps and the final
    foam state — at both grid granularities (frames_per_program)."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    n, K = 128, 3
    cfg = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float32")
    params = default_cascades()
    state = init_state(cfg, params)
    foam0 = jnp.abs(jnp.cos(jnp.arange(3 * n * n, dtype=jnp.float32))
                    ).reshape(3, n, n) * 0.4
    dt = jnp.float32(0.07)
    grow, decay = _foam_rates(params, dt)

    # reference: K sequential single-frame kernels
    foam = foam0
    singles = []
    for k in range(1, K + 1):
        scal = pallas_step.pack_scalars(
            state.time + k * dt, params.tile_length, params.whitecap, grow, decay)
        d, nm, foam = pallas_step.fused_cascade_step(
            state.h0, state.h0nc, state.omega, foam, scal,
            map_dtype=jnp.float32)
        singles.append((d, nm))

    scal = pallas_step.pack_scalars(
        state.time + dt, params.tile_length, params.whitecap, grow, decay, dt=dt)
    disp, norm, foam_multi = pallas_step.fused_cascade_multi_step(
        state.h0, state.h0nc, state.omega, foam0, scal, num_frames=K,
        map_dtype=jnp.float32,
        frames_per_program=fpp)

    assert disp.shape == (3, K, 3, n, n) and norm.shape == (3, K, 4, n, n)
    for k, (d_ref, nm_ref) in enumerate(singles):
        scale = max(1e-9, float(np.sqrt(np.mean(np.asarray(d_ref, np.float64) ** 2))))
        assert rms(disp[:, k], d_ref) / scale < 1e-5, f"frame {k} displacement"
        assert rms(norm[:, k], nm_ref) < 1e-5, f"frame {k} normal"
    assert rms(foam_multi, foam) < 1e-6  # final foam after the in-VMEM recurrence


@pytest.mark.slow
def test_step_frames_and_multi_step_fused_path(rms, monkeypatch):
    """ocean.step_frames / multi_step through the multi-frame kernel == the
    staged per-frame loop."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    from godotoceanwaves_tpu.models.ocean import multi_step, step_frames
    n, K = 128, 3
    params = default_cascades()
    cfg_f = SimConfig(map_size=n, fft_impl="pallas", map_dtype="float32")
    cfg_s = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float32",
                      fused="never")
    assert cfg_f.use_fused_step() and not cfg_s.use_fused_step()

    sf, stacked = step_frames(cfg_f, init_state(cfg_f, params), params, 0.05, K)
    ss, ref_stacked = step_frames(cfg_s, init_state(cfg_s, params), params, 0.05, K)
    assert stacked.displacement.shape == (3, K, 3, n, n)
    scale = max(1e-9, float(np.sqrt(np.mean(
        np.asarray(ref_stacked.displacement, np.float64) ** 2))))
    assert rms(stacked.displacement, ref_stacked.displacement) / scale < 1e-4
    assert rms(sf.foam, ss.foam) < 1e-4
    np.testing.assert_allclose(np.asarray(sf.time), np.asarray(ss.time), rtol=1e-6)

    sm, last = multi_step(cfg_f, init_state(cfg_f, params), params, 0.05, K)
    assert rms(last.displacement, ref_stacked.displacement[:, -1]) / scale < 1e-4
    assert rms(sm.foam, ss.foam) < 1e-4


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


def test_fused_step_float16_maps(rms, monkeypatch):
    """float16 maps (the parity-pinning dtype, wave_generator.gd:34-35) run
    THROUGH the fused kernel path: kernel at fp32 + output-window cast must
    equal the staged path's unpack-time f16 cast bit-for-bit."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    n = 128
    cfg_f = SimConfig(map_size=n, fft_impl="pallas", map_dtype="float16")
    cfg_s = SimConfig(map_size=n, fft_impl="fourstep", map_dtype="float16",
                      fused="never")
    assert cfg_f.use_fused_step(), "f16 must route through the fused kernel"
    params = default_cascades()
    state_f = init_state(cfg_f, params)
    state_s = init_state(cfg_s, params)

    sf, maps_f = step_impl(cfg_f, state_f, params, 0.07)
    ss, maps_s = step_impl(cfg_s, state_s, params, 0.07)
    assert maps_f.displacement.dtype == jnp.float16
    assert maps_f.normal.dtype == jnp.float16
    # kernel-vs-staged fp32 intermediates agree to ~1e-4 relative (the
    # standing parity bound); f16 rounding on top keeps the fields within
    # ~1 ulp (2^-11 relative) of each other
    d_f = np.asarray(maps_f.displacement, np.float64)
    d_s = np.asarray(maps_s.displacement, np.float64)
    scale = max(1e-9, float(np.sqrt(np.mean(d_s ** 2))))
    assert np.sqrt(np.mean((d_f - d_s) ** 2)) / scale < 1e-3
    assert rms(maps_f.normal.astype(jnp.float32),
               maps_s.normal.astype(jnp.float32)) < 2e-3
    assert rms(sf.foam, ss.foam) < 1e-4   # foam recurrence stays fp32
