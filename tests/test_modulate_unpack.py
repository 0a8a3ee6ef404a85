"""Modulate + unpack parity vs the oracle, and end-to-end stage-chain parity."""
import numpy as np
import jax.numpy as jnp

from godotoceanwaves_tpu.ops import fft, initial_state, modulate, unpack

import oracle

DEPTH = 20.0


def _setup(n=64, seed=(42, -7), tile=(50.0, 50.0), u=20.0, f=550e3):
    alpha = float(oracle.jonswap_alpha(u, f))
    w_p = float(oracle.jonswap_peak_angular_frequency(u, f))
    kwargs = dict(alpha=alpha, wind_speed=u, angle=0.349066, depth=DEPTH,
                  swell=0.8, detail=1.0, spread=0.2)
    ref_h0, ref_h0nc = oracle.packed_spectrum(n, seed, tile, w_p=w_p, **kwargs)
    return ref_h0, ref_h0nc, tile


def test_modulate_parity(rms):
    ref_h0, ref_h0nc, tile = _setup()
    t = 123.7
    ref = oracle.modulate(ref_h0, ref_h0nc, tile, DEPTH, t)
    got = np.asarray(modulate.modulate(
        jnp.asarray(ref_h0), jnp.asarray(ref_h0nc),
        jnp.asarray(tile, jnp.float32), DEPTH, jnp.float32(t)))
    scale = max(1e-9, np.sqrt(np.mean(np.abs(ref) ** 2)))
    assert rms(got, ref) / scale < 1e-4


def test_unpack_parity(rms):
    n = 64
    rs = np.random.RandomState(6)
    layers = (rs.randn(4, n, n) + 1j * rs.randn(4, n, n)).astype(np.complex64) * 0.1
    foam0 = rs.rand(n, n).astype(np.float32)
    args = dict(whitecap=0.5, )
    ref_d, ref_n, ref_f = oracle.unpack(layers, foam0, 0.5, 0.15, 0.11)
    d, nm, f = unpack.unpack(jnp.asarray(layers), jnp.asarray(foam0), 0.5, 0.15, 0.11)
    assert rms(d, ref_d) < 1e-5
    assert rms(nm, ref_n) < 1e-5
    assert rms(f, ref_f) < 1e-5


def test_full_stage_chain_parity(rms):
    """config-2-style end-to-end: h0 -> modulate -> Stockham chain -> unpack."""
    n = 64
    ref_h0, ref_h0nc, tile = _setup(n=n)
    t = 120.0

    # oracle path (staged Stockham butterflies)
    ref_layers = oracle.modulate(ref_h0, ref_h0nc, tile, DEPTH, t)
    factors = oracle.butterfly_factors(n)
    ref_ifft = oracle.reference_fft_chain(ref_layers, factors)
    ref_d, ref_n, _ = oracle.unpack(ref_ifft, np.zeros((n, n), np.float32), 0.5, 0.1, 0.1)

    # library path
    layers = modulate.modulate(jnp.asarray(ref_h0), jnp.asarray(ref_h0nc),
                               jnp.asarray(tile, jnp.float32), DEPTH, jnp.float32(t))
    out = fft.ifft2_packed(layers, impl="matmul")
    d, nm, _ = unpack.unpack(out, jnp.zeros((n, n), jnp.float32), 0.5, 0.1, 0.1)

    d_scale = max(1e-9, np.sqrt(np.mean(ref_d ** 2)))
    n_scale = max(1e-9, np.sqrt(np.mean(ref_n ** 2)))
    assert rms(np.asarray(d), ref_d) / d_scale < 1e-4
    assert rms(np.asarray(nm), ref_n) / n_scale < 1e-4


def test_fp16_map_policy_pins_reference_output(rms):
    """The reference's output maps are RGBA16F (wave_generator.gd:34-35):
    map_dtype="float16" must equal the fp32 reference math quantized through
    fp16 — pinning what "reference output" means under fp16 (SURVEY 7.3.2).
    Measured fp16-vs-fp32 RMS delta is recorded in docs/PARITY.md."""
    n = 64
    ref_h0, ref_h0nc, tile = _setup(n=n)
    t = 120.0
    ref_layers = oracle.modulate(ref_h0, ref_h0nc, tile, DEPTH, t)
    factors = oracle.butterfly_factors(n)
    ref_ifft = oracle.reference_fft_chain(ref_layers, factors)
    ref_d, ref_n, _ = oracle.unpack(ref_ifft, np.zeros((n, n), np.float32),
                                    0.5, 0.1, 0.1)

    layers = modulate.modulate(jnp.asarray(ref_h0), jnp.asarray(ref_h0nc),
                               jnp.asarray(tile, jnp.float32), DEPTH,
                               jnp.float32(t))
    out = fft.ifft2_packed(layers, impl="matmul")
    d16, n16, _ = unpack.unpack(out, jnp.zeros((n, n), jnp.float32),
                                0.5, 0.1, 0.1, map_dtype=jnp.float16)
    assert d16.dtype == jnp.float16 and n16.dtype == jnp.float16

    # the fp16 maps equal the reference math quantized through fp16, to well
    # under one fp16 quantum (the residual is the pipeline's own 1e-5 core err)
    d_scale = max(1e-9, np.sqrt(np.mean(ref_d ** 2)))
    err16 = rms(np.asarray(d16, np.float32), ref_d.astype(np.float16).astype(np.float32))
    assert err16 / d_scale < 2e-4, err16 / d_scale
    err16n = rms(np.asarray(n16, np.float32), ref_n.astype(np.float16).astype(np.float32))
    assert err16n / max(1e-9, np.sqrt(np.mean(ref_n ** 2))) < 2e-4

    # document the quantization cost itself: fp16 vs the fp32 truth
    q_delta = rms(ref_d.astype(np.float16).astype(np.float32), ref_d) / d_scale
    assert q_delta < 5e-4  # fp16 has ~11 bits of mantissa: rel RMS ~1e-4
    # end-to-end session surface honors the policy too
    from godotoceanwaves_tpu import Ocean
    ocean = Ocean(map_size=32, updates_per_second=0, map_dtype="float16")
    maps = ocean.update(0.02)
    assert maps.displacement.dtype == jnp.float16


def test_unpack_pre_shifted_equivalence(rms):
    """fold_sign in the FFT + pre_shifted unpack == plain FFT + sign in unpack."""
    n = 64
    ref_h0, ref_h0nc, tile = _setup(n=n)
    layers = modulate.modulate(jnp.asarray(ref_h0), jnp.asarray(ref_h0nc),
                               jnp.asarray(tile, jnp.float32), DEPTH, jnp.float32(3.0))
    foam0 = jnp.zeros((n, n), jnp.float32)

    d1, n1, f1 = unpack.unpack(fft.ifft2_packed(layers), foam0, 0.5, 0.1, 0.1)
    d2, n2, f2 = unpack.unpack(fft.ifft2_packed(layers, fold_sign=True), foam0,
                               0.5, 0.1, 0.1, pre_shifted=True)
    assert rms(np.asarray(d1), np.asarray(d2)) < 1e-4
    assert rms(np.asarray(n1), np.asarray(n2)) < 1e-4


def test_foam_is_a_scan_not_a_vmap():
    """Foam accumulates across updates; two steps differ from one (SURVEY 7.3.3)."""
    n = 32
    rs = np.random.RandomState(7)
    layers = (rs.randn(4, n, n) + 1j * rs.randn(4, n, n)).astype(np.complex64)
    foam0 = jnp.zeros((n, n), jnp.float32)
    _, _, f1 = unpack.unpack(jnp.asarray(layers), foam0, 0.2, 0.5, 0.1)
    _, _, f2 = unpack.unpack(jnp.asarray(layers), f1, 0.2, 0.5, 0.1)
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    assert float(jnp.max(f2)) <= 1.0 and float(jnp.min(f2)) >= 0.0
