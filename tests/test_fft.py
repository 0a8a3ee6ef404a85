"""FFT convention tests: library tiers vs the staged Stockham oracle.

Encodes the reference's convention booby-traps (SURVEY.md section 7.3 item 4):
positive-exponent twiddles, no normalization, single transpose (90-degree
rotation), ifftshift-by-sign.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from godotoceanwaves_tpu.ops import fft

import oracle


@pytest.mark.parametrize("n", [8, 64, 256])
def test_stockham_oracle_is_unnormalized_positive_dft(n):
    """The oracle itself: staged butterfly == N * numpy ifft (row pass)."""
    rs = np.random.RandomState(0)
    x = (rs.randn(3, n, n) + 1j * rs.randn(3, n, n)).astype(np.complex64)
    factors = oracle.butterfly_factors(n)
    got = oracle.stockham_rows(x, factors)
    expect = np.fft.ifft(x, axis=-1) * n
    assert np.max(np.abs(got - expect)) < 1e-2 * np.sqrt(n)


@pytest.mark.parametrize("impl", ["xla", "matmul", "direct"])
@pytest.mark.parametrize("n", [64, 128, 256])
def test_ifft2_packed_matches_reference_chain(impl, n):
    rs = np.random.RandomState(1)
    x = (rs.randn(4, n, n) + 1j * rs.randn(4, n, n)).astype(np.complex64)
    factors = oracle.butterfly_factors(n)
    ref = oracle.reference_fft_chain(x, factors)
    got = np.asarray(fft.ifft2_packed(jnp.asarray(x), impl=impl))
    scale = np.sqrt(np.mean(np.abs(ref) ** 2))
    assert np.sqrt(np.mean(np.abs(got - ref) ** 2)) / scale < 1e-4


@pytest.mark.parametrize("impl", ["xla", "matmul", "direct"])
def test_fold_sign_equals_post_multiply(impl):
    n = 128
    rs = np.random.RandomState(2)
    x = (rs.randn(2, n, n) + 1j * rs.randn(2, n, n)).astype(np.complex64)
    plain = np.asarray(fft.ifft2_packed(jnp.asarray(x), impl=impl))
    folded = np.asarray(fft.ifft2_packed(jnp.asarray(x), impl=impl, fold_sign=True))
    ix = np.arange(n)
    sign = np.where((ix[None, :] + ix[:, None]) % 2 == 0, 1.0, -1.0)
    np.testing.assert_allclose(folded, plain * sign, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("impl", ["matmul", "direct"])
def test_idft_rows_tiers_match_xla(impl):
    for n in [64, 512, 1024, 2048]:
        rs = np.random.RandomState(n)
        x = (rs.randn(2, n) + 1j * rs.randn(2, n)).astype(np.complex64)
        ref = np.asarray(fft.idft_rows(jnp.asarray(x), impl="xla"))
        got = np.asarray(fft.idft_rows(jnp.asarray(x), impl=impl))
        scale = np.sqrt(np.mean(np.abs(ref) ** 2))
        assert np.sqrt(np.mean(np.abs(got - ref) ** 2)) / scale < 2e-4


def test_hermitian_packed_input_gives_real_fields():
    """IFFT of Hermitian-symmetric input is real (spectrum_modulate.glsl:66-68).

    Build a spectrum with the conjugation property h(-k) = conj(h(k)) on the
    centered grid, pack two such fields as p = f1 + i*f2, and check the chain
    output separates into two real fields.
    """
    n = 64
    rs = np.random.RandomState(3)

    def hermitian_field():
        h = (rs.randn(n, n) + 1j * rs.randn(n, n)).astype(np.complex64)
        # centered grid: id -> -id is (N - id) % N on both axes
        hneg = np.roll(h[::-1, ::-1], (1, 1), (0, 1))
        return (h + np.conj(hneg)) / 2

    f1, f2 = hermitian_field(), hermitian_field()
    packed = f1 + 1j * f2
    out = np.asarray(fft.ifft2_packed(jnp.asarray(packed[None]), impl="xla"))[0]
    # out = IFFT(f1) + i*IFFT(f2), both real => re(out) and im(out) are the fields
    s1 = np.asarray(fft.ifft2_packed(jnp.asarray(f1[None])))[0]
    s2 = np.asarray(fft.ifft2_packed(jnp.asarray(f2[None])))[0]
    assert np.max(np.abs(s1.imag)) < 1e-3   # Hermitian => real output
    assert np.max(np.abs(s2.imag)) < 1e-3
    np.testing.assert_allclose(out.real, s1.real, atol=1e-3)
    np.testing.assert_allclose(out.imag, s2.real, atol=1e-3)


def test_parseval():
    n = 128
    rs = np.random.RandomState(4)
    x = (rs.randn(n, n) + 1j * rs.randn(n, n)).astype(np.complex64)
    out = np.asarray(fft.ifft2_packed(jnp.asarray(x[None])))[0]
    # For X[k] = sum_n x[n] e^{+...}: sum|X|^2 = N^2 * sum|x|^2
    np.testing.assert_allclose(
        np.sum(np.abs(out) ** 2), n * n * np.sum(np.abs(x) ** 2), rtol=1e-4)


def test_single_transpose_rotation_invariance():
    """The missing 2nd transpose only transposes the field (wave_generator.gd:77-78)."""
    n = 64
    rs = np.random.RandomState(5)
    x = (rs.randn(n, n) + 1j * rs.randn(n, n)).astype(np.complex64)
    chain = np.asarray(fft.ifft2_packed(jnp.asarray(x[None])))[0]
    true_ifft2 = np.fft.ifft2(x) * n * n
    np.testing.assert_allclose(chain, true_ifft2.T, rtol=1e-4, atol=1e-3)
