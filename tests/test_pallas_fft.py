"""Pallas FFT kernel: algebra-twin and interpret-mode parity (CPU).

The compiled-kernel path is exercised on real TPU hardware by bench.py and the
verify workflow; here the same kernel body runs under the Pallas interpreter
against the oracle-validated reference chain.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from godotoceanwaves_tpu.ops import fft, pallas_fft


def _planes(x):
    return jnp.asarray(np.stack([x.real, x.imag], axis=1).astype(np.float32))


def _complex(planes):
    p = np.asarray(planes)
    return p[:, 0] + 1j * p[:, 1]


@pytest.mark.parametrize("n", [128, 256, 512, 1024])
def test_fourstep_twin_matches_reference_chain(n, rms):
    rs = np.random.RandomState(n)
    x = (rs.randn(2, n, n) + 1j * rs.randn(2, n, n)).astype(np.complex64) / n
    ref = np.asarray(fft.ifft2_packed(jnp.asarray(x), impl="xla", fold_sign=True))
    got = _complex(pallas_fft.fourstep_ifft2_planes(_planes(x), fold_sign=True))
    scale = np.sqrt(np.mean(np.abs(ref) ** 2))
    assert rms(got, ref) / scale < 1e-4


@pytest.mark.parametrize("n", [128, 256])
def test_pallas_kernel_interpret_matches_reference_chain(n, rms, monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    rs = np.random.RandomState(n)
    x = (rs.randn(3, n, n) + 1j * rs.randn(3, n, n)).astype(np.complex64) / n
    ref = np.asarray(fft.ifft2_packed(jnp.asarray(x), impl="xla", fold_sign=True))
    got = _complex(pallas_fft.ifft2_packed_planes_pallas(_planes(x), fold_sign=True))
    scale = np.sqrt(np.mean(np.abs(ref) ** 2))
    assert rms(got, ref) / scale < 1e-4


def test_no_fold_sign_variant(rms):
    n = 128
    rs = np.random.RandomState(0)
    x = (rs.randn(1, n, n) + 1j * rs.randn(1, n, n)).astype(np.complex64) / n
    ref = np.asarray(fft.ifft2_packed(jnp.asarray(x), impl="xla", fold_sign=False))
    got = _complex(pallas_fft.fourstep_ifft2_planes(_planes(x), fold_sign=False))
    scale = np.sqrt(np.mean(np.abs(ref) ** 2))
    assert rms(got, ref) / scale < 1e-4


@pytest.mark.parametrize("n", [128, 256])
def test_rows_planes_kernel_matches_idft_rows(n, rms, monkeypatch):
    """Shard-local rows kernel (interpret) vs the complex idft_rows tier."""
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    rs = np.random.RandomState(n)
    r = 256  # rows (e.g. a 2-device shard of a 512 map)
    x = (rs.randn(3, r, n) + 1j * rs.randn(3, r, n)).astype(np.complex64) / n
    for fold in (False, True):
        ref = np.asarray(fft.idft_rows(jnp.asarray(x), impl="xla", fold_sign=fold))
        planes = jnp.asarray(np.stack([x.real, x.imag], 1).astype(np.float32))
        got = pallas_fft.idft_rows_planes_pallas(planes, fold_sign=fold)
        gotc = np.asarray(got)[:, 0] + 1j * np.asarray(got)[:, 1]
        scale = np.sqrt(np.mean(np.abs(ref) ** 2))
        assert rms(gotc, ref) / scale < 1e-4, f"fold={fold}"
