"""Fused Pallas gradient tap (ops/pallas_tap) vs the XLA einsum tap.

Interpret mode on CPU (tests/conftest.py forces the cpu platform); the
kernel path's weights/texels are pinned against `shading._slab_tap` /
`_gradient_tap`, whose einsum form is itself oracle-tested.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from godotoceanwaves_tpu.models import shading
from godotoceanwaves_tpu.ops.pallas_tap import fused_tap


def _rand_window(rng, slab, n):
    return jnp.asarray(rng.randn(3, slab, n), jnp.float32).astype(
        jnp.bfloat16)


def test_fused_tap_linear_matches_einsum_weights():
    rng = np.random.RandomState(0)
    slab, n, p = 64, 256, 500     # p is deliberately not a tile multiple
    win16 = _rand_window(rng, slab, n)
    rel = jnp.asarray(rng.uniform(1.0, slab - 3.0, p), jnp.float32)
    fx = jnp.asarray(rng.uniform(-10, n + 10, p), jnp.float32)

    wy = shading._window_weights(rel, slab, cubic=False)
    rows = jnp.einsum("pg,cgk->pck", wy, win16,
                      preferred_element_type=jnp.float32)
    wx = shading._wrap_weights(fx, n, cubic=False).astype(jnp.float32)
    want = jnp.moveaxis(jnp.einsum("pck,pk->pc", rows, wx), -1, 0)

    got = fused_tap(win16, rel, fx, None, interpret=True)
    assert got.shape == (3, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_fused_tap_blend_matches_einsum_weights():
    rng = np.random.RandomState(1)
    slab, n, p = 32, 128, 300
    win16 = _rand_window(rng, slab, n)
    rel = jnp.asarray(rng.uniform(1.0, slab - 3.0, p), jnp.float32)
    fx = jnp.asarray(rng.uniform(0, n, p), jnp.float32)
    t = 0.37

    def ref(cubic):
        wy = shading._window_weights(rel, slab, cubic)
        rows = jnp.einsum("pg,cgk->pck", wy, win16,
                          preferred_element_type=jnp.float32)
        wx = shading._wrap_weights(fx, n, cubic).astype(jnp.float32)
        return jnp.moveaxis(jnp.einsum("pck,pk->pc", rows, wx), -1, 0)

    want = ref(True) * (1 - t) + ref(False) * t
    got = fused_tap(win16, rel, fx, t, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_fused_tap_circular_matches_full_table_tap():
    """circular=True + full table == `_gradient_tap`'s circular weights
    on both axes (the R-window fallback)."""
    rng = np.random.RandomState(2)
    r, p = 64, 200
    planes = jnp.asarray(rng.randn(3, r, r), jnp.float32)
    s = jnp.asarray([1 / 40.0, 1 / 40.0, 1.0, 1.0], jnp.float32)
    xz = jnp.asarray(rng.uniform(-100, 100, (p, 2)), jnp.float32)

    want = shading._gradient_tap(planes, s, xz)        # einsum
    got = shading._gradient_tap(planes, s, xz, impl="pallas-interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_slab_tap_pallas_matches_einsum():
    rng = np.random.RandomState(3)
    r, p, slab = 128, 400, 32
    planes = jnp.asarray(rng.randn(3, r, r), jnp.float32)
    planes_pad = jnp.concatenate([planes, planes], axis=1)
    s = jnp.asarray([1 / 88.0, 1 / 88.0, 1.0, 1.0], jnp.float32)
    # a narrow contiguous z range (what a band produces), full-width x
    x = rng.uniform(-200, 200, p)
    z = rng.uniform(50.0, 50.0 + 0.15 * 88.0, p)   # ~19 texels of extent
    xz = jnp.asarray(np.stack([x, z], -1), jnp.float32)

    want = shading._slab_tap(planes_pad, s, xz, slab)
    got = shading._slab_tap(planes_pad, s, xz, slab,
                            impl="pallas-interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


@pytest.mark.slow
def test_cascade_gradient_lod_pallas_full_path():
    """The banded LOD scan with tap_impl='pallas-interpret' matches the
    einsum taps through the real switch/scan structure."""
    rng = np.random.RandomState(4)
    c, r = 2, 64
    normal = jnp.asarray(rng.randn(c, 4, r, r), jnp.float32)
    pyr = shading.normal_gradient_pyramid(normal, levels=3)
    scales = jnp.asarray([[1 / 88.0, 1 / 88.0, 1.0, 1.0],
                          [1 / 16.0, 1 / 16.0, 1.0, 0.6]], jnp.float32)
    b, pb = 4, 256
    x = rng.uniform(-150, 150, (b, pb))
    z0 = np.array([20.0, 60.0, 150.0, 400.0])[:, None]
    z = z0 + rng.uniform(0, 12.0, (b, pb))
    xz = jnp.asarray(np.stack([x, z], -1), jnp.float32)
    lev = jnp.asarray([[0, 0], [0, 1], [1, 2], [3, 2]], jnp.int32)

    want = shading.cascade_gradient_lod(pyr, scales, xz, lev)
    got = shading.cascade_gradient_lod(pyr, scales, xz, lev,
                                       tap_impl="pallas-interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-5)


def test_resolve_tap_impl(monkeypatch):
    """'auto' picks the fused kernel only on TPU and only for tables the
    VMEM-resident window can hold; explicit 'pallas' off-TPU interprets."""
    from godotoceanwaves_tpu.models import geometry

    monkeypatch.setattr(geometry.jax, "default_backend", lambda: "tpu")
    assert geometry._resolve_tap_impl("auto", 1024) == "pallas"
    assert geometry._resolve_tap_impl("auto", 2048) == "einsum"
    assert geometry._resolve_tap_impl("pallas", 2048) == "pallas"
    assert geometry._resolve_tap_impl("einsum", 256) == "einsum"

    monkeypatch.setattr(geometry.jax, "default_backend", lambda: "cpu")
    assert geometry._resolve_tap_impl("auto", 1024) == "einsum"
    assert geometry._resolve_tap_impl("pallas", 1024) == "pallas-interpret"
    assert geometry._resolve_tap_impl("pallas-interpret", 64) == \
        "pallas-interpret"
