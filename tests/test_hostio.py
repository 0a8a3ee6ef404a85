"""Host IO helpers: complex-safe pytree transfer round-trips."""
import numpy as np
import jax.numpy as jnp

from godotoceanwaves_tpu.utils import device_get_tree, device_put_tree


def test_roundtrip_mixed_tree():
    tree = {
        "c": jnp.asarray(np.arange(8, dtype=np.float32).view(np.complex64).reshape(2, 2)),
        "f": jnp.ones((3, 3), jnp.float32),
        "i": jnp.arange(4, dtype=jnp.int32),
    }
    host = device_get_tree(tree)
    assert host["c"].dtype == np.complex64
    assert isinstance(host["f"], np.ndarray)
    back = device_put_tree(host)
    np.testing.assert_array_equal(np.asarray(jnp.real(back["c"])), host["c"].real)
    np.testing.assert_array_equal(np.asarray(jnp.imag(back["c"])), host["c"].imag)
    np.testing.assert_array_equal(np.asarray(back["i"]), host["i"])


def test_profile_step_reports_ms():
    from godotoceanwaves_tpu.utils import profile_step
    x = jnp.ones((64, 64))
    import jax
    f = jax.jit(lambda v: v * 1.0001)
    out = profile_step(f, x, iters=8)
    assert out["ms_per_call"] > 0.0
    assert out["calls_per_second"] > 0.0
