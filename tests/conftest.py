"""Test fixture: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable; `xla_force_host_platform_device_count=8`
is the standard JAX fake-multihost fixture (SURVEY.md section 4). The
environment's sitecustomize pre-registers the tunneled TPU backend and pins
JAX_PLATFORMS, so we must override via jax.config (env vars alone lose).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from godotoceanwaves_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rms():
    def _rms(a, b):
        a = np.asarray(a).astype(np.complex128)
        b = np.asarray(b).astype(np.complex128)
        return np.sqrt(np.mean(np.abs(a - b) ** 2))
    return _rms
