"""Second attribution step: is modulate's on-device 7.4e-4 (probe_rms_stages)
from the dispersion omega(k)=sqrt(g k tanh(k d)) ulp error amplified by
t~120 s, or from something else in the layer algebra?

Legs (TPU vs NumPy-fp32 truth, the oracle's arithmetic):
  tanh      jnp.tanh(k*d) ulp error
  sqrt      jnp.sqrt(x) ulp error
  omega     full deep_dispersion ulp error
  sin(w t)  absolute error of sin/cos(omega_tpu * t) vs sin(fl(omega_np)*t)
  hostw     same but with omega computed host-side in NumPy fp32 and only
            the multiply + sin/cos on device (the candidate fix)

    nohup python scripts/probe_dispersion_ulp.py > /tmp/disp_ulp.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from godotoceanwaves_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from godotoceanwaves_tpu.ops import spectra

G = np.float32(9.81)
DEPTH = np.float32(20.0)
T = np.float32(120.1)


def ulp_stats(got, ref):
    got64, ref64 = np.asarray(got, np.float64), np.asarray(ref, np.float64)
    ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
    e = np.abs(got64 - ref64) / ulp
    return f"ulp max={e.max():.1f} mean={e.mean():.3f}"


def main():
    print("backend:", jax.default_backend(), flush=True)
    # k grid like a 512^2 cascade, tile 88 m: |k| in (0, ~26]
    rng = np.random.default_rng(1)
    k = rng.uniform(1e-3, 26.0, size=(1 << 16)).astype(np.float32)

    ref_tanh = np.tanh(k * DEPTH)
    got_tanh = np.asarray(jax.jit(jnp.tanh)(jnp.asarray(k * DEPTH)))
    print("tanh(k d) :", ulp_stats(got_tanh, ref_tanh), flush=True)

    x = (G * k * ref_tanh).astype(np.float32)
    ref_sqrt = np.sqrt(x)
    got_sqrt = np.asarray(jax.jit(jnp.sqrt)(jnp.asarray(x)))
    print("sqrt(x)   :", ulp_stats(got_sqrt, ref_sqrt), flush=True)

    ref_w = np.sqrt(G * k * np.tanh(k * DEPTH)).astype(np.float32)
    got_w = np.asarray(jax.jit(
        lambda kk: spectra.deep_dispersion(kk, float(DEPTH)))(jnp.asarray(k)))
    print("omega     :", ulp_stats(got_w, ref_w), flush=True)

    # error that actually matters: sin/cos of omega*t
    truth_s = np.sin((ref_w * T).astype(np.float64))
    dev = jax.jit(lambda kk: jnp.sin(
        spectra.deep_dispersion(kk, float(DEPTH)) * T))
    got_s = np.asarray(dev(jnp.asarray(k)), np.float64)
    print(f"sin(w t) device-omega: max={np.abs(got_s - truth_s).max():.3e} "
          f"rms={np.sqrt(np.mean((got_s - truth_s) ** 2)):.3e}", flush=True)

    hostw = jax.jit(lambda w: jnp.sin(w * T))
    got_h = np.asarray(hostw(jnp.asarray(ref_w)), np.float64)
    # truth for host-omega: sin of the fp32-rounded product (oracle's value)
    truth_h = np.sin((ref_w * T).astype(np.float32).astype(np.float64))
    print(f"sin(w t) host-omega  : max={np.abs(got_h - truth_h).max():.3e} "
          f"rms={np.sqrt(np.mean((got_h - truth_h) ** 2)):.3e}", flush=True)


if __name__ == "__main__":
    main()
