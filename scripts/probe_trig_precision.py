"""Attribute the on-device RMS gap (bench --rms: 7.5e-4 on TPU vs <=1e-4 in
the CPU suite). Hypothesis: TPU fp32 sin/cos use cheap range reduction, so
the dispersion phase omega*t (hundreds-thousands of radians at t~120 s,
spectrum_modulate.glsl:63-66) loses ~|x|*2^-23 of phase accuracy vs NumPy's
correctly-rounded sinf in tests/oracle.py.

Two legs, numerics only (no timing — safe to run anytime):
1. jnp.sin/cos on TPU vs np.sin/cos (fp64 truth) across phase magnitudes.
2. Same, after Cody-Waite reduction mod 2*pi (two-float constant), i.e. the
   candidate fix for ops/modulate + the fused kernels.

    nohup python scripts/probe_trig_precision.py > /tmp/trig_probe.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from godotoceanwaves_tpu.utils import cache
cache.enable_persistent_cache()

TWO_PI_HI = np.float32(6.2831855)          # fp32(2*pi)
TWO_PI_LO = np.float32(2.0 * np.pi - float(np.float32(6.2831855)))


def reduce_mod_2pi(x):
    """Cody-Waite: x - k*(2*pi) with 2*pi split hi+lo so k*hi is exact-ish."""
    k = jnp.round(x * np.float32(1.0 / (2.0 * np.pi)))
    return (x - k * TWO_PI_HI) - k * TWO_PI_LO


@jax.jit
def trig_raw(x):
    return jnp.sin(x), jnp.cos(x)


@jax.jit
def trig_reduced(x):
    r = reduce_mod_2pi(x)
    return jnp.sin(r), jnp.cos(r)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for mag in [1.0, 10.0, 100.0, 1000.0, 5000.0, 50000.0]:
        x64 = rng.uniform(-mag, mag, size=(1 << 16)).astype(np.float64)
        x32 = x64.astype(np.float32)
        # truth: sin of the exact fp32 value (what the oracle computes)
        ts, tc = np.sin(x32.astype(np.float64)), np.cos(x32.astype(np.float64))
        for name, fn in [("raw", trig_raw), ("codywaite", trig_reduced)]:
            s, c = fn(jnp.asarray(x32))
            s, c = np.asarray(s, np.float64), np.asarray(c, np.float64)
            err = max(np.abs(s - ts).max(), np.abs(c - tc).max())
            rms = float(np.sqrt(np.mean((s - ts) ** 2 + (c - tc) ** 2) / 2))
            print(f"mag={mag:>8.0f} {name:>9}: max_abs_err={err:.3e} "
                  f"rms={rms:.3e}", flush=True)


if __name__ == "__main__":
    main()
