"""Attribute bench --rms's on-device 7.5e-4 relative RMS (vs the <=1e-4 CPU
suite) to a pipeline stage. Each stage runs ON DEVICE with the ORACLE's
output as its input, so errors don't compound across stages:

  spectrum   init-state h0/h0nc vs oracle.packed_spectrum
  modulate   modulate_planes(oracle h0) vs oracle.modulate
  fft        ifft2_packed_planes(oracle layers) vs oracle chain,
             per impl (pallas / fourstep / matmul)
  unpack     unpack_planes(oracle fft output) vs oracle.unpack
  e2e        staged chain + fused kernel end to end (the bench figure)

Numerics only, no timing — safe to run while other jobs idle. fp32 planes
throughout (complex64 cannot cross host<->device on axon).

    nohup python scripts/probe_rms_stages.py > /tmp/rms_stages.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

if "--cpu" in sys.argv:      # shape shakeout without paying TPU compiles
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from godotoceanwaves_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from godotoceanwaves_tpu import SimConfig, default_cascades, init_state
from godotoceanwaves_tpu.models.ocean import step
from godotoceanwaves_tpu.ops import fft, modulate, unpack

import oracle

N = 128 if "--cpu" in sys.argv else 512
DT = 0.1
T = 120.0 + DT   # matches bench_rms / the fused kernel's time base


def rel_rms(got, ref):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    scale = max(1e-9, float(np.sqrt(np.mean(ref ** 2))))
    return float(np.sqrt(np.mean((got - ref) ** 2))) / scale


def planes(z):
    """complex (.., N, N) -> (..., 2, N, N) fp32 planes."""
    return np.stack([z.real, z.imag], axis=-3).astype(np.float32)


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SimConfig(map_size=N, map_dtype="float32")
    params = default_cascades()
    p0 = jax.tree.map(lambda x: np.asarray(x)[0], params)
    u, f_m = float(p0.wind_speed), float(p0.fetch_length) * 1e3
    tile = tuple(float(v) for v in p0.tile_length)
    seed = tuple(int(v) for v in p0.spectrum_seed)

    # ---- oracle truth for every stage
    ref_h0, ref_h0nc = oracle.packed_spectrum(
        N, seed, tile,
        alpha=float(oracle.jonswap_alpha(u, f_m)),
        w_p=float(oracle.jonswap_peak_angular_frequency(u, f_m)),
        wind_speed=u,
        angle=np.deg2rad(float(p0.wind_direction)).astype(np.float32),
        depth=cfg.depth, swell=float(p0.swell), detail=float(p0.detail),
        spread=float(p0.spread))
    ref_layers = oracle.modulate(ref_h0, ref_h0nc, tile, cfg.depth, T)
    ref_fft = oracle.reference_fft_chain(ref_layers, oracle.butterfly_factors(N))
    ix, iy = np.meshgrid(np.arange(N), np.arange(N), indexing="xy")
    sign = np.where((ix + iy) % 2 == 0, 1.0, -1.0).astype(np.float32)
    grow = DT * float(p0.foam_amount) * 7.5
    decay = DT * max(0.5, 10.0 - float(p0.foam_amount)) * 1.15
    ref_d, ref_n, _ = oracle.unpack(ref_fft, np.zeros((N, N), np.float32),
                                    float(p0.whitecap), grow, decay)

    # ---- stage 1: spectrum (device init_state vs oracle)
    state = init_state(cfg, params)
    got_h0 = np.asarray(state.h0[0])        # (2, rows, N) planes
    got_h0nc = np.asarray(state.h0nc[0])
    print(f"spectrum  h0   rel_rms = {rel_rms(got_h0, planes(ref_h0)):.3e}",
          flush=True)
    print(f"spectrum  h0nc rel_rms = {rel_rms(got_h0nc, planes(ref_h0nc)):.3e}",
          flush=True)

    # ---- stage 2: modulate on oracle h0
    mod_fn = jax.jit(lambda a, b: modulate.modulate_planes(
        a, b, jnp.asarray(tile, jnp.float32), cfg.depth, jnp.float32(T)))
    got_mod = np.asarray(mod_fn(jnp.asarray(planes(ref_h0)),
                                jnp.asarray(planes(ref_h0nc))))
    print(f"modulate       rel_rms = {rel_rms(got_mod, planes(ref_layers)):.3e}",
          flush=True)

    # ---- stage 3: FFT on oracle layers, per impl
    lay_planes = jnp.asarray(planes(ref_layers))
    ref_fft_folded = planes(ref_fft * sign)
    impls = (("fourstep", "matmul") if "--cpu" in sys.argv
             else ("pallas", "fourstep", "matmul"))
    for impl in impls:
        fn = jax.jit(lambda x, impl=impl: fft.ifft2_packed_planes(
            x, impl=impl, fold_sign=True))
        got = np.asarray(fn(lay_planes))
        print(f"fft[{impl:>8}] rel_rms = {rel_rms(got, ref_fft_folded):.3e}",
              flush=True)

    # ---- stage 4: unpack on oracle fft output
    up_fn = jax.jit(lambda x: unpack.unpack_planes(
        x, jnp.zeros((N, N), jnp.float32), float(p0.whitecap), grow, decay,
        pre_shifted=True))
    d, nm, _ = up_fn(jnp.asarray(ref_fft_folded))
    print(f"unpack    disp rel_rms = {rel_rms(d, ref_d.transpose(2, 0, 1)):.3e}",
          flush=True)
    print(f"unpack    norm rel_rms = {rel_rms(nm, ref_n.transpose(2, 0, 1)):.3e}",
          flush=True)

    # ---- end to end: the production step (fused tier at N=512)
    st, maps = step(cfg, state, params, DT)
    print(f"e2e fused disp rel_rms = "
          f"{rel_rms(maps.displacement[0], ref_d.transpose(2, 0, 1)):.3e}",
          flush=True)
    print(f"e2e fused norm rel_rms = "
          f"{rel_rms(maps.normal[0], ref_n.transpose(2, 0, 1)):.3e}",
          flush=True)

    # staged chain end to end (isolates fused-kernel-specific error)
    staged = jax.jit(lambda a, b: unpack.unpack_planes(
        fft.ifft2_packed_planes(mod_fn(a, b), impl="matmul", fold_sign=True),
        jnp.zeros((N, N), jnp.float32), float(p0.whitecap), grow, decay,
        pre_shifted=True))
    d2, n2, _ = staged(jnp.asarray(got_h0), jnp.asarray(got_h0nc))
    print(f"e2e staged(matmul, device h0) disp rel_rms = "
          f"{rel_rms(d2, ref_d.transpose(2, 0, 1)):.3e}", flush=True)
    print(f"e2e staged(matmul, device h0) norm rel_rms = "
          f"{rel_rms(n2, ref_n.transpose(2, 0, 1)):.3e}", flush=True)


if __name__ == "__main__":
    main()
