"""Spectrum energy statistics vs analytic integrals + dtype error budgets.

Ties the discrete pipeline to oceanographic theory: the synthesized height
field's variance has the closed-form expectation

    E[Var(h)] = 8 * sum_k S(w(k)) * D(theta) * (dw/dk)/k * dkx*dky
              -> 8 * integral S(w) D(theta) dw dtheta       (polar, k->w)

where the 8 = 2 (complex Gaussian h0, E|g|^2 = 2) x 2 (the 2 under the
amplitude sqrt, spectrum_compute.glsl:114) x 2 (Hermitian pair h0(k)+h0*(-k),
spectrum_modulate.glsl:64-68). The per-realization identity Var = sum |h(k)|^2
is already pinned by test_height_field_energy_parseval; these tests pin the
ENSEMBLE statistics (RNG correctness: hash uniformity + Box-Muller unit
variance) and the discretization (w_norm Jacobian + dkx*dky measure)
against a refined fp64 quadrature of the continuous integral.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from godotoceanwaves_tpu import CascadeParams, SimConfig, init_state, step

import oracle

N = 128
DEPTH = 20.0
WIND = 20.0
FETCH = 550.0   # km, cascade-0 scene default scale
TILE = 88.0


def _alpha_wp():
    return (oracle.jonswap_alpha(WIND, FETCH * 1e3),
            oracle.jonswap_peak_angular_frequency(WIND, FETCH * 1e3))


def _spectral_density(kx, ky):
    """S(w(k)) * D(theta) * (dw/dk)/k on fp64 k-grids (oracle math)."""
    alpha, w_p = _alpha_wp()
    k = np.sqrt(kx * kx + ky * ky) + 1e-6
    theta = np.arctan2(kx, ky)
    w, dw = oracle.dispersion_relation(k.astype(np.float32), DEPTH)
    s = oracle.tma_spectrum(w, np.float32(w_p), np.float32(alpha), DEPTH)
    d = oracle.hasselmann_directional_spread(
        w, np.float32(w_p), np.float32(WIND), theta.astype(np.float32),
        np.float32(0.0), np.float32(0.0))
    # spread=0 => t = 1-spread = 1 => pure Hasselmann (spectrum_compute
    # blends toward ISOTROPIC as spread->1); detail=1 => no suppression
    return s.astype(np.float64) * d.astype(np.float64) * (
        dw.astype(np.float64) / k)


def _grid_sum(n, tile):
    """sum_k S*D*(dw/dk)/k * dkx*dky over the n x n centered k-grid."""
    dk = 2.0 * np.pi / tile
    ids = np.arange(n, dtype=np.float64) - n / 2.0
    kx = ids[None, :] * dk
    ky = ids[:, None] * dk
    return float(np.sum(_spectral_density(kx, ky)) * dk * dk)


def _cascade(seed, tile=TILE):
    p = CascadeParams.create(tile_length=tile, wind_speed=WIND,
                             fetch_length=FETCH, swell=0.0, detail=1.0,
                             spread=0.0, spectrum_seed=seed)
    return jax.tree.map(lambda x: x[None], p)


def test_rng_complex_gaussian_unit_variance():
    """E|h0|^2 / envelope^2 == 2 texel-wise (complex Gaussian, both parts
    N(0,1)) — the statistics that make E[Var(h)] = 8*sum S D w_norm true.

    Deterministic-precision check: 256^2 iid texels give ~0.8% std on the
    mean of a chi^2_2 variable; also pins the second moment (E|g|^4 = 8 for
    complex Gaussian) as a distribution-shape check on hash+Box-Muller.
    """
    n = 256
    alpha, w_p = _alpha_wp()
    amp = oracle.spectrum_amplitude(
        n, (3, 11), (TILE, TILE), np.float32(alpha), np.float32(w_p),
        np.float32(WIND), np.float32(0.0), DEPTH,
        np.float32(0.0), np.float32(1.0), np.float32(0.0))
    dk = 2.0 * np.pi / TILE
    ids = np.arange(n, dtype=np.float64) - n / 2.0
    env2 = 2.0 * _spectral_density(ids[None, :] * dk, ids[:, None] * dk) * dk * dk
    g2 = np.abs(amp.astype(np.complex128)) ** 2 / env2
    # drop texels where the envelope underflows fp32 (k far past the peak)
    ok = env2 > 1e-30
    g2 = g2[ok]
    assert abs(g2.mean() - 2.0) < 0.05, g2.mean()
    assert abs((g2 ** 2).mean() - 8.0) < 0.6, (g2 ** 2).mean()


def test_height_variance_matches_spectral_expectation():
    """Ensemble-averaged map variance == 8 * discrete spectral sum.

    Validates the full stochastic chain: xxHash32 uniformity, Box-Muller unit
    variance, the sqrt(2 S D w_norm) amplitude envelope, Hermitian packing,
    and the unnormalized IFFT convention — against a NUMBER derived without
    running any RNG. Uses a 1024 m tile so the JONSWAP peak ring spans many
    grid modes (per-seed Var spread ~15%; at the 88 m demo tile the peak
    sits on ~10 modes and single seeds scatter 2x).
    """
    tile = 1024.0
    cfg = SimConfig(map_size=N)
    expect = 8.0 * _grid_sum(N, tile)

    variances = []
    for seed in [(3, 11), (101, 7), (55, 90), (1234, 4321), (9, 999),
                 (77, 13), (2024, 1), (500, 500), (18, 2), (64, 640),
                 (7, 70), (123, 321)]:
        params = _cascade(seed, tile)
        state = init_state(cfg, params)
        _, maps = step(cfg, state, params, 0.02)
        variances.append(float(np.asarray(maps.displacement[0, 1],
                                          np.float64).var()))

    mean_var = float(np.mean(variances))
    assert abs(mean_var - expect) / expect < 0.15, (mean_var, expect)
    # every single realization should be the right order of magnitude
    assert all(0.3 * expect < v < 3.0 * expect for v in variances), variances


def test_spectral_sum_converges_to_continuous_integral():
    """The map-grid spectral sum is a converged quadrature of the continuous
    integral over the same k-square: refining dk 4x (tile 4L at 4N keeps the
    k-range, quarters the step) moves the total by < 2%. Pins the dkx*dky
    measure and the (dw/dk)/k polar Jacobian.

    Needs a tile that RESOLVES the JONSWAP peak: at 1024 m, k_p ~ 3.4 dk
    (measured convergence 0.8%); at the 88 m demo tile k_p < dk — the peak
    falls inside the first grid cell and the cascade legitimately truncates
    it (that energy belongs to larger-tile cascades)."""
    tile = 1024.0
    coarse = _grid_sum(N, tile)
    fine = _grid_sum(4 * N, 4.0 * tile)
    finer = _grid_sum(8 * N, 8.0 * tile)
    assert abs(coarse - fine) / fine < 0.02, (coarse, fine)
    # and the refinement itself has converged (Cauchy, not just close)
    assert abs(fine - finer) / finer < 0.002, (fine, finer)
    # the 88 m demo tile really does truncate the peak — document by assert
    assert _grid_sum(N, TILE) < 0.6 * _grid_sum(4 * N, 4.0 * TILE)


@pytest.mark.parametrize("n", [64, 128, 256])
def test_map_dtype_error_budget_across_sizes(n):
    """bf16/fp16 map outputs hold their quantization budgets at every map
    size (SURVEY.md section 7.3.2 asks for the fp16 policy to be pinned; the
    budget must not degrade as N grows — no accumulation happens after the
    final cast)."""
    params = _cascade((42, 43))
    budgets = {"bfloat16": 8e-3, "float16": 1e-3}  # ~2-3x measured RMS
    cfg32 = SimConfig(map_size=n)
    _, maps32 = step(cfg32, init_state(cfg32, params), params, 0.02)
    d32 = np.asarray(maps32.displacement, np.float64)
    scale = np.sqrt(np.mean(d32 ** 2))

    errs = {}
    for dtype, budget in budgets.items():
        cfg = SimConfig(map_size=n, map_dtype=dtype)
        _, maps = step(cfg, init_state(cfg, params), params, 0.02)
        d = np.asarray(maps.displacement.astype(jnp.float32), np.float64)
        errs[dtype] = np.sqrt(np.mean((d - d32) ** 2)) / scale
        assert errs[dtype] < budget, (dtype, n, errs[dtype])
    # fp16's 11-bit mantissa must beat bf16's 8-bit on the same data
    assert errs["float16"] < errs["bfloat16"], errs
