"""Water-surface shading math (reference C12) as array ops + a demo renderer.

Array-space re-expression of assets/shaders/spatial/water.gdshader: cascade
summation with per-cascade map scales, bicubic B-spline filtering with the
pixels-per-meter bilinear blend, Jacobian-foam albedo, fresnel, GGX + Smith
specular and the SSS-ish diffuse term. Not a rasterizer — a verification
surface for the maps (SURVEY.md section 7.1 item 9) and an offline renderer
for demo images.

Conventions: world-space, y up; `maps` are the channel-first OceanMaps planes;
UV = world xz (water.gdshader:28).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

REFLECTANCE = 0.02           # air->water, eta=1.33 (water.gdshader:9)
DEFAULT_WATER_COLOR = (0.1, 0.15, 0.18)    # water.gd:15
DEFAULT_FOAM_COLOR = (0.73, 0.67, 0.62)    # water.gd:17
SSS_MODIFIER = (0.9, 1.15, 0.85)           # water.gdshader:122


# --- texture sampling -------------------------------------------------------

def sample_bilinear(planes: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample of (ch, N, N) planes at uv (tile units, wrapped).

    uv[..., 0] is the x/u coordinate (last array axis). Matches GL
    repeat-wrap + half-texel center convention.
    """
    n = planes.shape[-1]
    xy = uv * n - 0.5
    i0 = jnp.floor(xy).astype(jnp.int32)
    f = xy - i0
    ix0 = jnp.mod(i0[..., 0], n)
    iy0 = jnp.mod(i0[..., 1], n)
    ix1 = jnp.mod(i0[..., 0] + 1, n)
    iy1 = jnp.mod(i0[..., 1] + 1, n)
    fx = f[..., 0]
    fy = f[..., 1]

    def tap(iy, ix):
        return planes[:, iy, ix]                      # (ch, ...)

    t00, t10 = tap(iy0, ix0), tap(iy0, ix1)
    t01, t11 = tap(iy1, ix0), tap(iy1, ix1)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy                  # (ch, ...)


# --- gather-free MXU sampling -----------------------------------------------
# TPU has no fast hardware gather (~12 ms per full-res bilinear at 640x360,
# docs/PERF.md "geometry render"); interpolation re-expressed as sparse
# weight rows contracted against the map planes rides the MXU instead.
# Weights use the CIRCULAR texel distance, so GL repeat-wrap comes for free.

def _wrap_weights(f: jax.Array, n: int, cubic: bool) -> jax.Array:
    """(..., n) interpolation weights at absolute texel coordinate f (may
    exceed [0, n)): 2-sparse linear hats, or 4-sparse cubic B-spline rows
    (identical weights to `cubic_weights`, directly instead of via the
    4-bilinear-tap decomposition)."""
    fw = jnp.mod(f, n)
    iota = jnp.arange(n, dtype=jnp.float32)
    d = jnp.abs(fw[..., None] - iota)
    d = jnp.minimum(d, n - d)
    if not cubic:
        w = jnp.maximum(0.0, 1.0 - d)
    else:
        d2 = d * d
        d3 = d2 * d
        near = (4.0 - 6.0 * d2 + 3.0 * d3) / 6.0          # d < 1
        farr = jnp.maximum(2.0 - d, 0.0) ** 3 / 6.0       # 1 <= d < 2
        w = jnp.where(d < 1.0, near, farr)
    return w.astype(jnp.bfloat16)


def _mxu_tap(planes: jax.Array, uv: jax.Array, cubic: bool) -> jax.Array:
    """Separable weighted sample of (ch, N, N) planes at uv -> (ch, ...)."""
    n = planes.shape[-1]
    xy = uv * n - 0.5
    wx = _wrap_weights(xy[..., 0], n, cubic)
    wy = _wrap_weights(xy[..., 1], n, cubic)
    rows = jnp.einsum("...g,cgk->...ck", wy, planes.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    out = jnp.einsum("...ck,...k->...c", rows, wx.astype(jnp.float32))
    return jnp.moveaxis(out, -1, 0)


def sample_bilinear_mxu(planes: jax.Array, uv: jax.Array) -> jax.Array:
    """MXU twin of `sample_bilinear` (bf16 weights/planes, fp32 accum)."""
    return _mxu_tap(planes, uv, cubic=False)


def sample_bicubic_mxu(planes: jax.Array, uv: jax.Array) -> jax.Array:
    """MXU twin of `sample_bicubic`: the 4-sparse cubic rows contract in one
    einsum pair instead of 4 bilinear gather taps."""
    return _mxu_tap(planes, uv, cubic=True)


def _samplers(sampler: str):
    if sampler == "mxu":
        return sample_bilinear_mxu, sample_bicubic_mxu
    return sample_bilinear, sample_bicubic


def cubic_weights(a: jax.Array) -> tuple[jax.Array, ...]:
    """Cubic B-spline filter weights (water.gdshader:42-52)."""
    a2 = a * a
    a3 = a2 * a
    w0 = (-a3 + a2 * 3.0 - a * 3.0 + 1.0) / 6.0
    w1 = (a3 * 3.0 - a2 * 6.0 + 4.0) / 6.0
    w2 = (-a3 * 3.0 + a2 * 3.0 + a * 3.0 + 1.0) / 6.0
    w3 = a3 / 6.0
    return w0, w1, w2, w3


def sample_bicubic(planes: jax.Array, uv: jax.Array) -> jax.Array:
    """Bicubic B-spline via 4 bilinear taps (water.gdshader:55-70).

    The GPU-Gems-2 trick: group the 4x4 cubic footprint into 4 bilinear
    fetches at fractional offsets.
    """
    n = planes.shape[-1]
    xy = uv * n + 0.5
    fuv = xy - jnp.floor(xy)
    wx0, wx1, wx2, wx3 = cubic_weights(fuv[..., 0])
    wy0, wy1, wy2, wy3 = cubic_weights(fuv[..., 1])
    gx0, gx1 = wx0 + wx1, wx2 + wx3
    gy0, gy1 = wy0 + wy1, wy2 + wy3
    hx0 = (wx1 / gx0 - 1.5 + jnp.floor(xy[..., 0])) / n
    hx1 = (wx3 / gx1 + 0.5 + jnp.floor(xy[..., 0])) / n
    hy0 = (wy1 / gy0 - 1.5 + jnp.floor(xy[..., 1])) / n
    hy1 = (wy3 / gy1 + 0.5 + jnp.floor(xy[..., 1])) / n
    wxb = gx0 / (gx0 + gx1)
    wyb = gy0 / (gy0 + gy1)

    def at(hx, hy):
        return sample_bilinear(planes, jnp.stack([hx, hy], axis=-1))

    top = at(hx1, hy1) * (1 - wxb) + at(hx0, hy1) * wxb
    bot = at(hx1, hy0) * (1 - wxb) + at(hx0, hy0) * wxb
    return top * (1 - wyb) + bot * wyb


# --- vertex stage: cascade displacement sum (water.gdshader:27-39) ----------

def cascade_displacement(displacement_maps: jax.Array, map_scales: jax.Array,
                         xz: jax.Array, camera_xz=None,
                         sampler: str = "gather") -> jax.Array:
    """Summed world displacement at positions xz (..., 2) -> (..., 3).

    displacement_maps: (C, 3, N, N); map_scales: (C, 4) [1/Lx, 1/Ly, dscale, -].
    Distance falloff after 150 m (water.gdshader:30) if camera_xz given.
    sampler="mxu" uses the gather-free weight-einsum taps (TPU hot path).
    """
    bilinear, _ = _samplers(sampler)
    disp = jnp.zeros(xz.shape[:-1] + (3,), jnp.float32)
    for i in range(displacement_maps.shape[0]):
        s = map_scales[i]
        uv = xz * s[:2]
        tap = bilinear(displacement_maps[i].astype(jnp.float32), uv)
        disp = disp + jnp.moveaxis(tap, 0, -1) * s[2]
    if camera_xz is not None:
        d = jnp.linalg.norm(xz - camera_xz, axis=-1, keepdims=True)
        disp = disp * jnp.minimum(jnp.exp(-(d - 150.0) * 0.007), 1.0)
    return disp


def cascade_displacement_grid(displacement_maps: jax.Array,
                              map_scales: jax.Array, coords: jax.Array,
                              center_xz: jax.Array, camera_xz=None
                              ) -> jax.Array:
    """`cascade_displacement` on the TENSOR-PRODUCT grid coords x coords.

    The clipmap's vertices form a separable world grid (k, k), so bilinear
    sampling factorizes: one (k, N) weight row-set per AXIS per cascade,
    contracted as two small matmuls — ~N/k times cheaper than the dense
    per-vertex weight tensor of the pointwise `_mxu_tap` (measured 21 ms ->
    ~2 ms for the 640x360 render's vertex stage, docs/PERF.md). Exact same
    hat-weight algebra, same bf16/fp32 precision as sampler="mxu".

    Returns (k, k, 3) displacement indexed [z_row, x_col], matching
    `cascade_displacement` on meshgrid(coords, coords, indexing="xy").
    """
    k = coords.shape[0]
    n = displacement_maps.shape[-1]
    disp = jnp.zeros((k, k, 3), jnp.float32)
    wx_world = coords + center_xz[0]
    wz_world = coords + center_xz[1]
    for i in range(displacement_maps.shape[0]):
        s = map_scales[i]
        fx = wx_world * s[0] * n - 0.5
        fz = wz_world * s[1] * n - 0.5
        wx = _wrap_weights(fx, n, cubic=False)            # (k, N)
        wz = _wrap_weights(fz, n, cubic=False)            # (k, N)
        rows = jnp.einsum("zg,cgk->czk", wz,
                          displacement_maps[i].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        tap = jnp.einsum("czk,xk->czx", rows, wx.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        disp = disp + jnp.moveaxis(tap, 0, -1) * s[2]
    if camera_xz is not None:
        dx = wx_world - camera_xz[0]
        dz = wz_world - camera_xz[1]
        d = jnp.sqrt(dx[None, :, None] ** 2 + dz[:, None, None] ** 2)
        disp = disp * jnp.minimum(jnp.exp(-(d - 150.0) * 0.007), 1.0)
    return disp


# --- fragment stage: gradient/foam accumulation (water.gdshader:72-94) ------

def cascade_gradient(normal_maps: jax.Array, map_scales: jax.Array,
                     xz: jax.Array, sampler: str = "gather") -> jax.Array:
    """Summed (dh/dx, dh/dz, foam) at xz -> (..., 3).

    Blends bicubic with bilinear by world pixels-per-meter (gdshader:76-82);
    channels sampled are .xyw = (grad_x, grad_y, foam), scaled by
    (normal_scale, normal_scale, 1). sampler="mxu" = weight-einsum taps.
    """
    bilinear, bicubic = _samplers(sampler)
    n = normal_maps.shape[-1]
    grad = jnp.zeros(xz.shape[:-1] + (3,), jnp.float32)
    for i in range(normal_maps.shape[0]):
        s = map_scales[i]
        planes = normal_maps[i, jnp.array([0, 1, 3])].astype(jnp.float32)
        if sampler == "mxu":
            # _gradient_tap: same blend, plus the runtime bicubic skip when
            # the per-cascade scalar blend factor saturates at exactly 1
            # (ppm*0.1 >= 1 for tile <= N/10 — true of every reference
            # preset at N=1024). Exact — not an approximation.
            tap = _gradient_tap(planes, s, xz)
        else:
            uv = xz * s[:2]
            ppm = n * jnp.minimum(s[0], s[1])
            mix_t = jnp.minimum(1.0, ppm * 0.1)
            tap = (bicubic(planes, uv) * (1 - mix_t)
                   + bilinear(planes, uv) * mix_t)
        grad = grad + jnp.moveaxis(tap, 0, -1) * jnp.stack([s[3], s[3], jnp.float32(1.0)])
    return grad


def _gradient_tap(planes: jax.Array, s: jax.Array, xz: jax.Array,
                  impl: str = "einsum") -> jax.Array:
    """One cascade's blended gradient tap at world xz on the MXU sampler.

    planes: (3, R, R) [grad_x, grad_y, foam]; s: the cascade's map_scales
    row. Applies the reference's bicubic<->bilinear blend by pixels-per-
    meter (water.gdshader:76-82) against THIS table's resolution — mips are
    coarser, so ppm drops and the blend re-engages bicubic, exactly the
    magnification case the filter exists for. The blend factor is a
    per-cascade scalar; when it saturates at 1 (every production preset at
    full res) lax.cond skips the dense bicubic tap at runtime
    (docs/PERF.md "Geometry render"). Returns (3, ...).
    """
    n = planes.shape[-1]
    uv = xz * s[:2]
    ppm = n * jnp.minimum(s[0], s[1])
    mix_t = jnp.minimum(1.0, ppm * 0.1)
    if impl != "einsum":
        # fused weight-build + contraction (ops/pallas_tap): circular
        # weights on BOTH axes = exactly this full-table tap
        from ..ops.pallas_tap import fused_tap
        interp = impl == "pallas-interpret"
        f = uv * n - 0.5
        shape = xz.shape[:-1]
        fx = f[..., 0].reshape(-1)
        fv = f[..., 1].reshape(-1)
        win16 = planes.astype(jnp.bfloat16)
        out = jax.lax.cond(
            mix_t >= 1.0,
            lambda: fused_tap(win16, fv, fx, None, circular=True,
                              interpret=interp),
            lambda: fused_tap(win16, fv, fx, mix_t, circular=True,
                              interpret=interp))
        return out.reshape((3,) + shape)
    return jax.lax.cond(
        mix_t >= 1.0,
        lambda: sample_bilinear_mxu(planes, uv),
        lambda: (sample_bicubic_mxu(planes, uv) * (1 - mix_t)
                 + sample_bilinear_mxu(planes, uv) * mix_t))


def _window_weights(rel: jax.Array, m: int, cubic: bool) -> jax.Array:
    """(..., m) interpolation weights at WINDOW-relative coordinate rel
    (non-circular twin of `_wrap_weights`: the caller guarantees the whole
    2-/4-sparse footprint lies inside the m-row window)."""
    iota = jnp.arange(m, dtype=jnp.float32)
    d = jnp.abs(rel[..., None] - iota)
    if not cubic:
        w = jnp.maximum(0.0, 1.0 - d)
    else:
        d2 = d * d
        d3 = d2 * d
        near = (4.0 - 6.0 * d2 + 3.0 * d3) / 6.0
        farr = jnp.maximum(2.0 - d, 0.0) ** 3 / 6.0
        w = jnp.where(d < 1.0, near, farr)
    return w.astype(jnp.bfloat16)


def _slab_tap(planes_pad: jax.Array, s: jax.Array, xz: jax.Array,
              slab: int, impl: str = "einsum") -> jax.Array:
    """`_gradient_tap` with the v-axis contraction cropped to a `slab`-row
    window of the (v-duplicated) table.

    The dense MXU tap burns P x R x ch x R MACs on 2-sparse weights; a
    horizontal LOD band's queries span a narrow, CONTIGUOUS range of
    world z (unwrapped — no mod discontinuity), so the v contraction only
    needs the `slab` rows covering that range: cost drops by R/slab with
    the same weights against the same texels (equal up to fp32 dot
    reduction order, ~4e-5; docs/PERF.md round-5 "slab-cropped taps"). planes_pad: (3, 2R, R) — the table
    duplicated along v so any R-row window is contiguous (GL repeat wrap
    without circular weights). The caller guarantees
    max(fv) - min(fv) + 4 <= slab. The x axis keeps the circular weights
    (a band spans the full frame width). Applies the same ppm
    bicubic<->bilinear blend with the same saturation skip."""
    n = planes_pad.shape[-1]
    uv = xz * s[:2]
    fx = uv[..., 0] * n - 0.5
    fv = uv[..., 1] * n - 0.5          # unwrapped: contiguous per band
    v0 = jnp.floor(jnp.min(fv)) - 1.0  # cubic footprint margin
    rel = fv - v0                      # in [1, extent + 2)
    start = jnp.mod(v0.astype(jnp.int32), n)
    win = jax.lax.dynamic_slice(planes_pad, (0, start, 0), (3, slab, n))
    win16 = win.astype(jnp.bfloat16)
    ppm = n * jnp.minimum(s[0], s[1])
    mix_t = jnp.minimum(1.0, ppm * 0.1)
    if impl != "einsum":
        # fused weight-build + contraction (ops/pallas_tap): window
        # weights on v, circular on x — same texels, same weights
        from ..ops.pallas_tap import fused_tap
        interp = impl == "pallas-interpret"
        shape = xz.shape[:-1]
        relf = rel.reshape(-1)
        fxf = fx.reshape(-1)
        out = jax.lax.cond(
            mix_t >= 1.0,
            lambda: fused_tap(win16, relf, fxf, None, interpret=interp),
            lambda: fused_tap(win16, relf, fxf, mix_t, interpret=interp))
        return out.reshape((3,) + shape)
    wx_lin = _wrap_weights(fx, n, cubic=False)

    def tap(cubic):
        wy = _window_weights(rel, slab, cubic)
        rows = jnp.einsum("...g,cgk->...ck", wy, win16,
                          preferred_element_type=jnp.float32)
        wx = _wrap_weights(fx, n, cubic).astype(jnp.float32) if cubic \
            else wx_lin.astype(jnp.float32)
        out = jnp.einsum("...ck,...k->...c", rows, wx)
        return jnp.moveaxis(out, -1, 0)

    return jax.lax.cond(
        mix_t >= 1.0,
        lambda: tap(False),
        lambda: tap(True) * (1 - mix_t) + tap(False) * mix_t)


# --- screen-space LOD for the gradient taps ---------------------------------
# The dense MXU tap costs P x R^2 x ch FLOPs per cascade — at full res it is
# the geometry render's single largest stage (docs/PERF.md). But most screen
# pixels view the surface from far enough away that a cascade's fine waves
# are sub-pixel: sampling them full-res buys aliasing, not detail. Classic
# texture LOD, TPU-shaped: the frame is cut into horizontal bands, each band
# picks a per-cascade mip level from its MINIMUM hit distance (conservative
# — removed wavelengths stay below one pixel for every pixel in the band),
# and a lax.scan over bands executes only the chosen lax.switch branch.
# Bands with no water pixels skip their taps entirely (sky overwrites them).
# Near bands select level 0 and stay bit-identical to the dense path. The
# reference itself has no mips (it point-samples full res and aliases,
# wave_generator.gd:34-35 textures are created mipless); gradient_lod=False
# reproduces that behavior.

def normal_gradient_pyramid(normal_maps: jax.Array, levels: int = 4) -> list:
    """Per-cascade mip pyramid of the (grad_x, grad_y, foam) channels.

    normal_maps: (C, 4, N, N) -> list of (C, 3, N/2^l, N/2^l), level 0 the
    original channels. 2x2 average pooling preserves the half-texel center
    convention exactly: the mean of texels 2i, 2i+1 sits at (2i+1)/N in uv,
    which IS texel i's center at resolution N/2 (see the sampling
    convention in `sample_bilinear`).
    """
    base = normal_maps[:, jnp.array([0, 1, 3])].astype(jnp.float32)
    pyr = [base]
    for _ in range(levels - 1):
        c, ch, n, m = pyr[-1].shape
        if n % 2 or m % 2 or min(n, m) <= 8:
            break
        pyr.append(pyr[-1].reshape(c, ch, n // 2, 2, m // 2, 2).mean((3, 5)))
    return pyr


def gradient_band_levels(dist_b: jax.Array, hit_b: jax.Array,
                         map_scales: jax.Array, theta_pix,
                         base_res: int, nlevels: int,
                         bias: float = 1.0) -> jax.Array:
    """Per-band per-cascade mip level -> (B, C) int32 in [0, nlevels].

    dist_b/hit_b: (B, P) banded hit distances and water mask. Criterion:
    content removed by level l (surface wavelengths < 2 L / (N / 2^l)) must
    stay below one screen pixel (angular size theta_pix) at the band's
    minimum hit distance — oblique foreshortening only shrinks waves
    further on screen, so the bound is conservative. A band with no hit
    pixels returns `nlevels`, the caller's skip branch.

    `bias` > 1 coarsens selection by ~log2(bias) levels: a SPEED knob that
    trades transverse detail for fewer full-res taps (the along-view
    footprint at grazing angles is 1/sin(angle) wider than the transverse
    one this criterion uses, so a moderate bias leans toward classic
    isotropic max-derivative LOD instead of this min-derivative rule).
    bias=1.0 (default) keeps the conservative sub-pixel bound.
    """
    dmin = jnp.min(jnp.where(hit_b, dist_b, jnp.inf), axis=1)        # (B,)
    tiles = 1.0 / jnp.minimum(map_scales[:, 0], map_scales[:, 1])    # (C,)
    r_req = tiles[None, :] / jnp.maximum(
        dmin[:, None] * theta_pix * jnp.float32(bias), 1e-9)
    lev = jnp.floor(jnp.log2(jnp.maximum(
        base_res / jnp.clip(r_req, 1.0, base_res), 1.0)))
    lev = jnp.clip(lev, 0, nlevels - 1).astype(jnp.int32)
    return jnp.where(jnp.isfinite(dmin)[:, None], lev, jnp.int32(nlevels))


def cascade_gradient_lod(pyramid: list, map_scales: jax.Array,
                         xz_bands: jax.Array, band_levels: jax.Array,
                         slab_crop: bool = True,
                         tap_impl: str = "einsum") -> jax.Array:
    """`cascade_gradient` (mxu sampler) with per-band mip levels.

    pyramid: from `normal_gradient_pyramid`; xz_bands: (B, P, 2) banded
    world coords; band_levels: (B, C) from `gradient_band_levels`
    (level == len(pyramid) skips the cascade's tap for that band).
    Returns (B, P, 3). Level-0 bands compute exactly the dense path's
    einsums; the scan serializes bands, which costs nothing — each band's
    tap is itself a large MXU contraction.

    slab_crop (default): a band's queries span a narrow contiguous range
    of world z, so each (band, cascade) tap additionally picks the
    smallest v-axis window in {R/8, R/4, R/2, R} covering its extent and
    contracts only those rows (`_slab_tap` — measured 1.45x fewer tap MACs
    at the 720p viewer pose, with the 88/57 m cascades' near bands at
    1/4-1/8 windows; the R window falls back to the exact circular tap).
    Same weights, same texels — not an approximation.

    tap_impl: "einsum" (XLA two-einsum tap) or "pallas" /
    "pallas-interpret" (ops/pallas_tap.fused_tap — fused weight-build +
    contraction, no HBM weight/rows intermediates; same texels/weights,
    fp32 reduction order differs ~1e-5).
    """
    nlev = len(pyramid)
    ncasc = pyramid[0].shape[0]
    # v-duplicated tables: any R-row window is contiguous (repeat wrap)
    pyr_pad = [jnp.concatenate([p, p], axis=2) for p in pyramid] \
        if slab_crop else None

    def tap_at(l, i, s, xz_b):
        if not slab_crop:
            return _gradient_tap(pyramid[l][i], s, xz_b, impl=tap_impl)
        n_l = pyramid[l].shape[-1]
        sizes = [m for m in (n_l // 8, n_l // 4, n_l // 2)
                 if m >= 16]
        if not sizes:
            return _gradient_tap(pyramid[l][i], s, xz_b, impl=tap_impl)
        fv = xz_b[..., 1] * s[1] * n_l
        ext = jnp.max(fv) - jnp.min(fv)
        # smallest window with ext + 4-texel footprint margin inside it
        idx = sum((ext + 5.0 > m).astype(jnp.int32) for m in sizes)
        slabs = [
            (lambda m=m: _slab_tap(pyr_pad[l][i], s, xz_b, m,
                                   impl=tap_impl))
            for m in sizes
        ] + [lambda: _gradient_tap(pyramid[l][i], s, xz_b, impl=tap_impl)]
        return jax.lax.switch(idx, slabs)

    def band(_, inp):
        xz_b, lev_b = inp
        grad = jnp.zeros(xz_b.shape[:-1] + (3,), jnp.float32)
        for i in range(ncasc):
            s = map_scales[i]
            branches = [
                (lambda l=l: tap_at(l, i, s, xz_b))
                for l in range(nlev)
            ] + [lambda: jnp.zeros((3,) + xz_b.shape[:-1], jnp.float32)]
            tap = jax.lax.switch(jnp.minimum(lev_b[i], nlev), branches)
            grad = grad + jnp.moveaxis(tap, 0, -1) * jnp.stack(
                [s[3], s[3], jnp.float32(1.0)])
        return None, grad

    _, out = jax.lax.scan(band, None, (xz_bands, band_levels))
    return out


def smith_masking_shadowing(cos_theta: jax.Array, alpha: jax.Array) -> jax.Array:
    """Rational Smith approximation (water.gdshader:96-100).

    NOTE: the reference CALLS this with arguments swapped —
    smith(roughness, dot) vs the signature (cos_theta, alpha)
    (water.gdshader:115-116). We replicate the call-site behavior faithfully
    at the call sites below, keeping this function true to its signature.
    """
    a = cos_theta / (alpha * jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-8)))
    a_sq = a * a
    return jnp.where(a < 1.6, (1.0 - 1.259 * a + 0.396 * a_sq) / (3.535 * a + 2.181 * a_sq), 0.0)


def ggx_distribution(cos_theta: jax.Array, alpha: jax.Array) -> jax.Array:
    """GGX NDF (water.gdshader:103-107)."""
    a_sq = alpha * alpha
    d = 1.0 + (a_sq - 1.0) * cos_theta * cos_theta
    return a_sq / (jnp.pi * d * d)


def shade(
    gradient: jax.Array,        # (..., 3) from cascade_gradient
    wave_height: jax.Array,     # (...,) displacement.y at the point
    view_dir: jax.Array,        # (..., 3) unit, surface -> camera
    light_dir: jax.Array,       # (3,) unit, surface -> sun
    distance: jax.Array,        # (...,) camera distance
    water_color=DEFAULT_WATER_COLOR,
    foam_color=DEFAULT_FOAM_COLOR,
    light_color=(1.0, 1.0, 1.0),
    roughness: float = 0.4,
    normal_strength: float = 1.0,
    sky_ambient: bool = True,
    specular_aa: bool = False,
) -> jax.Array:
    """Full fragment+light shading (water.gdshader:72-127) -> linear RGB.

    ``sky_ambient`` adds the reflected-environment term the reference gets
    from the ENGINE, not its shader: the fragment's per-pixel write
    ``ROUGHNESS = (1 - fresnel) * foam_factor + 0.4`` (water.gdshader:93)
    exists solely to drive Godot's ambient/reflection pass against the
    panorama sky (main.tscn:16-20; render_mode at water.gdshader:2 only
    disables shadows, ambient stays on) — the view ray reflected about the
    shading normal samples the sky radiance at that roughness's blur,
    weighted by fresnel. ``sky_ambient=False`` reproduces the bare
    fragment+light math (rounds 1-4 behavior; see docs/PARITY.md).

    ``specular_aa`` (opt-in, NOT in the reference — it rasterizes at native
    resolution and simply sparkles) widens the GGX lobe by the shading
    normal's screen-space variance (forward differences along the two
    screen axes; the standard screen-space specular-AA construction):
    alpha' = sqrt(alpha^2 + sigma2), sigma2 = clip(0.25*|dN|^2, 0, 0.18).
    A flat normal field leaves specular bit-identical; a sub-pixel-busy
    one trades isolated glint outliers for a wider, stabler highlight —
    the internal-render lever the render_scale sweep identified for its
    ~95/255 specular outliers (docs/PERF.md "catrom lift verdict").
    Requires (..., H, W, 3) screen structure. The reference-quirk Smith
    calls keep the scalar material roughness either way. Caveat for
    rows-banded/sharded renders: the differences are zero-padded at each
    local frame's first row/col, so a per-band shade applies no widening
    on band-boundary rows and a sharded render does not bit-match the
    full-frame one with this flag on (it needs a halo row the banded
    path doesn't carry; that is why the option stays out of the sharded
    parity gates and defaults off)."""
    water_color = jnp.asarray(water_color, jnp.float32)
    foam_color = jnp.asarray(foam_color, jnp.float32)
    light_color = jnp.asarray(light_color, jnp.float32)
    light_dir = jnp.asarray(light_dir, jnp.float32)

    # fragment() (gdshader:85-93)
    foam_factor = (3.0 * jnp.square(jnp.clip(gradient[..., 2] * 0.75, 0, 1))
                   - 2.0 * jnp.clip(gradient[..., 2] * 0.75, 0, 1) ** 3)  # smoothstep
    foam_factor = foam_factor * jnp.exp(-distance * 0.0075)
    albedo = (water_color * (1.0 - foam_factor[..., None])
              + foam_color * foam_factor[..., None])

    g = gradient[..., :2] * (0.015 + (normal_strength - 0.015)
                             * jnp.exp(-distance * 0.0175))[..., None]
    normal = jnp.stack([-g[..., 0], jnp.ones_like(g[..., 0]), -g[..., 1]], axis=-1)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)

    dot_nv = jnp.maximum(jnp.sum(normal * view_dir, axis=-1), 2e-5)
    fresnel = (jnp.power(jnp.maximum(1.0 - dot_nv, 0.0), 5.0 * jnp.exp(-2.69 * roughness))
               / (1.0 + 22.7 * roughness ** 1.5))
    fresnel = fresnel * (1.0 - REFLECTANCE) + REFLECTANCE

    # light() (gdshader:109-127)
    halfway = light_dir + view_dir
    halfway = halfway / jnp.linalg.norm(halfway, axis=-1, keepdims=True)
    dot_nl = jnp.maximum(jnp.sum(normal * light_dir, axis=-1), 2e-5)
    # reference quirk preserved: smith called as (roughness, dot)
    light_mask = smith_masking_shadowing(jnp.float32(roughness), dot_nv)
    view_mask = smith_masking_shadowing(jnp.float32(roughness), dot_nl)
    if specular_aa:
        if gradient.ndim < 3:
            raise ValueError(
                "specular_aa needs (..., H, W, 3) screen structure, got "
                f"gradient shape {gradient.shape}")
        dnx = jnp.zeros_like(normal)
        dnx = dnx.at[..., 1:, :, :].set(normal[..., 1:, :, :]
                                        - normal[..., :-1, :, :])
        dny = jnp.zeros_like(normal)
        dny = dny.at[..., :, 1:, :].set(normal[..., :, 1:, :]
                                        - normal[..., :, :-1, :])
        sigma2 = jnp.clip(0.25 * jnp.sum(dnx * dnx + dny * dny, axis=-1),
                          0.0, 0.18)
        alpha_ndf = jnp.sqrt(jnp.float32(roughness) ** 2 + sigma2)
    else:
        alpha_ndf = jnp.float32(roughness)
    dist_ggx = ggx_distribution(jnp.sum(normal * halfway, axis=-1), alpha_ndf)
    geom = 1.0 / (1.0 + light_mask + view_mask)
    specular = fresnel * dist_ggx * geom / (4.0 * dot_nv + 0.1)

    sss_mod = jnp.asarray(SSS_MODIFIER, jnp.float32)
    dot_lv = jnp.maximum(jnp.sum(-view_dir * light_dir, axis=-1), 0.0)
    sss_height = (jnp.maximum(0.0, wave_height + 2.5) * jnp.power(dot_lv, 4.0)
                  * jnp.power(0.5 - 0.5 * dot_nl, 3.0))
    sss_near = 0.5 * dot_nv ** 2
    lambertian = 0.5 * dot_nl
    diffuse_base = ((sss_height + sss_near)[..., None] * sss_mod
                    / (1.0 + light_mask[..., None]) + lambertian[..., None])
    diffuse = (diffuse_base * (1.0 - foam_factor[..., None])
               + foam_color * foam_factor[..., None])
    diffuse = diffuse * (1.0 - fresnel[..., None]) * light_color

    # Reference quirk preserved: SPECULAR_LIGHT accumulates WITHOUT
    # LIGHT_COLOR (water.gdshader:119) while DIFFUSE_LIGHT carries it
    # (:126) — sun tint colors the diffuse only; glints stay white.
    # Identical at the default white light (docs/PARITY.md).
    rgb = albedo * diffuse + specular[..., None]

    if sky_ambient:
        # Ambient sky reflection (the engine-side consumer of the
        # fragment's only ROUGHNESS write, water.gdshader:93): reflect the
        # view ray about the shading normal, sample the sky radiance
        # prefiltered by the per-pixel roughness (foam roughens -> blurs
        # its own reflection — the roughness-foam feedback), weight by the
        # reference's own fresnel. Sub-horizon reflections sample the
        # panorama like Godot's sky does (it covers the full sphere).
        rough_px = (1.0 - fresnel) * foam_factor + 0.4
        refl = 2.0 * dot_nv[..., None] * normal - view_dir
        rgb = rgb + sky_color_rough(refl, light_dir, rough_px) \
            * fresnel[..., None]
    return rgb


def render_ocean(
    maps,                      # OceanMaps (channel-first planes)
    map_scales: jax.Array,     # (C, 4)
    width: int = 960,
    height: int = 540,
    camera_pos=(0.0, 12.0, 0.0),
    pitch_deg: float = -12.0,
    yaw_deg: float = 0.0,
    fov_deg: float = 70.0,
    light_dir=(0.3, 0.55, 0.9),
    environment: bool = False,
    sampler: str = "gather",
    **shade_kwargs,
) -> jax.Array:
    """Offline perspective render of the water plane -> (H, W, 3) linear RGB.

    environment=True applies the reference scene's fog/tonemap/adjustment
    post (apply_environment, main.tscn:22-41).

    Rays from a pinhole camera intersect the y=0 plane (no displacement
    parallax — standard cheap preview); sky via a simple horizon gradient.
    """
    cam = jnp.asarray(camera_pos, jnp.float32)
    pitch = jnp.deg2rad(jnp.float32(pitch_deg))
    tan_half = jnp.tan(jnp.deg2rad(jnp.float32(fov_deg)) / 2)
    xs = (jnp.arange(width, dtype=jnp.float32) / width * 2 - 1) * tan_half
    ys = ((0.5 - jnp.arange(height, dtype=jnp.float32) / height) * 2 * tan_half
          * (height / width))
    dirx, diry = jnp.meshgrid(xs, ys)
    # camera looks toward +z at yaw=0, pitched, then yawed about +y
    # (FlyCamera.basis convention: yaw=y maps +z forward to (-sin y, 0, cos y))
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    d = jnp.stack([dirx, diry * cp + sp, -diry * sp + cp], axis=-1)
    yaw = jnp.deg2rad(jnp.float32(yaw_deg))
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    d = jnp.stack([cy * d[..., 0] - sy * d[..., 2], d[..., 1],
                   sy * d[..., 0] + cy * d[..., 2]], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    t_hit = -cam[1] / d[..., 1]
    hits = t_hit > 0
    t_hit = jnp.where(hits, t_hit, 1e9)
    p = cam + t_hit[..., None] * d
    xz = p[..., jnp.array([0, 2])]

    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)

    disp = cascade_displacement(maps.displacement, map_scales, xz,
                                camera_xz=cam[jnp.array([0, 2])],
                                sampler=sampler)
    grad = cascade_gradient(maps.normal, map_scales, xz, sampler=sampler)
    dist = jnp.linalg.norm(p - cam, axis=-1)
    rgb = shade(grad, disp[..., 1], -d, light, dist, **shade_kwargs)

    rgb = jnp.where(hits[..., None], rgb, sky_color(d, light))
    if environment:
        rgb = apply_environment(rgb, dist, hits)
    return jnp.clip(rgb, 0.0, 1.0)


FOG_LIGHT_COLOR = (0.272954, 0.419272, 0.484632)   # main.tscn:27


def apply_environment(rgb: jax.Array, dist: jax.Array, hits=None, *,
                      fog_depth_begin: float = 200.0,
                      fog_depth_end: float = 350.0,
                      fog_depth_curve: float = 0.25,
                      fog_color=FOG_LIGHT_COLOR,
                      brightness: float = 0.85,
                      contrast: float = 1.07,
                      saturation: float = 1.5,
                      tonemap: bool = True,
                      tonemap_white: float = 4.0) -> jax.Array:
    """The reference scene's environment post (main.tscn:22-41) on linear RGB.

    Depth fog: blend toward fog_light_color by
    clamp((d - begin)/(end - begin))^depth_curve (begin 200, end 350,
    curve 0.25); fog_sky_affect = 0, so pass `hits` to fog only water
    pixels. Tonemap: the scene uses Filmic — here an extended-Reinhard
    curve in LINEAR space (our output stage applies gamma separately,
    where Hejl's gamma-baked form would double-encode). Adjustments:
    brightness x0.85, contrast 1.07 about mid-gray, saturation 1.5
    (main.tscn:38-41).
    """
    f = jnp.clip((dist - fog_depth_begin)
                 / (fog_depth_end - fog_depth_begin), 0.0, 1.0)
    f = f ** jnp.float32(fog_depth_curve)
    if hits is not None:
        f = jnp.where(hits, f, 0.0)
    rgb = rgb + (jnp.asarray(fog_color, jnp.float32) - rgb) * f[..., None]
    if tonemap:
        w2 = jnp.float32(tonemap_white * tonemap_white)
        rgb = rgb * (1.0 + rgb / w2) / (1.0 + rgb)
    rgb = rgb * jnp.float32(brightness)
    rgb = 0.5 + (rgb - 0.5) * jnp.float32(contrast)
    luma = jnp.sum(rgb * jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32),
                   axis=-1, keepdims=True)
    rgb = luma + (rgb - luma) * jnp.float32(saturation)
    return jnp.clip(rgb, 0.0, 1.0)


def sky_color(d: jax.Array, light: jax.Array) -> jax.Array:
    """Procedural panoramic sky for view directions d (..., 3) -> linear RGB.

    The capability analog of the reference's skybox panorama (main.tscn:16-20,
    assets/skybox.png — a binary asset we synthesize instead): zenith/horizon
    gradient, horizon haze, a sun disk with bloom aligned to the light, and
    forward-scatter warmth around it.
    """
    up = jnp.clip(d[..., 1], 0.0, 1.0)[..., None]
    zenith = jnp.asarray([0.20, 0.42, 0.74], jnp.float32)
    horizon = jnp.asarray([0.66, 0.76, 0.86], jnp.float32)
    base = horizon + (zenith - horizon) * jnp.sqrt(up)
    # horizon haze band (thicker atmosphere near grazing angles)
    haze = jnp.exp(-jnp.abs(d[..., 1]) * 9.0)[..., None]
    base = base * (1 - haze) + jnp.asarray([0.78, 0.82, 0.87]) * haze
    # sun: sharp disk + soft bloom + wide forward scatter
    cos_sun = jnp.clip(jnp.sum(d * light, axis=-1), -1.0, 1.0)[..., None]
    disk = jnp.exp((cos_sun - 1.0) * 6000.0)
    bloom = jnp.exp((cos_sun - 1.0) * 80.0)
    scatter = jnp.exp((cos_sun - 1.0) * 6.0)
    sun_col = jnp.asarray([1.0, 0.95, 0.85], jnp.float32)
    return (base + sun_col * (3.0 * disk + 0.35 * bloom)
            + jnp.asarray([0.18, 0.14, 0.08]) * scatter)


def sky_color_rough(d: jax.Array, light: jax.Array,
                    roughness: jax.Array) -> jax.Array:
    """`sky_color` prefiltered by a GGX reflection lobe of `roughness`.

    The analytic analog of Godot's prefiltered radiance mips over the
    panorama sky (main.tscn:16-20): the reflected-environment pass samples
    the sky BLURRED by the surface's per-pixel roughness, which is what the
    fragment's only ROUGHNESS write (water.gdshader:93) exists to drive.
    Every directional term of the procedural sky is a spherical gaussian
    exp(k(cosθ−1)); the GGX lobe at roughness a acts as an SG of sharpness
    k_r ≈ 2/a², and SG convolution closes to sharpness k·k_r/(k+k_r) with
    the peak scaled by k_eff/k (the lobe's energy is conserved while it
    spreads). The zenith/horizon gradient and haze band relax toward their
    spherical means with the same lobe width. roughness → 0 recovers
    `sky_color` exactly (unit-tested); at the shading floor a = 0.4 the sun
    disk is already spread into broad sheen, exactly the look of a rough
    radiance mip.

    d: (..., 3) reflection directions (normalized here); roughness: scalar
    or (...,), clipped to [0, 1].
    """
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    a2 = jnp.square(jnp.clip(
        jnp.asarray(roughness, jnp.float32), 0.0, 1.0))     # (...,)
    k_r = 2.0 / jnp.maximum(a2, 1e-9)

    up = jnp.clip(d[..., 1], 0.0, 1.0)
    # gradient/haze: low-frequency elevation terms relax toward their
    # spherical means (clip(y,0,1) averages 1/4 over the sphere) as the
    # lobe widens; a2 -> 0 keeps them untouched
    t = jnp.clip(a2, 0.0, 1.0)
    up = (up * (1.0 - t) + 0.25 * t)[..., None]
    zenith = jnp.asarray([0.20, 0.42, 0.74], jnp.float32)
    horizon = jnp.asarray([0.66, 0.76, 0.86], jnp.float32)
    base = horizon + (zenith - horizon) * jnp.sqrt(up)
    k_haze = (9.0 * k_r / (9.0 + k_r))[..., None]
    haze = jnp.exp(-jnp.abs(d[..., 1])[..., None] * k_haze)
    base = base * (1 - haze) + jnp.asarray([0.78, 0.82, 0.87]) * haze

    cos_sun = jnp.clip(jnp.sum(d * light, axis=-1), -1.0, 1.0)[..., None]

    def lobe(k, amp):
        k_eff = k * k_r / (k + k_r)
        return (amp * k_eff / k)[..., None] * jnp.exp(
            (cos_sun - 1.0) * k_eff[..., None])

    sun_col = jnp.asarray([1.0, 0.95, 0.85], jnp.float32)
    sun = lobe(jnp.float32(6000.0), 3.0 * jnp.ones_like(a2)) \
        + 0.35 * lobe(jnp.float32(80.0), jnp.ones_like(a2))
    scatter = lobe(jnp.float32(6.0), jnp.ones_like(a2))
    return base + sun_col * sun + jnp.asarray([0.18, 0.14, 0.08]) * scatter


@functools.lru_cache(maxsize=2)
def _puff_lobes(n_lobes: int = 6) -> np.ndarray:
    """(L, 4) [off_x, off_y, sigma_frac, amplitude] lobe table for the
    procedural spray sprite.

    The reference's billboard samples an irregular puff albedo texture
    (sea_spray.gdshader:27,31 x mat_spray.tres sea_spray.png). A texture
    lookup per sprite pixel is a gather (the TPU pathology, docs/PERF.md);
    instead the puff is a fixed MIXTURE OF ISOTROPIC GAUSSIAN LOBES — a core
    plus an offset ring, some negative to chew the rim — which keeps every
    lobe separable, so the whole composite stays one outer-product einsum
    with L x the particle count. Deterministic (fixed seed), normalized to
    unit peak on a dense probe grid.
    """
    rng = np.random.default_rng(7)
    lobes = [(0.0, 0.0, 1.0, 1.0)]
    for i in range(n_lobes - 1):
        ang = 2 * np.pi * i / (n_lobes - 1) + rng.uniform(-0.4, 0.4)
        r = rng.uniform(0.5, 0.85)
        neg = i % 3 == 2
        amp = -0.4 if neg else rng.uniform(0.35, 0.6)
        sig = rng.uniform(0.4, 0.62)
        lobes.append((r * np.cos(ang), r * np.sin(ang), sig, amp))
    tab = np.asarray(lobes, np.float32)
    # normalize: unit peak over a probe grid (so max_alpha keeps its meaning)
    xs = np.linspace(-2.0, 2.0, 81)
    gx, gy = np.meshgrid(xs, xs)
    field = sum(a * np.exp(-((gx - ox) ** 2 + (gy - oy) ** 2) / (2 * s * s))
                for ox, oy, s, a in tab)
    tab[:, 3] /= max(float(field.max()), 1e-6)
    return tab


def splat_spray(
    img: jax.Array,            # (H, W, 3) linear RGB to composite onto
    positions: jax.Array,      # (P, 3) world positions (spray_step output)
    scales: jax.Array,         # (P, 3)
    dissolve: jax.Array,       # (P,) CUSTOM.a driver
    visible: jax.Array,        # (P,) bool
    camera_pos=(0.0, 12.0, 0.0),
    pitch_deg: float = -12.0,
    yaw_deg: float = 0.0,
    fov_deg: float = 70.0,
    foam_color=DEFAULT_FOAM_COLOR,
    max_alpha: float = 0.666,
    custom_z=None,             # (P,) dissolve offset (CUSTOM.z) — optional
    sprite: str = "puff",      # "puff" (textured look) | "gaussian" (1 lobe)
) -> jax.Array:
    """Composite spray particles as scale-aware soft billboards
    (sea_spray.gdshader).

    The billboard pass, array-side: view-aligned gaussian sprites whose
    screen footprint follows the particle's world scale and distance
    (billboarding preserves model scale, sea_spray.gdshader:20-21), alpha
    following the shader's distance fade x dissolve envelope; when
    `custom_z` is given, the scrolling-noise dissolve cut
    (sea_spray.gdshader:30-33 via spray.billboard_alpha, with a
    per-particle procedural noise phase) sculpts the puff edges.
    Brightness uses the foam-color boost (:27-28). Projection matches the
    renderers' camera; pose args may be traced.
    """
    h, w = img.shape[0], img.shape[1]
    cam = jnp.asarray(camera_pos, jnp.float32)
    pitch = jnp.deg2rad(jnp.asarray(pitch_deg, jnp.float32))
    tan_half = jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)) / 2)
    v = positions - cam
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    yaw = jnp.deg2rad(jnp.asarray(yaw_deg, jnp.float32))
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # camera basis (matches render_ocean / FlyCamera.basis): pitch about x,
    # then yaw about y — yaw=0 gives f = (0, sin p, cos p)
    f = jnp.stack([-sy * cp, sp, cy * cp])
    u = jnp.stack([-sy * -sp, cp, cy * -sp])
    r = jnp.stack([cy, jnp.zeros(()), sy]).astype(jnp.float32)
    z = v @ f
    x = v @ r
    y = v @ u
    in_front = z > 0.5
    px = (x / (z * tan_half) + 1.0) * 0.5 * w
    aspect = h / w
    py = (0.5 - y / (z * tan_half * 2 * aspect)) * h
    dist = jnp.linalg.norm(v, axis=-1)

    fade = max_alpha * (1.0 - jnp.exp(-dist * 0.04))
    if custom_z is None:
        alpha = fade * jnp.clip(dissolve, 0.0, 1.0)
    else:
        # (fade + offset)/2 - noise, clamped — the dissolve cut; the
        # scrolling noise texture becomes a per-particle phase scroll
        noise = 0.45 * jnp.mod(custom_z * 7.31 + dissolve * 1.37, 1.0)
        alpha = fade * jnp.maximum(
            (jnp.clip(dissolve, 0.0, 1.0) + custom_z) * 0.5 - noise, 0.0)
    alpha = alpha * jnp.clip(scales[:, 0], 0.0, 1.0)
    alpha = jnp.where(visible & in_front, alpha, 0.0)

    # screen-space sprite radius from the world-scale billboard size
    focal = (w * 0.5) / tan_half
    world_r = 0.5 * jnp.mean(jnp.abs(scales), axis=-1)
    sigma = jnp.clip(world_r * focal / jnp.maximum(z, 0.5), 0.6, 2.2)

    # Sprites are built from SEPARABLE gaussian lobes, so the whole
    # composite is one outer-product contraction on the MXU:
    # overlay = (wy*alpha)^T @ wx over (lobes x particles) pseudo-particles.
    # (A 5x5 scatter-add footprint measured ~2.4 s/frame at 32768 particles
    # — TPU scatters are as pathological as gathers, docs/PERF.md; this
    # einsum is ~5 ms and exact at any radius, no footprint clipping.)
    if sprite == "puff":
        # the procedural sea_spray.png analog: fixed lobe mixture, rotated
        # per particle slot (golden-angle hash) so puffs vary like the
        # reference's texture does across billboards
        tab = jnp.asarray(_puff_lobes())                   # (L, 4)
        theta = jnp.arange(px.shape[0], dtype=jnp.float32) * 2.3999632
        ct, st = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
        off = sigma[:, None] * 1.3                          # lobe ring radius
        cx = px[:, None] + off * (ct * tab[:, 0] - st * tab[:, 1])
        cy_ = py[:, None] + off * (st * tab[:, 0] + ct * tab[:, 1])
        sig = sigma[:, None] * tab[:, 2]
        amp = alpha[:, None] * tab[:, 3]
        px_, py_ = cx.reshape(-1), cy_.reshape(-1)
        sigma_, amp_ = sig.reshape(-1), amp.reshape(-1)
    else:
        px_, py_, sigma_, amp_ = px, py, sigma, alpha
    inv2s2 = (1.0 / (2.0 * sigma_ * sigma_))[:, None]
    rows = jnp.arange(h, dtype=jnp.float32) + 0.5
    cols = jnp.arange(w, dtype=jnp.float32) + 0.5
    wy = jnp.exp(-jnp.square(rows[None, :] - py_[:, None]) * inv2s2)
    wx = jnp.exp(-jnp.square(cols[None, :] - px_[:, None]) * inv2s2)
    overlay = jnp.einsum("ph,pw->hw",
                         (wy * amp_[:, None]).astype(jnp.bfloat16),
                         wx.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    overlay = jnp.clip(overlay, 0.0, 1.0)[..., None]
    boost = jnp.asarray(foam_color, jnp.float32) * jnp.asarray([1.65, 1.75, 1.65])
    return jnp.clip(img * (1 - overlay) + boost * overlay, 0.0, 1.0)
