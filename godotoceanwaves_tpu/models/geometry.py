"""Displaced-geometry renderer: the reference's vertex stage made visible.

The reference's defining visual is a clipmap mesh whose vertices ride the
displacement maps (water.gdshader:29-38 vertex stage; clipmap mesh selected
at water.gd:8-9,46, camera-snapped at main.gd:32-37). This module renders
that displaced geometry — silhouettes, parallax, a shaped horizon — from
the same ingredients:

  1. `displaced_grid` runs the vertex stage: the clipmap grid's vertices
     (utils/clipmap.build_clipmap — the C19 mesh, native C++ generator)
     are displaced by the cascade sum with the 150 m falloff
     (shading.cascade_displacement == water.gdshader:29-38).
  2. `render_ocean_geometry` ray-marches the displaced surface: each pixel
     ray walks the mesh's bilinear-patch interpolation of the displaced
     vertex grid (the array-renderer analog of GPU rasterization of the
     displaced triangles — identical up to the quad-diagonal split) and
     lands on the first crossing, refined by bisection. Horizontal (choppy)
     displacement is honored by fixed-point inversion in the mesh parameter
     domain — the sampled param equals the reference fragment's UV, which
     is assigned from the PRE-displacement world xz (water.gdshader:28).
  3. Hits shade with the full C12 fragment/light model (shading.shade);
     misses shade sky; beyond the finite mesh the ocean continues on the
     flat y=0 plane (displacement is falloff-killed past 150 m anyway, and
     the reference hides its own mesh edge with depth fog).

Quality presets mirror the reference's mesh_quality switch (water.gd:43-46):
"low"/"high" clipmap gradings of the same 512 m footprint. TPU-wise the
whole render is one jitted program with no data-dependent shapes: batched
bracket rounds (every candidate depth sampled in parallel, argmax picks the
first crossing) over the gather-free hat-weight MXU sampler — both chosen
against measured TPU pathologies (docs/PERF.md "Geometry render").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import shading

# the reference ships two clipmap gradings of a 512x512 m plane
# (water.gd:8-9: clipmap_high ~ stripped large blob, clipmap_low 23.5k
# verts). Same footprint, doubled center/ring density for "high".
CLIPMAP_PRESETS: dict[str, dict] = {
    "low": dict(levels=4, center_res=64, ring_cells=16, extent=512.0),
    "high": dict(levels=4, center_res=128, ring_cells=32, extent=512.0),
}


def _resolve_tap_impl(tap_impl: str, table_n: int) -> str:
    """Resolve the gradient-tap implementation for a render.

    "auto" picks the fused Pallas weight-build+contraction kernel
    (ops/pallas_tap) on TPU for tables up to 1024² — measured ≥ the XLA
    einsum tap at every swept size (640x360 interactive 8.45 -> 7.60 ms,
    native 720p neutral; docs/PERF.md round-5 "fused Pallas gradient
    taps") — and the einsum tap elsewhere: off-TPU the kernel only runs
    interpreted (slow, for parity tests), and past 1024² the (3, slab, n)
    VMEM-resident window outgrows Mosaic's scoped VMEM on the blend path.
    An explicit "pallas" off-TPU is forced to "pallas-interpret".
    """
    if tap_impl == "auto":
        if jax.default_backend() == "tpu" and table_n <= 1024:
            return "pallas"
        return "einsum"
    if tap_impl == "pallas" and jax.default_backend() != "tpu":
        return "pallas-interpret"
    return tap_impl


@functools.lru_cache(maxsize=4)
def clipmap_axis_coords(quality: str = "high") -> np.ndarray:
    """The clipmap's graded 1D axis coordinates (k,), via the C19 generator.

    Consumes utils.clipmap.build_clipmap (native C++ when available) and
    recovers the tensor-product structure: verts are a row-major (k, k)
    grid of (x, z) with x varying fastest.
    """
    from ..utils.clipmap import build_clipmap

    verts, _ = build_clipmap(**CLIPMAP_PRESETS[quality])
    k = int(round(len(verts) ** 0.5))
    assert k * k == len(verts), "clipmap verts are not a tensor grid"
    coords = verts[:k, 0].copy()
    # structural sanity: row-major grid (x fastest), shared axis both ways
    assert np.array_equal(verts[:k, 0], verts[k:2 * k, 0])
    assert np.array_equal(verts[::k, 1], coords)
    return coords


def displaced_grid(maps, map_scales: jax.Array, coords: jax.Array,
                   center_xz: jax.Array, camera_pos: jax.Array,
                   sampler: str = "gather") -> jax.Array:
    """Vertex stage: displaced world positions of the clipmap grid.

    coords: (k,) graded axis; center_xz: (2,) mesh origin (snap_to_tile of
    the camera, main.gd:32-37). Returns (k, k, 3) world positions indexed
    [z_row, x_col] — the displaced mesh the renderer walks. Matches
    water.gdshader:29-38 (cascade sum x map scales, 150 m falloff).
    """
    local = jnp.stack(jnp.meshgrid(coords, coords, indexing="xy"), axis=-1)
    world_xz = local + center_xz                        # (k, k, 2)
    if sampler == "mxu":
        # the vertex grid is a tensor product, so sampling is separable:
        # two small matmuls per cascade instead of dense per-vertex weight
        # rows (21 -> ~2 ms at the render's working set, docs/PERF.md)
        disp = shading.cascade_displacement_grid(
            maps.displacement, map_scales, coords, center_xz,
            camera_xz=camera_pos[jnp.array([0, 2])])
    else:
        disp = shading.cascade_displacement(
            maps.displacement, map_scales, world_xz,
            camera_xz=camera_pos[jnp.array([0, 2])], sampler=sampler)
    return jnp.stack([world_xz[..., 0] + disp[..., 0],
                      disp[..., 1],
                      world_xz[..., 1] + disp[..., 2]], axis=-1)


def _grid_sample(grid: jax.Array, coords: jax.Array, center_xz: jax.Array,
                 qx: jax.Array, qz: jax.Array) -> jax.Array:
    """Bilinear sample of the displaced (k, k, 3) grid at world (qx, qz),
    interpolating in the mesh PARAMETER domain (queries clamped to the
    footprint — edge behavior is overridden by the flat far-field in the
    renderer)."""
    k = coords.shape[0]
    lx = qx - center_xz[0]
    lz = qz - center_xz[1]
    i = jnp.clip(jnp.searchsorted(coords, lx) - 1, 0, k - 2)
    j = jnp.clip(jnp.searchsorted(coords, lz) - 1, 0, k - 2)
    x0, x1 = coords[i], coords[i + 1]
    z0, z1 = coords[j], coords[j + 1]
    fx = jnp.clip((lx - x0) / (x1 - x0), 0.0, 1.0)[..., None]
    fz = jnp.clip((lz - z0) / (z1 - z0), 0.0, 1.0)[..., None]
    v00 = grid[j, i]
    v10 = grid[j, i + 1]
    v01 = grid[j + 1, i]
    v11 = grid[j + 1, i + 1]
    return ((v00 * (1 - fx) + v10 * fx) * (1 - fz)
            + (v01 * (1 - fx) + v11 * fx) * fz)


def surface_height(grid: jax.Array, coords: jax.Array, center_xz: jax.Array,
                   x: jax.Array, z: jax.Array, chop_iters: int = 1):
    """Public surface probe: displaced-surface height under world (x, z).

    The buoyancy/gameplay query the rendered surface implies — build the
    displaced mesh once per frame (`displaced_grid`) and probe it at any
    world points (floats, ships, spray spawns). The renderer inlines the
    same inversion against its accel grids; this is the exact graded-mesh
    form.

    The displaced mesh is a heightfield over its PARAMETER (pre-displacement
    xz) domain; horizontal displacement shifts where each column lands.
    Fixed-point inversion (standard for choppy Tessendorf surfaces; converges
    while |d(chop)/dxz| < 1) finds the param whose displaced xz is (x, z).
    Returns (height, (param_x, param_z)) — the param doubles as the
    fragment UV (water.gdshader:28 assigns UV before displacement).
    """
    px, pz = x, z
    for _ in range(chop_iters):
        s = _grid_sample(grid, coords, center_xz, px, pz)
        px = px - (s[..., 0] - x)
        pz = pz - (s[..., 2] - z)
    s = _grid_sample(grid, coords, center_xz, px, pz)
    return s[..., 1], (px, pz)


@functools.lru_cache(maxsize=8)
def _uniform_resample_tables(quality: str, uniform_res: int):
    """Static gather tables mapping the graded clipmap grid onto a UNIFORM
    (G, G) grid over the same footprint.

    The graded->uniform correspondence depends only on the mesh (not the
    frame), so the binary search happens HERE, once, in NumPy — the device
    render then resamples with constant-index gathers and marches with
    arithmetic indexing. This is the accel path's whole trick: per-sample
    `searchsorted` on TPU costs ~10x the actual interpolation.
    Returns (i0 (G,), f (G,) fractions, origin, cell) for one axis (the
    grid is isotropic and shared by both axes).
    """
    coords = clipmap_axis_coords(quality)
    g = uniform_res
    u = np.linspace(coords[0], coords[-1], g).astype(np.float32)
    i0 = np.clip(np.searchsorted(coords, u) - 1, 0, len(coords) - 2)
    f = (u - coords[i0]) / (coords[i0 + 1] - coords[i0])
    return (i0.astype(np.int32), np.clip(f, 0.0, 1.0).astype(np.float32),
            float(coords[0]), float((coords[-1] - coords[0]) / (g - 1)))


def uniform_from_graded(grid: jax.Array, quality: str, uniform_res: int
                        ) -> jax.Array:
    """Resample the displaced (k, k, 3) graded grid to (G, G, 3) uniform,
    using the static tables (constant-index gathers — no searchsorted)."""
    i0, f, _, _ = _uniform_resample_tables(quality, uniform_res)
    i0 = jnp.asarray(i0)
    f = jnp.asarray(f)
    rows = (grid[i0] * (1 - f)[:, None, None]
            + grid[i0 + 1] * f[:, None, None])            # (G, k, 3) over z
    cols = (rows[:, i0] * (1 - f)[None, :, None]
            + rows[:, i0 + 1] * f[None, :, None])         # (G, G, 3)
    return cols


def _hat_weights(f: jax.Array, g: int) -> jax.Array:
    """(..., g) bilinear hat weights: w[i] = max(0, 1 - |f - i|) — a 2-sparse
    row whose dot with a table column performs exact linear interpolation.

    This is the gather-free sampling trick: TPU has no fast hardware gather
    (measured ~12 ms per full-res bilinear at 640x360, docs/PERF.md), but
    hat-weights x table is VPU compares + an MXU matmul."""
    iota = jnp.arange(g, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(f[..., None] - iota)
                       ).astype(jnp.bfloat16)


def _mxu_sample(table: jax.Array, origin, cell, center_xz: jax.Array,
                qx: jax.Array, qz: jax.Array) -> jax.Array:
    """Bilinear sample of a uniform (G, G) or (G, G, C) table at world
    (qx, qz) via hat-weight einsums (MXU path, zero gathers).

    bf16 weights/table with fp32 accumulation: |error| <~ 2^-8 of the value
    scale (centimeters on wave heights) — plenty for intersection tests;
    exact-rounding consumers should use the gather sampler."""
    g = table.shape[0]
    fx = jnp.clip((qx - center_xz[0] - origin) / cell, 0.0, g - 1.001)
    fz = jnp.clip((qz - center_xz[1] - origin) / cell, 0.0, g - 1.001)
    wz = _hat_weights(fz, g)
    wx = _hat_weights(fx, g)
    tb = table.astype(jnp.bfloat16)
    if table.ndim == 2:
        rows = jnp.einsum("...g,gk->...k", wz, tb,
                          preferred_element_type=jnp.float32)
        return jnp.einsum("...k,...k->...", rows, wx.astype(jnp.float32))
    rows = jnp.einsum("...g,gkc->...kc", wz, tb,
                      preferred_element_type=jnp.float32)
    return jnp.einsum("...kc,...k->...c", rows, wx.astype(jnp.float32))


def _uniform_sample(ugrid: jax.Array, origin, cell, center_xz: jax.Array,
                    qx: jax.Array, qz: jax.Array) -> jax.Array:
    """Bilinear sample of the uniform (G, G, 3) grid at world (qx, qz):
    arithmetic indices only."""
    g = ugrid.shape[0]
    fx = jnp.clip((qx - center_xz[0] - origin) / cell, 0.0, g - 1.001)
    fz = jnp.clip((qz - center_xz[1] - origin) / cell, 0.0, g - 1.001)
    i = fx.astype(jnp.int32)
    j = fz.astype(jnp.int32)
    ax = (fx - i)[..., None]
    az = (fz - j)[..., None]
    v00 = ugrid[j, i]
    v10 = ugrid[j, i + 1]
    v01 = ugrid[j + 1, i]
    v11 = ugrid[j + 1, i + 1]
    return ((v00 * (1 - ax) + v10 * ax) * (1 - az)
            + (v01 * (1 - ax) + v11 * ax) * az)


def _pick_nbands(height: int, target: int = 16) -> int:
    """Largest divisor of `height` <= target — the LOD band count (bands
    must tile the frame exactly; 1 disables banding)."""
    for nb in range(min(target, height), 1, -1):
        if height % nb == 0:
            return nb
    return 1


@functools.lru_cache(maxsize=32)
def _scale_weights(n_full: int, n_small: int,
                   kind: str = "linear") -> np.ndarray:
    """(n_full, n_small) weight matrix lifting a frame rendered at a reduced
    internal resolution back to output resolution (pixel-center aligned,
    edges clamped). Used by `render_scale`; the runtime cost is the SAME for
    every kind (one dense matrix through the two-dot `_lift2d`).

    kind="linear": 2-sparse convex hat rows (preserves [0, 1]).
    kind="catrom": 4-sparse Catmull-Rom rows — reproduces cubics on the
    interior, so the lift keeps edge/sparkle contrast bilinear smears; rows
    sum to 1 but carry negative lobes (overshoot is bounded by the caller's
    local min/max clamp, `_pool3`)."""
    x = (np.arange(n_full) + 0.5) * (n_small / n_full) - 0.5
    w = np.zeros((n_full, n_small), np.float32)
    if kind == "linear":
        lo = np.clip(np.floor(x).astype(np.int64), 0, n_small - 1)
        hi = np.minimum(lo + 1, n_small - 1)
        frac = np.clip(x - lo, 0.0, 1.0).astype(np.float32)
        np.add.at(w, (np.arange(n_full), lo), 1.0 - frac)
        np.add.at(w, (np.arange(n_full), hi), frac)
    elif kind == "catrom":
        b = np.floor(x).astype(np.int64)
        f = (x - b).astype(np.float32)
        f2, f3 = f * f, f * f * f
        taps = ((-1, 0.5 * (-f + 2 * f2 - f3)),
                (0, 0.5 * (2 - 5 * f2 + 3 * f3)),
                (1, 0.5 * (f + 4 * f2 - 3 * f3)),
                (2, 0.5 * (f3 - f2)))
        for off, ww in taps:
            idx = np.clip(b + off, 0, n_small - 1)
            np.add.at(w, (np.arange(n_full), idx), ww)
    else:
        raise ValueError(f"unknown lift kind {kind!r}")
    return w


def _pool3(img: jax.Array, op) -> jax.Array:
    """3x3 neighborhood reduction of (h, w, ch) with clamped edges (op =
    jnp.minimum / jnp.maximum) — the local bound for the catrom lift's
    anti-ringing clamp. Nine elementwise ops on the SMALL internal frame."""
    h, w, _ = img.shape
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    out = img
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            out = op(out, p[dy:dy + h, dx:dx + w])
    return out


def _lift2d(img: jax.Array, row_w: jax.Array, col_w: jax.Array) -> jax.Array:
    """Separable screen-space lift of (h, w, ch) to (H, W, ch) as TWO dots
    with the channel axis FOLDED into M/N.

    The natural 3-operand einsum `"ir,rck,jc->ijk"` leaves the ch-wide (3)
    minor axis as a dot operand's contraction neighbor, which pads to the
    128 MXU lane width — measured as a ~+20 ms program-context-dependent
    pathology at 1280x720 on the v5e (docs/PERF.md render_scale). The folded
    form is <1 ms at every swept shape. Used by both the render_scale frame
    lift and the shade_res gradient upsample so neither can regress alone.
    """
    h, w, ch = img.shape
    out_h, out_w = row_w.shape[0], col_w.shape[0]
    a = jnp.dot(row_w, img.reshape(h, w * ch))            # (out_h, w*ch)
    a = a.reshape(out_h, w, ch).transpose(0, 2, 1).reshape(out_h * ch, w)
    b = jnp.dot(a, col_w.T)                               # (out_h*ch, out_w)
    return b.reshape(out_h, ch, out_w).transpose(0, 2, 1)


@functools.lru_cache(maxsize=32)
def _upsample_weights(n: int, stride: int):
    """Static decimation indices + linear upsample matrix for one axis.

    ~n/stride samples spread evenly from 0 to n-1 (both ends included, so
    the interpolation never extrapolates), with the count rounded UP to a
    multiple of 16: the LOD's horizontal banding needs a divisor of the
    decimated row count, and the naive every-stride-th count n//stride+1
    is frequently PRIME (181 at 360/2, 271 at 540/2) — which silently
    disabled banding (nb=1, every tap at mip level 0; measured as the
    super-linear 960x540 scaling anomaly, docs/PERF.md). Returns
    (indices (m,), weights (n, m) fp32) with 2-sparse rows:
    out = weights @ values_at_indices. Used by render_ocean_geometry's
    shade_res: gradients are smooth fields, so tapping them on a decimated
    screen grid and linearly upsampling is the classic half-res
    lighting-buffer trade."""
    m = max(2, min(n, -(-n // stride)))
    if m < n:
        m = min(n, -(-m // 16) * 16)
    pos_a = np.unique(np.round(np.linspace(0, n - 1, m)).astype(np.int64))
    w = np.zeros((n, len(pos_a)), np.float32)
    seg = np.clip(np.searchsorted(pos_a, np.arange(n), side="right") - 1,
                  0, len(pos_a) - 2)
    lo, hi = pos_a[seg], pos_a[seg + 1]
    frac = (np.arange(n) - lo) / np.maximum(hi - lo, 1)
    w[np.arange(n), seg] = 1.0 - frac
    w[np.arange(n), seg + 1] = frac
    # exact at sampled rows (incl. the appended last row)
    w[pos_a] = 0.0
    w[pos_a, np.arange(len(pos_a))] = 1.0
    return pos_a, w


def _fan_select(sample_h, cam, d, t0, t1, marchable,
                far: float, phi_res: int, tau_res: int, rows_group: int,
                frame_height: int, heading, rel_range,
                tau_near: float = 0.25):
    """Polar fan bracket: the whole march reduced to one profile matmul.

    Every pixel's ground track is a straight ray from the camera's xz
    position, so the heightfield along ALL candidate march positions lives
    on a (heading phi x horizontal-distance tau) polar fan table sampled
    ONCE per frame (phi_res x tau_res points — ~100x fewer map samples than
    per-pixel-per-step marching). Each pixel's depth profile is a 2-sparse
    hat interpolation across the phi axis — one (P, phi)x(phi, tau) MXU
    matmul, amortized over `rows_group`-row groups (heading varies by
    <~0.1 deg inside a group at the shipped poses; the lateral snap is far
    below the march table's 2 m cells) — and the bracket itself is a fused
    elementwise compare + first-crossing min-reduce on the VPU: ZERO
    per-pixel map sampling. tau is log-spaced (static values), so the
    previous grid point is a multiply, not a gather. The caller re-tests
    the returned (t_lo, t_hi] segment on the fine world table (the same
    demote-on-refute semantics as the two-level bracket_res march), which
    keeps landed geometry at world-table accuracy.

    Resolution: laterally the fan (fov/phi_res, e.g. 0.27 deg at 256) is
    strictly finer than the 2 m march-table cells everywhere nearer than
    ~400 m; in depth the log grid (~2.75% of tau at 320) is finer than the
    current (window/march_steps) stride at every swept pose. Rays steeper
    than ~atan(cam_y/tau_near) below horizontal can alias the near cutoff
    (tau < tau_near is only covered by the window-start test the caller
    runs) — irrelevant until pitch approaches straight down.

    `heading` = (mx, mz) center heading and `rel_range` = (lo_a, hi_a)
    heading extremes MUST come from band-independent quantities (the yaw
    forward direction and the FULL frame's corner rays): a `rows` band must
    build the SAME fan as the dense frame or the multi-chip bands diverge.
    `frame_height` (the full frame's rows) calibrates the angular group
    size the same way for every band.

    Returns (found, t_lo, t_hi): bracket segment in ray-parameter units.
    """
    hgt, wid = d.shape[:2]
    dxz = jnp.maximum(jnp.sqrt(d[..., 0] ** 2 + d[..., 2] ** 2), 1e-6)
    s = d[..., 1] / dxz                       # dy per horizontal meter
    ux, uz = d[..., 0] / dxz, d[..., 2] / dxz
    mx, mz = heading
    rel = jnp.arctan2(ux * mz - uz * mx, ux * mx + uz * mz)
    lo_a, hi_a = rel_range
    dphi = (hi_a - lo_a) / (phi_res - 1) + 1e-9
    ang = lo_a + jnp.arange(phi_res, dtype=jnp.float32) * dphi
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    fux, fuz = mx * ca + mz * sa, mz * ca - mx * sa
    tau = jnp.asarray(np.geomspace(tau_near, far, tau_res,
                                   dtype=np.float32))
    hfan = sample_h(cam[0] + fux[:, None] * tau[None, :],
                    cam[2] + fuz[:, None] * tau[None, :])   # (phi, tau)

    # rows_group is calibrated at 720 rows (~0.4 deg of heading drift per
    # group at fov 70); scale with the FULL frame height so the ANGULAR
    # snap — the actual error term — is resolution-independent, then take
    # the largest divisor of the local row count (groups must tile the
    # band; a sharded band's offset is a multiple of its count, so group
    # boundaries land on the same full-frame rows on every device).
    g_target = max(1, (rows_group * frame_height) // 720)
    g = 1
    for cand_g in range(min(g_target, hgt), 0, -1):
        if hgt % cand_g == 0:
            g = cand_g
            break
    a = jnp.clip((rel - lo_a) / dphi, 0.0, phi_res - 1)
    ag = a.reshape(hgt // g, g, wid).mean(axis=1)            # (H/g, W)
    iota = jnp.arange(phi_res, dtype=jnp.float32)
    wphi = jnp.maximum(0.0, 1.0 - jnp.abs(ag[..., None] - iota))
    # profile stays f32: near-grazing crossings are height-sensitive (a
    # 2 cm bf16 rounding shifts a slope-0.01 crossing by 2 m of tau), and
    # the matmul is small enough (~(P/8) x phi x tau) that f32 MXU passes
    # cost well under a millisecond at 720p
    prof = jnp.einsum("hwf,fj->hwj", wphi, hfan,
                      preferred_element_type=jnp.float32)    # (H/g, W, J)

    tau0 = (t0 * dxz).reshape(hgt // g, g, wid)[..., None]
    tau1 = (t1 * dxz).reshape(hgt // g, g, wid)[..., None]
    sy = s.reshape(hgt // g, g, wid)[..., None]
    below = cam[1] + sy * tau < prof[:, None]                # (H/g,g,W,J)
    cand = below & (tau > tau0) & (tau <= tau1) \
        & marchable.reshape(hgt // g, g, wid)[..., None]
    tsel = jnp.min(jnp.where(cand, tau, jnp.inf),
                   axis=-1).reshape(hgt, wid)
    found = jnp.isfinite(tsel) & marchable
    ratio = float(np.exp(-np.log(far / tau_near) / (tau_res - 1)))
    tsel = jnp.where(found, tsel, 1.0)       # keep inf out of the algebra
    t_hi = jnp.where(found, tsel / dxz, t1)
    t_lo = jnp.where(found, jnp.maximum(t0, t_hi * ratio), t0)
    return found, t_lo, t_hi


def camera_rays(width: int, height: int, pitch_deg, yaw_deg, fov_deg,
                row_offset=0, row_count: int | None = None):
    """Pixel ray directions (H, W, 3) for the FlyCamera basis convention
    (same math as shading.render_ocean).

    `row_offset`/`row_count` select a horizontal band of the full frame
    (rays identical to the corresponding rows of the full grid) — the
    window the sharded renderer gives each device. `row_offset` may be
    traced (e.g. `lax.axis_index`); `row_count` is static."""
    rows = height if row_count is None else row_count
    pitch = jnp.deg2rad(jnp.asarray(pitch_deg, jnp.float32))
    tan_half = jnp.tan(jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)) / 2)
    xs = (jnp.arange(width, dtype=jnp.float32) / width * 2 - 1) * tan_half
    ys = ((0.5 - (row_offset + jnp.arange(rows, dtype=jnp.float32)) / height)
          * 2 * tan_half * (height / width))
    dirx, diry = jnp.meshgrid(xs, ys)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    d = jnp.stack([dirx, diry * cp + sp, -diry * sp + cp], axis=-1)
    yaw = jnp.deg2rad(jnp.asarray(yaw_deg, jnp.float32))
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    d = jnp.stack([cy * d[..., 0] - sy * d[..., 2], d[..., 1],
                   sy * d[..., 0] + cy * d[..., 2]], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def render_ocean_geometry(
    maps,                       # OceanMaps (channel-first planes)
    map_scales: jax.Array,      # (C, 4)
    quality: str = "high",      # clipmap grading (water.gd:43-46)
    width: int = 960,
    height: int = 540,
    camera_pos=(0.0, 12.0, 0.0),
    pitch_deg=-12.0,
    yaw_deg=0.0,
    fov_deg=70.0,
    center_xz=None,             # mesh origin; None -> snapped under camera
    light_dir=(0.3, 0.55, 0.9),
    environment: bool = False,
    march_steps: int = 40,
    bisect_steps: int = 8,
    chop_iters: int = 1,
    march_chop_iters: int = 0,
    far: float = 1600.0,
    accel: str = "uniform",     # "uniform" (fast march grid) | "exact"
    uniform_res: int = 512,
    sampler: str = "auto",      # "auto" | "mxu" | "gather" (uniform accel)
    march_res: int = 256,       # mxu march-table resolution (2 m cells)
    bracket_res: int = 0,       # coarse table for the BRACKET march (0=off)
    invert_res: int = 0,        # chop-only table for the UV inversion (0=off)
    march_impl: str = "auto",   # "auto" | "fan" | "xla" | "pallas"
    fan_phi: int = 256,         # fan march: heading-axis resolution
    fan_tau: int = 320,         # fan march: log-depth-axis resolution
    fan_rows: int = 8,          # fan march: rows sharing one profile
    gradient_lod: bool = True,  # screen-space mip LOD for the gradient taps
    tap_impl: str = "auto",     # "auto" | "einsum" | "pallas"[-interpret]
    lod_bands: int = 16,        # max horizontal LOD bands (must divide H)
    lod_levels: int = 4,        # max mip pyramid depth for the LOD taps
    lod_bias: float = 1.0,      # >1 = coarser mips (speed/detail tradeoff)
    shade_res: int = 1,         # gradient taps every s-th pixel, upsampled
    render_scale: int = 1,      # dynamic resolution: render at 1/s, upsample
    rows=None,                  # (row_offset, row_count) band of the frame
    lift: str = "catrom",       # render_scale filter: "catrom" | "linear"
    _debug_stage=None,          # profiling: "march" | "uv" | "grad" early out
    **shade_kwargs,
) -> jax.Array:
    """Perspective render of the DISPLACED clipmap mesh -> (H, W, 3) RGB.

    Rays march the displaced surface (true silhouettes/parallax — the
    capability of the reference's vertex-displaced rasterization,
    water.gdshader:29-38) inside the mesh footprint, and fall back to the
    flat y=0 plane beyond it. Camera pose arguments are traced (pass jnp
    scalars to fly without retracing); `quality`/`accel` are Python-level
    (part of the trace).

    accel="uniform" (default, ~50x faster on TPU): the displaced graded
    grid is resampled once per frame onto a uniform grid via STATIC gather
    tables, and the march/bisect index it arithmetically — per-sample
    `searchsorted` on the graded axis is what made the exact path
    5 s/frame at 640x360 (docs/PERF.md). The uniform cell (512 m / G) is
    the accel path's geometric resolution; "exact" marches the graded mesh
    interpolant itself (tests pin the two within tolerance).

    `shade_res=s` (s > 1) takes the gradient taps — the dominant per-pixel
    cost — on an every-s-th-pixel screen grid and linearly upsamples the
    (smooth) gradient field back to full resolution before the per-pixel
    shading nonlinearity; the LOD criterion sees the honest s-times-wider
    tap footprint. The march, UV inversion, and shading remain full-res.

    `bracket_res=b` (0 < b < march_res) marches the BRACKET steps on a
    b-resolution height table and refines on the full march_res table (the
    per-sample cost is quadratic in table resolution, so b = march_res/2
    quarters the march stage); the landed hit keeps the fine table's
    geometry. Ignored by march_impl="pallas" (the fused kernel marches one
    table). `invert_res=i` (0 < i < uniform_res) runs the final fragment-UV
    chop inversion against a 2-channel (horizontal chop only) table at
    resolution i instead of the 3-channel uniform_res grid.

    `rows=(offset, count)` renders only that horizontal band of the full
    frame (rays, LOD bands, and output rows all restricted to the window;
    offset may be traced). This is the unit of the multi-chip renderer
    (parallel.sharding.render_geometry_sharded): pixels are independent
    given the replicated displaced grid, so bands shard with zero
    cross-device traffic.

    `render_scale=s` (s > 1) is dynamic resolution — the TPU analog of
    Godot's 3D viewport render scale: the ENTIRE pipeline (march, UV
    inversion, gradient taps, shading, sky) runs at width/s x height/s and
    the finished frame is lifted back on-device (one small matmul pair;
    `lift` picks the filter — "catrom" 4-tap Catmull-Rom with a 3x3
    anti-ringing clamp (default), "linear" the plain bilinear hat — both
    cost the same at runtime). Unlike `shade_res` (which decimates only the gradient
    taps), everything scales, so the cost drops ~s^2; the LOD criterion
    sees the honestly wider internal pixel. Requires width, height (and a
    static `rows` window) divisible by s; with `rows`, each band upsamples
    independently with clamped edges (a seam softening of <=s px for
    lift="linear", <=3s px for "catrom" (4-tap footprint + clamp window)
    per band boundary — negligible at the multi-chip band heights, and
    zero for full frames).
    """
    if _debug_stage not in (None, "march", "uv", "grad"):
        raise ValueError(f"unknown _debug_stage {_debug_stage!r}; expected "
                         "None, 'march', 'uv' or 'grad'")
    if _debug_stage is not None and render_scale > 1:
        raise ValueError("_debug_stage is a profiling hook for the internal "
                         "render; call it with render_scale=1")
    if render_scale > 1:
        # Rebuild the recursive call's kwargs BY SIGNATURE NAME (not raw
        # locals() position): a renamed or newly added parameter raises
        # KeyError here instead of silently injecting/omitting kwargs.
        # Must stay the first statement block so locals() only holds params.
        import inspect
        frame = locals()
        call = {name: frame[name]
                for name in inspect.signature(render_ocean_geometry).parameters
                if name not in ("render_scale", "shade_kwargs")}
        s = render_scale
        if width % s or height % s:
            raise ValueError(
                f"render_scale={s} needs width/height divisible by it "
                f"(got {width}x{height})")
        out_h = height
        if rows is not None:
            off, cnt = rows
            if isinstance(cnt, int) and cnt % s:
                raise ValueError(
                    f"render_scale={s} needs the rows count divisible by it "
                    f"(got {cnt})")
            if isinstance(off, int) and off % s:
                raise ValueError(
                    f"render_scale={s} needs the rows offset divisible by "
                    f"it (got offset {off}); an offset floored by //{s} "
                    "would render a band shifted by up to s-1 rows")
            call["rows"] = (off // s, cnt // s)
            out_h = cnt
        call["width"], call["height"] = width // s, height // s
        img = render_ocean_geometry(**call, **shade_kwargs)
        row_w = jnp.asarray(_scale_weights(out_h, out_h // s, lift))
        col_w = jnp.asarray(_scale_weights(width, width // s, lift))
        out = _lift2d(img, row_w, col_w)
        if lift == "catrom":
            # anti-ringing: Catmull-Rom's negative lobes overshoot at hard
            # edges (specular sparkle); clamp each output pixel to its 3x3
            # internal-frame neighborhood extremes (nearest-lifted — integer
            # scale, so jnp.repeat). Ringing is never "right", while the
            # kept mid-range sharpening is the filter's whole point.
            mn = jnp.repeat(jnp.repeat(_pool3(img, jnp.minimum), s, 0), s, 1)
            mx = jnp.repeat(jnp.repeat(_pool3(img, jnp.maximum), s, 0), s, 1)
            out = jnp.clip(out, mn, mx)
        return out
    cam = jnp.asarray(camera_pos, jnp.float32)
    row_offset, local_h = (0, height) if rows is None else rows
    if center_xz is None:
        # clipmap follow: mesh snapped to whole tiles under the camera
        # (main.gd:32-37; snap in-trace so a moving camera doesn't retrace)
        center_xz = jnp.ceil(cam[jnp.array([0, 2])])
    else:
        center_xz = jnp.asarray(center_xz, jnp.float32)
    coords = jnp.asarray(clipmap_axis_coords(quality))
    d = camera_rays(width, height, pitch_deg, yaw_deg, fov_deg,
                    row_offset=row_offset, row_count=local_h)
    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.linalg.norm(light)

    if sampler == "auto":
        # gathers are the TPU bottleneck (~12 ms per full-res bilinear,
        # docs/PERF.md); the hat-weight MXU sampler replaces them wholesale.
        # On CPU gathers are cheap and matmuls are not — keep gather there.
        sampler = "mxu" if jax.default_backend() == "tpu" else "gather"
    resolved_march = march_impl if march_impl != "auto" else (
        "fan" if accel == "uniform" else "xla")
    if resolved_march == "xla" and sampler == "mxu" and shade_res > 1 \
            and width == 960 and 520 <= local_h <= 560:
        # ROOT-CAUSED (round-5, scripts/probe_960x540_pathology.py): the
        # (960, ~540) ~2x shape pathology lives in the XLA MARCH program —
        # 960x540 xla 47.8 ms vs fan 16.4 ms, while the aligned neighbors
        # are linear under both (1024x540 xla 28.0 / fan 19.5; 896x540 fan
        # 16.7). The fan march doesn't build that program, so the round-4
        # steer-around is RETIRED on the default path; this warning stays
        # for anyone forcing march_impl="xla" at this shape.
        import warnings
        warnings.warn(
            f"internal render shape {width}x{local_h} is a measured ~2x "
            "TPU shape pathology of the XLA march program (docs/PERF.md "
            "round-5 root cause); use the fan march (march_impl='auto'/"
            "'fan') or a neighboring shape",
            RuntimeWarning, stacklevel=2)
    grid = displaced_grid(maps, map_scales, coords, center_xz, cam,
                          sampler=sampler)
    if accel == "uniform" and sampler == "mxu":
        ugrid = uniform_from_graded(grid, quality, uniform_res)
        _, _, origin, cell = _uniform_resample_tables(quality, uniform_res)
        # the march table can be coarser than the shading-fidelity grid
        mheight = uniform_from_graded(grid, quality, march_res)[..., 1]
        _, _, morigin, mcell = _uniform_resample_tables(quality, march_res)

        def sample(qx, qz):
            return _mxu_sample(ugrid, origin, cell, center_xz, qx, qz)

        def sample_h(qx, qz):
            return _mxu_sample(mheight, morigin, mcell, center_xz, qx, qz)

        if bracket_res and bracket_res < march_res:
            # two-level march: BRACKET steps sample a coarser table (the
            # per-sample contraction is P x G^2 — FLOP-bound, so a half-res
            # table quarters the march cost); REFINEMENT and the final hit
            # stay on the fine march_res table, so the landed geometry keeps
            # the fine table's accuracy (unlike lowering march_res, whose
            # horizon-wide error the knob sweep measured at rms 15/255).
            bheight = uniform_from_graded(grid, quality, bracket_res)[..., 1]
            _, _, borigin, bcell = _uniform_resample_tables(
                quality, bracket_res)

            def sample_hb(qx, qz):
                return _mxu_sample(bheight, borigin, bcell, center_xz,
                                   qx, qz)
        else:
            sample_hb = sample_h
    elif accel == "uniform":
        ugrid = uniform_from_graded(grid, quality, uniform_res)
        _, _, origin, cell = _uniform_resample_tables(quality, uniform_res)
        uheight = ugrid[..., 1:2]   # single-channel: the march's hot grid

        def sample(qx, qz):
            return _uniform_sample(ugrid, origin, cell, center_xz, qx, qz)

        def sample_h(qx, qz):
            return _uniform_sample(uheight, origin, cell, center_xz,
                                   qx, qz)[..., 0]

        if bracket_res and bracket_res < uniform_res:
            bheight = uniform_from_graded(grid, quality,
                                          bracket_res)[..., 1:2]
            _, _, borigin, bcell = _uniform_resample_tables(
                quality, bracket_res)

            def sample_hb(qx, qz):
                return _uniform_sample(bheight, borigin, bcell, center_xz,
                                       qx, qz)[..., 0]
        else:
            sample_hb = sample_h
    else:
        def sample(qx, qz):
            return _grid_sample(grid, coords, center_xz, qx, qz)

        def sample_h(qx, qz):
            return sample(qx, qz)[..., 1]

        sample_hb = sample_h

    def height_at(x, z, iters=chop_iters, coarse=False):
        """Surface height + inverted param under world (x, z). iters=0
        samples the height channel only (4 single-channel gathers — the
        march's budget; chop shifts crests by <~2 m horizontally, which the
        final shading-UV inversion still accounts for). coarse=True uses
        the bracket_res table (height-only paths; no-op when disabled)."""
        if iters == 0:
            return (sample_hb if coarse else sample_h)(x, z), (x, z)
        px, pz = x, z
        for _ in range(iters):
            s = sample(px, pz)
            px = px - (s[..., 0] - x)
            pz = pz - (s[..., 2] - z)
        s = sample(px, pz)
        return s[..., 1], (px, pz)

    y_max = jnp.max(grid[..., 1]) + 0.1
    y_min = jnp.min(grid[..., 1]) - 0.1

    dy = d[..., 1]
    eps = 1e-6
    safe_dy = jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    # march window: enter at the crest ceiling (if above it) AND the mesh's
    # horizontal bounding box (a camera outside the footprint must not
    # sample before the box — edge-clamped samples would report the edge
    # column's wave height and fake a crossing in the gap); leave at the
    # trough floor or the box exit
    t_enter = jnp.where(cam[1] > y_max, (y_max - cam[1]) / safe_dy, 0.0)
    t_enter = jnp.where((cam[1] > y_max) & (dy >= 0), jnp.inf, jnp.maximum(t_enter, 0.0))
    t_floor = jnp.where(dy < 0, (y_min - cam[1]) / safe_dy, jnp.inf)
    lo_x, hi_x = coords[0] + center_xz[0], coords[-1] + center_xz[0]
    lo_z, hi_z = coords[0] + center_xz[1], coords[-1] + center_xz[1]
    def slab_t(o, dd, lo, hi):
        sd = jnp.where(jnp.abs(dd) < eps, eps, dd)
        t1 = (lo - o) / sd
        t2 = (hi - o) / sd
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)
    enter_x, exit_x = slab_t(cam[0], d[..., 0], lo_x, hi_x)
    enter_z, exit_z = slab_t(cam[2], d[..., 2], lo_z, hi_z)
    t_enter = jnp.maximum(t_enter, jnp.maximum(enter_x, enter_z))
    t_box = jnp.minimum(exit_x, exit_z)
    t_end = jnp.minimum(jnp.minimum(t_floor, t_box), far)
    marchable = t_enter < t_end

    t0 = jnp.where(marchable, t_enter, 0.0)
    t1 = jnp.where(marchable, t_end, 1.0)

    def below_at(t, coarse=False):
        p = cam + t[..., None] * d
        h, _ = height_at(p[..., 0], p[..., 2], iters=march_chop_iters,
                         coarse=coarse)
        return p[..., 1] < h

    # BATCHED intersection: every candidate depth is sampled in ONE
    # vectorized evaluation, then the first crossing is an argmax — no
    # sequential loop. (A lax.fori_loop march measured ~13 ms PER STEP on
    # this backend while the identical gathers evaluated ~1000x faster
    # batched outside the loop — XLA's fast gather lowering does not fire
    # inside the while body; docs/PERF.md "geometry render".) Refinement is
    # batched too: subdivide the bracketing interval 8-ways per round
    # (= 3 bisection steps of precision per round).
    def bracket(lo, hi, m, valid, coarse=False):
        """First below-surface crossing among m samples of (lo, hi].

        Python-unrolled over samples (all still parallel in the graph — no
        carried dependency) so the mxu sampler's (H, W, G) hat-weight
        intermediates exist one sample at a time instead of m at once."""
        seg = (hi - lo) / m
        slices = []
        for idx in range(m):
            t = lo + (idx + 1.0) * seg
            p = cam + t[..., None] * d
            h, _ = height_at(p[..., 0], p[..., 2], iters=march_chop_iters,
                             coarse=coarse)
            slices.append(p[..., 1] < h)
        below = jnp.stack(slices) & valid[None]
        hit = below.any(axis=0)
        first = jnp.argmax(below, axis=0).astype(jnp.float32)
        t_first = lo + (first + 1.0) * seg
        return (hit,
                jnp.where(hit, t_first - seg, lo),
                jnp.where(hit, t_first, hi))

    # auto -> the polar fan march (replaces per-pixel-per-step map sampling
    # with one fan table + one profile matmul + a fused VPU compare, see
    # _fan_select; needs the uniform-accel sample windows). The Pallas
    # kernel is a measured dead end (docs/PERF.md "Geometry render":
    # ~18 ms vs XLA ~7 ms — MXU-roofline einsums don't fuse profitably);
    # "xla" remains the dense per-pixel reference path.
    march_impl = resolved_march
    if march_impl == "fan":
        assert accel == "uniform", \
            "march_impl='fan' requires the uniform-accel path"
        # band-independent fan frame: center heading from yaw, heading
        # range from the FULL frame's corner rays (headings are monotone
        # in both screen axes for forward-facing fovs, so the corners are
        # the extremes) — every `rows` band builds the SAME fan table.
        yaw_r = jnp.deg2rad(jnp.asarray(yaw_deg, jnp.float32))
        mx, mz = -jnp.sin(yaw_r), jnp.cos(yaw_r)
        dc = jnp.concatenate([
            camera_rays(width, height, pitch_deg, yaw_deg, fov_deg,
                        row_offset=r, row_count=1)[:, jnp.array([0, -1])]
            for r in (0, height - 1)])                    # (2, 2, 3)
        cux = dc[..., 0] / jnp.maximum(
            jnp.sqrt(dc[..., 0] ** 2 + dc[..., 2] ** 2), 1e-6)
        cuz = dc[..., 2] / jnp.maximum(
            jnp.sqrt(dc[..., 0] ** 2 + dc[..., 2] ** 2), 1e-6)
        crel = jnp.arctan2(cux * mz - cuz * mx, cux * mx + cuz * mz)
        span = jnp.maximum(jnp.max(jnp.abs(crel)), 1e-3)
        fsel, flo, fhi = _fan_select(sample_h, cam, d, t0, t1, marchable,
                                     far, fan_phi, fan_tau, fan_rows,
                                     height, (mx, mz), (-span, span))
        # Re-test the fan's (t_lo, t_hi] segment on the fine world table:
        # the sub-samples land the hit at world-table accuracy, and a fan
        # bracket the fine table refutes demotes to the far-field miss
        # path (same semantics as the two-level bracket_res march). The
        # fan bracket is already ~40x tighter than an xla coarse bracket
        # (one log-tau cell vs window/march_steps), so a handful of taps
        # reach the old precision — each tap is a full per-pixel P x G^2
        # contraction, the dominant fan-mode cost. Camera-under-crest
        # pixels need no dedicated window-start tap here: the fan's near
        # field is centimeter-resolved (log tau from 0.25 m), so they
        # bracket at the first in-window fan sample and the re-test pins
        # them against the fine table like everything else.
        found, lo, hi = bracket(flo, fhi, max(2, bisect_steps - 2), fsel)
    elif march_impl == "pallas":
        assert accel == "uniform" and sampler == "mxu" and \
            march_chop_iters == 0, \
            "march_impl='pallas' requires the uniform/mxu/no-march-chop path"
        from ..ops.pallas_march import march_heightfield
        found, lo, hi = march_heightfield(
            mheight, d, t0, t1, marchable, cam, center_xz,
            origin=morigin, cell=mcell, march_steps=march_steps,
            refine_rounds=max(1, bisect_steps // 3),
            interpret=jax.default_backend() != "tpu")
    else:
        two_level = sample_hb is not sample_h
        # found0 always tests the FINE table (one extra fine sample): it is
        # kept unconditionally through refinement below (found0 | rhit), so
        # a coarse-table false positive at t0 would otherwise shade a
        # phantom hit pinned at the window start with no fine re-test.
        found0 = below_at(t0) & marchable
        # found0: camera already under a crest at the window start
        found, lo, hi = bracket(t0, t1, march_steps, marchable & ~found0,
                                coarse=two_level)
        # found0 pixels hit AT the window start: a degenerate (t0, t0)
        # bracket is a fixed point of the refinement below (seg = 0, every
        # sub-sample re-tests t0), so the hit stays pinned at t0 instead of
        # collapsing through a half-open bracket whose upper end was never
        # verified to be below the surface
        lo = jnp.where(found0, t0, lo)
        hi = jnp.where(found0, t0, hi)
        found = found | found0
        # invariant: hi is below the surface for found pixels, so each
        # round's last sub-sample re-hits and the bracket always tightens 8x.
        # Two-level: refinement runs on the FINE table; its first round
        # re-tests the coarse bracket against the fine surface, and coarse
        # hits the fine table refutes (no sub-sample below — the coarse
        # cell smoothed away the crossing) demote to the far-field miss
        # path rather than landing a phantom midpoint hit.
        for ri in range(max(1, bisect_steps // 3)):
            rhit, lo, hi = bracket(lo, hi, 8, found)
            if ri == 0 and two_level:
                found = found0 | rhit
    t_hit = 0.5 * (lo + hi)

    # flat far-field: rays that miss the mesh but still descend hit y=0
    t_flat = jnp.where(dy < 0, -cam[1] / safe_dy, jnp.inf)
    use_flat = ~found & (dy < 0) & (t_flat > 0)
    t_hit = jnp.where(found, t_hit, t_flat)
    hit = found | use_flat

    t_safe = jnp.where(hit, t_hit, 1.0)
    if _debug_stage == "march":
        # cumulative-cost probe: everything below is dead code under XLA
        # DCE, so timing this return prices rays + march + hit refinement
        return jnp.stack([t_safe, hit.astype(jnp.float32)], axis=-1)
    p = cam + t_safe[..., None] * d
    # fragment UV = pre-displacement param (water.gdshader:28)
    if (invert_res and invert_res < uniform_res and chop_iters > 0
            and accel == "uniform" and sampler == "mxu"):
        # the fixed-point UV inversion only consumes the HORIZONTAL chop
        # channels, which are dominated by the largest cascades (smooth at
        # meters scale) — a 2-channel table at invert_res replaces the
        # full 3-channel uniform_res taps (cost is quadratic in table res
        # and linear in channels)
        igrid = uniform_from_graded(grid, quality, invert_res)[..., ::2]
        _, _, iorg, icel = _uniform_resample_tables(quality, invert_res)
        ux, uz = p[..., 0], p[..., 2]
        for _ in range(chop_iters):
            s = _mxu_sample(igrid, iorg, icel, center_xz, ux, uz)
            ux = ux - (s[..., 0] - p[..., 0])
            uz = uz - (s[..., 1] - p[..., 2])
    else:
        _, (ux, uz) = height_at(p[..., 0], p[..., 2])
    ux = jnp.where(found, ux, p[..., 0])
    uz = jnp.where(found, uz, p[..., 2])
    uv = jnp.stack([ux, uz], axis=-1)
    if _debug_stage == "uv":
        return uv

    dist = t_safe
    # shade_res > 1: take the (dominant-cost) gradient taps on a decimated
    # screen grid and linearly upsample — gradients are smooth fields, so
    # this is the classic half-res lighting buffer; the shading nonlinearity
    # (normalize/fresnel/specular) still runs per pixel. The tap footprint
    # honestly widens by the stride, so the LOD criterion sees it too.
    if shade_res > 1:
        rows_g, row_w = _upsample_weights(local_h, shade_res)
        cols_g, col_w = _upsample_weights(width, shade_res)
        uv_g = uv[rows_g][:, cols_g]
        dist_g = dist[rows_g][:, cols_g]
        hit_g = hit[rows_g][:, cols_g]
        h_g, w_g = len(rows_g), len(cols_g)
    else:
        uv_g, dist_g, hit_g = uv, dist, hit
        h_g, w_g = local_h, width
    nb = _pick_nbands(h_g, lod_bands) \
        if (gradient_lod and sampler == "mxu") else 1
    if gradient_lod and sampler == "mxu" and nb == 1 and h_g > 16:
        # tripwire (docs/PERF.md "found-and-fixed"): banding needs a
        # divisor of the tap-row count; falling back to nb=1 silently runs
        # EVERY gradient tap at mip level 0 — legal, but it already hid a
        # 2-4x render regression once. Warn at trace time, loudly.
        import warnings
        warnings.warn(
            f"gradient LOD banding disabled: no divisor of {h_g} tap rows "
            f"<= lod_bands={lod_bands}; all gradient taps run at full "
            "resolution (pick a height whose tap-row count has small "
            "divisors)", RuntimeWarning, stacklevel=2)
    if nb > 1:
        # screen-space LOD (shading.py "screen-space LOD" block): horizontal
        # bands pick per-cascade mip levels from their minimum hit distance;
        # all-sky bands skip their taps. Near bands run level 0 — the exact
        # dense einsums. The reference has no mips (gradient_lod=False
        # reproduces its full-res point sampling + aliasing).
        pyr = shading.normal_gradient_pyramid(maps.normal, levels=lod_levels)
        # central-pixel angular size; edge pixels subtend slightly less,
        # which only tightens the (already conservative) sub-pixel bound
        theta_pix = (2.0 * jnp.tan(jnp.deg2rad(
            jnp.asarray(fov_deg, jnp.float32)) / 2) / width) * shade_res
        lev = shading.gradient_band_levels(
            dist_g.reshape(nb, -1), hit_g.reshape(nb, -1), map_scales,
            theta_pix, maps.normal.shape[-1], len(pyr), bias=lod_bias)
        resolved_tap = _resolve_tap_impl(tap_impl, maps.normal.shape[-1])
        grad = shading.cascade_gradient_lod(
            pyr, map_scales, uv_g.reshape(nb, -1, 2), lev,
            tap_impl=resolved_tap)
        grad = grad.reshape(h_g, w_g, 3)
    else:
        grad = shading.cascade_gradient(maps.normal, map_scales, uv_g,
                                        sampler=sampler)
    if shade_res > 1:
        grad = _lift2d(grad, jnp.asarray(row_w), jnp.asarray(col_w))
    if _debug_stage == "grad":
        return grad
    rgb = shading.shade(grad, p[..., 1], -d, light, dist, **shade_kwargs)
    rgb = jnp.where(hit[..., None], rgb, shading.sky_color(d, light))
    if environment:
        rgb = shading.apply_environment(rgb, dist, hit)
    return jnp.clip(rgb, 0.0, 1.0)
