"""Displaced-geometry renderer (C12 vertex stage + C19 clipmap consumption).

The silhouette test is the round-3 acceptance check: a high-amplitude ocean
rendered through the displaced mesh must shape the horizon differently from
the flat y=0 raycast (water.gdshader:29-38's visible effect).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from godotoceanwaves_tpu import Ocean
from godotoceanwaves_tpu.models import geometry, shading

W, H = 128, 72
# low camera: plenty of crests (sigma ~1.9 m at wind 18) top out above the
# 2.5 m eye line, so the horizon must show silhouettes
CAM = dict(camera_pos=(0.0, 2.5, 0.0), pitch_deg=-3.0, yaw_deg=0.0)
LIGHT = (0.3, 0.55, 0.9)


@pytest.fixture(scope="module")
def ocean_maps():
    o = Ocean(map_size=64, updates_per_second=0)
    o.set_cascade(0, wind_speed=18.0)          # big waves for silhouettes
    maps = None
    for _ in range(8):
        maps = o.update(1 / 30) or maps
    return maps, o.params.map_scales()


def _sky_mask(img, pitch_deg=CAM["pitch_deg"], yaw_deg=CAM["yaw_deg"]):
    """True where the renderer wrote sky (both paths share sky_color)."""
    d = geometry.camera_rays(W, H, pitch_deg, yaw_deg, 70.0)
    light = jnp.asarray(LIGHT) / np.linalg.norm(LIGHT)
    sky = np.asarray(jnp.clip(shading.sky_color(d, light), 0.0, 1.0))
    return (np.abs(np.asarray(img) - sky) < 1e-6).all(axis=-1)


def test_clipmap_presets_structure():
    lo = geometry.clipmap_axis_coords("low")
    hi = geometry.clipmap_axis_coords("high")
    for coords in (lo, hi):
        assert np.all(np.diff(coords) > 0)                  # monotone grid
        np.testing.assert_allclose(coords, -coords[::-1])   # symmetric
        np.testing.assert_allclose(coords[-1], 256.0)       # 512 m footprint
        # graded: cells grow outward (clipmap LOD), monotonically
        steps = np.diff(coords)
        half = steps[len(steps) // 2:]
        assert np.all(np.diff(half) >= -1e-6)
    assert len(hi) > len(lo)                                # water.gd:43-46


def test_displaced_grid_is_the_vertex_stage(ocean_maps):
    """displaced_grid == cascade_displacement at each clipmap vertex
    (water.gdshader:29-38: world xz + summed displacement, 150 m falloff)."""
    maps, scales = ocean_maps
    coords = jnp.asarray(geometry.clipmap_axis_coords("low"))
    cam = jnp.asarray([3.0, 10.0, -2.0])
    center = jnp.asarray([7.0, -5.0])
    grid = geometry.displaced_grid(maps, scales, coords, center, cam)
    k = coords.shape[0]
    assert grid.shape == (k, k, 3)

    idx = np.array([[0, 0], [k // 2, k // 2], [5, k - 3], [k - 1, 17]])
    for j, i in idx:
        world = jnp.asarray([coords[i] + center[0], coords[j] + center[1]])
        disp = shading.cascade_displacement(
            maps.displacement, scales, world,
            camera_xz=cam[jnp.array([0, 2])])
        expect = jnp.asarray([world[0] + disp[0], disp[1], world[1] + disp[2]])
        np.testing.assert_allclose(np.asarray(grid[j, i]), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_silhouette_differs_from_flat_render(ocean_maps):
    """Wave crests must rise above the flat-plane horizon: the geometry
    render shows water where the y=0 raycast shows sky."""
    maps, scales = ocean_maps
    geom = geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, light_dir=LIGHT,
        march_steps=28, bisect_steps=8, **CAM)
    flat = shading.render_ocean(maps, scales, width=W, height=H,
                                light_dir=LIGHT, **CAM)
    sky_g, sky_f = _sky_mask(geom), _sky_mask(flat)
    assert sky_f.any() and (~sky_f).any()       # flat horizon in frame
    # crests breaking the horizon: water in the geometry render where the
    # flat render saw sky
    assert int((~sky_g & sky_f).sum()) > 5, "no silhouette above the horizon"
    # and the images themselves differ substantially (parallax)
    assert float(np.abs(np.asarray(geom) - np.asarray(flat)).mean()) > 0.005


def test_render_scale_dynamic_resolution(ocean_maps):
    """`render_scale=s` (Godot viewport render-scale analog): full-size
    output, faithful to the native render, and band windows consistent
    with the full frame (the multi-chip unit)."""
    maps, scales = ocean_maps
    kw = dict(light_dir=LIGHT, march_steps=28, bisect_steps=8, **CAM)
    native = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, **kw))
    scaled = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, render_scale=2, **kw))
    assert scaled.shape == native.shape
    assert np.isfinite(scaled).all()
    assert scaled.min() >= 0.0 and scaled.max() <= 1.0
    corr = np.corrcoef(native.ravel(), scaled.ravel())[0, 1]
    assert corr > 0.9, f"scaled render decorrelated from native ({corr:.3f})"
    # row bands (the multi-chip sharding unit) reproduce the full frame's
    # interiors exactly; only the clamped seam at the interior band
    # boundary may differ (<=3s rows each side for the catrom lift:
    # 4-tap footprint + 3x3 anti-ringing clamp window). The OUTER frame
    # edges clamp identically in band and full renders, so they match.
    a = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, render_scale=2,
        rows=(0, H // 2), **kw))
    b = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, render_scale=2,
        rows=(H // 2, H // 2), **kw))
    bands = np.concatenate([a, b], axis=0)
    assert bands.shape == scaled.shape
    hh, seam = H // 2, 6
    np.testing.assert_allclose(bands[:hh - seam], scaled[:hh - seam],
                               atol=1e-5)
    np.testing.assert_allclose(bands[hh + seam:], scaled[hh + seam:],
                               atol=1e-5)
    # indivisible sizes are a loud error, not a silent crop
    with pytest.raises(ValueError):
        geometry.render_ocean_geometry(maps, scales, "low", width=W,
                                       height=H + 1, render_scale=2, **kw)
    with pytest.raises(ValueError):
        geometry.render_ocean_geometry(maps, scales, "low", width=W,
                                       height=H, render_scale=2,
                                       rows=(0, H // 2 + 1), **kw)
    # ... and so is a static rows OFFSET not divisible by the scale (a
    # floored offset would render a band shifted by up to s-1 rows)
    with pytest.raises(ValueError, match="offset"):
        geometry.render_ocean_geometry(maps, scales, "low", width=W,
                                       height=H, render_scale=2,
                                       rows=(1, H // 2), **kw)


def test_fan_march_accuracy_and_band_exactness(ocean_maps):
    """Polar fan march (geometry._fan_select): at the silhouette-heavy low
    pose it must land AT LEAST as close to an oversampled dense march as
    the default xla bracket (on CPU it measured ~3x closer — the log-tau
    grid out-resolves window/march_steps striding), stay finite, and build
    a band-INDEPENDENT fan (heading frame from yaw + full-frame corners),
    so a rows band reproduces the dense frame exactly when the row groups
    align (g=1 at these test heights)."""
    maps, scales = ocean_maps
    kw = dict(light_dir=LIGHT, march_steps=20, bisect_steps=6, **CAM)
    ref = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, march_impl="xla",
        **{**kw, "march_steps": 120, "bisect_steps": 12}))
    xla = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, march_impl="xla", **kw))
    fan = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, march_impl="fan", **kw))
    assert np.isfinite(fan).all()
    rms_fan = float(np.sqrt(((fan - ref) ** 2).mean()))
    rms_xla = float(np.sqrt(((xla - ref) ** 2).mean()))
    assert rms_fan <= rms_xla * 1.25 + 1e-4, (rms_fan, rms_xla)
    # rows band == dense rows (the multi-chip invariant)
    band = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, march_impl="fan",
        rows=(H // 4, H // 4), **kw))
    np.testing.assert_array_equal(band, fan[H // 4: H // 2])


def test_catrom_lift_weights():
    """Catmull-Rom lift rows are a partition of unity, reproduce linear
    ramps exactly on the interior (degree->cubic reproduction), and beat
    bilinear on a curved signal — the render_scale quality upgrade."""
    w = geometry._scale_weights(64, 16, "catrom")
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    # linear ramp: exact wherever the 4-tap footprint stays interior
    ramp = np.arange(16, dtype=np.float32)
    out = w @ ramp
    x = (np.arange(64) + 0.5) * (16 / 64) - 0.5
    interior = (x >= 1.0) & (x <= 14.0)
    np.testing.assert_allclose(out[interior], x[interior], atol=1e-5)
    # curved signal: catrom reconstructs closer than bilinear (coarse
    # samples taken at the lift's own pixel-center-aligned positions)
    xs = (np.arange(16) + 0.5) * (64 / 16) - 0.5
    coarse = np.sin(xs / 63.0 * 3.0 * np.pi).astype(np.float32)
    lin = geometry._scale_weights(64, 16, "linear") @ coarse
    cat = w @ coarse
    tgt = np.sin(np.arange(64) / 63.0 * 3.0 * np.pi)
    assert np.abs(cat - tgt)[4:-4].mean() < np.abs(lin - tgt)[4:-4].mean()
    with pytest.raises(ValueError, match="lift"):
        geometry._scale_weights(8, 4, "lanczos")


def test_catrom_lift_antiringing_clamp(ocean_maps):
    """The catrom render_scale lift never overshoots its 3x3 internal-frame
    neighborhood (anti-ringing clamp), and stays within [0, 1] whenever the
    internal render does."""
    maps, scales = ocean_maps
    kw = dict(light_dir=LIGHT, march_steps=12, bisect_steps=3, **CAM)
    img = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W, height=H, render_scale=2,
        lift="catrom", **kw))
    small = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", width=W // 2, height=H // 2, **kw))
    assert img.min() >= small.min() - 1e-6
    assert img.max() <= small.max() + 1e-6
    # pixel-level: each output within its 3x3 small-frame neighborhood
    import jax.numpy as jnp
    mn = np.repeat(np.repeat(np.asarray(
        geometry._pool3(jnp.asarray(small), jnp.minimum)), 2, 0), 2, 1)
    mx = np.repeat(np.repeat(np.asarray(
        geometry._pool3(jnp.asarray(small), jnp.maximum)), 2, 0), 2, 1)
    assert (img >= mn - 1e-5).all() and (img <= mx + 1e-5).all()


def test_lift2d_matches_reference_einsum():
    """The folded two-dot lift (render_scale + shade_res upsample) is
    numerically the 3-operand einsum it replaced (docs/PERF.md
    render_scale: the einsum had a +20 ms TPU shape pathology)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(9, 13, 3)).astype(np.float32))
    row_w = jnp.asarray(rng.normal(size=(18, 9)).astype(np.float32))
    col_w = jnp.asarray(rng.normal(size=(26, 13)).astype(np.float32))
    got = geometry._lift2d(img, row_w, col_w)
    want = jnp.einsum("ir,rck,jc->ijk", row_w, img, col_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_960x540_shape_pathology_tripwire(ocean_maps):
    """The (960, ~540) TPU shape pathology was ROOT-CAUSED to the XLA
    march program (docs/PERF.md round-5: xla 47.8 ms vs fan 16.4 at that
    shape): the tripwire warns only when march_impl='xla' is forced there;
    the default (fan) path is linear at the shape and stays silent."""
    maps, scales = ocean_maps
    kw = dict(march_steps=8, bisect_steps=3, shade_res=2, sampler="mxu",
              **CAM)
    with pytest.warns(RuntimeWarning, match="pathology"):
        jax.eval_shape(lambda: geometry.render_ocean_geometry(
            maps, scales, "low", width=960, height=540,
            march_impl="xla", **kw))
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        # the default fan march at the same shape is NOT pathological
        jax.eval_shape(lambda: geometry.render_ocean_geometry(
            maps, scales, "low", width=960, height=540, **kw))
        # and the aligned neighbor stays silent even under xla
        jax.eval_shape(lambda: geometry.render_ocean_geometry(
            maps, scales, "low", width=1024, height=540,
            march_impl="xla", **kw))


def test_zero_displacement_reduces_to_flat_plane(ocean_maps):
    """With zero displacement the displaced mesh IS the y=0 plane: the two
    renderers must agree (up to the march/bisect hit tolerance)."""
    maps, scales = ocean_maps
    zero = maps.replace(displacement=jnp.zeros_like(maps.displacement))
    geom = np.asarray(geometry.render_ocean_geometry(
        zero, scales, "low", width=W, height=H, light_dir=LIGHT,
        march_steps=28, bisect_steps=12, **CAM))
    flat = np.asarray(shading.render_ocean(zero, scales, width=W, height=H,
                                           light_dir=LIGHT, **CAM))
    assert (_sky_mask(geom) == _sky_mask(flat)).all()
    diff = np.abs(geom - flat)
    assert diff.mean() < 0.01
    # bulk agreement; isolated grazing pixels may shift a specular sparkle
    # by the finite hit tolerance
    assert np.percentile(diff, 99) < 0.05


@pytest.mark.slow
def test_geometry_render_is_jittable_with_traced_camera(ocean_maps):
    """Camera pose rides as traced args: moving the camera must not retrace
    (the fly-camera requirement for the live surfaces)."""
    maps, scales = ocean_maps
    traces = []

    def render(maps, scales, pos, pitch, yaw):
        traces.append(1)
        return geometry.render_ocean_geometry(
            maps, scales, "low", width=64, height=36, camera_pos=pos,
            pitch_deg=pitch, yaw_deg=yaw, march_steps=16, bisect_steps=4)

    jr = jax.jit(render)
    a = jr(maps, scales, jnp.asarray([0.0, 8.0, 0.0]),
           jnp.float32(-10.0), jnp.float32(0.0))
    b = jr(maps, scales, jnp.asarray([5.0, 9.0, -20.0]),
           jnp.float32(-25.0), jnp.float32(40.0))
    assert len(traces) == 1, "camera motion retraced the renderer"
    assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()
    assert np.abs(np.asarray(a) - np.asarray(b)).mean() > 1e-3


def test_uniform_accel_matches_exact(ocean_maps):
    """accel="uniform" (static-table resample + arithmetic march — the
    production path; the graded-axis searchsorted made "exact" 5 s/frame on
    TPU, docs/PERF.md) must stay close to the exact graded-mesh march."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=28,
              bisect_steps=8, **CAM)
    uni = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", accel="uniform", uniform_res=512, **kw))
    exact = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", accel="exact", **kw))
    diff = np.abs(uni - exact)
    assert diff.mean() < 0.02
    # silhouette agreement: sky masks differ only on a thin horizon band
    sky_u, sky_e = _sky_mask(uni), _sky_mask(exact)
    assert (sky_u != sky_e).mean() < 0.02


@pytest.mark.slow
def test_mxu_sampler_matches_gather(ocean_maps):
    """The gather-free hat-weight MXU sampler must agree with the gather
    sampler up to bf16 table/weight rounding (the TPU production sampler;
    gathers measured ~12 ms per full-res bilinear there)."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=24,
              bisect_steps=6, **CAM)
    # march_res matched to the gather path's grid so the comparison
    # isolates the sampler (bf16 rounding + crossing shifts); production
    # march_res=256 additionally trades ~20 cm of fine-wave height detail
    mxu = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", sampler="mxu", march_res=512,
        gradient_lod=False, **kw))
    gat = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", sampler="gather", **kw))
    diff = np.abs(mxu - gat)
    assert diff.mean() < 0.02
    sky_m, sky_g = _sky_mask(mxu), _sky_mask(gat)
    assert (sky_m != sky_g).mean() < 0.02


@pytest.mark.slow
def test_pallas_march_matches_xla_bracket(ocean_maps):
    """The fused march kernel (ops/pallas_march.py, interpret mode here)
    implements the staged path's bracket algebra exactly: same first-crossing
    choice, same 8-way refinements — images must agree to kernel-rounding."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=24,
              bisect_steps=6, sampler="mxu", **CAM)
    pal = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", march_impl="pallas", **kw))
    xla = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", march_impl="xla", **kw))
    diff = np.abs(pal - xla)
    assert diff.mean() < 5e-3
    sky_p, sky_x = _sky_mask(pal), _sky_mask(xla)
    assert (sky_p != sky_x).mean() < 0.01


def test_gradient_pyramid_convention_and_levels(ocean_maps):
    """2x2 average pooling preserves the half-texel center convention: a
    LINEAR field sampled through any pyramid level returns the same value
    (pooling a linear field is exact and block centers land on the coarser
    grid's texel centers)."""
    n = 32
    x = jnp.arange(n, dtype=jnp.float32) / n
    lin = 0.7 * x[None, :] + 0.3 * x[:, None] + 0.1       # linear in texels
    maps4 = jnp.stack([lin, 2 * lin, jnp.zeros_like(lin), 3 * lin]
                      )[None]                               # (1, 4, n, n)
    pyr = shading.normal_gradient_pyramid(maps4, levels=3)
    assert [p.shape[-1] for p in pyr] == [32, 16, 8]
    # sample well inside the domain (away from the wrap seam, where the
    # coarser level's circular hat spans the discontinuity more widely);
    # tolerance = a few bf16 ulps at the field scale (~3)
    uv = jnp.asarray([[0.4, 0.55], [0.25, 0.3], [0.6, 0.62]])
    t0 = shading.sample_bilinear_mxu(pyr[0][0], uv)
    t1 = shading.sample_bilinear_mxu(pyr[1][0], uv)
    t2 = shading.sample_bilinear_mxu(pyr[2][0], uv)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               rtol=0, atol=0.04)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t0),
                               rtol=0, atol=0.08)


def test_gradient_band_levels_selection():
    """Level selection: near band -> 0, farther bands -> coarser, no-hit
    band -> the skip index (nlevels)."""
    scales = jnp.asarray([[1 / 88.0, 1 / 88.0, 1.0, 1.0],
                          [1 / 16.0, 1 / 16.0, 1.0, 0.25]])
    theta = 2e-3                                  # ~640 px @ 70 deg fov
    dist = jnp.asarray([[5.0, 8.0], [300.0, 900.0], [1.0, 1.0]])
    hit = jnp.asarray([[True, True], [True, True], [False, False]])
    lev = np.asarray(shading.gradient_band_levels(
        dist, hit, scales, theta, base_res=1024, nlevels=4))
    assert lev.shape == (3, 2)
    assert (lev[0] == 0).all()                    # 5 m: sub-pixel bound huge
    assert (lev[1] > 0).all()                     # 300 m: mips engage
    assert lev[1, 1] >= lev[1, 0]                 # smaller tile -> coarser
    assert (lev[2] == 4).all()                    # no hits -> skip branch


def test_gradient_lod_near_field_is_exact(ocean_maps):
    """Looking steeply down (all hit distances small) every band selects
    level 0, so the LOD render must equal the dense mxu render up to fp32
    reduction order: the slab-cropped tap (round 5) contracts the same
    weights against the same texels but over a shorter window, so the dot
    reduction associates differently (~4e-5 max observed; a uint8 frame
    quantization step is 3.9e-3)."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=20,
              bisect_steps=6, sampler="mxu",
              camera_pos=(0.0, 6.0, 0.0), pitch_deg=-50.0, yaw_deg=0.0)
    lod = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=True, **kw))
    ref = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=False, **kw))
    np.testing.assert_allclose(lod, ref, rtol=0, atol=2e-4)


def test_gradient_band_levels_bias_coarsens():
    """bias > 1 shifts selection coarser by ~log2(bias) levels; bias=1 is
    the identity (the conservative default)."""
    scales = jnp.asarray([[1 / 88.0, 1 / 88.0, 1.0, 1.0]])
    dist = jnp.asarray([[120.0, 300.0]])
    hit = jnp.asarray([[True, True]])
    kw = dict(map_scales=scales, theta_pix=2e-3, base_res=1024, nlevels=6)
    l1 = np.asarray(shading.gradient_band_levels(dist, hit, bias=1.0, **kw))
    l4 = np.asarray(shading.gradient_band_levels(dist, hit, bias=4.0, **kw))
    assert (l4 >= l1).all()
    assert (l4 - l1 == 2).all()        # log2(4) = 2 whole levels coarser


def test_gradient_lod_bias_changes_far_field_only_moderately(ocean_maps):
    """lod_bias=2 must still render a recognizably similar image (it drops
    only content within a factor 2 of the sub-pixel bound)."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=20,
              bisect_steps=6, sampler="mxu",
              camera_pos=(0.0, 40.0, 0.0), pitch_deg=-8.0, yaw_deg=0.0)
    biased = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=True, lod_bias=2.0, **kw))
    ref = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=False, **kw))
    assert np.abs(biased - ref).mean() < 0.04


def test_gradient_lod_far_field_stays_close(ocean_maps):
    """A horizon view engages coarser levels; the image must stay close to
    the dense render (removed wavelengths are sub-pixel at the band's
    minimum hit distance) while sky pixels match exactly."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=20,
              bisect_steps=6, sampler="mxu",
              camera_pos=(0.0, 40.0, 0.0), pitch_deg=-8.0, yaw_deg=0.0)
    lod = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=True, **kw))
    ref = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=False, **kw))
    assert np.abs(lod - ref).mean() < 0.02
    sky = (_sky_mask(ref, pitch_deg=-8.0) & _sky_mask(lod, pitch_deg=-8.0))
    np.testing.assert_array_equal(lod[sky], ref[sky])
    # the machinery actually engaged: some water pixel differs (mip blur)
    assert np.abs(lod - ref).max() > 1e-6


def test_gradient_lod_yawed_camera_stays_close(ocean_maps):
    """Yaw doesn't break the horizontal banding (bands are screen rows;
    the horizon stays horizontal under yaw — there is no roll)."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=20,
              bisect_steps=6, sampler="mxu",
              camera_pos=(3.0, 25.0, -7.0), pitch_deg=-10.0, yaw_deg=35.0)
    lod = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=True, **kw))
    ref = np.asarray(geometry.render_ocean_geometry(
        maps, scales, "low", gradient_lod=False, **kw))
    assert np.abs(lod - ref).mean() < 0.02


def test_separable_grid_displacement_matches_pointwise(ocean_maps):
    """cascade_displacement_grid (two-matmul separable tensor-grid sampler)
    must equal cascade_displacement evaluated pointwise on the same grid —
    identical hat-weight algebra, just factorized."""
    maps, scales = ocean_maps
    coords = jnp.asarray(geometry.clipmap_axis_coords("low"))
    center = jnp.asarray([3.0, -11.0])
    cam_xz = jnp.asarray([1.0, 2.0])
    sep = shading.cascade_displacement_grid(
        maps.displacement, scales, coords, center, camera_xz=cam_xz)
    local = jnp.stack(jnp.meshgrid(coords, coords, indexing="xy"), axis=-1)
    ref = shading.cascade_displacement(
        maps.displacement, scales, local + center, camera_xz=cam_xz,
        sampler="mxu")
    np.testing.assert_allclose(np.asarray(sep), np.asarray(ref),
                               atol=2e-3, rtol=0)


def test_upsample_weights_exact_and_partition_of_unity():
    for n, s in [(96, 2), (97, 2), (360, 3), (17, 4), (5, 8)]:
        idx, w = geometry._upsample_weights(n, s)
        assert idx[0] == 0 and idx[-1] == n - 1
        v = np.random.RandomState(n).randn(len(idx)).astype(np.float32)
        full = w @ v
        np.testing.assert_allclose(full[idx], v, atol=1e-6)   # exact at taps
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
        assert (w >= 0).all() and (np.count_nonzero(w, axis=1) <= 2).all()


def test_shade_res_close_to_dense(ocean_maps):
    """shade_res=2 (half-res gradient taps + screen-space upsample) must
    stay visually close to the dense render: gradients are smooth fields,
    the shading nonlinearity still runs per pixel."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=16,
              bisect_steps=5, sampler="mxu",
              camera_pos=(0.0, 9.0, 0.0), pitch_deg=-14.0)
    dense = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                      **kw))
    half = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                     shade_res=2, **kw))
    assert half.shape == dense.shape
    assert np.isfinite(half).all()
    assert np.abs(half - dense).mean() < 0.03
    # sky region is untouched by the gradient path
    sky = _sky_mask(half, pitch_deg=-14.0)
    if sky.any():
        np.testing.assert_allclose(half[sky], dense[sky], atol=1e-6)


def test_bracket_res_two_level_march_close_and_noop(ocean_maps):
    """bracket_res (two-level march: coarse bracket + fine refine) stays
    visually close to the single-table march; a bracket table at or above
    the fine resolution is the identity (no-op guard)."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=16,
              bisect_steps=5, sampler="mxu", march_res=128,
              camera_pos=(0.0, 9.0, 0.0), pitch_deg=-14.0)
    base = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                     **kw))
    two = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                    bracket_res=64, **kw))
    assert two.shape == base.shape and np.isfinite(two).all()
    assert np.abs(two - base).mean() < 0.04
    # refinement runs on the fine table, so most hit pixels land identically
    assert (np.abs(two - base).max(axis=-1) < 1e-3).mean() > 0.7
    # sky is untouched
    sky = _sky_mask(two, pitch_deg=-14.0)
    if sky.any():
        np.testing.assert_allclose(two[sky], base[sky], atol=1e-6)
    # no-op guard: a "coarse" table >= the fine res disables the two-level
    # path entirely (bit-identical render)
    same = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                     bracket_res=128, **kw))
    np.testing.assert_array_equal(same, base)
    # gather-sampler twin (CPU path) stays finite and close too
    kw_g = dict(kw, sampler="gather")
    bg = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                   **kw_g))
    tg = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                   bracket_res=64, **kw_g))
    assert np.abs(tg - bg).mean() < 0.04


def test_invert_res_uv_table_close(ocean_maps):
    """invert_res (2-channel coarse chop-inversion table) stays close to
    the full-grid inversion; at uniform_res it is disabled (identity)."""
    maps, scales = ocean_maps
    kw = dict(width=W, height=H, light_dir=LIGHT, march_steps=16,
              bisect_steps=5, sampler="mxu", uniform_res=128,
              camera_pos=(0.0, 9.0, 0.0), pitch_deg=-14.0)
    base = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                     **kw))
    coarse = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                       invert_res=64, **kw))
    assert coarse.shape == base.shape and np.isfinite(coarse).all()
    # UV shifts only move texture lookups by the chop interpolation error
    assert np.abs(coarse - base).mean() < 0.02
    # disabled guard: invert_res >= uniform_res keeps the original path
    same = np.asarray(geometry.render_ocean_geometry(maps, scales, "low",
                                                     invert_res=128, **kw))
    np.testing.assert_array_equal(same, base)


def test_lod_banding_tripwire_and_decimated_divisibility():
    """The decimated tap-row count must always admit a band divisor
    (docs/PERF.md: n//stride+1 is frequently prime and silently disabled
    banding); a full-res prime height warns instead of silently running
    every tap at level 0."""
    for n in (360, 540, 720, 1080, 96, 270):
        for s in (2, 3):
            idx, w = geometry._upsample_weights(n, s)
            assert geometry._pick_nbands(len(idx)) > 1, (n, s, len(idx))
            assert idx[0] == 0 and idx[-1] == n - 1
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    import warnings
    o = Ocean(map_size=64, updates_per_second=0)
    m = o.update(1 / 30)
    sc = o.params.map_scales()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        geometry.render_ocean_geometry(m, sc, "low", width=64, height=37,
                                       sampler="mxu", march_steps=4,
                                       bisect_steps=3)
    assert any("banding disabled" in str(r.message) for r in rec), \
        "prime full-res height must trip the LOD warning"


def test_debug_stage_profiling_hook(ocean_maps):
    """_debug_stage early returns: shapes per stage, strict validation, and
    prefix consistency (the "grad" return IS the gradient the full render
    shades with, so the decomposition prices real stages, not variants)."""
    maps, scales = ocean_maps
    kw = dict(width=64, height=32, shade_res=2)
    out = {st: geometry.render_ocean_geometry(maps, scales, **kw,
                                              _debug_stage=st)
           for st in ("march", "uv", "grad", None)}
    assert out["march"].shape == (32, 64, 2)
    assert out["uv"].shape == (32, 64, 2)
    assert out["grad"].shape == (32, 64, 3)
    assert out[None].shape == (32, 64, 3)
    for st in ("march", "uv", "grad", None):
        assert bool(jnp.all(jnp.isfinite(out[st]))), st
    # hit mask from the march stage bounds the uv stage: miss pixels keep
    # uv = ray/flat-plane xz, hit pixels ran the inversion — both finite
    assert set(np.unique(np.asarray(out["march"][..., 1]))) <= {0.0, 1.0}
    with pytest.raises(ValueError, match="unknown _debug_stage"):
        geometry.render_ocean_geometry(maps, scales, **kw,
                                       _debug_stage="bogus")
    with pytest.raises(ValueError, match="render_scale=1"):
        geometry.render_ocean_geometry(maps, scales, width=64, height=32,
                                       render_scale=2, _debug_stage="uv")
