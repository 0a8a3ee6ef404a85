"""Shading (C12) and spray (C13) array-math tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from godotoceanwaves_tpu import Ocean, OceanMaps
from godotoceanwaves_tpu.models import shading, spray


def _maps(n=64, c=2):
    ocean = Ocean(map_size=n, updates_per_second=0)
    for _ in range(10):
        maps = ocean.update(0.1)
    return ocean, maps


def test_bilinear_constant_and_wrap():
    n = 16
    planes = jnp.full((2, n, n), 3.5)
    uv = jnp.asarray([[0.13, 0.77], [1.4, -0.3], [5.0, 5.0]])
    out = shading.sample_bilinear(planes, uv)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_bilinear_exact_at_texel_centers():
    n = 8
    rs = np.random.RandomState(0)
    vals = rs.rand(1, n, n).astype(np.float32)
    planes = jnp.asarray(vals)
    # texel (ix, iy) center is at uv = ((ix+0.5)/n, (iy+0.5)/n)
    ix, iy = 3, 5
    uv = jnp.asarray([[(ix + 0.5) / n, (iy + 0.5) / n]])
    out = shading.sample_bilinear(planes, uv)
    np.testing.assert_allclose(float(out[0, 0]), vals[0, iy, ix], rtol=1e-6)


def test_bicubic_reproduces_constant_and_smooths():
    n = 32
    planes = jnp.full((1, n, n), 2.0)
    uv = jnp.asarray([[0.4, 0.6]])
    np.testing.assert_allclose(float(shading.sample_bicubic(planes, uv)[0, 0]), 2.0, rtol=1e-5)

    spike = jnp.zeros((1, n, n)).at[0, 16, 16].set(1.0)
    uv_c = jnp.asarray([[(16 + 0.5) / n, (16 + 0.5) / n]])
    bic = float(shading.sample_bicubic(spike, uv_c)[0, 0])
    bil = float(shading.sample_bilinear(spike, uv_c)[0, 0])
    assert bic < bil  # B-spline smooths the spike


def test_cascade_displacement_scales_linearly():
    ocean, maps = _maps()
    scales = ocean.params.map_scales()
    xz = jnp.asarray([[1.0, 2.0], [10.0, -3.0]])
    d1 = shading.cascade_displacement(maps.displacement, scales, xz)
    scales2 = scales.at[:, 2].mul(2.0)
    d2 = shading.cascade_displacement(maps.displacement, scales2, xz)
    np.testing.assert_allclose(np.asarray(d2), 2 * np.asarray(d1), rtol=1e-5)
    assert np.isfinite(np.asarray(d1)).all()


def test_distance_falloff_kills_far_displacement():
    ocean, maps = _maps()
    scales = ocean.params.map_scales()
    far = jnp.asarray([[2000.0, 0.0]])
    d = shading.cascade_displacement(maps.displacement, scales, far,
                                     camera_xz=jnp.zeros(2))
    assert np.abs(np.asarray(d)).max() < 1e-4


@pytest.mark.slow
def test_shade_output_plausible():
    ocean, maps = _maps()
    scales = ocean.params.map_scales()
    xz = jnp.stack(jnp.meshgrid(jnp.linspace(0, 50, 8), jnp.linspace(0, 50, 8)), -1)
    grad = shading.cascade_gradient(maps.normal, scales, xz)
    view = jnp.broadcast_to(jnp.asarray([0.0, 0.8, -0.6]), grad.shape[:-1] + (3,))
    rgb = shading.shade(grad, jnp.zeros(grad.shape[:-1]), view,
                        jnp.asarray([0.0, 0.7, 0.714]), jnp.full(grad.shape[:-1], 30.0))
    rgb = np.asarray(rgb)
    assert np.isfinite(rgb).all()
    assert rgb.min() >= 0.0 and rgb.max() < 10.0


def test_shade_specular_untinted_by_light_color():
    """Reference semantics (water.gdshader:119 vs :126): SPECULAR_LIGHT
    accumulates WITHOUT LIGHT_COLOR while DIFFUSE_LIGHT carries it — a
    colored sun tints the water body but glints stay white. Pinned: at
    light_color=0 the diffuse term vanishes and what remains (the bare
    specular) must be channel-uniform; and changing light_color must move
    the output by exactly the diffuse part (linear in light_color)."""
    ocean, maps = _maps()
    scales = ocean.params.map_scales()
    xz = jnp.stack(jnp.meshgrid(jnp.linspace(0, 50, 8), jnp.linspace(0, 50, 8)), -1)
    grad = shading.cascade_gradient(maps.normal, scales, xz)
    view = jnp.broadcast_to(jnp.asarray([0.0, 0.8, -0.6]), grad.shape[:-1] + (3,))
    light = jnp.asarray([0.0, 0.7, 0.714])
    dist = jnp.full(grad.shape[:-1], 30.0)
    h = jnp.zeros(grad.shape[:-1])

    def shade(lc):
        # sky_ambient=False: this test pins the BARE fragment+light math
        # (the sky reflection term is light_color-independent and colored,
        # so it would mask the channel-uniform bare specular)
        return np.asarray(shading.shade(grad, h, view, light, dist,
                                        light_color=lc, sky_ambient=False))

    spec = shade((0.0, 0.0, 0.0))
    # bare specular: untinted => identical channels, and nonzero somewhere
    assert np.allclose(spec[..., 0], spec[..., 1], atol=1e-6)
    assert np.allclose(spec[..., 0], spec[..., 2], atol=1e-6)
    assert spec.max() > 0.0

    white = shade((1.0, 1.0, 1.0))
    tinted = shade((1.0, 0.5, 0.25))
    # linear in light_color: out(lc) = diffuse_part * lc + spec
    diffuse_part = white - spec
    expect = diffuse_part * np.asarray([1.0, 0.5, 0.25]) + spec
    np.testing.assert_allclose(tinted, expect, rtol=1e-5, atol=1e-6)


def test_sky_color_rough_zero_roughness_is_sky_color():
    """`sky_color_rough` at roughness 0 IS `sky_color` — the SG prefilter
    closes exactly when the reflection lobe is a delta."""
    rng = np.random.default_rng(11)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    light = jnp.asarray([0.3, 0.55, 0.9]) / np.sqrt(0.3**2 + 0.55**2 + 0.9**2)
    got = shading.sky_color_rough(jnp.asarray(d), light, jnp.float32(0.0))
    want = shading.sky_color(jnp.asarray(d), light)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sky_color_rough_blurs_the_sun():
    """Raising roughness spreads the sun lobe: radiance AT the sun drops,
    radiance 20 degrees away rises, and total stays finite/positive —
    the radiance-mip behavior the reference gets from Godot's sky."""
    light = np.asarray([0.0, 0.5, np.sqrt(0.75)], np.float32)
    off = np.asarray([np.sin(np.deg2rad(20.0)), 0.5, 0.0], np.float32)
    off[2] = np.sqrt(max(1.0 - off[0]**2 - off[1]**2, 0.0))
    # rotate `off` to be 20 deg from light in the same elevation band
    c = np.cos(np.deg2rad(20.0))
    off = c * light + np.sqrt(1 - c * c) * np.asarray([1.0, 0.0, 0.0])
    d = jnp.asarray(np.stack([light, off]))
    lo = np.asarray(shading.sky_color_rough(d, jnp.asarray(light), jnp.float32(0.05)))
    hi = np.asarray(shading.sky_color_rough(d, jnp.asarray(light), jnp.float32(0.8)))
    assert hi[0].sum() < lo[0].sum()      # peak at the sun drops
    assert hi[1].sum() > lo[1].sum()      # 20 deg off-axis gains energy
    assert np.isfinite(lo).all() and np.isfinite(hi).all()
    assert (lo >= 0).all() and (hi >= 0).all()


def test_shade_sky_ambient_fresnel_weighted():
    """The reflected-sky term (water.gdshader:93's engine-side consumer) is
    fresnel-weighted: near-zero at foam-free normal incidence (only the
    0.02 reflectance floor), growing steeply at grazing angles."""
    grad = jnp.zeros((2, 3))               # flat, foam-free surface
    h = jnp.zeros((2,))
    light = jnp.asarray([0.0, 0.7, 0.714]) / np.sqrt(0.7**2 + 0.714**2)
    dist = jnp.full((2,), 30.0)
    # view 0: straight down (normal incidence); view 1: grazing
    view = jnp.asarray([[0.0, 1.0, 0.0],
                        [0.0, 0.05, -1.0]])
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)

    on = np.asarray(shading.shade(grad, h, view, light, dist))
    offv = np.asarray(shading.shade(grad, h, view, light, dist,
                                    sky_ambient=False))
    sky_term = np.abs(on - offv).sum(-1)
    assert sky_term[0] < 0.05              # ~REFLECTANCE floor only
    assert sky_term[1] > 5.0 * sky_term[0]  # grazing fresnel dominates
    assert np.isfinite(on).all()


@pytest.mark.slow
def test_render_ocean_image():
    ocean, maps = _maps()
    img = shading.render_ocean(maps, ocean.params.map_scales(), width=64, height=36)
    img = np.asarray(img)
    assert img.shape == (36, 64, 3)
    assert np.isfinite(img).all()
    assert img.std() > 0.01  # not a flat frame


def test_render_ocean_yaw_turns_the_view():
    """FlyCamera yaw reaches the renderer: yawing 180 deg faces away from the
    sun, so the sky half of the frame must change; a 360 deg turn must not."""
    ocean, maps = _maps()
    scales = ocean.params.map_scales()
    kw = dict(width=64, height=36, light_dir=(0.0, 0.4, 0.9))
    img0 = np.asarray(shading.render_ocean(maps, scales, yaw_deg=0.0, **kw))
    img180 = np.asarray(shading.render_ocean(maps, scales, yaw_deg=180.0, **kw))
    img360 = np.asarray(shading.render_ocean(maps, scales, yaw_deg=360.0, **kw))
    assert np.abs(img0 - img180).max() > 0.05
    np.testing.assert_allclose(img0, img360, atol=1e-5)

    from godotoceanwaves_tpu.models.camera import FlyCamera
    cam = FlyCamera()
    cam.look(300.0, 0.0)
    assert "yaw_deg" in cam.render_kwargs()
    assert abs(cam.render_kwargs()["yaw_deg"]) > 1.0


def test_environment_post():
    """Reference environment post (main.tscn:22-41): depth fog pulls distant
    water toward the fog color, near water is untouched, sky is exempt."""
    ocean, maps = _maps()
    scales = ocean.params.map_scales()
    img = shading.render_ocean(maps, scales, width=64, height=36)
    env = shading.render_ocean(maps, scales, width=64, height=36,
                               environment=True)
    assert not np.allclose(np.asarray(img), np.asarray(env))
    assert np.isfinite(np.asarray(env)).all()

    fog = jnp.asarray(shading.FOG_LIGHT_COLOR)
    rgb = jnp.full((3, 3), 0.8)
    near = shading.apply_environment(rgb, jnp.full((3,), 10.0),
                                     tonemap=False, brightness=1.0,
                                     contrast=1.0, saturation=1.0)
    np.testing.assert_allclose(np.asarray(near), 0.8, atol=1e-6)  # d < begin
    far = shading.apply_environment(rgb, jnp.full((3,), 1000.0),
                                    tonemap=False, brightness=1.0,
                                    contrast=1.0, saturation=1.0)
    np.testing.assert_allclose(np.asarray(far), np.broadcast_to(fog, (3, 3)),
                               atol=1e-6)                         # d > end
    sky = shading.apply_environment(rgb, jnp.full((3,), 1000.0),
                                    hits=jnp.zeros(3, bool), tonemap=False,
                                    brightness=1.0, contrast=1.0,
                                    saturation=1.0)
    np.testing.assert_allclose(np.asarray(sky), 0.8, atol=1e-6)   # sky exempt


def test_spray_lifecycle():
    ocean, maps = _maps()
    scales = ocean.params.map_scales()
    params = spray.SprayParams(num_particles=256, emitter_extent=40.0)
    st = spray.spray_init(params)
    assert st.start_pos.shape == (256, 3)
    assert bool((st.start_time >= 0).all())

    step = jax.jit(lambda s, t: spray.spray_step(params, s, maps, scales, t))
    st1, out1 = step(st, 1.0)
    for key, shape in [("position", (256, 3)), ("scale", (256, 3)),
                       ("dissolve", (256,)), ("visible", (256,))]:
        assert out1[key].shape == shape
    assert np.isfinite(np.asarray(out1["position"])).all()

    # particles started by t exceeding start_time
    st2, out2 = step(st1, 4.0)
    assert int(np.asarray(st2.has_started).sum()) > int(np.asarray(st1.has_started).sum())

    # after a full system lifetime everything has recycled at least once
    st3 = st2
    for t in (7.0, 11.0, 14.0):
        st3, _ = step(st3, t)
    assert int(np.asarray(st3.cycle).min()) >= 1


@pytest.mark.slow
def test_spray_activation_requires_foam():
    """With zero foam everywhere, no particle may activate (gdshader:91)."""
    ocean, maps = _maps()
    zero_normal = maps.normal.at[:, 3].set(0.0)
    quiet = OceanMaps(displacement=maps.displacement, normal=zero_normal)
    params = spray.SprayParams(num_particles=64, emitter_extent=30.0)
    st = spray.spray_init(params)
    for t in (1.0, 3.0, 5.0):
        st, out = spray.spray_step(params, st, quiet, ocean.params.map_scales(), t)
    assert not bool(np.asarray(st.active).any())


def test_exp_impulse_peaks_at_inverse_k():
    xs = jnp.linspace(0, 1, 201)
    ys = np.asarray(spray.exp_impulse(xs, 10.0))
    assert abs(xs[ys.argmax()] - 0.1) < 0.01
    np.testing.assert_allclose(ys.max(), 1.0, atol=1e-3)


def test_splat_spray_composites_visible_particles():
    import jax.numpy as jnp
    img = jnp.zeros((36, 64, 3))
    pos = jnp.asarray([[0.0, 0.0, 30.0], [0.0, 0.0, -30.0]])  # front, behind
    scale = jnp.ones((2, 3))
    out = shading.splat_spray(img, pos, scale, jnp.ones(2),
                              jnp.asarray([True, True]),
                              camera_pos=(0.0, 10.0, 0.0))
    assert float(out.sum()) > 0.0          # front particle splatted
    out2 = shading.splat_spray(img, pos, scale, jnp.ones(2),
                               jnp.asarray([False, False]),
                               camera_pos=(0.0, 10.0, 0.0))
    assert float(out2.sum()) == 0.0        # invisible -> untouched


def test_fly_camera_semantics():
    from godotoceanwaves_tpu.models.camera import FlyCamera
    cam = FlyCamera()
    p0 = cam.position.copy()
    cam.move(1.0, forward=1.0)               # 10 m/s base speed
    assert abs(np.linalg.norm(cam.position - p0) - 10.0) < 1e-6
    cam.scroll(2)                            # wheel up scales speed
    assert cam.speed > 10.0
    p1 = cam.position.copy()
    cam.move(1.0, forward=1.0, sprint=True)  # shift boost (camera.gd)
    assert np.linalg.norm(cam.position - p1) > cam.speed  # 3x multiplier
    cam.look(0.0, 1e6)                       # pitch clamped
    assert abs(cam.pitch) < np.pi / 2
    kw = cam.render_kwargs()
    assert set(kw) == {"camera_pos", "pitch_deg", "yaw_deg", "fov_deg"}


def test_splat_spray_scale_aware_footprint_and_dissolve():
    """Billboards preserve model scale (sea_spray.gdshader:20-21): a larger/
    closer particle must cover more pixels; the custom_z dissolve cut
    (:30-33) reduces coverage."""
    import jax.numpy as jnp
    img = jnp.zeros((48, 64, 3))
    big = shading.splat_spray(
        img, jnp.asarray([[0.0, 8.0, 12.0]]), jnp.full((1, 3), 3.0),
        jnp.ones(1), jnp.asarray([True]), camera_pos=(0.0, 10.0, 0.0))
    small = shading.splat_spray(
        img, jnp.asarray([[0.0, 8.0, 12.0]]), jnp.full((1, 3), 0.9),
        jnp.ones(1), jnp.asarray([True]), camera_pos=(0.0, 10.0, 0.0))
    cov_big = float((big.sum(-1) > 0.6).sum())
    cov_small = float((small.sum(-1) > 0.6).sum())
    assert cov_big > cov_small > 0

    cut = shading.splat_spray(
        img, jnp.asarray([[0.0, 8.0, 12.0]]), jnp.full((1, 3), 3.0),
        jnp.ones(1), jnp.asarray([True]), camera_pos=(0.0, 10.0, 0.0),
        custom_z=jnp.asarray([0.0]))     # low offset -> strong cut
    assert float(cut.sum()) < float(big.sum())


def test_mxu_map_samplers_match_gather():
    """sample_bilinear_mxu / sample_bicubic_mxu (weight-einsum taps, the TPU
    render hot path) must match the gather taps to bf16 tolerance,
    including repeat-wrap behavior."""
    import jax.numpy as jnp
    rs = np.random.RandomState(3)
    planes = jnp.asarray(rs.randn(3, 32, 32).astype(np.float32))
    uv = jnp.asarray(rs.uniform(-1.5, 2.5, size=(17, 9, 2)).astype(np.float32))
    for gat, mxu in [(shading.sample_bilinear, shading.sample_bilinear_mxu),
                     (shading.sample_bicubic, shading.sample_bicubic_mxu)]:
        a = np.asarray(gat(planes, uv))
        b = np.asarray(mxu(planes, uv))
        scale = max(1e-9, float(np.abs(a).max()))
        assert np.abs(a - b).max() / scale < 2e-2, (gat.__name__,)
        assert np.sqrt(np.mean((a - b) ** 2)) / scale < 5e-3


def test_cascade_functions_sampler_parity():
    from godotoceanwaves_tpu import Ocean
    import jax.numpy as jnp
    o = Ocean(map_size=32, updates_per_second=0)
    maps = o.update(0.1)
    scales = o.params.map_scales()
    xz = jnp.asarray(np.random.RandomState(0).uniform(-60, 60, (50, 2)),
                     jnp.float32)
    for fn, m in [(shading.cascade_displacement, maps.displacement),
                  (shading.cascade_gradient, maps.normal)]:
        a = np.asarray(fn(m, scales, xz))
        b = np.asarray(fn(m, scales, xz, sampler="mxu"))
        scale = max(1e-6, float(np.abs(a).max()))
        assert np.abs(a - b).max() / scale < 2e-2


def test_cascade_gradient_bilinear_fast_path_is_exact():
    """When the filter blend saturates (min(1, ppm*0.1) == 1 — every
    production preset at N=1024), the mxu path's lax.cond skips the bicubic
    tap entirely; the result must still equal the reference blend, which
    degenerates to pure bilinear there (water.gdshader:76-82)."""
    import jax.numpy as jnp
    rs = np.random.RandomState(5)
    n = 64
    maps = jnp.asarray(rs.randn(2, 4, n, n).astype(np.float32))
    # tile lengths <= n/10 => ppm*0.1 >= 1 for both cascades
    scales = jnp.asarray([[1 / 5.0, 1 / 5.0, 1.0, 0.8],
                          [1 / 6.0, 1 / 6.0, 1.0, 0.5]], jnp.float32)
    xz = jnp.asarray(rs.uniform(-20, 20, (31, 2)).astype(np.float32))
    a = np.asarray(shading.cascade_gradient(maps, scales, xz))
    b = np.asarray(shading.cascade_gradient(maps, scales, xz, sampler="mxu"))
    scale = max(1e-6, float(np.abs(a).max()))
    assert np.abs(a - b).max() / scale < 2e-2


def test_shade_specular_aa():
    """Opt-in screen-space specular AA: flat normal fields shade
    bit-identically (zero variance adds nothing to the GGX alpha); a
    sub-pixel-busy field keeps its peak glint bounded by the unfiltered
    render's while lighting more pixels (the lobe widens)."""
    rng = np.random.RandomState(7)
    h, w = 24, 32
    view = jnp.broadcast_to(jnp.asarray([0.0, 0.8, -0.6]), (h, w, 3))
    light = jnp.asarray([0.0, 0.7, 0.714])
    dist = jnp.full((h, w), 30.0)
    hgt = jnp.zeros((h, w))

    flat = jnp.broadcast_to(jnp.asarray([0.05, -0.03, 0.0]), (h, w, 3))
    off = np.asarray(shading.shade(flat, hgt, view, light, dist))
    on = np.asarray(shading.shade(flat, hgt, view, light, dist,
                                  specular_aa=True))
    np.testing.assert_array_equal(on, off)

    # deterministic sparkle: a checkerboard alternating a mirror-aligned
    # gradient (the glint) with an off-mirror one. AA widens the GGX alpha
    # at every pixel (all neighbors differ), so D(cos≈1, alpha) at the
    # glint pixels — the 1/(pi*alpha^2) peak — must strictly DROP: the
    # sparkle dims into a wider lobe. (A global-max bound would be wrong:
    # off-peak pixels legitimately brighten as the lobe widens.)
    half = np.array([0.0, 0.8, -0.6]) + np.array([0.0, 0.7, 0.714])
    half /= np.linalg.norm(half)
    fade = 0.015 + (1.0 - 0.015) * np.exp(-30.0 * 0.0175)
    g_mirror = np.array([-half[0] / half[1], 0.0, -half[2] / half[1]]) / fade
    g_mirror[1] = 0.0
    board = np.where((np.indices((h, w)).sum(0) % 2 == 0)[..., None],
                     g_mirror[None, None, [0, 2, 1]],
                     np.array([1.4, -0.9, 0.0])[None, None])
    busy = jnp.asarray(board, jnp.float32)
    off_b = np.asarray(shading.shade(busy, hgt, view, light, dist,
                                     sky_ambient=False))
    on_b = np.asarray(shading.shade(busy, hgt, view, light, dist,
                                    sky_ambient=False, specular_aa=True))
    assert np.isfinite(on_b).all()
    ii, jj = np.indices((h, w))
    # skip the first row/col: forward differences are zero-padded there,
    # so those pixels see no variance by construction
    glint = ((ii + jj) % 2 == 0) & (ii > 0) & (jj > 0)
    assert (on_b[glint].mean(-1) < off_b[glint].mean(-1) - 1e-6).all()

    # shade() without screen structure refuses the flag loudly
    with pytest.raises(ValueError):
        shading.shade(busy[0], hgt[0], view[0], light, dist[0],
                      specular_aa=True)
