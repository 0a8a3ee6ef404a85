"""models/viewport shared plumbing: FramePipeline fetch overlap semantics
and the YUV420 wire format (device-side JPEG chroma subsampling)."""
import numpy as np
import pytest
import jax.numpy as jnp

from godotoceanwaves_tpu.models.viewport import (FramePipeline, SceneRenderer,
                                                 _rgb_to_yuv420,
                                                 ycbcr_to_rgb, yuv420_to_ycbcr)


def test_frame_pipeline_one_frame_lag_and_flush():
    """push returns the PREVIOUS frame's host bytes (None first), flush
    drains the pending frame, and every frame comes out exactly once in
    order — the pipelined viewer/demo loops rely on no frame being dropped
    or duplicated."""
    p = FramePipeline()
    frames = [jnp.full((2, 3, 3), i, jnp.uint8) for i in range(4)]
    out = [p.push(f) for f in frames]
    assert out[0] is None
    for i, host in enumerate(out[1:]):
        assert isinstance(host, np.ndarray)
        np.testing.assert_array_equal(host, np.asarray(frames[i]))
    last = p.flush()
    np.testing.assert_array_equal(last, np.asarray(frames[-1]))
    # drained: nothing pending
    assert p.flush() is None
    assert p.push(frames[0]) is None


def test_frame_pipeline_empty_flush():
    assert FramePipeline().flush() is None


def test_yuv420_wire_format_shapes_and_flat_color():
    """A constant-color frame survives the YUV420 round trip exactly up to
    rounding: chroma is spatially constant so 2x2 subsampling is lossless
    there, bounding the full pipeline to quantization error only."""
    h, w = 8, 12
    srgb = jnp.broadcast_to(jnp.asarray([200.0, 64.0, 30.0]), (h, w, 3))
    flat = np.asarray(_rgb_to_yuv420(srgb))
    assert flat.dtype == np.uint8 and flat.shape == (h * w * 3 // 2,)
    rgb = ycbcr_to_rgb(yuv420_to_ycbcr(flat, h, w))
    assert rgb.shape == (h, w, 3)
    assert np.max(np.abs(rgb.astype(int) - np.asarray([200, 64, 30]))) <= 2
    # every pixel identical (no spatial artifacts on a flat field)
    assert (rgb == rgb[0, 0]).all()


def test_yuv420_round_trip_close_on_smooth_image():
    """On a smooth gradient the YUV420 path matches the direct RGB quantize
    within a small bound — the loss is exactly JPEG's own 4:2:0 chroma
    subsampling, which the web viewer's encoder applied anyway."""
    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    srgb = np.stack([255 * xx / (w - 1), 255 * yy / (h - 1),
                     np.full_like(xx, 90.0)], axis=-1)
    direct = np.round(srgb).astype(np.uint8)
    rgb = ycbcr_to_rgb(yuv420_to_ycbcr(
        np.asarray(_rgb_to_yuv420(jnp.asarray(srgb))), h, w))
    # nearest-upsampled 2x2 chroma can be off by one pixel's gradient step
    # (~11 units/px here) scaled by the chroma coefficients, plus rounding
    assert np.max(np.abs(rgb.astype(int) - direct.astype(int))) <= 12
    assert np.mean(np.abs(rgb.astype(float) - direct.astype(float))) < 6.0
    # luma is NOT subsampled: Y reconstructed exactly up to rounding
    y_direct = (0.299 * srgb[..., 0] + 0.587 * srgb[..., 1]
                + 0.114 * srgb[..., 2])
    y_wire = yuv420_to_ycbcr(
        np.asarray(_rgb_to_yuv420(jnp.asarray(srgb))), h, w)[..., 0]
    assert np.max(np.abs(y_wire.astype(float) - y_direct)) <= 1.0


def test_scene_renderer_rejects_bad_transfer_config():
    with pytest.raises(ValueError):
        SceneRenderer(64, 36, transfer="rgba")
    with pytest.raises(ValueError):
        SceneRenderer(63, 36, transfer="yuv420")   # odd width


def test_jpeg_encode_of_yuv420_preserves_hue():
    """The YCbCr JPEG encode path must decode back to the original color —
    a Cb/Cr swap or wrong matrix would pass shape checks but turn the
    ocean orange; pin hue through the full encode/decode cycle."""
    import io

    from PIL import Image

    from godotoceanwaves_tpu.utils.webviewer import _frame_bytes

    h, w = 16, 16
    # a saturated blue frame in linear space (ocean-ish)
    lin = np.zeros((h, w, 3), np.float32)
    lin[..., 2] = 0.7
    lin[..., 1] = 0.2
    flat = np.asarray(_rgb_to_yuv420(
        jnp.asarray(np.clip(lin, 0, 1) ** (1 / 2.2) * 255)))
    ycbcr = yuv420_to_ycbcr(flat, h, w)
    body, mime = _frame_bytes(ycbcr, mode="YCbCr")
    img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB")).astype(int)
    direct = (np.clip(lin, 0, 1) ** (1 / 2.2) * 255).astype(int)
    # JPEG q85 of a flat field: small error, and blue stays dominant
    assert np.max(np.abs(img - direct)) <= 10
    assert (img[..., 2] > img[..., 1]).all() and (img[..., 1] > img[..., 0]).all()


def test_render_tiers_are_valid_renderer_configs():
    """Every RENDER_TIERS preset builds a SceneRenderer and renders a
    correctly-shaped finite frame (the web panel's live combo feeds these
    straight into render_ocean_geometry)."""
    import numpy as np
    from godotoceanwaves_tpu import Ocean
    from godotoceanwaves_tpu.models.viewport import RENDER_TIERS

    assert set(RENDER_TIERS) == {"quality", "interactive", "performance"}
    ocean = Ocean(map_size=64, updates_per_second=0)
    maps = ocean.update(1 / 30)
    scales = ocean.params.map_scales()
    wc = np.zeros(3, np.float32)
    fc = np.ones(3, np.float32)
    for tier, kw in RENDER_TIERS.items():
        r = SceneRenderer(48, 28, mesh_quality="low", **kw)
        img = np.asarray(r.render(maps, scales, wc, fc,
                                  np.array([0.0, 9.0, 0.0], np.float32),
                                  -14.0, 0.0))
        assert img.shape == (28, 48, 3) and img.dtype == np.uint8


def test_spray_session_checkpoint_resumes_cycles():
    """SpraySession.checkpoint/restore: a restored session CONTINUES the
    particle respawn cycles (VERDICT r4 weak #6 — a viewer restore must not
    restart all 32768 cycles). Twin protocol: A advances, checkpoints,
    advances more; B restores the checkpoint and replays the same dts —
    bitwise-equal particle state."""
    from godotoceanwaves_tpu import Ocean
    from godotoceanwaves_tpu.models.viewport import SpraySession

    ocean = Ocean(map_size=64, updates_per_second=0)
    maps = ocean.update(1 / 30)
    scales = ocean.params.map_scales()

    a = SpraySession(num_particles=256)
    assert a.checkpoint() is None          # unstarted -> nothing to save
    for _ in range(5):
        a.advance(maps, scales, 0.4)       # long dts drive respawn cycles
    snap = a.checkpoint()
    assert snap is not None and snap["clock"] == pytest.approx(2.0)
    assert int(np.asarray(snap["state"]["cycle"]).max()) >= 0

    a_attrs = [a.advance(maps, scales, 0.4) for _ in range(3)]

    b = SpraySession(num_particles=8)      # restore overrides ctor params
    b.restore(snap)
    assert b.started and b.clock == pytest.approx(2.0)
    b_attrs = [b.advance(maps, scales, 0.4) for _ in range(3)]
    for aa, bb in zip(a_attrs, b_attrs):
        for k in aa:
            np.testing.assert_array_equal(np.asarray(aa[k]),
                                          np.asarray(bb[k]))
    np.testing.assert_array_equal(np.asarray(a._state.cycle),
                                  np.asarray(b._state.cycle))
    # restore(None) resets to unstarted
    b.restore(None)
    assert not b.started and b.clock == 0.0


def test_webviewer_session_checkpoint_roundtrip():
    """WebViewer.checkpoint/restore: ocean state, spray state machine, and
    camera pose (incl. fov) all resume in a fresh viewer session."""
    from godotoceanwaves_tpu import Ocean
    from godotoceanwaves_tpu.utils.webviewer import WebViewer

    ocean = Ocean(map_size=64, updates_per_second=0)
    v = WebViewer(ocean, width=64, height=36)
    maps = ocean.update(1 / 30)
    scales = ocean.params.map_scales()
    for _ in range(4):
        v._spray.advance(maps, scales, 0.5)
    v._apply_camera("camera_move", [1.0, 0.0, 0.0, 0.0, 0.7])
    v._apply_camera("fov", 95.0)
    snap = v.checkpoint()
    assert snap["spray"] is not None and snap["camera"]["fov_deg"] == 95.0

    ocean2 = Ocean(map_size=64, updates_per_second=0)
    v2 = WebViewer(ocean2, width=64, height=36)
    v2.restore(snap)
    np.testing.assert_allclose(v2.camera.position, v.camera.position)
    assert v2.camera.fov_deg == 95.0
    assert v2._spray.clock == pytest.approx(v._spray.clock)
    np.testing.assert_array_equal(np.asarray(v2._spray._state.cycle),
                                  np.asarray(v._spray._state.cycle))
    # the restored ocean advances from the checkpointed sim time
    t_before = float(np.asarray(ocean2.state.time).max())
    assert t_before == pytest.approx(float(np.asarray(ocean.state.time).max()))


# --- K-frame dispatch batching (make_batched_step) --------------------------
# The viewer's relay-bound loop batches K sim+render ticks into ONE jitted
# program (docs/PERF.md "viewer loop round 5"); semantics must match K
# sequential Ocean.update(dt) ticks with a spray advance + render each.


def _seq_frames(k, dt, pose, spray_on):
    from godotoceanwaves_tpu import Ocean
    from godotoceanwaves_tpu.models.viewport import SpraySession
    ocean = Ocean(map_size=64, updates_per_second=0)
    r = SceneRenderer(64, 36, flat=True, transfer="rgb")
    spray = SpraySession(num_particles=256) if spray_on else None
    frames = []
    for _ in range(k):
        maps = ocean.update(dt)
        scales = ocean.params.map_scales()
        attrs = spray.advance(maps, scales, dt) if spray_on else None
        frames.append(np.asarray(r.render(
            maps, scales, ocean.water_color, ocean.foam_color,
            pose[0], pose[1], pose[2], fov=pose[3], spray_attrs=attrs)))
    return ocean, spray, np.stack(frames)


@pytest.mark.parametrize("spray_on", [False, True])
def test_batched_step_matches_sequential_loop(spray_on):
    from godotoceanwaves_tpu import Ocean
    from godotoceanwaves_tpu.models.viewport import (SpraySession,
                                                     make_batched_step)
    k, dt = 3, 1 / 30
    pose = (np.array([0.0, 10.0, 0.0], np.float32), -20.0, 15.0, 70.0)

    ocean_s, spray_s, seq = _seq_frames(k, dt, pose, spray_on)

    ocean = Ocean(map_size=64, updates_per_second=0)
    r = SceneRenderer(64, 36, flat=True, transfer="rgb")
    if spray_on:
        session = SpraySession(num_particles=256)
        spray_params, spray_state = session.ensure_init()
    else:
        spray_params, spray_state = None, None
    fn = make_batched_step(r, ocean.config, spray_params, k)
    state, spray_state, frames, last = fn(
        ocean.state, ocean.params, spray_state, np.float32(0.0),
        ocean.water_color, ocean.foam_color,
        pose[0], np.float32(pose[1]), np.float32(pose[2]),
        np.float32(pose[3]), np.float32(dt))

    frames = np.asarray(frames)
    assert frames.shape == (k, 36, 64, 3) and frames.dtype == np.uint8
    # same math, different XLA program boundaries: allow the uint8 quantize
    # to flip by 1 on a handful of boundary pixels, nothing more
    diff = np.abs(frames.astype(np.int16) - seq.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999

    # carried recurrences line up with the sequential loop
    np.testing.assert_allclose(np.asarray(state.foam),
                               np.asarray(ocean_s.state.foam),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.time),
                               np.asarray(ocean_s.state.time),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(last.displacement),
                               np.asarray(ocean_s.maps.displacement),
                               rtol=0, atol=1e-4)
    if spray_on:
        np.testing.assert_allclose(np.asarray(spray_state.start_time),
                                   np.asarray(spray_s._state.start_time),
                                   rtol=0, atol=1e-5)


def test_frame_pipeline_discard():
    """discard() drops the pending payload without publishing it (the
    viewer's mode/K transitions would otherwise serve a stale batch)."""
    from godotoceanwaves_tpu.models.viewport import FramePipeline
    p = FramePipeline()
    assert p.push(np.zeros((2, 2, 3), np.uint8)) is None
    p.discard()
    assert p.flush() is None
    # after a discard the next push starts a fresh in-flight frame
    assert p.push(np.ones((2, 2, 3), np.uint8)) is None
    out = p.flush()
    assert out is not None and out.max() == 1
