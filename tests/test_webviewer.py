"""Browser viewer: HTTP surface + runtime parameter editing end-to-end."""
import json
import time
import urllib.error
import urllib.request
import pytest

import numpy as np

from godotoceanwaves_tpu import Ocean
from godotoceanwaves_tpu.utils.webviewer import PARAM_RANGES, WebViewer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(port, body):
    req = urllib.request.Request(f"http://127.0.0.1:{port}/set",
                                 data=json.dumps(body).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status


@pytest.mark.slow
def test_webviewer_serves_and_edits_parameters():
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    port = viewer.start(port=0)   # ephemeral
    try:
        status, ctype, page = _get(port, "/")
        assert status == 200 and "text/html" in ctype
        for name in PARAM_RANGES:
            assert name.encode() not in b"" and name in json.dumps(PARAM_RANGES)
        assert b"ocean panel" in page

        status, _, body = _get(port, "/state")
        state = json.loads(body)
        assert len(state["cascades"]) == 3 and state["map_size"] == 64
        assert set(state["cascades"][0]) == set(PARAM_RANGES)

        # edit wind speed on cascade 1 through the HTTP surface
        assert _post(port, {"cascade": 1, "name": "wind_speed",
                            "value": 33.0}) == 200
        assert float(np.asarray(ocean.params.wind_speed)[1]) == 33.0
        # spectrum-affecting edit marks the cascade dirty (gd setter semantics)
        assert ocean._dirty[1] and not ocean._dirty[0]

        # update-rate + frame production
        assert _post(port, {"name": "updates_per_second", "value": 24.0}) == 200
        assert ocean.updates_per_second == 24.0

        deadline = time.time() + 60
        while time.time() < deadline:
            status, ctype, png = _get(port, "/frame.png")
            assert status == 200 and ctype in ("image/jpeg", "image/png")
            state = json.loads(_get(port, "/state")[2])
            if state["frame"] >= 2:
                break
            time.sleep(0.2)
        assert state["frame"] >= 2, "sim thread produced no frames"
        if ctype == "image/png":
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
        else:                       # JPEG SOI marker (10x smaller on the wire)
            assert png[:2] == b"\xff\xd8"

        # global color pickers (water.gd:14-18; sRGB in -> linear stored)
        assert _post(port, {"name": "water_color", "value": [1.0, 0.5, 0.0]}) == 200
        state = json.loads(_get(port, "/state")[2])
        np.testing.assert_allclose(state["water_color"],
                                   np.array([1.0, 0.5, 0.0]) ** 2.2, atol=1e-5)

        # runtime cascade add/remove through the panel (water.gd:22-35)
        assert _post(port, {"name": "num_cascades", "value": 4}) == 200
        assert ocean.num_cascades == 4
        state = json.loads(_get(port, "/state")[2])
        assert len(state["cascades"]) == 4
        assert _post(port, {"name": "num_cascades", "value": 2}) == 200
        assert ocean.num_cascades == 2

        # bad requests are client errors, not crashes
        try:
            _post(port, {"name": "nope", "value": 1})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        viewer.stop()


@pytest.mark.slow
def test_webviewer_fly_camera_and_spray():
    """The browser surface drives the reference's fly camera (camera.gd:15-47)
    and the spray system (main.tscn:133-140) through POST /set."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36,
                       spray=False, spray_particles=256)
    port = viewer.start(port=0)
    try:
        state = json.loads(_get(port, "/state")[2])
        assert state["mesh_quality"] == "low" and state["spray"] is False
        pos0 = np.asarray(state["camera"])
        yaw0, pitch0 = viewer.camera.yaw, viewer.camera.pitch

        # pointer-drag look: yaw/pitch move with the camera.gd sensitivity
        assert _post(port, {"name": "camera_look", "value": [40, -20]}) == 200
        assert viewer.camera.yaw == yaw0 - 40 * 0.005
        assert viewer.camera.pitch == pitch0 + 20 * 0.005

        # WASD move in the look frame; wheel speed scaling
        assert _post(port, {"name": "camera_move",
                            "value": [1, 0, 0, 0, 0.5]}) == 200
        state = json.loads(_get(port, "/state")[2])
        moved = np.asarray(state["camera"])
        assert np.linalg.norm(moved - pos0) > 1.0
        speed0 = viewer.camera.speed
        assert _post(port, {"name": "camera_speed", "value": 2}) == 200
        assert viewer.camera.speed > speed0

        # spray toggle: state machine advances in the sim loop
        assert _post(port, {"name": "spray", "value": True}) == 200
        deadline = time.time() + 60
        frames0 = json.loads(_get(port, "/state")[2])["frame"]
        while time.time() < deadline:
            s = json.loads(_get(port, "/state")[2])
            if s["frame"] >= frames0 + 2 and viewer._spray.started:
                break
            time.sleep(0.2)
        assert viewer._spray.started, "spray never advanced"
        assert s["spray"] is True

        # mesh quality switch rebuilds the renderer
        assert _post(port, {"name": "mesh_quality", "value": "high"}) == 200
        assert json.loads(_get(port, "/state")[2])["mesh_quality"] == "high"
    finally:
        viewer.stop()


@pytest.mark.slow
def test_webviewer_frames_track_camera_motion():
    """Flying the camera must change the served frame (the pose rides as
    traced args into the jitted renderer, not baked constants)."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    port = viewer.start(port=0)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] >= 2:
                break
            time.sleep(0.2)
        frame_a = _get(port, "/frame.png")[2]
        f0 = json.loads(_get(port, "/state")[2])["frame"]
        # big look + move so the view genuinely changes
        assert _post(port, {"name": "camera_look", "value": [400, -120]}) == 200
        assert _post(port, {"name": "camera_move",
                            "value": [1, 0, 1, 1, 1.0]}) == 200
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] >= f0 + 2:
                break
            time.sleep(0.2)
        frame_b = _get(port, "/frame.png")[2]
        assert frame_a != frame_b
    finally:
        viewer.stop()


@pytest.mark.slow
def test_webviewer_serves_wind_mixed_ambience():
    """The browser surface carries the reference's ambience (main.gd:39-44):
    seamless loop endpoints + the wind-speed dB mix law in /state."""
    import io
    import wave

    from godotoceanwaves_tpu.utils.audio import ambience_gains_db

    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    port = viewer.start(port=0)
    try:
        for which in ("ocean", "wind"):
            status, ctype, body = _get(port, f"/ambience/{which}.wav")
            assert status == 200 and ctype == "audio/wav"
            with wave.open(io.BytesIO(body)) as w:
                assert w.getnchannels() == 1 and w.getsampwidth() == 2
                assert w.getnframes() == w.getframerate() * 8  # 8 s loop
        # second fetch serves the cached bytes (identical synthesis)
        assert _get(port, "/ambience/ocean.wav")[2] == \
            _get(port, "/ambience/ocean.wav")[2]

        # the page wires the loops + toggle
        page = _get(port, "/")[2]
        assert b"/ambience/ocean.wav" in page and b"aud_w" in page

        # /state carries the dB law for the LIVE stack and tracks edits
        state = json.loads(_get(port, "/state")[2])
        total = sum(c["wind_speed"] for c in state["cascades"])
        np.testing.assert_allclose(state["ambience_db"],
                                   ambience_gains_db(total), atol=1e-6)
        assert _post(port, {"cascade": 0, "name": "wind_speed",
                            "value": 0.0}) == 200
        assert _post(port, {"cascade": 1, "name": "wind_speed",
                            "value": 0.0}) == 200
        assert _post(port, {"cascade": 2, "name": "wind_speed",
                            "value": 3.0}) == 200
        state = json.loads(_get(port, "/state")[2])
        # setter clamps keep zeroed winds at a tiny epsilon -> ~3.0 total
        np.testing.assert_allclose(state["ambience_db"],
                                   ambience_gains_db(3.0), atol=0.01)
        # low wind: quiet ocean rumble, loud wind whistle (main.gd:42-43)
        assert state["ambience_db"][0] < state["ambience_db"][1]
    finally:
        viewer.stop()


@pytest.mark.slow
def test_webviewer_page_script_sane():
    """The panel page is a %%-formatted template edited by hand; a stray
    format token or an unbalanced brace silently breaks ALL panel JS in
    the browser (nothing in the Python suite would notice). Pin the
    delimiter balance and the presence of each interactive subsystem."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    port = viewer.start(port=0)
    try:
        page = _get(port, "/")[2].decode()
        # template fully resolved: no leftover %(name)s tokens
        assert "%(" not in page
        script = page.split("<script>")[1].split("</script>")[0]
        for op, cl in ("{}", "()", "[]"):
            assert script.count(op) == script.count(cl), f"unbalanced {op}{cl}"
        # each interactive subsystem's handler is wired
        for marker in ("applyAudioGains", "revokeObjectURL",
                       "requestFullscreen", "camera_look", "camera_move",
                       "frameLoop", "rebuildParams"):
            assert marker in script, marker
    finally:
        viewer.stop()


def test_webviewer_state_warming_stub_never_blocks():
    """/state must answer while the sim thread holds the ocean lock for a
    cold first compile (observed: a probe's 10 s HTTP timeout starved the
    panel before the first frame, scripts/probe_webviewer.py). With no
    cached snapshot and the lock held, _state returns a host-only warming
    stub quickly instead of blocking behind the device step."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    # Simulate the cold-start race without starting the sim thread.
    assert viewer._state_cache is None
    with viewer._ocean_lock:
        t0 = time.time()
        state = viewer._state()
        took = time.time() - t0
    assert state.get("warming") is True
    assert took < 10.0
    # Every key the page script and the probe touch is present.
    for key in ("cascades", "map_size", "resolutions", "updates_per_second",
                "water_color", "foam_color", "fps", "ms_frame", "frame",
                "camera", "camera_speed", "spray", "mesh_quality",
                "ambience_db"):
        assert key in state, key
    assert state["cascades"] == [] and state["frame"] == 0
    # Once the lock frees, the same call produces (and caches) a real snapshot.
    state = viewer._state()
    assert "warming" not in state and len(state["cascades"]) == 3
    assert viewer._state_cache is not None


@pytest.mark.slow
def test_webviewer_async_resize_keeps_serving(monkeypatch):
    """A map_size change must not stall the panel behind the new shape's
    first compile (30-300 s on the real TPU): the resize warms in a
    background thread (fake slow compile here) while old-size frames keep
    serving, then swaps. Reference bar: the ImGui resolution combo swaps
    live (main.gd:66-70)."""
    from godotoceanwaves_tpu.utils import webviewer as wv

    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)

    import threading
    warm_started = threading.Event()
    warm_release = threading.Event()
    real_warm = WebViewer._warm_one_size

    def slow_warm(self, new_size):
        warm_started.set()
        assert warm_release.wait(60), "test never released the fake compile"
        real_warm(self, new_size)

    monkeypatch.setattr(WebViewer, "_warm_one_size", slow_warm)
    port = viewer.start(port=0)
    try:
        # wait for first frames at the old size
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] >= 2:
                break
            time.sleep(0.1)

        assert _post(port, {"name": "map_size", "value": 128}) == 200
        assert warm_started.wait(30), "background warm never started"

        # while the fake compile blocks: panel responsive, old size serving
        f0 = json.loads(_get(port, "/state")[2])["frame"]
        t0 = time.time()
        state = json.loads(_get(port, "/state")[2])
        assert time.time() - t0 < 5.0
        assert state["map_size"] == 64 and state["resizing"] is True
        deadline = time.time() + 30
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state["frame"] > f0 + 1:
                break
            time.sleep(0.1)
        assert state["frame"] > f0 + 1, "frames stalled during resize warm"

        warm_release.set()
        deadline = time.time() + 120
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state["map_size"] == 128 and not state["resizing"]:
                break
            time.sleep(0.2)
        assert state["map_size"] == 128 and state["resizing"] is False
        assert ocean.config.map_size == 128
        # and frames keep coming at the new size
        f1 = state["frame"]
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] > f1:
                break
            time.sleep(0.1)
        assert json.loads(_get(port, "/state")[2])["frame"] > f1
    finally:
        warm_release.set()
        viewer.stop()


@pytest.mark.slow
def test_webviewer_render_tier_switch_async():
    """The panel's render-tier combo (models/viewport.RENDER_TIERS) swaps
    the jitted renderer asynchronously: frames keep serving while the new
    tier warms, /state tracks render_tier, and an unknown tier 400s."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=66, height=36)
    assert viewer.render_tier == "interactive"
    port = viewer.start(port=0)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] >= 2:
                break
            time.sleep(0.1)
        try:
            code = _post(port, {"name": "render_tier", "value": "nope"})
        except urllib.error.HTTPError as e:
            code = e.code
        assert code >= 400
        f0 = json.loads(_get(port, "/state")[2])["frame"]
        assert _post(port, {"name": "render_tier",
                            "value": "performance"}) == 200
        deadline = time.time() + 120
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state["render_tier"] == "performance" and not state["retiering"]:
                break
            time.sleep(0.2)
        assert state["render_tier"] == "performance"
        assert state["retiering"] is False
        # frames kept coming / keep coming on the new tier
        deadline = time.time() + 60
        while time.time() < deadline:
            f1 = json.loads(_get(port, "/state")[2])["frame"]
            if f1 > f0 + 1:
                break
            time.sleep(0.1)
        assert f1 > f0 + 1
    finally:
        viewer.stop()


def test_webviewer_concurrent_resize_and_tier_serialize(monkeypatch):
    """A tier switch posted while a resize warm is in flight must be
    processed AFTER the resize by the single reconfiguration worker (the
    round-4 hardware soak caught the two-thread interleaving: a tier
    renderer warmed against the pre-resize map size stalled the serving
    loop behind an in-loop retrace)."""
    import threading

    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)

    warm_started = threading.Event()
    warm_release = threading.Event()
    real_warm = WebViewer._warm_one_size
    sizes_seen = []
    tiers_warmed = []

    def slow_warm(self, new_size):
        warm_started.set()
        assert warm_release.wait(60)
        sizes_seen.append(new_size)
        real_warm(self, new_size)

    real_tier_warm = WebViewer._warm_one_tier

    def spy_tier_warm(self, tier, scale=None, aa=None):
        # must run AFTER the resize landed (serialized worker)
        tiers_warmed.append((tier, self.ocean.config.map_size))
        real_tier_warm(self, tier, scale, aa)

    monkeypatch.setattr(WebViewer, "_warm_one_size", slow_warm)
    monkeypatch.setattr(WebViewer, "_warm_one_tier", spy_tier_warm)
    port = viewer.start(port=0)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] >= 2:
                break
            time.sleep(0.1)
        assert _post(port, {"name": "map_size", "value": 128}) == 200
        assert warm_started.wait(30)
        # tier request lands while the resize warm is blocked
        assert _post(port, {"name": "render_tier",
                            "value": "performance"}) == 200
        state = json.loads(_get(port, "/state")[2])
        assert state["resizing"] is True and state["retiering"] is True
        warm_release.set()
        deadline = time.time() + 180
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if (state["map_size"] == 128
                    and state["render_tier"] == "performance"
                    and not state["resizing"] and not state["retiering"]):
                break
            time.sleep(0.2)
        assert state["map_size"] == 128
        assert state["render_tier"] == "performance"
        assert sizes_seen == [128]
        # the tier warm observed the POST-resize config (the bug was 64)
        assert tiers_warmed and tiers_warmed[0] == ("performance", 128)
        # and frames keep coming on the combined new configuration
        f0 = state["frame"]
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] > f0:
                break
            time.sleep(0.1)
        assert json.loads(_get(port, "/state")[2])["frame"] > f0
    finally:
        warm_release.set()
        viewer.stop()


def test_webviewer_combined_size_and_tier_warm_swaps_atomically():
    """_warm_size_and_tier (the worker's both-pending branch) compiles ONE
    renderer at the new size and swaps size+tier together."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    vp0 = viewer._viewport
    viewer._warm_size_and_tier(128, "performance")
    assert ocean.config.map_size == 128
    assert viewer.render_tier == "performance"
    assert viewer._viewport is not vp0
    # the swapped state serves: one render on the live config works
    maps = ocean.update(1 / 30)
    scales = ocean.params.map_scales()
    img = np.asarray(viewer._viewport.render(
        maps, scales, np.zeros(3, np.float32), np.ones(3, np.float32),
        np.array([0.0, 9.0, 0.0], np.float32), -14.0, 0.0))
    assert np.isfinite(img.astype(np.float32)).all()

def test_webviewer_fov_control():
    """The reference panel's FOV slider (20-170, main.gd:113-114): /set fov
    updates the traced render arg, /state reports it next to the camera
    position/pitch/yaw readout, and out-of-range values clamp."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, width=64, height=36)
    st = viewer._state()
    assert st["fov"] == 70.0
    assert len(st["camera"]) == 3
    assert "camera_pitch" in st and "camera_yaw" in st
    viewer._apply({"name": "fov", "value": 110.0})
    assert viewer.camera.fov_deg == 110.0
    assert viewer._state()["fov"] == 110.0
    viewer._apply({"name": "fov", "value": 500.0})    # clamps (main.gd range)
    assert viewer.camera.fov_deg == 170.0
    viewer._apply({"name": "fov", "value": 3.0})
    assert viewer.camera.fov_deg == 20.0
    # the traced arg reaches the renderer: wider fov shows more sky at a
    # horizon-facing pose (render through the actual viewer pipeline)
    pos, pitch, yaw, fov = viewer._camera_args()
    assert float(fov) == 20.0
    maps = ocean.update(1 / 30)
    scales = ocean.params.map_scales()
    wc = np.asarray(ocean.water_color, np.float32)
    fc = np.asarray(ocean.foam_color, np.float32)
    narrow = np.asarray(viewer._viewport.render(
        maps, scales, wc, fc, pos, pitch, yaw, fov=20.0))
    wide = np.asarray(viewer._viewport.render(
        maps, scales, wc, fc, pos, pitch, yaw, fov=150.0))
    assert narrow.shape == wide.shape
    assert np.abs(narrow.astype(np.int32) - wide.astype(np.int32)).mean() > 1.0
    # the fov slider is in the served panel page
    from godotoceanwaves_tpu.utils.webviewer import _PAGE
    assert 'id="fov"' in _PAGE


def test_webviewer_constructor_validates_render_scale():
    """The constructor accepts exactly the scales the panel combo offers —
    /state's reported scale always matches what actually renders (an
    out-of-combo scale like 5, or any scale with flat=True, is a loud
    error, not a silently divergent report)."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    with pytest.raises(ValueError, match="render_scale=5"):
        WebViewer(ocean, width=60, height=30, render_scale=5)
    with pytest.raises(ValueError, match="flat=True"):
        WebViewer(ocean, width=64, height=36, flat=True, render_scale=2)
    # valid combo values still construct
    v = WebViewer(ocean, width=64, height=36, render_scale=2)
    assert v.render_scale == 2
    assert v._viewport.render_kwargs.get("render_scale") == 2


@pytest.mark.slow
def test_webviewer_render_scale_switch_async():
    """The panel's render-scale combo (dynamic resolution): /state lists
    only divisors of the output size, an invalid scale 400s, a valid one
    swaps through the async reconfiguration worker with frames serving
    throughout, and a no-op repost clears the busy flag (regression: the
    worker nulls a same-value scale, which must not strand `retiering`)."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    assert viewer.render_scale == 1
    port = viewer.start(port=0)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state["frame"] >= 2:
                break
            time.sleep(0.1)
        # 3 does not divide 64: offered scales are the divisors only
        assert state["render_scales"] == [1, 2, 4]
        try:
            code = _post(port, {"name": "render_scale", "value": 3})
        except urllib.error.HTTPError as e:
            code = e.code
        assert code >= 400
        f0 = state["frame"]
        assert _post(port, {"name": "render_scale", "value": 2}) == 200
        deadline = time.time() + 120
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state["render_scale"] == 2 and not state["retiering"]:
                break
            time.sleep(0.2)
        assert state["render_scale"] == 2 and state["retiering"] is False
        assert viewer._viewport.render_kwargs.get("render_scale") == 2
        # frames keep coming at the new internal resolution
        deadline = time.time() + 60
        while time.time() < deadline:
            f1 = json.loads(_get(port, "/state")[2])["frame"]
            if f1 > f0 + 1:
                break
            time.sleep(0.1)
        assert f1 > f0 + 1
        # no-op repost: worker must clear the busy flag, not strand it
        assert _post(port, {"name": "render_scale", "value": 2}) == 200
        deadline = time.time() + 30
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if not state["retiering"]:
                break
            time.sleep(0.1)
        assert state["retiering"] is False
        assert viewer.render_scale == 2
    finally:
        viewer.stop()


def test_webviewer_frame_batch_validation():
    ocean = Ocean(map_size=64, updates_per_second=0)
    for bad in (0, 9, 2.0, -1):
        with pytest.raises(ValueError):
            WebViewer(ocean, width=64, height=36, frame_batch=bad)
    # the /set panel edit path (host-side, no server needed) enforces the
    # SAME type rule as the constructor (2.7 must not truncate to 2)
    viewer = WebViewer(ocean, width=64, height=36)
    viewer._apply({"name": "frame_batch", "value": 4})
    assert viewer.frame_batch == 4
    for bad in (12, 0, 2.7, 2.0, True):
        with pytest.raises(KeyError):
            viewer._apply({"name": "frame_batch", "value": bad})
    assert viewer.frame_batch == 4


@pytest.mark.slow
def test_webviewer_frame_batch_serves_and_falls_back():
    """frame_batch=3 serves K-at-a-time batches; setting a nonzero update
    rate flips the loop back to single-frame dispatches live."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=60.0, width=64, height=36, spray=True,
                       frame_batch=3)
    port = viewer.start(port=0)
    try:
        deadline = time.time() + 120
        state = {}
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state.get("frame", 0) >= 6:
                break
            time.sleep(0.5)
        assert state["frame"] >= 6
        assert state["frame_batch"] == 3
        status, ctype, _ = _get(port, "/frame.png")
        assert status == 200 and ctype in ("image/jpeg", "image/png")
        # sim time advanced in K-sized steps under ups==0 semantics
        assert ocean._time > 0

        # nonzero update rate -> batched mode ineligible; frames keep coming
        assert _post(port, {"name": "updates_per_second", "value": 24.0}) == 200
        f0 = json.loads(_get(port, "/state")[2])["frame"]
        deadline = time.time() + 60
        while time.time() < deadline:
            if json.loads(_get(port, "/state")[2])["frame"] > f0 + 2:
                break
            time.sleep(0.5)
        assert json.loads(_get(port, "/state")[2])["frame"] > f0 + 2
    finally:
        viewer.stop()


def test_webviewer_specular_aa_validation():
    """Constructor: flat viewers reject specular_aa loudly (the flat path
    has no shade() screen structure); geometry viewers carry it into the
    renderer's kwargs so /state always matches what renders."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    with pytest.raises(ValueError, match="flat"):
        WebViewer(ocean, width=64, height=36, flat=True, specular_aa=True)
    v = WebViewer(ocean, width=64, height=36, specular_aa=True)
    assert v.specular_aa is True
    assert v._viewport.render_kwargs.get("specular_aa") is True
    # the /set edit on a flat viewer 400s (KeyError), host-side
    vf = WebViewer(ocean, width=64, height=36, flat=True)
    with pytest.raises(KeyError):
        vf._apply({"name": "specular_aa", "value": True})


@pytest.mark.slow
def test_webviewer_specular_aa_switch_async():
    """The panel's specular-AA toggle swaps through the single async
    reconfiguration worker (a shade-kwarg change retraces the render):
    /state flips, the live renderer carries the kwarg, frames keep
    serving, and toggling back rebuilds the plain renderer."""
    ocean = Ocean(map_size=64, updates_per_second=0)
    viewer = WebViewer(ocean, fps=30.0, width=64, height=36)
    assert viewer.specular_aa is False
    port = viewer.start(port=0)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state.get("frame", 0) >= 2:
                break
            time.sleep(0.1)
        f0 = state["frame"]
        assert _post(port, {"name": "specular_aa", "value": True}) == 200
        deadline = time.time() + 120
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if state["specular_aa"] and not state["retiering"]:
                break
            time.sleep(0.2)
        assert state["specular_aa"] is True and state["retiering"] is False
        assert viewer._viewport.render_kwargs.get("specular_aa") is True
        deadline = time.time() + 60
        while time.time() < deadline:
            f1 = json.loads(_get(port, "/state")[2])["frame"]
            if f1 > f0 + 1:
                break
            time.sleep(0.1)
        assert f1 > f0 + 1
        assert _post(port, {"name": "specular_aa", "value": False}) == 200
        deadline = time.time() + 120
        while time.time() < deadline:
            state = json.loads(_get(port, "/state")[2])
            if not state["specular_aa"] and not state["retiering"]:
                break
            time.sleep(0.2)
        assert state["specular_aa"] is False
        assert "specular_aa" not in viewer._viewport.render_kwargs
    finally:
        viewer.stop()
