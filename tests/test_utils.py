"""Utility-layer tests: clipmap (native vs twin), timing, observability, RNG."""
import numpy as np

from godotoceanwaves_tpu.utils import clipmap, observability
from godotoceanwaves_tpu.utils.godot_rng import GodotRNG


def test_clipmap_native_matches_numpy_twin():
    v_n, i_n = clipmap.build_clipmap(levels=3, center_res=16, ring_cells=4,
                                     extent=512.0, prefer_native=True)
    v_p, i_p = clipmap.build_clipmap_numpy(levels=3, center_res=16, ring_cells=4,
                                           extent=512.0)
    np.testing.assert_allclose(v_n, v_p, rtol=1e-6)
    np.testing.assert_array_equal(i_n, i_p)


def test_clipmap_geometry_properties():
    v, idx = clipmap.build_clipmap_numpy(levels=4, center_res=64, ring_cells=16,
                                         extent=512.0)
    # spans the advertised extent, symmetric, center densest
    assert abs(v[:, 0].max() - 256.0) < 1e-3 and abs(v[:, 0].min() + 256.0) < 1e-3
    xs = np.unique(v[:, 0])
    steps = np.diff(xs)
    mid = len(steps) // 2
    assert steps[mid] < steps[0]              # finer at center than at edge
    assert np.allclose(xs, -xs[::-1], atol=1e-5)
    assert idx.max() == len(v) - 1            # all verts referenced-range valid
    # every triangle has nonzero area
    p = v[idx]
    area = np.abs((p[:, 1, 0]-p[:, 0, 0])*(p[:, 2, 1]-p[:, 0, 1])
                  - (p[:, 2, 0]-p[:, 0, 0])*(p[:, 1, 1]-p[:, 0, 1]))
    assert (area > 0).all()


def test_snap_to_tile():
    np.testing.assert_allclose(clipmap.snap_to_tile([3.2, -1.7], 1.0), [4.0, -1.0])
    np.testing.assert_allclose(clipmap.snap_to_tile([3.2, -1.7], 4.0), [4.0, 0.0])


def test_frame_stats_and_panel():
    from godotoceanwaves_tpu import Ocean
    stats = observability.FrameStats()
    for _ in range(5):
        stats.record(0.01)
    s = stats.summary()
    assert abs(s["fps"] - 100.0) < 1.0
    ocean = Ocean(map_size=64)
    text = observability.panel(ocean, stats)
    assert "Cascade 1" in text and "wind_speed" in text and "FPS" in text


def test_stage_timer():
    import time
    t = observability.StageTimer()
    with t("x"):
        time.sleep(0.01)
    assert t.summary()["x"] >= 5.0  # ms


def test_godot_rng_is_pcg32():
    # pcg32 reference vector: state=42, inc=default -> well-defined stream
    rng = GodotRNG(1234)
    vals = [rng.randi() for _ in range(4)]
    assert all(0 <= v <= 0xFFFFFFFF for v in vals)
    assert len(set(vals)) == 4
    rng2 = GodotRNG(1234)
    assert [rng2.randi() for _ in range(4)] == vals  # deterministic
    r = GodotRNG(7)
    draws = [r.randi_range(-10000, 10000) for _ in range(100)]
    assert all(-10000 <= d <= 10000 for d in draws)


def test_audio_mix_law():
    from godotoceanwaves_tpu.utils import audio
    from godotoceanwaves_tpu.models import default_cascades
    # main.gd:39-44 endpoints
    assert audio.ambience_gains_db(0.0) == (-30.0, 5.0)
    assert audio.ambience_gains_db(15.0) == (15.0, -30.0)
    assert audio.ambience_gains_db(100.0) == (15.0, -30.0)  # clamped
    o, w = audio.ambience_gains(default_cascades())  # total wind = 35 -> clamped
    assert o > w
