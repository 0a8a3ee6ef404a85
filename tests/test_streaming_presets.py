"""Config-5 capabilities: dual wind+swell spectra + host map streaming."""
import numpy as np

from godotoceanwaves_tpu import Ocean
from godotoceanwaves_tpu.models import dual_wind_swell_cascades
from godotoceanwaves_tpu.utils import MapStreamer

N = 64


def test_dual_wind_swell_preset():
    params = dual_wind_swell_cascades()
    assert params.num_cascades == 2
    ocean = Ocean(params=params, map_size=N, updates_per_second=0)
    for _ in range(5):
        maps = ocean.update(0.05)
    d = np.asarray(maps.displacement)
    assert np.isfinite(d).all()
    # swell cascade (long 256 m tile) should carry longer/larger heave than chop
    assert d[1, 1].std() > 0.0 and d[0, 1].std() > 0.0


def test_map_streamer_overlaps_and_preserves_order():
    ocean = Ocean(map_size=N, updates_per_second=0)
    heights = []
    streamer = MapStreamer(lambda: ocean.update(0.1))
    for host in streamer.stream(num_frames=4):
        assert host["displacement"].shape == (3, 3, N, N)
        assert host["normal"].dtype == np.float32
        heights.append(host["displacement"][0, 1].std())
    streamer.close()
    assert len(heights) == 4
    # frames are distinct sim steps (time advanced between them)
    assert len({round(h, 6) for h in heights}) > 1


def test_map_streamer_native_dtype_and_host_conversion():
    """Transfers move the maps' native dtype (half the bytes for bf16); the
    yielded arrays default to fp32 (historical contract), host_dtype=None
    keeps the native dtype."""
    import ml_dtypes

    ocean = Ocean(map_size=N, updates_per_second=0, map_dtype="bfloat16")
    streamer = MapStreamer(lambda: ocean.update(0.1))  # default: fp32 out
    host = next(iter(streamer.stream(num_frames=1)))
    streamer.close()
    assert host["displacement"].dtype == np.float32
    assert np.isfinite(host["displacement"]).all()

    streamer = MapStreamer(lambda: ocean.update(0.1), host_dtype=None)
    host = next(iter(streamer.stream(num_frames=1)))
    streamer.close()
    assert host["displacement"].dtype == ml_dtypes.bfloat16


def test_map_streamer_handles_rate_limited_updates():
    ocean = Ocean(map_size=N, updates_per_second=10.0)
    streamer = MapStreamer(lambda: ocean.update(0.02))
    got = list(streamer.stream(num_frames=2))
    streamer.close()
    assert len(got) == 2  # skipped frames (None) are absorbed, not yielded
