"""models/viewport shared plumbing: FramePipeline fetch overlap semantics."""
import numpy as np
import jax.numpy as jnp

from godotoceanwaves_tpu.models.viewport import FramePipeline


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
