"""Host streaming of generated maps (BASELINE config 5).

The reference never reads maps back (textures feed the render pipeline
directly; its async-readback experiment failed on transfer overhead,
README.md:83-85). On TPU the consumers may live host-side (encoders, disk,
downstream pipelines), so this provides double-buffered device->host map
streaming: the device computes step k+1 while step k's maps transfer.

Transfers use plain np.asarray on fp32/bf16 planes (no complex — see
utils/hostio.py for the backend constraint).
"""
from __future__ import annotations

import concurrent.futures
import queue
from typing import Callable, Iterator

import numpy as np


class MapStreamer:
    """Overlap device stepping with host transfers.

    >>> streamer = MapStreamer(lambda: ocean.update(dt))
    >>> for host_maps in streamer.stream(num_frames=100):
    ...     consume(host_maps["displacement"], host_maps["normal"])
    """

    def __init__(self, step_fn: Callable[[], object], max_inflight: int = 2,
                 host_dtype=np.float32):
        """host_dtype: dtype the yielded arrays are converted to HOST-SIDE,
        after the transfer (default np.float32, the historical contract —
        safe for PIL/cv2/encoders). Pass None to keep the maps' native dtype
        (bf16 arrives as ml_dtypes.bfloat16). Either way the device->host
        copy itself always moves the native dtype — upcasting before the
        copy would double the bytes over the link for bf16 maps."""
        self._step = step_fn
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._max_inflight = max_inflight
        self._host_dtype = host_dtype

    def _fetch(self, maps) -> dict[str, np.ndarray]:
        def get(x) -> np.ndarray:
            a = np.asarray(x)  # native dtype (bf16 arrives via ml_dtypes)
            return a.astype(self._host_dtype) if self._host_dtype is not None else a
        return {"displacement": get(maps.displacement),
                "normal": get(maps.normal)}

    def stream(self, num_frames: int) -> Iterator[dict[str, np.ndarray]]:
        inflight: queue.Queue = queue.Queue()
        produced = 0
        while produced < num_frames or not inflight.empty():
            while produced < num_frames and inflight.qsize() < self._max_inflight:
                maps = self._step()
                if maps is None:        # rate-limiter skipped this frame
                    continue
                inflight.put(self._pool.submit(self._fetch, maps))
                produced += 1
            if not inflight.empty():
                yield inflight.get().result()

    def close(self) -> None:
        self._pool.shutdown(wait=True)
