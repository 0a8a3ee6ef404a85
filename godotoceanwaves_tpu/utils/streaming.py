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
import jax


class MapStreamer:
    """Overlap device stepping with host transfers.

    >>> streamer = MapStreamer(lambda: ocean.update(dt))
    >>> for host_maps in streamer.stream(num_frames=100):
    ...     consume(host_maps["displacement"], host_maps["normal"])
    """

    def __init__(self, step_fn: Callable[[], object], max_inflight: int = 2):
        self._step = step_fn
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._max_inflight = max_inflight

    @staticmethod
    def _fetch(maps) -> dict[str, np.ndarray]:
        return {
            "displacement": np.asarray(maps.displacement.astype(jax.numpy.float32)),
            "normal": np.asarray(maps.normal.astype(jax.numpy.float32)),
        }

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
