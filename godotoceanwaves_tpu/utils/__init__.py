"""Utilities: host IO, timing, observability, clipmap, streaming."""
from .hostio import device_get_tree, device_put_tree
from .timing import time_chained
from .observability import FrameStats, StageTimer, panel
from .clipmap import build_clipmap, build_clipmap_numpy, snap_to_tile
from .streaming import MapStreamer
from .godot_rng import GodotRNG
from .profiling import profile_step, trace
from .live import LiveViewer

__all__ = [
    "device_get_tree", "device_put_tree", "time_chained",
    "FrameStats", "StageTimer", "panel",
    "build_clipmap", "build_clipmap_numpy", "snap_to_tile",
    "MapStreamer", "GodotRNG", "profile_step", "trace", "LiveViewer",
]
