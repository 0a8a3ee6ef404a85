"""Utilities: host IO, timing, observability."""
from .hostio import device_get_tree, device_put_tree

__all__ = ["device_get_tree", "device_put_tree"]
