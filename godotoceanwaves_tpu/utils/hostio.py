"""Host<->device pytree transfer that tolerates backends without complex64 I/O.

The axon TPU PJRT backend (and some others) supports complex64 *compute*
(XLA decomposes it into real pairs) but not complex64 buffer transfers in
either direction. These helpers split complex leaves into (real, imag) float32
pairs on the producing side and recombine on the consuming side, so state
pytrees containing h0 spectra checkpoint/restore everywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


@jax.jit
def _combine(r, i):
    return jax.lax.complex(r, i)


def device_get_tree(tree):
    """Like jax.device_get, but routes complex leaves through fp32 pairs."""
    def leaf(x):
        if jnp.iscomplexobj(x):
            r, i = _split(x)
            return (np.asarray(r) + 1j * np.asarray(i)).astype(np.complex64)
        return np.asarray(x)
    return jax.tree.map(leaf, tree)


def device_put_tree(tree, device=None):
    """Like jax.device_put, but uploads complex leaves as fp32 pairs."""
    put = functools.partial(jax.device_put, device=device)

    def leaf(x):
        x = np.asarray(x)
        if np.iscomplexobj(x):
            return _combine(put(np.ascontiguousarray(x.real, np.float32)),
                            put(np.ascontiguousarray(x.imag, np.float32)))
        return put(x)
    return jax.tree.map(leaf, tree)
