"""Compute ops: the TPU re-expression of the reference's six GLSL kernels.

Stage map (reference file -> module):
  spectrum_compute.glsl  -> initial_state (+ spectra, rng, grid)
  spectrum_modulate.glsl -> modulate
  fft_butterfly/fft_compute/transpose.glsl -> fft (XLA / MXU-matmul tiers)
  fft_unpack.glsl        -> unpack
"""
from . import fft, grid, initial_state, modulate, rng, spectra, unpack

__all__ = ["fft", "grid", "initial_state", "modulate", "rng", "spectra", "unpack"]
