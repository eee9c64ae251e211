"""Framed signal -> power/magnitude spectrum (references C5/C6).

Two interchangeable device paths, per BASELINE.json:north_star:

1. ``rfft``: batched XLA real FFT — the drop-in replacement for the
   reference's radix-2 OpenCL kernel. XLA lowers this to its own tuned TPU
   FFT; frames are zero-padded 400 -> n_fft implicitly by ``jnp.fft.rfft``.

2. ``gemm``: GEMM-native DFT — the real/imag parts computed as two MXU
   matmuls against precomputed [frame_length, n_bins] cos/sin matrices with
   the analysis window folded in. ~18x the FLOPs of an FFT but the pipeline
   is >3 orders of magnitude below the v5e compute roofline (SURVEY.md §6),
   and this form fuses into a single Pallas kernel with the mel/log/DCT
   stages (pallas/fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpufeat import matrices
from tpufeat.config import FeatureConfig

HIGHEST = jax.lax.Precision.HIGHEST


def power_spectrum_rfft(windowed: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """[..., frame_length] windowed frames -> [..., n_bins] spectrum."""
    spec = jnp.fft.rfft(windowed, n=cfg.n_fft, axis=-1)
    p = spec.real * spec.real + spec.imag * spec.imag
    return p if cfg.spectrum == "power" else jnp.sqrt(p)


def power_spectrum_gemm(raw_frames: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """[..., frame_length] RAW (conditioned, unwindowed) frames -> spectrum.

    The window is folded into the DFT matrices, so this consumes frames
    *before* the window multiply."""
    c, s = matrices.dft_matrices(cfg.frame_length, cfg.n_fft, cfg.window)
    c = jnp.asarray(c, raw_frames.dtype)
    s = jnp.asarray(s, raw_frames.dtype)
    re = jnp.dot(raw_frames, c, precision=HIGHEST)
    im = jnp.dot(raw_frames, s, precision=HIGHEST)
    p = re * re + im * im
    return p if cfg.spectrum == "power" else jnp.sqrt(p)
