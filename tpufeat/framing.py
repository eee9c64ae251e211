"""Pre-emphasis + overlapped framing as strided gathers (references C2/C3).

The OpenCL reference runs one work-item per output sample for pre-emphasis
and one per (frame, sample) for framing (SURVEY.md §3.1). The TPU-native
formulation is a single strided gather — ``idx = t*hop + j`` — which XLA
fuses with the surrounding elementwise stages into one kernel
(BASELINE.json:north_star: "strided-gather + elementwise stage").

Everything here is shape-static and mask-aware: batches are padded to a
common length ``N`` and carry a per-utterance ``lengths`` vector; valid
frames never read padding, so padding contents cannot affect the output
(property-tested in tests/test_extract_parity.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpufeat.config import FeatureConfig


def preemphasize(x: jnp.ndarray, alpha: float,
                 prev: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """y[t] = x[t] - alpha*x[t-1] along the last axis, x[-1] := prev.

    ``prev`` is 0 for one-shot extraction and the carried last raw sample in
    streaming mode (reference C2 / config 4)."""
    if alpha == 0.0:
        return x
    prev = jnp.asarray(prev, x.dtype)
    if prev.ndim == x.ndim - 1:       # per-stream scalar carry, e.g. [B]
        prev = prev[..., None]
    prev = jnp.broadcast_to(prev, x.shape[:-1] + (1,))
    shifted = jnp.concatenate([prev, x[..., :-1]], axis=-1)
    return x - alpha * shifted


def num_frames_dynamic(lengths: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Per-utterance valid frame count (traced version of cfg.num_frames)."""
    if cfg.center:
        n = 1 + lengths // cfg.hop_length
        return n - 1 if cfg.drop_last_frame else n
    return jnp.maximum(0, 1 + (lengths - cfg.frame_length) // cfg.hop_length)


def frame_signal(x: jnp.ndarray, lengths: jnp.ndarray,
                 cfg: FeatureConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather overlapped frames from a padded batch.

    Args:
      x: [B, N] padded signals (already pre-emphasized unless kaldi_mode).
      lengths: [B] true lengths.
    Returns:
      frames: [B, F_max, frame_length]
      frame_mask: [B, F_max] bool, True for valid frames.

    center=False: snip-edges, frame t reads samples [t*hop, t*hop+fl).
    center=True: Whisper/torch.stft convention — frame t starts at
    t*hop - n_fft//2 with reflect padding resolved *per utterance length*
    via index arithmetic (|p| below 0; 2L-2-p above L-1), so one static
    gather serves every length in the batch.
    """
    B, N = x.shape
    fl, hop = cfg.frame_length, cfg.hop_length
    F = cfg.num_frames(N)
    nf = num_frames_dynamic(lengths, cfg)
    mask = jnp.arange(F)[None, :] < nf[:, None]
    if F == 0:
        return jnp.zeros((B, 0, fl), x.dtype), mask

    pos = (np.arange(F).reshape(-1, 1) * hop
           + np.arange(fl).reshape(1, -1))          # [F, fl] static
    if cfg.center:
        pos = pos - cfg.n_fft // 2                   # may be negative
        p = jnp.asarray(pos)[None]                   # [1, F, fl]
        L = lengths[:, None, None]
        p = jnp.abs(p)                               # left reflect
        p = jnp.where(p > L - 1, 2 * (L - 1) - p, p)  # right reflect
        idx = jnp.clip(p, 0, N - 1)                  # guard degenerate L
        frames = jnp.take_along_axis(
            x[:, None, :], idx.reshape(B, F * fl)[:, None, :], axis=-1
        ).reshape(B, F, fl)
    else:
        frames = jnp.take(x, jnp.asarray(pos), axis=-1)  # [B, F, fl]
    return frames, mask


def condition_frames(frames: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Per-frame conditioning, *before* the window multiply (reference C2).

    kaldi_mode applies Kaldi's frame-local order: DC-offset removal, then
    in-frame pre-emphasis with x[-1] := x[0]. (The window itself is applied
    by the caller — or folded into the GEMM-DFT matrices.) Dither is
    intentionally not applied on the accelerator path (it would break golden
    parity); the golden/CPU path owns it when enabled.
    """
    if cfg.kaldi_mode:
        if cfg.dc_offset:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if cfg.preemphasis:
            first = frames[..., :1] * (1.0 - cfg.preemphasis)
            rest = frames[..., 1:] - cfg.preemphasis * frames[..., :-1]
            frames = jnp.concatenate([first, rest], axis=-1)
    return frames
