"""Stateful streaming front-end (config 4 / reference C15).

BASELINE.json:configs[3]: "Streaming chunked front-end (160-sample hops,
stateful frame-overlap carry) for online ASR". The contract (SURVEY.md §2.1):
concatenating the per-chunk outputs equals the one-shot output **bit-for-bit**
— same dtype, same ops.

Design: state is a small pure pytree, every chunk step is one jit-compiled
call with static shapes, so the step composes with ``jax.lax.scan`` (long
audio at constant memory, SURVEY.md §5 "Long-context") and with ``vmap``/
sharding for many parallel streams.

Equivalence in practice: every frame sees exactly the same float32 inputs
through the same stage functions, and identical chunkings are bit-identical
(tested). Across *different* chunk shapes XLA may tile the FFT/matmul
reductions differently, so one-shot vs chunked agree to reduction-order
noise (~1e-6 abs, tested at 1e-5); genuine carry/off-by-one bugs would show
up as O(1) errors.

State invariants (per stream):
  - ``buf`` [CAP=frame_length-1]: *pre-emphasized* samples; the last ``fill``
    entries are the stream's unconsumed tail. After each step the leftover is
    always the tail of the concatenated work array, so the new buffer is a
    static slice — no rolls, no dynamic shapes.
  - ``prev_raw``: last raw input sample (pre-emphasis continuity, C2).
  - ``fill``: number of valid samples in ``buf``; in [0, CAP]. For
    hop-aligned chunks with >= frame_length total samples seen, steady-state
    fill is exactly frame_length - hop = 240.

Bitwise equivalence holds because pre-emphasis is elementwise (identical
arithmetic chunked or not) and each frame's spectro path sees exactly the
same 400 float32 inputs through the same compiled stage functions.

Streaming supports center=False configs with frame-local/causal post-
processing; whisper-log / deltas / CMVN need utterance-global information and
are rejected (use the one-shot path, or streaming_cmvn for running stats).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufeat import framing
from tpufeat.config import MFCC13_HTK, FeatureConfig
from tpufeat.features import spectro_pipeline


class StreamState(NamedTuple):
    buf: jnp.ndarray       # [B, frame_length-1] pre-emphasized carry
    fill: jnp.ndarray      # [B] int32 valid samples in buf (right-aligned)
    prev_raw: jnp.ndarray  # [B] last raw sample seen


def _check_streamable(cfg: FeatureConfig) -> None:
    if cfg.center:
        raise ValueError("streaming requires center=False (snip-edges)")
    if cfg.log == "whisper":
        raise ValueError("whisper log needs the utterance-global max; "
                         "use one-shot extract() or log='log10'")
    if cfg.deltas or cfg.cmvn != "none":
        raise ValueError("deltas/CMVN are utterance-global; compute them "
                         "offline or use streaming_cmvn running stats")
    if cfg.dither > 0:
        raise ValueError("dither is a training-time augmentation with no "
                         "cross-chunk PRNG state; disable it for streaming "
                         "(or add noise to the chunks yourself)")


def init_state(batch_size: int = 1,
               cfg: FeatureConfig = MFCC13_HTK,
               dtype=jnp.float32) -> StreamState:
    cap = cfg.frame_length - 1
    return StreamState(
        buf=jnp.zeros((batch_size, cap), dtype),
        fill=jnp.zeros((batch_size,), jnp.int32),
        prev_raw=jnp.zeros((batch_size,), dtype),
    )


def max_frames_per_chunk(chunk_len: int, cfg: FeatureConfig) -> int:
    """Static output capacity for a chunk of ``chunk_len`` samples."""
    cap = cfg.frame_length - 1
    return max(0, (cap + chunk_len - cfg.frame_length) // cfg.hop_length + 1)


def process_chunk(state: StreamState, chunk: jnp.ndarray,
                  cfg: FeatureConfig
                  ) -> tuple[StreamState, tuple[jnp.ndarray, jnp.ndarray]]:
    """One streaming step: ([B, C] samples) -> ([B, F_max, D], [B, F_max] mask).

    Traced body; wrap with :func:`make_stream_fn` (or jit yourself with
    ``static_argnames=('cfg',)``). F_max = max_frames_per_chunk(C, cfg).
    """
    _check_streamable(cfg)
    B, C = chunk.shape
    fl, hop = cfg.frame_length, cfg.hop_length
    cap = fl - 1

    y = framing.preemphasize(chunk, cfg.preemphasis, state.prev_raw) \
        if not cfg.kaldi_mode else chunk
    data = jnp.concatenate([state.buf, y], axis=-1)      # [B, cap + C]
    total = state.fill + C                               # [B] valid samples
    n_new = jnp.maximum(0, 1 + (total - fl) // hop)      # frames this step

    F = max_frames_per_chunk(C, cfg)
    # frame j starts at (cap - fill) + j*hop inside `data`
    starts = (cap - state.fill)[:, None] + hop * jnp.arange(F)[None, :]
    idx = starts[:, :, None] + jnp.arange(fl)[None, None, :]
    idx = jnp.clip(idx, 0, cap + C - 1)
    frames = jnp.take_along_axis(
        data[:, None, :], idx.reshape(B, 1, F * fl), axis=-1
    ).reshape(B, F, fl)
    mask = jnp.arange(F)[None, :] < n_new[:, None]

    frames = framing.condition_frames(frames, cfg)
    feats = spectro_pipeline(frames, mask, cfg)

    new_state = StreamState(
        buf=data[:, C:],                                  # leftover is the tail
        fill=total - n_new * hop,
        prev_raw=jnp.where(C > 0, chunk[:, -1], state.prev_raw)
        if not cfg.kaldi_mode else state.prev_raw,
    )
    return new_state, (feats, mask)


@functools.lru_cache(maxsize=None)
def make_stream_fn(cfg: FeatureConfig):
    """jitted (state, chunk) -> (state', (features, mask)) for ``cfg``."""
    return jax.jit(functools.partial(process_chunk, cfg=cfg))


def scan_chunks(state: StreamState, chunks: jnp.ndarray,
                cfg: FeatureConfig
                ) -> tuple[StreamState, tuple[jnp.ndarray, jnp.ndarray]]:
    """Replay [K, B, C] chunks under one ``lax.scan`` — constant-memory
    processing of arbitrarily long audio on-device (SURVEY.md §5: the
    blockwise-attention analog for a front-end)."""
    step = functools.partial(process_chunk, cfg=cfg)
    return jax.lax.scan(step, state, chunks)


class StreamingFrontend:
    """Object-style convenience wrapper over the pure-functional API.

    >>> fe = StreamingFrontend(MFCC13_HTK, batch_size=1)
    >>> for chunk in chunks:                     # [B, C] arrays
    ...     feats, mask = fe.process(chunk)      # [B, F_max, D], [B, F_max]

    The underlying state is an explicit pytree: ``fe.state`` is
    serializable (see :func:`save_state`/:func:`load_state`) which gives
    resume-after-crash for long jobs (SURVEY.md §5 checkpoint/resume).
    """

    def __init__(self, cfg: FeatureConfig = MFCC13_HTK, batch_size: int = 1):
        _check_streamable(cfg)
        self.cfg = cfg
        self.state = init_state(batch_size, cfg)
        self._fn = make_stream_fn(cfg)

    def process(self, chunk) -> tuple[np.ndarray, np.ndarray]:
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        self.state, (feats, mask) = self._fn(self.state, chunk)
        return feats, mask

    def reset(self):
        b = self.state.buf.shape[0]
        self.state = init_state(b, self.cfg)


class RunningCMVN(NamedTuple):
    """Causal running CMVN statistics for online normalization (the
    streaming-friendly alternative to utterance-global CMVN)."""
    count: jnp.ndarray  # [B]
    mean: jnp.ndarray   # [B, D]
    m2: jnp.ndarray     # [B, D] sum of squared deviations (Welford)


def init_cmvn(batch_size: int, dim: int, dtype=jnp.float32) -> RunningCMVN:
    return RunningCMVN(
        count=jnp.zeros((batch_size,), dtype),
        mean=jnp.zeros((batch_size, dim), dtype),
        m2=jnp.zeros((batch_size, dim), dtype),
    )


def streaming_cmvn(stats: RunningCMVN, feats: jnp.ndarray, mask: jnp.ndarray,
                   norm_vars: bool = False
                   ) -> tuple[RunningCMVN, jnp.ndarray]:
    """Update Welford running stats with this chunk's valid frames and return
    the chunk normalized by the *updated* statistics."""
    m = mask[..., None].astype(feats.dtype)
    n_b = jnp.sum(m, axis=-2)[..., 0]                       # [B]
    sum_b = jnp.sum(feats * m, axis=-2)                     # [B, D]
    new_count = stats.count + n_b
    safe = jnp.maximum(new_count, 1.0)
    mean_b = sum_b / jnp.maximum(n_b, 1.0)[..., None]
    delta = mean_b - stats.mean
    new_mean = stats.mean + delta * (n_b / safe)[..., None]
    dev = (feats - new_mean[:, None, :]) * m
    chunk_m2 = jnp.sum(dev * dev, axis=-2)
    new_m2 = stats.m2 + chunk_m2 + \
        (delta * delta) * (stats.count * n_b / safe)[..., None]
    new_stats = RunningCMVN(new_count, new_mean, new_m2)
    out = feats - new_mean[:, None, :]
    if norm_vars:
        var = new_m2 / safe[..., None]
        out = out / jnp.sqrt(var + 1e-10)[:, None, :]
    return new_stats, out


# --- checkpoint/resume (SURVEY.md §5) ---

def save_state(path: str, state) -> None:
    """Serialize any streaming pytree (StreamState/RunningCMVN) to .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(path, treedef=str(treedef),
             **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path: str, like) -> "StreamState":
    """Load a state saved by :func:`save_state`; ``like`` provides the pytree
    structure (e.g. ``init_state(B, cfg)``)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new = [jnp.asarray(data[f"leaf{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new)
