"""Pre-emphasis + overlapped framing (references C2/C3).

The OpenCL reference runs one work-item per output sample for pre-emphasis
and one per (frame, sample) for framing (SURVEY.md §3.1). The TPU-native
formulation evolved past the north_star's "strided gather": frame starts are
hop-aligned, so framing is expressible as a handful of row-shifted *slices*
of the hop-reshaped signal (:func:`frames_from_buffer`) — pure vectorized
copies. On v5e the dynamic-gather formulation measured ~30x slower than this
(it was the whole pipeline's bottleneck; see BASELINE.md).

Everything here is shape-static and mask-aware: batches are padded to a
common length ``N`` and carry a per-utterance ``lengths`` vector; valid
frames never read padding, so padding contents cannot affect the output
(property-tested in tests/test_properties.py).
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
    streaming mode (reference C2 / config 4).

    Op-structure note (round-5, BASELINE.md "Large-batch erratum"): this
    MUST stay in the compute-then-concat form below. The algebraically
    identical shift-then-subtract form — ``x - alpha *
    concat([prev, x[..., :-1]])`` — is the measured TRIGGER of the
    upstream XLA:TPU miscompilation at [256, 480000]-class programs
    (bisected to this single op structure with all else held fixed:
    `benchmarks/experiments/erratum_bisect3.py`, 2026-08-20 — the
    full-width concat feeding the broadcast-subtract feeding the framing
    reshape corrupts ~9% of frames; this form, bitwise-identical values,
    runs clean at every previously-corrupt envelope point)."""
    if alpha == 0.0:
        return x
    prev = jnp.asarray(prev, x.dtype)
    if prev.ndim == x.ndim - 1:       # per-stream scalar carry, e.g. [B]
        prev = prev[..., None]
    prev = jnp.broadcast_to(prev, x.shape[:-1] + (1,))
    first = x[..., :1] - alpha * prev
    rest = x[..., 1:] - alpha * x[..., :-1]
    return jnp.concatenate([first, rest], axis=-1)


def num_frames_dynamic(lengths: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Per-utterance valid frame count (traced version of cfg.num_frames)."""
    if cfg.center:
        n = 1 + lengths // cfg.hop_length
        return n - 1 if cfg.drop_last_frame else n
    return jnp.maximum(0, 1 + (lengths - cfg.frame_length) // cfg.hop_length)


def frames_from_buffer(buf: jnp.ndarray, n_frames: int, frame_length: int,
                       hop: int) -> jnp.ndarray:
    """Overlapped framing WITHOUT a gather: frame t covers
    ``buf[t*hop : t*hop + frame_length]``.

    Frame starts are always hop-aligned, so after ``reshape(B, R, hop)``
    frame t is the concatenation of rows t..t+k-1 plus the first r columns
    of row t+k (frame_length = k*hop + r). That makes framing a handful of
    shifted *slices* — plain vectorized copies XLA streams at HBM bandwidth —
    instead of a dynamic gather, which measured ~30x slower on v5e (the
    gather unit was the whole pipeline's bottleneck; see benchmarks/).
    """
    B, M = buf.shape
    k, r = divmod(frame_length, hop)
    rows = n_frames + k + (1 if r else 0)
    need = rows * hop
    if M < need:
        buf = jnp.pad(buf, ((0, 0), (0, need - M)))
    elif M > need:
        buf = buf[:, :need]
    x2d = buf.reshape(B, rows, hop)
    parts = [x2d[:, j: j + n_frames] for j in range(k)]
    if r:
        parts.append(x2d[:, k: k + n_frames, :r])
    return jnp.concatenate(parts, axis=-1)


def _reflect_index(pos: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """np.pad(mode="reflect") index math, per utterance.

    Maps a (possibly negative or past-the-end) sample position to the index
    actually read under reflect padding of an utterance of length ``L``:
    period m = 2(L-1), r = |pos| mod m, index = r if r < L else m - r.
    Exact for multi-fold reflection (utterances shorter than the pad), and
    reduces to the single-fold ``|pos|`` / ``2L-2-pos`` for long ones.
    L == 1 degenerates to index 0."""
    m = jnp.maximum(2 * (lengths - 1), 1)
    r = jnp.abs(pos) % m
    return jnp.where(r < lengths, r, m - r)


def framing_buffer(x: jnp.ndarray, lengths: jnp.ndarray,
                   cfg: FeatureConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the framing buffer: frame t covers buf[t*hop : t*hop+fl].

    center=False: the buffer IS the (pre-emphasized) signal.
    center=True (Whisper/torch.stft): frame t starts at t*hop - n_fft//2
    with reflect padding at each utterance's TRUE edges (multi-fold reflect
    indices, so utterances shorter than the pad get exactly
    ``np.pad(mode="reflect")`` semantics and batch padding never leaks in).
    The left reflect is a tiny [B, pad] gather; the right reflect only ever
    influences the ``fl - pad - hop`` samples past the true end that the
    last valid frame reads, so it is one batched scatter of that window at
    position ``length``.

    Returns (buf [B, M], frame_mask [B, F_max]).
    """
    B, N = x.shape
    fl, hop = cfg.frame_length, cfg.hop_length
    F = cfg.num_frames(N)
    nf = num_frames_dynamic(lengths, cfg)
    mask = jnp.arange(F)[None, :] < nf[:, None]
    if F == 0:
        return x, mask

    if cfg.center:
        pad = cfg.n_fft // 2
        if N <= pad:
            raise ValueError(f"centered framing needs > n_fft/2 = {pad} "
                             f"samples, got {N}")
        # left reflect: buf[j] = x[reflect(pad - j)] — a [B, pad] gather
        # (25 KB at B=128; the 30x-slow gather problem was the [B, F, 400]
        # frame gather, not this)
        dist = pad - jnp.arange(pad)[None, :]                  # [1, pad]
        lidx = _reflect_index(dist, lengths[:, None])
        left = jnp.take_along_axis(x, jnp.clip(lidx, 0, N - 1), axis=1)
        # overrun: how far past `length` the last VALID frame can read
        over = fl - pad - (hop if cfg.drop_last_frame else 0)
        buf = jnp.concatenate(
            [left, x] + ([jnp.zeros((B, over), x.dtype)] if over > 0 else []),
            axis=-1)
        if over > 0:
            # write x[reflect(L + j)] at buf[pad+L+j] for j < over, per row —
            # one batched scatter (measured ~1.5 ms faster than a vmapped
            # dynamic_update_slice at B=128 on v5e; bit-identical)
            j = jnp.arange(over)
            ridx = _reflect_index(lengths[:, None] + j[None, :],
                                  lengths[:, None])
            src = jnp.take_along_axis(x, jnp.clip(ridx, 0, N - 1), axis=1)
            pos = pad + lengths[:, None] + j[None, :]
            buf = buf.at[jnp.arange(B)[:, None], pos].set(src)
    else:
        buf = x
    return buf, mask


def frame_signal(x: jnp.ndarray, lengths: jnp.ndarray,
                 cfg: FeatureConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slice overlapped frames from a padded batch (no gathers): [B, N] ->
    (frames [B, F_max, frame_length], frame_mask [B, F_max])."""
    buf, mask = framing_buffer(x, lengths, cfg)
    F = cfg.num_frames(x.shape[1])
    if F == 0:
        return jnp.zeros((x.shape[0], 0, cfg.frame_length), x.dtype), mask
    return frames_from_buffer(buf, F, cfg.frame_length, cfg.hop_length), mask


def condition_frames(frames: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Per-frame conditioning, *before* the window multiply (reference C2).

    kaldi_mode applies Kaldi's frame-local order: DC-offset removal, then
    in-frame pre-emphasis with x[-1] := x[0]. (The window itself is applied
    by the caller — or folded into the GEMM-DFT matrices.) Dither is NOT
    applied here: the accelerated path adds it at the sample level in
    ``features.extract_impl`` (explicit PRNG key), and the golden adds its
    own in ``reference/cpu.py`` — being random, it is always OFF for
    parity runs.
    """
    if cfg.kaldi_mode:
        if cfg.dc_offset:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if cfg.preemphasis:
            first = frames[..., :1] * (1.0 - cfg.preemphasis)
            rest = frames[..., 1:] - cfg.preemphasis * frames[..., :-1]
            frames = jnp.concatenate([first, rest], axis=-1)
    return frames
