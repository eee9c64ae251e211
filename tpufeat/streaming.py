"""Stateful streaming front-end (config 4 / reference C15).

BASELINE.json:configs[3]: "Streaming chunked front-end (160-sample hops,
stateful frame-overlap carry) for online ASR". The contract (SURVEY.md §2.1):
concatenating the per-chunk outputs equals the one-shot output **bit-for-bit**
— same dtype, same ops.

Design: state is a small pure pytree, every chunk step is one jit-compiled
call with static shapes, so the step composes with ``jax.lax.scan`` (long
audio at constant memory, SURVEY.md §5 "Long-context") and with ``vmap``/
sharding for many parallel streams.

Two step implementations:

- **static-fill** (:func:`process_chunk_static`, the default everywhere a
  chunk plan is known): the buffer fill is a pure function of the chunk-
  length history, so drivers pass it as a compile-time constant and the
  step is gather-free (hop-aligned slices + the same fused kernels as
  one-shot extraction, including the fully fused signal kernel).
- **dynamic-fill** (:func:`process_chunk`): per-row traced fill, framing by
  gather — the fallback for heterogeneous per-row schedules.

Equivalence: every frame sees exactly the same float32 inputs through the
same stage functions. Through the static path, all HOP-ALIGNED chunk plans
are mutually bit-identical and equal :func:`extract_scan` bit-for-bit
(tested with assert_array_equal — the per-frame arithmetic of the
row-blocked kernels is position-invariant, and the step pins the v4
kernel layout so large chunks can't switch to the phase-packed v5 layout,
whose rounding depends on the frame's call-local phase). Non-hop-aligned
plans agree to ~1e-6 reduction-order noise (XLA:CPU picks shape-dependent
matmul strategies for ragged frame counts; gated at 1e-5 in tests —
genuine carry/off-by-one bugs would show up as O(1) errors). One-shot
:func:`tpufeat.extract` of long audio (>= 32*H frames) runs the v5 layout
and agrees with the streaming family to the usual cross-layout float32
noise (~5e-6 f32 / ~2e-5 bf16x3); :func:`extract_scan` is the bit-exact
oracle for streaming semantics.

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
from collections.abc import Mapping
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


def zero_rows(x: jnp.ndarray, rows, value=None) -> jnp.ndarray:
    """Reset the given batch rows of a [B, ...] array to ``value``
    (default 0) — the slot-recycle primitive shared by every streaming
    wrapper's ``reset_rows``. One eager ``where`` per leaf (reset is a
    per-utterance-end event, not a per-chunk op, so it never joins the
    jitted step)."""
    keep = np.ones(x.shape[0], bool)
    keep[np.asarray(list(rows), int)] = False
    k = jnp.asarray(keep).reshape((-1,) + (1,) * (x.ndim - 1))
    fill = (jnp.zeros((), x.dtype) if value is None
            else jnp.asarray(value, x.dtype))
    return jnp.where(k, x, fill)


def _check_streamable(cfg: FeatureConfig) -> None:
    if cfg.center:
        raise ValueError("streaming requires center=False (snip-edges)")
    if cfg.hop_length > cfg.frame_length:
        # the carry buffer holds frame_length-1 samples; hop > frame_length
        # (gapped framing) would need fill < 0, corrupting the state
        raise ValueError("streaming requires hop_length <= frame_length "
                         f"(got hop {cfg.hop_length} > frame "
                         f"{cfg.frame_length}); use one-shot extract()")
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
    if cfg.pncc:
        raise ValueError(
            "PNCC's noise-floor/peak/power-mean recursions carry state "
            "across the whole utterance and its medium-time window looks "
            "2 frames ahead — a per-chunk step would silently reset them; "
            "use one-shot extract()")


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


def next_fill(fill: int, chunk_len: int, cfg: FeatureConfig) -> int:
    """Buffer fill after consuming a chunk of ``chunk_len`` samples.

    ``fill`` is determined ONLY by the sequence of chunk lengths — never by
    sample values — so the host can always track it as a plain int. That is
    what makes the gather-free static path (:func:`process_chunk_static`)
    possible: every offset in the step becomes a compile-time constant."""
    total = fill + chunk_len
    n_new = max(0, 1 + (total - cfg.frame_length) // cfg.hop_length)
    return total - n_new * cfg.hop_length


def process_chunk_static(state: StreamState, chunk: jnp.ndarray,
                         cfg: FeatureConfig, fill: int
                         ) -> tuple[StreamState, jnp.ndarray]:
    """Gather-free streaming step for a statically known buffer fill.

    The dynamic :func:`process_chunk` frames each chunk with a
    ``take_along_axis`` gather because the frame origin ``cap - fill`` is a
    traced value — the exact op class measured ~30x slower than slicing on
    v5e (framing.py). But ``fill`` is a pure function of the chunk-length
    history (:func:`next_fill`), so any driver that knows its chunk sizes
    (StreamingFrontend, scan plans, serving loops) can pass it statically
    and the whole step lowers to hop-aligned slices + the same fused
    spectro kernels as one-shot extraction — including the fully fused
    signal-level kernel when ``cfg.fused_framing`` is on, which the dynamic
    path can never use.

    Returns ``(state', feats [B, n_new, D])`` — every output frame is
    valid by construction (n_new is static), so there is no mask.
    """
    _check_streamable(cfg)
    B, C = chunk.shape
    fl, hop = cfg.frame_length, cfg.hop_length
    cap = fl - 1
    if not 0 <= fill <= cap:
        raise ValueError(f"fill {fill} outside [0, {cap}]")

    y = framing.preemphasize(chunk, cfg.preemphasis, state.prev_raw) \
        if not cfg.kaldi_mode else chunk
    data = jnp.concatenate([state.buf[:, cap - fill:], y], axis=-1)
    total = fill + C
    n_new = max(0, 1 + (total - fl) // hop)

    if n_new == 0:
        feats = jnp.zeros((B, 0, cfg.feature_dim), jnp.float32)
    elif cfg.use_pallas and cfg.gemm_dft and cfg.fused_framing \
            and not cfg.use_energy:
        from tpufeat.pallas import fused
        # layout="v4": the v5 phase-packed layout rounds per frame-index
        # mod H *within the call*, so a chunk plan whose steps exceed the
        # v5 dispatch threshold would compute (slightly) different bits
        # for the same frame than a smaller-chunk plan — breaking the
        # bit-exact chunk-plan contract above. Pinning the streaming step
        # to one layout keeps every plan bitwise identical.
        feats = fused.signal_features(data, n_new, cfg, layout="v4")
        if cfg.plp_order > 0:
            from tpufeat import plp
            feats = plp.plp_from_energies(feats, cfg)
    else:
        frames = framing.frames_from_buffer(data, n_new, fl, hop)
        frames = framing.condition_frames(frames, cfg)
        feats = spectro_pipeline(frames,
                                 jnp.ones((B, n_new), bool), cfg)
    if cfg.out_dtype != "float32":
        feats = feats.astype(jnp.dtype(cfg.out_dtype))

    fill_out = total - n_new * hop          # static; == next_fill(fill, C)
    leftover = data[:, n_new * hop:]        # [B, fill_out], static slice
    new_buf = jnp.concatenate(
        [jnp.zeros((B, cap - fill_out), data.dtype), leftover], axis=-1)
    new_state = StreamState(
        buf=new_buf,
        fill=jnp.full((B,), fill_out, jnp.int32),
        prev_raw=chunk[:, -1] if (C > 0 and not cfg.kaldi_mode)
        else state.prev_raw,
    )
    return new_state, feats


@functools.lru_cache(maxsize=None)
def make_stream_fn_static(cfg: FeatureConfig, fill: int):
    """jitted gather-free (state, chunk) -> (state', feats) for ``cfg`` at
    statically known ``fill`` (jax then caches per chunk shape)."""
    return jax.jit(functools.partial(process_chunk_static, cfg=cfg,
                                     fill=fill))


def process_chunk(state: StreamState, chunk: jnp.ndarray,
                  cfg: FeatureConfig
                  ) -> tuple[StreamState, tuple[jnp.ndarray, jnp.ndarray]]:
    """One streaming step: ([B, C] samples) -> ([B, F_max, D], [B, F_max] mask).

    Traced body; wrap with :func:`make_stream_fn` (or jit yourself with
    ``static_argnames=('cfg',)``). F_max = max_frames_per_chunk(C, cfg).

    This is the fully dynamic fallback (per-row traced ``fill``, framing by
    gather). Whenever the chunk-length schedule is known on the host —
    which is every practical driver — prefer :func:`process_chunk_static`
    / :class:`StreamingFrontend` / :func:`scan_chunks`, which are
    gather-free and markedly faster on TPU.
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
    blockwise-attention analog for a front-end).

    Dynamic-fill variant (per-step gather, padded per-chunk outputs +
    masks). Prefer :func:`scan_chunks_static`, which is gather-free and
    returns densely packed frames."""
    step = functools.partial(process_chunk, cfg=cfg)
    return jax.lax.scan(step, state, chunks)


def fill_schedule(fill: int, chunk_lens, cfg: FeatureConfig) -> list[int]:
    """Fill value BEFORE each step (len(chunk_lens)+1 entries, last is the
    final fill) for a known chunk plan — all host ints."""
    fills = [fill]
    for c in chunk_lens:
        fills.append(next_fill(fills[-1], c, cfg))
    return fills


def _find_cycle(fills: list[int]) -> tuple[int, int]:
    """(warmup, period) of the fill sequence: fills[w + i] == fills[w + i %
    p] for all i. fill_{k+1} is a function of fill_k alone (equal chunk
    sizes), so the first repeated value starts the cycle."""
    seen: dict[int, int] = {}
    for k, f in enumerate(fills):
        if f in seen:
            return seen[f], k - seen[f]
        seen[f] = k
    return len(fills), 1      # no repeat within the plan: fully unrolled


def scan_chunks_static(state: StreamState, chunks: jnp.ndarray,
                       cfg: FeatureConfig, fill: int = 0, *,
                       max_period: int = 16
                       ) -> tuple[StreamState, jnp.ndarray]:
    """Gather-free scan over [K, B, C] chunks -> (state', feats [B, F, D]).

    The fill sequence for equal-size chunks is eventually periodic
    (period = hop/gcd(C, hop); 1 for hop-aligned chunks). Warmup steps are
    unrolled, the cycle body (``period`` static steps) runs under one
    ``lax.scan``, and the remainder is unrolled — so arbitrarily long audio
    compiles O(warmup + period) step programs and runs at constant memory
    with zero dynamic gathers. Every output frame is valid (dense packing
    by construction, no masks).
    """
    K, B, C = chunks.shape
    fills = fill_schedule(fill, [C] * K, cfg)
    w, p = _find_cycle(fills[:-1] or [fill])
    if p > max_period:
        raise ValueError(
            f"chunk size {C} gives a fill cycle of period {p} (> "
            f"{max_period}); use a hop-multiple chunk size or the dynamic "
            f"scan_chunks")

    def run_steps(state, xs, fill0):
        outs, f = [], fill0
        for i in range(xs.shape[0]):
            state, feats = process_chunk_static(state, xs[i], cfg, f)
            f = next_fill(f, C, cfg)
            if feats.shape[1]:
                outs.append(feats)
        return state, outs

    parts: list[jnp.ndarray] = []
    w = min(w, K)
    state, outs = run_steps(state, chunks[:w], fills[0])
    parts += outs
    n_cycles, rem = divmod(K - w, p)
    if n_cycles:
        def body(st, xs):
            st, outs = run_steps(st, xs, fills[w])
            return st, (jnp.concatenate(outs, axis=1) if outs
                        else jnp.zeros((B, 0, cfg.feature_dim), jnp.float32))
        cyc = chunks[w: w + n_cycles * p].reshape(n_cycles, p, B, C)
        state, stacked = jax.lax.scan(body, state, cyc)
        # [n_cycles, B, fpc, D] -> [B, n_cycles*fpc, D]
        fpc = stacked.shape[2]
        if fpc:
            parts.append(jnp.moveaxis(stacked, 0, 1)
                         .reshape(B, n_cycles * fpc, stacked.shape[-1]))
    if rem:
        state, outs = run_steps(state, chunks[K - rem:], fills[K - rem])
        parts += outs
    feats = (jnp.concatenate(parts, axis=1) if parts
             else jnp.zeros((B, 0, cfg.feature_dim), jnp.float32))
    return state, feats


@functools.lru_cache(maxsize=None)
def make_scan_fn(cfg: FeatureConfig, fill: int = 0):
    """jitted gather-free (state, chunks [K, B, C]) -> (state', feats
    [B, F, D]) for ``cfg`` at statically known starting ``fill``.

    Jitting the WHOLE scan matters for bit-exactness: each per-step
    program inside is then compiled identically to the standalone
    :func:`make_stream_fn_static` steps (verified bitwise in tests)."""
    return jax.jit(functools.partial(scan_chunks_static, cfg=cfg,
                                     fill=fill))


def extract_scan(signal, cfg: FeatureConfig = MFCC13_HTK,
                 chunk_len: int = 4800) -> jnp.ndarray:
    """One-shot extraction computed THROUGH the streaming step.

    Satisfies BASELINE.json:configs[3]'s letter: the one-shot result is
    produced by the very same per-chunk programs any streaming consumer
    runs, so ``concat(streaming outputs) == extract_scan`` bit-for-bit for
    hop-aligned chunk plans — regardless of the plan's chunk sizes, and
    whether the consumer used StreamingFrontend, per-step jits, or the
    device scan (tested with assert_array_equal in tests/test_streaming.py).
    Known exception: on the CPU backend XLA picks a different matvec
    strategy for some tiny per-step frame counts (1- or 3-frame steps:
    ~1e-6); non-hop-aligned plans likewise sit at ~1e-6 reduction-order
    noise. Use :func:`tpufeat.extract` when you just want the fastest
    one-shot path.

    Returns features [(B,) F, D] with F = cfg.num_frames(N).
    """
    _check_streamable(cfg)
    x = jnp.asarray(signal, jnp.float32)
    single = x.ndim == 1
    if single:
        x = x[None]
    B, N = x.shape
    K = N // chunk_len
    state = init_state(B, cfg, x.dtype)
    parts = []
    if K:
        chunks = jnp.moveaxis(x[:, : K * chunk_len]
                              .reshape(B, K, chunk_len), 1, 0)
        state, feats = make_scan_fn(cfg, 0)(state, chunks)
        parts.append(feats)
    rem = N - K * chunk_len
    if rem:
        fill = fill_schedule(0, [chunk_len] * K, cfg)[-1]
        _, tail = make_stream_fn_static(cfg, fill)(state, x[:, K * chunk_len:])
        parts.append(tail)
    feats = (jnp.concatenate(parts, axis=1) if parts
             else jnp.zeros((B, 0, cfg.feature_dim), jnp.float32))
    return feats[0] if single else feats


class StreamingFrontend:
    """Object-style convenience wrapper over the pure-functional API.

    >>> fe = StreamingFrontend(MFCC13_HTK, batch_size=1)
    >>> for chunk in chunks:                     # [B, C] arrays
    ...     feats, mask = fe.process(chunk)      # [B, n_new, D], [B, n_new]

    The wrapper always knows each chunk's length, so it tracks the buffer
    fill as a host int and runs the gather-free static step
    (:func:`process_chunk_static`) — every returned frame is valid and the
    mask is all-True (kept for API symmetry with the dynamic step).

    The underlying state is an explicit pytree: ``fe.state`` is
    serializable (see :func:`save_state`/:func:`load_state`) which gives
    resume-after-crash for long jobs (SURVEY.md §5 checkpoint/resume);
    assigning to ``fe.state`` re-syncs the host fill from the pytree.
    """

    def __init__(self, cfg: FeatureConfig = MFCC13_HTK, batch_size: int = 1):
        _check_streamable(cfg)
        self.cfg = cfg
        self.state = init_state(batch_size, cfg)

    @property
    def state(self) -> StreamState:
        return self._state

    @state.setter
    def state(self, s: StreamState) -> None:
        fills = np.unique(np.asarray(s.fill))
        if fills.size != 1:
            raise ValueError(
                "StreamingFrontend batches share one chunk schedule, so "
                f"all per-stream fills must agree; got {fills}. Use the "
                "functional process_chunk API for heterogeneous streams.")
        self._state = s
        self._fill = int(fills[0])

    def process(self, chunk) -> tuple[np.ndarray, np.ndarray]:
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        fn = make_stream_fn_static(self.cfg, self._fill)
        self._state, feats = fn(self._state, chunk)
        self._fill = next_fill(self._fill, chunk.shape[-1], self.cfg)
        mask = jnp.ones(feats.shape[:2], bool)
        return feats, mask

    def reset(self):
        b = self._state.buf.shape[0]
        self.state = init_state(b, self.cfg)

    def reset_rows(self, rows) -> None:
        """Recycle the given batch slots (serving: utterance ended, a new
        stream takes the row) WITHOUT touching the other rows or the
        shared chunk schedule: the slot's carry and pre-emphasis state
        are zeroed while the shared ``fill`` clock keeps running, so the
        slot behaves exactly as a stream that carried zeros (silence)
        from the global start — its subsequent features are bit-identical
        to :func:`extract_scan` of (zeros-prefix ++ future samples) under
        the same chunk plan (tested). Other rows are bit-unchanged (the
        zeroing is a pure per-row ``where``)."""
        self._state = StreamState(
            buf=zero_rows(self._state.buf, rows),
            fill=self._state.fill,            # shared schedule clock
            prev_raw=zero_rows(self._state.prev_raw, rows),
        )


# ---------------------------------------------------------------------------
# Online deltas: the streaming twin of features.deltas (config 3 post-
# processing). Delta_t needs frames t-w..t+w, so the stream emits with a
# fixed lookahead delay of w frames; start-edge replication happens exactly
# like the offline operator, and flush() finishes the last w frames with
# end replication. Chain two stages for delta-deltas. Like the front-end's
# static path, the frame count seen so far is shape-determined, so every
# step is a pure static-slice program.
# ---------------------------------------------------------------------------

def init_delta_state(batch_size: int, dim: int, window: int = 2,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Delta carry: the last 2*window base frames [B, 2w, D]."""
    return jnp.zeros((batch_size, 2 * window, dim), dtype)


def _delta_minus(work, i, F, z0, window):
    """Slice work[p - i] for emitted p, with start-edge replication: work
    positions below z0 (the first real frame) read work[:, z0]."""
    m_lo = window - i
    if m_lo >= z0:
        return work[:, m_lo: m_lo + F]
    k = min(z0 - m_lo, F)
    first = jnp.broadcast_to(work[:, z0: z0 + 1],
                             (work.shape[0], k, work.shape[2]))
    return jnp.concatenate([first, work[:, z0: z0 + F - k]], axis=1)


def streaming_delta_step(carry: jnp.ndarray, feats: jnp.ndarray, *,
                         window: int = 2, n_seen: int = 0
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One online-delta step: ``feats`` [B, F, D] new base frames ->
    (carry', deltas [B, n_emit, D]) where n_emit = F once the stream has
    flowed past the initial ``window``-frame lookahead (F - window on the
    very first chunks). ``n_seen`` = base frames BEFORE this chunk — a pure
    function of the chunk plan, so pass it statically (host-tracked, like
    process_chunk_static's fill)."""
    B, F, D = feats.shape
    w = window
    work = jnp.concatenate([carry, feats], axis=1)       # [B, 2w + F, D]
    n_emit = min(F, max(0, n_seen + F - w))
    new_carry = work[:, -2 * w:]
    if n_emit == 0:
        return new_carry, jnp.zeros((B, 0, D), feats.dtype)
    z0 = max(2 * w - n_seen, 0)          # work index of global frame 0
    t0 = F - n_emit                      # first emitted t within [0, F)
    denom = 2.0 * sum(i * i for i in range(1, w + 1))
    out = jnp.zeros((B, n_emit, D), feats.dtype)
    for i in range(1, w + 1):
        plus = work[:, w + t0 + i: w + t0 + i + n_emit]
        minus = _delta_minus(work, i, F, z0, w)[:, t0:]
        out = out + i * (plus - minus)
    return new_carry, out / denom


def streaming_delta_flush(carry: jnp.ndarray, *, window: int = 2,
                          n_seen: int = 0) -> jnp.ndarray:
    """Finish the stream: emit the last min(window, n_seen) deltas with
    end-edge replication (the offline operator's convention)."""
    B, _, D = carry.shape
    w = window
    n_emit = min(w, n_seen)
    if n_emit == 0:
        return jnp.zeros((B, 0, D), carry.dtype)
    z0 = max(2 * w - n_seen, 0)
    t0 = w - n_emit                      # emitted p in [w + t0, 2w)
    denom = 2.0 * sum(i * i for i in range(1, w + 1))
    last = carry[:, -1:]                 # global last frame (end replicate)
    out = jnp.zeros((B, n_emit, D), carry.dtype)
    for i in range(1, w + 1):
        # plus side: p + i, clipped at the final frame 2w-1
        n_clip = min(n_emit, i)          # the last i emitted rows clip
        plus = jnp.concatenate(
            [carry[:, w + t0 + i: 2 * w]] +
            [jnp.broadcast_to(last, (B, n_clip, D))], axis=1)[:, :n_emit]
        minus = _delta_minus(carry, i, w, z0, w)[:, t0: t0 + n_emit]
        out = out + i * (plus - minus)
    return out / denom


class StreamingDeltas:
    """Object wrapper: chain after a StreamingFrontend for online Δ (and
    again for ΔΔ). Emits with a ``window``-frame lookahead delay; call
    :meth:`flush` at end of stream. Host-tracks ``n_seen`` so every step
    compiles to static slices (lru-cached per (F, n_seen-phase) shape)."""

    def __init__(self, dim: int, window: int = 2, batch_size: int = 1):
        self.window = window
        self.n_seen = 0
        self.carry = init_delta_state(batch_size, dim, window)

    def process(self, feats) -> jnp.ndarray:
        feats = jnp.asarray(feats, jnp.float32)
        fn = _make_delta_fn(self.window, self.n_seen if self.n_seen
                            < 2 * self.window else 2 * self.window)
        self.carry, out = fn(self.carry, feats)
        self.n_seen += feats.shape[1]
        return out

    def flush(self) -> jnp.ndarray:
        n = self.n_seen if self.n_seen < 2 * self.window \
            else 2 * self.window
        return _make_delta_flush_fn(self.window, n)(self.carry)

    def reset_rows(self, rows) -> None:
        """Slot recycle: zero the rows' carry (the shared ``n_seen``
        emission clock keeps running). The slot's next ``window`` output
        rows are transitional (they regress against the zeroed carry);
        from the ``window``-th row on, the output is exactly the offline
        delta of the slot's own post-reset base rows."""
        self.carry = zero_rows(self.carry, rows)


@functools.lru_cache(maxsize=None)
def _make_delta_flush_fn(window: int, n_seen: int):
    # same 2w+1-program bound as _make_delta_fn; without the cache every
    # end-of-stream flush would build (and retrace) a fresh jit wrapper
    return jax.jit(functools.partial(streaming_delta_flush, window=window,
                                     n_seen=n_seen))


@functools.lru_cache(maxsize=None)
def _make_delta_fn(window: int, n_seen: int):
    # n_seen saturates at 2*window (start-edge handling no longer differs),
    # so at most 2w+1 distinct programs exist per chunk shape
    return jax.jit(functools.partial(streaming_delta_step, window=window,
                                     n_seen=n_seen))


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


class StreamingSlidingCMVN:
    """Causal sliding-window CMVN — the ONLINE normalization Kaldi-style
    deployments actually run (``apply-cmvn-sliding``): each frame is
    normalized by the mean (and optionally variance) of the trailing
    ``window`` frames, with the first frames delayed until ``min_window``
    frames exist so early estimates aren't single-frame noise.

    The streaming sibling of
    ``features.sliding_cmvn(center=False)`` and, unlike the Welford
    :func:`streaming_cmvn` (which converges but never matches), EXACT vs
    the offline operator: every window is finite and trailing, so once
    ``min_window`` frames are buffered each emitted row sees precisely the
    frames the offline op sees (equality up to f32 summation order,
    ~1e-6 — tested in tests/test_streaming_pipeline.py).

    State: a [B, window, D] raw-row ring (device-resident), a host frame
    counter, and the startup buffer. ``process()`` emits nothing until
    ``min_window`` frames arrive, then the backlog at once, then
    chunk-for-chunk; ``flush()`` drains short (< min_window) streams by
    running the offline operator on the buffered rows."""

    def __init__(self, dim: int, batch_size: int = 1, window: int = 600,
                 min_window: int = 100, norm_vars: bool = False):
        if window < 1 or min_window < 1:
            raise ValueError("window and min_window must be >= 1")
        if min_window > window:
            # the offline operator borrows future context only for frames
            # t < window; the first-emission batch here applies the
            # min_window end to every frame, so beyond-window borrows
            # would silently diverge (Kaldi asserts the same invariant)
            raise ValueError(f"min_window {min_window} > window {window}")
        self.dim, self.window = dim, window
        self.min_window, self.norm_vars = min_window, norm_vars
        self.carry = jnp.zeros((batch_size, window, dim), jnp.float32)
        self.n_seen = 0
        self._pending = jnp.zeros((batch_size, 0, dim), jnp.float32)

    def process(self, rows: jnp.ndarray) -> jnp.ndarray:
        """[B, n, D] feature rows -> [B, m, D] normalized rows (m = n in
        steady state; 0 while buffering the first min_window frames)."""
        rows = jnp.asarray(rows, jnp.float32)
        B = rows.shape[0]
        if self.n_seen == 0:
            self._pending = jnp.concatenate([self._pending, rows], axis=1)
            if self._pending.shape[1] < self.min_window:
                return jnp.zeros((B, 0, self.dim), jnp.float32)
            rows, self._pending = self._pending, self._pending[:, :0]
        n = rows.shape[1]
        if n == 0:
            return rows
        fn = _sliding_cmvn_step_jit(n, self.window, self.min_window,
                                    self.norm_vars)
        out, self.carry = fn(self.carry, rows,
                             jnp.asarray(self.n_seen, jnp.int32))
        self.n_seen += n
        return out

    def flush(self) -> jnp.ndarray:
        """Drain a short stream (total < min_window): offline clamping
        normalizes every frame by the whole-stream statistics."""
        p, self._pending = self._pending, self._pending[:, :0]
        if p.shape[1] == 0:
            return p
        from tpufeat.features import sliding_cmvn
        return sliding_cmvn(p, None, window=self.window,
                            min_window=self.min_window, center=False,
                            norm_vars=self.norm_vars)

    def state(self) -> dict:
        return {"carry": self.carry, "n_seen": self.n_seen,
                "pending": self._pending}

    def set_state(self, s: dict) -> None:
        self.carry = jnp.asarray(s["carry"])
        self.n_seen = int(s["n_seen"])
        self._pending = jnp.asarray(s["pending"])

    def reset_rows(self, rows) -> None:
        """Slot recycle: zero the rows' ring (emission alignment stays
        shared — the batch emits in lockstep, so a fresh slot cannot get
        its own ``min_window`` startup delay). The zeroed rows count as
        window content until they wash out: the slot's first ``window``
        rows are normalized against a partially-zero window."""
        self.carry = zero_rows(self.carry, rows)
        if self._pending.shape[1]:
            self._pending = zero_rows(self._pending, rows)


@functools.lru_cache(maxsize=None)
def _sliding_cmvn_step_jit(n: int, window: int, min_window: int,
                           norm_vars: bool):
    """One compiled sliding-CMVN step per (chunk rows, window config):
    the frame counter is TRACED (ring positions are computed from it), so
    chunk schedules don't multiply programs."""
    w = window

    def impl(carry, rows, n_prev):
        data = jnp.concatenate([carry, rows], axis=1)      # [B, w+n, D]
        # carry rows with absolute index < 0 are zeros by construction;
        # pre-center by the block mean so the f32 cumsum stays small
        # (any constant cancels from x - sliding_mean(x) exactly)
        nreal = (jnp.minimum(n_prev, w) + n).astype(data.dtype)
        g = jnp.sum(data, axis=1, keepdims=True) / nreal
        k = jnp.arange(w + n, dtype=jnp.int32)[None, :, None]
        realmask = (k >= (w + n) - jnp.minimum(n_prev, w) - n).astype(
            data.dtype)
        x = (data - g) * realmask

        j = jnp.arange(n, dtype=jnp.int32)
        t_abs = n_prev + j
        ws_rel = jnp.maximum(t_abs - w, 0) - (n_prev - w)
        we_rel = jnp.maximum(t_abs + 1, min_window) - (n_prev - w)
        cnt = (we_rel - ws_rel).astype(x.dtype)[None, :, None]

        # gather-free window sums (the take_along_axis formulation cost
        # 2.1x the whole extract pipeline on chip — BASELINE.md): both
        # rel indices are shifts of j, except a traced-scalar pick for
        # the first-emission min_window borrow / short-carry floor —
        # each ONE dynamic_slice row, not a per-frame gather
        upper_mask = (t_abs + 1 < min_window)[None, :, None]
        lower_mask = (j < w - n_prev)[None, :, None]

        def winmean(v):
            cs = jnp.cumsum(
                jnp.concatenate([jnp.zeros_like(v[:, :1]), v], axis=1),
                axis=1)                                    # [B, w+n+1, D]
            upper = cs[:, w + 1:]                          # cs[j+w+1]
            borrow = jax.lax.dynamic_slice_in_dim(
                cs, jnp.clip(min_window - n_prev + w, 0, w + n), 1,
                axis=1)
            upper = jnp.where(upper_mask, borrow, upper)
            lower = cs[:, :n]                              # cs[j]
            floor = jax.lax.dynamic_slice_in_dim(
                cs, jnp.clip(w - n_prev, 0, w + n), 1, axis=1)
            lower = jnp.where(lower_mask, floor, lower)
            return (upper - lower) / cnt

        mean = winmean(x)
        out = x[:, w:] - mean
        if norm_vars:
            var = jnp.maximum(winmean(x * x) - mean * mean, 1e-10)
            out = out / jnp.sqrt(var)
        return out, data[:, n:]

    return jax.jit(impl)


class OnlineCmvn:
    """Kaldi online2 ``OnlineCmvn`` — trailing-window normalization
    smoothed with speaker/global priors while the window is short, so
    frame 0 is emitted immediately (no ``min_window`` delay like
    :class:`StreamingSlidingCMVN`; the priors play that role).

    The online twin of :func:`tpufeat.features.online_cmvn` (exact vs it
    for any chunk plan, up to f32 summation order) with Kaldi's
    ``Freeze()``: :meth:`freeze` pins the smoothed statistics of the last
    seen frame and applies them to every later frame — the two-pass
    decoding trick (first pass adapts, second pass re-decodes against
    stable stats).

    State: a [B, window, D] ring + host frame counter + fixed-shape
    frozen-stats slot, so ``state()``/``set_state()`` round-trip through
    :func:`save_state`/:func:`load_state`."""

    def __init__(self, dim: int, batch_size: int = 1, window: int = 600,
                 speaker_stats=None, global_stats=None,
                 speaker_frames: int = 600, global_frames: int = 200,
                 norm_vars: bool = False):
        if window < 1:
            raise ValueError("window must be >= 1")
        self.dim, self.window, self.norm_vars = dim, window, norm_vars
        self.speaker_frames, self.global_frames = speaker_frames, \
            global_frames

        def unpack(st):
            if st is None:
                return 0.0, np.zeros(dim), np.zeros(dim)
            if np.asarray(st.sum).shape != (dim,):
                raise ValueError(f"prior stats dim "
                                 f"{np.asarray(st.sum).shape} != ({dim},)")
            return float(st.count), np.asarray(st.sum, np.float64), \
                np.asarray(st.sumsq, np.float64)

        self._cs, self._ssum, self._ssq = unpack(speaker_stats)
        self._cg, self._gsum, self._gsq = unpack(global_stats)
        self.carry = jnp.zeros((batch_size, window, dim), jnp.float32)
        # PER-ROW frame counter (unlike the other wrappers' shared host
        # clock): a recycled slot restarts at 0, so the prior smoothing
        # re-engages for its first frames — Kaldi's fresh-utterance
        # OnlineCmvn semantics inside a running batch (see reset_rows)
        self.n_seen = jnp.zeros((batch_size,), jnp.int32)
        self.frozen = False
        self._fmean = jnp.zeros((batch_size, 1, dim), jnp.float32)
        self._fscale = jnp.ones((batch_size, 1, dim), jnp.float32)

    def _smoothed(self, seg: np.ndarray):
        """f64 smoothed (mean, var) of one row's trailing ``seg`` frames
        (the golden's SmoothOnlineCmvnStats arithmetic)."""
        c = float(len(seg))
        tot_sum, tot_sq = seg.sum(axis=0), (seg * seg).sum(axis=0)
        ks = min(max(self.window - c, 0.0), float(self.speaker_frames),
                 self._cs)
        if ks > 0:
            tot_sum = tot_sum + (ks / self._cs) * self._ssum
            tot_sq = tot_sq + (ks / self._cs) * self._ssq
        kg = min(max(self.window - c - ks, 0.0),
                 float(self.global_frames), self._cg)
        if kg > 0:
            tot_sum = tot_sum + (kg / self._cg) * self._gsum
            tot_sq = tot_sq + (kg / self._cg) * self._gsq
        n = c + ks + kg
        mean = tot_sum / n
        return mean, np.maximum(tot_sq / n - mean * mean, 1e-10)

    def freeze(self) -> None:
        """Pin the smoothed statistics at the CURRENT frame (Kaldi
        ``OnlineCmvn::Freeze``); later :meth:`process` calls normalize
        against them without updating the window."""
        n_rows = np.asarray(self.n_seen)
        if n_rows.max() == 0 and self._cs == 0.0 and self._cg == 0.0:
            raise ValueError("freeze() before any frame needs a speaker "
                             "or global prior to freeze")
        ring = np.asarray(self.carry, np.float64)
        means, scales = [], []
        for b in range(ring.shape[0]):
            k = int(min(n_rows[b], self.window))
            mean, var = self._smoothed(ring[b, self.window - k:])
            means.append(mean)
            scales.append(1.0 / np.sqrt(var) if self.norm_vars
                          else np.ones_like(var))
        self._fmean = jnp.asarray(np.stack(means)[:, None], jnp.float32)
        self._fscale = jnp.asarray(np.stack(scales)[:, None], jnp.float32)
        self.frozen = True

    def process(self, rows: jnp.ndarray) -> jnp.ndarray:
        """[B, n, D] feature rows -> [B, n, D] normalized rows (1:1 —
        online CMVN has no emission delay)."""
        rows = jnp.asarray(rows, jnp.float32)
        n = rows.shape[1]
        if n == 0:
            return rows
        if self.frozen:
            return (rows - self._fmean) * self._fscale
        fn = _online_cmvn_step_jit(
            n, self.window, self.norm_vars, self._cs, self._cg,
            self.speaker_frames, self.global_frames)
        sm = jnp.asarray(self._ssum / max(self._cs, 1.0), jnp.float32)
        smsq = jnp.asarray(self._ssq / max(self._cs, 1.0), jnp.float32)
        gm = jnp.asarray(self._gsum / max(self._cg, 1.0), jnp.float32)
        gmsq = jnp.asarray(self._gsq / max(self._cg, 1.0), jnp.float32)
        out, self.carry = fn(self.carry, rows, self.n_seen,
                             sm, smsq, gm, gmsq)
        self.n_seen = self.n_seen + n
        return out

    def state(self) -> dict:
        return {"carry": self.carry, "n_seen": self.n_seen,
                "frozen": self.frozen, "fmean": self._fmean,
                "fscale": self._fscale}

    def set_state(self, s: dict) -> None:
        self.carry = jnp.asarray(s["carry"])
        n = np.asarray(s["n_seen"])
        B = self.carry.shape[0]
        # pre-per-row checkpoints stored one shared host int
        self.n_seen = jnp.full((B,), int(n), jnp.int32) if n.ndim == 0 \
            else jnp.asarray(n, jnp.int32)
        self.frozen = bool(np.asarray(s["frozen"]))
        self._fmean = jnp.asarray(s["fmean"])
        self._fscale = jnp.asarray(s["fscale"])

    def reset_rows(self, rows) -> None:
        """Slot recycle: zero the rows' ring AND their frame counter, so
        the slot's next frames are smoothed against the speaker/global
        priors exactly like a fresh Kaldi OnlineCmvn — per-utterance
        restart semantics inside a running batch. Under :meth:`freeze`
        the pinned statistics stay in force for every row (freezing is
        global); other rows are bit-unchanged."""
        self.carry = zero_rows(self.carry, rows)
        self.n_seen = zero_rows(self.n_seen, rows)

    def reset(self) -> None:
        """Fresh-stream restart for every row: clear the window, the
        frame counters, and any :meth:`freeze` pin; the speaker/global
        priors stay (they are model data, not stream state)."""
        self.carry = jnp.zeros_like(self.carry)
        self.n_seen = jnp.zeros_like(self.n_seen)
        self.frozen = False
        self._fmean = jnp.zeros_like(self._fmean)
        self._fscale = jnp.ones_like(self._fscale)


@functools.lru_cache(maxsize=None)
def _online_cmvn_step_jit(n: int, window: int, norm_vars: bool,
                          cs: float, cg: float,
                          speaker_frames: int, global_frames: int):
    """One compiled online-CMVN step per (chunk rows, window/prior
    config); the PER-ROW frame counter ``n_prev`` [B] and prior moments
    are traced (per-row so recycled serving slots restart against the
    priors mid-batch — reset_rows). Same gather-free shifted-cumsum
    formulation as _sliding_cmvn_step_jit, with Kaldi's
    trailing-``window`` window ([t+1-w, t+1), one frame narrower than
    apply-cmvn-sliding's [t-w, t+1)) and prior smoothing instead of a
    min_window future borrow."""
    w = window

    def impl(carry, rows, n_prev, sm, smsq, gm, gmsq):
        from tpufeat.features import _prior_counts
        data = jnp.concatenate([carry, rows], axis=1)      # [B, w+n, D]
        nprev = jnp.minimum(n_prev, w)[:, None, None]      # [B, 1, 1]
        nreal = (nprev + n).astype(data.dtype)
        g = jnp.sum(data, axis=1, keepdims=True) / nreal
        k = jnp.arange(w + n, dtype=jnp.int32)[None, :, None]
        realmask = (k >= (w + n) - nprev - n).astype(data.dtype)
        x = (data - g) * realmask

        j = jnp.arange(n, dtype=jnp.int32)
        t_abs = n_prev[:, None] + j[None, :]               # [B, n]
        cnt = jnp.minimum(t_abs + 1, w).astype(x.dtype)[..., None]
        ks, kg = _prior_counts(cnt, w, cs, speaker_frames,
                               cg, global_frames)
        # priors re-centered by the block mean (cancels exactly)
        sm_c, gm_c = sm - g, gm - g
        smsq_c = smsq - 2.0 * g * sm + g * g
        gmsq_c = gmsq - 2.0 * g * gm + g * g

        lower_mask = (t_abs + 1 < w)[..., None]            # [B, n, 1]
        # per-row short-carry floor pick: cums[b, w - n_prev_b] via a
        # one-hot contraction (a take_along_axis gather here is the op
        # class measured 2.1x the whole pipeline on chip)
        fidx = jnp.clip(w - n_prev, 0, w + n)              # [B]
        onehot = (jnp.arange(w + n + 1, dtype=jnp.int32)[None, :]
                  == fidx[:, None]).astype(x.dtype)        # [B, w+n+1]

        def winsum(v):
            cums = jnp.cumsum(
                jnp.concatenate([jnp.zeros_like(v[:, :1]), v], axis=1),
                axis=1)                                    # [B, w+n+1, D]
            upper = cums[:, w + 1:]                        # cs[j+w+1]
            lower = cums[:, 1: n + 1]                      # cs[j+1]
            floor = jnp.einsum("bk,bkd->bd", onehot, cums)[:, None]
            return upper - jnp.where(lower_mask, floor, lower)

        tot = cnt + ks + kg
        mean = (winsum(x) + ks * sm_c + kg * gm_c) / tot
        out = x[:, w:] - mean
        if norm_vars:
            e2 = (winsum(x * x) + ks * smsq_c + kg * gmsq_c) / tot
            var = jnp.maximum(e2 - mean * mean, 1e-10)
            out = out / jnp.sqrt(var)
        return out, data[:, n:]

    return jax.jit(impl)


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


class StreamingPipeline:
    """The composed online config-3 pipeline (BASELINE.json:configs[3]
    "for online ASR"): front-end -> online Δ -> online ΔΔ -> optional
    running CMVN, behind one ``process()/flush()`` pair.

    Give it a full 39-dim config (e.g. ``KALDI39``) — the front-end runs
    the base 13-dim pipeline internally, ``cfg.delta_order`` chained
    :class:`StreamingDeltas` stages add Δ/ΔΔ/... with the standard
    ``delta_order*delta_window``-frame lookahead delay, and FIFO
    alignment emits complete [base | Δ | ΔΔ | ...] rows in stream order. Base columns are
    bit-exact vs :func:`extract_scan` for hop-aligned plans; the chained
    Δ/ΔΔ columns match the offline :func:`tpufeat.features.deltas`
    operator to 1-ulp FMA-contraction noise (~6e-8 — XLA contracts the
    i*(plus-minus) accumulation differently across chunk shapes; tested
    end-to-end in tests/test_streaming_pipeline.py).

    CMVN: utterance-global CMVN needs the whole utterance, which a live
    stream does not have. ``cfg.cmvn`` in {"mean", "meanvar"} therefore
    applies CAUSAL running normalization (:func:`streaming_cmvn`, Welford
    stats over all frames seen so far) — it converges to the
    utterance-global statistics but early frames are normalized by early
    stats; see docs/STREAMING.md for the divergence characterization.
    ``cfg.cmvn`` in {"sliding", "sliding-meanvar"} applies windowed
    normalization (:class:`StreamingSlidingCMVN`, Kaldi
    ``apply-cmvn-sliding`` semantics) — finite trailing windows, so the
    online output MATCHES the offline :func:`tpufeat.extract` of the same
    config (up to f32 summation order; emission is delayed by
    ``cfg.cmvn_min_window`` frames at stream start). Pass ``cmvn="none"``
    and normalize offline for bit-parity with global CMVN.

    ``pitch=True`` (or a :class:`tpufeat.pitch.PitchConfig`) appends the
    Kaldi-style 3-dim pitch rows (POV, mean-subtracted log-pitch,
    delta-log-pitch) from :class:`tpufeat.pitch.StreamingPitchFeatures`
    on the same hop grid — the online sibling of ``cli --pitch``. The
    pitch correlation window (frame + lag_max samples) is longer than the
    spectral frame, so emission then lags by the pitch tracker's
    ``pitch_lookahead`` Viterbi delay and the unmatched spectral tail is
    dropped at :meth:`flush` exactly like the offline CLI truncation
    (cli.py:163). CMVN (when enabled) covers the spectral columns only,
    matching the offline composition order.

    ``ivector=extractor`` (a :class:`tpufeat.ivector.IvectorExtractor`)
    appends per-frame online i-vectors (Kaldi online2
    ``OnlineIvectorFeature``) as the LAST ``extractor.ivector_dim``
    columns: estimated from the base (pre-delta, pre-CMVN) rows on the
    ``ivector_period`` grid with ``posterior_scale``/``max_count``
    semantics (:class:`tpufeat.ivector.StreamingIvector`), re-aligned
    with the delta/pitch emission lag, and excluded from CMVN — the
    Kaldi nnet3-online input layout [spectral | pitch | ivector].

    ``input_rate=48000`` (or any standard rate) puts a
    :class:`tpufeat.resampling.StreamingResampler` ahead of the
    front-end, so a live mic stream at a non-``cfg.sample_rate`` rate
    feeds the same pipeline; :meth:`flush` drains the resampler's filter
    tail first, matching offline ``resample() -> extract()``.

    Like every streaming wrapper here the internal state is pure pytrees +
    host ints: ``state()``/``set_state()`` round-trip through
    :func:`save_state`/:func:`load_state` for checkpoint/resume.
    """

    def __init__(self, cfg: FeatureConfig = None, batch_size: int = 1,
                 pitch=False, pitch_lookahead: int = 15,
                 input_rate: int | None = None,
                 online_cmvn: "OnlineCmvn | None" = None,
                 transform=None,
                 ivector=None, ivector_period: int = 10,
                 ivector_scale: float = 0.1,
                 ivector_max_count: float = 0.0):
        import dataclasses
        from tpufeat.config import KALDI39
        cfg = KALDI39 if cfg is None else cfg
        # live ingest at a non-cfg rate (e.g. a 48 kHz mic): an online
        # polyphase stage ahead of the front-end (exact vs offline
        # resample(); tpufeat/resampling.py)
        self._input_rate = input_rate
        self._resampler = None
        if input_rate is not None and input_rate != cfg.sample_rate:
            from tpufeat.resampling import StreamingResampler
            self._resampler = StreamingResampler(
                input_rate, cfg.sample_rate, batch_size)
        if not cfg.deltas:
            raise ValueError("StreamingPipeline is the deltas+CMVN "
                             "composition; use StreamingFrontend for "
                             "base-feature configs")
        self.cfg = cfg
        base_cfg = dataclasses.replace(cfg, deltas=False, cmvn="none")
        _check_streamable(base_cfg)
        self.frontend = StreamingFrontend(base_cfg, batch_size)
        dim = base_cfg.feature_dim
        w = cfg.delta_window
        # one online-delta stage per cfg.delta_order; stage i's output is
        # both stage i+1's input and the column block [base|Δ|ΔΔ|...][i+1]
        self.stages = [StreamingDeltas(dim, w, batch_size)
                       for _ in range(cfg.delta_order)]
        self.cmvn_stats = self._scmvn = None
        if cfg.cmvn.startswith("sliding"):
            if cfg.cmvn_center:
                raise ValueError(
                    "streaming sliding CMVN is causal; cmvn_center=True "
                    "needs future context — use offline extract()")
            self._scmvn = StreamingSlidingCMVN(
                cfg.feature_dim, batch_size, cfg.cmvn_window,
                cfg.cmvn_min_window, cfg.cmvn.endswith("meanvar"))
        elif cfg.cmvn != "none":
            self.cmvn_stats = init_cmvn(batch_size, cfg.feature_dim)
        # Kaldi online2-style prior-smoothed CMVN: a pre-configured
        # OnlineCmvn instance (it carries speaker/global stats arrays,
        # which can't live in the frozen config) applied at the same
        # point as the cfg.cmvn variants; mutually exclusive with them
        self._ocmvn = online_cmvn
        if online_cmvn is not None:
            if cfg.cmvn != "none":
                raise ValueError("online_cmvn= replaces cfg.cmvn; set "
                                 f"cmvn='none' (got {cfg.cmvn!r})")
            if online_cmvn.dim != cfg.feature_dim:
                raise ValueError(
                    f"online_cmvn dim {online_cmvn.dim} != pipeline "
                    f"feature_dim {cfg.feature_dim}")
        # alignment FIFOs stay DEVICE-resident (jnp): a np.asarray here
        # would be a synchronous device->host fetch per chunk (~30 ms
        # through the relay, BASELINE.md readback rows) on the
        # latency-critical online path, only to re-upload at _emit.
        # _fifos[0] holds base rows, _fifos[i] stage-i-1 output rows;
        # the LAST stage's output is never queued — it drives emission
        self._fifos = [jnp.zeros((batch_size, 0, dim), jnp.float32)
                       for _ in range(cfg.delta_order)]
        self._pitch = self._pitch_cfg = None
        self._pitch_lookahead = pitch_lookahead
        if pitch:
            from tpufeat.pitch import (PitchConfig, StreamingPitchFeatures,
                                       config_for)
            self._pitch_cfg = (pitch if isinstance(pitch, PitchConfig)
                               else config_for(base_cfg))
            self._pitch = StreamingPitchFeatures(
                self._pitch_cfg, batch_size, pitch_lookahead)
            self._main_fifo = jnp.zeros((batch_size, 0, cfg.feature_dim),
                                        jnp.float32)
            self._pfeat_fifo = jnp.zeros((batch_size, 0, 3), jnp.float32)
        # Kaldi online2 OnlineTransform: a feature-space matrix (fMLLR
        # from tpufeat.fmllr, or an LDA/MLLT estimate) applied to the
        # assembled-and-normalized spectral rows — Kaldi's online nnet
        # input order (feats -> CMVN -> deltas -> LDA/fMLLR). [Do, Di]
        # linear or [Do, Di+1] affine over cfg.feature_dim columns;
        # pitch/ivector columns append AFTER it, untransformed.
        self._transform = None
        if transform is not None:
            t = jnp.asarray(transform, jnp.float32)
            if t.ndim != 2 or t.shape[1] not in (cfg.feature_dim,
                                                 cfg.feature_dim + 1):
                raise ValueError(
                    f"transform {t.shape} does not apply to "
                    f"{cfg.feature_dim}-dim rows (want [Do, "
                    f"{cfg.feature_dim}] or [Do, {cfg.feature_dim + 1}])")
            self._transform = t
            if self._pitch is not None:   # spectral rows now Do wide
                self._main_fifo = jnp.zeros(
                    (batch_size, 0, t.shape[0]), jnp.float32)
        # Kaldi online2 OnlineIvectorFeature composition: per-frame
        # i-vectors estimated from the BASE (pre-delta, pre-CMVN) rows —
        # Kaldi likewise feeds its i-vector UBM a non-CMVN feature
        # stream — appended as the last K columns (after pitch). The
        # i-vector rows are 1:1 with base rows; a FIFO re-aligns them
        # with the delta/pitch emission lag.
        self._ivector = None
        self._iv_args = (ivector_period, ivector_scale, ivector_max_count)
        if ivector is not None:
            from tpufeat.ivector import IvectorExtractor, StreamingIvector
            if not isinstance(ivector, IvectorExtractor):
                raise TypeError("ivector= wants an IvectorExtractor, got "
                                f"{type(ivector).__name__}")
            if ivector.ubm.dim != dim:
                raise ValueError(
                    f"ivector UBM dim {ivector.ubm.dim} != base feature "
                    f"dim {dim} (the extractor must be trained on the "
                    "pipeline's base features)")
            self._ivector = StreamingIvector(
                ivector, batch_size, period=ivector_period,
                posterior_scale=ivector_scale,
                max_count=ivector_max_count)
            self._iv_fifo = jnp.zeros(
                (batch_size, 0, ivector.ivector_dim), jnp.float32)

    @property
    def out_dim(self) -> int:
        """Emitted row width: cfg.feature_dim (or the transform's output
        rows) +3 with pitch, +K with ivector."""
        spectral = (self._transform.shape[0]
                    if self._transform is not None
                    else self.cfg.feature_dim)
        return (spectral
                + (3 if self._pitch is not None else 0)
                + (self._ivector.dim if self._ivector is not None else 0))

    def _emit(self, last_rows: jnp.ndarray) -> jnp.ndarray:
        """Pop n = last_rows rows off every FIFO and assemble the
        [base | Δ | ΔΔ | ...] row block."""
        n = last_rows.shape[1]
        cols = []
        for i, fifo in enumerate(self._fifos):
            cols.append(fifo[:, :n])
            self._fifos[i] = fifo[:, n:]
        out = jnp.concatenate(cols + [last_rows], axis=-1)
        if self.cmvn_stats is not None and n:
            self.cmvn_stats, out = streaming_cmvn(
                self.cmvn_stats, out, jnp.ones(out.shape[:2], bool),
                norm_vars=(self.cfg.cmvn == "meanvar"))
        elif self._scmvn is not None:
            out = self._scmvn.process(out)
        elif self._ocmvn is not None and n:
            out = self._ocmvn.process(out)
        # no `n` guard: a zero-row chunk must still emit the
        # TRANSFORMED width or callers concatenating chunk outputs
        # (and the pitch _join fifo) hit shape mismatches
        return self._apply_tf(out)

    def _apply_tf(self, out: jnp.ndarray) -> jnp.ndarray:
        if self._transform is None:
            return out
        from tpufeat.data import apply_transform
        return apply_transform(out, self._transform)

    def _join(self, main: jnp.ndarray, prows: jnp.ndarray) -> jnp.ndarray:
        """Align completed spectral rows with completed pitch rows and
        emit min(available) combined [main | pov, lp, dlp] rows."""
        self._main_fifo = jnp.concatenate([self._main_fifo, main], axis=1)
        self._pfeat_fifo = jnp.concatenate([self._pfeat_fifo, prows],
                                           axis=1)
        n = min(self._main_fifo.shape[1], self._pfeat_fifo.shape[1])
        out_m, self._main_fifo = (self._main_fifo[:, :n],
                                  self._main_fifo[:, n:])
        out_p, self._pfeat_fifo = (self._pfeat_fifo[:, :n],
                                   self._pfeat_fifo[:, n:])
        return jnp.concatenate([out_m, out_p], axis=-1)

    def process(self, chunk) -> jnp.ndarray:
        """[B, C] (or [C]) raw samples (at ``input_rate`` if set, else
        ``cfg.sample_rate``) -> [B, n, out_dim] complete rows (n lags the
        input by delta_order*delta_window frames, plus the Viterbi
        lookahead when pitch is enabled)."""
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        if self._resampler is not None:
            chunk = self._resampler.process(chunk)
        return self._process_native(chunk)

    def _process_native(self, chunk: jnp.ndarray) -> jnp.ndarray:
        """The post-resample body: chunk already at cfg.sample_rate."""
        base, _ = self.frontend.process(chunk)
        rows = base
        self._fifos[0] = jnp.concatenate([self._fifos[0], base], axis=1)
        if self._ivector is not None and base.shape[1]:
            self._iv_fifo = jnp.concatenate(
                [self._iv_fifo, self._ivector.process(base)], axis=1)
        for i, stage in enumerate(self.stages):
            rows = stage.process(rows)
            if i + 1 < len(self.stages):
                self._fifos[i + 1] = jnp.concatenate(
                    [self._fifos[i + 1], rows], axis=1)
        out = self._emit(rows)
        if self._pitch is not None:
            out = self._join(out, self._pitch.process(chunk))
        return self._append_ivector(out)

    def _append_ivector(self, out: jnp.ndarray) -> jnp.ndarray:
        """Pop as many queued i-vector rows as the main block emitted and
        concat them as the trailing columns."""
        if self._ivector is None:
            return out
        n = out.shape[1]
        iv, self._iv_fifo = self._iv_fifo[:, :n], self._iv_fifo[:, n:]
        return jnp.concatenate([out, iv], axis=-1)

    def flush(self) -> jnp.ndarray:
        """End of stream: drain the delta lookaheads
        (delta_order*delta_window rows
        for streams longer than that) with offline edge replication."""
        pre = None
        if self._resampler is not None:
            tail = self._resampler.flush()
            if tail.shape[1]:
                pre = self._process_native(tail)
        pending = None
        for i, stage in enumerate(self.stages):
            rows = stage.flush() if pending is None else jnp.concatenate(
                [stage.process(pending), stage.flush()], axis=1)
            if i + 1 < len(self.stages):
                self._fifos[i + 1] = jnp.concatenate(
                    [self._fifos[i + 1], rows], axis=1)
            pending = rows
        out = self._emit(pending)
        if self._scmvn is not None:
            # _emit already transformed its rows; the CMVN flush emits
            # RAW-width rows that need the same transform (a short
            # stream can emit EVERY row here)
            out = jnp.concatenate(
                [out, self._apply_tf(self._scmvn.flush())], axis=1)
        assert all(f.shape[1] == 0 for f in self._fifos), \
            "FIFO accounting bug: rows left after flush"
        if self._pitch is not None:
            out = self._join(out, self._pitch.flush())
            assert self._pfeat_fifo.shape[1] == 0, \
                "FIFO accounting bug: pitch rows left after flush"
            # the pitch window (frame + lag_max) is longer than the
            # spectral frame, so the tracker decides fewer frames; drop
            # the unmatched spectral tail — the offline CLI truncates
            # identically
            self._main_fifo = self._main_fifo[:, :0]
        out = self._append_ivector(out)
        if self._ivector is not None:
            assert self._pitch is not None or self._iv_fifo.shape[1] == 0,\
                "FIFO accounting bug: i-vector rows left after flush"
            # with pitch, the dropped spectral tail's i-vector rows drop
            # with it
            self._iv_fifo = self._iv_fifo[:, :0]
        return out if pre is None else jnp.concatenate([pre, out], axis=1)

    def reset(self) -> None:
        b = self._fifos[0].shape[0]
        if self._ocmvn is not None:
            self._ocmvn.reset()   # was silently dropped before round 3
        self.__init__(self.cfg, b,
                      pitch=self._pitch_cfg if self._pitch_cfg else False,
                      pitch_lookahead=self._pitch_lookahead,
                      input_rate=self._input_rate,
                      online_cmvn=self._ocmvn,
                      transform=self._transform,
                      ivector=(self._ivector.extractor
                               if self._ivector is not None else None),
                      ivector_period=self._iv_args[0],
                      ivector_scale=self._iv_args[1],
                      ivector_max_count=self._iv_args[2])

    @property
    def warmup_rows(self) -> int:
        """Conservative bound on transitional rows after
        :meth:`reset_rows`: discard this many emitted rows for the reset
        slot before trusting its output. Delta stages contribute
        ``2 * delta_order * delta_window``: the emission-lag rows queued
        in the FIFOs at reset (zeroed — they belonged to the previous
        utterance) plus the zeroed-carry regression transient — beyond
        it, every delta window covers only the slot's own rows and the
        output is bit-exact vs the zeros-prefix oracle (tested).
        Windowed CMVN adds its window (zeros wash out of the trailing
        statistics); pitch adds the Viterbi restart + its delta chain,
        lag-doubled the same way."""
        w = 2 * self.cfg.delta_order * self.cfg.delta_window
        if self._scmvn is not None:
            w += self._scmvn.window
        elif self._ocmvn is not None:
            w += self._ocmvn.window
        if self._pitch is not None:
            w += 2 * (self._pitch_lookahead
                      + 2 * self._pitch_cfg.delta_window)
        return w

    def reset_rows(self, rows) -> None:
        """Recycle the given batch slots for new streams (serving: the
        endpointer fired, the caller hung up) WITHOUT touching the other
        rows — their outputs stay bit-identical to an un-reset run — or
        the shared chunk schedule. Per stage: the front-end slot restarts
        as a zeros-carrying (silence) stream — bit-exact vs the
        zeros-prefix oracle; delta carries are zeroed (``warmup_rows``
        transient, then exact); running/sliding CMVN statistics restart;
        OnlineCmvn restarts per-row against its priors (Kaldi
        fresh-utterance semantics); pitch restarts from the tracker's
        initial condition. Queued-but-unemitted FIFO rows for the slot
        are zeroed — they belong to the previous utterance and emit as
        part of the warmup."""
        self.frontend.reset_rows(rows)
        for stage in self.stages:
            stage.reset_rows(rows)
        if self.cmvn_stats is not None:
            self.cmvn_stats = RunningCMVN(
                *(zero_rows(leaf, rows) for leaf in self.cmvn_stats))
        if self._scmvn is not None:
            self._scmvn.reset_rows(rows)
        if self._ocmvn is not None:
            self._ocmvn.reset_rows(rows)
        if self._resampler is not None:
            self._resampler.reset_rows(rows)
        self._fifos = [zero_rows(f, rows) if f.shape[1] else f
                       for f in self._fifos]
        if self._pitch is not None:
            self._pitch.reset_rows(rows)
            if self._main_fifo.shape[1]:
                self._main_fifo = zero_rows(self._main_fifo, rows)
            if self._pfeat_fifo.shape[1]:
                self._pfeat_fifo = zero_rows(self._pfeat_fifo, rows)
        if self._ivector is not None:
            # the slot's i-vector restarts at the prior mean (zeros) on
            # its own period grid — fresh-utterance adaptation, no extra
            # warmup beyond the queued rows zeroed here
            self._ivector.reset_rows(rows)
            if self._iv_fifo.shape[1]:
                self._iv_fifo = zero_rows(self._iv_fifo, rows)

    def state(self) -> dict:
        """Full pipeline state as one pytree (host counters included) —
        feed to :func:`save_state` for checkpoint/resume."""
        s = {
            "frontend": self.frontend.state,
            "deltas": [(st.carry, st.n_seen) for st in self.stages],
            "cmvn": self.cmvn_stats,
            "fifos": list(self._fifos),
        }
        if self._resampler is not None:
            s["resampler"] = self._resampler.state()
        if self._scmvn is not None:
            s["scmvn"] = self._scmvn.state()
        if self._ocmvn is not None:
            s["ocmvn"] = self._ocmvn.state()
        if self._pitch is not None:
            s["pitch"] = self._pitch.state()
            s["main_fifo"] = self._main_fifo
            s["pfeat_fifo"] = self._pfeat_fifo
        if self._ivector is not None:
            s["ivector"] = self._ivector.state()
            s["iv_fifo"] = self._iv_fifo
        return s

    def set_state(self, s: dict) -> None:
        self.frontend.state = s["frontend"]
        if len(s["deltas"]) != len(self.stages):
            raise ValueError(
                f"checkpoint has {len(s['deltas'])} delta stages, config "
                f"wants {len(self.stages)} (delta_order mismatch)")
        for stage, (carry, n_seen) in zip(self.stages, s["deltas"]):
            stage.carry, stage.n_seen = carry, int(n_seen)
        self.cmvn_stats = s["cmvn"]
        # mismatched ingest rates must fail loudly: silently dropping the
        # resampler's buffered carry would lose audio at the resume point
        if (self._resampler is not None) != ("resampler" in s):
            raise ValueError(
                "checkpoint/config input_rate mismatch: checkpoint "
                f"{'has' if 'resampler' in s else 'lacks'} resampler "
                f"state, pipeline input_rate={self._input_rate}")
        if self._resampler is not None:
            self._resampler.set_state(s["resampler"])
        if self._scmvn is not None:
            self._scmvn.set_state(s["scmvn"])
        if self._ocmvn is not None:
            self._ocmvn.set_state(s["ocmvn"])
        self._fifos = [jnp.asarray(f) for f in s["fifos"]]
        if self._pitch is not None:
            self._pitch.set_state(s["pitch"])
            self._main_fifo = jnp.asarray(s["main_fifo"])
            self._pfeat_fifo = jnp.asarray(s["pfeat_fifo"])
        if self._ivector is not None:
            if "ivector" not in s:
                raise ValueError("checkpoint lacks i-vector state but the "
                                 "pipeline has ivector= configured")
            self._ivector.set_state(s["ivector"])
            self._iv_fifo = jnp.asarray(s["iv_fifo"])


class PoolRows(Mapping):
    """One serving tick's per-slot rows, as a LAZY mapping over the single
    batched ``[capacity, n, D]`` device array the pipeline step produced.

    Why lazy: on the TPU relay every dispatch costs ~2 ms regardless of
    size (BASELINE.md), so materializing a per-slot slice for every
    attached slot is ~2 ms x B of pure host/dispatch time — measured
    870 ms per tick at B=1024 vs the 4.5 ms device step
    (``benchmarks/experiments/pool_overhead.py``). Here ``rows[slot]``
    slices on demand (control-plane consumers touching a few slots pay a
    dispatch per touched slot), and :meth:`block` hands bulk consumers the
    whole batched array plus the per-slot warmup trims in ZERO extra
    dispatches — fetch once with ``np.asarray`` and trim on the host.

    Mapping semantics match the old eager dict: iteration order is the fed
    slots, ``rows[slot]`` is that slot's ``[n_b, D]`` trimmed rows.
    """

    __slots__ = ("_out", "_skips")

    def __init__(self, out, skips: dict):
        self._out = out          # [capacity, n, D] device-resident
        self._skips = skips      # slot -> leading warmup rows to drop

    def __getitem__(self, slot):
        skip = self._skips[slot]
        return self._out[slot, skip:] if skip else self._out[slot]

    def __iter__(self):
        return iter(self._skips)

    def __len__(self) -> int:
        return len(self._skips)

    def __repr__(self) -> str:
        return (f"PoolRows(slots={sorted(self._skips)}, "
                f"block={tuple(self._out.shape)})")

    def block(self):
        """Zero-dispatch bulk access: ``(out, skips)`` where ``out`` is the
        batched ``[capacity, n, D]`` device array (unleased rows are junk —
        index it by this mapping's keys only) and ``skips[slot]`` is how
        many leading warmup rows of ``out[slot]`` to drop."""
        return self._out, dict(self._skips)


class StreamPool:
    """Slot manager for batched online serving over ONE fixed-shape
    streaming wrapper (:class:`StreamingPipeline` or
    :class:`StreamingFrontend`) — the piece that turns "65,536 concurrent
    streams per chip" (BASELINE.md serving rows) into an operable service:
    real streams start and end at different times, but the compiled step
    has one static [capacity, C] shape, so utterance turnover must recycle
    batch rows in place.

    :meth:`attach` leases a free slot (resetting its row state via
    ``reset_rows`` — other rows bit-unchanged); :meth:`detach` returns it;
    :meth:`process` runs one batched step per tick, feeding zeros to
    unleased rows, and returns ONLY each fed slot's trustworthy rows
    (the wrapper's ``warmup_rows`` transitional rows after attach are
    dropped automatically). The return value is a :class:`PoolRows` lazy
    mapping: ``rows[slot]`` slices on demand (one relay dispatch per
    touched slot), ``rows.block()`` is the zero-dispatch bulk path —
    at serving scale, fetch the block once and trim on the host.

    The composition with :class:`tpufeat.augment.StreamingEndpointer` is
    the full serving control loop: endpointer fires -> ``detach`` ->
    ``attach`` for the next caller. A detached slot's undecided lookahead
    tail (delta/Viterbi lag) is dropped — ends of serving utterances are
    endpointed trailing silence, exactly the rows lookahead would finish.

    All slots share one chunk clock: every ``process`` tick advances every
    row by the same C samples (feed ticks at your serving cadence, e.g.
    100 ms). Per-slot chunk SIZES cannot differ — that would need per-row
    dynamic fills, the gather-class path measured 30x slower (framing.py).
    """

    def __init__(self, pipeline, warmup: int | None = None):
        self.pipeline = pipeline
        if hasattr(pipeline, "_fifos"):              # StreamingPipeline
            self.capacity = pipeline._fifos[0].shape[0]
        else:                                        # StreamingFrontend
            self.capacity = pipeline.state.buf.shape[0]
        self.warmup = (getattr(pipeline, "warmup_rows", 0)
                       if warmup is None else warmup)
        self._free = list(range(self.capacity - 1, -1, -1))
        self._skip: dict[int, int] = {}    # slot -> warmup rows to drop

    @property
    def active(self) -> list:
        return sorted(self._skip)

    @property
    def free_slots(self) -> int:
        return len(self._free)

    def attach(self) -> int:
        """Lease a slot for a new stream; raises when the pool is full
        (size the pipeline's batch for peak concurrency — BASELINE.md
        measures the per-chip budget)."""
        if not self._free:
            raise RuntimeError(f"pool full ({self.capacity} slots); "
                               "detach a stream first")
        slot = self._free.pop()
        self.pipeline.reset_rows([slot])
        self._skip[slot] = self.warmup
        return slot

    def detach(self, slot: int) -> None:
        """End a stream and recycle its slot (no per-slot flush: the
        undecided lookahead tail is endpointed trailing silence)."""
        if slot not in self._skip:
            raise KeyError(f"slot {slot} is not attached")
        del self._skip[slot]
        self._free.append(slot)

    def process(self, chunks: dict) -> "PoolRows":
        """One serving tick: ``{slot: [C] samples}`` for any subset of
        attached slots -> ``{slot: [n_b, D] rows}`` (device-resident;
        n_b varies per slot only through warmup trimming). Unfed slots
        (attached but silent this tick, or unleased) advance on zeros."""
        if not chunks:
            raise ValueError("feed at least one attached slot")
        bad = set(chunks) - set(self._skip)
        if bad:
            raise KeyError(f"slots not attached: {sorted(bad)}")
        sizes = {int(np.shape(c)[-1]) for c in chunks.values()}
        if len(sizes) != 1:
            raise ValueError("all slots share one chunk clock; got chunk "
                             f"sizes {sorted(sizes)}")
        x = np.zeros((self.capacity, sizes.pop()), np.float32)
        for s, c in chunks.items():
            x[s] = np.asarray(c, np.float32)
        out = self.pipeline.process(x)
        if isinstance(out, tuple):                   # frontend: (feats, mask)
            out = out[0]
        return self._trim(out, chunks)

    def process_batch(self, x) -> "PoolRows":
        """Data-plane tick at serving scale: the caller assembles the
        full ``[capacity, C]`` sample block itself (straight from its
        ingest buffers — the per-slot dict of :meth:`process` costs
        host time linear in capacity, measured 2-3 orders above the
        device step at 10k+ slots) and the pool does only the slot
        bookkeeping. Rows of unleased slots are computed but never
        returned (their state is reset on the next :meth:`attach`).
        Returns a :class:`PoolRows` over every ATTACHED slot — use its
        ``block()`` to consume the whole tick in one fetch."""
        if int(np.shape(x)[0]) != self.capacity:
            raise ValueError(f"expected [capacity={self.capacity}, C] "
                             f"block, got {np.shape(x)}")
        out = self.pipeline.process(x)
        if isinstance(out, tuple):                   # frontend: (feats, mask)
            out = out[0]
        return self._trim(out, self._skip)

    def _trim(self, out, slots) -> PoolRows:
        n = out.shape[1]
        skips = {}
        for s in slots:
            skip = min(self._skip[s], n)
            self._skip[s] -= skip
            skips[s] = skip
        return PoolRows(out, skips)
