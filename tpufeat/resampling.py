"""Rational sample-rate conversion as ONE MXU matmul (TPU-native polyphase).

ASR front-ends standardized on 16 kHz, but real audio arrives at 8/22.05/
44.1/48 kHz. The classic CPU implementation is a polyphase FIR (scipy's
``resample_poly``); the TPU-native formulation observes that a block of
``p`` consecutive output samples depends on a fixed-length window of input
advancing by ``q`` samples per block — i.e. resampling IS hop-aligned
framing (the same gather-free ``frames_from_buffer`` the front-end uses)
followed by a single ``[L, p]`` matmul on the MXU:

    y[j*p + r] = sum_t  x[j*q + c0 + t] * H[t, r]

with H block-invariant because shifting the output index by p shifts the
input window by exactly q. The filter is the same windowed-sinc scipy
designs (Kaiser beta=5, 10*max(p,q) half-length, cutoff at the tighter
Nyquist), so outputs match ``scipy.signal.resample_poly`` to float32
precision (parity-tested).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpufeat import framing

__all__ = ["resample", "resample_matrix", "output_length",
           "StreamingResampler"]

HIGHEST = jax.lax.Precision.HIGHEST


def _design_filter(p: int, q: int, beta: float = 5.0) -> np.ndarray:
    """scipy.signal.resample_poly's default FIR: windowed sinc, half length
    10*max(p,q), Kaiser(beta) window, unity DC gain, scaled by p."""
    max_rate = max(p, q)
    f_c = 1.0 / max_rate                      # in Nyquist units (fs = 2)
    half_len = 10 * max_rate
    m = np.arange(2 * half_len + 1, dtype=np.float64) - half_len
    h = f_c * np.sinc(f_c * m) * np.kaiser(2 * half_len + 1, beta)
    h /= h.sum()                              # unity gain at DC
    return h * p


@functools.lru_cache(maxsize=None)
def resample_matrix(p: int, q: int, beta: float = 5.0
                    ) -> tuple[np.ndarray, int]:
    """(H [L, p], c0): block matrix + input offset of the first tap.

    Output sample m = j*p + r reads x[n] for n in a window around
    (m*q + D)/p (D = filter group delay); block j's window starts at
    j*q + c0. Rows of H beyond a tap's support are zero."""
    h = _design_filter(p, q, beta)
    lh = len(h)
    d = (lh - 1) // 2                         # group delay (odd-length FIR)
    # n participates in output m iff 0 <= m*q + D - n*p < lh
    c0 = -(-(0 * q + d - lh + 1) // p)        # ceil((D - lh + 1)/p), m = 0
    n_hi = ((p - 1) * q + d) // p             # last tap row, m = p-1
    L = n_hi - c0 + 1
    H = np.zeros((L, p), dtype=np.float64)
    for r in range(p):
        for t in range(L):
            k = r * q + d - (c0 + t) * p
            if 0 <= k < lh:
                H[t, r] = h[k]
    return H, c0


@functools.lru_cache(maxsize=None)
def resample_matrix_blocked(p: int, q: int, block: int,
                            beta: float = 5.0) -> tuple[np.ndarray, int]:
    """(H_blk [(block-1)*q + L, block*p], c0): ``block`` base blocks
    stacked into one matrix — column j*p + r is base column r shifted
    down j*q rows, SAME taps and same filter as :func:`resample_matrix`.

    Why: for strong decimation the base formulation frames the input
    with window L and hop q << L — an L/q-fold HBM expansion (21x for
    16 kHz -> 2 kHz, measured 8.1 ms of the 19.1 ms pitch tracker at
    B=128x10 s). Blocked, the window is (block-1)*q + L per block*q
    hop — expansion ~1 + L/(block*q) — and the matmul's output axis is
    MXU-wide. Numerics: each output still contracts exactly the same
    168 nonzero taps, but the f32 accumulation TILING differs from the
    base matrix's, so results match to f32 roundoff rather than
    bit-for-bit — hence opt-in (``resample(..., block=...)``); the
    streaming twin's bit-exactness contract stays on the base path."""
    H, c0 = resample_matrix(p, q, beta)
    L = H.shape[0]
    Lb = (block - 1) * q + L
    Hb = np.zeros((Lb, block * p), dtype=np.float64)
    for j in range(block):
        Hb[j * q: j * q + L, j * p: (j + 1) * p] = H
    return Hb, c0


def output_length(n: int, p: int, q: int) -> int:
    """scipy.resample_poly's output length: ceil(n * p / q)."""
    return -(-n * p // q)


def _rational(sr_in: int, sr_out: int) -> tuple[int, int]:
    g = math.gcd(sr_in, sr_out)
    return sr_out // g, sr_in // g


@functools.partial(jax.jit, static_argnames=("p", "q", "n_in", "block"))
def _resample_impl(x: jnp.ndarray, p: int, q: int, n_in: int,
                   block: int = 1) -> jnp.ndarray:
    if block > 1:
        H, c0 = resample_matrix_blocked(p, q, block)
    else:
        H, c0 = resample_matrix(p, q)
    L = H.shape[0]
    hop, per = block * q, block * p
    n_out = output_length(n_in, p, q)
    n_blocks = -(-n_out // per)
    # block j reads x[j*hop + c0 : j*hop + c0 + L]; shift left-pad so the
    # first block starts at 0 (zeros outside the signal, scipy's padtype
    # default)
    pad_l = max(0, -c0)
    need = (n_blocks - 1) * hop + L
    x = jnp.pad(x, ((0, 0), (pad_l, max(0, need - pad_l - x.shape[-1]))))
    frames = framing.frames_from_buffer(x, n_blocks, L, hop)  # [B, nb, L]
    y = jnp.dot(frames, jnp.asarray(H, x.dtype), precision=HIGHEST)
    return y.reshape(x.shape[0], n_blocks * per)[:, :n_out]


@functools.lru_cache(maxsize=None)
def _stream_step_jit(p: int, q: int, chunk_len: int, fill: int,
                     n_ready: int):
    """One streaming-resample step, all shapes static (compiled once per
    (chunk_len, fill) pair, like the front-end's static-fill steps)."""
    H, _ = resample_matrix(p, q)
    L = H.shape[0]

    def impl(buf, chunk):
        B = chunk.shape[0]
        data = jnp.concatenate([buf[:, L - fill:], chunk], axis=-1)
        total = fill + chunk_len
        new_fill = total - n_ready * q
        new_buf = jnp.concatenate(
            [jnp.zeros((B, L - new_fill), data.dtype),
             data[:, n_ready * q:]], axis=-1)
        if n_ready == 0:
            return new_buf, jnp.zeros((B, 0), data.dtype)
        frames = framing.frames_from_buffer(data, n_ready, L, q)
        y = jnp.dot(frames, jnp.asarray(H, data.dtype), precision=HIGHEST)
        return new_buf, y.reshape(B, n_ready * p)

    return jax.jit(impl)


class StreamingResampler:
    """Online sibling of :func:`resample`: rational rate conversion of a
    live stream, chunk in -> resampled samples out, exact vs the offline
    path: concat of any chunk plan + flush == ``resample(whole)`` —
    bit-for-bit on small-filter pairs (8k/16k/48k family, tested
    ``assert_array_equal``) and within ~2 ULP on the 44.1 kHz family,
    where the filter's contraction axis is thousands of taps and XLA's
    dot strategy (hence f32 accumulation order) varies with the number
    of blocks per call (tested at atol 3e-7).

    Works because the offline formulation is block-local — output block j
    (``p`` samples) reads exactly input window ``[j*q + c0, j*q + c0 + L)``
    — so the only state is the < ``L`` not-yet-consumed input samples
    (~filter length; e.g. 48 kHz -> 16 kHz carries 61 samples). Blocks are
    emitted as soon as their window is fully buffered; :meth:`flush`
    appends the virtual right zero-padding and truncates to scipy's
    ``ceil(n*p/q)`` output length. Same host-tracked-fill static-shape
    pattern as the feature streaming wrappers; ``state``/``set_state``
    checkpoint mid-stream.
    """

    def __init__(self, sr_in: int, sr_out: int, batch_size: int = 1):
        self.sr_in, self.sr_out = int(sr_in), int(sr_out)
        self.passthrough = sr_in == sr_out
        self.batch_size = batch_size
        if not self.passthrough:
            self.p, self.q = _rational(self.sr_in, self.sr_out)
            if max(self.p, self.q) > 2048:
                raise ValueError(
                    f"{sr_in} -> {sr_out} Hz reduces to {self.p}/{self.q}"
                    "; chain through an intermediate standard rate")
            H, c0 = resample_matrix(self.p, self.q)
            self._L = H.shape[0]
            self._pad_l = max(0, -c0)
        self.reset()

    def reset(self) -> None:
        """Start a new stream (the left zero-padding is pre-buffered)."""
        self._total = 0
        self._blocks = 0
        if not self.passthrough:
            self._fill = self._pad_l
            self.buf = jnp.zeros((self.batch_size, self._L), jnp.float32)

    def process(self, chunk) -> jnp.ndarray:
        """[B, C] (or [C]) samples at sr_in -> [B, n*p] samples at sr_out
        (possibly 0-length while the filter window fills)."""
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        if chunk.shape[0] != self.batch_size:
            raise ValueError(f"batch {chunk.shape[0]} != resampler batch "
                             f"{self.batch_size}")
        self._total += chunk.shape[1]
        if self.passthrough:
            return chunk
        total = self._fill + chunk.shape[1]
        n_ready = max(0, (total - self._L) // self.q + 1)
        fn = _stream_step_jit(self.p, self.q, chunk.shape[1], self._fill,
                              n_ready)
        self.buf, y = fn(self.buf, chunk)
        self._fill = total - n_ready * self.q
        self._blocks += n_ready
        return y

    def flush(self) -> jnp.ndarray:
        """End of stream: emit the zero-padded tail so the concatenated
        output length is exactly ``output_length(total, p, q)``."""
        if self.passthrough:
            return jnp.zeros((self.batch_size, 0), jnp.float32)
        n_out = output_length(self._total, self.p, self.q)
        n_blocks = -(-n_out // self.p)
        remaining = n_blocks - self._blocks
        if remaining <= 0:
            return jnp.zeros((self.batch_size, 0), jnp.float32)
        zeros_needed = (remaining - 1) * self.q + self._L - self._fill
        fn = _stream_step_jit(self.p, self.q, zeros_needed, self._fill,
                              remaining)
        self.buf, y = fn(self.buf, jnp.zeros(
            (self.batch_size, zeros_needed), jnp.float32))
        self._fill = self._fill + zeros_needed - remaining * self.q
        self._blocks = n_blocks
        return y[:, : n_out - (n_blocks - remaining) * self.p]

    def reset_rows(self, rows) -> None:
        """Slot recycle (serving): zero the rows' filter carry without
        touching the other rows or the shared block clock — the slot
        resamples as a stream that carried zeros from the global start
        (exact: the polyphase window is linear, so a zero carry IS the
        zeros-prefix history). Other rows are bit-unchanged."""
        if not self.passthrough:
            from tpufeat.streaming import zero_rows
            self.buf = zero_rows(self.buf, rows)

    def state(self) -> dict:
        s = {"total": self._total, "blocks": self._blocks}
        if not self.passthrough:
            s.update(buf=self.buf, fill=self._fill)
        return s

    def set_state(self, s: dict) -> None:
        self._total = int(s["total"])
        self._blocks = int(s["blocks"])
        if not self.passthrough:
            self.buf = jnp.asarray(s["buf"])
            self._fill = int(s["fill"])


def resample(signal, sr_in: int, sr_out: int, *,
             block: int = 1) -> jnp.ndarray:
    """Resample [N] or [B, N] float audio from sr_in to sr_out Hz.

    One gather-free framing pass + one MXU matmul; matches
    scipy.signal.resample_poly(x, p, q) (Kaiser-5 windowed sinc) to float32
    precision. Returns [(B,) ceil(N*p/q)].

    ``block > 1`` stacks that many polyphase blocks per matmul row
    (:func:`resample_matrix_blocked`) — same taps, ~block-fold less HBM
    framing traffic for strong decimation, f32-roundoff-equal rather
    than bit-equal to the base path (which the streaming twin's
    exactness contract pins).

    The block matrix is [~(q + 20*max(p,q)/p), p], so the rates must share
    a reasonable common divisor (every standard audio-rate pair does —
    44.1k/16k is p/q = 160/441). Co-prime pathological pairs are rejected
    rather than silently allocating a multi-GB matrix."""
    x = jnp.asarray(signal)
    if x.dtype == jnp.int16:          # same promotion as features._prep
        x = x.astype(jnp.float32) / 32768.0
    else:
        x = x.astype(jnp.float32)
    if sr_in == sr_out:
        return x
    p, q = _rational(sr_in, sr_out)
    if max(p, q) > 2048:
        raise ValueError(
            f"{sr_in} -> {sr_out} Hz reduces to {p}/{q}; filter/matrix size "
            f"scales with max(p, q) = {max(p, q)} (> 2048). Resample via an "
            f"intermediate standard rate instead.")
    single = x.ndim == 1
    if single:
        x = x[None]
    y = _resample_impl(x, p, q, x.shape[-1], int(block))
    return y[0] if single else y
