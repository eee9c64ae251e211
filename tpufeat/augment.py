"""Training-time feature augmentation + energy VAD (TPU-native, masked).

SpecAugment (Park et al., 2019) is the standard ASR training augmentation
applied to log-mel features. The TPU-native formulation is fully
vectorized: mask positions/widths are drawn per utterance with an explicit
PRNG key (pure function — composable with pmap/shard_map without seed
plumbing), and the masks are built by iota comparisons — no dynamic
shapes, no gathers, O(B*T*D) elementwise work that XLA fuses into
whatever consumes the features.

Time masks respect each utterance's TRUE length (masks are placed inside
[0, num_frames) and padding frames are left untouched), so augmentation
composes with the padded/masked batching used everywhere else.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["spec_augment", "energy_vad", "add_noise", "add_reverb",
           "speed_perturb", "StreamingEnergyVAD", "EndpointRule",
           "DEFAULT_ENDPOINT_RULES", "StreamingEndpointer",
           "speech_segments", "segments_to_samples"]


@functools.partial(
    jax.jit,
    static_argnames=("n_freq_masks", "freq_width", "n_time_masks",
                     "time_width", "time_width_ratio", "fill"))
def spec_augment(feats: jnp.ndarray, num_frames: jnp.ndarray,
                 rng: jnp.ndarray, *,
                 n_freq_masks: int = 2, freq_width: int = 27,
                 n_time_masks: int = 2, time_width: int = 100,
                 time_width_ratio: float | None = None,
                 fill: str = "mean") -> jnp.ndarray:
    """SpecAugment masking: feats [B, T, D] -> masked copy.

    Per utterance: ``n_freq_masks`` bands of width U[0, freq_width) on the
    feature axis and ``n_time_masks`` spans of width U[0, time_width) on
    the time axis (clamped inside the utterance's valid ``num_frames``).
    ``time_width_ratio`` switches the time-mask budget to the ADAPTIVE
    policy (Park et al. 2020, large-scale SpecAugment): max width =
    ratio * num_frames per utterance instead of the fixed ``time_width``
    — short utterances stop being over-masked. ``fill`` is "mean"
    (per-utterance masked mean, the common choice for normalized
    features) or "zero".
    """
    B, T, D = feats.shape
    nf = jnp.maximum(num_frames.astype(jnp.int32), 1)          # [B]
    keys = jax.random.split(rng, 4)

    t_idx = jnp.arange(T)[None, :, None]                       # [1, T, 1]
    d_idx = jnp.arange(D)[None, None, :]                       # [1, 1, D]
    masked = jnp.zeros((B, T, D), bool)

    # frequency masks: start U[0, D - w], width w ~ U[0, freq_width]
    fw = jax.random.randint(keys[0], (B, n_freq_masks), 0,
                            min(freq_width, D) + 1)            # [B, M]
    f0 = (jax.random.uniform(keys[1], (B, n_freq_masks))
          * (D - fw)).astype(jnp.int32)
    hit_f = jnp.any(
        (d_idx[..., None] >= f0[:, None, None, :])
        & (d_idx[..., None] < (f0 + fw)[:, None, None, :]), axis=-1)
    masked = masked | hit_f

    # time masks: width w ~ U[0, min(time_width, nf)], start U[0, nf - w];
    # adaptive policy: the width budget scales with the utterance length
    if time_width_ratio is not None:
        max_tw = (time_width_ratio * nf).astype(jnp.int32)[:, None]
        max_tw = jnp.minimum(max_tw, nf[:, None])
    else:
        max_tw = jnp.minimum(time_width, nf)[:, None]           # [B, 1]
    tw = (jax.random.uniform(keys[2], (B, n_time_masks))
          * (max_tw + 1)).astype(jnp.int32)
    t0 = (jax.random.uniform(keys[3], (B, n_time_masks))
          * (nf[:, None] - tw)).astype(jnp.int32)
    hit_t = jnp.any(
        (t_idx[..., None] >= t0[:, None, None, :])
        & (t_idx[..., None] < (t0 + tw)[:, None, None, :]), axis=-1)
    masked = masked | hit_t

    # never touch padding frames — gate on the TRUE num_frames (nf is
    # clamped to >=1 only to keep the width draws well-defined; an
    # all-padding utterance must come back untouched)
    valid = t_idx[..., 0] < num_frames.astype(jnp.int32)[:, None]  # [B, T]
    masked = masked & valid[..., None]

    if fill == "mean":
        m = valid[..., None].astype(feats.dtype)
        cnt = jnp.maximum(m.sum(axis=(1, 2)) * D, 1.0)   # valid frames x D
        mean = (feats * m).sum(axis=(1, 2)) / cnt              # [B]
        fill_val = mean[:, None, None]
    elif fill == "zero":
        fill_val = jnp.zeros((), feats.dtype)
    else:
        raise ValueError(f"unknown fill {fill!r}")
    return jnp.where(masked, fill_val, feats)


@functools.partial(jax.jit, static_argnames=("frames_context",))
def kaldi_vad(log_energy: jnp.ndarray, num_frames=None, *,
              energy_threshold: float = 5.0,
              energy_mean_scale: float = 0.5,
              frames_context: int = 0,
              proportion_threshold: float = 0.6) -> jnp.ndarray:
    """Kaldi ``compute-vad`` (``VadEnergyOptions`` semantics — the VAD
    the i-vector/x-vector recipes train on): per-frame decisions from
    the LOG ENERGY track (Kaldi uses MFCC c0; pass ``features[..., 0]``
    of a ``kaldi_mode`` config, or a frame log-energy column).

    threshold = ``energy_threshold`` + ``energy_mean_scale`` * (mean log
    energy over the utterance's VALID frames); frame t is speech iff at
    least ``proportion_threshold`` of the frames in its
    ``[t - frames_context, t + frames_context]`` window (clipped to the
    utterance) exceed the threshold. [B, T] (+ optional [B] frame
    counts) -> [B, T] bool; padding frames are False. Windowed counts
    are shifted cumulative sums (two static pads + slices — no gathers,
    the sliding-CMVN trick)."""
    e = jnp.asarray(log_energy, jnp.float32)
    squeeze = e.ndim == 1
    if squeeze:
        e = e[None]
    B, T = e.shape
    if num_frames is None:
        valid = jnp.ones((B, T), jnp.float32)
    else:
        nf = jnp.atleast_1d(jnp.asarray(num_frames))  # scalar count for
        valid = (jnp.arange(T)[None, :]               # a 1-D track is fine
                 < nf[:, None]).astype(jnp.float32)
    n = jnp.maximum(valid.sum(axis=1, keepdims=True), 1.0)
    thresh = (energy_threshold
              + energy_mean_scale * (e * valid).sum(axis=1,
                                                    keepdims=True) / n)
    above = ((e > thresh) & (valid > 0)).astype(jnp.float32)
    c = int(frames_context)
    if c == 0:
        out = above > 0
    else:
        # windowed numerator/denominator over [t-c, t+c] clipped to the
        # utterance: inclusive-cumsum differences on zero-padded tracks
        def winsum(v):
            cs = jnp.cumsum(
                jnp.pad(v, ((0, 0), (1, 0))), axis=1)       # [B, T+1]
            hi = jnp.pad(cs[:, 1:], ((0, 0), (0, c)),
                         mode="edge")[:, c:]                # sum to t+c
            lo = jnp.pad(cs[:, :-1], ((0, 0), (c, 0)))[:, :T]
            return hi - lo
        num = winsum(above)
        den = jnp.maximum(winsum(valid), 1.0)
        out = (num >= proportion_threshold * den) & (valid > 0)
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("frame_length", "hop_length",
                                             "threshold_db"))
def energy_vad(signal: jnp.ndarray, lengths: jnp.ndarray,
               frame_length: int = 400, hop_length: int = 160,
               threshold_db: float = -40.0) -> jnp.ndarray:
    """Energy-based voice activity detection: [B, N] samples -> [B, F]
    bool speech mask (True = frame energy within ``threshold_db`` of the
    utterance's peak frame energy). Frames past an utterance's true length
    are False. The classic cheap serving-side gate before a heavy encoder.
    """
    from tpufeat import framing
    from tpufeat.config import FeatureConfig
    cfg = FeatureConfig(frame_length=frame_length, hop_length=hop_length,
                        preemphasis=0.0)
    frames, mask = framing.frame_signal(
        jnp.asarray(signal, jnp.float32), jnp.asarray(lengths, jnp.int32),
        cfg)
    e = jnp.sum(frames * frames, axis=-1)                      # [B, F]
    e_db = 10.0 * jnp.log10(jnp.maximum(e, 1e-12))
    peak = jnp.max(jnp.where(mask, e_db, -jnp.inf), axis=-1, keepdims=True)
    peak = jnp.where(jnp.isfinite(peak), peak, 0.0)
    return (e_db >= peak + threshold_db) & mask


@functools.partial(jax.jit, static_argnames=())
def add_noise(signal: jnp.ndarray, noise: jnp.ndarray,
              lengths: jnp.ndarray, snr_db: jnp.ndarray) -> jnp.ndarray:
    """Mix noise into signal at a target SNR (the additive half of the
    standard training-time augmentation pair; speed perturbation is the
    other): [B, N] + [B, N] -> [B, N].

    The noise is scaled per utterance so that over the VALID samples
    (``lengths``-masked) 10*log10(P_signal / P_noise_scaled) == snr_db;
    padding samples stay untouched. ``snr_db`` broadcasts: scalar or [B]
    (per-utterance SNR draws compose with an explicit PRNG upstream).
    Silence is safe: zero-power signal leaves the mix unscaled-noise-free
    (scale 0) rather than dividing by zero."""
    x = jnp.asarray(signal, jnp.float32)
    v = jnp.asarray(noise, jnp.float32)
    m = (jnp.arange(x.shape[-1]) < jnp.asarray(lengths)[:, None]).astype(
        x.dtype)
    n_valid = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    p_sig = jnp.sum(x * x * m, axis=-1) / n_valid
    p_noi = jnp.sum(v * v * m, axis=-1) / n_valid
    want = p_sig / 10.0 ** (jnp.asarray(snr_db, x.dtype) / 10.0)
    scale = jnp.sqrt(want / jnp.maximum(p_noi, 1e-20))
    scale = jnp.where(p_noi > 0, scale, 0.0)
    return x + scale[:, None] * v * m


@functools.partial(jax.jit, static_argnames=("shift_to_peak", "normalize"))
def add_reverb(signal: jnp.ndarray, rir: jnp.ndarray,
               lengths: jnp.ndarray, *, shift_to_peak: bool = True,
               normalize: bool = True) -> jnp.ndarray:
    """Convolve each utterance with a room impulse response (the
    reverberant half of the far-field training-augmentation recipe;
    Kaldi ``wav-reverberate`` semantics): [B, N] x [B, R] (or a shared
    [R]) -> [B, N].

    The convolution is one batched rFFT multiply (length padded to the
    next power of two — the TPU-native formulation; a time-domain FIR
    would be an [N, R] matmul per utterance, 3 orders more FLOPs at
    typical R). Per Kaldi's defaults:

      - ``shift_to_peak``: the output is advanced by the RIR's peak
        (direct-path) index so the reverberated audio stays time-aligned
        with the dry signal — supervision timestamps survive.
      - ``normalize``: output is rescaled per utterance so its power over
        the VALID samples matches the dry signal's (``--normalize-output``).

    Padding contract: samples at/after ``lengths`` come back zero — the
    reverb tail past the utterance end is dropped, and padding never
    leaks into the convolution. Silence-safe: an all-zero (or
    all-padding) utterance returns zeros.
    """
    x = jnp.asarray(signal, jnp.float32)
    h = jnp.asarray(rir, jnp.float32)
    if h.ndim == 1:
        h = jnp.broadcast_to(h[None, :], (x.shape[0], h.shape[-1]))
    N, R = x.shape[-1], h.shape[-1]
    m = (jnp.arange(N) < jnp.asarray(lengths)[:, None]).astype(x.dtype)
    x = x * m
    nfft = 1 << max(1, (N + R - 2)).bit_length()        # >= N + R - 1
    y = jnp.fft.irfft(jnp.fft.rfft(x, n=nfft) * jnp.fft.rfft(h, n=nfft),
                      n=nfft)[..., :N + R - 1]
    if shift_to_peak:
        d = jnp.argmax(jnp.abs(h), axis=-1)             # [B]
        y = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (N,)))(y, d)
    else:
        y = y[..., :N]
    y = y * m
    if normalize:
        p_in = jnp.sum(x * x, axis=-1)
        p_out = jnp.sum(y * y, axis=-1)
        scale = jnp.sqrt(p_in / jnp.maximum(p_out, 1e-20))
        y = y * jnp.where(p_out > 0, scale, 0.0)[:, None]
    return y


class StreamingEnergyVAD:
    """Causal sibling of :func:`energy_vad`: per-frame speech decisions
    from a live stream, gating each frame against the RUNNING peak frame
    energy (the utterance peak is unknowable online).

    Properties (tested):
      - chunk-plan invariant: any chunking of the same audio yields the
        same decisions (the running cummax is causal and deterministic);
      - matches offline :func:`energy_vad` from the global-peak frame
        onward — and for the whole utterance when the loudest frame
        comes first. Early frames are judged against the early peak, so
        they can only be MORE permissive than offline (peak only grows);
        the classic online-VAD asymmetry, same shape as running CMVN's
        (docs/STREAMING.md).

    State: a (frame_length - hop)-sample carry + the running peak, all
    device-resident; host-tracked fill like the other wrappers."""

    def __init__(self, batch_size: int = 1, frame_length: int = 400,
                 hop_length: int = 160, threshold_db: float = -40.0):
        if hop_length > frame_length:
            raise ValueError("hop > frame_length leaves gaps")
        self.frame_length, self.hop_length = frame_length, hop_length
        self.threshold_db = float(threshold_db)
        self._cap = frame_length - 1
        self.buf = jnp.zeros((batch_size, self._cap), jnp.float32)
        self.peak_db = jnp.full((batch_size,), -jnp.inf, jnp.float32)
        self._fill = 0

    def process(self, chunk) -> jnp.ndarray:
        """[B, C] (or [C]) raw samples -> [B, n_new] bool speech flags."""
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        W, hop = self.frame_length, self.hop_length
        total = self._fill + chunk.shape[1]
        n_new = max(0, 1 + (total - W) // hop)
        fn = _vad_step_jit(chunk.shape[1], W, hop, self._fill, n_new,
                           self.threshold_db)
        self.buf, self.peak_db, out = fn(self.buf, self.peak_db, chunk)
        self._fill = total - n_new * hop
        return out

    def reset_rows(self, rows) -> None:
        """Slot recycle (serving): zero the rows' sample carry and reset
        their running peak to -inf, so the recycled slot judges speech
        like a fresh stream — the peak is per-utterance state, and
        without this a quiet new caller would be gated against the
        previous caller's loud peak. Other rows are bit-unchanged; the
        shared fill clock keeps running. Decisions on the reset row are
        exactly those of a zeros-prefix stream under the same chunk plan
        (a zero frame's -120 dB energy folds into the first real frame's
        cummax either way; tested)."""
        from tpufeat.streaming import zero_rows
        self.buf = zero_rows(self.buf, rows)
        self.peak_db = zero_rows(self.peak_db, rows, value=-np.inf)

    def state(self) -> dict:
        return {"buf": self.buf, "peak_db": self.peak_db,
                "fill": self._fill}

    def set_state(self, s: dict) -> None:
        self.buf = jnp.asarray(s["buf"])
        self.peak_db = jnp.asarray(s["peak_db"])
        self._fill = int(s["fill"])


@functools.lru_cache(maxsize=None)
def _vad_step_jit(chunk_len: int, W: int, hop: int, fill: int, n_new: int,
                  threshold_db: float):
    cap = W - 1

    def impl(buf, peak_db, chunk):
        B = chunk.shape[0]
        data = jnp.concatenate([buf[:, cap - fill:], chunk], axis=-1)
        total = fill + chunk_len
        leftover = data[:, n_new * hop:]
        new_buf = jnp.concatenate(
            [jnp.zeros((B, cap - (total - n_new * hop)), data.dtype),
             leftover], axis=-1)
        if n_new == 0:
            return new_buf, peak_db, jnp.zeros((B, 0), bool)
        from tpufeat import framing
        frames = framing.frames_from_buffer(data, n_new, W, hop)
        e = jnp.sum(frames * frames, axis=-1)
        e_db = 10.0 * jnp.log10(jnp.maximum(e, 1e-12))
        run_peak = jax.lax.cummax(
            jnp.maximum(e_db, peak_db[:, None]), axis=1)
        out = e_db >= run_peak + threshold_db
        return new_buf, run_peak[:, -1], out

    return jax.jit(impl)


def speech_segments(speech_flags, *, min_silence: int = 30,
                    min_speech: int = 10, pad: int = 5):
    """Turn a per-frame speech mask into (start, end) frame segments —
    the offline half of the VAD story (Kaldi's segmentation /
    ``extract-segments`` flow; the online half is
    :class:`StreamingEndpointer`).

    [F] bool -> list of (start, end) half-open frame intervals, or
    [B, F] -> list of such lists. Silence gaps shorter than
    ``min_silence`` frames are bridged, segments shorter than
    ``min_speech`` are dropped, and each surviving segment is padded by
    ``pad`` frames per side (clamped to [0, F]; padding can re-join
    segments, which are then merged). Host control logic over decisions
    that are already host-bound.
    """
    flags = np.asarray(speech_flags, bool)
    if flags.ndim == 2:
        return [speech_segments(row, min_silence=min_silence,
                                min_speech=min_speech, pad=pad)
                for row in flags]
    F = flags.shape[0]
    edges = np.flatnonzero(np.diff(np.concatenate(
        [[False], flags, [False]]).astype(np.int8)))
    runs = list(zip(edges[::2], edges[1::2]))          # raw speech runs
    merged = []
    for s, e in runs:                                  # bridge short gaps
        if merged and s - merged[-1][1] < min_silence:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    out = []
    for s, e in merged:
        if e - s < min_speech:
            continue
        s, e = max(0, s - pad), min(F, e + pad)
        if out and s <= out[-1][1]:                    # pad re-joined them
            out[-1] = (out[-1][0], e)
        else:
            out.append((s, e))
    return out


def segments_to_samples(segments, cfg) -> list:
    """Frame segments -> half-open SAMPLE ranges under ``cfg``'s frame
    grid. Snip-edges (``center=False``): frame t covers
    [t*hop, t*hop + frame_length). Centered configs: frame t is centered
    on t*hop, so the span shifts left by frame_length//2 (clamped at 0;
    the reflect padding has no real samples to point at)."""
    hop, flen = cfg.hop_length, cfg.frame_length
    off = flen // 2 if cfg.center else 0
    return [(max(0, s * hop - off), (e - 1) * hop + flen - off)
            for s, e in segments]


@dataclasses.dataclass(frozen=True)
class EndpointRule:
    """One endpointing rule (Kaldi ``OnlineEndpoint`` semantics): fires
    when ALL of its conditions hold for an utterance —

      - ``must_contain_speech``: speech has been seen since the last
        reset (Kaldi's must-contain-nonsilence);
      - trailing silence has lasted >= ``min_trailing_silence_s``;
      - the utterance is >= ``min_utterance_length_s`` long.
    """
    must_contain_speech: bool = True
    min_trailing_silence_s: float = 1.0
    min_utterance_length_s: float = 0.0


#: Kaldi's classic trade-off, restated for a VAD-flag front-end: give up
#: after 5 s of pure silence; close an utterance after 1 s of trailing
#: silence once speech was heard; never run past 20 s.
DEFAULT_ENDPOINT_RULES = (
    EndpointRule(must_contain_speech=False, min_trailing_silence_s=5.0),
    EndpointRule(must_contain_speech=True, min_trailing_silence_s=1.0),
    EndpointRule(must_contain_speech=True, min_trailing_silence_s=0.0,
                 min_utterance_length_s=20.0),
)


class StreamingEndpointer:
    """Turn per-frame speech flags (e.g. from :class:`StreamingEnergyVAD`)
    into end-of-utterance decisions, Kaldi ``OnlineEndpoint``-style.

    This is control logic, not compute: the state is three small counters
    per stream, kept on host (the flags are already host-bound decisions).
    Chunk-plan invariant by construction — the counters depend only on
    the flag sequence, not on how it was chunked (tested).

    Usage::

        vad = StreamingEnergyVAD(batch_size=B)
        ep = StreamingEndpointer(batch_size=B)
        for chunk in stream:
            done = ep.update(vad.process(chunk))   # [B] bool
            for b in np.flatnonzero(done):
                ...  # close utterance b, then ep.reset(b)
    """

    def __init__(self, rules=DEFAULT_ENDPOINT_RULES,
                 frame_shift_s: float = 0.010, batch_size: int = 1):
        if not rules:
            raise ValueError("need at least one EndpointRule")
        self.rules = tuple(rules)
        self.frame_shift_s = float(frame_shift_s)
        self.frames_seen = np.zeros(batch_size, np.int64)
        self.trailing_silence = np.zeros(batch_size, np.int64)
        self.seen_speech = np.zeros(batch_size, bool)

    def update(self, speech_flags) -> np.ndarray:
        """[B, F] (or [F]) bool speech flags -> [B] bool endpoint-now."""
        flags = np.asarray(speech_flags, bool)
        if flags.ndim == 1:
            flags = flags[None]
        B, F = flags.shape
        if B != self.frames_seen.shape[0]:
            raise ValueError(f"batch {B} != endpointer batch "
                             f"{self.frames_seen.shape[0]}")
        if F:
            self.frames_seen += F
            any_speech = flags.any(axis=1)
            self.seen_speech |= any_speech
            # trailing run of silence == leading run of False in reverse
            trailing = np.argmax(flags[:, ::-1], axis=1)
            self.trailing_silence = np.where(
                any_speech, trailing, self.trailing_silence + F)
        return self.decision()

    def decision(self) -> np.ndarray:
        """[B] bool: does any rule fire at the current state?"""
        shift = self.frame_shift_s
        length_s = self.frames_seen * shift
        trail_s = self.trailing_silence * shift
        out = np.zeros_like(self.seen_speech)
        for r in self.rules:
            hit = (trail_s >= r.min_trailing_silence_s) \
                & (length_s >= max(r.min_utterance_length_s, shift))
            if r.must_contain_speech:
                hit &= self.seen_speech
            out |= hit
        return out

    def reset(self, row=None) -> None:
        """Start a new utterance on ``row`` (or all rows)."""
        idx = slice(None) if row is None else row
        self.frames_seen[idx] = 0
        self.trailing_silence[idx] = 0
        self.seen_speech[idx] = False

    def reset_rows(self, rows) -> None:
        """Slot-recycle spelling of :meth:`reset` — same verb as every
        other streaming wrapper, so pool-driven serving code can reset
        the full per-slot chain (pipeline + VAD + endpointer) uniformly
        on detach/attach."""
        self.reset(np.asarray(list(rows), int))

    def state(self) -> dict:
        return {"frames_seen": self.frames_seen.copy(),
                "trailing_silence": self.trailing_silence.copy(),
                "seen_speech": self.seen_speech.copy()}

    def set_state(self, s: dict) -> None:
        self.frames_seen = np.asarray(s["frames_seen"], np.int64).copy()
        self.trailing_silence = np.asarray(
            s["trailing_silence"], np.int64).copy()
        self.seen_speech = np.asarray(s["seen_speech"], bool).copy()


def speed_perturb(signal, sr: int, factor: float, lengths=None):
    """Kaldi-style speed perturbation (0.9/1.0/1.1 are the classic
    triple): resample so the audio plays ``factor``x faster — output
    length ~ N/factor, pitch and formants shift together (sox ``speed``,
    not tempo). Rides the polyphase MXU resampler: sample rate
    ``sr*factor -> sr`` with the rational reduced internally.

    With ``lengths`` (padded batches) returns ``(y, new_lengths)``: the
    polyphase zero-pads edges, so each padded row's valid prefix
    resamples identically to the lone utterance, and the new valid
    length is ``ceil(len * p / q)``."""
    from tpufeat import resampling
    sr_in = int(round(sr * factor))
    if sr_in <= 0:
        raise ValueError(f"factor {factor} gives non-positive rate")
    if abs(sr_in - sr * factor) > 1e-6:
        raise ValueError(f"sr*factor must be integral (got {sr * factor})")
    if factor == 1.0:
        y = jnp.asarray(signal, jnp.float32)
        return y if lengths is None else (y, jnp.asarray(lengths,
                                                         jnp.int32))
    y = resampling.resample(signal, sr_in, sr)
    if lengths is None:
        return y
    p, q = resampling._rational(sr_in, sr)
    # host int64: n*p overflows int32 for hour-scale n at 44.1k-family p
    new = -(-np.asarray(lengths, np.int64) * p // q)
    return y, jnp.asarray(new.astype(np.int32))
