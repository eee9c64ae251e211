"""Pitch tracking — NCCF + Viterbi smoothing (beyond-reference capability).

Ghahremani et al. 2014 ("A pitch extraction algorithm tuned for ASR") is
the model: per-frame Normalized Cross-Correlation Function over candidate
lags, a Viterbi pass that trades correlation strength against
log-lag-jump penalties (so octave errors and jitter are smoothed out),
and Kaldi-style 3-dim output features (POV, mean-subtracted log-pitch,
delta-log-pitch) to append to MFCC/fbank/PLP for tonal-language ASR.

TPU-first formulation (all static shapes, one jitted program):
  - NCCF numerators for ALL lags at once per frame: one batched rFFT
    cross-correlation (conj(F(a)) * F(b) -> irFFT), not a lag loop;
  - denominator energies via a cumulative-sum sliding window;
  - Viterbi forward as ``lax.scan`` over frames with an [L, L]
    broadcast-max per step (L ~ a few hundred integer lags); the
    backtrace rides a second scan over the stored argmax table. Padded
    frames carry identity backpointers and a frozen score row, so the
    backtrace through the padded tail lands exactly on the last VALID
    frame's best path (mask-invariance is property-tested).

Deviations from Kaldi (documented, deliberate): integer lags at the
native sample rate (no 2 kHz lag resampling), offline whole-utterance
Viterbi (no online lattice pruning), and a per-utterance RMS ballast.
Golden twin: ``tpufeat.reference.cpu.pitch`` (float64, direct correlation
loops + plain-Python Viterbi).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PitchConfig:
    """Pitch-tracker knobs (frozen/hashable -> one compile per config)."""
    sample_rate: int = 16000
    frame_length: int = 400          # 25 ms correlation window
    hop_length: int = 160            # 10 ms
    min_f0: float = 50.0             # Hz -> largest candidate lag
    max_f0: float = 400.0            # Hz -> smallest candidate lag
    penalty: float = 4.0             # Viterbi log-lag-jump cost weight
    ballast: float = 1.0             # NCCF denominator ballast weight
    #                                  (suppresses spurious correlation
    #                                  peaks in silence/noise)
    lag_bias: float = 0.05           # short-lag preference per ln(lag):
    #                                  a periodic signal scores ~equally at
    #                                  every MULTIPLE of its true lag (and
    #                                  integer quantization can favor the
    #                                  multiple), so the Viterbi sees
    #                                  nccf - lag_bias*ln(lag/lag_min) and
    #                                  resolves the tie to the true
    #                                  fundamental; POV reports the RAW
    #                                  nccf. Sub-multiple lags score ~-1
    #                                  for periodic signals, so the small
    #                                  tilt cannot cause upward octave
    #                                  errors.
    delta_window: int = 2            # delta-log-pitch regression window

    @property
    def lag_min(self) -> int:
        return max(1, int(self.sample_rate / self.max_f0))

    @property
    def lag_max(self) -> int:
        return int(self.sample_rate / self.min_f0)

    @property
    def n_lags(self) -> int:
        return self.lag_max - self.lag_min + 1

    def num_frames(self, n_samples: int) -> int:
        """Snip-edges frames over the EXTENDED window (frame + lag_max)."""
        w = self.frame_length + self.lag_max
        if n_samples < w:
            return 0
        return 1 + (n_samples - w) // self.hop_length


@functools.lru_cache(maxsize=None)
def _transition_matrix(cfg: PitchConfig) -> np.ndarray:
    """[L, L] Viterbi transition costs penalty * log(lag_j/lag_i)^2."""
    lags = np.arange(cfg.lag_min, cfg.lag_max + 1, dtype=np.float64)
    ll = np.log(lags)
    return (cfg.penalty * (ll[:, None] - ll[None, :]) ** 2).astype(
        np.float32)


def nccf(signal: jnp.ndarray, lengths: jnp.ndarray,
         cfg: PitchConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched NCCF: [B, N] -> (nccf [B, F, L], frame validity [B, F]).

    nccf(t, l) = sum_i a_i b_{i+l} / sqrt(E0 * E_l + ballast), with
    a = the frame's first ``frame_length`` samples, b = the extended
    window, and ballast = cfg.ballast * (frame_length * rms^2)^2 from the
    per-utterance masked RMS (zero-signal frames score ~0, not 0/0)."""
    W, hop = cfg.frame_length, cfg.hop_length
    L0, L1 = cfg.lag_min, cfg.lag_max
    wext = W + L1
    B, N = signal.shape
    F = cfg.num_frames(N)
    if F <= 0:
        z = jnp.zeros((B, 0, cfg.n_lags), jnp.float32)
        return z, jnp.zeros((B, 0), bool)

    # extended frames [B, F, W + lag_max] — gather-free strided slices
    from tpufeat import framing
    frames = framing.frames_from_buffer(signal, F, wext, hop)
    a = frames[..., :W]

    # numerators for all lags at once: cross-correlation by rFFT
    nfft = int(2 ** np.ceil(np.log2(wext + W)))
    fa = jnp.fft.rfft(a, n=nfft, axis=-1)
    fb = jnp.fft.rfft(frames, n=nfft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(fa) * fb, n=nfft, axis=-1)
    num = corr[..., L0: L1 + 1]                     # [B, F, L]

    # windowed energies E_l = sum_{i=l}^{l+W-1} b_i^2 via cumsum
    cs = jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(frames[..., :1]), frames * frames], axis=-1),
        axis=-1)
    e = cs[..., W:] - cs[..., :-W]                  # E_l for l = 0..lag_max
    e0 = e[..., :1]
    el = e[..., L0: L1 + 1]

    # per-utterance masked RMS ballast
    m = (jnp.arange(N) < lengths[:, None]).astype(signal.dtype)
    rms2 = jnp.sum(signal * signal * m, axis=-1) / jnp.maximum(
        jnp.sum(m, axis=-1), 1.0)
    ballast = cfg.ballast * (W * rms2) ** 2         # [B]
    den = jnp.sqrt(e0 * el + ballast[:, None, None] + 1e-20)
    out = num / den
    valid = (jnp.arange(F)[None, :] * hop + wext) <= lengths[:, None]
    return out, valid


def _viterbi(scores: jnp.ndarray, valid: jnp.ndarray,
             trans: jnp.ndarray) -> jnp.ndarray:
    """[F, L] scores (+[F] validity) -> best lag index per frame [F].

    Padded frames freeze the running scores and carry identity
    backpointers, so the backtrace through the tail reproduces the last
    valid frame's decision (see module docstring)."""
    F, L = scores.shape
    ident = jnp.arange(L)

    def fwd(v_prev, inp):
        s, ok = inp
        cand = v_prev[:, None] - trans               # [L_prev, L]
        ptr = jnp.argmax(cand, axis=0)
        v = s + jnp.max(cand, axis=0)
        v = jnp.where(ok, v, v_prev)
        ptr = jnp.where(ok, ptr, ident)
        return v, ptr

    v0 = jnp.where(valid[0], scores[0], jnp.zeros((L,), scores.dtype))
    v_last, ptrs = jax.lax.scan(fwd, v0, (scores[1:], valid[1:]))
    best_last = jnp.argmax(v_last)

    def back(nxt, ptr):
        cur = ptr[nxt]
        return cur, cur

    _, path = jax.lax.scan(back, best_last, ptrs, reverse=True)
    return jnp.concatenate([path, best_last[None]])


def track(signal, lengths=None, cfg: PitchConfig = PitchConfig(),
          jit: bool = True):
    """Audio -> (pitch_hz [B, F], pov [B, F], valid [B, F]).

    ``pov`` is the raw NCCF value on the chosen path in [-1, 1] — the
    probability-of-voicing evidence (high for periodic frames, ~0 for
    silence/noise). 1-D input squeezes the batch axis, like extract()."""
    x = jnp.asarray(signal, jnp.float32)
    single = x.ndim == 1
    if single:
        x = x[None]
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    fn = _track_jit if jit else _track_impl
    pitch, pov, valid = fn(x, lengths, cfg)
    if single:
        return pitch[0], pov[0], valid[0]
    return pitch, pov, valid


def _track_impl(x: jnp.ndarray, lengths: jnp.ndarray, cfg: PitchConfig):
    scores, valid = nccf(x, lengths, cfg)
    trans = jnp.asarray(_transition_matrix(cfg))
    lags = jnp.arange(cfg.lag_min, cfg.lag_max + 1, dtype=jnp.float32)
    shaped = scores - cfg.lag_bias * jnp.log(lags / cfg.lag_min)
    idx = jax.vmap(lambda s, v: _viterbi(s, v, trans))(shaped, valid)
    lags = (cfg.lag_min + idx).astype(jnp.float32)
    pitch = cfg.sample_rate / lags
    pov = jnp.take_along_axis(scores, idx[..., None], axis=-1)[..., 0]
    return pitch, pov, valid


_track_jit = jax.jit(_track_impl, static_argnames=("cfg",))


def pitch_features(signal, lengths=None, cfg: PitchConfig = PitchConfig(),
                   jit: bool = True):
    """Kaldi-style 3-dim pitch features [B, F, 3] (+ validity [B, F]):
    (pov, mean-subtracted log-pitch over valid frames, delta-log-pitch).

    Frame grid note: the extended correlation window makes this tracker's
    frame count slightly lower than the spectral front-end's for the same
    audio; align by truncating the spectral features (pitch frames are a
    strict prefix on the same hop grid)."""
    x = jnp.asarray(signal, jnp.float32)
    single = x.ndim == 1
    if single:
        x = x[None]
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    fn = _features_jit if jit else _features_impl
    feats, valid = fn(x, lengths, cfg)
    if single:
        return feats[0], valid[0]
    return feats, valid


def _features_impl(x: jnp.ndarray, lengths: jnp.ndarray, cfg: PitchConfig):
    pitch, pov, valid = _track_impl(x, lengths, cfg)
    lp = jnp.log(pitch)
    m = valid.astype(lp.dtype)
    mean = jnp.sum(lp * m, axis=-1, keepdims=True) / jnp.maximum(
        jnp.sum(m, axis=-1, keepdims=True), 1.0)
    lp_c = (lp - mean) * m
    # delta-log-pitch: same regression form as feature deltas
    from tpufeat.features import deltas as _deltas
    nf = jnp.sum(valid, axis=-1).astype(jnp.int32)
    dlp = _deltas(lp_c[..., None], nf, cfg.delta_window)[..., 0]
    feats = jnp.stack([pov * m, lp_c, dlp * m], axis=-1)
    return feats, valid


_features_jit = jax.jit(_features_impl, static_argnames=("cfg",))
