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
    backtrace recomputes backpointers from the stored score rows, one
    O(L) argmax per step (see ``_viterbi``). Padded frames carry a
    frozen score row, so the backtrace through the padded tail lands
    exactly on the last VALID frame's best path (mask-invariance is
    property-tested).

Like Kaldi, the NCCF/Viterbi lag grid lives at a RESAMPLED rate
(``lag_rate``, default 2 kHz = Kaldi's ``resample_freq``): the signal is
decimated with the MXU polyphase resampler (tpufeat/resampling.py, the
same windowed-sinc scipy designs) and integer lags are scored at that
rate — 36 lags instead of 281 at 16 kHz, which shrinks the Viterbi's
dominating [B, L, L] broadcast-max ~60x (BASELINE.md pitch rows mapped
the native-grid tracker to 20,379x RTFx with the [B, 281, 281] max as
the measured floor). Sub-lag resolution is restored by parabolic
interpolation of the NCCF around the decided lag (``refine``, standard
RAPT/getf0 practice); ``lag_rate=0`` keeps the full native-rate grid as
the audit twin.

Deviations from Kaldi (documented, deliberate): integer lags at
``lag_rate`` with parabolic refinement instead of Kaldi's log-spaced
interpolated lag set (~400 Viterbi states — the smaller integer grid is
the TPU-shaped formulation; the refined pitch resolution is comparable),
offline whole-utterance Viterbi (no online lattice pruning), and a
per-utterance RMS ballast. Golden twin: ``tpufeat.reference.cpu.pitch``
(float64, scipy resample_poly + direct correlation loops +
plain-Python Viterbi).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

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
    nccf_method: str = "gemm"        # "gemm" (MXU DFT-as-matmul; the
    #                                  production path — pitch_bench.py
    #                                  measures the speedup over fft) or
    #                                  "fft" (VPU rFFT audit twin)
    center: bool = False             # False: snip-edges (frame t's
    #                                  extended window STARTS at t*hop,
    #                                  Kaldi-style). True: zero-pad
    #                                  wext//2 each side so the window is
    #                                  CENTERED on t*hop — the grid of
    #                                  center=True spectral configs
    #                                  (whisper80); frame t is valid iff
    #                                  t*hop <= length, matching
    #                                  framing.num_frames_dynamic. For
    #                                  resampled configs the pad is
    #                                  applied at the LAG GRID (the
    #                                  resampled signal), not the native
    #                                  one — frame centers land on the
    #                                  same t*10 ms instants either way.
    lag_rate: int = 2000             # NCCF/Viterbi lag-grid sample rate
    #                                  (Kaldi resample_freq): the signal
    #                                  is polyphase-resampled here before
    #                                  scoring, shrinking the lag set
    #                                  ~sr/lag_rate-fold. 0 = score
    #                                  integer lags at the native rate
    #                                  (the audit twin / round-1..3
    #                                  behavior).
    refine: bool = True              # parabolic sub-lag interpolation of
    #                                  the reported pitch around the
    #                                  Viterbi-decided lag (POV and the
    #                                  decisions themselves stay on the
    #                                  integer grid).

    @property
    def resampled(self) -> bool:
        """True when the lag grid lives at ``lag_rate`` != native."""
        return bool(self.lag_rate) and self.lag_rate != self.sample_rate

    def inner(self) -> "PitchConfig":
        """The native-grid config the NCCF/Viterbi machinery runs at:
        self when not resampled, else the same tracker transplanted to
        ``lag_rate`` (frame/hop scaled exactly — the rates must divide)."""
        if not self.resampled:
            return self
        r, sr = self.lag_rate, self.sample_rate
        if (self.frame_length * r) % sr or (self.hop_length * r) % sr:
            raise ValueError(
                f"lag_rate {r} does not divide the frame grid "
                f"(frame_length={self.frame_length}, hop_length="
                f"{self.hop_length} at {sr} Hz); pick a lag_rate that "
                f"keeps both integral, or lag_rate=0 for the native grid")
        return dataclasses.replace(
            self, sample_rate=r, frame_length=self.frame_length * r // sr,
            hop_length=self.hop_length * r // sr, lag_rate=0)

    def lag_grid_length(self, n_samples: int) -> int:
        """Native sample count -> lag-grid sample count (scipy
        resample_poly's ceil(n*p/q); identity when not resampled)."""
        if not self.resampled:
            return n_samples
        from tpufeat.resampling import _rational, output_length
        p, q = _rational(self.sample_rate, self.lag_rate)
        return output_length(n_samples, p, q)

    @property
    def lag_min(self) -> int:
        return max(1, int(self.sample_rate / self.max_f0))

    @property
    def lag_max(self) -> int:
        return int(self.sample_rate / self.min_f0)

    @property
    def n_lags(self) -> int:
        return self.lag_max - self.lag_min + 1

    @property
    def wext(self) -> int:
        """Extended correlation window: frame + the largest scored lag."""
        return self.frame_length + self.lag_max

    def num_frames(self, n_samples: int) -> int:
        """Frames over the EXTENDED window (frame + lag_max); centered
        configs see the zero-padded length (wext//2 each side). For
        resampled configs the count is defined on the lag grid."""
        if self.resampled:
            return self.inner().num_frames(self.lag_grid_length(n_samples))
        w = self.wext
        if self.center:
            n_samples = n_samples + 2 * (w // 2)
        if n_samples < w:
            return 0
        return 1 + (n_samples - w) // self.hop_length


def config_for(feature_cfg, **overrides) -> "PitchConfig":
    """A :class:`PitchConfig` on the SAME frame grid as a
    :class:`tpufeat.config.FeatureConfig`: same sample rate and hop, a
    25 ms correlation window at that rate, and centered iff the spectral
    frames are centered — so pitch frame t and spectral frame t describe
    the same instant and ``cli --pitch`` can concatenate them. Keyword
    overrides win (e.g. ``config_for(cfg, max_f0=300.0)``)."""
    kw = dict(sample_rate=feature_cfg.sample_rate,
              hop_length=feature_cfg.hop_length,
              frame_length=int(round(0.025 * feature_cfg.sample_rate)),
              center=feature_cfg.center)
    kw.update(overrides)
    cfg = PitchConfig(**kw)
    if cfg.resampled and "lag_rate" not in overrides:
        # default lag grid must divide the feature grid; fall back to the
        # native grid for exotic rates (22.05 kHz etc.) rather than raise
        r, sr = cfg.lag_rate, cfg.sample_rate
        if (cfg.frame_length * r) % sr or (cfg.hop_length * r) % sr:
            cfg = dataclasses.replace(cfg, lag_rate=0)
    return cfg


@functools.lru_cache(maxsize=None)
def _transition_matrix(cfg: PitchConfig) -> np.ndarray:
    """[L, L] Viterbi transition costs penalty * log(lag_j/lag_i)^2."""
    lags = np.arange(cfg.lag_min, cfg.lag_max + 1, dtype=np.float64)
    ll = np.log(lags)
    return (cfg.penalty * (ll[:, None] - ll[None, :]) ** 2).astype(
        np.float32)


def _nccf_from_frames(frames: jnp.ndarray, ballast: jnp.ndarray,
                      cfg: PitchConfig) -> jnp.ndarray:
    """Extended frames [..., F, W + lag_max] + ballast [...] -> nccf
    [..., F, L] — the frame-level core shared by one-shot and streaming.

    nccf(t, l) = sum_i a_i b_{i+l} / sqrt(E0 * E_l + ballast), with
    a = the frame's first ``frame_length`` samples and b = the extended
    window; numerators for all lags come from ONE batched rFFT
    cross-correlation, energies from a cumulative-sum slide."""
    W = cfg.frame_length
    L0, L1 = cfg.lag_min, cfg.lag_max
    wext = W + L1
    a = frames[..., :W]
    if cfg.nccf_method == "gemm":
        # DFT-as-GEMM at transform length wext (no pow-of-two padding;
        # see matrices.nccf_gemm_matrices): three MXU matmuls replace
        # three VPU FFTs, and the inverse evaluates only the L scored
        # lags. HIGHEST precision — NCCF feeds argmax decisions that
        # must match the f64 golden, and the matmuls are a small
        # fraction of even this path's cost.
        from tpufeat import matrices
        dt = frames.dtype
        hi = jax.lax.Precision.HIGHEST
        c, s, ci, si = matrices.nccf_gemm_matrices(W, L0, L1)
        ca, sa = (jnp.asarray(m[:W], dt) for m in (c, s))
        cb, sb = (jnp.asarray(m, dt) for m in (c, s))
        ra = jnp.matmul(a, ca, precision=hi)
        ia = jnp.matmul(a, sa, precision=hi)
        rb = jnp.matmul(frames, cb, precision=hi)
        ib = jnp.matmul(frames, sb, precision=hi)
        p_re = ra * rb + ia * ib            # Re(conj(Fa) * Fb)
        p_im = ra * ib - ia * rb            # Im(conj(Fa) * Fb)
        num = (jnp.matmul(p_re, jnp.asarray(ci, dt), precision=hi)
               + jnp.matmul(p_im, jnp.asarray(si, dt), precision=hi))
    elif cfg.nccf_method == "fft":
        nfft = int(2 ** np.ceil(np.log2(wext + W)))
        fa = jnp.fft.rfft(a, n=nfft, axis=-1)
        fb = jnp.fft.rfft(frames, n=nfft, axis=-1)
        corr = jnp.fft.irfft(jnp.conj(fa) * fb, n=nfft, axis=-1)
        num = corr[..., L0: L1 + 1]
    else:
        raise ValueError(f"unknown nccf_method {cfg.nccf_method!r}")

    cs = jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(frames[..., :1]), frames * frames], axis=-1),
        axis=-1)
    e = cs[..., W:] - cs[..., :-W]                  # E_l for l = 0..lag_max
    e0 = e[..., :1]
    el = e[..., L0: L1 + 1]
    den = jnp.sqrt(e0 * el + ballast[..., None, None] + 1e-20)
    return num / den


def to_lag_grid(x: jnp.ndarray, lengths: jnp.ndarray,
                cfg: PitchConfig):
    """(signal, lengths, cfg) -> the same triple on the LAG GRID:
    polyphase-resample to ``cfg.lag_rate`` (one MXU matmul,
    tpufeat/resampling.py) and swap in the transplanted inner config.
    Identity for native-grid configs. Zero padding commutes with the
    resampler (its virtual right padding IS zeros), so padded batch rows
    resample to exactly what each row would alone."""
    if not cfg.resampled:
        return x, lengths, cfg
    from tpufeat import resampling
    p, q = resampling._rational(cfg.sample_rate, cfg.lag_rate)
    # zero the padding BEFORE the filter: the polyphase window straddles
    # the length boundary, so un-masked padding garbage would bleed into
    # the last ~half-filter of valid lag-grid samples (and through the
    # utterance-global ballast RMS, into every NCCF denominator) —
    # zeroing is exact because the resampler's own virtual padding IS
    # zeros (mask-invariance property-tested)
    x = x * (jnp.arange(x.shape[-1]) < lengths[..., None]).astype(x.dtype)
    # block=256: the base polyphase formulation frames with hop q << L,
    # a 21x HBM expansion (8.1 ms of the round-4 19.1 ms tracker at
    # B=128x10 s); stacking blocks per matmul row cuts it to ~1.05x with
    # identical taps (resampling.resample_matrix_blocked). 256 measured
    # fastest of {64, 128, 256} at HIGHEST precision with 3e-8 max
    # difference vs the base path (pitch_fuse.py, round 5)
    y = resampling.resample(x, cfg.sample_rate, cfg.lag_rate, block=256)
    # ceil(n*p/q) in int32 without n*p overflow (n can be hours of audio)
    ly = lengths // q * p + (lengths % q * p + q - 1) // q
    return y, ly.astype(jnp.int32), cfg.inner()


def nccf(signal: jnp.ndarray, lengths: jnp.ndarray,
         cfg: PitchConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched NCCF: [B, N] -> (nccf [B, F, L], frame validity [B, F]),
    with ballast = cfg.ballast * (frame_length * rms^2)^2 from the
    per-utterance masked RMS (zero-signal frames score ~0, not 0/0).

    Resampled configs are moved to their lag grid first
    (:func:`to_lag_grid`), so the returned frame axis lives on the
    inner grid — the same count :meth:`PitchConfig.num_frames` reports."""
    signal, lengths, cfg = to_lag_grid(signal, lengths, cfg)
    W, hop = cfg.frame_length, cfg.hop_length
    wext = cfg.wext
    B, N = signal.shape
    F = cfg.num_frames(N)
    if F <= 0:
        z = jnp.zeros((B, 0, cfg.n_lags), jnp.float32)
        return z, jnp.zeros((B, 0), bool)

    # per-utterance masked RMS ballast — over the REAL signal, before any
    # centering pad (zeros would dilute the RMS)
    m = (jnp.arange(N) < lengths[:, None]).astype(signal.dtype)
    rms2 = jnp.sum(signal * signal * m, axis=-1) / jnp.maximum(
        jnp.sum(m, axis=-1), 1.0)
    ballast = cfg.ballast * (W * rms2) ** 2         # [B]

    if cfg.center:
        pad = wext // 2
        signal = jnp.pad(signal, ((0, 0), (pad, pad)))
        # window t now covers [t*hop - pad, t*hop - pad + wext) in real
        # samples; valid iff its center t*hop lies within the utterance
        # (the spectral center=True convention, framing.num_frames_dynamic)
        valid = (jnp.arange(F)[None, :] * hop) <= lengths[:, None]
    else:
        valid = (jnp.arange(F)[None, :] * hop + wext) <= lengths[:, None]

    # extended frames [B, F, W + lag_max] — gather-free strided slices
    from tpufeat import framing
    frames = framing.frames_from_buffer(signal, F, wext, hop)
    out = _nccf_from_frames(frames, ballast, cfg)
    return out, valid


def _viterbi(scores: jnp.ndarray, valid: jnp.ndarray,
             trans: jnp.ndarray) -> jnp.ndarray:
    """[F, L] scores (+[F] validity) -> best lag index per frame [F].

    Padded frames freeze the running scores, so the backtrace through
    the tail reproduces the last valid frame's decision (see module
    docstring).

    The forward scan computes ONLY the running max — no argmax and no
    [F, L] pointer table. The backtrace recomputes each step's
    backpointer from the stored score rows, but only for the single
    selected state: argmax over the 1-D column v_{t-1} - trans[:, j*]
    reproduces the forward tie-breaking exactly (same float values,
    same first-occurrence rule). That halves the forward scan's O(L^2)
    work and drops the [F, L] pointer table from the scan carry;
    measured on chip it is throughput-neutral (the [B, L, L]
    broadcast-max dominates either way — BASELINE.md pitch rows), so
    the win is memory and a leaner program, not latency."""
    F, L = scores.shape

    def fwd(v_prev, inp):
        s, ok = inp
        cand = v_prev[:, None] - trans               # [L_prev, L]
        v = s + jnp.max(cand, axis=0)
        v = jnp.where(ok, v, v_prev)
        return v, v_prev

    v0 = jnp.where(valid[0], scores[0], jnp.zeros((L,), scores.dtype))
    v_last, vs_prev = jax.lax.scan(fwd, v0, (scores[1:], valid[1:]))
    best_last = jnp.argmax(v_last)

    def back(nxt, inp):
        v_prev, ok = inp
        cur = jnp.argmax(v_prev - trans[:, nxt]).astype(nxt.dtype)
        cur = jnp.where(ok, cur, nxt)
        return cur, cur

    _, path = jax.lax.scan(back, best_last, (vs_prev, valid[1:]),
                           reverse=True)
    return jnp.concatenate([path, best_last[None]])


def _prepare(signal, lengths):
    x = jnp.asarray(signal, jnp.float32)
    single = x.ndim == 1
    if single:
        x = x[None]
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
    return x, jnp.asarray(lengths, jnp.int32), single


def track(signal, lengths=None, cfg: PitchConfig = PitchConfig(),
          jit: bool = True):
    """Audio -> (pitch_hz [B, F], pov [B, F], valid [B, F]).

    ``pov`` is the raw NCCF value on the chosen path in [-1, 1] — the
    probability-of-voicing evidence (high for periodic frames, ~0 for
    silence/noise). 1-D input squeezes the batch axis, like extract()."""
    x, lengths, single = _prepare(signal, lengths)
    fn = _track_jit if jit else _track_impl
    pitch, pov, valid = fn(x, lengths, cfg)
    if single:
        return pitch[0], pov[0], valid[0]
    return pitch, pov, valid


def refine_lag(scores: jnp.ndarray, idx: jnp.ndarray,
               curvature_floor: float = 1e-2) -> jnp.ndarray:
    """Parabolic sub-lag offset in [-0.5, 0.5] from the raw NCCF around
    the decided lag: [..., F, L] scores + [..., F] indices -> [..., F]
    delta. Zero at grid edges and wherever the local curvature is below
    ``curvature_floor`` (flat/unvoiced peaks: the parabola vertex there
    is noise amplification, and the gate keeps f32 vs f64 deltas from
    diverging where the denominator ~ roundoff)."""
    L = scores.shape[-1]
    im = jnp.clip(idx - 1, 0, L - 1)
    ip = jnp.clip(idx + 1, 0, L - 1)
    take = lambda j: jnp.take_along_axis(scores, j[..., None],
                                         axis=-1)[..., 0]
    ym, y0, yp = take(im), take(idx), take(ip)
    denom = ym - 2.0 * y0 + yp                      # 2x the curvature
    delta = 0.5 * (ym - yp) / jnp.where(denom == 0, 1.0, denom)
    ok = ((idx > 0) & (idx < L - 1) & (denom < -curvature_floor))
    return jnp.where(ok, jnp.clip(delta, -0.5, 0.5), 0.0)


def _track_impl(x: jnp.ndarray, lengths: jnp.ndarray, cfg: PitchConfig):
    x, lengths, cfg = to_lag_grid(x, lengths, cfg)
    scores, valid = nccf(x, lengths, cfg)
    if scores.shape[1] == 0:        # audio shorter than frame+lag window
        z = jnp.zeros(valid.shape, jnp.float32)
        return z, z, valid
    trans = jnp.asarray(_transition_matrix(cfg))
    lags = jnp.arange(cfg.lag_min, cfg.lag_max + 1, dtype=jnp.float32)
    shaped = scores - cfg.lag_bias * jnp.log(lags / cfg.lag_min)
    idx = jax.vmap(lambda s, v: _viterbi(s, v, trans))(shaped, valid)
    lags = (cfg.lag_min + idx).astype(jnp.float32)
    if cfg.refine:
        lags = lags + refine_lag(scores, idx)
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
    x, lengths, single = _prepare(signal, lengths)
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


# ---------------------------------------------------------------------------
# Streaming pitch: lookahead-K Viterbi with delayed emission
# ---------------------------------------------------------------------------

class PitchStreamState(NamedTuple):
    """Carry for online pitch (StreamingPitch wrapper tracks fill/pos as
    host ints, like streaming.StreamingFrontend):

    buf:  [B, frame_length + lag_max - 1] raw-sample carry
    v:    [B, L] Viterbi forward scores
    ptrs: [B, K+1, L] backpointer ring (slot t % (K+1) = transition INTO
          frame t)
    raw:  [B, K+1, L] raw-NCCF ring (for POV of emitted frames)
    sumsq, count: [B] running ballast statistics (the one documented
          divergence from offline tracking, which uses the utterance-
          global RMS; identical when cfg.ballast == 0)
    """
    buf: jnp.ndarray
    v: jnp.ndarray
    ptrs: jnp.ndarray
    raw: jnp.ndarray
    sumsq: jnp.ndarray
    count: jnp.ndarray


def init_pitch_state(batch_size: int, cfg: PitchConfig,
                     lookahead: int) -> PitchStreamState:
    L, K = cfg.n_lags, lookahead
    cap = cfg.frame_length + cfg.lag_max - 1
    return PitchStreamState(
        buf=jnp.zeros((batch_size, cap), jnp.float32),
        v=jnp.zeros((batch_size, L), jnp.float32),
        ptrs=jnp.zeros((batch_size, K + 1, L), jnp.int32),
        raw=jnp.zeros((batch_size, K + 1, L), jnp.float32),
        sumsq=jnp.zeros((batch_size,), jnp.float32),
        count=jnp.zeros((batch_size,), jnp.float32),
    )


def pitch_chunk_static(state: PitchStreamState, chunk: jnp.ndarray,
                       pos0, *, cfg: PitchConfig, lookahead: int,
                       fill: int):
    """One online step: ([B, C] LAG-GRID samples at static buffer
    ``fill``, TRACED frame counter ``pos0``) -> (state', lag_idx
    [B, n_new], pov [B, n_new], sub-lag delta [B, n_new]; the caller
    owns any resampling). ``pos0`` only seeds the scan carry (ring
    slots and
    the first-frame test are computed from the traced counter), so one
    compiled program serves every position of a chunk schedule — baking
    it into the jit key would compile per chunk (~13 s each through the
    relay) and leak executables.

    Frame t's pitch is DECIDED when frame t+K has been scored (K =
    ``lookahead``): the emission backtraces K steps from the running
    forward maximum, so outputs lag behind input by K frames; the wrapper
    slices warmup rows and ``flush()`` drains the tail. With K >= total
    frames, flush reproduces the offline Viterbi exactly (same math) —
    tested. Memory note: the per-frame [B, L, L] transition max means
    ~L^2 floats per stream; fine for hundreds of streams, not for the
    65k-stream serving path (pitch at that scale wants a dedicated
    pruned-lattice kernel)."""
    W, hop = cfg.frame_length, cfg.hop_length
    K = lookahead
    wext = W + cfg.lag_max
    cap = wext - 1
    B, C = chunk.shape
    if not 0 <= fill <= cap:
        raise ValueError(f"fill {fill} outside [0, {cap}]")
    data = jnp.concatenate([state.buf[:, cap - fill:], chunk], axis=-1)
    total = fill + C
    n_new = max(0, 1 + (total - wext) // hop)

    sumsq = state.sumsq + jnp.sum(chunk * chunk, axis=-1)
    count = state.count + C
    rms2 = sumsq / jnp.maximum(count, 1.0)
    ballast = cfg.ballast * (W * rms2) ** 2

    fill_out = total - n_new * hop
    leftover = data[:, n_new * hop:]
    new_buf = jnp.concatenate(
        [jnp.zeros((B, cap - fill_out), data.dtype), leftover], axis=-1)

    if n_new == 0:
        st = state._replace(buf=new_buf, sumsq=sumsq, count=count)
        z = jnp.zeros((B, 0), jnp.float32)
        return st, z.astype(jnp.int32), z, z

    from tpufeat import framing
    frames = framing.frames_from_buffer(data, n_new, wext, hop)
    sraw = _nccf_from_frames(frames, ballast, cfg)   # [B, n_new, L]
    L = cfg.n_lags
    lags_f = jnp.arange(cfg.lag_min, cfg.lag_max + 1, dtype=jnp.float32)
    tilt = cfg.lag_bias * jnp.log(lags_f / cfg.lag_min)
    trans = jnp.asarray(_transition_matrix(cfg))
    ident = jnp.arange(L, dtype=jnp.int32)

    def frame_step(carry, inp):
        v, ptrs, raw, pos = carry
        s_raw = inp                                   # [B, L]
        shaped = s_raw - tilt
        cand = v[:, :, None] - trans[None]            # [B, Lprev, L]
        ptr_t = jnp.argmax(cand, axis=1).astype(jnp.int32)
        v_new = shaped + jnp.max(cand, axis=1)
        first = pos == 0
        v_new = jnp.where(first, shaped, v_new)
        ptr_t = jnp.where(first, ident[None, :], ptr_t)
        slot = pos % (K + 1)
        ptrs = jax.lax.dynamic_update_slice_in_dim(
            ptrs, ptr_t[:, None], slot, axis=1)
        raw = jax.lax.dynamic_update_slice_in_dim(
            raw, s_raw[:, None], slot, axis=1)
        # emit frame pos-K: backtrace K static steps from this frame's max
        lag = jnp.argmax(v_new, axis=-1).astype(jnp.int32)   # [B]
        for k in range(K):
            ptr_k = jax.lax.dynamic_index_in_dim(
                ptrs, (pos - k) % (K + 1), axis=1, keepdims=False)
            lag = jnp.take_along_axis(ptr_k, lag[:, None], axis=-1)[:, 0]
        raw_e = jax.lax.dynamic_index_in_dim(
            raw, (pos - K) % (K + 1), axis=1, keepdims=False)
        pov = jnp.take_along_axis(raw_e, lag[:, None], axis=-1)[:, 0]
        dlt = (refine_lag(raw_e, lag) if cfg.refine
               else jnp.zeros_like(pov))
        return (v_new, ptrs, raw, pos + 1), (lag, pov, dlt)

    (v, ptrs, raw, _), (lags, povs, dlts) = jax.lax.scan(
        frame_step, (state.v, state.ptrs, state.raw,
                     jnp.asarray(pos0, jnp.int32)),
        jnp.moveaxis(sraw, 1, 0))
    st = PitchStreamState(buf=new_buf, v=v, ptrs=ptrs, raw=raw,
                          sumsq=sumsq, count=count)
    return (st, jnp.moveaxis(lags, 0, 1), jnp.moveaxis(povs, 0, 1),
            jnp.moveaxis(dlts, 0, 1))


def pitch_flush(state: PitchStreamState, *, cfg: PitchConfig,
                lookahead: int, pos: int):
    """Drain the pending min(pos, lookahead) frames: full backtrace from
    the final forward maximum through the ring -> (lag_idx, pov, delta).

    One jitted dispatch: the ``n``-step backtrace unrolls inside a
    compiled program keyed on (lookahead, n, refine) with ``pos``
    TRACED — the eager formulation cost ~3 ops x n frames of
    per-dispatch relay floor (~2 ms each, BASELINE.md) at every
    stream end."""
    n = min(pos, lookahead)
    B = state.v.shape[0]
    if n == 0:
        z = jnp.zeros((B, 0), jnp.float32)
        return z.astype(jnp.int32), z, z
    return _pitch_flush_jit(lookahead, n, cfg.refine)(
        state, jnp.asarray(pos, jnp.int32))


@functools.lru_cache(maxsize=None)
def _pitch_flush_jit(lookahead: int, n: int, refine: bool):
    K = lookahead

    def impl(state: PitchStreamState, pos: jnp.ndarray):
        lag = jnp.argmax(state.v, axis=-1).astype(jnp.int32)
        lags, povs, dlts = [], [], []
        for k in range(n):                # frame pos-1-k, newest first
            slot = (pos - 1 - k) % (K + 1)
            raw_k = jax.lax.dynamic_index_in_dim(state.raw, slot, axis=1,
                                                 keepdims=False)
            lags.append(lag)
            povs.append(jnp.take_along_axis(raw_k, lag[:, None],
                                            axis=-1)[:, 0])
            dlts.append(refine_lag(raw_k, lag) if refine
                        else jnp.zeros_like(povs[-1]))
            if k < n - 1:
                ptr_k = jax.lax.dynamic_index_in_dim(state.ptrs, slot,
                                                     axis=1,
                                                     keepdims=False)
                lag = jnp.take_along_axis(ptr_k, lag[:, None],
                                          axis=-1)[:, 0]
        return (jnp.stack(lags[::-1], axis=1),
                jnp.stack(povs[::-1], axis=1),
                jnp.stack(dlts[::-1], axis=1))

    return jax.jit(impl)


class StreamingPitch:
    """Object wrapper: host-tracked fill/frame-counter, jitted static
    steps (the pitch sibling of streaming.StreamingFrontend).

    >>> sp = StreamingPitch(PitchConfig(), batch_size=1, lookahead=15)
    >>> for chunk in chunks:                  # [B, C]
    ...     hz, pov = sp.process(chunk)       # [B, n_emitted] each
    >>> hz, pov = sp.flush()                  # the last `lookahead` frames
    """

    def __init__(self, cfg: PitchConfig = PitchConfig(),
                 batch_size: int = 1, lookahead: int = 15):
        self.outer_cfg = cfg
        # all sample-level machinery runs on the LAG GRID: resampled
        # configs put a StreamingResampler in front (bit-exact vs the
        # offline polyphase for the 16k->2k small-filter family), and
        # self.cfg is the transplanted inner config
        self.cfg = cfg.inner()
        self._resampler = None
        if cfg.resampled:
            from tpufeat.resampling import StreamingResampler
            self._resampler = StreamingResampler(
                cfg.sample_rate, cfg.lag_rate, batch_size)
        self.lookahead = lookahead
        self.state = init_pitch_state(batch_size, self.cfg, lookahead)
        # center=True: the offline tracker zero-pads wext//2 each side
        # (of the LAG-GRID signal) so windows are centered on t*hop. The
        # state buffer is born zeroed, so the LEFT pad is just a
        # pre-filled carry; flush() feeds the right pad before draining.
        self._fill = self.cfg.wext // 2 if self.cfg.center else 0
        self._pos = 0
        self._tail_padded = False

    def _hz(self, lag_idx, dlt):
        return self.cfg.sample_rate / (self.cfg.lag_min + dlt
                                       + lag_idx.astype(jnp.float32))

    def _feed(self, chunk):
        """Advance the tracker by a LAG-GRID chunk (post-resampler)."""
        fn = _pitch_step_jit(self.cfg, self.lookahead, self._fill)
        self.state, lags, povs, dlts = fn(self.state, chunk, self._pos)
        n_new = lags.shape[1]
        # rows for frames < lookahead are warmup garbage: slice them off
        skip = max(0, min(self.lookahead - self._pos, n_new))
        self._pos += n_new
        wext = self.cfg.frame_length + self.cfg.lag_max
        total = self._fill + chunk.shape[1]
        assert n_new == max(0, 1 + (total - wext) // self.cfg.hop_length)
        self._fill = total - n_new * self.cfg.hop_length
        return self._hz(lags[:, skip:], dlts[:, skip:]), povs[:, skip:]

    def process(self, chunk):
        chunk = jnp.asarray(chunk, jnp.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        if self._resampler is not None:
            chunk = self._resampler.process(chunk)
        return self._feed(chunk)

    def reset_rows(self, rows) -> None:
        """Slot recycle: zero the rows' sample carry, resampler carry,
        Viterbi scores, backpointer/NCCF rings, and running ballast
        stats (the shared fill/pos clock keeps running). The init state
        is all-zeros (init_pitch_state), so the slot restarts from the
        tracker's initial condition; its decisions are warmup garbage
        for the next ``lookahead`` emitted frames (same as stream
        start), then final. Other rows are bit-unchanged."""
        from tpufeat.streaming import zero_rows
        if self._resampler is not None:
            self._resampler.reset_rows(rows)
        self.state = PitchStreamState(
            *(zero_rows(leaf, rows) for leaf in self.state))

    def flush(self):
        parts = []
        if self._resampler is not None and not self._tail_padded:
            # drain the polyphase tail so the tracker has seen exactly
            # resample(whole stream), like the offline path
            tail = self._resampler.flush()
            if tail.shape[1]:
                parts.append(self._feed(tail))
        if self.cfg.center and not self._tail_padded:
            # the offline centered tracker sees wext//2 trailing zeros
            # on the lag grid; feed them so the final centered frames
            # exist, then drain
            B = self.state.v.shape[0]
            parts.append(self._feed(
                jnp.zeros((B, self.cfg.wext // 2), jnp.float32)))
        self._tail_padded = True
        lags, povs, dlts = pitch_flush(self.state, cfg=self.cfg,
                                       lookahead=self.lookahead,
                                       pos=self._pos)
        parts.append((self._hz(lags, dlts), povs))
        hz = jnp.concatenate([p[0] for p in parts], axis=1)
        pov = jnp.concatenate([p[1] for p in parts], axis=1)
        return hz, pov


@functools.lru_cache(maxsize=None)
def _pitch_step_jit(cfg: PitchConfig, lookahead: int, fill: int):
    return jax.jit(functools.partial(pitch_chunk_static, cfg=cfg,
                                     lookahead=lookahead, fill=fill))


class StreamingPitchFeatures:
    """Online Kaldi-style 3-dim pitch features — the streaming sibling of
    :func:`pitch_features`: :class:`StreamingPitch` (lookahead-K Viterbi)
    -> (POV, mean-subtracted log-pitch, delta-log-pitch) rows in stream
    order, FIFO-aligned like :class:`tpufeat.streaming.StreamingPipeline`.

    Exactness vs the offline :func:`pitch_features` (tested):
      - POV: exact wherever the delayed Viterbi decisions are final;
      - delta-log-pitch: computed on the RAW log-pitch with the shared
        :class:`StreamingDeltas` machinery — regression deltas are
        shift-invariant, so the (online-unknowable) utterance mean drops
        out and the column matches offline exactly;
      - mean-subtracted log-pitch: the utterance-global mean needs the
        whole utterance; online subtracts the running mean over frames
        decided so far (converges; exact when everything is decided at
        flush, i.e. lookahead >= total frames).

    Emission lags input by ``lookahead`` (Viterbi) + ``2*delta_window``
    (delta regression) frames; ``flush()`` drains both tails."""

    def __init__(self, cfg: PitchConfig = PitchConfig(),
                 batch_size: int = 1, lookahead: int = 15):
        from tpufeat.streaming import StreamingDeltas
        self.cfg = cfg
        self.tracker = StreamingPitch(cfg, batch_size, lookahead)
        self._deltas = StreamingDeltas(1, cfg.delta_window, batch_size)
        # device-resident alignment FIFOs (see StreamingPipeline: a host
        # fetch here would be a ~30 ms relay readback per chunk)
        self._pov_fifo = jnp.zeros((batch_size, 0), jnp.float32)
        self._lp_fifo = jnp.zeros((batch_size, 0), jnp.float32)
        self._lp_sum = jnp.zeros((batch_size,), jnp.float32)
        # PER-ROW decided-frame counter so a recycled slot's running
        # log-pitch mean restarts with its own frames (reset_rows)
        self._n = jnp.zeros((batch_size,), jnp.float32)

    def _ingest(self, hz: jnp.ndarray, pov: jnp.ndarray) -> jnp.ndarray:
        lp = jnp.log(hz)
        self._lp_sum = self._lp_sum + jnp.sum(lp, axis=1)
        self._n = self._n + lp.shape[1]
        self._pov_fifo = jnp.concatenate([self._pov_fifo, pov], axis=1)
        self._lp_fifo = jnp.concatenate([self._lp_fifo, lp], axis=1)
        return self._deltas.process(lp[..., None])

    def _emit(self, dlp: jnp.ndarray) -> jnp.ndarray:
        n = dlp.shape[1]
        pov, self._pov_fifo = self._pov_fifo[:, :n], self._pov_fifo[:, n:]
        lp, self._lp_fifo = self._lp_fifo[:, :n], self._lp_fifo[:, n:]
        mean = self._lp_sum[:, None] / jnp.maximum(self._n, 1.0)[:, None]
        return jnp.stack([pov, lp - mean, dlp[..., 0]], axis=-1)

    def process(self, chunk) -> jnp.ndarray:
        """[B, C] (or [C]) raw samples -> [B, n, 3] complete rows."""
        hz, pov = self.tracker.process(chunk)
        if hz.shape[1] == 0:
            return jnp.zeros((hz.shape[0], 0, 3), jnp.float32)
        return self._emit(self._ingest(hz, pov))

    def flush(self) -> jnp.ndarray:
        hz, pov = self.tracker.flush()
        parts = []
        if hz.shape[1]:
            parts.append(self._ingest(hz, pov))
        parts.append(self._deltas.flush())
        out = self._emit(jnp.concatenate(parts, axis=1))
        assert self._pov_fifo.shape[1] == self._lp_fifo.shape[1] == 0, \
            "FIFO accounting bug: rows left after flush"
        return out

    def state(self) -> dict:
        """Full state as one pytree (host counters included) — feed to
        :func:`tpufeat.streaming.save_state` for checkpoint/resume."""
        t = self.tracker
        s = {
            "tracker": t.state, "fill": t._fill, "pos": t._pos,
            "tail_padded": t._tail_padded,
            "deltas": (self._deltas.carry, self._deltas.n_seen),
            "pov_fifo": self._pov_fifo, "lp_fifo": self._lp_fifo,
            "lp_sum": self._lp_sum, "n": self._n,
        }
        if t._resampler is not None:
            s["resampler"] = t._resampler.state()
        return s

    def reset_rows(self, rows) -> None:
        """Slot recycle: reset the rows' tracker state, delta carry,
        alignment FIFO content, and running log-pitch mean (per-row
        ``_n``), leaving the shared emission clock and the other rows
        bit-unchanged. The slot's next ``lookahead + 2*delta_window``
        emitted rows are warmup (tracker restart + delta transient)."""
        from tpufeat.streaming import zero_rows
        self.tracker.reset_rows(rows)
        self._deltas.reset_rows(rows)
        if self._pov_fifo.shape[1]:
            self._pov_fifo = zero_rows(self._pov_fifo, rows)
        if self._lp_fifo.shape[1]:
            self._lp_fifo = zero_rows(self._lp_fifo, rows)
        self._lp_sum = zero_rows(self._lp_sum, rows)
        self._n = zero_rows(self._n, rows)

    def set_state(self, s: dict) -> None:
        t = self.tracker
        t.state = s["tracker"]
        t._fill, t._pos = int(s["fill"]), int(s["pos"])
        t._tail_padded = bool(s["tail_padded"])
        if t._resampler is not None:
            t._resampler.set_state(s["resampler"])
        self._deltas.carry = s["deltas"][0]
        self._deltas.n_seen = int(s["deltas"][1])
        self._pov_fifo = jnp.asarray(s["pov_fifo"])
        self._lp_fifo = jnp.asarray(s["lp_fifo"])
        self._lp_sum = jnp.asarray(s["lp_sum"])
        n = np.asarray(s["n"])
        # pre-per-row checkpoints stored one shared host int
        self._n = (jnp.full_like(self._lp_sum, float(n)) if n.ndim == 0
                   else jnp.asarray(n, jnp.float32))
