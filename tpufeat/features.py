"""Batched one-shot feature extraction — the framework's main entry point.

Composes references C2-C9 + C16 into a single jitted program: exactly one
device dispatch per batch, versus the reference's 6-10 sequential OpenCL
kernel launches (SURVEY.md §3.1 vs §3.4). XLA fuses the strided gather,
windowing, and elementwise stages; the mel/log/DCT tail optionally runs as
one fused Pallas kernel driving the MXU (pallas/fused.py).

All length handling is masked/static-shape: utterances are padded to a
common N, every length-dependent reduction (CMVN, Whisper's per-utterance
max) sees valid frames only, and padding contents provably never leak into
valid outputs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpufeat import framing, matrices, plp, pncc, spectrum
from tpufeat.config import MFCC13_HTK, FeatureConfig

HIGHEST = jax.lax.Precision.HIGHEST


class FeatureResult(NamedTuple):
    """features: [B, F, D] (or [F, D] for unbatched input); mask: [B, F]
    bool validity; num_frames: [B] int32 valid frame counts."""
    features: jnp.ndarray
    mask: jnp.ndarray
    num_frames: jnp.ndarray


# ---------------------------------------------------------------------------
# Stage implementations (traced)
# ---------------------------------------------------------------------------

def whisper_normalize(ls: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Whisper's log-mel normalization tail: clamp at the per-utterance max
    (over VALID frames only) minus 8 decades, then map to (x+4)/4."""
    neg_inf = jnp.asarray(-jnp.inf, ls.dtype)
    valid = jnp.where(mask[..., None], ls, neg_inf)
    m = jnp.max(valid, axis=(-2, -1), keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all-masked utterance guard
    ls = jnp.maximum(ls, m - 8.0)
    return (ls + 4.0) / 4.0


def apply_log(mel: jnp.ndarray, mask: jnp.ndarray,
              cfg: FeatureConfig) -> jnp.ndarray:
    """Log compression (reference C8), mask-aware for the Whisper variant
    whose clamp threshold is a per-utterance max over valid frames."""
    if cfg.log == "none":
        return mel
    floored = jnp.maximum(mel, cfg.log_floor)
    if cfg.log == "natural":
        return jnp.log(floored)
    ls = jnp.log10(floored)
    if cfg.log == "log10":
        return ls
    return whisper_normalize(ls, mask)


def deltas(feat: jnp.ndarray, num_frames: jnp.ndarray,
           window: int = 2) -> jnp.ndarray:
    """Regression deltas with per-utterance edge replication (reference C16).

    Edge replication must happen at each utterance's true last frame, not at
    the padded end. Gather-free formulation (gathers are slow on TPU — see
    framing.py): the +-i shifts are static slices with edge padding; the only
    dynamic part is each utterance's last VALID frame, fetched once as a
    [B, 1, D] gather and substituted where t + i would cross it."""
    F = feat.shape[-2]
    t = jnp.arange(F)[None, :, None]
    hi = jnp.maximum(num_frames - 1, 0)[:, None, None]     # [B, 1, 1]
    last_valid = jnp.take_along_axis(
        feat, jnp.broadcast_to(hi, (feat.shape[0], 1, 1)), axis=-2)
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    out = jnp.zeros_like(feat)
    for i in range(1, window + 1):
        # t+i, clipped at the true end: static shift + last-valid substitute.
        # min(i, F) keeps the concat at exactly F rows when F < i (the
        # replicated values are then overwritten by last_valid anyway).
        plus = jnp.concatenate(
            [feat[:, i:], jnp.repeat(feat[:, -1:], min(i, F), axis=-2)],
            axis=-2)
        plus = jnp.where(t + i > hi, last_valid, plus)
        # t-i, clipped at 0: static shift with replicated first frame (the
        # left edge is at index 0 for every utterance; for valid rows t < nf
        # the upper clip can never trigger on t-i)
        minus = jnp.concatenate(
            [jnp.repeat(feat[:, :1], min(i, F), axis=-2), feat[:, :-i]],
            axis=-2)
        out = out + i * (plus - minus)
    return out / denom


def cmvn(feat: jnp.ndarray, mask: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Per-utterance cepstral mean (and variance) normalization over valid
    frames only (reference C16 / SURVEY.md §2.1 config 3)."""
    if mode == "none":
        return feat
    m = mask[..., None].astype(feat.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(feat * m, axis=-2, keepdims=True) / cnt
    out = feat - mean
    if mode == "meanvar":
        var = jnp.sum((feat - mean) ** 2 * m, axis=-2, keepdims=True) / cnt
        out = out / jnp.sqrt(var + 1e-10)
    return out


def sliding_cmvn(feat: jnp.ndarray, num_frames: jnp.ndarray = None, *,
                 window: int = 600, min_window: int = 100,
                 center: bool = False,
                 norm_vars: bool = False) -> jnp.ndarray:
    """Sliding-window CMVN over [B, T, D] padded batches — the windowed
    normalization online ASR deploys (Kaldi ``apply-cmvn-sliding``
    semantics; reference C16's online sibling; golden twin
    ``tpufeat.reference.cpu.sliding_cmvn``).

    Window per frame t (then shift-clamped inside each utterance's
    ``num_frames``): centered ``[t - window//2, +window)`` or causal
    ``[t - window, t + 1)`` with the first frames borrowing future
    context up to ``min_window`` frames.

    TPU formulation: one cumulative sum over the frame axis. The CAUSAL
    window ends are pure shifts of the frame index (plus one static
    ``min_window`` pick), so its window sums are static slices — no
    gathers at all; measured on chip the earlier take_along_axis
    formulation cost +16 ms at B=128x30 s (2.1x the whole pipeline,
    BASELINE.md) while slices are noise. End-of-utterance clamps are
    free for the SUMS because features are masked to zero beyond
    ``num_frames`` (the cumsum is constant there) — only the COUNT needs
    the clamp arithmetic, which is elementwise iota math. The CENTERED
    variant keeps two ``take_along_axis`` rows per frame (its tail clamp
    shifts window STARTS per-utterance); it is the offline
    post-processing flavor, not the deployed in-jit path. Features are
    pre-centered by the per-utterance masked mean so the cumsum stays
    small — the sliding mean of (x - g) is (sliding mean of x) - g, so
    the result is mathematically identical and the f32 cumsum over
    minutes of audio keeps ~1e-6 precision vs the f64 golden (tested).

    Padded rows get the last valid window's statistics (harmless — they
    stay masked downstream), never contribute to any window."""
    B, T, D = feat.shape
    if num_frames is None:
        num_frames = jnp.full((B,), T, jnp.int32)
    t = jnp.arange(T, dtype=jnp.int32)[None, :]             # [1, T]
    nf = jnp.maximum(num_frames.astype(jnp.int32), 1)[:, None]  # [B, 1]
    if center:
        ws = t - window // 2
        we = ws + window
    else:
        ws = t - window
        we = t + 1
    shift = jnp.minimum(ws, 0)
    we, ws = we - shift, jnp.maximum(ws, 0)
    if not center:
        we = jnp.where(we > t + 1, jnp.maximum(t + 1, min_window), we)
    over = jnp.maximum(we - nf, 0)
    we, ws = we - over, jnp.maximum(ws - over, 0)
    cnt = jnp.maximum(we - ws, 1).astype(feat.dtype)[..., None]  # [B,T,1]

    mask = (t < nf).astype(feat.dtype)[..., None]           # [B, T, 1]
    g = (jnp.sum(feat * mask, axis=1, keepdims=True)
         / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0))
    x = (feat - g) * mask

    if center:
        def windowed_mean(v):
            cs = jnp.cumsum(
                jnp.concatenate([jnp.zeros_like(v[:, :1]), v], axis=1),
                axis=1)
            return (jnp.take_along_axis(cs, we[..., None], axis=1)
                    - jnp.take_along_axis(cs, ws[..., None], axis=1)) / cnt
    else:
        # gather-free: cs[we_eff] == cs[min(t+1, min_window-borrow)] is a
        # shift (+ one static min_window pick), cs[ws_eff] == cs[t-window]
        # is a shift with zero fill; end clamps are free for sums because
        # x is zero beyond num_frames (cs constant there). The borrow
        # applies only to frames whose raw window underflows the start
        # (t < window) — Kaldi's clamp order; with min_window > window
        # later frames keep their t+1 end even below min_window
        t_idx = jnp.arange(T, dtype=jnp.int32)
        first = (t_idx < window) & (t_idx + 1 < min_window)       # [T]
        mw = min(min_window, T)

        def windowed_mean(v):
            cs = jnp.cumsum(
                jnp.concatenate([jnp.zeros_like(v[:, :1]), v], axis=1),
                axis=1)
            upper = cs[:, 1:]                                 # cs[t+1]
            if mw > 1:
                upper = jnp.where(first[None, :, None],
                                  cs[:, mw:mw + 1], upper)
            if T > window:
                lower = jnp.concatenate(
                    [jnp.zeros_like(cs[:, :window]),
                     cs[:, : T - window]], axis=1)            # cs[t-w]
                return (upper - lower) / cnt
            return upper / cnt

    mean = windowed_mean(x)
    out = x - mean
    if norm_vars:
        var = jnp.maximum(windowed_mean(x * x) - mean * mean, 1e-10)
        out = out / jnp.sqrt(var)
    return out


def _prior_counts(cnt: jnp.ndarray, window: int,
                  speaker_count: float, speaker_frames: int,
                  global_count: float, global_frames: int):
    """Kaldi online2 OnlineCmvn smoothing weights: when a frame's trailing
    window holds fewer than ``window`` frames, borrow up to
    ``speaker_frames`` worth of the speaker prior, then up to
    ``global_frames`` of the global prior, never exceeding ``window``
    total (the SmoothOnlineCmvnStats rule)."""
    ks = jnp.clip(window - cnt, 0.0, min(float(speaker_frames),
                                         speaker_count))
    kg = jnp.clip(window - cnt - ks, 0.0, min(float(global_frames),
                                              global_count))
    return ks, kg


def online_cmvn(feat: jnp.ndarray, num_frames: jnp.ndarray = None, *,
                window: int = 600,
                speaker_stats=None, global_stats=None,
                speaker_frames: int = 600, global_frames: int = 200,
                norm_vars: bool = False) -> jnp.ndarray:
    """Kaldi online2 ``OnlineCmvn`` semantics over [B, T, D] (or [T, D])
    batches: each frame is normalized by the trailing ``window`` frames of
    ITS OWN utterance, and while fewer than ``window`` frames exist the
    statistics are smoothed with a speaker prior (up to ``speaker_frames``
    frames' worth) then a global prior (up to ``global_frames``) — the
    online-decoding normalization that needs no future and no emission
    delay, unlike :func:`sliding_cmvn`'s ``min_window`` future borrow.

    ``speaker_stats`` / ``global_stats``: :class:`tpufeat.data.CmvnStats`
    (compute-cmvn-stats layout via ``CmvnStats.from_kaldi``) or None.
    The offline twin of :class:`tpufeat.streaming.OnlineCmvn`; float64
    golden in ``tpufeat.reference.cpu.online_cmvn``.

    Same TPU formulation as the causal :func:`sliding_cmvn`: one cumsum,
    shift-indexed window sums (gathers measured 2.1x the whole pipeline on
    chip), features pre-centered by the per-utterance mean for f32
    stability — the priors are re-centered by the same constant, so the
    result is mathematically unchanged. Padded rows see junk-but-finite
    values and stay masked downstream."""
    squeeze = feat.ndim == 2
    if squeeze:
        feat = feat[None]
    B, T, D = feat.shape
    if num_frames is None:
        num_frames = jnp.full((B,), T, jnp.int32)
    nf = jnp.maximum(num_frames.astype(jnp.int32), 1)[:, None]
    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    cnt = jnp.minimum(t + 1, window).astype(feat.dtype)[..., None]

    cs = float(speaker_stats.count) if speaker_stats is not None else 0.0
    cg = float(global_stats.count) if global_stats is not None else 0.0
    ks, kg = _prior_counts(cnt, window, cs, speaker_frames,
                           cg, global_frames)

    mask = (t < nf).astype(feat.dtype)[..., None]
    g = (jnp.sum(feat * mask, axis=1, keepdims=True)
         / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0))
    x = (feat - g) * mask

    def winsum(v):
        cs_ = jnp.cumsum(
            jnp.concatenate([jnp.zeros_like(v[:, :1]), v], axis=1), axis=1)
        upper = cs_[:, 1:]                                   # cs[t+1]
        if T > window:
            lower = jnp.concatenate(
                [jnp.zeros_like(cs_[:, :window]),
                 cs_[:, 1: T - window + 1]], axis=1)         # cs[t+1-w]
            return upper - lower
        return upper

    # priors re-centered by g: E_prior[x - g] and E_prior[(x - g)^2]
    def prior_moments(st):
        if st is None:
            return 0.0, 0.0
        m = jnp.asarray(st.mean, feat.dtype)
        msq = jnp.asarray(st.sumsq / max(st.count, 1.0), feat.dtype)
        return m - g, msq - 2.0 * g * m + g * g

    sm, ssq = prior_moments(speaker_stats)
    gm, gsq = prior_moments(global_stats)
    tot = cnt + ks + kg
    mean = (winsum(x) + ks * sm + kg * gm) / tot
    out = x - mean
    if norm_vars:
        e2 = (winsum(x * x) + ks * ssq + kg * gsq) / tot
        var = jnp.maximum(e2 - mean * mean, 1e-10)
        out = out / jnp.sqrt(var)
    return out[0] if squeeze else out


def dct_lifter(logm: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """DCT-II + optional lifter (reference C9): [..., n_mels] -> [..., n_mfcc].

    Also the post-normalization step for ``log == "whisper"`` configs with
    ``n_mfcc > 0``: Whisper's clamp/scale needs the utterance-global max, so
    the fused kernels emit log10-mel and the DCT runs here afterwards —
    matching the golden's order (log -> normalize -> DCT)."""
    dt = logm.dtype
    dct = jnp.asarray(matrices.dct_matrix(cfg.n_mels, cfg.n_mfcc), dt)
    out = jnp.dot(logm, dct, precision=HIGHEST)
    if cfg.lifter > 0:
        out = out * jnp.asarray(
            matrices.lifter_vector(cfg.n_mfcc, cfg.lifter), dt)
    return out


def mel_log_dct_xla(spec: jnp.ndarray, mask: jnp.ndarray,
                    cfg: FeatureConfig) -> jnp.ndarray:
    """Unfused XLA tail: mel filterbank matmul -> log -> DCT (+lifter).

    References C7-C9. The Pallas path (pallas/fused.py) computes the same
    function in one kernel; this is the always-available oracle twin.

    ``n_mels == 0`` (spectrogram features, Kaldi compute-spectrogram-feats
    analogue): no filterbank — the (log-)power spectrum IS the feature."""
    if cfg.n_mels == 0:
        return apply_log(spec, mask, cfg)
    dt = spec.dtype
    fb = jnp.asarray(matrices.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax_hz,
        cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style,
        cfg.vtln_warp, cfg.vtln_low, cfg.vtln_high), dt)
    mel = jnp.dot(spec, fb, precision=HIGHEST)
    logm = apply_log(mel, mask, cfg)
    if cfg.n_mfcc <= 0:
        return logm
    return dct_lifter(logm, cfg)


def _replace_c0_with_energy(feat: jnp.ndarray,
                            frames: jnp.ndarray,
                            cfg: FeatureConfig) -> jnp.ndarray:
    """Kaldi use_energy: c0 := log(max(sum x^2, floor)) over the conditioned
    (unwindowed) frame."""
    e = jnp.log(jnp.maximum(jnp.sum(frames * frames, axis=-1),
                            cfg.log_floor))
    return jnp.concatenate([e[..., None], feat[..., 1:]], axis=-1)


def _apply_energy(feat: jnp.ndarray, frames: jnp.ndarray,
                  cfg: FeatureConfig) -> jnp.ndarray:
    """Route cfg.use_energy per family: MFCC / spectrogram (n_mels=0)
    substitute element 0; fbank (n_mfcc=0, n_mels>0) PREPENDS the energy
    column (Kaldi compute-fbank-feats --use-energy, dim n_mels+1)."""
    if cfg.n_mfcc > 0 or cfg.n_mels == 0:
        return _replace_c0_with_energy(feat, frames, cfg)
    e = jnp.log(jnp.maximum(jnp.sum(frames * frames, axis=-1),
                            cfg.log_floor))
    return jnp.concatenate([e[..., None], feat], axis=-1)


def spectro_pipeline(frames: jnp.ndarray, mask: jnp.ndarray,
                     cfg: FeatureConfig, use_pallas: bool | None = None
                     ) -> jnp.ndarray:
    """Conditioned (unwindowed) frames -> features: the staged spectro path
    shared by one-shot extraction and streaming. Routes to the fused Pallas
    kernels when enabled, else the XLA composition."""
    if use_pallas is None:
        use_pallas = cfg.use_pallas and frames.shape[-2] > 0
    if use_pallas:
        from tpufeat.pallas import fused
        feat = fused.spectro_features(frames, mask, cfg)
    elif cfg.gemm_dft:
        spec = spectrum.power_spectrum_gemm(frames, cfg)
        feat = mel_log_dct_xla(spec, mask, cfg)
    else:
        w = jnp.asarray(matrices.window(cfg.window, cfg.frame_length),
                        frames.dtype)
        spec = spectrum.power_spectrum_rfft(frames * w, cfg)
        feat = mel_log_dct_xla(spec, mask, cfg)
    if cfg.plp_order > 0:
        # PLP consumes the raw filterbank energies the kernels just
        # produced (log="none" is enforced by the config); the tail is
        # frame-local VPU work, negligible next to the spectro stage
        feat = plp.plp_from_energies(feat, cfg)
    if cfg.pncc:
        feat = pncc.pncc_from_power(feat, mask, cfg)
    if cfg.use_energy:
        # MFCC / spectrogram: substitute element 0; fbank: prepend
        feat = _apply_energy(feat, frames, cfg)
    return feat


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def features_impl(x: jnp.ndarray, lengths: jnp.ndarray,
                  cfg: FeatureConfig,
                  rng: jnp.ndarray | None = None
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First half of the traced pipeline: raw batch -> (per-frame base
    features [B, F, D], mask) — everything up to (not including) deltas.

    Split out so :func:`extract`/:func:`make_extractor` can run the delta
    tail as a SECOND compiled program: on the current XLA:TPU toolchain,
    co-scheduling the delta op chain with the large fused signal kernel in
    one program costs ~8.8 ms of pure scheduling overhead at 128x30 s
    (20.3 -> 12.4 ms measured when split — see
    benchmarks/experiments/kaldi_twodispatch.py),
    the same large-program pathology family as the B=256 erratum
    (BASELINE.md). :func:`extract_impl` still builds the single fused
    program for jit-composability (sharding, scan, custom training steps).
    """
    if x.dtype == jnp.int16:
        # PCM16 promotion ON DEVICE (same rule as _prep): callers may
        # upload int16 arenas — through the relay the corpus warm pass is
        # upload-bound, and PCM16 sources round-trip exactly at half the
        # bytes (pipeline.extract_corpus compact upload)
        x = x.astype(jnp.float32) / 32768.0
    if cfg.dither > 0:
        if rng is None:
            raise ValueError("cfg.dither > 0 requires a PRNG key: "
                             "extract(..., rng=jax.random.key(seed))")
        x = x + cfg.dither * jax.random.normal(rng, x.shape, x.dtype)
    if cfg.preemphasis and not cfg.kaldi_mode:
        x = framing.preemphasize(x, cfg.preemphasis)
    F = cfg.num_frames(x.shape[-1])
    use_pallas = cfg.use_pallas and F > 0
    if use_pallas and cfg.gemm_dft and cfg.fused_framing:
        # fully fused path: framing happens inside the kernel, so the
        # [B, F, frame_length] tensor never exists in HBM; kaldi_mode's
        # per-frame conditioning is linear and folded into the kernel's
        # DFT matrix (matrices.kaldi_conditioning_matrix)
        from tpufeat.pallas import fused
        buf, mask = framing.framing_buffer(x, lengths, cfg)
        feat = fused.signal_features(buf, F, cfg)
        if cfg.log == "whisper":
            feat = whisper_normalize(feat, mask)
            if cfg.n_mfcc > 0:
                feat = dct_lifter(feat, cfg)
        if cfg.plp_order > 0:
            feat = plp.plp_from_energies(feat, cfg)
        if cfg.pncc:
            feat = pncc.pncc_from_power(feat, mask, cfg)
        if cfg.use_energy:
            frames = framing.frames_from_buffer(
                buf, F, cfg.frame_length, cfg.hop_length)
            frames = framing.condition_frames(frames, cfg)
            feat = _apply_energy(feat, frames, cfg)
    else:
        frames, mask = framing.frame_signal(x, lengths, cfg)
        frames = framing.condition_frames(frames, cfg)
        feat = spectro_pipeline(frames, mask, cfg, use_pallas=use_pallas)
    return feat, mask


def finish_impl(feat: jnp.ndarray, mask: jnp.ndarray, lengths: jnp.ndarray,
                cfg: FeatureConfig) -> FeatureResult:
    """Second half: deltas + CMVN + output dtype (see features_impl)."""
    nf = framing.num_frames_dynamic(lengths, cfg)
    if cfg.deltas:
        outs, d = [feat], feat
        for _ in range(cfg.delta_order):
            d = deltas(d, nf, cfg.delta_window)
            outs.append(d)
        feat = jnp.concatenate(outs, axis=-1)
    if cfg.cmvn.startswith("sliding"):
        feat = sliding_cmvn(feat, nf, window=cfg.cmvn_window,
                            min_window=cfg.cmvn_min_window,
                            center=cfg.cmvn_center,
                            norm_vars=cfg.cmvn.endswith("meanvar"))
    else:
        feat = cmvn(feat, mask, cfg.cmvn)
    if cfg.out_dtype != "float32":
        feat = feat.astype(jnp.dtype(cfg.out_dtype))
    return FeatureResult(feat, mask, nf)


def extract_impl(x: jnp.ndarray, lengths: jnp.ndarray,
                 cfg: FeatureConfig,
                 rng: jnp.ndarray | None = None) -> FeatureResult:
    """Traced pipeline body: padded batch [B, N] -> FeatureResult, as ONE
    program (jit-composable; see features_impl for the split rationale).

    Call via :func:`extract` (handles jit caching, input promotion, and
    the two-program delta split) or jit it yourself with
    ``static_argnames=("cfg",)``.

    ``rng``: PRNG key, required iff ``cfg.dither > 0`` — dither is additive
    noise on the raw samples (a training-time augmentation knob; Kaldi
    applies it per frame copy, this pipeline per sample — equivalent in
    distribution, and always OFF for golden-parity runs).
    """
    feat, mask = features_impl(x, lengths, cfg, rng)
    return finish_impl(feat, mask, lengths, cfg)


_extract_jit = jax.jit(extract_impl, static_argnames=("cfg",))
_features_jit = jax.jit(features_impl, static_argnames=("cfg",))
_finish_jit = jax.jit(finish_impl, static_argnames=("cfg",))


def _split_worthwhile(cfg: FeatureConfig, shape) -> bool:
    """Split delta configs into two programs only when the scheduling win
    beats the extra dispatch: the measured overhead is ~23 us per 1k
    frames (8.8 ms at 384k batch-frames) vs the relay's ~2 ms per-dispatch
    floor -> breakeven near 10^5 total frames. Small/latency-path calls
    keep the single program."""
    total_frames = shape[0] * cfg.num_frames(shape[-1])
    return total_frames >= 128 * 1024


# --- large-batch erratum guard (BASELINE.md "Large-batch erratum") ---
# Rounds 2-4 fought an upstream XLA:TPU miscompilation: [256, 480000]-
# class single programs silently corrupted ~8% of frames while every
# sub-stage validated clean in isolation. ROUND 5 BISECTED THE TRIGGER
# to one op structure — signal-level pre-emphasis written as
# shift-then-subtract (x - a*concat([prev, x[:-1]])); rewritten as
# compute-then-concat (framing.preemphasize, bitwise-identical values),
# EVERY previously-corrupt envelope point re-measured clean at
# max|d| = 0.0 (254/255/256/384/512 x 30 s, 512 x 15 s,
# 256 x {15,20,24,60} s — .bench/erratum_envelope_fixedpre.jsonl,
# 2026-08-20; three-round bisect in benchmarks/experiments/
# erratum_bisect*.py; standalone upstream reproducer kept in
# erratum_repro.py). The guard below therefore now admits the full
# re-measured region; it is RETAINED (not deleted) as defense in depth
# for shapes beyond anything probed, because the envelope was
# program-dependent across toolchains:
#   - any single row (B=1 measured clean at 2/4/8 h raw — 460.8M);
#   - batch <= 512 rows up to 245,760,000 total samples (512 x 30 s and
#     256 x 60 s measured clean with the fixed formulation);
#   - any batch up to a tiny per-dispatch total (small many-stream
#     calls stay single-shot without consulting the table).
# The region is downward-closed in B, so balanced row-splitting with
# per-dispatch shapes inside it is always safe. Re-probe after toolchain
# updates (tests/test_tpu_smoke.py::TestLargeBatchErratum is now a HARD
# pass — it would catch both an upstream regression and any tpufeat op
# restructure that reintroduces the trigger).
ERRATUM_MAX_ROWS = 512               # largest re-measured-clean batch
ERRATUM_MAX_TOTAL = 245_760_000      # 512 x 30 s == 256 x 60 s
ERRATUM_TINY_TOTAL = 16_000_000      # ~1000 s of audio; far below any
#                                      historically-corrupt total


def _single_program_safe(shape) -> bool:
    B, N = shape
    if B <= 1 or B * N <= ERRATUM_TINY_TOTAL:
        return True
    return B <= ERRATUM_MAX_ROWS and B * N <= ERRATUM_MAX_TOTAL


def _rows_per_dispatch(B: int, N: int) -> int:
    """Largest balanced row count keeping every dispatch inside the
    measured-clean region (256x30 s -> 128+128, not 252+4)."""
    cap = max(1, min(ERRATUM_MAX_ROWS, ERRATUM_MAX_TOTAL // max(N, 1)),
              ERRATUM_TINY_TOTAL // max(N, 1))
    n_splits = -(-B // min(B, cap))
    return -(-B // n_splits)


def _run_row_chunks(fn, x, lengths, rng, rows: int) -> FeatureResult:
    """Run ``fn(x_rows, lengths_rows, rng=...)`` over <=``rows``-row slices
    and concatenate — exact (no cross-utterance coupling), with an
    independent PRNG key per slice when dither is on."""
    n = -(-x.shape[0] // rows)
    keys = jax.random.split(rng, n) if rng is not None else [None] * n
    parts = [fn(x[i * rows: (i + 1) * rows],
                lengths[i * rows: (i + 1) * rows], rng=keys[i])
             for i in range(n)]
    return FeatureResult(*(jnp.concatenate(p, axis=0)
                           for p in zip(*parts)))


def extract(signal, lengths=None, cfg: FeatureConfig = MFCC13_HTK,
            jit: bool = True, rng=None,
            single_program: bool | None = None) -> FeatureResult:
    """WAV samples -> features. The public one-shot API (SURVEY.md §3.4).

    Args:
      signal: [N] or [B, N] float audio (int16 is scaled by 1/32768).
      lengths: [B] true lengths for padded batches; default = full width.
      cfg: a :class:`FeatureConfig` (hashable; each distinct config+shape
        compiles once and is cached by jax).
      jit: set False to run eagerly (debugging).
      rng: PRNG key, required iff ``cfg.dither > 0``.
      single_program: None (default) auto-routes batches outside the
        erratum-validated envelope through exact row-splitting
        (_single_program_safe); True forces one compiled program (the raw
        path — only for erratum tracking); False forces row-splitting.

    Returns a :class:`FeatureResult`; for 1-D input the batch axis is
    squeezed away from ``features``/``mask``.
    """
    x, lengths, single = _prep(signal, lengths)
    forced_single = single_program is True   # erratum tracking: really ONE
    #                                          program, no delta split
    if single_program is None:
        single_program = not jit or _single_program_safe(x.shape)
    if not single_program:
        res = _run_row_chunks(make_extractor(cfg), x, lengths, rng,
                              _rows_per_dispatch(*x.shape))
    elif jit and not forced_single and cfg.deltas \
            and _split_worthwhile(cfg, x.shape):
        # two programs: the delta tail scheduled alongside the fused signal
        # kernel costs ~1.6x at B=128x30s (XLA large-program scheduling
        # pathology; see features_impl docstring)
        feat, mask = _features_jit(x, lengths, cfg, rng)
        res = _finish_jit(feat, mask, lengths, cfg)
    else:
        fn = _extract_jit if jit else extract_impl
        res = fn(x, lengths, cfg, rng) if rng is not None \
            else fn(x, lengths, cfg)
    if single:
        res = FeatureResult(res.features[0], res.mask[0], res.num_frames[0])
    return res


# ---------------------------------------------------------------------------
# Stage-level public API (reference parity: wav in -> frames / spectra /
# mel / MFCC out, BASELINE.json:north_star). Each returns (values, mask).
#
# Semantics note: these stage functions ALWAYS run the unfused XLA rfft
# oracle path, regardless of cfg.use_pallas/gemm_dft — the fused kernels
# never materialize the intermediate frames/spectra these functions exist
# to expose. Stage outputs therefore agree with extract() under any
# execution flags to the paths' parity tolerance (~1e-5, tested), not
# bitwise. mfcc()/extract() honor the flags.
# ---------------------------------------------------------------------------

def _prep(signal, lengths):
    x = jnp.asarray(signal)
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) / 32768.0
    elif x.dtype != jnp.float64:
        x = x.astype(jnp.float32)
    single = x.ndim == 1
    if single:
        x = x[None]
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
    else:
        lengths = jnp.asarray(lengths, jnp.int32)
    return x, lengths, single


@functools.partial(jax.jit, static_argnames=("cfg", "stage"))
def _stage_impl(x, lengths, cfg: FeatureConfig, stage: str):
    if cfg.preemphasis and not cfg.kaldi_mode:
        x = framing.preemphasize(x, cfg.preemphasis)
    frames_, mask = framing.frame_signal(x, lengths, cfg)
    frames_ = framing.condition_frames(frames_, cfg)
    w = jnp.asarray(matrices.window(cfg.window, cfg.frame_length),
                    frames_.dtype)
    if stage == "frames":
        return frames_ * w, mask
    spec = spectrum.power_spectrum_rfft(frames_ * w, cfg)
    if stage == "spectrogram":
        return spec, mask
    fb = jnp.asarray(matrices.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax_hz,
        cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style,
        cfg.vtln_warp, cfg.vtln_low, cfg.vtln_high), spec.dtype)
    mel = jnp.dot(spec, fb, precision=HIGHEST)
    if stage == "mel":
        return mel, mask
    logm = apply_log(mel, mask, cfg)
    if stage == "logmel":
        return logm, mask
    raise ValueError(stage)


def _stage(signal, lengths, cfg, stage):
    x, lengths, single = _prep(signal, lengths)
    out, mask = _stage_impl(x, lengths, cfg, stage)
    return (out[0], mask[0]) if single else (out, mask)


def frames(signal, lengths=None, cfg: FeatureConfig = MFCC13_HTK):
    """Windowed analysis frames [(B,) F, frame_length] + mask (C2-C4)."""
    return _stage(signal, lengths, cfg, "frames")


def spectrogram(signal, lengths=None, cfg: FeatureConfig = MFCC13_HTK):
    """Power (or magnitude) spectrogram [(B,) F, n_fft//2+1] + mask (C5-C6)."""
    return _stage(signal, lengths, cfg, "spectrogram")


def mel_spectrogram(signal, lengths=None, cfg: FeatureConfig = MFCC13_HTK):
    """Linear mel-filterbank energies [(B,) F, n_mels] + mask (C7)."""
    return _stage(signal, lengths, cfg, "mel")


def logmel(signal, lengths=None, cfg: FeatureConfig = MFCC13_HTK):
    """Log-compressed mel features [(B,) F, n_mels] + mask (C7-C8)."""
    return _stage(signal, lengths, cfg, "logmel")


def mfcc(signal, lengths=None, cfg: FeatureConfig = MFCC13_HTK):
    """MFCCs [(B,) F, n_mfcc] + mask (C2-C9; no deltas/CMVN — use
    :func:`extract` for the full configured pipeline)."""
    import dataclasses
    base = dataclasses.replace(cfg, deltas=False, cmvn="none")
    res = extract(signal, lengths, base)
    return res.features, res.mask


def extract_chunked(signal, lengths, cfg: FeatureConfig = MFCC13_HTK,
                    rows_per_dispatch: int = 128,
                    rng=None) -> FeatureResult:
    """extract() with the batch split into <=rows_per_dispatch dispatches.

    The pipeline itself has no cross-utterance coupling, so splitting is
    exact. Two reasons to use it: (a) bounding per-dispatch HBM footprint
    for very large batches; (b) the upstream XLA:TPU miscompilation
    documented in BASELINE.md ("large-batch erratum"): on the current
    toolchain, [256, 480000]-shaped pipelines compute corrupted features
    (a periodic ~21 KB read corruption that appears only in large compiled
    programs — every sub-component validates clean in isolation). 128-row
    dispatches are the validated-safe production shape — and what plain
    :func:`extract` now auto-routes through outside the validated envelope
    (_single_program_safe).

    ``rng``: PRNG key for ``cfg.dither > 0`` configs; split into one
    independent key per row slice."""
    x, lengths, single = _prep(signal, lengths)
    res = _run_row_chunks(make_extractor(cfg), x, lengths, rng,
                          rows_per_dispatch)
    if single:
        res = FeatureResult(res.features[0], res.mask[0], res.num_frames[0])
    return res


@functools.lru_cache(maxsize=None)
def make_extractor(cfg: FeatureConfig, donate: bool = False):
    """Build a jitted ``(signal, lengths, rng=None) -> FeatureResult``
    closure for ``cfg``. ``donate=True`` donates the input signal buffer
    (useful in steady-state serving where the host rewrites it every call).
    ``rng`` is required iff ``cfg.dither > 0`` (one key per call; the
    closure passes it straight to the traced body).

    Large delta-config calls run as two compiled programs (base features,
    then the delta/CMVN tail) — measured 1.6x faster than the single
    program on the current XLA:TPU toolchain (features_impl docstring);
    small calls keep one program to avoid the extra ~2 ms relay dispatch
    (_split_worthwhile). Batches outside the erratum-validated envelope
    (_single_program_safe) are row-split exactly, like :func:`extract`."""
    one = jax.jit(functools.partial(extract_impl, cfg=cfg),
                  donate_argnums=(0,) if donate else ())
    if cfg.deltas:
        part1 = jax.jit(functools.partial(features_impl, cfg=cfg),
                        donate_argnums=(0,) if donate else ())
        part2 = jax.jit(functools.partial(finish_impl, cfg=cfg))

        def run_split(x, lengths, rng=None):
            feat, mask = part1(x, lengths, rng=rng)
            return part2(feat, mask, lengths)
    else:
        run_split = None

    def run(x, lengths, rng=None):
        if not _single_program_safe(x.shape):
            return _run_row_chunks(run, x, lengths, rng,
                                   _rows_per_dispatch(*x.shape))
        if run_split is not None and _split_worthwhile(cfg, x.shape):
            return run_split(x, lengths, rng=rng)
        return one(x, lengths, rng=rng) if rng is not None \
            else one(x, lengths)
    return run
