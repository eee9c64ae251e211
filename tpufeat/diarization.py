"""Speaker diarization: sliding-window segment i-vectors + PLDA
affinity + agglomerative clustering (the Kaldi diarization recipe shape
— ``egs/callhome_diarization``-style — on this package's
:mod:`tpufeat.ivector` and :mod:`tpufeat.plda` stacks; SURVEY.md §2's
"beyond the reference" tier).

Who spoke when: features -> overlapping fixed-length windows (default
1.5 s every 0.75 s, Kaldi's grid) -> one i-vector per window -> PLDA
log-likelihood-ratio affinity between every window pair -> average-link
agglomerative clustering (scipy) cut at a threshold or a known speaker
count -> per-frame labels and (start, end, speaker) segments.

TPU-native formulation of the hot part: posteriors are the i-vector
module's GEMM path, first-order statistics are accumulated at
PERIOD-BLOCK granularity (one [D, period] @ [period, G] matmul per
block, G on the lane-aligned minor axis — never the per-frame [T, G, D]
projected term, whose lane padding measured ~200x slower for 30 min
audio), window sums are a block cumsum + two static slices (``cs[m:] -
cs[:-m]`` — no gathers: the window grid is regular, the same trick as
``ivector_features``'s boundary grid), every window estimate is one
batched Cholesky solve, and the [N, N] affinity matrix is the PLDA
module's two-GEMM scoring. Clustering runs on host (tiny: N = audio
minutes x 80).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpufeat.ivector import (IvectorExtractor, _damped_solve,
                             _online_operands, _posteriors_jit)
from tpufeat.plda import Plda

__all__ = ["sliding_windows", "segment_ivectors", "plda_affinity",
           "cluster_affinity", "diarize", "diarize_long",
           "two_stage_cluster", "refine_labels", "StreamingDiarizer"]

_HI = jax.lax.Precision.HIGHEST


def sliding_windows(num_frames: int, *, window: int = 150,
                    period: int = 75,
                    min_window: int = 25) -> np.ndarray:
    """The diarization segment grid: [N, 2] (start, end) frame spans —
    ``window`` frames every ``period`` frames, the tail window clamped
    to ``num_frames`` and dropped when shorter than ``min_window``
    (unless it is the only one). ``window`` must be a multiple of
    ``period`` (the block-sum formulation; Kaldi's 1.5 s/0.75 s default
    grid satisfies it)."""
    if period < 1 or window < 1:
        raise ValueError("window and period must be >= 1")
    if window % period:
        raise ValueError(f"window ({window}) must be a multiple of "
                         f"period ({period})")
    if num_frames < 1:
        raise ValueError("num_frames must be >= 1")
    spans = []
    for start in range(0, num_frames, period):
        end = min(start + window, num_frames)
        if end - start >= min_window or not spans:
            spans.append((start, end))
        if end == num_frames:
            break
    return np.asarray(spans, np.int64)


def segment_ivectors(extractor: IvectorExtractor, feats, *,
                     window: int = 150, period: int = 75,
                     min_window: int = 25, mask=None,
                     posterior_scale: float = 1.0,
                     min_post: float = 0.025,
                     bucket_frames: bool = False):
    """One i-vector per sliding window: [T, D] features -> ([N, K]
    i-vectors, [N, 2] window spans). ``mask`` ([T], optional) zeroes
    non-speech/padding frames' contributions (VAD gating). One jitted
    program; see the module docstring for the slice-arithmetic window
    sums.

    ``bucket_frames=True`` pads T up to a sqrt(2) length grid so a
    CORPUS of varied-length recordings compiles ~2 programs per octave
    instead of one per distinct length (each distinct T costs ~13 s of
    XLA compile through the relay — BASELINE.md). Windows are defined on
    the padded grid and all-padding windows are dropped; a window
    straddling the true end gets exactly the clamped-tail statistics
    (padding frames carry zero posterior mass). The one semantic
    difference from the exact grid: a straddling tail window shorter
    than ``min_window`` TRUE frames is kept (its stats are still
    correct) rather than dropped."""
    x = jnp.asarray(feats, jnp.float32)
    if x.ndim != 2 or x.shape[1] != extractor.ubm.dim:
        raise ValueError(f"expected [T, {extractor.ubm.dim}] features, "
                         f"got {np.shape(feats)}")
    T = x.shape[0]
    m = (jnp.ones((T,), jnp.float32) if mask is None
         else jnp.asarray(mask, jnp.float32))
    if m.shape != (T,):
        raise ValueError(f"mask {m.shape} vs frames {(T,)}")
    if bucket_frames:
        from tpufeat.data import bucket_length
        Tp = bucket_length(T, minimum=max(window, 256))
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
        m = jnp.pad(m, (0, Tp - T))
        spans_pad = sliding_windows(Tp, window=window, period=period,
                                    min_window=min_window)
        keep = spans_pad[:, 0] < T
        spans = spans_pad[keep].copy()
        spans[:, 1] = np.minimum(spans[:, 1], T)   # true clamped ends
        ops = _online_operands(extractor)
        fn = _segment_ivectors_jit(Tp, int(window), int(period),
                                   tuple(map(tuple,
                                             spans_pad.tolist())),
                                   float(posterior_scale),
                                   float(min_post))
        return fn(x, m, *ops)[np.flatnonzero(keep)], spans
    spans = sliding_windows(T, window=window, period=period,
                            min_window=min_window)
    ops = _online_operands(extractor)
    fn = _segment_ivectors_jit(T, int(window), int(period),
                               tuple(map(tuple, spans.tolist())),
                               float(posterior_scale), float(min_post))
    return fn(x, m, *ops), spans


@functools.lru_cache(maxsize=None)
def _segment_ivectors_jit(T: int, window: int, period: int,
                          spans: tuple, scale: float, min_post: float):
    nblk = -(-T // period)
    mwin = window // period
    starts = np.asarray([s // period for s, _ in spans])
    # end block of each (possibly clamped tail) window
    ends = np.asarray([-(-e // period) for _, e in spans])

    def impl(x, mask, gconst, a, bq, P, U, q):
        post = _posteriors_jit(x, gconst, a, bq, min_post)
        post = post * mask[:, None] * scale                  # [T, G]
        # Window stats at BLOCK granularity — never per frame: the
        # per-frame projected linear term would materialize a [T, G, D]
        # intermediate (measured 2,964x RTFx for 30 min; the D-minor
        # lane padding alone is ~10x HBM waste). Block first-order
        # stats are one batched [D, period] @ [period, G] matmul per
        # block with G on the 128-aligned minor axis, then the window
        # linear term is a single [W, D*G] contraction.
        pad = nblk * period - T
        padded = lambda v: jnp.pad(v, ((0, pad), (0, 0)))
        postp = padded(post).reshape(nblk, period, -1)       # [n, p, G]
        xp = padded(x).reshape(nblk, period, -1)             # [n, p, D]
        blkN = postp.sum(axis=1)                             # [n, G]
        blkF = jnp.einsum("npd,npg->ndg", xp, postp,
                          precision=_HI)                     # [n, D, G]
        inc = lambda v: jnp.cumsum(
            jnp.concatenate([jnp.zeros_like(v[:1]), v], axis=0), axis=0)
        csN, csF = inc(blkN), inc(blkF)                      # [nblk+1, ·]
        if (ends - starts == mwin).all() and len(spans) == nblk - mwin + 1:
            # pure regular grid: two static slices, no indexing at all
            N = csN[mwin:] - csN[:-mwin]
            F = csF[mwin:] - csF[:-mwin]
        else:  # clamped tail windows: constant-index take on the tiny
            N = csN[ends] - csN[starts]          # [nblk+1, ·] cumsum —
            F = csF[ends] - csF[starts]          # negligible vs the GEMMs
        b = (jnp.einsum("wdg,gdk->wk", F, P, precision=_HI)
             - jnp.einsum("wg,gk->wk", N, q, precision=_HI))
        return _damped_solve(N, b, U, 0.0)                   # [N, K]

    return jax.jit(impl)


def _nearest_sorted(centers: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Index of the nearest value in SORTED ``centers`` for every ``t``
    (bisection; ties break low, matching argmin's first-occurrence)."""
    hi = np.clip(np.searchsorted(centers, t), 0, len(centers) - 1)
    lo = np.maximum(hi - 1, 0)
    return np.where(np.abs(t - centers[lo]) <= np.abs(t - centers[hi]),
                    lo, hi)


def plda_affinity(plda: Plda, ivecs, *,
                  normalize_length: bool = True,
                  host: bool = False) -> np.ndarray:
    """Symmetrized PLDA log-likelihood-ratio affinity between every
    window pair: [N, K] -> [N, N] float32 (one two-GEMM scoring
    dispatch; the LLR is not exactly symmetric, so (S + S^T)/2).

    ``host=True`` scores with the f64 NumPy twin (``Plda.score_host``,
    parity-tested): for many SMALL affinities — two_stage_cluster's
    per-block stage — where each device dispatch would pay the relay's
    per-fetch sync floor (~30-90 ms weather-dependent) against ~10 ms
    of host BLAS per 512-window block."""
    iv = np.asarray(ivecs, np.float64)
    if host:
        s = plda.score_host(iv, iv, normalize_length=normalize_length)
    else:
        s = np.asarray(plda.score(iv, iv,
                                  normalize_length=normalize_length))
    return (0.5 * (s + s.T)).astype(np.float32)


def cluster_affinity(affinity, *, num_speakers: int | None = None,
                     threshold: float = 0.0) -> np.ndarray:
    """Average-linkage agglomerative clustering over a PLDA affinity
    matrix -> [N] integer labels (0..n_clusters-1, relabeled in first-
    appearance order). Stop at ``num_speakers`` clusters when known,
    else keep merging while the linked affinity stays above
    ``threshold`` (0.0 = the PLDA same/different decision boundary)."""
    from scipy.cluster import hierarchy
    aff = np.asarray(affinity, np.float64)
    n = aff.shape[0]
    if aff.shape != (n, n):
        raise ValueError(f"affinity must be square, got {aff.shape}")
    if n == 1:
        return np.zeros(1, np.int64)
    # similarities -> non-negative distances for linkage
    hi = aff.max()
    dist = hi - aff
    iu = np.triu_indices(n, 1)
    Z = hierarchy.linkage(dist[iu], method="average")
    if num_speakers is not None:
        if not 1 <= num_speakers <= n:
            raise ValueError(f"num_speakers {num_speakers} outside "
                             f"[1, {n}]")
        raw = hierarchy.fcluster(Z, num_speakers, criterion="maxclust")
    else:
        raw = hierarchy.fcluster(Z, hi - threshold, criterion="distance")
    # first-appearance relabel for deterministic output
    order: dict = {}
    return np.asarray([order.setdefault(c, len(order)) for c in raw],
                      np.int64)


def refine_labels(plda: Plda, ivecs, labels, *, iters: int = 1):
    """Resegmentation-lite: re-assign every window to the PLDA-nearest
    cluster centroid (one scoring dispatch per iteration), as commonly
    run after AHC. Empty clusters disappear; labels come back compacted
    in first-appearance order. Converges when no label changes."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    iv = np.asarray(ivecs, np.float64)
    labels = np.asarray(labels, np.int64).copy()
    for _ in range(iters):
        uniq = np.unique(labels)
        means = np.stack([iv[labels == u].mean(axis=0) for u in uniq])
        counts = np.asarray([(labels == u).sum() for u in uniq],
                            np.float64)
        # f64 host scorer: the [E, N] problem is tiny and E changes as
        # clusters dissolve — device scoring would compile one program
        # per (E, N) shape through the relay (review finding)
        scores = plda.score_host(means, iv, counts)
        new = uniq[scores.argmax(axis=0)]
        if (new == labels).all():
            break
        labels = new
    order: dict = {}
    return np.asarray([order.setdefault(v, len(order)) for v in labels],
                      np.int64)


def _label_frames(labels, spans, T, mask):
    """Window labels -> per-frame labels (nearest window center) and
    (start, end, speaker) runs; masked frames are -1 / excluded."""
    centers = spans.mean(axis=1)                     # [N], sorted
    # nearest center by bisection — a dense [T, N] |t - c| matrix would
    # be ~7 GB for 30 min of audio (review finding); centers are sorted
    # so two candidates suffice
    frame_labels = labels[_nearest_sorted(centers, np.arange(T))]
    if mask is not None:
        frame_labels = np.where(np.asarray(mask) > 0, frame_labels, -1)
    segments = []
    t = 0
    while t < T:
        lab = frame_labels[t]
        e = t + 1
        while e < T and frame_labels[e] == lab:
            e += 1
        if lab >= 0:
            segments.append((int(t), int(e), int(lab)))
        t = e
    return frame_labels, segments


def diarize(extractor: IvectorExtractor, plda: Plda, feats, *,
            window: int = 150, period: int = 75, min_window: int = 25,
            mask=None, num_speakers: int | None = None,
            threshold: float = 0.0, posterior_scale: float = 1.0,
            min_post: float = 0.025, bucket_frames: bool = False,
            refine_iters: int = 0):
    """Who-spoke-when for one recording's features [T, D] ->
    ``(frame_labels [T], segments)`` where ``segments`` is a list of
    ``(start_frame, end_frame, speaker)`` runs. Frames take the label of
    the window whose CENTER is nearest; with a VAD ``mask``, non-speech
    frames are labeled -1 and excluded from segments."""
    ivecs, spans = segment_ivectors(
        extractor, feats, window=window, period=period,
        min_window=min_window, mask=mask,
        posterior_scale=posterior_scale, min_post=min_post,
        bucket_frames=bucket_frames)
    aff = plda_affinity(plda, ivecs)
    labels = cluster_affinity(aff, num_speakers=num_speakers,
                              threshold=threshold)
    if refine_iters:
        labels = refine_labels(plda, ivecs, labels, iters=refine_iters)
    return _label_frames(labels, spans, np.shape(feats)[0], mask)


def two_stage_cluster(plda: Plda, ivecs, *, block: int = 512,
                      num_speakers: int | None = None,
                      threshold: float = 0.0,
                      block_threshold: float | None = None) -> np.ndarray:
    """Long-form clustering: per-block AHC -> centroid AHC (the
    standard hours-scale diarization recipe) -> [N] window labels.

    The single-stage path builds the FULL [N, N] affinity — ~830 MB of
    relay readback plus O(N^2) host linkage memory at 3 h (N ~ 14.4k;
    ``diarization.py`` module notes). Here windows are clustered within
    consecutive ``block``-window spans first (affinity [block, block],
    one small dispatch each); each block cluster is summarized by its
    mean RAW i-vector and count, and a second AHC over those centroids
    (PLDA-scored with enrollment counts, symmetrized) produces the
    global speakers. Cost is O(N*block) affinity work and O(N) memory
    instead of O(N^2). ``block_threshold`` (default = ``threshold``)
    stops the within-block merging; leave it at the PLDA decision
    boundary so blocks over-fragment rather than over-merge — stage 2
    can join fragments but never split them."""
    iv = np.asarray(ivecs, np.float64)
    N = iv.shape[0]
    if block < 2:
        raise ValueError("block must be >= 2")
    if N <= block:
        aff = plda_affinity(plda, iv)
        return cluster_affinity(aff, num_speakers=num_speakers,
                                threshold=threshold)
    bt = threshold if block_threshold is None else block_threshold
    frag = np.full(N, -1, np.int64)
    means, counts = [], []
    for b0 in range(0, N, block):
        sl = slice(b0, min(b0 + block, N))
        # host-scored block affinities: ~29 blocks of a 3 h recording
        # each paid a relay round-trip as device dispatches (round-5
        # frontier walls); the f64 host twin is ~10 ms per block
        lab = cluster_affinity(plda_affinity(plda, iv[sl], host=True),
                               threshold=bt)
        for u in range(lab.max() + 1):
            rows = np.flatnonzero(lab == u) + b0
            frag[rows] = len(means)
            means.append(iv[rows].mean(axis=0))
            counts.append(len(rows))
    means = np.stack(means)
    counts = np.asarray(counts, np.float64)
    s = plda.score_host(means, means, counts)
    aff_c = (0.5 * (s + s.T)).astype(np.float32)
    if num_speakers is not None and num_speakers > len(means):
        raise ValueError(
            f"stage 1 produced only {len(means)} fragments but "
            f"num_speakers={num_speakers}; lower block_threshold "
            f"(over-fragment) or use single-stage diarize()")
    glob = cluster_affinity(aff_c, num_speakers=num_speakers,
                            threshold=threshold)
    labels = glob[frag]
    order: dict = {}
    return np.asarray([order.setdefault(v, len(order)) for v in labels],
                      np.int64)


def diarize_long(extractor: IvectorExtractor, plda: Plda, feats, *,
                 window: int = 150, period: int = 75,
                 min_window: int = 25, mask=None,
                 num_speakers: int | None = None, threshold: float = 0.0,
                 block: int = 512, block_threshold: float | None = None,
                 posterior_scale: float = 1.0, min_post: float = 0.025,
                 refine_iters: int = 2):
    """Hours-scale :func:`diarize`: same segment-i-vector front half
    (chip work is linear in T), :func:`two_stage_cluster` for the
    quadratic half, plus :func:`refine_labels` passes — centroid
    re-assignment repairs fragments the block boundaries split. The
    round-5 frontier sweep (BASELINE.md; diarize_frontier.py) measured
    the SECOND refine pass as the big accuracy lever on the 3 h world
    (0.920 -> 0.932 at equal-or-better wall; the first pass's
    reassignments improve the centroids, the second converges them;
    passes beyond 2 measured no further gain) — hence
    ``refine_iters=2``. Block affinities are host-scored
    (``plda_affinity(host=True)``): the old per-block device dispatches
    paid a relay round-trip each (~29/pass on 3 h); host f64 BLAS is
    ~10 ms per 512-block, re-measured 4.0 s warm = 2,721x on the 3 h
    world. ``block`` stays 512 — the ROBUST point: 1024 scored 0.949
    on the 15-block 3 h world but COLLAPSED to 0.746 on a ~1.8k-window
    recording with only 2 blocks (measured round 5; the block AHC
    needs enough blocks for the centroid stage to repair) — raise it
    only for many-block, hours-scale audio, always with
    ``refine_iters>=2``. Threshold offsets and overlapping blocks
    measured strictly worse. Returns ``(frame_labels [T], segments)``
    like :func:`diarize`."""
    ivecs, spans = segment_ivectors(
        extractor, feats, window=window, period=period,
        min_window=min_window, mask=mask,
        posterior_scale=posterior_scale, min_post=min_post,
        bucket_frames=True)
    labels = two_stage_cluster(plda, np.asarray(ivecs), block=block,
                               num_speakers=num_speakers,
                               threshold=threshold,
                               block_threshold=block_threshold)
    if refine_iters:
        labels = refine_labels(plda, ivecs, labels, iters=refine_iters)
    return _label_frames(labels, spans, np.shape(feats)[0], mask)


# ---------------------------------------------------------------------------
# RTTM output + CLI (python -m tpufeat.diarization)
# ---------------------------------------------------------------------------

def write_rttm(file, rec_id: str, segments, *,
               frame_shift: float = 0.010) -> None:
    """Write diarization segments as standard RTTM ``SPEAKER`` lines
    (the NIST scoring format): ``segments`` is :func:`diarize`'s
    (start_frame, end_frame, speaker) list; times are frames x
    ``frame_shift`` seconds. ``file`` is a path or an open text file."""
    own = isinstance(file, str)
    f = open(file, "w") if own else file
    try:
        for s, e, lab in segments:
            f.write(f"SPEAKER {rec_id} 1 {s * frame_shift:.3f} "
                    f"{(e - s) * frame_shift:.3f} <NA> <NA> "
                    f"spk{lab} <NA> <NA>\n")
    finally:
        if own:
            f.close()


def main(argv=None) -> int:
    """CLI: WAV -> RTTM. Requires a trained extractor + PLDA model
    (see tpufeat.ivector / tpufeat.plda trainers)."""
    import argparse
    import json
    import os
    import sys

    import dataclasses

    from tpufeat import features, io
    from tpufeat.config import PRESETS

    p = argparse.ArgumentParser(
        prog="tpufeat.diarization",
        description="diarize a recording: WAV in, RTTM out")
    p.add_argument("wav", help="a WAV file, or a DIRECTORY of WAVs "
                               "(corpus mode: one RTTM with every "
                               "recording, compile-bucketed lengths)")
    p.add_argument("rttm", help="output RTTM path ('-' for stdout)")
    p.add_argument("--extractor", required=True, metavar="NPZ",
                   help="IvectorExtractor.save() file trained on this "
                        "preset's features")
    p.add_argument("--plda", required=True, metavar="FILE",
                   help="Plda.save() npz (or Kaldi binary <Plda> object "
                        "written by save_kaldi / ivector-compute-plda)")
    p.add_argument("--preset", default="mfcc13", choices=sorted(PRESETS))
    p.add_argument("--fused", action="store_true",
                   help="production TPU kernels (pallas + gemm + fused "
                        "framing + bf16x3)")
    p.add_argument("--num-speakers", type=int, default=None)
    p.add_argument("--threshold", type=float, default=0.0,
                   help="AHC stopping PLDA score (used when the speaker "
                        "count is unknown)")
    p.add_argument("--window", type=int, default=150,
                   help="segment window in frames (150 = 1.5 s)")
    p.add_argument("--period", type=int, default=75,
                   help="segment hop in frames (75 = 0.75 s)")
    p.add_argument("--vad-db", type=float, default=None,
                   help="gate frames more than this many dB below the "
                        "peak frame energy (off by default)")
    p.add_argument("--long", dest="long_form", action="store_true",
                   help="hours-scale recordings: two-stage clustering "
                        "(per-block AHC -> centroid AHC) + one centroid "
                        "refinement pass instead of the full [N, N] "
                        "affinity (diarize_long)")
    p.add_argument("--block", type=int, default=512,
                   help="windows per first-stage block with --long")
    p.add_argument("--compile-cache", metavar="DIR", default=None,
                   help="persistent XLA compilation cache directory "
                        "(tpufeat.enable_compile_cache; or set "
                        "TPUFEAT_COMPILE_CACHE) — diarize_long cold "
                        "measured 561 s -> 69 s with a warm cache")
    args = p.parse_args(argv)

    if args.compile_cache:
        import tpufeat
        tpufeat.enable_compile_cache(args.compile_cache)
    cfg = PRESETS[args.preset]
    if args.fused:
        cfg = dataclasses.replace(cfg, use_pallas=True, gemm_dft=True,
                                  fused_framing=True,
                                  matmul_precision="bf16x3")
    ext = IvectorExtractor.load(args.extractor)
    if ext.ubm.dim != cfg.feature_dim:
        raise ValueError(f"extractor UBM dim {ext.ubm.dim} != preset "
                         f"feature dim {cfg.feature_dim}")
    model = Plda.load_auto(args.plda)
    if model.dim != ext.ivector_dim:
        raise ValueError(f"PLDA dim {model.dim} != i-vector dim "
                         f"{ext.ivector_dim}")

    if os.path.isdir(args.wav):
        # corpus mode: every WAV under the directory into ONE RTTM
        # (bucket_frames bounds compiles to ~2/octave of length)
        wavs = sorted(
            os.path.join(root, n)
            for root, _, files in os.walk(args.wav)
            for n in files if n.lower().endswith(".wav"))
        if not wavs:
            raise ValueError(f"no .wav files under {args.wav}")
        bucket = True
    else:
        wavs = [args.wav]
        bucket = False
    out = sys.stdout if args.rttm == "-" else open(args.rttm, "w")
    shift = cfg.hop_length / cfg.sample_rate
    try:
        for path in wavs:
            x, rate = io.read_wav(path)
            if rate != cfg.sample_rate:
                raise ValueError(f"{path} is {rate} Hz; resample to "
                                 f"{cfg.sample_rate} first "
                                 "(tpufeat.resample)")
            feats = np.asarray(features.extract(x, cfg=cfg).features)
            mask = None
            if args.vad_db is not None:
                from tpufeat.augment import energy_vad
                v = np.asarray(energy_vad(
                    x[None], np.array([x.shape[0]]), cfg.frame_length,
                    cfg.hop_length,
                    threshold_db=-abs(args.vad_db))[0])
                F = feats.shape[0]
                if v.shape[0] < F:   # centered configs frame wider
                    v = np.concatenate(
                        [v, np.repeat(v[-1:], F - v.shape[0])])
                mask = v[:F].astype(np.float32)
            if args.long_form:
                labels, segments = diarize_long(
                    ext, model, feats, window=args.window,
                    period=args.period, mask=mask,
                    num_speakers=args.num_speakers,
                    threshold=args.threshold, block=args.block)
            else:
                labels, segments = diarize(
                    ext, model, feats, window=args.window,
                    period=args.period, mask=mask,
                    num_speakers=args.num_speakers,
                    threshold=args.threshold, bucket_frames=bucket)
            rec = os.path.splitext(os.path.basename(path))[0]
            write_rttm(out, rec, segments, frame_shift=shift)
            n_spk = len({lab for _, _, lab in segments})
            print(json.dumps(
                {"recording": rec, "frames": int(len(labels)),
                 "speakers": n_spk, "segments": len(segments)}),
                file=sys.stderr)
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())


# ---------------------------------------------------------------------------
# Online diarization (streaming who-spoke-when)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _block_stats_jit(k: int, period: int, scale: float, min_post: float):
    """``k`` whole period-blocks of feature rows -> per-block PROJECTED
    i-vector solve statistics ON DEVICE — the streaming diarizer's
    per-chunk dispatch: ``L_blk`` [k, K, K] (= Σ_g N_g U_g, the
    precision contribution) and ``b_blk`` [k, K] (= F-projection − N@q,
    the mean-centered linear term). Two relay pathologies die here:

    - the per-frame gamma-weighted outer products ([n, D, G] ≈ 26 MB
      per 10 s chunk, ~27 GB over 3 h against 24–43 MB/s readback)
      never leave the device — measured 18 min of pure readback for a
      3 h stream before this;
    - the per-window host projection N @ U ([G, K·K], a 41 MB f64
      GEMV per window — 6.1 s of a 10 s 30-min pass) moves onto the
      MXU batched per chunk, against the extractor's cached device
      operands (`ivector._online_operands`).

    The host window solve is now eye + a ring sum + one K×K Cholesky.
    Same algebra as the offline `_segment_ivectors_jit` block path, at
    the same f32-with-HIGHEST-matmul precision."""

    def impl(x, gconst, a, bq, P, U, q):
        G, K = q.shape
        post = _posteriors_jit(x, gconst, a, bq, min_post) * scale
        pb = post.reshape(k, period, -1)                    # [k, p, G]
        xb = x.reshape(k, period, -1)                       # [k, p, D]
        n_blk = pb.sum(axis=1)                              # [k, G]
        f_blk = jnp.einsum("kpd,kpg->kdg", xb, pb,
                           precision=_HI)                   # [k, D, G]
        l_blk = jnp.matmul(n_blk, U.reshape(G, K * K),
                           precision=_HI).reshape(k, K, K)
        fb = jnp.swapaxes(f_blk, 1, 2).reshape(k, -1)       # [k, G*D]
        b_blk = (jnp.matmul(fb, P.reshape(-1, K), precision=_HI)
                 - jnp.matmul(n_blk, q, precision=_HI))     # [k, K]
        return l_blk, b_blk

    return jax.jit(impl)


class StreamingDiarizer:
    """Online who-spoke-when over ONE recording's feature stream
    (the live sibling of :func:`diarize`): greedy PLDA clustering of
    sliding-window i-vectors as each window completes.

    Mechanics per chunk: incoming frames buffer on host (raw [n, D]
    rows, at most one period's worth held back) until whole ``period``
    blocks are available; ONE device dispatch then reduces them to
    per-block PROJECTED i-vector solve statistics ([K, K] precision +
    [K] linear term per block — `_block_stats_jit`; neither the
    per-frame outer products nor the [G, K·K] projection operands ever
    touch the host), and every completed window (every ``period``
    frames once ``window`` frames have arrived) solves its i-vector on
    host (ring sum + one K x K solve — microseconds), scores it against
    the running speaker centroids with the float64 PLDA scorer, and
    either joins the best cluster (LLR >= ``threshold``) or starts a
    new one (greedy online clustering — the standard low-latency
    alternative to offline AHC; labels are first-appearance ids and
    never relabel retroactively).

    Two robustness knobs, both measured on a 6-speaker 3–15 s-turn
    synthetic (benchmarks/experiments/diarize_long_bench.py world;
    window agreement vs truth, offline AHC = 0.99 on the same windows):

    - ``enroll_cap`` caps the enrollment count fed to the PLDA scorer.
      Uncapped, a cluster contaminated by one speaker-boundary window
      becomes over-CONFIDENT as its count grows (the enrollment
      posterior sharpens around a mean that sits between speakers) and
      absorbs everything: 0.60 uncapped -> 0.87 at the default cap 3.
    - ``recenter`` re-assigns ALL past window i-vectors to the current
      clusters every that-many windows and rebuilds the centroids from
      the re-assignment — FORWARD-ONLY: emitted frame labels never
      change, only the centroids future windows score against (an
      online k-means-style re-centering; with the cap, 0.89 at the
      default 25). Costs one [n_windows, n_clusters] f64 scoring pass
      per trigger on host. ``recenter=0`` disables.

    ``process(feats [n, D])`` returns (frame_labels [m], start_frame)
    for the frames whose nearest window center is now decided — output
    lags input by about ``window/2 + period`` frames; ``flush()``
    labels the tail. Labels are chunk-plan invariant (tested; both
    knobs trigger on window counts, which no chunk plan changes)."""

    def __init__(self, extractor: IvectorExtractor, plda: Plda, *,
                 window: int = 150, period: int = 75,
                 threshold: float = 0.0,
                 max_speakers: int | None = None,
                 posterior_scale: float = 1.0,
                 min_post: float = 0.025,
                 enroll_cap: float | None = 3.0,
                 recenter: int = 25):
        if window % period:
            raise ValueError(f"window ({window}) must be a multiple of "
                             f"period ({period})")
        if plda.dim != extractor.ivector_dim:
            raise ValueError(f"PLDA dim {plda.dim} != i-vector dim "
                             f"{extractor.ivector_dim}")
        self.extractor, self.plda = extractor, plda
        self.window, self.period = int(window), int(period)
        self.threshold = float(threshold)
        self.max_speakers = max_speakers
        self.scale, self.min_post = float(posterior_scale), float(min_post)
        self.enroll_cap = None if enroll_cap is None else float(enroll_cap)
        if recenter < 0:
            raise ValueError(f"recenter must be >= 0, got {recenter}")
        self.recenter = int(recenter)
        # the extractor's cached DEVICE operands (incl. P/U/q for the
        # on-device block projections — ivector._online_operands)
        self._dev_ops = _online_operands(extractor)
        self.reset()

    def reset(self) -> None:
        D = self.extractor.ubm.dim
        K = self.extractor.ivector_dim
        m = self.window // self.period
        self._ring_L = np.zeros((m, K, K))       # projected block stats
        self._ring_b = np.zeros((m, K))
        self._buf = np.zeros((0, D), np.float32)  # sub-period holdback
        self._n_seen = 0                         # frames received
        self._n_blocks = 0                       # completed blocks
        self._centers: list[float] = []          # window centers
        self._wlabels: list[int] = []            # per-window labels
        self._wivs: list[np.ndarray] = []        # window i-vectors
        self._clusters: list[list] = []          # [sum_ivec, count]
        self._emitted = 0                        # frames labeled so far
        self._flushed = False

    @property
    def num_speakers(self) -> int:
        return len(self._clusters)

    def _window_done(self, end_true: int | None = None) -> None:
        """A window of `window//period` blocks just completed;
        ``end_true`` caps the window's REAL data end (flush tail)."""
        K = self.extractor.ivector_dim
        # the blocks arrive PROJECTED from the device (_block_stats_jit)
        # — the window solve is an eye + ring sum + one K x K solve
        L = np.eye(K) + self._ring_L.sum(axis=0)
        b = self._ring_b.sum(axis=0)
        w = np.linalg.solve(L, b)
        # greedy assignment vs running centroids (f64 PLDA scorer)
        if self._clusters:
            means = np.stack([s / c for s, c in self._clusters])
            counts = np.asarray([c for _, c in self._clusters],
                                np.float64)
            if self.enroll_cap is not None:
                counts = np.minimum(counts, self.enroll_cap)
            llr = self.plda.score_host(means, w[None], counts)[:, 0]
            best = int(np.argmax(llr))
            full = (self.max_speakers is not None
                    and len(self._clusters) >= self.max_speakers)
            if llr[best] >= self.threshold or full:
                self._clusters[best][0] += w
                self._clusters[best][1] += 1
                lab = best
            else:
                self._clusters.append([w.copy(), 1])
                lab = len(self._clusters) - 1
        else:
            self._clusters.append([w.copy(), 1])
            lab = 0
        end = self._n_blocks * self.period
        start = max(0, end - self.window)
        if end_true is not None:
            end = min(end, end_true)
        self._centers.append((start + end) / 2.0)
        self._wlabels.append(lab)
        self._wivs.append(w)
        if (self.recenter and len(self._wlabels) % self.recenter == 0
                and len(self._clusters) > 1):
            # forward-only re-centering: re-assign every past window
            # i-vector to the current clusters and rebuild centroids —
            # emitted labels are untouched, future scoring sharpens
            H = np.stack(self._wivs)
            means = np.stack([s / c for s, c in self._clusters])
            counts = np.asarray([c for _, c in self._clusters],
                                np.float64)
            if self.enroll_cap is not None:
                counts = np.minimum(counts, self.enroll_cap)
            L = self.plda.score_host(means, H, counts)   # [C, n]
            assign = L.argmax(axis=0)
            new = []
            for j, old in enumerate(self._clusters):
                mem = H[assign == j]
                # a cluster losing every member keeps its old centroid
                # (ids are stable; it can win windows again later)
                new.append([mem.sum(axis=0), float(len(mem))]
                           if len(mem) else old)
            self._clusters = new

    def _push_blocks(self, k: int, period: int, xk) -> None:
        """Reduce ``k`` whole period-blocks to stats on device (one
        dispatch) and feed the ring; window solves fire as blocks
        complete."""
        fn = _block_stats_jit(k, period, self.scale, self.min_post)
        l_blk, b_blk = fn(jnp.asarray(xk), *self._dev_ops)
        l_blk = np.asarray(l_blk, np.float64)
        b_blk = np.asarray(b_blk, np.float64)
        m = self.window // self.period
        for j in range(k):
            slot = self._n_blocks % m
            self._ring_L[slot] = l_blk[j]
            self._ring_b[slot] = b_blk[j]
            self._n_blocks += 1
            if self._n_blocks >= m:
                self._window_done()

    def _emit_upto(self, limit: int) -> tuple[np.ndarray, int]:
        start = self._emitted
        n = max(0, limit - start)
        if n == 0 or not self._centers:
            return np.zeros(0, np.int64), start
        t = np.arange(start, start + n, dtype=np.float64)
        nearest = _nearest_sorted(np.asarray(self._centers), t)
        self._emitted = start + n
        return np.asarray(self._wlabels, np.int64)[nearest], start

    def process(self, feats) -> tuple[np.ndarray, int]:
        """[n, D] new feature rows -> (labels for newly-decided frames,
        absolute start frame of those labels)."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset() "
                               "before reusing this diarizer")
        x = np.asarray(feats, np.float32)
        if x.ndim != 2 or x.shape[1] != self.extractor.ubm.dim:
            raise ValueError(f"expected [n, {self.extractor.ubm.dim}], "
                             f"got {x.shape}")
        if x.shape[0]:
            self._buf = x if not self._buf.shape[0] else \
                np.concatenate([self._buf, x])
            self._n_seen += x.shape[0]
            k = self._buf.shape[0] // self.period
            if k:
                xk = self._buf[: k * self.period]
                self._buf = self._buf[k * self.period:]
                self._push_blocks(k, self.period, xk)
        # frames up to the LAST decided center are final (no future
        # window center can be nearer)
        limit = int(self._centers[-1]) + 1 if self._centers else 0
        return self._emit_upto(limit)

    def flush(self) -> tuple[np.ndarray, int]:
        """End of stream: complete the final partial window (if any
        frames arrived past the last completed one) and label the tail.
        Terminal: a second flush() emits nothing; process() after
        flush() raises (reset() starts a new stream)."""
        if self._flushed:
            return self._emit_upto(self._n_seen)
        self._flushed = True
        m = self.window // self.period
        tail, self._buf = self._buf, self._buf[:0]
        if tail.shape[0] or (self._n_blocks and self._n_blocks < m):
            # reduce the sub-period tail (if any) as one short block,
            # fold it in and run a final (short) window; its center
            # uses the TRUE data end, not the padded grid
            slot = self._n_blocks % m
            if tail.shape[0]:
                fn = _block_stats_jit(1, tail.shape[0], self.scale,
                                      self.min_post)
                l_blk, b_blk = fn(jnp.asarray(tail), *self._dev_ops)
                self._ring_L[slot] = np.asarray(l_blk[0], np.float64)
                self._ring_b[slot] = np.asarray(b_blk[0], np.float64)
            else:
                self._ring_L[slot] = 0.0
                self._ring_b[slot] = 0.0
            self._n_blocks += 1
            self._window_done(end_true=self._n_seen)
        return self._emit_upto(self._n_seen)
