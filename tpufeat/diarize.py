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

TPU-native formulation of the hot part (everything per-frame or
per-pair): posteriors and the projected linear term are the i-vector
module's GEMM paths, window statistics are PERIOD-BLOCK sums + a block
cumsum + two static slices (``cs[m:] - cs[:-m]`` — no gathers: the
window grid is regular, so window sums are slice arithmetic, the same
trick as ``ivector_features``'s boundary grid), every window estimate is
one batched Cholesky solve, and the [N, N] affinity matrix is the PLDA
module's two-GEMM scoring. Clustering runs on host (tiny: N = audio
minutes x 80).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpufeat.ivector import (IvectorExtractor, _damped_solve,
                             _online_operands, _per_frame_linear,
                             _posteriors_jit)
from tpufeat.plda import Plda

__all__ = ["sliding_windows", "segment_ivectors", "plda_affinity",
           "cluster_affinity", "diarize"]

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
                     min_post: float = 0.025):
    """One i-vector per sliding window: [T, D] features -> ([N, K]
    i-vectors, [N, 2] window spans). ``mask`` ([T], optional) zeroes
    non-speech/padding frames' contributions (VAD gating). One jitted
    program; see the module docstring for the slice-arithmetic window
    sums."""
    x = jnp.asarray(feats, jnp.float32)
    if x.ndim != 2 or x.shape[1] != extractor.ubm.dim:
        raise ValueError(f"expected [T, {extractor.ubm.dim}] features, "
                         f"got {np.shape(feats)}")
    T = x.shape[0]
    spans = sliding_windows(T, window=window, period=period,
                            min_window=min_window)
    m = (jnp.ones((T,), jnp.float32) if mask is None
         else jnp.asarray(mask, jnp.float32))
    if m.shape != (T,):
        raise ValueError(f"mask {m.shape} vs frames {(T,)}")
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
        bframe = _per_frame_linear(post, x, P, q)            # [T, K]
        pad = nblk * period - T
        padded = lambda v: jnp.pad(v, ((0, pad), (0, 0)))
        blkN = padded(post).reshape(nblk, period, -1).sum(axis=1)
        blkb = padded(bframe).reshape(nblk, period, -1).sum(axis=1)
        inc = lambda v: jnp.cumsum(
            jnp.concatenate([jnp.zeros_like(v[:1]), v], axis=0), axis=0)
        csN, csb = inc(blkN), inc(blkb)                      # [nblk+1, ·]
        if (ends - starts == mwin).all() and len(spans) == nblk - mwin + 1:
            # pure regular grid: two static slices, no indexing at all
            N = csN[mwin:] - csN[:-mwin]
            b = csb[mwin:] - csb[:-mwin]
        else:  # clamped tail windows: constant-index take on the tiny
            N = csN[ends] - csN[starts]          # [nblk+1, G] cumsum —
            b = csb[ends] - csb[starts]          # negligible vs the GEMMs
        return _damped_solve(N, b, U, 0.0)                   # [N, K]

    return jax.jit(impl)


def plda_affinity(plda: Plda, ivecs, *,
                  normalize_length: bool = True) -> np.ndarray:
    """Symmetrized PLDA log-likelihood-ratio affinity between every
    window pair: [N, K] -> [N, N] float32 (one two-GEMM scoring
    dispatch; the LLR is not exactly symmetric, so (S + S^T)/2)."""
    iv = np.asarray(ivecs, np.float64)
    s = np.asarray(plda.score(iv, iv, normalize_length=normalize_length))
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


def diarize(extractor: IvectorExtractor, plda: Plda, feats, *,
            window: int = 150, period: int = 75, min_window: int = 25,
            mask=None, num_speakers: int | None = None,
            threshold: float = 0.0, posterior_scale: float = 1.0,
            min_post: float = 0.025):
    """Who-spoke-when for one recording's features [T, D] ->
    ``(frame_labels [T], segments)`` where ``segments`` is a list of
    ``(start_frame, end_frame, speaker)`` runs. Frames take the label of
    the window whose CENTER is nearest; with a VAD ``mask``, non-speech
    frames are labeled -1 and excluded from segments."""
    ivecs, spans = segment_ivectors(
        extractor, feats, window=window, period=period,
        min_window=min_window, mask=mask,
        posterior_scale=posterior_scale, min_post=min_post)
    aff = plda_affinity(plda, ivecs)
    labels = cluster_affinity(aff, num_speakers=num_speakers,
                              threshold=threshold)
    T = np.shape(feats)[0]
    centers = spans.mean(axis=1)                     # [N]
    nearest = np.abs(np.arange(T)[:, None]
                     - centers[None, :]).argmin(axis=1)
    frame_labels = labels[nearest]
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
