"""fMLLR (constrained MLLR) speaker adaptation — the Kaldi
``gmm-est-fmllr`` / ``transform-feats`` pair over this package's
:class:`tpufeat.ivector.DiagUbm` (SURVEY.md §2's "beyond the reference"
tier; together with VTLN warping and i-vectors this completes the
classic speaker-adaptation stack).

Model (Gales 1998): an affine feature transform ``W = [A | b]`` chosen
to maximize the adaptation data's likelihood under the diagonal GMM,

    Q(W) = beta * log|det A| + sum_d [ w_d^T k_d - 1/2 w_d^T G_d w_d ]

with per-row statistics over extended frames ``x^ = [x; 1]``:

    beta = sum_t sum_g gamma_tg
    k_d  = sum_t sum_g gamma_tg * mu_gd / sigma2_gd * x^_t        [D+1]
    G_d  = sum_t sum_g gamma_tg / sigma2_gd * x^_t x^_t^T         [D+1, D+1]

TPU-native split: the O(T·G·D) statistics are GEMMs — posteriors are the
UBM's two-matmul log-likelihood path, then the per-gaussian sums collapse
into two [T, G] @ [G, D] products (``gamma @ (mu/sigma2)`` and
``gamma @ (1/sigma2)``) followed by two einsums against ``x^`` — one
jitted program, frames never leave the device unreduced. The estimation
itself is the classic row-wise cofactor update on the tiny [D, D+1]
system — host float64 (K <= ~100; this is not TPU work), each row's
optimal alpha the closed-form root of ``alpha^2 (p·m) + alpha (p·n) -
beta = 0``.

Apply the result with :func:`tpufeat.data.apply_transform` (the
``transform-feats`` analogue — W is [D, D+1] affine in Kaldi's
append-a-1 convention). Float64 goldens for the statistics live in
``tpufeat.reference.cpu.fmllr_stats`` per the repo's parity convention.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpufeat.ivector import DiagUbm, _posteriors_jit

__all__ = ["fmllr_stats", "estimate_fmllr", "est_fmllr",
           "fmllr_objective"]

_HI = jax.lax.Precision.HIGHEST


def fmllr_stats(ubm: DiagUbm, feats, mask=None, *,
                min_post: float = 0.0, per_row: bool = False):
    """Accumulate fMLLR sufficient statistics for one speaker's
    adaptation data: [T, D] frames or a padded batch [B, T, D] (+ [B, T]
    or [B] ``mask``/lengths) -> ``(beta, K [D, D+1], G [D, D+1, D+1])``
    as float64 NumPy (ready for :func:`estimate_fmllr`). One jitted
    program; posteriors and both per-gaussian reductions are GEMMs.

    ``per_row=True`` keeps the batch axis — ``(beta [B], K [B, D, D+1],
    G [B, D, D+1, D+1])`` — so a caller grouping utterances by speaker
    (the corpus pipeline) gets every row's statistics from ONE padded
    dispatch instead of a recompile per utterance length. The GEMM
    operands ride the UBM's device cache either way (re-uploading them
    per call was the 620 ms relay tax the i-vector paths fixed —
    BASELINE.md 2026-08-19)."""
    x = jnp.asarray(feats, jnp.float32)
    if x.ndim == 2:
        x = x[None]
    if x.ndim != 3 or x.shape[-1] != ubm.dim:
        raise ValueError(f"feats {np.shape(feats)} vs UBM dim {ubm.dim}")
    B, T, D = x.shape
    if mask is None:
        m = jnp.ones((B, T), jnp.float32)
    else:
        m = jnp.asarray(mask)
        if m.ndim == 1:                      # lengths
            m = (jnp.arange(T)[None, :]
                 < m[:, None]).astype(jnp.float32)
        else:
            m = m.astype(jnp.float32)
        if m.shape != (B, T):
            raise ValueError(f"mask {m.shape} vs frames {(B, T)}")
    gconst, a, b = ubm._device_operands()
    cached = ubm.__dict__.get("_fmllr_ops")
    if cached is None:
        import jax.core
        cached = (jnp.asarray((ubm.means / ubm.vars).astype(np.float32)),
                  jnp.asarray((1.0 / ubm.vars).astype(np.float32)))
        if not any(isinstance(v, jax.core.Tracer) for v in cached):
            ubm.__dict__["_fmllr_ops"] = cached
    muinv, inv = cached
    beta, K, G = _fmllr_stats_jit(x, m, gconst, a, b, muinv, inv,
                                  float(min_post), bool(per_row))
    if per_row:
        return (np.asarray(beta, np.float64),
                np.asarray(K, np.float64), np.asarray(G, np.float64))
    return (float(beta), np.asarray(K, np.float64),
            np.asarray(G, np.float64))


@functools.partial(jax.jit, static_argnums=(7, 8))
def _fmllr_stats_jit(x, mask, gconst, a, b, muinv, inv, min_post,
                     per_row):
    post = _posteriors_jit(x, gconst, a, b, min_post)
    post = post * mask[..., None]                        # [B, T, G]
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    xe = jnp.concatenate([x, ones], axis=-1)             # [B, T, D+1]
    wk = jnp.einsum("btg,gd->btd", post, muinv, precision=_HI)
    wg = jnp.einsum("btg,gd->btd", post, inv, precision=_HI)
    kspec = "btd,bte->bde" if per_row else "btd,bte->de"
    gspec = "btd,bte,btf->bdef" if per_row else "btd,bte,btf->def"
    K = jnp.einsum(kspec, wk, xe, precision=_HI)
    G = jnp.einsum(gspec, wg, xe, xe, precision=_HI)
    beta = post.sum(axis=(1, 2)) if per_row else post.sum()
    return beta, K, G


def estimate_fmllr(beta: float, K: np.ndarray, G: np.ndarray, *,
                   iters: int = 20, min_count: float = 500.0,
                   ridge: float = 1e-8):
    """Row-wise iterative fMLLR estimation (Gales 1998; Kaldi
    ``ComputeFmllrMatrixDiagGmm``) from :func:`fmllr_stats` output.
    Returns ``W`` [D, D+1] float64 (identity-affine when ``beta <
    min_count`` — Kaldi's ``--fmllr-min-count`` fallback).

    Each row solves ``w_d = G_d^{-1}(k_d + alpha p_d)`` where ``p_d`` is
    the cofactor row of the current square part and alpha is the
    positive-determinant root of the quadratic stationarity condition;
    ``iters`` full sweeps (the auxiliary Q is monotone per row update —
    tested). ``ridge`` scales a diagonal loading of each G_d relative to
    its mean diagonal (guards rank-deficient small-count stats)."""
    K = np.asarray(K, np.float64)
    G = np.asarray(G, np.float64)
    D = K.shape[0]
    if K.shape != (D, D + 1) or G.shape != (D, D + 1, D + 1):
        raise ValueError(f"bad stats shapes {K.shape} {G.shape}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    W = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    if beta < min_count:
        return W
    Gl = G + (ridge * np.einsum("dii->d", G)[:, None, None]
              / (D + 1) * np.eye(D + 1)[None])
    for _ in range(iters):
        for d in range(D):
            A = W[:, :D]
            # cofactor row d: det(A) * inv(A)^T row d — but det(A) may
            # be huge/tiny; any positive scale of p leaves the optimum
            # invariant (alpha rescales), so use inv(A).T directly with
            # the current det's SIGN to keep the orientation.
            sign = np.sign(np.linalg.det(A)) or 1.0
            p = np.zeros(D + 1)
            p[:D] = sign * np.linalg.inv(A).T[d]
            n = np.linalg.solve(Gl[d], K[d])
            m = np.linalg.solve(Gl[d], p)
            pm = p @ m
            pn = p @ n
            if pm <= 0:
                raise np.linalg.LinAlgError(
                    "fMLLR G_d not positive definite (too few frames? "
                    "raise min_count or ridge)")
            disc = np.sqrt(pn * pn + 4.0 * pm * beta)
            roots = [(-pn + disc) / (2 * pm), (-pn - disc) / (2 * pm)]
            # pick the root maximizing the row objective
            # beta*log|pn + alpha*pm| - 1/2 alpha^2 pm
            def row_obj(alpha):
                det_term = pn + alpha * pm
                if det_term == 0.0:
                    return -np.inf
                return beta * np.log(abs(det_term)) - 0.5 * alpha ** 2 * pm
            alpha = max(roots, key=row_obj)
            W[d] = n + alpha * m
    return W


def fmllr_objective(beta: float, K: np.ndarray, G: np.ndarray,
                    W: np.ndarray) -> float:
    """The fMLLR auxiliary Q(W) (up to a W-independent constant) — the
    quantity :func:`estimate_fmllr` maximizes; exposed for tests and
    convergence diagnostics."""
    W = np.asarray(W, np.float64)
    D = W.shape[0]
    logdet = np.linalg.slogdet(W[:, :D])[1]
    quad = sum(W[d] @ K[d] - 0.5 * W[d] @ G[d] @ W[d] for d in range(D))
    return float(beta * logdet + quad)


def est_fmllr(ubm: DiagUbm, feats, mask=None, *, iters: int = 20,
              min_count: float = 500.0, min_post: float = 0.0):
    """Convenience one-call estimation: adaptation frames -> ``W``
    [D, D+1] (apply with ``tpufeat.data.apply_transform(feat, W)``)."""
    beta, K, G = fmllr_stats(ubm, feats, mask, min_post=min_post)
    return estimate_fmllr(beta, K, G, iters=iters, min_count=min_count)


def estimate_vtln_warp(ubm: DiagUbm, signal, lengths=None, *,
                       cfg=None, warps=None):
    """Per-speaker VTLN warp-factor estimation by UBM-likelihood grid
    search (the classic Kaldi VTLN training recipe: pick the warp whose
    warped-filterbank features the speaker-independent model likes
    best). ``signal``: [N] or padded [B, N] (+ lengths) of ONE
    speaker's audio; ``cfg``: the feature config whose ``vtln_warp``
    field is swept (default MFCC13_HTK); ``warps``: candidate factors
    (default 0.80..1.20 in 0.02 steps, Kaldi's grid).

    Returns ``(best_warp, per_warp_loglikes)``. Each candidate is one
    extract + one UBM scoring pass — the warped filterbank is just a
    different precomputed matrix, so every candidate reuses the same
    compiled programs except for the baked constants (first sweep pays
    ~len(warps) compiles; later speakers reuse them all)."""
    import dataclasses as _dc

    import jax.scipy.special as jss

    from tpufeat import features as _features
    from tpufeat.config import MFCC13_HTK

    cfg = MFCC13_HTK if cfg is None else cfg
    if cfg.feature_dim != ubm.dim:
        raise ValueError(f"cfg feature_dim {cfg.feature_dim} != UBM dim "
                         f"{ubm.dim}")
    if warps is None:
        warps = np.round(np.arange(0.80, 1.2001, 0.02), 2)
    x = np.asarray(signal, np.float32)
    if x.ndim == 1:
        x = x[None]
    if lengths is None:
        lengths = np.full(x.shape[0], x.shape[1], np.int32)
    if cfg.num_frames(int(np.max(lengths))) <= 0:
        raise ValueError("no valid frames: every utterance is shorter "
                         f"than one {cfg.frame_length}-sample frame")
    scores = []
    for w in warps:
        c = _dc.replace(cfg, vtln_warp=float(w))
        res = _features.extract(x, lengths, cfg=c)
        ll = ubm.log_likes(res.features)                 # [B, F, G]
        tot = jss.logsumexp(ll, axis=-1)                 # [B, F]
        mask = res.mask.astype(tot.dtype)
        scores.append(float((tot * mask).sum() / mask.sum()))
    best = int(np.argmax(scores))
    return float(warps[best]), dict(zip(map(float, warps), scores))
