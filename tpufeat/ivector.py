"""I-vector speaker embeddings (Kaldi ``ivector-extractor-*`` tools and the
online2 ``OnlineIvectorFeature`` — SURVEY.md §2's "beyond the reference"
tier; the standard speaker-adaptation input of Kaldi online nnet decoding).

TPU-native formulation — every hot step is a GEMM or a small batched solve:

- diag-GMM log-likelihoods are TWO matmuls: ``ll = gconst + x @ A.T +
  x² @ B.T`` with ``A = μ/σ²`` and ``B = -1/(2σ²)`` precomputed host-side
  (the MXU runs both; no per-gaussian loop exists anywhere).
- i-vector estimation needs only ``(N[g], b[k])`` — the zeroth-order
  counts and the PROJECTED linear term ``b = Σ_t Σ_g γ_tg M_gᵀΣ_g⁻¹
  (x_t-μ_g)`` — never the [G, D] first-order stats, so the online carry
  is [B, G] + [B, K] floats and each chunk update is one masked GEMM.
- the posterior precision is SPD with eigenvalues >= 1 (``L = I + Σ_g
  N_g M_gᵀΣ_g⁻¹M_g``), so every estimate is a batched CHOLESKY solve —
  measured 2.6× faster than LU on chip at K=100 at the same ~2e-6
  accuracy; Newton-Schulz (GEMM-only) was costed and rejected: its f32
  iteration stalls at ~2e-2 under TPU default matmul precision
  (`benchmarks/experiments/solver_cost.py`).

Model: classic total variability (Dehak et al.), ``x_t ~ N(μ_g + M_g w,
Σ_g)`` with prior ``w ~ N(0, I)`` and Σ_g the diagonal UBM variances.
Kaldi instead absorbs the means into ``M`` and gives ``w`` a
``prior_offset`` mean on its first coordinate, which its online feature
pipeline subtracts again before use — the two parametrizations produce
the same usable embedding, and the textbook form needs no offset
bookkeeping (documented in docs/DESIGN.md §8).

Float64 goldens for every public entry point live in
``tpufeat.reference.cpu`` (``diag_gmm_log_likes`` … ``ivector_features``)
per the repo's parity convention.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "DiagUbm", "train_diag_ubm", "IvectorExtractor",
    "train_ivector_extractor", "utterance_ivector", "ivector_features",
    "StreamingIvector",
]

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Diagonal-covariance UBM
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiagUbm:
    """Diagonal-covariance GMM (the universal background model).

    Parameters are stored as float64 NumPy (like every other precomputed
    matrix in this package); the jitted paths receive the derived f32
    GEMM operands as *arguments* so nothing large is closed over (the
    relay rejects big HLO constants — CLAUDE.md)."""

    weights: np.ndarray   # [G]
    means: np.ndarray     # [G, D]
    vars: np.ndarray      # [G, D]

    def __post_init__(self):
        w = np.asarray(self.weights, np.float64)
        mu = np.asarray(self.means, np.float64)
        var = np.asarray(self.vars, np.float64)
        if mu.ndim != 2 or var.shape != mu.shape or w.shape != mu.shape[:1]:
            raise ValueError(f"inconsistent UBM shapes {w.shape} "
                             f"{mu.shape} {var.shape}")
        if (var <= 0).any():
            raise ValueError("UBM variances must be positive")
        if not np.isclose(w.sum(), 1.0, atol=1e-6) or (w <= 0).any():
            raise ValueError("UBM weights must be positive and sum to 1")
        object.__setattr__(self, "weights", w)
        object.__setattr__(self, "means", mu)
        object.__setattr__(self, "vars", var)

    @property
    def num_gauss(self) -> int:
        return self.weights.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    def _gemm_operands(self):
        """(gconst [G], A [G, D], B [G, D]) f32 — see module docstring."""
        inv = 1.0 / self.vars
        gconst = (np.log(self.weights)
                  - 0.5 * (np.log(2.0 * np.pi * self.vars)
                           + self.means ** 2 * inv).sum(axis=1))
        return (gconst.astype(np.float32),
                (self.means * inv).astype(np.float32),
                (-0.5 * inv).astype(np.float32))

    def _device_operands(self):
        """(gconst, a, b) as cached DEVICE arrays — avoids re-uploading
        the GEMM operands on every call (see ivector._online_operands'
        measurement note)."""
        cached = self.__dict__.get("_device_ops")
        if cached is None:
            cached = tuple(jnp.asarray(v) for v in self._gemm_operands())
            if not any(isinstance(v, jax.core.Tracer) for v in cached):
                self.__dict__["_device_ops"] = cached
        return cached

    def log_likes(self, feats) -> jnp.ndarray:
        """[..., T, D] frames -> [..., T, G] per-gaussian log-likelihoods
        (two MXU matmuls)."""
        gconst, a, b = self._device_operands()
        return _log_likes_jit(jnp.asarray(feats, jnp.float32),
                              gconst, a, b)

    def posteriors(self, feats, *, min_post: float = 0.0) -> jnp.ndarray:
        """[..., T, D] -> [..., T, G] responsibilities; entries below
        ``min_post`` are zeroed and the rest renormalized (Kaldi's
        posterior pruning, vectorized)."""
        gconst, a, b = self._device_operands()
        return _posteriors_jit(jnp.asarray(feats, jnp.float32),
                               gconst, a, b, float(min_post))

    def save(self, path: str) -> None:
        np.savez(path, weights=self.weights, means=self.means,
                 vars=self.vars)

    @classmethod
    def load(cls, path: str) -> "DiagUbm":
        z = np.load(path)
        return cls(z["weights"], z["means"], z["vars"])


@jax.jit
def _log_likes_jit(x, gconst, a, b):
    return (gconst
            + jnp.einsum("...td,gd->...tg", x, a, precision=_HI)
            + jnp.einsum("...td,gd->...tg", x * x, b, precision=_HI))


@functools.partial(jax.jit, static_argnums=4)
def _posteriors_jit(x, gconst, a, b, min_post):
    post = jax.nn.softmax(_log_likes_jit(x, gconst, a, b), axis=-1)
    if min_post > 0.0:
        post = jnp.where(post >= min_post, post, 0.0)
        post = post / jnp.maximum(post.sum(axis=-1, keepdims=True), 1e-20)
    return post


def train_diag_ubm(feats, num_gauss: int, *, iters: int = 8,
                   final_iters: int = 12, seed: int = 0,
                   var_floor: float = 1e-3,
                   perturb: float = 0.1) -> DiagUbm:
    """Train a diagonal UBM by binary splitting + EM (the
    ``gmm-global-init-from-feats`` recipe): start from the global
    gaussian, repeatedly split the heaviest components toward
    ``num_gauss`` with ``iters`` EM sweeps per stage and ``final_iters``
    at full size. Each EM sweep is three GEMMs ([T,D]@[D,G] likelihoods,
    postsᵀ@x, postsᵀ@x²) — MXU end to end.

    ``feats``: [F, D] frames (pass the corpus' MFCC/fbank rows).
    ``var_floor`` is a fraction of the global variance, per dimension."""
    x = np.asarray(feats, np.float32)
    if x.ndim != 2 or x.shape[0] < 2:
        raise ValueError(f"need [F>=2, D] training frames, got {x.shape}")
    if num_gauss < 1:
        raise ValueError("num_gauss must be >= 1")
    rng = np.random.default_rng(seed)
    gmean = x.mean(axis=0, dtype=np.float64)
    gvar = x.var(axis=0, dtype=np.float64)
    if (gvar <= 0).any():
        raise ValueError("training frames are constant along a dimension")
    floor = np.maximum(var_floor * gvar, 1e-20)

    w = np.ones(1, np.float64)
    mu = gmean[None, :].copy()
    var = gvar[None, :].copy()
    xdev = jnp.asarray(x)

    def em(n_iters):
        nonlocal w, mu, var
        for _ in range(n_iters):
            ubm = DiagUbm(w / w.sum(), mu, var)
            gconst, a, b = ubm._gemm_operands()
            nk, xk, x2k = _ubm_em_stats_jit(
                xdev, jnp.asarray(gconst), jnp.asarray(a), jnp.asarray(b))
            nk = np.maximum(np.asarray(nk, np.float64), 1e-10)
            xk = np.asarray(xk, np.float64)
            x2k = np.asarray(x2k, np.float64)
            w = nk / nk.sum()
            mu = xk / nk[:, None]
            var = np.maximum(x2k / nk[:, None] - mu * mu, floor[None, :])

    em(iters)
    while w.shape[0] < num_gauss:
        n_split = min(w.shape[0], num_gauss - w.shape[0])
        order = np.argsort(-w)[:n_split]
        d = perturb * np.sqrt(var[order]) * rng.standard_normal(
            (n_split, mu.shape[1]))
        mu = np.concatenate([mu, mu[order] + d], axis=0)
        mu[order] -= d
        var = np.concatenate([var, var[order]], axis=0)
        w = np.concatenate([w, w[order] * 0.5], axis=0)
        w[order] *= 0.5
        em(iters)
    em(final_iters)
    return DiagUbm(w / w.sum(), mu, var)


@jax.jit
def _ubm_em_stats_jit(x, gconst, a, b):
    post = jax.nn.softmax(_log_likes_jit(x, gconst, a, b), axis=-1)
    nk = post.sum(axis=0)
    xk = jnp.einsum("tg,td->gd", post, x, precision=_HI)
    x2k = jnp.einsum("tg,td->gd", post, x * x, precision=_HI)
    return nk, xk, x2k


def avg_log_like(ubm: DiagUbm, feats) -> float:
    """Mean total log-likelihood per frame (EM's monotone objective)."""
    ll = ubm.log_likes(feats)
    return float(jnp.mean(jax.scipy.special.logsumexp(ll, axis=-1)))


# ---------------------------------------------------------------------------
# I-vector extractor (total-variability model)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class IvectorExtractor:
    """Total-variability model over a :class:`DiagUbm`:
    ``x_t ~ N(μ_g + M_g w, Σ_g)``, ``w ~ N(0, I_K)``.

    ``M``: [G, D, K] float64. Derived GEMM operands (``P = Σ⁻¹M``,
    ``U_g = M_gᵀΣ_g⁻¹M_g``, ``q_g = μ_gᵀΣ_g⁻¹M_g``) are computed
    host-side once and passed into the jitted paths as arguments."""

    ubm: DiagUbm
    M: np.ndarray         # [G, D, K]

    def __post_init__(self):
        m = np.asarray(self.M, np.float64)
        if m.ndim != 3 or m.shape[:2] != self.ubm.means.shape:
            raise ValueError(f"M shape {m.shape} inconsistent with UBM "
                             f"{self.ubm.means.shape}")
        object.__setattr__(self, "M", m)

    @property
    def ivector_dim(self) -> int:
        return self.M.shape[2]

    @functools.cached_property
    def _operands(self):
        """f32 (P [G,D,K], U [G,K,K], q [G,K])."""
        inv = 1.0 / self.ubm.vars                       # [G, D]
        P = inv[:, :, None] * self.M                    # Σ⁻¹M
        U = np.einsum("gdk,gdl->gkl", self.M, P)
        q = np.einsum("gd,gdk->gk", self.ubm.means, P)
        return (P.astype(np.float32), U.astype(np.float32),
                q.astype(np.float32))

    def stats(self, feats, mask=None, *, posterior_scale: float = 1.0,
              min_post: float = 0.0):
        """Zeroth/centered-first-order Baum-Welch stats for training and
        diagnostics: [..., T, D] frames (+ optional [..., T] validity
        mask) -> ``(N [..., G], F [..., G, D])`` with
        ``F_g = Σ_t γ_tg (x_t − μ_g)``."""
        x = jnp.asarray(feats, jnp.float32)
        post = self.ubm.posteriors(x, min_post=min_post)
        if mask is not None:
            post = post * jnp.asarray(mask, post.dtype)[..., None]
        post = post * posterior_scale
        n = post.sum(axis=-2)
        f = (jnp.einsum("...tg,...td->...gd", post, x, precision=_HI)
             - n[..., None] * jnp.asarray(self.ubm.means, jnp.float32))
        return n, f

    def estimate(self, n, f) -> jnp.ndarray:
        """Posterior-mean i-vector from ``stats`` output: [..., G] +
        [..., G, D] -> [..., K] (one batched K×K solve)."""
        ops = _online_operands(self)        # cached device P / U
        return _estimate_from_nf_jit(jnp.asarray(n, jnp.float32),
                                     jnp.asarray(f, jnp.float32),
                                     ops[3], ops[4])

    def save(self, path: str) -> None:
        np.savez(path, weights=self.ubm.weights, means=self.ubm.means,
                 vars=self.ubm.vars, M=self.M)

    @classmethod
    def load(cls, path: str) -> "IvectorExtractor":
        z = np.load(path)
        return cls(DiagUbm(z["weights"], z["means"], z["vars"]), z["M"])


def _spd_solve(L, b):
    """Batched SPD solve via Cholesky ([..., K, K] + [..., K] ->
    [..., K]); L = I + PSD here, so factorization never pivots."""
    import jax.scipy.linalg as jsl
    return jsl.cho_solve((jnp.linalg.cholesky(L), True),
                         b[..., None])[..., 0]


@jax.jit
def _estimate_from_nf_jit(n, f, P, U):
    L = (jnp.eye(U.shape[-1], dtype=jnp.float32)
         + jnp.einsum("...g,gkl->...kl", n, U, precision=_HI))
    b = jnp.einsum("...gd,gdk->...k", f, P, precision=_HI)
    return _spd_solve(L, b)


def utterance_ivector(extractor: IvectorExtractor, feats, mask=None, *,
                      posterior_scale: float = 1.0,
                      min_post: float = 0.0) -> jnp.ndarray:
    """One i-vector per utterance: [T, D] -> [K] (or [B, T, D] + mask ->
    [B, K])."""
    n, f = extractor.stats(feats, mask, posterior_scale=posterior_scale,
                           min_post=min_post)
    return extractor.estimate(n, f)


def train_ivector_extractor(ubm: DiagUbm, feats, lengths=None, *,
                            ivector_dim: int = 64, iters: int = 5,
                            seed: int = 0,
                            return_objective: bool = False):
    """EM-train the total-variability matrix ``M`` (the
    ``ivector-extractor-acc-stats`` / ``ivector-extractor-est`` pair).

    ``feats``: padded utterance batch [B, T, D] (+ ``lengths`` [B]) or a
    list of [T_i, D] arrays (padded internally). Per iteration the
    E-step is one jitted program (posterior GEMMs, batched K×K solve for
    every utterance, accumulator einsums) and the M-step is one batched
    host-side solve ``M_g = Y_g A_g⁻¹`` — the diag-Σ cancels, so this is
    exact. Variances stay pinned to the UBM's (Kaldi's
    ``--update-variances=false``)."""
    if isinstance(feats, (list, tuple)):
        lens = np.array([np.asarray(u).shape[0] for u in feats], np.int64)
        tmax = int(lens.max())
        dim = np.asarray(feats[0]).shape[1]
        pad = np.zeros((len(feats), tmax, dim), np.float32)
        for i, u in enumerate(feats):
            pad[i, : lens[i]] = np.asarray(u, np.float32)
        feats, lengths = pad, lens
    x = jnp.asarray(feats, jnp.float32)
    if x.ndim != 3 or x.shape[2] != ubm.dim:
        raise ValueError(f"feats {x.shape} vs UBM dim {ubm.dim}")
    if lengths is None:
        lengths = np.full(x.shape[0], x.shape[1], np.int64)
    mask = (jnp.arange(x.shape[1])[None, :]
            < jnp.asarray(lengths)[:, None]).astype(jnp.float32)

    rng = np.random.default_rng(seed)
    # Columns scaled like the per-dim stddev so iteration 1's posteriors
    # are in a sane range regardless of the feature scaling.
    M = (rng.standard_normal((ubm.num_gauss, ubm.dim, ivector_dim))
         * np.sqrt(ubm.vars)[:, :, None])
    objs = []
    for _ in range(iters):
        ext = IvectorExtractor(ubm, M)
        P, U, _ = ext._operands
        n, f = ext.stats(x, mask)
        Y, A, obj = _extractor_estep_jit(n, f, jnp.asarray(P),
                                         jnp.asarray(U))
        objs.append(float(obj))
        A64 = np.asarray(A, np.float64)
        jitter = 1e-6 * np.trace(A64, axis1=1, axis2=2).mean()
        A64 = A64 + jitter * np.eye(ivector_dim)[None]
        # M_g A_g = Y_g  (A symmetric) -> solve per gaussian
        M = np.linalg.solve(A64, np.transpose(
            np.asarray(Y, np.float64), (0, 2, 1))).transpose(0, 2, 1)
    ext = IvectorExtractor(ubm, M)
    return (ext, objs) if return_objective else ext


@jax.jit
def _extractor_estep_jit(n, f, P, U):
    K = U.shape[-1]
    L = (jnp.eye(K, dtype=jnp.float32)
         + jnp.einsum("bg,gkl->bkl", n, U, precision=_HI))
    b = jnp.einsum("bgd,gdk->bk", f, P, precision=_HI)
    import jax.scipy.linalg as jsl
    Linv = jsl.cho_solve(
        (jnp.linalg.cholesky(L), True),
        jnp.broadcast_to(jnp.eye(K, dtype=jnp.float32), L.shape))
    Ew = jnp.einsum("bkl,bl->bk", Linv, b, precision=_HI)
    Eww = Linv + jnp.einsum("bk,bl->bkl", Ew, Ew, precision=_HI)
    Y = jnp.einsum("bgd,bk->gdk", f, Ew, precision=_HI)
    A = jnp.einsum("bg,bkl->gkl", n, Eww, precision=_HI)
    # EM auxiliary (up to const): Σ_u [E[w]ᵀb − ½ tr(L E[wwᵀ])]
    obj = (jnp.einsum("bk,bk->", Ew, b)
           - 0.5 * jnp.einsum("bkl,blk->", L, Eww))
    return Y, A, obj


# ---------------------------------------------------------------------------
# Online i-vector features (Kaldi online2 OnlineIvectorFeature)
# ---------------------------------------------------------------------------

def _online_operands(extractor: IvectorExtractor):
    """f32 GEMM operands for the online paths: (gconst, a, b) for
    posteriors, (P [G,D,K], U [G,K,K], q [G,K]) for estimation — where
    the per-frame linear term is ``b_t = Σ_g γ_tg[(x_tᵀΣ_g⁻¹M_g) − q_g]``
    so the carried state is only (N [G], b [K]).

    Cached as DEVICE arrays per extractor: U alone is 20 MB at
    G=512/K=100, and re-uploading the operands on every call measured
    ~620 ms of a 670 ms segment_ivectors dispatch through the relay
    (the jitted program itself is ~50 ms — `benchmarks/experiments/seg_bisect.py`)."""
    cached = extractor.__dict__.get("_device_operands")
    if cached is None:
        gconst, a, bq = extractor.ubm._gemm_operands()
        P, U, q = extractor._operands
        cached = (jnp.asarray(gconst), jnp.asarray(a), jnp.asarray(bq),
                  jnp.asarray(P), jnp.asarray(U), jnp.asarray(q))
        # frozen dataclass: stash via __dict__ like cached_property
        # does — but never cache TRACERS (a caller may wrap an
        # estimate/extract path in its own jit; asarray then stages a
        # constant whose tracer must not outlive that trace)
        if not any(isinstance(v, jax.core.Tracer) for v in cached):
            extractor.__dict__["_device_operands"] = cached
    return cached


def ivector_features(extractor: IvectorExtractor, feats, lengths=None, *,
                     period: int = 10, posterior_scale: float = 0.1,
                     max_count: float = 0.0,
                     min_post: float = 0.0) -> jnp.ndarray:
    """Per-frame online i-vectors, offline (the oracle for
    :class:`StreamingIvector`): frame ``t`` carries the i-vector
    estimated from the scaled stats of frames ``[0, floor(t/period)·
    period)`` — strictly causal, refreshed every ``period`` frames
    (Kaldi's ``ivector_period``; its estimate additionally sees the
    current frame, an off-by-≤period difference documented in
    docs/DESIGN.md §8). Frames before the first boundary emit the prior
    mean (zeros).

    ``max_count > 0`` caps the influence of long audio: when the scaled
    count exceeds it, stats are damped by ``max_count / count`` (Kaldi's
    ``--max-count`` behaviour of halting adaptation, in scaled-count
    units).

    [T, D] -> [T, K]; [B, T, D] (+ lengths) -> [B, T, K]."""
    x = jnp.asarray(feats, jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, T, D = x.shape
    if period < 1:
        raise ValueError("period must be >= 1")
    if lengths is None:
        mask = jnp.ones((B, T), jnp.float32)
    else:
        mask = (jnp.arange(T)[None, :]
                < jnp.asarray(lengths)[:, None]).astype(jnp.float32)
    ops = _online_operands(extractor)
    out = _ivector_features_jit(T, period, float(posterior_scale),
                                float(max_count), float(min_post))(
        x, mask, *ops)
    return out[0] if squeeze else out


@functools.lru_cache(maxsize=None)
def _ivector_features_jit(T: int, period: int, scale: float,
                          max_count: float, min_post: float):
    nblk = -(-T // period)            # boundaries at 0, p, 2p, …

    def impl(x, mask, gconst, a, bq, P, U, q):
        B, T_, D = x.shape
        post = _posteriors_jit(x, gconst, a, bq, min_post)
        post = post * mask[..., None] * scale               # [B, T, G]
        bframe = _per_frame_linear(post, x, P, q)           # [B, T, K]
        pad = nblk * period - T_
        padded = lambda v: jnp.pad(v, ((0, 0), (0, pad)) + ((0, 0),) *
                                   (v.ndim - 2))
        # exclusive block cumsum -> stats of frames [0, m*period).
        # NOT cumsum(v) - v: that subtraction leaks the CURRENT block's
        # f32 rounding into the "past-only" estimate (measured 3e-6),
        # breaking the strict-causality bitwise test; shift-then-cumsum
        # keeps est[m] a pure function of blocks < m.
        blkN = padded(post).reshape(B, nblk, period, -1).sum(axis=2)
        blkb = padded(bframe).reshape(B, nblk, period, -1).sum(axis=2)
        exc = lambda v: jnp.cumsum(
            jnp.concatenate([jnp.zeros_like(v[:, :1]), v[:, :-1]], axis=1),
            axis=1)
        N, bsum = exc(blkN), exc(blkb)                      # [B, nblk, ·]
        est = _damped_solve(N, bsum, U, max_count)          # [B, nblk, K]
        out = jnp.repeat(est, period, axis=1)[:, :T_]
        return out

    return jax.jit(impl)


def _per_frame_linear(post, x, P, q):
    """γ [..., T, G], x [..., T, D] -> per-frame linear term [..., T, K]
    (two GEMMs; the [..., T, G, D] intermediate is small because D is a
    feature dim)."""
    gx = post[..., :, :, None] * x[..., :, None, :]         # [.., T, G, D]
    t1 = jnp.einsum("...tgd,gdk->...tk", gx, P, precision=_HI)
    t2 = jnp.einsum("...tg,gk->...tk", post, q, precision=_HI)
    return t1 - t2


def _damped_solve(N, bsum, U, max_count):
    """(N [..., G], b [..., K]) -> i-vectors [..., K], with optional
    max_count damping of the stats."""
    if max_count > 0.0:
        cnt = N.sum(axis=-1, keepdims=True)
        factor = jnp.minimum(1.0, max_count / jnp.maximum(cnt, 1e-20))
        N = N * factor
        bsum = bsum * factor
    K = U.shape[-1]
    L = (jnp.eye(K, dtype=jnp.float32)
         + jnp.einsum("...g,gkl->...kl", N, U, precision=_HI))
    return _spd_solve(L, bsum)


class StreamingIvector:
    """Online twin of :func:`ivector_features` — exact for ANY chunk plan
    (same boundary grid: each row refreshes its i-vector at absolute
    frame indices that are multiples of ``period``, using strictly-past
    stats).

    Carry per row: scaled zeroth-order counts N [G], projected linear
    term b [K], the in-force estimate [K], and a PER-ROW frame counter
    (so :meth:`reset_rows` restarts a recycled serving slot on its own
    boundary grid — the other rows are bit-unchanged). Follows the repo's
    streaming-wrapper conventions (process/state/set_state/reset_rows;
    ``save_state``/``load_state`` round-trip)."""

    def __init__(self, extractor: IvectorExtractor, batch_size: int = 1,
                 *, period: int = 10, posterior_scale: float = 0.1,
                 max_count: float = 0.0, min_post: float = 0.0):
        if period < 1:
            raise ValueError("period must be >= 1")
        self.extractor = extractor
        self.period, self.scale = int(period), float(posterior_scale)
        self.max_count, self.min_post = float(max_count), float(min_post)
        G, K = extractor.ubm.num_gauss, extractor.ivector_dim
        self._ops = _online_operands(extractor)
        self.N = jnp.zeros((batch_size, G), jnp.float32)
        self.b = jnp.zeros((batch_size, K), jnp.float32)
        self.in_force = jnp.zeros((batch_size, K), jnp.float32)
        self.n_seen = jnp.zeros((batch_size,), jnp.int32)

    @property
    def dim(self) -> int:
        return self.extractor.ivector_dim

    def process(self, feats) -> jnp.ndarray:
        """[B, n, D] feature rows -> [B, n, K] per-frame i-vectors (1:1,
        no emission delay)."""
        rows = jnp.asarray(feats, jnp.float32)
        if rows.ndim != 3 or rows.shape[0] != self.N.shape[0]:
            raise ValueError(f"expected [B={self.N.shape[0]}, n, D], "
                             f"got {rows.shape}")
        n = rows.shape[1]
        if n == 0:
            return jnp.zeros(rows.shape[:2] + (self.dim,), jnp.float32)
        fn = _streaming_ivector_step_jit(n, self.period, self.scale,
                                         self.max_count, self.min_post)
        out, self.N, self.b, self.in_force = fn(
            rows, self.N, self.b, self.in_force, self.n_seen, *self._ops)
        self.n_seen = self.n_seen + n
        return out

    def state(self) -> dict:
        return {"N": self.N, "b": self.b, "in_force": self.in_force,
                "n_seen": self.n_seen}

    def set_state(self, s: dict) -> None:
        self.N = jnp.asarray(s["N"])
        self.b = jnp.asarray(s["b"])
        self.in_force = jnp.asarray(s["in_force"])
        self.n_seen = jnp.asarray(s["n_seen"], jnp.int32)

    def reset_rows(self, rows) -> None:
        from tpufeat.streaming import zero_rows
        self.N = zero_rows(self.N, rows)
        self.b = zero_rows(self.b, rows)
        self.in_force = zero_rows(self.in_force, rows)
        self.n_seen = zero_rows(self.n_seen, rows)

    def reset(self) -> None:
        self.N = jnp.zeros_like(self.N)
        self.b = jnp.zeros_like(self.b)
        self.in_force = jnp.zeros_like(self.in_force)
        self.n_seen = jnp.zeros_like(self.n_seen)


@functools.lru_cache(maxsize=None)
def _streaming_ivector_step_jit(n: int, period: int, scale: float,
                                max_count: float, min_post: float):
    """One compiled step per (chunk rows, config). Per-row boundary grid:
    row b refreshes at chunk offsets j with (n_seen[b] + j) % period == 0;
    at most ceil(n/period) boundaries fall inside a chunk (the first
    candidate sits in [0, period), so the tight bound matters: at the
    serving shape n == period it HALVES the Cholesky count vs the naive
    n//period + 1). Prefix stats at each boundary and the per-frame
    segment selection are both one-hot GEMMs (gathers are the op class
    measured 30× slower on this chip — CLAUDE.md)."""
    nb = -(-n // period)

    def impl(rows, N0, b0, inf0, n_seen, gconst, a, bq, P, U, q):
        B = rows.shape[0]
        post = _posteriors_jit(rows, gconst, a, bq, min_post) * scale
        bframe = _per_frame_linear(post, rows, P, q)        # [B, n, K]

        j = jnp.arange(n, dtype=jnp.int32)
        j0 = (-n_seen) % period                             # [B]
        jb = j0[:, None] + period * jnp.arange(nb, dtype=jnp.int32)[None]
        valid = jb < n                                      # [B, nb]
        # prefix one-hot: frame t contributes to boundary s iff t < jb_s
        pre = (j[None, None, :] < jb[:, :, None]).astype(jnp.float32)
        Nb = N0[:, None] + jnp.einsum("bst,btg->bsg", pre, post,
                                      precision=_HI)
        bb = b0[:, None] + jnp.einsum("bst,btk->bsk", pre, bframe,
                                      precision=_HI)
        est = _damped_solve(Nb, bb, U, max_count)           # [B, nb, K]

        # frame t emits: in-force (seg 0) or boundary s with the largest
        # jb_s <= t  -> segment index = #boundaries <= t
        seg = jnp.sum((jb[:, None, :] <= j[None, :, None])
                      & valid[:, None, :], axis=-1)         # [B, n]
        sel = (seg[:, :, None]
               == jnp.arange(nb + 1, dtype=jnp.int32)).astype(jnp.float32)
        allest = jnp.concatenate([inf0[:, None], est], axis=1)
        out = jnp.einsum("bts,bsk->btk", sel, allest, precision=_HI)

        # new in-force = estimate at the LAST valid boundary (if any)
        nvalid = valid.sum(axis=-1)                         # [B]
        last = (jnp.arange(nb + 1)[None, :]
                == nvalid[:, None]).astype(jnp.float32)
        inf1 = jnp.einsum("bs,bsk->bk", last, allest, precision=_HI)

        N1 = N0 + post.sum(axis=1)
        b1 = b0 + bframe.sum(axis=1)
        return out, N1, b1, inf1

    return jax.jit(impl)
