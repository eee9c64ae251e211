"""Power-Normalized Cepstral Coefficients (PNCC, Kim & Stern 2012) —
beyond-reference robust-ASR feature family, the third cepstrum chain
next to MFCC and PLP (SURVEY.md §2 C7-C9 tier).

The chain consumes the SAME spectral stage as everything else — a
gammatone power filterbank is just another precomputed matrix through
the fused Pallas kernels (``mel_bin_style="gammatone"``) — and replaces
log compression with the published noise-suppression stack:

  gammatone power P[m, l]                          (C7, log="none")
    -> medium-time power Q: mask-aware 5-frame mean        (eq. M=2)
    -> asymmetric noise floor Qle (lambda_a=0.999/lambda_b=0.5 lowpass,
       slow-attack fast-release: the floor RISES slowly toward power
       bursts and drops fast after them — the lower-envelope behavior
       Kim & Stern intend), half-wave Q0 = max(Q - Qle, 0)
    -> temporal masking: peak tracker Qp (lambda_t=0.85), suppression
       mu_t=0.2; second asymmetric filter on Q0 gives the noise floor Qf
    -> excitation switch: R = Qtm where Q >= c*Qle (c=2) else Qf
    -> spectral weight smoothing S = channel mean_{+-4}(R / Q); T = P*S
    -> mean power normalization: running mu (lambda_mu=0.999), U = T/mu
    -> power-law V = U^(1/15)  ->  DCT-II keep n_mfcc

Every frame recursion (noise floor, peak tracker, power mean) is ONE
``lax.scan`` over frames with a [B, M]-wide elementwise body — trivial
VPU work next to the spectro stage — and every windowed mean is
mask-aware so padded batches match per-utterance processing exactly.
The float64 golden (``tpufeat.reference.cpu.pncc_from_power``)
implements the same equations independently.

Published constants (Kim & Stern 2012, Table/§III); fixed here rather
than config-exposed — variants in the literature all use these.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpufeat import matrices
from tpufeat.config import FeatureConfig

LAMBDA_A = 0.999      # asymmetric lowpass, rising branch
LAMBDA_B = 0.5        # asymmetric lowpass, falling branch
LAMBDA_T = 0.85       # temporal-masking peak decay
MU_T = 0.2            # temporal-masking suppression
C_EXC = 2.0           # excitation / non-excitation switch
LAMBDA_MU = 0.999     # mean-power normalization decay
POWER = 1.0 / 15.0    # power-law nonlinearity
M_MED = 2             # medium-time window: l +- 2
N_SPEC = 4            # spectral smoothing: m +- 4


def _asym_step(prev, q):
    """One step of the asymmetric lowpass: fast attack, slow release."""
    rising = q >= prev
    lam = jnp.where(rising, LAMBDA_A, LAMBDA_B)
    return lam * prev + (1.0 - lam) * q


def _window_mean(x, mask, half, axis):
    """Mask-aware moving average over ``axis`` with window ``+-half``
    (static pads + slices — no gathers)."""
    num = x * mask
    den = mask
    outs_n, outs_d = [], []
    T = x.shape[axis]
    for off in range(-half, half + 1):
        sl = [slice(None)] * x.ndim
        if off < 0:
            sl[axis] = slice(0, T + off)
            pad = [(0, 0)] * x.ndim
            pad[axis] = (-off, 0)
        else:
            sl[axis] = slice(off, T)
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, off)
        outs_n.append(jnp.pad(num[tuple(sl)], pad))
        outs_d.append(jnp.pad(den[tuple(sl)], pad))
    n = sum(outs_n)
    d = sum(outs_d)
    return n / jnp.maximum(d, 1e-20)


def pncc_from_power(p: jnp.ndarray, mask: jnp.ndarray,
                    cfg: FeatureConfig) -> jnp.ndarray:
    """[B, F, M] gammatone power (+ [B, F] mask) -> [B, F, n_mfcc] PNCC.
    Padding frames emit zeros and never touch the recursions' carries."""
    dt = p.dtype
    B, F, M = p.shape
    m3 = mask.astype(dt)[..., None]                       # [B, F, 1]
    q = _window_mean(p, m3, M_MED, axis=1)                # medium-time

    def step(carry, inp):
        qle, qf, qp, valid_seen = carry
        q_l, m_l = inp                                    # [B, M], [B, 1]
        # initialize carries from the first VALID frame
        fresh = (valid_seen < 0.5) & (m_l > 0.5)
        qle_l = jnp.where(fresh, 0.9 * q_l, _asym_step(qle, q_l))
        q0 = jnp.maximum(q_l - qle_l, 0.0)
        qf_l = jnp.where(fresh, q0, _asym_step(qf, q0))
        qp_prev = jnp.where(fresh, q0, qp)
        qtm = jnp.where(q0 >= LAMBDA_T * qp_prev, q0, MU_T * qp_prev)
        qp_l = jnp.maximum(LAMBDA_T * qp_prev, q0)
        r = jnp.where(q_l >= C_EXC * qle_l, qtm, qf_l)
        # frozen carries through padding
        keep = m_l > 0.5
        carry = (jnp.where(keep, qle_l, qle),
                 jnp.where(keep, qf_l, qf),
                 jnp.where(keep, qp_l, qp),
                 jnp.maximum(valid_seen, m_l))
        return carry, r

    init = (jnp.zeros((B, M), dt), jnp.zeros((B, M), dt),
            jnp.zeros((B, M), dt), jnp.zeros((B, 1), dt))
    _, r = jax.lax.scan(step, init,
                        (jnp.swapaxes(q, 0, 1),
                         jnp.swapaxes(m3, 0, 1)))
    r = jnp.swapaxes(r, 0, 1)                             # [B, F, M]

    # spectral weight smoothing over channels (all channels valid)
    w = r / jnp.maximum(q, 1e-20)
    ones = jnp.ones_like(w)
    s = _window_mean(w, ones, N_SPEC, axis=2)
    t = p * s

    # mean power normalization: running mean over channels per frame
    tbar = t.mean(axis=2)                                 # [B, F]

    def mu_step(carry, inp):
        mu, seen = carry
        tb, m_l = inp                                     # [B], [B]
        fresh = (seen < 0.5) & (m_l > 0.5)
        mu_l = jnp.where(fresh, tb,
                         LAMBDA_MU * mu + (1.0 - LAMBDA_MU) * tb)
        keep = m_l > 0.5
        return (jnp.where(keep, mu_l, mu),
                jnp.maximum(seen, m_l)), mu_l

    (_, _), mu = jax.lax.scan(
        mu_step, (jnp.zeros((B,), dt), jnp.zeros((B,), dt)),
        (tbar.T, mask.astype(dt).T))
    mu = mu.T[..., None]                                  # [B, F, 1]
    u = t / jnp.maximum(mu, 1e-20)
    v = jnp.maximum(u, cfg.log_floor) ** POWER

    dct = jnp.asarray(matrices.dct_matrix(M, cfg.pncc_ceps), dt)
    out = jnp.matmul(v, dct, precision=jax.lax.Precision.HIGHEST)
    if cfg.lifter > 0:
        out = out * jnp.asarray(
            matrices.lifter_vector(cfg.pncc_ceps, cfg.lifter), dt)
    return out * m3
