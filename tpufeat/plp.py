"""Perceptual Linear Prediction (PLP) cepstra — beyond-reference feature
family (the reference front-end stops at MFCC/log-mel; SURVEY.md §2 C7-C9).

Kaldi/HTK-style chain, applied to the SAME filterbank energies the rest of
the package computes (so the fused Pallas signal kernels, streaming steps,
and time sharding all feed PLP unchanged — the tail is frame-local):

  filterbank energies E[m]                       (C7, log="none")
    -> equal-loudness weighting  E * El(f_m)     (Hermansky eq. 4 / Kaldi)
    -> intensity-loudness power law  (.)^0.33    (cube-root compression)
    -> symmetric IDFT -> autocorrelation r[0..p] (one small matmul)
    -> Levinson-Durbin -> LPC a[1..p], residual E_p
    -> LPC-to-cepstrum recursion -> c[1..p]; c[0] = ln(E_p)
    -> optional sinusoidal lifter (cfg.lifter, shared with MFCC)

All stages are static-shape, jit-safe, and vectorized over [..., F]: the
Durbin and cepstrum recursions unroll over the (small, static) model order
as elementwise VPU ops — orders of magnitude below the spectro stage's
MXU work, so PLP configs run at log-mel speed.

Conventions (documented because published PLP variants differ):
  - autocorrelation r_k = (1/N) sum_n S[n] cos(2*pi*k*n/N) of the
    even-symmetric spectrum extension, N = 2*(M+1), with the duplicated
    endpoint convention a_0 := E_1, a_{M+1} := E_M (Kaldi's);
  - LPC sign convention x_n ~= sum_i a_i x_{n-i};
  - cepstra of the MINIMUM-PHASE model 1/(1 - sum a_i z^-i):
    c_n = a_n + sum_{k=1}^{n-1} (k/n) c_k a_{n-k};  c_0 = ln(E_p).
The float64 golden (tpufeat/reference/cpu.py) implements the same
formulas independently; tests/test_plp.py holds the two within 1e-4.

Conditioning: LPC deconvolution amplifies input-spectrum error by the
per-frame Toeplitz condition number, so PLP — unlike the log-compressed
MFCC path — cannot absorb reduced matmul precision anywhere upstream of
Durbin. The autocorrelation IDFT matmul below is therefore pinned to
HIGHEST: at TPU default precision (one bf16 pass for f32 operands) the
chain measures 3.3e-2 worst-frame / 6.7e-3 MEDIAN cepstral error vs the
f64 golden on broadband noise — identically for the XLA-rfft and fused
bf16x3 kernel paths, proving the error entered in this shared matmul,
not in the spectral kernels. (An earlier note here attributed that
number to "the f32 floor"; it was mismeasured — the probe silently ran
on the relay chip. The true CPU f32 floor on the same signals is ~3e-6
max.) tests/test_tpu_smoke.py carries the on-chip budgets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufeat import matrices
from tpufeat.config import FeatureConfig


def plp_from_energies(mel: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """[..., F, n_mels] filterbank energies -> [..., F, plp_order+1] PLP."""
    dt = mel.dtype
    order = cfg.plp_order
    el = jnp.asarray(matrices.equal_loudness_vector(
        cfg.n_mels, cfg.fmin, cfg.fmax_hz, cfg.mel_scale), dt)
    p = jnp.maximum(mel * el, cfg.log_floor) ** cfg.plp_compress
    # duplicated endpoints, then the [M+2, order+1] IDFT matmul
    a = jnp.concatenate([p[..., :1], p, p[..., -1:]], axis=-1)
    idft = jnp.asarray(matrices.plp_idft_matrix(cfg.n_mels, order), dt)
    # precision pinned: TPU default runs f32 matmuls as one bf16 pass, and
    # Levinson-Durbin amplifies the resulting ~4e-3 relative error in r by
    # the per-frame Toeplitz condition number (measured 6.7e-3 MEDIAN
    # cepstral error on chip before pinning). The matmul is [F, M+2] @
    # [M+2, order+1] — trivially small, so HIGHEST costs nothing.
    r = jnp.matmul(a, idft, precision=jax.lax.Precision.HIGHEST)
    lpc, err = durbin(r, order, floor=cfg.log_floor)
    c = lpc_to_cepstrum(lpc, order)
    c0 = jnp.log(jnp.maximum(err, cfg.log_floor))[..., None]
    out = jnp.concatenate([c0, c], axis=-1)
    if cfg.lifter > 0:
        out = out * jnp.asarray(
            matrices.lifter_vector(order + 1, cfg.lifter), dt)
    return out


def durbin(r: jnp.ndarray, order: int, floor: float = 1e-10
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin: autocorrelation [..., order+1] -> (LPC [..., order],
    prediction-error energy [...]).

    Statically unrolled over the (small) order: each step is O(order)
    elementwise ops over the batch/frame dims — jit-friendly, no scan
    carries, no dynamic shapes. The error energy is floored each step so
    silence (r ~ 0) degrades to zero reflection coefficients instead of
    0/0 NaNs."""
    e = jnp.maximum(r[..., 0], floor)
    a: list = []                       # a[i-1] == a_i at the current order
    for m in range(1, order + 1):
        acc = r[..., m]
        for i in range(1, m):
            acc = acc - a[i - 1] * r[..., m - i]
        k = acc / e
        a = [a[i - 1] - k * a[m - i - 1] for i in range(1, m)] + [k]
        e = jnp.maximum(e * (1.0 - k * k), floor)
    return jnp.stack(a, axis=-1), e


def lpc_to_cepstrum(lpc: jnp.ndarray, order: int) -> jnp.ndarray:
    """LPC [..., order] -> cepstra c_1..c_order [..., order] of the
    minimum-phase all-pole model (sign convention in the module docstring);
    statically unrolled like :func:`durbin`."""
    c: list = []                       # c[i-1] == c_i
    for n in range(1, order + 1):
        acc = lpc[..., n - 1]
        for k in range(1, n):
            acc = acc + (k / n) * c[k - 1] * lpc[..., n - k - 1]
        c.append(acc)
    return jnp.stack(c, axis=-1)
