"""Multi-channel front-end: GCC-PHAT time-delay estimation + steered
delay-and-sum beamforming (the BeamformIt-style array preprocessing that
feeds a single-channel ASR front-end; beyond the mono-only reference —
SURVEY.md §2's "beyond the reference" tier).

TPU-native formulation: everything is batched rFFTs and elementwise
complex math on static power-of-two lengths — no per-channel loops, no
sample gathers. The correlation window extraction is two static slices,
the argmax-neighborhood taps for sub-sample refinement are one-hot
einsums (gathers are the op class measured 30x slower on this chip —
CLAUDE.md), and fractional steering is a frequency-domain phase ramp, so
the whole align-and-sum is three FFT passes per channel.

Conventions: ``delays[..., c] = d`` means channel c is LATE by ``d``
samples relative to the reference channel (positive = farther from the
source); steering ADVANCES each channel by its delay so the summed
wavefronts align. Float64 goldens in ``tpufeat.reference.cpu``
(``gcc_phat``/``delay_and_sum``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["gcc_phat", "steer", "delay_and_sum"]


def _pow2_len(n: int, max_delay: int) -> int:
    """FFT length: zero headroom >= max_delay keeps the circular
    correlation linear over the +-max_delay window."""
    p = 1
    while p < n + 2 * max_delay:
        p *= 2
    return p


def _check(x, max_delay: int):
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    if x.ndim != 3:
        raise ValueError(f"expected [C, N] or [B, C, N], got {x.shape}")
    if x.shape[1] < 2:
        raise ValueError(f"need >= 2 channels, got {x.shape[1]}")
    if not 1 <= max_delay < x.shape[2]:
        raise ValueError(f"max_delay {max_delay} outside [1, N)")
    return x, squeeze


def gcc_phat(x, *, max_delay: int = 64, ref: int = 0,
             subsample: bool = True, lengths=None) -> jnp.ndarray:
    """GCC-PHAT time-difference-of-arrival estimates.

    ``x``: [C, N] (or [B, C, N]) time-aligned channel recordings;
    ``max_delay``: lag search window in samples (e.g. a 30 cm array at
    16 kHz spans ~+-15 samples; 64 covers ~1.4 m);
    ``subsample=True`` adds parabolic interpolation around the peak.

    -> delays [C] (or [B, C]) float32, ``delays[ref] == 0``; see module
    docstring for the sign convention."""
    x, squeeze = _check(x, max_delay)
    if not 0 <= ref < x.shape[1]:
        raise ValueError(f"ref {ref} out of range for {x.shape[1]} "
                         "channels")
    if lengths is not None:
        mask = (jnp.arange(x.shape[2])[None, None, :]
                < jnp.asarray(lengths)[:, None, None])
        x = x * mask.astype(x.dtype)
    d = _gcc_phat_jit(x.shape[2], int(max_delay), int(ref),
                      bool(subsample))(x)
    return d[0] if squeeze else d


@functools.lru_cache(maxsize=None)
def _gcc_phat_jit(n: int, w: int, ref: int, subsample: bool):
    p = _pow2_len(n, w)

    def impl(x):
        X = jnp.fft.rfft(x, n=p, axis=-1)
        cross = X * jnp.conj(X[:, ref: ref + 1])
        phat = cross / jnp.maximum(jnp.abs(cross), 1e-12)
        corr = jnp.fft.irfft(phat, n=p, axis=-1)
        # circular lags -w..w -> a linear 2w+1 window via two slices
        win = jnp.concatenate([corr[..., p - w:], corr[..., : w + 1]],
                              axis=-1)
        idx = jnp.argmax(win, axis=-1)                  # [B, C]
        delay = idx.astype(jnp.float32) - w
        if subsample:
            # parabolic 3-tap refinement; taps picked by one-hot GEMMs
            iota = jnp.arange(2 * w + 1, dtype=jnp.int32)
            pick = lambda off: jnp.einsum(
                "bck,bck->bc",
                (iota[None, None, :]
                 == jnp.clip(idx + off, 0, 2 * w)[..., None]
                 ).astype(win.dtype), win)
            cm, c0, cp = pick(-1), pick(0), pick(1)
            denom = cm - 2.0 * c0 + cp
            frac = jnp.where(jnp.abs(denom) > 1e-12,
                             0.5 * (cm - cp) / denom, 0.0)
            interior = (idx > 0) & (idx < 2 * w)
            delay = delay + jnp.where(interior,
                                      jnp.clip(frac, -1.0, 1.0), 0.0)
        # the reference channel's autocorrelation peak is exactly 0 by
        # construction; pin it against float noise
        return delay.at[:, ref].set(0.0)

    return jax.jit(impl)


def steer(x, delays) -> jnp.ndarray:
    """Advance each channel by its (fractional) delay: with
    ``delays = gcc_phat(x)`` the returned channels are wavefront-aligned
    to the reference. [C, N] + [C] (or batched) -> same shape."""
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    d = jnp.asarray(delays, jnp.float32)
    d = d[None] if d.ndim == 1 else d
    if x.ndim != 3 or d.shape != x.shape[:2]:
        raise ValueError(f"shapes {x.shape} / {d.shape} inconsistent")
    out = _steer_jit(x.shape[2])(x, d)
    return out[0] if squeeze else out


@functools.lru_cache(maxsize=None)
def _steer_jit(n: int):
    p = _pow2_len(n, 1)

    def impl(x, d):
        X = jnp.fft.rfft(x, n=p, axis=-1)
        k = jnp.arange(p // 2 + 1, dtype=jnp.float32)
        # y[t] = x[t + d]  <=>  Y_k = X_k * exp(+2*pi*i*k*d/P)
        ramp = jnp.exp(2j * jnp.pi * k[None, None, :]
                       * d[..., None] / p)
        return jnp.fft.irfft(X * ramp.astype(jnp.complex64), n=p,
                             axis=-1)[..., :n]

    return jax.jit(impl)


def delay_and_sum(x, *, max_delay: int = 64, ref: int = 0,
                  subsample: bool = True, weights=None,
                  lengths=None):
    """Steered delay-and-sum: estimate per-channel TDOAs (GCC-PHAT
    against ``ref``), advance every channel by its delay, and average.

    [C, N] -> [N] (or [B, C, N] -> [B, N]); feed the result to any
    single-channel ``extract`` config. ``weights`` ([C] or [B, C], e.g.
    per-channel SNR estimates) skews the average; they are normalized to
    sum to 1. Returns ``(beamformed, delays)``."""
    x, squeeze = _check(x, max_delay)
    d = gcc_phat(x, max_delay=max_delay, ref=ref, subsample=subsample,
                 lengths=lengths)
    y = steer(x, d)
    if weights is None:
        out = jnp.mean(y, axis=1)
    else:
        wt = jnp.asarray(weights, jnp.float32)
        wt = wt[None] if wt.ndim == 1 else wt
        if wt.shape != x.shape[:2]:
            raise ValueError(f"weights {wt.shape} vs channels "
                             f"{x.shape[:2]}")
        if bool((np.asarray(jnp.sum(wt, axis=1)) <= 0).any()):
            raise ValueError("weights must sum to > 0 per batch row")
        wt = wt / jnp.sum(wt, axis=1, keepdims=True)
        out = jnp.einsum("bcn,bc->bn", y, wt)
    return (out[0], d[0]) if squeeze else (out, d)
