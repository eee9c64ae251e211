"""Rational sample-rate conversion as ONE MXU matmul (TPU-native polyphase).

ASR front-ends standardized on 16 kHz, but real audio arrives at 8/22.05/
44.1/48 kHz. The classic CPU implementation is a polyphase FIR (scipy's
``resample_poly``); the TPU-native formulation observes that a block of
``p`` consecutive output samples depends on a fixed-length window of input
advancing by ``q`` samples per block — i.e. resampling IS hop-aligned
framing (the same gather-free ``frames_from_buffer`` the front-end uses)
followed by a single ``[L, p]`` matmul on the MXU:

    y[j*p + r] = sum_t  x[j*q + c0 + t] * H[t, r]

with H block-invariant because shifting the output index by p shifts the
input window by exactly q. The filter is the same windowed-sinc scipy
designs (Kaiser beta=5, 10*max(p,q) half-length, cutoff at the tighter
Nyquist), so outputs match ``scipy.signal.resample_poly`` to float32
precision (parity-tested).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpufeat import framing

__all__ = ["resample", "resample_matrix", "output_length"]

HIGHEST = jax.lax.Precision.HIGHEST


def _design_filter(p: int, q: int, beta: float = 5.0) -> np.ndarray:
    """scipy.signal.resample_poly's default FIR: windowed sinc, half length
    10*max(p,q), Kaiser(beta) window, unity DC gain, scaled by p."""
    max_rate = max(p, q)
    f_c = 1.0 / max_rate                      # in Nyquist units (fs = 2)
    half_len = 10 * max_rate
    m = np.arange(2 * half_len + 1, dtype=np.float64) - half_len
    h = f_c * np.sinc(f_c * m) * np.kaiser(2 * half_len + 1, beta)
    h /= h.sum()                              # unity gain at DC
    return h * p


@functools.lru_cache(maxsize=None)
def resample_matrix(p: int, q: int, beta: float = 5.0
                    ) -> tuple[np.ndarray, int]:
    """(H [L, p], c0): block matrix + input offset of the first tap.

    Output sample m = j*p + r reads x[n] for n in a window around
    (m*q + D)/p (D = filter group delay); block j's window starts at
    j*q + c0. Rows of H beyond a tap's support are zero."""
    h = _design_filter(p, q, beta)
    lh = len(h)
    d = (lh - 1) // 2                         # group delay (odd-length FIR)
    # n participates in output m iff 0 <= m*q + D - n*p < lh
    c0 = -(-(0 * q + d - lh + 1) // p)        # ceil((D - lh + 1)/p), m = 0
    n_hi = ((p - 1) * q + d) // p             # last tap row, m = p-1
    L = n_hi - c0 + 1
    H = np.zeros((L, p), dtype=np.float64)
    for r in range(p):
        for t in range(L):
            k = r * q + d - (c0 + t) * p
            if 0 <= k < lh:
                H[t, r] = h[k]
    return H, c0


def output_length(n: int, p: int, q: int) -> int:
    """scipy.resample_poly's output length: ceil(n * p / q)."""
    return -(-n * p // q)


def _rational(sr_in: int, sr_out: int) -> tuple[int, int]:
    g = math.gcd(sr_in, sr_out)
    return sr_out // g, sr_in // g


@functools.partial(jax.jit, static_argnames=("p", "q", "n_in"))
def _resample_impl(x: jnp.ndarray, p: int, q: int, n_in: int) -> jnp.ndarray:
    H, c0 = resample_matrix(p, q)
    L = H.shape[0]
    n_out = output_length(n_in, p, q)
    n_blocks = -(-n_out // p)
    # block j reads x[j*q + c0 : j*q + c0 + L]; shift left-pad so the first
    # block starts at 0 (zeros outside the signal, scipy's padtype default)
    pad_l = max(0, -c0)
    need = (n_blocks - 1) * q + L
    x = jnp.pad(x, ((0, 0), (pad_l, max(0, need - pad_l - x.shape[-1]))))
    frames = framing.frames_from_buffer(x, n_blocks, L, q)   # [B, nb, L]
    y = jnp.dot(frames, jnp.asarray(H, x.dtype), precision=HIGHEST)
    return y.reshape(x.shape[0], n_blocks * p)[:, :n_out]


def resample(signal, sr_in: int, sr_out: int) -> jnp.ndarray:
    """Resample [N] or [B, N] float audio from sr_in to sr_out Hz.

    One gather-free framing pass + one MXU matmul; matches
    scipy.signal.resample_poly(x, p, q) (Kaiser-5 windowed sinc) to float32
    precision. Returns [(B,) ceil(N*p/q)].

    The block matrix is [~(q + 20*max(p,q)/p), p], so the rates must share
    a reasonable common divisor (every standard audio-rate pair does —
    44.1k/16k is p/q = 160/441). Co-prime pathological pairs are rejected
    rather than silently allocating a multi-GB matrix."""
    x = jnp.asarray(signal)
    if x.dtype == jnp.int16:          # same promotion as features._prep
        x = x.astype(jnp.float32) / 32768.0
    else:
        x = x.astype(jnp.float32)
    if sr_in == sr_out:
        return x
    p, q = _rational(sr_in, sr_out)
    if max(p, q) > 2048:
        raise ValueError(
            f"{sr_in} -> {sr_out} Hz reduces to {p}/{q}; filter/matrix size "
            f"scales with max(p, q) = {max(p, q)} (> 2048). Resample via an "
            f"intermediate standard rate instead.")
    single = x.ndim == 1
    if single:
        x = x[None]
    y = _resample_impl(x, p, q, x.shape[-1])
    return y[0] if single else y
