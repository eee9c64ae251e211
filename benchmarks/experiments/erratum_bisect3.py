"""Erratum bisect, round 3: WHICH single delta flips clean -> corrupt?

Round-2's g1 (jnp-only) reproduces the exact corruption; round-1's
"mask" variant is clean. They differ by exactly three ingredients.
Each variant here toggles ONE against the clean round-1 baseline:

  h_pre    : real preemphasis structure (x - a*concat([zeros, x[:-1]]))
  h_nofill : drop the where() mask-fill of the features
  h_mat    : tpufeat's real HTK bin-style mel + ortho DCT coefficients
  h_all    : all three (== round-2 g1, positive control)

Run:  python -m benchmarks.experiments.erratum_bisect3 [B] [seconds]
"""
import sys

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SECS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
SR, FRAME, HOP, NFFT, NMEL, NCEP = 16000, 400, 160, 512, 26, 13


def naive_mel():
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    pts = np.linspace(hz_to_mel(20.0), hz_to_mel(SR / 2), NMEL + 2)
    hz = 700.0 * (10.0 ** (pts / 2595.0) - 1.0)
    bins = np.fft.rfftfreq(NFFT, 1.0 / SR)
    m = np.zeros((NFFT // 2 + 1, NMEL), np.float32)
    for j in range(NMEL):
        lo, c, hi = hz[j], hz[j + 1], hz[j + 2]
        m[:, j] = np.clip(np.minimum((bins - lo) / (c - lo),
                                     (hi - bins) / (hi - c)), 0.0, None)
    return m


def naive_dct():
    k = np.arange(NCEP)[:, None]
    nn = np.arange(NMEL)[None, :]
    d = np.cos(np.pi * k * (2 * nn + 1) / (2 * NMEL)) * np.sqrt(2.0 / NMEL)
    d[0] *= np.sqrt(0.5)
    return d.T.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from tpufeat import matrices
    from tpufeat.config import MFCC13_HTK as C

    n = SR * SECS
    n_frames = 1 + (n - FRAME) // HOP
    HI = jax.lax.Precision.HIGHEST
    win = jnp.asarray(np.hamming(FRAME).astype(np.float32))
    real_fb = jnp.asarray(matrices.mel_filterbank(
        SR, NFFT, NMEL, C.fmin, C.fmax_hz, C.mel_scale, C.mel_norm,
        C.mel_bin_style, C.vtln_warp, C.vtln_low, C.vtln_high),
        jnp.float32)
    real_dct = jnp.asarray(matrices.dct_matrix(NMEL, NCEP), jnp.float32)
    my_fb, my_dct = jnp.asarray(naive_mel()), jnp.asarray(naive_dct())

    def make(real_pre, nofill, real_mat):
        mel = real_fb if real_mat else my_fb
        dct = real_dct if real_mat else my_dct

        @jax.jit
        def fn(x, lengths):
            if real_pre:
                prev = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
                x = x - 0.97 * jnp.concatenate([prev, x[..., :-1]],
                                               axis=-1)
            else:
                x = jnp.concatenate(
                    [x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]], axis=1)
            B_, M = x.shape
            k, r = divmod(FRAME, HOP)
            rows = n_frames + k + (1 if r else 0)
            need = rows * HOP
            x = jnp.pad(x, ((0, 0), (0, max(0, need - M))))[:, :need]
            x2d = x.reshape(B_, rows, HOP)
            parts = [x2d[:, j: j + n_frames] for j in range(k)]
            if r:
                parts.append(x2d[:, k: k + n_frames, :r])
            frames = jnp.concatenate(parts, axis=-1) * win
            spec = jnp.fft.rfft(frames, NFFT)
            power = spec.real * spec.real + spec.imag * spec.imag
            logmel = jnp.log(jnp.maximum(
                jnp.matmul(power, mel, precision=HI), 1e-10))
            feat = jnp.matmul(logmel, dct, precision=HI)
            nf = jnp.maximum(0, 1 + (lengths - FRAME) // HOP)
            fmask = jnp.arange(n_frames)[None, :] < nf[:, None]
            if not nofill:
                feat = jnp.where(fmask[..., None], feat, 0.0)
            return feat, fmask, nf.astype(jnp.int32)
        return fn

    VARIANTS = {
        "h_pre":    make(True, False, False),
        "h_nofill": make(False, True, False),
        "h_mat":    make(False, False, True),
        "h_all":    make(True, True, True),
    }

    @jax.jit
    def cks(t):
        return sum(jnp.sum(jnp.abs(jnp.asarray(v, jnp.float32)))
                   for v in jax.tree_util.tree_leaves(t))

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, n)) * 0.1).astype(np.float32)))
    lens = jnp.full((B,), n, jnp.int32)
    for name, fn in VARIANTS.items():
        full = fn(x, lens)
        float(cks(full))
        chunks = [fn(x[i:i + 64], lens[i:i + 64]) for i in range(0, B, 64)]
        diff = jnp.abs(full[0] - jnp.concatenate([c[0] for c in chunks],
                                                 axis=0))
        max_d = float(jnp.max(diff))
        bad = int(jnp.sum(jnp.any(diff > 1e-4, axis=-1)))
        print(f"{name:8s}: max|delta|={max_d:.3g}  corrupt frames "
              f"{bad}/{B * n_frames}", flush=True)


if __name__ == "__main__":
    main()
