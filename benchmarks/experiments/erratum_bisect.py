"""Bisect the B=256 miscompile trigger: which real-pipeline ingredient
does the clean jnp-only reproducer lack?

Round-5 discrimination (BASELINE.md): ALL THREE real extract() variants
(fused / staged / pure-XLA) corrupt at [256, 480000] with the identical
signature, while two standalone jnp MFCC mimics run clean. The remaining
structural deltas are laddered here, each compiled as ONE program and
compared against the same function dispatched in 64 rows (exact split):

  base  : clean mimic (production framing, default-precision matmuls)
  hi    : + HIGHEST-precision mel/DCT matmuls (6-pass decompositions —
          the real path pins HIGHEST)
  nm26  : hi with n_mels=26 (the real MFCC13_HTK mel width)
  mask  : nm26 + the masking machinery (frame-validity mask from
          lengths, masked feature fill, mask+num_frames as extra
          outputs — extract() always builds these)

Run:  python -m benchmarks.experiments.erratum_bisect [B] [seconds]
"""
import sys

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SECS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
SR, FRAME, HOP, NFFT, NCEP = 16000, 400, 160, 512, 13


def mel_matrix(n_mels):
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    pts = np.linspace(hz_to_mel(20.0), hz_to_mel(SR / 2), n_mels + 2)
    hz = 700.0 * (10.0 ** (pts / 2595.0) - 1.0)
    bins = np.fft.rfftfreq(NFFT, 1.0 / SR)
    m = np.zeros((NFFT // 2 + 1, n_mels), np.float32)
    for j in range(n_mels):
        lo, c, hi = hz[j], hz[j + 1], hz[j + 2]
        m[:, j] = np.clip(np.minimum((bins - lo) / (c - lo),
                                     (hi - bins) / (hi - c)), 0.0, None)
    return m


def dct_matrix(n_mels):
    k = np.arange(NCEP)[:, None]
    n = np.arange(n_mels)[None, :]
    d = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels)) \
        * np.sqrt(2.0 / n_mels)
    d[0] *= np.sqrt(0.5)
    return d.T.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    n = SR * SECS
    n_frames = 1 + (n - FRAME) // HOP
    win = jnp.asarray(np.hamming(FRAME).astype(np.float32))
    HI = jax.lax.Precision.HIGHEST

    def make(n_mels, precision, masked):
        mel = jnp.asarray(mel_matrix(n_mels))
        dct = jnp.asarray(dct_matrix(n_mels))

        @jax.jit
        def mfcc(x, lengths):
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
            power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)
            kw = {} if precision is None else {"precision": precision}
            logmel = jnp.log(jnp.maximum(
                jnp.matmul(power, mel, **kw), 1e-10))
            feat = jnp.matmul(logmel, dct, **kw)
            if not masked:
                return feat
            nf = jnp.clip((lengths - FRAME) // HOP + 1, 0, n_frames)
            fmask = jnp.arange(n_frames)[None, :] < nf[:, None]
            feat = jnp.where(fmask[..., None], feat, 0.0)
            return feat, fmask, nf.astype(jnp.int32)
        return mfcc

    VARIANTS = {
        "base": make(23, None, False),
        "hi":   make(23, HI, False),
        "nm26": make(26, HI, False),
        "mask": make(26, HI, True),
    }

    @jax.jit
    def cks(t):
        return sum(jnp.sum(jnp.abs(v))
                   for v in jax.tree_util.tree_leaves(t))

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, n)) * 0.1).astype(np.float32)))
    lens = jnp.full((B,), n, jnp.int32)
    any_bad = False
    for name, fn in VARIANTS.items():
        full = fn(x, lens)
        float(cks(full))
        chunks = [fn(x[i:i + 64], lens[i:i + 64]) for i in range(0, B, 64)]
        f0 = full[0] if isinstance(full, tuple) else full
        c0 = jnp.concatenate(
            [c[0] if isinstance(c, tuple) else c for c in chunks], axis=0)
        diff = jnp.abs(f0 - c0)
        max_d = float(jnp.max(diff))
        bad = int(jnp.sum(jnp.any(diff > 1e-4, axis=-1)))
        any_bad = any_bad or bad > 0
        print(f"{name:5s}: max|delta|={max_d:.3g}  corrupt frames "
              f"{bad}/{B * n_frames}", flush=True)
    print("VERDICT:", "TRIGGER FOUND" if any_bad else "all clean",
          flush=True)
    sys.exit(1 if any_bad else 0)


if __name__ == "__main__":
    main()
