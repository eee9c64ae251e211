"""Erratum bisect, round 2: close the last structural deltas to the
real pure-XLA pipeline (round-1 ladder all clean; the real path corrupts).

  g1 : round-1 "mask" variant with THREE deltas closed at once: the
       REAL preemphasis op structure (x - a*concat([zeros, x[:-1]])
       instead of concat of two pieces), NO mask-fill of the features
       (the real path returns them raw), and tpufeat's exact mel/DCT
       matrices (HTK bin-style triangles, ortho DCT)
  g2 : alias of g1 (kept so the printed ladder stays stable; the
       single-delta discrimination is bisect3)
  g3 : g1 but calling tpufeat's own framing/spectrum/feature helpers
       (frame_signal, condition_frames, power_spectrum_rfft,
       mel_log_dct_xla) — everything but extract_impl itself
  ctl : jit(extract_impl) pure-XLA — the positive control (known corrupt)

Measured 2026-08-20 (pre-fix): g1/g2/g3/ctl ALL corrupt with the
identical 69,025-frame signature — which localized the trigger to g1's
delta set and led to bisect3's single-delta discrimination. NOTE: g3 and
ctl call framing.preemphasize, which has since been REWRITTEN in the
clean form (the fix) — re-running this script on current tpufeat gives
g1/g2 corrupt (they hard-code the trigger structure) and g3/ctl clean,
which is itself the regression check.

Run:  python -m benchmarks.experiments.erratum_bisect2 [B] [seconds]
"""
import dataclasses
import functools
import sys

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SECS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
SR, FRAME, HOP, NFFT = 16000, 400, 160, 512


def main():
    import jax
    import jax.numpy as jnp
    from tpufeat import features, framing, matrices, spectrum
    from tpufeat.config import MFCC13_HTK

    cfg = dataclasses.replace(MFCC13_HTK, use_pallas=False, gemm_dft=False,
                              matmul_precision="highest")
    n = SR * SECS
    n_frames = 1 + (n - FRAME) // HOP
    HI = jax.lax.Precision.HIGHEST
    win = jnp.asarray(np.hamming(FRAME).astype(np.float32))
    fb = jnp.asarray(matrices.mel_filterbank(
        SR, NFFT, cfg.n_mels, cfg.fmin, cfg.fmax_hz, cfg.mel_scale,
        cfg.mel_norm, cfg.mel_bin_style, cfg.vtln_warp, cfg.vtln_low,
        cfg.vtln_high), jnp.float32)
    dctm = jnp.asarray(matrices.dct_matrix(cfg.n_mels, cfg.n_mfcc),
                       jnp.float32)

    def preemph(x):
        prev = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        shifted = jnp.concatenate([prev, x[..., :-1]], axis=-1)
        return x - 0.97 * shifted

    def my_frames(x):
        B_, M = x.shape
        k, r = divmod(FRAME, HOP)
        rows = n_frames + k + (1 if r else 0)
        need = rows * HOP
        x = jnp.pad(x, ((0, 0), (0, max(0, need - M))))[:, :need]
        x2d = x.reshape(B_, rows, HOP)
        parts = [x2d[:, j: j + n_frames] for j in range(k)]
        if r:
            parts.append(x2d[:, k: k + n_frames, :r])
        return jnp.concatenate(parts, axis=-1)

    def tail(power, mel, dct):
        logmel = jnp.log(jnp.maximum(
            jnp.matmul(power, mel, precision=HI), 1e-10))
        return jnp.matmul(logmel, dct, precision=HI)

    @jax.jit
    def g1(x, lengths):
        x = preemph(x)
        frames = my_frames(x) * win
        spec = jnp.fft.rfft(frames, NFFT)
        power = spec.real * spec.real + spec.imag * spec.imag
        feat = tail(power, fb, dctm)        # tpufeat matrices, raw feat
        nf = jnp.maximum(0, 1 + (lengths - FRAME) // HOP)
        fmask = jnp.arange(n_frames)[None, :] < nf[:, None]
        return feat, fmask, nf.astype(jnp.int32)

    g2 = g1   # g1 already uses the exact tpufeat matrices; alias kept so
    #           the printed ladder matches the docstring numbering

    @jax.jit
    def g3(x, lengths):
        x = framing.preemphasize(x, cfg.preemphasis)
        frames, fmask = framing.frame_signal(x, lengths, cfg)
        frames = framing.condition_frames(frames, cfg)
        w = jnp.asarray(matrices.window(cfg.window, cfg.frame_length),
                        frames.dtype)
        spec = spectrum.power_spectrum_rfft(frames * w, cfg)
        feat = features.mel_log_dct_xla(spec, fmask, cfg)
        nf = framing.num_frames_dynamic(lengths, cfg)
        return feat, fmask, nf

    ctl = jax.jit(functools.partial(features.extract_impl, cfg=cfg))

    @jax.jit
    def cks(t):
        return sum(jnp.sum(jnp.abs(jnp.asarray(v, jnp.float32)))
                   for v in jax.tree_util.tree_leaves(t))

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, n)) * 0.1).astype(np.float32)))
    lens = jnp.full((B,), n, jnp.int32)
    for name, fn in (("g1", g1), ("g2", g2), ("g3", g3), ("ctl", ctl)):
        full = fn(x, lens)
        float(cks(full))
        chunks = [fn(x[i:i + 64], lens[i:i + 64]) for i in range(0, B, 64)]
        f0 = full[0]
        c0 = jnp.concatenate([c[0] for c in chunks], axis=0)
        diff = jnp.abs(f0 - c0)
        max_d = float(jnp.max(diff))
        bad = int(jnp.sum(jnp.any(diff > 1e-4, axis=-1)))
        print(f"{name:4s}: max|delta|={max_d:.3g}  corrupt frames "
              f"{bad}/{B * n_frames}", flush=True)


if __name__ == "__main__":
    main()
