"""Standalone reproducer for the upstream XLA:TPU large-program miscompile.

Self-contained jnp-only MFCC pipeline over a [256, 480000] f32 batch,
compiled as ONE program and compared against the SAME jitted function
dispatched in 64-row chunks (exact split — no cross-row coupling
anywhere, so any difference is a compiler/runtime defect).

THE TRIGGER (bisected over three rounds, 2026-08-20 — erratum_bisect*.py;
every other ingredient ruled out one at a time): writing the signal-level
pre-emphasis as **shift-then-subtract**

    x - alpha * concat([zeros[B, 1], x[:, :-1]])        # CORRUPTS

ahead of the hop-reshape framing + rFFT + two HIGHEST-precision matmuls.
The algebraically identical **compute-then-concat** form

    concat([x[:, :1], x[:, 1:] - alpha * x[:, :-1]])    # clean

produces bitwise-identical values and runs clean at every probed shape.
On the affected toolchain (axon-relayed TPU v5e) this script reports
~69k corrupt frames (9%) with max|delta| ~= 4.5 in a ~33-frame periodic
pattern; corruption is deterministic across reruns. tpufeat itself no
longer contains the trigger (framing.preemphasize uses the clean form;
the previously-corrupt envelope re-measured max|delta| = 0.0 at all 14
points — BASELINE.md "Large-batch erratum"), so this file exists for the
toolchain owner: one command, no tpufeat imports.

Run (ONE TPU client at a time; ~2 compiles + ~1 min of relay transfer):

    python -m benchmarks.experiments.erratum_repro [B] [seconds] [form]

``form`` is ``trigger`` (default) or ``clean`` (the A/B). Exit code 1
iff corrupt.
"""
import sys

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SECS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
FORM = sys.argv[3] if len(sys.argv) > 3 else "trigger"
SR, FRAME, HOP, NFFT, NMEL, NCEP = 16000, 400, 160, 512, 26, 13


def mel_matrix():
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


def dct_matrix():
    k = np.arange(NCEP)[:, None]
    n = np.arange(NMEL)[None, :]
    d = np.cos(np.pi * k * (2 * n + 1) / (2 * NMEL)) * np.sqrt(2.0 / NMEL)
    d[0] *= np.sqrt(0.5)
    return d.T.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    n = SR * SECS
    n_frames = 1 + (n - FRAME) // HOP
    win = jnp.asarray(np.hamming(FRAME).astype(np.float32))
    mel = jnp.asarray(mel_matrix())
    dct = jnp.asarray(dct_matrix())
    HI = jax.lax.Precision.HIGHEST

    @jax.jit
    def mfcc(x, lengths):
        if FORM == "trigger":
            # the miscompile trigger: full-width shifted copy, then the
            # broadcast subtract, feeding the framing reshape below
            prev = jnp.zeros((x.shape[0], 1), x.dtype)
            x = x - 0.97 * jnp.concatenate([prev, x[:, :-1]], axis=-1)
        else:
            # algebraically identical, bitwise-same values: clean
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
        return feat, fmask, nf.astype(jnp.int32)

    @jax.jit
    def cks(t):
        return sum(jnp.sum(jnp.abs(jnp.asarray(v, jnp.float32)))
                   for v in jax.tree_util.tree_leaves(t))

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, n)) * 0.1).astype(np.float32)))
    lens = jnp.full((B,), n, jnp.int32)
    full = mfcc(x, lens)
    float(cks(full))            # force completion (relay: b_u_r is a no-op)
    chunks = [mfcc(x[i:i + 64], lens[i:i + 64]) for i in range(0, B, 64)]
    diff = jnp.abs(full[0] - jnp.concatenate([c[0] for c in chunks],
                                             axis=0))
    max_d = float(jnp.max(diff))
    bad = int(jnp.sum(jnp.any(diff > 1e-4, axis=-1)))
    total = B * n_frames
    print(f"form={FORM} B={B} x {SECS}s ({B * n / 1e6:.1f}M samples): "
          f"max|delta|={max_d:.3g}, corrupt frames {bad}/{total} "
          f"({100.0 * bad / total:.2f}%)", flush=True)
    print("VERDICT:", "CORRUPT" if bad else "clean", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
