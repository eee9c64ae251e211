"""Minimized jnp-only reproducer for the B=256 XLA:TPU miscompilation.

Self-contained (no tpufeat imports): a plain MFCC-shaped pipeline —
pre-emphasis, gather-free framing, Hamming window, rFFT, power, mel
matmul, log, DCT matmul — compiled as ONE program over a [256, 480000]
f32 batch, compared against the SAME jitted function dispatched in
64-row chunks (exact split: no cross-row coupling anywhere in the math,
so any difference is a compiler/runtime defect, not roundoff).

On the affected toolchain (axon relay TPU v5e, observed 2026-08-16 →
re-probed stable 2026-08-19) the single-program output corrupts ~8% of
frames in a strict ~33-frame periodic pattern with max|Δ| ≈ 5.0; the
64-row dispatches are clean. Clean/corrupt envelope: BASELINE.md
"Large-batch erratum". Production guard: `features._single_program_safe`.
Tracked: tests/test_tpu_smoke.py::TestLargeBatchErratum (xfail).

Run (ONE TPU client at a time; ~2 compiles ≈ 30 s + ~1 min work):

    python -m benchmarks.experiments.erratum_repro [B] [seconds]

Prints the corrupt-frame count and max|Δ|; exit code 1 if corrupt.
"""
import sys

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SECS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
SR, FRAME, HOP, NFFT, NMEL, NCEP = 16000, 400, 160, 512, 23, 13


def mel_matrix():
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    pts = np.linspace(hz_to_mel(20.0), hz_to_mel(SR / 2), NMEL + 2)
    hz = 700.0 * (10.0 ** (pts / 2595.0) - 1.0)
    bins = np.fft.rfftfreq(NFFT, 1.0 / SR)
    m = np.zeros((NFFT // 2 + 1, NMEL), np.float32)
    for j in range(NMEL):
        lo, c, hi = hz[j], hz[j + 1], hz[j + 2]
        up = (bins - lo) / (c - lo)
        dn = (hi - bins) / (hi - c)
        m[:, j] = np.clip(np.minimum(up, dn), 0.0, None)
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

    @jax.jit
    def mfcc(x):
        x = jnp.concatenate([x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]], axis=1)
        # gather-free framing in the production formulation (mirrors
        # tpufeat.framing.frames_from_buffer: reshape to hop rows, then
        # k+1 shifted slices — the erratum is program-structure-
        # dependent, so the repro must frame the way the pipeline does)
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
        logmel = jnp.log(jnp.maximum(power @ mel, 1e-10))
        return logmel @ dct

    @jax.jit
    def cks(t):
        return jnp.sum(jnp.abs(t))

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, n)) * 0.1).astype(np.float32)))
    full = mfcc(x)
    float(cks(full))            # force completion (relay: b_u_r is a no-op)
    chunks = [mfcc(x[i:i + 64]) for i in range(0, B, 64)]
    oracle = jnp.concatenate(chunks, axis=0)
    diff = jnp.abs(full - oracle)
    max_d = float(jnp.max(diff))
    bad = int(jnp.sum(jnp.any(diff > 1e-4, axis=-1)))
    total = B * n_frames
    print(f"B={B} x {SECS}s ({B * n / 1e6:.1f}M samples): "
          f"max|delta|={max_d:.3g}, corrupt frames {bad}/{total} "
          f"({100.0 * bad / total:.2f}%)", flush=True)
    print("VERDICT:", "CORRUPT" if bad else "clean", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
