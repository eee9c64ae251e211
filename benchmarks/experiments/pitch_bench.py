"""Pitch tracker throughput on chip.

Measures the NCCF stage under both formulations — "gemm" (MXU
DFT-as-matmul at transform length wext, inverse restricted to the scored
lags; the production default) and "fft" (VPU pow-of-two rFFTs, the audit
twin) — plus the full tracker (adds the Viterbi scan's [L, L]
broadcast-max per frame, sequential over frames). BASELINE.md quotes
these next to the spectral front-end (~300k x realtime).

  python -m benchmarks.experiments.pitch_bench
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpufeat import pitch

    cfg = pitch.PitchConfig()                     # resampled lag grid
    cfg_fft = pitch.PitchConfig(nccf_method="fft")
    cfg_native = pitch.PitchConfig(lag_rate=0)    # round-1..3 audit twin
    print(f"backend={jax.default_backend()}  lag grid: "
          f"{cfg.inner().sample_rate} Hz, L={cfg.inner().n_lags} "
          f"(native twin L={cfg_native.n_lags})", file=sys.stderr)

    @jax.jit
    def cks(t):
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(t))

    out = {}
    for B, sec in ((32, 10), (128, 10)):
        n = sec * 16000
        x = jax.jit(lambda k: 0.1 * jax.random.normal(
            k, (B, n), jnp.float32))(jax.random.key(B))
        lens = jnp.full((B,), n, jnp.int32)

        nccf_fn = jax.jit(lambda a, b: pitch.nccf(a, b, cfg)[0])
        nccf_fft_fn = jax.jit(lambda a, b: pitch.nccf(a, b, cfg_fft)[0])
        track_fn = jax.jit(lambda a, b: pitch._track_impl(a, b, cfg)[:2])
        native_fn = jax.jit(
            lambda a, b: pitch._track_impl(a, b, cfg_native)[:2])

        def timeit(fn, chain=4, iters=5):
            float(np.asarray(cks(fn(x, lens))))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                r = None
                for _ in range(chain):
                    r = fn(x, lens)
                float(np.asarray(cks(r)))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts)) / chain

        t_nccf = timeit(nccf_fn)
        t_fft = timeit(nccf_fft_fn)
        t_full = timeit(track_fn)
        t_native = timeit(native_fn)
        out[f"B{B}x{sec}s"] = {
            "nccf_gemm_ms": round(t_nccf * 1e3, 2),
            "nccf_fft_ms": round(t_fft * 1e3, 2),
            "full_ms": round(t_full * 1e3, 2),
            "rtfx": round(B * sec / t_full),
            "native_full_ms": round(t_native * 1e3, 2),
            "native_rtfx": round(B * sec / t_native),
        }
        print(f"B={B} {sec}s: nccf gemm {t_nccf*1e3:.2f} ms / fft "
              f"{t_fft*1e3:.2f} ms, full {t_full*1e3:.2f} ms "
              f"(RTFx {B*sec/t_full:,.0f}); native twin "
              f"{t_native*1e3:.2f} ms ({B*sec/t_native:,.0f})",
              file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
