"""On-chip cost of cfg.cmvn='sliding' vs 'mean' vs 'none' at the
production shape (B=128 x 30 s, fused kernels).

Sliding CMVN adds a frame-axis cumsum + two gathers per frame — expected
to be noise next to the signal kernel; this records the measured delta
for the BASELINE.md ledger.

  python -m benchmarks.experiments.sliding_cmvn_cost
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpufeat import features
    from tpufeat.config import KALDI39

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    fused = dict(use_pallas=True, gemm_dft=True, fused_framing=True,
                 matmul_precision="bf16x3")
    B, sec = 128, 30
    n = sec * 16000
    x = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B, n), jnp.float32))(jax.random.key(0))
    lens = jnp.full((B,), n, jnp.int32)

    @jax.jit
    def cks(t):
        return jnp.sum(t.features) + jnp.sum(t.num_frames)

    out = {"batch": B, "seconds": sec}
    for name, cmvn in (("none", "none"), ("mean", "mean"),
                       ("sliding", "sliding"),
                       ("sliding-meanvar", "sliding-meanvar")):
        cfg = dataclasses.replace(KALDI39, cmvn=cmvn, **fused)
        fn = features.make_extractor(cfg)

        def timeit(chain=8, iters=5):
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

        t = timeit()
        out[f"ms_{name}"] = round(t * 1e3, 2)
        out[f"rtfx_{name}"] = round(B * sec / t)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
