"""On-chip RTFx of the SHARDED path on a 1-device mesh (round-3 VERDICT
item 2's done criterion): with the fused signal kernel now inside
`_time_shard_body`, a (dp=1, time=1) mesh on the real chip should land
within ~10% of the single-chip fused `extract()` numbers — proving the
multi-chip code path runs production kernels, not the staged fallback.

  python -m benchmarks.experiments.shard_onchip
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
    from jax.sharding import Mesh

    from tpufeat import sharding
    from tpufeat.config import MFCC13_HTK, WHISPER80

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    dev = np.asarray(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(dev, ("dp", "time"))

    B, sec = 128, 30
    n = sec * 16000
    x = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B, n), jnp.float32))(jax.random.key(0))
    # host lengths: the centered-config validation inspects values, a
    # device array would cost a fetch per call
    lens = np.full((B,), n, np.int32)

    @jax.jit
    def cks(t):
        return jnp.sum(t)

    out = {}
    for name, base in (("mfcc13", MFCC13_HTK), ("whisper80", WHISPER80)):
        cfg = dataclasses.replace(base, use_pallas=True, gemm_dft=True,
                                  fused_framing=True,
                                  matmul_precision="bf16x3")
        if name == "whisper80":
            # whisper pads to exactly 30 s; N=480000 divides time*hop
            pass

        def run():
            return sharding.extract_batch_time_sharded(x, lens, cfg,
                                                       mesh).features

        float(np.asarray(cks(run())))   # compile + warm
        chain, iters = 8, 6
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            last = None
            for _ in range(chain):
                last = run()        # async dispatches chain on device;
            float(np.asarray(cks(last)))  # ONE relay sync per chain —
            # a per-call sync costs the full ~27 ms relay round trip and
            # buried the first measurement (83k "RTFx" that was really
            # relay latency; see shard_body_anatomy.py)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) / chain
        rtfx = B * sec / dt
        out[name] = {"wall_ms": round(dt * 1e3, 3), "rtfx": round(rtfx)}
        print(f"{name}: {dt*1e3:.3f} ms  RTFx={rtfx:,.0f}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
