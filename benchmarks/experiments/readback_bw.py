"""Relay readback bandwidth: how fast can features leave the device?

The corpus pipeline's steady state measured 2.44 s per ~5 MB batched
device_get (~2 MB/s) — this isolates the readback path: device_get wall
time vs transfer size, plus the dispatch+checksum baseline, so the
"corpus throughput is relay-readback-bound" claim in BASELINE.md rests
on a direct measurement.

  python -m benchmarks.experiments.readback_bw
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

SIZES_MB = [0.05, 0.5, 5, 20, 80]


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rows = []
    for mb in SIZES_MB:
        n = int(mb * 1e6 / 4)
        x = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))(
            jax.random.key(int(mb * 100)))
        float(np.asarray(jnp.sum(x)))           # force materialization
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(x)                   # the readback under test
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        rows.append({"mb": mb, "s": round(dt, 4),
                     "mb_per_s": round(mb / dt, 3)})
        print(f"{mb:6.2f} MB  {dt*1e3:9.1f} ms  {mb/dt:8.2f} MB/s",
              file=sys.stderr)
    print(json.dumps({"readback": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
