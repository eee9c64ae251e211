"""Relay readback cost: what does RETURNING features to the host cost?

First version timed a second ``np.asarray`` of an already-fetched array
— ~0 ms, meaning the axon client caches materialized outputs host-side.
So the honest question is per FRESH dispatch: (a) dispatch + scalar
checksum sync (the benchmark methodology — output stays device-side)
vs (b) dispatch + full ``np.asarray`` of the output. The difference is
what the corpus pipeline pays per batch to actually obtain features.

  python -m benchmarks.experiments.readback_bw
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

SIZES_MB = [0.5, 5, 20, 80]


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rows = []
    key = jax.random.key(0)
    for mb in SIZES_MB:
        n = int(mb * 1e6 / 4)
        fn = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))

        def run(i, fetch):
            nonlocal key
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            y = fn(sub)
            if fetch:
                _ = np.asarray(y)
            else:
                float(np.asarray(jnp.sum(y)))
            return time.perf_counter() - t0

        run(0, False); run(0, True)             # compile + warm
        sync = float(np.median([run(i, False) for i in range(5)]))
        fetch = float(np.median([run(i, True) for i in range(5)]))
        extra = max(fetch - sync, 1e-9)
        rows.append({"mb": mb, "sync_s": round(sync, 4),
                     "fetch_s": round(fetch, 4),
                     "readback_mb_per_s": round(mb / extra, 2)})
        print(f"{mb:6.2f} MB  sync {sync*1e3:8.1f} ms   "
              f"fetch {fetch*1e3:8.1f} ms   "
              f"readback {mb/extra:8.2f} MB/s", file=sys.stderr)
    print(json.dumps({"readback": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
