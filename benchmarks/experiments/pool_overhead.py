"""Serving-control overhead of StreamPool: what does slot bookkeeping
add to a 100 ms serving tick, and where does the per-slot dict feed of
``process()`` stop scaling?

Three variants per batch size, timed with chained dispatches + the
relay-safe checksum sync (BASELINE.md):
  raw    — StreamingFrontend.process on a device-resident [B, C] chunk
           (the data-plane floor; what benchmarks/serving.py measures);
  batch  — StreamPool.process_batch on the same block (bookkeeping only:
           warmup trims + per-slot row slices, all attached);
  dict   — StreamPool.process fed {slot: [C] np row} for every slot (the
           control-plane convenience path: builds the [B, C] host block
           and transfers it; expected host-bound at serving scale).

The answer sizes the production recommendation in docs/STREAMING.md:
dict feed for control-plane scale pools, process_batch when the caller
already owns an assembled ingest block.

Measured 2026-08-18 (BASELINE.md row): with the lazy PoolRows return,
process_batch adds +2.7/+0.95/+0.46 ms at B=1k/8k/32k (the residual is
this probe touching one slot = one relay dispatch). The first version
eagerly sliced one row per attached slot in _trim — ~2 ms relay
dispatch x B = +870 ms at B=1024 — which is why PoolRows exists.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def cks(t):
    return jnp.sum(t)


def timeit(step, iters=5, chain=8, warmup=3):
    out = None
    for _ in range(warmup * chain):
        out = step()
    float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = step()
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain


def main():
    from tpufeat import streaming
    from tpufeat.config import STREAMING160

    cfg = STREAMING160
    C = 1600  # 100 ms
    for B in (1024, 8192, 32768):
        rng = np.random.default_rng(0)
        chunks = [jax.device_put(jnp.asarray(
            rng.standard_normal((B, C)) * 0.1, jnp.float32))
            for _ in range(4)]
        host_rows = np.asarray(chunks[0])

        fe = streaming.StreamingFrontend(cfg, batch_size=B)
        k = [0]

        def raw():
            out = fe.process(chunks[k[0] % 4])[0]
            k[0] += 1
            return out

        t_raw = timeit(raw)
        del fe

        pool = streaming.StreamPool(streaming.StreamingFrontend(cfg, B))
        slots = [pool.attach() for _ in range(B)]
        k[0] = 0

        def batch():
            out = pool.process_batch(chunks[k[0] % 4])
            k[0] += 1
            return out[slots[0]]

        t_batch = timeit(batch)
        del pool

        pool2 = streaming.StreamPool(streaming.StreamingFrontend(cfg, B))
        slots2 = [pool2.attach() for _ in range(B)]
        feed = {s: host_rows[s] for s in slots2}

        def dict_feed():
            return pool2.process(feed)[slots2[0]]

        t_dict = timeit(dict_feed, iters=3, chain=2, warmup=2)
        del pool2
        print(f"B={B:6d}  raw {t_raw*1e3:7.2f} ms  "
              f"pool batch {t_batch*1e3:7.2f} ms "
              f"(+{(t_batch-t_raw)*1e3:5.2f})  "
              f"pool dict {t_dict*1e3:8.2f} ms "
              f"(+{(t_dict-t_raw)*1e3:8.2f})", flush=True)


if __name__ == "__main__":
    main()
