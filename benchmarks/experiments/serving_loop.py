"""End-to-end serving CONTROL LOOP cost per 100 ms tick — not just the
data-plane step (pool_overhead.py) but everything a serving host does:

  tick := StreamPool.process_batch (features, one dispatch)
        + StreamingEnergyVAD.process (speech flags, one dispatch)
        + fetch flags to host (endpointing is a host decision)
        + StreamingEndpointer.update (host counters)
        + checksum-fetch of the feature block (stands in for handing the
          tick's features to a downstream consumer; also the relay-safe
          completion sync — BASELINE.md timing method)
        + every 10 ticks: detach -> reset_rows(pipeline via attach, VAD,
          endpointer) -> attach on one slot (utterance turnover)

Chunks are device-resident [B, 1600] buffers (the honest-ingest
convention of benchmarks/serving.py: on a directly-attached host the
H2D DMA is not the bottleneck; through the relay it would only measure
the relay). The two per-tick host fetches each pay the relay's ~30 ms
sync floor (readback_bw.py) — a relay artifact a real host doesn't
have, so the tick is reported both ways.
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


def main():
    import dataclasses
    from tpufeat import augment, streaming
    from tpufeat.config import KALDI39

    cfg = dataclasses.replace(KALDI39, cmvn="none")
    C = 1600
    for B in (1024, 8192, 32768):
        rng = np.random.default_rng(0)
        chunks = [jax.device_put(jnp.asarray(
            rng.standard_normal((B, C)) * 0.1, jnp.float32))
            for _ in range(4)]

        pool = streaming.StreamPool(
            streaming.StreamingPipeline(cfg, batch_size=B))
        for _ in range(B):
            pool.attach()
        vad = augment.StreamingEnergyVAD(batch_size=B)
        ep = augment.StreamingEndpointer(batch_size=B)

        def tick(k, turnover):
            rows = pool.process_batch(chunks[k % 4])
            out, _ = rows.block()
            flags = vad.process(chunks[k % 4])
            host_flags = np.asarray(flags)          # host sync #1
            done = ep.update(host_flags)
            s = int(k % B)
            if turnover:                            # recycle one slot
                pool.detach(s)
                vad.reset_rows([s])
                ep.reset_rows([s])
                assert pool.attach() == s
            c = float(cks(out))                     # host sync #2
            return done, c

        for k in range(6):                          # warmup + compiles
            tick(k, turnover=k == 3)
        n = 30
        t_dev = []                                  # syncs excluded later
        t0 = time.perf_counter()
        for k in range(n):
            tk0 = time.perf_counter()
            tick(k, turnover=(k % 10) == 9)
            t_dev.append(time.perf_counter() - tk0)
        wall = (time.perf_counter() - t0) / n
        med = float(np.median(t_dev))
        # sync-floor estimate: two fetched dispatches per tick
        est_host = med - 2 * 0.030
        print(f"B={B:6d}  tick median {med*1e3:7.2f} ms  "
              f"mean {wall*1e3:7.2f} ms  "
              f"(~{max(est_host, 0)*1e3:6.2f} ms net of 2x ~30 ms relay "
              f"sync floor)  budget 100 ms", flush=True)


if __name__ == "__main__":
    main()
