"""Full nnet3-online-layout serving tick (round-4 VERDICT item 6).

serving_loop.py measured the control loop over the plain 39-dim
front-end; this composes the PRODUCTION online chain — the complete
Kaldi nnet3-online input layout — through the same loop:

  StreamingPipeline(KALDI39, pitch=True, ivector=ext)   [39 | 3 | 100]
    -> StreamPool.process_batch (one tick = 100 ms = 1600 samples)
    -> StreamingEnergyVAD.process + host flag fetch
    -> StreamingEndpointer.update (host counters)
    -> checksum fetch of the tick's rows (downstream hand-off + the
       relay-safe completion sync, BASELINE.md timing method)
    -> every 10 ticks: detach/reset_rows/attach one slot (utterance
       turnover through the pitch tracker + ivector state)

The i-vector extractor is a random-parameter G=512/K=100 model on the
13-dim base (EM training doesn't change the serving math; ivector_bench
convention). Pitch runs the production 2 kHz lag grid (L=36). Chunks
are device-resident (honest-ingest convention, benchmarks/serving.py).
Each of the two per-tick host fetches pays the relay's ~30 ms sync
floor (readback_bw.py), which a directly-attached host doesn't have —
the tick is reported both ways.
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


def fake_extractor(G, D, K, seed=0):
    from tpufeat import ivector as iv
    r = np.random.default_rng(seed)
    w = r.dirichlet(np.full(G, 5.0))
    means = r.standard_normal((G, D)) * 2.0
    vars_ = r.uniform(0.5, 2.0, (G, D))
    M = r.standard_normal((G, D, K)) * np.sqrt(vars_)[:, :, None] * 0.3
    return iv.IvectorExtractor(iv.DiagUbm(w, means, vars_), M)


def main():
    import dataclasses
    from tpufeat import augment, streaming
    from tpufeat.config import KALDI39

    cfg = dataclasses.replace(KALDI39, cmvn="none")
    ext = fake_extractor(512, 13, 100)
    C = 1600
    bs = tuple(int(a) for a in sys.argv[1:]) or (1024, 8192)
    for B in bs:
        rng = np.random.default_rng(0)
        t = np.arange(C) / 16000.0
        f0 = rng.uniform(100.0, 280.0, (B, 1))
        chunks = [jax.device_put(jnp.asarray(
            0.4 * np.sin(2 * np.pi * f0 * (t + j * 0.1))
            + 0.01 * rng.standard_normal((B, C)), jnp.float32))
            for j in range(4)]

        pipe = streaming.StreamingPipeline(cfg, batch_size=B, pitch=True,
                                           ivector=ext)
        pool = streaming.StreamPool(pipe)
        for _ in range(B):
            pool.attach()
        vad = augment.StreamingEnergyVAD(batch_size=B)
        ep = augment.StreamingEndpointer(batch_size=B)
        print(f"B={B}: out_dim={pipe.out_dim} "
              f"(39 spectral | 3 pitch | {ext.ivector_dim} ivector)",
              flush=True)

        @jax.jit
        def pack(flags, out):
            # Bundle every host-bound scalar of the tick into ONE fetch:
            # [B] VAD flags + the feature checksum. Through the relay each
            # fetch pays the ~30 ms sync floor (readback_bw.py), so the
            # two-fetch tick carries one avoidable floor; on an attached
            # host both variants are equal to within µs.
            return jnp.concatenate(
                [flags.reshape(-1).astype(jnp.float32), jnp.sum(out)[None]])

        def tick(k, turnover, fused_fetch):
            rows = pool.process_batch(chunks[k % 4])
            out, _ = rows.block()
            flags = vad.process(chunks[k % 4])
            if fused_fetch:
                host = np.asarray(pack(flags, out))  # the tick's ONE sync
                host_flags = host[:-1].reshape(B, -1) > 0.5
                c = float(host[-1])
            else:
                host_flags = np.asarray(flags)      # host sync #1
                c = None
            done = ep.update(host_flags)
            if not fused_fetch:
                # host sync #2 — BEFORE the turnover block so both
                # variants sync at the same point in the tick (the
                # one-fetch variant's sync is also pre-turnover)
                c = float(cks(out))
            s = int(k % B)
            if turnover:
                pool.detach(s)
                vad.reset_rows([s])
                ep.reset_rows([s])
                assert pool.attach() == s
            return done, c

        for fused_fetch in (False, True):
            for k in range(6):                      # warmup + compiles
                tick(k, turnover=k == 3, fused_fetch=fused_fetch)
            n = 30
            t_dev = []
            t0 = time.perf_counter()
            for k in range(n):
                tk0 = time.perf_counter()
                tick(k, turnover=(k % 10) == 9, fused_fetch=fused_fetch)
                t_dev.append(time.perf_counter() - tk0)
            wall = (time.perf_counter() - t0) / n
            med = float(np.median(t_dev))
            nsync = 1 if fused_fetch else 2
            est_host = med - nsync * 0.030
            print(f"B={B:6d}  {'one-fetch' if fused_fetch else 'two-fetch'}"
                  f" full-chain tick median {med*1e3:7.2f} ms  "
                  f"mean {wall*1e3:7.2f} ms  "
                  f"(~{max(est_host, 0)*1e3:6.2f} ms net of {nsync}x ~30 ms "
                  f"relay sync floor)  budget 100 ms", flush=True)


if __name__ == "__main__":
    main()
