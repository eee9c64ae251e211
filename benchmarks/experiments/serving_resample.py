"""Serving cost of live 48 kHz ingest: how much does the online polyphase
stage (StreamingResampler) add to the 100 ms serving step?

Times the REAL wrapper objects (their host-tracked fills walk the actual
steady-state cycle of compiled programs) with chained dispatches + the
relay-safe checksum sync (BASELINE.md). The question: does the
65,536-stream headline survive when the mics are 48 kHz?
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


def timeit(step_fn, chunks, chain=8, iters=5, warmup=3):
    """step_fn(chunk) -> output; chunks: list of device-resident inputs."""
    k = 0
    for _ in range(warmup * chain):          # compile + reach fill cycle
        out = step_fn(chunks[k % len(chunks)])
        k += 1
    float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = step_fn(chunks[k % len(chunks)])
            k += 1
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain


def main():
    from tpufeat import resampling, streaming
    from tpufeat.config import STREAMING160

    cfg = STREAMING160
    budget_ms = 100.0
    for B in (8192, 16384, 32768, 65536):
        rng = np.random.default_rng(0)
        # device-resident distinct chunks (honest ingest: no re-read);
        # the 16k phase is measured and FREED before the 48k phase — at
        # B=65536 both chunk sets together would be ~6.7 GB of HBM and
        # skew the timing with allocator pressure
        c16 = [jax.device_put(jnp.asarray(
            rng.standard_normal((B, 1600)) * 0.1, jnp.float32))
            for _ in range(4)]
        fe = streaming.StreamingFrontend(cfg, batch_size=B)
        t_base = timeit(lambda c: fe.process(c)[0], c16)
        del fe, c16

        c48 = [jax.device_put(jnp.asarray(
            rng.standard_normal((B, 4800)) * 0.1, jnp.float32))
            for _ in range(4)]
        sr = resampling.StreamingResampler(48000, 16000, batch_size=B)
        fe2 = streaming.StreamingFrontend(cfg, batch_size=B)

        def full_step(c48_chunk):
            return fe2.process(sr.process(c48_chunk))[0]

        t_full = timeit(full_step, c48)
        del fe2, sr, c48
        print(f"B={B:6d}  16k step {t_base*1e3:7.2f} ms  "
              f"48k ingest {t_full*1e3:7.2f} ms  "
              f"(+{(t_full-t_base)*1e3:6.2f} ms)  "
              f"budget use {t_full*1e3/budget_ms*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
