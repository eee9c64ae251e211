"""Online-serving benchmark: concurrent real-time streams per chip.

The production question for an online ASR front-end is not batch RTFx but
"how many live 16 kHz streams can one chip sustain at real time?". Each
stream delivers hop-aligned chunks; a step processing B streams' chunks of
``chunk_seconds`` must finish in under ``chunk_seconds`` wall-clock.

  python -m benchmarks.serving --chunk-seconds 0.1
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(batch: int, chunk: int, iters: int = 20, chain: int = 8):
    import jax
    import jax.numpy as jnp
    from tpufeat import streaming
    from tpufeat.config import MFCC13_HTK

    cfg = MFCC13_HTK
    state = streaming.init_state(batch, cfg)
    fn = streaming.make_stream_fn(cfg)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        (rng.standard_normal((batch, chunk)) * 0.1).astype(np.float32)))

    @jax.jit
    def cks(t):
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(t))

    def run():
        s = state
        out = None
        for _ in range(chain):
            s, out = fn(s, x)
        return float(cks(out))

    run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / chain


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--chunk-seconds", type=float, default=0.1)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    from tpufeat.config import MFCC13_HTK
    cfg = MFCC13_HTK
    chunk = max(1, int(args.chunk_seconds * cfg.sample_rate
                       // cfg.hop_length)) * cfg.hop_length
    budget = chunk / cfg.sample_rate
    print(f"backend={jax.default_backend()} chunk={chunk} samples "
          f"({budget*1e3:.0f} ms real-time budget)", file=sys.stderr)

    rows = []
    best = 0
    for batch in (64, 256, 1024, 4096, 16384):
        dt = measure(batch, chunk, iters=args.iters)
        rt = dt <= budget
        rows.append({"streams": batch, "step_ms": round(dt * 1e3, 3),
                     "real_time": rt,
                     "utilization": round(dt / budget, 4)})
        print(f"streams={batch:6d} step={dt*1e3:8.3f} ms "
              f"({'OK' if rt else 'OVER'} vs {budget*1e3:.0f} ms budget)",
              file=sys.stderr)
        if rt:
            best = batch
        else:
            break
    print(json.dumps({"chunk_samples": chunk,
                      "budget_ms": budget * 1e3,
                      "max_real_time_streams": best,
                      "rows": rows}))


if __name__ == "__main__":
    main()
