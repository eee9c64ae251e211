"""Long-audio processing demo (SURVEY.md §5 "Long-context").

Two mechanisms for audio far larger than device memory allows as one batch:

1. Within-chip: ``lax.scan`` over the streaming step — constant memory for
   arbitrarily long recordings (the blockwise-attention analog for a
   front-end). This script replays N hours of audio through the scan driver
   and reports RTFx and peak chunk state size. The step is the gather-free
   static-fill one (streaming.process_chunk_static): hop-aligned chunks
   reach a constant fill after the first chunk, so the whole scan runs
   framing as static slices + the fused signal kernel.

2. Across chips: time-axis sharding with halo exchange
   (tpufeat/sharding.py) — demonstrated by tests/test_sharding.py and
   __graft_entry__.dryrun_multichip on the virtual mesh.

  python -m benchmarks.long_audio --minutes 60 --chunk-seconds 60
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=60.0)
    p.add_argument("--chunk-seconds", type=float, default=60.0)
    p.add_argument("--streams", type=int, default=1,
                   help="parallel streams (batched state)")
    p.add_argument("--no-fused", action="store_true",
                   help="disable the fused Pallas signal kernel")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    from tpufeat import streaming
    from tpufeat.config import MFCC13_HTK

    cfg = MFCC13_HTK if args.no_fused else dataclasses.replace(
        MFCC13_HTK, use_pallas=True, gemm_dft=True, fused_framing=True,
        matmul_precision="bf16x3")
    sr = cfg.sample_rate
    chunk = int(args.chunk_seconds * sr) // cfg.hop_length * cfg.hop_length
    n_chunks = int(args.minutes * 60 * sr / chunk)
    B = args.streams

    print(f"backend={jax.default_backend()}  {args.minutes} min x {B} "
          f"streams in {n_chunks} chunks of {chunk} samples", file=sys.stderr)

    # hop-aligned chunks: fill is 0 for the first chunk, then constant
    f1 = streaming.next_fill(0, chunk, cfg)
    assert streaming.next_fill(f1, chunk, cfg) == f1

    # The audio is generated on-device chunk by chunk inside the scan, so
    # host memory stays constant no matter how long the recording is.
    def step(fill, carry, key):
        state, nf_total = carry
        x = jax.random.normal(key, (B, chunk), jnp.float32) * 0.1
        state, feats = streaming.process_chunk_static(state, x, cfg, fill)
        # consume features immediately (checksum) — a real pipeline would
        # hand them to an encoder here
        return (state, nf_total + feats.shape[1]), feats.sum()

    keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)

    @jax.jit
    def run_all(ks):
        init = (streaming.init_state(B, cfg), 0)
        carry, s0 = step(0, init, ks[0])               # warmup fill
        carry, sums = jax.lax.scan(functools.partial(step, f1), carry, ks[1:])
        return carry, s0 + sums.sum()

    (state, n_frames), total = run_all(keys)           # compile + run
    total = float(np.asarray(total))                   # forces completion
    t0 = time.perf_counter()
    (state, n_frames), total = run_all(keys)
    total = float(np.asarray(total))
    dt = time.perf_counter() - t0

    audio_s = args.minutes * 60 * B
    out = {
        "minutes": args.minutes,
        "streams": B,
        "frames": int(n_frames) * B,
        "wall_s": round(dt, 3),
        "rtfx": round(audio_s / dt, 1),
        "state_bytes": int(sum(np.asarray(l).nbytes
                               for l in jax.tree_util.tree_leaves(state))),
        "checksum": total,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
