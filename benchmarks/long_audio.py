"""Long-audio processing demo (SURVEY.md §5 "Long-context").

Two mechanisms for audio far larger than device memory allows as one batch:

1. Within-chip: ``lax.scan`` over the streaming step — constant memory for
   arbitrarily long recordings (the blockwise-attention analog for a
   front-end). This script replays N hours of audio through the scan driver
   and reports RTFx and peak chunk state size.

2. Across chips: time-axis sharding with halo exchange
   (tpufeat/sharding.py) — demonstrated by tests/test_sharding.py and
   __graft_entry__.dryrun_multichip on the virtual mesh.

  python -m benchmarks.long_audio --minutes 60 --chunk-seconds 60
"""

from __future__ import annotations

import argparse
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
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from tpufeat import streaming
    from tpufeat.config import MFCC13_HTK

    # the scan is bound by sequential step latency, not compute — the plain
    # XLA path measured slightly faster than the pallas kernel per tiny chunk
    cfg = MFCC13_HTK
    sr = cfg.sample_rate
    chunk = int(args.chunk_seconds * sr) // cfg.hop_length * cfg.hop_length
    n_chunks = int(args.minutes * 60 * sr / chunk)
    B = args.streams

    print(f"backend={jax.default_backend()}  {args.minutes} min x {B} "
          f"streams in {n_chunks} chunks of {chunk} samples", file=sys.stderr)

    # The audio is generated on-device chunk by chunk inside the scan, so
    # host memory stays constant no matter how long the recording is.
    def step(carry, key):
        state, nf_total = carry
        x = jax.random.normal(key, (B, chunk), jnp.float32) * 0.1
        state, (feats, mask) = streaming.process_chunk(state, x, cfg)
        # consume features immediately (checksum) — a real pipeline would
        # hand them to an encoder here
        return (state, nf_total + mask.sum()), feats.sum()

    keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)
    init = (streaming.init_state(B, cfg), jnp.zeros((), jnp.int32))

    scan = jax.jit(lambda c0, ks: jax.lax.scan(step, c0, ks))
    (state, n_frames), sums = scan(init, keys)  # compile + run
    total = float(np.asarray(sums).sum())       # forces completion
    t0 = time.perf_counter()
    (state, n_frames), sums = scan(init, keys)
    total = float(np.asarray(sums).sum())
    dt = time.perf_counter() - t0

    audio_s = args.minutes * 60 * B
    out = {
        "minutes": args.minutes,
        "streams": B,
        "frames": int(n_frames),
        "wall_s": round(dt, 3),
        "rtfx": round(audio_s / dt, 1),
        "state_bytes": int(sum(np.asarray(l).nbytes
                               for l in jax.tree_util.tree_leaves(state))),
        "checksum": total,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
