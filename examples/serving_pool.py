"""Multi-stream serving with StreamPool — the batched control loop.

`online_serving.py` walks ONE live stream end to end; this example runs
the shape production serving actually takes (docs/STREAMING.md "Serving
control"): a fixed-capacity StreamingPipeline batch whose rows are
leased/recycled across callers. Per 100 ms tick:

  1. assemble the ingest block [capacity, 1600] straight from the
     callers' buffers (unleased rows: zeros);
  2. `pool.process_batch(block)` — ONE compiled dispatch for every
     stream; consume the tick via `rows.block()` (one bulk fetch, zero
     per-slot dispatches — see BASELINE.md's pool-overhead row);
  3. run VAD + endpointer on the same block; where an endpoint fires:
     `pool.detach` -> reset the VAD/endpointer rows -> `pool.attach`
     for the next caller (slot recycling, bit-exact per-row reset).

    python examples/serving_pool.py
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_caller(seed: int, speech_s: float, total_s: float, sr=16000):
    """A caller: `speech_s` seconds of tone bursts, then near-silence."""
    rng = np.random.default_rng(seed)
    x = 1e-4 * rng.standard_normal(int(total_s * sr)).astype(np.float32)
    n = int(speech_s * sr)
    t = np.arange(n) / sr
    x[:n] += (0.3 * np.sin(2 * np.pi * (150 + 40 * seed) * t)
              * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    return x


def main():
    import tpufeat
    from tpufeat import augment

    cfg = dataclasses.replace(tpufeat.KALDI39, cmvn="none")
    capacity, chunk = 3, 1600                      # 100 ms ticks at 16 kHz
    pool = tpufeat.StreamPool(
        tpufeat.StreamingPipeline(cfg, batch_size=capacity))
    vad = augment.StreamingEnergyVAD(batch_size=capacity)
    ep = augment.StreamingEndpointer(batch_size=capacity)

    # callers queue up; two connect immediately, one replaces the first
    # endpointed slot mid-run
    waiting = [make_caller(2, 0.8, 6.0), make_caller(3, 3.0, 6.0),
               make_caller(5, 0.8, 6.0)]
    feed = {}                                      # slot -> (signal, pos)
    for _ in range(2):
        feed[pool.attach()] = [waiting.pop(0), 0]

    emitted = {s: 0 for s in feed}
    turnovers = 0
    for tick in range(48):                         # 4.8 s of serving
        block = np.zeros((capacity, chunk), np.float32)
        for s, sp in feed.items():
            sig, pos = sp
            block[s] = sig[pos: pos + chunk]
            sp[1] += chunk
        rows = pool.process_batch(block)
        out, skips = rows.block()                  # ONE bulk fetch per tick
        feats = np.asarray(out)
        for s in rows:
            emitted[s] += feats.shape[1] - skips[s]
        done = ep.update(vad.process(block))
        for s in [s for s in np.flatnonzero(done) if s in feed]:
            print(f"tick {tick:2d}: endpoint on slot {s} "
                  f"({emitted[s]} rows served)")
            pool.detach(int(s))
            vad.reset_rows([int(s)])
            ep.reset_rows([int(s)])
            del feed[int(s)]
            turnovers += 1
            if waiting:                            # next caller takes it
                slot = pool.attach()
                feed[slot] = [waiting.pop(0), 0]
                emitted[slot] = 0
                print(f"         slot {slot} re-leased to a new caller")
    print(f"{turnovers} utterance turnovers on {capacity} slots; "
          f"active at shutdown: {pool.active}")
    assert turnovers >= 2 and not waiting


if __name__ == "__main__":
    main()
