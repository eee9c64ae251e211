"""Online serving loop, end to end.

A live 48 kHz "microphone" stream drives the full online chain:
StreamingResampler (48k -> 16k, inside StreamingPipeline) -> front-end ->
online deltas -> sliding CMVN, with StreamingEnergyVAD +
StreamingEndpointer as the host-side utterance control loop
(docs/STREAMING.md). Runs on CPU or TPU.

    python examples/online_serving.py
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import tpufeat

    # 3 s of speech-like tone bursts, then 2 s of near-silence, at 48 kHz
    rng = np.random.default_rng(0)
    sr_mic = 48000
    x = 1e-4 * rng.standard_normal(5 * sr_mic).astype(np.float32)
    t = np.arange(3 * sr_mic) / sr_mic
    x[: 3 * sr_mic] += (0.4 * np.sin(2 * np.pi * 220 * t)
                        * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
                        ).astype(np.float32)

    cfg = dataclasses.replace(tpufeat.KALDI39, cmvn="sliding")
    pipe = tpufeat.StreamingPipeline(cfg, input_rate=sr_mic)
    vad = tpufeat.StreamingEnergyVAD()
    ep = tpufeat.StreamingEndpointer()

    chunk = 4800                       # 100 ms at the mic rate
    rows = 0
    for i in range(0, len(x), chunk):
        c48 = x[None, i: i + chunk]
        rows += np.asarray(pipe.process(c48)).shape[1]
        # VAD runs on the 16 kHz grid: reuse the pipeline's resampler
        # output by resampling the control copy (cheap at 100 ms)
        c16 = np.asarray(tpufeat.resample(c48, sr_mic, 16000))
        done = ep.update(vad.process(c16))
        if done[0]:
            print(f"endpoint at {(i + chunk) / sr_mic:.1f} s "
                  f"({rows} feature rows emitted)")
            break
    rows += np.asarray(pipe.flush()).shape[1]
    print(f"total {rows} x {pipe.out_dim}-dim rows; "
          f"state checkpoint keys: {sorted(pipe.state())}")
    assert rows > 0 and done[0]


if __name__ == "__main__":
    main()
