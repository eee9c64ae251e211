"""Generate a synthetic ragged WAV corpus for corpus-pipeline measurement
(round-3 VERDICT item 3: ragged-batch + end-to-end pipeline evidence).

Durations are log-normal clipped to [1 s, 30 s] — a LibriSpeech-like
spread — at 16 kHz mono 16-bit PCM, band-limited noise + tones so spectra
are non-degenerate.

  python -m benchmarks.experiments.make_corpus /dir --files 2000 --seed 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from tpufeat import io


def make_corpus(out_dir: str, n_files: int, seed: int = 0,
                rate: int = 16000) -> dict:
    rng = np.random.default_rng(seed)
    # log-normal: median ~6 s, clipped to [1, 30] s
    durs = np.clip(np.exp(rng.normal(np.log(6.0), 0.8, n_files)), 1.0, 30.0)
    os.makedirs(out_dir, exist_ok=True)
    total = 0.0
    for i, d in enumerate(durs):
        n = int(d * rate)
        t = np.arange(n) / rate
        f0 = rng.uniform(80, 3500)
        sig = (0.08 * rng.standard_normal(n)
               + 0.05 * np.sin(2 * np.pi * f0 * t)
               + 0.03 * np.sin(2 * np.pi * 2.7 * f0 * t)).astype(np.float32)
        sub = os.path.join(out_dir, f"d{i % 16:02d}")
        os.makedirs(sub, exist_ok=True)
        io.write_wav(os.path.join(sub, f"utt{i:05d}.wav"), sig, rate)
        total += d
    return {"files": n_files, "audio_s": round(float(total), 1),
            "median_s": round(float(np.median(durs)), 2),
            "p90_s": round(float(np.percentile(durs, 90)), 2)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--files", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    print(json.dumps(make_corpus(args.out_dir, args.files, args.seed)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
