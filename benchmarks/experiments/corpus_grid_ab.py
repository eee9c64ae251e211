"""Bucket-grid A/B: does finer bucketing pay on the transfer-bound pass?

Padding is pure UPLOAD waste (the dominant warm-pass term through the
relay), and with a warm compile cache the finer grid's extra programs
are disk reads. One process, interleaved warm passes (sqrt2 / fine /
sqrt2 / fine ...) so relay weather averages out of the comparison.

Run:  TPUFEAT_COMPILE_CACHE=... python -m benchmarks.experiments.corpus_grid_ab
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/corpus2000"


def main():
    import numpy as np
    from tpufeat import pipeline
    from tpufeat.config import PRESETS

    cfg = dataclasses.replace(
        PRESETS["mfcc13"], use_pallas=True, gemm_dft=True,
        fused_framing=True, matmul_precision="bf16x3")
    grids = {"sqrt2": 2 ** 0.5, "fine4": 2 ** 0.25}

    def one_pass(grid):
        stats = {}
        t0 = time.perf_counter()
        for _ in pipeline.extract_corpus(CORPUS, cfg, batch_size=128,
                                         bucket_grid=grid, stats=stats):
            pass
        return time.perf_counter() - t0, stats

    walls = {k: [] for k in grids}
    for name, g in grids.items():       # cold/populate passes
        w, st = one_pass(g)
        print(f"cold  {name}: {w:7.1f} s ({st['n_programs']} programs, "
              f"waste {st['padding_waste']:.3f})", flush=True)
    audio = st["audio_s"]
    for rnd in range(3):
        for name, g in grids.items():
            w, st = one_pass(g)
            walls[name].append(w)
            print(f"warm{rnd} {name}: {w:7.1f} s = {audio/w:5.0f}x "
                  f"(waste {st['padding_waste']:.3f})", flush=True)
    print(json.dumps({
        k: {"walls_s": [round(w, 1) for w in v],
            "median_s": round(float(np.median(v)), 1),
            "best_s": round(min(v), 1),
            "best_rtfx": round(audio / min(v))}
        for k, v in walls.items()}), flush=True)


if __name__ == "__main__":
    main()
