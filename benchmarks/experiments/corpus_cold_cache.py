"""Cache-backed corpus COLD start: fresh process, warm compile cache.

Run AFTER a populating pass (e.g. corpus_ab_dtype with
TPUFEAT_COMPILE_CACHE set): this process has compiled nothing, so its
first corpus pass is the true production cold start a fresh host sees
when the cache volume is warm. Compare against BASELINE.md's nocache
colds (800-1,619 s).

Run:  TPUFEAT_COMPILE_CACHE=.bench/jaxcache_corpus \
      python -m benchmarks.experiments.corpus_cold_cache [corpus_dir]
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/corpus2000"
GRID = float(sys.argv[2]) if len(sys.argv) > 2 else 2 ** 0.5


def main():
    import os
    assert os.environ.get("TPUFEAT_COMPILE_CACHE"), \
        "set TPUFEAT_COMPILE_CACHE (the point is the cache-backed cold)"
    from tpufeat import pipeline
    from tpufeat.config import PRESETS

    cfg = dataclasses.replace(
        PRESETS["mfcc13"], use_pallas=True, gemm_dft=True,
        fused_framing=True, matmul_precision="bf16x3")
    out = {"bucket_grid": GRID}
    for name in ("cold-cache-read", "warm"):
        stats = {}
        t0 = time.perf_counter()
        for _k, _f in pipeline.extract_corpus(CORPUS, cfg,
                                              batch_size=128,
                                              bucket_grid=GRID,
                                              stats=stats):
            pass
        wall = time.perf_counter() - t0
        out[name] = {"wall_s": round(wall, 1),
                     "rtfx": round(stats["audio_s"] / wall),
                     "n_programs": stats["n_programs"],
                     "padding_waste": stats["padding_waste"]}
        print(f"{name}: {wall:.1f} s = {stats['audio_s']/wall:.0f}x "
              f"({stats['n_programs']} programs, waste "
              f"{stats['padding_waste']:.3f})", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
