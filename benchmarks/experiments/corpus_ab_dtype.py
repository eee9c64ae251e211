"""Interleaved f32/bf16 warm corpus passes — ONE process, ONE session.

Round-4 compared the bf16 corpus pass (87.4 s, 2026-08-20, degraded
relay) against the f32 row measured three days earlier (52.1 s) — a
cross-day comparison under acknowledged "relay weather", and the probe
that was meant to explain it died in a claim stall. This closes the
contradiction properly (round-5 VERDICT item 2): alternating
f32/bf16/f32/bf16 warm passes in one process, so relay weather averages
out of the COMPARISON, followed by the readback_dtype primitive probe in
the same session.

Run:  python -m benchmarks.experiments.corpus_ab_dtype [corpus_dir]
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

    base = dataclasses.replace(
        PRESETS["mfcc13"], use_pallas=True, gemm_dft=True,
        fused_framing=True, matmul_precision="bf16x3")
    # legs: the round-3/4 measurement baseline (serial fetch, f32
    # arenas), the bf16-out variant of it, and the round-5 production
    # path (overlapped fetch + int16 arena upload) — interleaved so
    # relay weather averages out of every comparison
    legs = {
        "f32-serial": (base, dict(overlap_fetch=False,
                                  compact_upload=False)),
        "bf16-serial": (dataclasses.replace(base, out_dtype="bfloat16"),
                        dict(overlap_fetch=False, compact_upload=False)),
        "f32-pipelined": (base, dict(overlap_fetch=True,
                                     compact_upload=True)),
    }

    def one_pass(cfg, kw):
        stats = {}
        t0 = time.perf_counter()
        n = 0
        for _key, feats in pipeline.extract_corpus(CORPUS, cfg,
                                                   batch_size=128,
                                                   stats=stats, **kw):
            n += feats.shape[0]
        wall = time.perf_counter() - t0
        return wall, stats, n

    # pass 0 of each leg pays the compiles; then 3 interleaved warm
    # rounds A/B/C/A/B/C/A/B/C
    results = {name: [] for name in legs}
    for name, (cfg, kw) in legs.items():
        wall, stats, _ = one_pass(cfg, kw)
        print(f"cold  {name:14s}: {wall:7.1f} s  "
              f"(rtfx {stats['audio_s']/wall:6.0f}, "
              f"programs {stats['n_programs']})", flush=True)
    audio_s = stats["audio_s"]
    for rnd in range(3):
        for name, (cfg, kw) in legs.items():
            wall, stats, _ = one_pass(cfg, kw)
            results[name].append(wall)
            print(f"warm{rnd} {name:14s}: {wall:7.1f} s  "
                  f"(rtfx {audio_s/wall:6.0f})", flush=True)
    summary = {
        name: {"walls_s": [round(w, 1) for w in ws],
               "best_s": round(min(ws), 1),
               "median_s": round(float(np.median(ws)), 1),
               "best_rtfx": round(audio_s / min(ws))}
        for name, ws in results.items()}
    summary["audio_s"] = audio_s
    print(json.dumps(summary), flush=True)

    # same-session primitive probe: np.asarray MB/s by dtype
    print("--- readback_dtype probe (same session) ---", flush=True)
    from benchmarks.experiments import readback_dtype
    readback_dtype.main()


if __name__ == "__main__":
    main()
