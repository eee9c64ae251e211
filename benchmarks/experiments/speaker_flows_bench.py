"""On-chip cost of the round-3 speaker flows over a real ragged corpus:

1. Corpus fMLLR estimation: python-level extract_corpus sweep + the
   bucketed per-row statistics dispatches + Gales estimation, per
   speaker (the pipeline --fmllr-ubm path).
2. End-to-end diarization wall time for 30 min of audio: window
   i-vectors (chip) + PLDA affinity (chip) + average-link AHC (host)
   + frame labeling.

  python -m benchmarks.experiments.speaker_flows_bench /tmp/corpus_dir
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from tpufeat import pipeline
from tpufeat.config import MFCC13_HTK


def main(corpus_dir):
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        from benchmarks.experiments.make_corpus import make_corpus
        os.makedirs(corpus_dir, exist_ok=True)
        make_corpus(corpus_dir, 200, seed=0)

    # --- 1. corpus fMLLR (20 pseudo-speakers round-robin) ---------------
    names = sorted(
        os.path.relpath(os.path.join(root, n), corpus_dir)
        for root, _, files in os.walk(corpus_dir)
        for n in files if n.endswith(".wav"))
    assert names, corpus_dir
    u2s = os.path.join(corpus_dir, "..", "u2s.txt")
    with open(u2s, "w") as f:
        for i, n in enumerate(names):
            f.write(f"{n} spk{i % 20}\n")
    # UBM from a quick feature pass
    import tpufeat
    feats = []
    audio_s = 0.0
    for _, fmat in pipeline.extract_corpus(corpus_dir, MFCC13_HTK, 64):
        feats.append(fmat)
        audio_s += fmat.shape[0] * 0.01
    ubm_p = os.path.join(corpus_dir, "..", "ubm.npz")
    if os.path.exists(ubm_p):
        from tpufeat.ivector import DiagUbm as _D
        ubm = _D.load(ubm_p)
    else:
        ubm = tpufeat.train_diag_ubm(
            np.concatenate(feats)[::5], 64, iters=2, final_iters=3)
        ubm.save(ubm_p)
    trans_p = os.path.join(corpus_dir, "..", "trans.ark")
    for tag in ("cold", "warm"):          # warm = programs compiled
        t0 = time.perf_counter()
        pipeline.main([corpus_dir,
                       os.path.join(corpus_dir, "..", "o.npz"),
                       "--batch", "64", "--utt2spk", u2s,
                       "--fmllr-ubm", ubm_p, "--fmllr-ark", trans_p,
                       "--fmllr-min-count", "100"])
        dt = time.perf_counter() - t0
        print(json.dumps({"flow": f"corpus_fmllr_{tag}",
                          "files": len(names),
                          "audio_s": round(audio_s, 1),
                          "wall_s": round(dt, 2),
                          "rtfx": round(audio_s / dt, 1)}), flush=True)

    # --- 2. diarization end to end (30 min synthetic) --------------------
    from tpufeat import diarization as dz
    from tpufeat.ivector import DiagUbm, IvectorExtractor
    from tpufeat.plda import Plda
    r = np.random.default_rng(0)
    G, D, K = 512, 13, 100
    w = r.uniform(0.5, 1.5, G); w /= w.sum()
    vars_ = r.uniform(0.5, 2.0, (G, D))
    ubm2 = DiagUbm(w, r.standard_normal((G, D)) * 2.0, vars_)
    ext = IvectorExtractor(
        ubm2, r.standard_normal((G, D, K))
        * np.sqrt(vars_)[:, :, None] * 0.3)
    model = Plda(r.standard_normal(K),
                 np.linalg.qr(r.standard_normal((K, K)))[0],
                 np.sort(r.random(K) * 5.0)[::-1])
    Tf = 30 * 60 * 100
    rec = r.standard_normal((Tf, D)).astype(np.float32)
    dz.diarize(ext, model, rec[:3000], num_speakers=2)   # warm compiles
    t0 = time.perf_counter()
    labels, segs = dz.diarize(ext, model, rec, num_speakers=4)
    dt = time.perf_counter() - t0
    print(json.dumps({"flow": "diarize_30min", "frames": Tf,
                      "windows": int(len(dz.sliding_windows(Tf))),
                      "wall_s": round(dt, 2),
                      "rtfx": round(30 * 60 / dt, 1),
                      "segments": len(segs)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/corpus200/wavs")
