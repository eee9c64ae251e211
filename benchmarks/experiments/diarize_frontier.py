"""Long-form diarization accuracy/wall-time frontier (round-5 item 5).

`diarize_long`'s shipped default (block=512, 1 refine pass) measured
0.920 frame agreement vs truth at 2,460x warm on the 3 h / 6-speaker
world — 3.6 points under the single-stage recipe on the slice where both
ran (0.956). That default was a single point, not a curve. This sweeps
the clustering half on the SAME recording with the segment-i-vector
front half computed once (it is identical for every point):

  - block in {256, 512, 1024}
  - refine_iters in {1, 2, 3}
  - block_threshold offsets {0 (default), +2, +5} (positive = blocks
    fragment more; stage 2 can join fragments but never split them)
  - one overlapping-blocks variant (50% overlap; each window keeps the
    fragment from the block whose center it is closest to)

and reports agreement-vs-truth + clustering wall per point.

Run:  python -m benchmarks.experiments.diarize_frontier --world .bench/world_r5
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from tpufeat import diarization as dz
from tpufeat import ivector as iv
from tpufeat import plda as pl
from benchmarks.experiments.diarize_long_bench import agreement


def overlap_two_stage(plda, ivecs, *, block, num_speakers, threshold=0.0,
                      block_threshold=None, step=None):
    """Overlapping-blocks variant of two_stage_cluster: blocks advance by
    ``step`` (default block//2); each window takes its fragment from the
    block whose center is nearest, then the centroid AHC is identical."""
    x = np.asarray(ivecs, np.float64)
    N = x.shape[0]
    step = step or block // 2
    bt = threshold if block_threshold is None else block_threshold
    frag = np.full(N, -1, np.int64)
    owner_dist = np.full(N, np.inf)
    means, counts = [], []
    starts = list(range(0, max(N - block, 0) + 1, step))
    if not starts or starts[-1] + block < N:
        starts.append(max(N - block, 0))
    for b0 in starts:
        sl = slice(b0, min(b0 + block, N))
        lab = dz.cluster_affinity(dz.plda_affinity(plda, x[sl]),
                                  threshold=bt)
        center = b0 + (sl.stop - b0) / 2.0
        idx = np.arange(b0, sl.stop)
        d = np.abs(idx - center)
        take = d < owner_dist[idx]
        # fragments of this block: register only windows this block owns
        base = len(means)
        for u in range(lab.max() + 1):
            rows = idx[(lab == u) & take]
            if len(rows) == 0:
                continue
            frag[rows] = len(means)
            owner_dist[rows] = d[(lab == u) & take]
            means.append(x[rows].mean(axis=0))
            counts.append(len(rows))
        del base
    means = np.stack(means)
    counts = np.asarray(counts, np.float64)
    s = np.asarray(plda.score(means, means, n_enroll=counts))
    s = 0.5 * (s + s.T)
    glab = dz.cluster_affinity(s, num_speakers=num_speakers,
                               threshold=threshold)
    return glab[frag]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="/root/repo/.bench/world_r5")
    ap.add_argument("--minutes", type=int, default=180)
    args = ap.parse_args()

    ext = iv.IvectorExtractor.load(args.world + "_ext.npz")
    model = pl.Plda.load(args.world + "_plda.npz")

    # identical recording construction to diarize_long_bench
    r = np.random.default_rng(0)
    D, n_spk, P = 13, 24, 32
    phones = r.standard_normal((P, D)) * 4.0
    offs = r.standard_normal((n_spk, D)) * 1.0

    def draw(spk, n, s):
        rr = np.random.default_rng(s)
        z = rr.integers(0, P, n)
        return (phones[z] + offs[spk]
                + 0.8 * rr.standard_normal((n, D))).astype(np.float32)

    T = args.minutes * 60 * 100
    rr = np.random.default_rng(7)
    parts, truth_parts, t_acc, i = [], [], 0, 0
    while t_acc < T:
        s = int(rr.integers(0, 6))
        n = min(int(rr.integers(300, 1500)), T - t_acc)
        parts.append(draw(s, n, 5000 + i))
        truth_parts.append(np.full(n, s))
        t_acc += n
        i += 1
    feats = np.concatenate(parts)
    truth = np.concatenate(truth_parts)
    hours = args.minutes / 60.0
    print(f"{args.minutes} min, {T} frames, {i} turns", flush=True)

    # front half ONCE (identical for every clustering config)
    t0 = time.perf_counter()
    ivecs, spans = dz.segment_ivectors(ext, feats, bucket_frames=True)
    ivecs = np.asarray(ivecs)
    t_front_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ivecs2, _ = dz.segment_ivectors(ext, feats, bucket_frames=True)
    np.asarray(ivecs2)
    t_front = time.perf_counter() - t0
    print(f"segment i-vectors: {len(ivecs)} windows, cold "
          f"{t_front_cold:.1f} s / warm {t_front:.1f} s", flush=True)

    rows = []

    def point(name, fn):
        t0 = time.perf_counter()
        labels = fn()
        t_cluster = time.perf_counter() - t0
        t0 = time.perf_counter()
        frame_labels, _ = dz._label_frames(labels, spans, T, None)
        t_lab = time.perf_counter() - t0
        wall = t_front + t_cluster + t_lab
        acc = agreement(frame_labels, truth)
        rtfx = hours * 3600 / wall
        rows.append({"config": name, "agreement": round(float(acc), 3),
                     "cluster_s": round(t_cluster, 2),
                     "warm_wall_s": round(wall, 2),
                     "warm_rtfx": round(rtfx)})
        print(f"{name:42s} agree {acc:.3f}  cluster {t_cluster:6.2f} s  "
              f"warm-total {wall:6.2f} s = {rtfx:6.0f}x", flush=True)

    for block in (256, 512, 1024):
        for ri in (1, 2, 3):
            point(f"block={block} refine={ri}", lambda b=block, k=ri: (
                dz.refine_labels(model, ivecs, dz.two_stage_cluster(
                    model, ivecs, block=b, num_speakers=6), iters=k)))
    for off in (2.0, 5.0):
        point(f"block=512 refine=1 bt=+{off}", lambda o=off: (
            dz.refine_labels(model, ivecs, dz.two_stage_cluster(
                model, ivecs, block=512, num_speakers=6,
                block_threshold=o), iters=1)))
    point("overlap50 block=512 refine=1", lambda: (
        dz.refine_labels(model, ivecs, overlap_two_stage(
            model, ivecs, block=512, num_speakers=6), iters=1)))
    point("overlap50 block=1024 refine=2", lambda: (
        dz.refine_labels(model, ivecs, overlap_two_stage(
            model, ivecs, block=1024, num_speakers=6), iters=2)))

    print(json.dumps({"front_warm_s": round(t_front, 2), "points": rows}),
          flush=True)


if __name__ == "__main__":
    main()
