"""Hours-scale diarization on chip (round-4 VERDICT item 5).

The 30-min offline row (BASELINE.md 2026-08-19) ends at the [N, N]
affinity + host AHC; at 3 h (N ~= 14.4k windows) that is ~830 MB of
relay readback and O(N^2) host linkage. This measures the long-form
answers end to end on a synthetic 3 h multi-speaker recording:

1. ``diarize_long`` (two-stage clustering: per-block AHC -> centroid
   AHC + one refinement pass) — cold and warm wall time, plus label
   agreement vs the single-stage offline recipe on the first 30-min
   slice and vs ground truth.
2. ``StreamingDiarizer`` (the greedy online twin) fed 10 s chunks —
   wall time + agreement vs truth (the documented accuracy statement
   for the greedy path).

World: the i-vector generative model itself — 32 SHARED acoustic
states (phones) in 13-dim feature space plus a small per-speaker shift
of every state (disjoint per-speaker blobs would be absorbed into a
large UBM's components and carry no mean-shift information — measured:
blob speakers score at ~0 LLR separation, shared-state speakers at
same-med 67 vs diff-med -1.5e6 with zero overlap at G=512/K=100). UBM /
T-matrix / PLDA are trained with the repo's own EM at production scale.
Recording: 6 of the 24 speakers in 3-15 s turns.

Timing per repo convention: the relay's block_until_ready is a no-op,
so device work is synced via fetches the algorithms themselves perform
(labels land on host in every path).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from tpufeat import diarization as dz
from tpufeat import ivector as iv
from tpufeat import plda as pl


def agreement(a, b):
    """Best label-permutation frame agreement (Hungarian on the
    confusion matrix); ignores frames labeled <0 in either."""
    from scipy.optimize import linear_sum_assignment
    m = (np.asarray(a) >= 0) & (np.asarray(b) >= 0)
    a, b = np.asarray(a)[m], np.asarray(b)[m]
    ka, kb = a.max() + 1, b.max() + 1
    conf = np.zeros((ka, kb), np.int64)
    np.add.at(conf, (a, b), 1)
    r, c = linear_sum_assignment(-conf)
    return conf[r, c].sum() / len(a)


def main(minutes: int = 180, G: int = 512, K: int = 100,
         world: str | None = None, save_world: str | None = None):
    r = np.random.default_rng(0)
    # 24 world speakers x 40 window-length utterances: the first cut
    # (12 x 8 = 96 i-vectors for a K=100 PLDA) separated its own
    # training set perfectly (overlap 0) but collapsed on held-out
    # window i-vectors (same-med -41 / diff-med -81, 32% overlap) —
    # classic PLDA overfit with fewer examples than dimensions; both
    # diarizers then scored ~chance vs truth while agreeing 0.998 with
    # each other. PLDA needs utterance counts well past K.
    D, n_spk, P = 13, 24, 32
    phones = r.standard_normal((P, D)) * 4.0      # shared acoustic states
    offs = r.standard_normal((n_spk, D)) * 1.0    # per-speaker shift

    def draw(spk, n, s):
        rr = np.random.default_rng(s)
        z = rr.integers(0, P, n)
        return (phones[z] + offs[spk]
                + 0.8 * rr.standard_normal((n, D))).astype(np.float32)

    if world:
        # pre-trained world (e.g. CPU-trained: on-chip EM training of
        # THIS world collapses PLDA separation — see BASELINE.md round-4
        # diarization notes / sep_probe)
        ext = iv.IvectorExtractor.load(world + "_ext.npz")
        model = pl.Plda.load(world + "_plda.npz")
        print(f"loaded world from {world}_*.npz "
              f"(G={ext.ubm.num_gauss}, K={ext.ivector_dim})", flush=True)
    else:
        print(f"training world (G={G}, K={K}, {n_spk} speakers)...",
              flush=True)
        t0 = time.perf_counter()
        frames = np.concatenate([draw(s, 4000, 100 + s)
                                 for s in range(n_spk)])
        ubm = iv.train_diag_ubm(frames, G, iters=2, final_iters=3, seed=0)
        utts, ids = [], []
        for s in range(n_spk):
            for u in range(40):
                utts.append(draw(s, 150, 200 + 10 * s + u))
                ids.append(s)
        ext = iv.train_ivector_extractor(ubm, utts, ivector_dim=K,
                                         iters=3, seed=1)
        ivs = np.stack([np.asarray(iv.utterance_ivector(ext, u),
                                   np.float64) for u in utts])
        model = pl.train_plda(ivs, ids, iters=5)
        print(f"  world trained in {time.perf_counter() - t0:.1f} s",
              flush=True)
        if save_world:
            ext.save(save_world + "_ext.npz")
            model.save(save_world + "_plda.npz")
            S = np.asarray(model.score(ivs, ivs))
            ids_a = np.asarray(ids)
            same = S[ids_a[:, None] == ids_a[None, :]]
            diff = S[ids_a[:, None] != ids_a[None, :]]
            print(f"saved world to {save_world}_*.npz (same-med "
                  f"{np.median(same):.1f}, diff-med {np.median(diff):.1f},"
                  f" overlap {(diff > np.median(same)).mean():.4f})",
                  flush=True)
            return

    # --- the recording: 6 speakers, 3-15 s turns --------------------------
    hours = minutes / 60.0
    T = minutes * 60 * 100
    rr = np.random.default_rng(7)
    parts, truth_parts, t_acc, i = [], [], 0, 0
    while t_acc < T:
        s = int(rr.integers(0, 6))
        n = int(rr.integers(300, 1500))
        n = min(n, T - t_acc)
        parts.append(draw(s, n, 5000 + i))
        truth_parts.append(np.full(n, s))
        t_acc += n
        i += 1
    feats = np.concatenate(parts)
    truth = np.concatenate(truth_parts)
    del parts, truth_parts
    print(f"{minutes} min recording: {T} frames, {i} turns, 6 speakers",
          flush=True)

    # --- 1. diarize_long --------------------------------------------------
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        labels, segs = dz.diarize_long(ext, model, feats, num_speakers=6,
                                       block=512)
        dt = time.perf_counter() - t0
        rtfx = hours * 3600 / dt
        print(f"diarize_long {tag}: {dt:.1f} s wall = {rtfx:.0f}x real "
              f"time ({len(segs)} segments, "
              f"{len(set(labels[labels >= 0]))} speakers)", flush=True)
    acc_long = agreement(labels, truth)
    print(f"diarize_long vs truth: {acc_long:.3f} frame agreement",
          flush=True)

    # --- single-stage offline on the first 30-min slice -------------------
    Ts = min(30, minutes) * 60 * 100
    t0 = time.perf_counter()
    lab_off, _ = dz.diarize(ext, model, feats[:Ts], num_speakers=6)
    dt = time.perf_counter() - t0
    print(f"offline diarize, 30-min slice: {dt:.1f} s "
          f"(agreement vs truth {agreement(lab_off, truth[:Ts]):.3f})",
          flush=True)
    print(f"diarize_long vs single-stage on the slice: "
          f"{agreement(labels[:Ts], lab_off):.3f}", flush=True)

    # --- 2. StreamingDiarizer over the full recording ---------------------
    sd = dz.StreamingDiarizer(ext, model, max_speakers=6)
    out = np.full(T, -1, np.int64)
    t0 = time.perf_counter()
    pos = 0
    while pos < T:
        lab, start = sd.process(feats[pos: pos + 1000])
        out[start: start + len(lab)] = lab
        pos += 1000
    lab, start = sd.flush()
    out[start: start + len(lab)] = lab
    dt = time.perf_counter() - t0
    print(f"StreamingDiarizer {minutes} min in 10 s chunks: {dt:.1f} s "
          f"wall = "
          f"{hours * 3600 / dt:.0f}x real time, "
          f"{len(set(out[out >= 0]))} speakers", flush=True)
    print(f"StreamingDiarizer vs truth: {agreement(out, truth):.3f}; "
          f"vs diarize_long: {agreement(out, labels):.3f}", flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=int, default=180)
    ap.add_argument("--gauss", type=int, default=512)
    ap.add_argument("--kdim", type=int, default=100)
    ap.add_argument("--world", default=None,
                    help="load <world>_ext.npz / <world>_plda.npz "
                         "instead of training")
    ap.add_argument("--save-world", default=None,
                    help="train the world, save it as <path>_ext.npz / "
                         "<path>_plda.npz with a separation report, and "
                         "exit (run on CPU: on-chip EM training of this "
                         "world collapses PLDA separation — sep_probe)")
    a = ap.parse_args()
    main(a.minutes, a.gauss, a.kdim, a.world, a.save_world)
