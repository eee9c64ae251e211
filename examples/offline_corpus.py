"""Offline corpus extraction, end to end.

Generates a tiny synthetic WAV corpus, extracts Kaldi-style 39-dim
features with corpus-level CMVN, and writes a Kaldi binary archive —
the batch-production shape (docs/DEPLOY.md). Runs on CPU or TPU.

    python examples/offline_corpus.py [workdir]
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(workdir=None):
    import tpufeat
    from tpufeat import data, feats_io, pipeline
    import tpufeat.io as tio

    workdir = workdir or tempfile.mkdtemp(prefix="tpufeat_demo_")
    wav_dir = os.path.join(workdir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        n = int(rng.integers(8000, 32000))
        tio.write_wav(os.path.join(wav_dir, f"utt{i}.wav"),
                      (0.3 * rng.standard_normal(n)).astype(np.float32),
                      16000)

    cfg = tpufeat.KALDI39
    stats = {}
    cmvn = data.CmvnStats(cfg.feature_dim)
    utts = {}
    for path, feats in pipeline.extract_corpus(wav_dir, cfg,
                                               batch_size=4, stats=stats):
        cmvn.accumulate(feats)
        utts[os.path.basename(path)] = feats
    normalized = {feats_io.ark_keys([k])[0]: cmvn.apply(f)
                  for k, f in utts.items()}
    ark = os.path.join(workdir, "feats.ark")
    feats_io.write_kaldi_ark(ark, normalized,
                             scp_path=os.path.join(workdir, "feats.scp"))
    print(f"{len(utts)} utterances -> {ark}")
    print(f"pipeline stats: {stats}")
    back = feats_io.read_kaldi_ark(ark)
    assert len(back) == len(utts)
    print("ark round-trip OK; first utt:",
          next(iter(back.values())).shape)
    return workdir


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
