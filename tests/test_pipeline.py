"""Corpus pipeline (tpufeat/pipeline.py): dir of WAVs -> features."""

import numpy as np

from tpufeat import features, io, pipeline
from tpufeat.config import MFCC13_HTK

from conftest import make_signal


def _make_corpus(tmp_path, lengths):
    d = tmp_path / "wavs"
    (d / "sub").mkdir(parents=True)
    sigs = {}
    for i, n in enumerate(lengths):
        rel = f"sub/u{i}.wav" if i % 2 else f"u{i}.wav"
        sig = make_signal(n, seed=100 + i)
        io.write_wav(str(d / rel), sig, 16000)
        sigs[rel] = sig
    return d, sigs


class TestPipeline:
    def test_matches_direct_extract(self, tmp_path):
        d, sigs = _make_corpus(tmp_path, [16000, 7000, 23999, 16000, 4000])
        got = {}
        for path, feats in pipeline.extract_corpus(str(d), MFCC13_HTK,
                                                   batch_size=2):
            import os
            got[os.path.relpath(path, str(d))] = feats
        assert set(got) == set(sigs)
        for rel, sig in sigs.items():
            # WAV write/read quantizes to int16; compare vs the decoded data
            x, _ = io.read_wav(str(d / rel))
            want = np.asarray(features.extract(x, cfg=MFCC13_HTK).features)
            np.testing.assert_allclose(got[rel], want, atol=2e-5)

    def test_cli_main(self, tmp_path, capsys):
        d, sigs = _make_corpus(tmp_path, [8000, 8000, 12000])
        out = tmp_path / "corpus.npz"
        rc = pipeline.main([str(d), str(out), "--preset", "mfcc13",
                            "--batch", "2"])
        assert rc == 0
        data = np.load(out)
        assert len(data.files) == 3
        for rel in sigs:
            assert data[rel].shape[1] == 13

    def test_rate_mismatch_rejected(self, tmp_path):
        d = tmp_path / "wavs"
        d.mkdir()
        io.write_wav(str(d / "a.wav"), make_signal(8000), 8000)
        import pytest
        with pytest.raises(ValueError, match="resample"):
            list(pipeline.extract_corpus(str(d), MFCC13_HTK))
