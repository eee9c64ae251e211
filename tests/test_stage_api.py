"""Stage-level public API parity vs golden (reference API: wav in ->
frames/spectra/mel/MFCC out, BASELINE.json:north_star)."""

import numpy as np

import tpufeat
from tpufeat import matrices
from tpufeat.config import MFCC13_HTK, WHISPER80
from tpufeat.reference import cpu

from conftest import make_signal


class TestStageAPI:
    def test_frames(self):
        sig = make_signal(4000, seed=140)
        f, mask = tpufeat.frames(sig)
        gold = cpu.frame_signal(
            cpu.preemphasis(sig.astype(np.float64), 0.97), MFCC13_HTK)
        gold = gold * matrices.window("hamming", 400)
        assert f.shape == gold.shape == (23, 400)
        assert np.abs(np.asarray(f) - gold).max() < 1e-6

    def test_spectrogram(self):
        sig = make_signal(4000, seed=141)
        s, _ = tpufeat.spectrogram(sig)
        gold = cpu.spectrogram(sig.astype(np.float64), MFCC13_HTK)
        assert s.shape == (23, 257)
        assert np.abs(np.asarray(s) - gold).max() / gold.max() < 1e-5

    def test_mel_and_logmel(self):
        sig = make_signal(4000, seed=142)
        m, _ = tpufeat.mel_spectrogram(sig)
        lm, _ = tpufeat.logmel(sig)
        assert m.shape == lm.shape == (23, 26)
        gold = cpu.logmel(sig.astype(np.float64), MFCC13_HTK)
        assert np.abs(np.asarray(lm) - gold).max() < 1e-3
        np.testing.assert_allclose(
            np.log(np.maximum(np.asarray(m), 1e-10)), np.asarray(lm),
            atol=1e-5)

    def test_mfcc(self):
        sig = make_signal(4000, seed=143)
        c, mask = tpufeat.mfcc(sig)
        gold = cpu.mfcc(sig.astype(np.float64), MFCC13_HTK)
        assert c.shape == (23, 13)
        assert np.abs(np.asarray(c) - gold).max() < 1e-3

    def test_batched_whisper_logmel(self):
        sigs = [make_signal(8000, seed=144), make_signal(5000, seed=145)]
        n = max(len(s) for s in sigs)
        x = np.zeros((2, n), np.float32)
        for b, s in enumerate(sigs):
            x[b, : len(s)] = s
        lm, mask = tpufeat.logmel(x, np.array([len(s) for s in sigs]),
                                  WHISPER80)
        for b, s in enumerate(sigs):
            gold = cpu.logmel(s.astype(np.float64), WHISPER80)
            got = np.asarray(lm[b])[np.asarray(mask[b])]
            assert np.abs(got - gold).max() < 2e-5
