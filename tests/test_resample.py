"""Polyphase MXU resampler vs scipy.signal.resample_poly (the CPU oracle)."""

import numpy as np
import pytest
import scipy.signal

from tpufeat import resampling as resample

from conftest import make_signal


RATES = [(8000, 16000), (16000, 8000), (48000, 16000), (44100, 16000),
         (22050, 16000), (16000, 22050)]


class TestResample:
    @pytest.mark.parametrize("sr_in,sr_out", RATES)
    def test_matches_scipy(self, sr_in, sr_out):
        import math
        n = sr_in // 2 + 137                      # ~0.5 s, awkward length
        sig = make_signal(n, seed=sr_in % 97)
        got = np.asarray(resample.resample(sig, sr_in, sr_out))
        g = math.gcd(sr_in, sr_out)
        want = scipy.signal.resample_poly(
            sig.astype(np.float64), sr_out // g, sr_in // g)
        assert got.shape == want.shape
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 2e-5

    def test_batched(self):
        sigs = np.stack([make_signal(8000, seed=1), make_signal(8000, seed=2)])
        got = np.asarray(resample.resample(sigs, 8000, 16000))
        assert got.shape == (2, 16000)
        for b in range(2):
            want = scipy.signal.resample_poly(
                sigs[b].astype(np.float64), 2, 1)
            assert np.abs(got[b] - want).max() < 2e-5

    def test_identity(self):
        sig = make_signal(1000)
        out = np.asarray(resample.resample(sig, 16000, 16000))
        np.testing.assert_array_equal(out, sig)

    def test_tone_preserved(self):
        """A 440 Hz tone resampled 48k -> 16k keeps its frequency and
        amplitude (interior samples, away from filter edges)."""
        t = np.arange(48000) / 48000.0
        sig = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        got = np.asarray(resample.resample(sig, 48000, 16000))
        t2 = np.arange(len(got)) / 16000.0
        want = np.sin(2 * np.pi * 440.0 * t2)
        assert np.abs(got[200:-200] - want[200:-200]).max() < 1e-3

    def test_output_length_formula(self):
        for n in (1, 7, 160, 16000, 44100):
            assert resample.output_length(n, 2, 1) == 2 * n
            assert resample.output_length(n, 160, 441) == -(-n * 160 // 441)

    def test_pathological_rates_rejected(self):
        with pytest.raises(ValueError, match="intermediate"):
            resample.resample(np.zeros(100, np.float32), 44101, 16000)

    def test_end_to_end_features(self):
        """8 kHz audio -> resample -> extract: the full migration path for
        non-16k corpora."""
        from tpufeat import features
        from tpufeat.config import MFCC13_HTK
        sig8k = make_signal(8000, seed=9)
        sig16 = resample.resample(sig8k, 8000, 16000)
        res = features.extract(sig16, cfg=MFCC13_HTK)
        assert res.features.shape == (MFCC13_HTK.num_frames(16000), 13)
        assert np.isfinite(np.asarray(res.features)).all()
