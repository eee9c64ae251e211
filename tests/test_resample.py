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


class TestStreamingResampler:
    """Online polyphase: concat(chunks + flush) == offline, exactly."""

    @pytest.mark.parametrize("sr_in,sr_out", RATES)
    def test_exact_vs_offline(self, sr_in, sr_out):
        n = sr_in // 2 + 137
        sig = make_signal(n, seed=sr_in % 89)
        want = np.asarray(resample.resample(sig, sr_in, sr_out))
        sr = resample.StreamingResampler(sr_in, sr_out)
        outs, i = [], 0
        for step in [160, 1, 1601, 7, n]:          # ragged chunk plan
            step = min(step, n - i)
            outs.append(np.asarray(sr.process(sig[None, i:i + step])))
            i += step
            if i == n:
                break
        outs.append(np.asarray(sr.flush()))
        got = np.concatenate(outs, axis=1)[0]
        assert got.shape == want.shape
        if max(sr.p, sr.q) <= 8:
            # small-filter pairs: bit-exact (same per-row contraction)
            np.testing.assert_array_equal(got, want)
        else:
            # 44.1 kHz-family pairs (L ~ thousands): XLA picks different
            # dot strategies for different M, so accumulation order can
            # differ by a couple of ULP — documented in the class docstring
            np.testing.assert_allclose(got, want, atol=3e-7, rtol=4e-6)

    def test_chunk_plan_invariance_batched(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((3, 24000)).astype(np.float32)
        want = np.asarray(resample.resample(x, 48000, 16000))
        sr = resample.StreamingResampler(48000, 16000, batch_size=3)
        outs = [np.asarray(sr.process(x[:, i:i + 1536]))
                for i in range(0, 24000, 1536)]
        outs.append(np.asarray(sr.flush()))
        np.testing.assert_array_equal(np.concatenate(outs, axis=1), want)

    def test_state_roundtrip(self):
        sig = make_signal(9000, seed=3)
        a = resample.StreamingResampler(44100, 16000)
        a.process(sig[None, :4000])
        s = a.state()
        b = resample.StreamingResampler(44100, 16000)
        b.set_state(s)
        ya = np.concatenate(
            [np.asarray(a.process(sig[None, 4000:])),
             np.asarray(a.flush())], axis=1)
        yb = np.concatenate(
            [np.asarray(b.process(sig[None, 4000:])),
             np.asarray(b.flush())], axis=1)
        np.testing.assert_array_equal(ya, yb)

    def test_passthrough_and_validation(self):
        sr = resample.StreamingResampler(16000, 16000)
        x = make_signal(1000, seed=1)[None]
        np.testing.assert_array_equal(np.asarray(sr.process(x)), x)
        assert np.asarray(sr.flush()).shape == (1, 0)
        with pytest.raises(ValueError):
            resample.StreamingResampler(44100, 44101)
        sr2 = resample.StreamingResampler(48000, 16000, batch_size=2)
        with pytest.raises(ValueError):
            sr2.process(np.zeros((3, 100), np.float32))

    def test_empty_stream_flush(self):
        sr = resample.StreamingResampler(48000, 16000)
        assert np.asarray(sr.flush()).shape == (1, 0)
        sr.reset()
        out = np.concatenate(
            [np.asarray(sr.process(np.zeros((1, 30), np.float32))),
             np.asarray(sr.flush())], axis=1)
        assert out.shape == (1, resample.output_length(30, 1, 3))
        np.testing.assert_array_equal(out, 0.0)


class TestStreamingResamplerProperties:
    from hypothesis import given, settings, strategies as st

    @pytest.mark.slow  # ~49 s fuzz; TestStreamingResampler::test_exact_vs_offline covers fixed plans in the default tier
    @given(data=st.data(),
           pair=st.sampled_from([(8000, 16000), (48000, 16000),
                                 (16000, 8000), (22050, 16000)]),
           n=st.integers(min_value=1, max_value=12000))
    @settings(max_examples=20, deadline=None)
    def test_any_chunk_plan_matches_offline(self, data, pair, n):
        sr_in, sr_out = pair
        rng = np.random.default_rng(n)
        sig = rng.standard_normal((1, n)).astype(np.float32)
        want = np.asarray(resample.resample(sig, sr_in, sr_out))
        sr = resample.StreamingResampler(sr_in, sr_out)
        outs, i = [], 0
        while i < n:
            step = data.draw(self.st.integers(1, n - i))
            outs.append(np.asarray(sr.process(sig[:, i:i + step])))
            i += step
        outs.append(np.asarray(sr.flush()))
        got = np.concatenate(outs, axis=1)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-7,
                                   rtol=4e-6)
