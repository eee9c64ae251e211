"""Multi-channel front-end tests (tpufeat/beamform.py): GCC-PHAT TDOA +
steered delay-and-sum vs the float64 goldens and synthetic geometry."""

import numpy as np
import pytest

from tpufeat import beamform as bf
from tpufeat import io
from tpufeat.reference import cpu as golden


def _frac_shift(sig, d, n):
    """Delay ``sig`` by ``d`` samples (fractional ok) -> first n."""
    p = 1
    while p < len(sig):
        p *= 2
    X = np.fft.rfft(sig, n=p)
    k = np.arange(p // 2 + 1)
    return np.fft.irfft(X * np.exp(-2j * np.pi * k * d / p), n=p)[:n]


def _array(delays, n=8000, noise=0.05, seed=0):
    r = np.random.default_rng(seed)
    clean = r.standard_normal(n + 256)
    x = np.stack([_frac_shift(clean, d, n)
                  + noise * r.standard_normal(n) for d in delays])
    return x.astype(np.float32), clean


class TestGccPhat:
    def test_recovers_integer_and_fractional_delays(self):
        delays = [0.0, 3.0, -5.0, 7.5, -2.25]
        x, _ = _array(delays)
        d = np.asarray(bf.gcc_phat(x, max_delay=32))
        np.testing.assert_allclose(d, delays, atol=0.3)
        assert d[0] == 0.0

    def test_matches_golden(self):
        x, _ = _array([0.0, 4.0, -6.0])
        for sub in (True, False):
            got = np.asarray(bf.gcc_phat(x, max_delay=24, subsample=sub))
            want = golden.gcc_phat(x, 24, subsample=sub)
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_no_subsample_is_integer(self):
        x, _ = _array([0.0, 7.5])
        d = np.asarray(bf.gcc_phat(x, max_delay=16, subsample=False))
        np.testing.assert_array_equal(d, np.round(d))
        assert abs(d[1] - 7.5) <= 0.5

    def test_ref_channel(self):
        x, _ = _array([0.0, 3.0, -5.0])
        d = np.asarray(bf.gcc_phat(x, max_delay=16, ref=1))
        assert d[1] == 0.0
        np.testing.assert_allclose(d, [-3.0, 0.0, -8.0], atol=0.3)

    def test_batched_matches_single(self):
        xa, _ = _array([0.0, 4.0], seed=1)
        xb, _ = _array([0.0, -9.0], seed=2)
        batch = np.stack([xa, xb])
        d = np.asarray(bf.gcc_phat(batch, max_delay=16))
        np.testing.assert_allclose(
            d[0], np.asarray(bf.gcc_phat(xa, max_delay=16)), atol=1e-6)
        np.testing.assert_allclose(
            d[1], np.asarray(bf.gcc_phat(xb, max_delay=16)), atol=1e-6)

    def test_lengths_mask(self):
        xa, _ = _array([0.0, 4.0], n=6000, seed=3)
        pad = np.concatenate(
            [xa, 9.0 * np.ones((2, 2000), np.float32)], axis=1)
        d = np.asarray(bf.gcc_phat(pad[None], max_delay=16,
                                   lengths=np.array([6000])))[0]
        np.testing.assert_allclose(
            d, np.asarray(bf.gcc_phat(xa, max_delay=16)), atol=0.05)

    def test_validation(self):
        x, _ = _array([0.0, 1.0])
        with pytest.raises(ValueError, match="channels"):
            bf.gcc_phat(x[:1])
        with pytest.raises(ValueError, match="max_delay"):
            bf.gcc_phat(x, max_delay=0)
        with pytest.raises(ValueError, match="ref"):
            bf.gcc_phat(x, max_delay=8, ref=5)
        with pytest.raises(ValueError, match="expected"):
            bf.gcc_phat(np.zeros((2, 2, 2, 2), np.float32))


class TestSteerAndSum:
    def test_steer_inverts_known_shift(self):
        x, clean = _array([0.0, 6.0], noise=0.0)
        y = np.asarray(bf.steer(x, np.array([0.0, 6.0])))
        ref = _frac_shift(clean, 0.0, x.shape[1])
        # interior samples realign exactly (edges wrap the FFT pad)
        np.testing.assert_allclose(y[1, 100:-100], ref[100:-100],
                                   atol=1e-3)

    def test_delay_and_sum_vs_golden(self):
        x, _ = _array([0.0, 3.0, -5.0, 7.5])
        y, d = bf.delay_and_sum(x, max_delay=32)
        want = golden.delay_and_sum(x, 32)
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)
        assert np.asarray(y).shape == (x.shape[1],)
        assert np.asarray(d).shape == (4,)

    def test_snr_improves_over_naive_mean(self):
        x, clean = _array([0.0, 3.0, -5.0, 7.5], noise=0.05, seed=4)
        y, _ = bf.delay_and_sum(x, max_delay=32)
        ref = _frac_shift(clean, 0.0, x.shape[1])
        err_bf = np.linalg.norm(np.asarray(y) - ref)
        err_naive = np.linalg.norm(x.mean(axis=0) - ref)
        assert err_bf < 0.2 * err_naive

    def test_weights(self):
        x, _ = _array([0.0, 2.0], noise=0.0, seed=5)
        y1, d = bf.delay_and_sum(x, max_delay=8,
                                 weights=np.array([1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(y1), x[0], atol=1e-5)
        with pytest.raises(ValueError, match="weights"):
            bf.delay_and_sum(x, max_delay=8, weights=np.ones(3))
        with pytest.raises(ValueError, match="sum"):
            bf.delay_and_sum(x, max_delay=8,
                             weights=np.array([0.0, 0.0]))

    def test_batched(self):
        xa, _ = _array([0.0, 4.0], seed=6)
        xb, _ = _array([0.0, -7.0], seed=7)
        y, d = bf.delay_and_sum(np.stack([xa, xb]), max_delay=16)
        ya, _ = bf.delay_and_sum(xa, max_delay=16)
        np.testing.assert_allclose(np.asarray(y)[0], np.asarray(ya),
                                   atol=1e-5)
        assert np.asarray(d).shape == (2, 2)

    def test_feeds_extract(self):
        from tpufeat import extract, MFCC13_HTK
        x, _ = _array([0.0, 3.0], n=16000, seed=8)
        y, _ = bf.delay_and_sum(x, max_delay=16)
        feats = extract(np.asarray(y), cfg=MFCC13_HTK).features
        assert feats.shape == (98, 13)
        assert np.isfinite(np.asarray(feats)).all()


class TestMultiChannelIO:
    def test_read_wav_all_channels(self, tmp_path):
        r = np.random.default_rng(9)
        stereo = (0.1 * r.standard_normal((2, 4000))).astype(np.float32)
        p = str(tmp_path / "st.wav")
        io.write_wav(p, stereo.T, 16000)      # interleaved on disk
        x, rate = io.read_wav(p, channel="all")
        assert rate == 16000 and x.shape == (2, 4000)
        c0, _ = io.read_wav(p, channel=0)
        np.testing.assert_array_equal(x[0], c0)
        mono, _ = io.read_wav(p)
        np.testing.assert_allclose(x.mean(axis=0), mono, atol=1e-7)
