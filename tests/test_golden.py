"""Self-checks of the float64 golden pipeline (SURVEY.md §4 "Unit"/"Property").

The golden is the oracle for everything else, so it gets its own independent
validation: radix-2 FFT vs np.fft, framing formula, Parseval energy
conservation, and stage algebra."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tpufeat import matrices
from tpufeat.config import FeatureConfig, KALDI39, MFCC13_HTK, WHISPER80
from tpufeat.reference import cpu

from conftest import make_signal


class TestRadix2FFT:
    @pytest.mark.parametrize("n", [2, 8, 512, 1024])
    def test_matches_numpy(self, n):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        np.testing.assert_allclose(cpu.radix2_fft(x), np.fft.fft(x),
                                   atol=1e-9, rtol=1e-9)

    def test_batched(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((6, 512))
        np.testing.assert_allclose(cpu.radix2_fft(x), np.fft.fft(x, axis=-1),
                                   atol=1e-9)

    def test_rejects_non_pow2(self):
        with pytest.raises(ValueError):
            cpu.radix2_fft(np.zeros(400))


class TestPreemphasis:
    def test_formula(self):
        x = np.array([1.0, 2.0, 3.0])
        y = cpu.preemphasis(x, 0.97)
        np.testing.assert_allclose(y, [1.0, 2.0 - 0.97, 3.0 - 1.94])

    def test_prev_carry(self):
        x = np.arange(10, dtype=np.float64)
        whole = cpu.preemphasis(x, 0.97)
        head = cpu.preemphasis(x[:4], 0.97)
        tail = cpu.preemphasis(x[4:], 0.97, prev=x[3])
        np.testing.assert_allclose(np.concatenate([head, tail]), whole)


class TestFraming:
    def test_snip_edges_count(self):
        cfg = MFCC13_HTK
        for n in [400, 401, 559, 560, 561, 16000]:
            f = cpu.frame_signal(np.arange(n, dtype=float), cfg)
            assert f.shape == (1 + (n - 400) // 160, 400)

    def test_frame_content(self):
        cfg = MFCC13_HTK
        x = np.arange(1000, dtype=float)
        f = cpu.frame_signal(x, cfg)
        np.testing.assert_array_equal(f[0], x[:400])
        np.testing.assert_array_equal(f[2], x[320:720])

    def test_centered_whisper_count(self):
        # Whisper: N//hop frames after dropping the last
        f = cpu.frame_signal(np.zeros(16000), WHISPER80)
        assert f.shape == (100, 400)

    def test_centered_reflect(self):
        x = np.arange(1000, dtype=float)
        f = cpu.frame_signal(x, WHISPER80)
        # first frame starts at -200: reflect means x[200], x[199], ..., x[1],
        # x[0], x[1], ...
        assert f[0][0] == 200.0
        assert f[0][199] == 1.0
        assert f[0][200] == 0.0
        assert f[0][201] == 1.0

    @given(n=st.integers(min_value=400, max_value=20000))
    @settings(max_examples=20, deadline=None)
    def test_count_property(self, n):
        cfg = MFCC13_HTK
        f = cpu.frame_signal(np.zeros(n), cfg)
        assert f.shape[0] == cfg.num_frames(n)


class TestSpectrogram:
    def test_parseval(self):
        """Energy conservation through the FFT: sum|X|^2 = N*sum|x|^2 for the
        zero-padded windowed frame."""
        cfg = FeatureConfig(preemphasis=0.0, window="rect")
        x = make_signal(4000, seed=5).astype(np.float64)
        frames = cpu.frame_signal(x, cfg)
        spec = cpu.spectrogram(x, cfg)
        # rFFT halves the spectrum: reconstruct full-energy sum
        full = 2 * spec.sum(axis=-1) - spec[:, 0] - spec[:, -1]
        np.testing.assert_allclose(
            full, cfg.n_fft * (frames**2).sum(axis=-1), rtol=1e-10)

    def test_dc_bin(self):
        cfg = FeatureConfig(preemphasis=0.0, window="rect")
        x = np.ones(400)
        spec = cpu.spectrogram(x, cfg)
        assert spec[0, 0] == pytest.approx(400.0**2)


class TestStages:
    def test_mfcc_shape_and_composition(self):
        x = make_signal(16000).astype(np.float64)
        out = cpu.mfcc(x, MFCC13_HTK)
        assert out.shape == (98, 13)
        lm = cpu.logmel(x, MFCC13_HTK)
        np.testing.assert_allclose(
            out, lm @ matrices.dct_matrix(26, 13), atol=1e-12)

    def test_whisper_range(self):
        x = make_signal(16000, seed=7).astype(np.float64)
        lm = cpu.logmel(x, WHISPER80)
        assert lm.shape == (100, 80)
        # after (x+4)/4 normalization, whisper features live in ~[-1, 2.5]
        assert lm.min() >= (lm.max() - 8.0 + 4.0) / 4.0 - 1e-12
        assert lm.max() < 3.0

    def test_deltas_constant_is_zero(self):
        feat = np.ones((10, 13))
        np.testing.assert_allclose(cpu.deltas(feat), 0.0, atol=1e-15)

    def test_deltas_linear_ramp(self):
        # linear ramp c_t = t -> delta = 1 everywhere (with edge replication
        # distorting only the first/last 2 frames)
        feat = np.arange(20, dtype=float).reshape(-1, 1)
        d = cpu.deltas(feat, 2)
        np.testing.assert_allclose(d[2:-2], 1.0, atol=1e-12)

    def test_cmvn(self):
        rng = np.random.default_rng(8)
        feat = rng.standard_normal((50, 13)) * 3 + 5
        out = cpu.cmvn(feat, "meanvar")
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-10)
        np.testing.assert_allclose(out.var(axis=0), 1.0, rtol=1e-6)

    def test_extract_kaldi39(self):
        x = make_signal(8000, seed=9).astype(np.float64)
        out = cpu.extract(x, KALDI39)
        assert out.shape == (48, 39)
        # CMVN applied across the whole 39-dim vector
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-10)

    def test_kaldi_mode_per_frame(self):
        cfg = FeatureConfig(kaldi_mode=True, dc_offset=True, window="povey")
        x = make_signal(4000, seed=10).astype(np.float64)
        out = cpu.mfcc(x, cfg)
        assert out.shape == (23, 13)
        assert np.isfinite(out).all()
