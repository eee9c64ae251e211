"""Unit tests for DSP constant matrices vs scipy / closed form (SURVEY.md §4)."""

import numpy as np
import scipy.fft
import scipy.signal
import pytest

from tpufeat import matrices


class TestWindow:
    def test_hamming_matches_scipy(self):
        w = matrices.window("hamming", 400)
        ref = scipy.signal.get_window("hamming", 400, fftbins=False)
        np.testing.assert_allclose(w, ref, atol=1e-12)

    def test_hann_periodic_matches_scipy(self):
        w = matrices.window("hann_periodic", 400)
        ref = scipy.signal.get_window("hann", 400, fftbins=True)
        np.testing.assert_allclose(w, ref, atol=1e-12)

    def test_hamming_closed_form(self):
        w = matrices.window("hamming", 400)
        assert w[0] == pytest.approx(0.08)
        assert w[399] == pytest.approx(0.08)
        # symmetric
        np.testing.assert_allclose(w, w[::-1], atol=1e-15)

    def test_povey(self):
        hann_sym = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(400) / 399)
        np.testing.assert_allclose(
            matrices.window("povey", 400), hann_sym**0.85, atol=1e-12)


class TestMelScale:
    def test_htk_roundtrip_and_anchor(self):
        f = np.array([0.0, 700.0, 1000.0, 4000.0, 8000.0])
        m = matrices.hz_to_mel(f, "htk")
        np.testing.assert_allclose(matrices.mel_to_hz(m, "htk"), f, rtol=1e-12)
        assert m[1] == pytest.approx(2595.0 * np.log10(2.0))

    def test_slaney_roundtrip_and_linearity(self):
        f = np.array([0.0, 500.0, 999.0, 1000.0, 3000.0, 8000.0])
        m = matrices.hz_to_mel(f, "slaney")
        np.testing.assert_allclose(matrices.mel_to_hz(m, "slaney"), f, rtol=1e-10)
        # linear below 1 kHz: mel = f * 3/200
        np.testing.assert_allclose(m[:3], f[:3] * 3.0 / 200.0, rtol=1e-12)
        assert m[3] == pytest.approx(15.0)


class TestMelFilterbank:
    def test_htk_bin_shape_and_partition(self):
        fb = matrices.mel_filterbank(16000, 512, 26, 0.0, 8000.0, "htk", None, "bin")
        assert fb.shape == (257, 26)
        assert fb.min() >= 0.0
        assert fb.max() <= 1.0
        # every filter has nonzero area
        assert (fb.sum(axis=0) > 0).all()

    def test_slaney_continuous_matches_librosa_semantics(self):
        """Cross-check the continuous/Slaney filterbank against an
        independent direct construction at exact bin frequencies."""
        sr, n_fft, n_mels = 16000, 400, 80
        fb = matrices.mel_filterbank(
            sr, n_fft, n_mels, 0.0, 8000.0, "slaney", "slaney", "continuous")
        assert fb.shape == (201, 80)
        mel_pts = np.linspace(
            matrices.hz_to_mel(0.0, "slaney"),
            matrices.hz_to_mel(8000.0, "slaney"), n_mels + 2)
        hz = matrices.mel_to_hz(mel_pts, "slaney")
        freqs = np.arange(201) * sr / n_fft
        for m in (0, 40, 79):
            tri = np.maximum(0, np.minimum(
                (freqs - hz[m]) / (hz[m + 1] - hz[m]),
                (hz[m + 2] - freqs) / (hz[m + 2] - hz[m + 1])))
            tri *= 2.0 / (hz[m + 2] - hz[m])
            np.testing.assert_allclose(fb[:, m], tri, atol=1e-12)

    def test_whisper_filterbank_known_values(self):
        """Anchor a few entries against values computed from the published
        Whisper mel_filters algorithm (librosa.filters.mel, slaney/slaney)."""
        fb = matrices.mel_filterbank(
            16000, 400, 80, 0.0, 8000.0, "slaney", "slaney", "continuous")
        # filter 0 peaks at the second mel point; row sums are O(1e-2)
        col0 = fb[:, 0]
        assert col0[0] == pytest.approx(0.0)
        assert col0.max() > 0
        # Slaney normalization: each filter integrates (sum * df) to ~1
        df = 16000 / 400
        areas = fb.sum(axis=0) * df
        np.testing.assert_allclose(areas, np.ones(80), rtol=0.15)


class TestDCT:
    def test_matches_scipy_ortho(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((7, 26))
        d = matrices.dct_matrix(26, 13)
        ref = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)[:, :13]
        np.testing.assert_allclose(x @ d, ref, atol=1e-12)

    def test_orthonormal_rows(self):
        d = matrices.dct_matrix(26, 26)
        np.testing.assert_allclose(d.T @ d, np.eye(26), atol=1e-12)


class TestLifter:
    def test_values(self):
        v = matrices.lifter_vector(13, 22)
        assert v[0] == pytest.approx(1.0)
        assert v[1] == pytest.approx(1.0 + 11.0 * np.sin(np.pi / 22.0))
        assert matrices.lifter_vector(13, 0).tolist() == [1.0] * 13


class TestDFTMatrices:
    @pytest.mark.parametrize("fl,n_fft,win", [(400, 512, "hamming"),
                                              (400, 400, "hann_periodic")])
    def test_gemm_dft_matches_rfft(self, fl, n_fft, win):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((5, fl))
        c, s = matrices.dft_matrices(fl, n_fft, win)
        w = matrices.window(win, fl)
        ref = np.fft.rfft(x * w, n=n_fft, axis=-1)
        np.testing.assert_allclose(x @ c, ref.real, atol=1e-9)
        np.testing.assert_allclose(x @ s, ref.imag, atol=1e-9)


class TestVTLN:
    """Vocal-tract-length normalization (matrices.vtln_warp_freq,
    Kaldi-convention piecewise-linear warp; beyond-reference)."""

    def test_identity_at_warp_one(self):
        base = matrices.mel_filterbank(16000, 512, 26, 0.0, 8000.0)
        one = matrices.mel_filterbank(16000, 512, 26, 0.0, 8000.0,
                                      vtln_warp=1.0)
        np.testing.assert_array_equal(base, one)

    @pytest.mark.parametrize("w", [0.8, 0.9, 1.1, 1.25])
    def test_warp_function_shape(self, w):
        low, high, vl, vh = 20.0, 8000.0, 100.0, 7200.0
        f = np.linspace(low, high, 20001)
        g = matrices.vtln_warp_freq(f, low, high, vl, vh, w)
        # endpoints fixed, monotone, continuous (bounded increments)
        assert g[0] == low and g[-1] == high
        d = np.diff(g)
        assert np.all(d > 0)
        assert d.max() < (f[1] - f[0]) * 6
        # mid band is a pure 1/w scaling
        l, h = vl * max(1.0, w), vh * min(1.0, w)
        mid = (f >= l) & (f < h)
        np.testing.assert_allclose(g[mid], f[mid] / w, rtol=1e-12)
        # outside [low, high]: pass-through
        assert matrices.vtln_warp_freq(high + 50.0, low, high, vl, vh,
                                       w) == high + 50.0

    def test_bad_cutoffs_and_warps_raise(self):
        from tpufeat.config import FeatureConfig
        with pytest.raises(ValueError):
            matrices.vtln_warp_freq(500.0, 0.0, 8000.0, 100.0, 9000.0, 1.1)
        with pytest.raises(ValueError):
            matrices.vtln_warp_freq(500.0, 0.0, 8000.0, 100.0, 7500.0, 0.0)
        with pytest.raises(ValueError):
            FeatureConfig(vtln_warp=0.1)     # outside [0.25, 4]
        # warp pushes the scaled lower cutoff past the upper one
        with pytest.raises(ValueError):
            FeatureConfig(vtln_warp=1.2, vtln_low=3000.0,
                          vtln_high=-4500.0)

    @pytest.mark.parametrize("w", [0.9, 1.1])
    def test_tone_shift_equivalence(self, w):
        """Warped filterbank response at frequency f equals the unwarped
        response at w*f (both in the pure-scaling mid band): VTLN's
        defining property, checked through the built matrices on a dense
        FFT grid (continuous triangles, no Slaney norm)."""
        sr, nfft = 16000, 8192
        fb0 = matrices.mel_filterbank(sr, nfft, 40, 0.0, 8000.0,
                                      bin_style="continuous")
        fbw = matrices.mel_filterbank(sr, nfft, 40, 0.0, 8000.0,
                                      bin_style="continuous", vtln_warp=w)
        for f0 in (600.0, 1200.0, 2400.0, 4000.0):
            kw = round(f0 * nfft / sr)
            k0 = round(w * f0 * nfft / sr)
            np.testing.assert_allclose(fbw[kw], fb0[k0], atol=0.04)

    def test_extract_parity_and_effect(self):
        """Warped config through the jitted pipeline vs the f64 golden;
        and the warp measurably moves energy across filters."""
        import dataclasses
        from tpufeat import features
        from tpufeat.config import FBANK80
        from tpufeat.reference import cpu as gold
        t = np.arange(8000) / 16000.0
        # tone + low noise floor: keeps every mel bin well above the
        # 1e-10 log floor (pure tones hit the documented near-floor
        # amplification, BASELINE.md closure notes)
        sig = (0.5 * np.sin(2 * np.pi * 1500.0 * t)
               + 1e-2 * np.random.default_rng(3).standard_normal(8000)
               ).astype(np.float32)
        cfg = dataclasses.replace(FBANK80, vtln_warp=1.1)
        got = np.asarray(features.extract(sig, cfg=cfg).features)
        want = gold.extract(sig.astype(np.float64), cfg)
        assert np.abs(got - want).max() < 1e-3
        un = gold.extract(sig.astype(np.float64), FBANK80)
        assert np.argmax(want[5]) != np.argmax(un[5])


class TestGammatoneERB:
    """ERB-rate scale + gammatone magnitude bank (preset gfcc13)."""

    def test_erb_scale_invertible_and_known_point(self):
        f = np.linspace(20, 8000, 200)
        np.testing.assert_allclose(
            matrices.mel_to_hz(matrices.hz_to_mel(f, "erb"), "erb"), f,
            rtol=1e-10)
        # Glasberg & Moore: E(1 kHz) = 21.4 log10(1 + 4.37) ~ 15.59
        assert abs(matrices.hz_to_mel(1000.0, "erb") - 15.621) < 1e-2
        assert (np.diff(matrices.hz_to_mel(f, "erb")) > 0).all()

    def test_gammatone_bank_shape_and_peaks(self):
        fb = matrices.mel_filterbank(16000, 512, 64, 50.0, 8000.0,
                                     "erb", None, "gammatone")
        assert fb.shape == (257, 64)
        # unit peak AT the center frequency; on the 31.25 Hz FFT bin
        # grid the narrowest (lowest) |H|^2 filters peak between bins
        assert fb.max(axis=0).min() > 0.4
        assert fb.max(axis=0)[12:].min() > 0.8   # wider filters hit it
        assert fb.max() <= 1.0 + 1e-12
        # |H|^2 semantics: at f = fc +- b the power response is 2^-4
        pts = np.linspace(matrices.hz_to_mel(50.0, "erb"),
                          matrices.hz_to_mel(8000.0, "erb"), 66)
        fc = matrices.mel_to_hz(pts[1:-1], "erb")
        b = 1.019 * 24.7 * (4.37 * fc / 1000.0 + 1.0)
        fft_freqs = np.arange(257) * 16000 / 512
        m = 40                          # a filter wide enough to sample
        k = np.argmin(np.abs(fft_freqs - (fc[m] + b[m])))
        assert abs(fb[k, m] - 2.0 ** -4) < 0.02

    def test_gfcc_extract_matches_golden_all_paths(self):
        import dataclasses
        import jax.numpy as jnp
        from tpufeat import features
        from tpufeat.config import GFCC13
        from tpufeat.reference import cpu
        from conftest import make_signal
        sig = make_signal(12000, seed=31)
        want = cpu.extract(sig.astype(np.float64), GFCC13)
        got = np.asarray(features.extract(sig, cfg=GFCC13).features)
        assert got.shape[1] == 13
        np.testing.assert_allclose(got, want, atol=5e-5)
        fused = dataclasses.replace(GFCC13, use_pallas=True,
                                    gemm_dft=True, fused_framing=True)
        got2 = np.asarray(features.extract(sig, cfg=fused).features)
        np.testing.assert_allclose(got2, want, atol=5e-5)

    def test_gfcc_streams_bit_exact(self):
        from tpufeat import streaming
        from tpufeat.config import GFCC13
        from conftest import make_signal
        sig = make_signal(8000, seed=32)
        want = np.asarray(streaming.extract_scan(sig[None], GFCC13))
        fe = streaming.StreamingFrontend(GFCC13, batch_size=1)
        outs = [np.asarray(fe.process(sig[None, i:i + 1600])[0])
                for i in range(0, 8000, 1600)]
        got = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(got, want[:, :got.shape[1]])

    def test_validation(self):
        with pytest.raises(ValueError, match="bin_style"):
            matrices.mel_filterbank(16000, 512, 26, 0.0, 8000.0,
                                    "htk", None, "nope")
        from tpufeat.config import FeatureConfig
        with pytest.raises(ValueError, match="mel_scale"):
            FeatureConfig(mel_scale="bark")
