"""Three-way golden parity (SURVEY.md §4): C++ native golden vs NumPy
float64 golden vs the JAX pipeline, and the native vs Python WAV decoders."""

import numpy as np
import pytest

from tpufeat import cpp_golden, features, io
from tpufeat.config import MFCC13_HTK, FeatureConfig
from tpufeat.reference import cpu

from conftest import make_signal

pytestmark = pytest.mark.skipif(
    not cpp_golden.available(), reason="C++ golden failed to build")


class TestThreeWayParity:
    def test_cpp_vs_numpy_golden(self):
        """Two independent float64 implementations (C++ radix-2 FFT vs
        np.fft) must agree to near machine epsilon."""
        sig = make_signal(16000, seed=60).astype(np.float64)
        a = cpp_golden.mfcc_native(sig, MFCC13_HTK)
        b = cpu.mfcc(sig, MFCC13_HTK)
        assert a.shape == b.shape == (98, 13)
        assert np.abs(a - b).max() < 1e-9

    def test_cpp_vs_tpu_path(self):
        sig = make_signal(8000, seed=61)
        a = cpp_golden.mfcc_native(sig.astype(np.float64), MFCC13_HTK)
        b = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        assert np.abs(a - b).max() < 1e-3

    def test_vtln_three_way(self):
        """VTLN-warped filterbank: the C++ golden builds its own
        triangles AND its own warp function, so agreement at 1e-9 checks
        the Kaldi piecewise-linear warp construction independently."""
        import dataclasses
        for w in (0.85, 1.15):
            cfg = dataclasses.replace(MFCC13_HTK, vtln_warp=w)
            sig = make_signal(8000, seed=63).astype(np.float64)
            a = cpp_golden.mfcc_native(sig, cfg)
            b = cpu.mfcc(sig, cfg)
            assert np.abs(a - b).max() < 1e-9
            c = np.asarray(features.extract(
                sig.astype(np.float32), cfg=cfg).features)
            assert np.abs(a - c).max() < 1e-3
            un = cpp_golden.mfcc_native(sig, MFCC13_HTK)
            assert np.abs(a - un).max() > 1e-3   # the warp does something

    def test_lifter(self):
        cfg = FeatureConfig(lifter=22)
        sig = make_signal(4000, seed=62).astype(np.float64)
        a = cpp_golden.mfcc_native(sig, cfg)
        b = cpu.mfcc(sig, cfg)
        assert np.abs(a - b).max() < 1e-9

    def test_short_signal(self):
        out = cpp_golden.mfcc_native(np.zeros(100), MFCC13_HTK)
        assert out.shape == (0, 13)

    def test_rejects_uncovered_configs(self):
        from tpufeat.config import WHISPER80
        with pytest.raises(ValueError):
            cpp_golden.mfcc_native(np.zeros(1000), WHISPER80)

    def test_plp_cpp_vs_numpy_golden(self):
        """PLP three-way leg 1: C++ double (its own FFT + Durbin) vs the
        NumPy float64 golden (np.fft.ifft autocorrelation + direct scipy
        Toeplitz solves) — three fully independent algorithm choices."""
        from tpufeat.config import PLP13
        sig = make_signal(16000, seed=63).astype(np.float64)
        a = cpp_golden.plp_native(sig, PLP13)
        b = cpu.plp(sig, PLP13)
        assert a.shape == b.shape == (98, 13)
        assert np.abs(a - b).max() < 1e-8

    def test_plp_cpp_vs_tpu_path(self):
        from tpufeat.config import PLP13
        sig = make_signal(8000, seed=64)
        a = cpp_golden.plp_native(sig.astype(np.float64), PLP13)
        b = np.asarray(features.extract(sig, cfg=PLP13).features)
        assert np.abs(a - b).max() < 2e-3

    def test_plp_lifter_and_silence(self):
        import dataclasses
        from tpufeat.config import PLP13
        cfg = dataclasses.replace(PLP13, lifter=22)
        sig = make_signal(4000, seed=65).astype(np.float64)
        assert np.abs(cpp_golden.plp_native(sig, cfg)
                      - cpu.plp(sig, cfg)).max() < 1e-8
        out = cpp_golden.plp_native(np.zeros(4000), PLP13)
        assert np.isfinite(out).all()

    def _pitch_tone(self, f0=140.0, n=12000, seed=7):
        t = np.arange(n) / 16000.0
        r = np.random.default_rng(seed)
        sig = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.03 * np.sin(2 * np.pi * 2 * f0 * t + 0.3)
               + 0.01 * r.standard_normal(n))
        return sig.astype(np.float64)

    @pytest.mark.parametrize("center", [False, True])
    def test_pitch_cpp_vs_numpy_golden(self, center):
        """Pitch three-way leg 1: C++ double (sequential correlation sums
        + its own Viterbi loop) vs the NumPy float64 golden (np.dot
        correlations + plain-Python Viterbi). Identical decisions; NCCF
        to summation-order roundoff."""
        from tpufeat.pitch import PitchConfig
        cfg = PitchConfig(center=center)
        sig = self._pitch_tone()
        chz, cpov = cpp_golden.pitch_native(sig, cfg)
        ghz, gpov = cpu.pitch(sig, cfg)
        assert chz.shape == ghz.shape
        # same Viterbi path; refined hz to near-f64 (the C++ upfirdn
        # resampler and scipy's differ at ~1e-15, which the parabolic
        # delta inherits)
        np.testing.assert_allclose(chz, ghz, rtol=1e-12)
        assert np.abs(cpov - gpov).max() < 1e-10
        # the native-grid audit twin stays bit-exact end to end
        cfg0 = PitchConfig(center=center, lag_rate=0, refine=False)
        np.testing.assert_array_equal(
            cpp_golden.pitch_native(sig, cfg0)[0],
            cpu.pitch(sig, cfg0)[0])

    @pytest.mark.parametrize("pq", [(1, 8), (2, 1), (160, 441)])
    def test_resample_cpp_vs_scipy(self, pq):
        """C++ polyphase golden (own Kaiser/Bessel + upfirdn sum) vs
        scipy resample_poly: same default filter design, f64-tight."""
        from scipy.signal import resample_poly
        p, q = pq
        r = np.random.default_rng(17)
        for n in (16000, 4091):
            x = r.standard_normal(n)
            got = cpp_golden.resample_native(x, p, q)
            ref = resample_poly(x, p, q)
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)

    def test_pitch_cpp_vs_tpu_path(self):
        """Leg 2: C++ double vs the f32 GEMM-NCCF JAX path — same
        decisions on clearly-voiced audio."""
        from tpufeat import pitch
        cfg = pitch.PitchConfig()
        sig = self._pitch_tone(f0=185.0, n=9600, seed=11)
        chz, cpov = cpp_golden.pitch_native(sig, cfg)
        hz, pov, valid = pitch.track(sig.astype(np.float32), cfg=cfg)
        F = int(np.asarray(valid).sum())
        np.testing.assert_allclose(np.asarray(hz)[:F], chz[:F], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pov)[:F], cpov[:F],
                                   rtol=0, atol=1e-4)

    def test_pitch_short_and_silence(self):
        from tpufeat.pitch import PitchConfig
        cfg = PitchConfig()
        hz, pov = cpp_golden.pitch_native(np.zeros(100), cfg)
        assert hz.shape == (0,)
        hz, pov = cpp_golden.pitch_native(np.zeros(4000), cfg)
        assert np.isfinite(hz).all() and np.abs(pov).max() < 0.1


class TestNativeWav:
    def test_matches_python_reader(self, tmp_path):
        sig = make_signal(12345, seed=63)
        path = str(tmp_path / "t.wav")
        io.write_wav(path, sig, 16000)
        a, ra = cpp_golden.read_wav_native(path)
        b, rb = io.read_wav(path, native=False)
        assert ra == rb == 16000
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_stereo_average(self, tmp_path):
        import wave
        sig = make_signal(4000, seed=64)
        path = str(tmp_path / "s.wav")
        pcm = np.clip(np.round(np.stack([sig, sig], 1) * 32768),
                      -32768, 32767).astype("<i2")
        with wave.open(path, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        a, _ = cpp_golden.read_wav_native(path)
        b, _ = io.read_wav(path, native=False)
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_batch_loader(self, tmp_path):
        sigs = [make_signal(4000 + 100 * i, seed=130 + i) for i in range(6)]
        paths = []
        for i, s in enumerate(sigs):
            p = str(tmp_path / f"b{i}.wav")
            io.write_wav(p, s, 16000)
            paths.append(p)
        paths.append(str(tmp_path / "missing.wav"))
        batch, lengths, rates = cpp_golden.read_wav_batch(paths, 8000,
                                                          n_threads=3)
        assert batch.shape == (7, 8000)
        assert lengths[-1] == -1  # missing file reported, not fatal
        for i, s in enumerate(sigs):
            assert lengths[i] == len(s)
            assert rates[i] == 16000
            ref, _ = io.read_wav(paths[i], native=False)
            np.testing.assert_allclose(batch[i, : len(s)], ref, atol=1e-7)
            assert (batch[i, len(s):] == 0).all()

    def test_rejects_garbage(self, tmp_path):
        path = str(tmp_path / "bad.wav")
        with open(path, "wb") as f:
            f.write(b"not a wav file at all")
        with pytest.raises(ValueError):
            cpp_golden.read_wav_native(path)


class TestSlidingCmvnThreeWay:
    @pytest.mark.parametrize("center,norm_vars", [
        (False, False), (False, True), (True, False), (True, True)])
    @pytest.mark.parametrize("T", [5, 80, 400])
    def test_three_way(self, T, center, norm_vars):
        """NumPy f64 golden == C++ double to 1e-12; JAX f32 within 2e-5
        (or 5e-4 variance-normalized at small T; see the one-pass
        cancellation note in test_properties.py)."""
        if not cpp_golden.available():
            pytest.skip("C++ golden not built")
        rng = np.random.default_rng(T)
        f = (rng.standard_normal((T, 7)) * 2 + 1).astype(np.float64)
        a = cpu.sliding_cmvn(f, window=50, min_window=15, center=center,
                             norm_vars=norm_vars)
        b = cpp_golden.sliding_cmvn_native(
            f, window=50, min_window=15, center=center,
            norm_vars=norm_vars)
        np.testing.assert_allclose(a, b, atol=1e-12, rtol=0)
        import jax.numpy as jnp
        from tpufeat import features
        c = features.sliding_cmvn(
            jnp.asarray(f, jnp.float32)[None], None, window=50,
            min_window=15, center=center, norm_vars=norm_vars)[0]
        np.testing.assert_allclose(np.asarray(c), a, atol=5e-4, rtol=0)


class TestOnlineCmvnThreeWay:
    @pytest.mark.parametrize("norm_vars", [False, True])
    @pytest.mark.parametrize("priors", ["none", "both"])
    @pytest.mark.parametrize("T", [5, 80, 400])
    def test_three_way(self, T, priors, norm_vars):
        """Kaldi online2 OnlineCmvn: NumPy f64 golden == C++ double to
        1e-12; JAX f32 within 2e-4 (prior-smoothed short-window means
        amplify f32 rounding at small T)."""
        if not cpp_golden.available():
            pytest.skip("C++ golden not built")
        rng = np.random.default_rng(1000 + T)
        D = 7
        f = (rng.standard_normal((T, D)) * 2 + 1).astype(np.float64)
        spk = glob = None
        if priors == "both":
            s = rng.standard_normal((40, D)) * 1.5 + 0.5
            g = rng.standard_normal((300, D)) * 2 - 0.3
            spk = (40.0, s.sum(0), (s * s).sum(0))
            glob = (300.0, g.sum(0), (g * g).sum(0))
        kw = dict(window=50, speaker_stats=spk, global_stats=glob,
                  speaker_frames=30, global_frames=20, norm_vars=norm_vars)
        a = cpu.online_cmvn(f, **kw)
        b = cpp_golden.online_cmvn_native(f, **kw)
        np.testing.assert_allclose(a, b, atol=1e-12, rtol=0)
        import jax.numpy as jnp

        from tpufeat import features

        class _St:
            def __init__(self, t):
                self.count, self.sum, self.sumsq = t
                self.mean = self.sum / self.count
        jkw = dict(kw)
        jkw["speaker_stats"] = _St(spk) if spk else None
        jkw["global_stats"] = _St(glob) if glob else None
        c = features.online_cmvn(jnp.asarray(f, jnp.float32)[None], None,
                                 **jkw)[0]
        np.testing.assert_allclose(np.asarray(c), a, atol=2e-4, rtol=0)


class TestGammatoneThreeWay:
    def test_cpp_bank_matches_numpy(self):
        """THREE independent gammatone/ERB constructions agree: the C++
        double bank vs matrices.mel_filterbank's gammatone branch (which
        also feeds reference/cpu.py's float64 GFCC/PNCC chains)."""
        from tpufeat import cpp_golden, matrices
        if not cpp_golden.available():
            pytest.skip("cpp golden unavailable")
        got = cpp_golden.gammatone_fb_native(16000, 512, 64, 50.0, 8000.0)
        want = matrices.mel_filterbank(16000, 512, 64, 50.0, 8000.0,
                                       "erb", None, "gammatone")
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)
