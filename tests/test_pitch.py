"""Pitch tracker (beyond-reference; tpufeat/pitch.py).

Golden strategy mirrors the PLP one: the accelerated path (batched rFFT
cross-correlation + lax.scan Viterbi) is held against a float64 golden
using direct per-lag correlation loops and a plain-Python Viterbi.
"""

import numpy as np
import pytest

from tpufeat import pitch
from tpufeat.reference import cpu

from conftest import make_signal


def tone(f0, n=16000, sr=16000, amp=0.3, seed=0):
    t = np.arange(n) / sr
    sig = amp * np.sin(2 * np.pi * f0 * t)
    # a little harmonic content + noise: pure sines are pathologically easy
    sig += 0.1 * amp * np.sin(2 * np.pi * 2 * f0 * t + 0.3)
    sig += 0.01 * np.random.default_rng(seed).standard_normal(n)
    return sig.astype(np.float32)


class TestTracking:
    @pytest.mark.parametrize("f0", [80.0, 125.0, 220.0, 330.0])
    def test_tone_frequency(self, f0):
        hz, pov, valid = pitch.track(tone(f0))
        v = np.asarray(valid)
        got = np.median(np.asarray(hz)[v])
        # integer-lag quantization: one lag step at f0 is f0^2/sr
        assert abs(got - f0) <= max(1.5 * f0 * f0 / 16000, 0.5), got
        assert np.asarray(pov)[v].mean() > 0.5     # clearly voiced

    def test_silence_is_unvoiced(self):
        hz, pov, valid = pitch.track(np.zeros(16000, np.float32))
        assert np.abs(np.asarray(pov)).max() < 0.1

    def test_octave_smoothing(self):
        """A tone whose 2nd harmonic is stronger than the fundamental
        tempts per-frame NCCF toward octave errors; the Viterbi path must
        stay consistent (no octave flip-flops frame to frame)."""
        sr, f0 = 16000, 110.0
        t = np.arange(24000) / sr
        sig = (0.15 * np.sin(2 * np.pi * f0 * t)
               + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)
        hz, pov, valid = pitch.track(sig)
        hz = np.asarray(hz)[np.asarray(valid)]
        jumps = np.abs(np.diff(np.log(hz)))
        assert (jumps > 0.5).sum() == 0            # no octave jumps

    def test_chirp_tracks(self):
        sr = 16000
        t = np.arange(32000) / sr
        f = 120.0 + 60.0 * t / t[-1]               # 120 -> 180 Hz sweep
        phase = 2 * np.pi * np.cumsum(f) / sr
        sig = (0.3 * np.sin(phase)).astype(np.float32)
        hz, pov, valid = pitch.track(sig)
        hz = np.asarray(hz)[np.asarray(valid)]
        assert hz[-1] > hz[0] + 30                 # rises with the sweep
        assert np.all(np.diff(hz) > -8)            # monotone-ish


class TestGoldenParity:
    def test_matches_cpu_golden(self):
        cfg = pitch.PitchConfig()
        sig = tone(140.0, n=12000) + 0.3 * make_signal(12000, seed=7)
        hz, pov, valid = pitch.track(sig, cfg=cfg)
        ghz, gpov = cpu.pitch(sig.astype(np.float64), cfg)
        F = int(np.asarray(valid).sum())
        # identical Viterbi paths (hz compared at f32 resolution)
        np.testing.assert_allclose(np.asarray(hz)[:F], ghz[:F], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pov)[:F], gpov[:F],
                                   rtol=0, atol=1e-4)

    def test_gemm_equals_fft_nccf(self):
        """The MXU DFT-as-GEMM NCCF (production) against the rFFT audit
        twin: same scores to f32 roundoff, same decisions, on tonal and
        noise audio. (matrices.nccf_gemm_matrices carries the identity;
        this checks the wiring end-to-end through track().)"""
        import dataclasses
        for sig in (tone(185.0, n=9600) + 0.2 * make_signal(9600, seed=11),
                    make_signal(12000, seed=12)):
            g = pitch.PitchConfig(nccf_method="gemm")
            f = dataclasses.replace(g, nccf_method="fft")
            x = np.asarray(sig, np.float32)[None]
            lens = np.asarray([len(sig)], np.int32)
            sg, vg = pitch.nccf(x, lens, g)
            sf, vf = pitch.nccf(x, lens, f)
            np.testing.assert_array_equal(np.asarray(vg), np.asarray(vf))
            np.testing.assert_allclose(np.asarray(sg), np.asarray(sf),
                                       rtol=0, atol=2e-5)
            hg, pg, _ = pitch.track(sig, cfg=g)
            hf, pf, _ = pitch.track(sig, cfg=f)
            np.testing.assert_allclose(np.asarray(hg), np.asarray(hf),
                                       rtol=1e-6)

    def test_noise_parity(self):
        """Unvoiced audio: paths may differ only where scores tie; compare
        the score of the chosen path instead of the path itself."""
        cfg = pitch.PitchConfig()
        sig = make_signal(9600, seed=9)
        hz, pov, valid = pitch.track(sig, cfg=cfg)
        ghz, gpov = cpu.pitch(sig.astype(np.float64), cfg)
        F = int(np.asarray(valid).sum())
        np.testing.assert_allclose(np.sort(np.asarray(pov)[:F]),
                                   np.sort(gpov[:F]), rtol=0, atol=5e-3)


class TestBatchAndFeatures:
    def test_batch_mask_invariance(self):
        """Padding garbage after an utterance's true length must not
        change its pitch (identity backpointers through the tail)."""
        sig = tone(150.0, n=9600)
        hz1, pov1, v1 = pitch.track(sig)
        padded = np.concatenate(
            [sig, (10 * np.random.default_rng(3).standard_normal(6400))
             .astype(np.float32)])
        hz2, pov2, v2 = pitch.track(padded[None],
                                    lengths=np.array([9600], np.int32))
        F = int(np.asarray(v1).sum())
        np.testing.assert_array_equal(np.asarray(hz1)[:F],
                                      np.asarray(hz2)[0, :F])

    def test_features_shape_and_masking(self):
        sig = tone(200.0, n=12800)
        feats, valid = pitch.pitch_features(sig)
        F = np.asarray(valid).shape[0]
        assert feats.shape == (F, 3)
        f = np.asarray(feats)
        assert np.isfinite(f).all()
        # mean-subtracted log-pitch: near zero mean over valid frames
        v = np.asarray(valid)
        assert abs(f[v, 1].mean()) < 1e-5

    def test_batched_two_utterances(self):
        a, b = tone(100.0, n=12000), tone(250.0, n=8000)
        x = np.zeros((2, 12000), np.float32)
        x[0], x[1, :8000] = a, b
        hz, pov, valid = pitch.track(x, lengths=np.array([12000, 8000],
                                                         np.int32))
        v = np.asarray(valid)
        m0 = np.median(np.asarray(hz)[0][v[0]])
        m1 = np.median(np.asarray(hz)[1][v[1]])
        assert abs(m0 - 100) < 3 and abs(m1 - 250) < 8


class TestStreamingPitch:
    def _tone(self, f0=140.0, n=12000):
        return tone(f0, n=n, seed=13)

    def test_full_lookahead_equals_offline(self):
        """With lookahead >= total frames, flush() is algebraically the
        offline Viterbi (same forward scores, same backtrace) — exact."""
        cfg = pitch.PitchConfig(ballast=0.0)   # running-RMS ballast is the
        sig = self._tone()                     # one online divergence
        F = cfg.num_frames(len(sig))
        want_hz, want_pov, _ = pitch.track(sig, cfg=cfg)
        sp = pitch.StreamingPitch(cfg, batch_size=1, lookahead=F + 4)
        for i in range(0, len(sig), 3200):
            hz, pov = sp.process(sig[None, i: i + 3200])
            assert hz.shape[1] == 0            # nothing emitted yet
        hz, pov = sp.flush()
        np.testing.assert_allclose(np.asarray(hz)[0],
                                   np.asarray(want_hz)[:F], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pov)[0],
                                   np.asarray(want_pov)[:F],
                                   rtol=0, atol=1e-5)

    def test_realistic_lookahead_on_tone(self):
        """K=15 (150 ms) online decisions match offline on a steady tone
        (after warmup the delayed decisions are final)."""
        cfg = pitch.PitchConfig(ballast=0.0)
        sig = self._tone(f0=180.0, n=16000)
        F = cfg.num_frames(len(sig))
        want_hz, _, _ = pitch.track(sig, cfg=cfg)
        sp = pitch.StreamingPitch(cfg, batch_size=1, lookahead=15)
        outs = [sp.process(sig[None, i: i + 1600])[0]
                for i in range(0, len(sig), 1600)]
        outs.append(sp.flush()[0])
        got = np.concatenate([np.asarray(o) for o in outs if o.shape[1]],
                             axis=1)[0]
        assert got.shape[0] == F
        np.testing.assert_allclose(got, np.asarray(want_hz)[:F], rtol=1e-6)

    def test_emission_counting(self):
        """Emissions lag input by exactly `lookahead` frames and flush
        drains exactly the pending tail, over an uneven chunk plan."""
        cfg = pitch.PitchConfig()
        sig = self._tone(n=14000)
        F = cfg.num_frames(len(sig))
        K = 7
        sp = pitch.StreamingPitch(cfg, batch_size=1, lookahead=K)
        total = 0
        for c in (1000, 3000, 750, 4250, 5000):
            hz, _ = sp.process(sig[None, total: total + c])
            total += c
        hz_f, _ = sp.flush()
        seen = cfg.num_frames(total)
        assert hz_f.shape[1] == min(seen, K)

    def test_state_is_a_pytree(self):
        """PitchStreamState serializes through the generic streaming
        checkpoint helpers (crash resume, SURVEY aux)."""
        from tpufeat import streaming as st
        cfg = pitch.PitchConfig()
        sp = pitch.StreamingPitch(cfg, batch_size=2, lookahead=5)
        sp.process(np.random.default_rng(0)
                   .standard_normal((2, 4000)).astype(np.float32))
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "pitch_state.npz")
            st.save_state(p, sp.state)
            loaded = st.load_state(p, sp.state)
        for a, b in zip(sp.state, loaded):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
