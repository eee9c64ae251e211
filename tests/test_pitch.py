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
        # both signals share one length so the four jitted programs
        # (nccf/track x gemm/fft) compile ONCE, not twice (~20 s -> ~10 s
        # of XLA:CPU; the tonal-vs-noise contract is unchanged)
        for sig in (tone(185.0, n=9600) + 0.2 * make_signal(9600, seed=11),
                    make_signal(9600, seed=12)):
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
        change its pitch (identity backpointers through the tail).

        On the resampled grid the blocked polyphase dot's f32 tiling
        depends on the row count, so refined hz is roundoff-equal, not
        bitwise; decisions (refine=False hz) must still be identical.
        The native twin (lag_rate=0) stays fully bitwise — tested in
        TestLagGrid."""
        import dataclasses
        sig = tone(150.0, n=9600)
        padded = np.concatenate(
            [sig, (10 * np.random.default_rng(3).standard_normal(6400))
             .astype(np.float32)])
        lens = np.array([9600], np.int32)
        for refine in (False, True):
            cfg = dataclasses.replace(pitch.PitchConfig(), refine=refine)
            hz1, pov1, v1 = pitch.track(sig, cfg=cfg)
            hz2, pov2, v2 = pitch.track(padded[None], lengths=lens,
                                        cfg=cfg)
            F = int(np.asarray(v1).sum())
            a, b = np.asarray(hz1)[:F], np.asarray(hz2)[0, :F]
            if refine:
                np.testing.assert_allclose(a, b, rtol=2e-5)
            else:                           # integer decisions: exact
                np.testing.assert_array_equal(a, b)

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


class TestCenterAndConfigFor:
    """config_for + centered pitch: the CLI appends pitch columns to the
    spectral features, so the tracker must run on the SAME frame grid
    (rate, hop, centering) as the feature config."""

    def test_config_for_derives_grid(self):
        import dataclasses
        from tpufeat.config import MFCC13_HTK, WHISPER80
        pc = pitch.config_for(WHISPER80)
        assert pc.sample_rate == WHISPER80.sample_rate
        assert pc.hop_length == WHISPER80.hop_length
        assert pc.center is True
        cfg8 = dataclasses.replace(MFCC13_HTK, sample_rate=8000,
                                   frame_length=200, hop_length=80,
                                   n_fft=256)
        pc8 = pitch.config_for(cfg8)
        assert (pc8.sample_rate, pc8.hop_length) == (8000, 80)
        assert pc8.frame_length == 200          # 25 ms at 8 kHz
        assert pc8.center is False
        assert pitch.config_for(cfg8, max_f0=300.0).max_f0 == 300.0

    def test_8k_audio_tracks_true_f0(self):
        """The bug this guards: a hardcoded 16 kHz tracker on 8 kHz audio
        reports 2x the true pitch."""
        sr, f0, n = 8000, 120.0, 16000
        t = np.arange(n) / sr
        sig = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.03 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)
        pc = pitch.PitchConfig(sample_rate=sr, frame_length=200,
                               hop_length=80)
        hz, pov, valid = pitch.track(sig, cfg=pc)
        got = np.median(np.asarray(hz)[np.asarray(valid)])
        assert abs(got - f0) <= max(1.5 * f0 * f0 / sr, 0.5), got

    def test_center_equals_explicit_pad(self):
        """center=True is DEFINED as zero-padding wext//2 each side (of
        the lag-grid signal — native grid here so the pad is explicit);
        with ballast=0 (no RMS dependence) the two must be bit-equal."""
        cfg_c = pitch.PitchConfig(center=True, ballast=0.0, lag_rate=0)
        cfg_u = pitch.PitchConfig(center=False, ballast=0.0, lag_rate=0)
        sig = tone(150.0, n=9600)
        pad = cfg_c.wext // 2
        padded = np.pad(sig, (pad, pad))
        assert cfg_c.num_frames(len(sig)) == cfg_u.num_frames(len(padded))
        hz_c, pov_c, _ = pitch.track(sig, cfg=cfg_c)
        hz_u, pov_u, _ = pitch.track(padded, cfg=cfg_u)
        np.testing.assert_array_equal(np.asarray(hz_c), np.asarray(hz_u))
        np.testing.assert_array_equal(np.asarray(pov_c), np.asarray(pov_u))

    def test_center_golden_parity(self):
        cfg = pitch.PitchConfig(center=True)
        sig = tone(140.0, n=12000) + 0.3 * make_signal(12000, seed=7)
        hz, pov, valid = pitch.track(sig, cfg=cfg)
        ghz, gpov = cpu.pitch(sig.astype(np.float64), cfg)
        # compare strongly-voiced frames (zero-padded edge windows score
        # low and may tie): POV > 0.5 in the golden
        strong = gpov > 0.5
        assert strong.sum() > 20
        np.testing.assert_allclose(np.asarray(hz)[strong], ghz[strong],
                                   rtol=1e-6)

    def test_center_validity_matches_spectral_convention(self):
        """Centered pitch frame t is valid iff t*hop <= length — the same
        rule as framing.num_frames_dynamic for center=True configs."""
        cfg = pitch.PitchConfig(center=True)
        n, length = 12800, 9600
        x = np.zeros((1, n), np.float32)
        x[0, :length] = tone(170.0, n=length)
        _, _, valid = pitch.track(x, lengths=np.array([length], np.int32),
                                  cfg=cfg)
        F = cfg.num_frames(n)
        want = min(F, 1 + length // cfg.hop_length)
        assert int(np.asarray(valid).sum()) == want


class TestStreamingPitch:
    def _tone(self, f0=140.0, n=12000):
        return tone(f0, n=n, seed=13)

    def test_full_lookahead_equals_offline(self):
        """With lookahead >= total frames, flush() is algebraically the
        offline Viterbi (same forward scores, same backtrace) — exact."""
        cfg = pitch.PitchConfig(ballast=0.0)   # running-RMS ballast is the
        sig = self._tone(n=6400)               # one online divergence
        # n=6400 (not the 12000 default): the flush backtrace unrolls
        # F+4 steps into one program and the XLA:CPU LLVM compile scales
        # with it (~20 s at n=12000, ~6 s here); the exactness contract
        # is length-independent
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
        """Every frame is emitted exactly once over an uneven chunk
        plan: process() emissions lag input by `lookahead` frames, and
        flush() drains the polyphase tail plus the pending Viterbi
        lookahead — process + flush together must emit exactly
        num_frames(total)."""
        cfg = pitch.PitchConfig()
        sig = self._tone(n=14000)
        K = 7
        sp = pitch.StreamingPitch(cfg, batch_size=1, lookahead=K)
        total = emitted = 0
        for c in (1000, 3000, 750, 4250, 5000):
            hz, _ = sp.process(sig[None, total: total + c])
            emitted += hz.shape[1]
            total += c
        hz_f, _ = sp.flush()
        seen = cfg.num_frames(total)
        assert emitted + hz_f.shape[1] == seen
        # the Viterbi drain itself is exactly min(seen, K); the rest of
        # the flush rows come from the resampler tail
        assert hz_f.shape[1] >= min(seen, K)

    @pytest.mark.slow  # ~17 s compile; test_full_lookahead_equals_offline keeps the contract in the default tier
    def test_center_full_lookahead_equals_offline(self):
        """Centered streaming: the pre-filled left pad + flush-fed right
        pad reproduce the offline centered tracker exactly (ballast=0)."""
        cfg = pitch.PitchConfig(center=True, ballast=0.0)
        sig = self._tone(f0=160.0, n=11200)
        F = cfg.num_frames(len(sig))
        want_hz, want_pov, _ = pitch.track(sig, cfg=cfg)
        sp = pitch.StreamingPitch(cfg, batch_size=1, lookahead=F + 4)
        for i in range(0, len(sig), 2800):
            hz, _ = sp.process(sig[None, i: i + 2800])
        hz, pov = sp.flush()
        assert hz.shape[1] == F
        np.testing.assert_allclose(np.asarray(hz)[0],
                                   np.asarray(want_hz)[:F], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pov)[0],
                                   np.asarray(want_pov)[:F],
                                   rtol=0, atol=1e-5)

    def test_flush_is_one_dispatch_program(self):
        """pitch_flush compiles one program (lru-cached per (K, n)) with
        the ring position TRACED: a second stream at a different pos must
        not grow the cache."""
        cfg = pitch.PitchConfig()
        before = pitch._pitch_flush_jit.cache_info().currsize
        for end in (6000, 7600):
            sp = pitch.StreamingPitch(cfg, batch_size=1, lookahead=4)
            sp.process(self._tone(n=end)[None])
            sp.flush()
        after = pitch._pitch_flush_jit.cache_info().currsize
        assert after - before <= 1, (before, after)

    @pytest.mark.slow  # ~15 s compile; same contract anchored by test_full_lookahead_equals_offline
    def test_pitch_features_full_lookahead_equals_offline(self):
        """StreamingPitchFeatures with lookahead >= total frames: all
        three columns (POV, mean-subtracted log-pitch, delta-log-pitch)
        match the offline pitch_features — the running mean equals the
        global mean when everything is decided at flush."""
        cfg = pitch.PitchConfig(ballast=0.0)
        sig = self._tone(f0=150.0, n=12000)
        F = cfg.num_frames(len(sig))
        want, _ = pitch.pitch_features(sig, cfg=cfg)
        spf = pitch.StreamingPitchFeatures(cfg, batch_size=1,
                                           lookahead=F + 4)
        outs = [spf.process(sig[None, i: i + 3000])
                for i in range(0, len(sig), 3000)]
        outs.append(spf.flush())
        got = np.concatenate([np.asarray(o) for o in outs if o.shape[1]],
                             axis=1)[0]
        assert got.shape == (F, 3)
        np.testing.assert_allclose(got, np.asarray(want)[:F],
                                   rtol=0, atol=2e-5)

    def test_pitch_features_realistic_lookahead(self):
        """K=15 online: POV and delta-log-pitch columns match offline on
        a steady tone (decisions final after warmup; deltas are
        shift-invariant so the running mean drops out of column 2)."""
        cfg = pitch.PitchConfig(ballast=0.0)
        sig = self._tone(f0=200.0, n=16000)
        F = cfg.num_frames(len(sig))
        want, _ = pitch.pitch_features(sig, cfg=cfg)
        spf = pitch.StreamingPitchFeatures(cfg, batch_size=1, lookahead=15)
        outs = [spf.process(sig[None, i: i + 1600])
                for i in range(0, len(sig), 1600)]
        outs.append(spf.flush())
        got = np.concatenate([np.asarray(o) for o in outs if o.shape[1]],
                             axis=1)[0]
        assert got.shape == (F, 3)
        w = np.asarray(want)[:F]
        np.testing.assert_allclose(got[:, 0], w[:, 0], rtol=0, atol=2e-5)
        np.testing.assert_allclose(got[:, 2], w[:, 2], rtol=0, atol=2e-5)
        # running-mean column converges to the offline global-mean one
        np.testing.assert_allclose(got[-20:, 1], w[-20:, 1],
                                   rtol=0, atol=5e-3)

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


class TestLagGrid:
    """Round-4: the resampled lag grid (Kaldi's resample_freq design) +
    parabolic sub-lag refinement."""

    def test_default_is_kaldi_grid(self):
        cfg = pitch.PitchConfig()
        assert cfg.lag_rate == 2000 and cfg.resampled and cfg.refine
        inner = cfg.inner()
        assert (inner.sample_rate, inner.frame_length,
                inner.hop_length) == (2000, 50, 20)
        assert (inner.lag_min, inner.lag_max, inner.n_lags) == (5, 40, 36)
        assert not inner.resampled          # transplant terminates

    def test_refined_accuracy_beats_native_quantization(self):
        """The whole point: at 330 Hz the native integer grid quantizes
        in ~6.8 Hz steps and the raw 2 kHz grid in ~54 Hz steps; the
        refined resampled tracker must land within 1 Hz."""
        for f0 in (95.0, 187.0, 263.0, 330.0):
            hz, pov, valid = pitch.track(tone(f0, n=16000))
            got = np.median(np.asarray(hz)[np.asarray(valid)])
            assert abs(got - f0) < max(0.01 * f0, 0.5), (f0, got)

    def test_native_twin_agrees(self):
        """Resampled-grid and native-grid trackers agree on voiced audio
        to within the coarser grid's quantization."""
        f0 = 150.0
        sig = tone(f0, n=12000)
        hz_r, _, v_r = pitch.track(sig)                 # lag_rate=2000
        hz_n, _, v_n = pitch.track(sig,
                                   cfg=pitch.PitchConfig(lag_rate=0))
        med_r = np.median(np.asarray(hz_r)[np.asarray(v_r)])
        med_n = np.median(np.asarray(hz_n)[np.asarray(v_n)])
        assert abs(med_r - med_n) < 3.0, (med_r, med_n)

    def test_refine_lag_recovers_parabola_vertex(self):
        import jax.numpy as jnp
        true_delta = 0.3125
        lags = np.arange(9, dtype=np.float64)
        scores = (1.0 - (lags - (4 + true_delta)) ** 2 * 0.2)[None, :]
        idx = jnp.asarray([4], jnp.int32)
        d = np.asarray(pitch.refine_lag(jnp.asarray(scores, jnp.float32),
                                        idx))
        np.testing.assert_allclose(d, [true_delta], atol=1e-5)

    def test_refine_lag_gates_edges_and_flat_peaks(self):
        import jax.numpy as jnp
        flat = jnp.ones((3, 5), jnp.float32)            # zero curvature
        idx = jnp.asarray([0, 2, 4], jnp.int32)         # edge, mid, edge
        d = np.asarray(pitch.refine_lag(flat, idx))
        np.testing.assert_array_equal(d, np.zeros(3))

    def test_indivisible_rate_falls_back_to_native(self):
        import dataclasses
        from tpufeat.config import MFCC13_HTK
        cfg_odd = dataclasses.replace(MFCC13_HTK, sample_rate=22050,
                                      frame_length=551, hop_length=221,
                                      n_fft=1024)
        pc = pitch.config_for(cfg_odd)
        assert pc.lag_rate == 0             # silently native, not raise
        with pytest.raises(ValueError):
            pitch.PitchConfig(sample_rate=22050, frame_length=551,
                              hop_length=221).inner()

    def test_num_frames_matches_output(self):
        cfg = pitch.PitchConfig()
        for n in (7200, 14000, 16001):
            hz, pov, valid = pitch.track(tone(150.0, n=n))
            assert np.asarray(hz).shape[0] == cfg.num_frames(n)

    def test_mask_invariance_through_the_resampler(self):
        """Garbage past an utterance's length must not leak through the
        polyphase filter into its pitch (the pre-filter zero-mask):
        identical decisions, hz to f32 roundoff (blocked-dot tiling
        varies with row count — see test_batch_mask_invariance)."""
        sig = tone(150.0, n=9600)
        hz1, pov1, v1 = pitch.track(sig)
        padded = np.concatenate(
            [sig, (10 * np.random.default_rng(3).standard_normal(6400))
             .astype(np.float32)])
        hz2, pov2, v2 = pitch.track(padded[None],
                                    lengths=np.array([9600], np.int32))
        F = int(np.asarray(v1).sum())
        np.testing.assert_allclose(np.asarray(hz1)[:F],
                                   np.asarray(hz2)[0, :F], rtol=2e-5)

    def test_native_twin_mask_invariance_is_bitwise(self):
        sig = tone(150.0, n=9600)
        cfg = pitch.PitchConfig(lag_rate=0)
        hz1, _, v1 = pitch.track(sig, cfg=cfg)
        padded = np.concatenate(
            [sig, (10 * np.random.default_rng(3).standard_normal(6400))
             .astype(np.float32)])
        hz2, _, _ = pitch.track(padded[None],
                                lengths=np.array([9600], np.int32),
                                cfg=cfg)
        F = int(np.asarray(v1).sum())
        np.testing.assert_array_equal(np.asarray(hz1)[:F],
                                      np.asarray(hz2)[0, :F])

    def test_streaming_features_state_roundtrip_with_resampler(self):
        """Checkpoint/resume through StreamingPitchFeatures.state()
        includes the polyphase carry: resume mid-stream and the
        remaining rows must match an uninterrupted run exactly."""
        cfg = pitch.PitchConfig(ballast=0.0)
        sig = tone(170.0, n=12000, seed=21)
        a = pitch.StreamingPitchFeatures(cfg, batch_size=1, lookahead=9)
        rows = [a.process(sig[None, :7000])]
        st = a.state()
        rows.append(a.process(sig[None, 7000:]))
        rows.append(a.flush())
        want = np.concatenate([np.asarray(r) for r in rows if r.shape[1]],
                              axis=1)

        b = pitch.StreamingPitchFeatures(cfg, batch_size=1, lookahead=9)
        b.process(sig[None, :7000])
        b.set_state(st)
        rows2 = [np.asarray(want[:, :rows[0].shape[1]]),
                 np.asarray(b.process(sig[None, 7000:])),
                 np.asarray(b.flush())]
        got = np.concatenate([r for r in rows2 if r.shape[1]], axis=1)
        np.testing.assert_array_equal(got, want)
