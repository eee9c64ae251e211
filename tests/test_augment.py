"""SpecAugment + energy VAD (tpufeat/augment.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpufeat import augment, features
from tpufeat.config import FBANK80

from conftest import make_signal


class TestSpecAugment:
    def _feats(self):
        sigs = [make_signal(16000, seed=80), make_signal(9000, seed=81)]
        x = np.zeros((2, 16000), np.float32)
        for b, s in enumerate(sigs):
            x[b, : len(s)] = s
        res = features.extract(x, np.array([16000, 9000]), FBANK80)
        return np.asarray(res.features), np.asarray(res.num_frames)

    def test_masks_applied_and_bounded(self):
        feats, nf = self._feats()
        out = np.asarray(augment.spec_augment(
            jnp.asarray(feats), jnp.asarray(nf), jax.random.PRNGKey(0)))
        assert out.shape == feats.shape
        changed = np.any(out != feats, axis=-1)        # [B, T]
        assert changed.any(), "some frames must be masked"
        # padding rows never touched
        for b in range(2):
            np.testing.assert_array_equal(out[b, nf[b]:], feats[b, nf[b]:])

    def test_freq_mask_is_banded(self):
        feats, nf = self._feats()
        out = np.asarray(augment.spec_augment(
            jnp.asarray(feats), jnp.asarray(nf), jax.random.PRNGKey(3),
            n_time_masks=0, fill="zero"))
        # with only freq masks, the set of masked feature columns is the
        # same for every valid frame of an utterance
        for b in range(2):
            diff = out[b, : nf[b]] != feats[b, : nf[b]]
            cols = diff.any(axis=0)
            assert (diff == cols[None, :]).all()
            assert 0 < cols.sum() <= 2 * 27

    def test_time_mask_within_valid(self):
        feats, nf = self._feats()
        out = np.asarray(augment.spec_augment(
            jnp.asarray(feats), jnp.asarray(nf), jax.random.PRNGKey(5),
            n_freq_masks=0, fill="zero"))
        for b in range(2):
            diff = (out[b] != feats[b]).any(axis=-1)
            assert not diff[nf[b]:].any()

    def test_deterministic_per_key(self):
        feats, nf = self._feats()
        a = np.asarray(augment.spec_augment(
            jnp.asarray(feats), jnp.asarray(nf), jax.random.PRNGKey(7)))
        b = np.asarray(augment.spec_augment(
            jnp.asarray(feats), jnp.asarray(nf), jax.random.PRNGKey(7)))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(augment.spec_augment(
            jnp.asarray(feats), jnp.asarray(nf), jax.random.PRNGKey(8)))
        assert (a != c).any()

    def test_adaptive_time_width(self):
        """time_width_ratio: per-utterance mask-width budget scales with
        num_frames — a 20-frame utterance can never lose more than
        ratio*20 contiguous frames per mask."""
        rng = np.random.default_rng(5)
        feats = jnp.asarray(rng.standard_normal((2, 200, 8)), jnp.float32)
        nf = np.array([200, 20])
        aug = np.asarray(augment.spec_augment(
            feats, nf, jax.random.key(3), n_freq_masks=0,
            n_time_masks=1, time_width_ratio=0.25, fill="zero"))
        for b, n in enumerate(nf):
            changed = np.flatnonzero(
                (aug[b, :n] != np.asarray(feats)[b, :n]).any(axis=-1))
            assert changed.size <= int(0.25 * n)   # budget respected
            np.testing.assert_array_equal(aug[b, n:],
                                          np.asarray(feats)[b, n:])

    def test_mean_fill_value(self):
        feats, nf = self._feats()
        out = np.asarray(augment.spec_augment(
            jnp.asarray(feats), jnp.asarray(nf), jax.random.PRNGKey(1),
            fill="mean"))
        for b in range(2):
            m = feats[b, : nf[b]].mean()
            diffs = out[b] != feats[b]
            if diffs.any():
                vals = out[b][diffs]
                np.testing.assert_allclose(vals, m, rtol=1e-5)


class TestEnergyVad:
    def test_speech_vs_silence(self):
        sr = 16000
        sig = np.zeros(sr, np.float32)
        speech = make_signal(4800, seed=90)
        sig[3200: 8000] = speech                   # speech in the middle
        sig += 1e-5 * np.random.default_rng(0).standard_normal(sr).astype(
            np.float32)                            # noise floor
        vad = np.asarray(augment.energy_vad(sig[None], np.array([sr])))[0]
        # frames fully inside the speech region are active
        first_in = 3200 // 160 + 1
        last_in = (8000 - 400) // 160 - 1
        assert vad[first_in: last_in].all()
        # frames far from the speech are silent
        assert not vad[last_in + 10:].any()

    def test_padding_masked(self):
        sig = make_signal(8000, seed=91)
        x = np.zeros((1, 16000), np.float32)
        x[0, :8000] = sig
        vad = np.asarray(augment.energy_vad(x, np.array([8000])))[0]
        from tpufeat.config import FeatureConfig
        nf = FeatureConfig(preemphasis=0.0).num_frames(8000)
        assert not vad[nf:].any()
        assert vad[:nf].any()


class TestAddNoise:
    def test_target_snr_achieved(self):
        import jax.numpy as jnp
        from tpufeat.augment import add_noise
        rng = np.random.default_rng(50)
        x = rng.standard_normal((3, 8000)).astype(np.float32)
        v = rng.standard_normal((3, 8000)).astype(np.float32)
        lens = np.asarray([8000, 5000, 1000])
        for snr in (0.0, 10.0, 20.0):
            y = np.asarray(add_noise(x, v, lens, snr))
            d = y - x
            m = np.arange(8000) < lens[:, None]
            got = 10 * np.log10((x * x * m).sum(1) / (d * d * m).sum(1))
            np.testing.assert_allclose(got, snr, atol=1e-3)
            # padding untouched
            assert (d[1, 5000:] == 0).all() and (d[2, 1000:] == 0).all()

    def test_per_utterance_snr_and_silence(self):
        from tpufeat.augment import add_noise
        rng = np.random.default_rng(51)
        x = rng.standard_normal((2, 4000)).astype(np.float32)
        x[1] = 0.0                                   # silent utterance
        v = rng.standard_normal((2, 4000)).astype(np.float32)
        lens = np.asarray([4000, 4000])
        y = np.asarray(add_noise(x, v, lens, np.asarray([5.0, 5.0])))
        d = y - x
        snr0 = 10 * np.log10((x[0] ** 2).sum() / (d[0] ** 2).sum())
        np.testing.assert_allclose(snr0, 5.0, atol=1e-3)
        assert (y[1] == 0).all()                     # no 0/0 blowup


class TestSpeechSegments:
    """VAD mask -> merged/padded (start, end) frame segments."""

    def test_basic_runs_and_gap_bridging(self):
        f = np.zeros(200, bool)
        f[10:50] = True
        f[60:100] = True        # 10-frame gap < min_silence=30 -> bridged
        f[150:190] = True       # 50-frame gap -> separate
        segs = augment.speech_segments(f, pad=0)
        assert segs == [(10, 100), (150, 190)]

    def test_min_speech_drop_and_padding(self):
        f = np.zeros(100, bool)
        f[5:8] = True            # 3 frames < min_speech=10 -> dropped
        f[40:60] = True
        segs = augment.speech_segments(f, min_silence=10, pad=5)
        assert segs == [(35, 65)]

    def test_padding_clamped_and_merge_after_pad(self):
        f = np.zeros(60, bool)
        f[0:15] = True
        f[22:40] = True          # 7-frame gap, min_silence=5 keeps split...
        segs = augment.speech_segments(f, min_silence=5, min_speech=5,
                                       pad=4)
        assert segs == [(0, 44)]  # ...but ±4 padding re-joins -> merged
        assert augment.speech_segments(np.zeros(60, bool)) == []
        assert augment.speech_segments(np.ones(60, bool), pad=9) == [(0, 60)]

    def test_batched_and_samples(self):
        from tpufeat.config import MFCC13_HTK
        f = np.zeros((2, 100), bool)
        f[0, 20:50] = True
        per_row = augment.speech_segments(f, pad=0)
        assert per_row[0] == [(20, 50)] and per_row[1] == []
        spans = augment.segments_to_samples(per_row[0], MFCC13_HTK)
        assert spans == [(20 * 160, 49 * 160 + 400)]
        # centered configs: frame t is centered on t*hop -> spans shift
        # left by frame_length//2 and clamp at 0
        from tpufeat.config import WHISPER80
        assert augment.segments_to_samples([(0, 10), (20, 50)],
                                           WHISPER80) == [
            (0, 9 * 160 + 200), (20 * 160 - 200, 49 * 160 + 200)]

    def test_composes_with_energy_vad(self):
        # two tone bursts in quiet noise -> exactly two segments covering them
        rng = np.random.default_rng(9)
        x = 1e-4 * rng.standard_normal(48000).astype(np.float32)
        n = np.arange(8000)
        tone = 0.5 * np.sin(2 * np.pi * 440 * n / 16000).astype(np.float32)
        x[8000:16000] += tone
        x[32000:40000] += tone
        mask = np.asarray(augment.energy_vad(x[None], np.array([48000])))[0]
        segs = augment.speech_segments(mask)
        assert len(segs) == 2
        (s0, e0), (s1, e1) = augment.segments_to_samples(
            segs, __import__("tpufeat").MFCC13_HTK)
        assert s0 <= 8000 < 16000 <= e0 + 400
        assert s1 <= 32000 < 40000 <= e1 + 400


class TestStreamingEndpointer:
    """Kaldi OnlineEndpoint-style rules over VAD speech flags."""

    def test_silence_only_rule_fires_at_5s(self):
        ep = augment.StreamingEndpointer()
        assert not ep.update(np.zeros((1, 499), bool))[0]
        assert ep.update(np.zeros((1, 1), bool))[0]       # 500 x 10 ms = 5 s

    def test_trailing_silence_after_speech(self):
        ep = augment.StreamingEndpointer()
        flags = np.zeros((1, 50), bool)
        flags[0, :30] = True                               # 0.3 s of speech
        assert not ep.update(flags)[0]                     # 0.2 s trailing
        assert not ep.update(np.zeros((1, 79), bool))[0]   # 0.99 s trailing
        assert ep.update(np.zeros((1, 1), bool))[0]        # 1.00 s trailing

    def test_max_length_rule(self):
        ep = augment.StreamingEndpointer()
        assert not ep.update(np.ones((1, 1999), bool))[0]
        assert ep.update(np.ones((1, 1), bool))[0]         # 20 s of speech

    def test_chunk_plan_invariance(self):
        rng = np.random.default_rng(7)
        flags = rng.random(997) < 0.3
        one = augment.StreamingEndpointer()
        one.update(flags[None])
        many = augment.StreamingEndpointer()
        i = 0
        for step in [1, 7, 13, 160, 816]:
            many.update(flags[None, i:i + step])
            i += step
        assert i == 997
        for k in ("frames_seen", "trailing_silence", "seen_speech"):
            np.testing.assert_array_equal(one.state()[k], many.state()[k])
        np.testing.assert_array_equal(one.decision(), many.decision())

    def test_batch_rows_and_reset(self):
        ep = augment.StreamingEndpointer(batch_size=2)
        flags = np.zeros((2, 150), bool)
        flags[0, :40] = True                    # row 0: speech then silence
        done = ep.update(flags)                 # row0: 1.1 s trailing
        assert done[0] and not done[1]          # row1: only 1.5 s silence
        ep.reset(0)
        assert not ep.decision()[0]
        assert ep.state()["seen_speech"][1] == False  # noqa: E712

    def test_state_roundtrip_and_empty_update(self):
        ep = augment.StreamingEndpointer()
        ep.update(np.ones((1, 30), bool))
        s = ep.state()
        ep2 = augment.StreamingEndpointer()
        ep2.set_state(s)
        np.testing.assert_array_equal(
            ep2.update(np.zeros((1, 0), bool)), ep.decision())
        for k, v in ep2.state().items():
            np.testing.assert_array_equal(v, s[k])

    def test_composes_with_streaming_vad(self):
        # 1 s tone then 1.5 s near-silence at 16 kHz: the endpointer must
        # close the utterance from live StreamingEnergyVAD flags.
        rng = np.random.default_rng(8)
        x = 1e-4 * rng.standard_normal(40000).astype(np.float32)
        x[:16000] += 0.5 * np.sin(
            2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
        vad = augment.StreamingEnergyVAD()
        ep = augment.StreamingEndpointer()
        fired_at = None
        for i in range(0, 40000, 1600):
            done = ep.update(vad.process(x[None, i:i + 1600]))
            if done[0]:
                fired_at = i + 1600
                break
        assert fired_at is not None and 26000 <= fired_at <= 36000

    def test_validation(self):
        import pytest
        with pytest.raises(ValueError):
            augment.StreamingEndpointer(rules=())
        ep = augment.StreamingEndpointer(batch_size=2)
        with pytest.raises(ValueError):
            ep.update(np.zeros((3, 10), bool))

    def test_reset_rows_matches_reset(self):
        """reset_rows (pool-style slot recycle) == reset per row: the
        reset rows' counters restart, other rows keep accumulating."""
        ep = augment.StreamingEndpointer(batch_size=3)
        flags = np.zeros((3, 120), bool)
        flags[:, :20] = True
        ep.update(flags)
        ep.reset_rows([0, 2])
        s = ep.state()
        np.testing.assert_array_equal(s["frames_seen"], [0, 120, 0])
        np.testing.assert_array_equal(s["seen_speech"],
                                      [False, True, False])
        np.testing.assert_array_equal(s["trailing_silence"], [0, 100, 0])


class TestAddReverb:
    """RIR convolution (Kaldi wav-reverberate semantics)."""

    def _numpy_reverb(self, x, h, lengths, shift_to_peak=True,
                      normalize=True):
        """float64 np.convolve mirror of augment.add_reverb."""
        B, N = x.shape
        out = np.zeros((B, N))
        for b in range(B):
            xm = np.where(np.arange(N) < lengths[b], x[b], 0.0).astype(
                np.float64)
            y = np.convolve(xm, h[b].astype(np.float64))
            d = int(np.argmax(np.abs(h[b]))) if shift_to_peak else 0
            y = y[d:d + N]
            y = np.where(np.arange(N) < lengths[b], y, 0.0)
            if normalize:
                p_in, p_out = np.sum(xm * xm), np.sum(y * y)
                y = y * (np.sqrt(p_in / p_out) if p_out > 0 else 0.0)
            out[b] = y
        return out

    def test_identity_rir(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 4000)).astype(np.float32)
        lengths = np.array([4000, 3200])
        h = np.zeros(64, np.float32)
        h[0] = 1.0
        y = np.asarray(augment.add_reverb(x, h, lengths))
        m = np.arange(4000) < lengths[:, None]
        np.testing.assert_allclose(y, np.where(m, x, 0.0), atol=2e-5)

    def test_golden_parity_per_utterance_rirs(self):
        rng = np.random.default_rng(1)
        B, N, R = 3, 7000, 513
        x = rng.standard_normal((B, N)).astype(np.float32)
        lengths = np.array([7000, 5000, 1])
        # decaying random RIRs with an off-origin direct path
        h = (rng.standard_normal((B, R))
             * np.exp(-np.arange(R) / 80.0)).astype(np.float32)
        h[:, :5] = 0.0
        h[np.arange(B), [5, 17, 40]] = 3.0       # peak = direct path
        y = np.asarray(augment.add_reverb(x, h, lengths))
        ref = self._numpy_reverb(x, h, lengths)
        assert np.max(np.abs(y - ref)) < 2e-3 * max(1.0, np.abs(ref).max())

    def test_delayed_delta_realigns(self):
        # RIR = delta at lag d: with shift_to_peak the output must be the
        # (masked, renormalized) dry signal again — timestamps survive.
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 3000)).astype(np.float32)
        lengths = np.array([3000])
        h = np.zeros(200, np.float32)
        h[77] = 0.5
        y = np.asarray(augment.add_reverb(x, h, lengths))
        np.testing.assert_allclose(y[0], x[0], atol=2e-4)

    def test_no_shift_keeps_delay(self):
        x = np.zeros((1, 100), np.float32)
        x[0, 10] = 1.0
        h = np.zeros(32, np.float32)
        h[7] = 1.0
        y = np.asarray(augment.add_reverb(
            x, h, np.array([100]), shift_to_peak=False, normalize=False))
        assert abs(y[0, 17] - 1.0) < 1e-5 and abs(y[0, 10]) < 1e-5

    def test_padding_untouched_and_silence_safe(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 2000)).astype(np.float32)
        lengths = np.array([1500, 0])
        h = rng.standard_normal(128).astype(np.float32)
        y = np.asarray(augment.add_reverb(x, h, lengths))
        assert np.all(y[0, 1500:] == 0.0)
        assert np.all(y[1] == 0.0)               # all-padding utterance

    def test_property_random_geometry(self):
        from hypothesis import given, settings, strategies as st

        @given(n=st.integers(300, 5000), r=st.integers(1, 300),
               lfrac=st.floats(0.0, 1.0), seed=st.integers(0, 2**31))
        @settings(max_examples=20, deadline=None)
        def check(n, r, lfrac, seed):
            rng = np.random.default_rng(seed)
            x = rng.standard_normal((1, n)).astype(np.float32)
            h = rng.standard_normal(r).astype(np.float32)
            lengths = np.array([int(round(lfrac * n))])
            y = np.asarray(augment.add_reverb(x, h, lengths))
            ref = self._numpy_reverb(x, h[None], lengths)
            scale = max(1.0, np.abs(ref).max())
            assert np.max(np.abs(y - ref)) < 2e-3 * scale
            assert np.all(y[0, lengths[0]:] == 0.0)

        check()

    def test_normalize_preserves_power(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        lengths = np.array([5000, 4096])
        h = (rng.standard_normal((2, 300))
             * np.exp(-np.arange(300) / 50.0)).astype(np.float32)
        y = np.asarray(augment.add_reverb(x, h, lengths))
        for b in range(2):
            p_in = np.sum(np.square(x[b, :lengths[b]], dtype=np.float64))
            p_out = np.sum(np.square(y[b], dtype=np.float64))
            np.testing.assert_allclose(p_out, p_in, rtol=1e-3)


class TestSpeedPerturb:
    def test_length_and_pitch_shift(self):
        from tpufeat.augment import speed_perturb
        sr = 16000
        t = np.arange(sr) / sr
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
        for factor in (0.9, 1.1):
            y = np.asarray(speed_perturb(x, sr, factor))[0]
            assert abs(y.shape[0] - round(sr / factor)) <= 2
            # dominant frequency moves to 440*factor
            spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
            f_peak = np.argmax(spec) * sr / len(y)
            assert abs(f_peak - 440.0 * factor) < 5.0, (factor, f_peak)

    def test_identity_and_validation(self):
        import pytest
        from tpufeat.augment import speed_perturb
        x = np.zeros((1, 100), np.float32)
        y = np.asarray(speed_perturb(x, 16000, 1.0))
        y2, l2 = speed_perturb(x, 16000, 1.0, lengths=np.array([70]))
        np.testing.assert_array_equal(np.asarray(l2), [70])
        assert y.shape == (1, 100)
        with pytest.raises(ValueError, match="integral"):
            speed_perturb(x, 16000, 1.0001)


class TestSpeedPerturbBatched:
    def test_padded_batch_with_lengths(self):
        """Padded rows' valid prefixes == lone-utterance perturbation;
        new lengths follow ceil(n*p/q)."""
        from tpufeat.augment import speed_perturb
        rng = np.random.default_rng(11)
        a = rng.standard_normal(16000).astype(np.float32)
        b = rng.standard_normal(11000).astype(np.float32)
        x = np.zeros((2, 16000), np.float32)
        x[0], x[1, :11000] = a, b
        y, nl = speed_perturb(x, 16000, 0.9, lengths=np.array([16000,
                                                               11000]))
        y, nl = np.asarray(y), np.asarray(nl)
        for sig, n, row in [(a, 16000, 0), (b, 11000, 1)]:
            lone = np.asarray(speed_perturb(sig[None], 16000, 0.9))[0]
            # factor 0.9 -> 14400->16000 Hz = x10/9 samples (slower=longer)
            assert nl[row] == lone.shape[0] == -(-n * 10 // 9)
            np.testing.assert_allclose(y[row, : nl[row]],
                                       lone[: nl[row]], atol=1e-6)


class TestStreamingEnergyVAD:
    def _speech_like(self, n=16000, seed=60, loud_first=False):
        rng = np.random.default_rng(seed)
        x = 0.001 * rng.standard_normal(n).astype(np.float32)
        # loud bursts
        a, b = (0, n // 4) if loud_first else (n // 2, 3 * n // 4)
        x[a:b] += 0.5 * np.sin(
            2 * np.pi * 220 * np.arange(b - a) / 16000).astype(np.float32)
        return x

    def test_chunk_plan_invariance(self):
        from tpufeat.augment import StreamingEnergyVAD
        x = self._speech_like()
        plans = [[16000], [160] * 100, [37, 4000, 1, 11962],
                 [7000, 9000]]
        rows = []
        for plan in plans:
            v = StreamingEnergyVAD()
            outs, pos = [], 0
            for c in plan:
                outs.append(np.asarray(v.process(x[None, pos:pos + c])))
                pos += c
            rows.append(np.concatenate(outs, axis=1))
        for r in rows[1:]:
            np.testing.assert_array_equal(r, rows[0])

    def test_matches_offline_when_peak_first(self):
        from tpufeat.augment import StreamingEnergyVAD, energy_vad
        x = self._speech_like(loud_first=True)
        want = np.asarray(energy_vad(x[None], np.asarray([len(x)])))
        v = StreamingEnergyVAD()
        got = np.concatenate(
            [np.asarray(v.process(x[None, i:i + 3200]))
             for i in range(0, len(x), 3200)], axis=1)
        F = got.shape[1]
        assert F > 0
        np.testing.assert_array_equal(got, want[:, :F])

    def test_only_more_permissive_early(self):
        """Online decisions can only ADD speech frames vs offline (the
        running peak is <= the global peak)."""
        from tpufeat.augment import StreamingEnergyVAD, energy_vad
        x = self._speech_like(loud_first=False)
        want = np.asarray(energy_vad(x[None], np.asarray([len(x)])))
        v = StreamingEnergyVAD()
        got = np.concatenate(
            [np.asarray(v.process(x[None, i:i + 1600]))
             for i in range(0, len(x), 1600)], axis=1)
        F = got.shape[1]
        assert (want[:, :F] & ~got).sum() == 0    # offline-speech ⊆ online
        # and from the global peak frame on, they agree exactly
        frame_e = np.asarray(
            [(x[t * 160: t * 160 + 400] ** 2).sum() for t in range(F)])
        peak_t = int(np.argmax(frame_e))
        np.testing.assert_array_equal(got[:, peak_t:F],
                                      want[:, peak_t:F])

    def test_reset_rows_zeros_prefix_decisions(self):
        """Slot recycle: after reset_rows([0]), row 0's decisions equal a
        zeros-prefix stream's under the same chunk plan (the new caller
        is judged against ITS OWN running peak, not the previous
        caller's), and row 1 is bit-unchanged."""
        from tpufeat.augment import StreamingEnergyVAD
        plan = [1600, 4800, 1600, 4800, 3200]
        x = np.stack([self._speech_like(seed=62, loud_first=True),
                      self._speech_like(seed=63)])

        def run(v, sig, reset_at=None):
            outs, pos = [], 0
            for i, c in enumerate(plan):
                outs.append(np.asarray(v.process(sig[:, pos:pos + c])))
                pos += c
                if reset_at is not None and i == reset_at:
                    v.reset_rows([0])
            return np.concatenate(outs, axis=1)

        ref = run(StreamingEnergyVAD(batch_size=2), x)
        v = StreamingEnergyVAD(batch_size=2)
        got = run(v, x, reset_at=1)
        np.testing.assert_array_equal(got[1], ref[1])
        xz = x.copy()
        xz[0, :sum(plan[:2])] = 0.0                # zeros-prefix oracle
        oracle = run(StreamingEnergyVAD(batch_size=2), xz)
        f_pre = 1 + (sum(plan[:2]) - 400) // 160   # flags emitted pre-reset
        np.testing.assert_array_equal(got[0, f_pre:], oracle[0, f_pre:])
        # the loud prefix peak must NOT gate the reset row's quiet tail:
        # without the reset the tail would be judged against seed-62's
        # 0.5-amplitude burst and stay silent
        assert got[0, f_pre:].any()
        assert not ref[0, f_pre:].any()

    def test_state_roundtrip(self, tmp_path):
        from tpufeat import streaming
        from tpufeat.augment import StreamingEnergyVAD
        x = self._speech_like(seed=61)
        v1 = StreamingEnergyVAD()
        out1 = np.asarray(v1.process(x[None, :7000]))
        p = str(tmp_path / "vad.npz")
        streaming.save_state(p, v1.state())
        v2 = StreamingEnergyVAD()
        v2.set_state(streaming.load_state(p, v2.state()))
        a = np.asarray(v1.process(x[None, 7000:]))
        b = np.asarray(v2.process(x[None, 7000:]))
        np.testing.assert_array_equal(a, b)
        assert out1.shape[1] + a.shape[1] == 1 + (16000 - 400) // 160


class TestKaldiVad:
    """Kaldi compute-vad (VadEnergyOptions) semantics."""

    @staticmethod
    def _oracle(e, n, thr, scale, ctx, prop):
        e = np.asarray(e, np.float64)
        out = np.zeros(e.shape, bool)
        for b in range(e.shape[0]):
            T = int(n[b])
            if T == 0:
                continue
            t0 = thr + scale * e[b, :T].mean()
            for t in range(T):
                lo, hi = max(0, t - ctx), min(T - 1, t + ctx)
                win = e[b, lo:hi + 1]
                num = (win > t0).sum()
                out[b, t] = num >= prop * (hi - lo + 1)
        return out

    @pytest.mark.parametrize("ctx,prop", [(0, 0.6), (2, 0.6), (5, 0.3)])
    def test_matches_oracle(self, ctx, prop):
        from tpufeat.augment import kaldi_vad
        r = np.random.default_rng(ctx)
        e = r.normal(3.0, 4.0, (3, 40)).astype(np.float32)
        n = np.array([40, 25, 7])
        got = np.asarray(kaldi_vad(e, n, frames_context=ctx,
                                   proportion_threshold=prop))
        want = self._oracle(e, n, 5.0, 0.5, ctx, prop)
        np.testing.assert_array_equal(got, want)
        assert not got[1, 25:].any() and not got[2, 7:].any()

    def test_mean_scale_and_threshold(self):
        from tpufeat.augment import kaldi_vad
        e = np.array([[0.0, 10.0, 10.0, 0.0]])
        # mean 5 -> threshold 5 + 0.5*5 = 7.5
        np.testing.assert_array_equal(
            np.asarray(kaldi_vad(e))[0], [False, True, True, False])
        # mean_scale 0: fixed threshold 5.0 — same here
        got = kaldi_vad(e, energy_mean_scale=0.0, energy_threshold=-1.0)
        assert np.asarray(got).all()

    def test_single_track_1d(self):
        from tpufeat.augment import kaldi_vad
        out = np.asarray(kaldi_vad(np.array([0.0, 10.0, 10.0, 0.0])))
        assert out.shape == (4,)

    def test_c0_from_extract(self):
        """The documented usage: c0 of a kaldi-mode MFCC config."""
        from tpufeat import features
        from tpufeat.augment import kaldi_vad
        from conftest import make_signal
        import dataclasses
        from tpufeat.config import MFCC13_HTK
        sig = np.zeros((2, 8000), np.float32)
        sig[0] = make_signal(8000, seed=1)
        sig[1, :6400] = make_signal(6400, seed=2)
        res = features.extract(sig, np.array([8000, 6400]),
                               cfg=MFCC13_HTK)
        v = np.asarray(kaldi_vad(np.asarray(res.features)[..., 0],
                                 np.asarray(res.num_frames)))
        assert v.shape == res.features.shape[:2]
        assert v.any(axis=1).all()      # both utterances have speech

    def test_scalar_count_for_single_track(self):
        from tpufeat.augment import kaldi_vad
        e = np.array([0.0, 10.0, 10.0, 0.0, 5.0])
        got = np.asarray(kaldi_vad(e, 4))
        assert got.shape == (5,)
        assert not got[4]                    # beyond the scalar count
