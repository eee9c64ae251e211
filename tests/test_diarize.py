"""Diarization tests (tpufeat/diarization.py): sliding-window grid math,
slice-arithmetic segment i-vectors vs the per-window oracle, PLDA
affinity + agglomerative clustering, and who-spoke-when end to end on
synthetic multi-speaker audio features."""

import numpy as np
import pytest

from tpufeat import diarization as dz
from tpufeat import ivector as iv
from tpufeat import plda as pl


class TestSlidingWindows:
    def test_regular_grid(self):
        spans = dz.sliding_windows(300, window=150, period=75)
        np.testing.assert_array_equal(spans, [(0, 150), (75, 225),
                                              (150, 300)])

    def test_clamped_tail(self):
        spans = dz.sliding_windows(310, window=150, period=75)
        np.testing.assert_array_equal(
            spans, [(0, 150), (75, 225), (150, 300), (225, 310)])

    def test_short_tail_dropped(self):
        spans = dz.sliding_windows(310, window=150, period=75,
                                   min_window=100)
        np.testing.assert_array_equal(spans, [(0, 150), (75, 225),
                                              (150, 300)])

    def test_short_audio_single_window(self):
        np.testing.assert_array_equal(
            dz.sliding_windows(40, window=150, period=75), [(0, 40)])
        np.testing.assert_array_equal(
            dz.sliding_windows(10, window=150, period=75,
                               min_window=25), [(0, 10)])

    def test_validation(self):
        with pytest.raises(ValueError, match="multiple"):
            dz.sliding_windows(100, window=100, period=33)
        with pytest.raises(ValueError, match=">= 1"):
            dz.sliding_windows(0)
        with pytest.raises(ValueError, match=">= 1"):
            dz.sliding_windows(10, window=0, period=1)


def _speakers_fixture(seed=0, dim=8, n_spk=12):
    """UBM + extractor + PLDA trained on a background population of
    ``n_spk`` speakers (PLDA's between-class covariance needs many
    speakers — with 3 it is rank-starved and scores are flat), plus a
    draw function for labeled utterance frames. Diarization tests use
    the first few speakers as the "recording" voices."""
    r = np.random.default_rng(seed)
    offs = r.standard_normal((n_spk, dim)) * 3.0

    def draw(spk, n, s):
        rr = np.random.default_rng(s)
        return (offs[spk] + rr.standard_normal((n, dim))).astype(
            np.float32)

    frames = np.concatenate([draw(s, 200, 100 + s)
                             for s in range(n_spk)])
    ubm = iv.train_diag_ubm(frames, 8, iters=2, final_iters=3, seed=0)
    utts, ids = [], []
    for s in range(n_spk):
        for u in range(6):
            utts.append(draw(s, 150, 200 + 10 * s + u))
            ids.append(s)
    ext = iv.train_ivector_extractor(ubm, utts, ivector_dim=8, iters=4,
                                     seed=1)
    ivs = np.stack([np.asarray(iv.utterance_ivector(ext, u), np.float64)
                    for u in utts])
    model = pl.train_plda(ivs, ids, iters=6)
    return ext, model, draw


@pytest.fixture(scope="module")
def spk():
    return _speakers_fixture()


class TestSegmentIvectors:
    def test_matches_per_window_oracle(self, spk):
        ext, _, draw = spk
        feats = np.concatenate([draw(0, 200, 1), draw(1, 163, 2)])
        got, spans = dz.segment_ivectors(ext, feats, window=100,
                                         period=50, min_post=0.0)
        got = np.asarray(got)
        assert got.shape == (len(spans), ext.ivector_dim)
        for i, (s, e) in enumerate(spans):
            want = np.asarray(iv.utterance_ivector(ext, feats[s:e]))
            np.testing.assert_allclose(got[i], want, atol=2e-4,
                                       rtol=1e-4)

    def test_clamped_tail_matches_oracle(self, spk):
        ext, _, draw = spk
        feats = draw(2, 287, 3)                    # ragged tail window
        got, spans = dz.segment_ivectors(ext, feats, window=100,
                                         period=50, min_post=0.0)
        assert spans[-1][1] == 287
        for i, (s, e) in enumerate(spans):
            want = np.asarray(iv.utterance_ivector(ext, feats[s:e]))
            np.testing.assert_allclose(np.asarray(got)[i], want,
                                       atol=2e-4, rtol=1e-4)

    def test_mask_gates_frames(self, spk):
        ext, _, draw = spk
        feats = draw(0, 200, 4)
        mask = np.ones(200, np.float32)
        mask[100:] = 0.0
        got, spans = dz.segment_ivectors(ext, feats, window=100,
                                         period=50, min_post=0.0,
                                         mask=mask)
        # a fully-masked window carries zero stats -> prior mean (zeros)
        full_silence = [i for i, (s, e) in enumerate(spans) if s >= 100]
        assert full_silence
        np.testing.assert_allclose(np.asarray(got)[full_silence], 0.0,
                                   atol=1e-6)
        # the first window only sees unmasked frames -> equals oracle
        want = np.asarray(iv.utterance_ivector(ext, feats[:100]))
        np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-4,
                                   rtol=1e-4)

    def test_validates(self, spk):
        ext, _, draw = spk
        with pytest.raises(ValueError, match="features"):
            dz.segment_ivectors(ext, np.zeros((10, ext.ubm.dim + 1)))
        with pytest.raises(ValueError, match="mask"):
            dz.segment_ivectors(ext, draw(0, 100, 5),
                                mask=np.ones(99))


class TestClustering:
    def test_block_affinity(self):
        aff = np.full((6, 6), -5.0)
        for blk in (slice(0, 3), slice(3, 6)):
            aff[blk, blk] = 5.0
        labels = dz.cluster_affinity(aff, num_speakers=2)
        np.testing.assert_array_equal(labels, [0, 0, 0, 1, 1, 1])
        # threshold mode finds the same two clusters
        labels_t = dz.cluster_affinity(aff, threshold=0.0)
        np.testing.assert_array_equal(labels_t, labels)

    def test_threshold_extremes(self):
        aff = np.full((4, 4), 2.0)
        assert len(set(dz.cluster_affinity(aff, threshold=0.0))) == 1
        aff2 = np.full((4, 4), -2.0)
        np.fill_diagonal(aff2, 5.0)
        assert len(set(dz.cluster_affinity(aff2, threshold=0.0))) == 4

    def test_single_segment(self):
        np.testing.assert_array_equal(
            dz.cluster_affinity(np.zeros((1, 1))), [0])

    def test_validates(self):
        with pytest.raises(ValueError, match="square"):
            dz.cluster_affinity(np.zeros((2, 3)))
        with pytest.raises(ValueError, match="num_speakers"):
            dz.cluster_affinity(np.zeros((3, 3)), num_speakers=5)


class TestDiarize:
    def _alternating(self, draw, plan, seed0=700):
        feats = np.concatenate([draw(s, n, seed0 + i)
                                for i, (s, n) in enumerate(plan)])
        truth = np.concatenate([np.full(n, s) for s, n in plan])
        return feats, truth

    @staticmethod
    def _purity(labels, truth):
        """Fraction of frames correct under the best label->speaker
        mapping (greedy per cluster — fine for these sizes)."""
        ok = 0
        for lab in set(labels[labels >= 0]):
            sel = labels == lab
            vals, counts = np.unique(truth[sel], return_counts=True)
            ok += counts.max()
        return ok / len(truth)

    def test_two_speakers_known_count(self, spk):
        ext, model, draw = spk
        feats, truth = self._alternating(
            draw, [(0, 300), (1, 300), (0, 300), (1, 300)])
        labels, segments = dz.diarize(ext, model, feats, window=150,
                                      period=75, num_speakers=2)
        assert len(set(labels)) == 2
        assert self._purity(labels, truth) > 0.85
        # segments tile the recording
        assert segments[0][0] == 0 and segments[-1][1] == len(feats)
        assert all(a[1] == b[0] for a, b in zip(segments, segments[1:]))

    def test_three_speakers_threshold(self, spk):
        ext, model, draw = spk
        feats, truth = self._alternating(
            draw, [(0, 300), (1, 300), (2, 300), (0, 300), (2, 300)])
        labels, _ = dz.diarize(ext, model, feats, window=150, period=75,
                               threshold=0.0)
        assert self._purity(labels, truth) > 0.8
        assert 2 <= len(set(labels)) <= 4      # ~3 speakers discovered

    def test_vad_mask_labels_silence(self, spk):
        ext, model, draw = spk
        feats, _ = self._alternating(draw, [(0, 300), (1, 300)])
        mask = np.ones(600, np.float32)
        mask[280:320] = 0.0
        labels, segments = dz.diarize(ext, model, feats, window=150,
                                      period=75, num_speakers=2,
                                      mask=mask)
        assert (labels[280:320] == -1).all()
        for s, e, lab in segments:
            assert lab >= 0
            assert not (s >= 280 and e <= 320)


class TestRttmAndCli:
    def test_write_rttm(self, tmp_path):
        p = str(tmp_path / "out.rttm")
        dz.write_rttm(p, "rec1", [(0, 100, 0), (100, 250, 1)])
        lines = open(p).read().strip().split("\n")
        assert lines[0] == ("SPEAKER rec1 1 0.000 1.000 <NA> <NA> "
                            "spk0 <NA> <NA>")
        assert lines[1].split()[3:5] == ["1.000", "1.500"]

    def test_cli_end_to_end(self, tmp_path, capsys, spk):
        """WAV -> RTTM through main(): plumbing, not clustering quality
        (the models come from the synthetic fixture; the audio is a real
        WAV whose MFCCs the tiny models happily window and score)."""
        from tpufeat import io, features
        from tpufeat.config import MFCC13_HTK
        import json
        rng = np.random.default_rng(0)
        sig = (rng.standard_normal(48000) * 0.1).astype(np.float32)
        wav = str(tmp_path / "rec.wav")
        io.write_wav(wav, sig, 16000)
        # train a throwaway 13-dim stack on the wav's own features
        x, _ = io.read_wav(wav)
        feats = np.asarray(features.extract(x, cfg=MFCC13_HTK).features)
        ubm = iv.train_diag_ubm(feats, 2, iters=1, final_iters=2, seed=0)
        ext = iv.train_ivector_extractor(ubm, [feats[:150], feats[150:]],
                                         ivector_dim=4, iters=2, seed=0)
        r = np.random.default_rng(1)
        ivs = np.concatenate([r.standard_normal((8, 4)) + off
                              for off in (-2.0, 2.0)])
        model = pl.train_plda(ivs, [0] * 8 + [1] * 8, iters=3)
        ext_p = str(tmp_path / "ext.npz")
        plda_p = str(tmp_path / "plda.npz")
        ext.save(ext_p)
        model.save(plda_p)
        rttm = str(tmp_path / "rec.rttm")
        rc = dz.main([wav, rttm, "--extractor", ext_p, "--plda", plda_p,
                      "--num-speakers", "2", "--vad-db", "40"])
        assert rc == 0
        info = json.loads(capsys.readouterr().err.strip().split("\n")[-1])
        assert info["recording"] == "rec"
        lines = [ln.split() for ln in open(rttm).read().strip().split("\n")]
        assert all(ln[0] == "SPEAKER" and ln[1] == "rec" for ln in lines)
        # segments tile [0, audio] in seconds
        t_end = float(lines[-1][3]) + float(lines[-1][4])
        assert abs(t_end - feats.shape[0] * 0.01) < 0.02
        # kaldi-format plda loads too
        model.save_kaldi(str(tmp_path / "plda.kaldi"))
        rc = dz.main([wav, "-", "--extractor", ext_p,
                      "--plda", str(tmp_path / "plda.kaldi"),
                      "--num-speakers", "2"])
        assert rc == 0
        assert "SPEAKER rec 1" in capsys.readouterr().out

    def test_cli_validates(self, tmp_path, spk):
        ext, model, _ = spk
        from tpufeat import io
        wav = str(tmp_path / "a.wav")
        io.write_wav(wav, np.zeros(8000, np.float32), 8000)
        ext_p = str(tmp_path / "e.npz")
        plda_p = str(tmp_path / "p.npz")
        ext.save(ext_p)
        model.save(plda_p)
        with pytest.raises(ValueError, match="UBM dim"):
            dz.main([wav, "-", "--extractor", ext_p, "--plda", plda_p])


class TestBucketedFrames:
    """bucket_frames=True: corpus-friendly compile behavior — padded
    length grid, identical statistics on the kept windows."""

    def test_matches_exact_on_common_spans(self, spk):
        ext, _, draw = spk
        for T in (287, 463, 600):
            feats = draw(0, T, 800 + T)
            exact, spans_e = dz.segment_ivectors(ext, feats, window=100,
                                                 period=50, min_post=0.0)
            buck, spans_b = dz.segment_ivectors(ext, feats, window=100,
                                                period=50, min_post=0.0,
                                                bucket_frames=True)
            # every exact span appears in the bucketed set with the same
            # clamped end and (to f32 noise) the same i-vector
            se = {tuple(s): i for i, s in enumerate(spans_e.tolist())}
            sb = {tuple(s): i for i, s in enumerate(spans_b.tolist())}
            assert set(se).issubset(set(sb)), (T, se, sb)
            for s, i in se.items():
                np.testing.assert_allclose(
                    np.asarray(buck)[sb[s]], np.asarray(exact)[i],
                    atol=3e-4, rtol=1e-4)

    def test_one_program_per_bucket(self, spk):
        ext, _, draw = spk
        before = dz._segment_ivectors_jit.cache_info().currsize
        for T in (300, 310, 320, 330):      # same sqrt(2) bucket
            dz.segment_ivectors(ext, draw(1, T, 900 + T), window=100,
                                period=50, bucket_frames=True)
        added = dz._segment_ivectors_jit.cache_info().currsize - before
        assert added <= 1, added

    def test_diarize_bucketed(self, spk):
        ext, model, draw = spk
        feats = np.concatenate([draw(0, 300, 910), draw(1, 300, 911)])
        labels, segs = dz.diarize(ext, model, feats, num_speakers=2,
                                  window=150, period=75,
                                  bucket_frames=True)
        assert labels.shape == (600,)
        assert segs[-1][1] == 600
        assert labels[0] != labels[-1]


class TestStreamingDiarizer:
    def _run(self, sd, feats, plan):
        labs, pos = [], 0
        for c in plan:
            out, start = sd.process(feats[pos: pos + c])
            assert start == sum(len(x) for x in labs)
            labs.append(out)
            pos += c
        out, start = sd.flush()
        assert start == sum(len(x) for x in labs)
        labs.append(out)
        got = np.concatenate(labs)
        assert got.shape == (feats.shape[0],)
        return got

    def test_enroll_cap_and_recenter_beat_plain_greedy(self, spk):
        """Round-4 robustness knobs: on a 6-speaker turn-taking stream
        the capped + re-centering defaults must beat the plain greedy
        configuration (measured 0.60 -> 0.89 window agreement on the
        diarize_long_bench world; the uncapped enrollment posterior
        over-sharpens around boundary-contaminated centroids)."""
        ext, model, draw = spk
        rr = np.random.default_rng(4)
        parts, tp = [], []
        for i in range(24):
            s = int(rr.integers(0, 6))
            n = int(rr.integers(150, 500))
            parts.append(draw(s, n, 7000 + i))
            tp.append(np.full(n, s))
        feats = np.concatenate(parts)
        truth = np.concatenate(tp)
        plan = [500] * (len(feats) // 500) + [len(feats) % 500]

        def run(**kw):
            sd = dz.StreamingDiarizer(ext, model, max_speakers=6, **kw)
            return TestDiarize._purity(self._run(sd, feats, plan), truth)

        plain = run(enroll_cap=None, recenter=0)
        tuned = run()                               # the defaults
        # this fixture world is deliberately hard (1.5-5 s turns, about
        # the window size, so many windows mix speakers): measured
        # 0.595 plain -> 0.620 cap-only -> 0.682 tuned
        assert tuned > plain + 0.05, (tuned, plain)
        assert tuned > 0.65, tuned

    def test_two_speakers_online(self, spk):
        ext, model, draw = spk
        feats = np.concatenate([draw(0, 400, 920), draw(1, 400, 921),
                                draw(0, 400, 922)])
        sd = dz.StreamingDiarizer(ext, model, window=150, period=75,
                                  threshold=0.0)
        labels = self._run(sd, feats, [160] * 7 + [80])
        assert sd.num_speakers >= 2
        # the A | B | A structure: first and last thirds mostly agree,
        # middle third mostly differs
        first = np.bincount(labels[:350]).argmax()
        mid = np.bincount(labels[450:750]).argmax()
        last = np.bincount(labels[850:]).argmax()
        assert first == last != mid
        purity = TestDiarize._purity(
            labels, np.concatenate([np.zeros(400), np.ones(400),
                                    np.zeros(400)]))
        assert purity > 0.8, purity

    def test_chunk_plan_invariant(self, spk):
        ext, model, draw = spk
        feats = np.concatenate([draw(0, 300, 930), draw(2, 300, 931)])
        plans = [[600], [75] * 8, [37, 113, 225, 150, 75],
                 [1] * 10 + [590]]
        outs = []
        for plan in plans:
            sd = dz.StreamingDiarizer(ext, model)
            outs.append(self._run(sd, feats, plan))
        for o in outs[1:]:
            np.testing.assert_array_equal(o, outs[0])

    def test_window_ivectors_match_offline_segments(self, spk):
        """Cross-contract with the OFFLINE path: the streaming
        diarizer's per-window i-vectors (device-projected block stats +
        host ring solve) must match segment_ivectors' full windows on
        the same grid to f32 roundoff — same algebra
        (`ivector._damped_solve` with max_count=0), different
        execution split."""
        ext, model, draw = spk
        feats = np.concatenate([draw(0, 400, 970), draw(1, 350, 971)])
        sd = dz.StreamingDiarizer(ext, model)       # window 150/period 75
        pos = 0
        for c in [130, 260, 80, 280]:               # 750 = 10 periods
            sd.process(feats[pos: pos + c])
            pos += c
        got = np.stack(sd._wivs)                    # full windows only
        ivs_off, spans = dz.segment_ivectors(ext, feats)
        full = (spans[:, 1] - spans[:, 0]) == 150
        want = np.asarray(ivs_off, np.float64)[full]
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)

    def test_max_speakers_cap(self, spk):
        ext, model, draw = spk
        feats = np.concatenate([draw(s, 225, 940 + s)
                                for s in range(4)])
        sd = dz.StreamingDiarizer(ext, model, max_speakers=2,
                                  threshold=1e9)   # always spawn if free
        self._run(sd, feats, [225] * 4)
        assert sd.num_speakers == 2

    def test_short_stream_flush(self, spk):
        ext, model, draw = spk
        feats = draw(1, 40, 950)            # shorter than one window
        sd = dz.StreamingDiarizer(ext, model)
        out, start = sd.process(feats)
        assert out.size == 0
        out, start = sd.flush()
        assert start == 0 and out.shape == (40,)
        assert (out == out[0]).all()

    def test_reset_and_validation(self, spk):
        ext, model, draw = spk
        sd = dz.StreamingDiarizer(ext, model)
        self._run(sd, draw(0, 200, 960), [200])
        sd.reset()
        assert sd.num_speakers == 0
        out, start = sd.flush()
        assert out.size == 0 and start == 0
        sd.reset()                      # flush is terminal (lifecycle
        with pytest.raises(ValueError, match="multiple"):  # tests cover it)
            dz.StreamingDiarizer(ext, model, window=100, period=33)
        with pytest.raises(ValueError, match="expected"):
            sd.process(np.zeros((5, ext.ubm.dim + 2)))


class TestStreamingDiarizerLifecycle:
    """Review-3 fixes: terminal flush, true tail-window center."""

    def test_flush_is_terminal(self, spk):
        ext, model, draw = spk
        sd = dz.StreamingDiarizer(ext, model)
        sd.process(draw(0, 460, 980))
        a, _ = sd.flush()
        n_spk = sd.num_speakers
        n_win = len(sd._centers)
        b, start = sd.flush()               # idempotent: nothing new
        assert b.size == 0 and start == 460
        assert sd.num_speakers == n_spk and len(sd._centers) == n_win
        with pytest.raises(RuntimeError, match="flushed"):
            sd.process(draw(0, 10, 981))
        sd.reset()
        sd.process(draw(0, 10, 982))        # reusable after reset

    def test_tail_center_uses_true_end(self, spk):
        ext, model, draw = spk
        sd = dz.StreamingDiarizer(ext, model, window=150, period=75)
        sd.process(draw(0, 160, 983))
        sd.flush()
        # final window covers true frames [75, 160): center ~117.5, not
        # the padded-grid 150
        assert abs(sd._centers[-1] - 117.5) < 1e-9, sd._centers


class TestRefineLabels:
    def test_fixes_planted_errors(self, spk):
        """Flip some window labels; one refinement iteration must put
        them back (and never hurt purity on the clean labels)."""
        ext, model, draw = spk
        feats = np.concatenate([draw(0, 600, 990), draw(1, 600, 991)])
        ivecs, spans = dz.segment_ivectors(ext, feats)
        aff = dz.plda_affinity(model, ivecs)
        clean = dz.cluster_affinity(aff, num_speakers=2)
        noisy = clean.copy()
        r = np.random.default_rng(0)
        flip = r.choice(len(noisy), 2, replace=False)
        noisy[flip] = 1 - noisy[flip]
        fixed = dz.refine_labels(model, ivecs, noisy, iters=3)
        # label ids may permute; compare partitions
        agree = max((fixed == clean).mean(), (fixed != clean).mean())
        assert agree > (noisy == clean).mean()
        assert agree == 1.0, agree

    def test_idempotent_and_compact(self, spk):
        ext, model, draw = spk
        feats = draw(2, 600, 992)
        ivecs, _ = dz.segment_ivectors(ext, feats)
        labels = np.zeros(len(ivecs), np.int64)
        labels[0] = 5                      # sparse ids get compacted
        out = dz.refine_labels(model, ivecs, labels, iters=2)
        assert set(out) <= {0, 1}
        out2 = dz.refine_labels(model, ivecs, out, iters=2)
        agree = max((out2 == out).mean(), (out2 != out).mean())
        assert agree == 1.0
        with pytest.raises(ValueError):
            dz.refine_labels(model, ivecs, labels, iters=-1)

    def test_diarize_kwarg(self, spk):
        ext, model, draw = spk
        feats = np.concatenate([draw(0, 300, 993), draw(1, 300, 994)])
        labels, _ = dz.diarize(ext, model, feats, num_speakers=2,
                               refine_iters=2)
        assert set(labels) <= {0, 1}


class TestCliCorpusMode:
    def test_directory_to_one_rttm(self, tmp_path, spk, capsys):
        import json
        from tpufeat import io, features
        from tpufeat.config import MFCC13_HTK
        from tpufeat import ivector as iv2
        rng = np.random.default_rng(0)
        d = tmp_path / "wavs"
        d.mkdir()
        for i, n in enumerate((16000, 24000)):
            io.write_wav(str(d / f"r{i}.wav"),
                         (rng.standard_normal(n) * 0.1).astype(
                             np.float32), 16000)
        x, _ = io.read_wav(str(d / "r0.wav"))
        feats = np.asarray(features.extract(x, cfg=MFCC13_HTK).features)
        ubm = iv2.train_diag_ubm(feats, 2, iters=1, final_iters=2,
                                 seed=0)
        ext = iv2.train_ivector_extractor(ubm, [feats], ivector_dim=4,
                                          iters=1, seed=0)
        r = np.random.default_rng(1)
        ivs = np.concatenate([r.standard_normal((8, 4)) + off
                              for off in (-2.0, 2.0)])
        model = pl.train_plda(ivs, [0] * 8 + [1] * 8, iters=3)
        ext_p, plda_p = str(tmp_path / "e.npz"), str(tmp_path / "p.npz")
        ext.save(ext_p)
        model.save(plda_p)
        rttm = str(tmp_path / "all.rttm")
        rc = dz.main([str(d), rttm, "--extractor", ext_p,
                      "--plda", plda_p, "--num-speakers", "1"])
        assert rc == 0
        lines = [ln.split() for ln in
                 open(rttm).read().strip().split("\n")]
        recs = {ln[1] for ln in lines}
        assert recs == {"r0", "r1"}
        infos = [json.loads(ln) for ln in
                 capsys.readouterr().err.strip().split("\n")
                 if ln.startswith("{")]
        assert {i["recording"] for i in infos} == {"r0", "r1"}
        with pytest.raises(ValueError, match="no .wav"):
            empty = tmp_path / "empty"
            empty.mkdir()
            dz.main([str(empty), "-", "--extractor", ext_p,
                     "--plda", plda_p])


class TestLongForm:
    """Round-4: hours-scale two-stage clustering (per-block AHC ->
    centroid AHC) and diarize_long."""

    def _alternating(self, draw, plan, seed0=900):
        feats = np.concatenate([draw(s, n, seed0 + i)
                                for i, (s, n) in enumerate(plan)])
        truth = np.concatenate([np.full(n, s) for s, n in plan])
        return feats, truth

    def test_two_stage_matches_single_stage(self, spk):
        """On a recording whose window count forces several blocks, the
        two-stage labels must agree with single-stage AHC (same speaker
        structure discovered)."""
        ext, model, draw = spk
        plan = [(s % 3, 225) for s in range(12)]   # 3 speakers, 2700 fr
        feats, truth = self._alternating(draw, plan)
        ivecs, _ = dz.segment_ivectors(ext, feats, window=150, period=75)
        iv_np = np.asarray(ivecs)
        single = dz.cluster_affinity(dz.plda_affinity(model, iv_np),
                                     num_speakers=3)
        two = dz.two_stage_cluster(model, iv_np, block=8, num_speakers=3)
        # after centroid refinement (diarize_long's default) the two
        # partitions agree up to label permutation; raw disagreement
        # concentrates on speaker-boundary windows, which contain mixed
        # speakers and are genuinely ambiguous
        two_r = dz.refine_labels(model, iv_np, two, iters=2)
        single_r = dz.refine_labels(model, iv_np, single, iters=2)
        agree = TestDiarize._purity(two_r, single_r)
        assert agree > 0.9, agree

    def test_small_n_degenerates_to_single_stage(self, spk):
        ext, model, draw = spk
        feats, _ = self._alternating(draw, [(0, 300), (1, 300)])
        ivecs, _ = dz.segment_ivectors(ext, feats, window=150, period=75)
        iv_np = np.asarray(ivecs)
        a = dz.two_stage_cluster(model, iv_np, block=512, num_speakers=2)
        b = dz.cluster_affinity(dz.plda_affinity(model, iv_np),
                                num_speakers=2)
        np.testing.assert_array_equal(a, b)

    def test_diarize_long_end_to_end(self, spk):
        ext, model, draw = spk
        plan = [(s % 3, 225) for s in range(12)]
        feats, truth = self._alternating(plan=plan, draw=draw)
        labels, segments = dz.diarize_long(ext, model, feats,
                                           window=150, period=75,
                                           num_speakers=3, block=8)
        assert len(set(labels[labels >= 0])) <= 3
        purity = TestDiarize._purity(labels, truth)
        single, _ = dz.diarize(ext, model, feats, window=150, period=75,
                               num_speakers=3)
        # within a few boundary windows of the single-stage recipe
        assert purity > TestDiarize._purity(single, truth) - 0.05, purity
        assert purity > 0.75, purity
        assert segments[0][0] == 0 and segments[-1][1] == len(feats)

    def test_num_speakers_exceeding_fragments_raises(self, spk):
        ext, model, draw = spk
        feats, _ = self._alternating(draw, [(0, 1200)])  # one speaker
        ivecs, _ = dz.segment_ivectors(ext, feats, window=150, period=75)
        with pytest.raises(ValueError, match="fragments"):
            dz.two_stage_cluster(model, np.asarray(ivecs), block=8,
                                 num_speakers=10)

    def test_validation(self, spk):
        _, model, _ = spk
        with pytest.raises(ValueError, match="block"):
            dz.two_stage_cluster(model, np.zeros((4, model.dim)), block=1)

    def test_cli_long_mode(self, tmp_path, capsys):
        """--long routes through diarize_long (plumbing check)."""
        from tpufeat import io, features
        from tpufeat.config import MFCC13_HTK
        rng = np.random.default_rng(0)
        sig = (rng.standard_normal(48000) * 0.1).astype(np.float32)
        wav = str(tmp_path / "rec.wav")
        io.write_wav(wav, sig, 16000)
        x, _ = io.read_wav(wav)
        feats = np.asarray(features.extract(x, cfg=MFCC13_HTK).features)
        ubm = iv.train_diag_ubm(feats, 2, iters=1, final_iters=2, seed=0)
        ext = iv.train_ivector_extractor(ubm, [feats[:150], feats[150:]],
                                         ivector_dim=4, iters=2, seed=0)
        r = np.random.default_rng(1)
        ivs = np.concatenate([r.standard_normal((8, 4)) + off
                              for off in (-2.0, 2.0)])
        model = pl.train_plda(ivs, [0] * 8 + [1] * 8, iters=3)
        ext.save(str(tmp_path / "ext.npz"))
        model.save(str(tmp_path / "plda.npz"))
        rc = dz.main([wav, "-", "--extractor", str(tmp_path / "ext.npz"),
                      "--plda", str(tmp_path / "plda.npz"),
                      "--num-speakers", "2", "--long", "--block", "4"])
        assert rc == 0
        assert "SPEAKER rec 1" in capsys.readouterr().out
