"""PLDA backend tests (tpufeat/plda.py): two-covariance EM training,
simultaneous diagonalization, GEMM-native batched trial scoring vs the
float64 golden loop in tpufeat/reference/cpu.py, Kaldi <Plda> binary
interchange, and the utilities (length norm, speaker means)."""

import numpy as np
import pytest

from tpufeat import plda as pl
from tpufeat.reference import cpu as golden


def _synthetic(seed=0, n_spk=60, n_per=8, dim=12,
               between_scale=2.0, within_scale=1.0):
    """Draw i-vectors from the exact two-covariance generative model:
    anisotropic between-class covariance (decaying spectrum) plus an
    anisotropic within-class covariance, shifted by a nonzero mean."""
    r = np.random.default_rng(seed)
    qb = np.linalg.qr(r.standard_normal((dim, dim)))[0]
    qw = np.linalg.qr(r.standard_normal((dim, dim)))[0]
    eb = between_scale * np.geomspace(1.0, 0.05, dim)
    ew = within_scale * np.geomspace(1.0, 0.3, dim)
    Lb = qb * np.sqrt(eb)
    Lw = qw * np.sqrt(ew)
    mean = r.standard_normal(dim) * 3.0
    spk = r.standard_normal((n_spk, dim)) @ Lb.T
    x = (mean + np.repeat(spk, n_per, axis=0)
         + r.standard_normal((n_spk * n_per, dim)) @ Lw.T)
    ids = np.repeat(np.arange(n_spk), n_per)
    return x, ids, mean, Lb @ Lb.T, Lw @ Lw.T


@pytest.fixture(scope="module")
def trained():
    x, ids, mean, Phi_b, Phi_w = _synthetic()
    model = pl.train_plda(x, ids, iters=8)
    return model, x, ids, mean, Phi_b, Phi_w


class TestUtilities:
    def test_length_normalize(self):
        r = np.random.default_rng(0)
        x = r.standard_normal((5, 16))
        y = pl.length_normalize(x)
        np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                                   np.sqrt(16), atol=1e-12)
        y1 = pl.length_normalize(x, scale_to_sqrt_dim=False)
        np.testing.assert_allclose(np.linalg.norm(y1, axis=-1), 1.0,
                                   atol=1e-12)

    def test_length_normalize_zero_safe(self):
        y = pl.length_normalize(np.zeros((2, 4)))
        assert (y == 0).all()

    def test_ivector_mean(self):
        x = np.array([[1.0, 0], [3.0, 0], [0, 2.0]])
        means, counts, spks = pl.ivector_mean(x, ["a", "a", "b"])
        np.testing.assert_allclose(means, [[2.0, 0], [0, 2.0]])
        np.testing.assert_allclose(counts, [2, 1])
        assert spks == ["a", "b"]

    def test_ivector_mean_validates(self):
        with pytest.raises(ValueError):
            pl.ivector_mean(np.zeros((3, 4)), ["a", "b"])


class TestTraining:
    def test_diagonalizes(self, trained):
        model, *_ = trained
        # recovered basis: A Phi_w A^T == I and A Phi_b A^T == diag(psi)
        # must hold for the MODEL covariances; reconstruct them back
        Ainv = np.linalg.inv(model.transform)
        Phi_w = Ainv @ Ainv.T
        Phi_b = Ainv @ np.diag(model.psi) @ Ainv.T
        np.testing.assert_allclose(
            model.transform @ Phi_w @ model.transform.T,
            np.eye(model.dim), atol=1e-8)
        np.testing.assert_allclose(
            model.transform @ Phi_b @ model.transform.T,
            np.diag(model.psi), atol=1e-8)
        assert (np.diff(model.psi) <= 1e-12).all()  # sorted descending

    def test_recovers_generative_model(self, trained):
        model, x, ids, mean, Phi_b, Phi_w = trained
        np.testing.assert_allclose(model.mean, x.mean(axis=0), atol=1e-9)
        # in the learned basis the TRUE covariances should be close to
        # (I, diag(psi)): moderate tolerances — finite-sample EM
        W = model.transform @ Phi_w @ model.transform.T
        B = model.transform @ Phi_b @ model.transform.T
        assert np.abs(W - np.eye(model.dim)).max() < 0.25
        assert np.abs(B - np.diag(np.diag(B))).max() < 0.5
        np.testing.assert_allclose(np.sort(np.diag(B))[::-1], model.psi,
                                   rtol=0.5, atol=0.3)

    def test_em_objective_monotone(self):
        x, ids, *_ = _synthetic(seed=3, n_spk=30, n_per=5)
        _, objs = pl.train_plda(x, ids, iters=6, return_objective=True)
        assert len(objs) == 7
        diffs = np.diff(objs)
        assert (diffs >= -1e-6 * np.abs(np.asarray(objs[:-1]))).all(), objs

    def test_ragged_counts(self):
        r = np.random.default_rng(7)
        x, ids, *_ = _synthetic(seed=7, n_spk=20, n_per=6)
        keep = r.random(len(ids)) < 0.7          # ragged per-spk counts
        keep[:6] = True
        model = pl.train_plda(x[keep], ids[keep], iters=4)
        assert model.dim == x.shape[1]

    def test_validation(self):
        x = np.zeros((4, 3))
        with pytest.raises(ValueError, match="2 speakers"):
            pl.train_plda(x, [0, 0, 0, 0])
        with pytest.raises(ValueError, match="labels"):
            pl.train_plda(x, [0, 1])
        with pytest.raises(ValueError, match="iters"):
            pl.train_plda(x, [0, 0, 1, 1], iters=0)
        with pytest.raises(ValueError, match="shapes"):
            pl.Plda(np.zeros(3), np.zeros((3, 2)), np.zeros(3))
        with pytest.raises(ValueError, match="non-negative"):
            pl.Plda(np.zeros(2), np.eye(2), np.array([1.0, -0.5]))


class TestScoring:
    def test_vs_golden(self, trained):
        model, *_ = trained
        r = np.random.default_rng(11)
        enroll = r.standard_normal((7, model.dim)) * 2.0
        test = r.standard_normal((9, model.dim)) * 2.0
        for nl in (True, False):
            got = np.asarray(model.score(enroll, test,
                                         normalize_length=nl))
            want = golden.plda_log_likelihood_ratio(
                model.mean, model.transform, model.psi, enroll, 1,
                test, normalize_length=nl)
            np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-4)

    def test_multi_enroll_counts(self, trained):
        model, *_ = trained
        r = np.random.default_rng(12)
        enroll = r.standard_normal((5, model.dim))
        test = r.standard_normal((4, model.dim))
        n = np.array([1, 2, 3, 5, 10])
        got = np.asarray(model.score(enroll, test, n_enroll=n))
        want = golden.plda_log_likelihood_ratio(
            model.mean, model.transform, model.psi, enroll, n, test)
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-4)
        # scalar n broadcasts
        got3 = np.asarray(model.score(enroll, test, n_enroll=3))
        want3 = golden.plda_log_likelihood_ratio(
            model.mean, model.transform, model.psi, enroll, 3, test)
        np.testing.assert_allclose(got3, want3, atol=5e-3, rtol=1e-4)

    def test_score_host_vs_golden(self, trained):
        """The f64 host twin (score_host — the streaming diarizer's
        per-decision scorer) must match the naive golden loop to f64
        roundoff, including per-enrollment counts and both length-norm
        modes."""
        model, *_ = trained
        r = np.random.default_rng(13)
        enroll = r.standard_normal((6, model.dim)) * 2.0
        test = r.standard_normal((11, model.dim)) * 2.0
        n = np.array([1, 2, 3, 5, 8, 13])
        for nl in (True, False):
            got = model.score_host(enroll, test, n_enroll=n,
                                   normalize_length=nl)
            want = golden.plda_log_likelihood_ratio(
                model.mean, model.transform, model.psi, enroll, n,
                test, normalize_length=nl)
            np.testing.assert_allclose(got, want, atol=1e-9, rtol=1e-12)
        with pytest.raises(ValueError, match="n_enroll"):
            model.score_host(enroll, test, n_enroll=0)

    def test_separates_speakers(self, trained):
        """End-to-end verification quality on held-out draws from the
        same generative model: same-speaker trials must score above
        different-speaker trials (high AUC)."""
        model, *_ = trained
        x, ids, *_ = _synthetic(seed=99, n_spk=20, n_per=6)
        means, counts, spks = pl.ivector_mean(x[::2], ids[::2])
        probes = x[1::2]
        probe_ids = ids[1::2]
        scores = np.asarray(model.score(means, probes, n_enroll=counts))
        same = scores[np.asarray(spks)[:, None] == probe_ids[None, :]]
        diff = scores[np.asarray(spks)[:, None] != probe_ids[None, :]]
        auc = (same[:, None] > diff[None, :]).mean()
        # 0.86 observed with Kaldi-exact count-aware length norm (the
        # norm is pooled-score calibration, not per-trial Bayes; the
        # pre-round-3 >0.9 came from the non-Kaldi psi+1 normalization)
        assert auc > 0.8, auc

    def test_more_enroll_sharpens(self, trained):
        """With the same enrollment mean, more utterances behind it must
        increase a matching trial's score (posterior tightens)."""
        model, *_ = trained
        u = np.full((1, model.dim), 0.7)
        s1 = float(np.asarray(model.score(u, u, n_enroll=1))[0, 0])
        s8 = float(np.asarray(model.score(u, u, n_enroll=8))[0, 0])
        assert s8 > s1

    def test_validates(self, trained):
        model, *_ = trained
        with pytest.raises(ValueError, match="n_enroll"):
            model.log_likelihood_ratio(np.zeros((2, model.dim)),
                                       np.zeros((2, model.dim)),
                                       n_enroll=0)
        with pytest.raises(ValueError, match="want"):
            model.log_likelihood_ratio(np.zeros((2, 3)),
                                       np.zeros((2, model.dim + 1)))


class TestSmoothing:
    def test_smoothing_math(self, trained):
        model, *_ = trained
        sm = model.smooth_within_class_covariance(0.1)
        s = 1.0 + 0.1 * model.psi
        np.testing.assert_allclose(sm.psi, model.psi / s)
        np.testing.assert_allclose(sm.transform,
                                   model.transform / np.sqrt(s)[:, None])
        # smoothed model still diagonalizes its implied covariances
        Ainv = np.linalg.inv(sm.transform)
        W = sm.transform @ (Ainv @ Ainv.T) @ sm.transform.T
        np.testing.assert_allclose(W, np.eye(model.dim), atol=1e-8)
        with pytest.raises(ValueError):
            model.smooth_within_class_covariance(-0.1)


class TestPersistence:
    def test_npz_roundtrip(self, trained, tmp_path):
        model, *_ = trained
        p = str(tmp_path / "plda.npz")
        model.save(p)
        back = pl.Plda.load(p)
        np.testing.assert_array_equal(back.mean, model.mean)
        np.testing.assert_array_equal(back.transform, model.transform)
        np.testing.assert_array_equal(back.psi, model.psi)

    def test_kaldi_roundtrip(self, trained, tmp_path):
        model, *_ = trained
        data = model.to_kaldi_bytes()
        assert data.startswith(b"\0B<Plda> ")
        back = pl.Plda.from_kaldi_bytes(data)
        np.testing.assert_array_equal(back.mean, model.mean)
        np.testing.assert_array_equal(back.transform, model.transform)
        np.testing.assert_array_equal(back.psi, model.psi)
        p = str(tmp_path / "plda")
        model.save_kaldi(p)
        back2 = pl.Plda.load_kaldi(p)
        np.testing.assert_array_equal(back2.psi, model.psi)

    def test_kaldi_rejects_garbage(self):
        with pytest.raises(ValueError):
            pl.Plda.from_kaldi_bytes(b"\0B<NotPlda> ")
        with pytest.raises(ValueError):
            pl.Plda.from_kaldi_bytes(b"\0B<Plda> DV \x04"
                                     + b"\xff\xff\xff\x7f")


class TestIvectorIntegration:
    def test_end_to_end_with_extractor(self):
        """Full loop on tiny synthetic data: UBM -> T-matrix ->
        utterance i-vectors -> PLDA -> same-speaker trials outscore
        different-speaker trials."""
        from tpufeat import ivector as iv
        r = np.random.default_rng(42)
        dim, n_spk, n_utt, T = 6, 12, 6, 120
        spk_off = r.standard_normal((n_spk, dim)) * 2.5
        utts, ids = [], []
        for s in range(n_spk):
            for _ in range(n_utt):
                utts.append((spk_off[s]
                             + r.standard_normal((T, dim))).astype(
                                 np.float32))
                ids.append(s)
        frames = np.concatenate(utts)
        ubm = iv.train_diag_ubm(frames, 4, iters=2, final_iters=3, seed=0)
        ext = iv.train_ivector_extractor(ubm, utts, ivector_dim=6,
                                         iters=3, seed=0)
        ivs = np.stack([np.asarray(iv.utterance_ivector(ext, u),
                                   np.float64) for u in utts])
        ivs = pl.length_normalize(ivs)
        model = pl.train_plda(ivs[::2], ids[::2], iters=5)
        means, counts, spks = pl.ivector_mean(ivs[::2], ids[::2])
        scores = np.asarray(model.score(means, ivs[1::2],
                                        n_enroll=counts))
        probe_ids = np.asarray(ids[1::2])
        same = scores[np.asarray(spks)[:, None] == probe_ids[None, :]]
        diff = scores[np.asarray(spks)[:, None] != probe_ids[None, :]]
        auc = (same[:, None] > diff[None, :]).mean()
        assert auc > 0.85, auc


class TestAdaptation:
    """Unsupervised domain adaptation (ivector-adapt-plda semantics)."""

    def test_in_domain_is_near_noop(self, trained):
        """Adapting on data drawn from the model itself barely moves it
        (no excess variance to absorb)."""
        model, x, *_ = trained
        adapted = model.adapt(x, mean_diff_scale=0.0)
        np.testing.assert_allclose(adapted.mean, x.mean(axis=0),
                                   atol=1e-9)
        np.testing.assert_allclose(np.sort(adapted.psi)[::-1], adapted.psi)
        # total covariance in the adapted diagonal basis stays close to
        # the model's (1 + psi)
        assert np.abs(adapted.psi - model.psi).max() < 0.35 * (
            1.0 + model.psi.max())

    def test_still_diagonalizes(self, trained):
        model, x, *_ = trained
        r = np.random.default_rng(5)
        shifted = x + r.standard_normal(model.dim) * 2.0
        adapted = model.adapt(shifted)
        Ainv = np.linalg.inv(adapted.transform)
        W = adapted.transform @ (Ainv @ Ainv.T) @ adapted.transform.T
        np.testing.assert_allclose(W, np.eye(model.dim), atol=1e-8)
        np.testing.assert_allclose(adapted.mean, shifted.mean(axis=0))

    def test_excess_variance_absorbed(self, trained):
        """Inflating the data along one direction must grow the adapted
        model's total variance along it."""
        model, x, *_ = trained
        r = np.random.default_rng(6)
        u = r.standard_normal(model.dim)
        u /= np.linalg.norm(u)
        inflated = x + np.outer(r.standard_normal(len(x)) * 3.0, u)
        adapted = model.adapt(inflated)

        def total_var(m, d):
            # model total covariance along direction d (original space)
            Ainv = np.linalg.inv(m.transform)
            tot = Ainv @ np.diag(1.0 + m.psi) @ Ainv.T
            return d @ tot @ d

        assert total_var(adapted, u) > total_var(model, u) + 1.0

    def test_improves_shifted_domain_scoring(self, trained):
        """Same/different separation on a mean-shifted domain improves
        after adapting on that domain's unlabeled vectors."""
        model, *_ = trained
        x, ids, *_ = _synthetic(seed=55, n_spk=25, n_per=6)
        shift = np.full(x.shape[1], 4.0)
        xs = x + shift

        def auc(m):
            means, counts, spks = pl.ivector_mean(xs[::2], ids[::2])
            sc = np.asarray(m.score(means, xs[1::2], n_enroll=counts))
            t = ids[1::2]
            same = sc[np.asarray(spks)[:, None] == t[None, :]]
            diff = sc[np.asarray(spks)[:, None] != t[None, :]]
            return (same[:, None] > diff[None, :]).mean()

        adapted = model.adapt(xs)
        assert auc(adapted) >= auc(model) - 1e-9
        assert auc(adapted) > 0.85

    def test_validates(self, trained):
        model, *_ = trained
        with pytest.raises(ValueError, match="scale"):
            model.adapt(np.zeros((4, model.dim)), within_covar_scale=-1)
        with pytest.raises(ValueError, match="i-vectors"):
            model.adapt(np.zeros((4, model.dim + 1)))
        with pytest.raises(ValueError, match=">= 2"):
            model.adapt(np.zeros((1, model.dim)))


class TestScoringCli:
    def test_trials_flow(self, trained, tmp_path, capsys):
        from tpufeat import feats_io
        model, x, ids, *_ = trained
        means, counts, spks = pl.ivector_mean(x[:30], ids[:30])
        enroll_p = str(tmp_path / "spk.ark")
        test_p = str(tmp_path / "utt.ark")
        feats_io.write_kaldi_vec_ark(
            enroll_p, {f"spk{s}": means[i].astype(np.float32)
                       for i, s in enumerate(spks)})
        feats_io.write_kaldi_vec_ark(
            test_p, {f"utt{j}": x[30 + j].astype(np.float32)
                     for j in range(6)})
        trials = tmp_path / "trials"
        trials.write_text("spk0 utt0\nspk0 utt3\nspk1 utt1\n")
        nutts = tmp_path / "num_utts"
        nutts.write_text("".join(f"spk{s} {int(counts[i])}\n"
                                 for i, s in enumerate(spks)))
        scores_p = str(tmp_path / "scores")
        rc = pl.main([str(trials), scores_p, "--plda",
                      self._save(model, tmp_path), "--enroll", enroll_p,
                      "--test", test_p, "--num-utts", str(nutts)])
        assert rc == 0
        lines = open(scores_p).read().strip().split("\n")
        assert len(lines) == 3
        # entries match direct score() on float32-roundtripped vectors
        want = np.asarray(model.score(
            means[:2].astype(np.float32).astype(np.float64),
            x[30:34].astype(np.float32).astype(np.float64),
            n_enroll=counts[:2]))
        got0 = float(lines[0].split()[2])
        np.testing.assert_allclose(got0, want[0, 0], atol=1e-3)

    @staticmethod
    def _save(model, tmp_path):
        p = str(tmp_path / "plda.npz")
        model.save(p)
        return p

    def test_cli_validates(self, trained, tmp_path):
        from tpufeat import feats_io
        model, x, ids, *_ = trained
        enroll_p = str(tmp_path / "e.ark")
        test_p = str(tmp_path / "t.ark")
        feats_io.write_kaldi_vec_ark(
            enroll_p, {"spkA": x[0].astype(np.float32)})
        feats_io.write_kaldi_vec_ark(
            test_p, {"utt1": x[1].astype(np.float32)})
        plda_p = self._save(model, tmp_path)
        bad = tmp_path / "trials"
        bad.write_text("spkB utt1\n")
        with pytest.raises(ValueError, match="speaker"):
            pl.main([str(bad), "-", "--plda", plda_p,
                     "--enroll", enroll_p, "--test", test_p])
        bad.write_text("spkA\n")
        with pytest.raises(ValueError, match="want"):
            pl.main([str(bad), "-", "--plda", plda_p,
                     "--enroll", enroll_p, "--test", test_p])

    def test_cli_empty_trials(self, trained, tmp_path, capsys):
        from tpufeat import feats_io
        model, x, *_ = trained
        e = str(tmp_path / "e.ark")
        t = str(tmp_path / "t.ark")
        feats_io.write_kaldi_vec_ark(e, {"s": x[0].astype(np.float32)})
        feats_io.write_kaldi_vec_ark(t, {"u": x[1].astype(np.float32)})
        trials = tmp_path / "trials"
        trials.write_text("\n")
        scores = str(tmp_path / "scores")
        p = str(tmp_path / "m.npz")
        model.save(p)
        assert pl.main([str(trials), scores, "--plda", p,
                        "--enroll", e, "--test", t]) == 0
        assert open(scores).read() == ""
