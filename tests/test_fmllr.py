"""fMLLR speaker-adaptation tests (tpufeat/fmllr.py): GEMM statistics
vs the float64 golden loop, Gales row-update estimation (monotone
auxiliary, affine-distortion recovery, likelihood improvement), masking,
and the min-count fallback."""

import numpy as np
import pytest

from tpufeat import fmllr as fm
from tpufeat import ivector as iv
from tpufeat.data import apply_transform
from tpufeat.reference import cpu as golden


def _ubm(dim=5, seed=0):
    r = np.random.default_rng(seed)
    centers = r.standard_normal((4, dim)) * 2.0
    frames = np.concatenate(
        [c + r.standard_normal((300, dim)) for c in centers]
    ).astype(np.float32)
    return iv.train_diag_ubm(frames, 4, iters=2, final_iters=4, seed=0)


def _ubm_samples(ubm, n, seed=1):
    r = np.random.default_rng(seed)
    comp = r.choice(ubm.num_gauss, size=n, p=ubm.weights)
    return (ubm.means[comp]
            + r.standard_normal((n, ubm.dim))
            * np.sqrt(ubm.vars[comp])).astype(np.float32)


@pytest.fixture(scope="module")
def ubm():
    return _ubm()


class TestStats:
    def test_vs_golden(self, ubm):
        x = _ubm_samples(ubm, 80, seed=2)
        beta, K, G = fm.fmllr_stats(ubm, x)
        bg, Kg, Gg = golden.fmllr_stats(x, ubm.weights, ubm.means,
                                        ubm.vars)
        assert abs(beta - bg) < 1e-3
        np.testing.assert_allclose(K, Kg, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(G, Gg, rtol=1e-4, atol=1e-3)

    def test_min_post_matches_golden(self, ubm):
        x = _ubm_samples(ubm, 60, seed=3)
        beta, K, G = fm.fmllr_stats(ubm, x, min_post=0.05)
        bg, Kg, Gg = golden.fmllr_stats(x, ubm.weights, ubm.means,
                                        ubm.vars, min_post=0.05)
        np.testing.assert_allclose(K, Kg, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(G, Gg, rtol=1e-4, atol=1e-3)
        assert abs(beta - bg) < 1e-3

    def test_masked_batch_equals_concat(self, ubm):
        x1 = _ubm_samples(ubm, 50, seed=4)
        x2 = _ubm_samples(ubm, 30, seed=5)
        pad = np.zeros((2, 50, ubm.dim), np.float32)
        pad[0] = x1
        pad[1, :30] = x2
        got = fm.fmllr_stats(ubm, pad, np.array([50, 30]))
        want = fm.fmllr_stats(ubm, np.concatenate([x1, x2]))
        assert abs(got[0] - want[0]) < 1e-2
        np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(got[2], want[2], rtol=1e-4, atol=1e-2)

    def test_validates(self, ubm):
        with pytest.raises(ValueError, match="UBM dim"):
            fm.fmllr_stats(ubm, np.zeros((10, ubm.dim + 1)))
        with pytest.raises(ValueError, match="mask"):
            fm.fmllr_stats(ubm, np.zeros((2, 10, ubm.dim)),
                           np.zeros((3, 10)))


class TestEstimation:
    def test_identity_below_min_count(self, ubm):
        x = _ubm_samples(ubm, 20, seed=6)
        W = fm.est_fmllr(ubm, x, min_count=500.0)
        np.testing.assert_array_equal(
            W, np.concatenate([np.eye(ubm.dim),
                               np.zeros((ubm.dim, 1))], axis=1))

    def test_auxiliary_monotone(self, ubm):
        x = _ubm_samples(ubm, 400, seed=7) * 1.4 + 0.8
        beta, K, G = fm.fmllr_stats(ubm, x)
        qs = [fm.fmllr_objective(
            beta, K, G, fm.estimate_fmllr(beta, K, G, iters=k,
                                          min_count=1.0))
            for k in range(1, 6)]
        q0 = fm.fmllr_objective(
            beta, K, G,
            np.concatenate([np.eye(ubm.dim), np.zeros((ubm.dim, 1))], 1))
        seq = [q0] + qs
        assert all(b >= a - 1e-6 * abs(a)
                   for a, b in zip(seq, seq[1:])), seq

    def test_recovers_affine_distortion(self, ubm):
        """Frames sampled from the UBM, distorted by a known affine map:
        the estimated transform must approximately invert it."""
        r = np.random.default_rng(8)
        x = _ubm_samples(ubm, 8000, seed=9)
        V = np.eye(ubm.dim) + 0.25 * r.standard_normal((ubm.dim,) * 2)
        c = 0.5 * r.standard_normal(ubm.dim)
        xd = (x @ V.T + c).astype(np.float32)
        W = fm.est_fmllr(ubm, xd, iters=30, min_count=1.0)
        A, b = W[:, :-1], W[:, -1]
        comp = A @ V                       # should be ~identity
        np.testing.assert_allclose(comp, np.eye(ubm.dim), atol=0.15)
        np.testing.assert_allclose(A @ c + b, 0.0, atol=0.3)

    def test_improves_likelihood(self, ubm):
        """Adapted-feature likelihood + the log|det A| Jacobian must beat
        the unadapted likelihood on distorted data."""
        x = _ubm_samples(ubm, 3000, seed=10)
        xd = (x * 1.5 + 1.0).astype(np.float32)
        W = fm.est_fmllr(ubm, xd, iters=20, min_count=1.0)
        adapted = np.asarray(apply_transform(xd, W))
        ll_before = iv.avg_log_like(ubm, xd)
        ll_after = (iv.avg_log_like(ubm, adapted)
                    + np.linalg.slogdet(W[:, :-1])[1])
        assert ll_after > ll_before + 0.05, (ll_before, ll_after)

    def test_clean_data_near_identity(self, ubm):
        """On data drawn from the model itself the optimal transform is
        near identity (no distortion to undo)."""
        x = _ubm_samples(ubm, 8000, seed=11)
        W = fm.est_fmllr(ubm, x, iters=20, min_count=1.0)
        np.testing.assert_allclose(W[:, :-1], np.eye(ubm.dim), atol=0.1)
        np.testing.assert_allclose(W[:, -1], 0.0, atol=0.15)

    def test_validates(self, ubm):
        with pytest.raises(ValueError, match="stats shapes"):
            fm.estimate_fmllr(10.0, np.zeros((3, 3)), np.zeros((3, 4, 4)))
        with pytest.raises(ValueError, match="iters"):
            fm.estimate_fmllr(10.0, np.zeros((3, 4)),
                              np.zeros((3, 4, 4)), iters=0)


class TestVtlnWarpEstimation:
    @pytest.mark.slow  # ~12 s warp-grid search; TestVtln's fixed-warp parity stays in the default tier
    def test_recovers_warp_direction(self):
        """UBM trained on a speaker's true audio: the matched audio
        estimates warp ~1.0, and speed-perturbed versions (formants
        shifted up/down) estimate warps on opposite sides of 1."""
        import dataclasses
        from scipy.signal import lfilter
        from tpufeat import augment, features
        from tpufeat.config import MFCC13_HTK
        r = np.random.default_rng(0)

        def voice(n, seed):
            rr = np.random.default_rng(seed)
            x = rr.standard_normal(n)
            for f, rad in ((500, 0.95), (1500, 0.9), (2500, 0.85)):
                th = 2 * np.pi * f / 16000
                x = lfilter([1.0], [1.0, -2 * rad * np.cos(th),
                                    rad * rad], x)
            return (x / (np.abs(x).max() + 1e-9) * 0.5).astype(np.float32)

        train_audio = voice(48000, 1)
        feats = np.asarray(features.extract(train_audio,
                                            cfg=MFCC13_HTK).features)
        ubm = iv.train_diag_ubm(feats, 4, iters=2, final_iters=3, seed=0)
        test_audio = voice(32000, 2)
        warps = np.round(np.arange(0.85, 1.1501, 0.05), 2)
        best, scores = fm.estimate_vtln_warp(ubm, test_audio,
                                             warps=warps)
        assert len(scores) == len(warps)
        assert abs(best - 1.0) <= 0.05, (best, scores)
        up = np.asarray(augment.speed_perturb(test_audio[None], 16000, 1.1))[0]
        down = np.asarray(augment.speed_perturb(test_audio[None], 16000, 0.9))[0]
        b_up, _ = fm.estimate_vtln_warp(ubm, up, warps=warps)
        b_down, _ = fm.estimate_vtln_warp(ubm, down, warps=warps)
        assert (b_up - 1.0) * (b_down - 1.0) < 0, (b_up, b_down)

    def test_validates_dim(self, ubm):
        with pytest.raises(ValueError, match="feature_dim"):
            import dataclasses
            from tpufeat.config import MFCC13_HTK
            fm.estimate_vtln_warp(
                ubm, np.zeros(8000, np.float32),
                cfg=dataclasses.replace(MFCC13_HTK, n_mfcc=7))
