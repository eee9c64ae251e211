"""I-vector subsystem tests (tpufeat/ivector.py): UBM training + GEMM
log-likelihoods, total-variability EM, offline online-twin oracle, and
the streaming wrapper — each against the float64 goldens in
tpufeat/reference/cpu.py per SURVEY.md §4."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpufeat import ivector as iv
from tpufeat.reference import cpu as golden


def _clustered_frames(n_per=200, n_clusters=3, dim=13, seed=0):
    r = np.random.default_rng(seed)
    centers = r.standard_normal((n_clusters, dim)) * 3.0
    return np.concatenate(
        [c + r.standard_normal((n_per, dim)) for c in centers]
    ).astype(np.float32)


@pytest.fixture(scope="module")
def ubm():
    return iv.train_diag_ubm(_clustered_frames(), 8, iters=3,
                             final_iters=6, seed=0)


@pytest.fixture(scope="module")
def extractor(ubm):
    r = np.random.default_rng(1)
    x = _clustered_frames()
    utts = [x[r.integers(0, len(x), 150)] for _ in range(6)]
    return iv.train_ivector_extractor(ubm, utts, ivector_dim=8,
                                      iters=3, seed=1)


class TestDiagUbm:
    def test_log_likes_vs_golden(self, ubm):
        x = _clustered_frames(n_per=30, seed=5)
        got = np.asarray(ubm.log_likes(x))
        want = golden.diag_gmm_log_likes(x, ubm.weights, ubm.means,
                                         ubm.vars)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)

    def test_posteriors_vs_golden(self, ubm):
        x = _clustered_frames(n_per=30, seed=6)
        for mp in (0.0, 0.025):
            got = np.asarray(ubm.posteriors(x, min_post=mp))
            want = golden.gmm_posteriors(x, ubm.weights, ubm.means,
                                         ubm.vars, mp)
            np.testing.assert_allclose(got, want, atol=1e-5)
            np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)

    def test_min_post_prunes(self, ubm):
        x = _clustered_frames(n_per=30, seed=7)
        p = np.asarray(ubm.posteriors(x, min_post=0.1))
        assert ((p == 0.0) | (p >= 0.05)).all()  # renorm can only grow

    def test_training_recovers_clusters(self):
        r = np.random.default_rng(3)
        centers = np.array([[-6.0, 0.0], [0.0, 6.0], [6.0, 0.0]])
        x = np.concatenate(
            [c + 0.5 * r.standard_normal((300, 2)) for c in centers]
        ).astype(np.float32)
        # split-EM with G > #clusters is robust to the local optimum a
        # G==#clusters fit can land in; every cluster must be covered
        ubm = iv.train_diag_ubm(x, 8, iters=5, final_iters=10, seed=0)
        d = np.linalg.norm(ubm.means[None] - centers[:, None], axis=2)
        assert d.min(axis=1).max() < 1.0
        np.testing.assert_allclose(ubm.weights.sum(), 1.0, atol=1e-9)

    def test_em_monotone(self):
        x = _clustered_frames(n_per=120, seed=9)
        lls = []
        for final in (1, 4, 8):
            ubm = iv.train_diag_ubm(x, 4, iters=2, final_iters=final,
                                    seed=0)
            lls.append(iv.avg_log_like(ubm, x))
        assert lls[0] <= lls[1] + 1e-4 and lls[1] <= lls[2] + 1e-4

    def test_save_load_roundtrip(self, ubm, tmp_path):
        p = str(tmp_path / "ubm.npz")
        ubm.save(p)
        back = iv.DiagUbm.load(p)
        np.testing.assert_array_equal(back.means, ubm.means)

    def test_rejects_bad_params(self):
        with pytest.raises(ValueError):
            iv.DiagUbm(np.array([0.7, 0.7]), np.zeros((2, 3)),
                       np.ones((2, 3)))
        with pytest.raises(ValueError):
            iv.DiagUbm(np.array([0.5, 0.5]), np.zeros((2, 3)),
                       np.zeros((2, 3)))
        with pytest.raises(ValueError):
            iv.train_diag_ubm(np.zeros((10, 3), np.float32), 2)


class TestExtractor:
    def test_stats_and_estimate_vs_golden(self, ubm, extractor):
        x = _clustered_frames(n_per=40, seed=11)
        n, f = extractor.stats(x)
        got = np.asarray(extractor.estimate(n, f))
        n_g, f_g = golden.ivector_stats(x, ubm.weights, ubm.means,
                                        ubm.vars)
        np.testing.assert_allclose(np.asarray(n), n_g, atol=1e-3)
        np.testing.assert_allclose(np.asarray(f), f_g, atol=1e-2,
                                   rtol=1e-4)
        want = golden.ivector_estimate(n_g, f_g, extractor.M, ubm.vars)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_zero_stats_gives_prior_mean(self, extractor):
        g = extractor.ubm.num_gauss
        w = extractor.estimate(jnp.zeros((g,)),
                               jnp.zeros((g, extractor.ubm.dim)))
        np.testing.assert_array_equal(np.asarray(w), 0.0)

    def test_mask_invariance(self, extractor):
        x = _clustered_frames(n_per=20, seed=12)[None]     # [1, 60, D]
        xpad = np.concatenate(
            [x, 99.0 * np.ones((1, 17, x.shape[2]), np.float32)], axis=1)
        mask = np.arange(77)[None, :] < 60
        w = np.asarray(iv.utterance_ivector(extractor, x))
        wpad = np.asarray(iv.utterance_ivector(extractor, xpad,
                                               mask.astype(np.float32)))
        # masked pad frames contribute exactly zero; the residual is the
        # f32 reduction-tree difference between T=60 and T=77 sums
        np.testing.assert_allclose(w, wpad, atol=2e-4, rtol=1e-3)

    def test_em_objective_improves(self, ubm):
        r = np.random.default_rng(2)
        x = _clustered_frames()
        utts = [x[r.integers(0, len(x), 100)] for _ in range(5)]
        _, objs = iv.train_ivector_extractor(
            ubm, utts, ivector_dim=6, iters=4, seed=3,
            return_objective=True)
        assert objs[-1] >= objs[1] - 1e-3   # monotone after the random init

    def test_recovers_latent_direction(self, ubm):
        """Utterances generated FROM the model: same-w utterances must
        map closer than different-w ones."""
        r = np.random.default_rng(4)
        G, D, K = ubm.num_gauss, ubm.dim, 4
        M_true = r.standard_normal((G, D, K)) * np.sqrt(ubm.vars)[:, :, None]

        def sample_utt(w, T=300):
            g = r.choice(G, size=T, p=ubm.weights)
            return (ubm.means[g] + M_true[g] @ w
                    + np.sqrt(ubm.vars[g]) * r.standard_normal((T, D))
                    ).astype(np.float32)

        ws = [r.standard_normal(K) for _ in range(4)]
        utts = [sample_utt(w) for w in ws for _ in range(3)]
        ext = iv.train_ivector_extractor(ubm, utts, ivector_dim=K,
                                         iters=6, seed=5)
        ivs = np.stack([np.asarray(iv.utterance_ivector(ext, u))
                        for u in utts])
        lab = np.repeat(np.arange(4), 3)
        d = np.linalg.norm(ivs[:, None] - ivs[None, :], axis=2)
        same = d[lab[:, None] == lab[None, :]]
        diff = d[lab[:, None] != lab[None, :]]
        assert np.median(same) < 0.5 * np.median(diff)

    def test_save_load_roundtrip(self, extractor, tmp_path):
        p = str(tmp_path / "ext.npz")
        extractor.save(p)
        back = iv.IvectorExtractor.load(p)
        np.testing.assert_array_equal(back.M, extractor.M)
        np.testing.assert_array_equal(back.ubm.means, extractor.ubm.means)

    def test_rejects_shape_mismatch(self, ubm):
        with pytest.raises(ValueError):
            iv.IvectorExtractor(ubm, np.zeros((2, 2, 4)))


class TestIvectorFeatures:
    def test_vs_golden(self, ubm, extractor):
        x = _clustered_frames(n_per=25, seed=13)           # 75 frames
        got = np.asarray(iv.ivector_features(extractor, x, period=10))
        want = golden.ivector_features(x, ubm.weights, ubm.means,
                                       ubm.vars, extractor.M, period=10)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_causality_and_grid(self, extractor):
        x = _clustered_frames(n_per=20, seed=14)           # 60 frames
        out = np.asarray(iv.ivector_features(extractor, x, period=10))
        np.testing.assert_array_equal(out[:10], 0.0)       # prior first
        for m in range(6):                                 # constant blocks
            blk = out[m * 10: (m + 1) * 10]
            np.testing.assert_array_equal(blk, blk[0:1].repeat(len(blk), 0))
        # changing FUTURE frames never changes the past
        x2 = x.copy()
        x2[35:] += 5.0
        out2 = np.asarray(iv.ivector_features(extractor, x2, period=10))
        np.testing.assert_array_equal(out[:40], out2[:40])

    def test_batched_matches_single(self, extractor):
        a = _clustered_frames(n_per=15, seed=15)           # 45
        b = _clustered_frames(n_per=11, seed=16)[:33]      # 33
        T = 45
        batch = np.zeros((2, T, a.shape[1]), np.float32)
        batch[0], batch[1, :33] = a, b
        out = np.asarray(iv.ivector_features(extractor, batch,
                                             lengths=np.array([45, 33])))
        np.testing.assert_allclose(
            out[0], np.asarray(iv.ivector_features(extractor, a)),
            atol=2e-5)
        np.testing.assert_allclose(
            out[1, :33],
            np.asarray(iv.ivector_features(extractor, b)), atol=2e-5)

    def test_max_count_damps(self, ubm, extractor):
        x = _clustered_frames(n_per=40, seed=17)
        got = np.asarray(iv.ivector_features(extractor, x, period=10,
                                             max_count=1.5))
        want = golden.ivector_features(x, ubm.weights, ubm.means,
                                       ubm.vars, extractor.M, period=10,
                                       max_count=1.5)
        np.testing.assert_allclose(got, want, atol=1e-4)
        free = np.asarray(iv.ivector_features(extractor, x, period=10))
        assert np.abs(got[-1]).max() < np.abs(free[-1]).max() + 1e-6

    def test_rejects_bad_period(self, extractor):
        with pytest.raises(ValueError):
            iv.ivector_features(extractor, np.zeros((5, extractor.ubm.dim),
                                                    np.float32), period=0)


class TestStreamingIvector:
    PLANS = ([10, 10, 10, 10], [7, 13, 1, 19], [40], [3] * 13 + [1],
             [25, 15])

    @pytest.mark.parametrize("plan", PLANS)
    def test_matches_offline_any_plan(self, extractor, plan):
        x = _clustered_frames(n_per=14, seed=18)[: sum(plan)]
        want = np.asarray(iv.ivector_features(extractor, x, period=10))
        st = iv.StreamingIvector(extractor, period=10)
        outs, i = [], 0
        for c in plan:
            outs.append(np.asarray(st.process(x[None, i: i + c])))
            i += c
        got = np.concatenate(outs, axis=1)[0]
        np.testing.assert_allclose(got, want[: len(got)], atol=1e-4)

    def test_batch_rows_independent(self, extractor):
        a = _clustered_frames(n_per=12, seed=19)[:36]
        b = _clustered_frames(n_per=12, seed=20)[:36]
        st = iv.StreamingIvector(extractor, batch_size=2)
        got = np.asarray(st.process(np.stack([a, b])))
        sa = iv.StreamingIvector(extractor)
        np.testing.assert_allclose(got[0],
                                   np.asarray(sa.process(a[None]))[0],
                                   atol=1e-5)

    def test_reset_rows_restarts(self, extractor):
        x = _clustered_frames(n_per=12, seed=21)[:36]
        st = iv.StreamingIvector(extractor, batch_size=2)
        st.process(np.stack([x, x * 0.5]))
        st.reset_rows([1])
        out = np.asarray(st.process(np.stack([x, x])))
        fresh = iv.StreamingIvector(extractor)
        np.testing.assert_allclose(out[1],
                                   np.asarray(fresh.process(x[None]))[0],
                                   atol=1e-6)
        # row 0 unaffected: continues its own stream
        cont = iv.StreamingIvector(extractor)
        cont.process(x[None])
        np.testing.assert_allclose(out[0],
                                   np.asarray(cont.process(x[None]))[0],
                                   atol=1e-6)

    def test_state_roundtrip(self, extractor, tmp_path):
        from tpufeat.streaming import save_state, load_state
        x = _clustered_frames(n_per=12, seed=22)[:36]
        st = iv.StreamingIvector(extractor)
        st.process(x[None, :17])
        path = str(tmp_path / "iv_state.npz")
        save_state(path, st.state())
        st2 = iv.StreamingIvector(extractor)
        st2.set_state(load_state(path, st2.state()))
        np.testing.assert_allclose(np.asarray(st2.process(x[None, 17:])),
                                   np.asarray(st.process(x[None, 17:])),
                                   atol=0)

    def test_empty_chunk(self, extractor):
        st = iv.StreamingIvector(extractor)
        out = st.process(np.zeros((1, 0, extractor.ubm.dim), np.float32))
        assert out.shape == (1, 0, extractor.ivector_dim)

    def test_rejects_wrong_batch(self, extractor):
        st = iv.StreamingIvector(extractor, batch_size=2)
        with pytest.raises(ValueError):
            st.process(np.zeros((3, 4, extractor.ubm.dim), np.float32))


class TestOperandCaching:
    """The device-operand caches (round-3 relay fix: re-uploading U
    alone is 20 MB/call) must never capture tracers when a caller wraps
    estimation in its own jit."""

    def test_estimate_inside_outer_jit(self, extractor):
        import jax

        @jax.jit
        def utt(x):
            n, f = extractor.stats(x)
            return extractor.estimate(n, f)

        x = _clustered_frames(n_per=40, seed=9)
        a = np.asarray(utt(x))          # traces; must not cache tracers
        b = np.asarray(utt(x))          # cache hit or rebuild — either
        want = np.asarray(iv.utterance_ivector(extractor, x))
        np.testing.assert_allclose(a, want, atol=3e-4)
        np.testing.assert_allclose(b, want, atol=3e-4)
        # a later eager call still works and caches device arrays
        again = np.asarray(iv.utterance_ivector(extractor, x))
        np.testing.assert_allclose(again, want, atol=3e-4)
        ops = iv._online_operands(extractor)
        assert not any(isinstance(v, jax.core.Tracer) for v in ops)
