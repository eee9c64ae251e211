"""Batching/bucketing utilities (recompile-storm guard, SURVEY.md §7 #4)."""

import numpy as np
import pytest

from tpufeat import data


class TestBucketing:
    def test_bucket_length_monotone_grid(self):
        assert data.bucket_length(100) == 16000
        assert data.bucket_length(16000) == 16000
        assert data.bucket_length(16001) > 16000
        # geometric: few distinct buckets over a wide range
        ls = {data.bucket_length(n) for n in range(16000, 480000, 997)}
        assert len(ls) <= 11
        for n in range(16000, 480000, 997):
            assert data.bucket_length(n) >= n

    def test_batched_buckets_share_shapes(self):
        rng = np.random.default_rng(0)
        sigs = [np.zeros(int(n), np.float32)
                for n in rng.integers(8000, 200000, size=37)]
        batches = list(data.batched(sigs, 8))
        # every signal appears exactly once
        assert sum(b[0].shape[0] for b in batches) == 37
        shapes = {b[0].shape[1] for b in batches}
        # lengths 8k..200k span ~4.6 octaves -> <=2 buckets per octave + ends
        assert len(shapes) <= 10
        for x, lengths in batches:
            assert (lengths <= x.shape[1]).all()
            for row, l in zip(x, lengths):
                assert (row[l:] == 0).all()

    def test_batched_unbucketed_order(self):
        sigs = [np.full(100 + i, i, np.float32) for i in range(5)]
        batches = list(data.batched(sigs, 2, bucket=False))
        assert [b[0].shape[0] for b in batches] == [2, 2, 1]
        assert batches[0][0][0][0] == 0.0  # order preserved

    def test_iter_wav_dir(self, tmp_path):
        from tpufeat import io
        for i in range(3):
            io.write_wav(str(tmp_path / f"u{i}.wav"),
                         np.zeros(1000 + i), 16000)
        got = list(data.iter_wav_dir(str(tmp_path)))
        assert len(got) == 3
        assert [g[1].shape[0] for g in got] == [1000, 1001, 1002]
        assert all(g[2] == 16000 for g in got)


class TestSplicing:
    def test_splice_shapes_and_edges(self):
        import jax.numpy as jnp
        from tpufeat.data import splice_frames
        rng = np.random.default_rng(5)
        feat = rng.standard_normal((2, 6, 3)).astype(np.float32)
        nf = np.array([6, 4])
        out = np.asarray(splice_frames(jnp.asarray(feat), nf, 1, 1))
        assert out.shape == (2, 6, 9)
        # middle frame: [prev, cur, next]
        np.testing.assert_allclose(out[0, 2], feat[0, 1:4].reshape(-1))
        # first frame: left context replicated
        np.testing.assert_allclose(out[0, 0, :3], feat[0, 0])
        # utterance 1 ends at frame 3: right context clipped there
        np.testing.assert_allclose(out[1, 3, 6:], feat[1, 3])


class TestCmvnStats:
    def test_matches_direct_concat(self):
        from tpufeat.data import CmvnStats
        rng = np.random.default_rng(30)
        utts = [rng.standard_normal((f, 13)) + 5.0 for f in (40, 7, 93)]
        st = CmvnStats(13)
        for u in utts:
            st.accumulate(u)
        allf = np.concatenate(utts)
        np.testing.assert_allclose(st.mean, allf.mean(0), rtol=1e-12)
        np.testing.assert_allclose(st.var, allf.var(0), rtol=1e-9)
        # applying the stats whitens the corpus
        normed = np.concatenate([st.apply(u, norm_vars=True) for u in utts])
        np.testing.assert_allclose(normed.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(normed.var(0), 1.0, atol=1e-4)

    def test_save_load_merge(self, tmp_path):
        from tpufeat.data import CmvnStats
        rng = np.random.default_rng(31)
        a, b = rng.standard_normal((20, 4)), rng.standard_normal((30, 4))
        s1, s2 = CmvnStats(4), CmvnStats(4)
        s1.accumulate(a); s2.accumulate(b)
        s1.save(str(tmp_path / "s.npz"))
        s1b = CmvnStats.load(str(tmp_path / "s.npz"))
        s1b.merge(s2)
        both = np.concatenate([a, b])
        np.testing.assert_allclose(s1b.mean, both.mean(0), rtol=1e-12)
        np.testing.assert_allclose(s1b.var, both.var(0), rtol=1e-9)

    def test_pipeline_roundtrip(self, tmp_path):
        """--global-cmvn then --apply-cmvn through the corpus CLI."""
        from tpufeat import io, pipeline
        from conftest import make_signal
        d = tmp_path / "wavs"; d.mkdir()
        for i in range(3):
            io.write_wav(str(d / f"u{i}.wav"),
                         make_signal(8000 + 1000 * i, seed=40 + i), 16000)
        stats_p = str(tmp_path / "cmvn.npz")
        pipeline.main([str(d), str(tmp_path / "o1.npz"),
                       "--global-cmvn", stats_p, "--batch", "2"])
        pipeline.main([str(d), str(tmp_path / "o2.npz"),
                       "--apply-cmvn", stats_p, "--norm-vars",
                       "--batch", "2"])
        z = np.load(str(tmp_path / "o2.npz"))
        allf = np.concatenate([z[k] for k in z.files])
        np.testing.assert_allclose(allf.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(allf.var(0), 1.0, atol=1e-3)


class TestPasteSubsample:
    """Kaldi paste-feats / subsample-feats analogues (tpufeat/data.py)."""

    def test_paste_feats(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((2, 10, 13)).astype(np.float32)
        b = rng.standard_normal((2, 10, 3)).astype(np.float32)
        out = np.asarray(data.paste_feats([a, b]))
        assert out.shape == (2, 10, 16)
        np.testing.assert_array_equal(out[..., :13], a)
        np.testing.assert_array_equal(out[..., 13:], b)
        nf = np.array([10, 7])
        out2, nf2 = data.paste_feats([a, b], [nf, nf.copy()])
        np.testing.assert_array_equal(nf2, nf)
        import pytest
        with pytest.raises(ValueError, match="frame counts"):
            data.paste_feats([a, b], [nf, np.array([10, 8])])
        with pytest.raises(ValueError, match="disagree on \\[B, F\\]"):
            data.paste_feats([a, b[:, :9]])
        with pytest.raises(ValueError, match="at least one"):
            data.paste_feats([])

    def test_subsample_frames(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 11, 4)).astype(np.float32)
        nf = np.array([11, 5])
        out, new_nf = data.subsample_frames(x, nf, 3)
        assert out.shape == (2, 4, 4)               # ceil(11/3)
        np.testing.assert_array_equal(out, x[:, ::3])
        np.testing.assert_array_equal(new_nf, [4, 2])  # ceil(5/3)=2
        out1, nf1 = data.subsample_frames(x, nf, 3, offset=1)
        np.testing.assert_array_equal(out1, x[:, 1::3])
        np.testing.assert_array_equal(nf1, [4, 2])  # frames 1,4,7,10 / 1,4
        same, nfs = data.subsample_frames(x, nf, 1)
        np.testing.assert_array_equal(same, x)
        np.testing.assert_array_equal(nfs, nf)
        import pytest
        with pytest.raises(ValueError):
            data.subsample_frames(x, nf, 0)
        with pytest.raises(ValueError):
            data.subsample_frames(x, nf, 3, offset=3)


class TestTransforms:
    """apply_transform / LdaStats — the Kaldi transform-feats + acc-lda/
    est-lda analogue pair over spliced frames."""

    def _two_class(self, n=4000, d=6, seed=0):
        rng = np.random.default_rng(seed)
        A = rng.standard_normal((d, d)) * 0.5 + np.eye(d)
        mean0 = np.zeros(d)
        mean1 = np.full(d, 2.5)
        f0 = rng.standard_normal((n, d)) @ A.T + mean0
        f1 = rng.standard_normal((n, d)) @ A.T + mean1
        feats = np.concatenate([f0, f1]).astype(np.float32)
        labels = np.concatenate([np.zeros(n, int), np.ones(n, int)])
        return feats, labels

    def test_apply_transform_linear_and_affine(self):
        rng = np.random.default_rng(1)
        feat = rng.standard_normal((2, 5, 4)).astype(np.float32)
        lin = rng.standard_normal((3, 4)).astype(np.float32)
        bias = rng.standard_normal(3).astype(np.float32)
        got_lin = np.asarray(data.apply_transform(feat, lin))
        np.testing.assert_allclose(got_lin, feat @ lin.T, atol=1e-6)
        aff = np.concatenate([lin, bias[:, None]], axis=1)
        got_aff = np.asarray(data.apply_transform(feat, aff))
        np.testing.assert_allclose(got_aff, feat @ lin.T + bias, atol=1e-6)

    def test_apply_transform_shape_error(self):
        import pytest
        with pytest.raises(ValueError, match="transform is"):
            data.apply_transform(np.zeros((2, 3, 4), np.float32),
                                 np.zeros((3, 7), np.float32))

    def test_lda_whitens_and_separates(self):
        feats, labels = self._two_class()
        st = data.LdaStats(feats.shape[1])
        # two accumulation calls (order-independence of the moments)
        st.accumulate(feats[:3000], labels[:3000])
        st.accumulate(feats[3000:], labels[3000:])
        T = st.estimate(2)
        assert T.shape == (2, feats.shape[1] + 1)
        out = np.asarray(data.apply_transform(feats, T), np.float64)
        # zero global mean (affine bias folds the mean in)
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
        # identity within-class covariance (Kaldi's normalization)
        for c in (0, 1):
            sel = out[labels == c]
            cov = np.cov(sel.T, bias=True)
            np.testing.assert_allclose(cov, np.eye(2), atol=0.15)
        # the first LDA direction separates the classes strongly
        m0, m1 = out[labels == 0, 0].mean(), out[labels == 1, 0].mean()
        assert abs(m0 - m1) > 3.0

    def test_lda_on_spliced_frames(self):
        """The intended composition: splice_frames -> LDA to a lower dim."""
        import jax.numpy as jnp
        feats, labels = self._two_class(n=500, d=4, seed=2)
        spliced = np.asarray(data.splice_frames(
            jnp.asarray(feats[None]), np.asarray([feats.shape[0]]),
            left=1, right=1))[0]
        st = data.LdaStats(spliced.shape[1])
        st.accumulate(spliced, labels)
        T = st.estimate(3, within_floor=1e-4)
        out = np.asarray(data.apply_transform(spliced, T))
        assert out.shape == (feats.shape[0], 3)
        assert np.isfinite(out).all()

    def test_lda_validation(self):
        import pytest
        st = data.LdaStats(4)
        with pytest.raises(ValueError, match="classes"):
            st.estimate(2)
        st.accumulate(np.zeros((3, 4)), np.zeros(3, int))
        with pytest.raises(ValueError, match="frames vs"):
            st.accumulate(np.zeros((3, 4)), np.zeros(2, int))
        with pytest.raises(ValueError, match="target_dim"):
            st.accumulate(np.ones((3, 4)), np.ones(3, int)) or \
                st.estimate(9)


class TestCmvnKaldiInterchange:
    """CmvnStats <-> Kaldi compute-cmvn-stats double-matrix archives."""

    def _stats(self, dim=13, seed=40):
        from tpufeat.data import CmvnStats
        rng = np.random.default_rng(seed)
        st = CmvnStats(dim)
        st.accumulate(rng.standard_normal((57, dim)) + 3.0)
        st.accumulate(rng.standard_normal((21, dim)) * 2.0)
        return st

    def test_to_from_kaldi_exact(self):
        from tpufeat.data import CmvnStats
        st = self._stats()
        mat = st.to_kaldi()
        assert mat.shape == (2, 14) and mat.dtype == np.float64
        assert mat[0, -1] == st.count and mat[1, -1] == 0.0
        back = CmvnStats.from_kaldi(mat)
        np.testing.assert_array_equal(back.sum, st.sum)
        np.testing.assert_array_equal(back.sumsq, st.sumsq)
        assert back.count == st.count

    def test_ark_save_load_dispatch(self, tmp_path):
        from tpufeat.data import CmvnStats
        st = self._stats()
        p = str(tmp_path / "cmvn.ark")
        st.save(p)
        back = CmvnStats.load(p)
        np.testing.assert_array_equal(back.mean, st.mean)
        np.testing.assert_array_equal(back.var, st.var)
        # the archive really is Kaldi binary DM (readable generically)
        from tpufeat import feats_io
        utts = feats_io.read_kaldi_ark(p)
        assert list(utts) == ["global"] and utts["global"].shape == (2, 14)

    def test_per_speaker_archive(self, tmp_path):
        from tpufeat import feats_io
        from tpufeat.data import CmvnStats
        spk = {f"spk{i}": self._stats(seed=50 + i) for i in range(3)}
        p = str(tmp_path / "cmvn.ark")
        feats_io.write_kaldi_ark(
            p, {k: s.to_kaldi() for k, s in spk.items()}, dtype="f64")
        with pytest.raises(ValueError, match="pass key="):
            CmvnStats.load(p)
        got = CmvnStats.load(p, key="spk1")
        np.testing.assert_array_equal(got.mean, spk["spk1"].mean)

    def test_from_kaldi_validates(self):
        from tpufeat.data import CmvnStats
        for bad in (np.ones((3, 5)), np.ones((2,)), np.ones((2, 1))):
            with pytest.raises(ValueError, match="2, D"):
                CmvnStats.from_kaldi(bad)
