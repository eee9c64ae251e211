"""Property-based tests (SURVEY.md §4 "Property"): random lengths and
amplitudes through the jitted pipeline."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tpufeat import features, framing
from tpufeat.config import FeatureConfig, MFCC13_HTK, WHISPER80
from tpufeat.reference import cpu

import jax.numpy as jnp


@st.composite
def signals(draw, min_n=400, max_n=50_000):
    n = draw(st.integers(min_n, max_n))
    seed = draw(st.integers(0, 2**31 - 1))
    amp = draw(st.floats(1e-4, 30.0))
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * amp).astype(np.float32)


class TestFramingProperties:
    @given(sig=signals())
    @settings(max_examples=15, deadline=None)
    def test_framing_inverse(self, sig):
        """Every valid frame must be exactly the corresponding signal slice
        (framing is a pure copy, no arithmetic)."""
        x = jnp.asarray(sig)[None]
        frames, mask = framing.frame_signal(
            x, jnp.array([len(sig)]), MFCC13_HTK)
        frames = np.asarray(frames)[0]
        nf = int(np.asarray(mask).sum())
        for t in (0, nf // 2, nf - 1):
            np.testing.assert_array_equal(
                frames[t], sig[t * 160: t * 160 + 400])

    @pytest.mark.slow  # ~8 s fuzz; fixed-geometry mask-invariance tests run in every feature suite
    @given(sig=signals(min_n=600, max_n=20_000),
           extra=st.integers(1, 5000))
    @settings(max_examples=15, deadline=None)
    def test_mask_invariance(self, sig, extra):
        """Padding amount and contents never change valid outputs (up to
        XLA reduction-order noise: different padded widths compile to
        different tilings, ~1e-6; a genuine mask leak would be O(1))."""
        n = len(sig)
        a = features.extract(sig, cfg=MFCC13_HTK)
        padded = np.concatenate(
            [sig, np.full(extra, 7.7, np.float32)])[None]
        b = features.extract(padded, np.array([n]), MFCC13_HTK)
        nf = int(a.num_frames)
        want = np.asarray(a.features)[:nf]
        got = np.asarray(b.features)[0][np.asarray(b.mask)[0]]
        scale = max(1.0, np.abs(want).max())
        assert np.abs(want - got).max() / scale < 1e-5

    @given(sig=signals(min_n=1000, max_n=30_000))
    @settings(max_examples=10, deadline=None)
    def test_parseval_through_pipeline(self, sig):
        """Energy conservation through the jnp rFFT (rect window, no
        preemphasis): sum|X|^2 == n_fft * sum|frame|^2."""
        cfg = FeatureConfig(preemphasis=0.0, window="rect")
        from tpufeat import spectrum
        x = jnp.asarray(sig)[None]
        frames, _ = framing.frame_signal(x, jnp.array([len(sig)]), cfg)
        spec = np.asarray(spectrum.power_spectrum_rfft(frames, cfg))[0]
        f = np.asarray(frames)[0]
        full = 2 * spec.sum(-1) - spec[:, 0] - spec[:, -1]
        np.testing.assert_allclose(
            full, cfg.n_fft * (f.astype(np.float64) ** 2).sum(-1),
            rtol=2e-4)

    @given(sig=signals(min_n=401, max_n=20_000))
    @settings(max_examples=10, deadline=None)
    def test_golden_agreement_random(self, sig):
        res = features.extract(sig, cfg=MFCC13_HTK)
        gold = cpu.extract(sig.astype(np.float64), MFCC13_HTK)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    @given(sig=signals(min_n=401, max_n=20_000))
    @settings(max_examples=8, deadline=None)
    def test_whisper_golden_random(self, sig):
        res = features.extract(sig, cfg=WHISPER80)
        gold = cpu.extract(sig.astype(np.float64), WHISPER80)
        assert np.abs(np.asarray(res.features) - gold).max() < 1e-4


class TestSlidingCmvnProperties:
    @pytest.mark.slow  # ~17 s fuzz; test_sliding_cmvn pins fixed geometries in the default tier
    @given(T=st.integers(1, 400), window=st.integers(1, 200),
           min_window=st.integers(1, 120), center=st.booleans(),
           seed=st.integers(0, 2**31 - 1))
    @settings(max_examples=25, deadline=None)
    def test_golden_agreement_random_geometry(self, T, window, min_window,
                                              center, seed):
        """Random (T, window, min_window, center) geometry: the f32 op
        matches the f64 per-frame-loop golden — every clamp branch gets
        hit somewhere in this space.

        Mean normalization is asserted for EVERY geometry. Variance
        normalization only for windows >= 8: the variance path is
        one-pass (E[x^2] - mean^2; a two-pass per-window mean is not
        expressible with one cumsum), so degenerate 1-3-frame windows
        hit catastrophic cancellation in f32 that 1/sqrt(var) amplifies
        WITHOUT BOUND as the window variance -> 0 (two near-equal
        adjacent frames) — an ill-posed comparison, not a defect.
        Realistic windows sit at ~1e-5 (the fixed-geometry tests assert
        2e-5 at windows 9 and 600)."""
        rng = np.random.default_rng(seed)
        f = (rng.standard_normal((T, 5)) * 2).astype(np.float32)
        want = cpu.sliding_cmvn(f, window=window, min_window=min_window,
                                center=center)
        got = features.sliding_cmvn(
            jnp.asarray(f)[None], None, window=window,
            min_window=min_window, center=center)[0]
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5,
                                   rtol=0)
        if window >= 8:
            want_v = cpu.sliding_cmvn(f, window=window,
                                      min_window=min_window,
                                      center=center, norm_vars=True)
            got_v = features.sliding_cmvn(
                jnp.asarray(f)[None], None, window=window,
                min_window=min_window, center=center, norm_vars=True)[0]
            np.testing.assert_allclose(np.asarray(got_v), want_v,
                                       atol=5e-4, rtol=0)

    @pytest.mark.slow  # ~26 s fuzz; test_sliding_cmvn's fixed chunk plans stay in the default tier
    @given(T=st.integers(50, 300), chunks=st.lists(
        st.integers(1, 80), min_size=1, max_size=8),
        seed=st.integers(0, 2**31 - 1))
    @settings(max_examples=15, deadline=None)
    def test_streaming_exact_any_chunk_plan(self, T, chunks, seed):
        """Any chunk plan drains to the offline causal operator."""
        from tpufeat import streaming
        rng = np.random.default_rng(seed)
        f = rng.standard_normal((T, 4)).astype(np.float32)
        want = features.sliding_cmvn(jnp.asarray(f)[None], None,
                                     window=60, min_window=25)[0]
        sc = streaming.StreamingSlidingCMVN(4, 1, window=60,
                                            min_window=25)
        outs, pos = [], 0
        for c in chunks:
            c = min(c, T - pos)
            if c <= 0:
                break
            outs.append(sc.process(jnp.asarray(f[None, pos:pos + c])))
            pos += c
        if pos < T:
            outs.append(sc.process(jnp.asarray(f[None, pos:])))
        outs.append(sc.flush())
        got = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
        assert got.shape[0] == T
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5,
                                   rtol=0)


class TestSpeakerBackendProperties:
    """Hypothesis properties for the round-3 statistical modules."""

    @given(seed=st.integers(0, 2**31 - 1),
           dim=st.integers(2, 12),
           n_spk=st.integers(4, 12),
           n_per=st.integers(3, 6))
    @settings(max_examples=10, deadline=None)
    def test_plda_diagonalization_invariants(self, seed, dim, n_spk,
                                             n_per):
        """For ANY labeled training set: the trained transform
        simultaneously diagonalizes its own implied covariances, psi is
        sorted non-negative, and scoring is finite."""
        from tpufeat import plda as pl
        r = np.random.default_rng(seed)
        spk = r.standard_normal((n_spk, dim)) * 2.0
        x = (np.repeat(spk, n_per, axis=0)
             + r.standard_normal((n_spk * n_per, dim)))
        ids = np.repeat(np.arange(n_spk), n_per)
        model = pl.train_plda(x, ids, iters=3)
        Ainv = np.linalg.inv(model.transform)
        W = model.transform @ (Ainv @ Ainv.T) @ model.transform.T
        np.testing.assert_allclose(W, np.eye(dim), atol=1e-7)
        assert (model.psi >= 0).all()
        assert (np.diff(model.psi) <= 1e-9).all()
        s = np.asarray(model.score(x[:3], x[3:6]))
        assert np.isfinite(s).all()

    @given(seed=st.integers(0, 2**31 - 1),
           scale=st.floats(0.5, 4.0),
           shift=st.floats(-2.0, 2.0))
    @settings(max_examples=10, deadline=None)
    def test_fmllr_likelihood_never_decreases(self, seed, scale, shift):
        """For ANY diagonal-affine distortion, the estimated transform's
        Jacobian-corrected likelihood is at least the unadapted one."""
        from tpufeat import fmllr as fm
        from tpufeat import ivector as iv
        from tpufeat.data import apply_transform
        r = np.random.default_rng(seed)
        centers = r.standard_normal((3, 4)) * 2.0
        frames = np.concatenate(
            [c + r.standard_normal((150, 4)) for c in centers]
        ).astype(np.float32)
        ubm = iv.train_diag_ubm(frames, 3, iters=1, final_iters=2,
                                seed=0)
        xd = (frames * scale + shift).astype(np.float32)
        W = fm.est_fmllr(ubm, xd, iters=10, min_count=1.0)
        adapted = np.asarray(apply_transform(xd, W))
        gain = (iv.avg_log_like(ubm, adapted)
                + np.linalg.slogdet(W[:, :-1])[1]
                - iv.avg_log_like(ubm, xd))
        assert gain > -1e-3, gain

    @given(seed=st.integers(0, 2**31 - 1),
           T=st.integers(30, 400),
           window=st.sampled_from([50, 100, 150]),
           period=st.sampled_from([25, 50]))
    @settings(max_examples=10, deadline=None)
    def test_diarization_window_grid_covers(self, seed, T, window,
                                            period):
        """For ANY frame count and grid: spans tile [0, T] (first starts
        at 0, last ends at T unless dropped short, starts step by
        period, ends clamp to T)."""
        from tpufeat.diarization import sliding_windows
        if window % period:
            window = (window // period) * period or period
        spans = sliding_windows(T, window=window, period=period)
        assert spans[0][0] == 0
        assert (np.diff(spans[:, 0]) == period).all()
        assert (spans[:, 1] <= T).all()
        assert (spans[:, 1] - spans[:, 0] <= window).all()
        # coverage: every frame lies inside at least one span, except a
        # contiguous tail shorter than min_window that the grid DROPS by
        # design (offline labeling assigns those frames to the nearest
        # center; hypothesis found T=101, w=p=50 where frame 100 is such
        # a tail)
        covered = np.zeros(T, bool)
        for s, e in spans:
            covered[s:e] = True
        uncov = np.flatnonzero(~covered)
        if uncov.size:
            assert uncov[0] > spans[-1][1] - 1 or len(spans) == 1
            assert uncov.size < 25           # default min_window
            assert (np.diff(uncov) == 1).all()
