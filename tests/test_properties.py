"""Property-based tests (SURVEY.md §4 "Property"): random lengths and
amplitudes through the jitted pipeline."""

import numpy as np
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
