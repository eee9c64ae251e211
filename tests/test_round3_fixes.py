"""Round-3 review fixes (VERDICT.md round 2):

- the large-batch erratum guard: plain extract()/make_extractor() must
  auto-route shapes outside the validated envelope through exact
  row-splitting instead of silently corrupting (VERDICT item 1);
- rng plumbing: dither configs must work through make_extractor /
  extract_chunked / the corpus pipeline (VERDICT item 7).
"""

import dataclasses

import jax
import numpy as np
import pytest

from tpufeat import features
from tpufeat.config import KALDI39, MFCC13_HTK


class TestErratumGuardMechanics:
    def test_rows_per_dispatch_balanced(self):
        # (round-5: the clean region widened to B<=512 / 245.76M samples
        # after the preemphasis-trigger fix; splits now engage beyond it)
        # 1024 x 30 s must split 512+512 balanced, not 512+remainder junk
        assert features._rows_per_dispatch(1024, 480000) == 512
        # 2048 x 15 s: balanced dispatches under the 512-row cap
        r = features._rows_per_dispatch(2048, 240000)
        assert 1 <= r <= 512 and features._single_program_safe((r, 240000))
        # one row per dispatch when a single row fills the clean region
        assert features._rows_per_dispatch(
            3, features.ERRATUM_MAX_TOTAL) == 1

    def test_rows_per_dispatch_stays_in_clean_region(self):
        for b in (256, 300, 511, 512, 1000):
            for n in (480000, 960000, 240000, 1600):
                r = features._rows_per_dispatch(b, n)
                assert 1 <= r <= b
                assert features._single_program_safe((r, n))
                if b % r:                    # the smaller remainder dispatch
                    assert features._single_program_safe((b % r, n))

    def test_safe_predicate(self):
        # round-5 region: every formerly-corrupt point re-measured clean
        # with the fixed preemphasis and is now admitted single-program
        assert features._single_program_safe((248, 480000))
        assert features._single_program_safe((256, 480000))
        assert features._single_program_safe((256, 384000))  # 24 s
        assert features._single_program_safe((384, 480000))
        assert features._single_program_safe((512, 240000))  # 15 s
        assert features._single_program_safe((512, 480000))
        assert features._single_program_safe((128, 960000))
        # unprobed territory beyond the re-measured region still splits
        # (defense in depth — the envelope was program-dependent)
        assert not features._single_program_safe((513, 480000))
        assert not features._single_program_safe((512, 480001))
        assert not features._single_program_safe((1024, 480000))
        # small many-stream dispatches stay single-shot (tiny-total
        # exemption, 6x under the smallest corrupt point)
        assert features._single_program_safe((1024, 1600))
        assert not features._single_program_safe((65536, 1600))
        s = features.ERRATUM_MAX_TOTAL
        # single rows are never split (no known single-row corruption;
        # row-splitting could not help anyway)
        assert features._single_program_safe((1, 10 * s))
        assert features._single_program_safe((2, s // 2))
        assert not features._single_program_safe((2, s // 2 + 1))

    def test_guard_routes_and_is_exact(self, monkeypatch):
        """With the envelope shrunk so a small batch trips it, the guarded
        default path must agree with the forced single-program path."""
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((6, 4000)) * 0.1).astype(np.float32)
        lens = np.array([4000, 3500, 1200, 4000, 2000, 399], np.int32)
        want = features.extract(x, lens, MFCC13_HTK, single_program=True)
        monkeypatch.setattr(features, "ERRATUM_TINY_TOTAL", 2 * 4000)
        monkeypatch.setattr(features, "ERRATUM_MAX_TOTAL", 2 * 4000)
        assert not features._single_program_safe(x.shape)
        got = features.extract(x, lens, MFCC13_HTK)      # auto-routed
        assert got.features.shape == want.features.shape
        np.testing.assert_allclose(np.asarray(got.features),
                                   np.asarray(want.features),
                                   rtol=0, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(got.mask),
                                      np.asarray(want.mask))
        np.testing.assert_array_equal(np.asarray(got.num_frames),
                                      np.asarray(want.num_frames))

    def test_make_extractor_guards_too(self, monkeypatch):
        """The corpus-pipeline entry point (make_extractor closures) guards
        per call, including the two-program delta split path."""
        rng = np.random.default_rng(4)
        x = (rng.standard_normal((4, 4000)) * 0.1).astype(np.float32)
        lens = np.full((4,), 4000, np.int32)
        want = features.extract(x, lens, KALDI39, single_program=True)
        monkeypatch.setattr(features, "ERRATUM_TINY_TOTAL", 4000)
        monkeypatch.setattr(features, "ERRATUM_MAX_TOTAL", 4000)
        got = features.make_extractor(KALDI39)(x, lens)  # 1-row dispatches
        np.testing.assert_allclose(np.asarray(got.features),
                                   np.asarray(want.features),
                                   rtol=0, atol=2e-5)


class TestDitherRngPlumbing:
    DITHER = dataclasses.replace(MFCC13_HTK, dither=1e-3)

    def _sig(self, b=4, n=4000, seed=5):
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((b, n)) * 0.1).astype(np.float32), \
            np.full((b,), n, np.int32)

    def test_extractor_requires_rng(self):
        x, lens = self._sig()
        with pytest.raises(ValueError, match="PRNG"):
            features.make_extractor(self.DITHER)(x, lens)

    def test_extractor_accepts_rng(self):
        x, lens = self._sig()
        res = features.make_extractor(self.DITHER)(
            x, lens, rng=jax.random.key(0))
        clean = features.extract(x, lens, MFCC13_HTK)
        d = np.abs(np.asarray(res.features) - np.asarray(clean.features))
        assert 0 < d.max() < 0.5          # noise present, small

    def test_chunked_splits_keys(self):
        """extract_chunked with dither: works, and each row slice draws
        from an independent key (identical rows must get different noise
        in different slices)."""
        n = 4000
        row = (np.random.default_rng(6).standard_normal(n) * 0.1
               ).astype(np.float32)
        x = np.stack([row] * 4)
        lens = np.full((4,), n, np.int32)
        res = features.extract_chunked(x, lens, self.DITHER,
                                       rows_per_dispatch=2,
                                       rng=jax.random.key(7))
        f = np.asarray(res.features)
        # rows 0/1 share a slice key but different per-sample draws; rows
        # in different slices must differ too (independent keys)
        assert not np.array_equal(f[0], f[2])
        assert not np.array_equal(f[1], f[3])

    def test_chunked_matches_distribution(self):
        """Dithered chunked output stays within a hair of the clean
        features (dither=1e-3 on 0.1-RMS audio) — sanity that the noise is
        applied at the right scale, not squared/doubled."""
        x, lens = self._sig(b=6)
        res = features.extract_chunked(x, lens, self.DITHER,
                                       rows_per_dispatch=3,
                                       rng=jax.random.key(8))
        clean = features.extract(x, lens, MFCC13_HTK)
        d = np.abs(np.asarray(res.features) - np.asarray(clean.features))
        assert np.median(d) < 0.05

    def test_guard_plus_dither_compose(self, monkeypatch):
        """Auto-routed extract() with dither splits the key per slice."""
        x, lens = self._sig(b=4)
        monkeypatch.setattr(features, "ERRATUM_TINY_TOTAL", 2 * 4000)
        monkeypatch.setattr(features, "ERRATUM_MAX_TOTAL", 2 * 4000)
        res = features.extract(x, lens, self.DITHER, rng=jax.random.key(9))
        assert res.features.shape[0] == 4
        with pytest.raises(ValueError, match="PRNG"):
            features.extract(x, lens, self.DITHER)


class TestForcedSingleProgram:
    def test_true_really_means_one_program(self, monkeypatch):
        """single_program=True exists for erratum tracking: it must run
        the raw ONE-program path even for delta configs that would
        normally take the two-program split (the miscompile under test
        lives in the single large program)."""
        monkeypatch.setattr(features, "_split_worthwhile",
                            lambda cfg, shape: True)
        calls = []
        orig = features._features_jit
        monkeypatch.setattr(
            features, "_features_jit",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        rng = np.random.default_rng(12)
        x = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)
        lens = np.full((2,), 4000, np.int32)
        features.extract(x, lens, KALDI39)            # default: split path
        assert calls
        calls.clear()
        features.extract(x, lens, KALDI39, single_program=True)
        assert not calls                              # raw single program
