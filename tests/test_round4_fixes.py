"""Round-4 advisor fixes (ADVICE.md round 3):

- ``Plda.load_auto`` sniffs the container by magic bytes, so a corrupted
  npz raises the real np.load/zipfile error instead of a confusing
  'bad Kaldi <Plda> object' one;
- ``kaldi_vad``'s float thresholds are traced operands — changing them
  must NOT compile a new program (only ``frames_context`` is static).
"""

import numpy as np
import pytest

from tpufeat import augment
from tpufeat.plda import Plda


def _toy_plda(dim: int = 4) -> Plda:
    rng = np.random.default_rng(0)
    return Plda(rng.normal(size=dim),
                rng.normal(size=(dim, dim)),
                np.abs(rng.normal(size=dim)) + 0.5)


class TestPldaLoadAuto:
    def test_loads_npz(self, tmp_path):
        m = _toy_plda()
        p = str(tmp_path / "model")
        m.save(p)
        got = Plda.load_auto(p)            # suffix-less, like load()
        np.testing.assert_allclose(got.mean, m.mean)
        np.testing.assert_allclose(got.transform, m.transform)
        np.testing.assert_allclose(got.psi, m.psi)

    def test_loads_kaldi_binary(self, tmp_path):
        m = _toy_plda()
        p = str(tmp_path / "plda.bin")
        m.save_kaldi(p)
        got = Plda.load_auto(p)
        np.testing.assert_allclose(got.mean, m.mean, rtol=1e-6)

    def test_corrupt_npz_raises_the_real_error(self, tmp_path):
        p = tmp_path / "model.npz"
        p.write_bytes(b"PK\x03\x04 truncated zip garbage")
        with pytest.raises(Exception) as exc:
            Plda.load_auto(str(p))
        # the failure must come from the npz loader, not from the Kaldi
        # binary parser misreading zip bytes as a <Plda> object
        assert "Plda" not in str(exc.value)


class TestKaldiVadTracedThresholds:
    def test_thresholds_do_not_recompile(self):
        # NOTE: the kwarg SET is part of jit's cache key (pytree
        # structure); the fix is that the float VALUES are traced, so
        # sweeping them within one call signature compiles once.
        e = np.linspace(-2.0, 8.0, 32)[None, :].repeat(2, axis=0)

        def call(t, s, p):
            return augment.kaldi_vad(e, energy_threshold=t,
                                     energy_mean_scale=s,
                                     proportion_threshold=p)

        call(5.0, 0.5, 0.6)                 # warm the cache
        before = augment.kaldi_vad._cache_size()
        out1 = call(4.0, 0.5, 0.6)
        out2 = call(6.0, 0.25, 0.3)
        assert augment.kaldi_vad._cache_size() == before
        assert np.asarray(out1).sum() >= np.asarray(out2).sum()

    def test_frames_context_still_structural(self):
        e = np.r_[np.full(10, -5.0), np.full(3, 10.0), np.full(10, -5.0)]
        flat = augment.kaldi_vad(e, energy_threshold=0.0,
                                 energy_mean_scale=0.0)
        wide = augment.kaldi_vad(e, energy_threshold=0.0,
                                 energy_mean_scale=0.0, frames_context=2,
                                 proportion_threshold=0.2)
        assert np.asarray(flat).sum() == 3
        assert np.asarray(wide).sum() > 3
