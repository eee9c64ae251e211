"""Fused Pallas kernel vs unfused jnp composition (SURVEY.md §4 "Pallas vs
XLA"): identical math, one kernel. Runs in interpret mode off-TPU."""

import dataclasses

import numpy as np
import pytest

from tpufeat import features
from tpufeat.config import FeatureConfig, KALDI39, MFCC13_HTK, WHISPER80

from conftest import make_signal


def pallas_vs_xla(cfg, sigs, atol):
    from tests.test_extract_parity import pad_batch  # reuse helpers
    x, lengths = pad_batch(sigs)
    p_cfg = dataclasses.replace(cfg, use_pallas=True)
    x_cfg = dataclasses.replace(cfg, use_pallas=False)
    a = features.extract(x, lengths, p_cfg)
    b = features.extract(x, lengths, x_cfg)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    m = np.asarray(a.mask)
    err = np.abs(np.asarray(a.features)[m] - np.asarray(b.features)[m]).max()
    assert err < atol, f"pallas vs xla max abs err {err}"
    return a


try:
    import sys
    sys.path.insert(0, "tests")
except Exception:
    pass
from test_extract_parity import golden_batch, pad_batch  # noqa: E402


class TestTailKernel:
    def test_mfcc13(self):
        sigs = [make_signal(n, seed=70 + i) for i, n in
                enumerate([16000, 7043])]
        pallas_vs_xla(MFCC13_HTK, sigs, atol=2e-5)

    def test_whisper80(self):
        sigs = [make_signal(n, seed=72 + i) for i, n in
                enumerate([16000, 9000])]
        pallas_vs_xla(WHISPER80, sigs, atol=2e-6)

    def test_kaldi39_with_deltas_cmvn(self):
        sigs = [make_signal(8000, seed=74)]
        pallas_vs_xla(KALDI39, sigs, atol=2e-5)

    def test_lifter_magnitude(self):
        cfg = FeatureConfig(lifter=22, spectrum="magnitude")
        pallas_vs_xla(cfg, [make_signal(5000, seed=75)], atol=2e-5)


class TestFullGemmKernel:
    def test_mfcc13_golden(self):
        cfg = dataclasses.replace(MFCC13_HTK, use_pallas=True, gemm_dft=True)
        sigs = [make_signal(12000, seed=76)]
        x, lengths = pad_batch(sigs)
        res = features.extract(x, lengths, cfg)
        gfeat, gmask = golden_batch(sigs, cfg)
        err = np.abs(np.asarray(res.features)[gmask] - gfeat[gmask]).max()
        assert err < 2e-3, err

    def test_whisper80_golden(self):
        cfg = dataclasses.replace(WHISPER80, use_pallas=True, gemm_dft=True)
        sigs = [make_signal(16000, seed=77), make_signal(6500, seed=78)]
        x, lengths = pad_batch(sigs)
        res = features.extract(x, lengths, cfg)
        gfeat, gmask = golden_batch(sigs, cfg)
        err = np.abs(np.asarray(res.features)[gmask] - gfeat[gmask]).max()
        assert err < 1e-4, err

    def test_matches_xla_gemm(self):
        cfg = dataclasses.replace(MFCC13_HTK, gemm_dft=True)
        pallas_vs_xla(cfg, [make_signal(7000, seed=79)], atol=2e-5)


class TestFusedFraming:
    """Signal-level kernel (framing inside the kernel) vs staged paths."""

    @pytest.mark.parametrize("preset", [MFCC13_HTK, WHISPER80])
    def test_matches_staged(self, preset):
        cfg_f = dataclasses.replace(preset, use_pallas=True, gemm_dft=True,
                                    fused_framing=True)
        cfg_s = dataclasses.replace(preset, use_pallas=True, gemm_dft=True)
        sigs = [make_signal(12000, seed=85), make_signal(7003, seed=86)]
        x, lengths = pad_batch(sigs)
        a = features.extract(x, lengths, cfg_f)
        b = features.extract(x, lengths, cfg_s)
        m = np.asarray(a.mask)
        err = np.abs(np.asarray(a.features)[m]
                     - np.asarray(b.features)[m]).max()
        assert err < 2e-5, err

    def test_matches_golden(self):
        cfg = dataclasses.replace(MFCC13_HTK, use_pallas=True, gemm_dft=True,
                                  fused_framing=True)
        sigs = [make_signal(9000, seed=87)]
        x, lengths = pad_batch(sigs)
        res = features.extract(x, lengths, cfg)
        gfeat, gmask = golden_batch(sigs, cfg)
        err = np.abs(np.asarray(res.features)[gmask] - gfeat[gmask]).max()
        assert err < 2e-3, err


class TestBlocking:
    @pytest.mark.parametrize("n", [560, 4000, 83000])
    def test_row_padding_inert(self, n):
        """Frame counts that don't divide the block size must still match."""
        pallas_vs_xla(MFCC13_HTK, [make_signal(n, seed=80)], atol=2e-5)

    def test_tiny_batch(self):
        pallas_vs_xla(MFCC13_HTK, [make_signal(400, seed=81)], atol=2e-5)
