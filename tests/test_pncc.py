"""PNCC chain tests (tpufeat/pncc.py): golden parity on the XLA and
fused paths, batch/mask equivalence, the published scale-invariance
property, composition, and config validation."""

import dataclasses

import numpy as np
import pytest

from tpufeat import features
from tpufeat.config import FeatureConfig, PNCC13
from tpufeat.reference import cpu

from conftest import make_signal

FUSED = dict(use_pallas=True, gemm_dft=True, fused_framing=True)


class TestGoldenParity:
    def test_xla_path(self):
        sig = make_signal(16000, seed=50)
        got = np.asarray(features.extract(sig, cfg=PNCC13).features)
        want = cpu.extract(sig.astype(np.float64), PNCC13)
        assert got.shape == want.shape == (98, 13)
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_fused_path(self):
        cfg = dataclasses.replace(PNCC13, **FUSED)
        sig = make_signal(16000, seed=51)
        got = np.asarray(features.extract(sig, cfg=cfg).features)
        want = cpu.extract(sig.astype(np.float64), PNCC13)
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_masked_batch_matches_single(self):
        """Padded-batch rows must equal per-utterance processing: the
        medium-time window is mask-aware and the recursions freeze
        through padding."""
        a = make_signal(16000, seed=52)
        b = make_signal(9600, seed=53)
        pad = np.zeros((2, 16000), np.float32)
        pad[0] = a
        pad[1, :9600] = b
        res = features.extract(pad, np.array([16000, 9600]), cfg=PNCC13)
        feats = np.asarray(res.features)
        nf = np.asarray(res.num_frames)
        np.testing.assert_allclose(
            feats[0, : nf[0]],
            np.asarray(features.extract(a, cfg=PNCC13).features),
            atol=1e-5)
        np.testing.assert_allclose(
            feats[1, : nf[1]],
            np.asarray(features.extract(b, cfg=PNCC13).features),
            atol=1e-5)
        assert (feats[1, nf[1]:] == 0).all()     # padding rows zeroed


class TestProperties:
    def test_scale_invariance(self):
        """Mean power normalization makes PNCC invariant to input gain
        (the paper's headline robustness property)."""
        sig = make_signal(16000, seed=54)
        base = np.asarray(features.extract(sig, cfg=PNCC13).features)
        scaled = np.asarray(features.extract(7.5 * sig,
                                             cfg=PNCC13).features)
        np.testing.assert_allclose(scaled, base, atol=1e-4)

    def test_additive_noise_moves_pncc_less_than_logmel(self):
        """The noise-suppression stack: stationary additive noise must
        perturb PNCC (relatively) less than plain log-gammatone
        features of the same bank."""
        r = np.random.default_rng(55)
        sig = make_signal(32000, seed=56)
        noisy = sig + 0.03 * r.standard_normal(32000).astype(np.float32)
        logg = dataclasses.replace(PNCC13, pncc=False, log="natural")

        def rel(cfg):
            c = np.asarray(features.extract(sig, cfg=cfg).features)
            n = np.asarray(features.extract(noisy, cfg=cfg).features)
            return np.linalg.norm(n - c) / np.linalg.norm(c)

        assert rel(PNCC13) < rel(logg), (rel(PNCC13), rel(logg))

    def test_deltas_compose(self):
        cfg = dataclasses.replace(PNCC13, deltas=True)
        assert cfg.feature_dim == 39
        sig = make_signal(8000, seed=57)
        out = np.asarray(features.extract(sig, cfg=cfg).features)
        assert out.shape[1] == 39


class TestValidation:
    def test_config_rules(self):
        with pytest.raises(ValueError, match="PNCC"):
            FeatureConfig(pncc=True)                 # log defaults natural
        with pytest.raises(ValueError, match="PNCC"):
            FeatureConfig(pncc=True, log="none")     # n_mfcc=13 default
        with pytest.raises(ValueError, match="pncc_ceps"):
            dataclasses.replace(PNCC13, pncc_ceps=41)

    def test_streaming_rejected(self):
        from tpufeat import streaming
        with pytest.raises(ValueError, match="PNCC"):
            streaming.StreamingFrontend(PNCC13)

    def test_cli_preset(self, tmp_path):
        from tpufeat import cli, io
        wav = str(tmp_path / "a.wav")
        io.write_wav(wav, make_signal(8000, seed=58), 16000)
        out = str(tmp_path / "a.npy")
        assert cli.main([wav, out, "--preset", "pncc13"]) == 0
        assert np.load(out).shape[1] == 13
