"""Spectrogram features (n_mels=0) — the Kaldi compute-spectrogram-feats
analogue (beyond the reference's MFCC/log-mel families, like PLP/pitch).

The pipeline stops at the (log-)power spectrum: dim n_fft//2+1, optional
log-frame-energy substitution into element 0, composing with deltas/CMVN/
streaming like every other feature family. Goldens: float64 NumPy
(reference/cpu.py) and C++ double (cpp_ref tpufeat_spec_f64)."""

import numpy as np
import pytest

from tpufeat import cpp_golden, features, streaming
from tpufeat.config import PRESETS, SPEC257, FeatureConfig
from tpufeat.reference import cpu

from conftest import make_signal
from test_extract_parity import assert_parity

SPEC_CLASSIC = FeatureConfig(n_mels=0, n_mfcc=0)  # Hamming, natural log


class TestConfig:
    def test_feature_dim_is_bins(self):
        assert SPEC_CLASSIC.feature_dim == 257
        assert SPEC257.feature_dim == 257
        cfg = FeatureConfig(n_mels=0, n_mfcc=0, n_fft=400, frame_length=400)
        assert cfg.feature_dim == 201
        d = FeatureConfig(n_mels=0, n_mfcc=0, deltas=True)
        assert d.feature_dim == 3 * 257

    def test_preset_registered(self):
        assert PRESETS["spec257"] is SPEC257

    def test_rejects_cepstrum(self):
        with pytest.raises(ValueError, match="n_mfcc=0"):
            FeatureConfig(n_mels=0, n_mfcc=13)
        with pytest.raises(ValueError, match="plp_order=0"):
            FeatureConfig(n_mels=0, n_mfcc=0, log="none", plp_order=12)

    def test_rejects_whisper_log(self):
        with pytest.raises(ValueError, match="mel-path"):
            FeatureConfig(n_mels=0, n_mfcc=0, log="whisper")

    def test_rejects_pallas(self):
        with pytest.raises(ValueError, match="use_pallas=False"):
            FeatureConfig(n_mels=0, n_mfcc=0, use_pallas=True)

    def test_rejects_negative_mels(self):
        with pytest.raises(ValueError, match="n_mels"):
            FeatureConfig(n_mels=-1)


class TestGoldenParity:
    def test_classic_batched(self):
        sigs = [make_signal(16000, seed=s) for s in range(3)]
        sigs[1] = sigs[1][:9173]                 # ragged lengths
        assert_parity(SPEC_CLASSIC, sigs, atol=1e-3, pad_garbage=True)

    def test_spec257_preset(self):
        """Kaldi-flavored preset: per-frame conditioning (dc offset, Povey,
        per-frame preemphasis) + log energy in element 0."""
        sigs = [make_signal(12000, seed=s) for s in range(2)]
        assert_parity(SPEC257, sigs, atol=1e-3)

    def test_energy_element(self):
        sig = make_signal(8000, seed=3)
        cfg = FeatureConfig(n_mels=0, n_mfcc=0, use_energy=True)
        res = features.extract(sig, cfg=cfg)
        e = cpu.frame_energy(sig.astype(np.float64), cfg)
        np.testing.assert_allclose(np.asarray(res.features)[:, 0], e,
                                   atol=1e-4, rtol=0)
        # the other bins are untouched by the substitution
        base = features.extract(sig, cfg=SPEC_CLASSIC)
        np.testing.assert_array_equal(np.asarray(res.features)[:, 1:],
                                      np.asarray(base.features)[:, 1:])

    def test_deltas_cmvn_compose(self):
        sigs = [make_signal(10000, seed=s) for s in range(2)]
        cfg = FeatureConfig(n_mels=0, n_mfcc=0, deltas=True, cmvn="mean")
        err = assert_parity(cfg, sigs, atol=1e-3)
        assert err < 1e-3

    def test_gemm_dft_matches_rfft(self):
        sig = make_signal(8000, seed=5)
        a = features.extract(sig, cfg=SPEC_CLASSIC)
        b = features.extract(
            sig, cfg=FeatureConfig(n_mels=0, n_mfcc=0, gemm_dft=True))
        np.testing.assert_allclose(np.asarray(a.features),
                                   np.asarray(b.features), atol=2e-3, rtol=0)

    def test_magnitude_spectrum(self):
        sig = make_signal(8000, seed=7)
        cfg = FeatureConfig(n_mels=0, n_mfcc=0, spectrum="magnitude",
                            log="log10")
        res = features.extract(sig, cfg=cfg)
        ref = cpu.extract(sig.astype(np.float64), cfg)
        assert np.abs(np.asarray(res.features) - ref).max() < 1e-3


class TestThreeWay:
    @pytest.mark.parametrize("use_energy", [False, True])
    def test_cpp_vs_numpy_vs_jax(self, use_energy):
        """NumPy f64 golden == C++ double to 1e-9; JAX f32 within 5e-3
        (raw spectrum bins reach far closer to zero than mel SUMS of bins,
        so the log amplifies the f32 spectrum error more than on the mel
        families — same floor effect BASELINE.md documents for pure
        tones; measured 1.8e-3 on this signal)."""
        if not cpp_golden.available():
            pytest.skip("C++ golden not built")
        cfg = FeatureConfig(n_mels=0, n_mfcc=0, use_energy=use_energy)
        sig = make_signal(8000, seed=11)
        a = cpu.extract(sig.astype(np.float64), cfg)
        b = cpp_golden.spec_native(sig, cfg)
        np.testing.assert_allclose(a, b, atol=1e-9, rtol=0)
        c = np.asarray(features.extract(sig, cfg=cfg).features)
        assert np.abs(c - a).max() < 5e-3

    def test_cpp_rejects_uncovered_configs(self):
        if not cpp_golden.available():
            pytest.skip("C++ golden not built")
        with pytest.raises(ValueError):
            cpp_golden.spec_native(make_signal(4000), SPEC257)  # kaldi_mode
        with pytest.raises(ValueError):
            cpp_golden.spec_native(make_signal(4000), FeatureConfig())


class TestStreaming:
    @pytest.mark.parametrize("cfg", [SPEC_CLASSIC, SPEC257],
                             ids=["classic", "spec257"])
    def test_chunked_matches_one_shot(self, cfg):
        from test_streaming import plan, stream_extract
        sig = make_signal(6400, seed=13)
        ref = np.asarray(features.extract(sig, cfg=cfg).features)
        got = stream_extract(sig, cfg, plan(len(sig), 1600))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)


def test_cli_spectrogram_outputs(tmp_path, capsys):
    from tpufeat import cli, feats_io, io as wio
    wav = tmp_path / "a.wav"
    wio.write_wav(str(wav), make_signal(8000, seed=17), 16000)
    out = tmp_path / "a.npy"
    cli.main([str(wav), str(out), "--set", "n_mels=0", "--set", "n_mfcc=0"])
    feats = np.load(out)
    assert feats.shape[1] == 257
    # HTK output stamps USER (no HTKBook kind describes a raw spectrum)
    htk = tmp_path / "a.htk"
    cli.main([str(wav), str(htk), "--set", "n_mels=0", "--set", "n_mfcc=0"])
    data, _, kind = feats_io.read_htk(str(htk))
    assert kind & 0x3F == feats_io.HTK_USER
    np.testing.assert_allclose(data, feats, atol=1e-5, rtol=0)
