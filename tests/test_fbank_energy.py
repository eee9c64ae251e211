"""Filterbank + energy — the Kaldi ``compute-fbank-feats --use-energy``
analogue: on fbank configs (n_mfcc=0, n_mels>0) ``use_energy`` PREPENDS the
conditioned-frame log energy as an extra first column (dim n_mels+1),
unlike the MFCC / spectrogram families where it substitutes element 0.

Goldens: float64 NumPy (reference/cpu.py) and C++ double
(cpp_ref tpufeat_fbank_f64).
"""

import dataclasses

import numpy as np
import pytest

from tpufeat import cpp_golden, features
from tpufeat.config import FBANK80, FeatureConfig
from tpufeat.reference import cpu

from conftest import make_signal
from test_extract_parity import assert_parity

FBANK_E = FeatureConfig(n_mfcc=0, n_mels=26, use_energy=True,
                        use_pallas=False)


class TestConfig:
    def test_feature_dim_prepends(self):
        assert FBANK_E.feature_dim == 27
        assert dataclasses.replace(FBANK80, use_energy=True,
                                   use_pallas=False).feature_dim == 81
        d = dataclasses.replace(FBANK_E, deltas=True)
        assert d.feature_dim == 3 * 27
        # MFCC / spectrogram substitution families are unchanged
        assert FeatureConfig(use_energy=True).feature_dim == 13
        assert FeatureConfig(n_mels=0, n_mfcc=0,
                             use_energy=True).feature_dim == 257

    def test_rejects_incoherent_logs(self):
        with pytest.raises(ValueError, match="log frame energy"):
            dataclasses.replace(FBANK_E, log="none")
        with pytest.raises(ValueError, match="log frame energy"):
            dataclasses.replace(FBANK_E, log="whisper")
        # log10 filterbanks CAN host a (natural-)log energy column: Kaldi
        # semantics only pin the natural-log case, but the column is
        # well-defined either way
        dataclasses.replace(FBANK_E, log="log10")


class TestGoldenParity:
    def test_classic_batched(self):
        sigs = [make_signal(16000, seed=s) for s in range(3)]
        sigs[1] = sigs[1][:9173]                 # ragged lengths
        assert_parity(FBANK_E, sigs, atol=1e-3, pad_garbage=True)

    def test_fused_kernel_path(self):
        cfg = dataclasses.replace(FBANK_E, use_pallas=True, gemm_dft=True,
                                  fused_framing=True)
        sigs = [make_signal(12000, seed=s) for s in range(2)]
        assert_parity(cfg, sigs, atol=1e-3)

    def test_energy_column_prepended(self):
        sig = make_signal(8000, seed=3)
        res = features.extract(sig, cfg=FBANK_E)
        e = cpu.frame_energy(sig.astype(np.float64), FBANK_E)
        np.testing.assert_allclose(np.asarray(res.features)[:, 0], e,
                                   atol=1e-4, rtol=0)
        # columns 1.. are the untouched filterbank (same config w/o energy)
        base = features.extract(
            sig, cfg=dataclasses.replace(FBANK_E, use_energy=False))
        np.testing.assert_array_equal(np.asarray(res.features)[:, 1:],
                                      np.asarray(base.features))

    def test_kaldi_mode_conditioning(self):
        """Kaldi-flavored fbank (dc offset, Povey, per-frame preemph):
        energy measured on the conditioned frame, like MFCC c0."""
        cfg = dataclasses.replace(FBANK_E, kaldi_mode=True, dc_offset=True,
                                  window="povey")
        sigs = [make_signal(10000, seed=s) for s in range(2)]
        assert_parity(cfg, sigs, atol=1e-3)

    def test_deltas_cmvn_compose(self):
        sigs = [make_signal(10000, seed=s) for s in range(2)]
        cfg = dataclasses.replace(FBANK_E, deltas=True, cmvn="mean")
        assert_parity(cfg, sigs, atol=1e-3)


class TestThreeWay:
    @pytest.mark.parametrize("use_energy", [False, True])
    def test_cpp_vs_numpy_vs_jax(self, use_energy):
        if not cpp_golden.available():
            pytest.skip("C++ golden not built")
        cfg = dataclasses.replace(FBANK_E, use_energy=use_energy)
        sig = make_signal(8000, seed=11)
        a = cpu.extract(sig.astype(np.float64), cfg)
        b = cpp_golden.fbank_native(sig, cfg)
        np.testing.assert_allclose(a, b, atol=1e-9, rtol=0)
        c = np.asarray(features.extract(sig, cfg=cfg).features)
        assert np.abs(c - a).max() < 1e-3

    def test_cpp_vtln(self):
        if not cpp_golden.available():
            pytest.skip("C++ golden not built")
        cfg = dataclasses.replace(FBANK_E, vtln_warp=1.1)
        sig = make_signal(8000, seed=13)
        np.testing.assert_allclose(cpu.extract(sig.astype(np.float64), cfg),
                                   cpp_golden.fbank_native(sig, cfg),
                                   atol=1e-9, rtol=0)

    def test_cpp_rejects_uncovered_configs(self):
        if not cpp_golden.available():
            pytest.skip("C++ golden not built")
        with pytest.raises(ValueError):
            cpp_golden.fbank_native(make_signal(4000), FeatureConfig())
        with pytest.raises(ValueError):
            cpp_golden.fbank_native(
                make_signal(4000),
                dataclasses.replace(FBANK_E, mel_scale="slaney",
                                    mel_norm="slaney"))


class TestStreaming:
    def test_chunked_matches_one_shot(self):
        from test_streaming import plan, stream_extract
        sig = make_signal(6400, seed=13)
        ref = np.asarray(features.extract(sig, cfg=FBANK_E).features)
        got = stream_extract(sig, FBANK_E, plan(len(sig), 1600))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)


@pytest.mark.skipif(len(__import__("jax").devices()) < 2,
                    reason="needs the 8-device CPU mesh (see conftest)")
def test_sharded_time_path():
    """fbank+energy through the time-sharded body (the prepend is
    frame-local, so shards must agree with single-device)."""
    import jax
    from tpufeat import sharding
    n = sharding.shardable_length(3 * 16000, FBANK_E, len(jax.devices()))
    sig = make_signal(n, seed=17)
    ref = np.asarray(features.extract(sig, cfg=FBANK_E).features)
    got = np.asarray(sharding.extract_time_sharded(sig, FBANK_E))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_cli_fbank_energy_htk(tmp_path):
    """HTK output stamps FBANK_E and moves the energy column last per
    HTKBook block order."""
    from tpufeat import cli, feats_io, io as wio
    wav = tmp_path / "a.wav"
    wio.write_wav(str(wav), make_signal(8000, seed=17), 16000)
    npy = tmp_path / "a.npy"
    cli.main([str(wav), str(npy), "--preset", "fbank80",
              "--set", "use_energy=True", "--set", "use_pallas=False"])
    feats = np.load(npy)
    assert feats.shape[1] == 81
    htk = tmp_path / "a.htk"
    cli.main([str(wav), str(htk), "--preset", "fbank80",
              "--set", "use_energy=True", "--set", "use_pallas=False"])
    data, _, kind = feats_io.read_htk(str(htk))
    assert kind & 0x3F == feats_io.HTK_FBANK
    assert kind & feats_io.HTK_QUALIFIERS["E"]
    np.testing.assert_allclose(feats_io.from_htk_order(data, 81), feats,
                               atol=1e-5, rtol=0)
