"""Kernel v4 (combined Re/Im DFT + folded power + kaldi fold) tests.

Runs in Pallas interpret mode on CPU CI; the TPU smoke suite re-validates
on hardware.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tpufeat import features, framing, matrices
from tpufeat.config import FeatureConfig, KALDI39, MFCC13_HTK, WHISPER80
from tpufeat.reference import cpu

from conftest import make_signal

FUSED = dict(use_pallas=True, gemm_dft=True, fused_framing=True)


class TestCombinedMatrices:
    def test_combined_dft_matches_rfft(self):
        cs = matrices.dft_matrix_combined(400, 512, "hamming")
        assert cs.shape == (400, 512)          # 2*257 - 2 == n_fft exactly
        x = np.random.default_rng(0).standard_normal(400)
        z = x @ cs
        ref = np.fft.rfft(x * matrices.window("hamming", 400), n=512)
        nb = 257
        np.testing.assert_allclose(z[:nb], ref.real, atol=1e-9)
        np.testing.assert_allclose(z[nb:], ref.imag[1: nb - 1], atol=1e-9)

    def test_folded_filterbank_equals_power_times_fb(self):
        cfg = MFCC13_HTK
        cs = matrices.dft_matrix_combined(400, 512, cfg.window)
        fb2 = matrices.mel_filterbank_folded(
            cfg.sample_rate, 512, cfg.n_mels, cfg.fmin, cfg.fmax_hz,
            cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style)
        fb = matrices.mel_filterbank(
            cfg.sample_rate, 512, cfg.n_mels, cfg.fmin, cfg.fmax_hz,
            cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style)
        x = np.random.default_rng(1).standard_normal(400)
        z = x @ cs
        spec = np.fft.rfft(x * matrices.window(cfg.window, 400), n=512)
        power = spec.real**2 + spec.imag**2
        np.testing.assert_allclose((z * z) @ fb2, power @ fb, rtol=1e-9)

    def test_kaldi_conditioning_matrix(self):
        m = matrices.kaldi_conditioning_matrix(400, 0.97, True)
        f = np.random.default_rng(2).standard_normal((3, 400))
        f1 = f - f.mean(axis=-1, keepdims=True)          # DC offset
        want = np.concatenate(                           # Kaldi preemph
            [f1[:, :1] * (1 - 0.97), f1[:, 1:] - 0.97 * f1[:, :-1]], axis=-1)
        np.testing.assert_allclose(f @ m, want, atol=1e-12)
        # and the traced twin agrees at float32 precision
        cfg = FeatureConfig(kaldi_mode=True, dc_offset=True,
                            preemphasis=0.97)
        traced = np.asarray(framing.condition_frames(
            jnp.asarray(f, jnp.float32), cfg))
        np.testing.assert_allclose(f @ m, traced, atol=1e-5)

    def test_hop_split(self):
        from tpufeat.pallas import fused
        assert fused._hop_split(MFCC13_HTK) == (2, 80)
        assert fused._hop_split(FeatureConfig(hop_length=100,
                                              frame_length=300)) == (1, 100)
        assert fused._hop_split(
            FeatureConfig(hop_length=250, frame_length=400)) == (2, 125)


class TestFusedParityV4:
    @pytest.mark.parametrize("precision", ["highest", "bf16x3"])
    @pytest.mark.parametrize("preset", [MFCC13_HTK, WHISPER80, KALDI39])
    def test_signal_kernel_matches_golden(self, preset, precision):
        cfg = dataclasses.replace(preset, matmul_precision=precision,
                                  **FUSED)
        sig = make_signal(16000, seed=10)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), preset)
        scale = max(1.0, np.abs(gold).max())
        err = np.abs(np.asarray(res.features) - gold).max() / scale
        assert err < 1e-3
        if precision == "bf16x3":
            assert err < 5e-4      # measured ~1.8e-4; keep headroom

    @pytest.mark.parametrize("precision", ["highest", "bf16x3"])
    def test_tail_and_staged_kernels_bf16x3(self, precision):
        sig = make_signal(8000, seed=17)
        gold = cpu.extract(sig.astype(np.float64), MFCC13_HTK)
        for flags in (dict(use_pallas=True),
                      dict(use_pallas=True, gemm_dft=True)):
            cfg = dataclasses.replace(MFCC13_HTK,
                                      matmul_precision=precision, **flags)
            got = np.asarray(features.extract(sig, cfg=cfg).features)
            assert np.abs(got - gold).max() < 1e-3

    def test_default_precision_runs(self):
        """'default' (1-pass bf16) is a training-only knob: on TPU it
        measures ~3e-3 (outside the 1e-3 fidelity budget — documented in
        config.py); on the CPU interpreter DEFAULT dots stay f32, so this
        test only smoke-checks the path end to end."""
        import jax
        cfg = dataclasses.replace(MFCC13_HTK, matmul_precision="default",
                                  **FUSED)
        sig = make_signal(8000, seed=18)
        got = np.asarray(features.extract(sig, cfg=cfg).features)
        gold = cpu.extract(sig.astype(np.float64), MFCC13_HTK)
        err = np.abs(got - gold).max()
        assert err < 0.1
        if jax.default_backend() == "tpu":
            assert err > 1e-4      # demonstrably coarser than bf16x3

    def test_kaldi_mode_fused_signal_kernel(self):
        """kaldi_mode folded into the DFT matrix — full fidelity-knob set."""
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             preemphasis=0.97, window="povey")
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(12000, seed=11)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        assert res.features.shape == gold.shape
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    def test_kaldi_mode_fused_matches_staged(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             preemphasis=0.97)
        sig = make_signal(8000, seed=12)
        a = features.extract(sig, cfg=dataclasses.replace(base, **FUSED))
        b = features.extract(sig, cfg=base)
        assert np.abs(np.asarray(a.features)
                      - np.asarray(b.features)).max() < 1e-4

    def test_magnitude_spectrum_fused(self):
        """Magnitude configs rebuild |X| in-kernel with a lane roll."""
        base = FeatureConfig(spectrum="magnitude", lifter=22)
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(8000, seed=13)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    def test_magnitude_staged_gemm_kernel(self):
        base = FeatureConfig(spectrum="magnitude")
        cfg = dataclasses.replace(base, use_pallas=True, gemm_dft=True)
        sig = make_signal(8000, seed=14)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    def test_use_energy_kaldi_fused(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             use_energy=True)
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(8000, seed=15)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    def test_streaming_kaldi_fused(self):
        from tpufeat import streaming
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             window="povey")
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(8000, seed=16)
        one = np.asarray(features.extract(sig, cfg=cfg).features)
        fe = streaming.StreamingFrontend(cfg, batch_size=1)
        outs = []
        for pos in range(0, 8000, 1600):
            f, _ = fe.process(sig[None, pos: pos + 1600])
            outs.append(np.asarray(f[0]))
        got = np.concatenate(outs, 0)
        scale = max(1.0, np.abs(one).max())
        assert np.abs(got - one).max() / scale < 1e-5
