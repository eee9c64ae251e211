"""Kernel v5 (phase-packed signal layout) tests.

The phase path only engages for calls of >= 32*H frames (H = hops per
row), so these tests use multi-second signals; the suite in
test_kernel_v4.py keeps covering the v4 fallback with 1 s inputs. Runs
in Pallas interpret mode on CPU CI; the TPU smoke suite re-validates on
hardware.
"""

import dataclasses

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from tpufeat import features, framing
from tpufeat.config import FeatureConfig, KALDI39, MFCC13_HTK, WHISPER80
from tpufeat.pallas import fused
from tpufeat.reference import cpu

from conftest import make_signal

FUSED = dict(use_pallas=True, gemm_dft=True, fused_framing=True)
LONG = 3 * 16000          # ~298 frames: safely above the 128-frame threshold


class TestPhasePlan:
    def test_dispatch_threshold(self):
        cfg = MFCC13_HTK            # hop 160 -> H = 4
        assert fused._phase_count(cfg) == 4
        assert fused._use_phase_layout(cfg, 128)
        assert not fused._use_phase_layout(cfg, 127)
        exotic = FeatureConfig(hop_length=100, frame_length=300)
        assert not fused._use_phase_layout(exotic, 10_000)

    @pytest.mark.parametrize("fl,hop", [(400, 160), (400, 512), (512, 128),
                                        (240, 80), (400, 96), (1024, 160)])
    def test_plan_reconstructs_frame_matmul(self, fl, hop):
        """sum over (phase, shift) contractions == frames @ CS exactly."""
        cfg = FeatureConfig(frame_length=fl, hop_length=hop,
                            n_fft=1 << (fl - 1).bit_length())
        H = fused._phase_count(cfg)
        W = H * hop
        plan, d_mats, max_span = fused._phase_constants(cfg)
        cs = fused._cs_constant(cfg, fold_kaldi=True)
        rng = np.random.default_rng(0)
        n_rows = 3 + max_span
        sig = rng.standard_normal(n_rows * W)
        rows = sig.reshape(n_rows, W)
        for p, entries in enumerate(plan):
            for r in range(2):                 # frames t = r*H + p
                t = r * H + p
                frame = sig[t * hop: t * hop + fl]
                want = frame @ cs[:fl]
                got = np.zeros(cs.shape[1])
                for (s, a, k, mi) in entries:
                    got += rows[r + s, a: a + k] @ d_mats[mi]
                np.testing.assert_allclose(got, want, atol=1e-9)


class TestPhasePlanProperties:
    @given(fl=st.integers(64, 1200),
           hop_16=st.integers(2, 40),           # hop = 16*k (phase-eligible)
           seed=st.integers(0, 2**31 - 1))
    @settings(max_examples=30, deadline=None)
    def test_plan_reconstruction_random_geometry(self, fl, hop_16, seed):
        """Property twin of test_plan_reconstructs_frame_matmul: for ANY
        phase-eligible (frame_length, hop), the (phase, shift, window)
        plan reproduces frames @ CS exactly."""
        hop = 16 * hop_16
        n_fft = 1 << (fl - 1).bit_length()
        cfg = FeatureConfig(frame_length=fl, hop_length=hop, n_fft=n_fft)
        H = fused._phase_count(cfg)
        W = H * hop
        plan, d_mats, max_span = fused._phase_constants(cfg)
        cs = fused._cs_constant(cfg, fold_kaldi=True)
        rng = np.random.default_rng(seed)
        n_rows = 2 + max_span
        sig = rng.standard_normal(n_rows * W)
        rows = sig.reshape(n_rows, W)
        for p, entries in enumerate(plan):
            t = p                       # frame t = 0*H + p (row 0, phase p)
            frame = sig[t * hop: t * hop + fl]
            want = frame @ cs[:fl]
            got = np.zeros(cs.shape[1])
            for (s, a, k, mi) in entries:
                got += rows[s, a: a + k] @ d_mats[mi]
            np.testing.assert_allclose(got, want, atol=1e-8)


class TestPhaseParity:
    @pytest.mark.parametrize("preset", [MFCC13_HTK, WHISPER80, KALDI39])
    def test_phase_path_matches_golden(self, preset):
        cfg = dataclasses.replace(preset, **FUSED)
        sig = make_signal(LONG, seed=21)
        assert fused._use_phase_layout(cfg, cfg.num_frames(LONG))
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), preset)
        scale = max(1.0, np.abs(gold).max())
        err = np.abs(np.asarray(res.features) - gold).max() / scale
        assert err < 1e-3

    def test_phase_matches_v4_layout(self, monkeypatch):
        """The two layouts compute the same features (float32 noise only)."""
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        sig = make_signal(LONG, seed=22)
        F = cfg.num_frames(LONG)
        buf, _ = framing.framing_buffer(
            jnp.asarray(sig)[None], jnp.array([LONG]), cfg)
        a = np.asarray(fused.signal_features(buf, F, cfg))
        monkeypatch.setattr(fused, "_use_phase_layout",
                            lambda c, n: False)
        b = np.asarray(fused.signal_features(buf, F, cfg))
        assert np.abs(a - b).max() < 2e-5

    def test_boundary_frame_counts(self):
        """Lengths straddling the dispatch threshold and block boundaries
        all agree with the golden (off-by-one row/phase guard). With
        center=False, F = 1 + (n - 400)//160, so 20560/20720/20880 give
        127/128/129 frames — below / exactly at / above the 32*H=128
        threshold."""
        base = dataclasses.replace(MFCC13_HTK, **FUSED)
        assert [base.num_frames(n) for n in (20560, 20720, 20880)] \
            == [127, 128, 129]
        for n in (20560, 20720, 20880, 163840 // 2):
            sig = make_signal(n, seed=23)
            res = features.extract(sig, cfg=base)
            gold = cpu.extract(sig.astype(np.float64), MFCC13_HTK)
            assert res.features.shape == gold.shape
            scale = max(1.0, np.abs(gold).max())
            assert np.abs(np.asarray(res.features) - gold).max() / scale \
                < 1e-3

    def test_kaldi_fold_phase_path(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             preemphasis=0.97, window="povey")
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(LONG, seed=24)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    def test_magnitude_phase_path(self):
        base = FeatureConfig(spectrum="magnitude", lifter=22)
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(LONG, seed=25)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    @pytest.mark.parametrize("hop", [80, 192])     # H = 8 and H = 2
    def test_nonstandard_phase_counts(self, hop):
        base = FeatureConfig(hop_length=hop, frame_length=400, n_fft=512)
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(LONG, seed=28)
        assert fused._use_phase_layout(cfg, cfg.num_frames(LONG))
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    def test_exotic_hop_falls_back(self):
        base = FeatureConfig(hop_length=100, frame_length=300, n_fft=512)
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(LONG, seed=26)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), base)
        scale = max(1.0, np.abs(gold).max())
        assert np.abs(np.asarray(res.features) - gold).max() / scale < 1e-3

    def test_padding_inert_phase_path(self):
        """Batch padding never leaks into valid frames on the phase path."""
        cfg = dataclasses.replace(WHISPER80, **FUSED)
        sig = make_signal(LONG, seed=27)
        alone = features.extract(sig, cfg=cfg)
        padded = np.zeros(LONG + 7040, np.float32)
        padded[:LONG] = sig
        batch = features.extract(np.stack([padded, padded]),
                                 lengths=np.array([LONG, LONG + 7040]),
                                 cfg=cfg)
        nf = int(alone.num_frames)
        np.testing.assert_array_equal(
            np.asarray(batch.features)[0, :nf],
            np.asarray(alone.features)[:nf])
