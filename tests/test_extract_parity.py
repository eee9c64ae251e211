"""Golden parity: jitted JAX pipeline vs float64 NumPy golden (SURVEY.md §4).

Tolerances per BASELINE.md: the accelerated path runs float32 against a
float64 oracle — per-stage ~1e-5 relative, end-to-end MFCC ~1e-3 absolute
(log amplifies small spectrum errors near the floor)."""

import numpy as np

from tpufeat import features
from tpufeat.config import (FeatureConfig, KALDI39, MFCC13_HTK, WHISPER80)
from tpufeat.reference import cpu

from conftest import make_signal


def golden_batch(sigs, cfg):
    outs = [cpu.extract(s.astype(np.float64), cfg) for s in sigs]
    F = max(o.shape[0] for o in outs)
    D = outs[0].shape[1]
    feat = np.zeros((len(outs), F, D))
    mask = np.zeros((len(outs), F), dtype=bool)
    for b, o in enumerate(outs):
        feat[b, : o.shape[0]] = o
        mask[b, : o.shape[0]] = True
    return feat, mask


def pad_batch(sigs):
    N = max(len(s) for s in sigs)
    x = np.zeros((len(sigs), N), dtype=np.float32)
    for b, s in enumerate(sigs):
        x[b, : len(s)] = s
    return x, np.array([len(s) for s in sigs], dtype=np.int32)


def assert_parity(cfg, sigs, atol, pad_garbage=False, **kw):
    x, lengths = pad_batch(sigs)
    if pad_garbage:
        # padding contents must never affect valid outputs
        rng = np.random.default_rng(99)
        for b, s in enumerate(sigs):
            x[b, len(s):] = rng.standard_normal(x.shape[1] - len(s)) * 10
    res = features.extract(x, lengths, cfg, **kw)
    gfeat, gmask = golden_batch(sigs, cfg)
    np.testing.assert_array_equal(np.asarray(res.mask), gmask)
    got = np.asarray(res.features)
    err = np.abs(got[gmask] - gfeat[gmask]).max() if gmask.any() else 0.0
    assert err < atol, f"max abs err {err} >= {atol}"
    return err


class TestConfig1MFCC:
    def test_single_utterance(self):
        sig = make_signal(16000, seed=0)
        res = features.extract(sig, cfg=MFCC13_HTK)
        ref = cpu.extract(sig.astype(np.float64), MFCC13_HTK)
        assert res.features.shape == ref.shape == (98, 13)
        err = np.abs(np.asarray(res.features) - ref).max()
        assert err < 1e-3, err

    def test_batched_variable_lengths(self):
        sigs = [make_signal(n, seed=i) for i, n in
                enumerate([16000, 7043, 12800, 400])]
        assert_parity(MFCC13_HTK, sigs, atol=1e-3)

    def test_padding_is_inert(self):
        sigs = [make_signal(n, seed=i) for i, n in enumerate([9000, 4000])]
        assert_parity(MFCC13_HTK, sigs, atol=1e-3, pad_garbage=True)

    def test_gemm_dft_path(self):
        cfg = FeatureConfig(gemm_dft=True)
        sigs = [make_signal(8000, seed=3)]
        assert_parity(cfg, sigs, atol=2e-3)

    def test_too_short_signal(self):
        res = features.extract(np.zeros(100, np.float32), cfg=MFCC13_HTK)
        assert res.features.shape == (0, 13)
        assert res.num_frames == 0

    def test_lifter_and_magnitude(self):
        cfg = FeatureConfig(lifter=22, spectrum="magnitude")
        sigs = [make_signal(6000, seed=4)]
        assert_parity(cfg, sigs, atol=1e-3)


class TestConfig2Whisper:
    def test_single(self):
        sig = make_signal(16000, seed=1)
        res = features.extract(sig, cfg=WHISPER80)
        ref = cpu.extract(sig.astype(np.float64), WHISPER80)
        assert res.features.shape == ref.shape == (100, 80)
        err = np.abs(np.asarray(res.features) - ref).max()
        # whisper features are /4-scaled log10s: very tight
        assert err < 2e-5, err

    def test_batched_librispeech_like(self):
        # variable-length batch, padded + masked; per-utterance max must be
        # computed over valid frames only
        sigs = [make_signal(n, seed=10 + i) for i, n in
                enumerate([16000, 23137, 8000, 12345])]
        assert_parity(WHISPER80, sigs, atol=2e-5, pad_garbage=True)

    def test_gemm_dft(self):
        cfg = WHISPER80._replace if hasattr(WHISPER80, "_replace") else None
        import dataclasses
        cfg = dataclasses.replace(WHISPER80, gemm_dft=True)
        sigs = [make_signal(9000, seed=12)]
        assert_parity(cfg, sigs, atol=5e-5)


class TestUseEnergy:
    def test_energy_replaces_c0(self):
        import dataclasses
        cfg = dataclasses.replace(MFCC13_HTK, use_energy=True)
        sigs = [make_signal(6000, seed=150), make_signal(4100, seed=151)]
        assert_parity(cfg, sigs, atol=1e-3)

    def test_energy_kaldi_mode_and_pallas(self):
        import dataclasses
        for extra in (dict(kaldi_mode=True, dc_offset=True, window="povey"),
                      dict(use_pallas=True),
                      dict(use_pallas=True, gemm_dft=True,
                           fused_framing=True)):
            cfg = dataclasses.replace(MFCC13_HTK, use_energy=True, **extra)
            sigs = [make_signal(5000, seed=152)]
            assert_parity(cfg, sigs, atol=1e-3)


class TestOutDtype:
    def test_bfloat16_output(self):
        import dataclasses
        import jax.numpy as jnp
        cfg = dataclasses.replace(MFCC13_HTK, out_dtype="bfloat16")
        sig = make_signal(4000, seed=156)
        res = features.extract(sig, cfg=cfg)
        assert res.features.dtype == jnp.bfloat16
        base = features.extract(sig, cfg=MFCC13_HTK)
        err = np.abs(np.asarray(res.features, np.float32)
                     - np.asarray(base.features)).max()
        scale = np.abs(np.asarray(base.features)).max()
        assert err / scale < 0.01  # bf16 rounding only

    def test_rejects_bad_dtype(self):
        import dataclasses
        import pytest as _pytest
        with _pytest.raises(ValueError):
            dataclasses.replace(MFCC13_HTK, out_dtype="float8")


class TestDither:
    def test_requires_key_and_perturbs(self):
        import dataclasses
        import jax
        import pytest as _pytest
        cfg = dataclasses.replace(MFCC13_HTK, dither=1e-3)
        sig = make_signal(4000, seed=155)
        with _pytest.raises(ValueError):
            features.extract(sig, cfg=cfg)
        a = features.extract(sig, cfg=cfg, rng=jax.random.key(0))
        b = features.extract(sig, cfg=cfg, rng=jax.random.key(1))
        base = features.extract(sig, cfg=MFCC13_HTK)
        da = np.abs(np.asarray(a.features) - np.asarray(base.features)).max()
        dab = np.abs(np.asarray(a.features) - np.asarray(b.features)).max()
        assert 0 < da < 1.0      # small perturbation, not garbage
        assert dab > 0           # key-dependent


class TestConfig3Kaldi39:
    def test_batched(self):
        sigs = [make_signal(n, seed=20 + i) for i, n in
                enumerate([16000, 5555, 11111])]
        assert_parity(KALDI39, sigs, atol=2e-3, pad_garbage=True)

    def test_meanvar_cmvn(self):
        import dataclasses
        cfg = dataclasses.replace(KALDI39, cmvn="meanvar")
        sigs = [make_signal(8000, seed=23)]
        assert_parity(cfg, sigs, atol=5e-3)

    def test_kaldi_fidelity_knobs(self):
        cfg = FeatureConfig(kaldi_mode=True, dc_offset=True, window="povey",
                            deltas=True, cmvn="mean")
        sigs = [make_signal(7000, seed=24), make_signal(4800, seed=25)]
        assert_parity(cfg, sigs, atol=2e-3)


class TestDeltaOrder:
    """Kaldi add-deltas --delta-order parity: 1 = Δ only, 3 = +ΔΔΔ."""

    def test_golden_parity_each_order(self):
        import dataclasses
        for order in (1, 3):
            cfg = dataclasses.replace(KALDI39, delta_order=order)
            assert cfg.feature_dim == 13 * (1 + order)
            sigs = [make_signal(9000, seed=26), make_signal(6400, seed=27)]
            assert_parity(cfg, sigs, atol=2e-3, pad_garbage=True)

    def test_order_validated(self):
        import dataclasses
        import pytest
        for bad in (0, 4):
            with pytest.raises(ValueError, match="delta_order"):
                dataclasses.replace(KALDI39, delta_order=bad)
        # irrelevant without deltas
        dataclasses.replace(MFCC13_HTK, delta_order=7)


class TestPerStage:
    """Per-stage parity at <=1e-5 relative (SURVEY.md §4 'Golden parity')."""

    def test_spectrogram(self):
        import jax.numpy as jnp
        from tpufeat import framing, matrices, spectrum
        sig = make_signal(4000, seed=30)
        cfg = MFCC13_HTK
        gold = cpu.spectrogram(sig.astype(np.float64), cfg)

        x = jnp.asarray(sig)[None]
        x = framing.preemphasize(x, cfg.preemphasis)
        frames, _ = framing.frame_signal(
            x, jnp.array([len(sig)]), cfg)
        w = jnp.asarray(matrices.window(cfg.window, cfg.frame_length),
                        jnp.float32)
        spec = np.asarray(spectrum.power_spectrum_rfft(frames * w, cfg))[0]
        scale = np.abs(gold).max()
        assert np.abs(spec - gold).max() / scale < 1e-5

    def test_logmel(self):
        sig = make_signal(4000, seed=31)
        cfg = FeatureConfig(n_mfcc=0)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.logmel(sig.astype(np.float64), cfg)
        assert np.abs(np.asarray(res.features) - gold).max() < 5e-4
