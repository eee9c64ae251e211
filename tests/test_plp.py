"""PLP feature family (beyond-reference; tpufeat/plp.py).

Parity strategy: the accelerated path (cos-matrix IDFT + unrolled
Levinson-Durbin, float32) is held against a float64 golden that uses
DIFFERENT algorithms for the same math (np.fft.ifft of the symmetric
extension + direct scipy Toeplitz solves) — agreement is meaningful, not
two copies of one recursion.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpufeat import features, matrices, plp, streaming
from tpufeat.config import PLP13, FeatureConfig
from tpufeat.reference import cpu

from conftest import make_signal

FUSED = dict(use_pallas=True, gemm_dft=True, fused_framing=True)


class TestPlpMath:
    def test_durbin_solves_the_normal_equations(self):
        """LPC from durbin() must satisfy the Toeplitz normal equations
        R a = r (checked directly, no golden involved)."""
        rng = np.random.default_rng(0)
        # autocorrelation of a real AR-ish signal => positive definite
        sig = rng.standard_normal(4096)
        sig = np.convolve(sig, [1.0, 0.8, 0.5, 0.2], mode="same")
        r = np.correlate(sig, sig, "full")[len(sig) - 1:][:13] / len(sig)
        a, err = plp.durbin(jnp.asarray(r, jnp.float32), 12)
        a = np.asarray(a, np.float64)
        R = np.array([[r[abs(i - j)] for j in range(12)] for i in range(12)])
        # float32 recursion vs float64 normal equations
        np.testing.assert_allclose(R @ a, r[1:13], rtol=1e-3, atol=1e-5)
        e_direct = r[0] - a @ r[1:13]
        np.testing.assert_allclose(float(np.asarray(err)), e_direct,
                                   rtol=1e-3)

    def test_idft_matrix_matches_ifft(self):
        """The cos-matrix autocorrelation == np.fft.ifft of the explicit
        even-symmetric extension (the golden's construction)."""
        rng = np.random.default_rng(1)
        m = 23
        p = rng.random((5, m)) + 0.1
        a = np.concatenate([p[:, :1], p, p[:, -1:]], axis=1)
        got = a @ matrices.plp_idft_matrix(m, 12)
        sym = np.concatenate([a, a[:, -2:0:-1]], axis=1)
        want = np.fft.ifft(sym, axis=1).real[:, :13]
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_equal_loudness_shape_and_monotone_rise(self):
        el = matrices.equal_loudness_vector(23, 0.0, 8000.0, "htk")
        assert el.shape == (23,)
        assert np.all(el > 0)
        # rises through the speech band, rolls off only near Nyquist
        assert el[10] > el[0]


class TestPlpGoldenParity:
    def test_single_utterance(self):
        sig = make_signal(16000, seed=2)
        res = features.extract(sig, cfg=PLP13)
        ref = cpu.plp(sig.astype(np.float64), PLP13)
        assert res.features.shape == ref.shape == (98, 13)
        err = np.abs(np.asarray(res.features) - ref).max()
        assert err < 2e-3, err

    def test_batch_masked(self):
        sigs = [make_signal(9000, seed=3), make_signal(16000, seed=4),
                make_signal(4321, seed=5)]
        N = max(map(len, sigs))
        x = np.zeros((3, N), np.float32)
        for b, s in enumerate(sigs):
            x[b, : len(s)] = s
        lens = np.array([len(s) for s in sigs], np.int32)
        res = features.extract(x, lens, PLP13)
        for b, s in enumerate(sigs):
            ref = cpu.plp(s.astype(np.float64), PLP13)
            got = np.asarray(res.features[b, : ref.shape[0]])
            assert np.abs(got - ref).max() < 2e-3

    def test_fused_interpret_path(self):
        """PLP over the fused Pallas signal kernel (interpret mode on CPU)
        agrees with the golden — the kernel emits raw filterbank energies
        (log='none') and the tail is shared."""
        cfg = dataclasses.replace(PLP13, **FUSED)
        sig = make_signal(8000, seed=6)
        res = features.extract(sig, cfg=cfg)
        ref = cpu.plp(sig.astype(np.float64), PLP13)
        assert np.abs(np.asarray(res.features) - ref).max() < 2e-3

    def test_deltas_cmvn_compose(self):
        cfg = dataclasses.replace(PLP13, deltas=True, cmvn="mean")
        assert cfg.feature_dim == 39
        sig = make_signal(8000, seed=7)
        res = features.extract(sig, cfg=cfg)
        ref = cpu.extract(sig.astype(np.float64), cfg)
        assert res.features.shape == ref.shape
        assert np.abs(np.asarray(res.features) - ref).max() < 2e-3

    def test_lifter(self):
        cfg = dataclasses.replace(PLP13, lifter=22)
        sig = make_signal(8000, seed=8)
        res = features.extract(sig, cfg=cfg)
        ref = cpu.plp(sig.astype(np.float64), cfg)
        assert np.abs(np.asarray(res.features) - ref).max() < 2e-2

    def test_silence_is_finite(self):
        res = features.extract(np.zeros(8000, np.float32), cfg=PLP13)
        assert np.isfinite(np.asarray(res.features)).all()

    def test_streaming_matches_one_shot(self):
        """Chunked streaming PLP == one-shot on the overlap (frame-local
        tail => streaming needs no new state)."""
        sig = make_signal(12800, seed=9)
        want = np.asarray(features.extract(sig, cfg=PLP13).features)
        fe = streaming.StreamingFrontend(PLP13, batch_size=1)
        outs = [fe.process(sig[None, s: s + 3200])[0]
                for s in range(0, len(sig), 3200)]
        got = np.concatenate([o for o in outs if o.shape[1]], axis=1)[0]
        np.testing.assert_allclose(got, want[: got.shape[0]],
                                   rtol=0, atol=1e-4)


class TestPlpConfigValidation:
    def test_rejects_log_and_mfcc(self):
        with pytest.raises(ValueError, match="PLP"):
            FeatureConfig(plp_order=12, n_mfcc=0)       # log defaults natural
        with pytest.raises(ValueError, match="PLP"):
            FeatureConfig(plp_order=12, log="none")     # n_mfcc defaults 13
        with pytest.raises(ValueError, match="plp_compress"):
            FeatureConfig(plp_order=12, log="none", n_mfcc=0,
                          plp_compress=0.0)

    def test_feature_dim(self):
        assert PLP13.feature_dim == 13
        cfg = dataclasses.replace(PLP13, plp_order=8)
        assert cfg.feature_dim == 9


class TestPlpProperties:
    def test_scale_law(self):
        """Scaling audio by s scales band energies by s^2, hence the
        compressed spectrum by s^(2*compress); LPC coefficients are scale
        invariant and the residual energy scales the same way — so
        c1..cp must be unchanged and c0 must shift by exactly
        2*plp_compress*ln(s). Validates the whole chain end to end."""
        sig = make_signal(8000, seed=20)
        a = np.asarray(features.extract(sig, cfg=PLP13).features)
        s = 3.7
        b = np.asarray(features.extract((s * sig).astype(np.float32),
                                        cfg=PLP13).features)
        np.testing.assert_allclose(b[:, 1:], a[:, 1:], rtol=0, atol=2e-3)
        shift = 2.0 * PLP13.plp_compress * np.log(s)
        np.testing.assert_allclose(b[:, 0] - a[:, 0],
                                   np.full(a.shape[0], shift),
                                   rtol=0, atol=2e-3)

    def test_streaming_pipeline_composes_plp39(self):
        """StreamingPipeline drives a PLP+deltas online chain exactly like
        the offline config (no CMVN: exact on the flushed overlap)."""
        cfg = dataclasses.replace(PLP13, deltas=True)
        assert cfg.feature_dim == 39
        sig = make_signal(12800, seed=21)
        want = np.asarray(features.extract(sig, cfg=cfg).features)
        pipe = streaming.StreamingPipeline(cfg, batch_size=1)
        outs = [pipe.process(sig[None, i: i + 3200])
                for i in range(0, len(sig), 3200)]
        outs.append(pipe.flush())
        got = np.concatenate([o for o in outs if o.shape[1]], axis=1)[0]
        np.testing.assert_allclose(got, want[: got.shape[0]],
                                   rtol=0, atol=1e-4)
