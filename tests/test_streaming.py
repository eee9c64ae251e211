"""Streaming equivalence (config 4, SURVEY.md §4).

Identical chunkings are bit-identical (same compiled program). One-shot vs
chunked agree to XLA reduction-order noise (reductions tile differently for
different batch shapes): gated at 1e-5 of feature scale — carry/off-by-one
bugs would produce O(1) errors."""

import dataclasses

import numpy as np
from hypothesis import given, settings, strategies as st
import jax.numpy as jnp
import pytest

from tpufeat import features, streaming
from tpufeat.config import FeatureConfig, MFCC13_HTK, WHISPER80

from conftest import make_signal


def stream_extract(sig, cfg, chunk_sizes):
    """Feed `sig` through process_chunk with the given chunk sizes and
    concatenate valid frames."""
    fe = streaming.StreamingFrontend(cfg, batch_size=1)
    outs = []
    pos = 0
    for c in chunk_sizes:
        chunk = sig[pos: pos + c]
        pos += c
        if len(chunk) == 0:
            break
        feats, mask = fe.process(chunk[None] if chunk.ndim == 1 else chunk)
        feats, mask = np.asarray(feats[0]), np.asarray(mask[0])
        outs.append(feats[mask])
    assert pos >= len(sig), "chunk plan must cover the signal"
    return np.concatenate(outs, axis=0) if outs else np.zeros((0, cfg.feature_dim))


def plan(total, size):
    out = [size] * (total // size)
    if total % size:
        out.append(total % size)
    return out


def assert_stream_equal(chunked, one):
    assert chunked.shape == one.shape
    scale = max(np.abs(one).max(), 1.0)
    err = np.abs(chunked - one).max() / scale
    assert err < 1e-5, f"relative err {err}"


class TestEquivalence:
    @pytest.mark.parametrize("chunk", [160, 480, 1600, 4000])
    def test_uniform_chunks(self, chunk):
        sig = make_signal(16000, seed=40)
        one = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        chunked = stream_extract(sig, MFCC13_HTK, plan(16000, chunk))
        assert_stream_equal(chunked, one)

    def test_ragged_chunks(self):
        sig = make_signal(12003, seed=41)
        sizes = [7, 353, 1600, 159, 160, 161, 2048, 4000, 3515]
        assert sum(sizes) == 12003
        one = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        chunked = stream_extract(sig, MFCC13_HTK, sizes)
        assert_stream_equal(chunked, one)

    def test_gemm_dft_streaming(self):
        cfg = dataclasses.replace(MFCC13_HTK, gemm_dft=True)
        sig = make_signal(8000, seed=42)
        one = np.asarray(features.extract(sig, cfg=cfg).features)
        chunked = stream_extract(sig, cfg, plan(8000, 480))
        assert_stream_equal(chunked, one)

    @pytest.mark.slow  # ~33 s fuzz; ragged/bitwise fixed-plan siblings stay in the default tier
    @given(seed=st.integers(0, 2**31 - 1))
    @settings(max_examples=12, deadline=None)
    def test_fuzzed_chunk_plans(self, seed):
        """Random chunk plans (any sizes, any order) must reproduce the
        one-shot output."""
        rng = np.random.default_rng(seed)
        n = int(rng.integers(500, 12000))
        sig = (rng.standard_normal(n) * 0.3).astype(np.float32)
        sizes = []
        left = n
        while left > 0:
            c = int(rng.integers(1, min(left, 4000) + 1))
            sizes.append(c)
            left -= c
        one = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        chunked = stream_extract(sig, MFCC13_HTK, sizes)
        assert_stream_equal(chunked, one)

    def test_kaldi_mode_streaming(self):
        cfg = FeatureConfig(kaldi_mode=True, dc_offset=True, window="povey")
        sig = make_signal(8000, seed=43)
        one = np.asarray(features.extract(sig, cfg=cfg).features)
        chunked = stream_extract(sig, cfg, plan(8000, 1600))
        assert_stream_equal(chunked, one)


class TestStreamingMechanics:
    def test_rejects_global_configs(self):
        with pytest.raises(ValueError):
            streaming.StreamingFrontend(WHISPER80)
        with pytest.raises(ValueError):
            streaming.StreamingFrontend(FeatureConfig(deltas=True))

    def test_batched_streams(self):
        sigs = [make_signal(4800, seed=50), make_signal(4800, seed=51)]
        fe = streaming.StreamingFrontend(MFCC13_HTK, batch_size=2)
        feats, mask = fe.process(np.stack(sigs))
        for b, s in enumerate(sigs):
            one = np.asarray(features.extract(s, cfg=MFCC13_HTK).features)
            got = np.asarray(feats[b])[np.asarray(mask[b])]
            assert_stream_equal(got, one)

    def test_scan_driver_matches_oneshot(self):
        sig = make_signal(16000, seed=52)
        K, C = 10, 1600
        chunks = jnp.asarray(sig.reshape(K, 1, C))
        state = streaming.init_state(1, MFCC13_HTK)
        _, (feats, mask) = streaming.scan_chunks(state, chunks, MFCC13_HTK)
        got = np.asarray(feats)[:, 0][np.asarray(mask)[:, 0]]
        one = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        assert_stream_equal(got, one)

    def test_state_checkpoint_roundtrip(self, tmp_path):
        sig = make_signal(6400, seed=53)
        fe = streaming.StreamingFrontend(MFCC13_HTK)
        f1, m1 = fe.process(sig[None, :3200])
        path = str(tmp_path / "state.npz")
        streaming.save_state(path, fe.state)
        # resume in a fresh frontend
        fe2 = streaming.StreamingFrontend(MFCC13_HTK)
        fe2.state = streaming.load_state(path, fe2.state)
        f2, m2 = fe2.process(sig[None, 3200:])
        got = np.concatenate([np.asarray(f1[0])[np.asarray(m1[0])],
                              np.asarray(f2[0])[np.asarray(m2[0])]])
        one = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        assert_stream_equal(got, one)

    def test_bitwise_identical_chunkings(self):
        # same chunk shapes -> same compiled program -> bitwise equal
        sig = make_signal(8000, seed=55)
        a = stream_extract(sig, MFCC13_HTK, plan(8000, 1600))
        b = stream_extract(sig, MFCC13_HTK, plan(8000, 1600))
        np.testing.assert_array_equal(a, b)

    def test_bitwise_across_hop_aligned_plans(self):
        """configs[3]'s strict contract: through the static path,
        hop-aligned chunk plans — and extract_scan, and the device scan —
        produce bit-identical features. (Exception on the CPU backend:
        XLA:CPU picks a different matvec strategy for SOME small per-step
        frame counts — e.g. 1- and 3-frame steps differ by ~1e-6 while
        2/4/5+ frame steps are bitwise; the TPU suite asserts the full
        cross-plan contract on hardware.)"""
        sig = make_signal(16000, seed=56)
        a = stream_extract(sig, MFCC13_HTK, plan(16000, 1600))
        b = stream_extract(sig, MFCC13_HTK, [4800, 1600, 1600, 8000])
        c = stream_extract(sig, MFCC13_HTK, [160] * 40 + [9600])
        d = stream_extract(sig, MFCC13_HTK, plan(16000, 320))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, d)
        assert np.abs(a - c).max() < 1e-5          # 1-frame steps: CPU quirk
        es = np.asarray(streaming.extract_scan(sig, MFCC13_HTK, 1600))
        np.testing.assert_array_equal(es, a)
        es2 = np.asarray(streaming.extract_scan(sig, MFCC13_HTK, 4800))
        np.testing.assert_array_equal(es2, a)
        chunks = jnp.moveaxis(jnp.asarray(sig.reshape(1, 10, 1600)), 1, 0)
        state = streaming.init_state(1, MFCC13_HTK)
        _, feats = streaming.make_scan_fn(MFCC13_HTK, 0)(state, chunks)
        np.testing.assert_array_equal(np.asarray(feats[0]), a)

    def test_large_chunk_plan_stays_equivalent(self):
        """Regression: a chunk big enough to clear the kernel-v5 dispatch
        threshold (>= 32*H frames in ONE step) must still compute the same
        features as a small-chunk plan — the streaming step pins the v4
        kernel layout (fused.signal_features(..., layout='v4')) precisely
        so the per-frame rounding cannot depend on the chunk plan. Without
        the pin this measures ~4e-6 even on CPU (and the kernel shapes
        diverge); with it, the residual is the known XLA:CPU
        shape-dependent-dot quirk, bitwise on TPU
        (test_tpu_smoke.py::TestStreamingOnChip)."""
        import dataclasses
        cfg = dataclasses.replace(
            MFCC13_HTK, use_pallas=True, gemm_dft=True, fused_framing=True)
        n = 51200                              # 318 frames in the big chunk
        sig = make_signal(n, seed=59)
        big = stream_extract(sig, cfg, [n])
        small = stream_extract(sig, cfg, plan(n, 3200))
        assert np.abs(big - small).max() < 1e-5
        es = np.asarray(streaming.extract_scan(sig, cfg, 3200))
        np.testing.assert_array_equal(es, small)   # same step shapes: bitwise

    def test_extract_scan_matches_oneshot(self):
        sig = make_signal(12007, seed=57)
        es = np.asarray(streaming.extract_scan(sig, MFCC13_HTK, 1000))
        one = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        assert es.shape == one.shape
        assert_stream_equal(es, one)

    def test_static_matches_dynamic_step(self):
        """Gather-free static step vs dynamic gather step: same frames in,
        so valid outputs agree (to shape-dependent tiling noise)."""
        sig = make_signal(4000, seed=58)
        st_s = streaming.init_state(1, MFCC13_HTK)
        st_d = streaming.init_state(1, MFCC13_HTK)
        fill = 0
        pos = 0
        for c in (1600, 480, 353, 1567):
            chunk = jnp.asarray(sig[None, pos: pos + c]); pos += c
            st_s, f_s = streaming.process_chunk_static(
                st_s, chunk, MFCC13_HTK, fill)
            st_d, (f_d, m_d) = streaming.process_chunk(
                st_d, chunk, MFCC13_HTK)
            fill = streaming.next_fill(fill, c, MFCC13_HTK)
            valid = np.asarray(f_d)[0][np.asarray(m_d)[0]]
            assert f_s.shape[1] == valid.shape[0]
            if valid.size:
                assert np.abs(np.asarray(f_s)[0] - valid).max() < 1e-5
            np.testing.assert_array_equal(
                np.asarray(st_s.fill), np.asarray(st_d.fill))
        np.testing.assert_allclose(np.asarray(st_s.buf)[0, -fill:] if fill
                                   else [],
                                   np.asarray(st_d.buf)[0, -fill:] if fill
                                   else [], atol=0)

    def test_fill_cycle_period(self):
        # hop-aligned -> period 1 after warmup; C=353 -> period hop/gcd
        fills = streaming.fill_schedule(0, [1600] * 5, MFCC13_HTK)
        assert fills[1:] == [320] * 5
        w, p = streaming._find_cycle(
            streaming.fill_schedule(0, [480] * 20, MFCC13_HTK)[:-1])
        assert p == 1

    @pytest.mark.parametrize("plan", [[10] * 10, [3, 1, 7, 25, 40, 24],
                                      [1] * 12, [100]])
    def test_streaming_deltas_match_offline(self, plan):
        """Online Δ (lookahead-delayed) == offline deltas of the full
        feature matrix, for any chunking of the base frames."""
        rng = np.random.default_rng(60)
        F = sum(plan)
        feats = rng.standard_normal((2, F, 13)).astype(np.float32)
        sd = streaming.StreamingDeltas(dim=13, window=2, batch_size=2)
        outs = []
        pos = 0
        for c in plan:
            outs.append(np.asarray(sd.process(feats[:, pos: pos + c])))
            pos += c
        outs.append(np.asarray(sd.flush()))
        got = np.concatenate(outs, axis=1)
        want = np.asarray(features.deltas(
            jnp.asarray(feats), jnp.array([F, F])))
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-6

    def test_streaming_delta_delta_chain(self):
        """Two chained delta stages == offline delta(delta(f))."""
        rng = np.random.default_rng(61)
        F = 50
        feats = rng.standard_normal((1, F, 13)).astype(np.float32)
        d1 = streaming.StreamingDeltas(dim=13, batch_size=1)
        d2 = streaming.StreamingDeltas(dim=13, batch_size=1)
        outs = []
        for pos in range(0, F, 9):
            x1 = d1.process(feats[:, pos: pos + 9])
            outs.append(np.asarray(d2.process(x1)))
        x1 = d1.flush()
        outs.append(np.asarray(d2.process(x1)))
        outs.append(np.asarray(d2.flush()))
        got = np.concatenate(outs, axis=1)
        nf = jnp.array([F])
        want = np.asarray(features.deltas(
            features.deltas(jnp.asarray(feats), nf), nf))
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-6

    def test_running_cmvn_converges(self):
        # after many frames, running mean ~ utterance mean
        sig = make_signal(32000, seed=54)
        res = features.extract(sig, cfg=MFCC13_HTK)
        feats = np.asarray(res.features)[None]
        stats = streaming.init_cmvn(1, 13)
        mask = jnp.ones(feats.shape[:2], bool)
        stats, _ = streaming.streaming_cmvn(stats, jnp.asarray(feats), mask)
        np.testing.assert_allclose(
            np.asarray(stats.mean[0]), feats[0].mean(axis=0), atol=1e-4)
