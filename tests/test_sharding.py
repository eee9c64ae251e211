"""Multi-chip paths on the virtual 8-device CPU mesh (SURVEY.md §4
"Multi-chip w/o cluster"): time-sharded halo exchange == one-shot, DP batch
sharding == local, and 1-device degeneracy."""

import dataclasses

import jax
import numpy as np
import pytest

from tpufeat import features, sharding
from tpufeat.config import KALDI39, MFCC13_HTK, WHISPER80

from conftest import make_signal

N_DEV = len(jax.devices())

pytestmark = pytest.mark.skipif(
    N_DEV < 2, reason="needs the 8-device CPU mesh (see conftest)")


def one_shot(sig, cfg):
    res = features.extract(sig, cfg=cfg)
    return np.asarray(res.features)


def assert_close(a, b, tol=1e-5):
    assert a.shape == b.shape, (a.shape, b.shape)
    scale = max(np.abs(b).max(), 1.0)
    err = np.abs(a - b).max() / scale
    assert err < tol, f"relative err {err}"


class TestTimeSharded:
    def test_mfcc13_matches_oneshot(self):
        n = sharding.shardable_length(8 * 16000, MFCC13_HTK, N_DEV)
        sig = make_signal(n, seed=90)
        got = np.asarray(sharding.extract_time_sharded(sig, MFCC13_HTK))
        assert_close(got, one_shot(sig, MFCC13_HTK))

    def test_whisper_centered_reflect_and_pmax(self):
        n = sharding.shardable_length(4 * 16000, WHISPER80, N_DEV)
        sig = make_signal(n, seed=91)
        got = np.asarray(sharding.extract_time_sharded(sig, WHISPER80))
        assert_close(got, one_shot(sig, WHISPER80), tol=2e-5)

    def test_kaldi39_deltas_cmvn_collectives(self):
        n = sharding.shardable_length(6 * 16000, KALDI39, N_DEV)
        sig = make_signal(n, seed=92)
        got = np.asarray(sharding.extract_time_sharded(sig, KALDI39))
        assert_close(got, one_shot(sig, KALDI39))

    def test_delta_order3_matches_oneshot(self):
        """Three chained halo exchanges (one per delta stage) stay exact
        across shard boundaries."""
        cfg = dataclasses.replace(KALDI39, delta_order=3)
        n = sharding.shardable_length(6 * 16000, cfg, N_DEV)
        sig = make_signal(n, seed=93)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg))
        assert got.shape[-1] == 52
        assert_close(got, one_shot(sig, cfg))

    def test_plp_matches_oneshot(self):
        """PLP's frame-local tail must shard transparently (round-3
        feature family; staged and fused shard bodies both apply it)."""
        from tpufeat.config import PLP13
        n = sharding.shardable_length(5 * 16000, PLP13, N_DEV)
        sig = make_signal(n, seed=94)
        got = np.asarray(sharding.extract_time_sharded(sig, PLP13))
        assert_close(got, one_shot(sig, PLP13), tol=2e-4)

    def test_padded_tail_masked(self):
        """Zero-padding up to a shardable length must not distort CMVN or
        the Whisper max (masked collectives)."""
        cfg = dataclasses.replace(KALDI39, cmvn="meanvar")
        raw = make_signal(51203, seed=93)
        n = sharding.shardable_length(len(raw), cfg, N_DEV)
        padded = np.zeros(n, np.float32)
        padded[: len(raw)] = raw
        got = np.asarray(sharding.extract_time_sharded(
            padded, cfg, length=len(raw)))
        # oracle: one-shot on the padded signal with an explicit length mask
        res = features.extract(padded[None], np.array([len(raw)]), cfg)
        want = np.asarray(res.features[0])[np.asarray(res.mask[0])]
        tv = cfg.num_frames(len(raw))
        assert_close(got[:tv], want)

    def test_rejects_unshardable(self):
        with pytest.raises(ValueError):
            sharding.extract_time_sharded(np.zeros(1000 * N_DEV + 7),
                                          MFCC13_HTK)

    def test_single_device_degenerate(self):
        mesh = sharding.default_mesh("time", jax.devices()[:1])
        sig = make_signal(16000, seed=94)
        got = np.asarray(sharding.extract_time_sharded(
            sig, MFCC13_HTK, mesh=mesh))
        assert_close(got, one_shot(sig, MFCC13_HTK))

    def test_gemm_dft_sharded(self):
        cfg = dataclasses.replace(MFCC13_HTK, gemm_dft=True)
        n = sharding.shardable_length(3 * 16000, cfg, N_DEV)
        sig = make_signal(n, seed=95)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg))
        assert_close(got, one_shot(sig, cfg))


class TestDpTimeMesh:
    @pytest.mark.skipif(N_DEV < 4, reason="needs >=4 devices")
    def test_batch_of_long_recordings(self):
        import jax
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[: (N_DEV // 2) * 2]).reshape(2, -1)
        mesh = Mesh(devs, ("dp", "time"))
        n_time = devs.shape[1]
        cfg = KALDI39
        n = sharding.shardable_length(4 * 16000, cfg, n_time)
        sigs, lens = [], []
        for b in range(4):  # B=4 over dp=2
            raw = make_signal(n - 531 * b, seed=170 + b)
            lens.append(len(raw))
            sigs.append(np.pad(raw, (0, n - len(raw))))
        x = np.stack(sigs)
        res = sharding.extract_batch_time_sharded(x, np.array(lens), cfg,
                                                  mesh)
        for b in range(4):
            one = features.extract(x[b][: lens[b]], cfg=cfg)
            got = np.asarray(res.features[b])[np.asarray(res.mask[b])]
            assert_close(got, np.asarray(one.features))

    @pytest.mark.skipif(N_DEV < 4, reason="needs >=4 devices")
    def test_whisper_2d(self):
        import jax
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devs, ("dp", "time"))
        n = sharding.shardable_length(2 * 16000, WHISPER80, 2)
        x = np.stack([make_signal(n, seed=180), make_signal(n, seed=181)])
        res = sharding.extract_batch_time_sharded(
            x, np.full((2,), n), WHISPER80, mesh)
        for b in range(2):
            one = features.extract(x[b], cfg=WHISPER80)
            got = np.asarray(res.features[b])[np.asarray(res.mask[b])]
            assert_close(got, np.asarray(one.features), tol=2e-5)


class TestDataParallel:
    def test_matches_local(self):
        B = N_DEV * 2
        sigs = np.stack([make_signal(16000, seed=100 + i) for i in range(B)])
        lengths = np.full((B,), 16000, np.int32)
        lengths[1] = 9000  # exercise masking across shards
        res = sharding.extract_data_parallel(sigs, lengths, MFCC13_HTK)
        local = features.extract(sigs, lengths, MFCC13_HTK)
        np.testing.assert_array_equal(np.asarray(res.mask),
                                      np.asarray(local.mask))
        assert_close(np.asarray(res.features), np.asarray(local.features))

    def test_sharding_layout(self):
        B = N_DEV
        sigs = np.stack([make_signal(4000, seed=110 + i) for i in range(B)])
        res = sharding.extract_data_parallel(
            sigs, np.full((B,), 4000, np.int32), MFCC13_HTK)
        # output stays sharded over the batch axis — no implicit gather
        shard_shapes = {s.data.shape for s in res.features.addressable_shards}
        assert all(s[0] == B // N_DEV for s in shard_shapes)

    def test_sliding_cmvn_matches_local(self):
        """cfg.cmvn='sliding' is per-utterance (windows never cross the
        batch axis), so the DP path must reproduce it with zero
        collectives."""
        import dataclasses
        from tpufeat.config import KALDI39
        cfg = dataclasses.replace(KALDI39, cmvn="sliding",
                                  cmvn_window=80, cmvn_min_window=20)
        B = N_DEV
        sigs = np.stack([make_signal(16000, seed=120 + i)
                         for i in range(B)])
        lengths = np.full((B,), 16000, np.int32)
        lengths[2] = 11000
        res = sharding.extract_data_parallel(sigs, lengths, cfg)
        local = features.extract(sigs, lengths, cfg)
        assert_close(np.asarray(res.features), np.asarray(local.features))


FUSED = dict(use_pallas=True, gemm_dft=True, fused_framing=True)


class TestFusedShardedBody:
    """Round-3 VERDICT item 2: the shard body runs the SAME fully fused
    signal-level kernel as single-chip production extract() whenever the
    config's fused flags are set (interpret mode on this CPU mesh)."""

    def test_mfcc13_fused_time_sharded(self):
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        n = sharding.shardable_length(2 * 16000, cfg, N_DEV)
        sig = make_signal(n, seed=200)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg))
        assert_close(got, one_shot(sig, cfg))

    def test_whisper_fused_time_sharded(self):
        cfg = dataclasses.replace(WHISPER80, **FUSED)
        n = sharding.shardable_length(2 * 16000, cfg, N_DEV)
        sig = make_signal(n, seed=201)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg))
        assert_close(got, one_shot(sig, cfg), tol=2e-5)

    def test_kaldi39_fused_time_sharded(self):
        cfg = dataclasses.replace(KALDI39, **FUSED)
        n = sharding.shardable_length(2 * 16000, cfg, N_DEV)
        sig = make_signal(n, seed=202)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg))
        assert_close(got, one_shot(sig, cfg))

    def test_kaldi_mode_fused_time_sharded(self):
        """kaldi_mode conditioning is folded into the kernel's DFT matrix
        — the sharded fused body must match one-shot fused."""
        cfg = dataclasses.replace(MFCC13_HTK, kaldi_mode=True,
                                  window="povey", **FUSED)
        n = sharding.shardable_length(16000, cfg, N_DEV)
        sig = make_signal(n, seed=203)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg))
        assert_close(got, one_shot(sig, cfg))

    @pytest.mark.skipif(N_DEV < 4, reason="needs >=4 devices")
    def test_fused_2d_mesh(self):
        import jax
        from jax.sharding import Mesh
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        devs = np.array(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devs, ("dp", "time"))
        n = sharding.shardable_length(16000, cfg, 2)
        x = np.stack([make_signal(n, seed=210 + b) for b in range(2)])
        res = sharding.extract_batch_time_sharded(
            x, np.full((2,), n), cfg, mesh)
        for b in range(2):
            one = features.extract(x[b], cfg=cfg)
            got = np.asarray(res.features[b])[np.asarray(res.mask[b])]
            assert_close(got, np.asarray(one.features))


class TestPitchDataParallel:
    @pytest.mark.skipif(N_DEV < 8, reason="needs the 8-device mesh")
    def test_matches_unsharded(self):
        """Pitch features with the batch sharded over all 8 devices ==
        the unsharded path (per-utterance algorithm, zero collectives)."""
        from tpufeat import pitch
        cfg = pitch.PitchConfig()
        t = np.arange(9600) / 16000.0
        x = np.stack([(0.3 * np.sin(2 * np.pi * (100.0 + 15.0 * b) * t))
                      .astype(np.float32) for b in range(8)])
        lens = np.full((8,), 9600, np.int32)
        feats_s, valid_s = sharding.pitch_features_data_parallel(
            x, lens, cfg)
        feats, valid = pitch.pitch_features(x, lens, cfg=cfg)
        np.testing.assert_array_equal(np.asarray(valid_s),
                                      np.asarray(valid))
        np.testing.assert_allclose(np.asarray(feats_s), np.asarray(feats),
                                   rtol=0, atol=1e-6)

    @pytest.mark.skipif(N_DEV < 8, reason="needs the 8-device mesh")
    def test_no_retrace(self):
        from tpufeat import pitch
        cfg = pitch.PitchConfig()
        x = np.zeros((8, 8000), np.float32)
        lens = np.full((8,), 8000, np.int32)
        sharding.pitch_features_data_parallel(x, lens, cfg)
        mesh = sharding.default_mesh("dp")
        fn = sharding._make_pitch_dp_fn(cfg, mesh, "dp")
        before = fn._cache_size()   # other tests may have warmed other
        sharding.pitch_features_data_parallel(x, lens, cfg)  # shapes
        assert sharding._make_pitch_dp_fn(cfg, mesh, "dp") is fn
        assert fn._cache_size() == before


class TestBatchTimeShardedNoRetrace:
    @pytest.mark.skipif(N_DEV < 4, reason="needs >=4 devices")
    def test_second_call_hits_cache(self):
        """Round-3 fix for the 2-D twin of the round-2 DP retrace bug:
        extract_batch_time_sharded must not rebuild shard_map + jit per
        call."""
        import jax
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devs, ("dp", "time"))
        cfg = MFCC13_HTK
        n = sharding.shardable_length(16000, cfg, 2)
        x = np.stack([make_signal(n, seed=220 + b) for b in range(2)])
        lens = np.full((2,), n)
        sharding.extract_batch_time_sharded(x, lens, cfg, mesh)
        fn = sharding._make_batch_time_sharded_fn(cfg, n // 2, mesh,
                                                  "dp", "time")
        before = fn._cache_size()
        sharding.extract_batch_time_sharded(x, lens, cfg, mesh)
        assert sharding._make_batch_time_sharded_fn(
            cfg, n // 2, mesh, "dp", "time") is fn
        assert fn._cache_size() == before == 1


class TestRound3FamiliesSharded:
    """The round-3 feature families ride the sharded paths unchanged
    (they are new precomputed matrices / config flags through the same
    kernels): GFCC over the time-sharded halo path, GFCC/PNCC over the
    dp path."""

    def test_gfcc_time_sharded_matches_oneshot(self):
        from tpufeat.config import GFCC13
        n = sharding.shardable_length(6 * 16000, GFCC13, N_DEV)
        sig = make_signal(n, seed=95)
        got = np.asarray(sharding.extract_time_sharded(sig, GFCC13))
        assert_close(got, one_shot(sig, GFCC13))

    def test_gfcc_pncc_data_parallel(self):
        from tpufeat.config import GFCC13, PNCC13
        sigs = np.stack([make_signal(16000, seed=96 + i)
                         for i in range(N_DEV)])
        lengths = np.full(N_DEV, 16000, np.int32)
        for cfg in (GFCC13, PNCC13):
            res = sharding.extract_data_parallel(sigs, lengths, cfg)
            want = np.asarray(features.extract(sigs, lengths,
                                               cfg=cfg).features)
            np.testing.assert_allclose(np.asarray(res.features), want,
                                       atol=2e-5)

    def test_pncc_time_sharding_rejected(self):
        """PNCC recursions are utterance-global: the time-sharded path
        must refuse loudly (an unpacking crash was the old behavior)."""
        from tpufeat.config import PNCC13
        sig = make_signal(sharding.shardable_length(
            2 * 16000, PNCC13, N_DEV), seed=98)
        with pytest.raises(ValueError, match="PNCC"):
            sharding.extract_time_sharded(sig, PNCC13)
