"""Regression tests for the round-2 correctness fixes (ADVICE.md round 1).

Covers: short-utterance centered reflect (multi-fold, no padding leak),
whisper log with n_mfcc>0 path agreement, centered time-sharding guards,
streaming dither rejection, CLI --stream per-utterance trimming, and the
extract_data_parallel retrace fix.
"""

import dataclasses

import numpy as np
import pytest

import jax

from tpufeat import features, framing, sharding, streaming
from tpufeat.config import FeatureConfig, MFCC13_HTK, WHISPER80
from tpufeat.reference import cpu

from conftest import make_signal


class TestShortUtteranceReflect:
    """framing.py multi-fold reflect: utterances shorter than n_fft//2 must
    get np.pad(mode='reflect') semantics and never read batch padding."""

    @pytest.mark.parametrize("short_len", [180, 350, 201])
    def test_short_centered_matches_golden(self, short_len):
        long = make_signal(4000, seed=1)
        short = make_signal(short_len, seed=2)
        N = 4000
        x = np.zeros((2, N), np.float32)
        x[0, :] = long
        x[1, : short_len] = short
        # garbage in the padding: must not leak into valid frames
        x[1, short_len:] = 9.9
        lengths = np.array([N, short_len], np.int32)
        res = features.extract(x, lengths, WHISPER80)
        for b, sig in enumerate([long, short]):
            gold = cpu.extract(sig.astype(np.float64), WHISPER80)
            nf = gold.shape[0]
            assert int(res.num_frames[b]) == nf
            if nf:
                got = np.asarray(res.features)[b, :nf]
                assert np.abs(got - gold).max() < 1e-4

    def test_reflect_index_matches_numpy_pad(self):
        for L in (2, 3, 5, 150, 399):
            x = np.arange(L, dtype=np.float64)
            pad = 200
            ref = np.pad(x, (pad, pad), mode="reflect")
            import jax.numpy as jnp
            pos_left = pad - jnp.arange(pad)          # distances 200..1
            idx_l = framing._reflect_index(pos_left, jnp.asarray(L))
            np.testing.assert_array_equal(np.asarray(idx_l),
                                          ref[: pad].astype(int))
            pos_right = L + jnp.arange(pad)
            idx_r = framing._reflect_index(pos_right, jnp.asarray(L))
            np.testing.assert_array_equal(np.asarray(idx_r),
                                          ref[pad + L:].astype(int))


class TestWhisperWithDCT:
    """log='whisper' + n_mfcc>0: XLA, Pallas-tail, and fully fused paths must
    all produce DCT'd output (log -> normalize -> DCT), like the golden."""

    CFG = dataclasses.replace(WHISPER80, n_mfcc=13, lifter=22)

    def test_xla_path_matches_golden(self):
        sig = make_signal(8000, seed=3)
        res = features.extract(sig, cfg=self.CFG)
        gold = cpu.extract(sig.astype(np.float64), self.CFG)
        assert res.features.shape == gold.shape == (gold.shape[0], 13)
        assert np.abs(np.asarray(res.features) - gold).max() < 1e-3

    @pytest.mark.parametrize("flags", [
        dict(use_pallas=True),
        dict(use_pallas=True, gemm_dft=True),
        dict(use_pallas=True, gemm_dft=True, fused_framing=True),
    ])
    def test_fused_paths_agree(self, flags):
        cfg = dataclasses.replace(self.CFG, **flags)
        sig = make_signal(8000, seed=3)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), self.CFG)
        assert res.features.shape[-1] == cfg.feature_dim == 13
        assert np.abs(np.asarray(res.features) - gold).max() < 1e-3


class TestShardingGuards:
    def test_centered_preemphasis_rejected(self):
        cfg = dataclasses.replace(WHISPER80, preemphasis=0.97)
        sig = make_signal(16000)
        with pytest.raises(ValueError, match="preemphasis"):
            sharding.extract_time_sharded(sig, cfg)

    def test_centered_keep_last_frame_rejected(self):
        cfg = dataclasses.replace(WHISPER80, drop_last_frame=False)
        sig = make_signal(16000)
        with pytest.raises(ValueError, match="drop_last_frame"):
            sharding.extract_time_sharded(sig, cfg)

    def test_whisper_mfcc_sharded_matches_oneshot(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        cfg = dataclasses.replace(WHISPER80, n_mfcc=13)
        n = sharding.shardable_length(32000, cfg, len(jax.devices()))
        sig = make_signal(n, seed=5)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg))
        want = np.asarray(features.extract(sig, cfg=cfg).features)
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 2e-5


class TestStreamingDitherGuard:
    def test_rejected(self):
        cfg = dataclasses.replace(MFCC13_HTK, dither=1e-5)
        with pytest.raises(ValueError, match="dither"):
            streaming.StreamingFrontend(cfg)


class TestCliStreamTrim:
    def test_unequal_lengths_trimmed_and_validated(self, tmp_path, capsys):
        from tpufeat import cli, io
        paths = []
        for i, n in enumerate((12000, 7000)):
            p = tmp_path / f"in{i}.wav"
            io.write_wav(str(p), make_signal(n, seed=i), 16000)
            paths.append(str(p))
        out = tmp_path / "out.npz"
        rc = cli.main(paths + [str(out), "--stream", "1600", "--validate"])
        assert rc == 0
        data = np.load(out)
        nf = [MFCC13_HTK.num_frames(n) for n in (12000, 7000)]
        assert data["features"].shape[1] == max(nf)
        assert list(data["mask"].sum(axis=1)) == nf
        # validate printed max-abs-err within float32 tolerance
        import json
        line = [ln for ln in capsys.readouterr().out.splitlines()
                if "max_abs_err" in ln][-1]
        errs = json.loads(line)["max_abs_err"]
        assert errs["numpy_f64"] < 1e-3


class TestCodeReviewFixes:
    """Round-2 self-review findings (see commit message)."""

    def test_odd_nfft_gemm_rejected(self):
        with pytest.raises(ValueError, match="even n_fft"):
            FeatureConfig(n_fft=401, frame_length=400, gemm_dft=True)
        FeatureConfig(n_fft=401, frame_length=400)   # rfft path stays legal

    def test_resample_int16_scaled(self):
        from tpufeat import resampling
        sig = make_signal(4000, seed=95)
        pcm = np.clip(np.round(sig * 32768), -32768, 32767).astype(np.int16)
        a = np.asarray(resampling.resample(pcm, 8000, 16000))
        b = np.asarray(resampling.resample(
            pcm.astype(np.float32) / 32768.0, 8000, 16000))
        np.testing.assert_array_equal(a, b)
        assert np.abs(a).max() < 1.5          # scaled, not raw int range

    def test_wav_info_header_only(self, tmp_path):
        from tpufeat import io
        p = str(tmp_path / "x.wav")
        io.write_wav(p, make_signal(12345, seed=96), 16000,
                     encoding="float32")
        assert io.wav_info(p) == (12345, 16000)

    def test_malformed_fmt_valueerror(self, tmp_path):
        from tpufeat import io
        import struct
        p = str(tmp_path / "bad.wav")
        payload = bytes(64)
        hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload),
                          b"WAVE", b"fmt ", 16, 1, 0, 16000, 0, 0, 0,
                          b"data", len(payload))   # channels=0, bits=0
        with open(p, "wb") as f:
            f.write(hdr + payload)
        with pytest.raises(ValueError, match="malformed fmt"):
            io.read_wav(p, native=False)
        with pytest.raises(ValueError, match="malformed fmt"):
            io.wav_info(p)

    def test_pipeline_decode_error_surfaces(self, tmp_path, monkeypatch):
        from tpufeat import io, pipeline
        d = tmp_path / "wavs"
        d.mkdir()
        for i in range(3):
            io.write_wav(str(d / f"u{i}.wav"), make_signal(8000, seed=i),
                         16000)

        def boom(entries, width, sr, rows):
            raise OSError("disk on fire")
        monkeypatch.setattr(pipeline, "_decode_batch", boom)
        with pytest.raises(OSError, match="disk on fire"):
            list(pipeline.extract_corpus(str(d), MFCC13_HTK, batch_size=2))


class TestExtractChunked:
    def test_exact_vs_single_dispatch(self):
        x = np.stack([make_signal(9000, seed=s) for s in range(6)])
        lens = np.array([9000, 7000, 9000, 5000, 9000, 401], np.int32)
        a = features.extract(x, lens, MFCC13_HTK)
        b = features.extract_chunked(x, lens, MFCC13_HTK,
                                     rows_per_dispatch=2)
        np.testing.assert_array_equal(np.asarray(a.features),
                                      np.asarray(b.features))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))


class TestDataParallelNoRetrace:
    def test_second_call_hits_cache(self):
        cfg = MFCC13_HTK
        mesh = sharding.default_mesh()
        B = mesh.devices.size * 2
        x = np.stack([make_signal(4000, seed=i) for i in range(B)])
        lens = np.full((B,), 4000, np.int32)
        sharding.extract_data_parallel(x, lens, cfg, mesh)
        fn = sharding._make_dp_fn(cfg, mesh, "dp")
        before = fn._cache_size()
        sharding.extract_data_parallel(x, lens, cfg, mesh)
        assert sharding._make_dp_fn(cfg, mesh, "dp") is fn
        # no retrace for a repeated (shape, cfg) call; absolute size is
        # suite-order-dependent (other tests share this lru-cached fn)
        assert fn._cache_size() == before >= 1


class TestSelfReview2:
    """Regressions for the second round-2 self-review pass."""

    def test_signal_kernel_many_shifts(self):
        # frame_length/hop >= 10 needs >8 boundary rows per frame-block;
        # the 8-row-capped boundary tensor silently corrupted the last
        # frame of each block (and the last frame overall) before the fix
        cfg_f = dataclasses.replace(MFCC13_HTK, hop_length=40,
                                    use_pallas=True, gemm_dft=True,
                                    fused_framing=True)
        cfg_s = dataclasses.replace(cfg_f, fused_framing=False)
        for n in (1320, 41000):  # single block F=tf, multi-block
            sig = make_signal(n, seed=3)
            a = np.asarray(features.extract(sig, cfg=cfg_f).features)
            b = np.asarray(features.extract(sig, cfg=cfg_s).features)
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_deltas_fewer_frames_than_window(self):
        # F < window used to emit MORE frames than the input (broadcasting
        # hid the shape bug) and crash extract() on single-frame utterances
        from tpufeat.config import KALDI39
        out = features.extract(np.zeros((1, 450), np.float32), cfg=KALDI39)
        assert out.features.shape == (1, 1, 39)
        one = np.random.default_rng(0).standard_normal((1, 1, 13))
        d = features.deltas(one.astype(np.float32), np.array([1]))
        assert d.shape == (1, 1, 13)
        np.testing.assert_array_equal(np.asarray(d), 0.0)  # flat replicate

    def test_streaming_rejects_gapped_framing(self):
        # hop > frame_length would drive the static fill negative and emit
        # features from a misaligned buffer before any range check fired
        cfg = dataclasses.replace(MFCC13_HTK, frame_length=400,
                                  hop_length=500)
        with pytest.raises(ValueError, match="hop_length <= frame_length"):
            streaming.init_state(1, cfg)
            streaming.process_chunk_static(
                streaming.init_state(1, cfg),
                np.zeros((1, 900), np.float32), cfg, 0)

    def test_spec_augment_empty_utterance_untouched(self):
        from tpufeat.augment import spec_augment
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((3, 50, 20)).astype(np.float32)
        out = np.asarray(spec_augment(
            feats, np.array([20, 1, 0]), jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(out[2], feats[2])

    def test_wav_riff_size_counts_pad_byte(self):
        import struct
        import tpufeat.io as tio
        path = "/tmp/tpufeat_odd_payload.wav"
        tio.write_wav(path, np.zeros(7, np.float32), 16000, encoding="pcm8")
        raw = open(path, "rb").read()
        assert struct.unpack_from("<I", raw, 4)[0] == len(raw) - 8
        x, rate = tio.read_wav(path)
        assert x.shape == (7,) and rate == 16000

    def test_streaming_delta_flush_cached(self):
        sd = streaming.StreamingDeltas(dim=13, window=2)
        sd.process(np.zeros((1, 5, 13), np.float32))
        fn = streaming._make_delta_flush_fn(2, 4)
        sd.flush()
        assert streaming._make_delta_flush_fn(2, 4) is fn
