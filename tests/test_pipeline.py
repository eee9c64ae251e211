"""Corpus pipeline (tpufeat/pipeline.py): dir of WAVs -> features."""

import numpy as np
import pytest

from tpufeat import features, io, pipeline
from tpufeat.config import MFCC13_HTK

from conftest import make_signal


def _make_corpus(tmp_path, lengths):
    d = tmp_path / "wavs"
    (d / "sub").mkdir(parents=True)
    sigs = {}
    for i, n in enumerate(lengths):
        rel = f"sub/u{i}.wav" if i % 2 else f"u{i}.wav"
        sig = make_signal(n, seed=100 + i)
        io.write_wav(str(d / rel), sig, 16000)
        sigs[rel] = sig
    return d, sigs


class TestPipeline:
    def test_matches_direct_extract(self, tmp_path):
        d, sigs = _make_corpus(tmp_path, [16000, 7000, 23999, 16000, 4000])
        got = {}
        for path, feats in pipeline.extract_corpus(str(d), MFCC13_HTK,
                                                   batch_size=2):
            import os
            got[os.path.relpath(path, str(d))] = feats
        assert set(got) == set(sigs)
        for rel, sig in sigs.items():
            # WAV write/read quantizes to int16; compare vs the decoded data
            x, _ = io.read_wav(str(d / rel))
            want = np.asarray(features.extract(x, cfg=MFCC13_HTK).features)
            np.testing.assert_allclose(got[rel], want, atol=2e-5)

    def test_overlap_fetch_matches_serial(self, tmp_path):
        """The one-deep fetch pipeline (round-5: the warm corpus pass is
        transfer-bound; batch k's readback overlaps batch k+1's
        upload/dispatch) must yield bitwise-identical rows in identical
        order vs the strictly serial path."""
        d, _sigs = _make_corpus(tmp_path, [16000, 7000, 23999, 16000,
                                           4000, 9000, 31000])
        runs = {}
        for overlap in (False, True):
            runs[overlap] = list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, batch_size=2, overlap_fetch=overlap))
        assert [k for k, _ in runs[False]] == [k for k, _ in runs[True]]
        for (_, a), (_, b) in zip(runs[False], runs[True]):
            np.testing.assert_array_equal(a, b)

    def test_compact_upload_matches_f32(self, tmp_path):
        """PCM16-sourced corpora upload int16 arenas (half the bytes of
        the transfer-bound warm pass); the device promotes back to f32
        first, so features must match the f32-upload path to f32
        roundoff (the promoted VALUES are identical; XLA fuses the extra
        convert into its neighbors, which reassociates a few downstream
        f32 ops — measured ~5e-6)."""
        d, _sigs = _make_corpus(tmp_path, [16000, 7000, 23999, 4000])
        runs = {}
        for compact in (False, True):
            runs[compact] = list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, batch_size=2, compact_upload=compact))
        assert [k for k, _ in runs[False]] == [k for k, _ in runs[True]]
        for (_, a), (_, b) in zip(runs[False], runs[True]):
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_compact_arena_gates_on_exactness(self):
        """Float-valued audio that does not round-trip through int16 must
        keep its f32 arena — silently lossy uploads are never an option."""
        pcm = (np.arange(-5, 6, dtype=np.float32) / 32768.0)[None]
        assert pipeline._compact_arena(pcm).dtype == np.int16
        fl = np.array([[0.1, -0.25, 1e-6]], np.float32)   # not PCM16 grid
        assert pipeline._compact_arena(fl).dtype == np.float32
        loud = np.array([[1.5, -2.0]], np.float32)        # out of range
        assert pipeline._compact_arena(loud).dtype == np.float32

    def test_cli_main(self, tmp_path, capsys):
        d, sigs = _make_corpus(tmp_path, [8000, 8000, 12000])
        out = tmp_path / "corpus.npz"
        rc = pipeline.main([str(d), str(out), "--preset", "mfcc13",
                            "--batch", "2"])
        assert rc == 0
        data = np.load(out)
        assert len(data.files) == 3
        for rel in sigs:
            assert data[rel].shape[1] == 13

    def test_cli_set_out_dtype_bf16(self, tmp_path):
        """--set out_dtype=bfloat16 (the relay-readback halver,
        BASELINE.md corpus rows): the device->host fetch is bf16, the
        archive upcasts to f32 (np.savez / Kaldi FM can't round-trip
        ml_dtypes) — values match the f32 run to bf16 rounding."""
        d, sigs = _make_corpus(tmp_path, [8000, 12000])
        out32 = tmp_path / "c32.npz"
        out16 = tmp_path / "c16.npz"
        assert pipeline.main([str(d), str(out32), "--batch", "2"]) == 0
        assert pipeline.main([str(d), str(out16), "--batch", "2",
                              "--set", "out_dtype=bfloat16"]) == 0
        a, b = np.load(out32), np.load(out16)
        assert set(a.files) == set(b.files)
        for k in a.files:
            assert b[k].dtype == np.float32
            # bf16 has an 8-bit mantissa: rel error <= 2^-8
            np.testing.assert_allclose(b[k], a[k], rtol=2 ** -7,
                                       atol=0.05)

    def test_rate_mismatch_rejected(self, tmp_path):
        d = tmp_path / "wavs"
        d.mkdir()
        io.write_wav(str(d / "a.wav"), make_signal(8000), 8000)
        import pytest
        with pytest.raises(ValueError, match="resample"):
            list(pipeline.extract_corpus(str(d), MFCC13_HTK))

    def test_resample_heterogeneous_corpus(self, tmp_path):
        """--resample: 8k/16k/48k files in one corpus; every output
        matches per-file resample() -> extract()."""
        import os
        from tpufeat import resampling
        d = tmp_path / "wavs"
        d.mkdir()
        rates = {"a.wav": 16000, "b.wav": 8000, "c.wav": 48000,
                 "d.wav": 8000}
        for i, (name, r) in enumerate(rates.items()):
            io.write_wav(str(d / name), make_signal(r // 2 + 77, seed=i),
                         r)
        got = {}
        stats = {}
        for path, feats in pipeline.extract_corpus(
                str(d), MFCC13_HTK, batch_size=2, stats=stats,
                resample=True):
            got[os.path.basename(path)] = feats
        assert set(got) == set(rates)
        for name, r in rates.items():
            x, _ = io.read_wav(str(d / name))
            x16 = resampling.resample(x, r, 16000)
            want = np.asarray(features.extract(x16, cfg=MFCC13_HTK)
                              .features)
            np.testing.assert_allclose(got[name], want, atol=2e-5)
        assert abs(stats["audio_s"] - 4 * 0.5) < 0.05  # ~0.5 s each

    def test_dp_corpus_matches_direct(self, tmp_path):
        """dp=True on the 8-fake-device mesh: row-sharded batches (with
        mesh-divisibility zero-row padding) match direct extract."""
        import os
        d, sigs = _make_corpus(tmp_path, [16000, 7000, 23999, 16000,
                                          4000])
        got = {os.path.relpath(p, str(d)): f for p, f in
               pipeline.extract_corpus(str(d), MFCC13_HTK, batch_size=4,
                                       dp=True)}
        assert set(got) == set(sigs)
        for rel in sigs:
            x, _ = io.read_wav(str(d / rel))
            want = np.asarray(features.extract(x, cfg=MFCC13_HTK).features)
            np.testing.assert_allclose(got[rel], want, atol=2e-5)

    def test_dp_with_resample(self, tmp_path):
        """dp + resample compose: rate-grouped, row-padded to the mesh
        multiple, resampled on device, extracted sharded."""
        import os
        from tpufeat import resampling
        d = tmp_path / "wavs"
        d.mkdir()
        rates = {"a.wav": 16000, "b.wav": 8000, "c.wav": 48000}
        for i, (name, r) in enumerate(rates.items()):
            io.write_wav(str(d / name), make_signal(r // 2, seed=40 + i),
                         r)
        got = {os.path.basename(p): f for p, f in pipeline.extract_corpus(
            str(d), MFCC13_HTK, batch_size=2, resample=True, dp=True)}
        assert set(got) == set(rates)
        for name, r in rates.items():
            x, _ = io.read_wav(str(d / name))
            x16 = resampling.resample(x, r, 16000)
            want = np.asarray(features.extract(x16, cfg=MFCC13_HTK)
                              .features)
            np.testing.assert_allclose(got[name], want, atol=2e-5)

    def test_dp_erratum_guard_splits(self, tmp_path, monkeypatch):
        """When the per-device program shape leaves the measured-clean
        envelope, the dp path must row-split exactly like extract()."""
        import os
        from tpufeat import features as feat_mod
        d, sigs = _make_corpus(tmp_path, [16000] * 9)
        want = {}
        for rel in sigs:                        # oracle BEFORE patching
            x, _ = io.read_wav(str(d / rel))
            want[rel] = np.asarray(features.extract(x, cfg=MFCC13_HTK)
                                   .features)
        # 9 files pad to 16 rows on the 8-device mesh -> 2 rows/device;
        # declare multi-row per-device programs unsafe so the dp path
        # must split into 1-row-per-device dispatches
        monkeypatch.setattr(feat_mod, "_single_program_safe",
                            lambda shape: shape[0] <= 1)
        monkeypatch.setattr(feat_mod, "_rows_per_dispatch",
                            lambda B, N: 1)
        got = {os.path.relpath(p, str(d)): f for p, f in
               pipeline.extract_corpus(str(d), MFCC13_HTK,
                                       batch_size=16, dp=True)}
        assert set(got) == set(sigs)
        for rel in sigs:
            np.testing.assert_allclose(got[rel], want[rel], atol=2e-5)

    def test_dp_rejects_dither(self, tmp_path):
        import dataclasses
        import pytest
        d, _ = _make_corpus(tmp_path, [8000])
        cfg = dataclasses.replace(MFCC13_HTK, dither=1e-3)
        with pytest.raises(ValueError, match="dp=True"):
            list(pipeline.extract_corpus(str(d), cfg, dp=True))

    def test_resample_cli_flag(self, tmp_path):
        d = tmp_path / "wavs"
        d.mkdir()
        io.write_wav(str(d / "a.wav"), make_signal(8000, seed=1), 8000)
        out = tmp_path / "o.npz"
        rc = pipeline.main([str(d), str(out), "--resample"])
        assert rc == 0
        assert np.load(out)["a.wav"].shape[1] == 13

    def test_stats_collection(self, tmp_path):
        """Round-3 instrumentation: stats dict reports programs, padding
        waste, decode/device split."""
        d, sigs = _make_corpus(tmp_path, [16000, 7000, 23999, 16000, 4000])
        stats = {}
        out = dict(
            (p, f) for p, f in pipeline.extract_corpus(
                str(d), MFCC13_HTK, batch_size=2, stats=stats))
        assert len(out) == 5
        assert stats["files"] == 5
        assert stats["batches"] >= 3          # 3 buckets at batch<=2
        assert stats["n_programs"] >= 2       # >=2 distinct shapes
        assert 0.0 <= stats["padding_waste"] < 0.45
        assert stats["device_s"] > 0
        assert stats["audio_s"] > 0

    def test_partial_decode_failure_surfaces_file(self, tmp_path):
        """A corrupt WAV inside a batch must raise an error naming the
        file — the threaded/native loader must not silently yield garbage
        for it (round-2 VERDICT weak item 7)."""
        import pytest
        d, _ = _make_corpus(tmp_path, [16000, 16000, 16000])
        bad = d / "bad.wav"
        good = open(str(d / "u0.wav"), "rb").read()
        open(str(bad), "wb").write(good[:40])       # truncated mid-header
        with pytest.raises(Exception) as ei:
            list(pipeline.extract_corpus(str(d), MFCC13_HTK, batch_size=4))
        assert "bad.wav" in str(ei.value)

    def test_native_and_python_decode_agree(self, tmp_path):
        """The native threaded arena loader and the Python fallback decode
        the same corpus identically (when the native lib is available)."""
        from tpufeat import cpp_golden
        if not cpp_golden.available():
            import pytest
            pytest.skip("native loader not built")
        d, _ = _make_corpus(tmp_path, [9000, 5000, 12345])
        import os
        paths = sorted(str(d / p) for p in os.listdir(d)
                       if p.endswith(".wav"))
        paths += sorted(str(d / "sub" / p) for p in os.listdir(d / "sub"))
        arena, lengths, rates = cpp_golden.read_wav_batch(paths, 16000)
        assert (lengths >= 0).all() and (rates == 16000).all()
        for i, p in enumerate(paths):
            s, r = io.read_wav(p)
            assert r == 16000
            np.testing.assert_array_equal(arena[i, : len(s)], s)
            assert lengths[i] == len(s)


class TestBatchPadding:
    def test_remainder_batches_reuse_full_shape(self, tmp_path):
        """A bucket with >= one full batch pads its remainder batch up to
        batch_size rows (masked zero rows), so the whole bucket runs ONE
        compiled shape; under-full buckets keep their exact row count."""
        # 5 same-bucket files at batch 2 -> two full + one remainder
        # (the bucket grid floors at 16000 samples, so use 32000 for the
        # second, under-full bucket)
        d, sigs = _make_corpus(tmp_path, [16000] * 5 + [32000])
        plans = pipeline._plan_batches(
            pipeline._scan_corpus(str(d)), 2)
        rows = sorted((len(p[0]), p[2]) for p in plans)
        # the 32000-sample bucket has a single file -> exact (1, 1);
        # the 16000 bucket: (2,2), (2,2), (1,2) padded
        assert (1, 1) in rows
        assert (1, 2) in rows
        import os
        stats = {}
        out = {}
        for path, feats in pipeline.extract_corpus(str(d), MFCC13_HTK,
                                                   batch_size=2,
                                                   stats=stats):
            out[os.path.relpath(path, str(d))] = feats
        assert len(out) == 6
        assert stats["n_programs"] == 2          # one per length bucket
        # padded rows must not change results (WAV int16 round trip, so
        # compare vs the decoded samples like test_matches_direct_extract)
        for rel in sigs:
            x, _ = io.read_wav(str(d / rel))
            want = np.asarray(features.extract(x, cfg=MFCC13_HTK).features)
            np.testing.assert_allclose(out[rel], want, rtol=0, atol=2e-5)

    def test_corpus_dither_rng(self, tmp_path):
        """Dither configs work through the corpus path with an explicit
        key (round-2 VERDICT weak item 5's last gap) and require one."""
        import dataclasses
        import jax
        import pytest
        from tpufeat.config import FeatureConfig
        d, _ = _make_corpus(tmp_path, [8000, 8000, 8000])
        cfg = dataclasses.replace(FeatureConfig(), dither=1e-3)
        with pytest.raises(ValueError, match="PRNG"):
            list(pipeline.extract_corpus(str(d), cfg, batch_size=2))
        out = dict(pipeline.extract_corpus(str(d), cfg, batch_size=2,
                                           rng=jax.random.key(11)))
        clean = dict(pipeline.extract_corpus(str(d), FeatureConfig(),
                                             batch_size=2))
        for k in out:
            d_ = np.abs(out[k] - clean[k])
            assert 0 < d_.max() < 0.5            # noise present, small


class TestPerSpeakerCmvn:
    """--utt2spk: per-speaker compute-cmvn-stats / apply-cmvn."""

    def _corpus(self, tmp_path):
        d, sigs = _make_corpus(tmp_path, [8000, 9000, 10000, 11000])
        # sub/u1, sub/u3 -> spkB (stem spelling); u0, u2 -> spkA (relpath)
        u2s = tmp_path / "utt2spk"
        u2s.write_text("u0.wav spkA\nu2.wav spkA\n"
                       "sub/u1 spkB\nsub/u3 spkB\n")
        return d, sigs, str(u2s)

    def test_roundtrip_whitens_per_speaker(self, tmp_path):
        import pytest
        d, _, u2s = self._corpus(tmp_path)
        stats_p = str(tmp_path / "cmvn.ark")
        pipeline.main([str(d), str(tmp_path / "o1.npz"), "--batch", "2",
                       "--global-cmvn", stats_p, "--utt2spk", u2s])
        pipeline.main([str(d), str(tmp_path / "o2.npz"), "--batch", "2",
                       "--apply-cmvn", stats_p, "--norm-vars",
                       "--utt2spk", u2s])
        from tpufeat import feats_io
        ark = feats_io.read_kaldi_ark(stats_p)
        assert sorted(ark) == ["spkA", "spkB"]
        z = np.load(str(tmp_path / "o2.npz"))
        for spk, utts in (("spkA", ["u0.wav", "u2.wav"]),
                          ("spkB", ["sub/u1.wav", "sub/u3.wav"])):
            f = np.concatenate([z[u] for u in utts])
            np.testing.assert_allclose(f.mean(0), 0.0, atol=1e-4)
            np.testing.assert_allclose(f.var(0), 1.0, atol=1e-3)
        # and the whole corpus is NOT globally whitened (stats differ)
        assert not np.allclose(ark["spkA"], ark["spkB"])

    def test_missing_mapping_and_bad_paths(self, tmp_path):
        import pytest
        d, _, u2s = self._corpus(tmp_path)
        # npz stats path with utt2spk is rejected up front
        with pytest.raises(ValueError, match="ark"):
            pipeline.main([str(d), str(tmp_path / "o.npz"),
                           "--global-cmvn", str(tmp_path / "c.npz"),
                           "--utt2spk", u2s])
        # a corpus file absent from the map is an error
        io.write_wav(str(d / "stray.wav"), make_signal(8000, seed=9), 16000)
        with pytest.raises(ValueError, match="stray"):
            pipeline.main([str(d), str(tmp_path / "o.npz"),
                           "--global-cmvn", str(tmp_path / "c.ark"),
                           "--utt2spk", u2s])

    def test_utt2spk_parse_errors(self, tmp_path):
        import pytest
        bad = tmp_path / "u2s"
        bad.write_text("only_one_token\n")
        with pytest.raises(ValueError, match="expected"):
            pipeline._read_utt2spk(str(bad))
        bad.write_text("u a\nu b\n")
        with pytest.raises(ValueError, match="duplicate"):
            pipeline._read_utt2spk(str(bad))


def test_corpus_ark_output(tmp_path):
    """Corpus driver writing a Kaldi ark + scp: keys are sanitized
    relpaths, scp offsets random-access correctly."""
    from conftest import make_signal
    from tpufeat import feats_io, io, pipeline
    d = tmp_path / "wavs"
    d.mkdir()
    for i in range(3):
        io.write_wav(str(d / f"utt {i}.wav"),
                     make_signal(8000 + 500 * i, seed=70 + i), 16000)
    ark = str(tmp_path / "feats.ark")
    pipeline.main([str(d), ark, "--batch", "2"])
    got = feats_io.read_kaldi_ark(ark)
    assert sorted(got) == [f"utt_{i}" for i in range(3)]
    index = feats_io.read_kaldi_scp(str(tmp_path / "feats.scp"))
    for key, (path, off) in index.items():
        np.testing.assert_array_equal(
            feats_io.read_kaldi_matrix(path, off, key), got[key])


class TestSegments:
    """--segments: Kaldi segments-file flow (extract-segments analogue)."""

    def _corpus(self, tmp_path):
        d, sigs = _make_corpus(tmp_path, [32000, 24000])
        seg = tmp_path / "segments"
        # spans inside u0.wav (relpath key) and sub/u1 (stem key); s3's
        # end overshoots sub/u1 (1.5 s file) within tolerance -> clamped
        seg.write_text("s1 u0.wav 0.25 1.10\n"
                       "s2 u0.wav 1.00 2.00\n"
                       "s3 sub/u1 0.50 1.55\n")
        spans = {"s1": ("u0.wav", 4000, 17600),
                 "s2": ("u0.wav", 16000, 32000),
                 "s3": ("sub/u1.wav", 8000, 24000)}
        return d, str(seg), spans

    def test_matches_direct_extract_on_slices(self, tmp_path):
        d, seg, spans = self._corpus(tmp_path)
        got = dict(pipeline.extract_corpus(str(d), MFCC13_HTK,
                                           batch_size=2, segments=seg))
        assert set(got) == set(spans)
        for utt, (rel, s, t) in spans.items():
            x, _ = io.read_wav(str(d / rel))
            want = np.asarray(
                features.extract(x[s:t], cfg=MFCC13_HTK).features)
            np.testing.assert_allclose(got[utt], want, atol=2e-5)

    def test_cli_ark_keyed_by_utt(self, tmp_path):
        from tpufeat import feats_io
        d, seg, spans = self._corpus(tmp_path)
        ark = str(tmp_path / "feats.ark")
        rc = pipeline.main([str(d), ark, "--segments", seg, "--batch", "2"])
        assert rc == 0
        assert sorted(feats_io.read_kaldi_ark(ark)) == sorted(spans)

    def test_parse_and_resolve_errors(self, tmp_path):
        import pytest
        d, _, _ = self._corpus(tmp_path)

        def seg(text):
            p = tmp_path / "seg_err"
            p.write_text(text)
            return str(p)

        with pytest.raises(ValueError, match="expected"):
            list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, segments=seg("s1 u0.wav 0.0\n")))
        with pytest.raises(ValueError, match="duplicate"):
            list(pipeline.extract_corpus(
                str(d), MFCC13_HTK,
                segments=seg("s1 u0.wav 0 1\ns1 u0.wav 1 2\n")))
        with pytest.raises(ValueError, match="start < end"):
            list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, segments=seg("s1 u0.wav 1.0 0.5\n")))
        with pytest.raises(ValueError, match="non-numeric"):
            list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, segments=seg("s1 u0.wav zero 1\n")))
        with pytest.raises(ValueError, match="not found"):
            list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, segments=seg("s1 nope.wav 0 1\n")))
        # u0.wav is 2.0 s: 0.1 s past the end clamps, beyond raises
        with pytest.raises(ValueError, match="past the end"):
            list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, segments=seg("s1 u0.wav 0.0 2.25\n")))
        with pytest.raises(ValueError, match="starts at sample"):
            list(pipeline.extract_corpus(
                str(d), MFCC13_HTK, segments=seg("s1 u0.wav 2.5 3.0\n")))

    def test_utt2spk_cmvn_composes(self, tmp_path):
        """Per-speaker CMVN keyed by SEGMENT utterance ids."""
        d, seg, spans = self._corpus(tmp_path)
        u2s = tmp_path / "utt2spk"
        u2s.write_text("s1 spkA\ns2 spkA\ns3 spkB\n")
        stats_p = str(tmp_path / "cmvn.ark")
        pipeline.main([str(d), str(tmp_path / "o1.npz"), "--segments", seg,
                       "--utt2spk", str(u2s), "--global-cmvn", stats_p])
        from tpufeat import feats_io
        assert sorted(feats_io.read_kaldi_ark(stats_p)) == ["spkA", "spkB"]


class TestCorpusIvector:
    """Per-utterance i-vectors computed inside the corpus pipeline
    (ivector= / --ivector-extractor; the ivector-extract flow)."""

    @staticmethod
    def _train_extractor(d):
        from tpufeat import ivector as iv
        feats = [f for _, f in pipeline.extract_corpus(str(d), MFCC13_HTK,
                                                       batch_size=2)]
        ubm = iv.train_diag_ubm(np.concatenate(feats), 4, iters=2,
                                final_iters=3, seed=0)
        return iv.train_ivector_extractor(ubm, feats, ivector_dim=3,
                                          iters=2, seed=1)

    def test_matches_per_utterance(self, tmp_path):
        from tpufeat import ivector as iv
        d, _ = _make_corpus(tmp_path, [16000, 7000, 12000, 9000])
        ext = self._train_extractor(d)
        ivecs = {}
        got = dict(pipeline.extract_corpus(str(d), MFCC13_HTK,
                                           batch_size=2, ivector=ext,
                                           ivectors=ivecs))
        assert set(ivecs) == set(got)
        for key, feats in got.items():
            want = np.asarray(iv.utterance_ivector(ext, feats))
            np.testing.assert_allclose(ivecs[key], want, atol=2e-4,
                                       rtol=1e-3)

    def test_validation(self, tmp_path):
        from tpufeat import ivector as iv
        d, _ = _make_corpus(tmp_path, [8000])
        ubm = iv.DiagUbm(np.full(2, 0.5), np.zeros((2, 5)),
                         np.ones((2, 5)))
        bad = iv.IvectorExtractor(ubm, np.zeros((2, 5, 3)))
        with pytest.raises(ValueError, match="dim"):
            list(pipeline.extract_corpus(str(d), MFCC13_HTK, ivector=bad,
                                         ivectors={}))
        ext = self._train_extractor(d)
        with pytest.raises(ValueError, match="ivectors"):
            list(pipeline.extract_corpus(str(d), MFCC13_HTK, ivector=ext))

    def test_cli_writes_vec_ark(self, tmp_path, capsys):
        from tpufeat import feats_io
        from tpufeat import ivector as iv
        d, sigs = _make_corpus(tmp_path, [8000, 8000, 12000])
        ext = self._train_extractor(d)
        ext_path = tmp_path / "ext.npz"
        ext.save(str(ext_path))
        out = tmp_path / "corpus.npz"
        ark = tmp_path / "ivectors.ark"
        rc = pipeline.main([str(d), str(out), "--preset", "mfcc13",
                            "--batch", "2",
                            "--ivector-extractor", str(ext_path),
                            "--ivector-ark", str(ark)])
        assert rc == 0
        back = feats_io.read_kaldi_vec_ark(str(ark))
        assert len(back) == len(sigs)
        for v in back.values():
            assert v.shape == (3,) and np.isfinite(v).all()
        # .scp random access agrees with the sequential read
        scp = feats_io.read_kaldi_scp(str(tmp_path / "ivectors.scp"))
        for k, (path, off) in scp.items():
            np.testing.assert_array_equal(
                feats_io.read_kaldi_vector(path, off, k), back[k])

    def test_cli_ark_requires_extractor(self, tmp_path):
        d, _ = _make_corpus(tmp_path, [8000])
        with pytest.raises(ValueError, match="ivector-extractor"):
            pipeline.main([str(d), str(tmp_path / "o.npz"),
                           "--ivector-ark", str(tmp_path / "iv.ark")])


class TestFmllr:
    """--fmllr-ubm/--fmllr-ark estimation + --apply-fmllr application
    (gmm-est-fmllr / transform-feats corpus flow)."""

    def _corpus_and_ubm(self, tmp_path):
        d, _ = _make_corpus(tmp_path, [9000, 10000, 11000, 12000])
        u2s = tmp_path / "utt2spk"
        u2s.write_text("u0.wav spkA\nu2.wav spkA\n"
                       "sub/u1 spkB\nsub/u3 spkB\n")
        # UBM trained on THIS preset's corpus features
        feats = [f for _, f in pipeline.extract_corpus(
            str(d), MFCC13_HTK, batch_size=2)]
        from tpufeat.ivector import train_diag_ubm
        ubm = train_diag_ubm(np.concatenate(feats), 2, iters=2,
                             final_iters=2, seed=0)
        ubm_p = str(tmp_path / "ubm.npz")
        ubm.save(ubm_p)
        return d, str(u2s), ubm, ubm_p

    def test_estimate_and_apply_roundtrip(self, tmp_path):
        d, u2s, ubm, ubm_p = self._corpus_and_ubm(tmp_path)
        trans_p = str(tmp_path / "trans.ark")
        rc = pipeline.main([str(d), str(tmp_path / "o1.npz"),
                            "--batch", "2", "--utt2spk", u2s,
                            "--fmllr-ubm", ubm_p, "--fmllr-ark", trans_p,
                            "--fmllr-min-count", "1"])
        assert rc == 0
        from tpufeat import feats_io
        ark = feats_io.read_kaldi_ark(trans_p)
        assert sorted(ark) == ["spkA", "spkB"]
        for W in ark.values():
            assert W.shape == (13, 14)
        # transforms must match direct estimation on the same features
        from tpufeat import fmllr as fm
        per_spk = {"spkA": [], "spkB": []}
        for rel, f in np.load(str(tmp_path / "o1.npz")).items():
            per_spk["spkA" if rel in ("u0.wav", "u2.wav")
                    else "spkB"].append(f)
        for spk, fs in per_spk.items():
            # per-utterance stats summed, then one estimate — CLOSE, not
            # bitwise: the pipeline accumulates via padded per-row
            # batched dispatches (one compile per length bucket, review
            # fix), whose f32 summation order differs, and the tiny
            # per-speaker corpus leaves G_d barely determined so stat
            # noise moves the (flat) optimum
            b_, K_, G_ = fm.fmllr_stats(ubm, fs[0])
            for f in fs[1:]:
                b2, K2, G2 = fm.fmllr_stats(ubm, f)
                b_, K_, G_ = b_ + b2, K_ + K2, G_ + G2
            want = fm.estimate_fmllr(b_, K_, G_, min_count=1.0)
            np.testing.assert_allclose(ark[spk],
                                       want.astype(np.float32),
                                       atol=0.05)
            direct = fm.est_fmllr(ubm, np.concatenate(fs), min_count=1.0)
            np.testing.assert_allclose(ark[spk], direct, atol=0.1)
        # apply pass: adapted features == apply_transform of the originals
        rc = pipeline.main([str(d), str(tmp_path / "o2.npz"),
                            "--batch", "2", "--utt2spk", u2s,
                            "--apply-fmllr", trans_p])
        assert rc == 0
        from tpufeat.data import apply_transform
        z1 = np.load(str(tmp_path / "o1.npz"))
        z2 = np.load(str(tmp_path / "o2.npz"))
        for rel in z1.files:
            spk = "spkA" if rel in ("u0.wav", "u2.wav") else "spkB"
            np.testing.assert_allclose(
                z2[rel], np.asarray(apply_transform(z1[rel], ark[spk])),
                rtol=1e-5, atol=1e-5)

    def test_global_without_utt2spk(self, tmp_path):
        d, _, ubm, ubm_p = self._corpus_and_ubm(tmp_path)
        trans_p = str(tmp_path / "trans.ark")
        pipeline.main([str(d), str(tmp_path / "o.npz"), "--batch", "2",
                       "--fmllr-ubm", ubm_p, "--fmllr-ark", trans_p,
                       "--fmllr-min-count", "1"])
        from tpufeat import feats_io
        ark = feats_io.read_kaldi_ark(trans_p)
        assert list(ark) == ["global"]
        # below min-count: identity fallback
        pipeline.main([str(d), str(tmp_path / "o.npz"), "--batch", "2",
                       "--fmllr-ubm", ubm_p, "--fmllr-ark", trans_p,
                       "--fmllr-min-count", "1e9"])
        W = feats_io.read_kaldi_ark(trans_p)["global"]
        np.testing.assert_array_equal(
            W, np.concatenate([np.eye(13), np.zeros((13, 1))],
                              axis=1).astype(np.float32))

    def test_validation(self, tmp_path):
        d, u2s, ubm, ubm_p = self._corpus_and_ubm(tmp_path)
        with pytest.raises(ValueError, match="requires --fmllr-ark"):
            pipeline.main([str(d), "o.npz", "--fmllr-ubm", ubm_p])
        with pytest.raises(ValueError, match="requires --fmllr-ubm"):
            pipeline.main([str(d), "o.npz", "--fmllr-ark", "t.ark"])
        # dim mismatch: whisper80 features vs 13-dim UBM
        with pytest.raises(ValueError, match="UBM dim"):
            pipeline.main([str(d), "o.npz", "--preset", "whisper80",
                           "--fmllr-ubm", ubm_p, "--fmllr-ark", "t.ark"])
        # apply with a missing speaker entry
        from tpufeat import feats_io
        trans_p = str(tmp_path / "only_a.ark")
        feats_io.write_kaldi_ark(
            trans_p, {"spkA": np.concatenate(
                [np.eye(13), np.zeros((13, 1))], 1).astype(np.float32)})
        with pytest.raises(ValueError, match="no fMLLR transform"):
            pipeline.main([str(d), str(tmp_path / "o.npz"),
                           "--utt2spk", u2s, "--apply-fmllr", trans_p])
