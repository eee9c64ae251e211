"""HTK / Kaldi feature-file interchange tests (tpufeat/feats_io.py)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tpufeat import feats_io


@st.composite
def matrices_(draw):
    t = draw(st.integers(1, 200))
    d = draw(st.integers(1, 80))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    scale = draw(st.sampled_from([1e-6, 1.0, 1e6]))
    return (rng.standard_normal((t, d)) * scale).astype(np.float32)


class TestRoundTripProperties:
    @given(m=matrices_(), shift=st.sampled_from([0.010, 0.0125, 0.025]))
    @settings(max_examples=25, deadline=None)
    def test_htk_round_trip_any_shape(self, tmp_path_factory, m, shift):
        p = str(tmp_path_factory.mktemp("htk") / "u.htk")
        feats_io.write_htk(p, m, frame_shift_s=shift, kind=feats_io.HTK_USER)
        got, s, kind = feats_io.read_htk(p)
        np.testing.assert_array_equal(got, m)      # f32 -> BE f32 is exact
        assert s == pytest.approx(shift) and kind == feats_io.HTK_USER

    @given(m=matrices_())
    @settings(max_examples=25, deadline=None)
    def test_htk_compressed_round_trip_any_shape(self, tmp_path_factory, m):
        """_C quantization across shapes and extreme scales (1e-6..1e6):
        error bounded by half a quantization step per column."""
        p = str(tmp_path_factory.mktemp("htkc") / "u.htk")
        feats_io.write_htk(p, m, compress=True)
        got, _, kind = feats_io.read_htk(p)
        assert kind & feats_io.HTK_QUALIFIERS["C"]
        assert got.shape == m.shape
        rng_col = m.max(axis=0) - m.min(axis=0)
        budget = rng_col / 65534 + np.abs(m).max() * 1e-6 + 1e-12
        assert (np.abs(got - m) <= budget[None, :]).all()

    @given(ms=st.lists(matrices_(), min_size=1, max_size=4))
    @settings(max_examples=15, deadline=None)
    def test_ark_round_trip_any_shapes(self, tmp_path_factory, ms):
        utts = {f"u{i}": m for i, m in enumerate(ms)}
        p = str(tmp_path_factory.mktemp("ark") / "f.ark")
        feats_io.write_kaldi_ark(p, utts)
        got = feats_io.read_kaldi_ark(p)
        assert list(got) == list(utts)
        for k in utts:
            np.testing.assert_array_equal(got[k], utts[k])


@pytest.fixture
def feats(rng):
    return rng.standard_normal((37, 13)).astype(np.float32)


class TestHTK:
    def test_round_trip(self, tmp_path, feats):
        p = str(tmp_path / "utt.htk")
        kind = feats_io.parm_kind(feats_io.HTK_MFCC, "0")
        feats_io.write_htk(p, feats, frame_shift_s=0.010, kind=kind)
        got, shift, k = feats_io.read_htk(p)
        np.testing.assert_array_equal(got, feats)
        assert shift == pytest.approx(0.010)
        assert k == kind == 6 | 0o020000

    def test_header_layout_big_endian(self, tmp_path, feats):
        """The 12-byte header is exactly HTKBook §5.10: >iihh."""
        p = str(tmp_path / "utt.htk")
        feats_io.write_htk(p, feats, frame_shift_s=0.010,
                           kind=feats_io.HTK_FBANK)
        raw = open(p, "rb").read()
        t, period, samp_size, kind = struct.unpack(">iihh", raw[:12])
        assert (t, period, samp_size, kind) == (37, 100000, 52, 7)
        first = struct.unpack(">f", raw[12:16])[0]
        assert first == pytest.approx(float(feats[0, 0]))
        assert len(raw) == 12 + 37 * 52

    def test_qualifiers(self):
        k = feats_io.parm_kind(feats_io.HTK_MFCC, "0", "D", "A")
        assert k == 6 | 0o020000 | 0o000400 | 0o001000

    def test_rejects_bad_shapes(self, tmp_path):
        with pytest.raises(ValueError, match="T, D"):
            feats_io.write_htk(str(tmp_path / "x.htk"), np.zeros(5))
        bad = tmp_path / "bad.htk"
        bad.write_bytes(b"\x00" * 7)
        with pytest.raises(ValueError, match="truncated"):
            feats_io.read_htk(str(bad))

    def test_rejects_crc(self, tmp_path):
        """_K files carry a checksum this reader does not verify — must
        fail loudly."""
        p = tmp_path / "k.htk"
        kind = feats_io.parm_kind(feats_io.HTK_MFCC, "K")
        p.write_bytes(struct.pack(">iihh", 2, 100000, 80, kind)
                      + b"\x00" * 160)
        with pytest.raises(ValueError, match="CRC"):
            feats_io.read_htk(str(p))

    def test_rejects_malformed_compressed(self, tmp_path):
        p = tmp_path / "c.htk"
        kind = feats_io.parm_kind(feats_io.HTK_MFCC, "C")
        # nSamples < 4: no room for the A/B vectors
        p.write_bytes(struct.pack(">iihh", 2, 100000, 80, kind)
                      + b"\x00" * 160)
        with pytest.raises(ValueError, match="nSamples"):
            feats_io.read_htk(str(p))


class TestHTKCompressed:
    def test_round_trip_quantization_budget(self, tmp_path):
        """_C round trip: per-column error <= range/65534 (one int16
        quantization step / 2), header nSamples = T + 4, sampSize = 2D."""
        rng = np.random.default_rng(70)
        feats = (rng.standard_normal((57, 13)) * [10.0] * 12 + [100.0]
                 ).astype(np.float32)
        p = str(tmp_path / "c.htk")
        kind = feats_io.parm_kind(feats_io.HTK_MFCC, "0")
        feats_io.write_htk(p, feats, kind=kind, compress=True)
        with open(p, "rb") as f:
            t, period, samp, got_kind = struct.unpack(">iihh", f.read(12))
        assert t == 57 + 4 and samp == 2 * 13
        assert got_kind == (kind | feats_io.HTK_QUALIFIERS["C"])
        back, shift, k2 = feats_io.read_htk(p)
        assert back.shape == feats.shape and k2 == got_kind
        budget = (feats.max(0) - feats.min(0)) / 65534 + 1e-7
        assert (np.abs(back - feats) <= budget[None, :]).all()

    def test_constant_and_empty_columns(self, tmp_path):
        """Zero-range columns carry the value entirely in B; T=0 files
        round-trip."""
        feats = np.zeros((10, 3), np.float32)
        feats[:, 0] = 42.5
        feats[:, 2] = np.linspace(-1, 1, 10)
        p = str(tmp_path / "const.htk")
        feats_io.write_htk(p, feats, compress=True)
        back, _, _ = feats_io.read_htk(p)
        np.testing.assert_allclose(back[:, 0], 42.5, atol=1e-5)
        np.testing.assert_allclose(back[:, 1], 0.0, atol=1e-7)
        np.testing.assert_allclose(back[:, 2], feats[:, 2], atol=1e-4)
        p2 = str(tmp_path / "empty.htk")
        feats_io.write_htk(p2, np.zeros((0, 5), np.float32), compress=True)
        back2, _, _ = feats_io.read_htk(p2)
        assert back2.shape == (0, 5)

    def test_cli_htk_compress(self, tmp_path):
        from tpufeat import cli, io
        from conftest import make_signal
        wav = str(tmp_path / "u.wav")
        io.write_wav(wav, make_signal(8000, seed=71), 16000)
        full = str(tmp_path / "full.htk")
        comp = str(tmp_path / "comp.htk")
        cli.main([wav, full, "--preset", "mfcc13"])
        cli.main([wav, comp, "--preset", "mfcc13", "--htk-compress"])
        a, sa, ka = feats_io.read_htk(full)
        b, sb, kb = feats_io.read_htk(comp)
        assert kb == (ka | feats_io.HTK_QUALIFIERS["C"])
        assert sa == sb and a.shape == b.shape
        budget = (a.max(0) - a.min(0)) / 65534 + 1e-6
        assert (np.abs(a - b) <= budget[None, :]).all()
        import os
        assert os.path.getsize(comp) < os.path.getsize(full) * 0.6


class TestKaldiArk:
    def test_round_trip_with_scp(self, tmp_path, rng):
        utts = {"spk1_utt1": rng.standard_normal((11, 39)).astype(np.float32),
                "spk1_utt2": rng.standard_normal((7, 39)).astype(np.float32)}
        ark = str(tmp_path / "feats.ark")
        scp = str(tmp_path / "feats.scp")
        feats_io.write_kaldi_ark(ark, utts, scp_path=scp)
        got = feats_io.read_kaldi_ark(ark)
        assert list(got) == list(utts)
        for k in utts:
            np.testing.assert_array_equal(got[k], utts[k])
        lines = open(scp).read().splitlines()
        assert len(lines) == 2
        # each scp entry points at its record's binary marker
        for line, k in zip(lines, utts):
            key, rx = line.split()
            path, off = rx.rsplit(":", 1)
            assert key == k and path == ark
            with open(ark, "rb") as f:
                f.seek(int(off))
                assert f.read(5) == b"\0BFM "

    def test_binary_format_exact(self, tmp_path):
        f = np.arange(6, dtype=np.float32).reshape(2, 3)
        ark = str(tmp_path / "one.ark")
        feats_io.write_kaldi_ark(ark, {"u": f})
        raw = open(ark, "rb").read()
        want = (b"u \0BFM " + b"\x04" + struct.pack("<i", 2)
                + b"\x04" + struct.pack("<i", 3) + f.astype("<f4").tobytes())
        assert raw == want

    def test_rejects_bad_keys(self, tmp_path):
        with pytest.raises(ValueError, match="key"):
            feats_io.write_kaldi_ark(str(tmp_path / "x.ark"),
                                     {"bad key": np.zeros((1, 1),
                                                          np.float32)})

    def test_bad_input_never_truncates_existing_ark(self, tmp_path):
        ark = str(tmp_path / "keep.ark")
        good = {"u": np.zeros((2, 3), np.float32)}
        feats_io.write_kaldi_ark(ark, good)
        before = open(ark, "rb").read()
        with pytest.raises(ValueError):
            feats_io.write_kaldi_ark(ark, {"u": good["u"],
                                           "bad key": good["u"]})
        assert open(ark, "rb").read() == before   # validated before open

    def test_corrupt_dims_raise_cleanly(self, tmp_path):
        p = tmp_path / "corrupt.ark"
        p.write_bytes(b"u \0BFM " + b"\x04" + struct.pack("<i", 1 << 30)
                      + b"\x04" + struct.pack("<i", 1 << 30))
        with pytest.raises(ValueError, match="implausible"):
            feats_io.read_kaldi_ark(str(p))
        p.write_bytes(b"u \0BFM " + b"\x04" + b"\x01\x02")   # short dim
        with pytest.raises(ValueError, match="truncated dim"):
            feats_io.read_kaldi_ark(str(p))


class TestCLIFormats:
    def test_cli_htk_and_ark(self, tmp_path):
        from tpufeat import cli, io
        from conftest import make_signal
        sig = make_signal(8000, seed=70)
        wav = str(tmp_path / "a.wav")
        io.write_wav(wav, sig, 16000)
        htk = str(tmp_path / "out.htk")
        cli.main([wav, htk, "--preset", "mfcc13"])
        got, shift, kind = feats_io.read_htk(htk)
        assert got.shape == (48, 13) and shift == pytest.approx(0.010)
        assert kind == feats_io.parm_kind(feats_io.HTK_MFCC, "0")
        ark = str(tmp_path / "out.ark")
        cli.main([wav, ark, "--preset", "fbank80"])
        got = feats_io.read_kaldi_ark(ark)
        assert list(got) == ["a"] and got["a"].shape == (48, 80)
        assert (tmp_path / "out.scp").exists()

    def test_cli_htk_kaldi39_parmkind(self, tmp_path):
        """39-dim delta+CMVN output is labeled MFCC_0_D_A_Z, not bare
        MFCC_0 (HTK TARGETKIND compatibility)."""
        from tpufeat import cli, io
        from conftest import make_signal
        wav = str(tmp_path / "a.wav")
        io.write_wav(wav, make_signal(8000, seed=71), 16000)
        htk = str(tmp_path / "out39.htk")
        cli.main([wav, htk, "--preset", "kaldi39"])
        got, _, kind = feats_io.read_htk(htk)
        assert got.shape == (48, 39)
        assert kind == feats_io.parm_kind(feats_io.HTK_MFCC,
                                          "0", "D", "A", "Z")

    def test_cli_ark_duplicate_basenames(self, tmp_path):
        from tpufeat import cli, io
        from conftest import make_signal
        (tmp_path / "s1").mkdir(); (tmp_path / "s2").mkdir()
        w1, w2 = str(tmp_path / "s1" / "a.wav"), str(tmp_path / "s2" / "a.wav")
        io.write_wav(w1, make_signal(8000, seed=72), 16000)
        io.write_wav(w2, make_signal(8000, seed=73), 16000)
        ark = str(tmp_path / "dup.ark")
        cli.main([w1, w2, ark, "--preset", "mfcc13"])
        got = feats_io.read_kaldi_ark(ark)
        assert len(got) == 2                      # no silent collision


class TestHTKColumnOrder:
    """Round-3 advisor fix: HTK _0/_E files must store c0/energy LAST in
    each static/delta/accel block (HTKBook §5.10), while this package keeps
    them FIRST (Kaldi order)."""

    @given(m=matrices_(), nblocks=st.integers(1, 3))
    @settings(max_examples=25, deadline=None)
    def test_order_round_trip(self, m, nblocks):
        wide = np.concatenate([m + i for i in range(nblocks)], axis=-1)
        base = m.shape[-1]
        there = feats_io.to_htk_order(wide, base)
        np.testing.assert_array_equal(
            feats_io.from_htk_order(there, base), wide)

    def test_block_reorder_exact(self):
        f = np.arange(8, dtype=np.float32).reshape(2, 4)   # blocks of 2
        got = feats_io.to_htk_order(f, 2)
        np.testing.assert_array_equal(
            got, [[1, 0, 3, 2], [5, 4, 7, 6]])

    def test_bad_base_dim_rejected(self):
        with pytest.raises(ValueError):
            feats_io.to_htk_order(np.zeros((3, 10)), 4)
        with pytest.raises(ValueError):
            feats_io.from_htk_order(np.zeros((3, 10)), 0)

    def test_cli_htk_columns_match_parmkind(self, tmp_path):
        """The .htk file's columns honor the _0 qualifier: undoing the HTK
        order recovers exactly what the .npy path writes."""
        from tpufeat import cli, io
        from conftest import make_signal
        wav = str(tmp_path / "a.wav")
        io.write_wav(wav, make_signal(8000, seed=74), 16000)
        npy = str(tmp_path / "out.npy")
        htk = str(tmp_path / "out39.htk")
        cli.main([wav, npy, "--preset", "kaldi39"])
        cli.main([wav, htk, "--preset", "kaldi39"])
        got, _, kind = feats_io.read_htk(htk)
        assert kind == feats_io.parm_kind(feats_io.HTK_MFCC,
                                          "0", "D", "A", "Z")
        ref = np.load(npy)
        assert not np.array_equal(got, ref)        # really reordered
        np.testing.assert_array_equal(feats_io.from_htk_order(got, 13), ref)

    def test_cli_third_differential_qualifier(self, tmp_path):
        """delta_order=3 stamps _T (HTK third differential) and the
        52-column block order still round-trips."""
        from tpufeat import cli, io
        from conftest import make_signal
        wav = str(tmp_path / "a.wav")
        io.write_wav(wav, make_signal(8000, seed=76), 16000)
        npy = str(tmp_path / "o.npy")
        htk = str(tmp_path / "o.htk")
        cli.main([wav, npy, "--preset", "kaldi39", "--set", "delta_order=3"])
        cli.main([wav, htk, "--preset", "kaldi39", "--set", "delta_order=3"])
        got, _, kind = feats_io.read_htk(htk)
        assert kind == feats_io.parm_kind(feats_io.HTK_MFCC,
                                          "0", "D", "A", "T", "Z")
        assert got.shape[-1] == 52
        np.testing.assert_array_equal(feats_io.from_htk_order(got, 13),
                                      np.load(npy))

    def test_cli_fbank_qualifiers(self, tmp_path):
        """FBANK output with CMVN carries _Z (round-3 advisor fix: the
        FBANK branch used to drop all qualifiers) and is NOT reordered
        (no c0 concept without a DCT)."""
        from tpufeat import cli, io
        from conftest import make_signal
        wav = str(tmp_path / "a.wav")
        io.write_wav(wav, make_signal(8000, seed=75), 16000)
        npy = str(tmp_path / "fb.npy")
        htk = str(tmp_path / "fb.htk")
        cli.main([wav, npy, "--preset", "fbank80", "--set", "cmvn=mean"])
        cli.main([wav, htk, "--preset", "fbank80", "--set", "cmvn=mean"])
        got, _, kind = feats_io.read_htk(htk)
        assert kind == feats_io.parm_kind(feats_io.HTK_FBANK, "Z")
        np.testing.assert_array_equal(got, np.load(npy))


class TestArkKeyHygiene:
    def test_read_rejects_duplicate_ids(self, tmp_path):
        """Round-3 advisor fix: a malformed archive with a repeated
        utterance id must raise, not silently drop the first matrix."""
        a1 = str(tmp_path / "one.ark")
        a2 = str(tmp_path / "two.ark")
        m = np.ones((3, 4), np.float32)
        feats_io.write_kaldi_ark(a1, {"u": m})
        feats_io.write_kaldi_ark(a2, {"u": 2 * m})
        cat = str(tmp_path / "cat.ark")
        with open(cat, "wb") as f:
            for p in (a1, a2):
                f.write(open(p, "rb").read())
        with pytest.raises(ValueError, match="duplicate"):
            feats_io.read_kaldi_ark(cat)

    def test_cli_triple_collision(self, tmp_path):
        """Round-3 advisor fix: a.wav + a.2.wav + a third a.wav — the
        single-rename fallback would collide again; the loop must keep all
        three utterances."""
        from tpufeat import cli, io
        from conftest import make_signal
        (tmp_path / "s1").mkdir(); (tmp_path / "s2").mkdir()
        w0 = str(tmp_path / "a.wav")
        w1 = str(tmp_path / "s1" / "a.2.wav")
        w2 = str(tmp_path / "s2" / "a.wav")
        for i, w in enumerate((w0, w1, w2)):
            io.write_wav(w, make_signal(8000, seed=80 + i), 16000)
        ark = str(tmp_path / "tri.ark")
        cli.main([w0, w1, w2, ark, "--preset", "mfcc13"])
        got = feats_io.read_kaldi_ark(ark)
        assert len(got) == 3


class TestKaldiScp:
    def test_scp_random_access(self, tmp_path):
        rng = np.random.default_rng(80)
        utts = {f"utt{i}": rng.standard_normal((10 + i, 4)).astype(
            np.float32) for i in range(5)}
        ark = str(tmp_path / "f.ark")
        scp = str(tmp_path / "f.scp")
        feats_io.write_kaldi_ark(ark, utts, scp_path=scp)
        index = feats_io.read_kaldi_scp(scp)
        assert list(index) == list(utts)
        # random access in arbitrary order, no sequential scan
        for key in ["utt3", "utt0", "utt4"]:
            path, off = index[key]
            got = feats_io.read_kaldi_matrix(path, off, key)
            np.testing.assert_array_equal(got, utts[key])

    def test_scp_malformed_lines(self, tmp_path):
        p = tmp_path / "bad.scp"
        p.write_text("utt1 f.ark:12\nutt2 no_offset_here\n")
        with pytest.raises(ValueError, match="bad.scp:2"):
            feats_io.read_kaldi_scp(str(p))
        p.write_text("utt1 f.ark:12\nutt1 f.ark:40\n")
        with pytest.raises(ValueError, match="duplicate"):
            feats_io.read_kaldi_scp(str(p))

    def test_scp_path_with_colon_dirs(self, tmp_path):
        """ark paths may contain ':' (rsplit, not split)."""
        d = tmp_path / "od:d"
        d.mkdir()
        ark = str(d / "f.ark")
        scp = str(tmp_path / "f.scp")
        utts = {"u": np.ones((2, 3), np.float32)}
        feats_io.write_kaldi_ark(ark, utts, scp_path=scp)
        index = feats_io.read_kaldi_scp(scp)
        path, off = index["u"]
        assert path == ark
        np.testing.assert_array_equal(
            feats_io.read_kaldi_matrix(path, off), utts["u"])


class TestKaldiDoubleMatrix:
    """DM archives — what compute-cmvn-stats writes for CMVN stats."""

    def test_round_trip_bit_exact(self, tmp_path):
        rng = np.random.default_rng(7)
        utts = {"spk1": rng.standard_normal((2, 14)),
                "spk2": rng.standard_normal((2, 14)) * 1e9}
        ark = str(tmp_path / "cmvn.ark")
        feats_io.write_kaldi_ark(ark, utts, dtype="f64")
        back = feats_io.read_kaldi_ark(ark)
        for k in utts:
            assert back[k].dtype == np.float64
            np.testing.assert_array_equal(back[k], utts[k])

    def test_binary_format_exact(self, tmp_path):
        ark = str(tmp_path / "one.ark")
        m = np.array([[1.5, -2.0]], np.float64)
        feats_io.write_kaldi_ark(ark, {"u": m}, dtype="f64")
        raw = open(ark, "rb").read()
        expect = (b"u \0BDM " + b"\x04" + struct.pack("<i", 1)
                  + b"\x04" + struct.pack("<i", 2)
                  + m.astype("<f8").tobytes())
        assert raw == expect

    def test_scp_random_access_dm(self, tmp_path):
        ark = str(tmp_path / "c.ark")
        scp = str(tmp_path / "c.scp")
        utts = {"a": np.full((2, 3), 0.5), "b": np.full((2, 5), -4.0)}
        feats_io.write_kaldi_ark(ark, utts, scp_path=scp, dtype="f64")
        index = feats_io.read_kaldi_scp(scp)
        got = feats_io.read_kaldi_matrix(*index["b"])
        assert got.dtype == np.float64
        np.testing.assert_array_equal(got, utts["b"])

    def test_bad_dtype_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="dtype"):
            feats_io.write_kaldi_ark(str(tmp_path / "x.ark"),
                                     {"u": np.ones((1, 1))}, dtype="f16")


class TestKaldiVectorArk:
    """Kaldi binary VECTOR archives (FV/DV — ivector-extract /
    compute-vad output format)."""

    def test_roundtrip_f32_f64(self, tmp_path):
        rng = np.random.default_rng(0)
        utts = {"a": rng.standard_normal(7).astype(np.float32),
                "b": rng.standard_normal(100).astype(np.float32),
                "c": np.zeros(1, np.float32)}
        for dt, npdt in (("f32", np.float32), ("f64", np.float64)):
            ark = str(tmp_path / f"v_{dt}.ark")
            scp = str(tmp_path / f"v_{dt}.scp")
            feats_io.write_kaldi_vec_ark(ark, utts, scp, dtype=dt)
            back = feats_io.read_kaldi_vec_ark(ark)
            assert list(back) == list(utts)
            for k in utts:
                assert back[k].dtype == npdt
                np.testing.assert_allclose(back[k],
                                           utts[k].astype(npdt), rtol=0)
            for k, (path, off) in feats_io.read_kaldi_scp(scp).items():
                np.testing.assert_array_equal(
                    feats_io.read_kaldi_vector(path, off, k), back[k])

    def test_writer_validation(self, tmp_path):
        ark = str(tmp_path / "v.ark")
        with pytest.raises(ValueError, match="key"):
            feats_io.write_kaldi_vec_ark(ark, {"a b": np.zeros(3)})
        with pytest.raises(ValueError, match=r"\[D\]"):
            feats_io.write_kaldi_vec_ark(ark, {"a": np.zeros((2, 3))})
        with pytest.raises(ValueError, match="dtype"):
            feats_io.write_kaldi_vec_ark(ark, {"a": np.zeros(3)},
                                         dtype="f16")

    def test_reader_rejects_matrix_archive(self, tmp_path):
        ark = str(tmp_path / "m.ark")
        feats_io.write_kaldi_ark(ark, {"a": np.zeros((2, 3), np.float32)})
        with pytest.raises(ValueError, match="vector"):
            feats_io.read_kaldi_vec_ark(ark)

    def test_reader_rejects_truncation_and_dupes(self, tmp_path):
        ark = str(tmp_path / "v.ark")
        feats_io.write_kaldi_vec_ark(ark, {"a": np.arange(5.0)})
        raw = open(ark, "rb").read()
        trunc = str(tmp_path / "t.ark")
        open(trunc, "wb").write(raw[:-3])
        with pytest.raises(ValueError, match="truncated"):
            feats_io.read_kaldi_vec_ark(trunc)
        dupe = str(tmp_path / "d.ark")
        open(dupe, "wb").write(raw + raw)
        with pytest.raises(ValueError, match="duplicate"):
            feats_io.read_kaldi_vec_ark(dupe)
