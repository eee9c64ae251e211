"""WAV I/O edge cases (reference C1) and API edge paths."""

import wave

import numpy as np
import pytest

from tpufeat import features, io
from tpufeat.config import MFCC13_HTK

from conftest import make_signal


class TestWavFormats:
    def test_roundtrip_16bit(self, tmp_path):
        sig = make_signal(5000, seed=160)
        p = str(tmp_path / "a.wav")
        io.write_wav(p, sig, 16000)
        x, r = io.read_wav(p, native=False)
        assert r == 16000
        assert np.abs(x - sig).max() < 1.0 / 32768 + 1e-7

    def test_8bit_pcm(self, tmp_path):
        p = str(tmp_path / "b.wav")
        data = (np.arange(256) % 256).astype(np.uint8)
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        x, r = io.read_wav(p, native=False)
        assert x.shape == (256,)
        assert x.min() >= -1.0 and x.max() <= 1.0
        assert x[128] == 0.0  # unsigned midpoint -> 0

    def test_32bit_pcm(self, tmp_path):
        p = str(tmp_path / "c.wav")
        vals = np.array([0, 2**30, -(2**30)], dtype="<i4")
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(4)
            w.setframerate(16000)
            w.writeframes(vals.tobytes())
        x, _ = io.read_wav(p, native=False)
        np.testing.assert_allclose(x, [0.0, 0.5, -0.5], atol=1e-7)

    def test_write_clips(self, tmp_path):
        p = str(tmp_path / "d.wav")
        io.write_wav(p, np.array([2.0, -2.0, 0.5]), 16000)
        x, _ = io.read_wav(p, native=False)
        assert x[0] == pytest.approx(32767 / 32768, abs=1e-6)
        assert x[1] == pytest.approx(-1.0, abs=1e-6)

    def test_native_decodes_8bit(self, tmp_path):
        p = str(tmp_path / "e.wav")
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(16000)
            w.writeframes(bytes(range(100)))
        x, r = io.read_wav(p)  # native preferred when built
        assert x.shape == (100,)

    @pytest.mark.parametrize("encoding,tol", [
        ("pcm8", 1 / 128), ("pcm16", 1 / 32768), ("pcm24", 1 / 8388608),
        ("pcm32", 1e-7), ("float32", 1e-7), ("float64", 1e-7),
    ])
    @pytest.mark.parametrize("native", [False, True])
    def test_roundtrip_all_formats(self, tmp_path, encoding, tol, native):
        """VERDICT item 8: every width through BOTH decoders — a float32
        WAV must decode as float, not garbage int32."""
        if native:
            from tpufeat import cpp_golden
            if not cpp_golden.available():
                pytest.skip("C++ golden not buildable here")
        sig = make_signal(3000, seed=164)
        p = str(tmp_path / f"{encoding}.wav")
        io.write_wav(p, sig, 16000, encoding=encoding)
        x, r = io.read_wav(p, native=native)
        assert r == 16000 and x.dtype == np.float32
        assert np.abs(x - sig).max() < tol + 1e-6

    @pytest.mark.parametrize("native", [False, True])
    def test_unknown_format_rejected_loudly(self, tmp_path, native):
        if native:
            from tpufeat import cpp_golden
            if not cpp_golden.available():
                pytest.skip("C++ golden not buildable here")
        import struct
        p = str(tmp_path / "alaw.wav")
        payload = bytes(200)
        hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload),
                          b"WAVE", b"fmt ", 16, 6, 1, 16000, 16000, 1, 8,
                          b"data", len(payload))    # format 6 = A-law
        with open(p, "wb") as f:
            f.write(hdr + payload)
        with pytest.raises(ValueError, match="[Uu]nsupported"):
            io.read_wav(p, native=native)

    def test_extensible_header(self, tmp_path):
        """WAVE_FORMAT_EXTENSIBLE wrapping PCM-16 decodes via the GUID tag."""
        import struct
        sig = make_signal(1000, seed=165)
        pcm = np.clip(np.round(sig * 32768), -32768, 32767).astype("<i2")
        payload = pcm.tobytes()
        # fmt body: standard 16 bytes + cbSize(22) + validBits/mask +
        # SubFormat GUID whose first 2 bytes are the real tag (PCM = 1)
        fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
               + struct.pack("<HHI", 22, 16, 0x4)
               + struct.pack("<H", 1) + bytes(14))
        hdr = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(payload)))
        p = str(tmp_path / "ext.wav")
        with open(p, "wb") as f:
            f.write(hdr + payload)
        for native in (False, True):
            x, r = io.read_wav(p, native=native)
            assert r == 16000
            assert np.abs(x - sig).max() < 1 / 32768 + 1e-6


    def test_stereo_downmix_and_channel_select(self, tmp_path):
        """Multi-channel: default averages to mono; channel=k selects
        (telephony stereo keeps one speaker per channel)."""
        import wave as wavemod
        left = make_signal(1200, seed=166)
        right = make_signal(1200, seed=167)
        pcm = np.clip(np.round(
            np.stack([left, right], 1) * 32768), -32768, 32767).astype("<i2")
        p = str(tmp_path / "st.wav")
        w = wavemod.open(p, "wb")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.ravel().tobytes())
        w.close()
        q = 1 / 32768 + 1e-6
        mix, r = io.read_wav(p)
        assert r == 16000
        assert np.abs(mix - (left + right) / 2).max() < q
        ch0, _ = io.read_wav(p, channel=0)
        ch1, _ = io.read_wav(p, channel=1)
        assert np.abs(ch0 - left).max() < q
        assert np.abs(ch1 - right).max() < q
        import pytest
        with pytest.raises(ValueError, match="channel 2 out of range"):
            io.read_wav(p, channel=2)


class TestAPIEdges:
    def test_int16_input_scaled(self):
        sig = make_signal(4000, seed=161)
        pcm = np.clip(np.round(sig * 32768), -32768, 32767).astype(np.int16)
        a = features.extract(pcm, cfg=MFCC13_HTK)
        b = features.extract(pcm.astype(np.float32) / 32768.0,
                             cfg=MFCC13_HTK)
        np.testing.assert_array_equal(np.asarray(a.features),
                                      np.asarray(b.features))

    def test_eager_matches_jit(self):
        sig = make_signal(3000, seed=162)
        a = features.extract(sig, cfg=MFCC13_HTK, jit=False)
        b = features.extract(sig, cfg=MFCC13_HTK, jit=True)
        assert np.abs(np.asarray(a.features)
                      - np.asarray(b.features)).max() < 1e-5

    def test_make_extractor_cached_and_donating(self):
        import warnings
        import jax.numpy as jnp
        fn1 = features.make_extractor(MFCC13_HTK)
        fn2 = features.make_extractor(MFCC13_HTK)
        assert fn1 is fn2  # lru-cached
        fn_d = features.make_extractor(MFCC13_HTK, donate=True)
        x = jnp.asarray(make_signal(4000, seed=163))[None]
        l = jnp.array([4000], jnp.int32)
        with warnings.catch_warnings():
            # CPU backend cannot honor buffer donation; harmless here
            warnings.simplefilter("ignore", UserWarning)
            res = fn_d(x, l)
        assert res.features.shape == (1, 23, 13)
