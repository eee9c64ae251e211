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

    def test_native_falls_back_for_8bit(self, tmp_path):
        """The C++ decoder only handles 16-bit; read_wav must silently fall
        back to the Python path for other widths."""
        p = str(tmp_path / "e.wav")
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(16000)
            w.writeframes(bytes(range(100)))
        x, r = io.read_wav(p)  # native=None -> try native, fall back
        assert x.shape == (100,)


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
