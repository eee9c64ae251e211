"""WAV (RIFF) audio I/O — reference C1 (SURVEY.md §2).

The reference parses RIFF headers and 16-bit PCM in C. Here the default
decoder is stdlib ``wave`` + NumPy (librosa/soundfile are not in the
environment); a native C++ decoder with the same semantics lives in
``cpp_ref/`` and is used automatically when its shared library has been
built (``tpufeat.cpp_golden.read_wav_native``).
"""

from __future__ import annotations

import wave

import numpy as np

__all__ = ["read_wav", "write_wav"]

_INT16_SCALE = 1.0 / 32768.0


def read_wav(path: str, *, native: bool | None = None) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples in [-1, 1), sample_rate).

    Supports 16-bit PCM (the reference's format) plus 8/32-bit PCM and
    32-bit float for convenience. Multi-channel audio is averaged to mono
    (the reference is mono-only). ``native=True`` forces the C++ decoder,
    ``native=False`` forces Python, ``None`` prefers native when built.
    """
    if native is not False:
        try:
            from tpufeat import cpp_golden
            if cpp_golden.available():
                return cpp_golden.read_wav_native(path)
        except Exception:
            if native:
                raise
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) * _INT16_SCALE
    elif sampwidth == 1:  # unsigned 8-bit
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 4:
        # WAVE_FORMAT_IEEE_FLOAT is not distinguishable via stdlib wave;
        # PCM 32-bit is the common case here.
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, rate


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write mono float samples in [-1, 1] as 16-bit PCM."""
    samples = np.asarray(samples, dtype=np.float64)
    pcm = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
