"""ctypes bindings for the native C++ golden (cpp_ref/, SURVEY.md §2 C10).

Builds ``libtpufeat_ref.so`` lazily with ``make`` on first use (g++ is in
the image; no pybind11, so plain C ABI + ctypes). Gives the rebuild the same
native-for-native validation story as the reference's serial C++ oracle, and
a native WAV decode path (C1)."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

from tpufeat.config import FeatureConfig

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "cpp_ref")
_SO = os.path.join(_DIR, "libtpufeat_ref.so")


@functools.lru_cache(maxsize=1)
def _lib():
    # rebuild when the .so is missing or older than the source; deployments
    # shipping a prebuilt .so without a toolchain never touch make
    src = os.path.join(_DIR, "mfcc.cc")
    stale = not os.path.exists(_SO) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_SO))
    if stale:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.tpufeat_gammatone_fb_f64.restype = None
    lib.tpufeat_gammatone_fb_f64.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_mfcc_f64.restype = ctypes.c_long
    lib.tpufeat_mfcc_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_fbank_f64.restype = ctypes.c_long
    lib.tpufeat_fbank_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_spec_f64.restype = ctypes.c_long
    lib.tpufeat_spec_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_plp_f64.restype = ctypes.c_long
    lib.tpufeat_plp_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_num_frames.restype = ctypes.c_long
    lib.tpufeat_num_frames.argtypes = [ctypes.c_long, ctypes.c_int,
                                       ctypes.c_int]
    lib.tpufeat_pitch_num_frames.restype = ctypes.c_long
    lib.tpufeat_pitch_num_frames.argtypes = [
        ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.tpufeat_pitch_f64.restype = ctypes.c_long
    lib.tpufeat_pitch_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_resample_len.restype = ctypes.c_long
    lib.tpufeat_resample_len.argtypes = [ctypes.c_long, ctypes.c_int,
                                         ctypes.c_int]
    lib.tpufeat_resample_poly_f64.restype = ctypes.c_long
    lib.tpufeat_resample_poly_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_sliding_cmvn_f64.restype = None
    lib.tpufeat_sliding_cmvn_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_online_cmvn_f64.restype = None
    lib.tpufeat_online_cmvn_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.tpufeat_read_wav.restype = ctypes.c_long
    lib.tpufeat_read_wav.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_int)]
    lib.tpufeat_read_wav_batch.restype = ctypes.c_long
    lib.tpufeat_read_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    return lib


def available() -> bool:
    """True when the shared library is built (or buildable)."""
    try:
        _lib()
        return True
    except Exception:
        return False


def mfcc_native(signal: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Run the C++ double-precision MFCC pipeline. Classic (config-1 style)
    semantics only: center=False, Hamming, HTK bin-style mel, natural log."""
    if cfg.center or cfg.window != "hamming" or cfg.mel_scale != "htk" \
            or cfg.mel_bin_style != "bin" or cfg.log != "natural" \
            or cfg.kaldi_mode or cfg.n_mfcc <= 0 \
            or cfg.mel_norm is not None or cfg.spectrum != "power":
        raise ValueError("C++ golden covers the classic MFCC configuration")
    lib = _lib()
    x = np.ascontiguousarray(signal, dtype=np.float64)
    nf = lib.tpufeat_num_frames(len(x), cfg.frame_length, cfg.hop_length)
    out = np.zeros((max(nf, 0), cfg.n_mfcc), dtype=np.float64)
    if nf > 0:
        got = lib.tpufeat_mfcc_f64(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
            cfg.sample_rate, cfg.frame_length, cfg.hop_length, cfg.n_fft,
            cfg.preemphasis, cfg.n_mels, cfg.n_mfcc, cfg.fmin, cfg.fmax_hz,
            cfg.log_floor, cfg.lifter, cfg.vtln_warp, cfg.vtln_low,
            cfg.vtln_high,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert got == nf
    return out


def fbank_native(signal: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Run the C++ double-precision log-mel filterbank pipeline (classic
    framing semantics, like :func:`mfcc_native`; ``use_energy`` prepends
    the log frame energy, Kaldi compute-fbank-feats --use-energy): the
    third independent implementation vs the JAX path and
    reference/cpu.py."""
    if cfg.center or cfg.window != "hamming" or cfg.mel_scale != "htk" \
            or cfg.mel_bin_style != "bin" or cfg.log != "natural" \
            or cfg.kaldi_mode or cfg.n_mfcc != 0 or cfg.n_mels <= 0 \
            or cfg.mel_norm is not None or cfg.spectrum != "power" \
            or cfg.plp_order != 0:
        raise ValueError("C++ golden covers the classic filterbank "
                         "configuration (n_mfcc=0, Hamming, HTK bin mel, "
                         "natural log)")
    lib = _lib()
    x = np.ascontiguousarray(signal, dtype=np.float64)
    nf = lib.tpufeat_num_frames(len(x), cfg.frame_length, cfg.hop_length)
    dim = cfg.n_mels + (1 if cfg.use_energy else 0)
    out = np.zeros((max(nf, 0), dim), dtype=np.float64)
    if nf > 0:
        got = lib.tpufeat_fbank_f64(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
            cfg.sample_rate, cfg.frame_length, cfg.hop_length, cfg.n_fft,
            cfg.preemphasis, cfg.n_mels, cfg.fmin, cfg.fmax_hz,
            cfg.log_floor, int(cfg.use_energy), cfg.vtln_warp,
            cfg.vtln_low, cfg.vtln_high,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert got == nf
    return out


def spec_native(signal: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Run the C++ double-precision spectrogram-features pipeline (classic
    framing semantics, like :func:`mfcc_native`): the third independent
    implementation of the compute-spectrogram-feats analogue (vs the JAX
    path and reference/cpu.py)."""
    if cfg.center or cfg.window != "hamming" or cfg.log != "natural" \
            or cfg.kaldi_mode or cfg.n_mels != 0 \
            or cfg.spectrum != "power":
        raise ValueError("C++ golden covers the classic spectrogram "
                         "configuration (n_mels=0, Hamming, natural log)")
    lib = _lib()
    x = np.ascontiguousarray(signal, dtype=np.float64)
    nf = lib.tpufeat_num_frames(len(x), cfg.frame_length, cfg.hop_length)
    out = np.zeros((max(nf, 0), cfg.n_bins), dtype=np.float64)
    if nf > 0:
        got = lib.tpufeat_spec_f64(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
            cfg.frame_length, cfg.hop_length, cfg.n_fft, cfg.preemphasis,
            cfg.log_floor, int(cfg.use_energy),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert got == nf
    return out


def plp_native(signal: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Run the C++ double-precision PLP pipeline (classic framing
    semantics, like :func:`mfcc_native`): the third independent
    implementation of the PLP chain (vs tpufeat/plp.py's f32 unrolled
    recursions and reference/cpu.py's ifft + Toeplitz solves)."""
    if cfg.center or cfg.window != "hamming" or cfg.mel_scale != "htk" \
            or cfg.mel_bin_style != "bin" or cfg.kaldi_mode \
            or cfg.mel_norm is not None or cfg.spectrum != "power" \
            or cfg.plp_order <= 0 or cfg.vtln_warp != 1.0:
        raise ValueError("C++ golden covers the classic PLP configuration")
    lib = _lib()
    x = np.ascontiguousarray(signal, dtype=np.float64)
    nf = lib.tpufeat_num_frames(len(x), cfg.frame_length, cfg.hop_length)
    out = np.zeros((max(nf, 0), cfg.plp_order + 1), dtype=np.float64)
    if nf > 0:
        got = lib.tpufeat_plp_f64(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
            cfg.sample_rate, cfg.frame_length, cfg.hop_length, cfg.n_fft,
            cfg.preemphasis, cfg.n_mels, cfg.plp_order, cfg.fmin,
            cfg.fmax_hz, cfg.log_floor, cfg.plp_compress, cfg.lifter,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert got == nf
    return out


def resample_native(signal: np.ndarray, p: int, q: int) -> np.ndarray:
    """C++ double polyphase resampler (scipy resample_poly's default
    Kaiser-5 windowed-sinc design, direct upfirdn sum) — the third
    independent implementation beside tpufeat/resampling.py's MXU
    matmul and scipy itself."""
    lib = _lib()
    x = np.ascontiguousarray(signal, dtype=np.float64)
    n_out = lib.tpufeat_resample_len(len(x), int(p), int(q))
    out = np.zeros(max(n_out, 0), dtype=np.float64)
    if n_out > 0:
        got = lib.tpufeat_resample_poly_f64(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
            int(p), int(q),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert got == n_out
    return out


def pitch_native(signal: np.ndarray, cfg) -> tuple[np.ndarray, np.ndarray]:
    """Run the C++ double-precision pitch tracker (NCCF + Viterbi) ->
    (hz [F], pov [F]). ``cfg`` is a tpufeat.pitch.PitchConfig; the third
    independent implementation (vs tpufeat/pitch.py's f32 GEMM NCCF and
    reference/cpu.py's NumPy loops). Resampled lag grids run the C++
    polyphase decimator first (:func:`resample_native`)."""
    lib = _lib()
    x = np.ascontiguousarray(signal, dtype=np.float64)
    if getattr(cfg, "resampled", False):
        import math
        g = math.gcd(cfg.sample_rate, cfg.lag_rate)
        x = resample_native(x, cfg.lag_rate // g, cfg.sample_rate // g)
        cfg = cfg.inner()
    nf = lib.tpufeat_pitch_num_frames(len(x), cfg.frame_length,
                                      cfg.hop_length, cfg.lag_max,
                                      int(cfg.center))
    hz = np.zeros(max(nf, 0), dtype=np.float64)
    pov = np.zeros(max(nf, 0), dtype=np.float64)
    if nf > 0:
        got = lib.tpufeat_pitch_f64(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
            cfg.sample_rate, cfg.frame_length, cfg.hop_length,
            cfg.lag_min, cfg.lag_max, cfg.penalty, cfg.ballast,
            cfg.lag_bias, int(cfg.center), int(getattr(cfg, "refine", 0)),
            hz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pov.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        assert got == nf
    return hz, pov


def sliding_cmvn_native(feat: np.ndarray, window: int = 600,
                        min_window: int = 100, center: bool = False,
                        norm_vars: bool = False) -> np.ndarray:
    """C++ double sliding-window CMVN — the third independent
    implementation (three-way parity with reference/cpu.py and the JAX
    op, tests/test_cpp_golden.py)."""
    lib = _lib()
    f = np.ascontiguousarray(feat, dtype=np.float64)
    if f.ndim != 2:
        raise ValueError(f"want [T, D], got shape {f.shape}")
    out = np.zeros_like(f)
    if f.shape[0]:
        lib.tpufeat_sliding_cmvn_f64(
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            f.shape[0], f.shape[1], window, min_window, int(center),
            int(norm_vars),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def online_cmvn_native(feat: np.ndarray, window: int = 600,
                       speaker_stats=None, global_stats=None,
                       speaker_frames: int = 600, global_frames: int = 200,
                       norm_vars: bool = False) -> np.ndarray:
    """C++ double Kaldi-online2 OnlineCmvn — the third independent
    implementation (three-way parity with reference/cpu.py::online_cmvn
    and features.online_cmvn). Priors are ``(count, sum, sumsq)`` triples
    or :class:`tpufeat.data.CmvnStats`; None for no prior."""
    lib = _lib()
    f = np.ascontiguousarray(feat, dtype=np.float64)
    if f.ndim != 2:
        raise ValueError(f"want [T, D], got shape {f.shape}")

    def unpack(st):
        if st is None:
            return 0.0, None, None
        if isinstance(st, (tuple, list)):  # tuples HAVE a .count method
            c, s, s2 = float(st[0]), st[1], st[2]
        else:
            c, s, s2 = float(st.count), st.sum, st.sumsq
        s = np.ascontiguousarray(s, dtype=np.float64)
        s2 = np.ascontiguousarray(s2, dtype=np.float64)
        if s.shape != (f.shape[1],) or s2.shape != (f.shape[1],):
            raise ValueError("prior stats dim mismatch")
        return c, s, s2

    def ptr(a):
        return (a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
                if a is not None else None)

    cs, ssum, ssq = unpack(speaker_stats)
    cg, gsum, gsq = unpack(global_stats)
    out = np.zeros_like(f)
    if f.shape[0]:
        lib.tpufeat_online_cmvn_f64(
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            f.shape[0], f.shape[1], window,
            cs, ptr(ssum), ptr(ssq), cg, ptr(gsum), ptr(gsq),
            speaker_frames, global_frames, int(norm_vars),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def read_wav_native(path: str) -> tuple[np.ndarray, int]:
    """Decode a WAV with the C++ RIFF parser -> (float32 mono, rate).

    Formats: PCM 8/16/24/32-bit, IEEE float 32/64-bit (incl. extensible
    headers); anything else raises instead of decoding garbage."""
    lib = _lib()
    rate = ctypes.c_int(0)
    n = lib.tpufeat_read_wav(path.encode(), None, 0, ctypes.byref(rate))
    if n == -2:
        raise ValueError(f"unsupported WAVE format (supported: PCM "
                         f"8/16/24/32-bit, IEEE float 32/64-bit): {path}")
    if n < 0:
        raise ValueError(f"not a readable WAV: {path}")
    out = np.zeros(n, dtype=np.float32)
    got = lib.tpufeat_read_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(rate))
    if got != n:
        raise IOError(f"short read decoding {path}")
    return out, rate.value


def read_wav_batch(paths: list[str], max_samples: int,
                   n_threads: int = 0) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode many WAVs concurrently with the native thread-pool loader.

    Returns (batch [B, max_samples] float32 zero-padded, lengths [B] int64
    with -1 for failed/oversized files, rates [B] int32). The arena layout
    feeds tpufeat.extract directly — the native host loader keeps a
    >10,000x real-time chip fed without Python in the decode loop."""
    lib = _lib()
    b = len(paths)
    arena = np.zeros((b, max_samples), dtype=np.float32)
    lengths = np.zeros(b, dtype=np.int64)
    rates = np.zeros(b, dtype=np.int32)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    lib.tpufeat_read_wav_batch(
        arr, b, arena.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return arena, lengths, rates


def gammatone_fb_native(sample_rate: int, n_fft: int, n_out: int,
                        fmin: float, fmax: float) -> np.ndarray:
    """C++ double gammatone/ERB |H|^2 filterbank (third independent
    implementation of the GFCC stage math) -> [n_fft//2+1, n_out]."""
    lib = _lib()
    n_bins = n_fft // 2 + 1
    out = np.zeros((n_bins, n_out), np.float64)
    lib.tpufeat_gammatone_fb_f64(
        int(sample_rate), int(n_fft), int(n_out), float(fmin),
        float(fmax), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
