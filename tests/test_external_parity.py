"""Third-party-oracle parity: tpufeat vs transformers / torch.

Round-1 parity evidence was self-referential (NumPy-f64 + C++ goldens, both
written in this repo).  These tests check the two workload configs that have
an independent, widely-deployed implementation baked into this environment:

- WHISPER80 vs ``transformers.WhisperFeatureExtractor`` (the de-facto
  reference for BASELINE.json:configs[1]'s "Whisper-style 80-bin log-mel"),
- the power-spectrogram stage (C5-C6) vs ``torch.stft`` in float64.

Neither library is a runtime dependency of tpufeat; tests skip if absent.
"""

import numpy as np
import pytest

import tpufeat
from tpufeat.config import MFCC13_HTK, WHISPER80

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def whisper_fe():
    # Default constructor == openai/whisper-* preprocessing (80 mel bins,
    # 16 kHz, n_fft 400, hop 160, Slaney mel, log10 + max-8 clamp, /4 scale).
    # No network: the extractor is pure computation, no weights.
    return transformers.WhisperFeatureExtractor()


def _whisper_ref(fe, sig: np.ndarray) -> np.ndarray:
    out = fe(sig, sampling_rate=16000, return_tensors="np",
             padding="max_length")
    return out.input_features[0].T  # [3000, 80]


def test_whisper80_matches_transformers_full_window(whisper_fe):
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal(16000 * 30) * 0.3).astype(np.float32)
    ref = _whisper_ref(whisper_fe, sig)
    res = tpufeat.extract(sig, cfg=WHISPER80)
    ours = np.asarray(res.features)
    assert ours.shape == ref.shape == (3000, 80)
    assert int(res.num_frames) == 3000
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_whisper128_matches_transformers_v3(whisper_fe):
    # Whisper large-v3: same pipeline, 128 mel bins
    from tpufeat.config import WHISPER128
    fe128 = transformers.WhisperFeatureExtractor(feature_size=128)
    rng = np.random.default_rng(3)
    sig = (rng.standard_normal(16000 * 5) * 0.3).astype(np.float32)
    ref = fe128(sig, sampling_rate=16000, return_tensors="np",
                padding="max_length").input_features[0].T
    padded = np.zeros(16000 * 30, np.float32)
    padded[: sig.size] = sig
    ours = np.asarray(tpufeat.extract(padded, cfg=WHISPER128).features)
    assert ours.shape == ref.shape == (3000, 128)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_whisper80_matches_transformers_padded_short_utterance(whisper_fe):
    # transformers zero-pads to 30 s and takes the normalization max over
    # ALL 3000 frames (padding included).  Reproduce that exact semantic by
    # feeding the same zero-padded signal as real audio.
    rng = np.random.default_rng(1)
    n = 16000 * 7 + 731  # ragged, non-hop-aligned length
    sig = (rng.standard_normal(n) * 0.3).astype(np.float32)
    ref = _whisper_ref(whisper_fe, sig)
    padded = np.pad(sig, (0, 16000 * 30 - n))
    ours = np.asarray(tpufeat.extract(padded, cfg=WHISPER80).features)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_whisper80_matches_transformers_tone(whisper_fe):
    # Deterministic harmonic signal (near-silent bins exercise the 1e-10
    # floor path, hence the looser tolerance -- see BASELINE.md near-floor
    # caveat; transformers computes in float32 too so the floor noise is
    # shared, keeping this far tighter than the pure-tone-vs-f64 case).
    t = np.arange(16000 * 30) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1333 * t)).astype(np.float32)
    ref = _whisper_ref(whisper_fe, sig)
    ours = np.asarray(tpufeat.extract(sig, cfg=WHISPER80).features)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_spectrogram_stage_matches_torch_stft():
    # C5-C6 oracle: float64 torch.stft with the identical analysis geometry
    # (snip-edges framing, Hamming-400 right-padded to the 512-pt FFT,
    # pre-emphasis applied up front).  torch frames in n_fft-sized windows,
    # so it yields one fewer frame at the tail; compare the common prefix.
    rng = np.random.default_rng(2)
    sig = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    spec = np.asarray(tpufeat.spectrogram(sig, cfg=MFCC13_HTK)[0])

    pre = np.concatenate([sig[:1], sig[1:] - 0.97 * sig[:-1]])
    w = torch.cat([torch.hamming_window(400, periodic=False,
                                        dtype=torch.float64),
                   torch.zeros(112, dtype=torch.float64)])
    st = torch.stft(torch.from_numpy(pre).double(), n_fft=512,
                    hop_length=160, win_length=512, window=w,
                    center=False, return_complex=True)
    ref = (st.abs() ** 2).numpy().T  # [F, 257]

    f = min(ref.shape[0], spec.shape[0])
    assert f >= 96
    rel = np.abs(ref[:f] - spec[:f]) / (np.abs(ref[:f]) + 1e-6)
    assert rel.max() < 1e-3


class TestCompatShim:
    """tpufeat.compat.WhisperFeatureExtractor — the drop-in HF surface —
    against the real transformers implementation."""

    def test_from_pretrained_local(self, tmp_path):
        import json
        from tpufeat.compat import WhisperFeatureExtractor
        cfgfile = {"feature_size": 128, "sampling_rate": 16000,
                   "hop_length": 160, "chunk_length": 30, "n_fft": 400,
                   "padding_value": 0.0,
                   "feature_extractor_type": "WhisperFeatureExtractor"}
        (tmp_path / "preprocessor_config.json").write_text(
            json.dumps(cfgfile))
        fe = WhisperFeatureExtractor.from_pretrained(str(tmp_path))
        assert fe.feature_size == 128 and fe.config.n_mels == 128
        fe2 = WhisperFeatureExtractor.from_pretrained(
            str(tmp_path / "preprocessor_config.json"), feature_size=80)
        assert fe2.feature_size == 80
        import pytest
        with pytest.raises(ValueError, match="local"):
            WhisperFeatureExtractor.from_pretrained("openai/whisper-tiny")

    def test_batch_matches_transformers(self, whisper_fe):
        from tpufeat.compat import WhisperFeatureExtractor
        rng = np.random.default_rng(9)
        utts = [(rng.standard_normal(n) * 0.3).astype(np.float32)
                for n in (16000 * 30, 16000 * 7 + 731, 913)]
        ref = whisper_fe(utts, sampling_rate=16000, return_tensors="np",
                         padding="max_length")
        fe = WhisperFeatureExtractor()
        got = fe(utts, sampling_rate=16000)
        assert got.input_features.shape == ref.input_features.shape \
            == (3, 80, 3000)
        np.testing.assert_allclose(got.input_features,
                                   ref.input_features, atol=5e-5)
        assert isinstance(got["input_features"], np.ndarray)
        # frame-mask parity on NON-hop-aligned lengths: transformers
        # strides a sample mask by hop => ceil(len/hop) ones (a review
        # caught this off-by-one vs the package's drop-last convention)
        ref_m = whisper_fe(utts, sampling_rate=16000, return_tensors="np",
                           padding="max_length",
                           return_attention_mask=True).attention_mask
        got_m = fe(utts, sampling_rate=16000,
                   return_attention_mask=True).attention_mask
        np.testing.assert_array_equal(got_m, ref_m)

    def test_truncation_and_mask(self, whisper_fe):
        from tpufeat.compat import WhisperFeatureExtractor
        rng = np.random.default_rng(10)
        long = (rng.standard_normal(16000 * 35) * 0.3).astype(np.float32)
        ref = whisper_fe([long], sampling_rate=16000, return_tensors="np",
                         padding="max_length")
        fe = WhisperFeatureExtractor()
        got = fe([long], return_attention_mask=True)
        np.testing.assert_allclose(got.input_features,
                                   ref.input_features, atol=5e-5)
        assert got.attention_mask.shape == (1, 3000)
        assert got.attention_mask.all()    # truncated-to-full utterance

    def test_unsupported_corners_raise(self):
        import pytest as _pytest
        from tpufeat.compat import WhisperFeatureExtractor
        fe = WhisperFeatureExtractor()
        x = np.zeros(100, np.float32)
        with _pytest.raises(ValueError, match="max_length"):
            fe(x, padding=False)
        with _pytest.raises(ValueError, match="resample"):
            fe(x, sampling_rate=8000)
        with _pytest.raises(TypeError, match="unsupported"):
            fe(x, return_token_timestamps=True)
        with _pytest.raises(ValueError, match="truncation"):
            fe(np.zeros(16000 * 31, np.float32), truncation=False)

    def test_jax_tensors(self):
        import jax.numpy as jnp
        from tpufeat.compat import WhisperFeatureExtractor
        fe = WhisperFeatureExtractor()
        got = fe(np.zeros(16000, np.float32), return_tensors="jax")
        assert isinstance(got.input_features, jnp.ndarray)
