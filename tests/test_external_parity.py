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
