"""tpufeat — TPU-native ASR feature extraction (JAX/XLA/Pallas).

A brand-new rebuild of the capabilities of the OpenCL ASR front-end
reference (mankeyboy/ASR-FeatExt-OpenCL): WAV in -> pre-emphasis, overlapped
framing, windowing, FFT, power spectrum, mel filterbank, log, DCT-II MFCCs
out — designed TPU-first per SURVEY.md. Public API:

    from tpufeat import extract, read_wav, MFCC13_HTK, WHISPER80
    samples, rate = read_wav("utt.wav")
    feats = extract(samples, cfg=WHISPER80).features
"""

import os as _os


def enable_compile_cache(path: str) -> None:
    """Wire jax's persistent compilation cache at ``path`` (zero size/time
    thresholds): compiled executables serialize to disk — measured THROUGH
    the axon relay too — collapsing cross-process recompiles to reads
    (cold corpus 577->104 s, diarize_long 561->69 s; BASELINE.md round 5,
    DEPLOY.md "Cold starts"). Call before the first compilation; the
    ``TPUFEAT_COMPILE_CACHE`` env var does this automatically at import,
    and the pipeline/diarization CLIs expose ``--compile-cache``."""
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


if _os.environ.get("TPUFEAT_COMPILE_CACHE"):
    enable_compile_cache(_os.environ["TPUFEAT_COMPILE_CACHE"])

from tpufeat.augment import (DEFAULT_ENDPOINT_RULES, EndpointRule,
                             StreamingEndpointer, StreamingEnergyVAD,
                             add_noise, add_reverb, energy_vad, kaldi_vad,
                             segments_to_samples, spec_augment,
                             speech_segments, speed_perturb)
from tpufeat.pitch import (PitchConfig, StreamingPitch,
                           StreamingPitchFeatures,
                           config_for as pitch_config_for, pitch_features,
                           track as track_pitch)
from tpufeat.config import (FBANK80, FeatureConfig, GFCC13, KALDI39,
                            MFCC13_HTK, PLP13, PNCC13, PRESETS,
                            STREAMING160, WHISPER80, WHISPER128)
from tpufeat.features import (FeatureResult, extract, extract_chunked,
                              frames, logmel, make_extractor,
                              mel_spectrogram, mfcc, online_cmvn,
                              sliding_cmvn, spectrogram)
from tpufeat.beamform import delay_and_sum, gcc_phat, steer
from tpufeat.io import read_wav, write_wav
from tpufeat.ivector import (DiagUbm, IvectorExtractor, StreamingIvector,
                             ivector_features, train_diag_ubm,
                             train_ivector_extractor, utterance_ivector)
from tpufeat.plda import (Plda, ivector_mean, length_normalize,
                          train_plda)
from tpufeat.fmllr import (est_fmllr, estimate_fmllr, estimate_vtln_warp,
                           fmllr_objective, fmllr_stats)
from tpufeat.diarization import (StreamingDiarizer, cluster_affinity,
                                 diarize, diarize_long, plda_affinity,
                                 refine_labels, segment_ivectors,
                                 sliding_windows, two_stage_cluster)
from tpufeat.resampling import StreamingResampler, resample
from tpufeat.streaming import (OnlineCmvn, PoolRows, StreamingDeltas,
                               StreamingFrontend,
                               StreamingPipeline, StreamingSlidingCMVN,
                               StreamPool,
                               StreamState, extract_scan, init_state,
                               process_chunk, process_chunk_static,
                               scan_chunks, scan_chunks_static)

__version__ = "0.2.0"

__all__ = [
    "FeatureConfig", "MFCC13_HTK", "WHISPER80", "KALDI39", "STREAMING160",
    "FBANK80", "PLP13", "GFCC13", "PNCC13", "WHISPER128",
    "PRESETS", "FeatureResult", "extract", "extract_chunked", "frames",
    "spectrogram",
    "mel_spectrogram", "logmel", "mfcc", "make_extractor", "read_wav",
    "write_wav", "StreamingFrontend", "StreamState", "init_state",
    "process_chunk", "process_chunk_static", "scan_chunks",
    "scan_chunks_static", "extract_scan", "StreamingDeltas",
    "StreamingPipeline", "StreamingSlidingCMVN", "StreamPool", "PoolRows",
    "sliding_cmvn",
    "OnlineCmvn", "online_cmvn",
    "resample", "StreamingResampler",
    "spec_augment", "energy_vad", "kaldi_vad", "StreamingEnergyVAD", "add_noise",
    "add_reverb", "EndpointRule", "DEFAULT_ENDPOINT_RULES",
    "StreamingEndpointer", "speech_segments", "segments_to_samples",
    "speed_perturb", "PitchConfig", "pitch_config_for",
    "pitch_features", "track_pitch", "StreamingPitch",
    "StreamingPitchFeatures", "gcc_phat", "steer", "delay_and_sum",
    "DiagUbm", "IvectorExtractor",
    "StreamingIvector", "ivector_features", "train_diag_ubm",
    "train_ivector_extractor", "utterance_ivector",
    "Plda", "train_plda", "length_normalize", "ivector_mean",
    "est_fmllr", "estimate_fmllr", "fmllr_stats", "fmllr_objective",
    "estimate_vtln_warp",
    "diarize", "diarize_long", "two_stage_cluster", "segment_ivectors",
    "sliding_windows", "plda_affinity",
    "cluster_affinity", "StreamingDiarizer", "refine_labels",
    "enable_compile_cache",
    "__version__",
]
