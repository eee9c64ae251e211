"""Drop-in compatibility shims for existing toolchains.

``tpufeat.compat.WhisperFeatureExtractor`` mirrors the call surface of
``transformers.WhisperFeatureExtractor`` (the de-facto implementation of
BASELINE.json:configs[1]'s Whisper-style log-mel) so an HF pipeline can
switch front-ends by changing one import:

    from tpufeat.compat import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor()                     # same defaults
    batch = fe([wav1, wav2], sampling_rate=16000)
    batch["input_features"]                            # [B, 80, 3000]

Parity vs the transformers implementation is asserted at 5e-5 in
tests/test_external_parity.py (both compute in float32). The compute
runs through :func:`tpufeat.extract` — batched, jitted, fused Pallas
kernels on TPU — instead of per-utterance NumPy.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

__all__ = ["WhisperFeatureExtractor", "TorchWavDataset", "pad_collate",
           "FeatureLoader"]


class WhisperFeatureExtractor:
    """API-compatible subset of ``transformers.WhisperFeatureExtractor``.

    Supported surface: the constructor geometry arguments, ``__call__``
    with list/array input, ``padding="max_length"`` (Whisper's only
    deployed mode: zero-pad/truncate every utterance to ``chunk_length``
    seconds, normalization max over ALL frames including padding),
    ``return_tensors`` in {"np", "jax"}, and ``return_attention_mask``
    (frame-level validity). Unsupported HF corners (``padding=False``,
    ``return_token_timestamps``) raise rather than silently diverge.
    """

    def __init__(self, feature_size: int = 80, sampling_rate: int = 16000,
                 hop_length: int = 160, chunk_length: int = 30,
                 n_fft: int = 400, padding_value: float = 0.0):
        from tpufeat.config import WHISPER80
        import jax
        self.feature_size = feature_size
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.chunk_length = chunk_length
        self.n_fft = n_fft
        self.padding_value = padding_value
        self.n_samples = chunk_length * sampling_rate
        self.nb_max_frames = self.n_samples // hop_length
        on_tpu = jax.default_backend() == "tpu"
        self.config = dataclasses.replace(
            WHISPER80, sample_rate=sampling_rate, n_mels=feature_size,
            frame_length=n_fft, n_fft=n_fft, hop_length=hop_length,
            use_pallas=on_tpu, gemm_dft=on_tpu, fused_framing=on_tpu,
            matmul_precision="bf16x3" if on_tpu else "highest")

    @classmethod
    def from_pretrained(cls, path: str, **overrides):
        """Construct from a LOCAL HF checkpoint directory (or a direct
        ``preprocessor_config.json`` path) — the fields this shim
        supports are read, everything else in the file is ignored. Hub
        names are rejected explicitly (this environment has no network;
        and features depend only on the geometry fields anyway)."""
        import json
        import os
        p = (os.path.join(path, "preprocessor_config.json")
             if os.path.isdir(path) else path)
        if not os.path.exists(p):
            raise ValueError(
                f"{path!r} is not a local checkpoint dir or config file "
                "(hub downloads are not supported; pass a local path)")
        with open(p) as f:
            d = json.load(f)
        kind = d.get("feature_extractor_type", "WhisperFeatureExtractor")
        if kind != "WhisperFeatureExtractor":
            raise ValueError(
                f"{p}: feature_extractor_type is {kind!r}; this shim "
                "implements WhisperFeatureExtractor semantics only")
        kw = {k: d[k] for k in ("feature_size", "sampling_rate",
                                "hop_length", "chunk_length", "n_fft",
                                "padding_value") if k in d}
        kw.update(overrides)
        return cls(**kw)

    def __call__(self, raw_speech, sampling_rate: int | None = None,
                 return_tensors: str = "np", padding: str = "max_length",
                 max_length: int | None = None, truncation: bool = True,
                 return_attention_mask: bool = False, **kwargs):
        if kwargs:
            raise TypeError(f"unsupported arguments: {sorted(kwargs)}")
        if padding != "max_length":
            raise ValueError(
                "only padding='max_length' (Whisper's deployed mode) is "
                f"supported, got {padding!r}")
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"input sampling_rate {sampling_rate} != extractor's "
                f"{self.sampling_rate}; resample first "
                "(tpufeat.resample)")
        n = self.n_samples if max_length is None else max_length
        utts = self._as_list(raw_speech)
        true_lens = []
        batch = np.zeros((len(utts), n), np.float32)
        if self.padding_value != 0.0:
            batch += np.float32(self.padding_value)
        for i, u in enumerate(utts):
            u = np.asarray(u, np.float32).reshape(-1)
            if len(u) > n:
                if not truncation:
                    raise ValueError(
                        f"utterance {i} is {len(u)} samples > max "
                        f"{n} and truncation=False")
                u = u[:n]
            batch[i, : len(u)] = u
            true_lens.append(len(u))

        from tpufeat import features
        # transformers semantics: the zero padding is REAL audio (the
        # normalization max runs over all frames), so lengths = full n
        import jax.numpy as jnp
        res = features.extract(
            batch, np.full((len(utts),), n, np.int32), self.config)
        feats = jnp.swapaxes(res.features, -1, -2)     # [B, mel, T]

        out = {"input_features": feats}
        if return_attention_mask:
            t = np.arange(feats.shape[-1])[None, :]
            # transformers builds a sample-level mask and strides it by
            # hop, i.e. ceil(len/hop) frames — NOT this package's
            # drop-last num_frames convention (verified off-by-one for
            # non-hop-aligned lengths in test_external_parity.py)
            nf = np.minimum(
                -(-np.asarray(true_lens, np.int64) // self.hop_length),
                feats.shape[-1])
            out["attention_mask"] = (t < nf[:, None]).astype(np.int32)
        if return_tensors == "np":
            out = {k: np.asarray(v) for k, v in out.items()}
        elif return_tensors == "jax":
            import jax.numpy as jnp
            out = {k: jnp.asarray(v) for k, v in out.items()}
        else:
            raise ValueError(
                f"return_tensors={return_tensors!r} not supported "
                "(use 'np' or 'jax')")
        return _BatchFeature(out)

    @staticmethod
    def _as_list(raw_speech) -> Sequence[np.ndarray]:
        if isinstance(raw_speech, (list, tuple)):
            return [np.asarray(u) for u in raw_speech]
        arr = np.asarray(raw_speech)
        if arr.ndim == 1:
            return [arr]
        if arr.ndim == 2:
            return list(arr)
        raise ValueError(f"raw_speech must be 1-D, 2-D, or a list; got "
                         f"shape {arr.shape}")


class TorchWavDataset:
    """Map-style ``torch.utils.data.Dataset`` over WAV paths.

    ``__getitem__`` returns ``(samples float32 [-1, 1], key)`` — decode
    happens in the DataLoader's workers (CPU-parallel, like the corpus
    pipeline's threaded native loader), while feature extraction belongs
    in the MAIN process on the accelerator: pair this with
    :func:`pad_collate` (pads the ragged batch on host) and
    :class:`FeatureLoader` (runs :func:`tpufeat.extract` per batch).
    Keeping JAX out of the workers avoids fork-vs-accelerator issues
    entirely — workers only touch NumPy.

        ds = TorchWavDataset(paths)
        dl = torch.utils.data.DataLoader(ds, batch_size=64, num_workers=8,
                                         collate_fn=pad_collate)
        for batch in FeatureLoader(dl, KALDI39):
            batch["features"]        # torch.Tensor [B, T, D]
    """

    def __init__(self, paths: Sequence[str], *, native: bool | None = None,
                 expected_rate: int | None = 16000):
        self.paths = list(paths)
        self.native = native
        self.expected_rate = expected_rate

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int):
        from tpufeat import io as tio
        samples, rate = tio.read_wav(self.paths[i], native=self.native)
        # silent rate mismatch = silently wrong features downstream (the
        # corpus pipeline raises for the same reason); expected_rate=None
        # opts out for rate-heterogeneous corpora resampled in collate
        if self.expected_rate is not None and rate != self.expected_rate:
            raise ValueError(
                f"{self.paths[i]}: sample rate {rate} != expected "
                f"{self.expected_rate}; resample (tpufeat.resample) or "
                "construct with expected_rate=None")
        return np.asarray(samples, np.float32), self.paths[i]


def pad_collate(batch, *, bucket: bool = True):
    """DataLoader ``collate_fn`` for ragged audio: list of
    ``(samples, key)`` (or bare arrays) -> dict with NumPy ``signal
    [B, N]``, ``lengths [B]``, ``keys``. With ``bucket`` the padded
    length snaps to the √2 grid (``data.bucket_length``) so the number
    of downstream compiled programs stays logarithmic in length spread.
    Pure NumPy — safe inside DataLoader worker processes."""
    from tpufeat import data
    items = [(b, None) if not isinstance(b, tuple) else b for b in batch]
    sigs = [np.asarray(s, np.float32).reshape(-1) for s, _ in items]
    n = max((len(s) for s in sigs), default=0)
    if bucket:
        n = data.bucket_length(max(n, 1))
    x, lengths = data.pad_batch(sigs, target_len=n)
    return {"signal": x, "lengths": lengths,
            "keys": [k for _, k in items]}


class FeatureLoader:
    """Wrap any iterable of :func:`pad_collate` batches (typically a
    ``torch.utils.data.DataLoader``) and yield extracted features as
    torch tensors — the main-process half of the torch integration.

    Yields dicts: ``features [B, T, D]``, ``num_frames [B]``,
    ``mask [B, T]`` (torch tensors; one host copy out of the read-only
    device buffer — torch refuses non-writable views), plus the batch's
    ``keys``. Extraction uses the jit-cached :func:`tpufeat.extract`, so
    all TPU work stays in this process. ``return_type="np"`` skips torch
    for plain NumPy output. ``rng`` (for ``cfg.dither > 0``) is folded
    with the batch index so every batch draws fresh noise."""

    def __init__(self, loader, cfg, *, return_type: str = "torch",
                 rng=None):
        if return_type not in ("torch", "np"):
            raise ValueError(f"return_type {return_type!r} not in "
                             "('torch', 'np')")
        self.loader, self.cfg = loader, cfg
        self.return_type, self.rng = return_type, rng

    def __iter__(self):
        from tpufeat import features
        for i, batch in enumerate(self.loader):
            sig = np.asarray(batch["signal"], np.float32)
            lengths = np.asarray(batch["lengths"], np.int32)
            rng = None
            if self.rng is not None:
                import jax
                rng = jax.random.fold_in(self.rng, i)
            res = features.extract(sig, lengths, self.cfg, rng=rng)
            out = {"features": np.asarray(res.features),
                   "num_frames": np.asarray(res.num_frames),
                   "mask": np.asarray(res.mask),
                   "keys": batch.get("keys")}
            if self.return_type == "torch":
                import torch
                # jax->numpy views are read-only; torch needs writable
                out = {k: (torch.from_numpy(
                               v if v.flags.writeable else v.copy())
                           if isinstance(v, np.ndarray) else v)
                       for k, v in out.items()}
            yield out

    def __len__(self) -> int:
        return len(self.loader)


class _BatchFeature(dict):
    """Minimal stand-in for transformers.BatchFeature: a dict whose keys
    are also attributes (``batch.input_features``)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None
