"""Batching utilities: padding, length bucketing, WAV-directory loading.

SURVEY.md §7 "hard parts" #4: variable-length batching must not cause a
recompile storm — every distinct padded length N is a fresh XLA program.
The fix is classic length bucketing: round padded lengths up to a coarse
grid so a handful of programs serve any corpus. Masking guarantees the
padding is inert (tests/test_extract_parity.py::test_padding_is_inert).
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Sequence

import numpy as np

from tpufeat import io

__all__ = ["pad_batch", "bucket_length", "batched", "iter_wav_dir",
           "splice_frames", "apply_transform", "LdaStats",
           "paste_feats", "subsample_frames"]


def pad_batch(signals: Sequence[np.ndarray],
              target_len: int | None = None
              ) -> tuple[np.ndarray, np.ndarray]:
    """Stack variable-length signals -> (padded [B, N] f32, lengths [B])."""
    lengths = np.array([len(s) for s in signals], dtype=np.int32)
    n = int(lengths.max()) if target_len is None else target_len
    out = np.zeros((len(signals), n), dtype=np.float32)
    for b, s in enumerate(signals):
        out[b, : len(s)] = s
    return out, lengths


def bucket_length(n: int, *, grid: float = 2 ** 0.5,
                  minimum: int = 16000) -> int:
    """Round ``n`` up to a geometric grid (default sqrt(2) steps from 1 s
    @16 kHz): bounds the number of compiled programs at ~2 per octave while
    wasting <=41% padding worst-case, ~17% expected."""
    if n <= minimum:
        return minimum
    import math
    k = math.ceil(math.log(n / minimum, grid) - 1e-12)
    return int(round(minimum * grid ** k))


def batched(signals: Iterable[np.ndarray], batch_size: int,
            *, bucket: bool = True,
            grid: float = 2 ** 0.5) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Group signals into (padded_batch, lengths) tuples. With ``bucket``,
    signals are grouped by bucketed length so each batch compiles against
    one of a small set of shapes (sorted-within-stream, stable order)."""
    if not bucket:
        chunk: list[np.ndarray] = []
        for s in signals:
            chunk.append(np.asarray(s))
            if len(chunk) == batch_size:
                yield pad_batch(chunk)
                chunk = []
        if chunk:
            yield pad_batch(chunk)
        return
    buckets: dict[int, list[np.ndarray]] = {}
    for s in signals:
        s = np.asarray(s)
        key = bucket_length(len(s), grid=grid)
        buckets.setdefault(key, []).append(s)
        if len(buckets[key]) == batch_size:
            yield pad_batch(buckets.pop(key), target_len=key)
    for key in sorted(buckets):
        yield pad_batch(buckets[key], target_len=key)


def iter_wav_dir(path: str, *, native: bool | None = None
                 ) -> Iterator[tuple[str, np.ndarray, int]]:
    """Yield (filename, samples, rate) for every .wav under ``path`` —
    the corpus-loading shim in front of :func:`batched`. Uses the native
    C++ RIFF decoder when built (tpufeat/cpp_golden.py)."""
    for root, _, names in sorted(os.walk(path)):
        for name in sorted(names):
            if name.lower().endswith(".wav"):
                full = os.path.join(root, name)
                samples, rate = io.read_wav(full, native=native)
                yield full, samples, rate


def splice_frames(feat, num_frames, left: int = 3, right: int = 3):
    """Kaldi-style frame splicing: stack each frame with its +-context,
    [B, F, D] -> [B, F, (left+1+right)*D], replicating at each utterance's
    true edges (clipped gather, same trick as features.deltas)."""
    import jax.numpy as jnp
    F = feat.shape[-2]
    t = jnp.arange(F)
    hi = jnp.maximum(jnp.asarray(num_frames) - 1, 0)[:, None]
    parts = []
    for off in range(-left, right + 1):
        idx = jnp.clip(t[None, :] + off, 0, hi)
        parts.append(jnp.take_along_axis(feat, idx[..., None], axis=-2))
    return jnp.concatenate(parts, axis=-1)


def paste_feats(feats, num_frames_list=None):
    """Kaldi ``paste-feats``: concatenate feature streams column-wise,
    [B, F, D1] + [B, F, D2] + ... -> [B, F, D1+D2+...]. With
    ``num_frames_list`` the per-stream frame counts are validated to
    agree (the classic MFCC | pitch pasting bug is a silent off-by-one),
    and the shared counts are returned alongside."""
    import jax.numpy as jnp
    if not feats:
        raise ValueError("paste_feats needs at least one stream")
    shapes = {f.shape[:-1] for f in feats}
    if len(shapes) != 1:
        raise ValueError(f"streams disagree on [B, F]: {sorted(shapes)}")
    out = jnp.concatenate([jnp.asarray(f) for f in feats], axis=-1)
    if num_frames_list is None:
        return out
    counts = [np.asarray(n) for n in num_frames_list]
    for c in counts[1:]:
        if not np.array_equal(c, counts[0]):
            raise ValueError("streams disagree on per-utterance frame "
                             f"counts: {counts[0]} vs {c}")
    return out, counts[0]


def subsample_frames(feat, num_frames, factor: int, offset: int = 0):
    """Kaldi ``subsample-feats --n``: keep every ``factor``-th frame
    (chain models run the encoder at a 3x lower frame rate),
    [B, F, D] -> ([B, ceil(F/factor), D], new_num_frames). Static
    strided slice — no gather; padding rows stay padding."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    if not 0 <= offset < factor:
        raise ValueError(f"offset {offset} outside [0, {factor})")
    out = feat[..., offset::factor, :]
    nf = np.asarray(num_frames)
    new_nf = np.maximum(0, (nf - offset + factor - 1) // factor)
    return out, new_nf


def apply_transform(feat, mat):
    """Apply a feature transform (the Kaldi ``transform-feats``
    analogue): [..., F, D_in] @ A^T, where ``mat`` is [D_out, D_in]
    (linear) or [D_out, D_in + 1] (affine — last column is the bias,
    Kaldi's append-a-1 convention). One MXU matmul at HIGHEST precision;
    the usual consumer is an LDA/MLLT matrix over spliced frames
    (:func:`splice_frames` -> :class:`LdaStats`)."""
    import jax
    import jax.numpy as jnp
    mat = jnp.asarray(mat, jnp.float32)
    d_in = feat.shape[-1]
    if mat.shape[1] == d_in + 1:
        lin, bias = mat[:, :d_in], mat[:, d_in]
    elif mat.shape[1] == d_in:
        lin, bias = mat, None
    else:
        raise ValueError(
            f"transform is {tuple(mat.shape)} but features have "
            f"{d_in} dims (want [D_out, {d_in}] or [D_out, {d_in + 1}])")
    out = jnp.matmul(feat, lin.T, precision=jax.lax.Precision.HIGHEST)
    return out if bias is None else out + bias


class LdaStats:
    """LDA estimation from labeled frames (the Kaldi ``acc-lda`` /
    ``est-lda`` pair, the standard consumer of :func:`splice_frames`):
    accumulate per-class first moments + the global second moment in
    float64, then estimate a whitening LDA transform.

    ``estimate(target_dim)`` returns an AFFINE [k, D+1] matrix (feed to
    :func:`apply_transform`) such that over the accumulated data the
    transformed features have zero global mean, identity within-class
    covariance (Kaldi's normalization), and directions ordered by
    between-class variance. Host-side numpy/scipy by design, like
    :class:`CmvnStats` — estimation is a one-off corpus pass; the hot
    path is only the resulting matmul."""

    def __init__(self, dim: int):
        self.dim = dim
        self._counts: dict[int, float] = {}
        self._sums: dict[int, np.ndarray] = {}
        self.sumsq = np.zeros((dim, dim), np.float64)

    def accumulate(self, feats: np.ndarray, labels: np.ndarray) -> None:
        """[F, D] frames + [F] integer class labels (e.g. aligned
        phone/state ids)."""
        f = np.asarray(feats, np.float64).reshape(-1, self.dim)
        lab = np.asarray(labels).reshape(-1)
        if lab.shape[0] != f.shape[0]:
            raise ValueError(f"{f.shape[0]} frames vs {lab.shape[0]} labels")
        self.sumsq += f.T @ f
        for c in np.unique(lab):
            sel = f[lab == c]
            ci = int(c)
            self._counts[ci] = self._counts.get(ci, 0.0) + sel.shape[0]
            if ci not in self._sums:
                self._sums[ci] = np.zeros(self.dim, np.float64)
            self._sums[ci] += sel.sum(axis=0)

    def estimate(self, target_dim: int, *,
                 within_floor: float = 1e-6) -> np.ndarray:
        """-> affine [target_dim, dim + 1] LDA transform (see class doc).

        Classic two-step solve: whiten by the within-class covariance
        (eigh, eigenvalues floored at ``within_floor`` * max for spliced
        features' rank deficiency), then rotate to the between-class
        covariance's top eigenvectors in the whitened space."""
        import scipy.linalg
        if not 1 <= target_dim <= self.dim:
            raise ValueError(f"target_dim {target_dim} outside [1, {self.dim}]")
        n = sum(self._counts.values())
        if n < 2 or len(self._counts) < 2:
            raise ValueError("need >= 2 classes and >= 2 frames")
        mean = sum(self._sums.values()) / n
        total = self.sumsq / n - np.outer(mean, mean)
        between = np.zeros_like(total)
        for c, cnt in self._counts.items():
            d = self._sums[c] / cnt - mean
            between += (cnt / n) * np.outer(d, d)
        within = total - between
        w, v = scipy.linalg.eigh(within)
        w = np.maximum(w, within_floor * max(w.max(), 1e-30))
        whiten = (v / np.sqrt(w)) @ v.T                     # W^{-1/2}
        bw, bv = scipy.linalg.eigh(whiten @ between @ whiten)
        rot = bv[:, ::-1][:, :target_dim].T                 # top-k rows
        lin = rot @ whiten
        return np.concatenate(
            [lin, -(lin @ mean)[:, None]], axis=1).astype(np.float32)


class CmvnStats:
    """Corpus-level CMVN statistics (the Kaldi compute-cmvn-stats /
    apply-cmvn pair, SURVEY.md C16's corpus-scale sibling): exact
    float64 moment accumulation over any number of utterances, then
    normalization of features against the CORPUS mean/variance (vs the
    per-utterance `cfg.cmvn` and the causal streaming.RunningCMVN).

    Host-side numpy by design — accumulation is O(F*D) adds per
    utterance, dwarfed by extraction; keeping it out of the jitted graph
    means any mix of batch shapes feeds one accumulator.
    """

    def __init__(self, dim: int):
        self.count = 0.0
        self.sum = np.zeros(dim, np.float64)
        self.sumsq = np.zeros(dim, np.float64)

    def accumulate(self, feats: np.ndarray) -> None:
        """Add one utterance's [F, D] (or a batch's [B, F, D] of VALID
        frames — trim padding first)."""
        f = np.asarray(feats, np.float64).reshape(-1, self.sum.shape[0])
        self.count += f.shape[0]
        self.sum += f.sum(axis=0)
        self.sumsq += (f * f).sum(axis=0)

    @property
    def mean(self) -> np.ndarray:
        return self.sum / max(self.count, 1.0)

    @property
    def var(self) -> np.ndarray:
        m = self.mean
        return np.maximum(self.sumsq / max(self.count, 1.0) - m * m, 0.0)

    def apply(self, feats: np.ndarray, norm_vars: bool = False) -> np.ndarray:
        out = np.asarray(feats, np.float32) - self.mean.astype(np.float32)
        if norm_vars:
            out = out / np.sqrt(self.var + 1e-10).astype(np.float32)
        return out

    def to_kaldi(self) -> np.ndarray:
        """The [2, D+1] float64 matrix compute-cmvn-stats writes:
        row 0 = [per-dim sum | frame count], row 1 = [per-dim sum of
        squares | 0] — the layout apply-cmvn consumes."""
        top = np.concatenate([self.sum, [self.count]])
        bot = np.concatenate([self.sumsq, [0.0]])
        return np.stack([top, bot])

    @classmethod
    def from_kaldi(cls, mat: np.ndarray) -> "CmvnStats":
        mat = np.asarray(mat, np.float64)
        if mat.ndim != 2 or mat.shape[0] != 2 or mat.shape[1] < 2:
            raise ValueError(f"CMVN stats must be [2, D+1], got {mat.shape}")
        st = cls(mat.shape[1] - 1)
        st.count = float(mat[0, -1])
        st.sum = mat[0, :-1].copy()
        st.sumsq = mat[1, :-1].copy()
        return st

    def save(self, path: str, key: str = "global") -> None:
        """``.ark`` extension -> Kaldi binary double-matrix stats under
        ``key`` (compute-cmvn-stats interchange); anything else -> npz."""
        if path.endswith(".ark"):
            from tpufeat import feats_io
            feats_io.write_kaldi_ark(path, {key: self.to_kaldi()},
                                     dtype="f64")
        else:
            np.savez(path, count=self.count, sum=self.sum,
                     sumsq=self.sumsq)

    @classmethod
    def load(cls, path: str, key: str | None = None) -> "CmvnStats":
        if path.endswith(".ark"):
            from tpufeat import feats_io
            utts = feats_io.read_kaldi_ark(path)
            if key is None:
                if len(utts) != 1:
                    raise ValueError(
                        f"{path}: {len(utts)} stats entries "
                        f"({sorted(utts)[:4]}...) — pass key=")
                key = next(iter(utts))
            return cls.from_kaldi(utts[key])
        z = np.load(path)
        st = cls(int(z["sum"].shape[0]))
        st.count = float(z["count"])
        st.sum = z["sum"].astype(np.float64)
        st.sumsq = z["sumsq"].astype(np.float64)
        return st

    def merge(self, other: "CmvnStats") -> "CmvnStats":
        """Combine shards (e.g. per-worker corpus partitions)."""
        self.count += other.count
        self.sum += other.sum
        self.sumsq += other.sumsq
        return self
