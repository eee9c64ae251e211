"""Offline corpus pipeline: directory of WAVs -> features, at chip speed.

The production deployment shape for batch extraction (reference L4 writ
large): the native multithreaded WAV decoder (cpp_ref, C1) fills pinned
NumPy arenas while the PREVIOUS batch is still executing on the TPU —
classic one-deep host/device pipelining, so the >100,000x real-time chip
never waits on file I/O. Length bucketing (data.bucket_length) keeps the
number of compiled programs at ~2 per octave of utterance length.

  python -m tpufeat.pipeline /corpus/wavs feats.npz --preset whisper80
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import threading
import time
from typing import Iterator

import numpy as np

from tpufeat import data, features, io
from tpufeat.config import PRESETS, FeatureConfig


def _scan_corpus(wav_dir: str) -> list[tuple[str, int, int]]:
    """[(path, n_samples, rate)] via header-only reads (no sample decode)."""
    out = []
    try:
        from tpufeat import cpp_golden
        native = cpp_golden.available()
    except Exception:
        native = False
    for root, _, names in sorted(os.walk(wav_dir)):
        for name in sorted(names):
            if not name.lower().endswith(".wav"):
                continue
            full = os.path.join(root, name)
            if native:
                import ctypes
                lib = cpp_golden._lib()
                rate = ctypes.c_int(0)
                n = lib.tpufeat_read_wav(full.encode(), None, 0,
                                         ctypes.byref(rate))
                if n >= 0:
                    out.append((full, int(n), rate.value))
                    continue
            n, rate = io.wav_info(full)       # headers only, no decode
            out.append((full, n, rate))
    return out


def _read_segments(path: str) -> list[tuple[str, str, float, float]]:
    """Kaldi ``segments`` file: ``<utt-id> <rec-id> <start-s> <end-s>`` per
    line (Kaldi extract-segments input format). Recording ids name corpus
    files by relpath (``sub/a.wav``) or sanitized stem (``sub/a``), the
    same key scheme as utt2spk."""
    out = []
    seen = set()
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            parts = line.split()
            if not parts:
                continue
            if len(parts) != 4:
                raise ValueError(f"{path}:{ln}: expected '<utt> <rec> "
                                 f"<start> <end>', got {line!r}")
            utt, rec, start, end = parts
            try:
                start_f, end_f = float(start), float(end)
            except ValueError:
                raise ValueError(f"{path}:{ln}: non-numeric times "
                                 f"{start!r} {end!r}") from None
            if utt in seen:
                raise ValueError(f"{path}:{ln}: duplicate utterance "
                                 f"{utt!r}")
            if not 0.0 <= start_f < end_f:
                raise ValueError(f"{path}:{ln}: need 0 <= start < end, "
                                 f"got [{start_f}, {end_f}]")
            seen.add(utt)
            out.append((utt, rec, start_f, end_f))
    return out


class _JoinedThread:
    """Stand-in for an already-completed fetch (the serial path)."""

    def join(self):
        pass


def _compact_arena(arena: np.ndarray) -> np.ndarray:
    """Return an int16 view of a decoded f32 arena when the conversion is
    EXACT (PCM16 sources decode as s/32768, so the round trip loses
    nothing), else the arena unchanged.

    Through the relay the warm corpus pass is upload-bound (BASELINE.md:
    ~1.4 GB of arenas vs ~0.1 GB of features at 24-43 MB/s), so halving
    the upload bytes halves the dominant term; the device promotes int16
    back to f32 as its first op (features_impl), so every downstream
    number is identical. Float-sourced corpora fail the exactness check
    and keep f32 — silently lossy uploads are never an option. Runs in
    the decode prefetch thread (host is otherwise idle there)."""
    q = np.round(arena * 32768.0)
    if (np.abs(q) > 32767).any():       # true f32 in [-1, 1) never trips
        return arena
    q16 = q.astype(np.int16)
    if (q16.astype(np.float32) / 32768.0 == arena).all():
        return q16
    return arena


#: extract-segments-style end-time forgiveness: segment specs are usually
#: written against rounded durations, so an end that overshoots the file
#: by up to this many seconds is clamped; beyond it the line is an error.
SEGMENT_END_TOLERANCE_S = 0.1


def _segment_entries(segments_path: str, entries, wav_dir: str):
    """Resolve a segments file against the scanned corpus: each segment
    becomes one utterance entry (path, n_samples, rate, offset, utt_id)."""
    by_key: dict[str, tuple[str, int, int]] = {}
    for e in entries:
        rel = os.path.relpath(e[0], wav_dir)
        by_key[rel] = e
        by_key.setdefault("_".join(os.path.splitext(rel)[0].split()), e)
    out = []
    for utt, rec, start, end in _read_segments(segments_path):
        if rec not in by_key:
            raise ValueError(f"{segments_path}: recording {rec!r} not "
                             f"found under {wav_dir}")
        path, n, rate = by_key[rec]
        s = int(round(start * rate))
        t = int(round(end * rate))
        if s >= n:
            raise ValueError(f"{segments_path}: {utt!r} starts at sample "
                             f"{s} but {rec!r} has only {n}")
        if t > n:
            if (t - n) / rate > SEGMENT_END_TOLERANCE_S:
                raise ValueError(
                    f"{segments_path}: {utt!r} ends {(t - n) / rate:.3f} s "
                    f"past the end of {rec!r} (tolerance "
                    f"{SEGMENT_END_TOLERANCE_S} s)")
            t = n
        out.append((path, t - s, rate, s, utt))
    return out


def _plan_batches(entries, batch_size: int, grid: float = 2 ** 0.5
                  ) -> list[tuple[list, int, int, int]]:
    """Bucket by (rate, padded length) -> [(entries, padded_len,
    padded_rows, rate)]. Rates only mix when the caller resamples, but
    grouping by rate is always correct and free.

    Remainder batches of a bucket that already has a full batch are padded
    UP to ``batch_size`` rows (zero rows, length 0 — masked out by the
    extractor), so they reuse the bucket's compiled program instead of
    compiling a fresh (B_remainder, len) shape: measured on chip, each
    distinct shape costs ~13 s of XLA compile, which dominated a 2,000-file
    corpus run (17 programs, 65x RTFx cold). Buckets with no full batch
    keep their exact row count (padding would compile a new shape anyway,
    plus compute waste)."""
    buckets: dict[tuple[int, int], list] = {}
    for e in entries:
        key = (e[2], data.bucket_length(e[1], grid=grid))
        buckets.setdefault(key, []).append(e)
    plans = []
    for rate, width in sorted(buckets):
        group = buckets[(rate, width)]
        for i in range(0, len(group), batch_size):
            part = group[i: i + batch_size]
            rows = batch_size if len(group) >= batch_size else len(part)
            plans.append((part, width, rows, rate))
    return plans


def _decode_segment_batch(entries, width: int, sample_rate: int,
                          rows: int):
    """Decode a batch of SEGMENT entries (path, len, rate, offset, utt):
    each unique recording is decoded once (native decoder when built),
    then every segment is sliced into the [rows, width] arena."""
    arena = np.zeros((rows, width), np.float32)
    lengths = np.zeros(rows, np.int32)
    cache: dict[str, np.ndarray] = {}
    for b, (path, seg_len, rate, offset, _utt) in enumerate(entries):
        if path not in cache:
            s, r = io.read_wav(path)
            if r != sample_rate:
                raise ValueError(f"{path}: rate {r} != {sample_rate}; "
                                 f"resample first (tpufeat.resample)")
            cache[path] = np.asarray(s, np.float32)
        arena[b, :seg_len] = cache[path][offset: offset + seg_len]
        lengths[b] = seg_len
    return arena, lengths


def _decode_batch(entries, width: int, sample_rate: int, rows: int):
    """Native threaded decode into a zero-padded [rows, width] arena
    (rows >= len(entries); extra rows stay zero with length 0); Python
    fallback."""
    if entries and len(entries[0]) == 5:       # segment entries
        return _decode_segment_batch(entries, width, sample_rate, rows)
    paths = [e[0] for e in entries]
    try:
        from tpufeat import cpp_golden
        if cpp_golden.available():
            arena, lengths, rates = cpp_golden.read_wav_batch(paths, width)
            if (lengths >= 0).all() and (rates == sample_rate).all():
                if rows > len(paths):
                    pad = rows - len(paths)
                    arena = np.concatenate(
                        [arena, np.zeros((pad, width), np.float32)])
                    lengths = np.concatenate(
                        [lengths, np.zeros(pad, lengths.dtype)])
                return arena, lengths.astype(np.int32)
    except Exception:
        pass
    arena = np.zeros((rows, width), np.float32)
    lengths = np.zeros(rows, np.int32)
    for b, p in enumerate(paths):
        s, r = io.read_wav(p)
        if r != sample_rate:
            raise ValueError(f"{p}: rate {r} != {sample_rate}; resample "
                             f"first (tpufeat.resample)")
        arena[b, : len(s)] = s
        lengths[b] = len(s)
    return arena, lengths


def extract_corpus(wav_dir: str, cfg: FeatureConfig, batch_size: int = 64,
                   stats: dict | None = None, rng=None,
                   resample: bool = False, dp: bool = False, mesh=None,
                   segments: str | None = None,
                   ivector=None, ivectors: dict | None = None,
                   overlap_fetch: bool = True,
                   compact_upload: bool = True,
                   bucket_grid: float = 2 ** 0.5,
                   ) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (wav_path, features [F, D]) for every WAV under ``wav_dir``.

    ``segments``: path to a Kaldi ``segments`` file (``<utt> <rec>
    <start-s> <end-s>`` per line; the extract-segments flow). Each
    segment becomes one utterance — sliced from its recording at decode
    time, length-bucketed by SEGMENT length — and the iterator yields
    ``(utt_id, features)`` instead of ``(wav_path, features)``.

    Decode of batch k+1 overlaps batch k's device execution (one-deep
    prefetch thread). Batches are length-bucketed; padding frames are
    stripped before yielding.

    ``resample=True`` accepts rate-heterogeneous corpora: batches are
    grouped by native rate, decoded at that rate, and converted to
    ``cfg.sample_rate`` on device as ONE batched polyphase matmul ahead
    of extraction (`tpufeat/resampling.py`). Exact vs per-file
    ``resample()``: the polyphase zero-pads edges, so a padded row's
    valid prefix resamples identically to the lone utterance (tested).
    Without the flag, off-rate files raise (silently wrong features are
    never an option).

    ``dp=True`` shards every batch's row axis over ``mesh`` (default: all
    devices; `sharding.extract_data_parallel`) — the multi-chip corpus
    shape. Rows are padded to a mesh-size multiple (zero rows, masked);
    the pipeline has no cross-utterance coupling, so per-chip programs
    are local and scaling is linear by construction. Incompatible with
    ``cfg.dither`` (the dp path has no rng plumbing — raises).

    ``ivector``: an :class:`tpufeat.ivector.IvectorExtractor` trained on
    THIS config's features; each batch additionally computes one
    utterance i-vector per row (masked batched stats + one K×K solve —
    a marginal GEMM on top of extraction) into the ``ivectors`` dict
    (``{utt_id: [K] float32}``; the ``ivector-extract`` flow, writable
    with :func:`tpufeat.feats_io.write_kaldi_vec_ark`).

    ``bucket_grid`` sets the geometric length-bucket step (default
    sqrt(2) = ~2 programs/octave). Padding is pure UPLOAD waste on the
    transfer-bound warm pass, and with a warm `TPUFEAT_COMPILE_CACHE`
    a finer grid's extra programs are disk reads — but measure before
    changing it: on the 2,000-file benchmark corpus the A/B was a WASH
    (BASELINE.md round-5) because waste there is REMAINDER-ROW padding
    (rows padded to ``batch_size`` per bucket; finer buckets make more
    remainders), not length padding. Finer grids pay off only when
    length padding dominates (big buckets, length-skewed corpora).

    ``compact_upload=True`` (default) uploads each batch arena as int16
    whenever the conversion round-trips EXACTLY (PCM16 sources always
    do; the device promotes back to f32 as its first op) — halving the
    upload bytes that dominate the relay-bound warm pass. Float-sourced
    audio keeps f32 automatically (see ``_compact_arena``).

    ``overlap_fetch=True`` (default) pipelines the device->host feature
    fetch one batch deep: batch k's ``np.asarray`` runs on a worker
    thread while batch k+1 decodes, uploads, and dispatches (the warm
    corpus pass is transfer-bound through the relay — BASELINE.md — and
    fetch/upload are independent directions). Yield order is unchanged;
    memory holds at most two batches of features. ``False`` restores the
    strictly serial fetch (the measurement baseline).

    ``stats``: pass a dict to collect pipeline evidence (round-3 VERDICT
    item 3): ``device_s`` (dispatch + fetch wall time), ``decode_wait_s``
    (host blocked on WAV decode — 0 means the prefetch thread fully hid
    I/O), ``n_programs`` (distinct compiled dispatch shapes),
    ``padding_waste`` (fraction of padded samples that are padding), and
    ``audio_s``/``files``/``batches``."""
    entries = _scan_corpus(wav_dir)
    if segments is not None:
        entries = _segment_entries(segments, entries, wav_dir)
    if not entries:
        return
    bad = [e for e in entries if e[2] != cfg.sample_rate]
    if bad and not resample:
        raise ValueError(
            f"{len(bad)} file(s) not at {cfg.sample_rate} Hz (first: "
            f"{bad[0][0]} @ {bad[0][2]}); resample first, or pass "
            "resample=True / --resample")
    if ivector is not None:
        if ivectors is None:
            raise ValueError("ivector= needs an ivectors= dict to fill")
        if ivector.ubm.dim != cfg.feature_dim:
            raise ValueError(
                f"ivector UBM dim {ivector.ubm.dim} != cfg.feature_dim "
                f"{cfg.feature_dim} (train the extractor on this "
                "config's features)")
    plans = _plan_batches(entries, batch_size, bucket_grid)
    fn = features.make_extractor(cfg)
    ndev = 1
    if dp:
        from tpufeat import sharding as shard_mod
        if cfg.dither > 0:
            raise ValueError("dp=True has no per-batch rng plumbing; "
                             "use dither with the single-device path")
        mesh = shard_mod.default_mesh() if mesh is None else mesh
        ndev = int(np.prod(list(mesh.shape.values())))
    if cfg.dither > 0:
        import jax
        if rng is None:
            raise ValueError("cfg.dither > 0 requires a PRNG key: "
                             "extract_corpus(..., rng=jax.random.key(s))")
        keys = jax.random.split(rng, len(plans))   # one key per batch
    else:
        keys = [None] * len(plans)

    result = {}
    shapes = set()
    device_s = decode_wait_s = 0.0
    true_samples = padded_samples = 0
    audio_seconds = 0.0

    def decode(i):
        batch_entries, width, rows, rate = plans[i]
        try:
            arena, lens_ = _decode_batch(batch_entries, width, rate, rows)
            if compact_upload and not dp:
                # dp uploads f32 regardless (sharding.py converts before
                # device_put), so compaction would only burn host cycles
                arena = _compact_arena(arena)
            result[i] = (arena, lens_)
        except Exception as e:          # surfaced at the consuming pop —
            result[i] = e               # thread exceptions must not vanish

    # one-deep fetch pipeline (overlap_fetch): batch k's device->host
    # feature readback runs on this worker while batch k+1 decodes,
    # uploads, and dispatches on the main thread — the two transfer
    # directions are independent through the relay, so the smaller term
    # hides under the larger (benchmarks/experiments/readback_overlap.py)
    fetched: dict = {}

    def fetch(i, res, iv_dev, entries):
        try:
            fetched[i] = (np.asarray(res.features),
                          np.asarray(res.num_frames),
                          None if iv_dev is None else np.asarray(iv_dev),
                          entries)
        except Exception as e:
            fetched[i] = e

    def drain(i):
        """Join batch i's fetch thread and yield its rows."""
        ft, _ = pending.pop(i)
        ft.join()
        got = fetched.pop(i)
        if isinstance(got, Exception):
            raise got
        feats, nf, ivb, entries = got
        for b, e in enumerate(entries):
            # segment entries carry the utterance id in slot 4;
            # whole-file entries are keyed by their path
            key = e[4] if len(e) == 5 else e[0]
            if ivb is not None:
                ivectors[key] = ivb[b]
            yield key, feats[b, : nf[b]]

    pending: dict = {}
    t0 = time.perf_counter()
    decode(0)
    decode_wait_s += time.perf_counter() - t0   # batch 0 has nothing to hide
    for i, (batch_entries, width, _rows, rate) in enumerate(plans):
        got = result.pop(i)
        if isinstance(got, Exception):
            raise got
        arena, lengths = got
        true_samples += int(lengths.sum())
        padded_samples += arena.size
        audio_seconds += float(lengths.sum()) / rate
        t = None
        if i + 1 < len(plans):
            t = threading.Thread(target=decode, args=(i + 1,))
            t.start()                      # host decodes while device runs
        t0 = time.perf_counter()
        pad_rows = (-arena.shape[0]) % ndev
        if pad_rows:                       # mesh-divisible row count
            arena = np.concatenate(
                [arena, np.zeros((pad_rows, arena.shape[1]), np.float32)])
            lengths = np.concatenate(
                [lengths, np.zeros(pad_rows, lengths.dtype)])
        if rate != cfg.sample_rate:
            from tpufeat import resampling
            arena = resampling.resample(arena, rate, cfg.sample_rate)
            p_, q_ = resampling._rational(rate, cfg.sample_rate)
            lengths = np.array([resampling.output_length(int(n), p_, q_)
                                for n in lengths], np.int32)
        shapes.add((int(arena.shape[0]), int(arena.shape[1])))
        if dp:
            from tpufeat import sharding as shard_mod
            # the dp path compiles ONE local program per device; keep
            # each device's (rows, width) inside the measured-clean
            # erratum envelope (BASELINE.md) exactly like extract() does
            # for the single-device path — splitting is exact
            per_dev, width_now = arena.shape[0] // ndev, arena.shape[1]
            if features._single_program_safe((per_dev, width_now)):
                res = shard_mod.extract_data_parallel(arena, lengths,
                                                      cfg, mesh)
            else:
                step = features._rows_per_dispatch(per_dev,
                                                   width_now) * ndev
                parts = [shard_mod.extract_data_parallel(
                    arena[j: j + step], lengths[j: j + step], cfg, mesh)
                    for j in range(0, arena.shape[0], step)]
                import jax.numpy as jnp
                res = features.FeatureResult(
                    *(jnp.concatenate(p, axis=0) for p in zip(*parts)))
        else:
            res = fn(arena, lengths, rng=keys[i]) if keys[i] is not None \
                else fn(arena, lengths)
        iv_dev = None
        if ivector is not None:
            import jax.numpy as jnp
            from tpufeat import ivector as iv_mod
            m = (jnp.arange(res.features.shape[1])[None, :]
                 < jnp.asarray(res.num_frames)[:, None]).astype(jnp.float32)
            iv_dev = iv_mod.utterance_ivector(ivector, res.features, m)
        if overlap_fetch:
            ft = threading.Thread(target=fetch,
                                  args=(i, res, iv_dev, batch_entries))
            ft.start()
            pending[i] = (ft, None)
            device_s += time.perf_counter() - t0
            if i - 1 in pending:           # batch i-1's fetch overlapped
                t0 = time.perf_counter()   # this batch's upload/dispatch
                yield from drain(i - 1)
                device_s += time.perf_counter() - t0
        else:
            fetch(i, res, iv_dev, batch_entries)
            pending[i] = (_JoinedThread(), None)
            yield from drain(i)
            device_s += time.perf_counter() - t0
        if t is not None:
            t0 = time.perf_counter()
            t.join()                       # any remaining decode time was
            decode_wait_s += time.perf_counter() - t0   # NOT hidden
    if pending:                            # the last batch's fetch
        t0 = time.perf_counter()
        yield from drain(max(pending))
        device_s += time.perf_counter() - t0
    if stats is not None:
        stats.update(
            files=len(entries), batches=len(plans),
            audio_s=round(audio_seconds, 1),
            device_s=round(device_s, 4),
            decode_wait_s=round(decode_wait_s, 4),
            n_programs=len(shapes),
            padding_waste=round(1.0 - true_samples / max(padded_samples, 1),
                                4))


def _read_utt2spk(path: str) -> dict[str, str]:
    """Kaldi utt2spk map: one ``<utt-key> <speaker>`` pair per line.
    Keys may be corpus relpaths (``sub/a.wav``) or their sanitized stems
    (``sub/a``) — both spellings of the same utterance are accepted."""
    out: dict[str, str] = {}
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            parts = line.split()
            if not parts:
                continue
            if len(parts) != 2:
                raise ValueError(
                    f"{path}:{ln}: expected '<utt> <spk>', got {line!r}")
            if parts[0] in out:
                raise ValueError(
                    f"{path}:{ln}: duplicate utterance {parts[0]!r}")
            out[parts[0]] = parts[1]
    return out


def _spk_of(utt2spk: dict[str, str], rel: str) -> str:
    if rel in utt2spk:
        return utt2spk[rel]
    stem = "_".join(os.path.splitext(rel)[0].split())
    if stem in utt2spk:
        return utt2spk[stem]
    raise ValueError(f"utt2spk has no entry for {rel!r} (or {stem!r})")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="tpufeat.pipeline",
        description="extract features for a directory of WAVs")
    p.add_argument("wav_dir")
    p.add_argument("out_npz",
                   help="output archive: .npz, or .ark for a Kaldi "
                        "binary archive + .scp index")
    p.add_argument("--preset", default="mfcc13", choices=sorted(PRESETS))
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--fused", action="store_true",
                   help="production TPU kernels (pallas + gemm + fused "
                        "framing + bf16x3)")
    p.add_argument("--global-cmvn", metavar="STATS", default=None,
                   help="accumulate corpus-level CMVN statistics over all "
                        "valid frames and write them (Kaldi "
                        "compute-cmvn-stats analogue; data.CmvnStats). "
                        "A .ark path writes Kaldi binary double-matrix "
                        "stats readable by apply-cmvn; anything else "
                        "writes npz")
    p.add_argument("--apply-cmvn", metavar="STATS", default=None,
                   help="normalize every utterance against previously "
                        "computed corpus statistics (mean; use "
                        "--norm-vars for variance too)")
    p.add_argument("--norm-vars", action="store_true")
    p.add_argument("--utt2spk", metavar="FILE", default=None,
                   help="Kaldi utt2spk map ('<utt> <spk>' per line; utts "
                        "by corpus relpath or sanitized stem): switches "
                        "--global-cmvn/--apply-cmvn to PER-SPEAKER "
                        "statistics (one DM entry per speaker, so the "
                        "stats file must be .ark)")
    p.add_argument("--segments", metavar="FILE", default=None,
                   help="Kaldi segments file ('<utt> <rec> <start-s> "
                        "<end-s>' per line; recordings by corpus relpath "
                        "or sanitized stem): extract features per SEGMENT "
                        "(the extract-segments flow), keyed by utterance "
                        "id")
    p.add_argument("--resample", action="store_true",
                   help="accept rate-heterogeneous corpora: batches are "
                        "grouped by native rate and converted to the "
                        "preset's rate on device (one polyphase matmul "
                        "per batch) before extraction")
    p.add_argument("--dp", action="store_true",
                   help="shard each batch's rows over all devices "
                        "(data-parallel multi-chip corpus extraction)")
    p.add_argument("--ivector-extractor", metavar="NPZ", default=None,
                   help="IvectorExtractor.save() file trained on this "
                        "preset's features: compute one utterance "
                        "i-vector per file (ivector-extract analogue)")
    p.add_argument("--ivector-ark", metavar="ARK", default=None,
                   help="where to write the i-vectors (Kaldi binary "
                        "FV vector archive + .scp index); requires "
                        "--ivector-extractor")
    p.add_argument("--fmllr-ubm", metavar="NPZ", default=None,
                   help="DiagUbm.save() file trained on this preset's "
                        "(post-CMVN) features: accumulate fMLLR "
                        "statistics over the corpus and estimate affine "
                        "transforms (gmm-est-fmllr analogue) — one per "
                        "--utt2spk speaker, or a single 'global' entry "
                        "without the map; requires --fmllr-ark")
    p.add_argument("--fmllr-ark", metavar="ARK", default=None,
                   help="where to write the estimated [D, D+1] fMLLR "
                        "transforms (Kaldi binary FM matrix archive + "
                        ".scp index), keyed by speaker")
    p.add_argument("--fmllr-min-count", type=float, default=500.0,
                   help="frames below which a speaker keeps the identity "
                        "transform (Kaldi --fmllr-min-count)")
    p.add_argument("--apply-fmllr", metavar="ARK", default=None,
                   help="apply previously estimated per-speaker fMLLR "
                        "transforms to every utterance (transform-feats "
                        "analogue; speakers via --utt2spk, or the "
                        "'global' entry)")
    p.add_argument("--compile-cache", metavar="DIR", default=None,
                   help="persistent XLA compilation cache directory "
                        "(tpufeat.enable_compile_cache; or set "
                        "TPUFEAT_COMPILE_CACHE) — collapses cold-start "
                        "compiles to disk reads, BASELINE.md round 5")
    p.add_argument("--bucket-grid", type=float, default=2 ** 0.5,
                   help="geometric length-bucket step (default sqrt(2) = "
                        "~2 programs/octave; finer grids trade programs "
                        "for length padding — pair with "
                        "TPUFEAT_COMPILE_CACHE and measure: remainder-"
                        "row padding can dominate instead, BASELINE.md)")
    p.add_argument("--repeat", type=int, default=1,
                   help="extra passes over the corpus: pass 1 pays the "
                        "per-shape XLA compiles (~13 s each through the "
                        "relay), later passes measure the steady state a "
                        "long-running production job sees")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="override a FeatureConfig field (cli.py "
                        "semantics), e.g. --set out_dtype=bfloat16 to "
                        "halve feature readback (repeatable)")
    args = p.parse_args(argv)
    if args.compile_cache:
        import tpufeat
        tpufeat.enable_compile_cache(args.compile_cache)
    from tpufeat.cli import parse_overrides
    cfg = parse_overrides(PRESETS[args.preset], args.set)
    if args.fused:
        cfg = dataclasses.replace(cfg, use_pallas=True, gemm_dft=True,
                                  fused_framing=True,
                                  matmul_precision="bf16x3")
    utt2spk = _read_utt2spk(args.utt2spk) if args.utt2spk else None
    if utt2spk and not all(
            p.endswith(".ark") for p in (args.global_cmvn, args.apply_cmvn)
            if p):
        raise ValueError("--utt2spk stats are per-speaker multi-entry "
                         "archives; use a .ark stats path")
    apply_stats = None
    if args.apply_cmvn:
        if utt2spk:
            from tpufeat import feats_io
            apply_stats = {
                k: data.CmvnStats.from_kaldi(m) for k, m in
                feats_io.read_kaldi_ark(args.apply_cmvn).items()}
        else:
            apply_stats = data.CmvnStats.load(args.apply_cmvn)
    fmllr_ubm = None
    if args.fmllr_ubm:
        if not args.fmllr_ark:
            raise ValueError("--fmllr-ubm requires --fmllr-ark (where "
                             "the estimated transforms go)")
        from tpufeat.ivector import DiagUbm
        fmllr_ubm = DiagUbm.load(args.fmllr_ubm)
        if fmllr_ubm.dim != cfg.feature_dim:
            raise ValueError(
                f"fMLLR UBM dim {fmllr_ubm.dim} != feature dim "
                f"{cfg.feature_dim} (train the UBM on this preset's "
                "features)")
    elif args.fmllr_ark:
        raise ValueError("--fmllr-ark requires --fmllr-ubm")
    apply_fmllr = None
    if args.apply_fmllr:
        from tpufeat import feats_io
        apply_fmllr = feats_io.read_kaldi_ark(args.apply_fmllr)
    extractor = None
    if args.ivector_extractor:
        from tpufeat.ivector import IvectorExtractor
        extractor = IvectorExtractor.load(args.ivector_extractor)
    elif args.ivector_ark:
        raise ValueError("--ivector-ark requires --ivector-extractor")
    passes = []
    out = {}
    stats: dict = {}
    cmvn_acc = None
    ivecs: dict = {}
    for _ in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        out = {}
        stats = {}
        ivecs = {}
        fmllr_acc: dict = {}
        fmllr_rows: list = []
        cmvn_acc = (({} if utt2spk else data.CmvnStats(cfg.feature_dim))
                    if args.global_cmvn else None)
        for key, feats in extract_corpus(args.wav_dir, cfg, args.batch,
                                         stats=stats,
                                         resample=args.resample,
                                         bucket_grid=args.bucket_grid,
                                         dp=args.dp,
                                         segments=args.segments,
                                         ivector=extractor,
                                         ivectors=(ivecs if extractor
                                                   else None)):
            # segments mode yields utterance ids; whole-file mode paths
            rel = key if args.segments \
                else os.path.relpath(key, args.wav_dir)
            spk = _spk_of(utt2spk, rel) if utt2spk else None
            if cmvn_acc is not None:
                acc = cmvn_acc if spk is None else cmvn_acc.setdefault(
                    spk, data.CmvnStats(cfg.feature_dim))
                acc.accumulate(feats)
            if apply_stats is not None:
                st = apply_stats if spk is None else apply_stats.get(spk)
                if st is None:
                    raise ValueError(
                        f"{args.apply_cmvn}: no CMVN stats for speaker "
                        f"{spk!r} (utterance {rel!r})")
                feats = st.apply(feats, norm_vars=args.norm_vars)
            if apply_fmllr is not None:
                W = apply_fmllr.get(spk if spk is not None else "global")
                if W is None:
                    raise ValueError(
                        f"{args.apply_fmllr}: no fMLLR transform for "
                        f"speaker {spk or 'global'!r} (utterance "
                        f"{rel!r})")
                feats = np.asarray(data.apply_transform(feats, W))
            if fmllr_ubm is not None:
                # keep the (speaker, features) pair directly — pairing
                # back through out.items() broke silently on duplicate
                # keys (review finding)
                fmllr_rows.append((spk if spk is not None else "global",
                                   feats))
            out[rel] = feats
        passes.append(time.perf_counter() - t0)   # extraction wall
    if cmvn_acc is not None:
        if utt2spk:
            from tpufeat import feats_io
            feats_io.write_kaldi_ark(
                args.global_cmvn,
                {s: st.to_kaldi() for s, st in sorted(cmvn_acc.items())},
                dtype="f64")
        else:
            cmvn_acc.save(args.global_cmvn)
    if fmllr_ubm is not None:
        from tpufeat import feats_io
        from tpufeat import fmllr as fmllr_mod
        # per-row batched dispatches, bucketed on a FRAME-domain grid
        # (bucket_length's default minimum is 16000 SAMPLES = 1 s; fed
        # frame counts it padded every utterance to 16000 frames and
        # fused the whole corpus into one unbounded dispatch — review
        # finding) and chunked to <= args.batch rows per dispatch
        by_bucket: dict = {}
        for spk, feats in fmllr_rows:
            nb = data.bucket_length(max(feats.shape[0], 1), minimum=128)
            by_bucket.setdefault(nb, []).append((spk, feats))
        for nb, rows in by_bucket.items():
            for j in range(0, len(rows), max(args.batch, 1)):
                part = rows[j: j + max(args.batch, 1)]
                pad = np.zeros((len(part), nb, cfg.feature_dim),
                               np.float32)
                nf = np.zeros(len(part), np.int32)
                for i, (_s, f) in enumerate(part):
                    pad[i, : f.shape[0]] = f
                    nf[i] = f.shape[0]
                bs, Ks, Gs = fmllr_mod.fmllr_stats(fmllr_ubm, pad, nf,
                                                   per_row=True)
                for i, (spk, _f) in enumerate(part):
                    acc = fmllr_acc.get(spk)
                    if acc is None:
                        fmllr_acc[spk] = [bs[i], Ks[i], Gs[i]]
                    else:
                        acc[0] += bs[i]
                        acc[1] += Ks[i]
                        acc[2] += Gs[i]
        trans = {
            s: fmllr_mod.estimate_fmllr(
                b_, K_, G_, min_count=args.fmllr_min_count
            ).astype(np.float32)
            for s, (b_, K_, G_) in sorted(fmllr_acc.items())}
        feats_io.write_kaldi_ark(
            args.fmllr_ark, trans,
            scp_path=os.path.splitext(args.fmllr_ark)[0] + ".scp")
    dt = passes[-1]                    # steady-state (or only) pass
    if cfg.out_dtype != "float32":
        # bf16 halves the device->host feature readback (the measured
        # corpus ceiling through the relay, BASELINE.md) but neither
        # np.savez nor the Kaldi FM format round-trips ml_dtypes
        # bfloat16 — upcast at the archive boundary, after the cheap
        # fetch already happened
        out = {k: np.asarray(v, np.float32) for k, v in out.items()}
    if args.out_npz.lower().endswith(".ark"):
        from tpufeat import feats_io
        keys = feats_io.ark_keys(list(out))
        utts = dict(zip(keys, out.values()))
        feats_io.write_kaldi_ark(
            args.out_npz, utts,
            scp_path=os.path.splitext(args.out_npz)[0] + ".scp")
    else:
        np.savez(args.out_npz, **out)
    if extractor is not None and args.ivector_ark:
        from tpufeat import feats_io
        # same sanitized key scheme as the feature archive
        rels = [k if args.segments else os.path.relpath(k, args.wav_dir)
                for k in ivecs]
        keys = feats_io.ark_keys(rels)
        feats_io.write_kaldi_vec_ark(
            args.ivector_ark, dict(zip(keys, ivecs.values())),
            scp_path=os.path.splitext(args.ivector_ark)[0] + ".scp")
    audio_s = sum(f.shape[0] for f in out.values()) * cfg.hop_length \
        / cfg.sample_rate
    print(json.dumps({"files": len(out), "audio_s": round(audio_s, 1),
                      "wall_s": round(dt, 3),
                      "rtfx": round(audio_s / max(dt, 1e-9), 1),
                      "pass_wall_s": [round(t, 3) for t in passes],
                      **stats}))
    print(f"wrote {args.out_npz}: {len(out)} utterances", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
