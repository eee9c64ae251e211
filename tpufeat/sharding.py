"""Multi-chip execution: data-parallel batches + time-sharded long audio.

The OpenCL reference is single-device; its only parallelism is the NDRange
over frames/butterflies (SURVEY.md §2.2). The TPU-native scaling story has
two axes, both over a ``jax.sharding.Mesh``:

- **Data parallel (DP)**: shard the utterance/batch axis. There are no
  gradients, so DP is a pure sharded map — no collectives at all. One
  ``NamedSharding`` annotation; XLA partitions the whole pipeline.

- **Sequence parallel (SP)** — the honest audio analog of sequence/context
  parallelism (SURVEY.md §2.2): shard a long recording's *time* axis. Each
  device needs a halo from its neighbor because analysis windows overlap
  shard boundaries:

    * one sample leftward (pre-emphasis x[t-1] continuity),
    * ``frame_length - hop`` = 240 samples rightward (frames whose window
      crosses into the next shard),

  exchanged with ``jax.lax.ppermute`` over ICI. Per-utterance reductions
  then need one collective each: CMVN moments via masked ``psum``, Whisper's
  log-mel max via ``pmax``. Deltas use a 2-feature-frame halo exchange.
  The concatenated output equals the single-device result exactly up to
  XLA reduction-order noise (no frame ever spans more than one halo).

Tested on a virtual 8-device CPU mesh (tests/test_sharding.py) and via
``__graft_entry__.dryrun_multichip``; degenerates gracefully to 1 device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpufeat import framing
from tpufeat.config import FeatureConfig, MFCC13_HTK
from tpufeat.features import (FeatureResult, extract_impl, mel_log_dct_xla,
                              spectro_pipeline)

__all__ = ["default_mesh", "extract_data_parallel", "extract_time_sharded",
           "extract_batch_time_sharded", "pitch_features_data_parallel",
           "shardable_length"]


def default_mesh(axis_name: str = "dp", devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis_name,))


# ---------------------------------------------------------------------------
# Data parallelism: one annotation, zero collectives
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_dp_fn(cfg: FeatureConfig, mesh: Mesh, axis_name: str):
    """One jitted DP extractor per (cfg, mesh, axis) — jax's own jit cache
    then keys on shapes, so repeated calls never re-trace (a fresh
    ``jax.jit`` wrapper per call would recompile every time)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.jit(functools.partial(extract_impl, cfg=cfg),
                   in_shardings=(sharding, sharding),
                   out_shardings=NamedSharding(mesh, P(axis_name)))


def extract_data_parallel(signal, lengths, cfg: FeatureConfig,
                          mesh: Mesh | None = None,
                          axis_name: str = "dp") -> FeatureResult:
    """Batched extraction with the batch axis sharded over the mesh.

    ``signal`` [B, N] with B divisible by the mesh size. The pipeline has no
    cross-utterance coupling, so XLA compiles a fully local program per
    device — linear scaling by construction."""
    mesh = default_mesh(axis_name) if mesh is None else mesh
    sharding = NamedSharding(mesh, P(axis_name))
    x = jax.device_put(jnp.asarray(signal, jnp.float32), sharding)
    l = jax.device_put(jnp.asarray(lengths, jnp.int32), sharding)
    return _make_dp_fn(cfg, mesh, axis_name)(x, l)


@functools.lru_cache(maxsize=None)
def _make_pitch_dp_fn(cfg, mesh: Mesh, axis_name: str):
    from tpufeat.pitch import _features_impl
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.jit(functools.partial(_features_impl, cfg=cfg),
                   in_shardings=(sharding, sharding),
                   out_shardings=sharding)


def pitch_features_data_parallel(signal, lengths, cfg=None,
                                 mesh: Mesh | None = None,
                                 axis_name: str = "dp"):
    """Batch-sharded Kaldi-style pitch features -> (feats [B, F, 3],
    valid [B, F]) with B divisible by the mesh size.

    Pitch is per-utterance (NCCF + per-row Viterbi, no cross-utterance
    coupling), so like :func:`extract_data_parallel` this is one sharding
    annotation and zero collectives — XLA compiles a local program per
    device. ``cfg`` defaults to ``PitchConfig()``; pass
    ``pitch.config_for(feature_cfg)`` to stay on a feature grid."""
    from tpufeat.pitch import PitchConfig
    cfg = PitchConfig() if cfg is None else cfg
    mesh = default_mesh(axis_name) if mesh is None else mesh
    sharding = NamedSharding(mesh, P(axis_name))
    x = jax.device_put(jnp.asarray(signal, jnp.float32), sharding)
    l = jax.device_put(jnp.asarray(lengths, jnp.int32), sharding)
    return _make_pitch_dp_fn(cfg, mesh, axis_name)(x, l)


# ---------------------------------------------------------------------------
# Sequence (time) parallelism with halo exchange
# ---------------------------------------------------------------------------

def shardable_length(n: int, cfg: FeatureConfig, n_shards: int) -> int:
    """Smallest padded length >= n divisible by n_shards*hop with a
    >=frame_length shard. Pad the tail with zeros up to this (padding frames
    are masked off by the valid-count logic)."""
    unit = n_shards * cfg.hop_length
    m = -(-n // unit) * unit
    while m // n_shards < cfg.frame_length:
        m += unit
    return m


def _check_time_shardable(cfg: FeatureConfig) -> None:
    """Reject config corners the centered shard body does not implement:
    it neither pre-emphasizes nor produces the extra final frame that
    ``drop_last_frame=False`` centered configs define (its per-shard frame
    count is exactly s_loc//hop). WHISPER80 — the centered preset — has
    preemphasis=0 and drop_last_frame=True and is fully supported."""
    if cfg.center and (cfg.preemphasis != 0.0 or not cfg.drop_last_frame):
        raise ValueError(
            "time sharding supports centered configs only with "
            "preemphasis=0 and drop_last_frame=True (the Whisper "
            "convention); use extract()/extract_data_parallel for "
            f"center=True with preemphasis={cfg.preemphasis}, "
            f"drop_last_frame={cfg.drop_last_frame}")
    if cfg.pncc:
        raise ValueError(
            "PNCC's noise-floor/peak/power-mean recursions carry state "
            "across the WHOLE utterance — time shards cannot compute "
            "them locally; use extract()/extract_data_parallel "
            "(dp shards are whole utterances and compose fine)")
    if cfg.cmvn.startswith("sliding"):
        raise ValueError(
            "time sharding implements utterance-global CMVN (one psum); "
            f"sliding CMVN windows ({cfg.cmvn_window} frames) would cross "
            "shard boundaries — extract the features time-sharded with "
            "cmvn='none' and apply features.sliding_cmvn afterwards, or "
            "use extract()/extract_data_parallel")


def _right_halo(x_local: jnp.ndarray, size: int, axis_name: str,
                axis: int = -1) -> jnp.ndarray:
    """First ``size`` elements (along ``axis``) of the right neighbor
    (zeros on the last device — matches one-shot zero padding beyond the
    signal)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i - 1) for i in range(1, n)]
    sl = jax.lax.slice_in_dim(x_local, 0, size, axis=axis)
    return jax.lax.ppermute(sl, axis_name, perm)


def _left_edge(x_local: jnp.ndarray, size: int, axis_name: str,
               axis: int = -1) -> jnp.ndarray:
    """Last ``size`` elements (along ``axis``) of the left neighbor
    (zeros on device 0)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    dim = x_local.shape[axis]
    sl = jax.lax.slice_in_dim(x_local, dim - size, dim, axis=axis)
    return jax.lax.ppermute(sl, axis_name, perm)


def _sharded_deltas(feat: jnp.ndarray, total_valid, f_loc: int,
                    window: int, axis_name: str) -> jnp.ndarray:
    """Regression deltas across shard boundaries: exchange ``window`` feature
    frames with both neighbors, then gather with globally clipped indices so
    edge replication happens at the true utterance ends.

    Rank-polymorphic: ``feat`` is [..., f_loc, D] with ``total_valid``
    broadcastable to the leading dims (scalar for the 1-D path, [B_local]
    for the batched 2-D body)."""
    d = jax.lax.axis_index(axis_name)
    left = _left_edge(feat, window, axis_name, axis=-2)   # [..., w, D]
    right = _right_halo(feat, window, axis_name, axis=-2)
    ext = jnp.concatenate([left, feat, right], axis=-2)   # [..., f_loc+2w, D]
    g = d * f_loc + jnp.arange(f_loc)                     # global frame ids
    tv = jnp.asarray(total_valid)[..., None]              # [..., 1]
    denom = 2.0 * sum(i * i for i in range(1, window + 1))
    out = jnp.zeros_like(feat)
    D = feat.shape[-1]
    for i in range(1, window + 1):
        gp = jnp.clip(g + i, 0, tv - 1) - d * f_loc + window
        gm = jnp.clip(g - i, 0, tv - 1) - d * f_loc + window
        gp = jnp.broadcast_to(gp[..., None], gp.shape + (D,))
        gm = jnp.broadcast_to(gm[..., None], gm.shape + (D,))
        out = out + i * (jnp.take_along_axis(ext, gp, axis=-2)
                         - jnp.take_along_axis(ext, gm, axis=-2))
    return out / denom


def extract_time_sharded(signal, cfg: FeatureConfig = MFCC13_HTK,
                         mesh: Mesh | None = None,
                         axis_name: str = "time",
                         length: int | None = None) -> jnp.ndarray:
    """Extract features from ONE long recording sharded along time.

    ``len(signal)`` must be divisible by ``mesh_size * hop`` with shards of
    at least ``frame_length`` samples — zero-pad to
    :func:`shardable_length` and pass the true ``length`` (center=False
    configs only: valid snip-edges frames never read past ``length``, so the
    padding is provably inert; masked collectives exclude padding frames).
    Returns features [T_valid, D] — identical to the one-shot single-device
    output.

    Supports the full config space: centered/Whisper framing reflects at the
    *global* edges only, Whisper's max rides ``pmax``, CMVN moments ride
    ``psum``, deltas exchange 2-frame halos.
    """
    _check_time_shardable(cfg)
    mesh = default_mesh(axis_name) if mesh is None else mesh
    n_dev = mesh.devices.size
    x = jnp.asarray(signal, jnp.float32)
    n = x.shape[0]
    fl, hop = cfg.frame_length, cfg.hop_length
    if n % (n_dev * hop) or n // n_dev < fl:
        raise ValueError(
            f"length {n} not shardable over {n_dev} devices; pad to "
            f"{shardable_length(n, cfg, n_dev)} (shardable_length)")
    if length is None:
        length = n
    elif length != n and cfg.center:
        raise ValueError("centered configs reflect at the true signal end; "
                         "shard exact-length audio (length == len(signal))")
    total_valid = cfg.num_frames(length)
    fn = _make_time_sharded_fn(cfg, n, mesh, axis_name)
    return fn(x, jnp.asarray(total_valid, jnp.int32))[:total_valid]


def extract_batch_time_sharded(signals, lengths, cfg: FeatureConfig,
                               mesh: Mesh, dp_axis: str = "dp",
                               time_axis: str = "time") -> FeatureResult:
    """2-D mesh: a BATCH of long recordings sharded over (dp, time) at once.

    ``signals`` [B, N] with B divisible by the dp mesh size and N by
    ``time_size * hop`` (shards >= frame_length; zero-pad and pass true
    ``lengths`` — center=False configs only, as in
    :func:`extract_time_sharded`). Each utterance lives on one dp row and is
    split along time across that row's devices; halos/psum/pmax ride the
    time axis only. Returns a FeatureResult with [B, F_total, D] features.
    """
    _check_time_shardable(cfg)
    mesh_axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    x = jnp.asarray(signals, jnp.float32)
    B, n = x.shape
    fl, hop = cfg.frame_length, cfg.hop_length
    n_time = mesh_axes[time_axis]
    if B % mesh_axes[dp_axis] or n % (n_time * hop) or n // n_time < fl:
        raise ValueError(
            f"[B={B}, N={n}] not shardable over mesh {mesh_axes}; pad N to "
            f"{shardable_length(n, cfg, n_time)} and B to a multiple of "
            f"{mesh_axes[dp_axis]}")
    if cfg.center and bool(np.any(np.asarray(lengths) != n)):
        raise ValueError("centered configs reflect at the true signal end; "
                         "shard exact-length audio")
    lengths = jnp.asarray(lengths, jnp.int32)
    s_loc = n // n_time
    fn = _make_batch_time_sharded_fn(cfg, s_loc, mesh, dp_axis, time_axis)
    feats, mask, nf = fn(x, lengths)
    return FeatureResult(feats, mask, nf)


@functools.lru_cache(maxsize=None)
def _make_batch_time_sharded_fn(cfg: FeatureConfig, s_loc: int, mesh: Mesh,
                                dp_axis: str, time_axis: str):
    """One jitted 2-D (dp x time) extractor per (cfg, shard size, mesh) —
    building a fresh shard_map + jax.jit wrapper per call would retrace
    every time (the round-2 DP retrace bug's 2-D twin)."""
    body = functools.partial(_time_shard_body, cfg=cfg, s_loc=s_loc,
                             f_loc=s_loc // cfg.hop_length,
                             axis_name=time_axis)
    smfn = shard_map(
        body,              # rank-polymorphic body handles [B_local, s_loc]
        mesh=mesh,         # directly — ONE kernel call per device (a vmap
        in_specs=(P(dp_axis, time_axis), P(dp_axis)),   # -per-row variant
        out_specs=P(dp_axis, time_axis),   # measured ~4x slower on chip)
        check_vma=False,   # pallas_call outputs carry no vma annotation
    )

    def fn(x, lengths):
        # frame counts + mask live INSIDE the jit: each eager op outside
        # would be a separate ~2 ms relay dispatch per call (BASELINE.md
        # dispatch floor), which at production batch is the same order as
        # the extraction itself
        nf = framing.num_frames_dynamic(lengths, cfg)
        feats = smfn(x, nf)
        mask = jnp.arange(feats.shape[1])[None, :] < nf[:, None]
        return feats, mask, nf

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _make_time_sharded_fn(cfg: FeatureConfig, n: int, mesh: Mesh,
                          axis_name: str):
    n_dev = mesh.devices.size
    s_loc = n // n_dev
    fn = shard_map(
        functools.partial(_time_shard_body, cfg=cfg, s_loc=s_loc,
                          f_loc=s_loc // cfg.hop_length,
                          axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,   # pallas_call outputs carry no vma annotation
    )
    return jax.jit(fn)


def _time_shard_body(x_local: jnp.ndarray, total_valid: jnp.ndarray, *,
                     cfg: FeatureConfig, s_loc: int,
                     f_loc: int, axis_name: str):
    """Per-device body under shard_map, rank-polymorphic over a leading
    batch dim: x_local [s_loc] (1-D path) or [B_local, s_loc] (2-D dp x
    time mesh); total_valid — the true frame count(s) — a traced scalar or
    [B_local]. The batched form runs the fused kernel ONCE on the whole
    local batch: the earlier vmap-per-row formulation compiled a
    grid-per-row program that measured ~4x slower than single-chip
    (benchmarks/experiments/shard_body_anatomy.py)."""
    fl, hop = cfg.frame_length, cfg.hop_length
    batched = x_local.ndim == 2
    d = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    tv = jnp.asarray(total_valid)
    mask = (d * f_loc + jnp.arange(f_loc)) < tv[..., None]  # [..., f_loc]

    if cfg.center:
        pad = cfg.n_fft // 2
        halo_r = fl - hop - pad                              # e.g. 40
        left = _left_edge(x_local, pad, axis_name)           # [..., pad]
        right = _right_halo(x_local, max(halo_r, 0), axis_name)
        # reflect at the GLOBAL edges only (device 0 left, last device right)
        refl_l = x_local[..., 1: pad + 1][..., ::-1]
        left = jnp.where(d == 0, refl_l, left)
        if halo_r > 0:
            refl_r = x_local[..., -halo_r - 1: -1][..., ::-1]
            right = jnp.where(d == n_dev - 1, refl_r, right)
            ext = jnp.concatenate([left, x_local, right], axis=-1)
        else:
            ext = jnp.concatenate([left, x_local], axis=-1)
        # frame j starts at local j*hop (ext already includes the pad offset)
    else:
        prev = _left_edge(x_local, 1, axis_name)             # [..., 1]
        halo = _right_halo(x_local, fl - hop, axis_name)     # [..., 240]
        ext = jnp.concatenate([prev, x_local, halo], axis=-1)
        if cfg.preemphasis and not cfg.kaldi_mode:
            ext = (ext - cfg.preemphasis * jnp.concatenate(
                [jnp.zeros_like(ext[..., :1]), ext[..., :-1]], axis=-1))
            # device 0: one-shot convention y[0] = x[0] (x[-1] := 0) —
            # ppermute already delivered zeros for the missing left halo,
            # so ext[1] is exact on every device.
        ext = ext[..., 1:]                                   # drop carry slot

    # ext is exactly a framing buffer (frame j covers ext[j*hop:j*hop+fl]),
    # so the production configs run the same fully fused signal-level
    # kernel as single-chip extract() — the staged path (frames
    # materialized, spectro kernels per stage) is the fallback, measured
    # ~3x slower at production batch (BASELINE.md round-1 rows)
    use_fused = (cfg.use_pallas and cfg.gemm_dft and cfg.fused_framing
                 and f_loc > 0)
    buf = ext if batched else ext[None]          # kernel-facing batch view

    def unb(t):
        return t if batched else t[0]

    def staged_frames():
        frames = framing.frames_from_buffer(buf, f_loc, fl, hop)
        return unb(framing.condition_frames(frames, cfg))

    # mel/log/dct — whisper normalization handled here with a global pmax
    if cfg.log == "whisper":
        if use_fused:
            from tpufeat.pallas import fused
            ls = unb(fused.signal_features(buf, f_loc, cfg))  # log10 mel
        else:
            import dataclasses
            pre_cfg = dataclasses.replace(cfg, log="log10", n_mfcc=0,
                                          lifter=0, use_energy=False)
            ls = spectro_pipeline(staged_frames(), mask, pre_cfg)
        neg_inf = jnp.asarray(-jnp.inf, ls.dtype)
        local_max = jnp.max(jnp.where(mask[..., None], ls, neg_inf),
                            axis=(-2, -1), keepdims=True)   # per utterance
        gmax = jax.lax.pmax(local_max, axis_name)
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        feat = (jnp.maximum(ls, gmax - 8.0) + 4.0) / 4.0
        if cfg.n_mfcc > 0:      # DCT after normalization, like the golden
            from tpufeat.features import (_replace_c0_with_energy,
                                          dct_lifter)
            feat = dct_lifter(feat, cfg)
            if cfg.use_energy:
                feat = _replace_c0_with_energy(feat, staged_frames(), cfg)
    elif use_fused:
        from tpufeat.pallas import fused
        feat = unb(fused.signal_features(buf, f_loc, cfg))
        if cfg.plp_order > 0:       # frame-local tail; shards untouched
            from tpufeat import plp
            feat = plp.plp_from_energies(feat, cfg)
        if cfg.use_energy:
            # MFCC: substitute c0; fbank: prepend (dim n_mels+1) —
            # frame-local either way, so shards stay independent
            from tpufeat.features import _apply_energy
            feat = _apply_energy(feat, staged_frames(), cfg)
    else:
        feat = spectro_pipeline(staged_frames(), mask, cfg)

    if cfg.deltas:
        outs, d = [feat], feat
        for _ in range(cfg.delta_order):
            d = _sharded_deltas(d, tv, f_loc, cfg.delta_window, axis_name)
            outs.append(d)
        feat = jnp.concatenate(outs, axis=-1)

    if cfg.cmvn != "none":
        m = mask[..., None].astype(feat.dtype)           # [..., f_loc, 1]
        cnt = jax.lax.psum(jnp.sum(m, axis=-2, keepdims=True), axis_name)
        mean = jax.lax.psum(jnp.sum(feat * m, axis=-2, keepdims=True),
                            axis_name) / jnp.maximum(cnt, 1.0)
        feat = feat - mean
        if cfg.cmvn == "meanvar":
            var = jax.lax.psum(jnp.sum((feat * m) ** 2, axis=-2,
                                       keepdims=True), axis_name) \
                / jnp.maximum(cnt, 1.0)
            feat = feat / jnp.sqrt(var + 1e-10)
    return feat
