"""Fused Pallas/Mosaic spectro-feature kernels (reference C5-C9 -> one kernel).

BASELINE.json:north_star prescribes exactly this design: "the mel-filterbank,
log, and DCT-II MFCC stages are fused into a single Pallas kernel that runs
the filterbank and DCT as MXU matmuls against precomputed dense matrices".
Where the OpenCL reference launches 6-10 NDRange kernels with HBM round trips
between each stage (SURVEY.md §3.1), this kernel makes ONE pass: a block of
frames is DMA'd to VMEM, every stage runs on-chip (MXU for the matmuls, VPU
for |X|^2 and log), and only the final features return to HBM.

Three kernels, selected by ``cfg``:

- **tail kernel** (``use_pallas``): XLA's batched rFFT produces the power
  spectrum; the kernel fuses bins->mel (MXU) -> log (VPU) -> mel->MFCC DCT
  (MXU).
- **full GEMM-native kernel** (``+ gemm_dft``): the DFT itself becomes MXU
  matmuls against a precomputed windowed DFT matrix, so raw frames go in
  and features come out of a single kernel.
- **signal-level kernel** (``+ fused_framing``): framing happens INSIDE the
  kernel via the hop-row matmul decomposition — the [B, F, frame_length]
  tensor never exists in HBM. One kernel for references C3-C9. Two layouts:
  the phase-packed v5 (``_signal_features_phase``, H hops per lane-aligned
  row, zero-copy input build) for calls of >= 32*H frames, and the v4
  hop-split layout below that and for hops not divisible by 16 — see
  section 4b/4c of docs/DESIGN.md.

The GEMM kernels use the round-2 combined formulation (kernel v4):

- Re and Im are ONE matmul against ``matrices.dft_matrix_combined`` (the
  zero Im columns of bins 0 and n_fft/2 are dropped, so the combined matrix
  is [frame_length, n_fft] exactly — no column waste for power-of-two FFTs).
- ``|X|^2`` is a linear rearrangement of the squared matmul output, so for
  power-spectrum configs it folds into the mel matmul
  (``matrices.mel_filterbank_folded``) and the power spectrum NEVER
  materializes; magnitude configs rebuild it with one lane-roll + mask.
- The signal kernel splits each hop row into ``q = hop/w`` sub-blocks of
  ``w <= 128`` samples, each lane-padded to 128: a frame then covers
  ``ceil(frame_length/w)`` useful 128-lane groups instead of
  ``ceil(frame_length/hop)`` hop_pad-wide ones — for the 400/160 presets
  that cuts the contracted K per frame from 768 to 640 padded lanes, and
  the combined Re/Im matrix halves the roll/accumulate chain.
- kaldi_mode's per-frame DC-offset + pre-emphasis are linear, so they are
  folded into the DFT matrix (``matrices.kaldi_conditioning_matrix``) at
  zero runtime cost.

Tiling (pallas_guide: f32 min tile (8,128)): the frame axis is blocked at
``TF`` rows; every lane axis is zero-padded to a multiple of 128. Zero-padded
matrix rows/columns contribute exact zeros, so padding never changes the
math. Constant matrices use a grid-invariant index_map, so Mosaic keeps them
resident in VMEM across the grid instead of re-DMAing per block.

The kernels run under ``interpret=True`` off-TPU — the Pallas interpreter is
the CPU-CI "fake backend" (SURVEY.md §4).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufeat import matrices
from tpufeat.config import FeatureConfig

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _log_kind(cfg: FeatureConfig) -> str:
    # whisper's clamp/scale needs the utterance-global max -> applied outside
    return {"natural": "natural", "log10": "log10", "whisper": "log10",
            "none": "none"}[cfg.log]


# MXU matmul precision (cfg.matmul_precision):
#
# - "highest": Precision.HIGHEST — the backend's best f32 emulation. On
#   v5e this measured ~6-pass cost; it holds the tightest fidelity
#   (log-mel ~1e-5 vs the f64 golden).
# - "bf16x3": explicit 3-term decomposition a@b ~= a_hi@b_hi + a_hi@b_lo
#   + a_lo@b_hi with bf16 operand pairs (inputs carry 16 mantissa bits).
#   Measured 1.33x faster kernels at ~2e-4 log-mel error — comfortably
#   inside the 1e-3 budget; the production/bench setting. Constants are
#   pre-split on the host; computed operands split once on the VPU.
# - "default": native bf16 single pass — ~3e-3 error, outside the budget.
_HI = jax.lax.Precision.HIGHEST


def _stride(cfg: FeatureConfig) -> int:
    """Refs per logical constant (bf16x3 passes (hi, lo) pairs)."""
    return 2 if cfg.matmul_precision == "bf16x3" else 1


def _pack_consts(mats, cfg: FeatureConfig):
    """Host-side constant packing for the configured precision."""
    out = []
    for m in mats:
        m = np.asarray(m, np.float32)
        if cfg.matmul_precision == "bf16x3":
            hi = m.astype(jnp.bfloat16)
            lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            out += [jnp.asarray(hi), jnp.asarray(lo)]
        else:
            out.append(jnp.asarray(m))
    return out


def _split_operand(x, cfg: FeatureConfig):
    """In-kernel LHS preparation; split once, reuse across matmuls."""
    if cfg.matmul_precision == "bf16x3":
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (hi, lo)
    return (x,)


def _cdot(xs, crefs, cfg: FeatureConfig, cols: int | None = None):
    """Matmul of a split operand against one logical constant's refs.
    ``cols`` optionally contracts only the first lanes (128-aligned)."""
    def cut(a):
        return a if cols is None else a[:, :cols]
    if cfg.matmul_precision == "bf16x3":
        hi, lo = (cut(x) for x in xs)
        chi, clo = crefs[0][:], crefs[1][:]
        return (jax.lax.dot(hi, chi, preferred_element_type=jnp.float32)
                + jax.lax.dot(hi, clo, preferred_element_type=jnp.float32)
                + jax.lax.dot(lo, chi, preferred_element_type=jnp.float32))
    prec = _HI if cfg.matmul_precision == "highest" else \
        jax.lax.Precision.DEFAULT
    return jax.lax.dot(cut(xs[0]), crefs[0][:], precision=prec,
                       preferred_element_type=jnp.float32)


def _dot(a, b):
    return jax.lax.dot(a, b, precision=_HI,
                       preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Constants (host-side, cached per config)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tail_constants(cfg: FeatureConfig) -> tuple[np.ndarray, np.ndarray | None]:
    """(mel_fb [nb_pad, nm_pad], dct [nm_pad, nc_pad] or None), float32,
    zero-padded to lane multiples; lifter folded into the DCT columns."""
    nb, nm = cfg.n_bins, cfg.n_mels
    fb = matrices.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, nm, cfg.fmin, cfg.fmax_hz,
        cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style,
        cfg.vtln_warp, cfg.vtln_low, cfg.vtln_high)
    nb_p, nm_p = _round_up(nb, LANE), _round_up(nm, LANE)
    fb_p = np.zeros((nb_p, nm_p), np.float32)
    fb_p[:nb, :nm] = fb
    if cfg.n_mfcc <= 0 or cfg.log == "whisper":
        return fb_p, None
    dct = matrices.dct_matrix(nm, cfg.n_mfcc) * \
        matrices.lifter_vector(cfg.n_mfcc, cfg.lifter)[None, :]
    nc_p = _round_up(cfg.n_mfcc, LANE)
    dct_p = np.zeros((nm_p, nc_p), np.float32)
    dct_p[:nm, : cfg.n_mfcc] = dct
    return fb_p, dct_p


@functools.lru_cache(maxsize=None)
def _cs_constant(cfg: FeatureConfig, fold_kaldi: bool) -> np.ndarray:
    """Combined windowed Re/Im DFT matrix [frame_length, ncs_pad], float32.

    ``fold_kaldi=True`` (signal kernel, which sees the RAW signal) folds
    kaldi_mode's per-frame conditioning into the matrix; the staged kernel
    receives frames already conditioned by framing.condition_frames and
    must NOT fold it again."""
    cs = matrices.dft_matrix_combined(cfg.frame_length, cfg.n_fft,
                                      cfg.window)
    if fold_kaldi and cfg.kaldi_mode and (cfg.dc_offset or cfg.preemphasis):
        cond = matrices.kaldi_conditioning_matrix(
            cfg.frame_length, cfg.preemphasis if cfg.preemphasis else 0.0,
            cfg.dc_offset)
        cs = cond @ cs
    ncs_p = _round_up(cs.shape[1], LANE)
    out = np.zeros((cfg.frame_length, ncs_p), np.float32)
    out[:, : cs.shape[1]] = cs
    return out


@functools.lru_cache(maxsize=None)
def _folded_fb_constants(cfg: FeatureConfig
                         ) -> tuple[np.ndarray, np.ndarray | None]:
    """(fb [ncs_pad, nm_pad], dct or None) for the combined-DFT kernels.

    power: the rearranged filterbank (power folds into the matmul).
    magnitude: the plain filterbank on the Re-bin rows (the kernel rebuilds
    |X| with a lane-roll first)."""
    nm = cfg.n_mels
    ncs_p = _round_up(2 * cfg.n_bins - 2, LANE)
    nm_p = _round_up(nm, LANE)
    if cfg.spectrum == "power":
        fb = matrices.mel_filterbank_folded(
            cfg.sample_rate, cfg.n_fft, nm, cfg.fmin, cfg.fmax_hz,
            cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style,
        cfg.vtln_warp, cfg.vtln_low, cfg.vtln_high)
    else:
        fb = matrices.mel_filterbank(
            cfg.sample_rate, cfg.n_fft, nm, cfg.fmin, cfg.fmax_hz,
            cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style,
        cfg.vtln_warp, cfg.vtln_low, cfg.vtln_high)
    fb_p = np.zeros((ncs_p, nm_p), np.float32)
    fb_p[: fb.shape[0], :nm] = fb
    return fb_p, _tail_constants(cfg)[1]


def _hop_split(cfg: FeatureConfig) -> tuple[int, int]:
    """(q, w): split each hop row into q sub-blocks of w samples, w <= LANE
    and q*w == hop — the layout that minimizes padded K per frame."""
    hop = cfg.hop_length
    q = -(-hop // LANE)
    while hop % q:
        q += 1
    return q, hop // q


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------

def _mel_log_dct_tail(spec, fb_refs, dct_refs, cfg: FeatureConfig):
    """Shared mel-matmul -> log -> (DCT) tail: spec [TF, K] -> [TF, D].
    Used by every kernel body so the log/DCT semantics can never diverge
    between the rFFT-tail, staged-GEMM, and signal-level paths."""
    mel = _cdot(_split_operand(spec, cfg), fb_refs, cfg)
    kind = _log_kind(cfg)
    if kind == "natural":
        mel = jnp.log(jnp.maximum(mel, cfg.log_floor))
    elif kind == "log10":
        mel = jnp.log10(jnp.maximum(mel, cfg.log_floor))
    if dct_refs is not None:
        mel = _cdot(_split_operand(mel, cfg), dct_refs, cfg)
    return mel


def _sq_features(z, fb_refs, dct_refs, cfg: FeatureConfig):
    """Shared tail for the combined-DFT kernels: z [TF, ncs_pad] (Re/Im
    columns) -> features block. Power never materializes for
    spectrum='power'; magnitude rebuilds it with one lane roll."""
    sq = z * z
    if cfg.spectrum == "magnitude":
        nb = cfg.n_bins
        ncs_p = sq.shape[-1]
        im2 = pltpu.roll(sq, ncs_p - (nb - 1), axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, sq.shape, 1)
        keep = jnp.logical_and(lane >= 1, lane <= nb - 2)
        sq = jnp.sqrt(sq + jnp.where(keep, im2, 0.0))
    return _mel_log_dct_tail(sq, fb_refs, dct_refs, cfg)


def _sq_tail(z, fb_refs, dct_refs, out_ref, cfg: FeatureConfig, row=None):
    mel = _sq_features(z, fb_refs, dct_refs, cfg)
    if row is None:
        out_ref[:] = mel
    else:
        out_ref[row] = mel


def _group(refs, cfg: FeatureConfig):
    """Group a flat ref tuple into logical constants (pairs for bf16x3)."""
    k = _stride(cfg)
    return [tuple(refs[i: i + k]) for i in range(0, len(refs), k)]


def _tail_kernel(power_ref, *refs, cfg, kernel_dct):
    groups = _group(refs[:-1], cfg)
    out_ref = refs[-1]
    out_ref[:] = _mel_log_dct_tail(power_ref[:], groups[0],
                                   groups[1] if kernel_dct else None, cfg)


def _full_kernel(frames_ref, *refs, cfg, kernel_dct):
    groups = _group(refs[:-1], cfg)
    out_ref = refs[-1]
    z = _cdot(_split_operand(frames_ref[:], cfg), groups[0], cfg)
    _sq_tail(z, groups[1], groups[2] if kernel_dct else None, out_ref, cfg)


def _block_rows(n_rows: int) -> int:
    """Frame-block size: 512 rows amortizes DMA and fills the MXU; small
    inputs shrink to an 8-row-aligned block."""
    return min(512, _round_up(max(n_rows, 1), 8))


def _call_rowblocked(kernel, rows, consts, out_cols, cfg, extra_flops=0):
    """Run ``kernel`` over row-blocks of ``rows`` [R, K]; constants are
    grid-invariant. Returns [R, out_cols]."""
    R, K = rows.shape
    TF = _block_rows(R)
    Rp = _round_up(R, TF)
    if Rp != R:
        rows = jnp.pad(rows, ((0, Rp - R), (0, 0)))
    grid = (Rp // TF,)
    in_specs = [pl.BlockSpec((TF, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for cmat in consts:
        in_specs.append(pl.BlockSpec(cmat.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    nbp = consts[0].shape[1] if consts else K
    flops_per_row = 2 * sum(c.shape[0] * c.shape[1] for c in consts) + extra_flops
    out = pl.pallas_call(
        functools.partial(kernel, cfg=cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TF, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, out_cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * Rp * flops_per_row,
            bytes_accessed=Rp * (K + out_cols) * 4
            + sum(int(c.size) for c in consts) * 4,
            transcendentals=Rp * nbp,
        ),
        interpret=_interpret(),
    )(rows, *consts)
    return out[:R]


def mel_log_dct(power: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Fused tail: power spectrum [..., n_bins] -> features [..., D] where D
    is n_mfcc (natural/log10 logs) or n_mels (whisper: log10-mel out; the
    caller applies the masked clamp/scale)."""
    fb, dct = _tail_constants(cfg)
    lead = power.shape[:-1]
    nb_p = fb.shape[0]
    rows = power.reshape(-1, power.shape[-1]).astype(jnp.float32)
    rows = jnp.pad(rows, ((0, 0), (0, nb_p - rows.shape[-1])))
    consts = _pack_consts([fb] + ([dct] if dct is not None else []), cfg)
    kernel = functools.partial(_tail_kernel, kernel_dct=dct is not None)
    out_cols = (dct if dct is not None else fb).shape[1]
    out = _call_rowblocked(kernel, rows, consts, out_cols, cfg)
    d = cfg.n_mfcc if dct is not None else cfg.n_mels
    return out[:, :d].reshape(*lead, d)


def dft_mel_log_dct(frames: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Fully fused GEMM-native kernel: conditioned raw frames
    [..., frame_length] -> features, one kernel for C4-C9 (combined Re/Im
    DFT matmul + folded-power mel matmul)."""
    cs = _cs_constant(cfg, fold_kaldi=False)
    fb, dct = _folded_fb_constants(cfg)
    lead = frames.shape[:-1]
    rows = frames.reshape(-1, frames.shape[-1]).astype(jnp.float32)
    consts = _pack_consts([cs, fb] + ([dct] if dct is not None else []), cfg)
    kernel = functools.partial(_full_kernel, kernel_dct=dct is not None)
    out_cols = (dct if dct is not None else fb).shape[1]
    out = _call_rowblocked(kernel, rows, consts, out_cols, cfg,
                           extra_flops=3 * cs.shape[1])
    d = cfg.n_mfcc if dct is not None else cfg.n_mels
    return out[:, :d].reshape(*lead, d)


def spectro_features(frames: jnp.ndarray, mask: jnp.ndarray,
                     cfg: FeatureConfig) -> jnp.ndarray:
    """Conditioned (unwindowed) frames [B, F, fl] -> features [B, F, D].

    Drop-in fused replacement for the XLA tail in features.extract_impl —
    parity-tested against it (tests/test_pallas.py)."""
    if cfg.gemm_dft:
        out = dft_mel_log_dct(frames, cfg)
    else:
        w = jnp.asarray(matrices.window(cfg.window, cfg.frame_length),
                        frames.dtype)
        spec = jnp.fft.rfft(frames * w, n=cfg.n_fft, axis=-1)
        power = spec.real * spec.real + spec.imag * spec.imag
        if cfg.spectrum == "magnitude":
            power = jnp.sqrt(power)
        out = mel_log_dct(power, cfg)
    if cfg.log == "whisper":
        from tpufeat.features import dct_lifter, whisper_normalize
        out = whisper_normalize(out, mask)
        if cfg.n_mfcc > 0:
            # whisper's clamp needs the global max -> the kernel stopped at
            # log10-mel; finish with the DCT so the path agrees with
            # mel_log_dct_xla and the golden (log -> normalize -> DCT)
            out = dct_lifter(out, cfg)
    return out


# ---------------------------------------------------------------------------
# Signal-level fully fused kernel: framing happens INSIDE the kernel
# ---------------------------------------------------------------------------

def _signal_kernel(*refs, cfg, n_shifts, k_sizes, tf, kernel_dct):
    """Grid (B, nblocks). Inputs: the [B, fp, q*128] hop-row signal tensor
    (each hop split into q sub-blocks of w samples lane-padded to 128),
    blocked on the frame axis, plus a tiny per-block boundary-row tensor
    holding the first rows of the NEXT block, plus the constant matrices.
    Framing never materializes: frames @ CS distributes over the
    hop-aligned row decomposition,

        z[t] = sum_s  dot(ext_rows, D_s)[t + s]

    where D_s stacks the q sub-block slices of the combined DFT matrix for
    shift s (the last shift contracts only its valid sub-blocks — a
    128-aligned lane slice of ext — so padded K per frame is
    128*ceil(frame_length/w), e.g. 640 for 400/160 instead of 768).
    Each shift is one matmul followed by a sublane roll — no row-shifted
    HBM copies at all. Zero-padded matrix rows multiply exact zeros.
    Regular BlockSpec pipelining double-buffers the DMAs.

    HBM traffic per frame: q*128*4 bytes in + feature_dim*4 out (~1.1 KB)
    versus ~3.3 KB for the staged path, one kernel for references C3-C9
    (including kaldi_mode, folded into the DFT matrix)."""
    sig_ref, bnd_ref = refs[0], refs[1]
    groups = _group(refs[2:-1], cfg)
    d_groups = groups[:n_shifts]
    fb_refs = groups[n_shifts]
    dct_refs = groups[n_shifts + 1] if kernel_dct else None
    out_ref = refs[-1]

    # ext rows = tf + bnd_pad, where bnd_pad = 8*ceil((n_shifts-1)/8)
    ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)
    xs = _split_operand(ext, cfg)          # split ONCE, reused per shift
    z = _cdot(xs, d_groups[0], cfg, cols=k_sizes[0])[:tf]
    for s in range(1, n_shifts):
        zs = _cdot(xs, d_groups[s], cfg, cols=k_sizes[s])
        # roll requires a non-negative shift: -s mod ext_rows
        z = z + pltpu.roll(zs, zs.shape[0] - s, axis=0)[:tf]
    _sq_tail(z, fb_refs, dct_refs, out_ref, cfg, row=0)


@functools.lru_cache(maxsize=None)
def _signal_constants(cfg: FeatureConfig):
    """(d_mats, k_sizes, q): the shift-stacked DFT matrices for the signal
    kernel. d_mats[s] is [k_sizes[s], ncs_pad] covering sub-blocks
    j = s*q + c (c < q) of the combined DFT matrix, each w-row slice
    zero-padded to a 128-row group."""
    fl = cfg.frame_length
    q, w = _hop_split(cfg)
    n_w = -(-fl // w)
    n_shifts = -(-n_w // q)
    cs = _cs_constant(cfg, fold_kaldi=True)         # [fl, ncs_pad]
    ncs_p = cs.shape[1]
    d_mats, k_sizes = [], []
    for s in range(n_shifts):
        n_valid = min(q, n_w - s * q)
        d = np.zeros((n_valid * LANE, ncs_p), np.float32)
        for c in range(n_valid):
            j = s * q + c
            take = min(w, fl - j * w)
            d[c * LANE: c * LANE + take] = cs[j * w: j * w + take]
        d_mats.append(d)
        k_sizes.append(n_valid * LANE)
    return tuple(d_mats), tuple(k_sizes), q


# ---------------------------------------------------------------------------
# Kernel v5: phase-packed signal layout
# ---------------------------------------------------------------------------
#
# The v4 hop-split layout lane-pads each hop row (160 -> 2x128 = 256 lanes
# for the 400/160 presets), and building that padded tensor is a real HBM
# copy — measured at ~6 ms of a ~12 ms whisper-batch kernel path (half!).
# v5 instead packs H = 128/gcd(hop,128) hops per row, so the row width
# W = H*hop is ALREADY a lane multiple and the [B, M] -> [B, rows, W]
# reshape is free (no copy, no padding). Each row now holds H interleaved
# frame *phases*; frame t = r*H + p starts at lane p*hop of row r and its
# window spills into rows r+1... Each (phase, row-shift) pair contributes
# one 128-aligned lane window of the row block contracted against a
# slice-embedded combined-DFT matrix, followed by the same sublane-roll
# accumulation as v4. Padded K per frame drops to round128(fl)+slack
# (512-640 vs v4's 640 for 400/160) and — the real win — the input-side
# HBM copy disappears. Measured (B=128, 30 s, whisper-shaped): 6.6 ms vs
# 12.3 ms for v4 end-to-end.
#
# Applies whenever hop % 16 == 0 (H <= 8); exotic hops fall back to v4.


def _phase_count(cfg: FeatureConfig) -> int:
    return LANE // math.gcd(cfg.hop_length, LANE)


def _use_phase_layout(cfg: FeatureConfig, n_frames: int) -> bool:
    # H <= 8 keeps row width and the constant count bounded. Small calls
    # (streaming/serving steps of a few frames) stay on the v4 layout: the
    # phase path pads the frame count to 8*H and the input to row
    # multiples of H*hop, which at 10-frame serving steps costs 3x padded
    # compute, while v4's lane-pad copy is negligible at that size.
    H = _phase_count(cfg)
    return cfg.hop_length % 16 == 0 and n_frames >= 32 * H


def _fit_buffer(buf: jnp.ndarray, need: int) -> jnp.ndarray:
    """Zero-pad or truncate [B, M] to exactly ``need`` columns. Padding
    beyond M only feeds frames past n_frames (trimmed by the caller)."""
    M = buf.shape[1]
    if M < need:
        return jnp.pad(buf, ((0, 0), (0, need - M)))
    return buf[:, :need] if M > need else buf


def _split_boundary_rows(x2d: jnp.ndarray, blk: int, nblk: int,
                         n_extra: int):
    """(main, bnd, bnd_pad) for a row-blocked signal kernel: the main
    [B, nblk*blk, W] rows read in place, plus each grid block's first
    ``n_extra`` rows of the NEXT block gathered once into a tiny
    [B, nblk, bnd_pad, W] tensor. bnd_pad rounds n_extra up to a sublane
    multiple (8) so the in-kernel concat stays tile-aligned even for
    extreme frame_length/hop ratios; the zero padding rows only feed
    rolled-off output rows, so they never reach the result."""
    B = x2d.shape[0]
    bnd_pad = _round_up(max(n_extra, 1), 8)
    main = x2d[:, : nblk * blk]
    rows = [jax.lax.slice_in_dim(x2d, blk + d, blk + d + (nblk - 1) * blk + 1,
                                 stride=blk, axis=1)
            for d in range(n_extra)]                   # each [B, nblk, W]
    if not rows:
        return main, jnp.zeros((B, nblk, bnd_pad, x2d.shape[-1]),
                               jnp.float32), bnd_pad
    zeros = jnp.zeros_like(rows[0])
    bnd = jnp.stack(rows + [zeros] * (bnd_pad - len(rows)), axis=2)
    return main, bnd, bnd_pad


def _signal_pallas_call(kernel, main, bnd, consts, blk_frames: int,
                        out_cols: int, cost: pl.CostEstimate) -> jnp.ndarray:
    """Common pallas_call scaffolding for both signal-kernel layouts:
    grid (B, nblk), block-pipelined main/boundary rows, grid-invariant
    constants, [1, blk_frames, out_cols] output blocks."""
    B, _, W = main.shape
    nblk, bnd_pad = bnd.shape[1], bnd.shape[2]
    in_specs = [
        pl.BlockSpec((1, main.shape[1] // nblk, W), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bnd_pad, W), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for cmat in consts:
        in_specs.append(pl.BlockSpec(cmat.shape, lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel, grid=(B, nblk), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_frames, out_cols),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nblk * blk_frames, out_cols),
                                       jnp.float32),
        cost_estimate=cost,
        interpret=_interpret(),
    )(main, bnd, *consts)


@functools.lru_cache(maxsize=None)
def _phase_constants(cfg: FeatureConfig):
    """(plan, d_mats, max_span) for the phase-packed signal kernel.

    plan[p] is a tuple of (s, a, k, mi): row-shift s contributes the
    128-aligned lane window [a, a+k) of row r+s, contracted against
    d_mats[mi] ([k, ncs_pad] — the rows of the combined windowed DFT
    matrix for frame samples d = s*W + a + i - p*hop, zero outside
    [0, frame_length))."""
    fl, hop = cfg.frame_length, cfg.hop_length
    H = _phase_count(cfg)
    W = H * hop
    cs = _cs_constant(cfg, fold_kaldi=True)          # [fl, ncs_pad]
    ncs_p = cs.shape[1]
    plan, d_mats = [], []
    max_span = 1
    for p in range(H):
        entries = []
        span = -(-(p * hop + fl) // W)
        max_span = max(max_span, span)
        for s in range(span):
            lo = max(0, p * hop - s * W)
            hi = min(W, p * hop + fl - s * W)
            if hi <= lo:
                continue
            a = (lo // LANE) * LANE
            k = _round_up(hi, LANE) - a
            m = np.zeros((k, ncs_p), np.float32)
            d0 = s * W + a - p * hop                 # sample of matrix row 0
            r0, r1 = max(0, -d0), min(k, fl - d0)
            m[r0:r1] = cs[d0 + r0: d0 + r1]
            entries.append((s, a, k, len(d_mats)))
            d_mats.append(m)
        plan.append(tuple(entries))
    return tuple(plan), tuple(d_mats), max_span


def _phase_signal_kernel(*refs, cfg, plan, tr, kernel_dct, n_mats):
    """Grid (B, nblocks). One row block [tr, W] (+ boundary rows) -> the
    H*tr frames it contains, phases interleaved back into frame order."""
    sig_ref, bnd_ref = refs[0], refs[1]
    groups = _group(refs[2:-1], cfg)
    d_groups = groups[:n_mats]
    fb_refs = groups[n_mats]
    dct_refs = groups[n_mats + 1] if kernel_dct else None
    out_ref = refs[-1]

    ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)
    xs = _split_operand(ext, cfg)          # split ONCE, sliced per entry
    rows = ext.shape[0]
    feats = []
    for entries in plan:
        z = None
        for (s, a, k, mi) in entries:
            xcut = tuple(x[:, a: a + k] for x in xs)
            zs = _cdot(xcut, d_groups[mi], cfg)
            if s:
                zs = pltpu.roll(zs, rows - s, axis=0)
            zs = zs[:tr]
            z = zs if z is None else z + zs
        feats.append(_sq_features(z, fb_refs, dct_refs, cfg))
    stacked = jnp.stack(feats, axis=1)     # [tr, H, D]: frame t = r*H + p
    out_ref[0] = stacked.reshape(len(plan) * tr, feats[0].shape[-1])


def _signal_features_phase(buf: jnp.ndarray, n_frames: int,
                           cfg: FeatureConfig) -> jnp.ndarray:
    """Kernel-v5 entry: identical contract to :func:`signal_features`."""
    B = buf.shape[0]
    hop = cfg.hop_length
    H = _phase_count(cfg)
    W = H * hop
    plan, d_mats, max_span = _phase_constants(cfg)
    fb, dct = _folded_fb_constants(cfg)
    kernel_dct = dct is not None
    d_model = cfg.n_mfcc if kernel_dct else cfg.n_mels

    rows_total = -(-max(n_frames, 1) // H)
    # 1024-frame blocks measured ~3% over 512 at B=128x30s (M=tr+8 row
    # matmuls fill the MXU better); small inputs shrink to an 8-row block
    tr = min(max(1024 // H, 8), _round_up(rows_total, 8))
    rp = _round_up(rows_total, tr)
    nblk = rp // tr
    buf = _fit_buffer(buf, (rp + max_span - 1) * W)
    x2d = buf.reshape(B, -1, W).astype(jnp.float32)   # free reshape: no pad
    main, bnd, _ = _split_boundary_rows(x2d, tr, nblk, max_span - 1)

    consts = _pack_consts(list(d_mats) + [fb] + ([dct] if kernel_dct else []),
                          cfg)
    out_cols = (dct if kernel_dct else fb).shape[1]
    ncs_p = fb.shape[0]
    k_total = sum(k for entries in plan for (_, _, k, _) in entries)
    mm_flops = 2 * tr * (k_total * ncs_p            # DFT contractions
                         + H * ncs_p * fb.shape[1]  # mel matmuls
                         + (H * fb.shape[1] * dct.shape[1]
                            if kernel_dct else 0))  # DCT matmuls
    out = _signal_pallas_call(
        functools.partial(_phase_signal_kernel, cfg=cfg, plan=plan, tr=tr,
                          kernel_dct=kernel_dct, n_mats=len(d_mats)),
        main, bnd, consts, H * tr, out_cols,
        pl.CostEstimate(
            flops=3 * B * nblk * mm_flops,
            bytes_accessed=B * rp * W * 4 + B * rp * H * out_cols * 4,
            transcendentals=B * rp * H * ncs_p,
        ))
    return out[:, :n_frames, :d_model]


def signal_features(buf: jnp.ndarray, n_frames: int,
                    cfg: FeatureConfig, layout: str = "auto") -> jnp.ndarray:
    """Fused signal -> features: ``buf`` [B, M] is the framing buffer
    (pre-emphasized signal for signal-level configs, RAW signal for
    kaldi_mode — its per-frame conditioning is folded into the DFT matrix;
    reflect-padded for centered configs; frame t covers
    buf[t*hop : t*hop+frame_length]). Returns [B, n_frames, D] (log10-mel
    for whisper — caller normalizes; MFCCs otherwise).

    One kernel for references C3-C9: the OpenCL reference's whole device
    pipeline (6-10 launches) in a single Mosaic program.

    ``layout="auto"`` dispatches to the phase-packed v5 layout for calls
    of >= 32*H frames with 16-aligned hops (every shipped preset) and the
    v4 hop-split layout otherwise. ``layout="v4"`` pins the v4 layout:
    v5's per-frame rounding depends on the frame's call-local index mod H
    (its phase), so a caller that needs identical bits for the same frame
    across DIFFERENT call boundaries — the streaming step's bit-exact
    chunk-plan contract — must keep every call on one layout.
    """
    if layout == "auto" and _use_phase_layout(cfg, n_frames):
        return _signal_features_phase(buf, n_frames, cfg)
    B = buf.shape[0]
    hop = cfg.hop_length
    q, w = _hop_split(cfg)
    d_mats, k_sizes, _ = _signal_constants(cfg)
    n_shifts = len(d_mats)
    fb, dct = _folded_fb_constants(cfg)
    d_model = cfg.n_mfcc if dct is not None else cfg.n_mels

    tf = _block_rows(n_frames)
    fp = _round_up(max(n_frames, 1), tf)
    nblk = fp // tf
    buf = _fit_buffer(buf, (fp + n_shifts - 1) * hop)
    # hop rows split into q sub-blocks of w, each lane-padded to 128
    x2d = buf.reshape(B, -1, q, w).astype(jnp.float32)
    if w != LANE:
        x2d = jnp.pad(x2d, ((0, 0), (0, 0), (0, 0), (0, LANE - w)))
    x2d = x2d.reshape(B, -1, q * LANE)
    main, bnd, _ = _split_boundary_rows(x2d, tf, nblk, n_shifts - 1)

    kernel_dct = dct is not None
    consts = _pack_consts(list(d_mats) + [fb] + ([dct] if kernel_dct else []),
                          cfg)
    out_cols = (dct if kernel_dct else fb).shape[1]
    ncs_p = fb.shape[0]
    out = _signal_pallas_call(
        functools.partial(_signal_kernel, cfg=cfg, n_shifts=n_shifts,
                          k_sizes=k_sizes, tf=tf, kernel_dct=kernel_dct),
        main, bnd, consts, tf, out_cols,
        pl.CostEstimate(
            flops=B * fp * 6 * sum(cm.shape[0] * cm.shape[1] for cm in consts),
            bytes_accessed=B * fp * (q * LANE + out_cols) * 4,
            transcendentals=B * fp * ncs_p,
        ))
    return out[:, :n_frames, :d_model]
