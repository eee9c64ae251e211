"""Fused Pallas/Mosaic spectro-feature kernels (reference C5-C9 -> one kernel).

BASELINE.json:north_star prescribes exactly this design: "the mel-filterbank,
log, and DCT-II MFCC stages are fused into a single Pallas kernel that runs
the filterbank and DCT as MXU matmuls against precomputed dense matrices".
Where the OpenCL reference launches 6-10 NDRange kernels with HBM round trips
between each stage (SURVEY.md §3.1), this kernel makes ONE pass: a block of
frames is DMA'd to VMEM, every stage runs on-chip (MXU for the matmuls, VPU
for |X|^2 and log), and only the final features return to HBM.

Two variants, selected by ``cfg.gemm_dft``:

- **tail kernel** (default): XLA's batched rFFT produces the power spectrum;
  the kernel fuses bins->mel (MXU) -> log (VPU) -> mel->MFCC DCT (MXU).
- **full GEMM-native kernel**: the DFT itself becomes two MXU matmuls against
  precomputed windowed cos/sin matrices (matrices.dft_matrices), so raw
  frames go in and features come out of a single kernel — the MelT-style
  single-stage front-end. ~18x the FLOPs of an FFT, but the whole pipeline
  sits >3 orders of magnitude below the v5e MXU roofline (SURVEY.md §6), so
  fusing beats FLOP-counting.

Tiling (pallas_guide: f32 min tile (8,128)): the frame axis is blocked at
``TF`` rows; every lane axis is zero-padded to a multiple of 128 (257 bins ->
384, 201 -> 256, 26/80 mels -> 128, 13 MFCCs -> 128). Zero-padded matrix
rows/columns contribute exact zeros, so padding never changes the math.
Constant matrices use a grid-invariant index_map, so Mosaic keeps them
resident in VMEM across the grid instead of re-DMAing per block.

The kernel runs under ``interpret=True`` off-TPU — the Pallas interpreter is
the CPU-CI "fake backend" (SURVEY.md §4).
"""

from __future__ import annotations

import functools

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


@functools.lru_cache(maxsize=None)
def _tail_constants(cfg: FeatureConfig) -> tuple[np.ndarray, np.ndarray | None]:
    """(mel_fb [nb_pad, nm_pad], dct [nm_pad, nc_pad] or None), float32,
    zero-padded to lane multiples; lifter folded into the DCT columns."""
    nb, nm = cfg.n_bins, cfg.n_mels
    fb = matrices.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, nm, cfg.fmin, cfg.fmax_hz,
        cfg.mel_scale, cfg.mel_norm, cfg.mel_bin_style)
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
def _dft_constants(cfg: FeatureConfig) -> tuple[np.ndarray, np.ndarray]:
    """Windowed cos/sin DFT matrices [frame_length, nb_pad], float32."""
    c, s = matrices.dft_matrices(cfg.frame_length, cfg.n_fft, cfg.window)
    nb_p = _round_up(cfg.n_bins, LANE)
    cp = np.zeros((cfg.frame_length, nb_p), np.float32)
    sp = np.zeros((cfg.frame_length, nb_p), np.float32)
    cp[:, : cfg.n_bins] = c
    sp[:, : cfg.n_bins] = s
    return cp, sp


# MXU matmuls default to bf16 operand truncation; HIGHEST selects the
# 3-pass bf16 decomposition with ~float32 accuracy. The pipeline is >3
# orders of magnitude under the compute roofline, so the 3x matmul cost is
# free — and required to hold the float32 fidelity gate (BASELINE.md).
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot(a, b, precision=_HI,
                       preferred_element_type=jnp.float32)


def _mel_log_dct_body(p, fb_ref, dct_ref, out_ref, cfg: FeatureConfig):
    """Shared kernel tail: power block [TF, nb_pad] -> features block."""
    mel = _dot(p, fb_ref[:])
    kind = _log_kind(cfg)
    if kind == "natural":
        mel = jnp.log(jnp.maximum(mel, cfg.log_floor))
    elif kind == "log10":
        mel = jnp.log10(jnp.maximum(mel, cfg.log_floor))
    if dct_ref is not None:
        mel = _dot(mel, dct_ref[:])
    out_ref[:] = mel


def _tail_kernel(power_ref, fb_ref, dct_ref, out_ref, *, cfg):
    _mel_log_dct_body(power_ref[:], fb_ref, dct_ref, out_ref, cfg)


def _tail_kernel_nodct(power_ref, fb_ref, out_ref, *, cfg):
    _mel_log_dct_body(power_ref[:], fb_ref, None, out_ref, cfg)


def _full_kernel(frames_ref, c_ref, s_ref, fb_ref, dct_ref, out_ref, *, cfg):
    x = frames_ref[:]
    re = _dot(x, c_ref[:])
    im = _dot(x, s_ref[:])
    p = re * re + im * im
    if cfg.spectrum == "magnitude":
        p = jnp.sqrt(p)
    _mel_log_dct_body(p, fb_ref, dct_ref, out_ref, cfg)


def _full_kernel_nodct(frames_ref, c_ref, s_ref, fb_ref, out_ref, *, cfg):
    x = frames_ref[:]
    re = _dot(x, c_ref[:])
    im = _dot(x, s_ref[:])
    p = re * re + im * im
    if cfg.spectrum == "magnitude":
        p = jnp.sqrt(p)
    _mel_log_dct_body(p, fb_ref, None, out_ref, cfg)


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
            flops=Rp * flops_per_row,
            bytes_accessed=Rp * (K + out_cols) * 4
            + sum(c.size for c in consts) * 4,
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
    consts = (jnp.asarray(fb),) + ((jnp.asarray(dct),) if dct is not None else ())
    kernel = _tail_kernel if dct is not None else _tail_kernel_nodct
    out_cols = (dct if dct is not None else fb).shape[1]
    out = _call_rowblocked(kernel, rows, consts, out_cols, cfg)
    d = cfg.n_mfcc if dct is not None else cfg.n_mels
    return out[:, :d].reshape(*lead, d)


def dft_mel_log_dct(frames: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Fully fused GEMM-native kernel: conditioned raw frames
    [..., frame_length] -> features, one kernel for C4-C9."""
    c, s = _dft_constants(cfg)
    fb, dct = _tail_constants(cfg)
    lead = frames.shape[:-1]
    rows = frames.reshape(-1, frames.shape[-1]).astype(jnp.float32)
    consts = [jnp.asarray(c), jnp.asarray(s), jnp.asarray(fb)]
    if dct is not None:
        consts.append(jnp.asarray(dct))
        kernel = _full_kernel
    else:
        kernel = _full_kernel_nodct
    out_cols = consts[-1].shape[1]
    out = _call_rowblocked(kernel, rows, consts, out_cols, cfg,
                           extra_flops=3 * fb.shape[0])
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

def _signal_kernel(*refs, cfg, n_blocks, hop_pad, tf, kernel_dct):
    """Grid (B, nblocks). Inputs: the [B, fp, hop_pad] signal-row matrix
    (blocked on the frame axis) plus a tiny per-block boundary-row tensor
    holding the first rows of the NEXT block, plus the constant matrices.
    Framing never materializes: frames@C distributes over the hop-aligned
    row decomposition,

        re[t] = sum_j  rows[t + j] @ C[j*hop : (j+1)*hop]
              = sum_j  dot(ext_rows, C_j)[t + j]

    computed as one matmul per hop-block over the extended rows (block +
    boundary, a sublane concat of 8-aligned pieces) followed by a sublane
    roll — no row-shifted HBM copies at all. The DFT matrices are zero-
    padded past frame_length and past each hop (lane padding), so all
    padding multiplies exact zeros. Regular BlockSpec pipelining
    double-buffers the DMAs.

    HBM traffic per frame: hop_pad*4 bytes in + feature_dim*4 out (~1.1 KB)
    versus ~3.3 KB for the staged path (and 3x less than the previous
    shifted-views variant), one kernel for references C3-C9."""
    sig_ref, bnd_ref = refs[0], refs[1]
    c_ref, s_ref, fb_ref = refs[2:5]
    dct_ref = refs[5] if kernel_dct else None
    out_ref = refs[5 + (1 if kernel_dct else 0)]

    ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)  # [tf+8, hp]
    re = _dot(ext, c_ref[0:hop_pad])[:tf]
    im = _dot(ext, s_ref[0:hop_pad])[:tf]
    for j in range(1, n_blocks):
        dj_re = _dot(ext, c_ref[j * hop_pad: (j + 1) * hop_pad])
        dj_im = _dot(ext, s_ref[j * hop_pad: (j + 1) * hop_pad])
        # roll requires a non-negative shift: -j mod (tf+8)
        re = re + pltpu.roll(dj_re, tf + 8 - j, axis=0)[:tf]
        im = im + pltpu.roll(dj_im, tf + 8 - j, axis=0)[:tf]
    p = re * re + im * im
    if cfg.spectrum == "magnitude":
        p = jnp.sqrt(p)
    mel = _dot(p, fb_ref[:])
    kind = _log_kind(cfg)
    if kind == "natural":
        mel = jnp.log(jnp.maximum(mel, cfg.log_floor))
    elif kind == "log10":
        mel = jnp.log10(jnp.maximum(mel, cfg.log_floor))
    if dct_ref is not None:
        mel = _dot(mel, dct_ref[:])
    out_ref[0] = mel


def signal_features(buf: jnp.ndarray, n_frames: int,
                    cfg: FeatureConfig) -> jnp.ndarray:
    """Fused signal -> features: ``buf`` [B, M] is the framing buffer
    (pre-emphasized signal, reflect-padded for centered configs; frame t
    covers buf[t*hop : t*hop+frame_length]). Returns [B, n_frames, D]
    (log10-mel for whisper — caller normalizes; MFCCs otherwise).

    One kernel for references C3-C9: the OpenCL reference's whole device
    pipeline (6-10 launches) in a single Mosaic program. kaldi_mode's
    per-frame conditioning needs materialized frames — use the staged path.
    """
    if cfg.kaldi_mode:
        raise ValueError("kaldi_mode uses the staged pallas path")
    B, M = buf.shape
    fl, hop = cfg.frame_length, cfg.hop_length
    k, r = divmod(fl, hop)
    n_blocks = k + (1 if r else 0)
    hop_pad = _round_up(hop, LANE)
    c, s = _dft_constants(cfg)
    fb, dct = _tail_constants(cfg)
    d_model = cfg.n_mfcc if dct is not None else cfg.n_mels

    # DFT matrices rearranged into n_blocks row-blocks of hop_pad rows:
    # block j rows [0:hop] = C[j*hop:(j+1)*hop] (clipped at frame_length),
    # remaining rows zero -> lane padding and beyond-frame samples multiply
    # exact zeros.
    cz = np.zeros((n_blocks * hop_pad, c.shape[1]), np.float32)
    sz = np.zeros((n_blocks * hop_pad, s.shape[1]), np.float32)
    for j in range(n_blocks):
        take = min(hop, fl - j * hop)
        cz[j * hop_pad: j * hop_pad + take] = c[j * hop: j * hop + take]
        sz[j * hop_pad: j * hop_pad + take] = s[j * hop: j * hop + take]

    tf = _block_rows(n_frames)
    fp = _round_up(max(n_frames, 1), tf)
    rows_needed = fp + n_blocks - 1
    need = rows_needed * hop
    if M < need:
        buf = jnp.pad(buf, ((0, 0), (0, need - M)))
    elif M > need:
        buf = buf[:, :need]
    x2d = buf.reshape(B, rows_needed, hop).astype(jnp.float32)
    if hop_pad != hop:
        x2d = jnp.pad(x2d, ((0, 0), (0, 0), (0, hop_pad - hop)))
    # main blocks read x2d in place; each grid block also needs the first
    # n_blocks-1 rows of the NEXT block — gathered once into a tiny
    # [B, nblk, 8, hop_pad] boundary tensor (8-row padded so the in-kernel
    # sublane concat stays tile-aligned). The zero padding rows only feed
    # rolled-off output rows, so they never reach the result.
    nblk = fp // tf
    main = x2d[:, :fp]
    bnd_rows = [jax.lax.slice_in_dim(x2d, tf + d, tf + d + (nblk - 1) * tf + 1,
                                     stride=tf, axis=1)
                for d in range(n_blocks - 1)]          # each [B, nblk, hp]
    zeros = jnp.zeros_like(bnd_rows[0]) if bnd_rows else None
    bnd = jnp.stack(bnd_rows + [zeros] * (8 - len(bnd_rows)), axis=2)         if bnd_rows else jnp.zeros((B, nblk, 8, x2d.shape[-1]), jnp.float32)

    consts = [jnp.asarray(cz), jnp.asarray(sz), jnp.asarray(fb)]
    kernel_dct = dct is not None
    if kernel_dct:
        consts.append(jnp.asarray(dct))
    out_cols = consts[-1].shape[1]

    in_specs = [
        pl.BlockSpec((1, tf, hop_pad), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8, hop_pad), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for cmat in consts:
        in_specs.append(pl.BlockSpec(cmat.shape, lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    nbp = c.shape[1]
    out = pl.pallas_call(
        functools.partial(_signal_kernel, cfg=cfg, n_blocks=n_blocks,
                          hop_pad=hop_pad, tf=tf, kernel_dct=kernel_dct),
        grid=(B, nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tf, out_cols), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, fp, out_cols), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * fp * 2 * sum(cm.shape[0] * cm.shape[1] for cm in consts),
            bytes_accessed=B * fp * (hop_pad + out_cols) * 4,
            transcendentals=B * fp * nbp,
        ),
        interpret=_interpret(),
    )(main, bnd, *consts)
    return out[:, :n_frames, :d_model]
