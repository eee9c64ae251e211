"""ASR encoders fed by the front-end (config 5 / BASELINE.json:configs[4]).

The stretch config demonstrates the north-star's claim end-to-end: with the
fused front-end, feature extraction is never the bottleneck in front of an
ASR encoder. Two encoder families, both flax.linen, both shape-static and
mask-aware so they jit/pjit cleanly:

- :class:`WhisperEncoder` — Whisper-style: two GELU convs (the second
  stride-2), fixed sinusoidal positions, pre-LN transformer blocks.
  ``whisper_tiny()`` matches the tiny architecture (d=384, 4 layers,
  6 heads).
- :class:`ConformerEncoder` — Conformer blocks (macaron FFN halves, MHSA,
  depthwise-conv module), subsampled input projection.

Padding is handled with additive attention masks derived from the
front-end's frame mask, so batched variable-length utterances run at static
shapes end-to-end.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal position embedding (Whisper-style), float32."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


def _attn_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T] bool -> additive [B, 1, 1, T] bias (-inf on padding)."""
    return jnp.where(mask, 0.0, -1e9)[:, None, None, :]


class MHSA(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, bias):
        B, T, _ = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="q")(x)
        k = nn.Dense(self.dim, use_bias=False, name="k")(x)
        v = nn.Dense(self.dim, name="v")(x)
        q, k, v = (a.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
                   for a in (q, k, v))
        # scaled dot-product attention; bias masks padded keys
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd) + bias
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        return nn.Dense(self.dim, name="out")(out)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_mult: int = 4

    @nn.compact
    def __call__(self, x, bias):
        x = x + MHSA(self.dim, self.heads)(nn.LayerNorm()(x), bias)
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mlp_mult)(h)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim)(h)


class WhisperEncoder(nn.Module):
    """Whisper-style audio encoder: log-mel [B, T, n_mels] -> [B, T//2, dim]."""
    dim: int = 384
    layers: int = 4
    heads: int = 6
    max_frames: int = 3000

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        B, T, _ = mel.shape
        if mask is None:
            mask = jnp.ones((B, T), bool)
        # zero padding frames so the convs' receptive fields can't leak
        # padding garbage into valid positions (mask-invariance contract)
        mel = mel * mask[..., None]
        x = nn.gelu(nn.Conv(self.dim, (3,), padding=1)(mel))
        x = nn.gelu(nn.Conv(self.dim, (3,), strides=(2,), padding=1)(x))
        t2 = x.shape[1]
        x = x + jnp.asarray(sinusoids(self.max_frames, self.dim))[None, :t2]
        mask2 = mask[:, ::2][:, :t2]
        bias = _attn_bias(mask2)
        for _ in range(self.layers):
            x = TransformerBlock(self.dim, self.heads)(x, bias)
        return nn.LayerNorm()(x), mask2


class ConvModule(nn.Module):
    dim: int
    kernel: int = 15

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm()(x)
        h = nn.Dense(2 * self.dim)(h)
        h = nn.glu(h, axis=-1)
        h = h * mask[..., None]  # keep padding out of the depthwise conv
        h = nn.Conv(self.dim, (self.kernel,), feature_group_count=self.dim,
                    padding="SAME")(h)
        # LayerNorm instead of BatchNorm: batch-stat-free -> jit/pjit-clean
        h = nn.swish(nn.LayerNorm()(h))
        return nn.Dense(self.dim)(h)


class FFModule(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.swish(nn.Dense(self.dim * self.mult)(h))
        return nn.Dense(self.dim)(h)


class ConformerBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mask, bias):
        x = x + 0.5 * FFModule(self.dim)(x)
        x = x + MHSA(self.dim, self.heads)(nn.LayerNorm()(x), bias)
        x = x + ConvModule(self.dim)(x, mask)
        x = x + 0.5 * FFModule(self.dim)(x)
        return nn.LayerNorm()(x)


class ConformerEncoder(nn.Module):
    """Conformer encoder: features [B, T, D] -> [B, T//subsample, dim]."""
    dim: int = 144
    layers: int = 4
    heads: int = 4
    subsample: int = 2

    @nn.compact
    def __call__(self, feat: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        B, T, _ = feat.shape
        if mask is None:
            mask = jnp.ones((B, T), bool)
        feat = feat * mask[..., None]  # see WhisperEncoder: mask invariance
        s = self.subsample
        x = nn.Dense(self.dim)(feat)
        if s > 1:
            pad = (-T) % s
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            m = jnp.pad(mask, ((0, 0), (0, pad)))
            x = x.reshape(B, -1, s * self.dim)
            x = nn.Dense(self.dim)(x)
            mask = m.reshape(B, -1, s).any(axis=-1)
        bias = _attn_bias(mask)
        mf = mask.astype(x.dtype)
        for _ in range(self.layers):
            x = ConformerBlock(self.dim, self.heads)(x, mf, bias)
        return x, mask


def whisper_tiny() -> WhisperEncoder:
    return WhisperEncoder(dim=384, layers=4, heads=6)


def conformer_small() -> ConformerEncoder:
    return ConformerEncoder(dim=144, layers=4, heads=4)
