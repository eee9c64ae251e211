"""X-vector speaker embeddings (Snyder et al. 2018 — the DNN successor
to i-vectors in the Kaldi speaker-ID recipes; ``nnet3`` xvector
analogue). Frame features -> TDNN (dilated 1-D convs, all MXU matmuls)
-> masked statistics pooling (mean + stddev over valid frames) ->
bottleneck embedding. Embeddings feed the SAME backend as i-vectors:
``length_normalize`` -> ``train_plda`` -> ``Plda.score`` (tested), and
:func:`tpufeat.diarization.cluster_affinity` for diarization.

TPU notes: the TDNN is ``nn.Conv`` with ``kernel_dilation`` — XLA lowers
each layer to one convolution that tiles onto the MXU; pooling is a
masked mean/variance (two reductions, no gathers); everything is
shape-static, so padded variable-length batches jit once per bucket.
Training is plain softmax cross-entropy over speaker labels
(``xvector_train_step``); for real systems swap the head for additive-
margin softmax — the embedding API is unchanged.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["XvectorNet", "xvector_model", "extract_xvectors",
           "xvector_train_step", "XvectorState"]


class XvectorNet(nn.Module):
    """TDNN x-vector network: [B, T, D] features + [B, T] mask ->
    ([B, embed_dim] embeddings, [B, n_speakers] logits). ``embed_dim``
    is the classic "xvector" tap (the first affine after pooling,
    pre-nonlinearity, Kaldi's segment6)."""

    n_speakers: int
    embed_dim: int = 192
    channels: int = 256
    context: Sequence[tuple[int, int]] = ((5, 1), (3, 2), (3, 3),
                                          (1, 1), (1, 1))

    @nn.compact
    def __call__(self, feats, mask):
        x = feats
        m = mask.astype(jnp.float32)[..., None]              # [B, T, 1]
        for i, (width, dilation) in enumerate(self.context):
            x = nn.Conv(self.channels, (width,),
                        kernel_dilation=(dilation,),
                        padding="SAME", name=f"tdnn{i}")(x * m)
            x = nn.relu(nn.LayerNorm(name=f"ln{i}")(x))
        # masked statistics pooling: mean + stddev over valid frames
        x = x * m
        n = jnp.maximum(m.sum(axis=1), 1.0)                  # [B, 1]
        mean = x.sum(axis=1) / n
        var = (x * x).sum(axis=1) / n - mean * mean
        stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-8))],
                                axis=-1)                     # [B, 2C]
        emb = nn.Dense(self.embed_dim, name="embed")(stats)  # the xvector
        h = nn.relu(nn.LayerNorm(name="ln_emb")(emb))
        h = nn.relu(nn.LayerNorm(name="ln_seg7")(
            nn.Dense(self.embed_dim, name="seg7")(h)))
        logits = nn.Dense(self.n_speakers, name="head")(h)
        return emb, logits


def xvector_model(n_speakers: int, *, embed_dim: int = 192,
                  channels: int = 256) -> XvectorNet:
    return XvectorNet(n_speakers=n_speakers, embed_dim=embed_dim,
                      channels=channels)


class XvectorState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def xvector_train_step(state: XvectorState, feats, mask, labels, *,
                       model: XvectorNet, tx):
    """One softmax cross-entropy step over speaker labels; pure function
    of (state, batch) — jit/pjit it like ``ctc_train_step``."""
    import optax

    def loss_fn(params):
        _, logits = model.apply(params, feats, mask)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return XvectorState(params, opt_state, state.step + 1), loss


def extract_xvectors(params, model: XvectorNet, feats,
                     num_frames=None) -> jnp.ndarray:
    """[B, T, D] padded features (+ optional [B] valid frame counts) ->
    [B, embed_dim] embeddings. Feed these to ``tpufeat.length_normalize``
    + ``tpufeat.train_plda`` exactly like utterance i-vectors."""
    feats = jnp.asarray(feats, jnp.float32)
    if feats.ndim == 2:
        feats = feats[None]
    B, T, _ = feats.shape
    if num_frames is None:
        mask = jnp.ones((B, T), jnp.float32)
    else:
        mask = (jnp.arange(T)[None, :]
                < jnp.asarray(num_frames)[:, None]).astype(jnp.float32)
    emb, _ = model.apply(params, feats, mask)
    return emb
