"""End-to-end training/serving step: front-end + encoder (config 5).

Demonstrates the north-star claim — the fused front-end adds negligible time
in front of an encoder — and provides the multi-chip "training step" the
driver dry-runs: raw audio in, CTC loss out, batch dp-sharded over the mesh,
parameters replicated, gradients psum'd by XLA from the sharding spec alone.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufeat import features
from tpufeat.config import WHISPER80, FeatureConfig
from tpufeat.models import encoder as enc_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_models(dim=384, layers=4, heads=6, vocab=64,
                arch: str = "whisper"):
    import flax.linen as nn

    class ASRModel(nn.Module):
        @nn.compact
        def __call__(self, mel, mask):
            if arch == "whisper":
                enc = enc_lib.WhisperEncoder(dim=dim, layers=layers,
                                             heads=heads)
            else:
                enc = enc_lib.ConformerEncoder(dim=dim, layers=layers,
                                               heads=heads)
            x, m2 = enc(mel, mask)
            logits = nn.Dense(vocab, name="head")(x)
            return logits, m2

    return ASRModel()


def asr_forward(params, model, audio, lengths, cfg: FeatureConfig):
    """Raw audio -> (logits, frame mask): the full serving path under jit."""
    res = features.extract_impl(audio, lengths, cfg)
    return model.apply(params, res.features, res.mask)


def ctc_train_step(state: TrainState, audio, lengths, labels,
                   label_lengths, *, model, tx, cfg: FeatureConfig):
    """One CTC training step; pure function of (state, batch)."""

    def loss_fn(params):
        logits, mask = asr_forward(params, model, audio, lengths, cfg)
        logit_pad = 1.0 - mask.astype(jnp.float32)
        label_pad = (jnp.arange(labels.shape[1])[None, :]
                     >= label_lengths[:, None]).astype(jnp.float32)
        per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad)
        return jnp.mean(per_seq)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def dryrun_train_step(mesh: Mesh, arch: str = "whisper") -> float:
    """Tiny end-to-end training step on the given mesh: dp-sharded audio,
    replicated params. Called by __graft_entry__.dryrun_multichip."""
    n_dev = mesh.devices.size
    B = n_dev * 2
    n = 16000
    cfg = dataclasses.replace(WHISPER80, use_pallas=False)
    model = make_models(dim=32, layers=1, heads=2, vocab=16, arch=arch)
    tx = optax.adamw(1e-4)

    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((B, n)) * 0.1).astype(np.float32))
    lengths = jnp.full((B,), n, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 16, size=(B, 8)), jnp.int32)
    label_lengths = jnp.full((B,), 8, jnp.int32)

    res = features.extract_impl(audio[:1], lengths[:1], cfg)
    params = model.init(jax.random.PRNGKey(0), res.features, res.mask)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    audio = jax.device_put(audio, dp)
    lengths = jax.device_put(lengths, dp)
    labels = jax.device_put(labels, dp)
    label_lengths = jax.device_put(label_lengths, dp)
    state = jax.device_put(state, rep)

    step = jax.jit(
        functools.partial(ctc_train_step, model=model, tx=tx, cfg=cfg),
        in_shardings=(rep, dp, dp, dp, dp),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    state, loss = step(state, audio, lengths, labels, label_lengths)
    loss = float(loss)
    assert np.isfinite(loss), loss
    print(f"dryrun train step ({arch}, {n_dev} devices): ctc loss {loss:.3f}")

    # RNN-T step on the same mesh (stateless-predictor transducer);
    # `res` from the CTC init above has identical inputs — reuse it
    tmodel = make_transducer(dim=32, layers=1, heads=2, vocab=16,
                             arch=arch)
    tparams = tmodel.init(jax.random.PRNGKey(1), res.features, res.mask,
                          labels[:1])
    tstate = jax.device_put(
        TrainState(tparams, tx.init(tparams), jnp.zeros((), jnp.int32)),
        rep)
    tstep = jax.jit(
        functools.partial(transducer_train_step, model=tmodel, tx=tx,
                          cfg=cfg),
        in_shardings=(rep, dp, dp, dp, dp),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    _, tloss = tstep(tstate, audio, lengths, labels, label_lengths)
    tloss = float(tloss)
    assert np.isfinite(tloss), tloss
    print(f"dryrun train step ({arch}, {n_dev} devices): "
          f"rnnt loss {tloss:.3f}")
    return loss


# --- checkpoint/resume for training state (SURVEY.md §5) ---

def save_train_state(path: str, state: TrainState) -> None:
    """Persist a TrainState with orbax (async-capable, TPU-native)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, state, force=True)


def load_train_state(path: str, like: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_train_state`; ``like``
    supplies the pytree structure/shapes (e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path, like)


def greedy_ctc_decode(logits: jnp.ndarray, mask: jnp.ndarray,
                      blank: int = 0) -> list[list[int]]:
    """Greedy CTC decoding: argmax per frame, collapse repeats, drop blanks.
    Completes the serving story: audio -> asr_forward -> token ids."""
    ids = np.asarray(jnp.argmax(logits, axis=-1))
    valid = np.asarray(mask)
    out = []
    for b in range(ids.shape[0]):
        seq, prev = [], -1
        for t in range(ids.shape[1]):
            if not valid[b, t]:
                break
            tok = int(ids[b, t])
            if tok != prev and tok != blank:
                seq.append(tok)
            prev = tok
        out.append(seq)
    return out


def edit_distance(ref, hyp) -> int:
    """Levenshtein distance between two token sequences (the WER/CER
    core). O(|ref|*|hyp|) rolling-row DP on host — evaluation is control
    logic, not device compute (docs/DESIGN.md §8)."""
    return sum(edit_alignment(ref, hyp))


def edit_alignment(ref, hyp) -> tuple[int, int, int]:
    """(substitutions, insertions, deletions) of a minimum-cost
    alignment (Kaldi ``compute-wer`` tie-breaking is implementation-
    defined; this one prefers substitution on ties, like sclite).
    ``sum(edit_alignment(r, h)) == edit_distance(r, h)``."""
    ref, hyp = list(ref), list(hyp)
    R, H = len(ref), len(hyp)
    # each cell: (total, sub, ins, dele) — counts ride along the DP
    prev = [(j, 0, j, 0) for j in range(H + 1)]
    for i in range(1, R + 1):
        cur = [(i, 0, 0, i)] + [None] * H
        for j in range(1, H + 1):
            diag = prev[j - 1]
            hit = ref[i - 1] == hyp[j - 1]
            best = (diag[0] + (not hit), diag[1] + (not hit), diag[2],
                    diag[3])
            up = prev[j]                                   # deletion
            if up[0] + 1 < best[0]:
                best = (up[0] + 1, up[1], up[2], up[3] + 1)
            left = cur[j - 1]                              # insertion
            if left[0] + 1 < best[0]:
                best = (left[0] + 1, left[1], left[2] + 1, left[3])
            cur[j] = best
        prev = cur
    _, sub, ins, dele = prev[H]
    return sub, ins, dele


def token_error_rate(refs, hyps) -> dict:
    """Corpus token error rate (WER over word ids / CER over char ids):
    sum of edit distances over the total reference length, with the
    insertion/deletion/substitution breakdown (``compute-wer`` shape).

    Returns {"ter", "errors", "sub", "ins", "del", "ref_tokens",
    "utterances"}; ter is errors/ref_tokens (inf if the reference is
    empty but hypotheses are not)."""
    if len(refs) != len(hyps):
        raise ValueError(f"{len(refs)} references vs {len(hyps)} "
                         "hypotheses")
    sub = ins = dele = 0
    for r, h in zip(refs, hyps):
        s, i, d = edit_alignment(r, h)
        sub, ins, dele = sub + s, ins + i, dele + d
    errors = sub + ins + dele
    n_ref = sum(len(list(r)) for r in refs)
    if n_ref == 0:
        ter = 0.0 if errors == 0 else float("inf")
    else:
        ter = errors / n_ref
    return {"ter": ter, "errors": errors, "sub": sub, "ins": ins,
            "del": dele, "ref_tokens": n_ref, "utterances": len(refs)}


# --- RNN-T / transducer objective (beyond-reference training tier) ---

def transducer_loss(logits: jnp.ndarray, logit_lengths, labels,
                    label_lengths, *, blank: int = 0) -> jnp.ndarray:
    """RNN-T loss (Graves 2012): ``logits`` [B, T, U+1, V] joint-network
    outputs over T encoder frames x U+1 prediction states, ``labels``
    [B, U] (+ per-sequence valid lengths) -> per-sequence negative log
    marginal over all monotonic alignments, [B].

    TPU formulation: the standard alpha recursion runs as ONE
    ``lax.scan`` over T with an [B, U+1] log-space carry — per step,
    "emit blank from t-1" is an elementwise add and "emit label u-1"
    is a one-position shift (static pad+slice, no gathers). Padded
    frames freeze alpha; padded label positions carry -inf emit scores,
    so ragged batches need no bucketing inside the loss. Gradients come
    from autodiff through the scan (the usual alpha-beta hand gradient
    is an optimization, not a requirement — verified against finite
    differences in tests/test_models.py)."""
    lp = jax.nn.log_softmax(logits, axis=-1)           # [B, T, U+1, V]
    B, T, U1, V = lp.shape
    U = U1 - 1
    labels = jnp.asarray(labels, jnp.int32)
    if labels.shape != (B, U):
        raise ValueError(f"labels {labels.shape} vs logits U={U}")
    llen = jnp.asarray(label_lengths, jnp.int32)
    tlen = jnp.asarray(logit_lengths, jnp.int32)
    neg = jnp.asarray(-1e30, lp.dtype)

    blank_lp = lp[..., blank]                          # [B, T, U+1]
    # emit score at state u: log P(labels[u] | t, u), -inf past llen
    emit_lp = jnp.take_along_axis(
        lp[:, :, :U, :], labels[:, None, :, None], axis=-1)[..., 0]
    u_ix = jnp.arange(U)[None, :]
    emit_lp = jnp.where(u_ix[:, None, :] < llen[:, None, None],
                        emit_lp, neg)                  # [B, T, U]

    # alpha over label states for t=0: only label emissions advance u
    a0 = jnp.concatenate(
        [jnp.zeros((B, 1), lp.dtype),
         jnp.cumsum(emit_lp[:, 0, :], axis=-1)], axis=-1)  # [B, U+1]
    mask_u = (jnp.arange(U1)[None, :]
              <= llen[:, None]).astype(lp.dtype)
    a0 = jnp.where(mask_u > 0, a0, neg)

    def step(alpha, inp):
        blp, elp, t = inp                              # [B,U+1],[B,U],[]
        stay = alpha + blp                             # blank from t-1
        # within-frame label chain: a[u] = logsumexp(stay[u],
        # a[u-1] + emit[u-1]); sequential in u — U is small (labels per
        # utterance), so a fori over U states is fine
        def body(u, a):
            cand = a[:, u] .astype(lp.dtype)
            prev = a[:, u - 1] + elp[:, u - 1]
            return a.at[:, u].set(jnp.logaddexp(cand, prev))
        a = jax.lax.fori_loop(1, U1, body, stay)
        valid_t = (t < tlen).astype(lp.dtype)[:, None]
        a = jnp.where(valid_t > 0, a, alpha)
        return a, None

    ts = jnp.arange(1, T)
    # step t computes alpha(t, .): blank consumed at frame t-1, label
    # emissions within frame t
    alpha, _ = jax.lax.scan(
        step, a0, (jnp.swapaxes(blank_lp[:, :-1], 0, 1),
                   jnp.swapaxes(emit_lp[:, 1:], 0, 1), ts))
    # final blank from (tlen-1, llen): pick alpha[llen] + blank at tlen-1
    sel_u = jax.nn.one_hot(llen, U1, dtype=lp.dtype)
    a_fin = jnp.sum(alpha * sel_u, axis=-1)
    sel_t = jax.nn.one_hot(tlen - 1, T, dtype=lp.dtype)
    b_fin = jnp.einsum("bt,btu->bu", sel_t, blank_lp)
    b_fin = jnp.sum(b_fin * sel_u, axis=-1)
    return -(a_fin + b_fin)


def greedy_transducer_decode(joint_fn, enc: jnp.ndarray, mask,
                             max_symbols: int = 200, *,
                             blank: int = 0):
    """Greedy RNN-T decoding on host (per utterance; the joint is a
    caller-supplied ``joint_fn(enc_frame [D], history list) -> [V]``
    callable — model-agnostic). Returns the emitted label list."""
    out = []
    m = np.asarray(mask).astype(bool)
    for t in range(enc.shape[0]):
        if not m[t]:
            break
        emitted = 0
        while emitted < max_symbols:
            v = np.asarray(joint_fn(enc[t], out))
            k = int(v.argmax())
            if k == blank:
                break
            out.append(k)
            emitted += 1
    return out


def make_transducer(dim: int = 128, layers: int = 2, heads: int = 4,
                    vocab: int = 64, context: int = 2,
                    arch: str = "conformer"):
    """Streaming-ASR transducer (encoder + STATELESS prediction network
    + joint): the prediction net is an embedding over the last
    ``context`` labels (Ghodsi et al. 2020 "stateless transducer") so
    the whole model stays a pure feed-forward jit — no recurrent carry.
    Returns a flax module whose ``__call__(mel, mask, labels)`` yields
    [B, T, U+1, V] joint logits for :func:`transducer_loss` (the label
    axis is blank-prepended history positions)."""
    import flax.linen as nn

    class Transducer(nn.Module):
        @nn.compact
        def __call__(self, mel, mask, labels):
            if arch == "whisper":
                enc = enc_lib.WhisperEncoder(dim=dim, layers=layers,
                                             heads=heads)
            else:
                enc = enc_lib.ConformerEncoder(dim=dim, layers=layers,
                                               heads=heads)
            x, m2 = enc(mel, mask)                       # [B, T, D]
            B, U = labels.shape
            # prediction input u: the context labels BEFORE position u
            # (u=0 sees only padding) — embeddings summed, the stateless
            # predictor
            emb = nn.Embed(vocab + 2, dim, name="pred_embed")
            hist = jnp.zeros((B, U + 1, dim))
            padded = jnp.pad(labels + 1, ((0, 0), (context, 0)))
            for c in range(context):
                hist = hist + emb(padded[:, context - 1 - c:
                                         context - 1 - c + U + 1])
            g = nn.relu(nn.LayerNorm(name="pred_ln")(
                nn.Dense(dim, name="pred_proj")(hist)))  # [B, U+1, D]
            j = (nn.Dense(dim, name="joint_enc")(x)[:, :, None, :]
                 + nn.Dense(dim, name="joint_pred")(g)[:, None, :, :])
            logits = nn.Dense(vocab, name="joint_out")(jnp.tanh(j))
            return logits, m2

    return Transducer()


def transducer_train_step(state: TrainState, audio, lengths, labels,
                          label_lengths, *, model, tx,
                          cfg: FeatureConfig):
    """One RNN-T training step (pure function of (state, batch), like
    :func:`ctc_train_step`): raw audio -> front-end -> encoder ->
    stateless prediction/joint -> :func:`transducer_loss`."""

    def loss_fn(params):
        res = features.extract_impl(audio, lengths, cfg)
        logits, mask = model.apply(params, res.features, res.mask,
                                   labels)
        tlen = mask.astype(jnp.int32).sum(axis=-1)
        return jnp.mean(transducer_loss(logits, tlen, labels,
                                        label_lengths))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def beam_transducer_decode(joint_fn, enc: jnp.ndarray, mask,
                           beam: int = 4, max_symbols: int = 200, *,
                           blank: int = 0):
    """Beam-search RNN-T decoding on host (single utterance; the joint
    is the same caller-supplied ``joint_fn(enc_frame, history) -> [V]``
    UNNORMALIZED logits callable as :func:`greedy_transducer_decode`).

    Time-synchronous transducer beam search, expanded BY HISTORY LENGTH
    within each frame so identical histories merge exactly once before
    expansion (every path to a history has the same length, so one
    pass per length suffices); blank-consumed masses accumulate in the
    frame's done-set with -inf-safe log-adds (np.logaddexp), and the
    frame terminates early once the best pending hypothesis can no
    longer beat the worst retained done score (the standard A/B test —
    emission mass strictly decreases, so this fires after a few
    lengths instead of max_symbols joint calls). Returns the best
    label list."""
    m = np.asarray(mask).astype(bool)
    beams = {(): 0.0}                       # history tuple -> logp
    for t in range(enc.shape[0]):
        if not m[t]:
            break
        # bucket the incoming hypotheses by history length; expand
        # shortest-first so extensions merge before their own expansion
        pending: dict = {}
        for hist, lp in beams.items():
            pending.setdefault(len(hist), {})[hist] = lp
        min_len = min(pending) if pending else 0
        done: dict = {}
        length = min_len
        while pending and length <= min_len + max_symbols:
            layer = pending.pop(length, None)
            length += 1
            if not layer:
                continue
            # A/B early exit: nothing pending can beat the retained set
            if len(done) >= beam:
                bar = sorted(done.values(), reverse=True)[beam - 1]
                best_pending = max(
                    max(d.values()) for d in ([layer] +
                                              list(pending.values())))
                if best_pending < bar:
                    break
            top = sorted(layer.items(), key=lambda kv: -kv[1])[:beam]
            for hist, lp in top:
                logits = np.asarray(joint_fn(enc[t], list(hist)),
                                    np.float64)
                logp = logits - np.logaddexp.reduce(logits)
                b_lp = lp + logp[blank]
                done[hist] = (np.logaddexp(done[hist], b_lp)
                              if hist in done else b_lp)
                nxt = pending.setdefault(len(hist) + 1, {})
                for v in np.argsort(logp)[::-1][:beam]:
                    if v == blank:
                        continue
                    h2 = hist + (int(v),)
                    l2 = lp + logp[v]
                    nxt[h2] = (np.logaddexp(nxt[h2], l2)
                               if h2 in nxt else l2)
        beams = dict(sorted(done.items(), key=lambda kv: -kv[1])[:beam])
    best = max(beams.items(), key=lambda kv: kv[1])[0]
    return list(best)


def prefix_beam_ctc_decode(log_probs, mask, beam: int = 8, *,
                           blank: int = 0):
    """CTC prefix beam search on host (Hannun et al.): [T, V]
    log-softmaxed frame posteriors (+ [T] validity mask) -> best label
    list. Each prefix carries separate blank-ending / nonblank-ending
    log masses so repeats collapse exactly; prefixes merge by log-sum.
    Exact when ``beam`` covers the prefix space (tested vs exhaustive
    sequence search)."""
    import math

    lp = np.asarray(log_probs, np.float64)
    m = np.asarray(mask).astype(bool)
    NEG = -np.inf

    def lse(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        hi, lo = (a, b) if a >= b else (b, a)
        return hi + math.log1p(math.exp(lo - hi))

    # prefix -> (logp ending in blank, logp ending in its last symbol)
    beams = {(): (0.0, NEG)}
    for t in range(lp.shape[0]):
        if not m[t]:
            break
        nxt: dict = {}

        def add(pref, b_, nb_):
            ob, onb = nxt.get(pref, (NEG, NEG))
            nxt[pref] = (lse(ob, b_), lse(onb, nb_))

        for pref, (pb, pnb) in beams.items():
            total = lse(pb, pnb)
            # blank keeps the prefix, ends in blank
            add(pref, total + lp[t, blank], NEG)
            if pref:
                # repeat the last symbol: only extends the nonblank mass
                add(pref, NEG, pnb + lp[t, pref[-1]])
            for v in range(lp.shape[1]):
                if v == blank:
                    continue
                ext = pref + (v,)
                if pref and v == pref[-1]:
                    # same symbol after a blank -> new occurrence
                    add(ext, NEG, pb + lp[t, v])
                else:
                    add(ext, NEG, total + lp[t, v])
        beams = dict(sorted(nxt.items(),
                            key=lambda kv: -lse(*kv[1]))[:beam])
    best = max(beams.items(), key=lambda kv: lse(*kv[1]))[0]
    return list(best)
