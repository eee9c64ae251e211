"""Training + evaluation loop, end to end (config 5).

Raw audio -> front-end (inside the jitted train step) -> tiny Whisper
encoder -> CTC loss -> a few optimization steps -> prefix-beam decode ->
WER; then the same loop with the RNN-T objective (stateless-predictor
transducer) and beam-search decoding. Runs on CPU (small shapes) or TPU.

    python examples/train_eval.py
"""
import dataclasses
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from tpufeat import features
    from tpufeat.config import WHISPER80
    from tpufeat.models import train

    cfg = dataclasses.replace(WHISPER80, use_pallas=False)
    rng = np.random.default_rng(0)
    B, n = 2, 8000
    audio = jnp.asarray((0.1 * rng.standard_normal((B, n)))
                        .astype(np.float32))
    lengths = jnp.full((B,), n, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 12, (B, 5)), jnp.int32)
    label_lens = jnp.full((B,), 5, jnp.int32)

    model = train.make_models(dim=32, layers=1, heads=2, vocab=12)
    tx = optax.adamw(3e-3)
    res = features.extract_impl(audio, lengths, cfg)
    params = model.init(jax.random.PRNGKey(0), res.features, res.mask)
    state = train.TrainState(params, tx.init(params),
                             jnp.zeros((), jnp.int32))
    step = jax.jit(functools.partial(train.ctc_train_step, model=model,
                                     tx=tx, cfg=cfg))
    for i in range(5):
        state, loss = step(state, audio, lengths, labels, label_lens)
        print(f"step {i}: ctc loss {float(loss):.3f}")

    logits, mask = train.asr_forward(state.params, model, audio, lengths,
                                     cfg)
    hyps = train.greedy_ctc_decode(logits, mask)
    lp = jax.nn.log_softmax(logits, axis=-1)
    beam_hyps = [train.prefix_beam_ctc_decode(
        np.asarray(lp[b]), np.asarray(mask[b]), beam=4)
        for b in range(B)]
    refs = [np.asarray(labels)[b, : int(label_lens[b])].tolist()
            for b in range(B)]
    print("eval greedy:", train.token_error_rate(refs, hyps))
    print("eval beam:  ", train.token_error_rate(refs, beam_hyps))

    # --- the same loop with the RNN-T objective ---------------------------
    tmodel = train.make_transducer(dim=32, layers=1, heads=2, vocab=12,
                                   arch="whisper")
    tparams = tmodel.init(jax.random.PRNGKey(1), res.features, res.mask,
                          labels)
    tstate = train.TrainState(tparams, tx.init(tparams),
                              jnp.zeros((), jnp.int32))
    tstep = jax.jit(functools.partial(train.transducer_train_step,
                                      model=tmodel, tx=tx, cfg=cfg))
    for i in range(5):
        tstate, tloss = tstep(tstate, audio, lengths, labels, label_lens)
        print(f"step {i}: rnnt loss {float(tloss):.3f}")

    # beam decode the first utterance via the trained joint
    res2 = features.extract_impl(audio, lengths, cfg)
    enc_apply = jax.jit(lambda p, f, m, lab: tmodel.apply(p, f, m, lab))

    def joint_fn(frame_unused, history):
        # tiny-demo joint: re-run the (cheap) model on the fixed history
        hist = np.zeros((1, labels.shape[1]), np.int32)
        hist[0, : min(len(history), labels.shape[1])] = \
            history[: labels.shape[1]]
        lg, _ = enc_apply(tstate.params, res2.features[:1],
                          res2.mask[:1], jnp.asarray(hist))
        t = int(frame_unused[0])
        u = min(len(history), labels.shape[1])
        return np.asarray(lg)[0, t, u]

    enc_idx = np.arange(int(res2.mask[0].sum()),
                        dtype=np.float32)[:, None]
    hyp = train.beam_transducer_decode(joint_fn, enc_idx[:20],
                                       np.ones(20, bool), beam=2,
                                       max_symbols=3)
    print(f"rnnt beam hypothesis (first 20 frames): {hyp}")


if __name__ == "__main__":
    main()
