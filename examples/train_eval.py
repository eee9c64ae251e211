"""Training + evaluation loop, end to end (config 5).

Raw audio -> front-end (inside the jitted train step) -> tiny Whisper
encoder -> CTC loss -> a few optimization steps -> greedy decode -> WER.
Runs on CPU (small shapes) or TPU.

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
    refs = [np.asarray(labels)[b, : int(label_lens[b])].tolist()
            for b in range(B)]
    print("eval:", train.token_error_rate(refs, hyps))


if __name__ == "__main__":
    main()
