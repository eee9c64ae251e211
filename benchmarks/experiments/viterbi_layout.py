"""Pitch Viterbi layout experiment: [B, Lp, L] (vmap, lag axis on lanes)
vs [Lp, L, B] (batch on lanes).

The forward scan's broadcast-max dominates the tracker (~33 ms of 63 ms
at B=128x10 s, BASELINE.md pitch rows). With L=281 lags the current
vmapped layout puts L on the 128-wide lane axis (pads 281 -> 384, 27%
dead lanes); transposing so BATCH rides the lanes (B=128 = exactly one
tile) and lags ride sublanes (281 -> 288, 2.5%) should recover most of
the padding waste if the op is VPU-throughput-bound. Decisions must stay
bit-identical (same subtract/max/argmax order, only the layout moves).

  python -m benchmarks.experiments.viterbi_layout
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def viterbi_batched_t(scores, valid, trans):
    """Batch-in-lanes twin of pitch._viterbi: [B,F,L]+[B,F] -> idx [B,F]."""
    import jax
    import jax.numpy as jnp

    s_t = jnp.moveaxis(scores, 0, -1)          # [F, L, B]
    ok_t = valid.T                              # [F, B]

    def fwd(v_prev, inp):                       # v_prev [L, B]
        s, ok = inp
        cand = v_prev[:, None, :] - trans[:, :, None]   # [Lp, L, B]
        v = s + jnp.max(cand, axis=0)
        v = jnp.where(ok[None, :], v, v_prev)
        return v, v_prev

    v0 = jnp.where(ok_t[0][None, :], s_t[0], jnp.zeros_like(s_t[0]))
    v_last, vs_prev = jax.lax.scan(fwd, v0, (s_t[1:], ok_t[1:]))
    best_last = jnp.argmax(v_last, axis=0).astype(jnp.int32)      # [B]

    def back(nxt, inp):
        v_prev, ok = inp                        # [L, B], [B]
        tc = jnp.take(trans, nxt, axis=1)       # [Lp, B]
        cur = jnp.argmax(v_prev - tc, axis=0).astype(nxt.dtype)
        cur = jnp.where(ok, cur, nxt)
        return cur, cur

    _, path = jax.lax.scan(back, best_last, (vs_prev, ok_t[1:]),
                           reverse=True)
    return jnp.concatenate([path, best_last[None]], axis=0).T     # [B, F]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpufeat import pitch

    cfg = pitch.PitchConfig()
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    @jax.jit
    def cks(t):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree_util.tree_leaves(t))

    trans = jnp.asarray(pitch._transition_matrix(cfg))
    L = cfg.n_lags
    out = {"L": L}
    for B, F in ((32, 998), (128, 998)):
        k = jax.random.key(B)
        scores = jax.jit(lambda k: jax.random.normal(
            k, (B, F, L), jnp.float32))(k)
        valid = jnp.ones((B, F), bool)

        cur_fn = jax.jit(lambda s, v: jax.vmap(
            lambda a, b: pitch._viterbi(a, b, trans))(s, v))
        new_fn = jax.jit(lambda s, v: viterbi_batched_t(s, v, trans))

        a = np.asarray(cur_fn(scores, valid))
        b = np.asarray(new_fn(scores, valid))
        same = bool((a == b).all())
        out[f"identical_B{B}"] = same

        def timeit(fn, chain=4, iters=5):
            float(np.asarray(cks(fn(scores, valid))))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                r = None
                for _ in range(chain):
                    r = fn(scores, valid)
                float(np.asarray(cks(r)))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts)) / chain

        t_cur = timeit(cur_fn)
        t_new = timeit(new_fn)
        out[f"vmap_ms_B{B}"] = round(t_cur * 1e3, 2)
        out[f"lanesB_ms_B{B}"] = round(t_new * 1e3, 2)
        out[f"speedup_B{B}"] = round(t_cur / t_new, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
