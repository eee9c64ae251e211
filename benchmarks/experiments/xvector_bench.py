"""On-chip x-vector cost at production scale: a Kaldi-recipe-sized TDNN
(channels=512, embed=192, ~4.5M params) embedding B utterances of 3 s
40-dim fbank frames — embeddings/s and RTFx, plus one train step.

Timing per repo convention: chained dispatches + separate checksum
fetch (block_until_ready is a no-op through the relay, BASELINE.md).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, optax
from tpufeat.models import xvector as xv


@jax.jit
def cks(t):
    return jnp.sum(t)


def timeit(fn, *args, chain=8, iters=5):
    out = fn(*args); float(cks(out))
    for _ in range(2):
        for _ in range(chain):
            out = fn(*args)
        float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain


r = np.random.default_rng(0)
T, D, n_spk = 300, 40, 1000          # 3 s utterances, 40-dim fbank
model = xv.xvector_model(n_spk, embed_dim=192, channels=512)
mask1 = jnp.ones((1, T), jnp.float32)
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, T, D), jnp.float32), mask1)
n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
print(f"params: {n_params/1e6:.2f} M", flush=True)

extract = jax.jit(lambda p, f, m: model.apply(p, f, m)[0])
for B in (128, 512):
    feats = jax.device_put(jnp.asarray(
        r.standard_normal((B, T, D)), jnp.float32))
    mask = jnp.ones((B, T), jnp.float32)
    dt = timeit(lambda f: extract(params, f, mask), feats)
    audio_s = B * T * 0.01
    print(f"B={B}: {dt*1e3:.2f} ms -> {B/dt:,.0f} embeddings/s, "
          f"RTFx {audio_s/dt:,.0f}", flush=True)

tx = optax.adam(1e-3)
state = xv.XvectorState(params, tx.init(params), jnp.zeros((), jnp.int32))
labels = jnp.asarray(r.integers(0, n_spk, 128), jnp.int32)
feats = jax.device_put(jnp.asarray(
    r.standard_normal((128, T, D)), jnp.float32))
mask = jnp.ones((128, T), jnp.float32)
step = jax.jit(lambda s: xv.xvector_train_step(
    s, feats, mask, labels, model=model, tx=tx))


def one(s):
    s2, _ = step(s)
    return s2.params["params"]["head"]["kernel"]


dt = timeit(one, state, chain=4)
print(f"train step B=128: {dt*1e3:.2f} ms -> "
      f"{128/dt:,.0f} utts/s", flush=True)
