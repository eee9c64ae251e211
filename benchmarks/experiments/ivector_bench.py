"""On-chip i-vector cost at production scale (G=512/1024, K=100).

Three questions:
1. Offline: utterance i-vectors for a B=128 x 30 s batch of MFCC-13
   frames — what RTFx does the ivector-extract flow run at?
2. Online: ivector_features over the same batch (period=10) — the
   per-frame i-vector stream.
3. Serving: one StreamingIvector tick for B streams x 10 frames
   (100 ms) — added cost per serving tick on top of the front-end.

Timing per repo convention: chained dispatches + separate checksum
fetch (block_until_ready is a no-op through the relay, BASELINE.md).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpufeat import ivector as iv


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


def fake_model(G, D, K, seed=0):
    r = np.random.default_rng(seed)
    w = r.uniform(0.5, 1.5, G); w /= w.sum()
    means = r.standard_normal((G, D)) * 2.0
    vars_ = r.uniform(0.5, 2.0, (G, D))
    ubm = iv.DiagUbm(w, means, vars_)
    M = r.standard_normal((G, D, K)) * np.sqrt(vars_)[:, :, None] * 0.3
    return iv.IvectorExtractor(ubm, M)


D, K = 13, 100
B, T = 128, 2998          # 128 x 30 s of 10 ms frames
audio_s = B * T * 0.01
r = np.random.default_rng(1)

for G in (512, 1024):
    ext = fake_model(G, D, K)
    feats = jax.device_put(jnp.asarray(
        r.standard_normal((B, T, D)), jnp.float32))

    def utt(x):
        n, f = ext.stats(x)
        return ext.estimate(n, f)

    t_utt = timeit(jax.jit(utt), feats)
    t_onl = timeit(
        lambda x: iv._ivector_features_jit(T, 10, 0.1, 0.0, 0.0)(
            x, jnp.ones((B, T), jnp.float32), *iv._online_operands(ext)),
        feats)
    print(f"G={G}: utterance {t_utt*1e3:8.2f} ms = "
          f"{audio_s/t_utt:9.0f}x RTFx | online(period=10) "
          f"{t_onl*1e3:8.2f} ms = {audio_s/t_onl:9.0f}x RTFx", flush=True)

# serving tick: B streams x 10 frames per 100 ms chunk
ext = fake_model(512, D, K)
for Bs in (1024, 8192, 32768):
    st = iv.StreamingIvector(ext, batch_size=Bs, period=10)
    rows = jax.device_put(jnp.asarray(
        r.standard_normal((Bs, 10, D)), jnp.float32))
    fn = iv._streaming_ivector_step_jit(10, 10, 0.1, 0.0, 0.0)
    args = (rows, st.N, st.b, st.in_force, st.n_seen, *st._ops)
    t = timeit(lambda *a: fn(*a)[0], *args)
    print(f"serving B={Bs:6d}: {t*1e3:7.2f} ms / 100 ms tick "
          f"({t*1e3/100*100:.1f}% of budget)", flush=True)
