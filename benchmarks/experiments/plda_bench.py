"""On-chip PLDA + diarization cost at production scale.

Three questions:
1. Trial scoring: the GEMM-factored [E, T] log-likelihood-ratio matrix
   (tpufeat/plda.py) — trials/second at verification-farm shapes
   (4096 x 4096 = 16.8M trials per dispatch, K = 100/200).
2. Segment i-vectors: the diarization front half over one long
   recording's frames (tpufeat/diarization.py; 30 min = 180k frames,
   2,399 windows on the 1.5 s/0.75 s grid) — RTFx.
3. Affinity: the [N, N] pair matrix for those windows (one dispatch).

Timing per repo convention: chained dispatches + separate checksum
fetch (block_until_ready is a no-op through the relay, BASELINE.md).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpufeat import diarization as dz
from tpufeat import plda as pl
from tpufeat.ivector import DiagUbm, IvectorExtractor


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

# --- 1. trial scoring ------------------------------------------------------
for K in (100, 200):
    model = pl.Plda(r.standard_normal(K),
                    np.linalg.qr(r.standard_normal((K, K)))[0],
                    np.sort(r.random(K) * 5.0)[::-1])
    E = T = 4096
    u = jax.device_put(jnp.asarray(
        model.transform_ivector(r.standard_normal((E, K))), jnp.float32))
    v = jax.device_put(jnp.asarray(
        model.transform_ivector(r.standard_normal((T, K))), jnp.float32))
    n = jax.device_put(jnp.ones((E,), jnp.float32))
    psi = jnp.asarray(model.psi, jnp.float32)
    dt = timeit(pl._llr_jit, u, n, v, psi)
    print(f"K={K}: {E}x{T} trials in {dt*1e3:.2f} ms "
          f"-> {E*T/dt/1e9:.2f} G trials/s", flush=True)

# --- 2+3. diarization window i-vectors + affinity --------------------------
G, D, K = 512, 13, 100
w = r.uniform(0.5, 1.5, G); w /= w.sum()
vars_ = r.uniform(0.5, 2.0, (G, D))
ubm = DiagUbm(w, r.standard_normal((G, D)) * 2.0, vars_)
ext = IvectorExtractor(
    ubm, r.standard_normal((G, D, K)) * np.sqrt(vars_)[:, :, None] * 0.3)

minutes = 30
Tf = minutes * 60 * 100
feats = jax.device_put(jnp.asarray(
    r.standard_normal((Tf, D)), jnp.float32))


def seg(x):
    out, _ = dz.segment_ivectors(ext, x)
    return out


ivecs = seg(feats)
nwin = ivecs.shape[0]
dt = timeit(seg, feats, chain=4)
print(f"segment_ivectors: {minutes} min ({Tf} frames, {nwin} windows, "
      f"G={G}, K={K}) in {dt*1e3:.1f} ms -> RTFx "
      f"{minutes*60/dt:,.0f}", flush=True)

model = pl.Plda(r.standard_normal(K),
                np.linalg.qr(r.standard_normal((K, K)))[0],
                np.sort(r.random(K) * 5.0)[::-1])
uv = jax.device_put(jnp.asarray(
    model.transform_ivector(np.asarray(ivecs, np.float64)), jnp.float32))
nn = jax.device_put(jnp.ones((nwin,), jnp.float32))
psi = jnp.asarray(model.psi, jnp.float32)
dt = timeit(lambda a, b: pl._llr_jit(a, nn, b, psi), uv, uv)
print(f"affinity: {nwin}x{nwin} pair LLRs in {dt*1e3:.2f} ms", flush=True)
