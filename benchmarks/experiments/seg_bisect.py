"""Bisect segment_ivectors cost: posteriors / blkF / cumsum / solve."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpufeat.ivector import DiagUbm, IvectorExtractor, _damped_solve, _posteriors_jit, _online_operands

@jax.jit
def cks(t): return jnp.sum(t)

def timeit(fn, *args, chain=4, iters=3):
    out = fn(*args); float(cks(out))
    for _ in range(chain): out = fn(*args)
    float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain): out = fn(*args)
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain

r = np.random.default_rng(0)
G, D, K, Tf, p = 512, 13, 100, 180000, 75
w = r.uniform(0.5, 1.5, G); w /= w.sum()
vars_ = r.uniform(0.5, 2.0, (G, D))
ubm = DiagUbm(w, r.standard_normal((G, D)) * 2.0, vars_)
ext = IvectorExtractor(ubm, r.standard_normal((G, D, K)) * np.sqrt(vars_)[:, :, None] * 0.3)
gconst, a, bq, P, U, q = _online_operands(ext)
x = jax.device_put(jnp.asarray(r.standard_normal((Tf, D)), jnp.float32))
nblk = Tf // p; mwin = 2

@jax.jit
def stage1(x):
    return _posteriors_jit(x, gconst, a, bq, 0.0)

@jax.jit
def stage2(x):
    post = _posteriors_jit(x, gconst, a, bq, 0.0)
    postp = post.reshape(nblk, p, -1); xp = x.reshape(nblk, p, -1)
    blkF = jnp.einsum("npd,npg->ndg", xp, postp, precision=jax.lax.Precision.HIGHEST)
    return blkF.sum() + postp.sum()

@jax.jit
def stage3(x):
    post = _posteriors_jit(x, gconst, a, bq, 0.0)
    postp = post.reshape(nblk, p, -1); xp = x.reshape(nblk, p, -1)
    blkN = postp.sum(axis=1)
    blkF = jnp.einsum("npd,npg->ndg", xp, postp, precision=jax.lax.Precision.HIGHEST)
    inc = lambda v: jnp.cumsum(jnp.concatenate([jnp.zeros_like(v[:1]), v], 0), 0)
    csN, csF = inc(blkN), inc(blkF)
    return csN[mwin:].sum() - csF[:-mwin].sum()

@jax.jit
def stage4(x):
    post = _posteriors_jit(x, gconst, a, bq, 0.0)
    postp = post.reshape(nblk, p, -1); xp = x.reshape(nblk, p, -1)
    blkN = postp.sum(axis=1)
    blkF = jnp.einsum("npd,npg->ndg", xp, postp, precision=jax.lax.Precision.HIGHEST)
    inc = lambda v: jnp.cumsum(jnp.concatenate([jnp.zeros_like(v[:1]), v], 0), 0)
    csN, csF = inc(blkN), inc(blkF)
    N = csN[mwin:] - csN[:-mwin]; F = csF[mwin:] - csF[:-mwin]
    b = (jnp.einsum("wdg,gdk->wk", F, P, precision=jax.lax.Precision.HIGHEST)
         - jnp.einsum("wg,gk->wk", N, q, precision=jax.lax.Precision.HIGHEST))
    return _damped_solve(N, b, U, 0.0)

for name, fn in [("posteriors", stage1), ("+blkF", stage2), ("+cumsum", stage3), ("+solve", stage4)]:
    print(f"{name}: {timeit(fn, x)*1e3:.1f} ms", flush=True)
