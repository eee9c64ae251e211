"""Batched SPD KxK solve strategies on chip (the StreamingIvector tick
bottleneck: ivector_bench.py measured ~75 us/stream at K=100, all in
jnp.linalg.solve).

Candidates at [M, K, K] (SPD, L = I + A, lambda_min >= 1):
  lu        jnp.linalg.solve (baseline)
  cho       jax.scipy cho_factor/cho_solve
  ns_cold   Newton-Schulz inverse from the spectral-bound init
            X0 = L^T/(||L||_1 ||L||_inf) — GEMM-only, k iterations
  ns_warm   Newton-Schulz from the PREVIOUS tick's inverse (serving
            steady state: L drifts by ~one effective frame per tick),
            k iterations
Accuracy column: max |X b - solve(L, b)| over a probe b.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

@jax.jit
def cks(t): return jnp.sum(t)

def timeit(fn, *args, chain=8, iters=5):
    out = fn(*args); float(cks(out))
    for _ in range(2):
        for _ in range(chain): out = fn(*args)
        float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain): out = fn(*args)
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain

K = 100
r = np.random.default_rng(0)

def make_L(M, scale):
    """Realistic i-vector precisions: L = I + c * W W^T / K."""
    W = r.standard_normal((M, K, K)).astype(np.float32)
    A = np.einsum("mik,mjk->mij", W, W) / K * scale
    return jnp.asarray(np.eye(K, dtype=np.float32) + A)

def ns_iters(L, X, k):
    I = jnp.eye(K, dtype=jnp.float32)
    for _ in range(k):
        X = X @ (2.0 * I - L @ X)
    return X

for M in (2048, 16384):
    for scale in (3.0, 30.0):          # cond ~ 1+lambda_max
        L = make_L(M, scale)
        b = jnp.asarray(r.standard_normal((M, K, 1)).astype(np.float32))
        want = np.asarray(jnp.linalg.solve(L, b))

        t_lu = timeit(jax.jit(lambda L, b: jnp.linalg.solve(L, b)), L, b)

        import jax.scipy.linalg as jsl
        def cho(L, b):
            c = jsl.cho_factor(L)
            return jsl.cho_solve(c, b)
        t_cho = timeit(jax.jit(cho), L, b)
        err_cho = np.abs(np.asarray(jax.jit(cho)(L, b)) - want).max()

        def cold(L, b, k):
            n1 = jnp.max(jnp.sum(jnp.abs(L), axis=-1), axis=-1)
            ninf = jnp.max(jnp.sum(jnp.abs(L), axis=-2), axis=-1)
            X0 = jnp.swapaxes(L, -1, -2) / (n1 * ninf)[:, None, None]
            return ns_iters(L, X0, k) @ b
        for k in (10, 16, 24):
            f = jax.jit(lambda L, b, k=k: cold(L, b, k))
            err = np.abs(np.asarray(f(L, b)) - want).max()
            t = timeit(f, L, b)
            print(f"M={M:6d} scale={scale:4.0f} ns_cold k={k:2d}: "
                  f"{t*1e3:8.2f} ms  err {err:.2e}", flush=True)

        # warm start: inverse of a slightly-drifted L (one tick of stats)
        Xtrue = jnp.linalg.inv(L)
        drift = make_L(M, scale * 0.01) - jnp.eye(K, dtype=jnp.float32)
        L2 = L + drift
        want2 = np.asarray(jnp.linalg.solve(L2, b))
        for k in (2, 3, 4):
            f = jax.jit(lambda L2, X, b, k=k: ns_iters(L2, X, k) @ b)
            err = np.abs(np.asarray(f(L2, Xtrue, b)) - want2).max()
            t = timeit(f, L2, Xtrue, b)
            print(f"M={M:6d} scale={scale:4.0f} ns_warm k={k:2d}: "
                  f"{t*1e3:8.2f} ms  err {err:.2e}", flush=True)

        print(f"M={M:6d} scale={scale:4.0f} lu: {t_lu*1e3:8.2f} ms | "
              f"cho: {t_cho*1e3:8.2f} ms  err {err_cho:.2e}", flush=True)
