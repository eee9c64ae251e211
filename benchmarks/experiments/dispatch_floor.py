"""Characterize per-dispatch overhead vs argument size on the axon relay."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

@jax.jit
def cks(t): return jnp.sum(t)

def timeit(fn, *args, chain=16, iters=6):
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

rng = np.random.default_rng(0)
for mb in (1, 60, 246, 492):
    n = mb * 1024 * 1024 // 4
    x = jax.device_put(jnp.asarray(rng.standard_normal(n), jnp.float32))
    ident = jax.jit(lambda a: a)
    plus = jax.jit(lambda a: a + 1.0)
    print(f"{mb:4d} MB  identity: {timeit(ident, x)*1e3:7.3f} ms   "
          f"a+1: {timeit(plus, x)*1e3:7.3f} ms", flush=True)
noarg = jax.jit(lambda: jnp.sum(jax.lax.iota(jnp.float32, 1024)))
print(f"no-arg dispatch: {timeit(noarg)*1e3:7.3f} ms", flush=True)
don = jax.jit(lambda a: a + 1.0, donate_argnums=(0,))
x = jax.device_put(jnp.asarray(rng.standard_normal(246*1024*1024//4), jnp.float32))
def don_chain(a):
    return don(a)
# donation consumes the arg; chain by reusing output
out = don(x); float(cks(out))
for _ in range(2):
    for _ in range(16): out = don(out)
    float(cks(out))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    for _ in range(16): out = don(out)
    float(cks(out))
    ts.append(time.perf_counter() - t0)
print(f"246 MB a+1 DONATED: {float(np.median(ts))/16*1e3:7.3f} ms", flush=True)
