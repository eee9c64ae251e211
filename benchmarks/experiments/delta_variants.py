"""Time delta formulations at [128, 2998, 13] f32 on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpufeat import features

B, T, D = 128, 2998, 13
rng = np.random.default_rng(0)
feat = jax.device_put(jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32))
nf = jax.device_put(jnp.full((B,), T - 7, jnp.int32))

@jax.jit
def cks(t): return jnp.sum(t)

def timeit(fn, chain=16, iters=6):
    out = fn(feat, nf); float(cks(out))
    for _ in range(2):
        for _ in range(chain): out = fn(feat, nf)
        float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain): out = fn(feat, nf)
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain

def current(f, n):
    d1 = features.deltas(f, n)
    d2 = features.deltas(d1, n)
    return jnp.concatenate([f, d1, d2], axis=-1)

def static_only_delta(f):
    # pure static slices, edge-replicated at the PADDED end (ignores nf)
    out = jnp.zeros_like(f)
    for i in (1, 2):
        plus = jnp.concatenate([f[:, i:], jnp.repeat(f[:, -1:], i, -2)], -2)
        minus = jnp.concatenate([jnp.repeat(f[:, :1], i, -2), f[:, :-i]], -2)
        out = out + i * (plus - minus)
    return out / 10.0

def static_only(f, n):
    d1 = static_only_delta(f)
    d2 = static_only_delta(d1)
    return jnp.concatenate([f, d1, d2], axis=-1)

def transposed(f, n):
    # [B, D, T]: time on lanes; shifts are lane slices; edge clamp at padded end
    ft = jnp.swapaxes(f, -1, -2)
    out = jnp.zeros_like(ft)
    for i in (1, 2):
        plus = jnp.concatenate([ft[:, :, i:], jnp.repeat(ft[:, :, -1:], i, -1)], -1)
        minus = jnp.concatenate([jnp.repeat(ft[:, :, :1], i, -1), ft[:, :, :-i]], -1)
        out = out + i * (plus - minus)
    d1 = out / 10.0
    out2 = jnp.zeros_like(ft)
    for i in (1, 2):
        plus = jnp.concatenate([d1[:, :, i:], jnp.repeat(d1[:, :, -1:], i, -1)], -1)
        minus = jnp.concatenate([jnp.repeat(d1[:, :, :1], i, -1), d1[:, :, :-i]], -1)
        out2 = out2 + i * (plus - minus)
    d2 = out2 / 10.0
    return jnp.concatenate([jnp.swapaxes(a, -1, -2) for a in (ft, d1, d2)], -1)

def masked_static(f, n):
    # static slices + the last-valid fix ONLY as a cheap row-mask where
    t_idx = jnp.arange(T)[None, :, None]
    hi = jnp.maximum(n - 1, 0)[:, None, None]
    last = jnp.take_along_axis(f, jnp.broadcast_to(hi, (B, 1, D)), -2)
    def delta(g, glast):
        out = jnp.zeros_like(g)
        for i in (1, 2):
            plus = jnp.concatenate([g[:, i:], jnp.repeat(g[:, -1:], i, -2)], -2)
            plus = jnp.where(t_idx + i > hi, glast, plus)
            minus = jnp.concatenate([jnp.repeat(g[:, :1], i, -2), g[:, :-i]], -2)
            out = out + i * (plus - minus)
        return out / 10.0
    d1 = delta(f, last)
    d1_last = jnp.take_along_axis(d1, jnp.broadcast_to(hi, (B, 1, D)), -2)
    d2 = delta(d1, d1_last)
    return jnp.concatenate([f, d1, d2], axis=-1)

for name, fn in [("current", current), ("static_only", static_only),
                 ("transposed", transposed), ("masked_static", masked_static)]:
    print(f"{name:14s}: {timeit(jax.jit(fn))*1e3:8.3f} ms", flush=True)
