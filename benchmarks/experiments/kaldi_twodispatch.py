"""Two-dispatch kaldi39: kernel-jit then deltas-jit, chained."""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpufeat import features, framing
from tpufeat.config import KALDI39
from tpufeat.pallas import fused

B, SEC = 128, 30
cfg = dataclasses.replace(KALDI39, use_pallas=True, gemm_dft=True,
                          fused_framing=True, matmul_precision="bf16x3")
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(
    (rng.standard_normal((B, SEC * 16000)) * 0.1), jnp.float32))
l = jax.device_put(jnp.full((B,), x.shape[1], jnp.int32))

@jax.jit
def cks(t): return jnp.sum(t)

@jax.jit
def part1(xx, ll):
    y = framing.preemphasize(xx, cfg.preemphasis)
    F = cfg.num_frames(xx.shape[-1])
    buf, mask = framing.framing_buffer(y, ll, cfg)
    feat = fused.signal_features(buf, F, cfg)
    return feat, mask

@jax.jit
def part2(feat, mask, ll):
    nf = framing.num_frames_dynamic(ll, cfg)
    d1 = features.deltas(feat, nf, cfg.delta_window)
    d2 = features.deltas(d1, nf, cfg.delta_window)
    out = jnp.concatenate([feat, d1, d2], axis=-1)
    return features.cmvn(out, mask, cfg.cmvn)

def two(xx, ll):
    feat, mask = part1(xx, ll)
    return part2(feat, mask, ll)

def timeit(fn, chain=16, iters=6):
    out = fn(x, l); float(cks(out))
    for _ in range(2):
        for _ in range(chain): out = fn(x, l)
        float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain): out = fn(x, l)
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain

print(f"two-dispatch: {timeit(two)*1e3:8.3f} ms", flush=True)
# sanity: same numbers as the fused single program
one = jax.jit(lambda a, b: features.extract_impl(a, b, cfg).features)
d = float(jnp.max(jnp.abs(one(x, l) - two(x, l))))
print(f"max diff vs single-dispatch: {d:.2e}", flush=True)
