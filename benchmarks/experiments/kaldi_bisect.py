"""Bisect the kaldi39 pipeline's delta overhead inside the REAL graph."""
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
sig = (rng.standard_normal((B, SEC * 16000)) * 0.1).astype(np.float32)
x = jax.device_put(jnp.asarray(sig))
l = jax.device_put(jnp.full((B,), sig.shape[1], jnp.int32))

@jax.jit
def cks(t): return jnp.sum(t)

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

def stage(upto):
    def fn(xx, ll):
        y = framing.preemphasize(xx, cfg.preemphasis)
        F = cfg.num_frames(xx.shape[-1])
        buf, mask = framing.framing_buffer(y, ll, cfg)
        feat = fused.signal_features(buf, F, cfg)
        if upto == "kernel":
            return feat
        nf = framing.num_frames_dynamic(ll, cfg)
        d1 = features.deltas(feat, nf, cfg.delta_window)
        if upto == "d1":
            return d1
        d2 = features.deltas(d1, nf, cfg.delta_window)
        if upto == "d2":
            return d2
        feat = jnp.concatenate([feat, d1, d2], axis=-1)
        if upto == "concat":
            return feat
        feat = features.cmvn(feat, mask, cfg.cmvn)
        return feat
    return jax.jit(fn)

for name in ("kernel", "d1", "d2", "concat", "full"):
    print(f"{name:8s}: {timeit(stage(name))*1e3:8.3f} ms", flush=True)
