"""whisper128 (large-v3 front-end) vs whisper80 on chip: 128 mel bins
are exactly one lane group (80 pads to 128 inside the kernel), so the
v3 bank may run at the same cost or better per output column.

Timing per repo convention (chained dispatches + checksum sync)."""
import sys, time
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from tpufeat import features
from tpufeat.config import WHISPER80, WHISPER128


@jax.jit
def cks(t):
    return jnp.sum(t)


def timeit(fn, *args, chain=16, iters=5):
    out = fn(*args); float(cks(out.features))
    for _ in range(2):
        for _ in range(chain):
            out = fn(*args)
        float(cks(out.features))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        float(cks(out.features))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain


rng = np.random.default_rng(0)
B, n = 128, 480000
x = jax.device_put(jnp.asarray(
    (rng.standard_normal((B, n)) * 0.1).astype(np.float32)))
lengths = jnp.full((B,), n, jnp.int32)
audio_s = B * 30.0

for name, base in (("whisper80", WHISPER80), ("whisper128", WHISPER128)):
    cfg = dataclasses.replace(base, use_pallas=True, gemm_dft=True,
                              fused_framing=True,
                              matmul_precision="bf16x3")
    fn = features.make_extractor(cfg)
    dt = timeit(lambda a: fn(a, lengths), x)
    print(f"{name}: {dt*1e3:.2f} ms -> RTFx {audio_s/dt:,.0f}",
          flush=True)
