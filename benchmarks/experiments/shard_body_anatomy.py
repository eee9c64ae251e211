"""Why is the 1-device-mesh sharded path 4x slower than single-chip?

shard_onchip.py measured 46 ms (83k RTFx) for extract_batch_time_sharded
at B=128x30 s mfcc13-fused where single-chip extract() runs ~11 ms
(~364k RTFx). The fused kernel IS in the shard body, so the gap is in
the wrapper. This isolates the layers:

  a. single-chip extract() (baseline)
  b. the shard BODY alone: jit(vmap(_time_shard_body)) on one device,
     no mesh, no shard_map — measures the body formulation (per-row
     concat/preemph + fused kernel via vmap) against (a)
  c. the body WITHOUT vmap: reformulated batched (ext built as one
     [B, L] op, kernel called once) — measures what vmap costs
  d. the full shard_map on a (1,1) mesh (what shard_onchip measured)

  python -m benchmarks.experiments.shard_body_anatomy
"""
from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpufeat import features, sharding
    from tpufeat.config import MFCC13_HTK

    cfg = dataclasses.replace(MFCC13_HTK, use_pallas=True, gemm_dft=True,
                              fused_framing=True,
                              matmul_precision="bf16x3")
    B, sec = 128, 30
    n = sec * 16000
    x = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B, n), jnp.float32))(jax.random.key(0))
    lens_np = np.full((B,), n, np.int32)
    lens = jnp.asarray(lens_np)

    @jax.jit
    def cks(t):
        return jnp.sum(t)

    def timeit(fn, chain=8, iters=6):
        float(np.asarray(cks(fn())))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(chain):
                out = fn()
            float(np.asarray(cks(out)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / chain

    out = {}

    # a. single-chip baseline
    ex = features.make_extractor(cfg)
    out["a_single_chip"] = timeit(lambda: ex(x, lens_np).features)

    # b. the body under vmap, no mesh (axis_name still needed -> fake with
    # a size-1 shard_map-free stand-in: run the body's math with halo ops
    # replaced by their 1-device identities via a private copy)
    f_loc = n // cfg.hop_length
    body = functools.partial(sharding._time_shard_body, cfg=cfg, s_loc=n,
                             f_loc=f_loc, axis_name="t1")

    def vmapped(xb, nf):
        return jax.vmap(lambda r, v: body(r, v))(xb, nf)

    from jax import shard_map
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("t1",))
    from jax.sharding import PartitionSpec as P
    smb = shard_map(vmapped, mesh=mesh1, in_specs=(P(), P()),
                    out_specs=P(), check_vma=False)
    nf = jnp.full((B,), f_loc, jnp.int32)
    jb = jax.jit(smb)
    out["b_body_vmap_mesh1"] = timeit(lambda: jb(x, nf))

    # c. batched body: same math, no vmap — ext built as one [B, L] concat,
    # kernel called once on the whole batch
    fl, hop = cfg.frame_length, cfg.hop_length

    def batched(xb, nf_):
        prev = jnp.zeros((B, 1), xb.dtype)
        halo = jnp.zeros((B, fl - hop), xb.dtype)
        ext = jnp.concatenate([prev, xb, halo], axis=-1)
        if cfg.preemphasis:
            ext = ext - cfg.preemphasis * jnp.concatenate(
                [jnp.zeros_like(ext[:, :1]), ext[:, :-1]], axis=-1)
        ext = ext[:, 1:]
        from tpufeat.pallas import fused
        return fused.signal_features(ext, f_loc, cfg)

    jc = jax.jit(batched)
    out["c_body_batched"] = timeit(lambda: jc(x, nf))

    # d. the real 2-D path (what shard_onchip measured)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "time"))

    def full():
        return sharding.extract_batch_time_sharded(x, lens_np, cfg,
                                                   mesh).features

    out["d_full_2d_mesh"] = timeit(full)

    for k, v in out.items():
        print(f"{k:20s} {v*1e3:8.3f} ms  RTFx={B*sec/v:10,.0f}",
              file=sys.stderr)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
