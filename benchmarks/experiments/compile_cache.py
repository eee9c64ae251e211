"""Does JAX's persistent compilation cache work through the axon relay?

Every cold number in BASELINE.md is dominated by ~13 s/program relay
compiles (corpus cold 1,619 s, diarize_long cold 560 s, fMLLR cold
64 s). If the relay's PJRT backend supports executable serialization,
`jax_compilation_cache_dir` turns every cross-PROCESS recompile of an
already-seen program into a disk read — which would collapse the cold
column for any production host that keeps a cache volume.

Run (one TPU client at a time, fresh process per leg):

    python -m benchmarks.experiments.compile_cache nocache
    python -m benchmarks.experiments.compile_cache cache    # populates
    python -m benchmarks.experiments.compile_cache cache    # reads

and compare the first-call wall times of leg 1 (pure compile) vs leg 3
(cache read). Leg 2 == leg 1 + write overhead.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

CACHE_DIR = "/root/repo/.bench/jaxcache"


def main(mode: str):
    import jax

    if mode == "cache":
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import numpy as np
    import jax.numpy as jnp
    from tpufeat import features
    from tpufeat.config import KALDI39, WHISPER80

    @jax.jit
    def cks(t):
        return jnp.sum(t)

    def prod(cfg):
        return dataclasses.replace(cfg, use_pallas=True, gemm_dft=True,
                                   fused_framing=True,
                                   matmul_precision="bf16x3")

    r = np.random.default_rng(0)
    # Deliberately non-benchmark shapes so nothing else ever compiled them.
    for name, cfg in (("kaldi39", prod(KALDI39)),
                      ("whisper80", prod(WHISPER80))):
        b, n = 24, 16000 * 7
        x = jax.device_put(jnp.asarray(
            r.standard_normal((b, n)), jnp.float32))
        lens = jnp.full((b,), n, jnp.int32)
        t0 = time.perf_counter()
        res = features.extract(x, lens, cfg)
        float(cks(res.features))
        t1 = time.perf_counter()
        res = features.extract(x, lens, cfg)
        float(cks(res.features))
        t2 = time.perf_counter()
        print(f"{mode:8s} {name:10s} "
              f"first-call {t1 - t0:7.2f} s   warm {t2 - t1 :7.3f} s",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nocache")
