"""Is bf16 device->host readback actually cheaper through the axon relay?

The corpus ledger row assumed `out_dtype="bfloat16"` halves the
relay-readback term (arithmetic from the measured 24-43 MB/s). The
round-4 corpus run measured the OPPOSITE (bf16 warm pass 87.4 s vs the
f32 300x row's 52.1 s). This probes the primitive directly: time
`np.asarray` on fresh device arrays of equal ELEMENT count in f32 vs
bf16 (fresh dispatch each fetch - the relay client caches already-
fetched outputs host-side, readback_bw.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(seed, shape_rows):
        x = jax.random.normal(jax.random.PRNGKey(seed), (shape_rows, 65536))
        return x, x.astype(jnp.bfloat16)

    # warm the program + relay
    f32, bf16 = gen(0, 16)
    np.asarray(f32); np.asarray(bf16)
    for rows in (16, 80, 320):  # 4 / 20 / 80 MB in f32
        for name, idx in (("f32", 0), ("bf16", 1)):
            ts = []
            for it in range(3):
                out = gen(100 + it * 7 + rows + idx, rows)[idx]
                out.block_until_ready()  # no-op on relay; fetch is the sync
                t0 = time.perf_counter()
                host = np.asarray(out)
                ts.append(time.perf_counter() - t0)
            mb = rows * 65536 * (4 if name == "f32" else 2) / 1e6
            best = min(ts)
            print(f"rows={rows:4d} {name:5s} {mb:6.1f} MB  "
                  f"best {best*1e3:8.1f} ms  {mb/best:6.1f} MB/s  "
                  f"(all {[round(t*1e3,1) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
