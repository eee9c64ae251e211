"""Do relay transfers overlap? (round-5: the corpus warm-ceiling probe)

The warm corpus pass is 52.1 s at 300x RTFx with chip compute ~0.2 s
(BASELINE.md) — all host<->device transfer. Byte accounting says the
FEATURE readback is only ~110 MB (~4 s at the measured 24-43 MB/s), while
the input ARENAS are ~1.4 GB of device_put upload — so the upload
direction likely binds, not readback. This probes the primitives the
pipelined redesign needs:

  1. upload bandwidth (device_put of fresh numpy arrays, relay-synced)
  2. do two concurrent FETCHES overlap or serialize?
  3. do two concurrent UPLOADS overlap or serialize?
  4. does an upload overlap a fetch (full duplex)?
  5. does dispatch return asynchronously (can compute hide under either)?

Run:  python -m benchmarks.experiments.readback_overlap
"""
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

MB = 1e6


def timed(fn, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def both(f1, f2):
    t = threading.Thread(target=f1)
    t.start()
    f2()
    t.join()


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def cks(t):
        return jnp.sum(t)

    @jax.jit
    def gen(seed):
        return jax.random.normal(jax.random.key(seed), (5120, 4096))

    # warm programs + relay
    a = gen(0)
    float(cks(a))
    np.asarray(a)
    nbytes = 5120 * 4096 * 4

    # --- 1. upload bandwidth (device_put + checksum sync) ---
    seed_box = [100]

    def upload_once():
        x = rng.standard_normal((5120, 4096)).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(x)
        float(cks(d))              # force the transfer to complete
        return time.perf_counter() - t0

    ts = [upload_once() for _ in range(3)]
    print(f"upload {nbytes/MB:.0f} MB: best {min(ts)*1e3:8.1f} ms  "
          f"{nbytes/MB/min(ts):6.1f} MB/s  (all {[round(t,2) for t in ts]})",
          flush=True)

    # --- 1b. int16 upload of the SAME element count (does halving the
    # bytes halve the time? PCM16 corpora can upload int16 arenas and
    # promote on device — features._prep already does) ---
    @jax.jit
    def cks16(t):
        return jnp.sum(t.astype(jnp.float32))

    def upload_i16():
        x = (rng.standard_normal((5120, 4096)) * 1e4).astype(np.int16)
        t0 = time.perf_counter()
        d = jax.device_put(x)
        float(cks16(d))
        return time.perf_counter() - t0

    ts = [upload_i16() for _ in range(3)]
    print(f"upload {nbytes/2/MB:.0f} MB int16 (same elems): best "
          f"{min(ts)*1e3:8.1f} ms  {nbytes/2/MB/min(ts):6.1f} MB/s  "
          f"(all {[round(t,2) for t in ts]})", flush=True)

    # --- 2. concurrent fetches: serial vs 2 threads ---
    def fetch_pair(parallel):
        x1, x2 = gen(seed_box[0]), gen(seed_box[0] + 1)
        seed_box[0] += 2
        float(cks(x1)); float(cks(x2))   # compute done; timing = pure fetch
        t0 = time.perf_counter()
        if parallel:
            both(lambda: np.asarray(x1), lambda: np.asarray(x2))
        else:
            np.asarray(x1); np.asarray(x2)
        return time.perf_counter() - t0

    for name, par in (("serial", False), ("2-thread", True)):
        ts = [fetch_pair(par) for _ in range(3)]
        print(f"fetch 2x{nbytes/MB:.0f} MB {name:9s}: best "
              f"{min(ts)*1e3:8.1f} ms  ({2*nbytes/MB/min(ts):6.1f} MB/s "
              f"aggregate)", flush=True)

    # --- 3. concurrent uploads ---
    def upload_pair(parallel):
        x1 = rng.standard_normal((5120, 4096)).astype(np.float32)
        x2 = rng.standard_normal((5120, 4096)).astype(np.float32)
        out = [None, None]

        def up(i, x):
            d = jax.device_put(x)
            float(cks(d))
            out[i] = d
        t0 = time.perf_counter()
        if parallel:
            both(lambda: up(0, x1), lambda: up(1, x2))
        else:
            up(0, x1); up(1, x2)
        return time.perf_counter() - t0

    for name, par in (("serial", False), ("2-thread", True)):
        ts = [upload_pair(par) for _ in range(3)]
        print(f"upload 2x{nbytes/MB:.0f} MB {name:9s}: best "
              f"{min(ts)*1e3:8.1f} ms  ({2*nbytes/MB/min(ts):6.1f} MB/s "
              f"aggregate)", flush=True)

    # --- 4. full duplex: one upload + one fetch concurrently ---
    def duplex(parallel):
        xf = gen(seed_box[0]); seed_box[0] += 1
        float(cks(xf))
        xu = rng.standard_normal((5120, 4096)).astype(np.float32)

        def up():
            d = jax.device_put(xu)
            float(cks(d))
        t0 = time.perf_counter()
        if parallel:
            both(lambda: np.asarray(xf), up)
        else:
            np.asarray(xf); up()
        return time.perf_counter() - t0

    for name, par in (("serial", False), ("2-thread", True)):
        ts = [duplex(par) for _ in range(3)]
        print(f"duplex up+fetch {nbytes/MB:.0f} MB each {name:9s}: best "
              f"{min(ts)*1e3:8.1f} ms", flush=True)

    # --- 5. dispatch asynchrony: submit-to-return time of a real program
    # with a device-resident arg (is there room to hide work under it?) ---
    x = gen(seed_box[0]); float(cks(x))

    @jax.jit
    def work(t):
        for _ in range(8):
            t = jnp.tanh(t) * 1.0001
        return t
    r = work(x); float(cks(r))          # compile
    t0 = time.perf_counter()
    r = work(x)
    t_submit = time.perf_counter() - t0
    float(cks(r))
    print(f"dispatch submit-to-return: {t_submit*1e3:.1f} ms "
          f"(async if << the ~2 ms relay floor + compute)", flush=True)


if __name__ == "__main__":
    main()
