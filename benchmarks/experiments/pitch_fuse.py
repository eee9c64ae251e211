"""Where do the pitch tracker's 19 ms go, and can the lag-grid leg shrink?

Round-4 split (B=128x10 s): to_lag_grid (mask + polyphase resample)
8.05 ms, NCCF on the 2 kHz grid 4.03 ms, Viterbi+refine ~7 ms. The
to_lag_grid leg is 42% of the tracker — 2x the NCCF it feeds — yet its
arithmetic is tiny (a [40k, 665] x [665, 64] GEMM + one masked multiply).
This measures a finer split and the candidate attacks (round-5 VERDICT
item 6):

  - mask-only, resample-only, to_lag_grid (as shipped)
  - resample block size 64 (shipped) / 128 / 256
  - resample GEMM precision: HIGHEST (shipped) vs explicit 3-term bf16
    split vs DEFAULT — with max|delta| vs HIGHEST on the lag-grid signal
  - NCCF-from-lag-grid, full tracker (as shipped)

Run:  python -m benchmarks.experiments.pitch_fuse
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpufeat import pitch, resampling, framing

    cfg = pitch.PitchConfig()
    inner = cfg.inner()
    B, sec = 128, 10
    n = sec * 16000
    x = jax.jit(lambda k: 0.1 * jax.random.normal(
        k, (B, n), jnp.float32))(jax.random.key(7))
    lens = jnp.full((B,), n, jnp.int32)

    @jax.jit
    def cks(t):
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(t))

    def timeit(fn, *args, chain=8, iters=5):
        r = fn(*args)
        float(np.asarray(cks(r)))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(chain):
                r = fn(*args)
            float(np.asarray(cks(r)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / chain

    p, q = resampling._rational(cfg.sample_rate, cfg.lag_rate)

    mask_fn = jax.jit(lambda a, l: a * (
        jnp.arange(a.shape[-1]) < l[..., None]).astype(a.dtype))

    def make_resample(block, mode):
        Hb, c0 = (resampling.resample_matrix_blocked(p, q, block)
                  if block > 1 else resampling.resample_matrix(p, q))
        L = Hb.shape[0]
        hop, per = block * q, block * p

        @jax.jit
        def run(a):
            n_out = resampling.output_length(n, p, q)
            n_blocks = -(-n_out // per)
            pad_l = max(0, -c0)
            need = (n_blocks - 1) * hop + L
            ap = jnp.pad(a, ((0, 0), (pad_l,
                                      max(0, need - pad_l - a.shape[-1]))))
            fr = framing.frames_from_buffer(ap, n_blocks, L, hop)
            H32 = jnp.asarray(Hb, jnp.float32)
            if mode == "highest":
                y = jnp.dot(fr, H32,
                            precision=jax.lax.Precision.HIGHEST)
            elif mode == "default":
                y = jnp.dot(fr, H32)
            elif mode == "bf16x3":
                fh = fr.astype(jnp.bfloat16)
                fl = (fr - fh.astype(jnp.float32)).astype(jnp.bfloat16)
                hh = H32.astype(jnp.bfloat16)
                hl = (H32 - hh.astype(jnp.float32)).astype(jnp.bfloat16)
                d = functools.partial(jnp.dot,
                                      preferred_element_type=jnp.float32)
                y = d(fh, hh) + d(fh, hl) + d(fl, hh)
            return y.reshape(a.shape[0], n_blocks * per)[:, :n_out]
        return run

    out = {}
    t = timeit(mask_fn, x, lens)
    out["mask_only_ms"] = round(t * 1e3, 2)

    tolag = jax.jit(lambda a, l: pitch.to_lag_grid(a, l, cfg)[:2])
    t = timeit(tolag, x, lens)
    out["to_lag_grid_ms"] = round(t * 1e3, 2)

    ref_y = None
    for block in (64, 128, 256):
        for mode in ("highest", "default", "bf16x3"):
            if mode != "highest" and block != 64:
                continue
            fn = make_resample(block, mode)
            t = timeit(fn, x)
            y = np.asarray(fn(x))
            if ref_y is None:
                ref_y = y
            err = float(np.abs(y - ref_y).max())
            out[f"resample_b{block}_{mode}_ms"] = round(t * 1e3, 2)
            out[f"resample_b{block}_{mode}_err"] = f"{err:.2e}"
            print(f"resample block={block:3d} {mode:8s}: "
                  f"{t*1e3:6.2f} ms  max|d|={err:.2e}", flush=True)

    # NCCF from a precomputed lag-grid signal (inner config)
    y0, ly, _ = pitch.to_lag_grid(x, lens, cfg)
    y0 = jax.device_put(y0)
    nccf_fn = jax.jit(lambda a, l: pitch.nccf(a, l, inner)[0])
    t = timeit(nccf_fn, y0, ly)
    out["nccf_inner_ms"] = round(t * 1e3, 2)

    full_fn = jax.jit(lambda a, l: pitch._track_impl(a, l, cfg)[:2])
    t = timeit(full_fn, x, lens)
    out["full_ms"] = round(t * 1e3, 2)
    out["full_rtfx"] = round(B * sec / t)

    for k, v in out.items():
        print(f"{k:28s} {v}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
