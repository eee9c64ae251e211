"""Detailed benchmark harness (reference C13: per-kernel timing table).

Where the OpenCL reference prints per-kernel cl_event times and a CPU-vs-GPU
speedup table, this harness reports steady-state RTFx, frames/s/chip, and
fidelity per workload config, as machine-readable JSON (SURVEY.md §5
"Metrics"). The repo-root ``bench.py`` is the driver-facing single-line
headline; this file is the engineering view.

  python -m benchmarks.report --batch 32 --seconds 30
  python -m benchmarks.report --profile /tmp/trace   # adds an XLA trace capture
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=10, warmup=2, chain=8):
    """Steady-state median time per call. Completion is forced by a separate
    jitted checksum dispatch fetched to host — block_until_ready is a no-op
    on the relayed axon platform, and an in-jit checksum would let XLA
    dead-code the HBM materialization of the outputs (see bench.py). Each
    timed iteration chains ``chain`` dispatches before the sync so the
    ~30 ms relay round-trip amortizes like a production ingest loop."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def checksum(t):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(t))

    def run():
        out = None
        for _ in range(chain):
            out = fn(*args)
        return float(checksum(out))

    float(checksum(fn(*args)))  # compile
    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / chain


def bench_config(name, cfg, batch, seconds, iters, golden_check=True,
                 chain=8):
    import jax
    import jax.numpy as jnp
    from tpufeat import features

    sr = cfg.sample_rate
    n = seconds * sr
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal((batch, n)) * 0.1).astype(np.float32)
    x = jax.device_put(jnp.asarray(sig))
    l = jax.device_put(jnp.full((batch,), n, jnp.int32))
    fn = features.make_extractor(cfg)
    dt = time_fn(lambda a, b: fn(a, b).features, x, l, iters=iters,
                 chain=chain)
    res = fn(x, l)
    frames = int(np.asarray(res.num_frames).sum())
    row = {
        "config": name,
        "batch": batch,
        "audio_s": batch * seconds,
        "median_s": round(dt, 6),
        "rtfx": round(batch * seconds / dt, 1),
        "frames_per_s": round(frames / dt, 0),
        "ms_per_30s_utt": round(dt / batch * 1e3, 3),
    }
    if golden_check:
        from tpufeat.reference import cpu
        gold = cpu.extract(sig[0].astype(np.float64), cfg)
        row["max_abs_err"] = float(
            np.abs(np.asarray(res.features[0])[: gold.shape[0]] - gold).max())
    return row


def bench_encoder_share(batch, seconds, iters, **flags):
    """North-star check: 'feature extraction must never be the bottleneck in
    front of an ASR encoder'. Measures a Whisper-tiny-shaped encoder forward
    with and without the front-end; the difference is the front-end's cost
    share."""
    import jax
    import jax.numpy as jnp
    from tpufeat import features
    from tpufeat.config import WHISPER80
    from tpufeat.models import train as train_lib

    cfg = dataclasses.replace(WHISPER80, **flags)
    model = train_lib.make_models(dim=384, layers=4, heads=6, vocab=64)
    n = seconds * 16000
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal((batch, n)) * 0.1).astype(np.float32)
    x = jax.device_put(jnp.asarray(sig))
    l = jax.device_put(jnp.full((batch,), n, jnp.int32))
    res = features.extract_impl(x[:1], l[:1], cfg)
    params = model.init(jax.random.PRNGKey(0), res.features, res.mask)

    def frontend(a, b):
        return features.extract_impl(a, b, cfg).features

    def full(a, b):
        r = features.extract_impl(a, b, cfg)
        return model.apply(params, r.features, r.mask)[0]

    t_fe = time_fn(jax.jit(frontend), x, l, iters=iters)
    t_full = time_fn(jax.jit(full), x, l, iters=iters)
    share = max(0.0, min(1.0, t_fe / t_full))
    return {
        "config": "frontend_share_of_whisper_tiny_forward",
        "frontend_s": round(t_fe, 6),
        "frontend_plus_encoder_s": round(t_full, 6),
        "frontend_share": round(share, 4),
        "rtfx_end_to_end": round(batch * seconds / t_full, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=int, default=30)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--profile", default=None)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--gemm", action="store_true",
                   help="use the GEMM-native DFT kernel")
    p.add_argument("--fused", action="store_true",
                   help="also fuse framing into the signal kernel "
                        "(production TPU configuration)")
    p.add_argument("--precision", default="highest",
                   choices=("highest", "bf16x3", "default"),
                   help="Pallas matmul precision (bf16x3 = production)")
    p.add_argument("--encoder", action="store_true",
                   help="also measure the front-end's share of a full "
                        "front-end+encoder forward pass (north-star claim)")
    args = p.parse_args(argv)

    import jax
    from tpufeat.config import KALDI39, MFCC13_HTK, PLP13, WHISPER80
    log(f"backend={jax.default_backend()}")

    flags = dict(use_pallas=not args.no_pallas, gemm_dft=args.gemm,
                 fused_framing=args.fused, matmul_precision=args.precision)
    rows = []
    for name, cfg in [("mfcc13", MFCC13_HTK), ("whisper80", WHISPER80),
                      ("kaldi39", KALDI39), ("plp13", PLP13)]:
        cfg = dataclasses.replace(cfg, **flags)
        row = bench_config(name, cfg, args.batch, args.seconds, args.iters)
        log(f"{name:10s} rtfx={row['rtfx']:>12,.0f} "
            f"frames/s={row['frames_per_s']:>12,.0f} "
            f"err={row.get('max_abs_err', float('nan')):.2e}")
        rows.append(row)

    # single-utterance latency (B=1): what an online user waits for one
    # 30 s transcript request. chain=1 is the true per-request latency
    # (includes the host->relay->device round trip); the chained row shows
    # the device-side floor once dispatch overhead amortizes.
    lat_cfg = dataclasses.replace(WHISPER80, **flags)
    lat = bench_config("whisper80_single_utt_latency", lat_cfg, 1,
                       args.seconds, args.iters, chain=1)
    lat["latency_ms"] = round(lat.pop("median_s") * 1e3, 3)
    amort = bench_config("whisper80_single_utt_amortized", lat_cfg, 1,
                         args.seconds, args.iters, chain=16,
                         golden_check=False)
    lat["device_floor_ms"] = round(amort["median_s"] * 1e3, 3)
    log(f"single-utterance latency: {lat['latency_ms']} ms "
        f"(device floor {lat['device_floor_ms']} ms)")
    rows.append(lat)

    if args.encoder:
        rows.append(bench_encoder_share(args.batch, args.seconds, args.iters,
                                        **flags))

    if args.profile:
        import jax.numpy as jnp
        from tpufeat import features
        cfg = dataclasses.replace(WHISPER80, use_pallas=not args.no_pallas,
                                  gemm_dft=args.gemm)
        rng = np.random.default_rng(0)
        sig = (rng.standard_normal((args.batch, args.seconds * 16000)) * 0.1
               ).astype(np.float32)
        x = jax.device_put(jnp.asarray(sig))
        l = jax.device_put(jnp.full((args.batch,), sig.shape[1], jnp.int32))
        fn = features.make_extractor(cfg)
        jax.block_until_ready(fn(x, l).features)
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(fn(x, l).features)
        log(f"trace -> {args.profile}")

    print(json.dumps({"backend": jax.default_backend(), "results": rows}))


if __name__ == "__main__":
    main()
