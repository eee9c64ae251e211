"""Map the large-batch erratum envelope on chip (round-3 VERDICT item 1).

BASELINE.md documents an upstream XLA:TPU miscompilation at [256, 480000]:
~8% of frames corrupt in a 33-frame periodic pattern, every sub-stage
clean in isolation. The public API guards on a
measured-clean region (features._single_program_safe); this script maps
where corruption actually occurs so the guard is measured, not guessed:

- batch extent at 30 s (250..512 rows),
- length-dependence at fixed B*N (128x60 s vs 256x30 s),
- small-B long-N corners ((64, 120 s), (1, 2 h)) the row-split guard
  exempts or cannot help with,
- the 15 s column revalidation.

Oracle: extract_chunked at 64 rows/dispatch (every 64-row dispatch is deep
inside the validated envelope). Comparison runs ON device; only scalars
are fetched (relay-friendly). Results append to .bench/erratum_envelope
.jsonl (resumable — done points are skipped on rerun).

  python -m benchmarks.experiments.erratum_envelope
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

POINTS = [                      # (B, seconds) in priority order
    (256, 30),                  # the known corrupt point (re-probe)
    (250, 30), (252, 30),       # the 248..256 boundary
    (128, 60),                  # same B*N as 256x30 s, small batch
    (64, 120),                  # same B*N again, tiny batch
    (256, 24),                  # B=256 BELOW the sample threshold
    (320, 30), (384, 30), (512, 30),   # corrupt-region extent
    (512, 15),                  # revalidate the clean 15 s column
    (256, 60),                  # far region
    (1, 7200),                  # single 2 h row (guard exempts B=1)
    # round-1 results localized corruption to a B~=256 band (250/252/320
    # clean, 256x{24,30} corrupt, 128x60 s clean at identical B*N): pin
    # the band's row-extent edges and its length extent.
    (254, 30), (255, 30),       # lower edge (clean at 252)
    (257, 30), (264, 30), (288, 30),   # upper edge (clean at 320)
    (256, 15), (256, 20),       # shortest corrupt length at B=256
    (256, 8),
    # round-4: the guard's B=1 branch admits ANY length but was backed
    # by one probe (1x2 h). Extend the raw single-program B=1 leg to 4 h
    # and 8 h (230M/461M samples) so every admitted region sits <=2x
    # from a measured point.
    (1, 14400), (1, 28800),
]

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".bench",
    "erratum_envelope.jsonl")


def main() -> int:
    import jax
    import jax.numpy as jnp
    from tpufeat import features
    from tpufeat.config import MFCC13_HTK

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            r = json.loads(line)
            done.add((r["B"], r["seconds"]))

    cfg = dataclasses.replace(MFCC13_HTK, use_pallas=True, gemm_dft=True,
                              fused_framing=True,
                              matmul_precision="bf16x3")

    @jax.jit
    def compare(a, b):
        d = jnp.abs(a - b)
        return jnp.max(d), jnp.sum(jnp.any(d > 1e-5, axis=-1))

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    for B, sec in POINTS:
        if (B, sec) in done:
            print(f"skip ({B},{sec}) — recorded", file=sys.stderr)
            continue
        n = sec * 16000
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((B, n)) * 0.1).astype(np.float32)
        lens = np.full((B,), n, np.int32)
        t0 = time.time()
        xd = jax.device_put(x)
        del x
        a = features.extract(xd, lens, cfg, single_program=True).features
        if B == 1:
            # row-splitting can't subdivide one row; oracle = the
            # streaming scan (bit-exact semantics, v4 layout — expect
            # ~2e-5 cross-layout noise on clean runs, far below the 1e-4
            # corruption flag)
            from tpufeat import streaming
            b = streaming.extract_scan(xd, cfg, chunk_len=960000)
        else:
            b = features.extract_chunked(xd, lens, cfg,
                                         rows_per_dispatch=64).features
        err, nbad = compare(a, b)
        err, nbad = float(np.asarray(err)), int(np.asarray(nbad))
        del a, b, xd
        row = {"B": B, "seconds": sec, "samples": B * n,
               "max_abs_diff_vs_chunked": err, "bad_frames": nbad,
               "total_frames": B * cfg.num_frames(n),
               "corrupt": bool(err > 1e-4), "wall_s": round(time.time() - t0, 1)}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
