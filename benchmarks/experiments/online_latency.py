"""Per-chunk host-side latency of the online wrappers on chip.

Measures the steady-state wall time of one ``process()`` call (the
number an online ASR deployment budgets against) for:
  - StreamingPipeline (KALDI39: front-end + online Δ/ΔΔ + running CMVN)
  - StreamingPitchFeatures (3-dim pitch rows, lookahead 15)
with 100 ms chunks. These wrappers are HOST-driven (one or a few eager
dispatches per chunk), so wall time per call is the honest metric — it
includes the ~2 ms/dispatch relay tax documented in BASELINE.md.

Context: before 2026-08-17 the pipeline FIFOs round-tripped through host
numpy (np.asarray per chunk = a synchronous ~30 ms relay readback); the
FIFOs are now device-resident and this script records the steady state.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

import tpufeat
from tpufeat import pitch

import jax
print("backend =", jax.default_backend(), flush=True)


def steady(fn, chunks, warm=8, iters=40):
    """Median wall time of fn(chunk) after warmup (host-driven path)."""
    outs = []
    for c in chunks[:warm]:
        outs.append(fn(c))
    ts = []
    for c in chunks[warm:warm + iters]:
        t0 = time.perf_counter()
        out = fn(c)
        # force THIS call's work to completion: tiny checksum fetch
        # (block_until_ready is a no-op on the relay)
        float(jnp.sum(out)) if out.size else None
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


B, C = 64, 1600        # 64 streams, 100 ms chunks
rng = np.random.default_rng(0)
audio = (0.1 * rng.standard_normal((B, C * 64))).astype(np.float32)
chunks = [jnp.asarray(audio[:, i * C:(i + 1) * C]) for i in range(64)]

sp = tpufeat.StreamingPipeline(tpufeat.KALDI39, batch_size=B)
ms_pipe = steady(sp.process, chunks)
print(f"StreamingPipeline KALDI39 B={B}, 100 ms chunks: "
      f"{ms_pipe:.2f} ms/chunk ({100/ms_pipe:.1f}x real time)", flush=True)

spf = pitch.StreamingPitchFeatures(pitch.PitchConfig(), batch_size=B,
                                   lookahead=15)
ms_pf = steady(spf.process, chunks)
print(f"StreamingPitchFeatures B={B}, 100 ms chunks: "
      f"{ms_pf:.2f} ms/chunk ({100/ms_pf:.1f}x real time)", flush=True)

import json
print(json.dumps({"pipeline_ms_per_chunk": round(ms_pipe, 2),
                  "pitch_feats_ms_per_chunk": round(ms_pf, 2),
                  "B": B, "chunk_ms": 100}))
