"""Round-3 mel-fill attack (VERDICT item 4): bf16x3 as ONE stacked-K dot.

The bf16x3 decomposition hi@chi + hi@clo + lo@chi runs three skinny
matmuls per logical matmul; for the per-phase [TR,512]@[512,128] mels the
MXU pays pipeline fill + weight reload three times for 0.28 ms of FLOPs
each. Algebraically the sum is a SINGLE matmul with stacked K:

    [hi | hi | lo] @ [[chi], [clo], [chi]]     (K -> 3K)

— identical products, one MXU pass, one weight stream. The cost moved to
the VPU: a [TR, 3K] bf16 lane-concat per operand. This script measures
whisper-shaped replicas (B=128, F=3072, the phase_anatomy.py harness):

  base       current production v5 (3-dot bf16x3)
  stackmel   mel matmul stacked; DFT unchanged
  stackall   DFT entry dots stacked too
  melpair2   stacked mel on phase-PAIRED [2TR, 3*512] operands
  melpair4   stacked mel on all-4-phase [4TR, 3*512] operands
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128
TR = 256
H = 4; ROWW = 640
NCS, NM = 512, 128
F = 3072
R = F // H
nblk = R // TR

rng = np.random.default_rng(0)
main = jnp.asarray(rng.standard_normal((B, R, ROWW)), jnp.float32)
bnd = jnp.asarray(rng.standard_normal((B, nblk, 8, ROWW)), jnp.float32)

def bf(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)

def win(p):
    s0 = p * 160; e0 = min(s0 + 400, 640)
    a0 = (s0 // 128) * 128; b0 = -(-e0 // 128) * 128
    rem = max(0, s0 + 400 - 640)
    b1 = -(-rem // 128) * 128 if rem else 0
    return (a0, b0 - a0), (0, b1)

def stack3(hi, lo):
    """[chi; clo; chi] for the single stacked-K dot."""
    return jnp.asarray(np.concatenate([hi, lo, hi], axis=0))

DMATS = []          # per phase: list of (a, k, hi, lo) f32 host mats
for p in range(4):
    (a0, k0), (a1, k1) = win(p)
    mats = [(a0, k0, *bf(rng.standard_normal((k0, NCS)).astype(np.float32)))]
    if k1:
        mats.append((a1, k1,
                     *bf(rng.standard_normal((k1, NCS)).astype(np.float32))))
    DMATS.append(mats)
FBH, FBL = bf(rng.standard_normal((NCS, NM)).astype(np.float32))


def make(mode):
    stack_mel = mode in ("stackmel", "stackall", "melpair2", "melpair4")
    stack_dft = mode == "stackall"
    consts = []
    for mats in DMATS:
        for (a, k, hi, lo) in mats:
            if stack_dft:
                consts.append((stack3(hi, lo),))
            else:
                consts.append((jnp.asarray(hi), jnp.asarray(lo)))
    consts.append((stack3(FBH, FBL),) if stack_mel
                  else (jnp.asarray(FBH), jnp.asarray(FBL)))

    f32 = jnp.float32

    def cdot3(xhi, xlo, pair):
        return (jax.lax.dot(xhi, pair[0][:], preferred_element_type=f32)
                + jax.lax.dot(xhi, pair[1][:], preferred_element_type=f32)
                + jax.lax.dot(xlo, pair[0][:], preferred_element_type=f32))

    def cdot_stacked(xhi, xlo, cref):
        lhs = jnp.concatenate([xhi, xhi, xlo], axis=1)
        return jax.lax.dot(lhs, cref[:], preferred_element_type=f32)

    def kern(sig_ref, bnd_ref, *refs):
        out_ref = refs[-1]
        crefs = []
        i = 0
        flat = refs[:-1]
        n_dft = sum(len(m) for m in DMATS)
        for j in range(n_dft + 1):
            w = 1 if ((j < n_dft and stack_dft)
                      or (j == n_dft and stack_mel)) else 2
            crefs.append(flat[i: i + w]); i += w
        ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)
        xhi = ext.astype(jnp.bfloat16)
        xlo = (ext - xhi.astype(f32)).astype(jnp.bfloat16)
        rows = ext.shape[0]
        mi = 0
        zs_all = []
        for p in range(4):
            z = None
            for e, (a, k, _, _) in enumerate(DMATS[p]):
                c = crefs[mi]; mi += 1
                if stack_dft:
                    zk = cdot_stacked(xhi[:, a:a + k], xlo[:, a:a + k], c[0])
                else:
                    zk = cdot3(xhi[:, a:a + k], xlo[:, a:a + k], c)
                s = e                    # 2nd entry is the next row (shift 1)
                if s:
                    zk = pltpu.roll(zk, rows - s, axis=0)
                zk = zk[:TR]
                z = zk if z is None else z + zk
            zs_all.append(z)
        fbref = crefs[n_dft]

        def mel_of(sq):
            if stack_mel:
                shi = sq.astype(jnp.bfloat16)
                slo = (sq - shi.astype(f32)).astype(jnp.bfloat16)
                m = cdot_stacked(shi, slo, fbref[0])
            else:
                shi = sq.astype(jnp.bfloat16)
                slo = (sq - shi.astype(f32)).astype(jnp.bfloat16)
                m = cdot3(shi, slo, fbref)
            return jnp.log10(jnp.maximum(m, 1e-10))

        if mode == "melpair4":
            sq = jnp.concatenate([z * z for z in zs_all], axis=0)
            mel = mel_of(sq)
            outs = [mel[p * TR: (p + 1) * TR] for p in range(4)]
        elif mode == "melpair2":
            outs = [None] * 4
            for p in (0, 2):
                sq = jnp.concatenate(
                    [zs_all[p] * zs_all[p], zs_all[p + 1] * zs_all[p + 1]],
                    axis=0)
                mel = mel_of(sq)
                outs[p], outs[p + 1] = mel[:TR], mel[TR:]
        else:
            outs = [mel_of(z * z) for z in zs_all]
        out_ref[0] = jnp.stack(outs, axis=1).reshape(4 * TR, NM)

    specs = [pl.BlockSpec((1, TR, ROWW), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 1, 8, ROWW), lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)]
    flat_consts = [m for tup in consts for m in tup]
    for m in flat_consts:
        specs.append(pl.BlockSpec(m.shape, lambda b, i: (0, 0),
                                  memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kern, grid=(B, nblk), in_specs=specs,
        out_specs=pl.BlockSpec((1, 4 * TR, NM), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, NM), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * F * 6 * (512 * NCS + NCS * NM),
            bytes_accessed=B * R * ROWW * 4 + B * F * NM * 4,
            transcendentals=B * F * NM),
    )
    return call, flat_consts


@jax.jit
def cks(t):
    return jnp.sum(t)


def timeit(fn, args, chain=16, iters=8):
    out = fn(*args); float(cks(out))
    for _ in range(2):
        for _ in range(chain):
            out = fn(*args)
        float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args)
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain


results = {}
base_out = None
for mode in ("base", "stackmel", "stackall", "melpair2", "melpair4"):
    call, flat = make(mode)
    fn = jax.jit(call)
    args = [main, bnd] + flat
    out = np.asarray(fn(*args)[0, :64])
    if base_out is None:
        base_out = out
    diff = np.abs(out - base_out).max()
    t = timeit(fn, args)
    results[mode] = t
    print(f"{mode:9s}: {t*1e3:8.3f} ms   max|diff vs base|={diff:.2e}",
          flush=True)
