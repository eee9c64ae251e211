"""Variants: hardware-precision dots instead of explicit VPU bf16 splits.
allhigh   = all dots f32 operands, precision=HIGH (hw 3-pass)
melhigh   = bf16x3 DFT (explicit) + mel with f32 HIGH
allhighest= all dots f32, precision=HIGHEST (6-pass, reference point)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, TR, H, ROWW = 128, 256, 4, 640
NCS, NM, F = 512, 128, 3072
R = F // H; nblk = R // H // TR * H  # keep simple:
nblk = (F // H) // TR
rng = np.random.default_rng(0)
main = jnp.asarray(rng.standard_normal((B, R, ROWW)), jnp.float32)
bnd = jnp.asarray(rng.standard_normal((B, nblk, 8, ROWW)), jnp.float32)
def bf(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(m)
def win(p):
    s0 = p * 160; e0 = min(s0 + 400, 640)
    a0 = (s0 // 128) * 128; b0 = -(-e0 // 128) * 128
    rem = max(0, s0 + 400 - 640)
    b1 = -(-rem // 128) * 128 if rem else 0
    return (a0, b0 - a0), (0, b1)
consts = []
for p in range(4):
    (a0, k0), (a1, k1) = win(p)
    consts.append(bf(rng.standard_normal((k0, NCS)).astype(np.float32)))
    consts.append(bf(rng.standard_normal((max(k1, 128), NCS)).astype(np.float32)))
consts.append(bf(rng.standard_normal((NCS, NM)).astype(np.float32)))
HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST

def make(mode):
    dft_hw = mode in ("allhigh", "allhighest")
    mel_hw = True
    prec = HIGHEST if mode == "allhighest" else HIGH
    def kern(sig_ref, bnd_ref, *refs):
        out_ref = refs[-1]
        cs = [refs[i:i + 3] for i in range(0, len(refs) - 1, 3)]
        ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)
        if not dft_hw:
            xhi = ext.astype(jnp.bfloat16)
            xlo = (ext - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        outs = []
        for p in range(4):
            (a0, k0), (a1, k1) = win(p)
            c0h, c0l, c0f = cs[2 * p]
            f32 = jnp.float32
            if dft_hw:
                z = jax.lax.dot(ext[:, a0:a0+k0], c0f[:], precision=prec,
                                preferred_element_type=f32)[:TR]
            else:
                z = (jax.lax.dot(xhi[:, a0:a0+k0], c0h[:], preferred_element_type=f32)
                     + jax.lax.dot(xhi[:, a0:a0+k0], c0l[:], preferred_element_type=f32)
                     + jax.lax.dot(xlo[:, a0:a0+k0], c0h[:], preferred_element_type=f32))[:TR]
            if k1:
                c1h, c1l, c1f = cs[2 * p + 1]
                if dft_hw:
                    zz = jax.lax.dot(ext[:, :k1], c1f[:], precision=prec,
                                     preferred_element_type=f32)
                else:
                    zz = (jax.lax.dot(xhi[:, :k1], c1h[:], preferred_element_type=f32)
                          + jax.lax.dot(xhi[:, :k1], c1l[:], preferred_element_type=f32)
                          + jax.lax.dot(xlo[:, :k1], c1h[:], preferred_element_type=f32))
                z = z + pltpu.roll(zz, TR + 8 - 1, axis=0)[:TR]
            sq = z * z
            fbh, fbl, fbf = cs[8]
            mel = jax.lax.dot(sq, fbf[:], precision=prec,
                              preferred_element_type=jnp.float32)
            outs.append(jnp.log10(jnp.maximum(mel * mel + 1e-10, 1e-10)))
        out_ref[0] = jnp.stack(outs, axis=1).reshape(4 * TR, NM)
    specs = [pl.BlockSpec((1, TR, ROWW), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 1, 8, ROWW), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)]
    for tri in consts:
        for m in tri:
            specs.append(pl.BlockSpec(m.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern, grid=(B, nblk), in_specs=specs,
        out_specs=pl.BlockSpec((1, 4 * TR, NM), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, NM), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * F * 6 * (512 * NCS + NCS * NM),
            bytes_accessed=B * R * ROWW * 4 + B * F * NM * 4,
            transcendentals=B * F * NM),
    )

flat = [m for tri in consts for m in tri]
@jax.jit
def cks(t): return jnp.sum(t)
def timeit(fn, chain=16, iters=8):
    args = [main, bnd] + flat
    out = fn(*args); float(cks(out))
    for _ in range(2):
        for _ in range(chain): out = fn(*args)
        float(cks(out))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(chain): out = fn(*args)
        float(cks(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain
for mode in ("allhigh", "melhigh", "allhighest"):
    try:
        print(f"{mode:10s}: {timeit(jax.jit(make(mode)))*1e3:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{mode:10s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
