"""Variant zconcat: phase-major z concat -> one [1024,512] mel matmul ->
interleave only the [*,128] output. Plus melx2: 2-pass mel (accuracy probe)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, TR, H, ROWW = 128, 256, 4, 640
NCS, NM, F = 512, 128, 3072
R = F // H; nblk = R // TR
rng = np.random.default_rng(0)
main = jnp.asarray(rng.standard_normal((B, R, ROWW)), jnp.float32)
bnd = jnp.asarray(rng.standard_normal((B, nblk, 8, ROWW)), jnp.float32)
def bf(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)
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

def make(mode):
    def cdot(xhi, xlo, chi, clo, passes=3):
        f32 = jnp.float32
        out = jax.lax.dot(xhi, chi, preferred_element_type=f32)
        if passes >= 2:
            out = out + jax.lax.dot(xhi, clo, preferred_element_type=f32)
        if passes >= 3:
            out = out + jax.lax.dot(xlo, chi, preferred_element_type=f32)
        return out
    def kern(sig_ref, bnd_ref, *refs):
        out_ref = refs[-1]
        cs = [(refs[i], refs[i + 1]) for i in range(0, len(refs) - 1, 2)]
        ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)
        xhi = ext.astype(jnp.bfloat16)
        xlo = (ext - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        zs_all = []
        for p in range(4):
            (a0, k0), (a1, k1) = win(p)
            c0h, c0l = cs[2 * p]
            z = cdot(xhi[:, a0:a0 + k0], xlo[:, a0:a0 + k0], c0h[:], c0l[:])[:TR]
            if k1:
                c1h, c1l = cs[2 * p + 1]
                zz = cdot(xhi[:, :k1], xlo[:, :k1], c1h[:], c1l[:])
                z = z + pltpu.roll(zz, TR + 8 - 1, axis=0)[:TR]
            zs_all.append(z)
        fbh, fbl = cs[8]
        if mode in ("zconcat", "zconcat2"):
            zf = jnp.concatenate(zs_all, axis=0)        # [4*TR, NCS] phase-major
            sq = zf * zf
            shi = sq.astype(jnp.bfloat16)
            slo = (sq - shi.astype(jnp.float32)).astype(jnp.bfloat16)
            mel = cdot(shi, slo, fbh[:], fbl[:],
                       passes=2 if mode == "zconcat2" else 3)
            mel = jnp.log10(jnp.maximum(mel * mel + 1e-10, 1e-10))
            # phase-major [H*TR, NM] -> frame order r*H+p
            out_ref[0] = (mel.reshape(H, TR, NM).transpose(1, 0, 2)
                          .reshape(H * TR, NM))
        else:  # melx2: per-phase, 2-pass mel
            outs = []
            for z in zs_all:
                sq = z * z
                shi = sq.astype(jnp.bfloat16)
                slo = (sq - shi.astype(jnp.float32)).astype(jnp.bfloat16)
                mel = cdot(shi, slo, fbh[:], fbl[:], passes=2)
                outs.append(jnp.log10(jnp.maximum(mel * mel + 1e-10, 1e-10)))
            out_ref[0] = jnp.stack(outs, axis=1).reshape(4 * TR, NM)
    specs = [pl.BlockSpec((1, TR, ROWW), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
             pl.BlockSpec((1, 1, 8, ROWW), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)]
    for pair in consts:
        for m in pair:
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

flat = [m for pair in consts for m in pair]
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
for mode in ("zconcat", "melx2", "zconcat2"):
    print(f"{mode:8s}: {timeit(jax.jit(make(mode)))*1e3:8.3f} ms", flush=True)
