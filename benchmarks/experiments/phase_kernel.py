"""Replica: 4-hop (640-lane) rows, 4 interleaved frame phases, aligned K cuts."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128
F = 3072            # frames, multiple of 4*TR
TR = 128            # row-block: TR rows of 640 = 4*TR frames per block
NF_BLK = 4 * TR     # 512 frames per block
HOPS = 4; ROWW = 640
NCS, NM = 512, 128
R = F // 4          # total rows
nblk = R // TR

rng = np.random.default_rng(0)
main = jnp.asarray(rng.standard_normal((B, R, ROWW)), jnp.float32)
bnd = jnp.asarray(rng.standard_normal((B, nblk, 8, ROWW)), jnp.float32)

def bf(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)

# per phase p: frame covers samples [p*160, p*160+400) of a 2-row (1280) window
# shift 0 contracts an aligned lane window of row r; shift 1 of row r+1
# aligned windows (start, size): computed host-side
def win(p):
    s0 = p * 160; e0 = min(s0 + 400, 640)
    a0 = (s0 // 128) * 128; b0 = -(-e0 // 128) * 128
    rem = max(0, s0 + 400 - 640)
    b1 = -(-rem // 128) * 128 if rem else 0
    return (a0, b0 - a0), (0, b1)

consts = []
for p in range(4):
    (a0, k0), (a1, k1) = win(p)
    m0 = rng.standard_normal((k0, NCS)).astype(np.float32)
    consts.append(bf(m0))
    m1 = rng.standard_normal((max(k1, 128), NCS)).astype(np.float32)
    consts.append(bf(m1))
fb = bf(rng.standard_normal((NCS, NM)).astype(np.float32))
consts.append(fb)

def cdot(xhi, xlo, chi, clo):
    f32 = jnp.float32
    return (jax.lax.dot(xhi, chi, preferred_element_type=f32)
            + jax.lax.dot(xhi, clo, preferred_element_type=f32)
            + jax.lax.dot(xlo, chi, preferred_element_type=f32))

def kern(sig_ref, bnd_ref, *refs):
    out_ref = refs[-1]
    cs = [(refs[i], refs[i + 1]) for i in range(0, len(refs) - 1, 2)]
    ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)  # [TR+8, 640]
    xhi = ext.astype(jnp.bfloat16)
    xlo = (ext - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
    mels = []
    for p in range(4):
        (a0, k0), (a1, k1) = win(p)
        c0h, c0l = cs[2 * p]
        z = cdot(xhi[:, a0:a0 + k0], xlo[:, a0:a0 + k0], c0h[:], c0l[:])[:TR]
        if k1:
            c1h, c1l = cs[2 * p + 1]
            zs = cdot(xhi[:, :k1], xlo[:, :k1], c1h[:], c1l[:])
            z = z + pltpu.roll(zs, TR + 8 - 1, axis=0)[:TR]
        sq = z * z
        shi = sq.astype(jnp.bfloat16)
        slo = (sq - shi.astype(jnp.float32)).astype(jnp.bfloat16)
        fbh, fbl = cs[8]
        mel = cdot(shi, slo, fbh[:], fbl[:])
        mel = jnp.log10(jnp.maximum(mel * mel + 1e-10, 1e-10))
        mels.append(mel)
    # interleave phases: [TR, 4, NM] -> [4*TR, NM]
    stacked = jnp.stack(mels, axis=1)
    out_ref[0] = stacked.reshape(NF_BLK, NM)

specs = [pl.BlockSpec((1, TR, ROWW), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
         pl.BlockSpec((1, 1, 8, ROWW), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)]
flat = []
for pair in consts:
    for m in pair:
        specs.append(pl.BlockSpec(m.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM))
        flat.append(m)
fn = jax.jit(pl.pallas_call(
    kern, grid=(B, nblk), in_specs=specs,
    out_specs=pl.BlockSpec((1, NF_BLK, NM), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, F, NM), jnp.float32),
    cost_estimate=pl.CostEstimate(
        flops=B * F * 6 * (512 * NCS + NCS * NM),
        bytes_accessed=B * R * ROWW * 4 + B * F * NM * 4,
        transcendentals=B * F * NM),
))

args = [main, bnd] + flat
@jax.jit
def cks(t): return jnp.sum(t)
out = fn(*args); float(cks(out))
def run(chain=16):
    for _ in range(chain): o = fn(*args)
    return float(cks(o))
for _ in range(2): run()
ts = []
for _ in range(8):
    t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
print(f"phase-packed kernel: {float(np.median(ts))/16*1e3:8.3f} ms")
