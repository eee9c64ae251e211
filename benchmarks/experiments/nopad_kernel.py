"""Replica kernel with 160-lane (= hop) operand rows, no pre-pad copy."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, F, TF = 128, 3072, 512
HOP, NCS, NM = 160, 512, 128
nblk = F // TF

rng = np.random.default_rng(0)
main = jnp.asarray(rng.standard_normal((B, F, HOP)), jnp.float32)
bnd = jnp.asarray(rng.standard_normal((B, nblk, 8, HOP)), jnp.float32)
def bf(shape):
    m = rng.standard_normal(shape).astype(np.float32)
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)
# shift matrices contract the full 160-lane row (shift 2 only needs 80, but
# keep full K; zero rows in the matrix handle it)
d0 = bf((HOP, NCS)); d1 = bf((HOP, NCS)); d2 = bf((HOP, NCS))
fb = bf((NCS, NM))

def cdot(xhi, xlo, c):
    chi, clo = c
    f32 = jnp.float32
    return (jax.lax.dot(xhi, chi, preferred_element_type=f32)
            + jax.lax.dot(xhi, clo, preferred_element_type=f32)
            + jax.lax.dot(xlo, chi, preferred_element_type=f32))

def kern(sig_ref, bnd_ref, d0h, d0l, d1h, d1l, d2h, d2l, fbh, fbl, out_ref):
    ext = jnp.concatenate([sig_ref[0], bnd_ref[0, 0]], axis=0)
    xhi = ext.astype(jnp.bfloat16)
    xlo = (ext - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
    z = cdot(xhi, xlo, (d0h[:], d0l[:]))[:TF]
    for s, d in ((1, (d1h, d1l)), (2, (d2h, d2l))):
        zs = cdot(xhi, xlo, (d[0][:], d[1][:]))
        z = z + pltpu.roll(zs, TF + 8 - s, axis=0)[:TF]
    sq = z * z
    zhi = sq.astype(jnp.bfloat16)
    zlo = (sq - zhi.astype(jnp.float32)).astype(jnp.bfloat16)
    mel = cdot(zhi, zlo, (fbh[:], fbl[:]))
    mel = jnp.log10(jnp.maximum(mel * mel + 1e-10, 1e-10))
    out_ref[0] = mel

specs = [pl.BlockSpec((1, TF, HOP), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
         pl.BlockSpec((1, 1, 8, HOP), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)]
for c in (d0, d1, d2, fb):
    for m in c:
        specs.append(pl.BlockSpec(m.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM))
fn = jax.jit(pl.pallas_call(
    kern, grid=(B, nblk), in_specs=specs,
    out_specs=pl.BlockSpec((1, TF, NM), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, F, NM), jnp.float32),
    cost_estimate=pl.CostEstimate(
        flops=B * F * 6 * (HOP * NCS * 3 + NCS * NM),
        bytes_accessed=B * F * (HOP + NM) * 4, transcendentals=B * F * NM),
))

args = [main, bnd] + [m for c in (d0, d1, d2, fb) for m in c]
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
t = float(np.median(ts)) / 16
print(f"nopad 160-lane kernel: {t*1e3:8.3f} ms")
