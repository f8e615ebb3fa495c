"""Probe which primitives Mosaic supports on the real TPU.

Run: python tools/pallas_probe.py
Each probe prints OK/FAIL — the sqz4 Pallas kernel design depends on these.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(*args)
        r = np.asarray(r)
        print(f"OK   {name}: {r.reshape(-1)[:4]}")
        return r
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None


B = 128
x = np.arange(B, dtype=np.uint32).reshape(1, B) * 0x01010101
s = (np.arange(B, dtype=np.uint32) % 31).reshape(1, B)

# 1. variable per-lane shift
run("var_shl", lambda xr, sr, o: o.__setitem__(slice(None), xr[:] << sr[:]),
    jax.ShapeDtypeStruct((1, B), jnp.uint32), x, s)
run("var_shr", lambda xr, sr, o: o.__setitem__(slice(None), xr[:] >> sr[:]),
    jax.ShapeDtypeStruct((1, B), jnp.uint32), x, s)

# 2. clz on u32
run("clz_u32", lambda xr, o: o.__setitem__(slice(None), jax.lax.clz(xr[:])),
    jax.ShapeDtypeStruct((1, B), jnp.uint32), x)

# 3. u32 multiply low
run("mul_lo", lambda xr, sr, o: o.__setitem__(slice(None), xr[:] * sr[:]),
    jax.ShapeDtypeStruct((1, B), jnp.uint32), x, s + 3)

# 4. u32 mulhi via jnp? (lax.mul_hi isn't public; emulate with 16-bit split)
def mulhi_kernel(xr, yr, o):
    a, b = xr[:], yr[:]
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    mid = (m00 >> 16) + (m01 & 0xFFFF) + (m10 & 0xFFFF)
    o[:] = m11 + (m01 >> 16) + (m10 >> 16) + (mid >> 16)
y = (x * 2654435761).astype(np.uint32)
r = run("mulhi_emul", mulhi_kernel, jax.ShapeDtypeStruct((1, B), jnp.uint32), x, y)
if r is not None:
    want = ((x.astype(np.uint64) * y.astype(np.uint64)) >> 32).astype(np.uint32)
    print("     mulhi correct:", np.array_equal(r, want))

# 5. sublane reduction (sum over axis 0 of [256, B])
t = np.arange(256 * B, dtype=np.uint32).reshape(256, B) % 97
run("sublane_reduce",
    lambda tr, o: o.__setitem__(slice(None), jnp.sum(tr[:], axis=0, keepdims=True)),
    jax.ShapeDtypeStruct((1, B), jnp.uint32), t)

# 6. cumsum along sublane axis
run("sublane_cumsum",
    lambda tr, o: o.__setitem__(slice(None), jnp.cumsum(tr[:], axis=0)),
    jax.ShapeDtypeStruct((256, B), jnp.uint32), t)

# 7. while_loop with vector carry inside kernel
def wl_kernel(xr, o):
    def cond(c):
        i, v = c
        return i < 10
    def body(c):
        i, v = c
        return i + 1, v + v
    _, v = jax.lax.while_loop(cond, body, (jnp.int32(0), xr[:]))
    o[:] = v
run("while_loop", wl_kernel, jax.ShapeDtypeStruct((1, B), jnp.uint32), x)

# 8. onehot extract: per-lane table[sym[lane]] from [256, B]
def onehot_kernel(tr, ir, o):
    iota = jax.lax.broadcasted_iota(jnp.uint32, (256, B), 0)
    sel = (iota == ir[:]).astype(jnp.uint32)
    o[:] = jnp.sum(sel * tr[:], axis=0, keepdims=True)
idx = (np.arange(B, dtype=np.uint32) % 256).reshape(1, B)
run("onehot_extract", onehot_kernel, jax.ShapeDtypeStruct((1, B), jnp.uint32), t, idx)

# 9. f32 <-> u32 conversion + reciprocal division
def fdiv_kernel(ar, br, o):
    a = ar[:].astype(jnp.float32)
    binv = 1.0 / br[:].astype(jnp.float32)
    q = (a * binv).astype(jnp.uint32)
    # correct
    r = ar[:] - q * br[:]
    q = jnp.where(r.astype(jnp.int32) < 0, q - 1, q)
    r = ar[:] - q * br[:]
    q = jnp.where(r >= br[:], q + 1, q)
    o[:] = q
num = (np.arange(B, dtype=np.uint32) * 12347 % (1 << 22)).reshape(1, B)
den = (np.arange(B, dtype=np.uint32) % 1000 + 1).reshape(1, B)
r = run("f32_div", fdiv_kernel, jax.ShapeDtypeStruct((1, B), jnp.uint32), num, den)
if r is not None:
    print("     f32_div correct:", np.array_equal(r, num // den))

# 10. u8 load + u32 convert from [N, B] u8
u8buf = (np.arange(64 * B) % 251).astype(np.uint8).reshape(64, B)
run("u8_convert",
    lambda br_, o: o.__setitem__(slice(None), br_[:].astype(jnp.uint32)[:1]),
    jax.ShapeDtypeStruct((1, B), jnp.uint32), u8buf)

# 11. dynamic sublane slice read at traced offset (pl.ds)
def dynslice_kernel(tr, ir, o):
    off = ir[0, 0]
    o[:] = tr[pl.ds(off, 1), :]
off = np.array([[3]], dtype=np.int32)
run("dyn_sublane_read", dynslice_kernel,
    jax.ShapeDtypeStruct((1, B), jnp.uint32), t, off)

# 12. scalar SMEM input
def smem_kernel(sr, tr, o):
    o[:] = tr[:1] + sr[0]
try:
    f = pl.pallas_call(
        smem_kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    r = jax.jit(f)(np.array([7], dtype=np.uint32), t)
    print("OK   smem_scalar:", np.asarray(r).reshape(-1)[:4])
except Exception as e:
    print("FAIL smem_scalar:", str(e).split("\n")[0][:160])

# 13. u64 in kernel?
def u64_kernel(xr, o):
    v = xr[:].astype(jnp.uint64)
    o[:] = ((v * v) >> jnp.uint64(32)).astype(jnp.uint32)
run("u64_native", u64_kernel, jax.ShapeDtypeStruct((1, B), jnp.uint32), x)

print("devices:", jax.devices())
