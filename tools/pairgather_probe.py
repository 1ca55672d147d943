"""Probe: can TPU gathers fetch TWO packed u32 texels per element via
complex64, bit-exactly, and how much faster is a 2-gather bilinear tap
than the current 4-gather one?

The texturecube loop is ~75% texture gathers (4 bilinear corners x
pool x bounce).  A complex64 atlas packs texel pairs (y, y+1) of one
column into real/imag; with TWO copies (even-y pairs and odd-y pairs,
concatenated) every bilinear tap needs exactly 2 gathers: one pair for
the (lx, ly)/(lx, uy) column, one for the (ux, *) column — IF
real/imag extraction is bit-preserving for arbitrary u32 payloads
(NaN patterns included).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/pairgather_probe.py [cpu]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

# --- exactness: every dangerous bit pattern must round-trip ---
rng = np.random.default_rng(0)
pats = np.concatenate([
    rng.integers(0, 2**32, size=1 << 16, dtype=np.uint64).astype(np.uint32),
    np.array([0, 1, 0x7F800000, 0xFF800000, 0x7FC00000, 0xFFC00001,
              0x7F800001, 0x00800000, 0x80000001, 0xFFFFFFFF], np.uint32),
])
n = pats.size // 2 * 2
lo, hi = pats[:n:2], pats[1:n:2]
# pack by BIT VIEW (complex arithmetic would canonicalize NaN payloads)
inter = np.empty(n, np.uint32)
inter[0::2] = lo
inter[1::2] = hi
packed = inter.view(np.complex64)
pk = jnp.asarray(packed)
idx = jnp.asarray(np.arange(n // 2, dtype=np.int32))
g = pk[idx]
lo2 = jax.lax.bitcast_convert_type(jnp.real(g), jnp.uint32)
hi2 = jax.lax.bitcast_convert_type(jnp.imag(g), jnp.uint32)
ok_lo = bool(jnp.all(lo2 == jnp.asarray(lo)))
ok_hi = bool(jnp.all(hi2 == jnp.asarray(hi)))
print(f"bit-exact round-trip: lo={ok_lo} hi={ok_hi}", flush=True)

# --- throughput: 4-gather u32 tap vs 2-gather c64 tap, atlas ~8 MB ---
P = 1 << 21  # texels
N = 640_000  # rays
atlas32 = jnp.asarray(rng.integers(0, 2**32, size=P, dtype=np.uint64).astype(np.uint32))
a64 = np.asarray(atlas32).view(np.uint32)
pair_even = a64.view(np.complex64)
atlas_c = jnp.asarray(np.concatenate([pair_even, pair_even]))
i00 = jnp.asarray(rng.integers(0, P - 4097, size=N, dtype=np.int64).astype(np.int32))


@jax.jit
def tap4(a, i00):
    def bodyf(k, acc):
        s = (
            a[i00 + k].astype(jnp.float32)
            + a[i00 + 1 + k].astype(jnp.float32)
            + a[i00 + 4096 + k].astype(jnp.float32)
            + a[i00 + 4097 + k].astype(jnp.float32)
        )
        return acc + s

    return jax.lax.fori_loop(0, 8, bodyf, jnp.zeros((N,), jnp.float32))


@jax.jit
def tap2(ac, i00):
    def bodyf(k, acc):
        top = ac[(i00 + k) // 2]
        bot = ac[(i00 + 4096 + k) // 2]
        s = (
            jax.lax.bitcast_convert_type(jnp.real(top), jnp.uint32).astype(jnp.float32)
            + jax.lax.bitcast_convert_type(jnp.imag(top), jnp.uint32).astype(jnp.float32)
            + jax.lax.bitcast_convert_type(jnp.real(bot), jnp.uint32).astype(jnp.float32)
            + jax.lax.bitcast_convert_type(jnp.imag(bot), jnp.uint32).astype(jnp.float32)
        )
        return acc + s

    return jax.lax.fori_loop(0, 8, bodyf, jnp.zeros((N,), jnp.float32))


for name, fn, arg in (("tap4_u32", tap4, atlas32), ("tap2_c64", tap2, atlas_c)):
    out = fn(arg, i00)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(arg, i00)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name}: {dt*1e3:.2f} ms for {N} rays x 8 taps x 4 corners", flush=True)
