"""Probe: does a size-2 WINDOW gather (lax.gather slice_sizes=(2,))
cost like ONE gather or like TWO on this TPU backend?

A bilinear tap reads texel pairs (lx, lx+1) on two rows (ly, uy).  If a
2-element window gather is priced per-GATHER rather than per-element,
the 4-scalar-gather tap becomes 2 window gathers — an exact-parity tap
halving (the complex64 pair trick was rejected UNIMPLEMENTED by the
backend, tools/pairgather_probe.py).

Edge exactness is handled by the caller: gather CLIP mode clamps the
window start to P-2, so t00 = win[lx - s], t10 = win[ux - s] with
s = min(lx, P-2) reproduces the clamp-to-edge convention bit-exactly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/windowgather_probe.py [cpu]
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

P = 1 << 21          # ~8 MB u32 atlas
N = 640_000          # rays
WIDTH = 4096
REPS = 64

rng = np.random.default_rng(0)
atlas = jnp.asarray(rng.integers(0, 2**32, size=P, dtype=np.uint64).astype(np.uint32))
i00 = jnp.asarray(rng.integers(0, P - WIDTH - 2, size=N, dtype=np.int64).astype(np.int32))


def win2(a, starts, lead):
    """(N,) starts -> window [a[s], a[s+1]]; lead=True gives (2, N) output."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,) if lead else (1,),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    return jax.lax.gather(
        a, starts[:, None], dnums, slice_sizes=(2,),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


@jax.jit
def tap4(a, i00):
    def bodyf(k, acc):
        s = (
            a[i00 + k].astype(jnp.float32)
            + a[i00 + 1 + k].astype(jnp.float32)
            + a[i00 + WIDTH + k].astype(jnp.float32)
            + a[i00 + WIDTH + 1 + k].astype(jnp.float32)
        )
        return acc + s

    return jax.lax.fori_loop(0, REPS, bodyf, jnp.zeros(i00.shape, jnp.float32))


def make_tapw(lead):
    @jax.jit
    def tapw(a, i00):
        def bodyf(k, acc):
            top = win2(a, i00 + k, lead)
            bot = win2(a, i00 + WIDTH + k, lead)
            if lead:
                s = (top[0].astype(jnp.float32) + top[1].astype(jnp.float32)
                     + bot[0].astype(jnp.float32) + bot[1].astype(jnp.float32))
            else:
                s = (top[:, 0].astype(jnp.float32) + top[:, 1].astype(jnp.float32)
                     + bot[:, 0].astype(jnp.float32) + bot[:, 1].astype(jnp.float32))
            return acc + s

        return jax.lax.fori_loop(0, REPS, bodyf, jnp.zeros(i00.shape, jnp.float32))

    return tapw


# correctness first (tiny, on whatever backend)
ref = np.asarray(tap4(atlas, i00[:1024]))
for lead in (True, False):
    got = np.asarray(make_tapw(lead)(atlas, i00[:1024]))
    print(f"win2 lead={lead} exact={bool(np.array_equal(ref, got))}", flush=True)

jobs = [("tap4_scalar", tap4), ("tapw2_lead", make_tapw(True)), ("tapw2_minor", make_tapw(False))]
for name, fn in jobs:
    try:
        out = fn(atlas, i00)
        np.asarray(out)
        t0 = time.perf_counter()
        out = fn(atlas, i00)
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(f"{name}: {dt/REPS*1e3:.3f} ms/tap-rep  ({N} rays, {REPS} reps)", flush=True)
    except Exception as e:  # backend rejections print, not crash
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
