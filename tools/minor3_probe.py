"""Microbench the two hot (N,3) minor-axis patterns from the cornell lap:

  dot:   jnp.sum(a*b, -1)              vs  a[...,0]*b[...,0]+... (slices)
  slab:  max/argmax over axis -1       vs  explicit 3-way select chain

The cornell profile shows ~28 multiply_reduce fusions (~8 ms/iter) and
12 iota_reduce fusions (~6 ms/iter) from exactly these patterns.
Scalar readback; in-graph fori_loop repetition.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/minor3_probe.py [N] [reps]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100

a = jax.random.normal(jax.random.PRNGKey(0), (N, 3), jnp.float32)
b = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)


def time_loop(fn, *args):
    f = jax.jit(lambda *xs: jnp.sum(lax.fori_loop(
        0, REPS, lambda i, acc: acc + fn(*args), jnp.zeros((N,), jnp.float32))))
    r = f(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    np.asarray(f(*args))
    return (time.perf_counter() - t0) / REPS * 1e3, float(np.asarray(r))


def dot_reduce(a, b):
    return jnp.sum(a * b, axis=-1)


def dot_slice(a, b):
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def slab_reduce(a, b):
    ta = jnp.minimum(a, b)
    tb = jnp.maximum(a, b)
    ta_g = jnp.where(ta > 0.0, ta, -1e38)
    tmin = jnp.max(ta_g, axis=-1)
    ax_min = jnp.argmax(ta_g, axis=-1)
    tmax = jnp.min(tb, axis=-1)
    ax_max = jnp.argmin(tb, axis=-1)
    return tmin + tmax + ax_min.astype(jnp.float32) + ax_max.astype(jnp.float32)


def slab_select(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    tax, tay, taz = (jnp.minimum(ax, bx), jnp.minimum(ay, by),
                     jnp.minimum(az, bz))
    tbx, tby, tbz = (jnp.maximum(ax, bx), jnp.maximum(ay, by),
                     jnp.maximum(az, bz))
    gx = jnp.where(tax > 0.0, tax, -1e38)
    gy = jnp.where(tay > 0.0, tay, -1e38)
    gz = jnp.where(taz > 0.0, taz, -1e38)
    # max + argmax via select chain (first max wins ties like argmax)
    tmin = jnp.maximum(gx, jnp.maximum(gy, gz))
    ax_min = jnp.where(gx >= tmin, 0.0, jnp.where(gy >= tmin, 1.0, 2.0))
    tmax = jnp.minimum(tbx, jnp.minimum(tby, tbz))
    ax_max = jnp.where(tbx <= tmax, 0.0, jnp.where(tby <= tmax, 1.0, 2.0))
    return tmin + tmax + ax_min + ax_max


for name, fn in [("dot_reduce", dot_reduce), ("dot_slice", dot_slice),
                 ("slab_reduce", slab_reduce), ("slab_select", slab_select)]:
    ms, s = time_loop(fn, a, b)
    print(f"{name:12s} {ms:8.4f} ms/rep   (sum {s:.6g})", flush=True)
