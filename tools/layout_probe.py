"""Layout microbench: (N,3) AoS vs 3x(N,) SoA columns for vec math.

The cornell lap profile is a broad mix of ~0.3-1 ms fusions, many of them
multiply_reduce (dot products over the minor-3 axis).  If XLA handles the
3-wide minor dim well, AoS==SoA; if each dot's cross-lane reduce breaks
fusion and pads lanes, SoA wins and the wavefront state should carry
columns.  In-graph fori_loop repetition per CLAUDE.md timing rules.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/layout_probe.py [N] [reps]
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
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (N, 3), jnp.float32)
b = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)
c = jax.random.normal(jax.random.PRNGKey(2), (N, 3), jnp.float32)


def work_aos(a, b, c):
    # a representative shading snippet: normalize, two dots, a select,
    # a fused multiply-add — all (N,3)/(N,) mixed
    d = a * b + c
    n = d / jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    t = jnp.sum(n * b, axis=-1)
    w = jnp.where((t > 0.0)[..., None], n * t[..., None], c)
    return w + a * jnp.maximum(t, 0.1)[..., None]


def work_soa(ax, ay, az, bx, by, bz, cx, cy, cz):
    dx, dy, dz = ax * bx + cx, ay * by + cy, az * bz + cz
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    nx, ny, nz = dx * inv, dy * inv, dz * inv
    t = nx * bx + ny * by + nz * bz
    pos = t > 0.0
    wx = jnp.where(pos, nx * t, cx)
    wy = jnp.where(pos, ny * t, cy)
    wz = jnp.where(pos, nz * t, cz)
    mt = jnp.maximum(t, 0.1)
    return wx + ax * mt, wy + ay * mt, wz + az * mt


@jax.jit
def loop_aos(a, b, c):
    def body(i, acc):
        return work_aos(acc, b, c)

    # scalar readback: the remote tunnel makes full-array transfers slow
    # enough to pollute per-rep times
    return jnp.sum(lax.fori_loop(0, REPS, body, a))


@jax.jit
def loop_soa(cols):
    def body(i, acc):
        ax, ay, az = acc
        return work_soa(ax, ay, az, *cols[3:])[0:3]

    # carry only the first vec; b/c columns closed over via cols
    out = lax.fori_loop(0, REPS, body, (cols[0], cols[1], cols[2]))
    return jnp.sum(out[0]) + jnp.sum(out[1]) + jnp.sum(out[2])


cols = tuple(x[:, i] for x in (a, b, c) for i in range(3))

r = loop_aos(a, b, c)
np.asarray(r)
t0 = time.perf_counter()
r = loop_aos(a, b, c)
np.asarray(r)
aos = (time.perf_counter() - t0) / REPS

r2 = loop_soa(cols)
np.asarray(r2)
t0 = time.perf_counter()
r2 = loop_soa(cols)
np.asarray(r2)
soa = (time.perf_counter() - t0) / REPS

print(f"N={N} reps={REPS}")
print(f"AoS (N,3): {aos * 1e3:.3f} ms/rep")
print(f"SoA 3x(N,): {soa * 1e3:.3f} ms/rep  ratio AoS/SoA = {aos / soa:.2f}")
print("sums:", float(np.asarray(r)), float(np.asarray(r2)))
