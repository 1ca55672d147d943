"""Validate the fusion-boundary hypothesis on the REAL cornell sweep.

The cornell device trace shows ~450 fusion executions per iteration at
30-90 us each (~41 ms/iter): every dot/argmax over the (N,3) minor axis
is a reduce that ends its fusion, so the lap becomes ~50 HBM round trips
instead of a handful.  This probe times the production _geoms_closest
(AoS) against a hand-written SoA sweep (columns end to end, no reduces)
on the actual cornell geometry, in-graph fori_loop, scalar readback.

If SoA wins big (>2.5x), the wavefront/ops core is worth refactoring to
columns; if not, the fusion-count theory is wrong — stop there.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_probe.py [N] [reps]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.ops.traverse import _geoms_closest
from pathtracer_tpu.scene.flatscene import build_flat_scene
from pathtracer_tpu.scene.parser import load_scene
from pathtracer_tpu.scene.parser import SPHERE, CUBE

N = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

scene = load_scene("/root/reference/scenes/cornell.txt")
flat, static = build_flat_scene(scene)

k0, k1 = jax.random.split(jax.random.PRNGKey(7))
o = jax.random.uniform(k0, (N, 3), jnp.float32, -4.0, 4.0)
d = jax.random.normal(k1, (N, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)


# ---- SoA sweep: columns end to end, zero reduces ------------------------

def _xp(m, px, py, pz):
    # m is a STATIC (4,4) -> folds to scalar constants
    return (m[0, 0] * px + m[0, 1] * py + m[0, 2] * pz + m[0, 3],
            m[1, 0] * px + m[1, 1] * py + m[1, 2] * pz + m[1, 3],
            m[2, 0] * px + m[2, 1] * py + m[2, 2] * pz + m[2, 3])


def _xv(m, vx, vy, vz):
    return (m[0, 0] * vx + m[0, 1] * vy + m[0, 2] * vz,
            m[1, 0] * vx + m[1, 1] * vy + m[1, 2] * vz,
            m[2, 0] * vx + m[2, 1] * vy + m[2, 2] * vz)


def soa_sweep(ox, oy, oz, dx, dy, dz):
    FLT_MAX = jnp.float32(3.4e38)
    t_min = jnp.full_like(ox, FLT_MAX)
    geom = jnp.full(ox.shape, -1, jnp.int32)
    for gi, gtype in enumerate(static.geom_types):
        inv = flat.geom_inv[gi]
        tr = flat.geom_transform[gi]
        rox, roy, roz = _xp(inv, ox, oy, oz)
        rdx, rdy, rdz = _xv(inv, dx, dy, dz)
        ilen = lax.rsqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        rdx, rdy, rdz = rdx * ilen, rdy * ilen, rdz * ilen
        if gtype == SPHERE:
            vdd = rox * rdx + roy * rdy + roz * rdz
            rad = vdd * vdd - (rox * rox + roy * roy + roz * roz - 0.25)
            root = jnp.sqrt(jnp.maximum(rad, 0.0))
            t1, t2 = -vdd + root, -vdd - root
            valid = (rad >= 0.0) & ~((t1 < 0.0) & (t2 < 0.0))
            t_obj = jnp.where((t1 > 0.0) & (t2 > 0.0),
                              jnp.minimum(t1, t2), jnp.maximum(t1, t2))
        elif gtype == CUBE:
            i1x, i2x = (-0.5 - rox) / rdx, (0.5 - rox) / rdx
            i1y, i2y = (-0.5 - roy) / rdy, (0.5 - roy) / rdy
            i1z, i2z = (-0.5 - roz) / rdz, (0.5 - roz) / rdz
            tax, tbx = jnp.minimum(i1x, i2x), jnp.maximum(i1x, i2x)
            tay, tby = jnp.minimum(i1y, i2y), jnp.maximum(i1y, i2y)
            taz, tbz = jnp.minimum(i1z, i2z), jnp.maximum(i1z, i2z)
            gx = jnp.where(tax > 0.0, tax, -1e38)
            gy = jnp.where(tay > 0.0, tay, -1e38)
            gz = jnp.where(taz > 0.0, taz, -1e38)
            tmin = jnp.maximum(gx, jnp.maximum(gy, gz))
            tmax = jnp.minimum(tbx, jnp.minimum(tby, tbz))
            valid = (tmax >= tmin) & (tmax > 0.0)
            t_obj = jnp.where(tmin <= 0.0, tmax, tmin)
        else:
            continue
        # world-t quirk: |xform(hit) - origin| (pull-back 1e-4)
        px = rox + (t_obj - 1e-4) * rdx
        py = roy + (t_obj - 1e-4) * rdy
        pz = roz + (t_obj - 1e-4) * rdz
        wx, wy, wz = _xp(tr, px, py, pz)
        t = jnp.sqrt((wx - ox) ** 2 + (wy - oy) ** 2 + (wz - oz) ** 2)
        better = valid & (t > 0.0) & (t < t_min)
        t_min = jnp.where(better, t, t_min)
        geom = jnp.where(better, gi, geom)
    return t_min, geom


def time_loop(fn, init):
    f = jax.jit(lambda x: lax.fori_loop(
        0, REPS, lambda i, acc: fn(acc), init)[0])

    def run():
        r = f(init)
        if isinstance(r, tuple):
            r = r[0]
        return np.asarray(jnp.sum(jnp.where(jnp.isfinite(r), r, 0.0)))

    # separate sum-jit would re-dispatch; keep it simple: readback sum
    s = run()
    t0 = time.perf_counter()
    s = run()
    return (time.perf_counter() - t0) / REPS * 1e3, float(s)


# perturb origins per rep so the loop isn't folded away
def aos_step(acc):
    oo = o + acc[..., None] * 1e-6
    t, g, p, n = _geoms_closest(flat, static, oo, d)
    return (t,)


def soa_step(acc):
    ox = o[:, 0] + acc * 1e-6
    t, g = soa_sweep(ox, o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
    return (t,)


ms_aos, s_aos = time_loop(lambda acc: aos_step(acc[0]) , (jnp.zeros((N,), jnp.float32),))
ms_soa, s_soa = time_loop(lambda acc: soa_step(acc[0]), (jnp.zeros((N,), jnp.float32),))
print(f"N={N} reps={REPS} geoms={static.num_geoms}")
print(f"AoS _geoms_closest: {ms_aos:8.4f} ms/rep   sum {s_aos:.6g}")
print(f"SoA sweep:          {ms_soa:8.4f} ms/rep   sum {s_soa:.6g}  "
      f"ratio {ms_aos / ms_soa:.2f}")

# numeric agreement on the winner t (AoS computes point/normal too — the
# sweep phase dominates; SoA omits them here, t/geom must still agree)
t_a, g_a, _, _ = jax.jit(lambda: _geoms_closest(flat, static, o, d))()
t_s, g_s = jax.jit(lambda: soa_sweep(o[:, 0], o[:, 1], o[:, 2],
                                     d[:, 0], d[:, 1], d[:, 2]))()
ta = np.asarray(t_a)
ts = np.asarray(t_s)
ga = np.asarray(g_a)
gs = np.asarray(g_s)
print("geom agree:", float((ga == gs).mean()),
      " t allclose:", bool(np.allclose(np.where(np.isfinite(ta), ta, 0),
                                       np.where(np.isfinite(ts), ts, 0),
                                       rtol=1e-5, atol=1e-5)))
