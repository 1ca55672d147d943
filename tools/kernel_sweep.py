"""Sweep (p_nodes, q_leaves, rows) of the wide packet kernels on REAL
bounce-ray distributions captured from a glassbunny render.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_sweep.py [configs...]
Each config is "P,Q,ROWS".  Default sweep: 2,2,16 4,2,16 4,4,16 2,2,8 4,4,8 8,4,16
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

import pathtracer_tpu.scene.flatscene as fs

fs.WIDE_LEAF_K = 8

from pathtracer_tpu.integrator.wavefront import CameraArrays, make_render_iteration
from pathtracer_tpu.ops.traverse import _geoms_closest, DEAD_T
from pathtracer_tpu.ops.intersect import ray_aabb
from pathtracer_tpu.ops.traverse_pallas import closest_hit_wbvh_pallas
from pathtracer_tpu.scene.camera import derive_camera
from pathtracer_tpu.scene.flatscene import build_flat_scene
from pathtracer_tpu.scene.parser import load_scene
from pathtracer_tpu.utils import rng
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

scene = load_scene("scenes/glassbunny.txt")
flat, static = build_flat_scene(scene)
W, H = scene.camera.resolution
opts = RenderOptions(sample_mode=SampleMode.MIS, compaction=False)
builder = make_render_iteration(static, opts, W, H)
p, v, u, r_, pl_ = derive_camera(scene.camera).as_arrays()
cam = CameraArrays(*[jnp.asarray(x) for x in (p, v, u, r_, pl_)])
key = rng.base_key(0)

# capture per-bounce ray states via the staged API
state = jax.jit(builder.start_state)(
    flat, cam, jnp.zeros((W * H, 3), jnp.float32), jnp.int32(1), key
)
step = jax.jit(builder.bounce_step)
states = []
for b in range(6):
    t_geo, _, _, _ = _geoms_closest(flat, static, state.o, state.d)
    t_init = jnp.where(state.alive, t_geo, DEAD_T)
    rb = static.tri_root_box
    rb_hit, rb_enter = ray_aabb(
        jnp.array(rb[0:3], jnp.float32), jnp.array(rb[3:6], jnp.float32),
        state.o, state.d,
    )
    t_init = jnp.where(rb_hit & (rb_enter <= t_init), t_init, DEAD_T)
    states.append(
        (jax.device_put(np.asarray(state.o)),
         jax.device_put(np.asarray(state.d)),
         jax.device_put(np.asarray(t_init)),
         int(np.asarray(state.alive).sum()))
    )
    state, alive = step(flat, key, jnp.int32(1), state)
print("captured bounces, alive:", [s[3] for s in states], flush=True)

if sys.argv[1:] and sys.argv[1] == "sorted":
    # pre-sort rays by (alive, octant, cell) on the host: measures the
    # KERNEL-side value of coherent packets, ignoring permute cost
    sb = np.asarray(static.scene_bounds, np.float32)
    sorted_states = []
    for (o, d, t0, alive_n) in states:
        o_, d_, t_ = np.asarray(o), np.asarray(d), np.asarray(t0)
        cell = np.clip(
            (o_ - sb[0:3]) / np.maximum(sb[3:6] - sb[0:3], 1e-6) * 7.999,
            0, 7.999,
        ).astype(np.int64)
        octant = (d_[:, 0] > 0) + 2 * (d_[:, 1] > 0) + 4 * (d_[:, 2] > 0)
        key_ = ((octant * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 + cell[:, 2]
        key_ = np.where(t_ > -1e37, key_, 1 << 20)
        perm = np.argsort(key_, kind="stable")
        sorted_states.append(
            (jax.device_put(o_[perm]), jax.device_put(d_[perm]),
             jax.device_put(t_[perm]), alive_n)
        )
    states = sorted_states
    sys.argv = sys.argv[:1] + sys.argv[2:]

configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
    (2, 2, 16), (4, 2, 16), (4, 4, 16), (2, 2, 8), (4, 4, 8), (8, 4, 16),
]
wf, wi, wp, tri = flat.bvh_wf, flat.bvh_wi, flat.bvh_wp, flat.tri_pk
for (P, Q, R) in configs:
    def run_all():
        outs = []
        for (o, d, t0, _) in states:
            outs.append(closest_hit_wbvh_pallas(
                wf, wi, wp, tri, o, d, t0,
                leaf_k=8, p_nodes=P, q_leaves=Q, rows=R,
            )[0])
        return outs

    outs = run_all()
    np.asarray(outs[-1][0])  # compile+finish
    t0c = time.perf_counter()
    reps = 3
    for _ in range(reps):
        outs = run_all()
    for o_ in outs:
        np.asarray(o_[0])
    dt = (time.perf_counter() - t0c) / reps
    rays = sum(s[3] for s in states)
    print(f"P={P} Q={Q} rows={R}: {dt*1000:7.1f} ms for 6 closest passes "
          f"({rays/dt/1e6:6.1f} Mrays/s eq)", flush=True)
