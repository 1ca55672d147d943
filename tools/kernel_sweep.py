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
        (np.asarray(state.o), np.asarray(state.d), np.asarray(t_init),
         int(np.asarray(state.alive).sum()))
    )
    state, alive = step(flat, key, jnp.int32(1), state)
print("captured bounces, alive:", [s[3] for s in states], flush=True)

configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
    (2, 2, 16), (4, 2, 16), (4, 4, 16), (2, 2, 8), (4, 4, 8), (8, 4, 16),
]
wf, wi, wp, tri = flat.bvh_wf, flat.bvh_wi, flat.bvh_wp, flat.tri_pk
for (P, Q, R) in configs:
    def run_all():
        outs = []
        for (o, d, t0, _) in states:
            outs.append(closest_hit_wbvh_pallas(
                wf, wi, wp, tri, jnp.asarray(o), jnp.asarray(d),
                jnp.asarray(t0), leaf_k=8, p_nodes=P, q_leaves=Q, rows=R,
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
