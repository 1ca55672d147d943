"""Capture per-bounce ray states (o, d, t_init) from a glassbunny render
and save them to /tmp/bounce_states.npz for host-side traversal analysis
(tools/union_sim.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/capture_states.py [cpu] [res]
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

import pathtracer_tpu.scene.flatscene as fs

fs.WIDE_LEAF_K = 8

from pathtracer_tpu.integrator.wavefront import CameraArrays, make_render_iteration
from pathtracer_tpu.ops.traverse import _geoms_closest, DEAD_T
from pathtracer_tpu.ops.intersect import ray_aabb
from pathtracer_tpu.scene.camera import derive_camera
from pathtracer_tpu.scene.flatscene import build_flat_scene
from pathtracer_tpu.scene.parser import load_scene
from pathtracer_tpu.utils import rng
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

res = None
for a in sys.argv[1:]:
    if "x" in a:
        res = tuple(int(t) for t in a.split("x"))

scene = load_scene("scenes/glassbunny.txt")
if res:
    scene.camera.resolution = list(res)
flat, static = build_flat_scene(scene)
W, H = scene.camera.resolution
opts = RenderOptions(sample_mode=SampleMode.MIS, compaction=False)
if jax.default_backend() == "cpu":
    from dataclasses import replace
    opts = replace(opts, pallas_traversal=False)
builder = make_render_iteration(static, opts, W, H)
p, v, u, r_, pl_ = derive_camera(scene.camera).as_arrays()
cam = CameraArrays(*[jnp.asarray(x) for x in (p, v, u, r_, pl_)])
key = rng.base_key(0)

state = jax.jit(builder.start_state)(
    flat, cam, jnp.zeros((W * H, 3), jnp.float32), jnp.int32(1), key
)
step = jax.jit(builder.bounce_step)
out = {}
for b in range(6):
    t_geo, _, _, _ = _geoms_closest(flat, static, state.o, state.d)
    t_init = jnp.where(state.alive, t_geo, DEAD_T)
    rb = static.tri_root_box
    rb_hit, rb_enter = ray_aabb(
        jnp.array(rb[0:3], jnp.float32), jnp.array(rb[3:6], jnp.float32),
        state.o, state.d,
    )
    t_init = jnp.where(rb_hit & (rb_enter <= t_init), t_init, DEAD_T)
    out[f"o{b}"] = np.asarray(state.o)
    out[f"d{b}"] = np.asarray(state.d)
    out[f"t{b}"] = np.asarray(t_init)
    print(f"bounce {b}: alive {int(np.asarray(state.alive).sum())}", flush=True)
    state, alive = step(flat, key, jnp.int32(1), state)

np.savez("/tmp/bounce_states.npz", nb=6, **out)
print("saved /tmp/bounce_states.npz")
