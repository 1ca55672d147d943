"""Is cornell dispatch-bound?  Python-loop step() vs k-unrolled jit.

Cornell's fused iteration measures ~45 ms/iter through Renderer.step's
Python dispatch loop in BOTH modes, ~10x above a speed-of-light estimate
for 9 laps of elementwise work over a 640k-lane pool — suggesting the
remote-backend dispatch rate (several small RPCs per iteration: the
render call + the rays_total accumulate) starves the device, not the
kernel.  This probe times the SAME compiled body two ways:

  loop   — Renderer.step(N): one dispatch chain per iteration
  unroll — jit of K sequential render_iteration calls (one dispatch per
           K iterations; sequential while_loops, NOT nested, so it
           avoids the CLAUDE.md rule-5 pathology)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dispatch_probe.py \
    [scene] [mode] [K] [N]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.integrator.wavefront import make_render_iteration
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

scene = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/scenes/cornell.txt"
mode = {"mis": SampleMode.MIS, "bsdf": SampleMode.BSDF,
        "direct": SampleMode.DIRECT_LI}[sys.argv[2] if len(sys.argv) > 2 else "bsdf"]
K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
N = int(sys.argv[4]) if len(sys.argv) > 4 else 32

import os

res = None
if os.environ.get("PROBE_RES"):
    w, h = os.environ["PROBE_RES"].split("x")
    res = (int(w), int(h))
# iters_per_dispatch=1: the Renderer now auto-batches, so the "loop" arm
# must force the one-dispatch-per-iteration path to stay a comparison
r = Renderer(scene, opts=RenderOptions(iters_per_dispatch=1).with_mode(mode),
             resolution=res)
assert not r.staged, "probe assumes the fused single-dispatch path"
print(f"backend {jax.default_backend()}  tris {r.static.num_tris}  "
      f"mode {mode.name}  K {K}  N {N}", flush=True)

r.step(1)
print(f"compile {r.stats.compile_seconds:.1f}s", flush=True)
t0 = time.perf_counter()
r.step(N)
np.asarray(r.img[0])
dt = time.perf_counter() - t0
print(f"loop:   {N} iters {dt:.3f}s  {dt / N * 1e3:.1f} ms/iter  "
      f"{r.stats.rays_traced / r.stats.wall_seconds / 1e6:.1f} Mrays/s(stats)",
      flush=True)

# reproduce the Renderer's swizzle so bitmatch compares like with like
# (mesh scenes order lanes in 32x32 pixel blocks; without this the
# unrolled image is lane-permuted and bitmatch reads False spuriously)
pixel_xy = None
if r.pixel_order is not None:
    xs = jnp.asarray((r.pixel_order % r.width).astype(np.float32))
    ys = jnp.asarray((r.pixel_order // r.width).astype(np.float32))
    pixel_xy = (xs, ys)
body = make_render_iteration(r.static, r.opts, r.width, r.height,
                             pixel_xy=pixel_xy)


def step_k(flat, cam, img, it0, key):
    rays = jnp.float32(0)
    depth = jnp.int32(0)
    for i in range(K):
        img, rr, depth = body(flat, cam, img, it0 + jnp.int32(i), key)
        rays = rays + rr.astype(jnp.float32)
    return img, rays, depth


stepk = jax.jit(step_k)
cam = r._cam_arrays()
img = jnp.zeros((r.width * r.height, 3), jnp.float32)
t0 = time.perf_counter()
img, rays, depth = stepk(r.flat, cam, img, jnp.int32(1), r.key)
np.asarray(img[0])
print(f"unroll compile {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
tot = 0.0
it = 1
img = jnp.zeros((r.width * r.height, 3), jnp.float32)
for _ in range(max(N // K, 1)):
    img, rays, depth = stepk(r.flat, cam, img, jnp.int32(it), r.key)
    tot += float(np.asarray(rays))  # also forces completion per call
    it += K
dt = time.perf_counter() - t0
iters = max(N // K, 1) * K
print(f"unroll: {iters} iters {dt:.3f}s  {dt / iters * 1e3:.1f} ms/iter  "
      f"{tot / dt / 1e6:.1f} Mrays/s", flush=True)

# sanity: unrolled accumulator matches the loop result bit-for-bit when
# run over the same iteration indices
img2 = jnp.zeros((r.width * r.height, 3), jnp.float32)
for i in range(1, K + 1):
    img2, _, _ = r._iter_fn(r.flat, cam, img2, jnp.int32(i), r.key)
img1, _, _ = stepk(r.flat, cam, jnp.zeros_like(img2), jnp.int32(1), r.key)
print("bitmatch:", bool(jnp.all(img1 == img2)), flush=True)
