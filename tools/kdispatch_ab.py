"""A/B iters_per_dispatch (k iterations fused per jit call) on the real TPU.

Mesh scenes default to k=2 (render.py): one extra in-graph iteration
recovers most of the 20-60 ms remote-dispatch gap.  This probes whether
k=4/8 buys the remaining half on a mesh scene, within ONE time window
(CLAUDE.md rule 11b: never A/B wall-clock across hours).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/kdispatch_ab.py \
    [scene] [k ...]
"""
import json
import sys
import time

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

args = sys.argv[1:]
scene = "scenes/glassbunny.txt"
if args and not args[0].isdigit():
    scene = args[0]
    args = args[1:]
ks = [int(a) for a in args] or [1, 2, 4, 8]
spp = 16

for k in ks:
    t0 = time.time()
    r = Renderer(scene, opts=RenderOptions(
        sample_mode=SampleMode.MIS, iters_per_dispatch=k,
    ))
    r.step(2 * k)  # warm both the compile and the dispatch path
    compile_s = time.time() - t0
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(spp)
    print(json.dumps({
        "scene": scene, "k": k, "spp": spp,
        "compile_s": round(compile_s, 1),
        "wall_seconds": round(stats.wall_seconds, 4),
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
    }), flush=True)
