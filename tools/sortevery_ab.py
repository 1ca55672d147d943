"""A/B the per-bounce sort cadence (RenderOptions.sort_every) on the TPU.

The per-bounce multi-operand sort costs ~6 ms/bounce at 640k lanes
(profiled ~39 ms/iter on glassbunny); purity decays as rays scatter, so
sorting every k-th bounce trades kernel time against sort time.  Output
is bit-identical for any k (lane-keyed RNG, ride-the-ray accumulation).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sortevery_ab.py \
    [scene] [k ...]       (default glassbunny, k = 1 2 3)
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
ks = [int(a) for a in args] or [1, 2, 3]
spp = 8

for k in ks:
    t0 = time.time()
    r = Renderer(scene, opts=RenderOptions(
        sample_mode=SampleMode.MIS, sort_every=k,
    ))
    r.step(2)
    compile_s = time.time() - t0
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(spp)
    print(json.dumps({
        "scene": scene, "sort_every": k, "spp": spp,
        "compile_s": round(compile_s, 1),
        "wall_seconds": round(stats.wall_seconds, 4),
        "rays": stats.rays_traced,
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
    }), flush=True)
    del r
