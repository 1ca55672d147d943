"""Sweep iters_per_dispatch (k) on the real TPU within one window.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ksweep.py \
    [scene] [mode] [spp] [k ...]
Defaults: cornell BSDF, 48 spp, k in (8, 16, 24).
"""
import json
import sys
import time

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

args = sys.argv[1:]
scene = args[0] if args else "/root/reference/scenes/cornell.txt"
mode = {"mis": SampleMode.MIS, "bsdf": SampleMode.BSDF}[
    args[1] if len(args) > 1 else "bsdf"]
spp = int(args[2]) if len(args) > 2 else 48
ks = [int(a) for a in args[3:]] or [8, 16, 24]

for k in ks:
    t0 = time.time()
    r = Renderer(
        scene,
        opts=RenderOptions(sample_mode=mode, iters_per_dispatch=k),
    )
    r.step(k)
    compile_s = time.time() - t0
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(spp)
    print(json.dumps({
        "k": k, "spp": spp,
        "compile_s": round(compile_s, 1),
        "wall_seconds": round(stats.wall_seconds, 4),
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
    }), flush=True)
    del r
