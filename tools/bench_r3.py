"""Round-3 perf measurement on the real TPU: all perf-frontier scenes
with the current code (packet-purity sort bit + straggler pool shrink).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_r3.py [scene ...]
Scenes: cornell_mis glassbunny envbunny bigbunny160k texturecube (default all)
"""
import json
import sys
import time

import numpy as np

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

JOBS = {
    "cornell_mis": ("/root/reference/scenes/cornell.txt", SampleMode.MIS, 16),
    "cornell_bsdf": ("/root/reference/scenes/cornell.txt", SampleMode.BSDF, 32),
    "microfacet": ("/root/reference/scenes/microfacet_test.txt", SampleMode.BSDF, 16),
    "dielectric": ("/root/reference/scenes/dielectric_test.txt", SampleMode.BSDF, 16),
    "glassbunny": ("scenes/glassbunny.txt", SampleMode.MIS, 8),
    "envbunny": ("scenes/envbunny.txt", SampleMode.MIS, 4),
    "bigbunny160k": ("/tmp/bigbunny160k.txt", SampleMode.MIS, 4),
    "bigbunny640k": ("/tmp/bigbunny640k.txt", SampleMode.MIS, 2),
    "texturecube": ("scenes/texturecube.txt", SampleMode.MIS, 8),
}

names = sys.argv[1:] or list(JOBS)
for name in names:
    shadow = name.endswith("+ss")
    job = name[:-3] if shadow else name
    path, mode, spp = JOBS[job]
    t0 = time.time()
    r = Renderer(path, opts=RenderOptions(sample_mode=mode, shadow_sort=shadow))
    r.step(2)
    compile_s = time.time() - t0
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(spp)
    print(json.dumps({
        "scene": name, "spp": spp,
        "compile_s": round(compile_s, 1),
        "wall_seconds": round(stats.wall_seconds, 4),
        "rays": stats.rays_traced,
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
    }), flush=True)
    del r
