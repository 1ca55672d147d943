"""A/B bench on the real TPU: glassbunny MIS, sort on/off x wide leaf size.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_ab.py [K ...]
"""
import sys
import time

import numpy as np

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

import pathtracer_tpu.scene.flatscene as fs
from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

ks = [int(a) for a in sys.argv[1:]] or [16]
scene = "scenes/glassbunny.txt"

for k in ks:
    fs.WIDE_LEAF_K = k
    for sort in (False, True):
        opts = RenderOptions(sample_mode=SampleMode.MIS, compaction=sort)
        r = Renderer(scene, opts=opts)
        r.step(1)
        t0 = time.perf_counter()
        r.step(4)
        dt = time.perf_counter() - t0
        mrays = r.stats.rays_traced / dt / 1e6
        print(
            f"K={k} sort={int(sort)}: {dt:.3f}s  {mrays:7.2f} Mrays/s  "
            f"(compile {r.stats.compile_seconds:.0f}s, wide_nodes={r.static.wide_nodes})",
            flush=True,
        )
