"""A/B the dense-top closest-hit preamble end-to-end on the real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dense_ab.py \
    [scene] [D ...]
Defaults: glassbunny, D in (0, 9, 33).
"""
import json
import sys
import time

import numpy as np

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

scene = "scenes/glassbunny.txt"
args = sys.argv[1:]
if args and not args[0].isdigit():
    scene = args[0]
    args = args[1:]
ds = [int(a) for a in args] or [0, 9, 33]

ref_img = None
for dense in ds:
    t0 = time.time()
    r = Renderer(
        scene,
        opts=RenderOptions(sample_mode=SampleMode.MIS, packet_dense=dense),
    )
    r.step(2)
    compile_s = time.time() - t0
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(8)
    img = np.asarray(r.img)
    if ref_img is None:
        ref_img = img
    print(json.dumps({
        "dense": dense,
        "wide_nodes": int(r.static.wide_nodes),
        "compile_s": round(compile_s, 1),
        "wall_seconds": round(stats.wall_seconds, 4),
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
        "bitexact_vs_d0": bool((img == ref_img).all()),
    }), flush=True)
    del r
