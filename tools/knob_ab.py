"""End-to-end (packet_p, packet_q, packet_rows) A/B on the real TPU.

The r2 knob sweep that fixed rows=8 predates the packet-purity sort bit
and the straggler pool shrink (both r3): purer packets change the
lap-count tradeoff (rows=16 halves packet count for ~15% union growth in
tools/union_sim.py), so the optimum may have moved.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/knob_ab.py \
    [scene] P,Q,ROWS[,LEAF_K] [P,Q,ROWS[,LEAF_K] ...]
"""
import json
import sys
import time

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

import pathtracer_tpu.scene.flatscene as fs
from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

args = sys.argv[1:]
scene = "scenes/glassbunny.txt"
if args and "," not in args[0]:
    scene = args[0]
    args = args[1:]
configs = [tuple(map(int, a.split(","))) for a in args] or [
    (2, 4, 8), (2, 4, 16), (4, 4, 16), (4, 8, 16), (2, 2, 16),
]
spp = 8

for cfg in configs:
    (P, Q, R), K = cfg[:3], (cfg[3] if len(cfg) > 3 else 8)
    fs.WIDE_LEAF_K = K
    t0 = time.time()
    r = Renderer(scene, opts=RenderOptions(
        sample_mode=SampleMode.MIS, packet_auto=False,
        packet_p=P, packet_q=Q, packet_rows=R,
    ))
    r.step(2)
    compile_s = time.time() - t0
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(spp)
    print(json.dumps({
        "scene": scene, "P": P, "Q": Q, "rows": R, "leaf_k": K, "spp": spp,
        "compile_s": round(compile_s, 1),
        "wall_seconds": round(stats.wall_seconds, 4),
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
    }), flush=True)
    del r
