"""A/B the pool/2 leading shrink level on the real TPU (ABAB, one window).

Resident mesh scenes (glassbunny class) keep 25-50% liveness for the tail
bounces (tools/liveness_probe.py: 50/42/35% at depths 5-7) — the quarter
ladder never fires there, so every tail bounce pays full-pool kernels and
sorts.  The half level fires once alive <= 50% and costs nothing extra at
the boundary (the per-bounce sort already runs).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/halfshrink_ab.py \
    [scene] [spp]
"""
import json
import sys
import time
from dataclasses import replace

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

args = sys.argv[1:]
scene = args[0] if args else "scenes/glassbunny.txt"
spp = int(args[1]) if len(args) > 1 else 16

renderers = {}
for half in (False, True):
    t0 = time.time()
    # packet_auto now sets shrink_half=True for the resident-mesh class;
    # pin every knob it sets and vary only the half level
    r = Renderer(scene, opts=RenderOptions(
        sample_mode=SampleMode.MIS, packet_auto=False,
        packet_p=4, packet_q=8, packet_rows=16, shadow_sort=True,
        shrink_half=half,
    ))
    r.step(2)  # compile + warm
    print(f"half={int(half)} compiled in {time.time() - t0:.0f}s", flush=True)
    renderers[half] = r

for rep in range(2):
    for half in (False, True):
        r = renderers[half]
        r.stats.wall_seconds = 0.0
        r.stats.rays_traced = 0
        stats = r.step(spp)
        print(json.dumps({
            "scene": scene, "shrink_half": half, "rep": rep, "spp": spp,
            "wall_seconds": round(stats.wall_seconds, 4),
            "mrays_per_sec": round(stats.mrays_per_sec, 3),
        }), flush=True)
