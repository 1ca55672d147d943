"""A/B the analytic-scene shrink ladder on the real TPU (ABAB, one window).

Open analytic scenes (mis_test: sphere lights over floating ramps) lose
most lanes to the void by depth 2, but never sorted/shrunk before the
ladder was decoupled from the purity sort (wavefront.py shrink_ok).
Closed analytic scenes (cornell) should be UNCHANGED: the ladder's cond
never fires there (liveness stays high until the depth budget).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/shrink_analytic_ab.py \
    [scene] [spp]
"""
import json
import sys
import time

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

args = sys.argv[1:]
scene = args[0] if args else "/root/reference/scenes/mis_test.txt"
spp = int(args[1]) if len(args) > 1 else 16

renderers = {}
for shrink in (False, True):
    t0 = time.time()
    r = Renderer(scene, opts=RenderOptions(
        sample_mode=SampleMode.MIS, pool_shrink=shrink,
    ))
    r.step(2)  # compile + warm
    print(f"shrink={int(shrink)} compiled in {time.time() - t0:.0f}s", flush=True)
    renderers[shrink] = r

# ABAB within one window (rule 11: never A/B across hours)
for rep in range(2):
    for shrink in (False, True):
        r = renderers[shrink]
        r.stats.wall_seconds = 0.0
        r.stats.rays_traced = 0
        stats = r.step(spp)
        print(json.dumps({
            "scene": scene, "shrink": shrink, "rep": rep, "spp": spp,
            "wall_seconds": round(stats.wall_seconds, 4),
            "mrays_per_sec": round(stats.mrays_per_sec, 3),
        }), flush=True)
