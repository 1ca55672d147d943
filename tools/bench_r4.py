"""Round-4 refresh of the non-driver PARITY throughput rows.

Single sequential TPU session (rule 10): dielectric_test, mis_test,
microfacet_test at steady-state windows, one JSON line each.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_r4.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

REF = Path("/root/reference/scenes")

JOBS = [
    (REF / "dielectric_test.txt", "bsdf", 32),
    (REF / "mis_test.txt", "mis", 32),
    (REF / "microfacet_test.txt", "bsdf", 32),
    (REF / "microfacet_test.txt", "mis", 32),
]

MODES = {"bsdf": SampleMode.BSDF, "mis": SampleMode.MIS,
         "direct": SampleMode.DIRECT_LI}

for scene, mode, spp in JOBS:
    t0 = time.time()
    r = Renderer(str(scene), opts=RenderOptions(sample_mode=MODES[mode]))
    r.step(2)
    compile_s = time.time() - t0
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    st = r.step(spp)
    print(json.dumps({
        "scene": scene.stem, "mode": mode, "spp": spp,
        "compile_s": round(compile_s, 1),
        "mrays_per_sec": round(st.mrays_per_sec, 2),
    }), flush=True)
