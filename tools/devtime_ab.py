"""Device-time A/B of RenderOptions variants in ONE time window.

CLAUDE.md rule 11b: wall-clock drifts across hours on this remote
backend, so option A/Bs must compare profiler DEVICE totals captured
back-to-back.  For each variant this runs a traced window and reports:

  dev_ms_iter   sum of leaf device-op durations / iterations traced
  wall_ms_iter  wall clock of the same window / iterations
  gap_ms_iter   wall - device = un-hidden dispatch latency

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/devtime_ab.py \
           [scene] var1 var2 ...
Variants: k1 k2 k4 k8 (iters_per_dispatch), noshadow (shadow_sort off),
          base (auto defaults).  Default set: k2 k4 k8 noshadow.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
import time
from dataclasses import replace
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

import jax

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode


def device_ms(trace_dir: str) -> float:
    """Sum of leaf device-op durations in the newest trace (ms).
    Containers (while/cond/jit wrappers) are skipped to avoid double
    counting; host-side events carry no `source` arg and are skipped."""
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    tot = 0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith("$") or re.match(r"(while|cond|jit_)", name):
            continue
        if not e.get("args", {}).get("source"):
            continue
        tot += e["dur"]
    return tot / 1000.0


def run_variant(scene, tag, opts, iters=6):
    t0 = time.time()
    r = Renderer(scene, opts=opts)
    r.step(max(2, r._k))  # compile + warm (both jit paths)
    compile_s = time.time() - t0
    # timed window
    trace_dir = f"/tmp/devab_{tag}"
    t0 = time.time()
    r.stats.rays_traced = 0
    with jax.profiler.trace(trace_dir):
        r.step(iters)
        np.asarray(r.img[0])
    wall = time.time() - t0
    dev = device_ms(trace_dir)
    rays_iter = r.stats.rays_traced / iters
    out = {
        "tag": tag,
        "k": r._k,
        "compile_s": round(compile_s, 1),
        "dev_ms_iter": round(dev / iters, 1),
        "wall_ms_iter": round(wall * 1000 / iters, 1),
        "gap_ms_iter": round((wall * 1000 - dev) / iters, 1),
        "dev_mrays": round(rays_iter / (dev / iters) / 1000.0, 2),
        "wall_mrays": round(rays_iter / (wall * 1000 / iters) / 1000.0, 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    args = sys.argv[1:]
    scene = "scenes/glassbunny.txt"
    if args and not re.match(r"^(k\d+|noshadow|base)$", args[0]):
        scene = args[0]
        args = args[1:]
    variants = args or ["k2", "k4", "k8", "noshadow"]
    base = RenderOptions(sample_mode=SampleMode.MIS)
    for tag in variants:
        if tag == "base":
            opts = base
        elif tag.startswith("k"):
            opts = replace(base, iters_per_dispatch=int(tag[1:]))
        elif tag == "noshadow":
            # packet_auto would re-enable shadow_sort for this scene
            # class, so pin every auto knob manually with the sort off
            opts = replace(base, shadow_sort=False, packet_auto=False,
                           packet_p=4, packet_q=8, packet_rows=16,
                           shrink_half=True)
        run_variant(scene, tag, opts)


if __name__ == "__main__":
    main()
