"""One-window A/B of BLOCK-MAJOR vs packet-major streaming traversal
(STREAM_BLOCKMAJOR) on the bigbunny scenes.

Motivation + sim evidence: tools/stream_union_sim.py — bounce-ray packets
reach ~all subtree blocks under any lane permutation, so the packet-major
DMA ring re-streams nearly the whole mesh once per packet; block-major
streams each block once per 64k-lane ray chunk instead.

Compiles both variants FIRST, then interleaves timed windows ABAB so
dispatch-latency drift cancels (CLAUDE.md rule 11).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/blockmajor_ab.py \
           [levels ...]   (default: 2 3 -> 160k and 640k tris)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

import pathtracer_tpu.ops.traverse_pallas as tp
from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode


def scene_for(level: int) -> str:
    tris = 10000 * 4 ** level
    path = Path(f"/tmp/bigbunny{tris // 1000}k.txt")
    if not path.exists():
        subprocess.run(
            [sys.executable, str(Path(__file__).parent / "make_bigbunny.py"),
             str(level), "/tmp"],
            check=True,
        )
    return str(path)


def main():
    levels = [int(a) for a in sys.argv[1:]] or [2, 3]
    for lv in levels:
        scene = scene_for(lv)
        rends = {}
        for bm in (True, False):
            tp.STREAM_BLOCKMAJOR = bm
            t0 = time.time()
            r = Renderer(scene, opts=RenderOptions(sample_mode=SampleMode.MIS))
            r.step(2)
            print(f"# {Path(scene).stem} blockmajor={bm} compile "
                  f"{time.time() - t0:.0f}s", file=sys.stderr, flush=True)
            rends[bm] = r
        results = {True: [], False: []}
        for rep in range(2):
            for bm in (True, False):
                r = rends[bm]
                r.stats.wall_seconds = 0.0
                r.stats.rays_traced = 0
                st = r.step(4)
                results[bm].append(round(st.mrays_per_sec, 2))
        print(json.dumps({
            "scene": Path(scene).stem,
            "blockmajor_mrays": results[True],
            "packetmajor_mrays": results[False],
        }), flush=True)


if __name__ == "__main__":
    main()
