"""One-window A/B of packet knobs (P, Q, rows) on the STREAMING path.

The packet_auto upgrade to (4, 8, 16) is gated to RESIDENT scenes
(integrator/render.py); stream scenes run the (2, 4, 8) default — i.e.
1024-lane packets.  tools/stream_union_sim.py shows the per-packet block
union grows only ~5% from 1024 to 2048 lanes while the packet count
halves, and the stream walk is lap-floor-bound (blockmajor A/B proved the
DMA fully hidden) — so wider packets should cut block walks per ray
almost linearly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/streamknobs_ab.py \
           [level] [cfgs ...]     e.g. 3 2,4,8 4,8,16 2,4,16
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

from blockmajor_ab import scene_for


def main():
    args = sys.argv[1:]
    level = int(args[0]) if args else 3
    cfgs = [tuple(int(x) for x in a.split(",")) for a in args[1:]] or [
        (2, 4, 8), (4, 8, 16), (2, 4, 16)
    ]
    scene = scene_for(level)
    rends = {}
    for cfg in cfgs:
        p, q, rows = cfg
        t0 = time.time()
        r = Renderer(scene, opts=RenderOptions(
            sample_mode=SampleMode.MIS, packet_auto=False,
            packet_p=p, packet_q=q, packet_rows=rows,
        ))
        r.step(2)
        print(f"# {Path(scene).stem} {cfg} compile {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
        rends[cfg] = r
    results = {str(c): [] for c in cfgs}
    for rep in range(2):
        for cfg in cfgs:
            r = rends[cfg]
            r.stats.wall_seconds = 0.0
            r.stats.rays_traced = 0
            st = r.step(4)
            results[str(cfg)].append(round(st.mrays_per_sec, 2))
    print(json.dumps({"scene": Path(scene).stem, **results}), flush=True)


if __name__ == "__main__":
    main()
