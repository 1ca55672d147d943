"""A/B the cross-iteration ray-regeneration pool on the real TPU.

One-window ABAB per scene (rule 11b: never compare wall clocks across
hours): for each scene, alternate classic / regen renderers inside a
single process window and report Mrays/s per config.  Usage:

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tools/regen_ab.py \
      glassbunny [regen_k] [spp]

Scenes: glassbunny envbunny texturecube cornell cornell_bsdf mis dielectric
(default regen_k=8).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

_HERE = Path(__file__).resolve().parent.parent

SCENES = {
    "glassbunny": (str(_HERE / "scenes/glassbunny.txt"), SampleMode.MIS, 8),
    "envbunny": (str(_HERE / "scenes/envbunny.txt"), SampleMode.MIS, 16),
    "texturecube": (str(_HERE / "scenes/texturecube.txt"), SampleMode.MIS, 16),
    "cornell": ("/root/reference/scenes/cornell.txt", SampleMode.MIS, 32),
    "cornell_bsdf": ("/root/reference/scenes/cornell.txt", SampleMode.BSDF, 32),
    "mis": ("/root/reference/scenes/mis_test.txt", SampleMode.MIS, 32),
    "dielectric": ("/root/reference/scenes/dielectric_test.txt", SampleMode.BSDF, 32),
}


def window(r: Renderer, spp: int) -> float:
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    r.step(spp)
    return r.stats.mrays_per_sec


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "glassbunny"
    regen_k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path, mode, spp = SCENES[name]
    if len(sys.argv) > 3:
        spp = int(sys.argv[3])

    t0 = time.time()
    ra = Renderer(path, opts=RenderOptions(sample_mode=mode))
    ra.step(max(spp // 4, 2))  # compile + warm
    print(f"# classic compiled+warm in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    rb = Renderer(path, opts=RenderOptions(sample_mode=mode, ray_regen=regen_k))
    assert rb._regen == regen_k, "regen did not engage"
    rb.step(max(spp // 4, 2))
    print(f"# regen k={regen_k} compiled+warm in {time.time()-t0:.0f}s", flush=True)

    for tag, r in (("classic", ra), ("regen", rb), ("classic", ra), ("regen", rb)):
        v = window(r, spp)
        print(f"{name} {tag:8s} {v:8.2f} Mrays/s  "
              f"({r.stats.rays_traced} rays, {r.stats.wall_seconds:.3f}s)",
              flush=True)


if __name__ == "__main__":
    main()
