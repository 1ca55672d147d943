"""Benchmark runner — prints ONE summary JSON line for the driver.

Headline metric (BASELINE.json): Mrays/s on the cornell + glass-bunny
scenes; target > 100 Mrays/s per v5e chip.  Runs on whatever backend the
environment provides (the driver supplies the real TPU).

Rays are counted as the reference would issue them: one primary/bounce ray
per live path per depth plus NEE shadow rays (SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

_HERE = Path(__file__).resolve().parent

SCENES = [
    # (name, path, mode, spp, depth_override)
    ("cornell", "/root/reference/scenes/cornell.txt", "bsdf", 32, None),
    ("cornell_mis", "/root/reference/scenes/cornell.txt", "mis", 16, None),
    ("glassbunny", str(_HERE / "scenes/glassbunny.txt"), "mis", 8, None),
    ("envbunny", str(_HERE / "scenes/envbunny.txt"), "mis", 4, None),
    ("texturecube", str(_HERE / "scenes/texturecube.txt"), "mis", 8, None),
]


def bench_scene(name, path, mode, spp, depth):
    import jax

    from pathtracer_tpu.integrator.render import Renderer
    from pathtracer_tpu.utils.config import RenderOptions, SampleMode

    mode_map = {
        "bsdf": SampleMode.BSDF,
        "direct": SampleMode.DIRECT_LI,
        "mis": SampleMode.MIS,
    }
    r = Renderer(
        path,
        opts=RenderOptions(sample_mode=mode_map[mode]),
        trace_depth=depth,
    )
    r.step(2)  # compile + warm
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(spp)
    return {
        "scene": name,
        "mode": mode,
        "resolution": [r.width, r.height],
        "spp": spp,
        "wall_seconds": round(stats.wall_seconds, 4),
        "rays": stats.rays_traced,
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
    }


def main():
    results = []
    for name, path, mode, spp, depth in SCENES:
        if not Path(path).exists():
            continue
        try:
            results.append(bench_scene(name, path, mode, spp, depth))
            print(f"# {results[-1]}", file=sys.stderr)
        except Exception as e:  # keep the headline line emitting
            print(f"# bench {name} failed: {type(e).__name__}: {e}", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "mrays_per_sec", "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0}))
        return 1

    headline = next((r for r in results if r["scene"] == "cornell_mis"), results[0])
    value = headline["mrays_per_sec"]
    print(
        json.dumps(
            {
                "metric": "cornell_800x800_mis_throughput",
                "value": value,
                "unit": "Mrays/s",
                # BASELINE.json north-star target: 100 Mrays/s per chip
                "vs_baseline": round(value / 100.0, 4),
                "detail": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
