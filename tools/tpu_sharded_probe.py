"""Real-chip compile + numerics check of the sharded render path.

VERDICT r3 item 5: `test_sharding.py` and the driver dryrun run the
shard_map program only on the virtual CPU mesh (Pallas in interpret
mode); this probe compiles the SAME program with the real TPU toolchain
on a 1-device mesh — the only sharded-path evidence this single-chip rig
can produce beyond the CPU dryrun.

Checks, on the real chip:
  1. the shard_map + Pallas packet-kernel composition compiles (Mosaic,
     not interpret) and executes;
  2. the sharded image is BITWISE equal to the unsharded single-chip
     image of the same scene (position-keyed RNG; ldr_image undoes the
     single-chip swizzle so the comparison is pixel-space);
  3. per-chip throughput of the sharded step vs the single-chip path
     (expected lower on mesh scenes: the sharded step drops the 32x32
     swizzle + shrink ladder — integrator/render.py design note).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
            python tools/tpu_sharded_probe.py [scene] [res] [iters]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "scenes/glassbunny.txt"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax

    from pathtracer_tpu.integrator.render import Renderer
    from pathtracer_tpu.utils.config import RenderOptions, SampleMode

    backend = jax.default_backend()
    opts = RenderOptions(sample_mode=SampleMode.MIS)

    t0 = time.time()
    r1 = Renderer(scene, opts=opts, resolution=(res, res))
    r1.step(2)  # compile + warm
    t_single_compile = time.time() - t0
    r1.stats.wall_seconds = 0.0
    r1.stats.rays_traced = 0
    r1.step(iters)
    single = r1.ldr_image()

    t0 = time.time()
    rs = Renderer(scene, opts=opts, resolution=(res, res), devices=1)
    rs.step(2)
    t_shard_compile = time.time() - t0
    rs.stats.wall_seconds = 0.0
    rs.stats.rays_traced = 0
    rs.step(iters)
    sharded = rs.ldr_image()

    bitwise = bool(np.array_equal(single, sharded))
    out = {
        "probe": "tpu_sharded_1dev",
        "backend": backend,
        "scene": Path(scene).stem,
        "res": res,
        "iters": iters,
        "pallas_mosaic": bool(r1.opts.pallas_traversal and not r1.opts.interpret),
        "sharded_pallas": bool(rs.opts.pallas_traversal and not rs.opts.interpret),
        "bitwise_equal": bitwise,
        "max_abs_diff": float(np.abs(single - sharded).max()),
        "single_mrays": round(r1.stats.mrays_per_sec, 2),
        "sharded_mrays": round(rs.stats.mrays_per_sec, 2),
        "single_compile_s": round(t_single_compile, 1),
        "sharded_compile_s": round(t_shard_compile, 1),
    }
    print(json.dumps(out), flush=True)
    return 0 if bitwise or out["max_abs_diff"] < 2e-2 else 1


if __name__ == "__main__":
    sys.exit(main())
