"""Numeric parity artifact: RMSE vs the reference gallery renders.

The committed gallery PNGs ({Direct,BSDF,MIS}{20,2000}.png) were rendered
from a mis_test variant with WHITE lights (PARITY.md: the current scene
file has colored lights but pixel-identical geometry/layout).  This tool
reconstructs that variant — each light's albedo set to white at its
max-component magnitude (15/10/8/6/5) — renders it, and reports RMSE vs
the gallery in the reference's own save transform (ACES + gamma + X
mirror).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/parity_render.py [spp] [modes...]
"""
import sys
import time

import numpy as np

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.scene.parser import load_scene
from pathtracer_tpu.utils.config import RenderOptions, SampleMode
from pathtracer_tpu.utils.image_io import read_png, write_png

GALLERY = {
    "mis": "/root/reference/gallery/MIS2000.png",
    "bsdf": "/root/reference/gallery/BSDF2000.png",
    "direct": "/root/reference/gallery/Direct2000.png",
}
MODES = {
    "mis": SampleMode.MIS,
    "bsdf": SampleMode.BSDF,
    "direct": SampleMode.DIRECT_LI,
}


def white_light_mis_scene():
    scene = load_scene("/root/reference/scenes/mis_test.txt")
    for m in scene.materials:
        if m.type == 4:  # LIGHT
            mag = float(max(m.albedo))
            m.albedo = (mag, mag, mag)
    return scene


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    modes = sys.argv[2:] or ["mis", "bsdf", "direct"]
    for name in modes:
        scene = white_light_mis_scene()
        r = Renderer(scene, opts=RenderOptions(sample_mode=MODES[name]))
        t0 = time.perf_counter()
        r.step(spp)
        dt = time.perf_counter() - t0
        img = r.ldr_image()[:, ::-1]  # reference save-time X mirror
        ref = read_png(GALLERY[name])[..., :3].astype(np.float32)
        if ref.max() > 1.5:
            ref = ref / 255.0
        assert ref.shape == img.shape, (ref.shape, img.shape)
        rmse = float(np.sqrt(((img - ref) ** 2).mean()))
        out = f"/tmp/parity_{name}{spp}.png"
        write_png(out, img)
        print(
            f"{name:7s} spp={spp}: RMSE vs {GALLERY[name].split('/')[-1]} = "
            f"{rmse:.5f}  ({dt:.0f}s, {r.stats.mrays_per_sec:.0f} Mrays/s) -> {out}",
            flush=True,
        )


if __name__ == "__main__":
    main()
