"""Dump compiled HLO of the bunny render iteration and locate hot fusions.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo.py fusion.435 fusion.386 ...
"""
import re
import sys

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

r = Renderer("scenes/glassbunny.txt", opts=RenderOptions().with_mode(SampleMode.MIS))
import jax

lowered = r._iter_fn.lower(
    r.flat, r._cam_arrays(), r.img, jax.numpy.int32(1), r.key
)
compiled = lowered.compile()
txt = compiled.as_text()
with open("/tmp/bunny_hlo.txt", "w") as f:
    f.write(txt)
print("HLO:", len(txt), "chars -> /tmp/bunny_hlo.txt")

for name in sys.argv[1:]:
    # print the fusion's root + metadata lines
    pat = re.compile(rf"^\s*%?{re.escape(name)} = .*$", re.M)
    m = pat.search(txt)
    if not m:
        print(f"--- {name}: NOT FOUND")
        continue
    print(f"--- {name}:")
    print(m.group(0)[:600])
