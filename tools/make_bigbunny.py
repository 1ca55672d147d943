"""Generate a large-mesh test scene by midpoint-subdividing bunny10k.

Each level splits every triangle into 4 (10k -> 40k -> 160k -> 640k tris),
preserving the surface exactly, so renders stay visually comparable to
glassbunny while exercising the streaming traversal path.

Usage: python tools/make_bigbunny.py [levels=2] [outdir=/tmp]
Writes <outdir>/bigbunny<tris>k.obj and <outdir>/bigbunny<tris>k.txt.
"""
import sys
from pathlib import Path

import numpy as np

levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
outdir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp")

src = Path("/root/reference/scenes/model/bunny10k.obj")
verts = []
faces = []
for line in src.read_text().splitlines():
    p = line.split()
    if not p:
        continue
    if p[0] == "v":
        verts.append([float(x) for x in p[1:4]])
    elif p[0] == "f":
        faces.append([int(t.split("/")[0]) - 1 for t in p[1:4]])
v = np.asarray(verts, np.float64)
f = np.asarray(faces, np.int64)
print(f"loaded {len(v)} verts, {len(f)} tris")

for _ in range(levels):
    # midpoint subdivision with shared-edge vertex dedup
    edges = {}
    nv = list(map(tuple, v))

    def mid(a, b):
        key = (a, b) if a < b else (b, a)
        if key not in edges:
            edges[key] = len(nv)
            nv.append(tuple((v[a] + v[b]) * 0.5))
        return edges[key]

    nf = []
    for a, b, c in f:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    v = np.asarray(nv, np.float64)
    f = np.asarray(nf, np.int64)
    print(f"subdivided -> {len(v)} verts, {len(f)} tris")

k = len(f) // 1000
obj = outdir / f"bigbunny{k}k.obj"
with obj.open("w") as fh:
    for x, y, z in v:
        fh.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
    for a, b, c in f:
        fh.write(f"f {a+1} {b+1} {c+1}\n")
print(f"wrote {obj}")

scene = outdir / f"bigbunny{k}k.txt"
tmpl = Path("scenes/glassbunny.txt").read_text()
# swap the mesh path; keep every other scene element identical
tmpl = tmpl.replace("../reference/scenes/model/bunny10k.obj", str(obj))
tmpl = tmpl.replace("/root/reference/scenes/model/bunny10k.obj", str(obj))
scene.write_text(tmpl)
print(f"wrote {scene}")
