"""Wavefront OBJ loader.

Replaces the reference's vendored tiny_obj_loader (only LoadObj +
attrib/shape arrays are used, reference: src/scene.cpp:340-440).  Matches its
triangulation and normal conventions:

- n-gon faces are fan-triangulated: (i0, i(k+1), i(k+2))
  (reference: src/scene.cpp:385-389)
- vertex normals are used when present, otherwise the face normal
  normalize(cross(v1-v0, v2-v0)) (VERTEX_NORMAL flag,
  reference: src/scene.cpp:395-411, src/utilities.h:26)
- texcoords default to 0 when absent

Returns raw numpy arrays; world-space transform + tangent baking happens in
scene/flatscene.py (mirroring Scene::setDevData, reference: src/scene.cpp:479-512).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_obj(path: str | Path) -> dict:
    """Parse an OBJ file → dict of (T,3,3) positions, normals, (T,3,2) uvs."""
    positions: list[list[float]] = []
    normals: list[list[float]] = []
    texcoords: list[list[float]] = []
    faces: list[list[tuple[int, int, int]]] = []  # list of (vi, ti, ni) per corner

    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                positions.append([float(x) for x in parts[1:4]])
            elif tag == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif tag == "vt":
                texcoords.append([float(x) for x in parts[1:3]])
            elif tag == "f":
                corners = []
                for vert in parts[1:]:
                    comp = vert.split("/")
                    vi = int(comp[0]) if comp[0] else 0
                    ti = int(comp[1]) if len(comp) > 1 and comp[1] else 0
                    ni = int(comp[2]) if len(comp) > 2 and comp[2] else 0
                    corners.append((vi, ti, ni))
                if len(corners) >= 3:
                    faces.append(corners)

    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    nor = np.asarray(normals, np.float32).reshape(-1, 3)
    uv = np.asarray(texcoords, np.float32).reshape(-1, 2)

    def fix(idx: int, n: int) -> int:
        return idx - 1 if idx > 0 else n + idx  # negative = relative

    tri_idx: list[list[tuple[int, int, int]]] = []
    for corners in faces:
        for k in range(len(corners) - 2):
            tri_idx.append([corners[0], corners[k + 1], corners[k + 2]])

    ntri = len(tri_idx)
    v = np.zeros((ntri, 3, 3), np.float32)
    n_arr = np.zeros((ntri, 3, 3), np.float32)
    t_arr = np.zeros((ntri, 3, 2), np.float32)
    has_normals = nor.shape[0] > 0
    has_uv = uv.shape[0] > 0

    for i, tri in enumerate(tri_idx):
        for c, (vi, ti, ni) in enumerate(tri):
            v[i, c] = pos[fix(vi, len(pos))]
            if has_uv and ti != 0:
                t_arr[i, c] = uv[fix(ti, len(uv))]
        if has_normals and all(ni != 0 for _, _, ni in tri):
            for c, (_, _, ni) in enumerate(tri):
                n_arr[i, c] = nor[fix(ni, len(nor))]
        else:
            e1 = v[i, 1] - v[i, 0]
            e2 = v[i, 2] - v[i, 0]
            fn = np.cross(e1, e2)
            norm = np.linalg.norm(fn)
            fn = fn / norm if norm > 0 else fn
            n_arr[i] = fn

    return {
        "positions": v,       # (T, 3 corners, xyz)
        "normals": n_arr,     # (T, 3, 3)
        "uvs": t_arr,         # (T, 3, 2)
        "has_normals": has_normals,
        "has_uvs": has_uv,
    }
