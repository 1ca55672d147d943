"""Texture atlas sampling.

The reference packs all textures into one device arena with per-texture
(width, height, pointer) objects and bilinear sampling
(reference: src/scene.cpp:574-597 upload, src/image.h:53-110 devTexObj /
devTexSampler).  Here the arena is a single (P, 3) float32 HBM array and the
per-texture table is (T, 3) int32 rows [offset, width, height]; sampling is a
vectorized 4-tap gather.

Bilinear convention replicated exactly (reference: src/image.h:73-85):
  x = u * (width - 1);  lx = int(x);  ux = lx+1 if x+1 < width else lx
(i.e. clamp-to-edge, no wrap), pixel (x, y) at data[y * width + x].
Textures are stored vertically flipped at load time
(stbi_set_flip_vertically_on_load, reference: src/scene.cpp:56).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(atlas, table, tex_id, uv):
    """Sample texture `tex_id` (..., int32) at `uv` (..., 2) → (..., 3).

    Out-of-range ids return 0 (callers mask with constant fallbacks).
    """
    tid = jnp.clip(tex_id, 0, table.shape[0] - 1)
    row = table[tid]  # (..., 3)
    offset, width, height = row[..., 0], row[..., 1], row[..., 2]

    u, v = uv[..., 0], uv[..., 1]
    x = u * (width - 1).astype(uv.dtype)
    y = v * (height - 1).astype(uv.dtype)
    lx = jnp.floor(x).astype(jnp.int32)
    ly = jnp.floor(y).astype(jnp.int32)
    ux = jnp.where(x + 1.0 >= width.astype(uv.dtype), lx, lx + 1)
    uy = jnp.where(y + 1.0 >= height.astype(uv.dtype), ly, ly + 1)
    fx = (x - jnp.floor(x))[..., None]
    fy = (y - jnp.floor(y))[..., None]

    def at(ix, iy):
        idx = offset + iy * width + ix
        idx = jnp.clip(idx, 0, atlas.shape[0] - 1)
        return atlas[idx]

    p1 = at(lx, ly) * (1.0 - fx) + at(ux, ly) * fx
    p2 = at(lx, uy) * (1.0 - fx) + at(ux, uy) * fx
    return p1 * (1.0 - fy) + p2 * fy


def sample_or_const(atlas, table, tex_id, const_val, uv):
    """devTexSampler semantics: texture if tex_id >= 0 else constant.

    reference: src/image.h:88-110.
    """
    tex = bilinear_sample(atlas, table, tex_id, uv)
    has_tex = (tex_id >= 0)[..., None]
    return jnp.where(has_tex, tex, const_val)
