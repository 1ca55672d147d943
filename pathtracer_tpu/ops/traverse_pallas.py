"""Pallas TPU packet-traversal kernels for the BVH.

The XLA traversal (ops/traverse.py) advances EVERY ray one node per
`lax.while_loop` step: the whole pool pays max-traversal-length steps, and
each step is a full-pool row gather.  This kernel replaces it with classic
**packet traversal** shaped for the TPU VPU:

- the ray pool is tiled into (16, 128) packets (one grid step per packet);
- each packet walks the tree with a SHARED scalar stack in SMEM — a node
  is visited iff ANY ray in the packet wants it, so finished/incoherent
  packets exit early instead of idling in lockstep with the whole pool;
- node/triangle tables live wholly in VMEM (bunny10k: ~2.2 MB), so a node
  visit is a scalar-indexed row read plus ~30 VPU ops on the packet —
  no HBM gathers at all;
- leaves hold exactly 1 triangle (builder MAX_PRIM=1), so the leaf case is
  a single Möller–Trumbore on the packet.

The traversal uses the plain (single-tree) BVH with explicit child links
(start, end, left, right); front-to-back ordering comes from the t_min
cutoff rather than the MTBVH's 6 direction-sorted replicas.

Semantics match the reference walk (reference: src/pathtrace.cu:236-279,
src/lightSample.h:89-136): AABB reject also prunes on t_enter > t_min, and
the occlusion variant applies the (t < minT-1e-5 && |t-minT| > 1e-4)
window with early packet exit once every live ray is blocked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 16
TILE_LANES = 128
TILE = TILE_ROWS * TILE_LANES
STACK_DEPTH = 96
LEAF_K = 32  # packet-tree leaves hold up to 32 triangles (pruned cut of the
# MAX_PRIM=1 reference tree; physics identical, ~60x fewer serial node
# visits — leaf triangle tests are vectorized lane work, node pops are
# serial scalar work, so deep pruning trades the right way)
FLT_MAX = 3.402823466e38


def _aabb_packet(nf, ox, oy, oz, idx, idy, idz):
    """Slab test of one node's AABB against the packet.

    nf: 6 scalars (bmin.xyz, bmax.xyz); id* = 1/d components.
    Returns (hit_mask, t_enter) per lane.

    Parity note (documented divergence from ops/intersect.ray_aabb): when a
    direction component is EXACTLY 0 the slopes are ±inf and resolve like
    the XLA path, EXCEPT when the origin coordinate also lies exactly on a
    node bound — then 0·inf = NaN and this kernel REJECTS the node, while
    ray_aabb's origin-containment fallback can accept it.  The case is
    measure-zero (float-exact equality on two axes at once) and adding the
    containment selects would cost ~12 extra VPU ops per node visit in the
    hottest loop, so it is documented rather than replicated.
    """
    lo_x = (nf[0] - ox) * idx
    hi_x = (nf[3] - ox) * idx
    lo_y = (nf[1] - oy) * idy
    hi_y = (nf[4] - oy) * idy
    lo_z = (nf[2] - oz) * idz
    hi_z = (nf[5] - oz) * idz
    tmin_x = jnp.minimum(lo_x, hi_x)
    tmax_x = jnp.maximum(lo_x, hi_x)
    tmin_y = jnp.minimum(lo_y, hi_y)
    tmax_y = jnp.maximum(lo_y, hi_y)
    tmin_z = jnp.minimum(lo_z, hi_z)
    tmax_z = jnp.maximum(lo_z, hi_z)
    # zero-direction: inv = ±inf → lo/hi = ±inf unless origin exactly at a
    # bound (NaN); treat NaN as pass-through like the XLA path's where()
    t_enter = jnp.maximum(jnp.maximum(tmin_x, tmin_y), tmin_z)
    t_exit = jnp.minimum(jnp.minimum(tmax_x, tmax_y), tmax_z)
    hit = (t_enter <= t_exit) & (t_exit > 0.0)
    return hit, t_enter


def _moller_trumbore(trow, ox, oy, oz, dx, dy, dz):
    """Packet Möller–Trumbore for one triangle row (reference:
    src/Bounds3.hpp:298-326).  Returns (hit, t, u, v)."""
    v0x, v0y, v0z = trow[0], trow[1], trow[2]
    e1x = trow[3] - v0x
    e1y = trow[4] - v0y
    e1z = trow[5] - v0z
    e2x = trow[6] - v0x
    e2y = trow[7] - v0y
    e2z = trow[8] - v0z
    # pvec = d × e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = t × e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (det != 0.0) & (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (1.0 - u - v >= 0.0)
    return hit, t, u, v


def _load_tables(nf_hbm, ni_hbm, tri_hbm, nf_sm, ni_sm, tri_vmem, sems):
    """Copy the scene tables once, on the first grid step: node scalars to
    SMEM (scalar-unit loads, no lane extraction), triangles to VMEM.

    Scratch persists across the (sequential) TPU grid, so later packets
    reuse the resident tables instead of re-fetching per tile.
    """

    @pl.when(pl.program_id(0) == 0)
    def _():
        c0 = pltpu.make_async_copy(nf_hbm, nf_sm, sems.at[0])
        c1 = pltpu.make_async_copy(ni_hbm, ni_sm, sems.at[1])
        c2 = pltpu.make_async_copy(tri_hbm, tri_vmem, sems.at[2])
        c0.start()
        c1.start()
        c2.start()
        c0.wait()
        c1.wait()
        c2.wait()


def _closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
    nf_ref, ni_ref, tri_ref,
    t_ref, tri_out_ref, u_ref, v_ref,
    stack_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    idx = 1.0 / dx
    idy = 1.0 / dy
    idz = 1.0 / dz

    t_ref[:] = t0_ref[:]
    tri_out_ref[:] = jnp.full_like(tri_out_ref[:], -1)
    u_ref[:] = jnp.zeros_like(u_ref[:])
    v_ref[:] = jnp.zeros_like(v_ref[:])

    def leaf_test(start, end, active):
        for k in range(LEAF_K):
            tid = jnp.minimum(start + k, tri_ref.shape[0] - 1)
            trow = tri_ref[tid]
            th, tt, tu, tv = _moller_trumbore(trow, ox, oy, oz, dx, dy, dz)
            in_leaf = start + k < end
            take = active & th & (tt < t_ref[:]) & in_leaf
            t_ref[:] = jnp.where(take, tt, t_ref[:])
            tri_out_ref[:] = jnp.where(take, tid, tri_out_ref[:])
            u_ref[:] = jnp.where(take, tu, u_ref[:])
            v_ref[:] = jnp.where(take, tv, v_ref[:])

    def visit(node):
        """Test node's AABB; returns (any_active, active, is_leaf, start, end)."""
        nb = node * 6
        nf = [nf_ref[nb + k] for k in range(6)]
        ni = node * 4
        start = ni_ref[ni]
        end = ni_ref[ni + 1]
        left = ni_ref[ni + 2]
        right = ni_ref[ni + 3]
        hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
        active = hit & (t_enter <= t_ref[:])
        t_near = jnp.min(jnp.where(active, t_enter, jnp.float32(FLT_MAX)))
        return active, left, right, start, end, t_near

    # root: handle leaf-root directly, else enter the two-child loop
    r_active, r_left, r_right, r_start, r_end, _ = visit(jnp.int32(0))
    root_leaf = r_left < 0

    @pl.when(jnp.any(r_active) & root_leaf)
    def _():
        leaf_test(r_start, r_end, r_active)

    stack_ref[0] = 0

    def cond(sp):
        return sp > 0

    def body(sp):
        # stack holds INTERNAL nodes whose AABB already passed
        sp1 = sp - 1
        node = stack_ref[sp1]
        left = ni_ref[node * 4 + 2]
        right = ni_ref[node * 4 + 3]

        la, ll, lr, ls, le, lt = visit(left)
        ra, rl, rr, rs, re, rt = visit(right)
        l_any = jnp.any(la)
        r_any = jnp.any(ra)
        l_leaf = ll < 0
        r_leaf = rl < 0

        @pl.when(l_any & l_leaf)
        def _():
            leaf_test(ls, le, la)

        @pl.when(r_any & r_leaf)
        def _():
            leaf_test(rs, re, ra)

        push_l = l_any & ~l_leaf
        push_r = r_any & ~r_leaf
        # near child popped first: push the FARTHER passing child deeper
        l_first = lt <= rt
        first = jnp.where(l_first, left, right)    # nearer
        second = jnp.where(l_first, right, left)   # farther
        push_first = jnp.where(l_first, push_l, push_r)
        push_second = jnp.where(l_first, push_r, push_l)

        # write farther (popped later) below nearer
        idx0 = sp1
        idx1 = sp1 + push_second.astype(jnp.int32)

        @pl.when(push_second)
        def _():
            stack_ref[idx0] = second

        @pl.when(push_first)
        def _():
            stack_ref[idx1] = first

        return sp1 + push_second.astype(jnp.int32) + push_first.astype(jnp.int32)

    jax.lax.while_loop(
        cond, body, jnp.where(jnp.any(r_active) & ~root_leaf, jnp.int32(1), jnp.int32(0))
    )


def _occlusion_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, mint_ref, occ0_ref,
    nf_ref, ni_ref, tri_ref,
    occ_ref,
    stack_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    idx = 1.0 / dx
    idy = 1.0 / dy
    idz = 1.0 / dz
    min_t = mint_ref[:]

    occ_ref[:] = occ0_ref[:]

    def leaf_test(start, end, active):
        for k in range(LEAF_K):
            tid = jnp.minimum(start + k, tri_ref.shape[0] - 1)
            trow = tri_ref[tid]
            th, tt, _, _ = _moller_trumbore(trow, ox, oy, oz, dx, dy, dz)
            in_leaf = start + k < end
            blocked = (
                active & th & (min_t - 1e-5 > tt)
                & (jnp.abs(tt - min_t) > 1e-4) & in_leaf
            )
            occ_ref[:] = jnp.where(blocked, 1, occ_ref[:])

    def visit(node):
        nb = node * 6
        nf = [nf_ref[nb + k] for k in range(6)]
        ni = node * 4
        start = ni_ref[ni]
        end = ni_ref[ni + 1]
        left = ni_ref[ni + 2]
        right = ni_ref[ni + 3]
        hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
        live = occ_ref[:] == 0
        active = hit & (t_enter <= min_t) & live
        return active, left, right, start, end

    r_active, r_left, r_right, r_start, r_end = visit(jnp.int32(0))
    root_leaf = r_left < 0

    @pl.when(jnp.any(r_active) & root_leaf)
    def _():
        leaf_test(r_start, r_end, r_active)

    stack_ref[0] = 0

    def cond(sp):
        return sp > 0

    def body(sp):
        sp1 = sp - 1
        node = stack_ref[sp1]
        left = ni_ref[node * 4 + 2]
        right = ni_ref[node * 4 + 3]

        la, ll, lr, ls, le = visit(left)
        ra, rl, rr, rs, re = visit(right)
        l_leaf = ll < 0
        r_leaf = rl < 0

        @pl.when(jnp.any(la) & l_leaf)
        def _():
            leaf_test(ls, le, la)

        @pl.when(jnp.any(ra) & r_leaf)
        def _():
            leaf_test(rs, re, ra)

        push_l = jnp.any(la) & ~l_leaf
        push_r = jnp.any(ra) & ~r_leaf
        idx0 = sp1
        idx1 = sp1 + push_r.astype(jnp.int32)

        @pl.when(push_r)
        def _():
            stack_ref[idx0] = right

        @pl.when(push_l)
        def _():
            stack_ref[idx1] = left

        return sp1 + push_r.astype(jnp.int32) + push_l.astype(jnp.int32)

    jax.lax.while_loop(
        cond, body, jnp.where(jnp.any(r_active) & ~root_leaf, jnp.int32(1), jnp.int32(0))
    )


def _pad_pool(x, fill):
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    return x, n


def _tiles(x):
    return x.reshape(-1, TILE_ROWS, TILE_LANES)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_bvh_pallas(
    nodes16, tri12, o, d, t_init, interpret: bool = False
):
    """Packet closest-hit over the triangle BVH.

    nodes16: (nn, 16) merged rows [bmin(3) bmax(3) start end left right pad]
    with the int fields bitcast to f32 and leaves marked by left < 0
    (build_packet_tables in scene/flatscene.py).  tri12: (nt, 12) rows
    [v0 v1 v2 pad].  Returns (t, tri, u, v); tri == -1 where nothing beat
    t_init.
    """
    n = o.shape[0]
    ox, _ = _pad_pool(o[:, 0], 0.0)
    oy, _ = _pad_pool(o[:, 1], 0.0)
    oz, _ = _pad_pool(o[:, 2], 0.0)
    dx, _ = _pad_pool(d[:, 0], 1.0)
    dy, _ = _pad_pool(d[:, 1], 1.0)
    dz, _ = _pad_pool(d[:, 2], 1.0)
    t0, _ = _pad_pool(t_init, -1.0)  # padded lanes: t_min<0 rejects all hits

    num_tiles = ox.shape[0] // TILE

    in_specs = [
        *[
            pl.BlockSpec((1, TILE_ROWS, TILE_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(7)
        ],
        pl.BlockSpec(memory_space=pltpu.ANY),  # node floats (HBM)
        pl.BlockSpec(memory_space=pltpu.ANY),  # node ints (HBM)
        pl.BlockSpec(memory_space=pltpu.ANY),  # tris (HBM)
    ]
    out_specs = [
        pl.BlockSpec((1, TILE_ROWS, TILE_LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]

    shape1 = jax.ShapeDtypeStruct((num_tiles, TILE_ROWS, TILE_LANES), jnp.float32)
    shapei = jax.ShapeDtypeStruct((num_tiles, TILE_ROWS, TILE_LANES), jnp.int32)

    nn = nodes16.shape[0]
    nt = tri12.shape[0]
    nodes_f = nodes16[:, 0:6].reshape(-1)
    nodes_i = jax.lax.bitcast_convert_type(nodes16[:, 6:10], jnp.int32).reshape(-1)

    def kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, t0_r, nf_h, ni_h, tr_h,
               t_r, tri_r, u_r, v_r, stack_r, nf_s, ni_s, tr_v, sems):
        _load_tables(nf_h, ni_h, tr_h, nf_s, ni_s, tr_v, sems)
        _closest_kernel(
            ox_r.at[0], oy_r.at[0], oz_r.at[0],
            dx_r.at[0], dy_r.at[0], dz_r.at[0], t0_r.at[0],
            nf_s, ni_s, tr_v,
            t_r.at[0], tri_r.at[0], u_r.at[0], v_r.at[0],
            stack_r,
        )

    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[shape1, shapei, shape1, shape1],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((nn * 6,), jnp.float32),
            pltpu.SMEM((nn * 4,), jnp.int32),
            pltpu.VMEM((nt, 12), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        _tiles(ox), _tiles(oy), _tiles(oz),
        _tiles(dx), _tiles(dy), _tiles(dz), _tiles(t0),
        nodes_f, nodes_i, tri12,
    )
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(tri), flat(u), flat(v)


@functools.partial(jax.jit, static_argnames=("interpret",))
def occlusion_bvh_pallas(
    nodes16, tri12, o, d, min_t, occluded0, interpret: bool = False
):
    """Packet any-hit with the reference's shadow epsilon windows."""
    n = o.shape[0]
    ox, _ = _pad_pool(o[:, 0], 0.0)
    oy, _ = _pad_pool(o[:, 1], 0.0)
    oz, _ = _pad_pool(o[:, 2], 0.0)
    dx, _ = _pad_pool(d[:, 0], 1.0)
    dy, _ = _pad_pool(d[:, 1], 1.0)
    dz, _ = _pad_pool(d[:, 2], 1.0)
    mt, _ = _pad_pool(min_t, -1.0)  # padded lanes never block
    oc0, _ = _pad_pool(occluded0.astype(jnp.int32), 1)

    num_tiles = ox.shape[0] // TILE

    in_specs = [
        *[
            pl.BlockSpec((1, TILE_ROWS, TILE_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(8)
        ],
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, TILE_ROWS, TILE_LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    nn = nodes16.shape[0]
    nt = tri12.shape[0]
    nodes_f = nodes16[:, 0:6].reshape(-1)
    nodes_i = jax.lax.bitcast_convert_type(nodes16[:, 6:10], jnp.int32).reshape(-1)

    def kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, mt_r, oc0_r, nf_h, ni_h, tr_h,
               occ_r, stack_r, nf_s, ni_s, tr_v, sems):
        _load_tables(nf_h, ni_h, tr_h, nf_s, ni_s, tr_v, sems)
        _occlusion_kernel(
            ox_r.at[0], oy_r.at[0], oz_r.at[0],
            dx_r.at[0], dy_r.at[0], dz_r.at[0], mt_r.at[0], oc0_r.at[0],
            nf_s, ni_s, tr_v,
            occ_r.at[0],
            stack_r,
        )

    (occ,) = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, TILE_ROWS, TILE_LANES), jnp.int32)],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((nn * 6,), jnp.float32),
            pltpu.SMEM((nn * 4,), jnp.int32),
            pltpu.VMEM((nt, 12), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        _tiles(ox), _tiles(oy), _tiles(oz),
        _tiles(dx), _tiles(dy), _tiles(dz), _tiles(mt), _tiles(oc0),
        nodes_f, nodes_i, tri12,
    )
    return occ.reshape(-1)[:n].astype(bool)
