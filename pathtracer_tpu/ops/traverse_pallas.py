"""Pallas TPU wide-packet-traversal kernels for the BVH.

The XLA traversal (ops/traverse.py) advances EVERY ray one node per
`lax.while_loop` step: the whole pool pays max-traversal-length steps, and
each step is a full-pool row gather.  These kernels replace it with
**wide packet traversal** shaped for the TPU VPU:

- the ray pool is tiled into (16, 128) packets (one grid step per packet);
- each packet walks an 8-ARY collapse of the SAH tree (accel/bvh.py
  collapse_wide) with a SHARED scalar stack in SMEM — a node is visited
  iff ANY ray in the packet wants it, so finished/incoherent packets exit
  early instead of idling in lockstep with the whole pool;
- one pop tests all 8 child AABBs: pops are the SERIAL unit (scalar-unit
  + reduction bound), so the 8-ary shape cuts the serial lap count ~7x
  vs a binary walk while the extra AABB math rides the vector lanes;
- node scalars live in SMEM, triangles in VMEM (one DMA on grid step 0);
  a node visit is ~70 scalar loads plus ~8x25 VPU ops on the packet —
  no HBM gathers at all;
- leaf children are cuts of <= leaf_k triangles of the MAX_PRIM=1
  reference tree (identical triangle order → identical physics), tested
  by a statically-unrolled Möller–Trumbore sweep.

Semantics match the reference walk (reference: src/pathtrace.cu:236-279,
src/lightSample.h:89-136): AABB reject also prunes on t_enter > t_min
(front-to-back via per-octant child ordering, the wide analogue of the
6-way MTBVH), and the occlusion variant applies the
(t < minT-1e-5 && |t-minT| > 1e-4) window.
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
    """Packet Möller–Trumbore for one EDGE-FORM triangle row
    [v0, e1, e2] (scene/flatscene.py precomputes e1/e2 in f32, bitwise
    equal to subtracting here; reference: src/Bounds3.hpp:298-326).
    Returns (hit, t, u, v)."""
    v0x, v0y, v0z = trow[0], trow[1], trow[2]
    e1x, e1y, e1z = trow[3], trow[4], trow[5]
    e2x, e2y, e2z = trow[6], trow[7], trow[8]
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


# ---------------------------------------------------------------------------
# Wide (8-ary) packet traversal — the round-2 fast path.
#
# Node pops are the SERIAL unit (one `lax.while_loop` lap each, dominated by
# scalar/stack/reduction overhead, not lane math); the 8-ary collapse
# (accel/bvh.py collapse_wide) cuts pop count ~7x vs the binary tree while
# the 8 child AABB tests ride the vector lanes that were already paid for.
# Children are tested AT THE PARENT pop: leaf children run Möller–Trumbore
# immediately, internal children push onto the SMEM stack in per-octant
# far→near order (near popped first) so the t_min cutoff prunes like the
# reference's MTBVH near-child-first hit links (src/BVH.cpp:180-239).
# ---------------------------------------------------------------------------


def _wide_visit_order(wp_ref, node, octant):
    """Packed 3-bit-per-rank child permutation for this packet's octant."""
    return wp_ref[node * 8 + octant]


P_NODES = 2   # stack nodes expanded per while-lap
Q_LEAVES = 2  # queued leaves drained per while-lap
# Per the TPU microbench (tools/kernel_microbench.py): a while/fori lap has
# a fixed ~600-1000 ns overhead, every `pl.when` gate costs ~144 ns EVEN
# WHEN NOT TAKEN, cross-lane `jnp.any` ~23 ns, and all scalar loads +
# vector math hide under the lap overhead entirely.  So the kernels below
# are 100% BRANCHLESS inside the lap (unconditional SMEM stores with
# predicated pointer bumps — a store past the live pointer is never read)
# and amortize the lap cost over P node pops + Q leaf drains.



def _make_wide_closest_kernel(leaf_k: int, p_nodes: int = P_NODES,
                              q_leaves: int = Q_LEAVES, dense_top: int = 0):
    def kernel(
        octant,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
        wf_ref, wi_ref, wp_ref, tri_ref,
        t_ref, tri_out_ref, u_ref, v_ref,
        stack_ref, leafq_ref, *maybe_cnt,
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

        stack_ref[0] = 0
        nt1 = tri_ref.shape[0] - 1
        n_wide = wf_ref.shape[0] // 48
        alive_any = jnp.any(t0_ref[:] >= 0.0)

        # --- DENSE TOP preamble (dense_top > 0): wide nodes are BFS-
        # ordered (accel/bvh.py collapse_wide), so the prefix 0..D-1 is a
        # parent-closed top region that bounce-ray packets visit near-
        # exhaustively anyway (tools/union_sim.py).  Process it as ONE
        # unrolled straight-line block — no while-loop laps, no stack
        # pops — pushing only the FRONTIER (link >= D) and queuing leaf
        # children; the while_loop below then drains from there.  Dead /
        # root-missing packets (every t0 at the DEAD sentinel) skip the
        # whole block via the pl.when.
        D = min(int(dense_top), n_wide)
        if D > 0:
            cnt_ref = maybe_cnt[0]
            cnt_ref[0] = 0
            cnt_ref[1] = 0
            t0v = t0_ref[:]

            @pl.when(alive_any)
            def _dense():
                new_sp = jnp.int32(0)
                new_lq = jnp.int32(0)
                for node in range(D):
                    perm = wp_ref[node * 8 + octant]
                    for rank in range(7, -1, -1):  # far→near pushes
                        slot = (perm >> (3 * rank)) & 7
                        bf = node * 48 + slot * 6
                        nf = [wf_ref[bf + k] for k in range(6)]
                        link = wi_ref[node * 24 + slot]
                        hit, t_enter = _aabb_packet(
                            nf, ox, oy, oz, idx, idy, idz)
                        any_c = jnp.any(hit & (t_enter <= t0v))
                        is_leaf = link < 0
                        stack_ref[new_sp] = link
                        new_sp = new_sp + (
                            any_c & ~is_leaf & (link >= D)
                        ).astype(jnp.int32)
                        leafq_ref[new_lq] = node * 8 + slot
                        new_lq = new_lq + (any_c & is_leaf).astype(jnp.int32)
                cnt_ref[0] = new_sp
                cnt_ref[1] = new_lq

        def lap(state):
            sp, lq = state
            best_t = t_ref[:]

            # --- node phase: expand up to P_NODES stack tops ---
            new_sp = jnp.maximum(sp - p_nodes, 0)
            new_lq = lq
            # read ALL consumed entries BEFORE any push: the branchless
            # stores below start at new_sp and may overwrite the consumed
            # range (an invalid slot's store would otherwise clobber a
            # live entry before it is read)
            # (clip: an invalid slot may hold a stale leaf link of -1,
            # which would otherwise index wf_ref out of bounds)
            m1 = wf_ref.shape[0] // 48 - 1
            popped = [
                (
                    jnp.clip(stack_ref[jnp.maximum(sp - 1 - j, 0)], 0, m1),
                    sp - 1 - j >= 0,
                )
                for j in range(p_nodes)
            ]
            # j descending: the stack top (nearest node) is processed LAST
            # so its children are pushed last → popped first (front-to-back)
            for j in range(p_nodes - 1, -1, -1):
                node, node_valid = popped[j]
                perm = _wide_visit_order(wp_ref, node, octant)
                base_f = node * 48
                base_i = node * 24
                for rank in range(7, -1, -1):  # far→near within the node
                    slot = (perm >> (3 * rank)) & 7
                    bf = base_f + slot * 6
                    nf = [wf_ref[bf + k] for k in range(6)]
                    link = wi_ref[base_i + slot]
                    hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                    active = hit & (t_enter <= best_t)
                    any_c = jnp.any(active) & node_valid
                    is_leaf = link < 0
                    # branchless: store always, bump the live pointer only
                    # when the child is genuinely taken
                    stack_ref[new_sp] = link
                    new_sp = new_sp + (any_c & ~is_leaf).astype(jnp.int32)
                    leafq_ref[new_lq] = node * 8 + slot
                    new_lq = new_lq + (any_c & is_leaf).astype(jnp.int32)

            # --- leaf phase: drain up to Q_LEAVES queue tops ---
            best_tri = tri_out_ref[:]
            best_u = u_ref[:]
            best_v = v_ref[:]
            for q in range(q_leaves):
                qidx = new_lq - 1 - q
                leaf_valid = qidx >= 0
                lslot = leafq_ref[jnp.maximum(qidx, 0)]
                lnode = lslot >> 3
                lc = lslot & 7
                bf = lnode * 48 + lc * 6
                nf = [wf_ref[bf + k] for k in range(6)]
                s = wi_ref[lnode * 24 + 8 + lc]
                e = wi_ref[lnode * 24 + 16 + lc]
                hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                active = hit & (t_enter <= best_t) & leaf_valid
                for k in range(leaf_k):
                    tid = jnp.minimum(s + k, nt1)
                    trow = tri_ref[tid]
                    th, tt, tu, tv = _moller_trumbore(trow, ox, oy, oz, dx, dy, dz)
                    take = active & th & (tt < best_t) & (s + k < e)
                    best_t = jnp.where(take, tt, best_t)
                    best_tri = jnp.where(take, tid, best_tri)
                    best_u = jnp.where(take, tu, best_u)
                    best_v = jnp.where(take, tv, best_v)
            t_ref[:] = best_t
            tri_out_ref[:] = best_tri
            u_ref[:] = best_u
            v_ref[:] = best_v

            return new_sp, jnp.maximum(new_lq - q_leaves, 0)

        # whole-dead packets (every t0 at the -FLT_MAX sentinel) never enter
        if D > 0:
            seed = (maybe_cnt[0][0], maybe_cnt[0][1])
        else:
            seed = (
                jnp.where(alive_any, jnp.int32(1), jnp.int32(0)),
                jnp.int32(0),
            )
        jax.lax.while_loop(
            lambda st: (st[0] > 0) | (st[1] > 0),
            lap,
            seed,
        )

    return kernel


def _make_wide_occlusion_kernel(leaf_k: int, p_nodes: int = P_NODES,
                                q_leaves: int = Q_LEAVES):
    def kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, mint_ref, occ0_ref,
        wf_ref, wi_ref, tri_ref,
        occ_ref,
        stack_ref, leafq_ref,
    ):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        idx = 1.0 / dx
        idy = 1.0 / dy
        idz = 1.0 / dz
        min_t = mint_ref[:]

        occ_ref[:] = occ0_ref[:]
        stack_ref[0] = 0
        nt1 = tri_ref.shape[0] - 1

        def lap(state):
            sp, lq, _ = state
            occ = occ_ref[:]
            live = occ == 0
            cap = jnp.where(live, min_t, -FLT_MAX)  # blocked lanes idle

            new_sp = jnp.maximum(sp - p_nodes, 0)
            new_lq = lq
            m1 = wf_ref.shape[0] // 48 - 1
            popped = [  # read+clip before any store (see closest kernel)
                (
                    jnp.clip(stack_ref[jnp.maximum(sp - 1 - j, 0)], 0, m1),
                    sp - 1 - j >= 0,
                )
                for j in range(p_nodes)
            ]
            for j in range(p_nodes - 1, -1, -1):  # any-hit: order-free
                node, node_valid = popped[j]
                base_f = node * 48
                base_i = node * 24
                for slot in range(8):
                    bf = base_f + slot * 6
                    nf = [wf_ref[bf + k] for k in range(6)]
                    link = wi_ref[base_i + slot]
                    hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                    active = hit & (t_enter <= cap)
                    any_c = jnp.any(active) & node_valid
                    is_leaf = link < 0
                    stack_ref[new_sp] = link
                    new_sp = new_sp + (any_c & ~is_leaf).astype(jnp.int32)
                    leafq_ref[new_lq] = node * 8 + slot
                    new_lq = new_lq + (any_c & is_leaf).astype(jnp.int32)

            for q in range(q_leaves):
                qidx = new_lq - 1 - q
                leaf_valid = qidx >= 0
                lslot = leafq_ref[jnp.maximum(qidx, 0)]
                lnode = lslot >> 3
                lc = lslot & 7
                bf = lnode * 48 + lc * 6
                nf = [wf_ref[bf + k] for k in range(6)]
                s = wi_ref[lnode * 24 + 8 + lc]
                e = wi_ref[lnode * 24 + 16 + lc]
                hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                active = hit & (t_enter <= cap) & leaf_valid
                for k in range(leaf_k):
                    tid = jnp.minimum(s + k, nt1)
                    trow = tri_ref[tid]
                    th, tt, _, _ = _moller_trumbore(trow, ox, oy, oz, dx, dy, dz)
                    blocked = (
                        active & th & (min_t - 1e-5 > tt)
                        & (jnp.abs(tt - min_t) > 1e-4) & (s + k < e)
                    )
                    occ = jnp.where(blocked, 1, occ)
            occ_ref[:] = occ

            # early exit once every live lane is blocked
            done = ~jnp.any(occ == 0)
            return new_sp, jnp.maximum(new_lq - q_leaves, 0), done

        alive_any = jnp.any(mint_ref[:] >= 0.0)
        jax.lax.while_loop(
            lambda st: ((st[0] > 0) | (st[1] > 0)) & ~st[2],
            lap,
            (
                jnp.where(alive_any, jnp.int32(1), jnp.int32(0)),
                jnp.int32(0),
                jnp.bool_(False),
            ),
        )

    return kernel


def _pad_pool(x, fill, tile=TILE):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    return x, n


def _tiles(x, rows=TILE_ROWS):
    return x.reshape(-1, rows, TILE_LANES)


def _tile_octants(d, num_tiles, tile=TILE):
    """Per-packet direction octant from each tile's first ray (rays are
    sorted by (alive, octant, cell) per bounce, so tiles are octant-uniform
    modulo boundaries; this is an ordering heuristic, not a correctness
    input).  Octant bit k = d[k] > 0, matching the wavefront sort key.
    Shipped as a scalar-prefetch arg: (num_tiles,) int32 in SMEM."""
    d0 = d[: num_tiles * tile : tile]  # (num_tiles, 3)
    return (
        (d0[:, 0] > 0).astype(jnp.int32)
        + 2 * (d0[:, 1] > 0).astype(jnp.int32)
        + 4 * (d0[:, 2] > 0).astype(jnp.int32)
    )


@functools.partial(jax.jit, static_argnames=(
    "leaf_k", "interpret", "p_nodes", "q_leaves", "rows", "dense_top"))
def closest_hit_wbvh_pallas(
    wf, wi, wp, tri12, o, d, t_init, leaf_k: int, interpret: bool = False,
    p_nodes: int = P_NODES, q_leaves: int = Q_LEAVES, rows: int = TILE_ROWS,
    dense_top: int = 0,
):
    """Wide-BVH packet closest-hit.

    wf: (M*48,) f32 child AABBs [c0.bmin c0.bmax c1...]; NaN = empty slot.
    wi: (M*24,) i32 per node [link x8, start x8, end x8]; link >= 0 points
    at a wide node, else the (start, end) triangle range is a leaf cut.
    wp: (M*8,) i32 packed per-octant child orders (3 bits per rank).
    tri12: (nt, 12) f32 [v0 v1 v2 pad].  Dead lanes carry t_init at
    -FLT_MAX (a -1 sentinel would still pass `t_enter <= t_init` for
    origins deep inside the scene box and drag dead packets through the
    whole tree).  Returns (t, tri, u, v); tri == -1 where nothing beat
    t_init.
    """
    n = o.shape[0]
    tile = rows * TILE_LANES
    ox, _ = _pad_pool(o[:, 0], 0.0, tile)
    oy, _ = _pad_pool(o[:, 1], 0.0, tile)
    oz, _ = _pad_pool(o[:, 2], 0.0, tile)
    dx, _ = _pad_pool(d[:, 0], 1.0, tile)
    dy, _ = _pad_pool(d[:, 1], 1.0, tile)
    dz, _ = _pad_pool(d[:, 2], 1.0, tile)
    t0, _ = _pad_pool(t_init, -FLT_MAX, tile)

    num_tiles = ox.shape[0] // tile
    octs = _tile_octants(d, num_tiles, tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # octs: whole (num_tiles,) array in SMEM
        grid=(num_tiles,),
        in_specs=[
            *[
                pl.BlockSpec((1, rows, TILE_LANES), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(7)
            ],
            pl.BlockSpec(memory_space=pl.ANY),  # wf (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # wi (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # wp (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # tris (HBM)
        ],
        out_specs=[
            pl.BlockSpec((1, rows, TILE_LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        scratch_shapes=[
            # stack: every wide node pushes at most once per packet, plus
            # headroom for the unconditional store past the live pointer
            pltpu.SMEM((wf.shape[0] // 48 + 8 * p_nodes,), jnp.int32),
            pltpu.SMEM((wf.shape[0] // 48 * 8 + 8 * p_nodes,), jnp.int32),
            pltpu.SMEM((wf.shape[0],), jnp.float32),
            pltpu.SMEM((wi.shape[0],), jnp.int32),
            pltpu.SMEM((wp.shape[0],), jnp.int32),
            pltpu.VMEM((tri12.shape[0], 12), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
        + ([pltpu.SMEM((2,), jnp.int32)] if dense_top else []),
    )
    shape1 = jax.ShapeDtypeStruct((num_tiles, rows, TILE_LANES), jnp.float32)
    shapei = jax.ShapeDtypeStruct((num_tiles, rows, TILE_LANES), jnp.int32)
    inner = _make_wide_closest_kernel(leaf_k, p_nodes, q_leaves, dense_top)

    def kernel(oct_r, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, t0_r,
               wf_h, wi_h, wp_h, tr_h,
               t_r, tri_r, u_r, v_r, stack_r, leafq_r, wf_s, wi_s, wp_s,
               tr_v, sems, *cnt_s):
        @pl.when(pl.program_id(0) == 0)
        def _():
            copies = [
                pltpu.make_async_copy(wf_h, wf_s, sems.at[0]),
                pltpu.make_async_copy(wi_h, wi_s, sems.at[1]),
                pltpu.make_async_copy(wp_h, wp_s, sems.at[2]),
                pltpu.make_async_copy(tr_h, tr_v, sems.at[3]),
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

        inner(
            oct_r[pl.program_id(0)],
            ox_r.at[0], oy_r.at[0], oz_r.at[0],
            dx_r.at[0], dy_r.at[0], dz_r.at[0], t0_r.at[0],
            wf_s, wi_s, wp_s, tr_v,
            t_r.at[0], tri_r.at[0], u_r.at[0], v_r.at[0],
            stack_r, leafq_r, *cnt_s,
        )

    t, tri, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[shape1, shapei, shape1, shape1],
        interpret=interpret,
    )(
        octs,
        _tiles(ox, rows), _tiles(oy, rows), _tiles(oz, rows),
        _tiles(dx, rows), _tiles(dy, rows), _tiles(dz, rows), _tiles(t0, rows),
        wf, wi, wp, tri12,
    )
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(tri), flat(u), flat(v)


# ---------------------------------------------------------------------------
# STREAMING wide-BVH traversal — arbitrary mesh sizes (accel/bvh.py
# partition_stream).  The TOP tree stays SMEM-resident; SUBTREE blocks
# (nodes + their contiguous triangle rows) are DMA-streamed HBM→on-chip
# through an n_buf-deep ring while the packet walks the previous block —
# the TPU equivalent of the reference traversing arbitrary meshes from
# device global memory (reference: src/pathtrace.cu:236-279).  Physics
# identical to the resident kernels: same wide tree, same triangle order.
# ---------------------------------------------------------------------------

STREAM_BUFS = 2  # subtree ring depth (double buffering; 3 measured no better)
# A/B switch for the r4 near->far sorted block schedule (tools/stream_ab.py).
# MEASURED OUT as the default (one-window ABAB, real chip): bigbunny160k
# 7.52/7.43 sorted vs 7.36/7.27 unsorted (+2%), bigbunny640k 3.25/3.26
# sorted vs 3.55/3.55 unsorted (-8%).  Front-to-back ordering cannot pay
# here because block pruning is per-PACKET (any-lane): a 2048-lane packet
# almost always contains lanes whose best_t stays open (rays grazing the
# root box but missing geometry), so the evolving cap rarely beats a
# block's root AABB no matter how early near blocks run — and the sorted
# order gives up the discovery-order DMA pipelining rhythm on big block
# counts.  Read at trace time; flip BEFORE constructing a Renderer.
STREAM_SORT_BLOCKS = False


def _sub_walk_closest(
    leaf_k, p_nodes, q_leaves, S, Tmax,
    octant, gbase, slot,
    ox, oy, oz, dx, dy, dz, idx, idy, idz,
    bwf_s, bwi_s, bwp_s, btri_v,
    t_ref, tri_out_ref, u_ref, v_ref, lstack_ref, leafq_ref,
):
    """Full local walk of one DMA'd subtree block (same lap structure as
    the resident closest kernel, with block-local tables and tri ids
    rebased to gbase)."""
    base_f = slot * (S * 48)
    base_i = slot * (S * 24)
    base_p = slot * (S * 8)
    tri0 = slot * (Tmax * 9)
    nt1 = Tmax - 1

    lstack_ref[0] = 0

    def lap(state):
        sp, lq = state
        best_t = t_ref[:]
        new_sp = jnp.maximum(sp - p_nodes, 0)
        new_lq = lq
        popped = [
            (
                jnp.clip(lstack_ref[jnp.maximum(sp - 1 - j, 0)], 0, S - 1),
                sp - 1 - j >= 0,
            )
            for j in range(p_nodes)
        ]
        for j in range(p_nodes - 1, -1, -1):
            node, node_valid = popped[j]
            perm = bwp_s[base_p + node * 8 + octant]
            nf_b = base_f + node * 48
            ni_b = base_i + node * 24
            for rank in range(7, -1, -1):
                cslot = (perm >> (3 * rank)) & 7
                bf = nf_b + cslot * 6
                nf = [bwf_s[bf + k] for k in range(6)]
                link = bwi_s[ni_b + cslot]
                hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                active = hit & (t_enter <= best_t)
                any_c = jnp.any(active) & node_valid
                is_leaf = link < 0
                lstack_ref[new_sp] = link
                new_sp = new_sp + (any_c & ~is_leaf).astype(jnp.int32)
                leafq_ref[new_lq] = node * 8 + cslot
                new_lq = new_lq + (any_c & is_leaf).astype(jnp.int32)

        best_tri = tri_out_ref[:]
        best_u = u_ref[:]
        best_v = v_ref[:]
        for q in range(q_leaves):
            qidx = new_lq - 1 - q
            leaf_valid = qidx >= 0
            lslot = leafq_ref[jnp.maximum(qidx, 0)]
            lnode = lslot >> 3
            lc = lslot & 7
            bf = base_f + lnode * 48 + lc * 6
            nf = [bwf_s[bf + k] for k in range(6)]
            s = bwi_s[base_i + lnode * 24 + 8 + lc]
            e = bwi_s[base_i + lnode * 24 + 16 + lc]
            hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
            active = hit & (t_enter <= best_t) & leaf_valid
            for k in range(leaf_k):
                lid = jnp.minimum(s + k, nt1)
                trow = [btri_v[tri0 + lid * 9 + c] for c in range(9)]
                th, tt, tu, tv = _moller_trumbore(trow, ox, oy, oz, dx, dy, dz)
                take = active & th & (tt < best_t) & (s + k < e)
                best_t = jnp.where(take, tt, best_t)
                best_tri = jnp.where(take, gbase + lid, best_tri)
                best_u = jnp.where(take, tu, best_u)
                best_v = jnp.where(take, tv, best_v)
        t_ref[:] = best_t
        tri_out_ref[:] = best_tri
        u_ref[:] = best_u
        v_ref[:] = best_v
        return new_sp, jnp.maximum(new_lq - q_leaves, 0)

    jax.lax.while_loop(
        lambda st: (st[0] > 0) | (st[1] > 0), lap, (jnp.int32(1), jnp.int32(0))
    )


def _make_stream_closest_kernel(leaf_k: int, p_nodes: int, q_leaves: int,
                                S: int, Tmax: int, n_buf: int = STREAM_BUFS,
                                sort_blocks: bool = STREAM_SORT_BLOCKS):
    """Two-phase schedule (r4): (1) walk the ENTIRE SMEM-resident top tree
    collecting every reachable subtree block with a per-block key = the
    packet's minimum AABB entry distance; (2) insertion-sort the block
    queue by that key (near→far, the canonical front-to-back order); (3)
    stream blocks through the DMA ring in sorted order, re-testing each
    block's root AABB against the CURRENT best_t at DMA-start and at walk
    time (the r3 pruning).  Near-first walking tightens best_t as early as
    possible, so far blocks get pruned before their ~300 KB DMA instead of
    after — pure scheduling, the final closest hit is unchanged (a pruned
    block provably cannot contain a closer hit for any lane in the
    packet).  The top walk costs no DMA overlap: it is SMEM-resident and
    ~100x cheaper than one block walk."""
    def kernel(
        octs, tri_base_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
        topf_h, topl_h, topp_h, subf_h, subi_h, subp_h, subt_h,
        t_ref_o, tri_ref_o, u_ref_o, v_ref_o,
        tstack_ref, subq_ref, subb_ref, startq_ref, lstack_ref, leafq_ref,
        subk_ref,
        topf_s, topl_s, topp_s,
        bwf_s, bwi_s, bwp_s, btri_v,
        sem_top, sem_ring,
    ):
        @pl.when(pl.program_id(0) == 0)
        def _():
            copies = [
                pltpu.make_async_copy(topf_h, topf_s, sem_top.at[0]),
                pltpu.make_async_copy(topl_h, topl_s, sem_top.at[1]),
                pltpu.make_async_copy(topp_h, topp_s, sem_top.at[2]),
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

        octant = octs[pl.program_id(0)]
        t_ref = t_ref_o.at[0]
        tri_out_ref = tri_ref_o.at[0]
        u_ref = u_ref_o.at[0]
        v_ref = v_ref_o.at[0]
        ox, oy, oz = ox_ref.at[0][:], oy_ref.at[0][:], oz_ref.at[0][:]
        dx, dy, dz = dx_ref.at[0][:], dy_ref.at[0][:], dz_ref.at[0][:]
        idx = 1.0 / dx
        idy = 1.0 / dy
        idz = 1.0 / dz

        t_ref[:] = t0_ref.at[0][:]
        tri_out_ref[:] = jnp.full_like(tri_out_ref[:], -1)
        u_ref[:] = jnp.zeros_like(u_ref[:])
        v_ref[:] = jnp.zeros_like(v_ref[:])

        tstack_ref[0] = 0
        T1 = topf_s.shape[0] // 48 - 1

        def start_dma(s_id, slot):
            # block sources are FLAT 1D (nodes) / row-aligned 2D (tris):
            # Mosaic rejects dynamic single-row slices of 2D memrefs
            pltpu.make_async_copy(
                subf_h.at[pl.ds(s_id * (S * 48), S * 48)],
                bwf_s.at[pl.ds(slot * (S * 48), S * 48)],
                sem_ring.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                subi_h.at[pl.ds(s_id * (S * 24), S * 24)],
                bwi_s.at[pl.ds(slot * (S * 24), S * 24)],
                sem_ring.at[slot, 1],
            ).start()
            pltpu.make_async_copy(
                subp_h.at[pl.ds(s_id * (S * 8), S * 8)],
                bwp_s.at[pl.ds(slot * (S * 8), S * 8)],
                sem_ring.at[slot, 2],
            ).start()
            pltpu.make_async_copy(
                subt_h.at[pl.ds(s_id * (Tmax * 9), Tmax * 9)],
                btri_v.at[pl.ds(slot * (Tmax * 9), Tmax * 9)],
                sem_ring.at[slot, 3],
            ).start()

        def wait_dma(slot):
            # the copies completed into this ring slot (matching starts)
            pltpu.make_async_copy(
                subf_h.at[pl.ds(0, S * 48)], bwf_s.at[pl.ds(0, S * 48)],
                sem_ring.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                subi_h.at[pl.ds(0, S * 24)], bwi_s.at[pl.ds(0, S * 24)],
                sem_ring.at[slot, 1],
            ).wait()
            pltpu.make_async_copy(
                subp_h.at[pl.ds(0, S * 8)], bwp_s.at[pl.ds(0, S * 8)],
                sem_ring.at[slot, 2],
            ).wait()
            pltpu.make_async_copy(
                subt_h.at[pl.ds(0, Tmax * 9)], btri_v.at[pl.ds(0, Tmax * 9)],
                sem_ring.at[slot, 3],
            ).wait()

        def block_live(bf, cap):
            # re-test a queued subtree's root AABB (bounds live in the top
            # tables at flat offset bf) against the CURRENT per-lane cap:
            # best_t only tightens, so a block beaten since discovery can
            # be skipped — DMA and walk — without changing any result
            nf = [topf_s[bf + k] for k in range(6)]
            hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
            return jnp.any(hit & (t_enter <= cap))

        # --- phase 1: full top walk, collect every reachable block ---
        # (cap is the initial t0/analytic best — blocks the cap already
        # beats are not queued; the rest are pruned again at DMA/walk
        # time once near blocks have tightened best_t)
        best_t0 = t_ref[:]

        def top_lap(state):
            tsp, tail = state
            new_sp = jnp.maximum(tsp - p_nodes, 0)
            new_tail = tail
            popped = [
                (
                    jnp.clip(tstack_ref[jnp.maximum(tsp - 1 - j, 0)], 0, T1),
                    tsp - 1 - j >= 0,
                )
                for j in range(p_nodes)
            ]
            for j in range(p_nodes - 1, -1, -1):
                node, node_valid = popped[j]
                perm = topp_s[node * 8 + octant]
                for rank in range(7, -1, -1):
                    cslot = (perm >> (3 * rank)) & 7
                    bf = node * 48 + cslot * 6
                    nf = [topf_s[bf + k] for k in range(6)]
                    link = topl_s[node * 8 + cslot]
                    hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                    active = hit & (t_enter <= best_t0)
                    any_c = jnp.any(active) & node_valid
                    is_sub = link < -1
                    tstack_ref[new_sp] = link
                    new_sp = new_sp + (any_c & (link >= 0)).astype(jnp.int32)
                    subq_ref[new_tail] = -(link + 2)
                    subb_ref[new_tail] = bf
                    # near→far sort key: the packet's closest AABB entry
                    subk_ref[new_tail] = jnp.min(
                        jnp.where(active, t_enter, FLT_MAX)
                    )
                    new_tail = new_tail + (any_c & is_sub).astype(jnp.int32)
            return new_sp, new_tail

        alive_any = jnp.any(t0_ref.at[0][:] >= 0.0)
        _, tail = jax.lax.while_loop(
            lambda st: st[0] > 0,
            top_lap,
            (jnp.where(alive_any, jnp.int32(1), jnp.int32(0)), jnp.int32(0)),
        )

        # --- phase 2: stable insertion sort of queue[0:tail] by key ---
        # (tail is O(total blocks / coherence), a few hundred max; scalar
        # SMEM shifting is ~ns per element — negligible vs one block walk)
        def sort_outer(i, _):
            kq = subk_ref[i]
            sq = subq_ref[i]
            bq = subb_ref[i]

            def shift(st):
                j = st
                subk_ref[j] = subk_ref[j - 1]
                subq_ref[j] = subq_ref[j - 1]
                subb_ref[j] = subb_ref[j - 1]
                return j - 1

            j = jax.lax.while_loop(
                lambda j: (j > 0) & (subk_ref[jnp.maximum(j - 1, 0)] > kq),
                shift, i,
            )
            subk_ref[j] = kq
            subq_ref[j] = sq
            subb_ref[j] = bq
            return 0

        if sort_blocks:  # static: the A/B knob compiles the sort out
            jax.lax.fori_loop(1, jnp.maximum(tail, 1), sort_outer, 0)

        # --- phase 3: stream the sorted blocks through the DMA ring,
        # pruning against the EVOLVING best_t at DMA-start and walk time
        def lap(state):
            scur, shead, ds = state

            def dma_body(st):
                c, d = st
                live = block_live(subb_ref[c], t_ref[:])
                startq_ref[d] = c  # branchless: next live entry overwrites

                @pl.when(live)
                def _():
                    start_dma(subq_ref[c], jax.lax.rem(d, n_buf))

                return c + 1, d + live.astype(jnp.int32)

            scur, ds = jax.lax.while_loop(
                lambda st: (st[0] < tail) & (st[1] - shead < n_buf),
                dma_body, (scur, ds)
            )

            # drain ONE ready subtree
            @pl.when(shead < ds)
            def _():
                slot = jax.lax.rem(shead, n_buf)
                wait_dma(slot)  # ALWAYS consume the semaphore
                didx = startq_ref[shead]

                @pl.when(block_live(subb_ref[didx], t_ref[:]))
                def _():
                    s_id = subq_ref[didx]
                    _sub_walk_closest(
                        leaf_k, p_nodes, q_leaves, S, Tmax,
                        octant, tri_base_ref[s_id], slot,
                        ox, oy, oz, dx, dy, dz, idx, idy, idz,
                        bwf_s, bwi_s, bwp_s, btri_v,
                        t_ref, tri_out_ref, u_ref, v_ref, lstack_ref,
                        leafq_ref,
                    )

            new_head = shead + (shead < ds).astype(jnp.int32)
            return scur, new_head, ds

        jax.lax.while_loop(
            lambda st: (st[0] < tail) | (st[1] < st[2]),
            lap,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "leaf_k", "sub_nodes", "sub_tris", "interpret", "p_nodes", "q_leaves",
    "rows", "sort_blocks"))
def closest_hit_stream_pallas(
    topf, topl, topp, subf, subi, subp, subt, tri_base,
    o, d, t_init, leaf_k: int, sub_nodes: int, sub_tris: int,
    interpret: bool = False,
    p_nodes: int = P_NODES, q_leaves: int = Q_LEAVES, rows: int = TILE_ROWS,
    sort_blocks: bool = STREAM_SORT_BLOCKS,
):
    """Streaming wide-BVH packet closest-hit for meshes beyond the
    SMEM/VMEM-resident budget.  Table formats: accel/bvh.py StreamBVH,
    flattened by scene/flatscene.py build_stream_tables."""
    n = o.shape[0]
    tile = rows * TILE_LANES
    ox, _ = _pad_pool(o[:, 0], 0.0, tile)
    oy, _ = _pad_pool(o[:, 1], 0.0, tile)
    oz, _ = _pad_pool(o[:, 2], 0.0, tile)
    dx, _ = _pad_pool(d[:, 0], 1.0, tile)
    dy, _ = _pad_pool(d[:, 1], 1.0, tile)
    dz, _ = _pad_pool(d[:, 2], 1.0, tile)
    t0, _ = _pad_pool(t_init, -FLT_MAX, tile)

    num_tiles = ox.shape[0] // tile
    octs = _tile_octants(d, num_tiles, tile)
    S, Tmax = sub_nodes, sub_tris
    n_sub = subf.shape[0] // (S * 48)
    T = topf.shape[0] // 48
    B = STREAM_BUFS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # octs, tri_base
        grid=(num_tiles,),
        in_specs=[
            *[
                pl.BlockSpec((1, rows, TILE_LANES), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(7)
            ],
            *[pl.BlockSpec(memory_space=pl.ANY) for _ in range(3)],
            # subtree tables MUST stay in HBM: the kernel DMAs dynamic
            # single-row slices, which Mosaic rejects on a VMEM-tiled
            # memref (sublane-alignment) if ANY promotes them on-chip
            *[pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(4)],
        ],
        out_specs=[
            pl.BlockSpec((1, rows, TILE_LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.SMEM((T + 8 * P_NODES + 8,), jnp.int32),        # top stack
            pltpu.SMEM((n_sub + 8 * P_NODES + 8,), jnp.int32),    # sub queue
            pltpu.SMEM((n_sub + 8 * P_NODES + 8,), jnp.int32),    # sub bounds idx
            pltpu.SMEM((n_sub + 8 * P_NODES + 8,), jnp.int32),    # started->queue
            pltpu.SMEM((S + 8 * P_NODES + 8,), jnp.int32),        # local stack
            pltpu.SMEM((S * 8 + 8 * P_NODES + 8,), jnp.int32),    # local leafq
            pltpu.SMEM((n_sub + 8 * P_NODES + 8,), jnp.float32),  # block sort keys
            pltpu.SMEM((T * 48,), jnp.float32),                   # top bounds
            pltpu.SMEM((T * 8,), jnp.int32),                      # top links
            pltpu.SMEM((T * 8,), jnp.int32),                      # top perms
            pltpu.SMEM((B * S * 48,), jnp.float32),               # ring bounds
            pltpu.SMEM((B * S * 24,), jnp.int32),                 # ring ints
            pltpu.SMEM((B * S * 8,), jnp.int32),                  # ring perms
            pltpu.SMEM((B * Tmax * 9,), jnp.float32),            # ring tris
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((B, 4)),
        ],
    )
    shape1 = jax.ShapeDtypeStruct((num_tiles, rows, TILE_LANES), jnp.float32)
    shapei = jax.ShapeDtypeStruct((num_tiles, rows, TILE_LANES), jnp.int32)
    kernel = _make_stream_closest_kernel(leaf_k, p_nodes, q_leaves, S, Tmax,
                                         sort_blocks=sort_blocks)

    t, tri, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[shape1, shapei, shape1, shape1],
        interpret=interpret,
    )(
        octs, tri_base,
        _tiles(ox, rows), _tiles(oy, rows), _tiles(oz, rows),
        _tiles(dx, rows), _tiles(dy, rows), _tiles(dz, rows), _tiles(t0, rows),
        topf, topl, topp, subf, subi, subp, subt,
    )
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(tri), flat(u), flat(v)


# ---------------------------------------------------------------------------
# BLOCK-MAJOR streaming traversal.  tools/stream_union_sim.py (r5) measured
# that from bounce 1 on, EVERY production-size packet reaches ~85-100% of
# the subtree blocks no matter how lanes are permuted into packets (diffuse
# bounce rays are intrinsically block-incoherent; the ideal reachable-set
# clustering still leaves 80-96 of 113 blocks, and evolving-cap pruning
# never fires).  The packet-major schedule above therefore re-streams
# nearly the WHOLE mesh through the HBM->SMEM ring once per packet
# (~200 MB/bounce for a 34 MB mesh at 65k rays; ~30x worse at 640k).
# This schedule inverts the loops: a VMEM-resident chunk of rays
# (chunk_rows x 128 lanes) stays put across grid steps while every block
# is DMA'd exactly ONCE per chunk and each of the chunk's packets walks
# it (skipped per packet when no lane reaches the block root under its
# evolving cap — the same reach set the packet-major top walk produces,
# see sim pt. 3).  DMA traffic drops by the packets-per-chunk factor at
# identical walk work; results identical (the closest-hit min commutes
# over block order).  The reference's HBM-wide stackless walk
# (src/pathtrace.cu:236-279) has no such re-fetch cost because per-thread
# global loads ride the GPU cache hierarchy; block-major is the TPU-
# native equivalent of that cache.
# ---------------------------------------------------------------------------

STREAM_BLOCKMAJOR = False  # MEASURED OUT as default (tools/blockmajor_ab.py,
# one-window ABAB real chip): bigbunny160k 7.05 vs 7.34 packet-major
# (-4%), bigbunny640k 3.27 vs 3.57 (-8%).  Decisive negative for the
# DMA-redundancy hypothesis: the ring hides ALL redundant block traffic
# even at 313 packets x ~300 blocks (~28 GB/bounce re-streamed for a
# 136 MB mesh) — the streaming path is WALK-bound (serial lap floor),
# not DMA-bound, so eliminating re-fetch buys nothing and the chunk
# bookkeeping (per-(packet, block) root tests + ring restarts at chunk
# boundaries) costs 4-8%.  Kept behind this knob with full parity tests
# as the documented alternative schedule.
BLOCKMAJOR_CHUNK_ROWS = 512  # ray rows resident per chunk (512 rows = 64k
# lanes ~ 2.8 MB of VMEM in-cols + 2 MB out-cols, double-buffer safe)


def _make_blockmajor_closest_kernel(leaf_k: int, p_nodes: int, q_leaves: int,
                                    S: int, Tmax: int, n_sub: int,
                                    pkts: int, rows: int,
                                    n_buf: int = STREAM_BUFS):
    """Grid = (num_chunks, n_sub), block dim innermost: ray chunk c stays
    VMEM-resident while blocks stream through the SMEM ring exactly once
    per chunk; each packet p of the chunk walks block b only if some lane
    reaches its root AABB under the packet's current best_t."""
    def kernel(
        octs, tri_base_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
        rootf_h, subf_h, subi_h, subp_h, subt_h,
        t_ref_o, tri_ref_o, u_ref_o, v_ref_o,
        lstack_ref, leafq_ref, rootf_s,
        bwf_s, bwi_s, bwp_s, btri_v,
        sem_root, sem_ring,
    ):
        c = pl.program_id(0)
        b = pl.program_id(1)
        g = c * n_sub + b
        num_chunks = pl.num_programs(0)
        G = num_chunks * n_sub

        def start_dma(s_id, slot):
            pltpu.make_async_copy(
                subf_h.at[pl.ds(s_id * (S * 48), S * 48)],
                bwf_s.at[pl.ds(slot * (S * 48), S * 48)],
                sem_ring.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                subi_h.at[pl.ds(s_id * (S * 24), S * 24)],
                bwi_s.at[pl.ds(slot * (S * 24), S * 24)],
                sem_ring.at[slot, 1],
            ).start()
            pltpu.make_async_copy(
                subp_h.at[pl.ds(s_id * (S * 8), S * 8)],
                bwp_s.at[pl.ds(slot * (S * 8), S * 8)],
                sem_ring.at[slot, 2],
            ).start()
            pltpu.make_async_copy(
                subt_h.at[pl.ds(s_id * (Tmax * 9), Tmax * 9)],
                btri_v.at[pl.ds(slot * (Tmax * 9), Tmax * 9)],
                sem_ring.at[slot, 3],
            ).start()

        def wait_dma(slot):
            pltpu.make_async_copy(
                subf_h.at[pl.ds(0, S * 48)], bwf_s.at[pl.ds(0, S * 48)],
                sem_ring.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                subi_h.at[pl.ds(0, S * 24)], bwi_s.at[pl.ds(0, S * 24)],
                sem_ring.at[slot, 1],
            ).wait()
            pltpu.make_async_copy(
                subp_h.at[pl.ds(0, S * 8)], bwp_s.at[pl.ds(0, S * 8)],
                sem_ring.at[slot, 2],
            ).wait()
            pltpu.make_async_copy(
                subt_h.at[pl.ds(0, Tmax * 9)], btri_v.at[pl.ds(0, Tmax * 9)],
                sem_ring.at[slot, 3],
            ).wait()

        @pl.when(g == 0)
        def _():
            cp = pltpu.make_async_copy(rootf_h, rootf_s, sem_root.at[0])
            cp.start()
            cp.wait()
            start_dma(0, 0)  # block 0 -> slot 0; waited below this step

        # chunk init: caps seed the closest-t accumulators
        @pl.when(b == 0)
        def _():
            t_ref_o.at[0][:] = t0_ref.at[0][:]
            tri_ref_o.at[0][:] = jnp.full_like(tri_ref_o.at[0][:], -1)
            u_ref_o.at[0][:] = jnp.zeros_like(u_ref_o.at[0][:])
            v_ref_o.at[0][:] = jnp.zeros_like(v_ref_o.at[0][:])

        # prefetch the NEXT grid step's block into the other ring slot
        # (double buffer: that slot's previous walk finished last step)
        @pl.when(g + 1 < G)
        def _():
            start_dma(
                jax.lax.rem(b + 1, n_sub), jax.lax.rem(g + 1, n_buf)
            )

        slot = jax.lax.rem(g, n_buf)
        wait_dma(slot)

        nf = [rootf_s[b * 6 + k] for k in range(6)]
        gbase = tri_base_ref[b]

        def packet(p, _):
            sl = pl.ds(p * rows, rows)
            ox = ox_ref[0, sl]
            oy = oy_ref[0, sl]
            oz = oz_ref[0, sl]
            dx = dx_ref[0, sl]
            dy = dy_ref[0, sl]
            dz = dz_ref[0, sl]
            idx = 1.0 / dx
            idy = 1.0 / dy
            idz = 1.0 / dz
            t_ref = t_ref_o.at[0, sl]
            hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)

            @pl.when(jnp.any(hit & (t_enter <= t_ref[:])))
            def _():
                _sub_walk_closest(
                    leaf_k, p_nodes, q_leaves, S, Tmax,
                    octs[c * pkts + p], gbase, slot,
                    ox, oy, oz, dx, dy, dz, idx, idy, idz,
                    bwf_s, bwi_s, bwp_s, btri_v,
                    t_ref, tri_ref_o.at[0, sl], u_ref_o.at[0, sl],
                    v_ref_o.at[0, sl], lstack_ref, leafq_ref,
                )

            return 0

        jax.lax.fori_loop(0, pkts, packet, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "leaf_k", "sub_nodes", "sub_tris", "interpret", "p_nodes", "q_leaves",
    "rows", "chunk_rows"))
def closest_hit_blockmajor_pallas(
    topf, topl, subf, subi, subp, subt, tri_base,
    o, d, t_init, leaf_k: int, sub_nodes: int, sub_tris: int,
    interpret: bool = False,
    p_nodes: int = P_NODES, q_leaves: int = Q_LEAVES, rows: int = TILE_ROWS,
    chunk_rows: int = BLOCKMAJOR_CHUNK_ROWS,
):
    """Block-major streaming closest-hit (same tables as
    closest_hit_stream_pallas; the top tree contributes only the block
    ROOT AABBs — reach filtering happens per packet per block, which the
    r5 simulator showed is exactly the packet-major queue set)."""
    n = o.shape[0]
    S, Tmax = sub_nodes, sub_tris
    n_sub = subf.shape[0] // (S * 48)
    B = STREAM_BUFS

    # block root boxes from the top tables: the child slot whose link is
    # -(2+s) holds block s's bounds (accel/bvh.py StreamBVH layout)
    T = topf.shape[0] // 48
    tf = topf.reshape(T * 8, 6)
    tl = topl.reshape(T * 8)
    sid = jnp.where(tl < -1, -(tl + 2), n_sub)
    rootf = (
        jnp.full((n_sub + 1, 6), jnp.nan, jnp.float32)
        .at[sid].set(tf)[:n_sub].reshape(-1)
    )

    tile = rows * TILE_LANES
    pool_rows = -(-n // TILE_LANES)             # ceil lanes -> rows
    pool_rows = -(-pool_rows // rows) * rows    # ceil to a tile multiple
    crows = min(max(chunk_rows // rows * rows, rows), pool_rows)
    chunk = crows * TILE_LANES
    ox, _ = _pad_pool(o[:, 0], 0.0, chunk)
    oy, _ = _pad_pool(o[:, 1], 0.0, chunk)
    oz, _ = _pad_pool(o[:, 2], 0.0, chunk)
    dx, _ = _pad_pool(d[:, 0], 1.0, chunk)
    dy, _ = _pad_pool(d[:, 1], 1.0, chunk)
    dz, _ = _pad_pool(d[:, 2], 1.0, chunk)
    t0, _ = _pad_pool(t_init, -FLT_MAX, chunk)

    num_chunks = ox.shape[0] // chunk
    pkts = crows // rows
    # per-packet octants from the PADDED columns (chunk padding can exceed
    # one tile, so the unpadded (n, 3) d under-covers the tile starts)
    octs = (
        (dx[::tile] > 0).astype(jnp.int32)
        + 2 * (dy[::tile] > 0).astype(jnp.int32)
        + 4 * (dz[::tile] > 0).astype(jnp.int32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # octs, tri_base
        grid=(num_chunks, n_sub),
        in_specs=[
            *[
                pl.BlockSpec((1, crows, TILE_LANES), lambda c, b, *_: (c, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(7)
            ],
            pl.BlockSpec(memory_space=pl.ANY),  # rootf
            *[pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(4)],
        ],
        out_specs=[
            pl.BlockSpec((1, crows, TILE_LANES), lambda c, b, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.SMEM((S + 8 * P_NODES + 8,), jnp.int32),        # local stack
            pltpu.SMEM((S * 8 + 8 * P_NODES + 8,), jnp.int32),    # local leafq
            pltpu.SMEM((n_sub * 6,), jnp.float32),                # block roots
            pltpu.SMEM((B * S * 48,), jnp.float32),               # ring bounds
            pltpu.SMEM((B * S * 24,), jnp.int32),                 # ring ints
            pltpu.SMEM((B * S * 8,), jnp.int32),                  # ring perms
            pltpu.SMEM((B * Tmax * 9,), jnp.float32),             # ring tris
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SemaphoreType.DMA((B, 4)),
        ],
    )
    shape1 = jax.ShapeDtypeStruct((num_chunks, crows, TILE_LANES), jnp.float32)
    shapei = jax.ShapeDtypeStruct((num_chunks, crows, TILE_LANES), jnp.int32)
    kernel = _make_blockmajor_closest_kernel(
        leaf_k, p_nodes, q_leaves, S, Tmax, n_sub, pkts, rows
    )

    t, tri, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[shape1, shapei, shape1, shape1],
        interpret=interpret,
    )(
        octs, tri_base,
        _tiles(ox, crows), _tiles(oy, crows), _tiles(oz, crows),
        _tiles(dx, crows), _tiles(dy, crows), _tiles(dz, crows),
        _tiles(t0, crows),
        rootf, subf, subi, subp, subt,
    )
    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(tri), flat(u), flat(v)


def _make_stream_occlusion_kernel(leaf_k: int, p_nodes: int, q_leaves: int,
                                  S: int, Tmax: int, n_buf: int = STREAM_BUFS):
    def kernel(
        octs, tri_base_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, mint_ref, occ0_ref,
        topf_h, topl_h, topp_h, subf_h, subi_h, subp_h, subt_h,
        occ_ref_o,
        tstack_ref, subq_ref, subb_ref, startq_ref, lstack_ref, leafq_ref,
        topf_s, topl_s, topp_s,
        bwf_s, bwi_s, bwp_s, btri_v,
        sem_top, sem_ring,
    ):
        @pl.when(pl.program_id(0) == 0)
        def _():
            copies = [
                pltpu.make_async_copy(topf_h, topf_s, sem_top.at[0]),
                pltpu.make_async_copy(topl_h, topl_s, sem_top.at[1]),
                pltpu.make_async_copy(topp_h, topp_s, sem_top.at[2]),
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

        occ_ref = occ_ref_o.at[0]
        ox, oy, oz = ox_ref.at[0][:], oy_ref.at[0][:], oz_ref.at[0][:]
        dx, dy, dz = dx_ref.at[0][:], dy_ref.at[0][:], dz_ref.at[0][:]
        idx = 1.0 / dx
        idy = 1.0 / dy
        idz = 1.0 / dz
        min_t = mint_ref.at[0][:]

        occ_ref[:] = occ0_ref.at[0][:]
        tstack_ref[0] = 0
        T1 = topf_s.shape[0] // 48 - 1
        nt1 = Tmax - 1

        def start_dma(s_id, slot):
            pltpu.make_async_copy(
                subf_h.at[pl.ds(s_id * (S * 48), S * 48)],
                bwf_s.at[pl.ds(slot * (S * 48), S * 48)],
                sem_ring.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                subi_h.at[pl.ds(s_id * (S * 24), S * 24)],
                bwi_s.at[pl.ds(slot * (S * 24), S * 24)],
                sem_ring.at[slot, 1],
            ).start()
            pltpu.make_async_copy(
                subt_h.at[pl.ds(s_id * (Tmax * 9), Tmax * 9)],
                btri_v.at[pl.ds(slot * (Tmax * 9), Tmax * 9)],
                sem_ring.at[slot, 3],
            ).start()

        def wait_dma(slot):
            pltpu.make_async_copy(
                subf_h.at[pl.ds(0, S * 48)], bwf_s.at[pl.ds(0, S * 48)],
                sem_ring.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                subi_h.at[pl.ds(0, S * 24)], bwi_s.at[pl.ds(0, S * 24)],
                sem_ring.at[slot, 1],
            ).wait()
            pltpu.make_async_copy(
                subt_h.at[pl.ds(0, Tmax * 9)], btri_v.at[pl.ds(0, Tmax * 9)],
                sem_ring.at[slot, 3],
            ).wait()

        def sub_walk(slot):
            base_f = slot * (S * 48)
            base_i = slot * (S * 24)
            tri0 = slot * (Tmax * 9)
            lstack_ref[0] = 0

            def llap(state):
                sp, lq = state
                occ = occ_ref[:]
                cap = jnp.where(occ == 0, min_t, -FLT_MAX)
                new_sp = jnp.maximum(sp - p_nodes, 0)
                new_lq = lq
                popped = [
                    (
                        jnp.clip(lstack_ref[jnp.maximum(sp - 1 - j, 0)], 0, S - 1),
                        sp - 1 - j >= 0,
                    )
                    for j in range(p_nodes)
                ]
                for j in range(p_nodes - 1, -1, -1):
                    node, node_valid = popped[j]
                    nf_b = base_f + node * 48
                    ni_b = base_i + node * 24
                    for cslot in range(8):
                        bf = nf_b + cslot * 6
                        nf = [bwf_s[bf + k] for k in range(6)]
                        link = bwi_s[ni_b + cslot]
                        hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                        active = hit & (t_enter <= cap)
                        any_c = jnp.any(active) & node_valid
                        is_leaf = link < 0
                        lstack_ref[new_sp] = link
                        new_sp = new_sp + (any_c & ~is_leaf).astype(jnp.int32)
                        leafq_ref[new_lq] = node * 8 + cslot
                        new_lq = new_lq + (any_c & is_leaf).astype(jnp.int32)

                for q in range(q_leaves):
                    qidx = new_lq - 1 - q
                    leaf_valid = qidx >= 0
                    lslot = leafq_ref[jnp.maximum(qidx, 0)]
                    lnode = lslot >> 3
                    lc = lslot & 7
                    bf = base_f + lnode * 48 + lc * 6
                    nf = [bwf_s[bf + k] for k in range(6)]
                    s = bwi_s[base_i + lnode * 24 + 8 + lc]
                    e = bwi_s[base_i + lnode * 24 + 16 + lc]
                    hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                    active = hit & (t_enter <= cap) & leaf_valid
                    for k in range(leaf_k):
                        lid = jnp.minimum(s + k, nt1)
                        trow = [btri_v[tri0 + lid * 9 + c] for c in range(9)]
                        th, tt, _, _ = _moller_trumbore(trow, ox, oy, oz, dx, dy, dz)
                        blocked = (
                            active & th & (min_t - 1e-5 > tt)
                            & (jnp.abs(tt - min_t) > 1e-4) & (s + k < e)
                        )
                        occ = jnp.where(blocked, 1, occ)
                occ_ref[:] = occ
                return new_sp, jnp.maximum(new_lq - q_leaves, 0)

            jax.lax.while_loop(
                lambda st: (st[0] > 0) | (st[1] > 0), llap,
                (jnp.int32(1), jnp.int32(0)),
            )

        def block_live(bf):
            # re-test a queued subtree root vs the CURRENT blocked set (a
            # lane's cap collapses to -FLT_MAX once blocked) — pure
            # pruning, results unchanged (see the closest kernel)
            cap = jnp.where(occ_ref[:] == 0, min_t, -FLT_MAX)
            nf = [topf_s[bf + k] for k in range(6)]
            hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
            return jnp.any(hit & (t_enter <= cap))

        def lap(state):
            tsp, scur, stail, shead, ds, _done = state
            occ = occ_ref[:]
            cap = jnp.where(occ == 0, min_t, -FLT_MAX)

            new_sp = jnp.maximum(tsp - p_nodes, 0)
            new_tail = stail
            popped = [
                (
                    jnp.clip(tstack_ref[jnp.maximum(tsp - 1 - j, 0)], 0, T1),
                    tsp - 1 - j >= 0,
                )
                for j in range(p_nodes)
            ]
            for j in range(p_nodes - 1, -1, -1):
                node, node_valid = popped[j]
                for cslot in range(8):
                    bf = node * 48 + cslot * 6
                    nf = [topf_s[bf + k] for k in range(6)]
                    link = topl_s[node * 8 + cslot]
                    hit, t_enter = _aabb_packet(nf, ox, oy, oz, idx, idy, idz)
                    active = hit & (t_enter <= cap)
                    any_c = jnp.any(active) & node_valid
                    is_sub = link < -1
                    tstack_ref[new_sp] = link
                    new_sp = new_sp + (any_c & (link >= 0)).astype(jnp.int32)
                    subq_ref[new_tail] = -(link + 2)
                    subb_ref[new_tail] = bf
                    new_tail = new_tail + (any_c & is_sub).astype(jnp.int32)

            # once done, start no NEW block DMAs — but pending ones MUST
            # still be waited below (exiting the kernel with in-flight
            # DMAs leaves stale semaphore counts for the next grid step).
            # Entries whose block no longer reaches any unblocked lane are
            # skipped without consuming a ring slot.
            def dma_body(st):
                c, d = st
                live = block_live(subb_ref[c])
                startq_ref[d] = c

                @pl.when(live)
                def _():
                    start_dma(subq_ref[c], jax.lax.rem(d, n_buf))

                return c + 1, d + live.astype(jnp.int32)

            scur, ds = jax.lax.while_loop(
                lambda st: (st[0] < new_tail) & (st[1] - shead < n_buf)
                & ~_done,
                dma_body, (scur, ds)
            )

            @pl.when(shead < ds)
            def _():
                slot = jax.lax.rem(shead, n_buf)
                wait_dma(slot)  # ALWAYS consume the semaphore

                @pl.when(block_live(subb_ref[startq_ref[shead]]))
                def _():
                    sub_walk(slot)

            new_head = shead + (shead < ds).astype(jnp.int32)
            done = ~jnp.any(occ_ref[:] == 0)
            return new_sp, scur, new_tail, new_head, ds, done

        alive_any = jnp.any(min_t >= 0.0)
        jax.lax.while_loop(
            # run until blocked-everywhere (done), BUT always drain
            # in-flight DMAs (shead < ds) before exiting
            lambda st: (((st[0] > 0) | (st[1] < st[2])) & ~st[5])
            | (st[3] < st[4]),
            lap,
            (
                jnp.where(alive_any, jnp.int32(1), jnp.int32(0)),
                jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.bool_(False),
            ),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "leaf_k", "sub_nodes", "sub_tris", "interpret", "p_nodes", "q_leaves",
    "rows"))
def occlusion_stream_pallas(
    topf, topl, topp, subf, subi, subp, subt, tri_base,
    o, d, min_t, occluded0, leaf_k: int, sub_nodes: int, sub_tris: int,
    interpret: bool = False,
    p_nodes: int = P_NODES, q_leaves: int = Q_LEAVES, rows: int = TILE_ROWS,
):
    """Streaming wide-BVH packet any-hit (shadow windows as the resident
    kernel; reference: src/lightSample.h:89-136)."""
    n = o.shape[0]
    tile = rows * TILE_LANES
    ox, _ = _pad_pool(o[:, 0], 0.0, tile)
    oy, _ = _pad_pool(o[:, 1], 0.0, tile)
    oz, _ = _pad_pool(o[:, 2], 0.0, tile)
    dx, _ = _pad_pool(d[:, 0], 1.0, tile)
    dy, _ = _pad_pool(d[:, 1], 1.0, tile)
    dz, _ = _pad_pool(d[:, 2], 1.0, tile)
    mt, _ = _pad_pool(min_t, -FLT_MAX, tile)
    oc0, _ = _pad_pool(occluded0.astype(jnp.int32), 1, tile)

    num_tiles = ox.shape[0] // tile
    octs = _tile_octants(d, num_tiles, tile)
    S, Tmax = sub_nodes, sub_tris
    n_sub = subf.shape[0] // (S * 48)
    T = topf.shape[0] // 48
    B = STREAM_BUFS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            *[
                pl.BlockSpec((1, rows, TILE_LANES), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(8)
            ],
            *[pl.BlockSpec(memory_space=pl.ANY) for _ in range(3)],
            *[pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(4)],  # see
            # closest-hit streaming: dynamic row DMA needs untiled HBM
        ],
        out_specs=[
            pl.BlockSpec((1, rows, TILE_LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        scratch_shapes=[
            pltpu.SMEM((T + 8 * P_NODES + 8,), jnp.int32),
            pltpu.SMEM((n_sub + 8 * P_NODES + 8,), jnp.int32),
            pltpu.SMEM((n_sub + 8 * P_NODES + 8,), jnp.int32),  # bounds idx
            pltpu.SMEM((n_sub + 8 * P_NODES + 8,), jnp.int32),  # started->queue
            pltpu.SMEM((S + 8 * P_NODES + 8,), jnp.int32),
            pltpu.SMEM((S * 8 + 8 * P_NODES + 8,), jnp.int32),
            pltpu.SMEM((T * 48,), jnp.float32),
            pltpu.SMEM((T * 8,), jnp.int32),
            pltpu.SMEM((T * 8,), jnp.int32),
            pltpu.SMEM((B * S * 48,), jnp.float32),
            pltpu.SMEM((B * S * 24,), jnp.int32),
            pltpu.SMEM((B * S * 8,), jnp.int32),
            pltpu.SMEM((B * Tmax * 9,), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((B, 4)),
        ],
    )
    kernel = _make_stream_occlusion_kernel(leaf_k, p_nodes, q_leaves, S, Tmax)
    (occ,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, rows, TILE_LANES), jnp.int32)
        ],
        interpret=interpret,
    )(
        octs, tri_base,
        _tiles(ox, rows), _tiles(oy, rows), _tiles(oz, rows),
        _tiles(dx, rows), _tiles(dy, rows), _tiles(dz, rows),
        _tiles(mt, rows), _tiles(oc0, rows),
        topf, topl, topp, subf, subi, subp, subt,
    )
    return occ.reshape(-1)[:n].astype(bool)


@functools.partial(jax.jit, static_argnames=(
    "leaf_k", "interpret", "p_nodes", "q_leaves", "rows"))
def occlusion_wbvh_pallas(
    wf, wi, tri12, o, d, min_t, occluded0, leaf_k: int, interpret: bool = False,
    p_nodes: int = P_NODES, q_leaves: int = Q_LEAVES, rows: int = TILE_ROWS,
):
    """Wide-BVH packet any-hit with the reference's shadow epsilon windows
    (reference: src/lightSample.h:89-136).  Disabled lanes carry min_t at
    -FLT_MAX (see closest-hit note on the sentinel)."""
    n = o.shape[0]
    tile = rows * TILE_LANES
    ox, _ = _pad_pool(o[:, 0], 0.0, tile)
    oy, _ = _pad_pool(o[:, 1], 0.0, tile)
    oz, _ = _pad_pool(o[:, 2], 0.0, tile)
    dx, _ = _pad_pool(d[:, 0], 1.0, tile)
    dy, _ = _pad_pool(d[:, 1], 1.0, tile)
    dz, _ = _pad_pool(d[:, 2], 1.0, tile)
    mt, _ = _pad_pool(min_t, -FLT_MAX, tile)
    oc0, _ = _pad_pool(occluded0.astype(jnp.int32), 1, tile)

    num_tiles = ox.shape[0] // tile

    in_specs = [
        *[
            pl.BlockSpec((1, rows, TILE_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(8)
        ],
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, rows, TILE_LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    nf_sz = wf.shape[0]
    ni_sz = wi.shape[0]
    nt = tri12.shape[0]
    inner = _make_wide_occlusion_kernel(leaf_k, p_nodes, q_leaves)

    def kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, mt_r, oc0_r,
               wf_h, wi_h, tr_h,
               occ_r, stack_r, leafq_r, wf_s, wi_s, tr_v, sems):
        @pl.when(pl.program_id(0) == 0)
        def _():
            copies = [
                pltpu.make_async_copy(wf_h, wf_s, sems.at[0]),
                pltpu.make_async_copy(wi_h, wi_s, sems.at[1]),
                pltpu.make_async_copy(tr_h, tr_v, sems.at[2]),
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

        inner(
            ox_r.at[0], oy_r.at[0], oz_r.at[0],
            dx_r.at[0], dy_r.at[0], dz_r.at[0], mt_r.at[0], oc0_r.at[0],
            wf_s, wi_s, tr_v,
            occ_r.at[0],
            stack_r, leafq_r,
        )

    (occ,) = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, rows, TILE_LANES), jnp.int32)],
        scratch_shapes=[
            pltpu.SMEM((nf_sz // 48 + 8 * p_nodes,), jnp.int32),
            pltpu.SMEM((nf_sz // 48 * 8 + 8 * p_nodes,), jnp.int32),
            pltpu.SMEM((nf_sz,), jnp.float32),
            pltpu.SMEM((ni_sz,), jnp.int32),
            pltpu.VMEM((nt, 12), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        _tiles(ox, rows), _tiles(oy, rows), _tiles(oz, rows),
        _tiles(dx, rows), _tiles(dy, rows), _tiles(dz, rows), _tiles(mt, rows), _tiles(oc0, rows),
        wf, wi, tri12,
    )
    return occ.reshape(-1)[:n].astype(bool)


