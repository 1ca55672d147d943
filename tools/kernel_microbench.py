"""Decompose the wide-packet pop cost on the real TPU.

Runs a single-tile Pallas kernel that executes a fixed number F of
"pop-like" iterations, with each cost component toggled, and reports
ns/pop per component.  This tells us WHERE the traversal budget goes:
scalar SMEM loads, AABB VPU math, cross-lane `jnp.any` reductions, the
stack while_loop, or leaf Möller–Trumbore sweeps.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_microbench.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

TILE_ROWS, TILE_LANES = 16, 128
M = 311          # wide nodes (bunny K=16)
F = 20000        # pops per measurement
NT = 10000


def make_kernel(variant: str, leaf_k: int = 0):
    def kernel(ox_r, oy_r, oz_r, wf_h, wi_h, tr_h, out_r, wf_s, wi_s, tr_v, stack_s, sems):
        c0 = pltpu.make_async_copy(wf_h, wf_s, sems.at[0])
        c1 = pltpu.make_async_copy(wi_h, wi_s, sems.at[1])
        c2 = pltpu.make_async_copy(tr_h, tr_v, sems.at[2])
        c0.start(); c1.start(); c2.start()
        c0.wait(); c1.wait(); c2.wait()

        ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
        idx = 1.0 / jnp.maximum(ox, 0.1)
        idy = 1.0 / jnp.maximum(oy, 0.1)
        idz = 1.0 / jnp.maximum(oz, 0.1)
        out_r[:] = jnp.zeros_like(out_r[:])

        def aabb(nf):
            lo_x = (nf[0] - ox) * idx
            hi_x = (nf[3] - ox) * idx
            lo_y = (nf[1] - oy) * idy
            hi_y = (nf[4] - oy) * idy
            lo_z = (nf[2] - oz) * idz
            hi_z = (nf[5] - oz) * idz
            t_enter = jnp.maximum(
                jnp.maximum(jnp.minimum(lo_x, hi_x), jnp.minimum(lo_y, hi_y)),
                jnp.minimum(lo_z, hi_z))
            t_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(lo_x, hi_x), jnp.maximum(lo_y, hi_y)),
                jnp.maximum(lo_z, hi_z))
            return (t_enter <= t_exit) & (t_exit > 0.0), t_enter

        def mt(trow):
            v0x, v0y, v0z = trow[0], trow[1], trow[2]
            e1x, e1y, e1z = trow[3] - v0x, trow[4] - v0y, trow[5] - v0z
            e2x, e2y, e2z = trow[6] - v0x, trow[7] - v0y, trow[8] - v0z
            px = oy * e2z - oz * e2y
            py = oz * e2x - ox * e2z
            pz = ox * e2y - oy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (ox * qx + oy * qy + oz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            return (det != 0.0) & (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (1 - u - v >= 0), t

        def body(i, acc):
            if variant == "loop_empty":
                return acc + 1.0
            if variant == "loop_and":
                return acc + jnp.float32(i & 255)
            if variant == "while_empty":
                return acc  # (driven by while_loop below)
            node = i % M
            base_f = node * 48
            base_i = node * 24
            if variant == "loop_only":
                return acc + jnp.float32(node)
            if variant == "loads4":  # 4 nodes per lap: amortization test
                s = jnp.float32(0)
                for j in range(4):
                    nd = (i * 4 + j) % M
                    bf, bi = nd * 48, nd * 24
                    for c in range(8):
                        for k in range(6):
                            s += wf_s[bf + c * 6 + k]
                        s += jnp.float32(wi_s[bi + c])
                return acc + s
            if variant == "any1":
                hit, t_enter = aabb([wf_s[base_f + k] for k in range(6)])
                return acc + jnp.any(hit & (t_enter <= acc)).astype(jnp.float32)
            if variant == "push_branchless":
                sp = jnp.int32(0)
                for c in range(8):
                    nf = [wf_s[base_f + c * 6 + k] for k in range(6)]
                    link = wi_s[base_i + c]
                    hit, t_enter = aabb(nf)
                    active = hit & (t_enter <= acc)
                    any_c = jnp.any(active)
                    push = any_c & (link >= 0)
                    stack_s[jnp.minimum(sp, 63)] = link  # unconditional store
                    sp = sp + push.astype(jnp.int32)
                return acc + jnp.float32(sp) * 1e-30
            if variant == "push_packed":
                # ONE cross-lane reduce for all 8 slot-any bits: pack each
                # slot's active mask into bit c of an int32 plane, reduce
                # with a single jnp.max, then 8 scalar bit extracts.
                # NOTE: max != bitwise-OR across lanes — this probe measures
                # COST only; a production version needs a real OR-reduce.
                sp = jnp.int32(0)
                bits = jnp.zeros_like(out_r[:], jnp.int32)
                for c in range(8):
                    nf = [wf_s[base_f + c * 6 + k] for k in range(6)]
                    hit, t_enter = aabb(nf)
                    active = hit & (t_enter <= acc)
                    bits = bits | (active.astype(jnp.int32) << jnp.int32(c))
                anyb = jnp.max(bits)
                for c in range(8):
                    link = wi_s[base_i + c]
                    any_c = ((anyb >> jnp.int32(c)) & jnp.int32(1)) > 0
                    push = any_c & (link >= 0)
                    stack_s[jnp.minimum(sp, 63)] = link
                    sp = sp + push.astype(jnp.int32)
                return acc + jnp.float32(sp) * 1e-30
            if variant in ("push4_branchless", "push4_packed"):
                # 4-node lap (the production p_nodes=4 shape): 32 slot-anys
                # either individually or as one packed 32-bit reduce.
                sp = jnp.int32(0)
                if variant == "push4_packed":
                    # two 16-bit int32 planes (dodges the sign bit); 2
                    # cross-lane reduces for the 32 slot-any bits.
                    b0 = jnp.zeros_like(out_r[:], jnp.int32)
                    b1 = jnp.zeros_like(out_r[:], jnp.int32)
                    for j in range(4):
                        nd = (i * 4 + j) % M
                        for c in range(8):
                            nf = [wf_s[nd * 48 + c * 6 + k] for k in range(6)]
                            hit, t_enter = aabb(nf)
                            active = hit & (t_enter <= acc)
                            b = j * 8 + c
                            if b < 16:
                                b0 = b0 | (active.astype(jnp.int32) << jnp.int32(b))
                            else:
                                b1 = b1 | (active.astype(jnp.int32) << jnp.int32(b - 16))
                    any0 = jnp.max(b0)
                    any1b = jnp.max(b1)
                    for j in range(4):
                        nd = (i * 4 + j) % M
                        for c in range(8):
                            link = wi_s[nd * 24 + c]
                            b = j * 8 + c
                            src = any0 if b < 16 else any1b
                            any_c = ((src >> jnp.int32(b % 16)) & jnp.int32(1)) > 0
                            push = any_c & (link >= 0)
                            stack_s[jnp.minimum(sp, 63)] = link
                            sp = sp + push.astype(jnp.int32)
                else:
                    for j in range(4):
                        nd = (i * 4 + j) % M
                        for c in range(8):
                            nf = [wf_s[nd * 48 + c * 6 + k] for k in range(6)]
                            link = wi_s[nd * 24 + c]
                            hit, t_enter = aabb(nf)
                            active = hit & (t_enter <= acc)
                            any_c = jnp.any(active)
                            push = any_c & (link >= 0)
                            stack_s[jnp.minimum(sp, 63)] = link
                            sp = sp + push.astype(jnp.int32)
                return acc + jnp.float32(sp) * 1e-30
            if variant == "loads":
                s = jnp.float32(0)
                for c in range(8):
                    for k in range(6):
                        s += wf_s[base_f + c * 6 + k]
                    s += jnp.float32(wi_s[base_i + c])
                return acc + s
            if variant in ("aabb", "aabb_any", "aabb_any_leafgate"):
                acc2 = acc
                n_any = jnp.int32(0)
                for c in range(8):
                    nf = [wf_s[base_f + c * 6 + k] for k in range(6)]
                    link = wi_s[base_i + c]
                    hit, t_enter = aabb(nf)
                    active = hit & (t_enter <= acc2)  # acc2 plays t_ref
                    if variant == "aabb":
                        acc2 = acc2 + jnp.float32(link) * 1e-30
                        continue
                    any_c = jnp.any(active)
                    if variant == "aabb_any_leafgate":
                        @pl.when(any_c & (link < -(10**9)))  # never true
                        def _():
                            out_r[:] = out_r[:] + 1.0
                    n_any = n_any + any_c.astype(jnp.int32)
                return acc2 + jnp.float32(n_any) * 1e-30 if variant != "aabb" else acc2
            if variant == "leaf_mt":
                for k in range(leaf_k):
                    tid = jnp.minimum(node * 8 + k, NT - 1)
                    th, tt = mt(tr_v[tid])
                    take = th & (tt < acc)
                    # realistic: masked min update against out buffer
                    out_r[:] = jnp.where(take, tt, out_r[:])
                return acc
            raise ValueError(variant)

        if variant == "while_empty":
            def wcond(st):
                return st[0] < F
            def wbody(st):
                return (st[0] + 1, st[1] + 1.0)
            _, r = jax.lax.while_loop(wcond, wbody, (jnp.int32(0), jnp.float32(0)))
        else:
            r = jax.lax.fori_loop(0, F, body, jnp.float32(1e30))
        out_r[:] = out_r[:] + r

    return kernel


def run(variant, leaf_k=0):
    rng = np.random.default_rng(0)
    wf = jnp.asarray(rng.uniform(-5, 5, M * 48).astype(np.float32))
    wi = jnp.asarray(rng.integers(0, 100, M * 24).astype(np.int32))
    tr = jnp.asarray(rng.uniform(-5, 5, (NT, 12)).astype(np.float32))
    pool = jnp.asarray(rng.uniform(0.2, 5, (3, TILE_ROWS, TILE_LANES)).astype(np.float32))

    fn = pl.pallas_call(
        make_kernel(variant, leaf_k),
        grid=(1,),
        in_specs=[
            *[pl.BlockSpec((1, TILE_ROWS, TILE_LANES), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(3)],
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TILE_ROWS, TILE_LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, TILE_ROWS, TILE_LANES), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((M * 48,), jnp.float32),
            pltpu.SMEM((M * 24,), jnp.int32),
            pltpu.VMEM((NT, 12), jnp.float32),
            pltpu.SMEM((64,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    f = jax.jit(lambda a, b, c, d: fn(a[0], a[1], a[2], b, c, d))
    args = (pool[:, None], wf, wi, tr)
    np.asarray(f(*args))  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    return dt / F * 1e9  # ns per pop


if __name__ == "__main__":
    import sys

    variants = sys.argv[1:] or [
        "loop_empty", "while_empty", "loop_and", "loop_only", "loads4",
        "any1", "push_branchless",
    ]
    base = None
    for v in variants:
        ns = run(v)
        if base is None:
            base = ns
        print(f"{v:19s}: {ns:8.1f} ns/lap  (+{ns - base:.1f})", flush=True)
