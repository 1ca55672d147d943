"""Host-side wide-BVH packet-traversal simulator.

Replays captured bounce states (tools/capture_states.py) through an exact
numpy model of the Pallas wide-packet walk and reports, per packet size and
sort mode, the packet-union statistics that determine kernel cost:

  visits      = internal-node pops (the serial unit)
  leaves      = leaf-cut drains
  work/ray    = VPU-lane work model: (visits*8*25 + leaves*leaf_k*45)
                vector instrs per VREG-row, divided across the packet's rays

Usage: python tools/union_sim.py [K ...]   (packet sizes; default sweep)
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import pathtracer_tpu.scene.flatscene as fs

fs.WIDE_LEAF_K = 8
for _a in list(sys.argv[1:]):
    if _a.startswith("--leafk="):
        fs.WIDE_LEAF_K = int(_a.split("=")[1])
        sys.argv.remove(_a)

from pathtracer_tpu.scene.flatscene import build_flat_scene
from pathtracer_tpu.scene.parser import load_scene

scene = load_scene("scenes/glassbunny.txt")
flat, static = build_flat_scene(scene)
wf = np.asarray(flat.bvh_wf).reshape(-1, 8, 6)   # (M, 8, 6) child boxes
wi = np.asarray(flat.bvh_wi).reshape(-1, 24)     # link x8, start x8, end x8
tri = np.asarray(flat.tri_pk)                    # (nt, 12)
M = wf.shape[0]
leaf_k = static.wide_leaf_k
print(f"wide nodes {M}, tris {tri.shape[0]}, leaf_k {leaf_k}", flush=True)

d = np.load("/tmp/bounce_states.npz")
NB = int(d["nb"])

cb_min = wf[:, :, 0:3]
cb_max = wf[:, :, 3:6]
links = wi[:, 0:8]
starts = wi[:, 8:16]
ends = wi[:, 16:24]

if "--merge" in sys.argv:
    # Sibling leaf-cut merge model: adjacent leaf children of the same
    # wide node whose combined span fits leaf_k collapse into ONE cut
    # with the union AABB.  Cuts average ~5.6/8 filled slots, so the
    # kernel burns ~30% of its leaf MT work on padding; merging trades
    # that for extra reachability (a merged cut drains when EITHER box
    # is hit).  Sibling tri ranges are contiguous by construction
    # (collapse_wide expands children in tri order).
    sys.argv.remove("--merge")
    cb_min, cb_max = cb_min.copy(), cb_max.copy()
    links, starts, ends = links.copy(), starts.copy(), ends.copy()
    merged = total_cuts = 0
    for nd in range(M):
        out = []
        for c in range(8):
            ln, s, e = links[nd, c], starts[nd, c], ends[nd, c]
            bmn, bmx = cb_min[nd, c].copy(), cb_max[nd, c].copy()
            is_leaf = ln < 0 and e > s
            if not is_leaf and ln < 0:
                continue  # empty pad slot
            if (is_leaf and out and out[-1][2] < 0
                    and out[-1][4] == s and e - out[-1][3] <= leaf_k):
                pb, pB, _, ps, _ = out[-1]
                out[-1] = (np.minimum(pb, bmn), np.maximum(pB, bmx),
                           np.int32(-1), ps, e)
                merged += 1
            else:
                out.append((bmn, bmx, ln, s, e))
        total_cuts += sum(1 for x in out if x[2] < 0)
        for c in range(8):
            if c < len(out):
                (cb_min[nd, c], cb_max[nd, c], links[nd, c],
                 starts[nd, c], ends[nd, c]) = out[c]
            else:
                cb_min[nd, c] = np.nan
                cb_max[nd, c] = np.nan
                links[nd, c] = -1
                starts[nd, c] = 0
                ends[nd, c] = 0
    print(f"merge: {merged} sibling cuts absorbed, {total_cuts} cuts remain",
          flush=True)


def sim_packet(o, dirs, t0):
    K = o.shape[0]
    best = t0.copy()
    inv = 1.0 / dirs
    stack = [0]
    visits = leaves = tri_tests = 0
    while stack:
        node = stack.pop()
        visits += 1
        with np.errstate(invalid="ignore", divide="ignore"):
            lo = (cb_min[node][None, :, :] - o[:, None, :]) * inv[:, None, :]
            hi = (cb_max[node][None, :, :] - o[:, None, :]) * inv[:, None, :]
        tmin = np.minimum(lo, hi).max(axis=2)  # (K, 8)
        tmax = np.maximum(lo, hi).min(axis=2)
        hit = (tmin <= tmax) & (tmax > 0.0)
        active = hit & (tmin <= best[:, None])  # (K, 8)
        anyc = active.any(axis=0)
        for c in range(8):
            if not anyc[c]:
                continue
            ln = links[node, c]
            if ln >= 0:
                stack.append(ln)
            else:
                s, e = starts[node, c], ends[node, c]
                if e <= s:
                    continue
                leaves += 1
                tri_tests += e - s
                rows = tri[s:e]  # EDGE-FORM rows: [v0, e1, e2] (flatscene)
                v0 = rows[:, 0:3]
                e1 = rows[:, 3:6]
                e2 = rows[:, 6:9]
                p = np.cross(dirs[:, None, :], e2[None, :, :])
                det = (e1[None] * p).sum(-1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    idet = np.where(det == 0, 1.0, 1.0 / det)
                tv = o[:, None, :] - v0[None]
                uu = (tv * p).sum(-1) * idet
                q = np.cross(tv, e1[None, :, :])
                vv = (dirs[:, None, :] * q).sum(-1) * idet
                tt = (e2[None] * q).sum(-1) * idet
                ok = (det != 0) & (tt >= 0) & (uu >= 0) & (vv >= 0) & (1 - uu - vv >= 0)
                tt = np.where(ok, tt, np.inf)
                best = np.minimum(best, tt.min(axis=1))
    return visits, leaves, tri_tests


def _sort_key(o, dirs, t0):
    sb = np.asarray(static.scene_bounds, np.float32)
    cell = np.clip(
        (o - sb[0:3]) / np.maximum(sb[3:6] - sb[0:3], 1e-6) * 7.999, 0, 7.999
    ).astype(np.int64)
    octant = (dirs[:, 0] > 0) + 2 * (dirs[:, 1] > 0) + 4 * (dirs[:, 2] > 0)
    key = ((octant * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 + cell[:, 2]
    return np.where(t0 > -1e37, key, 1 << 24)


def run(K, mode, o, dirs, t0, sample=4, prev=None):
    n = o.shape[0]
    if mode == "stale":
        # order by the PREVIOUS bounce's sort key (sort-every-other-bounce
        # model: this bounce reuses last bounce's permutation)
        po, pd, pt = prev
        perm = np.argsort(_sort_key(po, pd, pt), kind="stable")
        o, dirs, t0 = o[perm], dirs[perm], t0[perm]
    elif mode != "raw":
        sb = np.asarray(static.scene_bounds, np.float32)
        cell = np.clip(
            (o - sb[0:3]) / np.maximum(sb[3:6] - sb[0:3], 1e-6) * 7.999, 0, 7.999
        ).astype(np.int64)
        octant = (dirs[:, 0] > 0) + 2 * (dirs[:, 1] > 0) + 4 * (dirs[:, 2] > 0)
        if mode == "sortdir":
            # higher-resolution direction key: octant + secondary dir bits
            ad = np.abs(dirs)
            axis = np.argmax(ad, axis=1)
            key = ((octant * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 + cell[:, 2]
            key = key * 4 + axis
        elif mode == "sort16":
            # 16^3 origin cells (morton-interleaved), octant-major
            c16 = np.clip(
                (o - sb[0:3]) / np.maximum(sb[3:6] - sb[0:3], 1e-6) * 15.999,
                0, 15.999,
            ).astype(np.int64)
            m = np.zeros(len(o), np.int64)
            for bit in range(4):
                for ax in range(3):
                    m |= ((c16[:, ax] >> bit) & 1) << (3 * bit + ax)
            key = octant * 4096 + m
        elif mode == "cellmaj":
            # cell-major, octant minor: spatial purity beats direction
            key = (((cell[:, 0] * 8 + cell[:, 1]) * 8 + cell[:, 2]) * 8
                   + octant)
        else:
            key = ((octant * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 + cell[:, 2]
        key = np.where(t0 > -1e37, key, 1 << 24)
        perm = np.argsort(key, kind="stable")
        o, dirs, t0 = o[perm], dirs[perm], t0[perm]
    tot_v = tot_l = tot_t = 0
    npk = 0
    dead = 0
    for s in range(0, n - K + 1, K * sample):
        sl = slice(s, s + K)
        if not (t0[sl] > -1e37).any():
            dead += 1
            continue
        v, l, tt = sim_packet(o[sl], dirs[sl], t0[sl])
        tot_v += v
        tot_l += l
        tot_t += tt
        npk += 1
    if npk == 0:
        return None
    vreg = max(K, 1024) / K  # lane work per ray scales with ceil to a VREG
    work = (tot_v / npk * 8 * 25 + tot_l / npk * leaf_k * 45) * vreg / K
    return tot_v / npk, tot_l / npk, tot_t / npk, work, npk, dead


Ks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [2048, 1024, 512, 256]
modes = (
    ["raw", "sort", "sortdir"]
    if "--classic" in sys.argv
    else ["sort", "sort16", "cellmaj"]
)
if "--stale" in sys.argv:
    modes = ["sort", "stale"]
if "--sortonly" in sys.argv:
    modes = ["sort"]
print(f"{'b':>2} {'K':>5} {'mode':>7} {'visits':>8} {'leaves':>8} "
      f"{'tritst':>8} {'work/ray':>9}")
for b in range(NB):
    o, dirs, t0 = d[f"o{b}"], d[f"d{b}"], d[f"t{b}"]
    for K in Ks:
        for mode in modes:
            if mode == "stale":
                if b == 0:
                    continue
                prev = (d[f"o{b-1}"], d[f"d{b-1}"], d[f"t{b-1}"])
                r = run(K, mode, o, dirs, t0, prev=prev)
            else:
                r = run(K, mode, o, dirs, t0)
            if r is None:
                continue
            v, l, tt, w, npk, dead = r
            print(f"{b:>2} {K:>5} {mode:>7} {v:>8.1f} {l:>8.1f} {tt:>8.0f} "
                  f"{w:>9.1f}  ({npk} pk, {dead} dead)", flush=True)
