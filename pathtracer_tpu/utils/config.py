"""Render configuration.

The reference scatters its configuration over three layers (SURVEY.md §5):
compile-time #defines (reference: src/utilities.h:22-29, src/BVH.h:5-6),
the scene file's CAMERA block, and runtime UI state (the SampleMode combo,
reference: src/preview.cpp:245-252).  Here all of it is one frozen dataclass
(hashable, so it can be a static jit argument) plus the per-scene RenderState
carried by the parsed scene.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, replace


class SampleMode(enum.IntEnum):
    """Integrator mode (reference: src/preview.h enum SampleMode)."""

    BSDF = 0       # BSDF importance sampling only   (PTkernel)
    DIRECT_LI = 1  # next-event estimation only      (DirectLiPTkernel)
    MIS = 2        # NEE + BSDF with power heuristic (MisPTkernel)


@dataclass(frozen=True)
class RenderOptions:
    """Feature switches, mirroring the reference's compile-time flags.

    reference: src/utilities.h:22-29 (USE_BVH/USE_SAH/USE_MTBVH/TONEMAPPING/
    VERTEX_NORMAL/SHOW_NORMAL/ROUGHNESS_MIN/ROUGHNESS_MAX) and
    src/BVH.h:5-6 (MAX_PRIM/BUCKET_NUM).
    """

    use_bvh: bool = True       # False = brute-force triangle sweep
    use_sah: bool = True       # False = median-split build
    use_mtbvh: bool = True     # False = single-tree threaded layout
    tonemapping: bool = True
    vertex_normal: bool = True  # False = face normals even when OBJ has them
    show_normal: bool = False   # first-hit normal debug view
    max_prim: int = 1          # BVH leaf capacity (reference: src/BVH.h:5)
    bucket_num: int = 20       # SAH buckets (reference: src/BVH.h:6)
    # ROUGHNESS_MIN/MAX stay compile-time constants (the reference's
    # src/utilities.h:28-29), applied at parse (scene/parser.py:48) and at
    # sample time (ops/materials.py:49) — not runtime options.

    # TPU-build additions (no reference counterpart)
    sample_mode: SampleMode = SampleMode.BSDF
    env_importance: bool = False  # env-map CDF importance sampling; the
    # reference builds the luminance CDF but never samples it
    # (reference: src/scene.cpp:514-529, README.md:25-27 TODO)
    compaction: bool = True       # per-bounce ray sorting by (alive, octant,
    # origin cell) — the TPU analogue of the reference's compact_rays
    # (reference: src/pathtrace.cu:614-631), with the count kept on device.
    # Sorted packets traverse ~3x faster (tools/kernel_sweep.py sorted);
    # the round-1 cost concern is gone: the sort is ONE multi-operand
    # lax.sort over 1D columns (no (N,3) row gathers) and the image
    # scatter-add happens once per ITERATION (contrib rides the ray).
    pool_shrink: bool = True      # straggler-phase pool compaction: once
    # <25% of lanes are alive, the live rays are sorted to the front and
    # the remaining bounces run in a statically-shaped quarter pool (4x
    # fewer traversal packets for the long straggler tail).  Lane-keyed
    # RNG + ride-the-ray accumulation make it bit-identical to the
    # full-pool render (tests enforce).
    shadow_sort: bool = False     # re-sort shadow rays inside the
    # occlusion pass (packet purity for the any-hit kernel); measured
    # per-scene — see tools/bench_r3.py
    shrink_levels: int = 2        # pool_shrink depth: each level quarters
    # the pool (640k -> 160k -> 40k -> ...).  2 covers straggler tails to
    # 1/16th; deeper levels only pay when liveness sits under ~1.5% for
    # several bounces (each level adds a compiled while body + sort)
    shrink_half: bool = False     # insert a pool/2 level at the FRONT of
    # the shrink ladder (fires once alive <= 50%).  Pays on resident mesh
    # scenes whose liveness LINGERS in the 25-50% band for several tail
    # bounces (glassbunny: 50/42/35% at depths 5-7) — they already sort
    # per bounce, so the boundary costs nothing extra.  Analytic scenes
    # must NOT set this: their boundary sort is a full multi-operand
    # lax.sort they otherwise never pay (cornell's whole iteration costs
    # less than one 640k sort).
    sort_every: int = 1           # re-sort the pool every k-th bounce only
    # (depth 0 always sorts).  Packet purity decays as rays scatter, so
    # k>1 trades kernel time for ~6 ms/bounce of sort cost; output is
    # bit-identical for any k (RNG keys on lane, contributions ride the
    # ray, the image scatter is collision-free)
    packet_p: int = 2             # wide-kernel stack pops per while-lap
    packet_q: int = 4             # wide-kernel leaf drains per while-lap
    packet_rows: int = 8          # packet shape: rows x 128 rays
    packet_dense: int = 0         # closest-hit dense-top preamble: process
    # the first N BFS-prefix wide nodes as straight-line code (no while
    # laps); 0 = off (traverse_pallas.py _make_wide_closest_kernel)
    packet_auto: bool = True      # scene-class knob auto-tune: untextured
    # env-less RESIDENT mesh scenes are traversal-compute-bound and run
    # ~7% faster at (P,Q,rows)=(4,8,16) (deeper laps amortize the serial
    # pop; 16-row packets halve packet count for ~15% union growth),
    # while gather-bound (textures/env) and streaming scenes measure
    # 4-5% SLOWER there — so only that class is upgraded (tools/
    # knob_ab.py A/Bs on glassbunny/envbunny/bigbunny160k/texturecube).
    # Explicit non-default P/Q/rows always win over the auto policy.
    interpret: bool = False       # run Pallas kernels in interpreter mode
    pallas_traversal: bool = True  # packet BVH kernels (TPU); False = XLA
    # lockstep walk (also the automatic fallback on CPU)
    swizzle: bool = True          # order the ray pool in 32x32 pixel blocks
    # so traversal packets are spatially coherent (single-device path)
    ray_regen: int = 0            # cross-iteration ray regeneration: > 1
    # renders k samples/pixel in ONE persistent pool — a lane whose path
    # dies is refilled in place with the camera ray for its pixel's next
    # sample index, so per-bounce fixed costs (packet launches, the
    # multi-operand sort, material/atlas/env taps) amortize over a
    # near-full-live pool instead of the 4-25% liveness tails.  Physics
    # exact (same (pixel, sample, bounce, stage) RNG streams; only
    # float-add order changes — which is why it stays OPT-IN: the classic
    # path keeps the bitwise checkpoint-resume invariant, regen's batch
    # splits do not).  Measured k=8 on-chip: cornell MIS +23%, BSDF +22%,
    # dielectric +45%, mis_test +75%; NEGATIVE on sorted mesh/env/texture
    # pools (PARITY.md r5) — bench.py/CLI enable it per scene.  Applies
    # to the fused BSDF/MIS single-device path; DIRECT_LI / staged /
    # sharded ignore it.
    iters_per_dispatch: int = 0   # batch k iterations into one jit call
    # (k sequential bounce loops — NOT nested, so it avoids the rule-5
    # compile pathology).  The remote backend costs ~10-30 ms of dispatch
    # latency per step that pipelining does not hide (tools/
    # dispatch_probe.py: 122 -> 13 ms/iter at 64x64), which dominates
    # fast analytic iterations.  0 = auto: 8 for analytic scenes, 1 for
    # triangle scenes (whose ~300-600 s Pallas compiles would double).
    # Bit-identical to unbatched: RNG keys on (iteration, lane), the
    # probe asserts exact image equality.

    def with_mode(self, mode: SampleMode) -> "RenderOptions":
        return replace(self, sample_mode=SampleMode(mode))


# Shared numeric constants (reference: src/utilities.h:13-20)
PI = 3.1415926535897932384626422832795028841971
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
EPSILON = 1e-4
RAY_BIAS = 1e-3
BACKGROUND_COLOR = (0.0, 0.0, 0.0)
