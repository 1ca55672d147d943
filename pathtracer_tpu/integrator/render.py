"""Progressive renderer: accumulation loop, tonemapped save, checkpointing.

Rebuild of the reference's host orchestration (reference: src/main.cpp:146-226
runCuda/saveImage): dev_image accumulates radiance sums across iterations,
display/save divides by the iteration count then applies ACES + gamma 1/2.2
and an X mirror (reference: src/main.cpp:151-158, src/pathtrace.cu:32-65).

Beyond the reference (SURVEY.md §5 'checkpoint/resume'): the accumulation
buffer + iteration count + RNG seed are saveable/loadable, so a render can
resume exactly (counter-based RNG keyed on iteration makes the resumed
stream identical to an uninterrupted run).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from pathtracer_tpu.integrator.wavefront import CameraArrays, make_render_iteration
from pathtracer_tpu.ops import math as m
from pathtracer_tpu.scene.camera import RenderCamera, derive_camera
from pathtracer_tpu.scene.flatscene import FlatScene, SceneStatic, build_flat_scene
from pathtracer_tpu.scene.parser import SceneData, load_scene
from pathtracer_tpu.utils import rng
from pathtracer_tpu.utils import jaxcache
from pathtracer_tpu.utils.config import RenderOptions, SampleMode
from pathtracer_tpu.utils.image_io import write_hdr, write_png


def swizzle_map(width: int, height: int, block: int = 32) -> np.ndarray:
    """Lane→pixel permutation grouping pixels into `block`² tiles."""
    idx = np.arange(width * height, dtype=np.int64)
    x = idx % width
    y = idx // width
    blocks_x = (width + block - 1) // block
    key = ((y // block) * blocks_x + (x // block)) * (block * block) + (
        y % block
    ) * block + (x % block)
    return np.argsort(key, kind="stable")


@dataclass
class RenderStats:
    iterations_done: int = 0
    rays_traced: int = 0
    wall_seconds: float = 0.0
    compile_seconds: float = 0.0
    per_iter_seconds: list = field(default_factory=list)

    @property
    def mrays_per_sec(self) -> float:
        t = self.wall_seconds
        return (self.rays_traced / t / 1e6) if t > 0 else 0.0


class Renderer:
    """Owns the jitted iteration fn + accumulation state for one scene."""

    def __init__(
        self,
        scene: SceneData | str | Path,
        opts: RenderOptions | None = None,
        resolution: tuple[int, int] | None = None,
        trace_depth: int | None = None,
        devices: int | None = None,
    ):
        """`devices > 1` renders pixel-row-sharded over a `jax.sharding.Mesh`
        of that many devices (parallel/sharding.py); the position-keyed RNG
        makes the result bit-identical to a single-device render."""
        jaxcache.enable()
        if not isinstance(scene, SceneData):
            scene = load_scene(scene)
        self.scene = scene
        self.opts = opts or RenderOptions()
        if resolution is not None:
            scene.camera.resolution = resolution
        if trace_depth is not None:
            scene.trace_depth = trace_depth
        self.flat, self.static = build_flat_scene(scene, opts=self.opts)
        self.width, self.height = scene.camera.resolution
        self.camera: RenderCamera = derive_camera(scene.camera)
        # Pallas packet kernels need a real TPU (no CPU lowering) and
        # on-chip table budgets; fall back to the XLA lockstep walk else.
        from pathtracer_tpu.ops.traverse import _packet_tables_fit

        from dataclasses import replace as _dc_replace
        from pathtracer_tpu.ops.traverse import packet_mode

        # scene-class packet-knob auto-tune (see RenderOptions.packet_auto)
        if (
            self.opts.packet_auto
            and self.opts.pallas_traversal
            and (self.opts.packet_p, self.opts.packet_q, self.opts.packet_rows)
            == (2, 4, 8)
            and self.static.num_tris > 0
            and packet_mode(self.static) == "resident"
            and self.static.env_map_id < 0
            and not self.static.has_textures
        ):
            self.opts = _dc_replace(
                self.opts, packet_p=4, packet_q=8, packet_rows=16,
                # shadow-ray re-sort pays on exactly this class: +3-4% on
                # glassbunny in two independent windows (r3 campaign at
                # the (2,4,8) point, 24.50 vs 23.76 at this one); the env/
                # texture scenes where it measured flat are excluded above
                shadow_sort=True,
                # half-pool first shrink level: this class's liveness
                # lingers in the 25-50% band for the tail bounces
                # (glassbunny 50/42/35% at depths 5-7, tools/
                # liveness_probe.py) where the quarter ladder never fires;
                # the per-bounce sort already runs here so the boundary is
                # free.  Bit-identical (TestShrinkLevels).
                shrink_half=True,
            )
        if self.opts.pallas_traversal and (
            (jax.default_backend() == "cpu" and not self.opts.interpret)
            or not _packet_tables_fit(self.flat, self.static)
        ):
            self.opts = _dc_replace(self.opts, pallas_traversal=False)
        # straggler-tail scenes (env misses / textured) sit at a few %
        # liveness for much of the depth budget — a 3rd shrink level
        # (pool/64) measured +3-5% on envbunny and texturecube (one-window
        # ABAB, bit-identical); mesh-only scenes keep liveness high and
        # stay at 2 levels (untested there, and each level grows the
        # compiled program)
        if (
            self.opts.packet_auto
            and self.opts.shrink_levels == 2
            and (self.static.env_map_id >= 0 or self.static.has_textures)
        ):
            self.opts = _dc_replace(self.opts, shrink_levels=3)
        self.devices = int(devices) if devices else 1
        self._k = 1  # iterations per dispatch (fused single-device only)
        self._regen = 0  # samples/pixel per persistent-pool batch (0 = off)
        # spatial swizzle: lane l renders pixel pixel_order[l] so traversal
        # packets cover square 32x32 blocks instead of 800x1.3 row strips
        # (2.3x faster packet traversal); image is unswizzled at readout.
        # The sharded pool is row-partitioned instead, so swizzle is off.
        self.pixel_order = None
        pixel_xy = None
        if self.devices == 1 and self.opts.swizzle and self.static.num_tris > 0:
            self.pixel_order = swizzle_map(self.width, self.height)
            xs = jnp.asarray((self.pixel_order % self.width).astype(np.float32))
            ys = jnp.asarray((self.pixel_order // self.width).astype(np.float32))
            pixel_xy = (xs, ys)
        if self.devices > 1:
            # DESIGN NOTE (VERDICT r3 weak-6): the sharded step trades two
            # single-chip optimizations for simplicity: (a) the 32x32 pixel
            # swizzle is off (the pool is row-partitioned across devices, so
            # a global pixel permutation would break the shard boundaries),
            # and (b) the step is always fused (no shrink ladder / staged
            # fallback).  Correctness is covered by the bitwise-equality
            # tests (test_sharding.py); the expected cost on mesh scenes is
            # the swizzle's measured ~2.3x packet-traversal factor, i.e.
            # per-chip throughput below the single-chip path until a
            # shard-local swizzle is added.  Env/analytic scenes are
            # unaffected (swizzle only applies to triangle scenes).
            from pathtracer_tpu.parallel import sharding as sh

            self._sh = sh
            self.mesh = sh.make_mesh(self.devices)
            self._sharded_step, self._img_sharding, self._padded_h = (
                sh.make_sharded_iteration(
                    self.static, self.opts, self.width, self.height, self.mesh
                )
            )
            self.staged = False
            # the sharded step is always fused; a triangle scene that fell
            # back to the XLA traversal nests the BVH while_loop inside the
            # bounce while_loop — pathological TPU compile times (the
            # single-device path goes staged for exactly this case)
            if (
                self.static.num_tris > 0
                and not self.opts.pallas_traversal
                and jax.default_backend() != "cpu"
            ):
                import warnings

                warnings.warn(
                    "sharded render of a triangle scene without the Pallas "
                    "traversal: the fused XLA BVH walk inside the bounce "
                    "loop may compile pathologically slowly on TPU",
                    stacklevel=2,
                )
        else:
            builder = make_render_iteration(
                self.static, self.opts, self.width, self.height, pixel_xy=pixel_xy
            )
            # Triangle scenes on the XLA traversal run STAGED (host loop over
            # jitted bounce stages): the fused variant nests the BVH-traversal
            # while_loop inside the bounce while_loop, which the TPU toolchain
            # compiles pathologically slowly.  With the Pallas packet kernels
            # (opaque custom calls) or no triangles at all, the fused
            # single-dispatch path works and avoids per-bounce host round trips.
            self.staged = self.static.num_tris > 0 and not self.opts.pallas_traversal
            # cross-iteration ray regeneration (see RenderOptions.ray_regen):
            # fused multi-bounce paths only — the persistent pool refills
            # dead lanes with next-sample camera rays inside the while loop
            rk = int(getattr(self.opts, "ray_regen", 0))
            if (
                rk > 1
                and not self.staged
                and self.opts.sample_mode != SampleMode.DIRECT_LI
                and not self.opts.show_normal
            ):
                self._regen = rk
                self._batch_fn = jax.jit(
                    make_render_iteration(
                        self.static, self.opts, self.width, self.height,
                        pixel_xy=pixel_xy, regen_k=rk,
                    )
                )
            if self.staged:
                self._start_fn = jax.jit(builder.start_state)
                self._bounce_fn = jax.jit(builder.bounce_step)
                self._finish_fn = jax.jit(builder.finish_state)
            else:
                self._iter_fn = jax.jit(builder)
                # iteration batching: the remote backend costs ~10-30 ms
                # of dispatch latency per step() iteration that async
                # pipelining does not hide (tools/dispatch_probe.py), so
                # fast analytic iterations are dispatch-bound.  Batch k
                # iterations per jit call as k SEQUENTIAL bounce loops
                # (not nested — rule-5 safe).  Bit-identical: RNG keys on
                # (iteration, lane); the probe asserts exact equality.
                # auto: analytic iterations are ~45 ms (batch deep);
                # mesh iterations ~300 ms (k=2 recovers the ~20-60 ms
                # dispatch gap for one extra Pallas-program compile —
                # glassbunny 337 -> 278 ms/iter on a slow-dispatch day)
                k = int(self.opts.iters_per_dispatch) or (
                    8 if self.static.num_tris == 0 else 2
                )
                self._k = max(k, 1)
                if self._k > 1:
                    kk = self._k

                    def _body_k(flat, cam, img, it0, key):
                        rays = jnp.float32(0)
                        depth = jnp.int32(0)
                        for i in range(kk):
                            img, rr, depth = builder(
                                flat, cam, img, it0 + jnp.int32(i), key
                            )
                            rays = rays + rr.astype(jnp.float32)
                        return img, rays, depth

                    self._iter_fn_k = jax.jit(_body_k)
        self.seed = 0
        self.key = rng.base_key(0)
        self.traced_depth = 0  # live depth reached last iteration
        self.cam_position = None  # interactive pan/zoom override (None = scene)
        self.reset()
        self.stats = RenderStats()

    def set_seed(self, seed: int):
        self.seed = int(seed)
        self.key = rng.base_key(self.seed)

    @staticmethod
    def _force(x) -> None:
        """Wait for device work to ACTUALLY finish before reading the clock.

        jax.block_until_ready does not reliably block on this backend
        (CLAUDE.md environment notes); a tiny device→host readback does.
        """
        np.asarray(x[0])

    def _run_iteration(self, cam, iteration):
        """One progressive sample per pixel; returns (img, rays, depth)."""
        it = jnp.int32(iteration)
        if self.devices > 1:
            return self._sharded_step(self.flat, cam, self.img, it, self.key)
        if not self.staged:
            return self._iter_fn(self.flat, cam, self.img, it, self.key)
        state = self._start_fn(self.flat, cam, self.img, it, self.key)
        laps = 0
        for _ in range(self.static.trace_depth + 1):
            state, alive = self._bounce_fn(self.flat, self.key, it, state)
            laps += 1
            if int(alive) == 0:
                break
        return self._finish_fn(state, self.flat), state.rays_traced, laps

    # -- state --------------------------------------------------------------
    def reset(self):
        """Restart accumulation (the reference's camchanged path,
        reference: src/main.cpp:173-201)."""
        if self.devices > 1:
            self.img = self._sh.zeros_image(self.width, self.height, self.mesh)
        else:
            n = self.width * self.height
            self.img = jnp.zeros((n, 3), jnp.float32)
        self.iteration = 0

    def set_orbit(self, theta: float, phi: float):
        """Interactive orbit — rotates the view basis, position unchanged
        (reference: src/main.cpp:255-261 left drag + :173-193 rebuild)."""
        self.camera = derive_camera(
            self.scene.camera, theta=theta, phi=phi, position=self.cam_position
        )
        self.reset()

    def pan(self, dx_px: float, dy_px: float):
        """Middle-drag translate along the ground-projected right/forward
        axes, 0.01 world units per pixel (reference: src/main.cpp:268-281)."""
        fwd = np.array(self.camera.view, np.float64)
        fwd[1] = 0.0
        fwd /= max(np.linalg.norm(fwd), 1e-12)
        right = np.array(self.camera.right, np.float64)
        right[1] = 0.0
        right /= max(np.linalg.norm(right), 1e-12)
        pos = np.array(self.camera.position, np.float64)
        pos -= dx_px * right * 0.01
        pos += dy_px * fwd * 0.01
        self.cam_position = tuple(float(x) for x in pos)
        self.camera = derive_camera(
            self.scene.camera, theta=self.camera.theta, phi=self.camera.phi,
            position=self.cam_position,
        )
        self.reset()

    def zoom(self, dy_frac: float):
        """Right-drag dolly along the view direction.

        The reference tracks `zoom += dy/height` (src/main.cpp:263-266) but
        the code that applies it to the camera position is commented out
        (src/main.cpp:174-190) — right drag only resets accumulation there.
        We implement the evident intent: dolly by the same magnitude.
        """
        pos = np.array(self.camera.position, np.float64)
        pos -= np.array(self.camera.view, np.float64) * dy_frac
        self.cam_position = tuple(float(x) for x in pos)
        self.camera = derive_camera(
            self.scene.camera, theta=self.camera.theta, phi=self.camera.phi,
            position=self.cam_position,
        )
        self.reset()

    def _cam_arrays(self) -> CameraArrays:
        p, v, u, r, pl = self.camera.as_arrays()
        return CameraArrays(
            position=jnp.asarray(p),
            view=jnp.asarray(v),
            up=jnp.asarray(u),
            right=jnp.asarray(r),
            pixel_length=jnp.asarray(pl),
        )

    # -- rendering ----------------------------------------------------------
    def step(self, num_iterations: int = 1) -> RenderStats:
        if self._regen:
            return self._step_regen(num_iterations)
        cam = self._cam_arrays()
        first = self.iteration == 0 and self.stats.compile_seconds == 0.0
        if first:
            t0 = time.perf_counter()
            img, rays, depth = self._run_iteration(cam, self.iteration + 1)
            self.traced_depth = int(depth)
            self._force(img)
            self.img = img
            self.iteration += 1
            self.stats.iterations_done += 1
            # the compile iteration's rays are NOT booked: its wall time
            # goes to compile_seconds, so counting them would inflate
            # mrays_per_sec for short renders
            num_iterations -= 1
            if self._k > 1:
                # compile-only warmup of the k-batched variant (result
                # DISCARDED), so its compile never lands in a timed
                # window and step(n) still advances exactly n iterations
                wimg, _, _ = self._iter_fn_k(
                    self.flat, cam, self.img,
                    jnp.int32(self.iteration + 1), self.key,
                )
                self._force(wimg)
            self.stats.compile_seconds = time.perf_counter() - t0

        t0 = time.perf_counter()
        # accumulate on device in f32 (int32 overflows beyond ~2e9 rays;
        # x64 is disabled on TPU)
        rays_total = jnp.float32(0)
        depth = None
        booked = num_iterations
        while self._k > 1 and num_iterations >= self._k:
            self.img, rays, depth = self._iter_fn_k(
                self.flat, cam, self.img,
                jnp.int32(self.iteration + 1), self.key,
            )
            rays_total = rays_total + rays  # already f32 in-graph
            self.iteration += self._k
            num_iterations -= self._k
        for _ in range(num_iterations):
            self.img, rays, depth = self._run_iteration(cam, self.iteration + 1)
            rays_total = rays_total + rays.astype(jnp.float32)
            self.iteration += 1
        self._force(self.img)
        if depth is not None:
            # live traced depth (reference: src/pathtrace.cu:793-796)
            self.traced_depth = int(depth)
        dt = time.perf_counter() - t0
        self.stats.iterations_done += max(booked, 0)
        self.stats.rays_traced += int(rays_total)
        self.stats.wall_seconds += dt
        if booked > 0:
            self.stats.per_iter_seconds.append(dt / booked)
        return self.stats

    def _step_regen(self, num_iterations: int) -> RenderStats:
        """Progressive sampling through the persistent regeneration pool:
        batches of up to `ray_regen` samples/pixel per dispatch.  The batch
        size `nk` is a TRACED argument, so one compiled executable serves
        every batch size (incl. the 1-sample warmup and any tail
        remainder)."""
        cam = self._cam_arrays()
        first = self.iteration == 0 and self.stats.compile_seconds == 0.0
        if first:
            t0 = time.perf_counter()
            img, rays, depth = self._batch_fn(
                self.flat, cam, self.img, jnp.int32(self.iteration + 1),
                self.key, jnp.int32(1),
            )
            self.traced_depth = int(depth)
            self._force(img)
            self.img = img
            self.iteration += 1
            self.stats.iterations_done += 1
            # compile iteration's rays are NOT booked (see step())
            num_iterations -= 1
            self.stats.compile_seconds = time.perf_counter() - t0

        t0 = time.perf_counter()
        rays_total = jnp.float32(0)
        depth = None
        booked = num_iterations
        while num_iterations > 0:
            nk = min(num_iterations, self._regen)
            self.img, rays, depth = self._batch_fn(
                self.flat, cam, self.img, jnp.int32(self.iteration + 1),
                self.key, jnp.int32(nk),
            )
            rays_total = rays_total + rays.astype(jnp.float32)
            self.iteration += nk
            num_iterations -= nk
        self._force(self.img)
        if depth is not None:
            self.traced_depth = int(depth)
        dt = time.perf_counter() - t0
        self.stats.iterations_done += max(booked, 0)
        self.stats.rays_traced += int(rays_total)
        self.stats.wall_seconds += dt
        if booked > 0:
            self.stats.per_iter_seconds.append(dt / booked)
        return self.stats

    # -- output -------------------------------------------------------------
    def _unswizzle(self, img_lane: np.ndarray) -> np.ndarray:
        if self.devices > 1:
            # row-sharded pool: lanes are already pixel-ordered; drop the
            # mesh-divisibility padding rows
            return img_lane[: self.width * self.height]
        if self.pixel_order is None:
            return img_lane
        out = np.empty_like(img_lane)
        out[self.pixel_order] = img_lane
        return out

    def ldr_image(self) -> np.ndarray:
        """Tonemapped (H, W, 3) float in [0,1], reference display transform
        WITHOUT the save-time X mirror (reference: src/pathtrace.cu:45-50)."""
        avg = self.img / max(self.iteration, 1)
        if self.opts.tonemapping:
            ldr = m.gamma_correction(m.aces_film(avg))
        else:
            ldr = jnp.clip(avg, 0.0, 1.0)
        return self._unswizzle(np.asarray(ldr)).reshape(self.height, self.width, 3)

    def save_png(self, path: str | Path, mirror_x: bool = True):
        """reference: src/main.cpp:146-170 saveImage (X-mirrored)."""
        img = self.ldr_image()
        if mirror_x:
            img = img[:, ::-1]
        write_png(path, img)

    def save_hdr(self, path: str | Path, mirror_x: bool = True):
        avg = self._unswizzle(
            np.asarray(self.img / max(self.iteration, 1))
        ).reshape(self.height, self.width, 3)
        if mirror_x:
            avg = avg[:, ::-1]
        write_hdr(path, avg)

    # -- checkpoint/resume ---------------------------------------------------
    def save_checkpoint(self, path: str | Path):
        path = Path(path)
        np.savez_compressed(
            path,
            img=np.asarray(self.img),
            iteration=self.iteration,
            theta=self.camera.theta,
            phi=self.camera.phi,
            meta=json.dumps(
                {
                    "scene": str(self.scene.path),
                    "width": self.width,
                    "height": self.height,
                    "mode": int(self.opts.sample_mode),
                    "seed": self.seed,
                    # the accumulator is LANE-ordered; loading under a
                    # different pixel mapping would scramble the image
                    "swizzled": self.pixel_order is not None,
                    # sharded accumulators carry mesh-padding rows
                    "devices": self.devices,
                }
            ),
        )

    def load_checkpoint(self, path: str | Path):
        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        if (meta["width"], meta["height"]) != (self.width, self.height):
            raise ValueError("checkpoint resolution mismatch")
        if meta.get("swizzled", False) != (self.pixel_order is not None):
            raise ValueError(
                "checkpoint pixel-order mismatch (saved with a different "
                "swizzle setting)"
            )
        # resuming with a different estimator or RNG stream would silently
        # blend two different sequences into one accumulator
        if "mode" in meta and meta["mode"] != int(self.opts.sample_mode):
            raise ValueError(
                f"checkpoint sample-mode mismatch (saved mode {meta['mode']}, "
                f"current {int(self.opts.sample_mode)})"
            )
        if "seed" in meta and int(meta["seed"]) != self.seed:
            raise ValueError(
                f"checkpoint RNG-seed mismatch (saved seed {meta['seed']}, "
                f"current {self.seed})"
            )
        if int(meta.get("devices", 1)) != self.devices:
            raise ValueError(
                f"checkpoint device-count mismatch (saved {meta.get('devices', 1)}, "
                f"current {self.devices}) — the lane padding differs"
            )
        if self.devices > 1:
            self.img = jax.device_put(jnp.asarray(data["img"]), self._img_sharding)
        else:
            self.img = jnp.asarray(data["img"])
        self.iteration = int(data["iteration"])
        self.camera = derive_camera(
            self.scene.camera, theta=float(data["theta"]), phi=float(data["phi"])
        )


def render_scene(
    scene_path: str | Path,
    spp: int | None = None,
    mode: SampleMode = SampleMode.BSDF,
    resolution: tuple[int, int] | None = None,
    trace_depth: int | None = None,
    out: str | Path | None = None,
    opts: RenderOptions | None = None,
) -> tuple[Renderer, RenderStats]:
    """One-call headless render (the CLI's core)."""
    opts = (opts or RenderOptions()).with_mode(mode)
    r = Renderer(scene_path, opts=opts, resolution=resolution, trace_depth=trace_depth)
    n = spp if spp is not None else r.static.iterations
    stats = r.step(n)
    if out is not None:
        r.save_png(out)
    return r, stats
