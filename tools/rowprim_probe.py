"""Probe the Mosaic primitives a per-row-stack traversal kernel needs:

  P1: build an (8,128) operand from 8 dynamic-sublane VMEM row reads
  P2: lane-broadcast an (8,1) static slice to (8,128)
  P3: per-row (sublane) lane-reduction -> pack bits -> read back as
      scalars via a VMEM bounce buffer

Each runs in a timed fori_loop so per-lap cost is measurable.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/rowprim_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.utils import jaxcache

jaxcache.enable()

M, LAPS = 1024, 2000


def kernel(tab_ref, rays_ref, out_ref, idx_ref, bounce_ref):
    rays = rays_ref[:]  # (8, 128)

    def lap(i, acc):
        # 8 "node ids" vary per lap (scalar arithmetic stand-in for stacks)
        rows = []
        for r in range(8):
            nid = jax.lax.rem(i * 8 + r * 37, M)
            rows.append(tab_ref[pl.ds(nid, 1), :])  # (1,128) dynamic sublane
        tab8 = jnp.concatenate(rows, axis=0)  # P1: (8,128)

        hit_bits = jnp.zeros((8, 1), jnp.int32)
        for c in range(8):
            lo = jnp.broadcast_to(tab8[:, c : c + 1], (8, 128))     # P2
            hi = jnp.broadcast_to(tab8[:, 64 + c : 65 + c], (8, 128))
            active = (rays > lo) & (rays < hi)
            anyc = jnp.any(active, axis=1, keepdims=True)           # P3a
            hit_bits = hit_bits + (anyc.astype(jnp.int32) << c)
        bounce_ref[:, :] = jnp.broadcast_to(hit_bits, (8, 128))     # P3b
        s = jnp.int32(0)
        for r in range(8):
            s = s + bounce_ref[r, 0]                                # P3c scalar
        return acc + jnp.sum(tab8) + s.astype(jnp.float32)

    out_ref[0, 0] = jax.lax.fori_loop(0, LAPS, lap, jnp.float32(0))


@jax.jit
def run(tab, rays):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((8,), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
        ],
    )(tab, rays)


rng = np.random.default_rng(0)
tab = jnp.asarray(rng.random((M, 128), dtype=np.float32))
rays = jnp.asarray(rng.random((8, 128), dtype=np.float32))

out = run(tab, rays)
print("compile ok, result", float(np.asarray(out)[0, 0]), flush=True)
t0 = time.perf_counter()
out = run(tab, rays)
np.asarray(out)
dt = time.perf_counter() - t0
print(f"{LAPS} laps: {dt*1e3:.2f} ms -> {dt/LAPS*1e9:.0f} ns/lap "
      f"(8 row-reads + 8x2 bcasts + 8 reduces + scalar readback)")
