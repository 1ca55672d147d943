"""Counter-based RNG for the wavefront integrator.

The reference hash-seeds a thrust engine per (iter, index, depth)
(reference: src/pathtrace.cu:25-29 makeSeededRandomEngine,
src/intersections.h:12-20 utilhash).  On TPU we use JAX's counter-based
threefry keyed on (iteration, bounce, stage): bitwise-reproducible across
runs and shardings, with no per-thread engine state.  Parity with the
reference is statistical (RMSE at equal spp), not bitwise — see SURVEY.md §7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stage ids — one independent stream per consumer per bounce.
STAGE_CAMERA = 0
STAGE_SCATTER = 1
STAGE_LIGHT = 2


def base_key(seed: int = 0) -> jax.Array:
    return jax.random.PRNGKey(seed)


def stream(key: jax.Array, iteration, depth, stage: int) -> jax.Array:
    """Derive the (iteration, bounce, stage) stream key."""
    k = jax.random.fold_in(key, iteration)
    k = jax.random.fold_in(k, depth)
    return jax.random.fold_in(k, stage)


def uniforms(key: jax.Array, iteration, depth, stage: int, shape) -> jax.Array:
    """U[0,1) block for one wavefront stage."""
    return jax.random.uniform(stream(key, iteration, depth, stage), shape, jnp.float32)
