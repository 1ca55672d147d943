"""Piecewise-constant 1D/2D distributions (PBRT style).

Parity with the reference's Distribution1D / DevDistribution1D
(reference: src/distribution1D.cpp:3-171, header src/distribution1D.h) —
prefix-sum CDF with degenerate→uniform fallback, binary-search
sampleContinuous / sampleDiscrete — plus the 2D product distribution the
reference stubbed out (src/distribution2D.cpp is empty; the env-map CDF it
builds is never sampled, README.md:25-27 TODO).  Here both are first-class:
host-side construction in numpy, device-side sampling as vectorized jnp
searchsorted (no binary-search loops per thread).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class Distribution1D:
    """Host-side piecewise-constant distribution over [0, 1)."""

    def __init__(self, func: np.ndarray):
        func = np.asarray(func, np.float64).reshape(-1)
        n = func.shape[0]
        self.func = func.astype(np.float32)
        cdf = np.zeros(n + 1, np.float64)
        np.cumsum(func / n, out=cdf[1:])
        self.func_int = float(cdf[-1])
        if self.func_int == 0.0:
            # degenerate → uniform (reference: distribution1D.cpp:24-31)
            cdf = np.linspace(0.0, 1.0, n + 1)
        else:
            cdf = cdf / self.func_int
        self.cdf = cdf.astype(np.float32)

    @property
    def count(self) -> int:
        return self.func.shape[0]

    def sample_continuous(self, u):
        """Returns (x in [0,1), pdf) — vectorized over u."""
        u = jnp.asarray(u)
        cdf = jnp.asarray(self.cdf)
        func = jnp.asarray(self.func)
        n = self.count
        idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
        c0 = cdf[idx]
        c1 = cdf[idx + 1]
        du = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-38), 0.0)
        pdf = jnp.where(
            self.func_int > 0, func[idx] / max(self.func_int, 1e-38), 1.0
        )
        return (idx.astype(jnp.float32) + du) / n, pdf

    def sample_discrete(self, u):
        """Returns (index, pmf) — vectorized over u."""
        u = jnp.asarray(u)
        cdf = jnp.asarray(self.cdf)
        func = jnp.asarray(self.func)
        n = self.count
        idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
        pmf = jnp.where(
            self.func_int > 0,
            func[idx] / jnp.maximum(self.func_int * n, 1e-38),
            1.0 / n,
        )
        return idx, pmf


class Distribution2D:
    """Product distribution over an (H, W) grid: marginal rows × conditional
    columns.  Used for HDR environment-map importance sampling."""

    def __init__(self, func: np.ndarray):
        func = np.asarray(func, np.float64)
        h, w = func.shape
        self.shape = (h, w)
        row_int = func.sum(axis=1) / w
        self.marginal = Distribution1D(row_int)
        cond_cdf = np.zeros((h, w + 1), np.float64)
        np.cumsum(func / w, axis=1, out=cond_cdf[:, 1:])
        self.row_int = np.maximum(row_int, 0.0)
        safe = np.where(row_int > 0, row_int, 1.0)
        cond_cdf = cond_cdf / safe[:, None]
        cond_cdf[row_int <= 0] = np.linspace(0, 1, w + 1)
        self.cond_cdf = cond_cdf.astype(np.float32)
        self.func = func.astype(np.float32)
        self.func_int = float(row_int.mean())

    def sample(self, u1, u2):
        """Returns ((u, v) in [0,1)², pdf) — vectorized."""
        v, pdf_m = self.marginal.sample_continuous(u2)
        h, w = self.shape
        row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        cond = jnp.asarray(self.cond_cdf)[row]  # (N, W+1)
        u1 = jnp.asarray(u1)
        idx = jnp.clip(
            jax_searchsorted_rows(cond, u1) - 1, 0, w - 1
        )
        c0 = jnp.take_along_axis(cond, idx[:, None], axis=1)[:, 0]
        c1 = jnp.take_along_axis(cond, idx[:, None] + 1, axis=1)[:, 0]
        du = jnp.where(c1 > c0, (u1 - c0) / jnp.maximum(c1 - c0, 1e-38), 0.0)
        uu = (idx.astype(jnp.float32) + du) / w
        func = jnp.asarray(self.func)
        row_int = jnp.asarray(np.maximum(self.row_int, 1e-38).astype(np.float32))
        pdf_c = func[row, idx] / row_int[row]
        return uu, v, pdf_m * pdf_c

    def pdf(self, u, v):
        """Joint pdf at (u, v) — vectorized."""
        h, w = self.shape
        row = jnp.clip((jnp.asarray(v) * h).astype(jnp.int32), 0, h - 1)
        col = jnp.clip((jnp.asarray(u) * w).astype(jnp.int32), 0, w - 1)
        func = jnp.asarray(self.func)
        if self.func_int <= 0:
            return jnp.ones_like(jnp.asarray(u))
        return func[row, col] / self.func_int


def jax_searchsorted_rows(cdf_rows, u):
    """Per-row searchsorted: cdf_rows (N, K+1) monotone, u (N,)."""
    return jnp.sum((cdf_rows <= u[:, None]).astype(jnp.int32), axis=1)
