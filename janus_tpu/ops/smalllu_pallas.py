"""Fused batched small-matrix LU in Pallas (pivot-free, SoA layout).

One grid step processes a TILE_M-wide slab of trajectories held in VMEM:
factorization + substitution happen entirely on-chip, so the D² temporaries
of the elimination never round-trip HBM (the jnp path emits one fused kernel
per elimination step). Inputs/outputs are transposed: a_t [D·D, M] (row-major
matrix entries), b_t [D, M].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:                                      # pragma: no cover
    _HAVE_PALLAS = False

TILE_M = 512


def pallas_available() -> bool:
    return _HAVE_PALLAS


def _make_kernel(d: int):
    def kernel(a_ref, b_ref, x_ref):
        a = [[a_ref[i * d + j, :] for j in range(d)] for i in range(d)]
        b = [b_ref[i, :] for i in range(d)]
        for k in range(d):
            inv = 1.0 / a[k][k]
            for i in range(k + 1, d):
                m = a[i][k] * inv
                for j in range(k + 1, d):
                    a[i][j] = a[i][j] - m * a[k][j]
                b[i] = b[i] - m * b[k]
        xs = [None] * d
        for i in reversed(range(d)):
            acc = b[i]
            for j in range(i + 1, d):
                acc = acc - a[i][j] * xs[j]
            xs[i] = acc / a[i][i]
        for i in range(d):
            x_ref[i, :] = xs[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile_m"))
def linsolve_fused(a_t, b_t, interpret: bool = False, tile_m: int = None):
    """Solve A x = b for a batch in SoA layout.

    a_t : [D·D, M] (row-major entries of each A), b_t : [D, M] → x_t [D, M].
    Pivot-free (intended for the diagonally dominant stiff iteration
    matrices); pad M to a multiple of TILE_M outside for best performance.
    """
    dd, m = a_t.shape
    d = int(round(dd ** 0.5))
    assert d * d == dd
    tile = min(tile_m or TILE_M, m)
    grid = (pl.cdiv(m, tile),)
    kernel = _make_kernel(d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d, m), a_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((dd, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_t, b_t)


def lu_factor_t(a_t, interpret: bool = False):
    """Factor only (packed L\\U in SoA layout [D·D, M]); pivot-free."""
    dd, m = a_t.shape
    d = int(round(dd ** 0.5))
    tile = min(TILE_M, m)

    def kernel(a_ref, lu_ref):
        a = [[a_ref[i * d + j, :] for j in range(d)] for i in range(d)]
        for k in range(d):
            inv = 1.0 / a[k][k]
            for i in range(k + 1, d):
                mlt = a[i][k] * inv
                a[i][k] = mlt
                for j in range(k + 1, d):
                    a[i][j] = a[i][j] - mlt * a[k][j]
        for i in range(d):
            for j in range(d):
                lu_ref[i * d + j, :] = a[i][j]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dd, m), a_t.dtype),
        grid=(pl.cdiv(m, tile),),
        in_specs=[pl.BlockSpec((dd, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((dd, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_t)


def lu_solve_t(lu_t, b_t, interpret: bool = False):
    """Substitution with packed SoA factors: lu_t [D·D, M], b_t [D, M]."""
    dd, m = lu_t.shape
    d = int(round(dd ** 0.5))
    tile = min(TILE_M, m)

    def kernel(lu_ref, b_ref, x_ref):
        a = [[lu_ref[i * d + j, :] for j in range(d)] for i in range(d)]
        b = [b_ref[i, :] for i in range(d)]
        for i in range(1, d):
            for j in range(i):
                b[i] = b[i] - a[i][j] * b[j]
        xs = [None] * d
        for i in reversed(range(d)):
            acc = b[i]
            for j in range(i + 1, d):
                acc = acc - a[i][j] * xs[j]
            xs[i] = acc / a[i][i]
        for i in range(d):
            x_ref[i, :] = xs[i]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d, m), b_t.dtype),
        grid=(pl.cdiv(m, tile),),
        in_specs=[pl.BlockSpec((dd, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lu_t, b_t)
