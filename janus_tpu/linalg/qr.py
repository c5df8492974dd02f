"""Batched QR solve — the robustness fallback the reference keeps alive.

The reference computes BOTH LU and QR stage solves side by side
(src/cpp/radaute_impl.hpp:1558-1573, 1691-1702) as a guard against LU
instability. Here: unrolled batched Householder QR for small static D, same
gather-free discipline as linalg.smalllu — use when a problem defeats partial
pivoting (extreme scaling, near-singular iteration matrices).
"""

from __future__ import annotations

import jax.numpy as jnp


def qr_factor(a):
    """Batched Householder QR: a [..., D, D] → (vs, r).

    vs: list-packed Householder vectors as one array [..., D, D] (column k
    holds v_k, zero above the diagonal); r [..., D, D] upper triangular.
    """
    d = a.shape[-1]
    r = a
    rows = jnp.arange(d)
    vs = jnp.zeros_like(a)
    for k in range(d):
        x = jnp.where(rows >= k, r[..., :, k], 0.0)
        normx = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        e_k = (rows == k).astype(a.dtype)
        sign = jnp.where(r[..., k:k + 1, k] >= 0, 1.0, -1.0)
        v = x + sign * normx * e_k
        vnorm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = v / jnp.where(vnorm == 0.0, 1.0, vnorm)
        # r <- (I − 2 v vᵀ) r
        vtr = jnp.einsum("...i,...ij->...j", v, r)
        r = r - 2.0 * v[..., :, None] * vtr[..., None, :]
        vs = vs.at[..., :, k].set(v)
    return vs, r


def qr_solve(vs, r, b):
    """Solve with Householder factors. b [..., D] → x [..., D]."""
    d = r.shape[-1]
    y = b
    for k in range(d):
        v = vs[..., :, k]
        vty = jnp.sum(v * y, axis=-1, keepdims=True)
        y = y - 2.0 * v * vty
    xs = [None] * d
    for i in reversed(range(d)):
        acc = y[..., i]
        for j in range(i + 1, d):
            acc = acc - r[..., i, j] * xs[j]
        diag = r[..., i, i]
        xs[i] = acc / jnp.where(diag == 0.0, 1.0, diag)
    return jnp.stack(xs, axis=-1)


def qr_linsolve(a, b):
    """x = A⁻¹b via batched Householder QR (LU fallback path)."""
    vs, r = qr_factor(a)
    return qr_solve(vs, r, b)
