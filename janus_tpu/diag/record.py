"""Fixed-capacity per-step playback buffers (the DynTe role)."""

from __future__ import annotations

import jax.numpy as jnp

DYN_FIELDS = ("t", "h", "err", "niter", "accepted")


def init_dyn(m: int, capacity: int, dtype, dim: int = 0):
    """Ring buffers [M, K]; NaN-padded (reference pads inactive with NaN).
    With dim > 0 the accepted STATE is stored too ([M, K, D] — the
    reference's solout/Refine output-buffer role)."""
    if capacity <= 0:
        return None
    out = {
        "t": jnp.full((m, capacity), jnp.nan, dtype),
        "h": jnp.full((m, capacity), jnp.nan, dtype),
        "err": jnp.full((m, capacity), jnp.nan, dtype),
        "niter": jnp.zeros((m, capacity), jnp.int32),
        "accepted": jnp.zeros((m, capacity), bool),
        "idx": jnp.zeros((m,), jnp.int32),
    }
    if dim:
        out["y"] = jnp.full((m, capacity, dim), jnp.nan, dtype)
    return out


def record_step(dyn, attempted, t, h, err, niter, accepted, y=None):
    """Write one step-attempt record for every lane in ``attempted``; the
    write index advances per lane, capped at capacity−1 (last slot keeps the
    final attempt if the budget is exceeded)."""
    if dyn is None:
        return None
    m, cap = dyn["t"].shape
    idx = jnp.minimum(dyn["idx"], cap - 1)
    rows = jnp.arange(m)

    def put(buf, val):
        new = buf.at[rows, idx].set(val)
        mask = attempted.reshape((m,) + (1,) * (buf.ndim - 1))
        return jnp.where(mask, new, buf)

    out = {
        "t": put(dyn["t"], t),
        "h": put(dyn["h"], h),
        "err": put(dyn["err"], err),
        "niter": put(dyn["niter"], niter),
        "accepted": put(dyn["accepted"], accepted),
        "idx": dyn["idx"] + attempted.astype(jnp.int32),
    }
    if "y" in dyn:
        out["y"] = put(dyn["y"], y) if y is not None else dyn["y"]
    return out
