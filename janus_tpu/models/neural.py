"""Neural-network Hamiltonians (the reference's L4 DeltaNet-MLP role,
examples/python/sssc_dnn_vdp_model.py:54-62 — a 2×32 tanh MLP).

Plain-pytree MLP so it shards trivially: params are a dict of arrays; the
hidden dimension is the natural tensor-parallel axis (see janus_tpu.parallel).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32):
    """sizes = [in, hidden..., out]; returns {'w': [...], 'b': [...]} pytree."""
    ws, bs = [], []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, (n_in, n_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        scale = jnp.sqrt(2.0 / n_in).astype(dtype)
        ws.append(jax.random.normal(k, (n_in, n_out), dtype) * scale)
        bs.append(jnp.zeros((n_out,), dtype))
    return {"w": ws, "b": bs}


def mlp_apply(params, x, activation=jnp.tanh):
    h = x
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        h = h @ w + b
        if i < n - 1:
            h = activation(h)
    return h


def nn_hamiltonian(params):
    """Scalar H(x, p, args) from an MLP over the concatenated phase point.

    Per-sample signature (vmapped by ham.hamiltonian_dynamics): x, p are [D/2]
    vectors, output a scalar.
    """

    def ham(x, p, args):
        z = jnp.concatenate([x, p])
        return jnp.sum(mlp_apply(params, z))

    return ham
