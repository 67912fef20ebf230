"""Tensor-parallel parameter sharding over the mesh `model` axis.

The reference's nets are ResNet-18-scale, so DP dominates and TP defaults
off (SURVEY.md §2.3: "keep available, off by default") — but the capability
is first-class: conv/dense kernels get their output-channel dimension
sharded over `model`, and GSPMD propagates the sharding through the forward
and backward passes (channel-split convs, all-reduces where activations
re-join). No model code changes: this is purely a placement decision on the
parameter pytree.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_shardings(
    params, mesh: Mesh, axis: str = "model", min_elems: int = 1 << 14
):
    """Sharding pytree for a parameter tree: kernels with a last (output
    channel) dimension divisible by the mesh axis and at least `min_elems`
    elements are sharded over that dim; everything else is replicated.

    Works for flax Conv kernels (H, W, Cin, Cout) and Dense (Cin, Cout).
    """
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def spec_of(leaf):
        shape = np.shape(leaf)
        if (
            len(shape) >= 2
            and shape[-1] % n == 0
            and int(np.prod(shape)) >= min_elems
        ):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1) + [axis])))
        return repl

    return jax.tree_util.tree_map(spec_of, params)


def shard_params_tp(params, mesh: Mesh, axis: str = "model", **kw):
    """Place a parameter pytree with TP shardings (see tp_param_shardings)."""
    shardings = tp_param_shardings(params, mesh, axis=axis, **kw)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
