"""Parameter sharding rules for tensor parallelism.

The reference has no TP (SURVEY.md §2.5 — single GPU). Here the encoder can
be tensor-parallel over the mesh `model` axis: attention Q/K/V and the MLP
up-projection shard their *output* features, the attention output and MLP
down-projection shard their *input* features, so each layer needs exactly
one all-reduce per block pair — the standard Megatron layout, expressed as
sharding annotations that XLA lowers to ICI collectives.

Rules are path-based so the Flax module stays mesh-agnostic. Anything not
matched is replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import AXIS_MODEL

# encoder names + decoder names (q/k/v/gate/up shard output features;
# o_proj/down_proj shard input features → one all-reduce per block pair)
_COL = ("query", "key", "value", "intermediate",
        "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW = ("output", "mlp_output", "o_proj", "down_proj")


def param_spec(path: tuple[str, ...]) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if parent in _COL:
        if leaf == "kernel":
            return P(None, AXIS_MODEL)
        if leaf == "bias":
            return P(AXIS_MODEL)
    if parent in _ROW and leaf == "kernel":
        return P(AXIS_MODEL, None)
    return P()


def shard_params(params, mesh: Mesh):
    """Device-put a param tree with TP shardings over `mesh`."""

    def _put(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(path)))

    return jax.tree_util.tree_map_with_path(_put, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding tree (for pjit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, param_spec(path)), params
    )
