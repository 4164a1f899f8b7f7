"""Expert parallelism: shard the MoE conformer's expert axis.

The MoE FFN (models/moe.py) stacks its expert weights on dim 0 —
``w1 (E, D, F)``, ``b1 (E, F)``, ``w2 (E, F, D)``, ``b2 (E, D)`` — and
contracts its einsums over token/feature dims only, so placing those
leaves ``P(axis)`` over a mesh axis makes XLA partition every expert
computation (and the (E, C, D) dispatch buffers of the capacity path)
across the axis's devices, inserting the all-to-all-style collectives
itself (the scaling-book recipe: annotate shardings, let XLA insert
collectives — the same zero-hand-written-collectives design as dp/tp
in mesh.py).  The router (``wg``) and everything else stay replicated.

The rule is PATH-based (a leaf is expert-stacked iff it sits under a
MoE ``ffn2`` with an EP key name and a leading dim of E), so the same
function places a bare param tree, an EMA tree, or a whole
``TrainState`` including the optimizer state (optax's Adam moments
mirror the param tree paths) — which is exactly what the trainer needs
(``SN_kwargs['expert_parallel']=K``): expert weights AND their
optimizer moments live sharded, so per-expert memory and update
compute scale 1/K with the mesh axis.

The reference has no expert-parallel (or any sparse-expert) story;
PARITY §2.9 tracks this row as a TPU-native extension.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# expert-stacked leaves of a MoE ffn2 (models/moe.py::init_moe_ffn)
_EP_KEYS = {"w1", "b1", "w2", "b2"}


def _is_expert_leaf(path: tuple, leaf: Any, n_experts: int) -> bool:
    keys = [
        p.key for p in path if isinstance(p, jax.tree_util.DictKey)
    ]
    return (
        "ffn2" in keys
        and bool(keys)
        and keys[-1] in _EP_KEYS
        and hasattr(leaf, "ndim")
        and leaf.ndim >= 1
        and leaf.shape[0] == n_experts
    )


def ep_spec(path: tuple, leaf: Any, n_experts: int, axis: str) -> P:
    """PartitionSpec for one leaf: experts sharded on dim 0, else
    replicated."""
    if _is_expert_leaf(path, leaf, n_experts):
        return P(axis)
    return P()


def shard_params_ep(
    tree: Any, mesh: Mesh, n_experts: int, axis: str = "model"
) -> Any:
    """Place any params-shaped pytree (param tree, EMA, TrainState with
    optimizer state, ...) with expert-parallel shardings: expert-stacked
    MoE leaves sharded on their leading (expert) axis over ``axis``,
    everything else replicated."""
    if n_experts % mesh.shape[axis]:
        raise ValueError(
            f"moe_experts={n_experts} must divide evenly over "
            f"mesh axis {axis!r} of size {mesh.shape[axis]}"
        )
    if jax.process_count() > 1:
        # ep × distributed: the mesh spans hosts, so leaves are built
        # from each process's addressable shards with the SAME per-leaf
        # specs (multihost.make_global)
        from .multihost import make_global

        return make_global(
            tree, mesh,
            spec_fn=lambda path, leaf: ep_spec(path, leaf, n_experts, axis),
        )
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    placed = [
        jax.device_put(
            leaf,
            NamedSharding(mesh, ep_spec(path, leaf, n_experts, axis)),
        )
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)
