"""Pipeline parallelism for the conformer block stack.

Completes the parallelism matrix (dp: `mesh.py`, tp: `shard_params_tp`,
sp: `sequence.py`, pp: here).  The conformer's blocks are HOMOGENEOUS
(B, T, D) → (B, T, D) maps with different weights
(`models.conformer.apply_block`), which makes a GPipe-style ring
natural on TPU:

* block weights are stacked on a leading axis and sharded one stage per
  device over the ``pp`` mesh axis — each chip holds only its stage's
  parameters (the memory win pipeline parallelism exists for);
* the batch splits into M microbatches; at every tick each device
  applies its stage to its current microbatch and ``ppermute``\\ s the
  activation to its right neighbor (one ICI hop per tick, the classic
  pipeline ring);
* after ``M + S − 1`` ticks every microbatch has passed through all S
  stages; the last stage's outputs are ``psum``-broadcast back (they
  are zero elsewhere, so the sum IS the result).

The fill/drain bubble costs ``(S−1)/(M+S−1)`` of the ticks, amortized by
more microbatches — standard GPipe arithmetic; the schedule is unrolled
statically (microbatch counts are small).

Outputs equal the unsharded ``conformer_encode`` — the same ops run in
the same order per microbatch (tested on the 8-device CPU mesh, f32 and
bf16, ragged lengths; off-TPU the comparison allows CPU-threading
reduction-order noise).

**dp × pp** (the standard 2-D pipeline deployment shape): when the mesh
carries a ``data`` axis alongside the pipeline axis, each microbatch's
batch dim is additionally sharded over ``data`` — every (data, pp)
device holds one stage's weights and 1/n_data of every microbatch.  The
ring collectives stay on the ``pp`` axis; the gradient all-reduce over
``data`` falls out of shard_map AD (stage weights are replicated over
``data``, so their cotangents psum over it automatically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.conformer import ConformerConfig, apply_block


def stack_block_params(params: dict, n_stages: int):
    """params['blocks'] (list of per-block dicts) → one pytree with
    leading (n_stages, blocks_per_stage) axes, ready to shard one stage
    per device."""
    blocks = params["blocks"]
    if len(blocks) % n_stages:
        raise ValueError(
            f"{len(blocks)} blocks do not split into {n_stages} stages"
        )
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    return jax.tree.map(
        lambda a: a.reshape(n_stages, -1, *a.shape[1:]), stacked
    )


def _stacked_spec(path, leaf, config, axis, ep_axis):
    """PartitionSpec for one STACKED block leaf: stage axis on dim 0;
    under ep×pp the expert-stacked MoE leaves (dims (S, blocks/stage,
    E, ...)) additionally shard their expert dim over ``ep_axis``."""
    if ep_axis is not None:
        keys = [
            p.key for p in path if isinstance(p, jax.tree_util.DictKey)
        ]
        from .expert import _EP_KEYS

        if (
            "ffn2" in keys
            and keys
            and keys[-1] in _EP_KEYS
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 3
            and leaf.shape[2] == config.moe_experts
        ):
            return P(axis, None, ep_axis)
    return P(axis)


def _stacked_placement_spec(path, leaf, config, axis, ep_axis, tp_axis, n_tp):
    """Placement spec for one stacked leaf: the manual ``_stacked_spec``
    part plus — under tp × pp — the tensor-parallel output-dim sharding
    on the AUTO ``tp_axis``.  The rule mirrors
    ``parallel/mesh.py::_tp_spec`` on the unstacked leaf (2-D+ kernels,
    wide last dim), shifted by the two stacking dims, so the stacked
    leaves agree leaf-for-leaf with the resting params'
    ``shard_params_tp`` placement (no resharding copies under jit)."""
    base = _stacked_spec(path, leaf, config, axis, ep_axis)
    if (
        tp_axis is None
        or not hasattr(leaf, "ndim")
        or leaf.ndim < 4  # (S, blocks/stage, in, out) at least
        or base != P(axis)
        or leaf.shape[-1] % n_tp
        or leaf.shape[-1] < 4 * n_tp
    ):
        return base
    return P(axis, *([None] * (leaf.ndim - 2)), tp_axis)


def pipeline_conformer_encode(
    params: dict,
    config: ConformerConfig,
    xs: jax.Array,  # (B, T, in_dim) — already downsampled features
    mesh: Mesh,
    axis: str = "pp",
    microbatches: int | None = None,
    lengths: jax.Array | None = None,
    compute_dtype=jnp.float32,
    stacked_params=None,
    return_aux: bool = False,
    ep_axis: str | None = None,
    tp_axis: str | None = None,
):
    """Encode with the block stack pipelined over ``mesh[axis]``.

    ``microbatches`` defaults to the stage count (a full pipe).  The
    batch must divide evenly into microbatches.  Returns the (B, T, D)
    encoder output, replicated (same values as ``conformer_encode``).

    ``return_aux=True`` (MoE conformer) additionally returns the
    weighted router aux loss, equal to the unsharded one: each stage
    accumulates its own blocks' additive router statistics over its
    REAL ticks only (fill/drain ticks process garbage activations and
    are masked out), the per-block losses are computed stage-locally
    from the full-batch sums, and one ``psum`` over the ring averages
    them.  Both MoE paths compose — capacity dispatch groups never
    cross batch rows (models/moe.py), so microbatching leaves every
    group's population (and therefore its drops) unchanged.

    Repeated calls should pass ``stacked_params`` — the output of
    :func:`stack_block_params` placed with ``NamedSharding(mesh,
    P(axis))`` — so each chip keeps only its stage's weights resident;
    without it, every call re-stacks and re-shards the full parameter
    set (fine for a one-off, wasteful per batch).

    ``ep_axis`` (MoE conformer): expert parallelism composed with the
    pipeline — the stacked expert leaves additionally shard their
    expert dim over ``mesh[ep_axis]``, each (stage, expert-shard)
    device runs its E/K experts, and the combine's partial outputs
    psum over ``ep_axis`` inside every block (models/moe.py::
    _moe_nodrop; the capacity path slices its dispatch/combine
    one-hots by expert the same way — microbatches keep whole rows,
    so dispatch groups are intact and no alignment condition applies).
    The replicated router keeps the statistics identical along
    ``ep_axis``.

    ``tp_axis`` (tp × pp): the stacked stage weights' wide OUTPUT dims
    additionally shard over ``mesh[tp_axis]``, which is left in GSPMD
    **auto** mode (``jax.shard_map``'s ``axis_names`` excludes it) —
    the ring and its psums stay manual on ``axis`` while GSPMD inserts
    the tensor-parallel contractions' collectives inside each stage's
    blocks.  Gradients come back with the same specs, so the resting
    params / EMA / Adam moments stay tp-sharded
    (``parallel/mesh.py::shard_params_tp``).  Mutually exclusive with
    ``ep_axis`` (both would claim the same weight matrices).
    """
    if tp_axis is not None and ep_axis is not None:
        raise ValueError("tp_axis and ep_axis are mutually exclusive")
    if ep_axis is not None and not config.moe_experts:
        raise ValueError("ep_axis requires a MoE conformer (moe_experts)")
    S = mesh.shape[axis]
    M = microbatches or S
    B, T, _ = xs.shape
    n_tp = mesh.shape[tp_axis] if tp_axis is not None else 1
    if stacked_params is None:
        stacked = stack_block_params(params, S)  # validates the split
        stacked_params = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(
                leaf,
                NamedSharding(
                    mesh,
                    _stacked_placement_spec(
                        path, leaf, config, axis, ep_axis, tp_axis, n_tp
                    ),
                ),
            ),
            stacked,
        )
    if B % M:
        raise ValueError(f"batch {B} does not split into {M} microbatches")
    b = B // M
    # dp × pp: a 'data' mesh axis shards each microbatch's batch dim
    data_axis = (
        "data"
        if "data" in mesh.axis_names and mesh.shape["data"] > 1
        else None
    )
    if data_axis and b % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch size {b} does not shard over "
            f"data axis of {mesh.shape[data_axis]} devices"
        )
    cd = compute_dtype
    blocks_per_stage = config.num_blocks // S

    # in_proj runs outside the pipe (it is not a block; cheap and
    # replicated)
    x = (
        jnp.dot(xs.astype(cd), params["in_proj"]["w"].astype(cd))
        + params["in_proj"]["b"].astype(cd)
    )
    D = x.shape[-1]
    x_mb = x.reshape(M, b, T, D)
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    len_mb = lengths.reshape(M, b)
    positions = jnp.arange(T)

    moe = bool(config.moe_experts) and return_aux

    def body(stage_blocks, x_mb, len_mb):
        from ..models.moe import aux_from_stats, zero_stats

        stage_blocks = jax.tree.map(lambda a: a[0], stage_blocks)
        s = jax.lax.axis_index(axis)
        is_first = s == 0
        is_last = s == S - 1
        b_loc = x_mb.shape[1]  # per-device batch rows (b / n_data)
        act = jnp.zeros((b_loc, T, D), x_mb.dtype)  # activation in flight
        act_len = jnp.zeros((b_loc,), jnp.int32)
        outbuf = jnp.zeros((M, b_loc, T, D), x_mb.dtype)
        stats_acc = [
            zero_stats(config.moe_experts) for _ in range(blocks_per_stage)
        ] if moe else None
        perm = [(i, i + 1) for i in range(S - 1)]
        for t in range(M + S - 1):
            mb = min(t, M - 1)  # stage 0 consumes microbatch t
            y = jnp.where(is_first, x_mb[mb], act)
            y_len = jnp.where(is_first, len_mb[mb], act_len)
            for j in range(blocks_per_stage):
                blk = jax.tree.map(lambda a: a[j], stage_blocks)
                y, _, stats = apply_block(
                    blk, y, config, y_len, positions, cd,
                    ep_axis=ep_axis,
                )
                if moe and stats is not None:
                    # this stage's REAL microbatch at tick t is t−s;
                    # fill/drain ticks (outside [0, M)) carry garbage
                    # activations and must not pollute the statistics
                    real = (t >= s) & (t - s < M)
                    stats_acc[j] = jax.tree.map(
                        lambda acc, v: acc + jnp.where(real, v, 0.0),
                        stats_acc[j], stats,
                    )
            out_idx = t - (S - 1)  # microbatch the LAST stage finished
            if 0 <= out_idx < M:
                outbuf = outbuf.at[out_idx].set(
                    jnp.where(is_last, y, outbuf[out_idx])
                )
            if S > 1:
                act = jax.lax.ppermute(y, axis, perm)
                act_len = jax.lax.ppermute(y_len, axis, perm)
        # non-last stages hold zeros → the sum is the last stage's buffer,
        # replicated (satisfies the unsharded out_spec)
        out = jax.lax.psum(outbuf, axis)
        if not moe:
            return out
        # per-block losses from full-batch sums, stage-local; under
        # dp the stats are per-data-shard partial sums and must psum
        # over 'data' BEFORE the nonlinear loss (exactly the
        # sequence-parallel rule); the psum over the ring then totals
        # the per-stage losses → mean over ALL blocks
        if data_axis:
            stats_acc = [
                jax.lax.psum(st, data_axis) for st in stats_acc
            ]
        partial = sum(
            aux_from_stats(config, st) for st in stats_acc
        )
        aux = jax.lax.psum(partial, axis) / config.num_blocks
        return out, aux

    mb_spec = P(None, data_axis) if data_axis else P()
    out_specs = (mb_spec, P()) if moe else mb_spec
    stacked_specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: _stacked_spec(path, leaf, config, axis, ep_axis),
        stacked_params,
    )
    # manual over every mesh axis EXCEPT the tensor-parallel one: the
    # tp weight shardings ride the auto axis into the stage bodies and
    # GSPMD inserts their contraction collectives (in_specs name the
    # manual part only — the stacked leaves' tp sharding comes from
    # their placement above)
    manual = frozenset(mesh.axis_names) - (
        {tp_axis} if tp_axis is not None else set()
    )
    res = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(stacked_specs, mb_spec, mb_spec),
        out_specs=out_specs,
        axis_names=manual,
    )(stacked_params, x_mb, len_mb)
    if moe:
        out_mb, aux = res
        return out_mb.reshape(B, T, D), aux
    return res.reshape(B, T, D)
