"""Sequence parallelism composed with pipeline parallelism (sp × pp).

Long continuous recordings AND a deep block stack: the time axis shards
over a ``seq`` mesh axis (the one-input-halo design of
``parallel/sequence.py`` — each device encodes ``[halo, local]`` and
drops the halo outputs, so there is no per-layer time communication)
while the block stack pipelines over a ``pp`` axis (the GPipe ring of
``parallel/pipeline.py`` — one stage's weights per device, microbatches
ppermute around the ring).  The two compose cleanly because they
communicate on DISJOINT axes:

* the halo ``ppermute`` moves input windows along ``seq`` once, before
  any block compute;
* the ring ``ppermute`` moves activations along ``pp`` once per tick;
* stage weights are replicated over ``seq``, so shard_map AD emits
  their gradient psum over ``seq`` on its own (same rule as dp × pp's
  ``data`` axis).

Every (seq, pp) device holds one stage's weights and one time shard's
window; a ``data`` axis (dp × sp × pp, the full 3-D mesh) additionally
shards each microbatch's batch rows, exactly as in ``pipeline.py``.

Outputs equal the unsharded ``conformer_encode`` — the halo window
recomputes the left context through every stage (the bounded compound
receptive field guarantees the local span's outputs are exact), and the
ring runs the same blocks in the same order per microbatch (tested on
the 8-device CPU mesh, incl. MoE aux and gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.conformer import ConformerConfig, apply_block
from .pipeline import (
    _stacked_placement_spec,
    _stacked_spec,
    stack_block_params,
)
from .sequence import halo_steps


def sp_pp_conformer_encode(
    params: dict,
    config: ConformerConfig,
    xs: jax.Array,  # (B, T, in_dim) — already downsampled features
    mesh: Mesh,
    seq_axis: str = "seq",
    pp_axis: str = "pp",
    microbatches: int | None = None,
    lengths: jax.Array | None = None,
    compute_dtype=jnp.float32,
    return_aux: bool = False,
    ep_axis: str | None = None,
    tp_axis: str | None = None,
):
    """Encode with time sharded over ``mesh[seq_axis]`` and the block
    stack pipelined over ``mesh[pp_axis]``.

    Returns the (B, T, D) encoder output, time-sharded over
    ``seq_axis`` (same values as the unsharded encode).  Requirements
    are the union of both parents': ``T % (n_seq·chunk_size) == 0``,
    per-shard steps ≥ the halo, ``num_blocks % n_pp == 0``, and the
    batch divides into ``microbatches`` (× the ``data`` axis when the
    mesh has one).

    ``return_aux=True`` (MoE conformer)
    additionally returns the weighted router aux loss, equal to the
    unsharded one: per-block additive stats exclude halo replicas
    (position mask) and fill/drain ticks (tick mask), psum over
    ``data``+``seq`` BEFORE the nonlinear per-block loss, and the
    stage-local losses psum over the ring.

    ``ep_axis`` (MoE conformer): the ep × sp × pp 3-D
    composition — the STACKED stage weights' expert dims additionally
    shard over ``mesh[ep_axis]`` (same per-leaf specs as ep × pp,
    ``pipeline._stacked_spec``), each (seq, pp, expert-shard) device
    runs its E/K experts on its halo window inside its stage, and the
    combine's partial outputs psum over ``ep_axis`` inside
    every block (``models/moe.py::_moe_nodrop``; the capacity path
    slices its dispatch/combine one-hots by expert the same way, and
    — like plain sp — needs shard-aligned dispatch groups, checked
    below).  The router is
    replicated over ``ep_axis``, so the statistics stay identical
    along it and still psum over ``data``+``seq`` only.

    ``tp_axis`` (tp × sp × pp): the stacked stage weights' wide output
    dims additionally shard over ``mesh[tp_axis]``, left in GSPMD
    **auto** mode (excluded from the shard_map's ``axis_names``) — the
    halo and ring collectives stay manual while GSPMD inserts the
    tensor-parallel contractions' collectives inside each stage
    (``parallel/pipeline.py`` tp × pp, composed with the time
    sharding).  Mutually exclusive with ``ep_axis``.
    """
    if ep_axis is not None and not config.moe_experts:
        raise ValueError("ep_axis requires a MoE conformer (moe_experts)")
    if tp_axis is not None and ep_axis is not None:
        raise ValueError("tp_axis and ep_axis are mutually exclusive")
    n_seq = mesh.shape[seq_axis]
    S_pp = mesh.shape[pp_axis]
    M = microbatches or S_pp
    B, T, _ = xs.shape
    halo = halo_steps(config)
    if T % (n_seq * config.chunk_size):
        raise ValueError(
            f"T={T} must be a multiple of "
            f"n_seq·chunk_size={n_seq * config.chunk_size}"
        )
    S_loc = T // n_seq
    if S_loc < halo:
        raise ValueError(
            f"per-shard steps {S_loc} < halo {halo}: use fewer seq shards"
        )
    if config.moe_experts and config.moe_capacity_factor > 0:
        # same shard-aligned-groups condition as parallel/sequence.py:
        # seg | S_loc and seg | halo make every time shard's dispatch
        # groups BE the offline groups (identical populations → drops)
        seg = int(getattr(config, "moe_group_size", 0) or 0)
        if not seg or S_loc % seg or halo % seg:
            raise ValueError(
                "sp × pp with the capacity MoE path needs shard-aligned "
                "dispatch groups: set moe_group_size to a divisor of "
                f"both the per-shard steps ({S_loc}) and the halo "
                f"({halo}); got moe_group_size={seg or 0}"
            )
    if B % M:
        raise ValueError(f"batch {B} does not split into {M} microbatches")
    b = B // M
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
    blocks_per_stage = config.num_blocks // S_pp
    n_tp = mesh.shape[tp_axis] if tp_axis is not None else 1
    stacked_params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf,
            NamedSharding(
                mesh,
                _stacked_placement_spec(
                    path, leaf, config, pp_axis, ep_axis, tp_axis, n_tp
                ),
            ),
        ),
        stack_block_params(params, S_pp),  # validates the stage split
    )
    W = halo + S_loc  # per-device window steps
    D = params["in_proj"]["w"].shape[-1]
    moe = bool(config.moe_experts) and return_aux

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)

    def body(stage_blocks, in_proj, x_local, lengths_all):
        from ..models.moe import aux_from_stats, zero_stats

        stage_blocks = jax.tree.map(lambda a: a[0], stage_blocks)
        sidx = jax.lax.axis_index(seq_axis)
        pidx = jax.lax.axis_index(pp_axis)
        is_first = pidx == 0
        is_last = pidx == S_pp - 1
        # ---- sequence side: one input-halo ppermute along seq --------
        prev_tail = jax.lax.ppermute(
            x_local[:, -halo:],
            seq_axis,
            perm=[(i, i + 1) for i in range(n_seq - 1)],
        )
        window = jnp.concatenate([prev_tail, x_local], axis=1)  # (B,W,in)
        offset = sidx * S_loc - halo
        positions = jnp.arange(W) + offset
        valid = positions >= 0  # first shard's zero halo == offline pad
        x = (
            jnp.dot(window.astype(cd), in_proj["w"].astype(cd))
            + in_proj["b"].astype(cd)
        )
        b_loc = x.shape[0] // M  # per-device microbatch rows
        x_mb = x.reshape(M, b_loc, W, D)
        len_mb = lengths_all.reshape(M, b_loc)
        # ---- pipeline side: GPipe ring along pp ----------------------
        act = jnp.zeros((b_loc, W, D), x.dtype)
        act_len = jnp.zeros((b_loc,), jnp.int32)
        outbuf = jnp.zeros((M, b_loc, W, D), x.dtype)
        stats_acc = [
            zero_stats(config.moe_experts) for _ in range(blocks_per_stage)
        ] if moe else None
        perm = [(i, i + 1) for i in range(S_pp - 1)]
        for t in range(M + S_pp - 1):
            mb = min(t, M - 1)
            y = jnp.where(is_first, x_mb[mb], act)
            y_len = jnp.where(is_first, len_mb[mb], act_len)
            for j in range(blocks_per_stage):
                blk = jax.tree.map(lambda a: a[j], stage_blocks)
                y, _, stats = apply_block(
                    blk, y, config, y_len, positions, cd,
                    valid=valid, stats_start=sidx * S_loc,
                    ep_axis=ep_axis,
                )
                if moe and stats is not None:
                    real = (t >= pidx) & (t - pidx < M)
                    stats_acc[j] = jax.tree.map(
                        lambda acc, v: acc + jnp.where(real, v, 0.0),
                        stats_acc[j], stats,
                    )
            out_idx = t - (S_pp - 1)
            if 0 <= out_idx < M:
                outbuf = outbuf.at[out_idx].set(
                    jnp.where(is_last, y, outbuf[out_idx])
                )
            if S_pp > 1:
                act = jax.lax.ppermute(y, pp_axis, perm)
                act_len = jax.lax.ppermute(y_len, pp_axis, perm)
        out = jax.lax.psum(outbuf, pp_axis)  # last stage's buffer
        out = out.reshape(M * b_loc, W, D)[:, halo:]  # drop halo outputs
        if not moe:
            return out
        # total each block's stats over every token-owning axis BEFORE
        # the nonlinear loss: batch shards (data) and time shards (seq);
        # the ring psum then sums the per-stage losses
        for ax in filter(None, (data_axis, seq_axis)):
            stats_acc = [jax.lax.psum(st, ax) for st in stats_acc]
        partial = sum(aux_from_stats(config, st) for st in stats_acc)
        aux = jax.lax.psum(partial, pp_axis) / config.num_blocks
        return out, aux

    sharding = NamedSharding(mesh, P(None, seq_axis, None))
    if isinstance(xs, jax.core.Tracer):
        xs = jax.lax.with_sharding_constraint(xs, sharding)
    else:
        xs = jax.device_put(xs, sharding)
    x_spec = P(data_axis, seq_axis, None) if data_axis else P(None, seq_axis, None)
    len_spec = P(data_axis) if data_axis else P(None)
    out_spec = x_spec
    out_specs = (out_spec, P()) if moe else out_spec
    in_proj_specs = jax.tree.map(lambda _: P(), params["in_proj"])
    stacked_specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: _stacked_spec(path, leaf, config, pp_axis, ep_axis),
        stacked_params,
    )
    # manual over every mesh axis EXCEPT the tensor-parallel one (the
    # tp weight shardings ride the auto axis — see pipeline.py tp × pp)
    manual = frozenset(mesh.axis_names) - (
        {tp_axis} if tp_axis is not None else set()
    )
    res = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(stacked_specs, in_proj_specs, x_spec, len_spec),
        out_specs=out_specs,
        axis_names=manual,
    )(stacked_params, params["in_proj"], xs, lengths)
    return res
