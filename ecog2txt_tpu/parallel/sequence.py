"""Sequence parallelism for the conformer encoder.

Long continuous recordings (BASELINE configs[4]) can exceed what one
chip should hold or what one chip's latency budget allows.  The
chunked-causal conformer has a BOUNDED compound receptive field —
``num_blocks · chunk · (left_context + ceil((kernel−1)/chunk))`` steps
behind a chunk-aligned boundary (the same bound
:class:`models.conformer.ConformerStream` streams with; see
:func:`models.conformer.receptive_field_steps` for the alignment
derivation) — so the time axis shards cleanly over a mesh axis:

* each device holds a contiguous time shard (a multiple of the
  attention chunk, so chunk boundaries align across shards);
* ONE ``ppermute`` ships each shard's input tail (the receptive-field
  halo, rounded up to whole chunks) to its right neighbor before any
  compute — there is no per-layer communication at all;
* every device then encodes ``[halo, local]`` with its absolute
  position offset and drops the halo outputs.  The first shard's
  ``ppermute`` fill is zeros at negative absolute positions, which the
  encoder masks to behave exactly like the offline zero left-pad
  (``mask_invalid``) — so sharded outputs equal the single-device
  encode EXACTLY (tested on the 8-device CPU mesh).

The halo recompute is the whole cost: ``window/S`` redundant work,
negligible once per-device shards are long — which is precisely the
regime sequence parallelism is for.  Communication is one
neighbor-to-neighbor ICI hop of ``B·halo·in_dim`` elements.

This composes with data parallelism: shard batch over one mesh axis
and time over another (``P('data', 'seq', None)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.conformer import (
    ConformerConfig,
    conformer_encode,
    receptive_field_steps,
)


def halo_steps(config: ConformerConfig) -> int:
    """Input halo each shard needs from its left neighbor: the stack's
    compound receptive field behind a chunk-aligned shard boundary
    (:func:`models.conformer.receptive_field_steps` — already a whole
    number of attention chunks, as shard starts must be)."""
    return receptive_field_steps(config)


def sequence_parallel_encode(
    params: dict,
    config: ConformerConfig,
    xs: jax.Array,  # (B, T, in_dim) — already downsampled features
    mesh: Mesh,
    axis: str = "seq",
    lengths: jax.Array | None = None,
    compute_dtype=jnp.float32,
    return_aux: bool = False,
    ep_axis: str | None = None,
):
    """Encode ``xs`` with its time axis sharded over ``mesh[axis]``.

    Returns the (B, T, D) encoder output, time-sharded over ``axis``
    (same values as the unsharded ``conformer_encode`` — the caller can
    keep it sharded for downstream sequence-sharded consumers or let
    XLA gather it).  Requires ``T % (n·chunk_size) == 0`` and per-shard
    length ≥ the halo; pad the recording to the chunk grid first (the
    offline encode needs that too) and pass ``lengths`` to mask the pad.

    ``return_aux=True`` (MoE conformer) additionally returns the
    weighted router aux loss, EXACTLY equal to the unsharded one: each
    shard contributes its additive router statistics, which are
    ``psum``-ed over the shard axis BEFORE the nonlinear loss
    (models/moe.py::aux_from_stats).  Halo tokens sit at absolute
    positions the owning shard already counts, so they are EXCLUDED
    from the halo replica's statistics (masked by position) — no
    double counting.

    ``ep_axis`` (MoE conformer): EXPERT parallelism composed with the
    time sharding — the ep×sp 2-D mesh for long-recording MoE training.
    The expert-stacked leaves enter the shard_map split over
    ``mesh[ep_axis]`` (parallel/expert.py specs), each device runs only
    its E/K experts on its time shard, and the combine's partial
    outputs psum over ``ep_axis`` (models/moe.py::_moe_nodrop; the
    capacity path slices its dispatch/combine one-hots by expert the
    same way — _moe_capacity_grouped).  The router is replicated, so
    its statistics are identical along ``ep_axis`` and still psum over
    ``axis`` only.  The capacity path (with or without ep) requires
    shard-aligned dispatch groups — see the check below.

    The shard_map is MANUAL only over the axes the body actually
    communicates on (``axis``, plus ``ep_axis`` under ep) — every other
    mesh axis stays in GSPMD **auto** mode (``jax.shard_map``'s
    ``axis_names``).  Two compositions fall out with zero extra code:

    * **dp × sp**: the batch keeps its ``data`` sharding *through* the
      body (the all-manual form would all-gather it and replicate the
      encoder work over the data axis);
    * **tp × sp**: tensor-parallel weight shardings
      (``parallel/mesh.py::shard_params_tp``, output axes on a
      ``model`` mesh axis) ride the auto axes into the body's GEMMs,
      and GSPMD inserts the contractions' collectives — grads come
      back with the same specs (the sharded-Adam invariant).
    """
    if ep_axis is not None and not config.moe_experts:
        raise ValueError("ep_axis requires a MoE conformer (moe_experts)")
    n = mesh.shape[axis]
    B, T, _ = xs.shape
    halo = halo_steps(config)
    if T % (n * config.chunk_size):
        raise ValueError(
            f"T={T} must be a multiple of n·chunk_size={n * config.chunk_size}"
        )
    S = T // n
    if config.moe_experts and config.moe_capacity_factor > 0:
        # Capacity drops depend on each dispatch group's population, so
        # a shard's groups must BE the offline groups: fixed
        # moe_group_size segments whose absolute boundaries every local
        # window [shard·S − halo, shard·S + S) lands on.  seg | S and
        # seg | halo make every shard's segmentation align with the
        # offline one (halo segments recompute the neighbor's groups —
        # deterministic, identical drops; shard 0's pre-recording halo
        # forms whole all-invalid groups that dispatch nothing), so the
        # sharded function is EXACTLY the unsharded one (tested).
        seg = int(getattr(config, "moe_group_size", 0) or 0)
        if not seg or S % seg or halo % seg:
            raise ValueError(
                "sequence parallelism with the capacity MoE path needs "
                "shard-aligned dispatch groups: set moe_group_size to a "
                f"divisor of both the per-shard steps ({S}) and the "
                f"halo ({halo}); got moe_group_size={seg or 0}.  "
                "(moe_group_size=0 groups per padded row — population "
                "differs between a halo window and the offline encode.)"
            )
    if S < halo:
        raise ValueError(
            f"per-shard steps {S} < halo {halo}: use fewer shards "
            f"(or this recording is too short for sequence parallelism)"
        )

    def body(local_params, x_local, lengths_local):
        # x_local: (B, S, in_dim) — this device's contiguous time shard;
        # local_params: replicated, except the expert leaves under
        # ep_axis (this device's E/K experts)
        idx = jax.lax.axis_index(axis)
        # ship my tail to my right neighbor; the first shard receives
        # zeros (no source), masked out by negative absolute positions
        prev_tail = jax.lax.ppermute(
            x_local[:, -halo:],
            axis,
            perm=[(i, i + 1) for i in range(n - 1)],
        )
        window = jnp.concatenate([prev_tail, x_local], axis=1)
        offset = idx * S - halo
        if not return_aux:
            out, _ = conformer_encode(
                local_params,
                config,
                window,
                lengths=lengths_local,
                position_offset=offset,
                compute_dtype=compute_dtype,
                mask_invalid=True,
                ep_axis=ep_axis,
            )
            return out[:, halo:]
        # MoE: router stats must count every recording token exactly
        # once, but the halo replica recomputes tokens its left
        # neighbor owns.  `stats_start` masks positions below this
        # shard's own span OUT OF THE STATISTICS ONLY — the halo
        # tokens' MoE outputs still compute normally (later blocks'
        # attention reads them), they just don't count twice.
        out, _, stats = conformer_encode(
            local_params,
            config,
            window,
            lengths=lengths_local,
            position_offset=offset,
            compute_dtype=compute_dtype,
            mask_invalid=True,
            return_moe_stats=True,
            stats_start=idx * S,
            ep_axis=ep_axis,
        )
        # over the TIME axis only: the replicated router makes every
        # ep_axis device compute identical statistics
        stats = jax.lax.psum(stats, axis)
        from ..models.conformer import moe_aux_from_stats

        return out[:, halo:], moe_aux_from_stats(config, stats)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    if isinstance(xs, jax.core.Tracer):
        # inside jit (the sp TRAINING step): constrain instead of
        # device_put so the call composes with the surrounding program.
        # Batch/feature dims stay UNCONSTRAINED — a dp batch sharding
        # on an auto 'data' axis must survive into the body
        xs = jax.lax.with_sharding_constraint(
            xs,
            NamedSharding(
                mesh, P(P.UNCONSTRAINED, axis, P.UNCONSTRAINED)
            ),
        )
    else:
        xs = jax.device_put(xs, NamedSharding(mesh, P(None, axis, None)))
    if ep_axis is not None:
        from .expert import ep_spec

        param_specs = jax.tree_util.tree_map_with_path(
            lambda path, leaf: ep_spec(
                path, leaf, config.moe_experts, ep_axis
            ),
            params,
        )
    else:
        param_specs = jax.tree.map(lambda _: P(), params)
    out_specs = (
        (P(None, axis, None), P()) if return_aux else P(None, axis, None)
    )
    manual = {axis} | ({ep_axis} if ep_axis is not None else set())
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, P(None, axis, None), P(None)),
        out_specs=out_specs,
        axis_names=frozenset(manual),
    )(params, xs, lengths)
