"""Routed mixture-of-experts FFN for the conformer encoder.

The reference has no sparse-expert model (its encoder families are the
biLSTM stack and nothing else — SURVEY §2.8), so expert parallelism was
documented n/a in PARITY §2.9.  This module makes the EP row real: a
top-k routed MoE FFN (Shazeer 2017 / GShard / Switch lineage — all
public) replacing the conformer's second macaron FFN, designed so the
EXPERT axis is the shardable axis (`parallel.expert.shard_params_ep`):
every expert-stacked tensor carries experts on dim 0 and the expert
einsums contract over token/feature dims only, so placing the weights
``P('model')`` on a mesh makes XLA partition expert compute across
devices and insert the all-to-all-style collectives on its own (the
scaling-book recipe; no hand-written collectives).

Two compute paths, the SAME routed function when no token is dropped:

* **no-drop** (``moe_capacity_factor == 0``, the default): every expert
  runs on every token and the top-k gate mask combines the outputs.
  Executes E× the routed FLOPs but is exact, static-shape, and — being
  strictly per-token — preserves the streamed == offline contract
  (`ConformerStream` windows see different token POPULATIONS than the
  offline encode; any population-dependent drop would break equality).
  The right path for this model family's scale (E ≤ ~8).
* **capacity** (``moe_capacity_factor > 0``): GShard-style static
  dispatch — per expert a fixed ``C = ceil(topk·S/E · cf)`` token
  buffer, tokens placed by a cumsum position, overflow dropped (output
  falls back to the residual).  O(k·S) expert FLOPs — the
  production-scale path; its (E, C, D) buffers are the tensors expert
  parallelism shards — under GSPMD automatically, and inside the
  manual sp/pp shard_maps by slicing the dispatch/combine one-hots on
  the expert axis and psum-ing the linear combine
  (:func:`_moe_capacity_grouped` ``ep_axis``; r5).  Under a TIME
  sharding the dispatch groups must be shard-aligned
  (``moe_group_size`` dividing both the per-shard steps and the halo
  — parallel/sequence.py / sp_pp.py enforce it) so every shard's
  group populations, hence drops, equal the offline encode's.
  Population-dependent, so the streaming wrapper
  refuses it (`models/conformer.py::ConformerStream`).

Router details (all standard): softmax over expert logits in f32,
top-k renormalized gates, Switch load-balance loss ``E·Σ_e f_e·P_e``
over valid tokens plus a router z-loss, weighted by static config
fields and surfaced in ``seq2seq_loss``'s metrics as ``moe_aux``.
The blocks hand back ADDITIVE sufficient statistics
(:func:`router_stats`) rather than the loss itself, so model-parallel
callers psum shard statistics BEFORE the nonlinear combine
(:func:`aux_from_stats`) — sequence-parallel and pipelined training
reproduce the single-device aux exactly (parallel/sequence.py,
parallel/pipeline.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def glorot(rng: jax.Array, shape) -> jax.Array:
    """Glorot-uniform over the trailing (fan_in, fan_out) dims — shared
    with the conformer's dense init (conformer.py imports this module)."""
    scale = np.sqrt(6.0 / (shape[-2] + shape[-1]))
    return jax.random.uniform(rng, shape, jnp.float32, -scale, scale)


def init_moe_ffn(rng: jax.Array, D: int, F: int, E: int) -> dict:
    """Expert-stacked FFN params: experts on dim 0 (the EP shard axis)."""
    kg, k1, k2 = jax.random.split(rng, 3)
    return {
        "wg": glorot(kg, (D, E)),
        "w1": glorot(k1, (E, D, F)),
        "b1": jnp.zeros((E, F)),
        "w2": glorot(k2, (E, F, D)),
        "b2": jnp.zeros((E, D)),
        "ln": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
    }


def _route(p: dict, xn: jax.Array, topk: int):
    """Router on the LayerNormed input.  Logits/softmax in f32 (router
    decisions are control flow — bf16 ties would make the argmax
    compile-dependent).  Returns (logits, probs, gates, gate_idx)."""
    logits = jnp.dot(xn.astype(jnp.float32), p["wg"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # (B, T, E)
    gate_vals, gate_idx = jax.lax.top_k(probs, topk)  # (B, T, k)
    gates = gate_vals / jnp.maximum(
        gate_vals.sum(axis=-1, keepdims=True), 1e-9
    )
    return logits, probs, gates, gate_idx


def router_stats(logits, probs, gate_idx, valid: jax.Array) -> dict:
    """SUMS over valid tokens — the additive sufficient statistics of
    the aux loss.  Additivity is the point: statistics from
    sequence-parallel time shards (or pipeline microbatches) psum/add
    into exactly the unsharded statistics, so :func:`aux_from_stats`
    after a collective equals the single-device loss (the balance loss
    is nonlinear in the MEANS — per-shard losses cannot just be
    averaged)."""
    E = probs.shape[-1]
    validf = valid.astype(jnp.float32)
    # leading dims may be (B, T) or (G, S) — reduce all but the last
    red = tuple(range(validf.ndim))
    assign = jax.nn.one_hot(gate_idx, E) * validf[..., None, None]
    return {
        "fsum": assign.sum(axis=red + (validf.ndim,)),  # (E,) choices→e
        "psum": (probs * validf[..., None]).sum(axis=red),  # (E,)
        "zsum": jnp.sum(
            jax.nn.logsumexp(logits, axis=-1) ** 2 * validf
        ),
        "n": validf.sum(),
        # valid routed choices (n·k) as its OWN sum so every field of
        # the dict is additive across shards
        "csum": validf.sum() * gate_idx.shape[-1],
    }


def aux_from_stats(config, stats: dict) -> jax.Array:
    """Weighted load-balance + z losses from :func:`router_stats` sums.

    balance = E · Σ_e f_e·P_e (Switch): f_e the fraction of routed
    choices sent to e, P_e the mean router probability of e; minimized
    (at 1.0) by a uniform router.  z-loss = mean logsumexp(logits)² —
    keeps logits bounded (bf16-activation safety at scale)."""
    E = stats["psum"].shape[-1]
    n = jnp.maximum(stats["n"], 1.0)
    f = stats["fsum"] / jnp.maximum(stats["csum"], 1.0)
    pmean = stats["psum"] / n
    balance = E * jnp.sum(f * pmean)
    z = stats["zsum"] / n
    return (
        config.moe_aux_weight * balance + config.moe_zloss_weight * z
    )


def _combine_weights(gates, gate_idx, E, valid):
    """(B, T, E) full combine weights: top-k renormalized gates
    scattered to their expert slots, zero for invalid tokens."""
    w = (jax.nn.one_hot(gate_idx, E) * gates[..., None]).sum(axis=-2)
    return w * valid[..., None].astype(w.dtype)


def _experts_dense(p, xn, cd):
    """All experts on all tokens: (B, T, E, D) stack of expert outputs.
    The einsums keep experts on a free axis, so EP-sharded weights
    shard this compute by expert."""
    h = jnp.einsum(
        "btd,edf->btef", xn, p["w1"].astype(cd)
    ) + p["b1"].astype(cd)
    h = jax.nn.swish(h)
    return jnp.einsum(
        "btef,efd->bted", h, p["w2"].astype(cd)
    ) + p["b2"].astype(cd)


def _moe_nodrop(p, xn, config, cd, valid, ep_axis=None):
    """``ep_axis``: manual expert parallelism for shard_map callers
    (sequence parallelism's ep×sp mesh): ``p``'s expert-stacked leaves
    hold only THIS device's E/K experts (parallel/expert.py placement),
    so the combine slices the local experts' columns out of the full
    (B, T, E) weights and the partial outputs psum over the axis — the
    no-drop combine is a linear sum over experts, so the psum of local
    sums IS the full combine.  (GSPMD callers never pass this: sharded
    einsums partition on their own.)"""
    _, probs, gates, gate_idx = _route(p, xn, config.moe_topk)
    E = probs.shape[-1]  # router width — the FULL expert count
    y = _experts_dense(p, xn, cd)  # (B, T, E_local, D)
    w = _combine_weights(gates, gate_idx, E, valid).astype(cd)
    if ep_axis is not None:
        E_local = p["w1"].shape[0]
        k0 = jax.lax.axis_index(ep_axis) * E_local
        w = jax.lax.dynamic_slice_in_dim(w, k0, E_local, axis=-1)
        return jax.lax.psum(jnp.einsum("bte,bted->btd", w, y), ep_axis)
    return jnp.einsum("bte,bted->btd", w, y)


def _moe_capacity(p, xn, config, cd, valid, ep_axis=None):
    """GShard-style static-capacity dispatch, GROUPED.

    Tokens are partitioned into groups — one group per batch row, or
    per ``moe_group_size``-step time segment of a row when that is set
    — and each group gets its own ``C = ceil(topk·S_g/E · cf)`` slots
    per expert.  Grouping is what bounds the one-hot dispatch tensor:
    it is (G, S_g, E, C) ≈ k·cf·S_g² per group, and the dispatch/
    combine einsums cost k·cf·S_g·D FLOPs per token — a GLOBAL (one
    group) dispatch would grow quadratically with the whole batch
    (B·T ≈ 32k tokens at training scale makes it dominant).  Groups
    never cross batch rows, so other examples in the batch never
    affect an example's drops; with ``moe_group_size`` set the
    capacity is additionally a config constant (independent of the
    batch's padded length), making assessment == per-example decode
    exactly.

    Within a group, priority is (choice rank, time order): first
    choices fill before second choices, earlier tokens before later
    ones — deterministic and jit-static.  A dropped choice contributes
    nothing (its gate weight is absent from the combine; the block's
    residual carries the token through)."""
    B, T, D = xn.shape
    E = config.moe_experts
    k = config.moe_topk
    seg = int(getattr(config, "moe_group_size", 0) or 0)
    if seg:
        # group whenever a segment size is set — including T < seg
        # (padded up to ONE full segment), so the per-expert capacity
        # C = ceil(k·seg/E·cf) is a CONFIG constant: the same example
        # gets the same drops whatever length its batch was padded to
        # (assessment == per-example decode).  Pad tokens are invalid
        # and never consume slots.
        pad = (-T) % seg
        if pad:
            xn = jnp.pad(xn, ((0, 0), (0, pad), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        G = (T + pad) // seg
        xg = xn.reshape(B * G, seg, D)
        vg = valid.reshape(B * G, seg)
        out = _moe_capacity_grouped(p, xg, config, cd, vg, ep_axis=ep_axis)
        return out.reshape(B, G * seg, D)[:, :T]
    # moe_group_size=0: one group per batch row — C then scales with
    # the row's PADDED length, so drops (hence outputs) can differ
    # between batch paddings of the same example; set moe_group_size
    # for batch-length-invariant serving
    return _moe_capacity_grouped(p, xn, config, cd, valid, ep_axis=ep_axis)


def _moe_capacity_grouped(p, xn, config, cd, valid, ep_axis=None):
    """One dispatch group per leading-dim row.  xn: (G, S, D).

    ``ep_axis``: manual expert parallelism (shard_map callers — the
    ep × sp / ep × pp meshes).  Tokens are REPLICATED over the axis in
    this design (exactly as in :func:`_moe_nodrop`), so no all-to-all
    is needed: the (G, S, E, C) dispatch/combine one-hots are built
    identically on every device from the replicated router, each
    device slices its E/K experts' columns BEFORE the dispatch einsum
    (sharding the dispatch, expert-FFN, and combine FLOPs by expert),
    and the combine — linear over experts — psums over the axis.
    Slot assignment uses the FULL expert count, so the routed function
    (including drops) is exactly the unsharded one.

    The dispatch/combine are GShard-style one-hot MATMULS by design: a
    sort-based construction (argsort by expert id + gathers/scatter-
    adds) computing the identical routed function measured 1.6x SLOWER
    on-chip (29.9 vs 18.4 ms/step fwd at the RESULTS.md r3 config, and
    78 vs 56 fwd+bwd) — TPU gathers and argsort are serial/VPU work
    while one-hot einsums ride the MXU.  That is WHY the GShard
    formulation is einsums; the negative result is recorded in
    RESULTS.md and the sort path was removed rather than kept as a
    dead twin."""
    G, S, D = xn.shape
    E = config.moe_experts
    k = config.moe_topk
    C = max(int(np.ceil(k * S / E * config.moe_capacity_factor)), 1)
    _, probs, gates, gate_idx = _route(p, xn, k)
    validf = valid.astype(jnp.float32)  # (G, S)

    dispatch = jnp.zeros((G, S, E, C), jnp.float32)
    combine = jnp.zeros((G, S, E, C), jnp.float32)
    base = jnp.zeros((G, E), jnp.float32)  # filled slots per expert
    for j in range(k):
        oh = jax.nn.one_hot(gate_idx[..., j], E) * validf[..., None]
        pos = jnp.cumsum(oh, axis=1) - oh + base[:, None, :]  # (G, S, E)
        keep = oh * (pos < C)
        slot = jax.nn.one_hot(
            jnp.minimum(pos, C - 1).astype(jnp.int32), C
        )  # (G, S, E, C)
        dispatch = dispatch + keep[..., None] * slot
        combine = combine + (keep * gates[..., j : j + 1])[..., None] * slot
        base = base + keep.sum(axis=1)
    if ep_axis is not None:
        E_local = p["w1"].shape[0]  # this device's expert shard
        k0 = jax.lax.axis_index(ep_axis) * E_local
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, k0, E_local, 2)
        combine = jax.lax.dynamic_slice_in_dim(combine, k0, E_local, 2)
    ein = jnp.einsum(
        "gsec,gsd->gecd", dispatch.astype(cd), xn.astype(cd)
    )  # (G, E, C, D) — the EP-sharded buffers
    h = jax.nn.swish(
        jnp.einsum("gecd,edf->gecf", ein, p["w1"].astype(cd))
        + p["b1"].astype(cd)[None, :, None, :]
    )
    y = jnp.einsum(
        "gecf,efd->gecd", h, p["w2"].astype(cd)
    ) + p["b2"].astype(cd)[None, :, None, :]
    out = jnp.einsum("gsec,gecd->gsd", combine.astype(cd), y)
    if ep_axis is not None:
        out = jax.lax.psum(out, ep_axis)
    return out


def moe_ffn(
    p: dict,
    xn: jax.Array,  # (B, T, D) already LayerNormed, compute dtype
    config,  # ConformerConfig with moe_* fields
    cd,
    valid: jax.Array,  # (B, T) bool — tokens inside the recording
    stats_valid: jax.Array | None = None,
    ep_axis: str | None = None,
):
    """Routed MoE FFN.  Returns (out (B, T, D), router stats sums —
    :func:`router_stats`; the caller turns them into the weighted aux
    loss via :func:`aux_from_stats`, possibly after psum-ing shard
    stats (parallel/sequence.py, parallel/pipeline.py)).

    ``stats_valid``: validity mask for the STATISTICS only (defaults
    to ``valid``).  Sequence parallelism passes a tighter mask here so
    a shard's halo replica — whose MoE outputs must still compute,
    later blocks read them — does not double-count its left neighbor's
    tokens in the psum-ed balance statistics.

    ``ep_axis``: shard_map-manual expert parallelism (see
    :func:`_moe_nodrop`) — the expert leaves of ``p`` are this device's
    shard and partial outputs psum over the axis.  The router (``wg``,
    replicated) and hence the stats are identical on every ``ep_axis``
    device: callers must psum stats over OTHER axes only."""
    if config.moe_capacity_factor > 0:
        out = _moe_capacity(p, xn, config, cd, valid, ep_axis=ep_axis)
    else:
        out = _moe_nodrop(p, xn, config, cd, valid, ep_axis=ep_axis)
    # stats on their own (cheap) router pass — XLA CSEs it with the
    # one inside the compute path (identical subgraph, same operands)
    logits, probs, _, gate_idx = _route(p, xn, config.moe_topk)
    return out, router_stats(
        logits, probs, gate_idx,
        valid if stats_valid is None else stats_valid,
    )


def zero_stats(n_experts: int) -> dict:
    """Additive identity of :func:`router_stats` (non-MoE blocks)."""
    return {
        "fsum": jnp.zeros((n_experts,), jnp.float32),
        "psum": jnp.zeros((n_experts,), jnp.float32),
        "zsum": jnp.zeros((), jnp.float32),
        "n": jnp.zeros((), jnp.float32),
        "csum": jnp.zeros((), jnp.float32),
    }
