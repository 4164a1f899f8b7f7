"""Mesh construction and sharding rules.

The reference's only parallelism is vestigial TF1 multi-GPU towers over
NCCL (``training_GPUs=[0]``, reference trainers.py:131; SURVEY §2.9).
The TPU-native equivalent is SPMD over a `jax.sharding.Mesh`:

* **data parallelism** — batches sharded over the ``data`` axis; XLA
  emits the gradient ``psum`` over ICI automatically from the sharding
  annotations (no hand-written collectives, per the scaling-book
  recipe: pick a mesh, annotate, let XLA insert collectives);
* **tensor parallelism** (optional ``model`` axis) — the wide matrices
  (LSTM gate kernels' 4H output dim, vocab-sized decoder
  projection/embedding, aux heads) sharded on their output axis.  At the
  reference model scale (<20 M params) this is about latency headroom,
  not necessity (SURVEY §2.9), but the shardings are real and compile.

The corpus itself is tiny (SURVEY §6) and stays **replicated**; each
device gathers its own batch shard by index locally — no cross-device
gather traffic in the hot loop.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: Any = None,
    n_seq: int = 1,
) -> Mesh:
    """(data, model[, seq]) mesh over the available devices.  The
    ``seq`` axis (when >1) carries sequence parallelism — the conformer
    encode's time axis (parallel/sequence.py)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    devices = devices[: n_data * n_model * n_seq]
    if n_seq > 1:
        return Mesh(
            np.asarray(devices).reshape(n_data, n_model, n_seq),
            ("data", "model", "seq"),
        )
    return Mesh(
        np.asarray(devices).reshape(n_data, n_model), ("data", "model")
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully-replicated placement.  With a multi-process (DCN) mesh,
    every process supplies the same host data and the global array is
    assembled from the process-local shards."""
    if jax.process_count() > 1:
        from .multihost import make_global

        return make_global(tree, mesh)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def _tp_spec(path: tuple, leaf: jax.Array, n_model: int) -> P:
    """Tensor-parallel spec for one param leaf: shard the wide output
    axis of 2-D kernels over 'model' when it divides evenly.

    The subsample-conv stack is EXCLUDED: its output width (reference
    conv_sizes=100) is below one MXU tile, so sharding it buys nothing
    — and under tp×sp, a feature-sharded conv weight meeting a
    spatially-('seq'-)sharded raw input MISCOMPILES in GSPMD's conv
    partitioner (measured: values off by O(1); the minimal repro is in
    RESULTS.md r5).  Conv leaves therefore stay replicated, which is
    also what the sharded-Adam invariant expects of them."""
    if n_model <= 1 or leaf.ndim < 2:
        return P()
    keys = {getattr(k, "key", None) for k in path}
    if "subnet" in keys and "conv" in keys:
        # the subsample stack only — the conformer blocks' conv-module
        # POINTWISE kernels (pw1/pw2 under blocks[i]['conv']) are real
        # tp targets and stay sharded
        return P()
    if leaf.shape[-1] % n_model == 0 and leaf.shape[-1] >= 4 * n_model:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree with tensor-parallel shardings on the
    ``model`` axis (replicated over ``data``).  Accepts any
    params-shaped pytree (param tree, EMA, TrainState with optimizer
    state — Adam moments mirror the kernels' shapes, so they pick up
    the same specs)."""
    n_model = mesh.shape["model"]
    if jax.process_count() > 1:
        from .multihost import make_global

        return make_global(
            params, mesh,
            spec_fn=lambda path, leaf: _tp_spec(path, leaf, n_model),
        )
    flat = jax.tree_util.tree_flatten_with_path(params)
    placed = [
        jax.device_put(
            leaf, NamedSharding(mesh, _tp_spec(path, leaf, n_model))
        )
        for path, leaf in flat[0]
    ]
    return jax.tree_util.tree_unflatten(flat[1], placed)


def make_dp_train_step(
    loss_fn,
    optimizer: optax.GradientTransformation,
    ema_decay: float,
    mesh: Mesh,
):
    """One data-parallel (+optionally tensor-parallel) training step.

    ``loss_fn(params, batch, rng) -> (loss, metrics)``.  The batch's
    leading axis is constrained to the ``data`` axis; because params are
    replicated (or TP-sharded) and the loss averages over the global
    batch, XLA inserts the gradient all-reduce over ICI on its own.
    """

    @jax.jit
    def step(params, ema, opt_state, batch, rng):
        batch = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P("data"))
            )
            if hasattr(a, "ndim") and a.ndim >= 1 and a.shape
            and a.shape[0] % mesh.shape["data"] == 0
            else a,
            batch,
        )
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params
        )
        return params, ema, opt_state, loss, metrics

    return step
