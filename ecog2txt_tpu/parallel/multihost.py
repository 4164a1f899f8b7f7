"""Multi-host (DCN) data parallelism.

The reference is single-process/single-GPU (SURVEY §2.9: no
elastic/multi-node anything); the TPU-native scale-out path is
multi-controller SPMD: every host runs the same program,
``jax.distributed.initialize`` wires the processes together over DCN,
the device mesh spans all hosts' chips, and XLA partitions collectives
over ICI within a host/slice and DCN across them — no hand-written
communication (scaling-book recipe).

Used by MultiSubjectTrainer via ``SN_kwargs['distributed'] =
{'coordinator_address': 'host:port', 'num_processes': N,
'process_id': i}`` + ``data_parallel=True``: the dp mesh then covers
the GLOBAL device set, each process feeds identical host data (the
synthetic corpus is deterministic; real corpora are read from shared
storage), and arrays are made global with
``jax.make_array_from_process_local_data``.

Tested with two CPU processes (Gloo collectives) in
tests/test_multihost.py — the same code path a real multi-slice TPU
deployment takes.
"""

from __future__ import annotations

from typing import Any


def initialize_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    **kwargs: Any,
) -> None:
    """``jax.distributed.initialize`` wrapper.  Must run before any JAX
    computation; after it, ``jax.devices()`` is the GLOBAL device list.
    On the CPU backend the cross-process collectives use Gloo."""
    import jax
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized (don't touch the backend to check:
        # jax.process_count() would itself initialize XLA)
    try:
        # CPU backend needs an explicit cross-process collectives impl
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # TPU backends have native ICI/DCN collectives
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_global(tree: Any, mesh, spec=None, spec_fn=None) -> Any:
    """Host-local (numpy/device) pytree → global jax.Arrays under
    ``mesh``.  Every process holds the SAME full host copy of each leaf
    (deterministic data pipeline / replicated init) and contributes the
    shards its local devices own via ``jax.make_array_from_callback`` —
    which is what lets PER-LEAF shardings (expert/tensor parallelism
    across hosts) work: a process slices its devices' blocks out of its
    full copy, whatever the leaf's PartitionSpec.

    ``spec``: one PartitionSpec for every leaf (default replicated).
    ``spec_fn(path, leaf) -> PartitionSpec``: per-leaf rule (e.g.
    ``parallel.expert.ep_spec`` under ep × distributed)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        p = spec_fn(path, leaf) if spec_fn is not None else (
            spec if spec is not None else P()
        )
        a = np.asarray(leaf)
        out.append(
            jax.make_array_from_callback(
                a.shape,
                NamedSharding(mesh, p),
                lambda idx, a=a: a[idx],
            )
        )
    return jax.tree_util.tree_unflatten(treedef, out)
