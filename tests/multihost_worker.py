"""Worker script for the 2-process multi-host dp test (invoked by
tests/test_multihost.py via subprocess).  Each process gets 4 virtual
CPU devices; the dp mesh spans all 8 across both processes (Gloo
collectives over the coordinator) — the same code path a multi-slice
TPU deployment takes over DCN.

argv: process_id num_processes port workdir [mode]

``mode`` (default "dp"): "ep" trains a MoE conformer with
``expert_parallel=4`` over the global (data=2, model=4) mesh — the
ep × distributed composition (expert weights + Adam moments sharded
P('model'), assembled per process via multihost.make_global's
per-leaf specs).
"""

import json
import os
import sys


def main() -> None:
    process_id, num_processes, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    TINY = {
        "encoder_embedding": [16],
        "encoder_rnn": [24],
        "encoder_1_projection": [16],
        "decoder_embedding": [12],
        "decoder_rnn": [48],
        "decoder_projection": [],
    }
    # per-process experiment dirs; the synthetic corpus is deterministic,
    # so both processes build byte-identical datasets (SPMD lockstep)
    mp = make_demo_experiment(
        os.path.join(workdir, f"exp_p{process_id}"),
        subject_ids=(1,), layer_sizes=TINY,
    )
    SN_kwargs = {
        "batch_size": 16,
        "max_dec_len": 10,
        "learning_rate": 3e-3,
        "data_parallel": True,
        # SHARED checkpoint dir: all processes call save on the same
        # path; Orbax coordinates the multi-controller write
        "checkpoint_dir": os.path.join(workdir, "ckpts"),
        "distributed": {
            "coordinator_address": f"localhost:{port}",
            "num_processes": num_processes,
            "process_id": process_id,
        },
    }
    if mode == "ep":
        SN_kwargs.update(
            encoder_type="conformer",
            conformer=dict(
                num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
                conv_kernel=2, chunk_size=2, left_context=1,
                moe_experts=4, moe_topk=2,
            ),
            expert_parallel=4,
        )
    tr = MultiSubjectTrainer(mp, [1], SN_kwargs=SN_kwargs, VERBOSE=False)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes
    if mode == "ep":
        assert dict(tr.mesh.shape) == {
            "data": 4 * num_processes // 4, "model": 4
        }, dict(tr.mesh.shape)
    else:
        assert tr.mesh.shape["data"] == 4 * num_processes

    history = tr.fit(num_epochs=4, assess=False)
    # report the final loss so the parent can assert cross-process
    # agreement (replicated state ⇒ identical metrics)
    import jax.numpy as jnp

    loss = float(
        jnp.sum(jax.tree.leaves(tr.state.params)[0].astype(jnp.float32))
    )
    if mode == "ep":
        # the expert-stacked MoE leaves must ACTUALLY live sharded on
        # the model axis of the global (multi-process) mesh, and their
        # Adam moments with them
        from jax.sharding import PartitionSpec as P

        w1 = tr.state.params["encoder"]["conformer"]["blocks"][0][
            "ffn2"]["w1"]
        assert w1.sharding.spec == P("model"), w1.sharding
        sharded_moments = sum(
            1
            for leaf in jax.tree.leaves(tr.state.opt_state)
            if hasattr(leaf, "sharding")
            and getattr(leaf.sharding, "spec", None) == P("model")
        )
        assert sharded_moments >= 2, sharded_moments  # Adam mu + nu
        loss += float(jnp.sum(w1.astype(jnp.float32)))
    # multi-controller checkpointing: every process calls save on the
    # SAME shared path, then restores and must see identical params.
    # ASYNC save — restore() waits for the in-flight multi-controller
    # write, covering the checkpoint_every_assessment path too.
    path = tr.save_checkpoint(wait=False)
    before = jax.tree.map(
        lambda a: jnp.asarray(a).astype(jnp.float32), tr.state.params
    )
    tr.restore()
    restored_ok = all(
        bool(jnp.array_equal(a, jnp.asarray(b).astype(jnp.float32)))
        for a, b in zip(
            jax.tree.leaves(before), jax.tree.leaves(tr.state.params)
        )
    )
    out = {
        "process_id": process_id,
        "devices": len(jax.devices()),
        "param_sum": loss,
        "epoch": int(tr.state.epoch),
        "ckpt_path": path,
        "restored_ok": restored_ok,
    }
    with open(os.path.join(workdir, f"result_p{process_id}.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
