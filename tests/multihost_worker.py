"""Worker script for the 2-process multi-host dp test (invoked by
tests/test_multihost.py via subprocess).  Each process gets 4 virtual
CPU devices; the dp mesh spans all 8 across both processes (Gloo
collectives over the coordinator) — the same code path a multi-slice
TPU deployment takes over DCN.

argv: process_id num_processes port workdir
"""

import json
import os
import sys


def main() -> None:
    process_id, num_processes, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
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
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
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
        },
        VERBOSE=False,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes
    assert tr.mesh.shape["data"] == 4 * num_processes

    history = tr.fit(num_epochs=4, assess=False)
    # report the final loss so the parent can assert cross-process
    # agreement (replicated state ⇒ identical metrics)
    import jax.numpy as jnp

    loss = float(
        jnp.sum(jax.tree.leaves(tr.state.params)[0].astype(jnp.float32))
    )
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
