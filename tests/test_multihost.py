"""Multi-host (DCN) data parallelism: two CPU processes, one global
dp mesh (SURVEY §2.9 elastic/multi-node row — absent in the reference;
VERDICT #8).  Each process owns 4 virtual devices; the trainer's
``SN_kwargs['distributed']`` bootstraps jax.distributed and the dp
mesh spans all 8 devices across both processes."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)), env.get("PYTHONPATH", "")]
    )
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_p{pid}.json") as f:
            results.append(json.load(f))
    # global mesh seen by both processes; replicated state stays in
    # lockstep (bitwise-identical parameters after training)
    assert all(r["devices"] == 8 for r in results)
    assert all(r["epoch"] == 4 for r in results)
    assert results[0]["param_sum"] == pytest.approx(
        results[1]["param_sum"], rel=0, abs=0
    )
    # multi-controller checkpointing: both processes saved the SAME
    # shared checkpoint and restored identical params from it
    assert all(r["restored_ok"] for r in results)
    assert results[0]["ckpt_path"] == results[1]["ckpt_path"]
