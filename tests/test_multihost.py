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


def _run_workers(tmp_path, mode="dp"):
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
            [
                sys.executable, worker, str(pid), "2", str(port),
                str(tmp_path), mode,
            ],
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
    return results


@pytest.mark.slow
def test_two_process_dp_training(tmp_path):
    results = _run_workers(tmp_path, mode="dp")
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


@pytest.mark.slow
def test_two_process_ep_training(tmp_path):
    """ep × distributed (VERDICT r3 next #1): a MoE conformer with
    expert_parallel=4 trains over a global 2-process (data=2, model=4)
    mesh — expert weights and Adam moments assembled sharded via
    multihost.make_global's per-leaf specs — and both processes stay in
    bitwise lockstep, including through a shared sharded checkpoint."""
    results = _run_workers(tmp_path, mode="ep")
    assert all(r["devices"] == 8 for r in results)
    assert all(r["epoch"] == 4 for r in results)
    assert results[0]["param_sum"] == pytest.approx(
        results[1]["param_sum"], rel=0, abs=0
    )
    assert all(r["restored_ok"] for r in results)
    assert results[0]["ckpt_path"] == results[1]["ckpt_path"]
