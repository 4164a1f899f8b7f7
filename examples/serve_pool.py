"""Multi-tenant streaming serving demo: N concurrent live streams
through one StreamingSessionPool, batched on-device.

Usage:
    python examples/serve_pool.py [workdir] [--streams N] [--epochs E]

Trains a small conformer on the synthetic corpus, then plays several
validation utterances AS CONCURRENT STREAMS with different start times
and ragged packet sizes through one pool, checking every final
hypothesis against (a) a dedicated single-stream session and (b) the
offline batch decode — all three must agree exactly.

Reference context: the reference serves one predictor per TF session
(trainers.py:925-949); batching independently-clocked streams through
one jitted step is the TPU-first throughput lever (measured 3.5×,
~81 real-time streams/chip — RESULTS.md)."""

import argparse
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# honor an explicit CPU request BEFORE backend init — the machine
# profile may export JAX_PLATFORMS=axon and the env var alone does not
# always win (see CLAUDE.md / tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("workdir", nargs="?", default=None)
    parser.add_argument("--streams", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=60)
    args = parser.parse_args()

    import numpy as np

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
    )
    from ecog2txt_tpu.train import MultiSubjectTrainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="ecog2txt_pool_")
    manifest = make_demo_experiment(
        os.path.join(workdir, "exp"), subject_ids=(1,),
        encoder_type="conformer", N_epochs=args.epochs,
    )
    trainer = MultiSubjectTrainer(
        manifest, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                   "learning_rate": 3e-3, "temperature": 0.0},
        VERBOSE=False,
    )
    print("training…")
    trainer.fit(assess=False)

    ds = trainer.packed_dataset("validation")
    n = min(args.streams, int(ds.num_trials[0]))
    utts = []
    for i in range(n):
        L = int(ds.encoder_lengths[0, i])
        utts.append(np.asarray(ds.encoder_inputs[0, i, :L], np.float32))

    pool = StreamingSessionPool.from_trainer(trainer, capacity=n)
    sessions = [
        StreamingConformerSession.from_trainer(trainer)
        for _ in range(n)
    ]
    offline = trainer.assess(["validation"])["validation"]["hypotheses"]

    # interleaved ragged playback: stream i joins after i·17 samples of
    # stream 0 have played, packets of 23 samples
    slots, pos = {}, {i: 0 for i in range(n)}
    PACKET = 23
    t = 0
    while any(pos[i] < len(utts[i]) for i in range(n)):
        for i in range(n):
            if i not in slots and t >= i * 17:
                slots[i] = pool.add()
            if i in slots and pos[i] < len(utts[i]):
                pkt = utts[i][pos[i] : pos[i] + PACKET]
                pool.push(slots[i], pkt)
                sessions[i].push(pkt)
                pos[i] += len(pkt)
        t += PACKET

    ok = 0
    for i in range(n):
        got = pool.endpoint(slots[i])["sequences"][0]
        single = sessions[i].endpoint()["sequences"][0]
        agree = got == single == offline[i]
        ok += agree
        print(f"stream {i}: pooled='{got}' single='{single}' "
              f"offline='{offline[i]}' agree={agree}")
    print(f"{ok}/{n} streams: pooled == dedicated == offline")
    if ok != n:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
