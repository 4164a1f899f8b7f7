"""Mixture-of-experts conformer + expert parallelism demo.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/moe_expert_parallel.py [workdir] [--epochs E]

Trains a MoE conformer (4 routed experts, top-2 gating) on the
synthetic corpus with the expert axis SHARDED over a dp=2 × ep=4 mesh
(`SN_kwargs['expert_parallel']` — expert weights and their Adam moments
live P('model'), everything else replicated), then:

* shows the router's load-balance aux loss in the training metrics,
* streams a validation utterance through `StreamingConformerSession`
  and checks it equals the offline decode EXACTLY (the default no-drop
  MoE is per-token, so the streamed == offline contract survives
  routing).

Reference context: the reference has no sparse-expert model at all —
this family (models/moe.py) and the dp/tp/sp/pp/ep parallelism matrix
(parallel/) are TPU-first extensions (PARITY §2.9)."""

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
    parser.add_argument("--epochs", type=int, default=60)
    args = parser.parse_args()
    workdir = args.workdir or tempfile.mkdtemp(prefix="moe_demo_")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.models.seq2seq import greedy_decode
    from ecog2txt_tpu.serve import StreamingConformerSession
    from ecog2txt_tpu.train import MultiSubjectTrainer

    n_dev = len(jax.devices())
    n_ep = 4 if n_dev >= 4 else 1
    sn = {
        "encoder_type": "conformer",
        "batch_size": 16,
        "temperature": 0.0,
        "learning_rate": 3e-3,
        "conformer": {
            "num_blocks": 2, "model_dim": 32, "num_heads": 2,
            "ffn_dim": 64, "chunk_size": 4, "left_context": 1,
            "conv_kernel": 4, "moe_experts": 4, "moe_topk": 2,
        },
    }
    if n_ep > 1:
        sn["data_parallel"] = True
        sn["expert_parallel"] = n_ep
    trainer = MultiSubjectTrainer(
        make_demo_experiment(workdir, subject_ids=(1,)), [1],
        SN_kwargs=sn, VERBOSE=True,
    )
    if trainer.mesh is not None:
        print(f"mesh: {dict(trainer.mesh.shape)} (experts sharded over "
              f"'model'; Adam moments too)")
    history = trainer.fit(num_epochs=args.epochs)
    last = history[list(history)[-1]]
    print(f"final val WER: {last['validation']['word_error_rate']:.3f}")

    # streamed == offline on the trained MoE weights
    params = jax.tree.map(jnp.asarray, jax.device_get(trainer.state.ema))
    cfg = trainer.net_config
    dec_list = trainer.target_subject.data_manifests[
        "decoder_targets"
    ].feature_list
    dev = trainer.device_data("validation")
    raw = np.asarray(jax.device_get(dev["encoder_inputs"][0]))[0]
    L = int(np.asarray(jax.device_get(dev["encoder_lengths"][0]))[0])
    d = cfg.decimation_factor
    T = ((L + d - 1) // d) * d
    inputs = np.zeros((1, T, raw.shape[-1]), np.float32)
    inputs[:, :L] = raw[:L]
    off = np.asarray(greedy_decode(
        params, cfg, jnp.asarray(inputs), jnp.asarray([L]),
        jnp.asarray(0, jnp.int32), temperature=0.0,
    ))
    sess = StreamingConformerSession(params, cfg, dec_list)
    for lo in range(0, L, 37):
        sess.push(raw[lo:lo + 37])
    out = sess.endpoint()
    assert np.array_equal(np.asarray(out["tokens"]), off), (
        "streamed MoE decode diverged from offline"
    )
    print(f"streamed == offline: {out['sequences']!r}")


if __name__ == "__main__":
    main()
