"""Decompose the NON-encoder floor of the bench-scale training step.

The r5 block-level decomposition (scripts/conformer_decomposition.py)
leaves a 9.1 ms `blocks0` floor — subsample conv + decoder + aux head
+ losses + Adam + EMA — with only ~0.65 ms of GEMM roofline.  This
script ablates that floor: teacher-forced decoder off, aux head off,
Adam+clip → plain SGD.  Same method as everywhere: interleaved medians
of 20-step jitted segments on the real chip.

Run from /root/repo:  nohup python scripts/outside_blocks_decomposition.py &
"""

import argparse
import dataclasses
import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--out", default="/tmp/outside_blocks_decomp.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    import ecog2txt_tpu.models.seq2seq as s2s
    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, init_seq2seq,
    )
    from ecog2txt_tpu.train import TrainState, make_segment_runner

    B, N_SENT, T = 256, 450, 1248

    def mk_cfg(num_blocks, aux):
        return Seq2SeqConfig(
            vocab_size=1809, num_subjects=1, in_channels=469,
            conv_sizes=(100,), decimation_factor=12,
            rnn_sizes=(400, 400, 400), aux_proj_sizes=(225,),
            aux_heads=(
                (AuxHead("encoder_1_targets", "categorical", 45),)
                if aux else ()
            ),
            dec_embedding_size=150, dec_rnn_sizes=(800,), max_dec_len=20,
            compute_dtype=jnp.bfloat16, use_pallas_lstm=False,
            encoder_type="conformer",
            conformer=ConformerConfig(
                num_blocks=num_blocks, model_dim=384, num_heads=6,
                ffn_dim=1536, conv_kernel=8, chunk_size=16,
                left_context=1, attention_impl="dense",
            ),
        )

    adam = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    sgd = optax.sgd(1e-3)

    ORIG_DEC = s2s.decoder_teacher_forcing

    def dec_off(params, config, enc_final, targets, rng, train=False,
                enc_out=None, enc_lengths=None):
        B_, L = targets.shape
        return jnp.zeros((L, B_, config.vocab_size), config.compute_dtype)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    data = {
        "encoder_inputs": jax.random.normal(
            ks[0], (1, N_SENT, T, 469), jnp.bfloat16
        ),
        "encoder_lengths": jnp.full((1, N_SENT), T, jnp.int32),
        "decoder_targets": jax.random.randint(
            ks[1], (1, N_SENT, 12), 3, 1809, jnp.int32
        ),
        "decoder_lengths": jnp.full((1, N_SENT), 12, jnp.int32),
        "encoder_1_targets": jax.random.randint(
            ks[2], (1, N_SENT, T), 0, 45, jnp.int32
        ),
    }
    EPOCHS = 10
    K = EPOCHS * ((N_SENT + B - 1) // B)
    subj = jnp.zeros((K,), jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, N_SENT, size=(K, B)), jnp.int32
    )

    def force(tree):
        return float(jnp.sum(jax.tree.leaves(tree)[0]))

    # (name, num_blocks, aux, optimizer, patch_decoder)
    VARIANTS = [
        ("full_base", 4, True, adam, False),
        ("blocks0", 0, True, adam, False),
        ("b0_nodec", 0, True, adam, True),
        ("b0_noaux", 0, False, adam, False),
        ("b0_sgd", 0, True, sgd, False),
        ("b0_floor", 0, False, sgd, True),
    ]

    runners = {}
    for name, nb, aux, opt, patch_dec in VARIANTS:
        cfg = mk_cfg(nb, aux)
        params = init_seq2seq(jax.random.PRNGKey(3), cfg)
        state = TrainState(
            params=params, ema=jax.tree.map(jnp.copy, params),
            opt_state=opt.init(params), epoch=jnp.asarray(0, jnp.int32),
        )
        if patch_dec:
            s2s.decoder_teacher_forcing = dec_off
        try:
            runner = make_segment_runner(cfg, opt, {}, 0.99)
            t0 = time.perf_counter()
            state, metrics = runner(
                state, data, subj, idx, jax.random.PRNGKey(4), EPOCHS
            )
            force(metrics)
            print(f"[compile] {name}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
        finally:
            s2s.decoder_teacher_forcing = ORIG_DEC
        runners[name] = (runner, state)

    times = {n: [] for n in runners}
    for rnd in range(args.rounds):
        for name, (runner, state) in runners.items():
            t0 = time.perf_counter()
            state, metrics = runner(
                state, data, subj, idx, jax.random.PRNGKey(10 + rnd), EPOCHS
            )
            force(metrics)
            times[name].append((time.perf_counter() - t0) / K * 1e3)
            runners[name] = (runner, state)
        print(f"[round {rnd}] " + " ".join(
            f"{n}={times[n][-1]:.2f}" for n in times), flush=True)

    med = {n: float(np.median(v)) for n, v in times.items()}
    b0 = med["blocks0"]
    report = {
        "ms_per_step": med,
        "deltas_vs_blocks0_ms": {
            n: round(b0 - m, 3) for n, m in med.items()
            if n.startswith("b0_")
        },
    }
    print(json.dumps(report, indent=1))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
