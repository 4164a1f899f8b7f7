"""Measure the fused Pallas LayerNorm against the XLA path inside the
FULL conformer training step at bench scale (B=256, T'=104, D=384),
on the head-minor (btsh) attention base.  The r5 decomposition puts
all 17 layernorms at 3.6 ms of the ~32.6 ms step; the kernel's bound
is one bf16 read + one bf16 write per row, so the most it can reclaim
is ~2 ms.  Interleaved medians, as everywhere.
"""

import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, init_seq2seq,
    )
    from ecog2txt_tpu.ops.pallas_layernorm import layer_norm
    from ecog2txt_tpu.train import TrainState, make_segment_runner

    B, N_SENT, T = 256, 450, 1248
    cfg = Seq2SeqConfig(
        vocab_size=1809, num_subjects=1, in_channels=469,
        conv_sizes=(100,), decimation_factor=12,
        rnn_sizes=(400, 400, 400), aux_proj_sizes=(225,),
        aux_heads=(AuxHead("encoder_1_targets", "categorical", 45),),
        dec_embedding_size=150, dec_rnn_sizes=(800,), max_dec_len=20,
        compute_dtype=jnp.bfloat16, use_pallas_lstm=False,
        encoder_type="conformer",
        conformer=ConformerConfig(
            num_blocks=4, model_dim=384, num_heads=6,
            ffn_dim=1536, conv_kernel=8, chunk_size=16,
            left_context=1, attention_impl="dense",
        ),
    )

    ORIG_LN = cf._layernorm

    def pallas_ln(p, x, eps=1e-6):
        if x.shape[-1] % 128 == 0:
            return layer_norm(x, p["g"], p["b"], eps)
        return ORIG_LN(p, x, eps)

    optimizer = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    data = {
        "encoder_inputs": jax.random.normal(
            ks[0], (1, N_SENT, T, cfg.in_channels), jnp.bfloat16
        ),
        "encoder_lengths": jnp.full((1, N_SENT), T, jnp.int32),
        "decoder_targets": jax.random.randint(
            ks[1], (1, N_SENT, 12), 3, cfg.vocab_size, jnp.int32
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

    runners = {}
    for name, patch in [("xla_ln", None), ("pallas_ln", pallas_ln)]:
        params = init_seq2seq(jax.random.PRNGKey(3), cfg)
        state = TrainState(
            params=params, ema=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params),
            epoch=jnp.asarray(0, jnp.int32),
        )
        if patch is not None:
            cf._layernorm = patch
        try:
            runner = make_segment_runner(cfg, optimizer, {}, 0.99)
            t0 = time.perf_counter()
            state, metrics = runner(
                state, data, subj, idx, jax.random.PRNGKey(4), EPOCHS
            )
            force(metrics)
            print(f"[compile] {name}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
        finally:
            cf._layernorm = ORIG_LN
        runners[name] = (runner, state)

    times = {n: [] for n in runners}
    for rnd in range(5):
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
    print(json.dumps({"ms_per_step": med}, indent=1))
    with open("/tmp/ln_bench.json", "w") as f:
        json.dump(med, f, indent=1)


if __name__ == "__main__":
    main()
