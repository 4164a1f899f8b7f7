"""Attention-impl comparison at BENCH scale (B=256, T'=104, D=384):
dense (the current auto pick below T'=512) vs flash (Pallas banded
kernel, scores never leave VMEM) vs fused (LN+qkv+rotary in-kernel)
vs banded (XLA windowed), through the FULL training step, interleaved
medians — the r5 decomposition showed the dense scores/softmax/combine
core costs ~7.7 ms against a 0.35 ms FLOP roofline (f32 logits HBM
traffic + sub-tile GEMMs), which is the step's one remaining lever.

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        scripts/attention_impl_bench.py > /tmp/attn_impl.log &
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

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, init_seq2seq,
    )
    from ecog2txt_tpu.train import TrainState, make_segment_runner

    B, N_SENT, T = 256, 450, 1248

    def cfg_for(impl):
        return Seq2SeqConfig(
            vocab_size=1809, num_subjects=1, in_channels=469,
            conv_sizes=(100,), decimation_factor=12,
            rnn_sizes=(400, 400, 400), aux_proj_sizes=(225,),
            aux_heads=(AuxHead("encoder_1_targets", "categorical", 45),),
            dec_embedding_size=150, dec_rnn_sizes=(800,), max_dec_len=20,
            compute_dtype=jnp.bfloat16, use_pallas_lstm=False,
            encoder_type="conformer",
            conformer=ConformerConfig(
                num_blocks=4, model_dim=384, num_heads=6, ffn_dim=1536,
                conv_kernel=8, chunk_size=16, left_context=1,
                attention_impl=impl,
            ),
        )

    optimizer = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    base_cfg = cfg_for("dense")
    data = {
        "encoder_inputs": jax.random.normal(
            ks[0], (1, N_SENT, T, base_cfg.in_channels), jnp.bfloat16
        ),
        "encoder_lengths": jnp.full((1, N_SENT), T, jnp.int32),
        "decoder_targets": jax.random.randint(
            ks[1], (1, N_SENT, 12), 3, base_cfg.vocab_size, jnp.int32
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
    for impl in ("dense", "flash", "fused", "banded"):
        cfg = cfg_for(impl)
        params = init_seq2seq(jax.random.PRNGKey(3), cfg)
        state = TrainState(
            params=params, ema=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params),
            epoch=jnp.asarray(0, jnp.int32),
        )
        runner = make_segment_runner(cfg, optimizer, {}, 0.99)
        t0 = time.perf_counter()
        try:
            state, metrics = runner(
                state, data, subj, idx, jax.random.PRNGKey(4), EPOCHS
            )
            force(metrics)
        except Exception as e:  # a kernel may not support this scale
            print(f"[skip] {impl}: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"[compile] {impl}: {time.perf_counter()-t0:.1f}s", flush=True)
        runners[impl] = (runner, state)

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
    with open("/tmp/attn_impl.json", "w") as f:
        json.dump(med, f, indent=1)


if __name__ == "__main__":
    main()
