"""Does the head-minor (btsh) dense-attention layout — adopted for the
2.45 ms TRAINING win — cost anything on the forward-only decode path?
(BENCH_r05 conformer decode read 4.6 % below r4; tunnel load is the
other suspect.)  Interleaved medians of the jitted greedy decode over
the bench corpus, head-minor (current source) vs head-major (the old
ordering, monkeypatched back).
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

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, greedy_decode, init_seq2seq,
    )

    B_CORPUS, T = 450, 1248
    cfg = Seq2SeqConfig(
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
            attention_impl="dense",
        ),
    )

    HEAD_MINOR = cf._attention_dense

    def dense_head_major(p, x, config, lengths, positions, cd):
        B_, T_, D = x.shape
        H = config.num_heads
        Dh = D // H
        xn = cf._layernorm(p["ln"], x)
        qkv = cf._dot(xn, p["wqkv"], cd).reshape(B_, T_, 3, H, Dh)
        q = cf._rotary(qkv[:, :, 0], positions)
        k = cf._rotary(qkv[:, :, 1], positions)
        v = qkv[:, :, 2]
        logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(
            jnp.float32
        ) / np.sqrt(Dh)
        mask = cf._chunk_causal_mask(
            positions, config.chunk_size, config.left_context
        )
        if lengths is not None:
            mask = mask[None, :, :] & (
                positions[None, None, :] < lengths[:, None, None]
            )
            mask = mask[:, None]
        else:
            mask = mask[None, None]
        logits = jnp.where(mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(cd)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B_, T_, D)
        return cf._dot(out, p["wo"], cd)

    params = init_seq2seq(jax.random.PRNGKey(3), cfg)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    inputs = jax.random.normal(ks[0], (B_CORPUS, T, 469), jnp.bfloat16)
    lengths = jnp.full((B_CORPUS,), T, jnp.int32)

    fns = {}
    for name, impl in [("head_minor", HEAD_MINOR),
                       ("head_major", dense_head_major)]:
        cf._attention_dense = impl
        try:
            fn = jax.jit(
                lambda p, x, l: greedy_decode(
                    p, cfg, x, l, jnp.asarray(0, jnp.int32)
                )
            )
            t0 = time.perf_counter()
            float(jnp.sum(fn(params, inputs, lengths)))
            print(f"[compile] {name}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
        finally:
            cf._attention_dense = HEAD_MINOR
        fns[name] = fn

    times = {n: [] for n in fns}
    for rnd in range(7):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(params, inputs, lengths)
            float(jnp.sum(out))
            times[name].append(
                3 * B_CORPUS / (time.perf_counter() - t0)
            )
        print(f"[round {rnd}] " + " ".join(
            f"{n}={times[n][-1]:.0f}" for n in times), flush=True)
    med = {n: float(np.median(v)) for n, v in times.items()}
    print(json.dumps({"decode_sent_per_sec": med}, indent=1))
    with open("/tmp/decode_layout.json", "w") as f:
        json.dump(med, f, indent=1)


if __name__ == "__main__":
    main()
