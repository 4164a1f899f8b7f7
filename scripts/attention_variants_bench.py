"""Attribute the dense attention's ~5.5 ms-over-roofline at bench scale
(B=256, T'=104, D=384, H=6, Dh=64) and test the candidate fixes:

* ``btsh``    — same math, head-minor einsum ordering (no q/k transpose
                to head-major; output (B,T,S,H)); XLA may pick cheaper
                layouts.
* ``noxpose`` — TIMING-ONLY upper bound: q/k/v "reshaped" straight to
                (B,H,T,Dh) without the real transpose (wrong values,
                identical shapes/layouts) — what eliminating every
                layout change could buy.
* ``h3``      — num_heads=3 (Dh=128): full 128-lane contractions in the
                scores/combine GEMMs, half the bmm count, same FLOPs.
                A REAL architecture variant (quality re-checked
                separately if it wins).
* ``h3_btsh`` — both.

Interleaved medians over the full training step, as everywhere.
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
    from ecog2txt_tpu.train import TrainState, make_segment_runner

    B, N_SENT, T = 256, 450, 1248

    def cfg_for(num_heads):
        return Seq2SeqConfig(
            vocab_size=1809, num_subjects=1, in_channels=469,
            conv_sizes=(100,), decimation_factor=12,
            rnn_sizes=(400, 400, 400), aux_proj_sizes=(225,),
            aux_heads=(AuxHead("encoder_1_targets", "categorical", 45),),
            dec_embedding_size=150, dec_rnn_sizes=(800,), max_dec_len=20,
            compute_dtype=jnp.bfloat16, use_pallas_lstm=False,
            encoder_type="conformer",
            conformer=ConformerConfig(
                num_blocks=4, model_dim=384, num_heads=num_heads,
                ffn_dim=1536, conv_kernel=8, chunk_size=16,
                left_context=1, attention_impl="dense",
            ),
        )

    ORIG_DENSE = cf._attention_dense

    def dense_btsh(p, x, config, lengths, positions, cd):
        B_, T_, D = x.shape
        H = config.num_heads
        Dh = D // H
        xn = cf._layernorm(p["ln"], x)
        qkv = cf._dot(xn, p["wqkv"], cd).reshape(B_, T_, 3, H, Dh)
        q = cf._rotary(qkv[:, :, 0], positions)
        k = cf._rotary(qkv[:, :, 1], positions)
        v = qkv[:, :, 2]
        logits = jnp.einsum("bthd,bshd->btsh", q, k).astype(
            jnp.float32
        ) / np.sqrt(Dh)
        mask = cf._chunk_causal_mask(
            positions, config.chunk_size, config.left_context
        )
        if lengths is not None:
            mask = mask[None, :, :] & (
                positions[None, None, :] < lengths[:, None, None]
            )
            mask = mask[..., None]  # (B, T, S, 1)
        else:
            mask = mask[None, :, :, None]
        logits = jnp.where(mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=2).astype(cd)
        out = jnp.einsum("btsh,bshd->bthd", attn, v).reshape(B_, T_, D)
        return cf._dot(out, p["wo"], cd)

    def dense_noxpose(p, x, config, lengths, positions, cd):
        # TIMING ONLY: reshape (B,T,H,Dh)->(B,H,T,Dh) without moving
        # data — wrong values, but the exact op graph minus transposes
        B_, T_, D = x.shape
        H = config.num_heads
        Dh = D // H
        xn = cf._layernorm(p["ln"], x)
        qkv = cf._dot(xn, p["wqkv"], cd).reshape(B_, T_, 3, H, Dh)
        q = cf._rotary(qkv[:, :, 0], positions).reshape(B_, H, T_, Dh)
        k = cf._rotary(qkv[:, :, 1], positions).reshape(B_, H, T_, Dh)
        v = qkv[:, :, 2].reshape(B_, H, T_, Dh)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(
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
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v).reshape(B_, T_, D)
        return cf._dot(out, p["wo"], cd)

    VARIANTS = [
        ("base_h6", 6, None),
        ("btsh_h6", 6, dense_btsh),
        ("noxpose_h6", 6, dense_noxpose),
        ("h3", 3, None),
        ("h3_btsh", 3, dense_btsh),
        ("h2", 2, None),
    ]

    optimizer = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    base_cfg = cfg_for(6)
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
    for name, H, patch in VARIANTS:
        cfg = cfg_for(H)
        params = init_seq2seq(jax.random.PRNGKey(3), cfg)
        state = TrainState(
            params=params, ema=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params),
            epoch=jnp.asarray(0, jnp.int32),
        )
        if patch is not None:
            cf._attention_dense = patch
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
            cf._attention_dense = ORIG_DENSE
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
    with open("/tmp/attn_variants.json", "w") as f:
        json.dump(med, f, indent=1)


if __name__ == "__main__":
    main()
