"""Bench-scale decomposition of the conformer training step (VERDICT r4
#5): where do the 34 ms of the B=256, T'=104, D=384 headline step go,
component by component, against each component's GEMM roofline?

Method (the r3 identity-substitution method, now at bench scale):
variant runners are built with one module monkeypatched to an identity
/ reduced form, all variants are timed INTERLEAVED in one process
(tunnel drift, CLAUDE.md), medians of ``--rounds`` segment calls, each
call amortizing K=20 steps inside one jitted program (the ~36 ms
dispatch artifact / 20 steps < 2 ms/step noise floor; differences
between variants cancel it entirely).

Run on the real chip from /root/repo:

    nohup python scripts/conformer_decomposition.py > /tmp/decomp.log &
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
    ap.add_argument("--out", default="/tmp/conformer_decomp.json")
    args = ap.parse_args()

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
    base_cfg = Seq2SeqConfig(
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
        ),
    )

    optimizer = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
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
    K = EPOCHS * ((N_SENT + B - 1) // B)  # 20 steps / segment call
    subj = jnp.zeros((K,), jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, N_SENT, size=(K, B)), jnp.int32
    )

    def force(tree):
        return float(jnp.sum(jax.tree.leaves(tree)[0]))

    ORIG = dict(
        _layernorm=cf._layernorm, _rotary=cf._rotary,
        _attention=cf._attention, _conv_module=cf._conv_module,
        _ffn=cf._ffn,
    )

    def identity_ln(p, x, eps=1e-6):
        return x

    def identity_rotary(x, positions):
        return x

    def attn_off(p, x, config, lengths, positions, cd):
        return jnp.zeros_like(x)

    def attn_gemms_only(p, x, config, lengths, positions, cd):
        # LN + qkv projection + output projection; no rotary / scores /
        # softmax / combine — the delta vs base is the attention's
        # non-projection cost
        B_, T_, D = x.shape
        H = config.num_heads
        xn = cf._layernorm(p["ln"], x)
        qkv = cf._dot(xn, p["wqkv"], cd).reshape(B_, T_, 3, H, D // H)
        return cf._dot(qkv[:, :, 2].reshape(B_, T_, D), p["wo"], cd)

    def attn_nosoftmax(p, x, config, lengths, positions, cd):
        # everything but the f32 mask+softmax chain: scores GEMM →
        # uniform scale → combine GEMM.  Delta vs base isolates the
        # softmax/mask elementwise traffic on the (B, H, T, T) logits
        B_, T_, D = x.shape
        H = config.num_heads
        Dh = D // H
        xn = cf._layernorm(p["ln"], x)
        qkv = cf._dot(xn, p["wqkv"], cd).reshape(B_, T_, 3, H, Dh)
        q = cf._rotary(qkv[:, :, 0], positions)
        k = cf._rotary(qkv[:, :, 1], positions)
        v = qkv[:, :, 2]
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(Dh)
        attn = (logits * (1.0 / T_)).astype(cd)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B_, T_, D)
        return cf._dot(out, p["wo"], cd)

    def conv_off(p, x, tail=None, cd=jnp.float32, valid=None):
        B_, T_, D = x.shape
        K_ = p["dw"].shape[0]
        nt = tail if tail is not None else jnp.zeros((B_, K_ - 1, D), x.dtype)
        return jnp.zeros_like(x), nt

    def ffn_off(p, x, cd):
        return jnp.zeros_like(x)

    VARIANTS = [
        ("base", {}),
        ("no_ln", {"_layernorm": identity_ln}),
        ("no_rotary", {"_rotary": identity_rotary}),
        ("no_attn", {"_attention": attn_off}),
        ("attn_gemms_only", {"_attention": attn_gemms_only}),
        ("attn_nosoftmax", {"_attention": attn_nosoftmax}),
        ("no_conv", {"_conv_module": conv_off}),
        ("no_ffn", {"_ffn": ffn_off}),
    ]

    runners = {}
    for name, patches in VARIANTS:
        cfg = base_cfg
        params = init_seq2seq(jax.random.PRNGKey(3), cfg)
        state = TrainState(
            params=params, ema=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params),
            epoch=jnp.asarray(0, jnp.int32),
        )
        for k_, v_ in patches.items():
            setattr(cf, k_, v_)
        try:
            runner = make_segment_runner(cfg, optimizer, {}, 0.99)
            t0 = time.perf_counter()
            state, metrics = runner(
                state, data, subj, idx, jax.random.PRNGKey(4), EPOCHS
            )
            force(metrics)  # compile + warmup happens WHILE patched
            print(f"[compile] {name}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
        finally:
            for k_ in patches:
                setattr(cf, k_, ORIG[k_])
        runners[name] = (runner, state)

    # the no-encoder floor: decoder + aux head + losses + adam + EMA
    cfg0 = dataclasses.replace(
        base_cfg, conformer=base_cfg.conformer._replace(num_blocks=0)
    )
    params0 = init_seq2seq(jax.random.PRNGKey(3), cfg0)
    state0 = TrainState(
        params=params0, ema=jax.tree.map(jnp.copy, params0),
        opt_state=optimizer.init(params0), epoch=jnp.asarray(0, jnp.int32),
    )
    r0 = make_segment_runner(cfg0, optimizer, {}, 0.99)
    t0 = time.perf_counter()
    s0, m0 = r0(state0, data, subj, idx, jax.random.PRNGKey(4), EPOCHS)
    force(m0)
    print(f"[compile] blocks0: {time.perf_counter()-t0:.1f}s", flush=True)
    runners["blocks0"] = (r0, s0)

    # interleaved timed rounds
    times = {n: [] for n in runners}
    for rnd in range(args.rounds):
        for name, (runner, state) in runners.items():
            t0 = time.perf_counter()
            state, metrics = runner(
                state, data, subj, idx, jax.random.PRNGKey(10 + rnd), EPOCHS
            )
            force(metrics)
            dt = (time.perf_counter() - t0) / K * 1e3  # ms/step
            times[name].append(dt)
            runners[name] = (runner, state)
        print(f"[round {rnd}] " + " ".join(
            f"{n}={times[n][-1]:.2f}" for n in times), flush=True)

    med = {n: float(np.median(v)) for n, v in times.items()}
    base = med["base"]
    report = {"ms_per_step": med, "deltas_vs_base_ms": {
        n: round(base - m, 3) for n, m in med.items() if n != "base"
    }}

    # GEMM rooflines (fwd FLOPs ×3 for fwd+bwd, at the measured
    # sustained 146.9 TFLOP/s bf16 rate)
    D, F, H = 384, 1536, 6
    Tp = T // 12  # 104
    N = B * Tp
    SUSTAINED = 146.9e12
    fl = {
        "ffn_per_block": 2 * (2 * N * D * F) * 2,   # two half-FFNs, 2 GEMMs each
        "attn_proj_per_block": 2 * N * D * 3 * D + 2 * N * D * D,
        "attn_scores_per_block": 2 * (2 * B * H * Tp * Tp * (D // H)),
        "conv_per_block": 2 * N * D * 2 * D + 2 * N * D * D,
        "in_proj": 2 * N * 100 * D,
        "subsample_conv": 2 * B * Tp * (12 * 469) * 100,
    }
    report["gemm_roofline_ms_fwdbwd"] = {
        k: round(3 * v / SUSTAINED * 1e3 * (4 if "per_block" in k else 1), 3)
        for k, v in fl.items()
    }
    print(json.dumps(report, indent=1))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
