"""Attribute and attack the subsample-conv front end at bench scale.

The outside-blocks decomposition leaves ~6.9 ms in the blocks0 floor
after decoder (1.3), aux (0.6), Adam (~0) — far above the conv's
0.61 ms GEMM roofline.  Candidates: the grouped dot_general's lhs
loads, the raw 300 MB batch gather, loss/EMA bookkeeping.  This bench
compares, at blocks0 (max sensitivity) and at full scale:

* ``dotg``     — the current formulation (contract (stride, C) via
                 dot_general on the (T', stride, B, C) view)
* ``conv1tap`` — CONTROL, wrong values: decimate + single-tap GEMM
                 (1/12 the FLOPs and input bytes) — how much of the
                 cost scales with the conv at all
* ``convprim`` — XLA conv primitive, custom dimension numbers chosen
                 so the (T, B, C) input needs NO transpose
* ``reshape``  — materialized (T', B, stride·C) copy + plain GEMM
                 (the formulation the r1 measurement rejected at
                 reference/biLSTM scale)

Interleaved medians, as everywhere.  Run from /root/repo.
"""

import argparse
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
    ap.add_argument("--out", default="/tmp/conv_frontend.json")
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

    def mk_cfg(num_blocks):
        return Seq2SeqConfig(
            vocab_size=1809, num_subjects=1, in_channels=469,
            conv_sizes=(100,), decimation_factor=12,
            rnn_sizes=(400, 400, 400), aux_proj_sizes=(225,),
            aux_heads=(AuxHead("encoder_1_targets", "categorical", 45),),
            dec_embedding_size=150, dec_rnn_sizes=(800,), max_dec_len=20,
            compute_dtype=jnp.bfloat16, use_pallas_lstm=False,
            encoder_type="conformer",
            conformer=ConformerConfig(
                num_blocks=num_blocks, model_dim=384, num_heads=6,
                ffn_dim=1536, conv_kernel=8, chunk_size=16,
                left_context=1, attention_impl="dense",
            ),
        )

    ORIG = s2s.convolve_sequences

    def _layer0(params, config, xs, subject_idx):
        w = s2s._select_subject(params["subnet"]["conv"][0], subject_idx)
        stride = config.conv_strides[0]
        return w, stride

    def conv_1tap(params, config, xs, subject_idx, rng, train,
                  reverse_lengths=None):
        assert reverse_lengths is None
        w, stride = _layer0(params, config, xs, subject_idx)
        cd = config.compute_dtype
        T_, B_, C = xs.shape
        F = w["w"].shape[-1]
        w0 = w["w"].reshape(stride, C, F)[0].astype(cd)
        out = xs.astype(cd)[::stride] @ w0
        xs = jax.nn.relu(out + w["b"])
        rng, sub = jax.random.split(rng)
        return s2s._ff_dropout(sub, xs, config.FF_dropout, train)

    def conv_prim(params, config, xs, subject_idx, rng, train,
                  reverse_lengths=None):
        assert reverse_lengths is None
        w, stride = _layer0(params, config, xs, subject_idx)
        cd = config.compute_dtype
        T_, B_, C = xs.shape
        F = w["w"].shape[-1]
        wg = w["w"].reshape(stride, C, F).astype(cd)  # (H, I, O)
        dn = jax.lax.ConvDimensionNumbers(
            lhs_spec=(1, 2, 0),  # (T, B, C): batch=B, feature=C, spatial=T
            rhs_spec=(2, 1, 0),  # (H, I, O): out=F, in=C, spatial=H
            out_spec=(1, 2, 0),  # (T', B, F)
        )
        # no preferred_element_type: its conv-VJP dtype plumbing breaks
        # under bf16 (cotangent f32 vs lhs bf16).  TPU convs accumulate
        # f32 internally either way; only the output rounding differs —
        # timing-equivalent, numerics resolved properly if this wins.
        out = jax.lax.conv_general_dilated(
            xs.astype(cd), wg, window_strides=(stride,), padding="VALID",
            dimension_numbers=dn,
        ).astype(jnp.float32)
        xs = jax.nn.relu(out + w["b"])
        rng, sub = jax.random.split(rng)
        return s2s._ff_dropout(sub, xs, config.FF_dropout, train)

    def conv_reshape(params, config, xs, subject_idx, rng, train,
                     reverse_lengths=None):
        assert reverse_lengths is None
        w, stride = _layer0(params, config, xs, subject_idx)
        cd = config.compute_dtype
        T_, B_, C = xs.shape
        F = w["w"].shape[-1]
        T_out = T_ // stride
        xs_g = (
            xs.astype(cd)[: T_out * stride]
            .reshape(T_out, stride, B_, C)
            .transpose(0, 2, 1, 3)
            .reshape(T_out, B_, stride * C)
        )
        out = jnp.einsum(
            "tbk,kf->tbf", xs_g, w["w"].reshape(stride * C, F).astype(cd),
            preferred_element_type=jnp.float32,
        )
        xs = jax.nn.relu(out + w["b"])
        rng, sub = jax.random.split(rng)
        return s2s._ff_dropout(sub, xs, config.FF_dropout, train)

    optimizer = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
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

    VARIANTS = [
        ("b0_dotg", 0, None),
        ("b0_1tap", 0, conv_1tap),
        ("b0_convprim", 0, conv_prim),
        ("b0_reshape", 0, conv_reshape),
        ("full_dotg", 4, None),
        ("full_convprim", 4, conv_prim),
    ]

    runners = {}
    for name, nb, patch in VARIANTS:
        cfg = mk_cfg(nb)
        params = init_seq2seq(jax.random.PRNGKey(3), cfg)
        state = TrainState(
            params=params, ema=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params), epoch=jnp.asarray(0, jnp.int32),
        )
        if patch is not None:
            s2s.convolve_sequences = patch
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
            s2s.convolve_sequences = ORIG
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
    print(json.dumps({"ms_per_step": med}, indent=1))
    with open(args.out, "w") as f:
        json.dump(med, f, indent=1)


if __name__ == "__main__":
    main()
