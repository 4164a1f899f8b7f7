"""Benchmark: MOCHA-TIMIT-scale train+decode throughput on one chip.

Reference-scale configuration (BASELINE.md): 16×16 grid bipolar (469
channels), trials ≤6.25 s @200 Hz (T=1248), vocab 1809; 450 training
sentences (~9 blocks × 50).

The HEADLINE metric is the framework's best training path for the
reference task — the chunked-causal conformer encoder (no serial
recurrence; every GEMM rides the MXU) at comparable parameter count —
through the full jitted training segment (loss+grad+adam+EMA, the
reference's per-epoch hot loop, SURVEY §3.3) plus its greedy decode
and single-utterance latency.  The reference's own architecture (conv
[100] stride 12 → 3×400 biLSTM → dec emb 150 / LSTM 800) is reported
alongside (``bilstm_*``).  B=256: the r4 batch sweep (RESULTS.md)
showed the biLSTM's serial-step wall amortizes over rows — 256 beats
128 by 11 % and 450 (padded to 512) loses it again.

``vs_baseline`` = projected full-run time (800 epochs training + 80
assessment decodes, the reference schedule) against the 10-minute
north-star budget from BASELINE.json — >1.0 means the whole reference
experiment fits inside the target.

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ecog2txt_tpu.models.seq2seq import (
        AuxHead,
        Seq2SeqConfig,
        greedy_decode,
        init_seq2seq,
    )
    from ecog2txt_tpu.train import TrainState, make_segment_runner

    B = 256
    N_SENT = 450
    T = 1248
    config = Seq2SeqConfig(
        vocab_size=1809,
        num_subjects=1,
        in_channels=469,
        conv_sizes=(100,),
        decimation_factor=12,
        rnn_sizes=(400, 400, 400),
        aux_proj_sizes=(225,),
        aux_heads=(AuxHead("encoder_1_targets", "categorical", 45),),
        dec_embedding_size=150,
        dec_rnn_sizes=(800,),
        max_dec_len=20,
        compute_dtype=jnp.bfloat16,
        use_pallas_lstm=True,
    )

    rng = jax.random.PRNGKey(0)
    params = init_seq2seq(rng, config)
    optimizer = optax.chain(
        optax.clip_by_global_norm(10.0), optax.adam(1e-3)
    )
    state = TrainState(
        params=params,
        ema=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
        epoch=jnp.asarray(0, jnp.int32),
    )
    runner = make_segment_runner(config, optimizer, {}, 0.99)

    ks = jax.random.split(rng, 4)
    data = {
        # corpus stored bf16 on device (what trainer.device_data does
        # under bf16 compute): halves per-step batch-gather traffic
        "encoder_inputs": jax.random.normal(
            ks[0], (1, N_SENT, T, config.in_channels), jnp.bfloat16
        ),
        "encoder_lengths": jnp.full((1, N_SENT), T, jnp.int32),
        "decoder_targets": jax.random.randint(
            ks[1], (1, N_SENT, 12), 3, config.vocab_size, jnp.int32
        ),
        "decoder_lengths": jnp.full((1, N_SENT), 12, jnp.int32),
        "encoder_1_targets": jax.random.randint(
            ks[2], (1, N_SENT, T), 0, 45, jnp.int32
        ),
    }

    EPOCHS_PER_SEGMENT = 10
    steps_per_epoch = (N_SENT + B - 1) // B
    K = EPOCHS_PER_SEGMENT * steps_per_epoch
    host_rng = np.random.default_rng(0)
    subj = jnp.zeros((K,), jnp.int32)
    idx = jnp.asarray(
        host_rng.integers(0, N_SENT, size=(K, B)), jnp.int32
    )

    # NOTE on timing: under the axon TPU tunnel `block_until_ready` can
    # return before execution finishes — force completion with a scalar
    # round trip that depends on the final state instead.
    def force(tree) -> float:
        leaf = jax.tree.leaves(tree)[0]
        return float(jnp.sum(leaf))

    # warmup (compile)
    state, metrics = runner(
        state, data, subj, idx, jax.random.PRNGKey(1), EPOCHS_PER_SEGMENT
    )
    force(metrics)

    t0 = time.perf_counter()
    REPS = 3
    for r in range(REPS):
        state, metrics = runner(
            state, data, subj, idx, jax.random.PRNGKey(2 + r), EPOCHS_PER_SEGMENT
        )
    force(metrics)  # depends on every step of every segment
    train_time = time.perf_counter() - t0
    bilstm_sent_per_sec = REPS * K * B / train_time

    # model-FLOP utilization (matmul FLOPs; bwd = 2× fwd) against the
    # v5e bf16 peak — the efficiency axis VERDICT r1 asked for
    from ecog2txt_tpu.utils.flops import (
        TPU_V5E_BF16_PEAK_FLOPS,
        mfu,
        seq2seq_forward_flops,
        train_step_flops,
    )

    bilstm_flops = train_step_flops(config, T, dec_len=12)
    bilstm_mfu = mfu(bilstm_sent_per_sec, bilstm_flops)

    # ---- conformer encoder variant (BASELINE configs[4]) ------------
    # Same data/decoder/loss; encoder swapped for chunked-causal
    # conformer blocks at comparable parameter count (~14 M encoder).
    # The biLSTM's recurrence is a serial per-step chain (the measured
    # wall, RESULTS.md); the conformer is pure batched GEMMs — this
    # quantifies the architectural lever on the same chip.
    import dataclasses

    from ecog2txt_tpu.models.conformer import ConformerConfig

    conf_config = dataclasses.replace(
        config,
        encoder_type="conformer",
        conformer=ConformerConfig(
            num_blocks=4, model_dim=384, num_heads=6, ffn_dim=1536,
            conv_kernel=8, chunk_size=16, left_context=1,
        ),
        use_pallas_lstm=False,
    )
    conf_params = init_seq2seq(jax.random.PRNGKey(3), conf_config)
    conf_state = TrainState(
        params=conf_params,
        ema=jax.tree.map(jnp.copy, conf_params),
        opt_state=optimizer.init(conf_params),
        epoch=jnp.asarray(0, jnp.int32),
    )
    conf_runner = make_segment_runner(conf_config, optimizer, {}, 0.99)
    conf_state, metrics = conf_runner(
        conf_state, data, subj, idx, jax.random.PRNGKey(4), EPOCHS_PER_SEGMENT
    )
    force(metrics)  # warmup/compile
    t0 = time.perf_counter()
    for r in range(REPS):
        conf_state, metrics = conf_runner(
            conf_state, data, subj, idx, jax.random.PRNGKey(5 + r),
            EPOCHS_PER_SEGMENT,
        )
    force(metrics)
    conf_sent_per_sec = REPS * K * B / (time.perf_counter() - t0)
    conf_flops = train_step_flops(conf_config, T, dec_len=12)
    conf_mfu = mfu(conf_sent_per_sec, conf_flops)

    # decode throughput (assessment path), 450-sentence pass, on the
    # headline architecture's EMA params
    @jax.jit
    def decode(params, inputs, lengths):
        return greedy_decode(
            params, conf_config, inputs, lengths, jnp.asarray(0, jnp.int32)
        )

    dec_in = data["encoder_inputs"][0]
    dec_len = data["encoder_lengths"][0]
    out = decode(conf_state.ema, dec_in, dec_len)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(3):
        out = decode(conf_state.ema, dec_in, dec_len)
    float(jnp.sum(out))
    decode_sent_per_sec = 3 * N_SENT / (time.perf_counter() - t0)
    decode_flops = seq2seq_forward_flops(
        conf_config, T, dec_len=conf_config.max_dec_len
    )
    decode_mfu = mfu(decode_sent_per_sec, decode_flops)

    # biLSTM (reference-architecture) decode throughput — the best
    # decode number the framework can post (VERDICT r4 weak #6: the r3
    # 19 k sent/s path must stay reported alongside the conformer)
    @jax.jit
    def bilstm_decode(params, inputs, lengths):
        return greedy_decode(
            params, config, inputs, lengths, jnp.asarray(0, jnp.int32)
        )

    dec_in_f = data["encoder_inputs"][0]
    dec_len_f = data["encoder_lengths"][0]
    out = bilstm_decode(state.ema, dec_in_f, dec_len_f)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(3):
        out = bilstm_decode(state.ema, dec_in_f, dec_len_f)
    float(jnp.sum(out))
    bilstm_decode_sent_per_sec = 3 * N_SENT / (time.perf_counter() - t0)

    # online-serving latency: ONE utterance through the full
    # encoder+decoder (the construct_online_predictor path)
    one_in = dec_in[:1]
    one_len = dec_len[:1]
    out = decode(conf_state.ema, one_in, one_len)
    float(jnp.sum(out))
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = decode(conf_state.ema, one_in, one_len)
        float(jnp.sum(out))  # forced round trip = end-to-end latency
        lat.append(time.perf_counter() - t0)
    serve_latency_ms = sorted(lat)[len(lat) // 2] * 1e3

    # projected full reference run: 800 epochs train + 80 assessment
    # decodes over train+val (500 sentences each), on the headline path
    full_train_s = 800 * steps_per_epoch * B / conf_sent_per_sec
    full_decode_s = 80 * 2 * 500 / decode_sent_per_sec
    projected = full_train_s + full_decode_s
    vs_baseline = 600.0 / projected  # north star: <10 min (BASELINE.json)

    # long-continuous-recording TRAINING (BASELINE configs[4]): fwd+bwd
    # through the conformer encoder at T=8192 downsampled steps (~8.3
    # minutes of signal at 16.5 Hz) — only possible with the banded
    # O(T·window) attention (dense would need an 8192² score matrix per
    # head and OOMs at T≥1024 on this chip, RESULTS.md r3)
    from ecog2txt_tpu.models.conformer import conformer_encode

    ccfg = conf_config.conformer
    T_long, B_long = 8192, 16
    long_in = jax.random.normal(
        jax.random.PRNGKey(11), (B_long, T_long, 100), jnp.bfloat16
    )
    long_len = jnp.full((B_long,), T_long, jnp.int32)
    enc_params = conf_state.ema["encoder"]["conformer"]

    def long_loss(p, x):
        out, _ = conformer_encode(
            p, ccfg, x, long_len, compute_dtype=jnp.bfloat16
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    long_grad = jax.grad(long_loss)

    # 16 steps per program: ONE synchronous jitted call through the
    # axon tunnel costs ~30-37 ms of dispatch/round-trip on top of
    # device time (measured r3, RESULTS.md) — amortize it the same way
    # the flagship's K=40-step segment runner does, so the metric is
    # device throughput, not tunnel latency
    LONG_STEPS = 16

    @jax.jit
    def long_step(p, x):
        def body(carry, _):
            xp = x * (1 + 1e-30 * carry)  # defeat loop-invariant hoisting
            g = long_grad(p, xp)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(g))
            return carry + s * 1e-30, s

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=LONG_STEPS)
        return c

    float(long_step(enc_params, long_in))  # compile+warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(long_step(enc_params, long_in))
        reps.append((time.perf_counter() - t0) / LONG_STEPS)
    long_dt = sorted(reps)[len(reps) // 2]
    long_tokens_per_sec = B_long * T_long / long_dt
    # encoder-only model FLOPs/token (band attention counted, fwd ×3) —
    # from the same accounting the jaxpr-oracle test certifies
    from ecog2txt_tpu.utils.flops import (
        conformer_encoder_forward_flops_per_step,
    )

    enc_flops_tok = 3.0 * conformer_encoder_forward_flops_per_step(
        ccfg, 100
    )
    long_mfu = long_tokens_per_sec * enc_flops_tok / TPU_V5E_BF16_PEAK_FLOPS

    # MoE conformer TRAINING (beyond-parity family, models/moe.py):
    # fwd+bwd through the E=8 top-2 grouped-capacity encoder — the
    # scaled-deployment configuration (8× the ffn2 parameter capacity
    # at 2× its routed FLOPs; RESULTS.md r3 table).  MFU uses the
    # routed-FLOPs convention (router + top-k expert FFNs per token).
    moe_ccfg = ccfg._replace(
        moe_experts=8, moe_topk=2, moe_capacity_factor=1.25,
        moe_group_size=512,
    )
    from ecog2txt_tpu.models.conformer import init_conformer

    moe_params = init_conformer(jax.random.PRNGKey(13), moe_ccfg, 100)
    T_moe, B_moe = 2048, 16
    moe_in = jax.random.normal(
        jax.random.PRNGKey(12), (B_moe, T_moe, 100), jnp.bfloat16
    )
    moe_len = jnp.full((B_moe,), T_moe, jnp.int32)

    def moe_loss(p, x):
        out, _, aux = conformer_encode(
            p, moe_ccfg, x, moe_len, compute_dtype=jnp.bfloat16,
            return_aux=True,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9 + aux

    moe_grad = jax.grad(moe_loss)

    @jax.jit
    def moe_step(p, x):
        def body(carry, _):
            xp = x * (1 + 1e-30 * carry)
            g = moe_grad(p, xp)
            s = sum(jnp.sum(l) for l in jax.tree.leaves(g))
            return carry + s * 1e-30, s

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=LONG_STEPS)
        return c

    float(moe_step(moe_params, moe_in))  # compile+warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(moe_step(moe_params, moe_in))
        reps.append((time.perf_counter() - t0) / LONG_STEPS)
    moe_dt = sorted(reps)[len(reps) // 2]
    moe_tokens_per_sec = B_moe * T_moe / moe_dt
    moe_flops_tok = 3.0 * conformer_encoder_forward_flops_per_step(
        moe_ccfg, 100
    )
    moe_mfu = moe_tokens_per_sec * moe_flops_tok / TPU_V5E_BF16_PEAK_FLOPS

    # streaming serving (BASELINE configs[4]): per-chunk latency of the
    # incremental raw-ECoG path (jitted conv + fixed-window encode).
    # One chunk = decimation·chunk_size samples = 0.96 s of signal at
    # 200 Hz, so real-time factor = 0.96 s / latency.
    from ecog2txt_tpu.serve import StreamingConformerSession

    sess = StreamingConformerSession(
        conf_state.ema, conf_config, ["<pad>", "<EOS>", "<OOV>"]
    )
    chunk_np = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(9),
            (sess.samples_per_chunk, conf_config.in_channels),
            jnp.float32,
        )
    )
    for _ in range(3):  # warmup/compile
        sess.push(chunk_np)
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        sess.push(chunk_np)
        float(jnp.sum(sess._enc_outs[-1]))  # forced round trip
        lat.append(time.perf_counter() - t0)
    stream_chunk_ms = sorted(lat)[len(lat) // 2] * 1e3
    chunk_seconds = sess.samples_per_chunk / 200.0
    stream_rtf = chunk_seconds / (stream_chunk_ms / 1e3)

    # raw-voltage featurization (features.py — the north star's "fused
    # XLA input pipeline streaming to HBM"): notch → 8-band Hilbert
    # envelope → anti-aliased ↓16 on a 10-s, 469-channel window at
    # 3.2 kHz (the full reference grid at a realistic digitizer rate).
    # Realtime factor = seconds of signal per second of chip.
    from ecog2txt_tpu.features import HighGammaConfig, extract_high_gamma

    hg_cfg = HighGammaConfig(
        raw_rate=3200.0, out_rate=200.0, zscore="none"
    )
    feat_seconds = 10.0
    raw_sig = jax.random.normal(
        jax.random.PRNGKey(21),
        (int(feat_seconds * hg_cfg.raw_rate), config.in_channels),
        jnp.float32,
    )
    FEAT_STEPS = 8

    @jax.jit
    def feat_step(x):
        def body(c, _):
            xp = x * (1 + 1e-30 * c)  # defeat loop-invariant hoisting
            f = extract_high_gamma(xp, hg_cfg)
            s = jnp.sum(f)
            return c + s * 1e-30, s

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=FEAT_STEPS)
        return c

    float(feat_step(raw_sig))  # compile+warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(feat_step(raw_sig))
        reps.append((time.perf_counter() - t0) / FEAT_STEPS)
    feat_dt = sorted(reps)[len(reps) // 2]
    feat_realtime_x = feat_seconds / feat_dt

    print(
        json.dumps(
            {
                "metric": "train_sentences_per_sec_per_chip",
                "value": round(conf_sent_per_sec, 2),
                "unit": "sentences/s",
                "architecture": "conformer",
                "vs_baseline": round(vs_baseline, 3),
                "decode_sentences_per_sec": round(decode_sent_per_sec, 2),
                "serve_latency_ms": round(serve_latency_ms, 2),
                "projected_full_run_s": round(projected, 1),
                "mfu": round(conf_mfu, 4),
                "decode_mfu": round(decode_mfu, 4),
                "model_tflops_per_s": round(
                    conf_sent_per_sec * conf_flops / 1e12, 2
                ),
                "train_gflops_per_sentence": round(conf_flops / 1e9, 3),
                "bilstm_train_sentences_per_sec": round(
                    bilstm_sent_per_sec, 2
                ),
                "bilstm_mfu": round(bilstm_mfu, 4),
                "bilstm_decode_sentences_per_sec": round(
                    bilstm_decode_sent_per_sec, 2
                ),
                "featurization_realtime_x": round(feat_realtime_x, 1),
                "stream_chunk_ms": round(stream_chunk_ms, 2),
                "stream_realtime_factor": round(stream_rtf, 1),
                "long8k_train_tokens_per_sec": round(
                    long_tokens_per_sec, 0
                ),
                "long8k_encoder_mfu": round(long_mfu, 4),
                "moe_train_tokens_per_sec": round(
                    moe_tokens_per_sec, 0
                ),
                "moe_encoder_mfu": round(moe_mfu, 4),
                "peak_tflops": TPU_V5E_BF16_PEAK_FLOPS / 1e12,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
