"""Post-training int8 serving quantization (quantize.py).

The scheme is per-output-channel int8 weights + dynamic per-token int8
activations, dispatched leaf-type-wise inside the conformer
(models/conformer.py::_dot).  Measured on-chip (RESULTS.md r3): a
LOSS at reference scale (D=384 — the K dims starve the int8 MXU and
the quant passes eat the 1.16× GEMM win) but 1.13×/1.33× at
D=1024/2048, so the feature targets scaled deployments; these tests
pin the numerics, not the speed.
"""

import numpy as np
import pytest


def _small_cfg():
    import jax.numpy as jnp

    from ecog2txt_tpu.models.conformer import ConformerConfig
    from ecog2txt_tpu.models.seq2seq import Seq2SeqConfig

    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
    )
    return Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )


def test_int8_dot_matches_float_within_quant_error():
    """x@w through int8_dot must agree with the f32 GEMM to the error a
    7-bit mantissa predicts: both operands carry ≤ (1/254) relative
    rounding per element, so the row-wise result error is bounded by
    ~1% of the row's magnitude for well-conditioned inputs."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.quantize import (
        dequantize_weight, int8_dot, quantize_weight,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (64, 96))
    w = jax.random.normal(k2, (96, 80))
    qw = quantize_weight(w)
    assert qw.q.dtype == jnp.int8 and qw.scale.shape == (80,)
    # weight dequantization round-trips to per-channel 1/254 relative
    werr = np.abs(np.asarray(dequantize_weight(qw) - w))
    wmax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert (werr <= wmax / 254 + 1e-7).all()

    out = np.asarray(int8_dot(x, qw, jnp.float32))
    ref = np.asarray(x @ w)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 0.02 * scale


def test_quantized_conformer_encode_close_to_float():
    import jax
    import jax.numpy as jnp

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.quantize import (
        is_quantized, quantize_conformer_params,
    )

    ccfg = _small_cfg().conformer
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 20)
    qp = quantize_conformer_params(p)
    assert is_quantized(qp) and not is_quantized(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 40, 20))
    lens = jnp.asarray([40, 25, 40])
    ref, _ = cf.conformer_encode(p, ccfg, x, lens)
    out, _ = cf.conformer_encode(qp, ccfg, x, lens)
    ref, out = np.asarray(ref), np.asarray(out)
    cos = (ref * out).sum() / (
        np.linalg.norm(ref) * np.linalg.norm(out)
    )
    assert cos > 0.999
    assert np.abs(out - ref).max() < 0.05 * np.abs(ref).max()
    # the quantized tree is a regular pytree (checkpoint/jit-safe)
    flat, td = jax.tree.flatten(qp)
    rt = jax.tree.unflatten(td, flat)
    assert rt["blocks"][0]["ffn1"]["w1"].q.dtype == jnp.int8


def test_quantized_streaming_matches_quantized_offline():
    """quantize='int8' sessions/pools must keep the streamed == offline
    contract — against the offline decode run with the SAME quantized
    parameters (quantization changes the function; streaming must track
    the changed function exactly)."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.seq2seq import greedy_decode, init_seq2seq
    from ecog2txt_tpu.quantize import quantize_conformer_params
    from ecog2txt_tpu.serve import (
        StreamingConformerSession, StreamingSessionPool,
    )

    cfg = _small_cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    qparams = quantize_conformer_params(params)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    rng = np.random.default_rng(5)
    raw = rng.normal(size=(131, 8)).astype(np.float32)

    L = len(raw)
    T = ((L + 3) // 4) * 4
    inputs = np.zeros((1, T, 8), np.float32)
    inputs[:, :L] = raw
    off_q = np.asarray(greedy_decode(
        qparams, cfg, jnp.asarray(inputs), jnp.asarray([L]),
        jnp.asarray(0, jnp.int32), temperature=0.0,
    ))

    sess = StreamingConformerSession(params, cfg, targets, quantize="int8")
    pool = StreamingSessionPool(params, cfg, targets, capacity=2,
                                quantize="int8")
    a = pool.add()
    for lo in range(0, L, 29):
        sess.push(raw[lo : lo + 29])
        pool.push(a, raw[lo : lo + 29])
    out_sess = sess.endpoint()
    out_pool = pool.endpoint(a)
    np.testing.assert_array_equal(np.asarray(out_sess["tokens"]), off_q)
    np.testing.assert_array_equal(np.asarray(out_pool["tokens"]), off_q)

    with pytest.raises(ValueError):
        StreamingConformerSession(params, cfg, targets, quantize="int4")


@pytest.mark.slow
def test_quantized_assessment_preserves_wer(tmp_path):
    """Train the demo conformer until WER falls, then assess with the
    int8-quantized EMA weights: the quantized WER must stay within a
    small margin of the float WER (the point of serving quantization)."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.quantize import quantize_conformer_params
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,),
        encoder_type="conformer",
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "batch_size": 16, "max_dec_len": 10, "temperature": 0.0,
            "learning_rate": 3e-3,
            "conformer": {"num_blocks": 2, "model_dim": 32,
                          "num_heads": 2, "ffn_dim": 64,
                          "chunk_size": 8, "left_context": 1,
                          "conv_kernel": 4},
        },
        VERBOSE=False,
    )
    history = tr.fit(num_epochs=60)
    wers = [h["training"]["word_error_rate"] for h in history.values()]
    assert wers[-1] < wers[0]  # learned something to preserve

    wer_f = tr.assess(["validation"])["validation"]["word_error_rate"]
    tr.state = tr.state._replace(
        ema=quantize_conformer_params(tr.state.ema)
    )
    wer_q = tr.assess(["validation"])["validation"]["word_error_rate"]
    assert wer_q <= wer_f + 0.1
