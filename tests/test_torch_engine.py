"""The PyTorch second engine (torch_engine.py — the real counterpart
of reference trainers.py:278-301) must implement the SAME model as the
JAX engine: one parameter pytree, two engines, interchangeable weights.

Parity is asserted at three levels: exact round-trip conversion,
teacher-forced logits / loss equality (f32 tolerance — CPU matmul
reduction order varies, CLAUDE.md), and identical greedy-decode
tokens.  The e2e test trains in torch and re-assesses the pushed-back
weights with the JAX engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ecog2txt_tpu.models.seq2seq import (
    AuxHead,
    Seq2SeqConfig,
    decoder_teacher_forcing as jax_teacher_forcing,
    encode as jax_encode,
    greedy_decode as jax_greedy_decode,
    init_seq2seq,
    seq2seq_loss as jax_loss,
)
from ecog2txt_tpu import torch_engine as te

CFG = Seq2SeqConfig(
    vocab_size=11,
    num_subjects=2,
    in_channels=10,
    conv_sizes=(12,),
    decimation_factor=4,
    rnn_sizes=(16, 16),
    aux_proj_sizes=(8,),
    aux_heads=(
        AuxHead("encoder_1_targets", "categorical", 7),
        AuxHead("encoder_2_targets", "Gaussian", 5),
    ),
    dec_embedding_size=6,
    dec_rnn_sizes=(24,),
    max_dec_len=8,
)


@pytest.fixture(scope="module")
def params():
    return init_seq2seq(jax.random.PRNGKey(3), CFG)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(11)
    B, T, C = 5, 24, 10
    L = 6
    return {
        "encoder_inputs": rng.normal(size=(B, T, C)).astype(np.float32),
        # deliberately NOT all multiples of the conv stride — the fused
        # reversal's boundary-step semantics must match too
        "encoder_lengths": np.array([24, 17, 9, 22, 4], np.int32),
        "decoder_targets": rng.integers(
            2, 11, size=(B, L)
        ).astype(np.int32),
        "decoder_lengths": np.array([6, 4, 2, 5, 3], np.int32),
        "encoder_1_targets": rng.integers(0, 7, size=(B, T)).astype(
            np.int32
        ),
        "encoder_2_targets": rng.normal(size=(B, T, 5)).astype(
            np.float32
        ),
        "subject_idx": 1,
    }


def _torch_batch(batch):
    return {
        k: (v if k == "subject_idx" else torch.as_tensor(v))
        for k, v in batch.items()
    }


def test_round_trip_conversion(params):
    net = te.TorchSequenceNetwork(CFG, params)
    back = net.export_jax_params()
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encoder_parity(params, batch):
    net = te.TorchSequenceNetwork(CFG, params)
    tb = _torch_batch(batch)
    rng = jax.random.PRNGKey(0)  # unused when train=False
    out_j, (h_j, c_j), lens_j = jax_encode(
        params, CFG, batch["encoder_inputs"], batch["encoder_lengths"],
        jnp.asarray(1), rng, train=False,
    )
    out_t, (h_t, c_t), lens_t = te.encode(
        net.params, CFG, tb["encoder_inputs"], tb["encoder_lengths"],
        1, train=False,
    )
    np.testing.assert_array_equal(
        np.asarray(lens_j), lens_t.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_j), h_t.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_loss_and_logits_parity(params, batch):
    net = te.TorchSequenceNetwork(CFG, params)
    tb = _torch_batch(batch)
    scales = {"encoder_1_targets": 0.3, "encoder_2_targets": 0.1}
    loss_j, metrics_j = jax_loss(
        params, CFG, {**batch, "subject_idx": jnp.asarray(1)},
        jax.random.PRNGKey(0), train=False, penalty_scales=scales,
    )
    loss_t, metrics_t = te.seq2seq_loss(
        net.params, CFG, tb, train=False, penalty_scales=scales
    )
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.detach()), rtol=1e-4, atol=1e-5
    )
    for k in metrics_j:
        np.testing.assert_allclose(
            float(metrics_j[k]), float(metrics_t[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_attention_decoder_parity(batch):
    cfg = Seq2SeqConfig(
        vocab_size=11, num_subjects=2, in_channels=10,
        conv_sizes=(12,), decimation_factor=4, rnn_sizes=(16,),
        dec_embedding_size=6, dec_rnn_sizes=(24,), max_dec_len=8,
        use_attention=True,
    )
    params = init_seq2seq(jax.random.PRNGKey(5), cfg)
    net = te.TorchSequenceNetwork(cfg, params)
    tb = _torch_batch(batch)
    rng = jax.random.PRNGKey(0)
    enc_j, fin_j, lens_j = jax_encode(
        params, cfg, batch["encoder_inputs"], batch["encoder_lengths"],
        jnp.asarray(0), rng, train=False,
    )
    logits_j = jax_teacher_forcing(
        params, cfg, fin_j, batch["decoder_targets"], rng,
        train=False, enc_out=enc_j, enc_lengths=lens_j,
    )
    enc_t, fin_t, lens_t = te.encode(
        net.params, cfg, tb["encoder_inputs"], tb["encoder_lengths"],
        0, train=False,
    )
    logits_t = te.decoder_teacher_forcing(
        net.params, cfg, fin_t, tb["decoder_targets"].long(),
        train=False, enc_out=enc_t, enc_lengths=lens_t,
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_greedy_decode_parity(params, batch):
    net = te.TorchSequenceNetwork(CFG, params)
    tb = _torch_batch(batch)
    tokens_j = jax_greedy_decode(
        params, CFG, batch["encoder_inputs"], batch["encoder_lengths"],
        jnp.asarray(0), temperature=0.0,
    )
    tokens_t = te.greedy_decode(
        net.params, CFG, tb["encoder_inputs"], tb["encoder_lengths"],
        0, temperature=0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(tokens_j), tokens_t.numpy()
    )


CONF_CFG = None  # built lazily (needs ConformerConfig import)


def _conformer_cfg():
    from ecog2txt_tpu.models.conformer import ConformerConfig

    return Seq2SeqConfig(
        vocab_size=11,
        num_subjects=2,
        in_channels=10,
        conv_sizes=(12,),
        decimation_factor=4,
        rnn_sizes=(16,),
        aux_proj_sizes=(8,),
        aux_heads=(
            AuxHead("encoder_1_targets", "categorical", 7),
            AuxHead("encoder_2_targets", "Gaussian", 5),
        ),
        dec_embedding_size=6,
        dec_rnn_sizes=(24,),
        max_dec_len=8,
        encoder_type="conformer",
        conformer=ConformerConfig(
            num_blocks=2, model_dim=16, num_heads=2, ffn_dim=32,
            conv_kernel=4, chunk_size=2, left_context=1,
        ),
    )


def test_conformer_encoder_parity(batch):
    """Torch conformer encode == JAX conformer encode (masked outputs,
    pooled bridge, lengths) on ragged lengths."""
    cfg = _conformer_cfg()
    params = init_seq2seq(jax.random.PRNGKey(5), cfg)
    net = te.TorchSequenceNetwork(cfg, params)
    tb = _torch_batch(batch)
    out_j, (h_j, c_j), len_j = jax_encode(
        params, cfg, jnp.asarray(batch["encoder_inputs"]),
        jnp.asarray(batch["encoder_lengths"]), 1, jax.random.PRNGKey(0),
        train=False,
    )
    out_t, (h_t, _), len_t = te.encode(
        net.params, cfg, tb["encoder_inputs"], tb["encoder_lengths"], 1,
    )
    np.testing.assert_array_equal(np.asarray(len_j), len_t.numpy())
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_j), h_t.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_conformer_loss_and_greedy_parity(batch):
    cfg = _conformer_cfg()
    params = init_seq2seq(jax.random.PRNGKey(5), cfg)
    net = te.TorchSequenceNetwork(cfg, params)
    tb = _torch_batch(batch)
    jb = {
        k: (jnp.asarray(v) if k != "subject_idx" else jnp.asarray(v))
        for k, v in batch.items()
    }
    loss_j, metrics_j = jax_loss(
        params, cfg, jb, jax.random.PRNGKey(0), train=False
    )
    loss_t, metrics_t = te.seq2seq_loss(net.params, cfg, tb, train=False)
    np.testing.assert_allclose(
        float(loss_j), float(loss_t), rtol=1e-4, atol=1e-5
    )
    for k in metrics_j:
        if k.startswith("loss"):
            np.testing.assert_allclose(
                float(metrics_j[k]), float(metrics_t[k]),
                rtol=1e-4, atol=1e-5,
            )
    tokens_j = jax_greedy_decode(
        params, cfg, jnp.asarray(batch["encoder_inputs"]),
        jnp.asarray(batch["encoder_lengths"]),
        jnp.asarray(1, jnp.int32), temperature=0.0,
    )
    tokens_t = te.greedy_decode(
        net.params, cfg, tb["encoder_inputs"], tb["encoder_lengths"],
        1, temperature=0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(tokens_j), tokens_t.numpy()
    )


@pytest.mark.parametrize(
    "moe_kw",
    [
        {},  # exact no-drop path
        {"moe_capacity_factor": 0.5},  # TIGHT capacity: drops occur
        {"moe_capacity_factor": 2.0, "moe_group_size": 8},
    ],
)
def test_moe_conformer_cross_engine_parity(batch, moe_kw):
    """Torch MoE conformer == JAX MoE conformer: encoder outputs, the
    loss INCLUDING the weighted router aux, and greedy tokens.  The
    tight-capacity case only passes if both engines drop the identical
    token-choice set (same priority order)."""
    import dataclasses

    base = _conformer_cfg()
    cfg = dataclasses.replace(
        base,
        conformer=base.conformer._replace(
            moe_experts=4, moe_topk=2, **moe_kw
        ),
    )
    params = init_seq2seq(jax.random.PRNGKey(5), cfg)
    net = te.TorchSequenceNetwork(cfg, params)
    tb = _torch_batch(batch)
    out_j, (h_j, _), len_j = jax_encode(
        params, cfg, jnp.asarray(batch["encoder_inputs"]),
        jnp.asarray(batch["encoder_lengths"]), 1, jax.random.PRNGKey(0),
        train=False,
    )
    out_t, (h_t, _), len_t = te.encode(
        net.params, cfg, tb["encoder_inputs"], tb["encoder_lengths"], 1,
    )
    np.testing.assert_array_equal(np.asarray(len_j), len_t.numpy())
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss_j, metrics_j = jax_loss(
        params, cfg, jb, jax.random.PRNGKey(0), train=False
    )
    loss_t, metrics_t = te.seq2seq_loss(net.params, cfg, tb, train=False)
    np.testing.assert_allclose(
        float(loss_j), float(loss_t), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_j["moe_aux"]), float(metrics_t["moe_aux"]),
        rtol=1e-4,
    )
    tokens_j = jax_greedy_decode(
        params, cfg, jnp.asarray(batch["encoder_inputs"]),
        jnp.asarray(batch["encoder_lengths"]),
        jnp.asarray(1, jnp.int32), temperature=0.0,
    )
    tokens_t = te.greedy_decode(
        net.params, cfg, tb["encoder_inputs"], tb["encoder_lengths"],
        1, temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(tokens_j), tokens_t.numpy())


@pytest.mark.slow
@pytest.mark.parametrize("encoder", ["lstm", "conformer", "moe"])
def test_torch_learn_e2e(tmp_path, encoder):
    """Train with the torch engine from the trainer surface (BOTH
    encoder families): WER falls, and the pushed-back weights reproduce
    the torch-assessed WER under the JAX engine's own assess()."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    overrides = (
        {"encoder_type": "conformer"} if encoder != "lstm" else {}
    )
    mp = make_demo_experiment(
        str(tmp_path / "exp"),
        subject_ids=(1,),
        layer_sizes={
            "encoder_embedding": [24],
            "encoder_rnn": [32, 32],
            "encoder_1_projection": [24],
            "decoder_embedding": [16],
            "decoder_rnn": [64],
        },
        N_epochs=40,
        **overrides,
    )
    sn = {
        "batch_size": 16, "max_dec_len": 10, "learning_rate": 3e-3,
    }
    if encoder != "lstm":
        sn["conformer"] = {
            "num_blocks": 2, "model_dim": 32, "num_heads": 2,
            "ffn_dim": 64, "chunk_size": 8, "left_context": 1,
            "conv_kernel": 4,
        }
    if encoder == "moe":
        sn["conformer"].update({"moe_experts": 4, "moe_topk": 2})
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs=sn,
        VERBOSE=False,
    )
    history = tr.torch_learn(N_epochs=40)
    wers = [
        snap["training"]["word_error_rate"] for snap in history.values()
    ]
    assert wers[-1] < wers[0] - 0.2, f"torch engine not learning: {wers}"
    # pushed-back weights: the JAX engine's EMA-assessed decode must
    # agree with the torch engine's final assessment
    snap_jax = tr.assess(["training"])
    assert (
        abs(
            snap_jax["training"]["word_error_rate"]
            - history[list(history)[-1]]["training"]["word_error_rate"]
        )
        < 0.05
    )
