"""Model-core tests: shapes, masking invariants, decode semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.models import (
    AuxHead,
    Seq2SeqConfig,
    greedy_decode,
    init_seq2seq,
    seq2seq_loss,
)
from ecog2txt_tpu.ops import reverse_padded
from ecog2txt_tpu.ops.lstm import init_lstm_params, lstm_scan


CFG = Seq2SeqConfig(
    vocab_size=12,
    num_subjects=2,
    in_channels=8,
    conv_sizes=(16,),
    decimation_factor=4,
    rnn_sizes=(24, 24),
    aux_proj_sizes=(16,),
    aux_heads=(AuxHead("encoder_1_targets", "categorical", 10),),
    dec_embedding_size=12,
    dec_rnn_sizes=(48,),
    max_dec_len=7,
)


def make_batch(rng, B=4, T=32, cfg=CFG):
    return {
        "encoder_inputs": jnp.asarray(
            rng.normal(size=(B, T, cfg.in_channels)), jnp.float32
        ),
        "encoder_lengths": jnp.asarray([T, T - 5, T // 2, 9], jnp.int32)[:B],
        "decoder_targets": jnp.asarray(
            rng.integers(2, cfg.vocab_size, size=(B, 6)), jnp.int32
        ),
        "decoder_lengths": jnp.asarray([6, 4, 3, 5], jnp.int32)[:B],
        "encoder_1_targets": jnp.asarray(
            rng.integers(0, 10, size=(B, T)), jnp.int32
        ),
        "subject_idx": jnp.asarray(0, jnp.int32),
    }


def test_reverse_padded():
    xs = jnp.arange(5, dtype=jnp.float32).reshape(5, 1, 1)
    out = reverse_padded(xs, jnp.asarray([3]))
    np.testing.assert_array_equal(out[:, 0, 0], [2, 1, 0, 3, 4])


def test_lstm_scan_freezes_after_length(rng):
    p = init_lstm_params(jax.random.PRNGKey(0), 3, 5)
    xs = jnp.asarray(rng.normal(size=(10, 2, 3)), jnp.float32)
    lengths = jnp.asarray([4, 10])
    out, (h, c) = lstm_scan(p, xs, lengths)
    out_full, (h_full, _) = lstm_scan(p, xs[:4], jnp.asarray([4, 4]))
    # sequence 0's final state = its state at step 4
    np.testing.assert_allclose(h[0], h_full[0], rtol=1e-5)
    # outputs past length are zero
    assert np.abs(out[4:, 0]).sum() == 0


def test_loss_shapes_and_finite(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    loss, metrics = seq2seq_loss(
        params, CFG, batch, jax.random.PRNGKey(1), train=True
    )
    assert np.isfinite(float(loss))
    assert {"loss_decoder", "loss_encoder_1_targets", "token_accuracy"} <= set(
        metrics
    )
    assert 0.0 <= float(metrics["token_accuracy"]) <= 1.0


def test_padding_invariance(rng):
    """Extending input padding must not change the loss (mask correctness)."""
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng, B=2, T=32)
    loss1, _ = seq2seq_loss(params, CFG, batch, jax.random.PRNGKey(1), train=False)
    # pad T 32 → 40 with garbage in the padding region
    pad = jnp.asarray(rng.normal(size=(2, 8, CFG.in_channels)) * 100, jnp.float32)
    batch2 = dict(batch)
    batch2["encoder_inputs"] = jnp.concatenate(
        [batch["encoder_inputs"], pad], axis=1
    )
    batch2["encoder_1_targets"] = jnp.concatenate(
        [batch["encoder_1_targets"], jnp.zeros((2, 8), jnp.int32)], axis=1
    )
    loss2, _ = seq2seq_loss(params, CFG, batch2, jax.random.PRNGKey(1), train=False)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_subject_selection_differs(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    l0, _ = seq2seq_loss(params, CFG, batch, jax.random.PRNGKey(1), train=False)
    batch1 = dict(batch, subject_idx=jnp.asarray(1, jnp.int32))
    l1, _ = seq2seq_loss(params, CFG, batch1, jax.random.PRNGKey(1), train=False)
    assert abs(float(l0) - float(l1)) > 1e-9


def test_greedy_decode_shape_and_pad_after_eos(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    tokens = greedy_decode(
        params, CFG,
        batch["encoder_inputs"], batch["encoder_lengths"],
        batch["subject_idx"],
    )
    tokens = np.asarray(tokens)
    assert tokens.shape == (4, CFG.max_dec_len)
    for row in tokens:
        eos_pos = np.where(row == CFG.eos_id)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1 :] == CFG.pad_id).all()


def test_greedy_decode_deterministic(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    t1 = greedy_decode(
        params, CFG, batch["encoder_inputs"], batch["encoder_lengths"],
        batch["subject_idx"], temperature=0.0,
    )
    t2 = greedy_decode(
        params, CFG, batch["encoder_inputs"], batch["encoder_lengths"],
        batch["subject_idx"], temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_temperature_sampling_varies(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    outs = [
        np.asarray(
            greedy_decode(
                params, CFG, batch["encoder_inputs"],
                batch["encoder_lengths"], batch["subject_idx"],
                rng=jax.random.PRNGKey(s), temperature=5.0,
            )
        )
        for s in range(3)
    ]
    assert not all((outs[0] == o).all() for o in outs[1:])


def test_gaussian_aux_head(rng):
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(16,),
        aux_heads=(AuxHead("audio_targets", "Gaussian", 13),),
        dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=5,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    batch = make_batch(rng, B=2, cfg=cfg)
    batch["audio_targets"] = jnp.asarray(
        rng.normal(size=(2, 32, 13)), jnp.float32
    )
    loss, metrics = seq2seq_loss(
        params, cfg, batch, jax.random.PRNGKey(1), train=False
    )
    assert np.isfinite(float(loss))
    assert "loss_audio_targets" in metrics


def test_penalty_scale_zero_removes_aux(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    _, m_full = seq2seq_loss(
        params, CFG, batch, jax.random.PRNGKey(1), train=False,
        penalty_scales={"encoder_1_targets": 0.0},
    )
    np.testing.assert_allclose(
        float(m_full["loss_total"]), float(m_full["loss_decoder"]), rtol=1e-6
    )


def test_conv_strides_factorization():
    assert Seq2SeqConfig(vocab_size=4, conv_sizes=(8,), decimation_factor=12).conv_strides == (12,)
    strides = Seq2SeqConfig(
        vocab_size=4, conv_sizes=(8, 8), decimation_factor=12
    ).conv_strides
    assert np.prod(strides) == 12 and len(strides) == 2


def test_loss_jits_and_grads(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)

    @jax.jit
    def lossfn(p, b, k):
        return seq2seq_loss(p, CFG, b, k, train=True)[0]

    g = jax.grad(lossfn)(params, batch, jax.random.PRNGKey(1))
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # shared encoder gets gradient; subject-1 subnet gets none (batch is subject 0)
    g_sub = g["subnet"]["conv"][0]["w"]
    assert np.abs(np.asarray(g_sub[0])).sum() > 0
    assert np.abs(np.asarray(g_sub[1])).sum() == 0
