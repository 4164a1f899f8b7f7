"""Cross-attention decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.models import (
    Seq2SeqConfig,
    beam_decode,
    greedy_decode,
    init_seq2seq,
    seq2seq_loss,
)
from ecog2txt_tpu.models.seq2seq import AuxHead, _attend

CFG = Seq2SeqConfig(
    vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
    decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(16,),
    aux_heads=(AuxHead("encoder_1_targets", "categorical", 10),),
    dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=6,
    use_attention=True,
)


def make_batch(rng, B=3, T=32):
    return {
        "encoder_inputs": jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32),
        "encoder_lengths": jnp.asarray([T, 20, 9], jnp.int32)[:B],
        "decoder_targets": jnp.asarray(
            rng.integers(2, 12, size=(B, 5)), jnp.int32
        ),
        "decoder_lengths": jnp.asarray([5, 3, 4], jnp.int32)[:B],
        "encoder_1_targets": jnp.asarray(
            rng.integers(0, 10, size=(B, T)), jnp.int32
        ),
        "subject_idx": jnp.asarray(0, jnp.int32),
    }


def test_attention_params_created():
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    assert "attn" in params["decoder"]
    no_attn = init_seq2seq(
        jax.random.PRNGKey(0),
        Seq2SeqConfig(**{**CFG.__dict__, "use_attention": False}),
    )
    assert "attn" not in no_attn["decoder"]


def test_attend_masks_invalid_steps(rng):
    """Attention weight on padded encoder steps must be zero: perturbing
    them cannot change the output."""
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    attn = params["decoder"]["attn"]
    h = jnp.asarray(rng.normal(size=(2, 48)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(8, 2, 48)), jnp.float32)
    lengths = jnp.asarray([8, 3], jnp.int32)
    out1 = _attend(attn, h, enc, lengths)
    enc2 = enc.at[5:, 1].set(77.0)  # past length of sequence 1
    out2 = _attend(attn, h, enc2, lengths)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.slow
def test_loss_and_grads_with_attention(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    loss, _ = seq2seq_loss(params, CFG, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: seq2seq_loss(p, CFG, batch, jax.random.PRNGKey(1), False)[0]
    )(params)
    ga = g["decoder"]["attn"]["wa"]["w"]
    assert np.abs(np.asarray(ga)).sum() > 0  # attention participates


def test_decode_paths_with_attention(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng)
    sid = batch["subject_idx"]
    greedy = greedy_decode(
        params, CFG, batch["encoder_inputs"], batch["encoder_lengths"], sid,
        temperature=0.0,
    )
    assert greedy.shape == (3, CFG.max_dec_len)
    beam1 = beam_decode(
        params, CFG, batch["encoder_inputs"], batch["encoder_lengths"], sid,
        beam_width=1, alpha=0.0,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))
    beam4 = beam_decode(
        params, CFG, batch["encoder_inputs"], batch["encoder_lengths"], sid,
        beam_width=4,
    )
    assert beam4.shape == (3, CFG.max_dec_len)


def test_padding_invariance_with_attention(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    batch = make_batch(rng, B=2)
    l1, _ = seq2seq_loss(params, CFG, batch, jax.random.PRNGKey(1), train=False)
    pad = jnp.asarray(rng.normal(size=(2, 8, 8)) * 30, jnp.float32)
    batch2 = dict(
        batch,
        encoder_inputs=jnp.concatenate([batch["encoder_inputs"], pad], axis=1),
        encoder_1_targets=jnp.concatenate(
            [batch["encoder_1_targets"], jnp.zeros((2, 8), jnp.int32)], axis=1
        ),
    )
    l2, _ = seq2seq_loss(params, CFG, batch2, jax.random.PRNGKey(1), train=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)


def test_trainer_reads_cross_attention_key(tmp_path):
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,),
        layer_sizes={
            "encoder_embedding": [16], "encoder_rnn": [24],
            "encoder_1_projection": [16], "decoder_embedding": [12],
            "decoder_rnn": [48], "decoder_projection": [],
        },
        cross_attention=True,
    )
    tr = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"max_dec_len": 10}, VERBOSE=False
    )
    assert tr.net_config.use_attention
    assert "attn" in tr.state.params["decoder"]
