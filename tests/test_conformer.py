"""Conformer encoder tests: masking, streaming parity, seq2seq integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.models.conformer import (
    ConformerConfig,
    ConformerStream,
    _chunk_causal_mask,
    conformer_encode,
    init_conformer,
)

CFG = ConformerConfig(
    num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
    conv_kernel=4, chunk_size=4, left_context=1,
)


@pytest.fixture(scope="module")
def params():
    return init_conformer(jax.random.PRNGKey(0), CFG, in_dim=8)


def test_chunk_causal_mask():
    mask = np.asarray(_chunk_causal_mask(8, chunk=4, left_context=1))
    # query in chunk 0 sees only chunk 0
    assert mask[0, :4].all() and not mask[0, 4:].any()
    # query in chunk 1 sees chunks 0 and 1
    assert mask[5].all()


def test_output_shape_and_finite(params, rng):
    xs = jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32)
    out, carry = conformer_encode(params, CFG, xs, jnp.asarray([16, 10]))
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert len(carry) == CFG.num_blocks


def test_causality(params, rng):
    """Future chunks must not affect past outputs (chunked-causal)."""
    xs = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
    out1, _ = conformer_encode(params, CFG, xs, None)
    xs2 = xs.at[:, 12:].set(99.0)  # perturb last chunk only
    out2, _ = conformer_encode(params, CFG, xs2, None)
    np.testing.assert_allclose(
        np.asarray(out1[:, :12]), np.asarray(out2[:, :12]), atol=1e-5
    )
    assert np.abs(np.asarray(out1[:, 12:]) - np.asarray(out2[:, 12:])).max() > 1e-3


def test_streaming_matches_full(params, rng):
    """Chunk-by-chunk streaming must equal the full-utterance encode."""
    T = 40  # 10 chunks
    xs = jnp.asarray(rng.normal(size=(2, T, 8)), jnp.float32)
    full, _ = conformer_encode(params, CFG, xs, None)
    stream = ConformerStream(params, CFG)
    outs = []
    for start in range(0, T, CFG.chunk_size):
        outs.append(stream.push(xs[:, start : start + CFG.chunk_size]))
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(full), rtol=1e-4, atol=1e-5
    )


def test_stream_rejects_wrong_chunk(params, rng):
    stream = ConformerStream(params, CFG)
    with pytest.raises(ValueError):
        stream.push(jnp.zeros((1, 3, 8)))


def test_stream_window_bounded(params):
    stream = ConformerStream(params, CFG)
    # receptive field: 2 blocks * (1*4 + 3) = 14 → 4 chunks back + current
    assert stream.window_steps <= 5 * CFG.chunk_size
    for _ in range(20):
        stream.push(jnp.zeros((1, CFG.chunk_size, 8)))
    assert stream._window.shape[1] <= stream.window_steps


def test_seq2seq_conformer_padding_invariance(rng):
    from ecog2txt_tpu.models.seq2seq import (
        AuxHead, Seq2SeqConfig, init_seq2seq, seq2seq_loss,
    )

    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(16,),
        aux_heads=(AuxHead("encoder_1_targets", "categorical", 10),),
        dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=6,
        encoder_type="conformer", conformer=CFG,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    batch = {
        "encoder_inputs": jnp.asarray(rng.normal(size=(2, 32, 8)), jnp.float32),
        "encoder_lengths": jnp.asarray([32, 17], jnp.int32),
        "decoder_targets": jnp.asarray(
            rng.integers(2, 12, size=(2, 5)), jnp.int32
        ),
        "decoder_lengths": jnp.asarray([5, 3], jnp.int32),
        "encoder_1_targets": jnp.asarray(
            rng.integers(0, 10, size=(2, 32)), jnp.int32
        ),
        "subject_idx": jnp.asarray(0, jnp.int32),
    }
    l1, _ = seq2seq_loss(params, cfg, batch, jax.random.PRNGKey(1), train=False)
    pad = jnp.asarray(rng.normal(size=(2, 8, 8)) * 50, jnp.float32)
    batch2 = dict(
        batch,
        encoder_inputs=jnp.concatenate([batch["encoder_inputs"], pad], axis=1),
        encoder_1_targets=jnp.concatenate(
            [batch["encoder_1_targets"], jnp.zeros((2, 8), jnp.int32)], axis=1
        ),
    )
    l2, _ = seq2seq_loss(params, cfg, batch2, jax.random.PRNGKey(1), train=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
