"""Beam-search tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ecog2txt_tpu.models import (
    Seq2SeqConfig,
    beam_decode,
    greedy_decode,
    init_seq2seq,
)
from ecog2txt_tpu.models.seq2seq import AuxHead

CFG = Seq2SeqConfig(
    vocab_size=10,
    num_subjects=1,
    in_channels=6,
    conv_sizes=(12,),
    decimation_factor=4,
    rnn_sizes=(16,),
    aux_proj_sizes=(8,),
    aux_heads=(),
    dec_embedding_size=8,
    dec_rnn_sizes=(32,),
    max_dec_len=6,
)


def _setup(rng):
    params = init_seq2seq(jax.random.PRNGKey(0), CFG)
    inputs = jnp.asarray(rng.normal(size=(3, 24, 6)), jnp.float32)
    lengths = jnp.asarray([24, 16, 20], jnp.int32)
    return params, inputs, lengths


def test_beam1_matches_greedy(rng):
    params, inputs, lengths = _setup(rng)
    sid = jnp.asarray(0, jnp.int32)
    greedy = greedy_decode(params, CFG, inputs, lengths, sid, temperature=0.0)
    beam1 = beam_decode(
        params, CFG, inputs, lengths, sid, beam_width=1, alpha=0.0
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_beam_scores_sorted_and_shapes(rng):
    params, inputs, lengths = _setup(rng)
    sid = jnp.asarray(0, jnp.int32)
    hyps, scores = beam_decode(
        params, CFG, inputs, lengths, sid, beam_width=4, return_all=True
    )
    assert hyps.shape == (3, 4, CFG.max_dec_len)
    scores = np.asarray(scores)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # best-first


def test_beam_top_score_geq_greedy_score(rng):
    """With alpha=0 the best beam's raw logprob must be >= the greedy
    path's logprob (beam explores a superset)."""
    params, inputs, lengths = _setup(rng)
    sid = jnp.asarray(0, jnp.int32)

    def path_logprob(tokens):
        from ecog2txt_tpu.models.seq2seq import (
            _decoder_init_state, _dense, encode,
        )
        from ecog2txt_tpu.ops.lstm import lstm_step

        _, final, _ = encode(
            params, CFG, inputs, lengths, sid, jax.random.PRNGKey(0), False
        )
        states = _decoder_init_state(params, CFG, final)
        B = tokens.shape[0]
        prev = jnp.full((B,), CFG.pad_id, jnp.int32)
        total = np.zeros(B)
        done = np.zeros(B, bool)
        for t in range(tokens.shape[1]):
            x = params["decoder"]["embedding"][prev]
            out = x
            new_states = []
            for layer, st in zip(params["decoder"]["rnn"], states):
                st, out = lstm_step(layer, st, out)
                new_states.append(st)
            states = new_states
            logp = np.asarray(jax.nn.log_softmax(
                _dense(params["decoder"]["out"], out), axis=-1
            ))
            tok = np.asarray(tokens[:, t])
            for b in range(B):
                if not done[b]:
                    total[b] += logp[b, tok[b]]
                    if tok[b] == CFG.eos_id:
                        done[b] = True
            prev = tokens[:, t]
        return total

    greedy = greedy_decode(params, CFG, inputs, lengths, sid, temperature=0.0)
    _, scores = beam_decode(
        params, CFG, inputs, lengths, sid, beam_width=4, alpha=0.0,
        return_all=True,
    )
    greedy_lp = path_logprob(greedy)
    best = np.asarray(scores)[:, 0]
    assert (best >= greedy_lp - 1e-3).all()


def test_beam_pad_after_eos(rng):
    params, inputs, lengths = _setup(rng)
    sid = jnp.asarray(0, jnp.int32)
    hyps = np.asarray(
        beam_decode(params, CFG, inputs, lengths, sid, beam_width=3)
    )
    for row in hyps:
        eos = np.where(row == CFG.eos_id)[0]
        if len(eos):
            assert (row[eos[0] + 1 :] == CFG.pad_id).all()
