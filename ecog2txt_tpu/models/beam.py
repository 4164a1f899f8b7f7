"""Beam-search decoding under jit.

The reference exposes ``beam_width`` as a first-class hyperparameter
(mocha-1_word_sequence.yaml:31, default 1 = greedy; SURVEY §2.8) with
the actual search living in the absent ``machine_learning`` core.  This
is the TPU-native implementation: a fixed-length `lax.scan` over a
``(B, K)`` beam tensor — all beams advance in one batched decoder step
(the LSTM state carries a beam axis flattened into the batch for the
gate GEMMs), finished beams are frozen with a pad-only transition, and
hypotheses are re-gathered by backpointer at each step (store-full
rather than backtrack: decode lengths are ≤ ~20, so materializing
``(L, B, K)`` token prefixes is cheaper than a backtrace pass).

Length-normalized scoring: score = logprob / ((5+len)/6)^alpha (the GNMT
rule; alpha=0 reproduces raw log-probability ranking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.lstm import lstm_step
from .seq2seq import (
    Seq2SeqConfig,
    _attend,
    _decoder_init_state,
    _dense,
    encode,
)

NEG_INF = -1e9


def beam_decode(
    params,
    config: Seq2SeqConfig,
    inputs: jax.Array,  # (B, T, C)
    lengths: jax.Array,  # (B,)
    subject_idx: jax.Array,
    beam_width: int = 4,
    alpha: float = 0.6,
    return_all: bool = False,
    temperature: float = 0.0,
):
    """Returns the best hypothesis (B, max_dec_len) int32 — or, with
    ``return_all``, (tokens (B, K, L), scores (B, K)) sorted best-first.

    ``temperature`` > 0 rescales logits before scoring (the manifest's
    ``temperature`` knob composed with ``beam_width`` — reference
    yaml:31,82); 0 keeps raw log-probabilities.
    """
    K = int(beam_width)
    dummy = jax.random.PRNGKey(0)
    enc_out, (h0, c0), enc_lengths = encode(
        params, config, inputs, lengths, subject_idx, dummy, train=False
    )
    decoder = params["decoder"]
    B = inputs.shape[0]
    V = config.vocab_size
    L = config.max_dec_len

    # replicate encoder state across beams: (B, K, H) flattened to (B*K, H)
    def tile_beam(a):
        return jnp.repeat(a[:, None], K, axis=1).reshape(B * K, -1)

    states = [
        (tile_beam(h), tile_beam(c))
        for (h, c) in _decoder_init_state(params, config, (h0, c0))
    ]

    logprobs0 = jnp.full((B, K), NEG_INF).at[:, 0].set(0.0)  # only beam 0 live
    tokens0 = jnp.full((B, K), config.pad_id, jnp.int32)
    finished0 = jnp.zeros((B, K), bool)
    hyps0 = jnp.full((L, B, K), config.pad_id, jnp.int32)

    # transition row for finished beams: stay finished by emitting pad at
    # zero cost and anything else at -inf
    pad_only = jnp.full((V,), NEG_INF).at[config.pad_id].set(0.0)

    def step(carry, t):
        states, tokens, logprobs, finished, hyps = carry
        x = decoder["embedding"][tokens.reshape(B * K)]  # (B*K, E)
        new_states = []
        out = x
        for layer, st in zip(decoder["rnn"], states):
            st_new, out = lstm_step(layer, st, out, None, config.compute_dtype)
            new_states.append(st_new)
        if config.use_attention:
            # (B·K, H) → (K, B, H) so _attend broadcasts over beams
            out_kbh = jnp.moveaxis(out.reshape(B, K, -1), 0, 1)
            out_kbh = _attend(
                decoder["attn"], out_kbh, enc_out, enc_lengths,
                config.compute_dtype,
            )
            out = jnp.moveaxis(out_kbh, 0, 1).reshape(B * K, -1)
        logits = _dense(decoder["out"], out, config.compute_dtype)
        if temperature and temperature > 0:
            logits = logits / temperature
        step_logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        step_logp = jnp.where(finished[..., None], pad_only, step_logp)

        cand = logprobs[..., None] + step_logp  # (B, K, V)
        top_logp, flat_idx = jax.lax.top_k(cand.reshape(B, K * V), K)
        beam_idx = flat_idx // V  # (B, K) source beam
        token_idx = (flat_idx % V).astype(jnp.int32)

        def gather_beams(a):
            # a: (B*K, H) → select source beams → (B*K, H)
            aBK = a.reshape(B, K, -1)
            return jnp.take_along_axis(
                aBK, beam_idx[..., None], axis=1
            ).reshape(B * K, -1)

        new_states = [
            (gather_beams(h), gather_beams(c)) for (h, c) in new_states
        ]
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        emitted = jnp.where(finished, config.pad_id, token_idx)
        finished = finished | (token_idx == config.eos_id)
        # re-gather hypothesis prefixes along the chosen beams, then
        # append this step's emission
        hyps = jnp.take_along_axis(hyps, beam_idx[None], axis=2)
        hyps = hyps.at[t].set(emitted)
        return (new_states, emitted, top_logp, finished, hyps), None

    (states, tokens, logprobs, finished, hyps), _ = jax.lax.scan(
        step,
        (states, tokens0, logprobs0, finished0, hyps0),
        jnp.arange(L),
    )

    # length-normalized scores; hypothesis length = tokens before EOS
    hyp_lengths = jnp.sum(hyps != config.pad_id, axis=0).astype(jnp.float32)
    norm = ((5.0 + hyp_lengths) / 6.0) ** alpha
    scores = logprobs / jnp.maximum(norm, 1e-6)

    order = jnp.argsort(-scores, axis=1)  # (B, K) best-first
    hyps_bkl = jnp.moveaxis(hyps, 0, 2)  # (B, K, L)
    hyps_sorted = jnp.take_along_axis(hyps_bkl, order[..., None], axis=1)
    scores_sorted = jnp.take_along_axis(scores, order, axis=1)
    if return_all:
        return hyps_sorted, scores_sorted
    return hyps_sorted[:, 0]
