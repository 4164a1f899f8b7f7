"""LSTM recurrences as `lax.scan` over fused-gate matmuls.

TPU-native replacement for the cuDNN-backed TF1 LSTM stack the reference
outsources to ``machine_learning`` (SURVEY §2.8: ``encoder_rnn_{0,1,2}``
3×400 units bidirectional, ``decoder_rnn`` 800; "LSTM kernel packs 4
matrices", reference trainers.py:526-529).

Design notes (TPU):

* The four gates are computed by ONE fused matmul per step —
  ``[x, h] @ W → (B, 4H)`` — which XLA tiles onto the MXU; gate
  nonlinearities fuse into the same kernel as VPU epilogue.
* Time is the scan axis with arrays laid out ``(T, B, F)`` so each scan
  step is a contiguous ``(B, F)`` block.
* Variable lengths use a per-step mask that freezes the carry after the
  valid prefix — so the final carry IS the state at each sequence's last
  valid step (what the decoder consumes), with no gather needed.
* Recurrent dropout is *variational*: one mask per sequence applied to
  ``h`` at every step (the reference's ``RNN_dropout=0.5``,
  mocha-1_word_sequence.yaml:13), so the scan body stays branch-free.
* Matmuls can run in bfloat16 with float32 accumulation
  (``preferred_element_type``); params stay float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_lstm_params(
    rng: jax.Array, input_dim: int, hidden_dim: int, dtype=jnp.float32
) -> dict[str, jax.Array]:
    """Fused kernel packing the 4 gate matrices (i, g, f, o) columns.

    Glorot-uniform for the input block, orthogonal for the recurrent
    block, zeros for bias (forget-gate bias is added as a constant in
    the cell, the standard +1 trick).
    """
    k_x, k_h = jax.random.split(rng)
    scale = np.sqrt(6.0 / (input_dim + 4 * hidden_dim))
    wx = jax.random.uniform(
        k_x, (input_dim, 4 * hidden_dim), dtype, -scale, scale
    )
    # block-orthogonal recurrent kernel
    whs = [
        jax.nn.initializers.orthogonal()(k, (hidden_dim, hidden_dim), dtype)
        for k in jax.random.split(k_h, 4)
    ]
    wh = jnp.concatenate(whs, axis=1)
    b = jnp.zeros((4 * hidden_dim,), dtype)
    return {"wx": wx, "wh": wh, "b": b}


def _gates_to_hc(gates, c):
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _recurrent_gates(params, h, h_dropout_mask, compute_dtype):
    h_in = h if h_dropout_mask is None else h * h_dropout_mask
    return jnp.dot(
        h_in.astype(compute_dtype),
        params["wh"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def _cell(
    params: dict,
    h: jax.Array,
    c: jax.Array,
    x: jax.Array,
    h_dropout_mask: jax.Array | None,
    compute_dtype,
) -> tuple[jax.Array, jax.Array]:
    gates = (
        jnp.dot(
            x.astype(compute_dtype),
            params["wx"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + _recurrent_gates(params, h, h_dropout_mask, compute_dtype)
        + params["b"]
    )
    return _gates_to_hc(gates, c)


def lstm_step(
    params: dict,
    carry: tuple[jax.Array, jax.Array],
    x: jax.Array,
    h_dropout_mask: jax.Array | None = None,
    compute_dtype=jnp.float32,
) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
    """Single exposed step (used by the decoder's sampling loop)."""
    h, c = carry
    h_new, c_new = _cell(params, h, c, x, h_dropout_mask, compute_dtype)
    return (h_new, c_new), h_new


def lstm_scan(
    params: dict,
    xs: jax.Array,  # (T, B, F)
    lengths: jax.Array | None = None,  # (B,)
    initial_state: tuple[jax.Array, jax.Array] | None = None,
    h_dropout_mask: jax.Array | None = None,  # (B, H) variational
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Unidirectional LSTM over time.

    Returns (outputs (T, B, H), final (h, c)).  With ``lengths``, the
    carry freezes once ``t >= length`` so the final state equals the
    state at each sequence's last valid step; outputs past the valid
    prefix are zeroed.
    """
    T, B, _ = xs.shape
    H = params["wh"].shape[0]
    if initial_state is None:
        h0 = jnp.zeros((B, H), jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)
    else:
        h0, c0 = initial_state

    # Hoist the input projection out of the recurrence: ONE (T·B, F) @
    # (F, 4H) GEMM saturates the MXU; the scan body is left with only
    # the unavoidable serial (B, H) @ (H, 4H) recurrent matmul.
    xw = (
        jnp.dot(
            xs.astype(compute_dtype),
            params["wx"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b"]
    )  # (T, B, 4H)

    if use_pallas:
        # fused Pallas recurrence: whole sequence in one kernel, weights
        # + state resident in VMEM.  Under bf16 compute, the streamed
        # tensors (xw in, h/c residuals out, dgates in the backward)
        # are bf16 too — the kernels are HBM-bandwidth-bound, so this
        # halves their step time.
        #
        # Lessons from a pruned sibling family (round 2, 1.1 kLoC of
        # single-launch manual-DMA kernels, dropped in round 3 — see
        # RESULTS.md): (a) streaming time inside ONE grid step with
        # hand-written HBM↔VMEM DMA measured EQUAL to this chunked-grid
        # design — Mosaic's automatic pipelining already hides the DMA,
        # so the per-time-chunk grid overhead is not the wall; (b)
        # fusing BOTH biLSTM directions into one launch (halving kernel
        # launches) also measured equal — the wall is the serial
        # per-step recurrence latency (~8 µs/step), which no amount of
        # launch/DMA restructuring removes; (c) manual DMA requires the
        # sliced dim to be 128-lane aligned, forcing inert lane padding
        # (H→512, 4H→1664) that complicates every index calculation.
        from .pallas_lstm import (
            fused_lstm_recurrence as fused_recurrence,
        )

        mask = (
            h_dropout_mask
            if h_dropout_mask is not None
            else jnp.ones((B, H), jnp.float32)
        )
        lens = (
            lengths if lengths is not None else jnp.full((B,), T, jnp.int32)
        )
        if compute_dtype == jnp.bfloat16:
            xw = xw.astype(jnp.bfloat16)
        outputs, h_f, c_f = fused_recurrence(
            xw, params["wh"], lens, h0, c0, mask, pallas_interpret
        )
        return outputs, (h_f, c_f)

    def body(carry, inputs):
        h, c = carry
        xw_t, t = inputs
        gates = xw_t + _recurrent_gates(params, h, h_dropout_mask, compute_dtype)
        h_new, c_new = _gates_to_hc(gates, c)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            h_new = jnp.where(valid, h_new, h)
            c_new = jnp.where(valid, c_new, c)
            out = jnp.where(valid, h_new, 0.0)
        else:
            out = h_new
        return (h_new, c_new), out

    ts = jnp.arange(T)
    (h_f, c_f), outputs = jax.lax.scan(body, (h0, c0), (xw, ts))
    return outputs, (h_f, c_f)


def reverse_padded(xs: jax.Array, lengths: jax.Array) -> jax.Array:
    """Reverse each sequence's valid prefix in place, keeping padding at
    the tail — the model-input reversal of the reference
    (``tf.reverse_sequence``, trainers.py:806-811).  ``xs`` is
    time-major (T, B, ...)."""
    T = xs.shape[0]
    t = jnp.arange(T)[:, None]  # (T, 1)
    # index of the element that lands at position t: length-1-t when
    # valid, t itself (identity) in the padding region
    src = jnp.where(t < lengths[None, :], lengths[None, :] - 1 - t, t)  # (T, B)
    return jnp.take_along_axis(
        xs, src.reshape(src.shape + (1,) * (xs.ndim - 2)), axis=0
    )


def bidirectional_lstm(
    params_fwd: dict,
    params_bwd: dict,
    xs: jax.Array,  # (T, B, F)
    lengths: jax.Array,
    h_dropout_masks: tuple[jax.Array, jax.Array] | None = None,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Bidirectional layer: forward scan + backward scan over the
    valid-prefix-reversed input; outputs concatenated on features.

    Returns (outputs (T, B, 2H), final (h, c) each (B, 2H)) where the
    final state concatenates both directions' last-valid states — sized
    for the reference's decoder (2×400 → 800, SURVEY §2.8).

    (A round-2 variant fused both directions into ONE kernel launch,
    interleaving the two independent serial chains per step; it
    measured EQUAL to the two-launch path below and doubled the scoped
    VMEM stack — pruned in round 3, lessons recorded in lstm_scan.)
    """
    mask_f, mask_b = h_dropout_masks if h_dropout_masks else (None, None)
    if use_pallas is True:
        # gather-free bidirectional (chunked-grid kernels): the reverse
        # direction runs the kernel REVERSED IN TIME (cuDNN-style)
        # instead of reversing the sequence — no input/output gathers,
        # outputs land at their absolute positions, final states come
        # out directly.
        from .pallas_lstm import fused_lstm_recurrence

        T, B, _ = xs.shape
        H = params_fwd["wh"].shape[0]
        lens = (
            lengths if lengths is not None else jnp.full((B,), T, jnp.int32)
        )
        zeros = jnp.zeros((B, H), jnp.float32)
        ones = jnp.ones((B, H), jnp.float32)

        def run(p, mask, reverse_time):
            xw = (
                jnp.dot(
                    xs.astype(compute_dtype),
                    p["wx"].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + p["b"]
            )
            if compute_dtype == jnp.bfloat16:
                xw = xw.astype(jnp.bfloat16)
            return fused_lstm_recurrence(
                xw, p["wh"], lens, zeros, zeros,
                mask if mask is not None else ones,
                pallas_interpret, reverse_time,
            )

        out_f, h_f, c_f = run(params_fwd, mask_f, False)
        out_b, h_b, c_b = run(params_bwd, mask_b, True)
        return jnp.concatenate([out_f, out_b], axis=-1), (
            jnp.concatenate([h_f, h_b], axis=-1),
            jnp.concatenate([c_f, c_b], axis=-1),
        )
    out_f, (h_f, c_f) = lstm_scan(
        params_fwd, xs, lengths, None, mask_f, compute_dtype,
        use_pallas=use_pallas, pallas_interpret=pallas_interpret,
    )
    xs_rev = reverse_padded(xs, lengths)
    out_b_rev, (h_b, c_b) = lstm_scan(
        params_bwd, xs_rev, lengths, None, mask_b, compute_dtype,
        use_pallas=use_pallas, pallas_interpret=pallas_interpret,
    )
    out_b = reverse_padded(out_b_rev, lengths)
    outputs = jnp.concatenate([out_f, out_b], axis=-1)
    return outputs, (
        jnp.concatenate([h_f, h_b], axis=-1),
        jnp.concatenate([c_f, c_b], axis=-1),
    )
