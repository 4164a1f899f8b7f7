"""Fused LSTM recurrence as Pallas TPU kernels (forward + custom VJP).

The XLA `lax.scan` LSTM pays per-iteration overhead on every one of the
T steps: weights re-fetched, h/c round-tripped through HBM, tiny kernels
launched.  These kernels run the ENTIRE recurrence in one launch:

* the recurrent kernel ``wh`` and the carried h/c state stay resident in
  VMEM for the whole sequence;
* the grid is ``(batch_tiles, time_chunks)`` — time iterates innermost,
  so the VMEM h/c scratch carries across a batch tile's whole sequence
  and re-initializes when the next batch tile starts.  Batch tiling
  (≤128 rows) keeps the double-buffered ``(CHUNK, BB, 4H)`` input blocks
  inside the 16 MB VMEM budget for ANY batch size (assessment decodes
  run the full eval set in one call);
* each time chunk processes ``CHUNK`` steps in an inner ``fori_loop``,
  amortizing Mosaic's per-grid-step overhead while the Pallas pipeline
  prefetches the next chunk behind the current compute;
* variable lengths freeze the carry via a per-step mask (same semantics
  as ops.lstm.lstm_scan: outputs past the valid prefix are zero, the
  final state is the state at the last valid step);
* the backward kernel runs the reverse-time LSTM adjoint.  Gate
  pre-activations are recomputed from the saved h/c sequences (remat:
  one extra MXU matmul per step instead of storing (T, B, 4H)
  activations), and the carried dh/dc emerge as the initial-state
  gradients, so encoder→decoder state gradients flow.  The weight
  gradient ``dwh`` is NOT accumulated in the serial loop — it is one
  big ``(T·B, H)ᵀ @ (T·B, 4H)`` GEMM over the kernel's ``dgates``
  output, done by XLA afterwards where the MXU can tile it freely
  (also keeping the kernel inside the VMEM budget).

Gate packing order is (i, g, f, o), matching ops.lstm._gates_to_hc; the
forget gate carries the +1 bias.  Used by ops.lstm.lstm_scan when
``use_pallas=True``; tests run interpreter mode on CPU against the scan
reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one kernel instance.  The hardware limit is 16 MB;
# leave headroom for Mosaic's own stack so near-limit compiles don't
# flake (observed: identical configs landing ±200 KB around the limit
# across compiler runs).
VMEM_BUDGET = 12 * 1024 * 1024


def _choose_tiles(
    B: int, H: int, G: int, bwd: bool, stream_bytes: int = 4
) -> tuple[int, int]:
    """Pick (batch tile BB, time chunk C) fitting the VMEM budget.

    Footprint model (×2 for the pipeline's double buffering of every
    non-constant block): the weights block, the per-chunk streamed
    sequence blocks (``stream_bytes`` wide — 2 when streaming bf16), the
    per-batch-tile fixed blocks, and the carry scratch.  The backward
    kernel streams 4 extra (C, BB, H) operands plus a (C, BB, G) output.
    """
    for BB in (128, 64, 32, 16, 8):
        BB_eff = min(BB, max(B, 1))
        for C in (8, 6, 4, 3, 2, 1):
            sb = stream_bytes
            # weight block counted at 4 B/elem regardless of stream
            # dtype: the headroom absorbs Mosaic's loop-body stack,
            # which grows with CHUNK (measured: counting bf16 weights
            # here let CHUNK grow 4->6 and the kernel slowed 3x)
            wh = H * G * 4
            if bwd:
                seq = 2 * (
                    2 * C * BB_eff * G * sb + 4 * C * BB_eff * H * sb
                )
                fixed = 2 * 5 * BB_eff * H * 4
            else:
                seq = 2 * (C * BB_eff * G * sb + 2 * C * BB_eff * H * sb)
                fixed = 2 * 6 * BB_eff * H * 4
            scratch = 2 * BB_eff * H * 4
            if wh + seq + fixed + scratch <= VMEM_BUDGET:
                return BB_eff, C
    return 8, 1


def _pad_axis(a, multiple, axis):
    n = a.shape[axis]
    pad = (-n) % multiple
    if pad:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        a = jnp.pad(a, widths)
    return a


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _make_fwd_kernel(chunk: int, reverse_time: bool = False):
  """``reverse_time`` runs the recurrence from t=T-1 down to t=0 —
  the BACKWARD direction of a biLSTM computed with NO sequence
  reversal (cuDNN-style): outputs land at their absolute positions and
  the final state is the state after consuming t=0.  Steps t >= length
  are no-ops (carry frozen at the initial state), so variable lengths
  work unchanged; requires zero initial state (the encoder's case) so
  the zero-filled h_seq residuals match the carry at invalid steps."""
  def _fwd_kernel(
    xw_ref,  # (chunk, BB, 4H) input-projection block
    wh_ref,  # (H, 4H)
    h0_ref,  # (BB, H)
    c0_ref,  # (BB, H)
    len_ref,  # (BB, 1) int32
    mask_ref,  # (BB, H) variational dropout mask (ones if none)
    hseq_ref,  # out (CHUNK, BB, H)
    cseq_ref,  # out (CHUNK, BB, H)
    hT_ref,  # out (BB, H)
    cT_ref,  # out (BB, H)
    h_scr,  # scratch (BB, H)
    c_scr,  # scratch (BB, H)
  ):
    k = pl.program_id(1)  # time chunk (innermost grid axis)

    @pl.when(k == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    # recurrent matmul operands follow the stream dtype: under bf16
    # streams the MXU runs at its bf16 rate (8× the fp32 rate) with
    # fp32 accumulation; the h/c carry itself stays fp32
    mm_dtype = xw_ref.dtype
    wh = wh_ref[:].astype(mm_dtype)
    mask = mask_ref[:]
    lens = len_ref[:]  # (BB, 1)
    nt = pl.num_programs(1)
    # the index maps load chunk (nt-1-k) when running reversed
    base = ((nt - 1 - k) if reverse_time else k) * chunk

    def body(j, carry):
        i = (chunk - 1 - j) if reverse_time else j
        h, c = carry
        gates = xw_ref[i].astype(jnp.float32) + jnp.dot(
            (h * mask).astype(mm_dtype), wh,
            preferred_element_type=jnp.float32,
        )
        gi, gg, gf, go = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(gf + 1.0) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
        valid = lens > (base + i)  # (BB, 1)
        h_new = jnp.where(valid, h_new, h)
        c_new = jnp.where(valid, c_new, c)
        hseq_ref[i] = jnp.where(valid, h_new, 0.0).astype(hseq_ref.dtype)
        cseq_ref[i] = c_new.astype(cseq_ref.dtype)
        return (h_new, c_new)

    h, c = jax.lax.fori_loop(0, chunk, body, (h_scr[:], c_scr[:]))
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        hT_ref[:] = h
        cT_ref[:] = c

  return _fwd_kernel


def _fwd_call(xw, wh, lengths, h0, c0, mask, interpret, reverse_time=False):
    T, B, G = xw.shape
    H = wh.shape[0]
    stream = xw.dtype  # bf16 streams halve HBM traffic + VMEM blocks
    BB, CHUNK = _choose_tiles(B, H, G, bwd=False, stream_bytes=stream.itemsize)
    xw_p = _pad_axis(_pad_axis(xw, CHUNK, 0), BB, 1)
    wh = wh.astype(stream)  # bf16 weight block under bf16 compute
    Tp, Bp = xw_p.shape[:2]
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    h0_p = _pad_axis(h0, BB, 0)
    c0_p = _pad_axis(c0, BB, 0)
    mask_p = _pad_axis(mask, BB, 0)
    nb, nt = Bp // BB, Tp // CHUNK
    out_shape = (
        jax.ShapeDtypeStruct((Tp, Bp, H), stream),  # h_seq
        jax.ShapeDtypeStruct((Tp, Bp, H), stream),  # c_seq
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),  # hT
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),  # cT
    )
    if reverse_time:
        seq3 = lambda b, k: (nt - 1 - k, b, 0)  # noqa: E731
    else:
        seq3 = lambda b, k: (k, b, 0)  # noqa: E731
    bfix = lambda b, k: (b, 0)  # noqa: E731
    wfix = lambda b, k: (0, 0)  # noqa: E731
    h_seq, c_seq, hT, cT = pl.pallas_call(
        _make_fwd_kernel(CHUNK, reverse_time),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((CHUNK, BB, G), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, BB, H), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, BB, H), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_p, wh, h0_p, c0_p, lengths2d, mask_p)
    return h_seq[:T, :B], c_seq[:T, :B], hT[:B], cT[:B]


# --------------------------------------------------------------------------
# backward kernel (reverse-time adjoint; dwh left to XLA)
# --------------------------------------------------------------------------


def _make_bwd_kernel(chunk: int, reverse_time: bool = False):
  """Adjoint iterates opposite to the forward recurrence: reversed
  chunks for the forward-time recurrence, forward chunks when the
  recurrence itself ran reverse_time."""
  def _bwd_kernel(
    xw_ref,  # (chunk, BB, 4H) at this (reversed) chunk
    wh_ref,  # (H, 4H)
    hprev_ref,  # (CHUNK_BWD, BB, H) h_{t-1}
    cprev_ref,  # (CHUNK_BWD, BB, H) c_{t-1}
    cseq_ref,  # (CHUNK_BWD, BB, H) c_t
    len_ref,  # (BB, 1)
    mask_ref,  # (BB, H)
    dhseq_ref,  # (CHUNK_BWD, BB, H) upstream dL/dh_t
    dhT_ref,  # (BB, H) upstream dL/dh_T
    dcT_ref,  # (BB, H)
    dgates_ref,  # out (CHUNK_BWD, BB, 4H)
    dh0_ref,  # out (BB, H)
    dc0_ref,  # out (BB, H)
    dh_scr,  # scratch (BB, H)
    dc_scr,  # scratch (BB, H)
  ):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        dh_scr[:] = dhT_ref[:]
        dc_scr[:] = dcT_ref[:]

    mm_dtype = xw_ref.dtype
    wh = wh_ref[:].astype(mm_dtype)
    mask = mask_ref[:]
    lens = len_ref[:]
    # adjoint time order is the REVERSE of the recurrence's
    base = (k if reverse_time else (nk - 1 - k)) * chunk

    def body(j, carry):
        dh_c, dc_c = carry
        i = j if reverse_time else (chunk - 1 - j)
        valid = lens > (base + i)
        h_in = hprev_ref[i].astype(jnp.float32) * mask
        gates = xw_ref[i].astype(jnp.float32) + jnp.dot(
            h_in.astype(mm_dtype), wh, preferred_element_type=jnp.float32
        )
        gi, gg, gf, go = jnp.split(gates, 4, axis=-1)
        si = jax.nn.sigmoid(gi)
        sf = jax.nn.sigmoid(gf + 1.0)
        so = jax.nn.sigmoid(go)
        tg = jnp.tanh(gg)
        tc = jnp.tanh(cseq_ref[i].astype(jnp.float32))

        dh = dh_c + jnp.where(
            valid, dhseq_ref[i].astype(jnp.float32), 0.0
        )
        do = dh * tc * so * (1.0 - so)
        dct = dh * so * (1.0 - tc * tc) + dc_c
        di = dct * tg * si * (1.0 - si)
        dg = dct * si * (1.0 - tg * tg)
        df = dct * cprev_ref[i].astype(jnp.float32) * sf * (1.0 - sf)
        dgates = jnp.concatenate([di, dg, df, do], axis=-1)
        dgates = jnp.where(valid, dgates, 0.0)
        dgates_ref[i] = dgates.astype(dgates_ref.dtype)
        dh_prev = (
            jnp.dot(
                dgates.astype(mm_dtype), wh.T,
                preferred_element_type=jnp.float32,
            )
            * mask
        )
        dh_c = jnp.where(valid, dh_prev, dh)
        dc_c = jnp.where(valid, dct * sf, dc_c)
        return (dh_c, dc_c)

    dh, dc = jax.lax.fori_loop(0, chunk, body, (dh_scr[:], dc_scr[:]))
    dh_scr[:] = dh
    dc_scr[:] = dc

    @pl.when(k == nk - 1)
    def _():
        dh0_ref[:] = dh
        dc0_ref[:] = dc

  return _bwd_kernel


def _bwd_call(
    xw, wh, hprev, cprev, cseq, lengths, mask, dhseq, dhT, dcT, interpret,
    reverse_time=False,
):
    T, B, G = xw.shape
    H = wh.shape[0]
    stream = xw.dtype
    BB, CHUNK_BWD = _choose_tiles(
        B, H, G, bwd=True, stream_bytes=stream.itemsize
    )

    def prep(a):
        return _pad_axis(_pad_axis(a, CHUNK_BWD, 0), BB, 1)

    xw_p, hprev_p, cprev_p, cseq_p, dhseq_p = (
        prep(a) for a in (xw, hprev, cprev, cseq, dhseq)
    )
    wh = wh.astype(stream)  # bf16 weight block under bf16 compute
    Tp, Bp = xw_p.shape[:2]
    nb, nt = Bp // BB, Tp // CHUNK_BWD
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    mask_p = _pad_axis(mask, BB, 0)
    dhT_p = _pad_axis(dhT, BB, 0)
    dcT_p = _pad_axis(dcT, BB, 0)
    if reverse_time:
        rev3 = lambda b, k: (k, b, 0)  # noqa: E731
    else:
        rev3 = lambda b, k: (nt - 1 - k, b, 0)  # noqa: E731
    bfix = lambda b, k: (b, 0)  # noqa: E731
    wfix = lambda b, k: (0, 0)  # noqa: E731
    out_shape = (
        jax.ShapeDtypeStruct((Tp, Bp, G), stream),  # dgates (=dxw)
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),  # dh0
        jax.ShapeDtypeStruct((Bp, H), jnp.float32),  # dc0
    )
    dgates, dh0, dc0 = pl.pallas_call(
        _make_bwd_kernel(CHUNK_BWD, reverse_time),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((CHUNK_BWD, BB, G), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, BB, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, BB, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, BB, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, BB, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK_BWD, BB, G), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        xw_p, wh, hprev_p, cprev_p, cseq_p, lengths2d, mask_p,
        dhseq_p, dhT_p, dcT_p,
    )
    return dgates[:T, :B], dh0[:B], dc0[:B]


# --------------------------------------------------------------------------
# custom-VJP wrapper
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_lstm_recurrence(
    xw, wh, lengths, h0, c0, mask, interpret=False, reverse_time=False
):
    """(h_seq (T,B,H), hT (B,H), cT (B,H)) from the precomputed input
    projection ``xw = xs@wx + b``.

    ``reverse_time`` runs the recurrence t=T-1 → 0 with outputs at
    their absolute positions — the gather-free way to compute a
    biLSTM's backward direction (no input/output reversal).  Requires
    zero initial state."""
    h_seq, _c_seq, hT, cT = _fwd_call(
        xw, wh, lengths, h0, c0, mask, interpret, reverse_time
    )
    return h_seq, hT, cT


def _fused_fwd(xw, wh, lengths, h0, c0, mask, interpret, reverse_time):
    h_seq, c_seq, hT, cT = _fwd_call(
        xw, wh, lengths, h0, c0, mask, interpret, reverse_time
    )
    return (h_seq, hT, cT), (xw, wh, lengths, h0, c0, mask, h_seq, c_seq)


def _fused_bwd(interpret, reverse_time, residuals, grads):
    xw, wh, lengths, h0, c0, mask, h_seq, c_seq = residuals
    dhseq, dhT, dcT = grads
    # predecessor-in-recurrence-order h/c sequences: shifted with the
    # initial state at the recurrence's first step.  h_seq is zeroed
    # past each valid prefix, but those steps produce dgates = 0 in the
    # kernel, so the zeros never contribute (reverse_time additionally
    # relies on zero initial state — see fused_lstm_recurrence).
    if reverse_time:
        hprev = jnp.concatenate(
            [h_seq[1:], h0[None].astype(h_seq.dtype)], axis=0
        )
        cprev = jnp.concatenate(
            [c_seq[1:], c0[None].astype(c_seq.dtype)], axis=0
        )
    else:
        hprev = jnp.concatenate(
            [h0[None].astype(h_seq.dtype), h_seq[:-1]], axis=0
        )
        cprev = jnp.concatenate(
            [c0[None].astype(c_seq.dtype), c_seq[:-1]], axis=0
        )
    dgates, dh0, dc0 = _bwd_call(
        xw, wh, hprev, cprev, c_seq, lengths, mask, dhseq, dhT, dcT,
        interpret, reverse_time,
    )
    # weight gradient as ONE large MXU GEMM outside the serial loop —
    # in the stream dtype (bf16 under bf16 compute: 8× the fp32 MXU
    # rate), accumulating fp32
    T, B, G = dgates.shape
    H = wh.shape[0]
    h_in = (hprev * mask.astype(hprev.dtype)).reshape(T * B, H)
    dwh = jnp.dot(
        h_in.T,
        dgates.reshape(T * B, G),
        preferred_element_type=jnp.float32,
    )
    return dgates, dwh, None, dh0, dc0, None


fused_lstm_recurrence.defvjp(_fused_fwd, _fused_bwd)
