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
                if B > BB_eff:
                    # multi-tile batch grid: Mosaic keeps an extra set
                    # of revolving buffers in flight across the outer
                    # grid dim, costing a roughly CONSTANT ~6.7 MB of
                    # scoped-vmem stack on top of the declared blocks
                    # (measured H=400: nb=2/CHUNK=3 → 19.18 M where the
                    # model says 12.39 M; nb=4/CHUNK=2 → 16.56 M vs
                    # 9.93 M).  Reserve 7.5 MB against the 16 MB
                    # hardware limit, i.e. require the model to fit in
                    # 8.5 MB.
                    seq += VMEM_BUDGET - int(8.5 * 1024 * 1024)
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


def _sub_tiles(BB: int) -> int:
    """Number of interleaved batch sub-chains per step.  Rows of the
    batch are INDEPENDENT recurrences, so splitting the tile into two
    sub-chains and issuing their (independent) matmuls back-to-back
    hides each chain's MXU/VPU serial latency behind the other's
    compute — measured ~20% faster at reference sizes, bit-identical
    results.  Sub-tiles stay ≥ 8 rows (the fp32 sublane) and VMEM is
    unchanged (temporaries halve in size but double in count)."""
    return 2 if BB % 2 == 0 and BB >= 16 else 1


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

    BB = h_scr.shape[0]
    nway = _sub_tiles(BB)
    S = BB // nway

    def body(j, carry):
        i = (chunk - 1 - j) if reverse_time else j
        hs, cs = carry
        valid = lens > (base + i)  # (BB, 1)
        new_h, new_c = [], []
        # the sub-chains are independent: their matmul/VPU work
        # interleaves in the schedule (see _sub_tiles)
        for s in range(nway):
            sl = slice(s * S, (s + 1) * S)
            gates = xw_ref[i, sl].astype(jnp.float32) + jnp.dot(
                (hs[s] * mask[sl]).astype(mm_dtype), wh,
                preferred_element_type=jnp.float32,
            )
            gi, gg, gf, go = jnp.split(gates, 4, axis=-1)
            c_new = (
                jax.nn.sigmoid(gf + 1.0) * cs[s]
                + jax.nn.sigmoid(gi) * jnp.tanh(gg)
            )
            h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
            v = valid[sl]
            h_new = jnp.where(v, h_new, hs[s])
            c_new = jnp.where(v, c_new, cs[s])
            hseq_ref[i, sl] = jnp.where(v, h_new, 0.0).astype(
                hseq_ref.dtype
            )
            cseq_ref[i, sl] = c_new.astype(cseq_ref.dtype)
            new_h.append(h_new)
            new_c.append(c_new)
        return (tuple(new_h), tuple(new_c))

    init = (
        tuple(h_scr[s * S : (s + 1) * S] for s in range(nway)),
        tuple(c_scr[s * S : (s + 1) * S] for s in range(nway)),
    )
    hs, cs = jax.lax.fori_loop(0, chunk, body, init)
    for s in range(nway):
        h_scr[s * S : (s + 1) * S] = hs[s]
        c_scr[s * S : (s + 1) * S] = cs[s]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        hT_ref[:] = h_scr[:]
        cT_ref[:] = c_scr[:]

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

    BB = dh_scr.shape[0]
    # adjoint stays single-chain: its loop body is ~3× the forward's
    # (gate recompute + adjoint math + two matmuls) and interleaving
    # sub-chains measured SLOWER end-to-end (scheduling/temp pressure),
    # unlike the forward where it wins ~20%
    nway = 1
    S = BB // nway

    def body(j, carry):
        dhs, dcs = carry
        i = j if reverse_time else (chunk - 1 - j)
        valid = lens > (base + i)
        new_dh, new_dc = [], []
        # independent batch sub-chains interleave (see _sub_tiles)
        for s in range(nway):
            sl = slice(s * S, (s + 1) * S)
            h_in = hprev_ref[i, sl].astype(jnp.float32) * mask[sl]
            gates = xw_ref[i, sl].astype(jnp.float32) + jnp.dot(
                h_in.astype(mm_dtype), wh,
                preferred_element_type=jnp.float32,
            )
            gi, gg, gf, go = jnp.split(gates, 4, axis=-1)
            si = jax.nn.sigmoid(gi)
            sf = jax.nn.sigmoid(gf + 1.0)
            so = jax.nn.sigmoid(go)
            tg = jnp.tanh(gg)
            tc = jnp.tanh(cseq_ref[i, sl].astype(jnp.float32))
            v = valid[sl]
            dh = dhs[s] + jnp.where(
                v, dhseq_ref[i, sl].astype(jnp.float32), 0.0
            )
            do = dh * tc * so * (1.0 - so)
            dct = dh * so * (1.0 - tc * tc) + dcs[s]
            di = dct * tg * si * (1.0 - si)
            dg = dct * si * (1.0 - tg * tg)
            df = (
                dct
                * cprev_ref[i, sl].astype(jnp.float32)
                * sf
                * (1.0 - sf)
            )
            dgates = jnp.concatenate([di, dg, df, do], axis=-1)
            dgates = jnp.where(v, dgates, 0.0)
            dgates_ref[i, sl] = dgates.astype(dgates_ref.dtype)
            dh_prev = (
                jnp.dot(
                    dgates.astype(mm_dtype), wh.T,
                    preferred_element_type=jnp.float32,
                )
                * mask[sl]
            )
            new_dh.append(jnp.where(v, dh_prev, dh))
            new_dc.append(jnp.where(v, dct * sf, dcs[s]))
        return (tuple(new_dh), tuple(new_dc))

    init = (
        tuple(dh_scr[s * S : (s + 1) * S] for s in range(nway)),
        tuple(dc_scr[s * S : (s + 1) * S] for s in range(nway)),
    )
    dhs, dcs = jax.lax.fori_loop(0, chunk, body, init)
    for s in range(nway):
        dh_scr[s * S : (s + 1) * S] = dhs[s]
        dc_scr[s * S : (s + 1) * S] = dcs[s]

    @pl.when(k == nk - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]

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


# --------------------------------------------------------------------------
# fused BIDIRECTIONAL grid kernels: both directions in one launch
# --------------------------------------------------------------------------
#
# The two directions of a biLSTM are independent serial chains; run as
# separate launches each pays the full per-step latency (MXU issue →
# VPU gate math on a dependent chain).  Here both run in ONE kernel:
# direction 0 forward-in-time, direction 1 reverse-in-time (the
# gather-free trick above) — the PIPELINE's per-input index maps feed
# chunk k to chain A and chunk nt-1-k to chain B at the same grid
# step, and the two chains' per-step work has no cross dependencies,
# so Mosaic's scheduler interleaves them and hides each chain's
# latency behind the other's compute.  Zero initial state required
# (encoder case).


def _choose_bi_grid_tiles(
    B: int, H: int, G: int, bwd: bool, stream_bytes: int
) -> tuple[int, int]:
    for BB in (128, 64, 32, 16, 8):
        BB_eff = min(BB, max(B, 1))
        for C in (8, 6, 4, 3, 2, 1):
            sb = stream_bytes
            wh = 2 * H * G * 4
            if bwd:
                seq = 2 * 2 * (
                    2 * C * BB_eff * G * sb + 4 * C * BB_eff * H * sb
                )
                fixed = 2 * 2 * 4 * BB_eff * H * 4
            else:
                seq = 2 * 2 * (
                    C * BB_eff * G * sb + 2 * C * BB_eff * H * sb
                )
                fixed = 2 * 2 * 5 * BB_eff * H * 4
            scratch = 2 * 2 * BB_eff * H * 4
            if wh + seq + fixed + scratch <= VMEM_BUDGET:
                return BB_eff, C
    return 8, 1


def _make_bi_fwd_kernel(chunk: int):
  def _kernel(
    xwf_ref,  # (chunk, BB, 4H) chunk k (forward order)
    xwb_ref,  # (chunk, BB, 4H) chunk nt-1-k (reverse chain's stream)
    whf_ref,  # (H, 4H)
    whb_ref,  # (H, 4H)
    len_ref,  # (BB, 1)
    maskf_ref,  # (BB, H)
    maskb_ref,  # (BB, H)
    hseqf_ref,  # out (chunk, BB, H) at chunk k
    hseqb_ref,  # out (chunk, BB, H) at chunk nt-1-k
    cseqf_ref,
    cseqb_ref,
    hT_ref,  # out (2, BB, H)
    cT_ref,  # out (2, BB, H)
    hf_scr, cf_scr, hb_scr, cb_scr,  # scratch (BB, H) each
  ):
    k = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)
        cb_scr[:] = jnp.zeros_like(cb_scr)

    mm = xwf_ref.dtype
    whf = whf_ref[:].astype(mm)
    whb = whb_ref[:].astype(mm)
    maskf = maskf_ref[:]
    maskb = maskb_ref[:]
    lens = len_ref[:]
    base_f = k * chunk
    base_b = (nt - 1 - k) * chunk

    def cell(xw_t, wh, mask, h, c, valid):
        gates = xw_t.astype(jnp.float32) + jnp.dot(
            (h * mask).astype(mm), wh, preferred_element_type=jnp.float32
        )
        gi, gg, gf, go = jnp.split(gates, 4, axis=-1)
        c_new = (
            jax.nn.sigmoid(gf + 1.0) * c
            + jax.nn.sigmoid(gi) * jnp.tanh(gg)
        )
        h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
        h_new = jnp.where(valid, h_new, h)
        c_new = jnp.where(valid, c_new, c)
        return h_new, c_new

    def body(j, carry):
        hf, cf, hb, cb = carry
        ib = chunk - 1 - j
        valid_f = lens > (base_f + j)
        valid_b = lens > (base_b + ib)
        # chain A (forward time) and chain B (reverse time) are
        # independent: their instructions interleave in the schedule
        hf, cf = cell(xwf_ref[j], whf, maskf, hf, cf, valid_f)
        hb, cb = cell(xwb_ref[ib], whb, maskb, hb, cb, valid_b)
        hseqf_ref[j] = jnp.where(valid_f, hf, 0.0).astype(hseqf_ref.dtype)
        cseqf_ref[j] = cf.astype(cseqf_ref.dtype)
        hseqb_ref[ib] = jnp.where(valid_b, hb, 0.0).astype(hseqb_ref.dtype)
        cseqb_ref[ib] = cb.astype(cseqb_ref.dtype)
        return (hf, cf, hb, cb)

    hf, cf, hb, cb = jax.lax.fori_loop(
        0, chunk, body, (hf_scr[:], cf_scr[:], hb_scr[:], cb_scr[:])
    )
    hf_scr[:] = hf
    cf_scr[:] = cf
    hb_scr[:] = hb
    cb_scr[:] = cb

    @pl.when(k == nt - 1)
    def _():
        hT_ref[0] = hf
        hT_ref[1] = hb
        cT_ref[0] = cf
        cT_ref[1] = cb

  return _kernel


def _bi_grid_fwd_call(xwf, xwb, whf, whb, lengths, maskf, maskb, interpret):
    T, B, G = xwf.shape
    H = whf.shape[0]
    stream = xwf.dtype
    BB, CHUNK = _choose_bi_grid_tiles(
        B, H, G, bwd=False, stream_bytes=stream.itemsize
    )
    prep = lambda a: _pad_axis(_pad_axis(a, CHUNK, 0), BB, 1)  # noqa: E731
    xwf_p, xwb_p = prep(xwf), prep(xwb)
    whf = whf.astype(stream)
    whb = whb.astype(stream)
    Tp, Bp = xwf_p.shape[:2]
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    maskf_p = _pad_axis(maskf, BB, 0)
    maskb_p = _pad_axis(maskb, BB, 0)
    nb, nt = Bp // BB, Tp // CHUNK
    seq3 = lambda b, k: (k, b, 0)  # noqa: E731
    rev3 = lambda b, k: (nt - 1 - k, b, 0)  # noqa: E731
    bfix = lambda b, k: (b, 0)  # noqa: E731
    dfix = lambda b, k: (0, b, 0)  # noqa: E731
    wfix = lambda b, k: (0, 0)  # noqa: E731
    out_shape = (
        jax.ShapeDtypeStruct((Tp, Bp, H), stream),  # h_seq fwd-dir
        jax.ShapeDtypeStruct((Tp, Bp, H), stream),  # h_seq bwd-dir
        jax.ShapeDtypeStruct((Tp, Bp, H), stream),  # c_seq fwd-dir
        jax.ShapeDtypeStruct((Tp, Bp, H), stream),  # c_seq bwd-dir
        jax.ShapeDtypeStruct((2, Bp, H), jnp.float32),  # hT
        jax.ShapeDtypeStruct((2, Bp, H), jnp.float32),  # cT
    )
    hf, hb, cf, cb, hT, cT = pl.pallas_call(
        _make_bi_fwd_kernel(CHUNK),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((CHUNK, BB, G), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, BB, G), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, BB, H), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, BB, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, BB, H), seq3, memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, BB, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, H), dfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, H), dfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(xwf_p, xwb_p, whf, whb, lengths2d, maskf_p, maskb_p)
    return (
        hf[:T, :B], hb[:T, :B], cf[:T, :B], cb[:T, :B],
        hT[:, :B], cT[:, :B],
    )


def _make_bi_bwd_kernel(chunk: int):
  def _kernel(
    xwf_ref, xwb_ref,  # (chunk, BB, 4H) at chunk nt-1-k / k
    whf_ref, whb_ref,  # (H, 4H)
    hpf_ref, hpb_ref,  # h_prev-in-recurrence-order per chain
    cpf_ref, cpb_ref,
    csf_ref, csb_ref,  # c_t per chain
    len_ref,  # (BB, 1)
    maskf_ref, maskb_ref,  # (BB, H)
    dhsf_ref, dhsb_ref,  # upstream dL/dh_t per chain
    dhT_ref, dcT_ref,  # (2, BB, H)
    dgf_ref, dgb_ref,  # out (chunk, BB, 4H)
    dh0_ref, dc0_ref,  # out (2, BB, H)
    dhf_scr, dcf_scr, dhb_scr, dcb_scr,
  ):
    k = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        dhf_scr[:] = dhT_ref[0]
        dcf_scr[:] = dcT_ref[0]
        dhb_scr[:] = dhT_ref[1]
        dcb_scr[:] = dcT_ref[1]

    mm = xwf_ref.dtype
    whf = whf_ref[:].astype(mm)
    whb = whb_ref[:].astype(mm)
    maskf = maskf_ref[:]
    maskb = maskb_ref[:]
    lens = len_ref[:]
    base_f = (nt - 1 - k) * chunk  # chain A adjoint walks backward
    base_b = k * chunk  # chain B adjoint walks forward

    def adj(xw_t, wh, mask, hp, cp, ct, dhs, dh_c, dc_c, valid, dg_ref, i):
        h_in = hp.astype(jnp.float32) * mask
        gates = xw_t.astype(jnp.float32) + jnp.dot(
            h_in.astype(mm), wh, preferred_element_type=jnp.float32
        )
        gi, gg, gf, go = jnp.split(gates, 4, axis=-1)
        si = jax.nn.sigmoid(gi)
        tg = jnp.tanh(gg)
        sf = jax.nn.sigmoid(gf + 1.0)
        so = jax.nn.sigmoid(go)
        tc = jnp.tanh(ct.astype(jnp.float32))
        dh = dh_c + jnp.where(valid, dhs.astype(jnp.float32), 0.0)
        do = dh * tc * so * (1.0 - so)
        dct = dh * so * (1.0 - tc * tc) + dc_c
        di = dct * tg * si * (1.0 - si)
        dg = dct * si * (1.0 - tg * tg)
        df = dct * cp.astype(jnp.float32) * sf * (1.0 - sf)
        dgates = jnp.concatenate([di, dg, df, do], axis=-1)
        dgates = jnp.where(valid, dgates, 0.0)
        dg_ref[i] = dgates.astype(dg_ref.dtype)
        dh_prev = (
            jnp.dot(
                dgates.astype(mm), wh.T, preferred_element_type=jnp.float32
            )
            * mask
        )
        dh_c = jnp.where(valid, dh_prev, dh)
        dc_c = jnp.where(valid, dct * sf, dc_c)
        return dh_c, dc_c

    def body(j, carry):
        dhf, dcf, dhb, dcb = carry
        i_f = chunk - 1 - j  # chain A: reversed within chunk
        i_b = j  # chain B: forward within chunk
        valid_f = lens > (base_f + i_f)
        valid_b = lens > (base_b + i_b)
        dhf, dcf = adj(
            xwf_ref[i_f], whf, maskf, hpf_ref[i_f], cpf_ref[i_f],
            csf_ref[i_f], dhsf_ref[i_f], dhf, dcf, valid_f, dgf_ref, i_f,
        )
        dhb, dcb = adj(
            xwb_ref[i_b], whb, maskb, hpb_ref[i_b], cpb_ref[i_b],
            csb_ref[i_b], dhsb_ref[i_b], dhb, dcb, valid_b, dgb_ref, i_b,
        )
        return (dhf, dcf, dhb, dcb)

    dhf, dcf, dhb, dcb = jax.lax.fori_loop(
        0, chunk, body, (dhf_scr[:], dcf_scr[:], dhb_scr[:], dcb_scr[:])
    )
    dhf_scr[:] = dhf
    dcf_scr[:] = dcf
    dhb_scr[:] = dhb
    dcb_scr[:] = dcb

    @pl.when(k == nt - 1)
    def _():
        dh0_ref[0] = dhf
        dh0_ref[1] = dhb
        dc0_ref[0] = dcf
        dc0_ref[1] = dcb

  return _kernel


def _bi_grid_bwd_call(
    xwf, xwb, whf, whb, hpf, hpb, cpf, cpb, csf, csb,
    lengths, maskf, maskb, dhsf, dhsb, dhT, dcT, interpret,
):
    T, B, G = xwf.shape
    H = whf.shape[0]
    stream = xwf.dtype
    BB, CHUNK = _choose_bi_grid_tiles(
        B, H, G, bwd=True, stream_bytes=stream.itemsize
    )
    prep = lambda a: _pad_axis(  # noqa: E731
        _pad_axis(a.astype(stream), CHUNK, 0), BB, 1
    )
    xwf_p, xwb_p = prep(xwf), prep(xwb)
    hpf_p, hpb_p = prep(hpf), prep(hpb)
    cpf_p, cpb_p = prep(cpf), prep(cpb)
    csf_p, csb_p = prep(csf), prep(csb)
    dhsf_p, dhsb_p = prep(dhsf), prep(dhsb)
    whf = whf.astype(stream)
    whb = whb.astype(stream)
    Tp, Bp = xwf_p.shape[:2]
    nb, nt = Bp // BB, Tp // CHUNK
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    maskf_p = _pad_axis(maskf, BB, 0)
    maskb_p = _pad_axis(maskb, BB, 0)
    dhT_p = _pad_axis(dhT, BB, 1)
    dcT_p = _pad_axis(dcT, BB, 1)
    seq3 = lambda b, k: (k, b, 0)  # noqa: E731
    rev3 = lambda b, k: (nt - 1 - k, b, 0)  # noqa: E731
    bfix = lambda b, k: (b, 0)  # noqa: E731
    dfix = lambda b, k: (0, b, 0)  # noqa: E731
    wfix = lambda b, k: (0, 0)  # noqa: E731
    spec_f = pl.BlockSpec((CHUNK, BB, G), rev3, memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((CHUNK, BB, G), seq3, memory_space=pltpu.VMEM)
    hspec_f = pl.BlockSpec((CHUNK, BB, H), rev3, memory_space=pltpu.VMEM)
    hspec_b = pl.BlockSpec((CHUNK, BB, H), seq3, memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((Tp, Bp, G), stream),  # dgates fwd-dir
        jax.ShapeDtypeStruct((Tp, Bp, G), stream),  # dgates bwd-dir
        jax.ShapeDtypeStruct((2, Bp, H), jnp.float32),
        jax.ShapeDtypeStruct((2, Bp, H), jnp.float32),
    )
    dgf, dgb, dh0, dc0 = pl.pallas_call(
        _make_bi_bwd_kernel(CHUNK),
        grid=(nb, nt),
        in_specs=[
            spec_f, spec_b,
            pl.BlockSpec((H, G), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), wfix, memory_space=pltpu.VMEM),
            hspec_f, hspec_b,
            hspec_f, hspec_b,
            hspec_f, hspec_b,
            pl.BlockSpec((BB, 1), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), bfix, memory_space=pltpu.VMEM),
            hspec_f, hspec_b,
            pl.BlockSpec((2, BB, H), dfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, H), dfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            spec_f, spec_b,
            pl.BlockSpec((2, BB, H), dfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, H), dfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        xwf_p, xwb_p, whf, whb, hpf_p, hpb_p, cpf_p, cpb_p, csf_p, csb_p,
        lengths2d, maskf_p, maskb_p, dhsf_p, dhsb_p, dhT_p, dcT_p,
    )
    return dgf[:T, :B], dgb[:T, :B], dh0[:, :B], dc0[:, :B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_bilstm_grid(xwf, xwb, whf, whb, lengths, maskf, maskb,
                      interpret=False):
    """Bidirectional recurrence in ONE chunked-grid launch: direction 0
    forward-in-time, direction 1 reverse-in-time (gather-free).  Zero
    initial state.  Returns (h_seq (T, B, 2H) aligned+concatenated,
    hT (B, 2H), cT (B, 2H))."""
    hf, hb, _cf, _cb, hT, cT = _bi_grid_fwd_call(
        xwf, xwb, whf, whb, lengths, maskf, maskb, interpret
    )
    return (
        jnp.concatenate([hf, hb], axis=-1),
        jnp.concatenate([hT[0], hT[1]], axis=-1),
        jnp.concatenate([cT[0], cT[1]], axis=-1),
    )


def _bi_grid_fused_fwd(xwf, xwb, whf, whb, lengths, maskf, maskb, interpret):
    hf, hb, cf, cb, hT, cT = _bi_grid_fwd_call(
        xwf, xwb, whf, whb, lengths, maskf, maskb, interpret
    )
    out = (
        jnp.concatenate([hf, hb], axis=-1),
        jnp.concatenate([hT[0], hT[1]], axis=-1),
        jnp.concatenate([cT[0], cT[1]], axis=-1),
    )
    return out, (xwf, xwb, whf, whb, lengths, maskf, maskb, hf, hb, cf, cb)


def _bi_grid_fused_bwd(interpret, residuals, grads):
    xwf, xwb, whf, whb, lengths, maskf, maskb, hf, hb, cf, cb = residuals
    dhseq, dhT, dcT = grads
    H = whf.shape[0]
    dhsf, dhsb = dhseq[..., :H], dhseq[..., H:]
    zeros = jnp.zeros_like(hf[:1])
    # chain A's recurrence-predecessor is t-1; chain B's is t+1
    hpf = jnp.concatenate([zeros, hf[:-1]], axis=0)
    cpf = jnp.concatenate([zeros, cf[:-1]], axis=0)
    hpb = jnp.concatenate([hb[1:], zeros], axis=0)
    cpb = jnp.concatenate([cb[1:], zeros], axis=0)
    # adjoint as TWO unidirectional launches: the fused bwd kernel's
    # doubled loop-body temporaries overflow Mosaic's scoped-VMEM stack
    # at full batch tiles (measured 17.8 MB vs the 16 MB core limit),
    # while the split launches keep BB=128 and bigger chunks
    dgf, _dh0f, _dc0f = _bwd_call(
        xwf, whf, hpf, cpf, cf, lengths, maskf,
        dhsf.astype(xwf.dtype), dhT[..., :H], dcT[..., :H],
        interpret, False,
    )
    dgb, _dh0b, _dc0b = _bwd_call(
        xwb, whb, hpb, cpb, cb, lengths, maskb,
        dhsb.astype(xwb.dtype), dhT[..., H:], dcT[..., H:],
        interpret, True,
    )
    T, B, G = dgf.shape
    h_inf = (hpf * maskf.astype(hpf.dtype)).reshape(T * B, H)
    h_inb = (hpb * maskb.astype(hpb.dtype)).reshape(T * B, H)
    dwhf = jnp.dot(
        h_inf.T, dgf.reshape(T * B, G), preferred_element_type=jnp.float32
    )
    dwhb = jnp.dot(
        h_inb.T, dgb.reshape(T * B, G), preferred_element_type=jnp.float32
    )
    return dgf, dgb, dwhf, dwhb, None, None, None


fused_bilstm_grid.defvjp(_bi_grid_fused_fwd, _bi_grid_fused_bwd)
