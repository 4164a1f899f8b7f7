"""Single-launch LSTM recurrence with manual double-buffered DMA
(forward + backward, custom VJP).

The chunked-grid kernels in pallas_lstm.py pay per-grid-step overhead
(Mosaic re-entry + pipeline barriers, ~10 µs/step — measured vs a
trivial copy kernel, RESULTS.md) on every time chunk, which dominates
the ~1 µs of recurrent matmul per step.  These kernels run the ENTIRE
sequence for a batch tile in ONE grid step: the input projection stays
in HBM and is streamed chunk-by-chunk with ``make_async_copy`` double
buffering (pallas guide pattern), while h/c residuals stream back to
HBM behind the compute.  The only remaining grid axis is batch tiling.

Mosaic requires manual HBM↔VMEM copies to be 128-lane aligned in the
minor dimension; the reference sizes (H=400 → 4H=1600) are not, so
every STREAMED tensor is lane-padded (H→Hp, 4H→Gp, multiples of 128)
with zero-filled weights making the padded columns exactly inert
(zero-in → zero-out, forward and backward — asserted in tests).  The
padding costs ~12% extra stream bandwidth and removes the ~10 µs/chunk
grid overhead entirely.

Semantics match ops.pallas_lstm.fused_lstm_recurrence exactly:
variable lengths freeze the carry, outputs past the valid prefix are
zero, the weight gradient is one big XLA GEMM outside the serial loop,
gate packing is (i, g, f, o) with the +1 forget bias.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lstm import _pad_axis

# Tighter budget than the chunked-grid kernels: the single-launch
# kernels keep large fori_loop bodies whose temporaries (gates,
# concatenates at padded width) live on Mosaic's scoped-VMEM stack on
# TOP of the declared buffers — observed ~4-6 MB of stack at the
# reference sizes, so the declared footprint must stay well under the
# 16 MB core limit.
DMA_VMEM_BUDGET = 9 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_dma_tiles(
    B: int, Hp: int, Gp: int, bwd: bool, stream_bytes: int
) -> tuple[int, int]:
    """(batch tile BB, time chunk C) fitting the VMEM budget.

    Footprint: padded weights block (stream dtype) + double-buffered
    streamed chunks (in and out) + per-tile fixed blocks + carry
    state."""
    wh = Hp * Gp * stream_bytes
    for BB in (128, 64, 32, 16, 8):
        BB_eff = min(BB, max(B, 1))
        for C in (8, 6, 4, 3, 2, 1):
            sb = stream_bytes
            if bwd:
                # in: xw(Gp) + hprev/cprev/cseq/dhseq (4·Hp); out: dgates(Gp)
                bufs = 2 * C * BB_eff * (2 * Gp + 4 * Hp) * sb
                fixed = 6 * BB_eff * Hp * 4
            else:
                # in: xw(Gp); out: h,c (2·Hp)
                bufs = 2 * C * BB_eff * (Gp + 2 * Hp) * sb
                fixed = 7 * BB_eff * Hp * 4
            scratch = 2 * BB_eff * Hp * 4
            if wh + bufs + fixed + scratch <= DMA_VMEM_BUDGET:
                return BB_eff, C
    return 8, 1


def _pad_lanes(a: jnp.ndarray, to: int) -> jnp.ndarray:
    return _pad_axis(a, to, a.ndim - 1) if a.shape[-1] % to else a


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _make_fwd_kernel(T: int, chunk: int, BB: int, G: int):
    nk = T // chunk

    def kernel(
        xw_hbm,  # (T, Bp, Gp) ANY
        wh_ref,  # (Hp, Gp) VMEM, zero rows/cols beyond (H, 4H)
        h0_ref,  # (BB, Hp)
        c0_ref,  # (BB, Hp)
        len_ref,  # (BB, 1)
        mask_ref,  # (BB, Hp)
        hseq_hbm,  # out (T, Bp, Hp) ANY
        cseq_hbm,  # out (T, Bp, Hp) ANY
        hT_ref,  # out (BB, Hp) VMEM
        cT_ref,  # out (BB, Hp) VMEM
        xw_buf,  # scratch (2, chunk, BB, Gp)
        h_buf,  # scratch (2, chunk, BB, Hp)
        c_buf,  # scratch (2, chunk, BB, Hp)
        in_sem,  # DMA (2,)
        out_sem,  # DMA (2, 2)
    ):
        b = pl.program_id(0)
        b0 = b * BB
        # weights live in VMEM in the stream dtype; matmul operands are
        # cast to it too (bf16 MXU rate under bf16 compute), fp32 accum
        wh = wh_ref[:]
        mm_dtype = wh.dtype
        mask = mask_ref[:]
        lens = len_ref[:]

        def in_dma(slot, k):
            return pltpu.make_async_copy(
                xw_hbm.at[pl.ds(k * chunk, chunk), pl.ds(b0, BB)],
                xw_buf.at[slot],
                in_sem.at[slot],
            )

        def out_dma(slot, k):
            return (
                pltpu.make_async_copy(
                    h_buf.at[slot],
                    hseq_hbm.at[pl.ds(k * chunk, chunk), pl.ds(b0, BB)],
                    out_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    c_buf.at[slot],
                    cseq_hbm.at[pl.ds(k * chunk, chunk), pl.ds(b0, BB)],
                    out_sem.at[slot, 1],
                ),
            )

        in_dma(0, 0).start()

        def chunk_body(k, carry):
            h, c = carry
            slot = k % 2

            @pl.when(k + 1 < nk)
            def _():
                in_dma((k + 1) % 2, k + 1).start()

            in_dma(slot, k).wait()

            # this slot's previous output DMA must land before overwrite
            @pl.when(k >= 2)
            def _():
                d0, d1 = out_dma(slot, k - 2)
                d0.wait()
                d1.wait()

            base = k * chunk

            def step(i, hc):
                h, c = hc
                gates = xw_buf[slot, i].astype(jnp.float32) + jnp.dot(
                    (h * mask).astype(mm_dtype), wh,
                    preferred_element_type=jnp.float32,
                )
                H4 = G // 4
                gi = gates[:, :H4]
                gg = gates[:, H4 : 2 * H4]
                gf = gates[:, 2 * H4 : 3 * H4]
                go = gates[:, 3 * H4 : G]
                # recombine at padded width: pad cols stay exactly zero
                # (zero xw pad + zero wh pad cols → gates pad = 0, and
                # c0/h0 pads are zero, so 0-in → 0-out)
                c_new = jnp.concatenate(
                    [
                        jax.nn.sigmoid(gf + 1.0) * c[:, :H4]
                        + jax.nn.sigmoid(gi) * jnp.tanh(gg),
                        jnp.zeros_like(c[:, H4:]),
                    ],
                    axis=1,
                )
                h_new = jnp.concatenate(
                    [
                        jax.nn.sigmoid(go) * jnp.tanh(c_new[:, :H4]),
                        jnp.zeros_like(h[:, H4:]),
                    ],
                    axis=1,
                )
                valid = lens > (base + i)  # (BB, 1)
                h_new = jnp.where(valid, h_new, h)
                c_new = jnp.where(valid, c_new, c)
                h_buf[slot, i] = jnp.where(valid, h_new, 0.0).astype(
                    h_buf.dtype
                )
                c_buf[slot, i] = c_new.astype(c_buf.dtype)
                return (h_new, c_new)

            h, c = jax.lax.fori_loop(0, chunk, step, (h, c))
            d0, d1 = out_dma(slot, k)
            d0.start()
            d1.start()
            return (h, c)

        h, c = jax.lax.fori_loop(
            0, nk, chunk_body, (h0_ref[:], c0_ref[:])
        )

        # drain outstanding output DMAs
        @pl.when(nk >= 2)
        def _():
            d0, d1 = out_dma(nk % 2, nk - 2)
            d0.wait()
            d1.wait()

        d0, d1 = out_dma((nk - 1) % 2, nk - 1)
        d0.wait()
        d1.wait()
        hT_ref[:] = h
        cT_ref[:] = c

    return kernel


def _fwd_call_dma(xw, wh, lengths, h0, c0, mask, interpret):
    T, B, G = xw.shape
    H = wh.shape[0]
    stream = xw.dtype
    Gp = _round_up(G, 128)
    Hp = _round_up(H, 128)
    BB, CHUNK = _choose_dma_tiles(B, Hp, Gp, False, stream.itemsize)

    xw_p = _pad_lanes(_pad_axis(_pad_axis(xw, CHUNK, 0), BB, 1), Gp)
    Tp, Bp = xw_p.shape[:2]
    # zero-filled weight padding keeps the extra lanes inert; the
    # VMEM weight block is stored in the stream dtype
    wh_p = _pad_lanes(_pad_axis(wh, Hp, 0), Gp).astype(stream)
    h0_p = _pad_lanes(_pad_axis(h0, BB, 0), Hp)
    c0_p = _pad_lanes(_pad_axis(c0, BB, 0), Hp)
    mask_p = _pad_lanes(_pad_axis(mask, BB, 0), Hp)
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    nb = Bp // BB

    bfix = lambda b: (b, 0)  # noqa: E731
    wfix = lambda b: (0, 0)  # noqa: E731
    out_shape = (
        jax.ShapeDtypeStruct((Tp, Bp, Hp), stream),  # h_seq
        jax.ShapeDtypeStruct((Tp, Bp, Hp), stream),  # c_seq
        jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),  # hT
        jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),  # cT
    )
    h_seq, c_seq, hT, cT = pl.pallas_call(
        _make_fwd_kernel(Tp, CHUNK, BB, G),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xw stays in HBM
            pl.BlockSpec((Hp, Gp), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, BB, Gp), stream),
            pltpu.VMEM((2, CHUNK, BB, Hp), stream),
            pltpu.VMEM((2, CHUNK, BB, Hp), stream),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xw_p, wh_p, h0_p, c0_p, lengths2d, mask_p)
    return (
        h_seq[:T, :B, :H],
        c_seq[:T, :B, :H],
        hT[:B, :H],
        cT[:B, :H],
    )


# --------------------------------------------------------------------------
# backward (reverse-time adjoint; dwh left to XLA)
# --------------------------------------------------------------------------


def _make_bwd_kernel(T: int, chunk: int, BB: int, G: int):
    nk = T // chunk

    def kernel(
        xw_hbm,  # (T, Bp, Gp) ANY
        hprev_hbm,  # (T, Bp, Hp) ANY
        cprev_hbm,  # (T, Bp, Hp) ANY
        cseq_hbm,  # (T, Bp, Hp) ANY
        dhseq_hbm,  # (T, Bp, Hp) ANY
        wh_ref,  # (Hp, Gp) VMEM
        len_ref,  # (BB, 1)
        mask_ref,  # (BB, Hp)
        dhT_ref,  # (BB, Hp)
        dcT_ref,  # (BB, Hp)
        dgates_hbm,  # out (T, Bp, Gp) ANY
        dh0_ref,  # out (BB, Hp)
        dc0_ref,  # out (BB, Hp)
        in_buf,  # scratch (2, chunk, BB, Gp + 4·Hp) packed streams
        dg_buf,  # scratch (2, chunk, BB, Gp)
        in_sem,  # DMA (2, 5)
        out_sem,  # DMA (2,)
    ):
        b = pl.program_id(0)
        b0 = b * BB
        wh = wh_ref[:]
        mm_dtype = wh.dtype
        mask = mask_ref[:]
        lens = len_ref[:]
        Gp = dg_buf.shape[-1]
        Hp = mask.shape[-1]

        def in_dmas(slot, k):
            # grid step k covers the k-th time chunk FROM THE END
            t0 = (nk - 1 - k) * chunk
            srcs = (xw_hbm, hprev_hbm, cprev_hbm, cseq_hbm, dhseq_hbm)
            offs = (0, Gp, Gp + Hp, Gp + 2 * Hp, Gp + 3 * Hp)
            widths = (Gp, Hp, Hp, Hp, Hp)
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(t0, chunk), pl.ds(b0, BB)],
                    in_buf.at[slot, :, :, pl.ds(off, w)],
                    in_sem.at[slot, i],
                )
                for i, (src, off, w) in enumerate(zip(srcs, offs, widths))
            ]

        def out_dma(slot, k):
            t0 = (nk - 1 - k) * chunk
            return pltpu.make_async_copy(
                dg_buf.at[slot],
                dgates_hbm.at[pl.ds(t0, chunk), pl.ds(b0, BB)],
                out_sem.at[slot],
            )

        for d in in_dmas(0, 0):
            d.start()

        def chunk_body(k, carry):
            dh_c, dc_c = carry
            slot = k % 2

            @pl.when(k + 1 < nk)
            def _():
                for d in in_dmas((k + 1) % 2, k + 1):
                    d.start()

            for d in in_dmas(slot, k):
                d.wait()

            @pl.when(k >= 2)
            def _():
                out_dma(slot, k - 2).wait()

            base = (nk - 1 - k) * chunk
            H4 = G // 4

            def step(j, carry):
                dh_c, dc_c = carry
                i = chunk - 1 - j
                valid = lens > (base + i)
                row = in_buf[slot, i].astype(jnp.float32)
                xw = row[:, :Gp]
                h_in = row[:, Gp : Gp + Hp] * mask
                cprev = row[:, Gp + Hp : Gp + 2 * Hp]
                c_t = row[:, Gp + 2 * Hp : Gp + 3 * Hp]
                dh_up = row[:, Gp + 3 * Hp :]
                gates = xw + jnp.dot(
                    h_in.astype(mm_dtype), wh,
                    preferred_element_type=jnp.float32,
                )
                si = jax.nn.sigmoid(gates[:, :H4])
                tg = jnp.tanh(gates[:, H4 : 2 * H4])
                sf = jax.nn.sigmoid(gates[:, 2 * H4 : 3 * H4] + 1.0)
                so = jax.nn.sigmoid(gates[:, 3 * H4 : G])
                tc = jnp.tanh(c_t[:, :H4])

                dh = dh_c[:, :H4] + jnp.where(valid, dh_up[:, :H4], 0.0)
                do = dh * tc * so * (1.0 - so)
                dct = dh * so * (1.0 - tc * tc) + dc_c[:, :H4]
                di = dct * tg * si * (1.0 - si)
                dg = dct * si * (1.0 - tg * tg)
                df = dct * cprev[:, :H4] * sf * (1.0 - sf)
                dgates = jnp.concatenate(
                    [di, dg, df, do, jnp.zeros((dh.shape[0], Gp - G))],
                    axis=1,
                )
                dgates = jnp.where(valid, dgates, 0.0)
                dg_buf[slot, i] = dgates.astype(dg_buf.dtype)
                dh_prev = (
                    jnp.dot(
                        dgates.astype(mm_dtype), wh.T,
                        preferred_element_type=jnp.float32,
                    )
                    * mask
                )
                dc_prev = jnp.concatenate(
                    [dct * sf, jnp.zeros((dh.shape[0], Hp - H4))], axis=1
                )
                dh_c = jnp.where(valid, dh_prev, dh_c)
                dc_c = jnp.where(valid, dc_prev, dc_c)
                return (dh_c, dc_c)

            dh_c, dc_c = jax.lax.fori_loop(0, chunk, step, (dh_c, dc_c))
            out_dma(slot, k).start()
            return (dh_c, dc_c)

        dh, dc = jax.lax.fori_loop(
            0, nk, chunk_body, (dhT_ref[:], dcT_ref[:])
        )

        @pl.when(nk >= 2)
        def _():
            out_dma(nk % 2, nk - 2).wait()

        out_dma((nk - 1) % 2, nk - 1).wait()
        dh0_ref[:] = dh
        dc0_ref[:] = dc

    return kernel


def _bwd_call_dma(
    xw, wh, hprev, cprev, cseq, lengths, mask, dhseq, dhT, dcT, interpret
):
    T, B, G = xw.shape
    H = wh.shape[0]
    stream = xw.dtype
    Gp = _round_up(G, 128)
    Hp = _round_up(H, 128)
    BB, CHUNK = _choose_dma_tiles(B, Hp, Gp, True, stream.itemsize)

    def prep(a, lanes):
        return _pad_lanes(_pad_axis(_pad_axis(a, CHUNK, 0), BB, 1), lanes)

    xw_p = prep(xw, Gp)
    hprev_p = prep(hprev.astype(stream), Hp)
    cprev_p = prep(cprev.astype(stream), Hp)
    cseq_p = prep(cseq.astype(stream), Hp)
    dhseq_p = prep(dhseq.astype(stream), Hp)
    Tp, Bp = xw_p.shape[:2]
    nb = Bp // BB
    wh_p = _pad_lanes(_pad_axis(wh, Hp, 0), Gp).astype(stream)
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    mask_p = _pad_lanes(_pad_axis(mask, BB, 0), Hp)
    dhT_p = _pad_lanes(_pad_axis(dhT, BB, 0), Hp)
    dcT_p = _pad_lanes(_pad_axis(dcT, BB, 0), Hp)

    bfix = lambda b: (b, 0)  # noqa: E731
    wfix = lambda b: (0, 0)  # noqa: E731
    out_shape = (
        jax.ShapeDtypeStruct((Tp, Bp, Gp), stream),  # dgates (=dxw)
        jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),  # dh0
        jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),  # dc0
    )
    dgates, dh0, dc0 = pl.pallas_call(
        _make_bwd_kernel(Tp, CHUNK, BB, G),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Hp, Gp), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Hp), bfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, BB, Gp + 4 * Hp), stream),
            pltpu.VMEM((2, CHUNK, BB, Gp), stream),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        xw_p, hprev_p, cprev_p, cseq_p, dhseq_p,
        wh_p, lengths2d, mask_p, dhT_p, dcT_p,
    )
    return dgates[:T, :B, :G], dh0[:B, :H], dc0[:B, :H]


# --------------------------------------------------------------------------
# custom-VJP wrapper (same contract as pallas_lstm.fused_lstm_recurrence)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_lstm_recurrence_dma(xw, wh, lengths, h0, c0, mask, interpret=False):
    """(h_seq (T,B,H), hT (B,H), cT (B,H)) from the precomputed input
    projection ``xw = xs@wx + b`` — single-launch streaming recurrence."""
    h_seq, _c_seq, hT, cT = _fwd_call_dma(
        xw, wh, lengths, h0, c0, mask, interpret
    )
    return h_seq, hT, cT


def _fused_fwd_dma(xw, wh, lengths, h0, c0, mask, interpret):
    h_seq, c_seq, hT, cT = _fwd_call_dma(
        xw, wh, lengths, h0, c0, mask, interpret
    )
    return (h_seq, hT, cT), (xw, wh, lengths, h0, c0, mask, h_seq, c_seq)


def _fused_bwd_dma(interpret, residuals, grads):
    xw, wh, lengths, h0, c0, mask, h_seq, c_seq = residuals
    dhseq, dhT, dcT = grads
    hprev = jnp.concatenate([h0[None].astype(h_seq.dtype), h_seq[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None].astype(c_seq.dtype), c_seq[:-1]], axis=0)
    dgates, dh0, dc0 = _bwd_call_dma(
        xw, wh, hprev, cprev, c_seq, lengths, mask,
        dhseq.astype(xw.dtype), dhT, dcT, interpret,
    )
    # weight gradient as ONE large MXU GEMM in the stream dtype
    # (bf16 under bf16 compute), accumulating fp32
    T, B, G = dgates.shape
    H = wh.shape[0]
    h_in = (hprev * mask.astype(hprev.dtype)).reshape(T * B, H)
    dwh = jnp.dot(
        h_in.T,
        dgates.reshape(T * B, G),
        preferred_element_type=jnp.float32,
    )
    return dgates, dwh, None, dh0, dc0, None


fused_lstm_recurrence_dma.defvjp(_fused_fwd_dma, _fused_bwd_dma)


# --------------------------------------------------------------------------
# fused BIDIRECTIONAL recurrence: both directions in one kernel
# --------------------------------------------------------------------------
#
# The two directions of a biLSTM are independent serial chains; run
# separately they each pay the full per-step latency (MXU issue + VPU
# gate math on a dependent chain).  Interleaving them in ONE kernel —
# two back-to-back independent matmuls per step — hides each chain's
# latency behind the other's compute, so a bidirectional layer costs
# roughly ONE unidirectional kernel instead of two sequential launches.
# Direction 1's streams are the caller-reversed sequence (the usual
# reverse_padded trick); everything else matches the unidirectional
# kernels above.


# The bidirectional kernels carry twice the loop-body temporaries on
# Mosaic's scoped-VMEM stack, so their declared buffers get a tighter
# budget still (observed ~8-12 MB of stack at reference sizes).
BI_DMA_VMEM_BUDGET = 7 * 1024 * 1024


def _choose_bi_tiles(
    B: int, Hp: int, Gp: int, bwd: bool, stream_bytes: int
) -> tuple[int, int]:
    wh = 2 * Hp * Gp * stream_bytes
    for BB in (128, 64, 32, 16, 8):
        BB_eff = min(BB, max(B, 1))
        for C in (8, 6, 4, 3, 2, 1):
            sb = stream_bytes
            if bwd:
                bufs = 2 * 2 * C * BB_eff * (2 * Gp + 4 * Hp) * sb
                fixed = 2 * 6 * BB_eff * Hp * 4
            else:
                bufs = 2 * 2 * C * BB_eff * (Gp + 2 * Hp) * sb
                fixed = 2 * 7 * BB_eff * Hp * 4
            scratch = 2 * 2 * BB_eff * Hp * 4
            if wh + bufs + fixed + scratch <= BI_DMA_VMEM_BUDGET:
                return BB_eff, C
    return 8, 1


def _make_bi_fwd_kernel(T: int, chunk: int, BB: int, G: int):
    nk = T // chunk

    def kernel(
        xw_hbm,  # (T, 2, Bp, Gp) ANY — [:, 1] is the REVERSED stream
        wh_ref,  # (2, Hp, Gp) VMEM
        h0_ref,  # (2, BB, Hp)
        c0_ref,  # (2, BB, Hp)
        len_ref,  # (BB, 1)
        mask_ref,  # (2, BB, Hp)
        hseq_hbm,  # out (T, 2, Bp, Hp) ANY
        cseq_hbm,  # out (T, 2, Bp, Hp) ANY
        hT_ref,  # out (2, BB, Hp)
        cT_ref,  # out (2, BB, Hp)
        xw_buf,  # scratch (2, 2, chunk, BB, Gp)  [slot, dir, ...]
        h_buf,  # scratch (2, 2, chunk, BB, Hp)
        c_buf,  # scratch (2, 2, chunk, BB, Hp)
        in_sem,  # DMA (2, 2)
        out_sem,  # DMA (2, 2, 2)
    ):
        b = pl.program_id(0)
        b0 = b * BB
        wh = wh_ref[:]
        mm_dtype = wh.dtype
        mask = mask_ref[:]
        lens = len_ref[:]

        def in_dmas(slot, k):
            return [
                pltpu.make_async_copy(
                    xw_hbm.at[pl.ds(k * chunk, chunk), d, pl.ds(b0, BB)],
                    xw_buf.at[slot, d],
                    in_sem.at[slot, d],
                )
                for d in range(2)
            ]

        def out_dmas(slot, k):
            return [
                pltpu.make_async_copy(
                    h_buf.at[slot, d],
                    hseq_hbm.at[pl.ds(k * chunk, chunk), d, pl.ds(b0, BB)],
                    out_sem.at[slot, d, 0],
                )
                for d in range(2)
            ] + [
                pltpu.make_async_copy(
                    c_buf.at[slot, d],
                    cseq_hbm.at[pl.ds(k * chunk, chunk), d, pl.ds(b0, BB)],
                    out_sem.at[slot, d, 1],
                )
                for d in range(2)
            ]

        for d in in_dmas(0, 0):
            d.start()

        def chunk_body(k, carry):
            slot = k % 2

            @pl.when(k + 1 < nk)
            def _():
                for d in in_dmas((k + 1) % 2, k + 1):
                    d.start()

            for d in in_dmas(slot, k):
                d.wait()

            @pl.when(k >= 2)
            def _():
                for d in out_dmas(slot, k - 2):
                    d.wait()

            base = k * chunk
            H4 = G // 4

            def step(i, hc):
                (h_a, c_a), (h_b, c_b) = hc
                valid = lens > (base + i)
                # the two directions are INDEPENDENT chains: the blocks
                # below have no cross dependencies, so Mosaic's scheduler
                # interleaves them, hiding each chain's matmul/VPU
                # latency behind the other's compute; sequencing them in
                # trace order keeps peak scoped-VMEM stack at ~one
                # direction's temporaries
                new = []
                for d, (hd, cd) in ((0, (h_a, c_a)), (1, (h_b, c_b))):
                    g = xw_buf[slot, d, i].astype(jnp.float32) + jnp.dot(
                        (hd * mask[d]).astype(mm_dtype),
                        wh[d],
                        preferred_element_type=jnp.float32,
                    )
                    c_new = jnp.concatenate(
                        [
                            jax.nn.sigmoid(g[:, 2 * H4 : 3 * H4] + 1.0)
                            * cd[:, :H4]
                            + jax.nn.sigmoid(g[:, :H4])
                            * jnp.tanh(g[:, H4 : 2 * H4]),
                            jnp.zeros_like(cd[:, H4:]),
                        ],
                        axis=1,
                    )
                    h_new = jnp.concatenate(
                        [
                            jax.nn.sigmoid(g[:, 3 * H4 : G])
                            * jnp.tanh(c_new[:, :H4]),
                            jnp.zeros_like(hd[:, H4:]),
                        ],
                        axis=1,
                    )
                    h_new = jnp.where(valid, h_new, hd)
                    c_new = jnp.where(valid, c_new, cd)
                    h_buf[slot, d, i] = jnp.where(valid, h_new, 0.0).astype(
                        h_buf.dtype
                    )
                    c_buf[slot, d, i] = c_new.astype(c_buf.dtype)
                    new.append((h_new, c_new))
                return (new[0], new[1])

            carry = jax.lax.fori_loop(0, chunk, step, carry)
            for d in out_dmas(slot, k):
                d.start()
            return carry

        carry0 = (
            (h0_ref[0], c0_ref[0]),
            (h0_ref[1], c0_ref[1]),
        )
        (h_a, c_a), (h_b, c_b) = jax.lax.fori_loop(
            0, nk, chunk_body, carry0
        )

        @pl.when(nk >= 2)
        def _():
            for d in out_dmas(nk % 2, nk - 2):
                d.wait()

        for d in out_dmas((nk - 1) % 2, nk - 1):
            d.wait()
        hT_ref[0] = h_a
        hT_ref[1] = h_b
        cT_ref[0] = c_a
        cT_ref[1] = c_b

    return kernel


def _bi_fwd_call(xw2, wh2, lengths, h02, c02, mask2, interpret):
    T, D, B, G = xw2.shape
    H = wh2.shape[1]
    stream = xw2.dtype
    Gp = _round_up(G, 128)
    Hp = _round_up(H, 128)
    BB, CHUNK = _choose_bi_tiles(B, Hp, Gp, False, stream.itemsize)

    xw_p = _pad_lanes(_pad_axis(_pad_axis(xw2, CHUNK, 0), BB, 2), Gp)
    Tp, _, Bp = xw_p.shape[:3]
    wh_p = _pad_lanes(_pad_axis(wh2, Hp, 1), Gp).astype(stream)
    h0_p = _pad_lanes(_pad_axis(h02, BB, 1), Hp)
    c0_p = _pad_lanes(_pad_axis(c02, BB, 1), Hp)
    mask_p = _pad_lanes(_pad_axis(mask2, BB, 1), Hp)
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    nb = Bp // BB

    bfix = lambda b: (0, b, 0)  # noqa: E731
    lfix = lambda b: (b, 0)  # noqa: E731
    wfix = lambda b: (0, 0, 0)  # noqa: E731
    out_shape = (
        jax.ShapeDtypeStruct((Tp, 2, Bp, Hp), stream),  # h_seq
        jax.ShapeDtypeStruct((Tp, 2, Bp, Hp), stream),  # c_seq
        jax.ShapeDtypeStruct((2, Bp, Hp), jnp.float32),  # hT
        jax.ShapeDtypeStruct((2, Bp, Hp), jnp.float32),  # cT
    )
    h_seq, c_seq, hT, cT = pl.pallas_call(
        _make_bi_fwd_kernel(Tp, CHUNK, BB, G),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, Hp, Gp), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), lfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 2, CHUNK, BB, Gp), stream),
            pltpu.VMEM((2, 2, CHUNK, BB, Hp), stream),
            pltpu.VMEM((2, 2, CHUNK, BB, Hp), stream),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xw_p, wh_p, h0_p, c0_p, lengths2d, mask_p)
    return (
        h_seq[:T, :, :B, :H],
        c_seq[:T, :, :B, :H],
        hT[:, :B, :H],
        cT[:, :B, :H],
    )


def _make_bi_bwd_kernel(T: int, chunk: int, BB: int, G: int):
    nk = T // chunk

    def kernel(
        xw_hbm,  # (T, 2, Bp, Gp) ANY
        hprev_hbm,  # (T, 2, Bp, Hp) ANY
        cprev_hbm,  # (T, 2, Bp, Hp) ANY
        cseq_hbm,  # (T, 2, Bp, Hp) ANY
        dhseq_hbm,  # (T, 2, Bp, Hp) ANY
        wh_ref,  # (2, Hp, Gp) VMEM
        len_ref,  # (BB, 1)
        mask_ref,  # (2, BB, Hp)
        dhT_ref,  # (2, BB, Hp)
        dcT_ref,  # (2, BB, Hp)
        dgates_hbm,  # out (T, 2, Bp, Gp) ANY
        dh0_ref,  # out (2, BB, Hp)
        dc0_ref,  # out (2, BB, Hp)
        in_buf,  # scratch (2, 2, chunk, BB, Gp + 4·Hp)
        dg_buf,  # scratch (2, 2, chunk, BB, Gp)
        in_sem,  # DMA (2, 2, 5)
        out_sem,  # DMA (2, 2)
    ):
        b = pl.program_id(0)
        b0 = b * BB
        wh = wh_ref[:]
        mm_dtype = wh.dtype
        mask = mask_ref[:]
        lens = len_ref[:]
        Gp = dg_buf.shape[-1]
        Hp = mask.shape[-1]

        def in_dmas(slot, k):
            t0 = (nk - 1 - k) * chunk
            srcs = (xw_hbm, hprev_hbm, cprev_hbm, cseq_hbm, dhseq_hbm)
            offs = (0, Gp, Gp + Hp, Gp + 2 * Hp, Gp + 3 * Hp)
            widths = (Gp, Hp, Hp, Hp, Hp)
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(t0, chunk), d, pl.ds(b0, BB)],
                    in_buf.at[slot, d, :, :, pl.ds(off, w)],
                    in_sem.at[slot, d, i],
                )
                for d in range(2)
                for i, (src, off, w) in enumerate(zip(srcs, offs, widths))
            ]

        def out_dmas(slot, k):
            t0 = (nk - 1 - k) * chunk
            return [
                pltpu.make_async_copy(
                    dg_buf.at[slot, d],
                    dgates_hbm.at[pl.ds(t0, chunk), d, pl.ds(b0, BB)],
                    out_sem.at[slot, d],
                )
                for d in range(2)
            ]

        for d in in_dmas(0, 0):
            d.start()

        def chunk_body(k, carry):
            slot = k % 2

            @pl.when(k + 1 < nk)
            def _():
                for d in in_dmas((k + 1) % 2, k + 1):
                    d.start()

            for d in in_dmas(slot, k):
                d.wait()

            @pl.when(k >= 2)
            def _():
                for d in out_dmas(slot, k - 2):
                    d.wait()

            base = (nk - 1 - k) * chunk
            H4 = G // 4

            def step(j, carry):
                (dh_a, dc_a), (dh_b, dc_b) = carry
                i = chunk - 1 - j
                valid = lens > (base + i)
                # per-direction blocks, fields sliced straight from the
                # packed ref: independent chains interleave in the
                # schedule while peak stack stays ~one direction
                new = []
                for d, (dh_c, dc_c) in ((0, (dh_a, dc_a)), (1, (dh_b, dc_b))):
                    h_in = (
                        in_buf[slot, d, i, :, Gp : Gp + Hp].astype(
                            jnp.float32
                        )
                        * mask[d]
                    )
                    g = in_buf[slot, d, i, :, :Gp].astype(
                        jnp.float32
                    ) + jnp.dot(
                        h_in.astype(mm_dtype), wh[d],
                        preferred_element_type=jnp.float32,
                    )
                    cprev = in_buf[slot, d, i, :, Gp + Hp : Gp + 2 * Hp]
                    c_t = in_buf[slot, d, i, :, Gp + 2 * Hp : Gp + 3 * Hp]
                    dh_up = in_buf[slot, d, i, :, Gp + 3 * Hp :]
                    si = jax.nn.sigmoid(g[:, :H4])
                    tg = jnp.tanh(g[:, H4 : 2 * H4])
                    sf = jax.nn.sigmoid(g[:, 2 * H4 : 3 * H4] + 1.0)
                    so = jax.nn.sigmoid(g[:, 3 * H4 : G])
                    tc = jnp.tanh(c_t[:, :H4].astype(jnp.float32))
                    dh = dh_c[:, :H4] + jnp.where(
                        valid, dh_up[:, :H4].astype(jnp.float32), 0.0
                    )
                    do = dh * tc * so * (1.0 - so)
                    dct = dh * so * (1.0 - tc * tc) + dc_c[:, :H4]
                    di = dct * tg * si * (1.0 - si)
                    dg = dct * si * (1.0 - tg * tg)
                    df = (
                        dct
                        * cprev[:, :H4].astype(jnp.float32)
                        * sf
                        * (1.0 - sf)
                    )
                    dgates = jnp.concatenate(
                        [di, dg, df, do,
                         jnp.zeros((dh.shape[0], Gp - G))], axis=1
                    )
                    dgates = jnp.where(valid, dgates, 0.0)
                    dg_buf[slot, d, i] = dgates.astype(dg_buf.dtype)
                    dh_prev = (
                        jnp.dot(
                            dgates.astype(mm_dtype), wh[d].T,
                            preferred_element_type=jnp.float32,
                        )
                        * mask[d]
                    )
                    dc_prev = jnp.concatenate(
                        [dct * sf,
                         jnp.zeros((dh.shape[0], Hp - H4))], axis=1
                    )
                    new.append((
                        jnp.where(valid, dh_prev, dh_c),
                        jnp.where(valid, dc_prev, dc_c),
                    ))
                return (new[0], new[1])

            carry = jax.lax.fori_loop(0, chunk, step, carry)
            for d in out_dmas(slot, k):
                d.start()
            return carry

        carry0 = ((dhT_ref[0], dcT_ref[0]), (dhT_ref[1], dcT_ref[1]))
        (dh_a, dc_a), (dh_b, dc_b) = jax.lax.fori_loop(
            0, nk, chunk_body, carry0
        )

        @pl.when(nk >= 2)
        def _():
            for d in out_dmas(nk % 2, nk - 2):
                d.wait()

        for d in out_dmas((nk - 1) % 2, nk - 1):
            d.wait()
        dh0_ref[0] = dh_a
        dh0_ref[1] = dh_b
        dc0_ref[0] = dc_a
        dc0_ref[1] = dc_b

    return kernel


def _bi_bwd_call(
    xw2, wh2, hprev2, cprev2, cseq2, lengths, mask2, dhseq2, dhT2, dcT2,
    interpret,
):
    T, D, B, G = xw2.shape
    H = wh2.shape[1]
    stream = xw2.dtype
    Gp = _round_up(G, 128)
    Hp = _round_up(H, 128)
    BB, CHUNK = _choose_bi_tiles(B, Hp, Gp, True, stream.itemsize)

    def prep(a, lanes):
        return _pad_lanes(
            _pad_axis(_pad_axis(a.astype(stream), CHUNK, 0), BB, 2), lanes
        )

    xw_p = prep(xw2, Gp)
    hprev_p = prep(hprev2, Hp)
    cprev_p = prep(cprev2, Hp)
    cseq_p = prep(cseq2, Hp)
    dhseq_p = prep(dhseq2, Hp)
    Tp, _, Bp = xw_p.shape[:3]
    nb = Bp // BB
    wh_p = _pad_lanes(_pad_axis(wh2, Hp, 1), Gp).astype(stream)
    lengths2d = _pad_axis(lengths.reshape(B, 1).astype(jnp.int32), BB, 0)
    mask_p = _pad_lanes(_pad_axis(mask2, BB, 1), Hp)
    dhT_p = _pad_lanes(_pad_axis(dhT2, BB, 1), Hp)
    dcT_p = _pad_lanes(_pad_axis(dcT2, BB, 1), Hp)

    bfix = lambda b: (0, b, 0)  # noqa: E731
    lfix = lambda b: (b, 0)  # noqa: E731
    wfix = lambda b: (0, 0, 0)  # noqa: E731
    out_shape = (
        jax.ShapeDtypeStruct((Tp, 2, Bp, Gp), stream),
        jax.ShapeDtypeStruct((2, Bp, Hp), jnp.float32),
        jax.ShapeDtypeStruct((2, Bp, Hp), jnp.float32),
    )
    dgates, dh0, dc0 = pl.pallas_call(
        _make_bi_bwd_kernel(Tp, CHUNK, BB, G),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, Hp, Gp), wfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), lfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BB, Hp), bfix, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 2, CHUNK, BB, Gp + 4 * Hp), stream),
            pltpu.VMEM((2, 2, CHUNK, BB, Gp), stream),
            pltpu.SemaphoreType.DMA((2, 2, 5)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        xw_p, hprev_p, cprev_p, cseq_p, dhseq_p,
        wh_p, lengths2d, mask_p, dhT_p, dcT_p,
    )
    return dgates[:T, :, :B, :G], dh0[:, :B, :H], dc0[:, :B, :H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_bilstm_recurrence_dma(
    xw2, wh2, lengths, h02, c02, mask2, interpret=False
):
    """Bidirectional fused recurrence.  Leading direction axis D=2 on
    every operand; direction 1's ``xw2[:, 1]`` must be the REVERSED
    input projection (the caller reverses, exactly as
    ops.lstm.bidirectional_lstm does for the scan path).  Returns
    (h_seq (T, 2, B, H), hT (2, B, H), cT (2, B, H))."""
    h_seq, _c, hT, cT = _bi_fwd_call(
        xw2, wh2, lengths, h02, c02, mask2, interpret
    )
    return h_seq, hT, cT


def _bi_fused_fwd(xw2, wh2, lengths, h02, c02, mask2, interpret):
    h_seq, c_seq, hT, cT = _bi_fwd_call(
        xw2, wh2, lengths, h02, c02, mask2, interpret
    )
    return (h_seq, hT, cT), (xw2, wh2, lengths, h02, c02, mask2, h_seq, c_seq)


def _bi_fused_bwd(interpret, residuals, grads):
    xw2, wh2, lengths, h02, c02, mask2, h_seq, c_seq = residuals
    dhseq, dhT, dcT = grads
    hprev = jnp.concatenate(
        [h02[None].astype(h_seq.dtype), h_seq[:-1]], axis=0
    )
    cprev = jnp.concatenate(
        [c02[None].astype(c_seq.dtype), c_seq[:-1]], axis=0
    )
    dgates, dh0, dc0 = _bi_bwd_call(
        xw2, wh2, hprev, cprev, c_seq, lengths, mask2,
        dhseq.astype(xw2.dtype), dhT, dcT, interpret,
    )
    # per-direction weight gradients as TWO large MXU GEMMs (stream
    # dtype, fp32 accumulation)
    T, D, B, G = dgates.shape
    H = wh2.shape[1]
    h_in = (hprev * mask2.astype(hprev.dtype)).reshape(T, D, B, H)
    dwh = jnp.einsum(
        "tdbh,tdbg->dhg",
        h_in,
        dgates,
        preferred_element_type=jnp.float32,
    )
    return dgates, dwh, None, dh0, dc0, None


fused_bilstm_recurrence_dma.defvjp(_bi_fused_fwd, _bi_fused_bwd)
