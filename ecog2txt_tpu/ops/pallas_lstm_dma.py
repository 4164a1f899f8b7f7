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

from .pallas_lstm import VMEM_BUDGET, _pad_axis


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_dma_tiles(
    B: int, Hp: int, Gp: int, bwd: bool, stream_bytes: int
) -> tuple[int, int]:
    """(batch tile BB, time chunk C) fitting the VMEM budget.

    Footprint: padded weights block + double-buffered streamed chunks
    (in and out) + per-tile fixed blocks + carry state."""
    wh = Hp * Gp * 4
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
            if wh + bufs + fixed + scratch <= VMEM_BUDGET:
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
        wh = wh_ref[:]
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
                    h * mask, wh, preferred_element_type=jnp.float32
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
    # zero-filled weight padding keeps the extra lanes inert
    wh_p = _pad_lanes(_pad_axis(wh, Hp, 0), Gp)
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
                    h_in, wh, preferred_element_type=jnp.float32
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
                    jnp.dot(dgates, wh.T, preferred_element_type=jnp.float32)
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
    wh_p = _pad_lanes(_pad_axis(wh, Hp, 0), Gp)
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
    T, B, G = dgates.shape
    H = wh.shape[0]
    h_in = (hprev.astype(jnp.float32) * mask).reshape(T * B, H)
    dwh = jnp.dot(
        h_in.T,
        dgates.reshape(T * B, G).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return dgates, dwh, None, dh0, dc0, None


fused_lstm_recurrence_dma.defvjp(_fused_fwd_dma, _fused_bwd_dma)
