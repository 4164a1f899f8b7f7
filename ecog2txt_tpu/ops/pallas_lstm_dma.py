"""LSTM forward recurrence with manual double-buffered DMA
(EXPERIMENTAL — not wired into the model; see status below).

The chunked-grid kernels in pallas_lstm.py still pay ~tens of µs of
per-grid-step overhead, which dominates the ~1 µs of recurrent matmul
per step.  This variant runs the ENTIRE sequence for a batch tile in a
single grid step: the input projection stays in HBM and is streamed
chunk-by-chunk with `make_async_copy` double buffering (pallas guide
pattern), while outputs stream back to HBM behind the compute.

Status: correct in interpreter mode (tests), but Mosaic requires
HBM↔VMEM copies to be 128-lane aligned in the sliced dimension —
4H=1600 (H=400, the reference size) is not, so the compiled path needs
lane-padded (H=512-class) models plus ~2 MB more VMEM headroom than one
core offers at B=128.  Revisit with H-padded "perf mode" configs or
smaller batch tiles; the production path remains
pallas_lstm.fused_lstm_recurrence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2


def _make_kernel(T: int, chunk: int):
    nk = T // chunk

    def kernel(
        # inputs
        xw_hbm,  # (T, B, 4H) in HBM/ANY
        wh_ref,  # (H, 4H) VMEM
        h0_ref,  # (B, H)
        c0_ref,  # (B, H)
        len_ref,  # (B, 1)
        mask_ref,  # (B, H)
        # outputs
        hseq_hbm,  # (T, B, H) HBM
        cseq_hbm,  # (T, B, H) HBM
        hT_ref,  # (B, H) VMEM
        cT_ref,  # (B, H) VMEM
        # scratch
        xw_buf,  # (2, chunk, B, 4H)
        h_buf,  # (2, chunk, B, H)
        c_buf,  # (2, chunk, B, H)
        in_sem,  # DMA (2,)
        out_sem,  # DMA (2, 2)
    ):
        wh = wh_ref[:]
        mask = mask_ref[:]
        lens = len_ref[:]

        def in_dma(slot, k):
            return pltpu.make_async_copy(
                xw_hbm.at[pl.ds(k * chunk, chunk)],
                xw_buf.at[slot],
                in_sem.at[slot],
            )

        def out_dma(slot, k):
            return (
                pltpu.make_async_copy(
                    h_buf.at[slot],
                    hseq_hbm.at[pl.ds(k * chunk, chunk)],
                    out_sem.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    c_buf.at[slot],
                    cseq_hbm.at[pl.ds(k * chunk, chunk)],
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

            # wait for this slot's previous output DMA before overwriting
            @pl.when(k >= 2)
            def _():
                d0, d1 = out_dma(slot, k - 2)
                d0.wait()
                d1.wait()

            base = k * chunk

            def step(i, hc):
                h, c = hc
                gates = xw_buf[slot, i] + jnp.dot(
                    h * mask, wh, preferred_element_type=jnp.float32
                )
                gi, gg, gf, go = jnp.split(gates, 4, axis=-1)
                c_new = (
                    jax.nn.sigmoid(gf + 1.0) * c
                    + jax.nn.sigmoid(gi) * jnp.tanh(gg)
                )
                h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
                valid = lens > (base + i)
                h_new = jnp.where(valid, h_new, h)
                c_new = jnp.where(valid, c_new, c)
                h_buf[slot, i] = jnp.where(valid, h_new, 0.0)
                c_buf[slot, i] = c_new
                return (h_new, c_new)

            h, c = jax.lax.fori_loop(0, chunk, step, (h, c))
            d0, d1 = out_dma(slot, k)
            d0.start()
            d1.start()
            return (h, c)

        h, c = jax.lax.fori_loop(
            0, nk, chunk_body, (h0_ref[:], c0_ref[:])
        )
        # drain the last two output DMAs
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


def fused_lstm_fwd_dma(xw, wh, lengths, h0, c0, mask, interpret=False):
    """(h_seq, c_seq, hT, cT) — single-launch streaming recurrence."""
    T, B, G = xw.shape
    H = wh.shape[0]
    pad = (-T) % CHUNK
    if pad:
        xw = jnp.pad(xw, ((0, pad), (0, 0), (0, 0)))
    Tp = xw.shape[0]
    lengths2d = lengths.reshape(B, 1).astype(jnp.int32)
    out_shape = (
        jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    )
    h_seq, c_seq, hT, cT = pl.pallas_call(
        _make_kernel(Tp, CHUNK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xw stays off-chip
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, B, G), jnp.float32),
            pltpu.VMEM((2, CHUNK, B, H), jnp.float32),
            pltpu.VMEM((2, CHUNK, B, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(xw, wh, h0, c0, lengths2d, mask)
    return h_seq[:T], c_seq[:T], hT, cT
