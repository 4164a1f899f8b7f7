"""Fused chunk-causal ("banded") attention as Pallas TPU kernels.

The XLA banded path (models/conformer._attention_banded) computes the
right O(T·window) FLOPs but MATERIALIZES the f32 score/attn tensors
(B, H, NB, Q·C, W) in HBM — ~450 MB per layer at the long-recording
scale (B=16, T=8192), which made attention 52% of the measured
fwd+bwd step while being ~3% of model FLOPs (RESULTS.md r3
decomposition).  These kernels keep scores/softmax entirely in VMEM:

* grid ``(B, num_query_blocks)``; each cell processes a ``QB``-row
  query block (~128 rows, the MXU tile edge) against its own aligned
  ``QB``-row key block plus the ``L·C`` rows preceding it.  The
  preceding rows are a second VIEW of the same k/v array via a clamped
  block index map — no shifted copy is materialized, and the clamped
  (fabricated) rows at block 0 are masked by local position exactly
  like the XLA path's front-pad sentinel.
* the whole band fits one cell, so softmax is a plain (not online)
  row softmax in f32 over the ``QB + L·C`` key window — scores never
  touch HBM.  Masked slots are filled with -1e30 (finite: fully
  masked padded rows produce a harmless uniform average, never NaN,
  matching the XLA paths' -1e9 fill behavior).
* heads live on the lane axis: blocks are (rows, H·Dh) and each head
  is a static lane slice — q/k/v stream through in their natural
  (B, T, D) layout with zero XLA-side transposes.
* backward is the standard flash split with saved per-head LSE plus an
  XLA-computed ``delta = rowsum(dout·out)``: a dq kernel over query
  blocks (reads the same k/v window as forward) and a dk/dv kernel
  over key blocks (reads the ``QB + L·C`` query rows that attend into
  the block — own block + the FIRST ``L·C`` rows of the next, again a
  clamped second view).  Both recompute p from q·k and the saved LSE,
  so no (rows, window) tensor is ever stored.

Semantics are identical to ``_attention_banded``/``_attention_dense``
(parity-tested): chunk ids come from ABSOLUTE positions (``offset`` may
be traced — ConformerStream windows and sequence-parallel shards pass
chunk-aligned offsets), keys at negative absolute positions or at/past
``lengths`` are masked, and queries are assumed CONTIGUOUS from
``offset`` (every caller passes ``arange(T)+offset``).

Reference parity target: the chunked-causal attention semantics defined
by models/conformer.py (itself the TPU-first replacement for the
reference's biLSTM encoder at long-recording scale — BASELINE
configs[4]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # finite mask fill: -inf would make (-inf) - (-inf) = NaN


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_query_rows(C: int, L: int, query_rows: int | None) -> int:
    """Query-block rows: ~128 (MXU tile edge), constrained so the chunk
    size divides it (window alignment) and ``L·C`` divides it (the
    previous-tail view's block index map needs integer block units)."""
    if query_rows is not None:
        if query_rows % C or query_rows % (L * C):
            raise ValueError(
                f"query_rows={query_rows} must be a multiple of "
                f"chunk_size={C} and left_context·chunk_size={L * C}"
            )
        return query_rows
    k = -(-128 // C)  # chunks per block to reach ~128 rows
    k = -(-k // L) * L  # round up so L·C divides QB
    return k * C


def _band_mask(base_q, base_k, nq, nk, C, L, t_real, offset, length):
    """(nq, nk) bool mask for query rows ``base_q + i`` vs key rows
    ``base_k + j`` (LOCAL row indices into the unpadded sequence).

    Matches the XLA paths: chunk-causal band on absolute chunk ids
    (absolute = local + offset, and offset is chunk-aligned so local
    chunk arithmetic is exact), keys masked outside [0, t_real) locally
    (fabricated view rows / trailing pad), at negative absolute
    positions (pre-recording halo), or at/past the absolute valid
    length; query rows outside [0, t_real) contribute nothing."""
    gq = base_q + jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
    gk = base_k + jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    qc = gq // C
    kc = gk // C
    band = (kc <= qc) & (kc + L >= qc)
    ak = gk + offset
    valid_k = (gk >= 0) & (gk < t_real) & (ak >= 0) & (ak < length)
    valid_q = (gq >= 0) & (gq < t_real)
    return band & valid_k & valid_q


def _fwd_kernel(
    off_ref, len_ref, q_ref, kf_ref, k_ref, vf_ref, v_ref,
    o_ref, lse_ref, *, C, L, t_real, QB, H,
):
    n = pl.program_id(1)
    PREV = L * C
    base = n * QB
    D = q_ref.shape[-1]
    Dh = D // H
    scale = 1.0 / np.sqrt(Dh)
    offset = off_ref[0, 0]
    length = len_ref[pl.program_id(0), 0]
    q = q_ref[0]
    kcat = jnp.concatenate([kf_ref[0], k_ref[0]], axis=0)  # (W, D)
    vcat = jnp.concatenate([vf_ref[0], v_ref[0]], axis=0)
    mask = _band_mask(
        base, base - PREV, QB, QB + PREV, C, L, t_real, offset, length
    )
    outs, lses = [], []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            q[:, sl], kcat[:, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask, s, _NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        lses.append(m + jnp.log(denom))
        p = (e / denom).astype(q.dtype)
        oh = jax.lax.dot_general(
            p, vcat[:, sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(oh.astype(q.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)
    lse_ref[0] = jnp.concatenate(lses, axis=1)


def _dq_kernel(
    off_ref, len_ref, q_ref, kf_ref, k_ref, vf_ref, v_ref,
    g_ref, lse_ref, delta_ref, dq_ref, *, C, L, t_real, QB, H,
):
    n = pl.program_id(1)
    PREV = L * C
    base = n * QB
    D = q_ref.shape[-1]
    Dh = D // H
    scale = 1.0 / np.sqrt(Dh)
    offset = off_ref[0, 0]
    length = len_ref[pl.program_id(0), 0]
    q = q_ref[0]
    g = g_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    kcat = jnp.concatenate([kf_ref[0], k_ref[0]], axis=0)
    vcat = jnp.concatenate([vf_ref[0], v_ref[0]], axis=0)
    mask = _band_mask(
        base, base - PREV, QB, QB + PREV, C, L, t_real, offset, length
    )
    dqs = []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            q[:, sl], kcat[:, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.where(mask, jnp.exp(s - lse[:, h : h + 1]), 0.0)
        dp = jax.lax.dot_general(
            g[:, sl], vcat[:, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta[:, h : h + 1])).astype(q.dtype)
        dqh = jax.lax.dot_general(
            ds, kcat[:, sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dqs.append(dqh.astype(q.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=1)


def _dkv_kernel(
    off_ref, len_ref, k_ref, v_ref, q_ref, qn_ref, g_ref, gn_ref,
    lse_ref, lsen_ref, delta_ref, deltan_ref, dk_ref, dv_ref,
    *, C, L, t_real, QB, H,
):
    n = pl.program_id(1)
    PREV = L * C
    base = n * QB
    D = k_ref.shape[-1]
    Dh = D // H
    scale = 1.0 / np.sqrt(Dh)
    offset = off_ref[0, 0]
    length = len_ref[pl.program_id(0), 0]
    k = k_ref[0]
    v = v_ref[0]
    # query rows attending INTO this key block: the block's own rows
    # plus the first L·C rows of the next block (clamped view; the
    # clamp's garbage rows sit at global index >= t_real → masked)
    qcat = jnp.concatenate([q_ref[0], qn_ref[0]], axis=0)  # (QB+PREV, D)
    gcat = jnp.concatenate([g_ref[0], gn_ref[0]], axis=0)
    lsecat = jnp.concatenate([lse_ref[0], lsen_ref[0]], axis=0)
    deltacat = jnp.concatenate([delta_ref[0], deltan_ref[0]], axis=0)
    mask = _band_mask(
        base, base, QB + PREV, QB, C, L, t_real, offset, length
    )
    dks, dvs = [], []
    for h in range(H):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            qcat[:, sl], k[:, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.where(mask, jnp.exp(s - lsecat[:, h : h + 1]), 0.0)
        p_c = p.astype(k.dtype)
        dvh = jax.lax.dot_general(
            p_c, gcat[:, sl],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dvs.append(dvh.astype(k.dtype))
        dp = jax.lax.dot_general(
            gcat[:, sl], v[:, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - deltacat[:, h : h + 1])).astype(k.dtype)
        dkh = jax.lax.dot_general(
            ds, qcat[:, sl],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dks.append(dkh.astype(k.dtype))
    dk_ref[0] = jnp.concatenate(dks, axis=1)
    dv_ref[0] = jnp.concatenate(dvs, axis=1)


def _specs(B, T1, D, H, QB, PREV):
    """Shared BlockSpec builders.  R = QB // PREV is the number of
    PREV-row block units per query block."""
    R = QB // PREV

    def full_rows(ncols):
        return pl.BlockSpec(
            (1, QB, ncols), lambda b, n: (b, n, 0),
            memory_space=pltpu.VMEM,
        )

    def prev_rows(ncols):
        # rows [n·QB - PREV, n·QB) of the SAME array: block index
        # n·R - 1 in PREV-row units, clamped at the front (block 0's
        # fabricated rows are masked by local position < 0)
        return pl.BlockSpec(
            (1, PREV, ncols),
            lambda b, n: (b, jnp.maximum(n * R - 1, 0), 0),
            memory_space=pltpu.VMEM,
        )

    def next_rows(ncols):
        # rows [(n+1)·QB, (n+1)·QB + PREV): clamped at the back (the
        # clamp's rows land at global index >= t_real → masked)
        last = T1 // PREV - 1
        return pl.BlockSpec(
            (1, PREV, ncols),
            lambda b, n: (b, jnp.minimum((n + 1) * R, last), 0),
            memory_space=pltpu.VMEM,
        )

    # whole-array SMEM refs (blocked SMEM specs don't lower on real
    # TPU); kernels index lengths by pl.program_id(0)
    off_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return full_rows, prev_rows, next_rows, off_spec, len_spec


def _fwd_call(q, k, v, offset, lengths, C, L, t_real, QB, H, interpret):
    B, T1, D = q.shape
    PREV = L * C
    NB = T1 // QB
    full, prev, _next, off_spec, len_spec = _specs(B, T1, D, H, QB, PREV)
    kern = functools.partial(
        _fwd_kernel, C=C, L=L, t_real=t_real, QB=QB, H=H
    )
    return pl.pallas_call(
        kern,
        grid=(B, NB),
        in_specs=[
            off_spec, len_spec,
            full(D), prev(D), full(D), prev(D), full(D),
        ],
        out_specs=(full(D), full(H)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T1, D), q.dtype),
            jax.ShapeDtypeStruct((B, T1, H), jnp.float32),
        ),
        interpret=interpret,
    )(offset, lengths, q, k, k, v, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _banded_attention_core(
    q, k, v, offset, lengths, C, L, t_real, QB, H, interpret
):
    out, _lse = _fwd_call(
        q, k, v, offset, lengths, C, L, t_real, QB, H, interpret
    )
    return out


def _core_fwd(q, k, v, offset, lengths, C, L, t_real, QB, H, interpret):
    out, lse = _fwd_call(
        q, k, v, offset, lengths, C, L, t_real, QB, H, interpret
    )
    return out, (q, k, v, offset, lengths, out, lse)


def _core_bwd(C, L, t_real, QB, H, interpret, residuals, g):
    q, k, v, offset, lengths, out, lse = residuals
    B, T1, D = q.shape
    Dh = D // H
    PREV = L * C
    NB = T1 // QB
    # delta = per-row, per-head rowsum(dout · out) — one fused
    # elementwise+reduce in XLA (flash-standard backward residual)
    delta = (
        (g.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(B, T1, H, Dh)
        .sum(axis=-1)
    )
    full, prev, nxt, off_spec, len_spec = _specs(B, T1, D, H, QB, PREV)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, C=C, L=L, t_real=t_real, QB=QB, H=H),
        grid=(B, NB),
        in_specs=[
            off_spec, len_spec,
            full(D), prev(D), full(D), prev(D), full(D),
            full(D), full(H), full(H),
        ],
        out_specs=full(D),
        out_shape=jax.ShapeDtypeStruct((B, T1, D), q.dtype),
        interpret=interpret,
    )(offset, lengths, q, k, k, v, v, g, lse, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, C=C, L=L, t_real=t_real, QB=QB, H=H),
        grid=(B, NB),
        in_specs=[
            off_spec, len_spec,
            full(D), full(D),
            full(D), nxt(D), full(D), nxt(D),
            full(H), nxt(H), full(H), nxt(H),
        ],
        out_specs=(full(D), full(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T1, D), q.dtype),
            jax.ShapeDtypeStruct((B, T1, D), q.dtype),
        ),
        interpret=interpret,
    )(offset, lengths, k, v, q, q, g, g, lse, lse, delta, delta)
    return dq, dk, dv, None, None


_banded_attention_core.defvjp(_core_fwd, _core_bwd)


def banded_flash_attention(
    q: jax.Array,  # (B, T, H, Dh) post-rotary queries
    k: jax.Array,
    v: jax.Array,
    offset=0,  # absolute position of step 0 (may be traced; chunk-aligned)
    lengths: jax.Array | None = None,  # (B,) absolute valid-step counts
    *,
    chunk_size: int,
    left_context: int,
    query_rows: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Chunk-causal attention, fused: softmax(q·kᵀ/√d + band mask)·v
    computed per ~128-row query block entirely in VMEM.  Returns
    (B, T, H, Dh).  Differentiable (flash-style custom VJP)."""
    if interpret is None:
        interpret = _default_interpret()
    B, T, H, Dh = q.shape
    D = H * Dh
    C, L = chunk_size, left_context
    QB = _pick_query_rows(C, L, query_rows)
    T1 = -(-T // QB) * QB
    pad = T1 - T

    def flat(a):
        a = a.reshape(B, T, D)
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((B, pad, D), a.dtype)], axis=1
            )
        return a

    q3, k3, v3 = flat(q), flat(k), flat(v)
    off = jnp.asarray(offset, jnp.int32).reshape(1, 1)
    if lengths is None:
        lens = jnp.full((B, 1), np.iinfo(np.int32).max, jnp.int32)
    else:
        lens = lengths.astype(jnp.int32).reshape(B, 1)
    out = _banded_attention_core(
        q3, k3, v3, off, lens, C, L, T, QB, H, interpret
    )
    return out[:, :T].reshape(B, T, H, Dh)
