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


def _bwd_calls(q, k, v, offset, lengths, g, lse, delta, C, L, t_real,
               QB, H, interpret):
    """dq/dk/dv from the flash-standard backward kernels (shared by the
    plain attention VJP and the fused-layer VJP)."""
    B, T1, D = q.shape
    PREV = L * C
    NB = T1 // QB
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
    return dq, dk, dv


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
    # delta = per-row, per-head rowsum(dout · out) — one fused
    # elementwise+reduce in XLA (flash-standard backward residual)
    delta = (
        (g.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(B, T1, H, Dh)
        .sum(axis=-1)
    )
    dq, dk, dv = _bwd_calls(
        q, k, v, offset, lengths, g, lse, delta,
        C, L, t_real, QB, H, interpret,
    )
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
    # the kernels assume one common dtype (out/grad refs take q's);
    # mixed inputs (e.g. an f32-promoted q against bf16 k/v) would
    # store-mismatch inside the dkv kernel — promote up front instead
    ct = jnp.result_type(q.dtype, k.dtype, v.dtype)
    q, k, v = q.astype(ct), k.astype(ct), v.astype(ct)
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


# ---------------------------------------------------------------------------
# Fused attention LAYER: LN → qkv projection → rotary → banded attention
# in ONE kernel (the output projection wo and the residual add stay in
# XLA — big GEMMs it already runs near peak).  Motivation (measured,
# RESULTS.md r3): with the plain flash kernel the attention module still
# cost 68 ms of the 148 ms long8k fwd+bwd step while its kernel part was
# only ~38 ms — the rest was the qkv round-trip through HBM plus the
# rotary/reshape/slice glue XLA does not fuse.  Fusing the input side
# removes every intermediate between x and the attention output.
#
# Rotary without lane shuffles: for head lanes (x1, x2) the rotation is
#   rot(x) = (x·cos_t + (x@R)·sin_t),  R = blockdiag_h [[0, I], [-I, 0]]
# and x = lnx@W, so x@R = lnx@(W@R) where W@R is just a sign-flipped
# column permutation of W — precomputed OUTSIDE the kernel for free.
# Each cell then runs two (rows, D)@(D, D) GEMMs per projection instead
# of VPU lane rotations (MXU has headroom here; lane shuffles don't).
# ---------------------------------------------------------------------------


def _rope_freqs(H: int, D: int) -> np.ndarray:
    """Per-lane rotary frequency, matching models.conformer._rotary:
    lane (h, j) uses 10000^-( (j mod half) / half ) with half = Dh//2."""
    Dh = D // H
    half = Dh // 2
    j = np.arange(D) % Dh
    return (1.0 / (10000.0 ** ((j % half) / half))).astype(np.float32)


def _rot_half(y: jax.Array, H: int) -> jax.Array:
    """y @ R for the rotary sign-permutation R (per-head halves swapped,
    first half negated): lane (h, j<half) ← −y(h, j+half); (h, j≥half)
    ← +y(h, j−half).  XLA-side helper (reshape+concat, fuses freely)."""
    *lead, D = y.shape
    Dh = D // H
    half = Dh // 2
    yh = y.reshape(*lead, H, Dh)
    out = jnp.concatenate([-yh[..., half:], yh[..., :half]], axis=-1)
    return out.reshape(*lead, D)


def _fused_fwd_kernel(
    off_ref, len_ref, x_ref, xp_ref, wq_ref, wqr_ref, wk_ref, wkr_ref,
    wv_ref, lng_ref, lnb_ref, freq_ref,
    o_ref, *res_refs,
    C, L, t_real, QB, H, save, eps,
):
    n = pl.program_id(1)
    PREV = L * C
    base = n * QB
    D = x_ref.shape[-1]
    Dh = D // H
    scale = 1.0 / np.sqrt(Dh)
    offset = off_ref[0, 0]
    length = len_ref[pl.program_id(0), 0]
    cd = x_ref.dtype

    xcat = jnp.concatenate([xp_ref[0], x_ref[0]], axis=0)  # (QB+PREV, D)
    # layernorm: stats in f32 (matches conformer._layernorm)
    xf = xcat.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=1, keepdims=True)
    lnx = (
        (xf - mu) * jax.lax.rsqrt(var + eps) * lng_ref[0] + lnb_ref[0]
    ).astype(cd)

    # rotary phases for the cat rows' ABSOLUTE positions (block-0
    # fabricated rows get garbage angles — their keys are masked)
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (QB + PREV, D), 0)
        + (base - PREV + offset)
    ).astype(jnp.float32)
    ang = rows * freq_ref[0][None, :].reshape(1, D)
    cs = jnp.cos(ang).astype(cd)
    sn = jnp.sin(ang).astype(cd)

    def mm(a, w_ref):
        return jax.lax.dot_general(
            a, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)

    lnq = lnx[PREV:]
    q = mm(lnq, wq_ref) * cs[PREV:] + mm(lnq, wqr_ref) * sn[PREV:]
    kcat = mm(lnx, wk_ref) * cs + mm(lnx, wkr_ref) * sn
    vcat = mm(lnx, wv_ref)

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
        p = (e / denom).astype(cd)
        oh = jax.lax.dot_general(
            p, vcat[:, sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(oh.astype(cd))
    o_ref[0] = jnp.concatenate(outs, axis=1)
    if save:
        q_ref, k_ref, v_ref, lse_ref = res_refs
        q_ref[0] = q
        k_ref[0] = kcat[PREV:]  # own rows; prev rows are cell n−1's own
        v_ref[0] = vcat[PREV:]
        lse_ref[0] = jnp.concatenate(lses, axis=1)


def _fused_fwd_call(
    x, xw, lng, lnb, offset, lengths, C, L, t_real, QB, H, interpret,
    save,
):
    """xw = (wq, wqr, wk, wkr, wv) pre-cast to the stream dtype."""
    B, T1, D = x.shape
    PREV = L * C
    NB = T1 // QB
    full, prev, _nxt, off_spec, len_spec = _specs(B, T1, D, H, QB, PREV)
    wspec = pl.BlockSpec(
        (D, D), lambda b, n: (0, 0), memory_space=pltpu.VMEM
    )
    gspec = pl.BlockSpec(
        (1, D), lambda b, n: (0, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(
        _fused_fwd_kernel, C=C, L=L, t_real=t_real, QB=QB, H=H,
        save=save, eps=1e-6,
    )
    outs = (full(D),)
    shapes = (jax.ShapeDtypeStruct((B, T1, D), x.dtype),)
    if save:
        outs = outs + (full(D), full(D), full(D), full(H))
        shapes = shapes + (
            jax.ShapeDtypeStruct((B, T1, D), x.dtype),
            jax.ShapeDtypeStruct((B, T1, D), x.dtype),
            jax.ShapeDtypeStruct((B, T1, D), x.dtype),
            jax.ShapeDtypeStruct((B, T1, H), jnp.float32),
        )
    return pl.pallas_call(
        kern,
        grid=(B, NB),
        in_specs=[
            off_spec, len_spec,
            full(D), prev(D),
            wspec, wspec, wspec, wspec, wspec,
            gspec, gspec, gspec,
        ],
        out_specs=outs,
        out_shape=shapes,
        interpret=interpret,
    )(
        offset, lengths, x, x, *xw, lng, lnb,
        jnp.asarray(_rope_freqs(H, D)).reshape(1, D),
    )


def _ln_fwd_f32(x, lng, lnb, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    return xhat, inv


def _split_rot_weights(wqkv, H, cd):
    D = wqkv.shape[0]
    wq, wk, wv = wqkv[:, :D], wqkv[:, D : 2 * D], wqkv[:, 2 * D :]
    # W@R: every ROW of W is a lane vector, so permute the OUTPUT
    # columns exactly as _rot_half permutes lanes
    def wr(w):
        return _rot_half(w, H)

    return tuple(
        a.astype(cd) for a in (wq, wr(wq), wk, wr(wk), wv)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _fused_layer_core(
    wqkv, lng, lnb, x, offset, lengths, C, L, t_real, QB, H_i
):
    H, interpret = H_i
    xw = _split_rot_weights(wqkv, H, x.dtype)
    out, *_ = _fused_fwd_call(
        x, xw, lng.reshape(1, -1), lnb.reshape(1, -1), offset, lengths,
        C, L, t_real, QB, H, interpret, save=False,
    )
    return out


def _fused_layer_fwd(
    wqkv, lng, lnb, x, offset, lengths, C, L, t_real, QB, H_i
):
    H, interpret = H_i
    xw = _split_rot_weights(wqkv, H, x.dtype)
    out, q, k, v, lse = _fused_fwd_call(
        x, xw, lng.reshape(1, -1), lnb.reshape(1, -1), offset, lengths,
        C, L, t_real, QB, H, interpret, save=True,
    )
    return out, (wqkv, lng, lnb, x, offset, lengths, out, q, k, v, lse)


def _fused_layer_bwd(C, L, t_real, QB, H_i, residuals, g):
    H, interpret = H_i
    wqkv, lng, lnb, x, offset, lengths, out, q, k, v, lse = residuals
    B, T1, D = x.shape
    Dh = D // H
    cd = x.dtype
    # flash-standard backward through the attention core
    delta = (
        (g.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(B, T1, H, Dh)
        .sum(axis=-1)
    )
    dq, dk, dv = _bwd_calls(
        q, k, v, offset, lengths, g, lse, delta,
        C, L, t_real, QB, H, interpret,
    )
    # un-rotary: q_rot = q_pre·cs + (q_pre@R)·sn ⇒
    # dq_pre = dq·cs + (dq·sn)@Rᵀ = dq·cs − rot_half(dq·sn)
    pos = (jnp.arange(T1, dtype=jnp.int32) + offset.reshape(())).astype(
        jnp.float32
    )
    ang = pos[:, None] * jnp.asarray(_rope_freqs(H, D))[None, :]
    cs = jnp.cos(ang).astype(cd)[None]
    sn = jnp.sin(ang).astype(cd)[None]
    dq_pre = dq * cs - _rot_half(dq * sn, H)
    dk_pre = dk * cs - _rot_half(dk * sn, H)
    dqkv = jnp.concatenate([dq_pre, dk_pre, dv], axis=-1)  # (B,T1,3D)
    # projection backward against the recomputed layernorm output
    xhat, inv = _ln_fwd_f32(x, lng, lnb)
    lnx = (xhat * lng + lnb).astype(cd)
    dwqkv = jax.lax.dot_general(
        lnx.reshape(-1, D), dqkv.reshape(-1, 3 * D),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dlnx = jax.lax.dot_general(
        dqkv, wqkv.astype(cd), (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, T1, D) f32
    # layernorm backward (stats in f32)
    dxhat = dlnx * lng
    dg = jnp.sum(dlnx * xhat, axis=(0, 1))
    db = jnp.sum(dlnx, axis=(0, 1))
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = ((dxhat - m1 - xhat * m2) * inv).astype(cd)
    return (
        dwqkv.astype(wqkv.dtype), dg.astype(lng.dtype),
        db.astype(lnb.dtype), dx, None, None,
    )


_fused_layer_core.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_attention_layer(
    wqkv: jax.Array,  # (D, 3D) in the stream dtype (cast outside)
    ln_g: jax.Array,  # (D,) f32
    ln_b: jax.Array,  # (D,) f32
    x: jax.Array,  # (B, T, D) stream dtype — PRE-layernorm input
    offset=0,
    lengths: jax.Array | None = None,
    *,
    chunk_size: int,
    left_context: int,
    num_heads: int,
    query_rows: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """LN → qkv → rotary → banded attention, one fused kernel.  Returns
    the pre-output-projection attention result (B, T, D); apply ``wo``
    and the residual outside.  Differentiable (custom VJP: saved q/k/v
    feed the standard flash backward kernels, projection/LN backward is
    hand-written XLA GEMMs — no autodiff pad/scatter glue)."""
    if interpret is None:
        interpret = _default_interpret()
    B, T, D = x.shape
    C, L = chunk_size, left_context
    QB = _pick_query_rows(C, L, query_rows)
    T1 = -(-T // QB) * QB
    pad = T1 - T
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((B, pad, D), x.dtype)], axis=1
        )
    off = jnp.asarray(offset, jnp.int32).reshape(1, 1)
    if lengths is None:
        lens = jnp.full((B, 1), np.iinfo(np.int32).max, jnp.int32)
    else:
        lens = lengths.astype(jnp.int32).reshape(B, 1)
    out = _fused_layer_core(
        wqkv, ln_g, ln_b, x, off, lens, C, L, T, QB, (num_heads, interpret)
    )
    return out[:, :T]
