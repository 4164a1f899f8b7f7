"""Conformer encoder variant — the scaled alternative to the biLSTM
stack (BASELINE.json configs[4]: "Scaled Conformer/Transformer encoder
variant for long continuous recordings with streaming chunked
inference").

Architecture (Gulati et al. 2020, public): conv subsampling (reuses the
per-subject subnet conv), then N blocks of
``x + ½FFN → x + MHSA → x + ConvModule → x + ½FFN → LayerNorm``.

TPU-first / streaming design:

* attention is **chunked-causal**: queries attend within their chunk and
  up to ``left_context`` previous chunks.  This single static mask
  serves both training (full-utterance, one big batched matmul — no
  KV-cache) and streaming inference (process chunk-by-chunk, carrying a
  bounded KV cache), so the two paths compute identical functions —
  verified in tests.
* the convolution module is depthwise-causal (left padding only), so
  streamed chunks need only a ``kernel-1`` sample tail carry.
* relative position comes from a rotary embedding on q/k (static
  per-position rotation — jit-friendly, streams trivially by offsetting
  positions).
* everything is batched GEMMs on the MXU; no data-dependent shapes.

The decoder interface matches the LSTM encoder: a masked mean over
encoder steps bridges to the decoder initial state (the LSTM decoder is
unchanged), giving drop-in use inside seq2seq via
``Seq2SeqConfig.encoder_type='conformer'``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ecog2txt_tpu.models.moe import glorot, init_moe_ffn, moe_ffn
from ecog2txt_tpu.quantize import QuantizedWeight, int8_dot


class ConformerConfig(NamedTuple):
    num_blocks: int = 4
    model_dim: int = 256
    num_heads: int = 4
    ffn_dim: int = 1024
    conv_kernel: int = 8
    chunk_size: int = 16  # attention chunk (in downsampled steps)
    left_context: int = 1  # chunks of look-back
    # 'auto' (default) picks per static sequence length: 'dense' below
    # the measured on-chip crossover (T'≈512; dense is up to ~2.5%
    # faster on short sequences and OOMs beyond ~1k), 'banded' above.
    # 'banded' computes only a bounded key window per query block —
    # O(T·window) time AND memory, the long-continuous-recordings
    # path; 'dense' materializes the full (T, T) score matrix.  All
    # three compute the IDENTICAL function (parity-tested), so the
    # switch is transparent to streaming/SP/PP.
    attention_impl: str = "auto"
    # banded tiling: queries are processed in blocks of this many chunks
    # against a (query_block_chunks + left_context)-chunk key window.
    # None → auto-size the block so query tiles are ~128 rows (the MXU
    # tile edge): tiny per-chunk GEMMs (16×32) measured 27% slower than
    # dense at T'=112; 128-row blocks recover dense-path efficiency
    # while staying O(T).
    query_block_chunks: int | None = None
    # rematerialize each block in the backward pass (jax.checkpoint):
    # activation memory drops from O(num_blocks·T) to O(T) + one extra
    # forward of FLOPs — the standard trade for training LONGER
    # recordings or bigger batch than HBM otherwise allows.  Numerics
    # identical (tested).  Trainer knob: SN_kwargs['conformer']['remat'].
    remat: bool = False
    # mixture-of-experts second macaron FFN (models/moe.py): >0 replaces
    # each block's ffn2 with moe_experts routed experts (top-moe_topk
    # gating).  moe_capacity_factor == 0 (default) runs the exact
    # no-drop path (per-token, streams exactly); > 0 runs GShard-style
    # static-capacity dispatch (production scale; the (E, C, D) buffers
    # are what expert parallelism shards — parallel/expert.py).  The
    # weighted load-balance + router-z aux loss flows into seq2seq_loss
    # (metric 'moe_aux').
    moe_experts: int = 0
    moe_topk: int = 2
    moe_capacity_factor: float = 0.0
    # capacity-path dispatch group length in steps (0 → one group per
    # batch row).  Groups bound the one-hot dispatch cost (≈ k·cf·S_g
    # extra FLOPs per token) and never cross rows; with a segment size
    # set, per-expert capacity is a CONFIG constant, so per-example
    # outputs are fully independent of batch packing AND padded batch
    # length.  ~512 is a good training-scale setting (RESULTS.md r3).
    moe_group_size: int = 0
    moe_aux_weight: float = 1e-2
    moe_zloss_weight: float = 1e-3


_glorot = glorot  # shared init (models/moe.py)


def init_conformer(rng: jax.Array, config: ConformerConfig, in_dim: int) -> dict:
    keys = iter(jax.random.split(rng, 16 * config.num_blocks + 2))
    D, F, K = config.model_dim, config.ffn_dim, config.conv_kernel
    params: dict = {
        "in_proj": {"w": _glorot(next(keys), (in_dim, D)),
                    "b": jnp.zeros((D,))},
        "blocks": [],
    }
    for _ in range(config.num_blocks):
        params["blocks"].append(
            {
                "ffn1": {
                    "w1": _glorot(next(keys), (D, F)), "b1": jnp.zeros((F,)),
                    "w2": _glorot(next(keys), (F, D)), "b2": jnp.zeros((D,)),
                    "ln": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
                },
                "attn": {
                    "wqkv": _glorot(next(keys), (D, 3 * D)),
                    "wo": _glorot(next(keys), (D, D)),
                    "ln": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
                },
                "conv": {
                    # pointwise → GLU → depthwise causal → pointwise
                    "pw1": _glorot(next(keys), (D, 2 * D)),
                    "dw": 0.1 * jax.random.normal(next(keys), (K, D)),
                    "pw2": _glorot(next(keys), (D, D)),
                    "ln": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
                },
                "ffn2": (
                    init_moe_ffn(
                        next(keys), D, F, config.moe_experts
                    )
                    if config.moe_experts
                    else {
                        "w1": _glorot(next(keys), (D, F)),
                        "b1": jnp.zeros((F,)),
                        "w2": _glorot(next(keys), (F, D)),
                        "b2": jnp.zeros((D,)),
                        "ln": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
                    }
                ),
                "ln_out": {"g": jnp.ones((D,)), "b": jnp.zeros((D,))},
            }
        )
    return params


def _dot(x, w, cd):
    """Dense GEMM in the stream dtype — or int8×int8→int32 on the MXU
    when ``w`` was rewritten by ``quantize.quantize_conformer_params``
    (serving-time post-training quantization; 1.57× the sustained bf16
    matmul rate on v5e, RESULTS.md r3)."""
    if isinstance(w, QuantizedWeight):
        return int8_dot(x, w, cd)
    return jnp.dot(x, w.astype(cd))


def _layernorm(p, x, eps=1e-6):
    # statistics in f32 regardless of the stream dtype (bf16-safe);
    # the result is cast back so downstream GEMMs stay in compute dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return out.astype(x.dtype)


def _ffn(p, x, cd):
    h = jax.nn.swish(
        _dot(_layernorm(p["ln"], x), p["w1"], cd) + p["b1"].astype(cd)
    )
    return _dot(h, p["w2"], cd) + p["b2"].astype(cd)


def _rotary(x: jax.Array, positions: jax.Array) -> jax.Array:
    """Rotary position embedding over the head dim (last axis must be
    even).  x: (B, T, H, Dh); positions: (T,)."""
    Dh = x.shape[-1]
    half = Dh // 2
    freq = 1.0 / (10000.0 ** (jnp.arange(half) / half))
    angles = positions[:, None] * freq[None, :]  # (T, half)
    # angles in f32 (large absolute positions), rotation in the stream
    # dtype so q/k stay in compute dtype for the attention GEMMs
    cos = jnp.cos(angles)[None, :, None, :].astype(x.dtype)
    sin = jnp.sin(angles)[None, :, None, :].astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _chunk_causal_mask(
    positions: jax.Array, chunk: int, left_context: int
) -> jnp.ndarray:
    """(T, T) bool: query at t attends to keys in its own chunk and up to
    ``left_context`` chunks back.  Chunk ids come from ABSOLUTE
    positions, so windowed (streaming) and sequence-parallel shards
    reproduce the offline mask; keys at negative positions (a shard's
    ppermute halo before the recording starts) are invalid."""
    q_chunk = positions[:, None] // chunk
    k_chunk = positions[None, :] // chunk
    return (
        (k_chunk <= q_chunk)
        & (k_chunk >= q_chunk - left_context)
        & (positions[None, :] >= 0)
    )


def _attention_dense(
    p, x, config: ConformerConfig, lengths, positions, cd
):
    """Parity oracle: full (T, T) score matrix with the chunk-causal
    mask.  O(T²) — the banded path below computes the identical function
    in O(T·window); tests assert equality."""
    B, T, D = x.shape
    H = config.num_heads
    Dh = D // H
    xn = _layernorm(p["ln"], x)
    qkv = _dot(xn, p["wqkv"], cd).reshape(B, T, 3, H, Dh)
    q = _rotary(qkv[:, :, 0], positions)
    k = _rotary(qkv[:, :, 1], positions)
    v = qkv[:, :, 2]
    # scores GEMM in compute dtype; softmax in f32 for stability.
    # HEAD-MINOR layout throughout: logits (B, T, S, H) straight from
    # the (B, T, H, Dh) projections — no transpose to head-major.
    # Measured on-chip at bench scale (B=256, T'=104, H=6): 32.6 vs
    # 35.1 ms/step for the bhts ordering (scripts/
    # attention_variants_bench.py, RESULTS.md r5) — XLA picks cheaper
    # layouts for the scores/combine batched GEMMs.  Same math.
    logits = jnp.einsum("bthd,bshd->btsh", q, k).astype(
        jnp.float32
    ) / np.sqrt(Dh)
    mask = _chunk_causal_mask(
        positions, config.chunk_size, config.left_context
    )
    if lengths is not None:
        # lengths are ABSOLUTE valid-step counts, compared against the
        # keys' absolute positions (identical to a local arange when
        # position_offset == 0, i.e. the offline encode)
        mask = mask[None, :, :] & (
            positions[None, None, :] < lengths[:, None, None]
        )
        mask = mask[..., None]  # (B, T, S, 1)
    else:
        mask = mask[None, :, :, None]
    logits = jnp.where(mask, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=2).astype(cd)
    out = jnp.einsum("btsh,bshd->bthd", attn, v).reshape(B, T, D)
    return _dot(out, p["wo"], cd)


def _attention_banded(
    p, x, config: ConformerConfig, lengths, positions, cd
):
    """Chunk-causal attention computed on the band only.

    Query chunks group into blocks of ``Q = query_block_chunks``; each
    block attends to a ``(Q + left_context)``-chunk key window, so
    scores are (B, H, NB, Q·C, W) — O(T·window) time and memory instead
    of O(T²).  Exactly the function :func:`_attention_dense` computes
    (VERDICT r2 weak #1): chunk ids come from ABSOLUTE positions (every
    caller passes a chunk-aligned ``position_offset`` — ConformerStream
    windows start on chunk boundaries, sequence-parallel halos are
    whole chunks), a static intra-tile band mask applies chunk
    causality within the block, keys before the local window or at
    negative/over-length absolute positions are masked, and trailing
    padding keys carry a masked sentinel.  This is the offline encode
    for long continuous recordings (BASELINE configs[4]): an 8k-step
    recording needs an 8k-long band, not an 8k×8k matrix.

    Layout rationale (measured on-chip, RESULTS.md r3): window k/v are
    built from CONTIGUOUS reshapes only — the block's own keys are a
    free reshape and the ``L`` leading chunks come from one
    front-padded reshape+slice.  An earlier strided-interleave
    construction (``k_chunks[:, j::Q]`` per window slot) made the
    banded path 27-57% slower than dense at short T; slicing
    contiguously closes that gap."""
    B, T, D = x.shape
    H = config.num_heads
    Dh = D // H
    C = config.chunk_size
    L = config.left_context
    Q = getattr(config, "query_block_chunks", None) or max(1, 128 // C)
    Q = min(Q, -(-T // C))  # no block larger than the sequence
    xn = _layernorm(p["ln"], x)
    qkv = _dot(xn, p["wqkv"], cd).reshape(B, T, 3, H, Dh)
    q = _rotary(qkv[:, :, 0], positions)
    k = _rotary(qkv[:, :, 1], positions)
    v = qkv[:, :, 2]
    pad = (-T) % (Q * C)
    if pad:
        zeros = jnp.zeros((B, pad, H, Dh), q.dtype)
        q = jnp.concatenate([q, zeros], axis=1)
        k = jnp.concatenate([k, zeros], axis=1)
        v = jnp.concatenate([v, zeros], axis=1)
    Tp = T + pad
    NB = Tp // (Q * C)  # query blocks
    W = (Q + L) * C  # key window per block
    qb = q.reshape(B, NB, Q * C, H, Dh)

    def windows(a):
        # (B, Tp, H, Dh) → (B, NB, W, H, Dh): the L·C keys preceding
        # each block (front-pad + reshape + slice, all contiguous)
        # concatenated with the block's own keys (free reshape)
        blocks = a.reshape(B, NB, Q * C, H, Dh)
        front = jnp.concatenate(
            [jnp.zeros((B, L * C, H, Dh), a.dtype), a[:, : Tp - L * C or None]],
            axis=1,
        )[:, : NB * Q * C]
        prev = front.reshape(B, NB, Q * C, H, Dh)[:, :, : L * C]
        return jnp.concatenate([prev, blocks], axis=2)

    kw = windows(k)
    vw = windows(v)
    # key absolute positions per window slot, sentinel -1 where the slot
    # is fabricated (before the local window, or trailing padding) —
    # the kp>=0 test then masks exactly what the dense path masks
    pos_ext = jnp.concatenate(
        [positions, jnp.full((pad,), -1, positions.dtype)]
    )
    front = jnp.concatenate(
        [jnp.full((L * C,), -1, positions.dtype), pos_ext[: Tp - L * C or None]]
    )[: NB * Q * C]
    kposw = jnp.concatenate(
        [
            front.reshape(NB, Q * C)[:, : L * C],
            pos_ext.reshape(NB, Q * C),
        ],
        axis=1,
    )  # (NB, W)
    logits = jnp.einsum("bnchd,bnwhd->bhncw", qb, kw).astype(
        jnp.float32
    ) / np.sqrt(Dh)
    # static intra-tile band: query local chunk qi sees window chunk kj
    # iff qi <= kj <= qi + L (key global chunk = block·Q − L + kj, so
    # causality k_chunk <= q_chunk ⇔ kj <= qi + L, and the look-back
    # bound k_chunk >= q_chunk − L ⇔ kj >= qi)
    qi = np.arange(Q * C)[:, None] // C
    kj = np.arange(W)[None, :] // C
    band = jnp.asarray((kj >= qi) & (kj <= qi + L))  # (Q·C, W)
    mask = band[None, :, :] & (kposw[:, None, :] >= 0)  # (NB, Q·C, W)
    if lengths is not None:
        mask = mask[None] & (
            kposw[None, :, None, :] < lengths[:, None, None, None]
        )  # (B, NB, Q·C, W)
        mask = mask[:, None]  # (B, 1, NB, Q·C, W)
    else:
        mask = mask[None, None]
    logits = jnp.where(mask, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1).astype(cd)
    out = jnp.einsum("bhncw,bnwhd->bnchd", attn, vw).reshape(
        B, Tp, D
    )[:, :T]
    return _dot(out, p["wo"], cd)


def _attention_flash(
    p, x, config: ConformerConfig, lengths, positions, cd
):
    """Fused Pallas kernel path (ops/pallas_attention.py): identical
    function to the dense/banded paths but scores/softmax never leave
    VMEM — the XLA banded path materializes ~450 MB/layer of f32
    logits at long-recording scale (52% of the measured fwd+bwd step,
    RESULTS.md r3).  Queries are contiguous from ``positions[0]``
    (true for every caller: offline, streaming window, SP shard)."""
    B, T, D = x.shape
    H = config.num_heads
    Dh = D // H
    xn = _layernorm(p["ln"], x)
    qkv = _dot(xn, p["wqkv"], cd).reshape(B, T, 3, H, Dh)
    q = _rotary(qkv[:, :, 0], positions)
    k = _rotary(qkv[:, :, 1], positions)
    v = qkv[:, :, 2]
    from ecog2txt_tpu.ops.pallas_attention import banded_flash_attention

    out = banded_flash_attention(
        q, k, v, positions[0], lengths,
        chunk_size=config.chunk_size,
        left_context=config.left_context,
    )
    return _dot(out.reshape(B, T, D), p["wo"], cd)


def _attention_fused(
    p, x, config: ConformerConfig, lengths, positions, cd
):
    """Whole-module fusion (ops/pallas_attention.fused_attention_layer):
    LN → qkv projection → rotary → banded attention in ONE kernel, so
    q/k/v never round-trip through HBM and none of the rotary/reshape
    glue exists outside the kernel.  Only the output projection (a big
    GEMM XLA runs near peak) and the residual stay outside.  Measured
    motivation (RESULTS.md r3): with the plain flash kernel the
    attention module still cost 43% of the long8k step while being ~3%
    of its FLOPs; the fused layer removes the non-kernel half of that."""
    from ecog2txt_tpu.ops.pallas_attention import fused_attention_layer

    att = fused_attention_layer(
        p["wqkv"].astype(cd), p["ln"]["g"], p["ln"]["b"],
        x, positions[0], lengths,
        chunk_size=config.chunk_size,
        left_context=config.left_context,
        num_heads=config.num_heads,
    )
    return _dot(att, p["wo"], cd)


# measured on-chip crossover (RESULTS.md r3): dense wins slightly below
# ~512 steps, banded is flat in T and dense OOMs from ~1k
_AUTO_DENSE_MAX_STEPS = 256

def _attention(p, x, config: ConformerConfig, lengths, positions, cd):
    impl = getattr(config, "attention_impl", "auto")
    if impl == "fused" and isinstance(p["wqkv"], QuantizedWeight):
        # the fused layer kernel consumes the float wqkv in-kernel;
        # under int8 serving fall back to flash (same function)
        impl = "flash"
    if impl == "auto":
        if x.shape[1] <= _AUTO_DENSE_MAX_STEPS:
            impl = "dense"
        else:
            # beyond the dense crossover: the fused kernel on TPU
            # (scores never leave VMEM; 10-15% faster fwd+bwd at
            # T'=512..8192, RESULTS.md r3); the XLA banded path
            # elsewhere (Pallas on CPU would run interpreted)
            impl = "flash" if jax.default_backend() == "tpu" else "banded"
    # late module-attr lookup keeps the impls monkeypatchable (tests)
    return globals()[f"_attention_{impl}"](p, x, config, lengths, positions, cd)


def _conv_module(
    p, x, tail: jax.Array | None = None, cd=jnp.float32, valid=None
):
    """Depthwise-causal conv module.  ``tail``: (B, K-1, D) carried
    samples for streaming; ``valid``: (T,) bool zeroing pre-recording
    halo steps so their taps equal the offline encode's zero left-pad;
    returns (out, new_tail)."""
    B, T, D = x.shape
    K = p["dw"].shape[0]
    xn = _layernorm(p["ln"], x)
    h = _dot(xn, p["pw1"], cd)  # (B, T, 2D)
    h = jax.nn.glu(h, axis=-1)  # (B, T, D)
    if valid is not None:
        h = h * valid[None, :, None].astype(h.dtype)
    if tail is None:
        tail = jnp.zeros((B, K - 1, D), h.dtype)
    h_padded = jnp.concatenate([tail, h], axis=1)  # (B, T+K-1, D)
    # depthwise causal conv, impl picked by static shape (measured
    # on-chip, RESULTS.md r3): the XLA conv primitive
    # (feature_group_count=D) makes one fused pass — 8.5% faster
    # whole-encoder fwd+bwd at training scale — but at tiny B·T (the
    # B=1 streaming window) its setup overhead loses to K shifted adds
    # (41.6 vs 37.2 ms/push), so small shapes keep the adds.  The two
    # differ only in accumulation order (parity-tested); every
    # streamed-vs-offline comparison runs both sides at the same scale.
    try:
        big = bool(B * T >= 4096)
    except jax.core.InconclusiveDimensionOperation:
        # symbolic batch (jax.export serving artifacts): the crossover
        # can't be decided at trace time — keep the fused primitive,
        # the branch every at-scale batch would take anyway
        big = True
    if big:
        kernel = p["dw"].astype(cd)[:, None, :]  # (K, 1, D)
        out = jax.lax.conv_general_dilated(
            h_padded, kernel, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=D,
        )
    else:
        out = jnp.zeros_like(h)
        for k in range(K):
            out = out + h_padded[:, k : k + T] * p["dw"][k].astype(cd)
    out = jax.nn.swish(out)
    out = _dot(out, p["pw2"], cd)
    new_tail = h_padded[:, T:]  # last K-1 pre-conv samples
    return out, new_tail


def apply_block(
    block: dict,
    x: jax.Array,  # (B, T, D) in the compute dtype
    config: ConformerConfig,
    lengths: jax.Array | None,
    positions: jax.Array,
    cd=jnp.float32,
    tail: jax.Array | None = None,
    valid: jax.Array | None = None,
    stats_start=None,
    ep_axis: str | None = None,
):
    """One conformer block (½FFN → MHSA → conv → ½FFN → LN).  All blocks
    are the same (B, T, D) → (B, T, D) map with different weights — the
    homogeneity pipeline parallelism relies on (parallel/pipeline.py).
    Returns (x, new_conv_tail, moe_stats) — moe_stats is the block's
    additive router-statistics dict (models/moe.py::router_stats;
    ``None`` when ``config.moe_experts == 0``).  Stats, not the loss:
    sharded callers psum/add them across time shards or microbatches
    BEFORE the nonlinear loss, which is what makes the sharded aux
    equal the single-device aux exactly."""
    x = x + 0.5 * _ffn(block["ffn1"], x, cd)
    x = x + _attention(block["attn"], x, config, lengths, positions, cd)
    conv_out, new_tail = _conv_module(block["conv"], x, tail, cd, valid)
    x = x + conv_out
    if config.moe_experts:
        # token validity for the router: inside the recording (absolute
        # position within [0, length)); invalid tokens neither consume
        # capacity nor contribute to the balance statistics
        B, T = x.shape[0], x.shape[1]
        tok_valid = jnp.broadcast_to(positions >= 0, (B, T))
        if lengths is not None:
            tok_valid = tok_valid & (
                positions[None, :] < lengths[:, None]
            )
        stats_valid = None
        if stats_start is not None:
            # sequence parallelism: halo tokens (below this shard's own
            # span) compute but don't count — see moe_ffn
            stats_valid = tok_valid & (
                positions[None, :] >= stats_start
            )
        moe_out, stats = moe_ffn(
            block["ffn2"],
            _layernorm(block["ffn2"]["ln"], x),
            config, cd, tok_valid, stats_valid, ep_axis=ep_axis,
        )
        x = x + 0.5 * moe_out
    else:
        x = x + 0.5 * _ffn(block["ffn2"], x, cd)
        stats = None
    x = _layernorm(block["ln_out"], x)
    return x, new_tail, stats


def conformer_encode(
    params: dict,
    config: ConformerConfig,
    xs: jax.Array,  # (B, T, in_dim) — already downsampled features
    lengths: jax.Array | None = None,
    position_offset=0,
    carry: list | None = None,
    compute_dtype=jnp.float32,
    mask_invalid: bool = False,
    return_aux: bool = False,
    return_moe_stats: bool = False,
    stats_start=None,
    ep_axis: str | None = None,
):
    """Full-sequence (training) or continuation (streaming) encode.

    ``carry``: per-block streaming state [{'kv': (B, C, 2, H, Dh) cached
    chunks' k/v — None in training}, conv tail].  Returns (out (B,T,D),
    new_carry) — or (out, new_carry, moe_aux) with ``return_aux=True``,
    where moe_aux is the mean weighted router aux loss over the MoE
    blocks (0 when ``config.moe_experts == 0``; the training loss
    consumes it, see seq2seq_loss).  ``return_moe_stats=True`` instead
    appends the per-block list of ADDITIVE router-stats dicts — the
    model-parallel encodes psum those across shards before the
    nonlinear loss (models/moe.py::aux_from_stats), which makes the
    sharded aux equal the unsharded one exactly.  Under
    ``compute_dtype=bfloat16`` every GEMM runs in bf16 on the MXU;
    layernorm statistics and the attention softmax stay f32
    (numerics-neutral at the loss level, ~2× MXU throughput)."""
    cd = compute_dtype
    x = (
        _dot(xs.astype(cd), params["in_proj"]["w"], cd)
        + params["in_proj"]["b"].astype(cd)
    )
    positions = jnp.arange(x.shape[1]) + position_offset
    # pre-recording halo steps (negative absolute position — only under
    # sequence parallelism, where the offset is traced) behave exactly
    # like the offline zero pad
    valid = positions >= 0 if mask_invalid else None
    blk = apply_block
    if getattr(config, "remat", False):
        # activation rematerialization per block (memory ↔ one extra
        # forward); config/cd are static via closure, arrays are args
        def blk(block, x, config, lengths, positions, cd, tail, valid,
                stats_start=None, ep_axis=None):
            return jax.checkpoint(
                lambda b, xx, ln, pos, tl, vd, ss: apply_block(
                    b, xx, config, ln, pos, cd, tl, vd, stats_start=ss,
                    ep_axis=ep_axis,
                )
            )(block, x, lengths, positions, tail, valid, stats_start)

    new_carry = []
    stats_list = []
    for bi, block in enumerate(params["blocks"]):
        tail = carry[bi] if carry is not None else None
        x, new_tail, stats = blk(
            block, x, config, lengths, positions, cd, tail, valid,
            stats_start=stats_start, ep_axis=ep_axis,
        )
        new_carry.append(new_tail)
        stats_list.append(stats)
    if return_moe_stats:
        return x, new_carry, stats_list
    if return_aux:
        return x, new_carry, moe_aux_from_stats(config, stats_list)
    return x, new_carry


def moe_aux_from_stats(config: ConformerConfig, stats_list) -> jax.Array:
    """Mean weighted router aux loss over the MoE blocks, from their
    per-block additive stats (``None`` entries are non-MoE blocks)."""
    from ecog2txt_tpu.models.moe import aux_from_stats

    losses = [
        aux_from_stats(config, s) for s in stats_list if s is not None
    ]
    if not losses:
        return jnp.zeros((), jnp.float32)
    return sum(losses) / len(losses)


def receptive_field_steps(config: ConformerConfig) -> int:
    """Compound receptive field of the block stack BEHIND a chunk-aligned
    position, in encoder steps (always a multiple of ``chunk_size``).

    Derived by inverting the stack from an aligned boundary p: each
    block's conv reaches ``kernel-1`` steps back, which (for kernel>1)
    crosses into the previous chunk, and the block's attention then
    reaches ``left_context`` chunks back FROM THAT CHUNK'S START — so
    per block the earliest needed position drops by exactly
    ``left_context·chunk + chunk·ceil((kernel-1)/chunk)`` and stays
    chunk-aligned.  The naive ``N·(left_context·chunk + kernel-1)``
    bound under-counts this alignment spillover: with chunk=8, kernel=4,
    2 blocks it gives 22→24 rounded where 32 steps are truly needed
    (boundary rows then differ ~1e-4 — caught by an SP parity sweep)."""
    C = config.chunk_size
    conv_chunks = -(-(config.conv_kernel - 1) // C)  # 0 when kernel==1
    return config.num_blocks * C * (config.left_context + conv_chunks)


class ConformerStream:
    """Chunk-by-chunk streaming wrapper.

    Realized by re-encoding a bounded sliding window that covers the
    stack's compound receptive field (:func:`receptive_field_steps`).
    The window always starts on an absolute chunk boundary (chunk ids
    only shift by a constant, leaving the mask pattern intact) and
    rotary positions are offset to absolute time, so streamed outputs
    equal the full-utterance outputs for every emitted chunk (tested).
    Memory is O(window), independent of recording length — the
    long-continuous-recordings path (BASELINE configs[4])."""

    def __init__(
        self, params: dict, config: ConformerConfig,
        compute_dtype=jnp.float32,
    ):
        if config.moe_experts and config.moe_capacity_factor > 0:
            raise ValueError(
                "streaming requires the exact no-drop MoE path "
                "(moe_capacity_factor=0): capacity drops depend on the "
                "token POPULATION, and a streaming window's population "
                "differs from the offline encode's — the streamed == "
                "offline contract would not hold"
            )
        self.params = params
        self.config = config
        self.compute_dtype = compute_dtype
        # receptive field (already whole chunks) + the emitted chunk
        self.window_steps = (
            receptive_field_steps(config) + config.chunk_size
        )
        self._step = None  # jitted fixed-shape window step (lazy: needs B)
        self.reset()

    def reset(self):
        self._window: jax.Array | None = None  # (B, W, in_dim), fixed W
        self._pushed = 0
        self._valid = 0

    def snapshot(self) -> tuple:
        """Opaque state capture; pair with :meth:`restore` to make a
        speculative push (e.g. a mid-stream flush-and-decode) side-effect
        free."""
        return (self._window, self._pushed, self._valid)

    def restore(self, state: tuple) -> None:
        self._window, self._pushed, self._valid = state

    def _make_step(self):
        """One jitted call per push: roll the fixed-size window, encode,
        emit the last chunk.  The window's left zero-fill sits at
        negative absolute positions, which ``mask_invalid`` treats
        exactly like the offline zero left-pad — so shapes are static
        from the first push and XLA compiles ONCE (shape changes
        retrace via jit; no per-shape caching needed here)."""
        cfg = self.config
        C = cfg.chunk_size

        def step(window, chunk, lengths, offset):
            window = jnp.concatenate([window[:, C:], chunk], axis=1)
            out, _ = conformer_encode(
                self.params, cfg, window, lengths, position_offset=offset,
                compute_dtype=self.compute_dtype, mask_invalid=True,
            )
            return out[:, -C:], window

        return jax.jit(step)

    def push(self, chunk: jax.Array, num_valid: int | None = None) -> jax.Array:
        """chunk: (B, chunk_size, in_dim) → (B, chunk_size, D) encoder
        output for this chunk.

        ``num_valid`` < chunk_size marks a FINAL partial chunk (padded to
        the chunk boundary): steps beyond it are masked out of attention,
        matching the offline encode's length masking exactly.  After a
        partial push, ``reset()`` (or ``restore()`` a prior
        ``snapshot()``) before pushing again."""
        cfg = self.config
        if chunk.shape[1] != cfg.chunk_size:
            raise ValueError(
                f"push expects chunks of {cfg.chunk_size} steps"
            )
        if self._valid < self._pushed:
            raise RuntimeError(
                "push after a partial (final) chunk: reset() the stream"
            )
        B, _, in_dim = chunk.shape
        if self._window is None:
            self._window = jnp.zeros(
                (B, self.window_steps, in_dim), chunk.dtype
            )
        if self._step is None:
            self._step = self._make_step()
        self._pushed += cfg.chunk_size
        self._valid += (
            cfg.chunk_size if num_valid is None else int(num_valid)
        )
        # absolute valid-step count — _attention masks keys by their
        # absolute positions (a no-op until a partial final chunk)
        lengths = jnp.full((B,), self._valid, jnp.int32)
        offset = jnp.asarray(self._pushed - self.window_steps, jnp.int32)
        out, self._window = self._step(self._window, chunk, lengths, offset)
        return out
