"""Encoder-decoder seq2seq core — the TPU-native rebuild of the absent
``machine_learning`` SequenceNetwork (reconstructed spec: SURVEY §2.8).

Architecture (reference scope grammar, trainers.py:444-554 +
layer_sizes, mocha-1_word_sequence.yaml:56-69):

* per-subject ``subnet``: input reversal (``tf.reverse_sequence``,
  trainers.py:806-811) + temporal-conv downsampling stack (total stride
  = ``decimation_factor`` ≈ 12, 200 Hz → 16.5 Hz);
* shared bidirectional LSTM encoder stack (3×400 per direction);
* auxiliary encoder head(s) (``encoder_1_projection`` [225]) regressing
  the reversed+decimated MFCC (Gaussian) or per-sample phoneme labels
  (categorical) at every downsampled step, weighted by
  ``penalty_scale`` (trainers.py:789-799, SequenceDataManifest
  distributions);
* attention-free LSTM decoder (embedding 150 → LSTM 800) initialized
  from the final encoder state, teacher-forced in training, greedy /
  temperature-sampled at assessment (temperature 0.384, beam 1 —
  yaml:82,31).

TPU-first choices:

* Temporal conv with kernel width == stride is computed as
  reshape→matmul ((T', d·C) @ W) — one big MXU-friendly GEMM instead of
  a conv op.
* All per-subject subnet parameters are **stacked** along a leading
  subject axis and selected with a traced index, so multi-subject
  transfer training is ONE compiled program (no per-subject retrace;
  heterogeneous channel counts are zero-padded to a common max).
* Sequences are time-major ``(T, B, F)``; recurrences are `lax.scan`
  (ops/lstm.py); decoding is a fixed-length scan with a finished mask.
* Dropout (FF 0.1 / recurrent 0.5, yaml:6,13) uses explicit rng;
  recurrent dropout is variational (one mask per sequence).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lstm import (
    bidirectional_lstm,
    init_lstm_params,
    lstm_scan,
    lstm_step,
    reverse_padded,
)
from .conformer import ConformerConfig, conformer_encode, init_conformer


class AuxHead(NamedTuple):
    """One auxiliary encoder target head (e.g. 'encoder_1_targets')."""

    name: str
    distribution: str  # 'categorical' | 'CTC' | 'Gaussian' | 'Rayleigh'
    out_dim: int  # num classes or num features


@dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int
    num_subjects: int = 1
    in_channels: int = 256  # common (padded) channel count
    conv_sizes: tuple = (100,)
    decimation_factor: int = 12
    rnn_sizes: tuple = (400, 400, 400)
    aux_proj_sizes: tuple = (225,)
    aux_heads: tuple = ()  # tuple[AuxHead]
    dec_embedding_size: int = 150
    dec_rnn_sizes: tuple = (800,)
    max_dec_len: int = 20
    FF_dropout: float = 0.1
    RNN_dropout: float = 0.5
    temperature: float = 0.0  # 0 → greedy argmax
    BIDIRECTIONAL: bool = True
    # fused VMEM-resident recurrence (TPU): False | True (chunked-grid
    # Pallas kernels, ops/pallas_lstm.py)
    use_pallas_lstm: Any = False
    encoder_type: str = "lstm"  # 'lstm' | 'conformer'
    conformer: ConformerConfig | None = None  # used when encoder_type=conformer
    # Luong-style cross-attention from decoder steps onto encoder
    # outputs (the reference's 'cross_attention' experiment variant,
    # plotters.py suffix taxonomy; BASELINE configs[0-1] 'attention
    # LSTM dec').  No input feeding: the LSTM runs first, attention +
    # combine layer follow — so teacher forcing stays one scan + one
    # batched einsum.
    use_attention: bool = False
    compute_dtype: Any = jnp.float32
    pad_id: int = 0
    eos_id: int = 1

    @property
    def conv_strides(self) -> tuple:
        """Factor ``decimation_factor`` into one stride per conv layer
        (the reference recovers per-layer strides from checkpoint shapes,
        trainers.py:534-541; here they're near-equal factors)."""
        if not self.conv_sizes:
            return ()
        remaining = self.decimation_factor
        n = len(self.conv_sizes)
        strides = []
        for i in range(n, 0, -1):
            s = max(int(round(remaining ** (1.0 / i))), 1)
            while remaining % s and s > 1:
                s -= 1
            strides.append(s)
            remaining //= s
        strides[-1] *= remaining  # absorb any leftover
        return tuple(strides)

    @property
    def enc_out_dim(self) -> int:
        if self.encoder_type == "conformer":
            return (self.conformer or ConformerConfig()).model_dim
        return self.rnn_sizes[-1] * (2 if self.BIDIRECTIONAL else 1)


def _dense_init(rng, in_dim, out_dim):
    scale = np.sqrt(6.0 / (in_dim + out_dim))
    w = jax.random.uniform(rng, (in_dim, out_dim), jnp.float32, -scale, scale)
    return {"w": w, "b": jnp.zeros((out_dim,), jnp.float32)}


def _dense(params, x, compute_dtype=jnp.float32):
    return (
        jnp.dot(
            x.astype(compute_dtype),
            params["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b"]
    )


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def init_seq2seq(rng: jax.Array, config: Seq2SeqConfig) -> dict:
    """Parameter pytree.  Subnet params carry a leading subject axis —
    the pytree split 'subnet' vs everything-else mirrors the reference's
    ``seq2seq/subnet_<id>`` vs shared scopes (trainers.py:337-338), so
    transfer learning is an optax mask over these keys."""
    keys = iter(jax.random.split(rng, 64))
    params: dict[str, Any] = {}

    # per-subject conv stack, stacked on axis 0
    subnet_layers = []
    in_dim = self_in = config.in_channels
    for size, stride in zip(config.conv_sizes, config.conv_strides):
        layer_keys = jax.random.split(next(keys), config.num_subjects)
        stacked = jax.vmap(
            lambda k: _dense_init(k, in_dim * stride, size)
        )(layer_keys)
        subnet_layers.append(stacked)
        in_dim = size
    params["subnet"] = {"conv": subnet_layers}

    # shared encoder: biLSTM stack or conformer blocks
    if config.encoder_type == "conformer":
        ccfg = config.conformer or ConformerConfig()
        params["encoder"] = {
            "conformer": init_conformer(next(keys), ccfg, in_dim)
        }
        in_dim = ccfg.model_dim
    else:
        enc_layers = []
        for size in config.rnn_sizes:
            if config.BIDIRECTIONAL:
                enc_layers.append(
                    {
                        "fwd": init_lstm_params(next(keys), in_dim, size),
                        "bwd": init_lstm_params(next(keys), in_dim, size),
                    }
                )
                in_dim = 2 * size
            else:
                enc_layers.append({"fwd": init_lstm_params(next(keys), in_dim, size)})
                in_dim = size
        params["encoder"] = {"rnn": enc_layers}
        in_dim = config.enc_out_dim

    # aux heads: MLP (aux_proj_sizes) → linear to target dim
    aux = {}
    for head in config.aux_heads:
        hidden = []
        dim = config.enc_out_dim
        for size in config.aux_proj_sizes:
            hidden.append(_dense_init(next(keys), dim, size))
            dim = size
        aux[head.name] = {
            "mlp": hidden,
            "out": _dense_init(next(keys), dim, head.out_dim),
        }
    params["aux"] = aux

    # decoder
    emb_scale = 1.0 / np.sqrt(config.dec_embedding_size)
    decoder: dict[str, Any] = {
        "embedding": emb_scale
        * jax.random.normal(
            next(keys), (config.vocab_size, config.dec_embedding_size)
        ),
    }
    dec_layers = []
    in_dim = config.dec_embedding_size
    for size in config.dec_rnn_sizes:
        dec_layers.append(init_lstm_params(next(keys), in_dim, size))
        in_dim = size
    decoder["rnn"] = dec_layers
    # bridge from encoder final state to decoder layer-0 state when the
    # sizes differ (they match in the reference config: 2×400 = 800)
    if config.enc_out_dim != config.dec_rnn_sizes[0]:
        decoder["bridge_h"] = _dense_init(
            next(keys), config.enc_out_dim, config.dec_rnn_sizes[0]
        )
        decoder["bridge_c"] = _dense_init(
            next(keys), config.enc_out_dim, config.dec_rnn_sizes[0]
        )
    if config.use_attention:
        decoder["attn"] = {
            "wa": _dense_init(next(keys), in_dim, config.enc_out_dim),
            "wc": _dense_init(
                next(keys), in_dim + config.enc_out_dim, in_dim
            ),
        }
    decoder["out"] = _dense_init(next(keys), in_dim, config.vocab_size)
    params["decoder"] = decoder
    return params


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _ff_dropout(rng, x, rate, train):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _select_subject(stacked, subject_idx):
    return jax.tree.map(lambda a: a[subject_idx], stacked)


@jax.custom_vjp
def _strided_conv(xs, wg):
    """(T, B, C) ⊛ (stride, C, F) width==stride 'VALID' conv → (T', B, F)
    f32-accumulated.  The XLA conv primitive streams the (T, B, C)
    input CONTIGUOUSLY (lhs dimension numbers chosen so no transpose is
    inserted) — measured 0.55 ms/step faster than the grouped
    dot_general at bench scale (scripts/conv_frontend_bench.py,
    RESULTS.md r5).  The custom VJP exists because the conv primitive's
    own transpose rule refuses the mixed bf16-lhs/f32-cotangent case;
    it reproduces exactly the grouped-GEMM gradients (f32 accumulate),
    and XLA DCEs the dxs arm when inputs are corpus leaves."""
    stride = wg.shape[0]
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(1, 2, 0),  # (T, B, C): batch=B, feature=C, spatial=T
        rhs_spec=(2, 1, 0),  # (stride, C, F): out=F, in=C, spatial=stride
        out_spec=(1, 2, 0),  # (T', B, F)
    )
    return jax.lax.conv_general_dilated(
        xs, wg, window_strides=(stride,), padding="VALID",
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )


def _strided_conv_fwd(xs, wg):
    return _strided_conv(xs, wg), (xs, wg)


def _strided_conv_bwd(res, dy):  # dy: (T', B, F) f32
    xs, wg = res
    stride, C, F = wg.shape
    T_out, B = dy.shape[0], dy.shape[1]
    xs_g = xs[: T_out * stride].reshape(T_out, stride, B, C)
    # dw[s,c,f] = Σ_{t,b} xs_g[t,s,b,c]·dy[t,b,f] — einsum promotes the
    # bf16 operand in-register, f32 accumulate (== the grouped-GEMM VJP)
    dw = jnp.einsum(
        "tsbc,tbf->scf", xs_g, dy, preferred_element_type=jnp.float32
    )
    # dxs_g[t,s,b,c] = Σ_f dy[t,b,f]·wg[s,c,f]
    dxs_g = jnp.einsum(
        "tbf,scf->tsbc", dy, wg, preferred_element_type=jnp.float32
    )
    dxs = dxs_g.reshape(T_out * stride, B, C)
    pad = xs.shape[0] - T_out * stride
    if pad:
        dxs = jnp.concatenate(
            [dxs, jnp.zeros((pad, B, C), dxs.dtype)], axis=0
        )
    return dxs.astype(xs.dtype), dw.astype(wg.dtype)


_strided_conv.defvjp(_strided_conv_fwd, _strided_conv_bwd)


def convolve_sequences(
    params: dict,
    config: Seq2SeqConfig,
    xs: jax.Array,  # (T, B, C) time-major
    subject_idx: jax.Array,
    rng: jax.Array,
    train: bool,
    reverse_lengths: jax.Array | None = None,
) -> jax.Array:
    """Per-subject temporal conv stack as reshape→GEMM (width == stride,
    'VALID'):  (T, B, C) → (T/d, B, d·C) @ W_subject → relu → dropout.
    The reference's ``_convolve_sequences`` (probe: trainers.py:813-818).

    With ``reverse_lengths``, ``xs`` is UNREVERSED and the input
    reversal (reference trainers.py:806-811) is fused into the first
    layer: because kernel width == stride, convolving the reversed
    input equals convolving the raw input with the weight rows flipped
    within each stride group and reversing the OUTPUT at the decimated
    rate — a gather over ``stride×`` less data than reversing the raw
    sequence (which profiles at several ms per step at reference
    scale).  Exactly equal when valid lengths are stride multiples
    (the packed corpus pads time to the decimation factor and the loss
    masks at ceil(L/stride) steps either way).
    """
    for i, (layer, stride) in enumerate(
        zip(params["subnet"]["conv"], config.conv_strides)
    ):
        w = _select_subject(layer, subject_idx)
        T, B, C = xs.shape
        F_out = w["w"].shape[-1]
        wg = w["w"].reshape(stride, C, F_out)
        if reverse_lengths is not None and i == 0:
            wg = jnp.flip(wg, axis=0)
        T_out = T // stride
        # the conv primitive with no-transpose dimension numbers streams
        # the raw input contiguously — measured faster than BOTH the
        # grouped dot_general it replaces (−0.55 ms/step at bench
        # scale) and the materialized (T', B, stride·C) reshape-GEMM
        # (−2.4 ms) — see _strided_conv and RESULTS.md r5; early bf16
        # cast halves the streamed bytes
        out = _strided_conv(
            xs.astype(config.compute_dtype)[: T_out * stride],
            wg.astype(config.compute_dtype),
        )  # (T', B, F) f32
        xs = jax.nn.relu(out + w["b"])
        if reverse_lengths is not None and i == 0:
            lens0 = jnp.minimum(
                (reverse_lengths + stride - 1) // stride, T_out
            )
            xs = reverse_padded(xs, lens0)
        rng, sub = jax.random.split(rng)
        xs = _ff_dropout(sub, xs, config.FF_dropout, train)
    return xs


def encode(
    params: dict,
    config: Seq2SeqConfig,
    inputs: jax.Array,  # (B, T, C) batch-major raw
    lengths: jax.Array,  # (B,)
    subject_idx: jax.Array,
    rng: jax.Array,
    train: bool = False,
    sp: tuple | None = None,
    pp: tuple | None = None,
    return_aux: bool = False,
) -> tuple:
    """Full encoder: reversal → conv → biLSTM stack.

    ``sp=(mesh, axis)`` shards the conformer encode's TIME axis over
    ``mesh[axis]`` (parallel/sequence.py halo design; differentiable —
    the sp TRAINING path).  ``pp=(mesh, axis, microbatches)`` pipelines
    the conformer block stack over ``mesh[axis]`` (parallel/pipeline.py
    GPipe ring; differentiable).  Both require
    ``encoder_type='conformer'``.

    Returns (enc_outputs (T', B, 2H), final (h, c) (B, 2H),
    enc_lengths (B,)) — plus a trailing moe_aux scalar with
    ``return_aux=True`` (the MoE conformer's weighted router loss;
    0 for every non-MoE configuration)."""
    xs = jnp.moveaxis(inputs, 0, 1)  # (T, B, C)
    rng, conv_rng = jax.random.split(rng)
    reverse = config.encoder_type != "conformer"
    # the reference reverses encoder inputs before the conv
    # (tf.reverse_sequence, trainers.py:806-811) — an offline
    # LSTM-specific trick; the conformer is chunked-causal and consumes
    # natural time order so the SAME function streams chunk-by-chunk
    # (serve.StreamingConformerSession).  For the conv path the
    # reversal is FUSED into the first layer (flipped weight rows +
    # decimated-rate output reversal — see convolve_sequences) instead
    # of gathering the full raw-rate sequence.
    if config.conv_sizes:
        xs = convolve_sequences(
            params, config, xs, subject_idx, conv_rng, train,
            reverse_lengths=lengths if reverse else None,
        )
    else:
        # no-conv experiment variant (reference suffix taxonomy,
        # plotters.py:1513-1575): plain strided decimation
        if reverse:
            xs = reverse_padded(xs, lengths)
        d0 = config.decimation_factor
        xs = xs[: (xs.shape[0] // d0) * d0 : d0]
    d = config.decimation_factor
    enc_lengths = jnp.minimum((lengths + d - 1) // d, xs.shape[0])

    if config.encoder_type == "conformer":
        # conformer path: batch-major attention over downsampled steps;
        # the decoder initial state comes from a masked mean over the
        # valid steps (bridged/tanh-projected in _decoder_init_state)
        ccfg = config.conformer or ConformerConfig()
        moe_aux = jnp.zeros((), jnp.float32)
        xs_bm = jnp.moveaxis(xs, 0, 1)  # (B, T', F)
        if sp is not None and pp is not None:
            # sp × pp: time shards (halo ppermute over sp's axis) flow
            # through the GPipe block ring (pp's axis) — one shard_map
            # over both axes (parallel/sp_pp.py).  With
            # sp=(mesh, axis, ep_axis) the MoE expert dim additionally
            # shards over ep_axis INSIDE every stage — the 3-way
            # ep × sp × pp composition.
            from ..parallel.sp_pp import sp_pp_conformer_encode

            mesh, seq_axis = sp[0], sp[1]
            ep_axis = sp[2] if len(sp) > 2 else (
                pp[3] if len(pp) > 3 else None
            )
            tp_axis = pp[4] if len(pp) > 4 else None
            pp_axis, microbatches = pp[1], pp[2]
            Tq = xs_bm.shape[1]
            mult = mesh.shape[seq_axis] * ccfg.chunk_size
            padT = (-Tq) % mult
            if padT:
                xs_bm = jnp.pad(xs_bm, ((0, 0), (0, padT), (0, 0)))
            if ccfg.moe_experts:
                out_bm, moe_aux = sp_pp_conformer_encode(
                    params["encoder"]["conformer"], ccfg, xs_bm, mesh,
                    seq_axis=seq_axis, pp_axis=pp_axis,
                    microbatches=microbatches, lengths=enc_lengths,
                    compute_dtype=config.compute_dtype, return_aux=True,
                    ep_axis=ep_axis,
                )
                out_bm = out_bm[:, :Tq]
            else:
                out_bm = sp_pp_conformer_encode(
                    params["encoder"]["conformer"], ccfg, xs_bm, mesh,
                    seq_axis=seq_axis, pp_axis=pp_axis,
                    microbatches=microbatches, lengths=enc_lengths,
                    compute_dtype=config.compute_dtype,
                    tp_axis=tp_axis,
                )[:, :Tq]
        elif sp is not None:
            # time-sharded encode (one input-halo ppermute); pad the
            # step axis to the shard×chunk grid — pad steps sit beyond
            # every length and are masked/dropped
            from ..parallel.sequence import sequence_parallel_encode

            # sp=(mesh, axis) — or (mesh, axis, ep_axis) for the ep×sp
            # 2-D mesh: MoE expert leaves sharded over ep_axis INSIDE
            # the time-sharded encode (parallel/sequence.py)
            mesh, axis = sp[0], sp[1]
            ep_axis = sp[2] if len(sp) > 2 else None
            Tq = xs_bm.shape[1]
            mult = mesh.shape[axis] * ccfg.chunk_size
            padT = (-Tq) % mult
            if padT:
                xs_bm = jnp.pad(xs_bm, ((0, 0), (0, padT), (0, 0)))
            if ccfg.moe_experts:
                out_bm, moe_aux = sequence_parallel_encode(
                    params["encoder"]["conformer"], ccfg, xs_bm, mesh,
                    axis=axis, lengths=enc_lengths,
                    compute_dtype=config.compute_dtype, return_aux=True,
                    ep_axis=ep_axis,
                )
                out_bm = out_bm[:, :Tq]
            else:
                out_bm = sequence_parallel_encode(
                    params["encoder"]["conformer"], ccfg, xs_bm, mesh,
                    axis=axis, lengths=enc_lengths,
                    compute_dtype=config.compute_dtype,
                )[:, :Tq]
        elif pp is not None:
            from ..parallel.pipeline import pipeline_conformer_encode

            # pp=(mesh, axis, microbatches) — or (mesh, axis, M,
            # ep_axis) for ep×pp: MoE expert leaves sharded over
            # ep_axis inside each pipeline stage (parallel/pipeline.py)
            # — or (mesh, axis, M, None, tp_axis) for tp×pp: stage
            # weights' wide output dims sharded over an AUTO tp_axis
            mesh, axis, microbatches = pp[0], pp[1], pp[2]
            pp_ep_axis = pp[3] if len(pp) > 3 else None
            pp_tp_axis = pp[4] if len(pp) > 4 else None
            if ccfg.moe_experts:
                out_bm, moe_aux = pipeline_conformer_encode(
                    params["encoder"]["conformer"], ccfg, xs_bm, mesh,
                    axis=axis, microbatches=microbatches,
                    lengths=enc_lengths,
                    compute_dtype=config.compute_dtype, return_aux=True,
                    ep_axis=pp_ep_axis, tp_axis=pp_tp_axis,
                )
            else:
                out_bm = pipeline_conformer_encode(
                    params["encoder"]["conformer"], ccfg, xs_bm, mesh,
                    axis=axis, microbatches=microbatches,
                    lengths=enc_lengths,
                    compute_dtype=config.compute_dtype,
                    tp_axis=pp_tp_axis,
                )
        else:
            out_bm, _, moe_aux = conformer_encode(
                params["encoder"]["conformer"], ccfg, xs_bm, enc_lengths,
                compute_dtype=config.compute_dtype, return_aux=True,
            )
        T_out = out_bm.shape[1]
        step_mask = (
            jnp.arange(T_out)[None, :] < enc_lengths[:, None]
        )[..., None]
        denom = jnp.maximum(enc_lengths[:, None], 1).astype(out_bm.dtype)
        pooled = jnp.sum(out_bm * step_mask, axis=1) / denom
        out = jnp.moveaxis(out_bm * step_mask, 0, 1)  # (T', B, D) masked
        if return_aux:
            return out, (pooled, pooled), enc_lengths, moe_aux
        return out, (pooled, pooled), enc_lengths

    out = xs
    final_h = final_c = None
    for i, layer in enumerate(params["encoder"]["rnn"]):
        rng, m_rng, d_rng = jax.random.split(rng, 3)
        if config.BIDIRECTIONAL:
            masks = None
            if train and config.RNN_dropout > 0:
                B = out.shape[1]
                H = layer["fwd"]["wh"].shape[0]
                keep = 1.0 - config.RNN_dropout
                mf, mb = jax.random.split(m_rng)
                masks = (
                    jax.random.bernoulli(mf, keep, (B, H)) / keep,
                    jax.random.bernoulli(mb, keep, (B, H)) / keep,
                )
            out, (final_h, final_c) = bidirectional_lstm(
                layer["fwd"], layer["bwd"], out, enc_lengths,
                masks, config.compute_dtype,
                use_pallas=config.use_pallas_lstm,
            )
        else:
            mask = None
            if train and config.RNN_dropout > 0:
                B = out.shape[1]
                H = layer["fwd"]["wh"].shape[0]
                keep = 1.0 - config.RNN_dropout
                mask = jax.random.bernoulli(m_rng, keep, (B, H)) / keep
            out, (final_h, final_c) = lstm_scan(
                layer["fwd"], out, enc_lengths, None, mask, config.compute_dtype,
                use_pallas=config.use_pallas_lstm,
            )
        if i < len(params["encoder"]["rnn"]) - 1:
            out = _ff_dropout(d_rng, out, config.FF_dropout, train)
    if return_aux:
        return out, (final_h, final_c), enc_lengths, jnp.zeros(
            (), jnp.float32
        )
    return out, (final_h, final_c), enc_lengths


def _decoder_init_state(
    params: dict, config: Seq2SeqConfig, enc_final: tuple[jax.Array, jax.Array]
) -> list[tuple[jax.Array, jax.Array]]:
    h, c = enc_final
    decoder = params["decoder"]
    if "bridge_h" in decoder:
        h = jnp.tanh(_dense(decoder["bridge_h"], h, config.compute_dtype))
        c = jnp.tanh(_dense(decoder["bridge_c"], c, config.compute_dtype))
    states = [(h, c)]
    B = h.shape[0]
    for size_params in decoder["rnn"][1:]:
        H = size_params["wh"].shape[0]
        states.append(
            (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
        )
    return states


def _attend(
    attn_params,
    h_dec: jax.Array,  # (..., B, H_dec) decoder states (L leading ok)
    enc_out: jax.Array,  # (T', B, E)
    enc_lengths: jax.Array,  # (B,)
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Luong general attention + combine: softmax((h Wa) · enc) over
    valid encoder steps → tanh(Wc [h; context])."""
    query = _dense(attn_params["wa"], h_dec, compute_dtype)  # (..., B, E)
    scores = jnp.einsum("...be,tbe->...bt", query, enc_out)
    valid = (
        jnp.arange(enc_out.shape[0])[None, :] < enc_lengths[:, None]
    )  # (B, T')
    scores = jnp.where(valid, scores, -1e9)
    weights = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("...bt,tbe->...be", weights, enc_out)
    combined = jnp.concatenate([h_dec, context], axis=-1)
    return jnp.tanh(_dense(attn_params["wc"], combined, compute_dtype))


# --------------------------------------------------------------------------
# decoder — teacher forcing
# --------------------------------------------------------------------------


def decoder_teacher_forcing(
    params: dict,
    config: Seq2SeqConfig,
    enc_final: tuple[jax.Array, jax.Array],
    targets: jax.Array,  # (B, L) int32, EOS-terminated, pad-padded
    rng: jax.Array,
    train: bool = False,
    enc_out: jax.Array | None = None,  # (T', B, E) for attention
    enc_lengths: jax.Array | None = None,
) -> jax.Array:
    """Teacher-forced logits (L, B, V).  Decoder inputs are the targets
    shifted right with an initial ``<pad>`` (the reference's
    init/EOS/pad convention, trainers.py:96-97 + tokenizers)."""
    decoder = params["decoder"]
    B, L = targets.shape
    shifted = jnp.concatenate(
        [jnp.full((B, 1), config.pad_id, targets.dtype), targets[:, :-1]],
        axis=1,
    )
    emb = decoder["embedding"][shifted]  # (B, L, E)
    xs = jnp.moveaxis(emb, 0, 1)  # (L, B, E)
    states = _decoder_init_state(params, config, enc_final)
    out = xs
    for li, layer in enumerate(decoder["rnn"]):
        rng, m_rng, d_rng = jax.random.split(rng, 3)
        mask = None
        if train and config.RNN_dropout > 0:
            H = layer["wh"].shape[0]
            keep = 1.0 - config.RNN_dropout
            mask = jax.random.bernoulli(m_rng, keep, (B, H)) / keep
        # decoder sequences are short (max_dec_len ≈ 20) and wide
        # (H=800 → small VMEM batch tiles), so the plain scan wins here;
        # the fused Pallas path is for the long encoder recurrences
        out, _ = lstm_scan(
            layer, out, None, states[li], mask, config.compute_dtype,
        )
        if li < len(decoder["rnn"]) - 1:
            out = _ff_dropout(d_rng, out, config.FF_dropout, train)
    if config.use_attention:
        out = _attend(
            decoder["attn"], out, enc_out, enc_lengths, config.compute_dtype
        )
    logits = _dense(decoder["out"], out, config.compute_dtype)  # (L, B, V)
    return logits


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------


def _decimate_targets(
    ts: jax.Array,
    lengths: jax.Array,
    stride: int,
    T_out: int,
    reverse: bool = True,
):
    """Align per-sample encoder targets with encoder steps: reverse the
    valid prefix (matching the encoder's input reversal — the reference
    reverses + decimates encoder targets, trainers.py:789-799), then
    take every ``stride``-th sample.  ``reverse=False`` for the
    natural-order (conformer) encoder."""
    if reverse:
        ts = reverse_padded(ts, lengths)
    return ts[: T_out * stride : stride]


def rayleigh_nll(log_sigma: jax.Array, x: jax.Array) -> jax.Array:
    """Elementwise Rayleigh negative log-likelihood, log-σ head.

    NLL(x; σ) = 2·log σ + x²/(2σ²) − log x for x > 0 — the exact
    −log pdf (pdf = x/σ² · exp(−x²/2σ²)), so values compare directly
    to ``scipy.stats.rayleigh.logpdf``.  The −log x data term is kept
    so the metric is a true NLL; x is clamped at 1e-6 so padded zeros
    stay finite (they are masked out of the loss anyway).  The MLE in
    σ is σ² = mean(x²)/2 (∂NLL/∂logσ = 2 − x²/σ² = 0 in expectation).
    Schema contract: subjects.py:43; reference subjects.py:369-384.
    """
    x = jnp.maximum(x, 1e-6)
    return (
        2.0 * log_sigma
        + 0.5 * jnp.square(x) * jnp.exp(-2.0 * log_sigma)
        - jnp.log(x)
    )


def seq2seq_loss(
    params: dict,
    config: Seq2SeqConfig,
    batch: dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
    penalty_scales: dict[str, float] | None = None,
    sp: tuple | None = None,
    pp: tuple | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Total loss + metrics.  ``sp``/``pp``: model-parallel encoder
    options, see :func:`encode`.

    ``batch``: 'encoder_inputs' (B,T,C), 'encoder_lengths' (B,),
    'decoder_targets' (B,L) EOS-terminated, 'decoder_lengths' (B,),
    'subject_idx' scalar int, plus one entry per aux head (per-sample
    targets at the raw rate: categorical (B,T), Gaussian (B,T,F)).

    ``penalty_scales``: loss weight per aux head name (the manifests'
    ``penalty_scale``; zeroing all but one is how saliency isolates a
    head, reference trainers.py:709-719).
    """
    penalty_scales = penalty_scales or {}
    rng_enc, rng_dec = jax.random.split(rng)
    enc_out, enc_final, enc_lengths, moe_aux = encode(
        params,
        config,
        batch["encoder_inputs"],
        batch["encoder_lengths"],
        batch["subject_idx"],
        rng_enc,
        train,
        sp=sp,
        pp=pp,
        return_aux=True,
    )
    T_out = enc_out.shape[0]
    step_mask = (
        jnp.arange(T_out)[:, None] < enc_lengths[None, :]
    )  # (T', B)

    metrics: dict[str, jax.Array] = {}
    total = 0.0
    if (
        config.encoder_type == "conformer"
        and (config.conformer or ConformerConfig()).moe_experts
    ):
        # already weighted (moe_aux_weight / moe_zloss_weight inside
        # models/moe.py) — keeps the router balanced across experts
        total = total + moe_aux
        metrics["moe_aux"] = moe_aux

    # auxiliary encoder heads
    for head in config.aux_heads:
        head_params = params["aux"][head.name]
        h = enc_out
        for mlp in head_params["mlp"]:
            h = jax.nn.relu(_dense(mlp, h, config.compute_dtype))
        pred = _dense(head_params["out"], h, config.compute_dtype)
        raw = batch[head.name]
        scale = penalty_scales.get(head.name, 1.0)
        if head.distribution == "CTC":
            # alignment-free phoneme loss (models/ctc.py; BASELINE
            # configs[3]); pred covers phonemes + trailing blank
            from .ctc import ctc_loss as _ctc_loss

            loss = _ctc_loss(
                pred, enc_lengths, raw, batch[f"{head.name}_lengths"]
            )
        elif head.distribution == "categorical":
            ts = jnp.moveaxis(raw, 0, 1)  # (T, B)
            aligned = _decimate_targets(
                ts, batch["encoder_lengths"], config.decimation_factor,
                T_out, reverse=config.encoder_type != "conformer",
            )
            logp = jax.nn.log_softmax(pred, axis=-1)
            nll = -jnp.take_along_axis(
                logp, aligned[..., None], axis=-1
            )[..., 0]
            loss = jnp.sum(nll * step_mask) / jnp.maximum(
                jnp.sum(step_mask), 1
            )
        elif head.distribution == "Gaussian":  # → masked MSE
            ts = jnp.moveaxis(raw, 0, 1)  # (T, B, F)
            aligned = _decimate_targets(
                ts, batch["encoder_lengths"], config.decimation_factor,
                T_out, reverse=config.encoder_type != "conformer",
            )
            se = jnp.sum((pred - aligned) ** 2, axis=-1)
            loss = jnp.sum(se * step_mask) / jnp.maximum(jnp.sum(step_mask), 1)
        elif head.distribution == "Rayleigh":
            # the schema's default for nonnegative analytic amplitudes
            # (subjects.py:43; reference subjects.py:369-384): the head
            # predicts log σ per feature (rayleigh_nll below)
            ts = jnp.moveaxis(raw, 0, 1)  # (T, B, F)
            aligned = _decimate_targets(
                ts, batch["encoder_lengths"], config.decimation_factor,
                T_out, reverse=config.encoder_type != "conformer",
            )
            nll = jnp.sum(rayleigh_nll(pred, aligned), axis=-1)  # (T', B)
            loss = jnp.sum(nll * step_mask) / jnp.maximum(
                jnp.sum(step_mask), 1
            )
        else:
            raise ValueError(
                f"aux head {head.name!r}: unknown distribution "
                f"{head.distribution!r} (expected 'categorical', 'CTC', "
                "'Gaussian', or 'Rayleigh')"
            )
        metrics[f"loss_{head.name}"] = loss
        total = total + scale * loss

    # decoder cross-entropy
    targets = batch["decoder_targets"]  # (B, L)
    logits = decoder_teacher_forcing(
        params, config, enc_final, targets, rng_dec, train,
        enc_out=enc_out, enc_lengths=enc_lengths,
    )  # (L, B, V)
    L = targets.shape[1]
    dec_mask = (
        jnp.arange(L)[:, None] < batch["decoder_lengths"][None, :]
    )  # (L, B)
    t_lb = jnp.moveaxis(targets, 0, 1)  # (L, B)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, t_lb[..., None], axis=-1)[..., 0]
    dec_loss = jnp.sum(nll * dec_mask) / jnp.maximum(jnp.sum(dec_mask), 1)
    scale = penalty_scales.get("decoder_targets", 1.0)
    total = total + scale * dec_loss
    metrics["loss_decoder"] = dec_loss

    # teacher-forced token accuracy (word accuracy proxy)
    pred_ids = jnp.argmax(logits, axis=-1)
    correct = (pred_ids == t_lb) * dec_mask
    metrics["token_accuracy"] = jnp.sum(correct) / jnp.maximum(
        jnp.sum(dec_mask), 1
    )
    metrics["loss_total"] = total
    return total, metrics


# --------------------------------------------------------------------------
# free-running decode (greedy / temperature sampling)
# --------------------------------------------------------------------------


def greedy_decode(
    params: dict,
    config: Seq2SeqConfig,
    inputs: jax.Array,  # (B, T, C)
    lengths: jax.Array,
    subject_idx: jax.Array,
    rng: jax.Array | None = None,
    temperature: float | None = None,
) -> jax.Array:
    """Free-running decode to ``max_dec_len``: argmax when temperature is
    0/None, else temperature sampling (reference temperature 0.384,
    beam_width 1 — yaml:82,31).  Fixed-length scan with a finished mask
    (EOS reached → emits pad).  Returns (B, max_dec_len) int32."""
    if temperature is None:
        temperature = config.temperature
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jax.random.PRNGKey(0)
    enc_out, enc_final, enc_lengths = encode(
        params, config, inputs, lengths, subject_idx, dummy, train=False
    )
    return decode_from_encoder(
        params, config, enc_out, enc_final, enc_lengths, rng, temperature
    )


def decode_from_encoder(
    params: dict,
    config: Seq2SeqConfig,
    enc_out: jax.Array,  # (T', B, E)
    enc_final: tuple[jax.Array, jax.Array],
    enc_lengths: jax.Array,
    rng: jax.Array | None = None,
    temperature: float = 0.0,
) -> jax.Array:
    """Free-running decode from already-computed encoder state — the
    shared back half of :func:`greedy_decode`, exposed so streaming
    sessions (serve.StreamingConformerSession) can decode at endpoint
    from incrementally-built encoder outputs."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    decoder = params["decoder"]
    states = _decoder_init_state(params, config, enc_final)
    B = enc_out.shape[1]

    def step(carry, step_rng):
        states, token, finished = carry
        x = decoder["embedding"][token]  # (B, E)
        new_states = []
        out = x
        for layer, st in zip(decoder["rnn"], states):
            st_new, out = lstm_step(layer, st, out, None, config.compute_dtype)
            new_states.append(st_new)
        if config.use_attention:
            out = _attend(
                decoder["attn"], out, enc_out, enc_lengths,
                config.compute_dtype,
            )
        logits = _dense(decoder["out"], out, config.compute_dtype)  # (B, V)
        if temperature and temperature > 0:
            nxt = jax.random.categorical(step_rng, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        emitted = jnp.where(finished, config.pad_id, nxt)
        finished = finished | (nxt == config.eos_id)
        return (new_states, emitted, finished), emitted

    init_token = jnp.full((B,), config.pad_id, jnp.int32)
    finished0 = jnp.zeros((B,), bool)
    step_rngs = jax.random.split(rng, config.max_dec_len)
    _, tokens = jax.lax.scan(
        step, (states, init_token, finished0), step_rngs
    )
    return jnp.moveaxis(tokens, 0, 1)  # (B, L)
