"""Second training engine: PyTorch.

The reference ships TWO engines for the same model family — the TF2
graph built in ``trainers.py`` and a PyTorch ``SequenceTrainer``
reached through ``MultiSubjectTrainer.torch_learn`` (reference
trainers.py:278-301, importing ``machine_learning.neural_networks.
torch_sequence_networks``).  This module is the real counterpart: the
SAME architecture (conv subnet → biLSTM encoder → aux heads → LSTM
decoder, gate order (i, g, f, o), forget bias +1, fused input
reversal), implemented in torch, trained by :class:`SequenceTrainer`.

Design contract with the JAX engine:

* **One parameter pytree, two engines.**  :class:`TorchSequenceNetwork`
  holds the exact ``init_seq2seq`` pytree (same dict/list structure,
  same leaf shapes) as torch Parameters; ``from`` / ``to`` JAX
  conversion is a flat leaf copy, so weights can move between engines
  at ANY point (train here, assess there, checkpoint with Orbax — all
  tested).
* **Same math.**  Every forward function below mirrors its
  ``models/seq2seq.py`` twin line for line (teacher-forced logits
  agree to f32 tolerance; greedy decode emits identical tokens) —
  parity is tested in ``tests/test_torch_engine.py``.
* **f32 compute.**  ``config.compute_dtype`` (a TPU/MXU knob) is
  ignored here; torch runs fp32 on CPU (or CUDA when available, the
  reference's device pick, trainers.py:282).

Both encoder families are covered: the reversed-conv + biLSTM stack
AND the conformer (natural-order conv, rotary chunk-causal attention in
its dense parity form, macaron FFNs, causal depthwise conv module,
incl. the MoE second macaron FFN — both the no-drop and the grouped
capacity dispatch paths, with the same weighted router aux loss) —
cross-engine parity is tested for both.  The JAX engine remains the
TPU path; streaming/banded-kernel serving and expert PARALLELISM stay
JAX-only (torch runs the experts locally).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import numpy as np
import torch
import torch.nn.functional as F

from .assess import confusion_matrix, sequence_accuracy, wer_vector
from .models.seq2seq import Seq2SeqConfig, init_seq2seq
from .tokenizers import target_inds_to_sequences

_tree = jax.tree_util


def _to_torch(leaf) -> torch.Tensor:
    # copy: jnp→np views are read-only, and Parameters must own storage
    return torch.from_numpy(np.array(leaf))


# --------------------------------------------------------------------------
# the network: the init_seq2seq pytree as torch Parameters
# --------------------------------------------------------------------------


class TorchSequenceNetwork(torch.nn.Module):
    """The seq2seq net (SURVEY §2.8) as a torch module whose parameters
    ARE the JAX pytree's leaves (flattened in ``jax.tree_util`` order,
    which is deterministic)."""

    def __init__(
        self,
        config: Seq2SeqConfig,
        params: Any = None,
        seed: int = 0,
    ):
        super().__init__()
        self.config = config
        if params is None:
            params = init_seq2seq(jax.random.PRNGKey(seed), config)
        leaves, treedef = _tree.tree_flatten(params)
        self._treedef = treedef
        self.leaves = torch.nn.ParameterList(
            torch.nn.Parameter(_to_torch(leaf).float()) for leaf in leaves
        )

    # -- pytree interop ----------------------------------------------------

    @property
    def params(self) -> Any:
        """The parameter pytree with torch-tensor leaves (shares storage
        with the module's Parameters — gradients flow)."""
        return _tree.tree_unflatten(self._treedef, list(self.leaves))

    def load_jax_params(self, params: Any) -> None:
        leaves, treedef = _tree.tree_flatten(params)
        if treedef != self._treedef:
            raise ValueError("parameter pytree structure mismatch")
        with torch.no_grad():
            for p, leaf in zip(self.leaves, leaves):
                p.copy_(_to_torch(leaf).float())

    def export_jax_params(self) -> Any:
        """Back to a JAX pytree (fp32 jnp leaves)."""
        import jax.numpy as jnp

        leaves = [
            jnp.asarray(p.detach().cpu().numpy()) for p in self.leaves
        ]
        return _tree.tree_unflatten(self._treedef, leaves)

    def export_tree(self, leaves: Sequence[torch.Tensor]) -> Any:
        """Arbitrary leaf list (e.g. an EMA copy) → JAX pytree."""
        import jax.numpy as jnp

        return _tree.tree_unflatten(
            self._treedef,
            [jnp.asarray(t.detach().cpu().numpy()) for t in leaves],
        )


# --------------------------------------------------------------------------
# functional forward — mirrors models/seq2seq.py
# --------------------------------------------------------------------------


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _select_subject(stacked, subject_idx: int):
    return jax.tree.map(lambda a: a[subject_idx], stacked)


def _ff_dropout(x, rate, train, gen):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    # sample on CPU (the generator's device) then move — keeps training
    # runs reproducible across CPU/CUDA placements
    mask = torch.bernoulli(torch.full(x.shape, keep), generator=gen)
    return x * mask.to(x.device) / keep


def _variational_mask(shape, rate, device, gen):
    keep = 1.0 - rate
    return (
        torch.bernoulli(torch.full(shape, keep), generator=gen).to(device)
        / keep
    )


def reverse_padded(xs: torch.Tensor, lengths: torch.Tensor) -> torch.Tensor:
    """Valid-prefix reversal, time-major — twin of
    ``ops/lstm.py::reverse_padded``."""
    T = xs.shape[0]
    t = torch.arange(T, device=xs.device)[:, None]
    lens = lengths[None, :]
    src = torch.where(t < lens, lens - 1 - t, t)  # (T, B)
    src = src.reshape(src.shape + (1,) * (xs.ndim - 2)).expand(
        -1, -1, *xs.shape[2:]
    )
    return torch.gather(xs, 0, src)


def lstm_scan(
    p: dict,
    xs: torch.Tensor,  # (T, B, F)
    lengths: torch.Tensor | None = None,
    initial_state: tuple | None = None,
    h_dropout_mask: torch.Tensor | None = None,
):
    """Twin of ``ops/lstm.py::lstm_scan``: hoisted input GEMM, serial
    recurrence, carry frozen and outputs zeroed past each length."""
    T, B, _ = xs.shape
    H = p["wh"].shape[0]
    xw = xs @ p["wx"] + p["b"]  # (T, B, 4H)
    if initial_state is None:
        h = xs.new_zeros(B, H)
        c = xs.new_zeros(B, H)
    else:
        h, c = initial_state
    outs = []
    zeros = xs.new_zeros(B, H)
    for t in range(T):
        h_in = h if h_dropout_mask is None else h * h_dropout_mask
        gates = xw[t] + h_in @ p["wh"]
        i, g, f, o = gates.chunk(4, dim=-1)
        c_new = torch.sigmoid(f + 1.0) * c + torch.sigmoid(i) * torch.tanh(g)
        h_new = torch.sigmoid(o) * torch.tanh(c_new)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            h = torch.where(valid, h_new, h)
            c = torch.where(valid, c_new, c)
            outs.append(torch.where(valid, h, zeros))
        else:
            h, c = h_new, c_new
            outs.append(h)
    return torch.stack(outs), (h, c)


def lstm_step(p: dict, carry: tuple, x: torch.Tensor):
    h, c = carry
    gates = x @ p["wx"] + p["b"] + h @ p["wh"]
    i, g, f, o = gates.chunk(4, dim=-1)
    c_new = torch.sigmoid(f + 1.0) * c + torch.sigmoid(i) * torch.tanh(g)
    h_new = torch.sigmoid(o) * torch.tanh(c_new)
    return (h_new, c_new), h_new


def bidirectional_lstm(p_fwd, p_bwd, xs, lengths, masks=None):
    mask_f, mask_b = masks if masks else (None, None)
    out_f, (h_f, c_f) = lstm_scan(p_fwd, xs, lengths, None, mask_f)
    xs_rev = reverse_padded(xs, lengths)
    out_b_rev, (h_b, c_b) = lstm_scan(p_bwd, xs_rev, lengths, None, mask_b)
    out_b = reverse_padded(out_b_rev, lengths)
    return torch.cat([out_f, out_b], dim=-1), (
        torch.cat([h_f, h_b], dim=-1),
        torch.cat([c_f, c_b], dim=-1),
    )


def convolve_sequences(
    params: dict,
    config: Seq2SeqConfig,
    xs: torch.Tensor,  # (T, B, C)
    subject_idx: int,
    train: bool,
    gen,
    reverse_lengths: torch.Tensor | None = None,
) -> torch.Tensor:
    """Twin of ``models/seq2seq.py::convolve_sequences`` including the
    FUSED input reversal (flipped weight rows on layer 0 + decimated-
    rate output reversal) so boundary steps match the JAX engine
    exactly even when lengths are not stride multiples."""
    for i, (layer, stride) in enumerate(
        zip(params["subnet"]["conv"], config.conv_strides)
    ):
        w = _select_subject(layer, subject_idx)
        T, B, C = xs.shape
        F_out = w["w"].shape[-1]
        wg = w["w"].reshape(stride, C, F_out)
        if reverse_lengths is not None and i == 0:
            wg = torch.flip(wg, dims=(0,))
        T_out = T // stride
        xs_g = xs[: T_out * stride].reshape(T_out, stride, B, C)
        out = torch.einsum("tsbc,scf->tbf", xs_g, wg)
        xs = torch.relu(out + w["b"])
        if reverse_lengths is not None and i == 0:
            lens0 = torch.clamp(
                torch.div(
                    reverse_lengths + stride - 1, stride,
                    rounding_mode="floor",
                ),
                max=T_out,
            )
            xs = reverse_padded(xs, lens0)
        xs = _ff_dropout(xs, config.FF_dropout, train, gen)
    return xs


def _conformer_layernorm(p, x, eps=1e-6):
    mu = x.mean(dim=-1, keepdim=True)
    var = ((x - mu) ** 2).mean(dim=-1, keepdim=True)
    return (x - mu) * torch.rsqrt(var + eps) * p["g"] + p["b"]


def _conformer_ffn(p, x):
    h = F.silu(_conformer_layernorm(p["ln"], x) @ p["w1"] + p["b1"])
    return h @ p["w2"] + p["b2"]


def _conformer_rotary(x, positions):
    """Twin of models/conformer._rotary: x (B, T, H, Dh)."""
    Dh = x.shape[-1]
    half = Dh // 2
    freq = 10000.0 ** (
        -torch.arange(half, device=x.device, dtype=torch.float32) / half
    )
    ang = positions.to(torch.float32)[:, None] * freq[None, :]
    cos = torch.cos(ang)[None, :, None, :]
    sin = torch.sin(ang)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)


def _conformer_attention(p, x, ccfg, lengths, positions):
    """Dense-form chunk-causal attention (the JAX parity oracle path —
    offline torch training has no O(T·window) pressure at these T')."""
    B, T, D = x.shape
    H = ccfg.num_heads
    Dh = D // H
    xn = _conformer_layernorm(p["ln"], x)
    qkv = (xn @ p["wqkv"]).reshape(B, T, 3, H, Dh)
    q = _conformer_rotary(qkv[:, :, 0], positions)
    k = _conformer_rotary(qkv[:, :, 1], positions)
    v = qkv[:, :, 2]
    logits = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(Dh)
    C, L = ccfg.chunk_size, ccfg.left_context
    qc = torch.div(positions[:, None], C, rounding_mode="floor")
    kc = torch.div(positions[None, :], C, rounding_mode="floor")
    mask = (kc <= qc) & (kc >= qc - L) & (positions[None, :] >= 0)
    if lengths is not None:
        mask = mask[None] & (
            positions[None, None, :] < lengths[:, None, None]
        )
        mask = mask[:, None]
    else:
        mask = mask[None, None]
    logits = torch.where(mask, logits, logits.new_tensor(-1e9))
    attn = torch.softmax(logits, dim=-1)
    out = torch.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
    return out @ p["wo"]


def _conformer_conv(p, x):
    """Depthwise-causal conv module (pointwise → GLU → depthwise →
    swish → pointwise), zero left-pad as in the offline JAX encode."""
    B, T, D = x.shape
    K = p["dw"].shape[0]
    xn = _conformer_layernorm(p["ln"], x)
    h = F.glu(xn @ p["pw1"], dim=-1)  # (B, T, D)
    hp = torch.cat([h.new_zeros(B, K - 1, D), h], dim=1)
    out = torch.zeros_like(h)
    for k in range(K):
        out = out + hp[:, k : k + T] * p["dw"][k]
    return F.silu(out) @ p["pw2"]


def _moe_route(p, xn, k):
    """Twin of models/moe.py::_route (f32 router)."""
    logits = xn @ p["wg"]  # (B, T, E)
    probs = torch.softmax(logits, dim=-1)
    gate_vals, gate_idx = torch.topk(probs, k, dim=-1)
    gates = gate_vals / torch.clamp(
        gate_vals.sum(dim=-1, keepdim=True), min=1e-9
    )
    return logits, probs, gates, gate_idx


def _moe_aux(ccfg, logits, probs, gate_idx, valid):
    """Twin of models/moe.py::router_stats + aux_from_stats (single
    device — no shard merge needed here)."""
    E = probs.shape[-1]
    validf = valid.float()
    n = torch.clamp(validf.sum(), min=1.0)
    assign = F.one_hot(gate_idx, E).float() * validf[..., None, None]
    f = assign.sum(dim=(0, 1, 2)) / (n * gate_idx.shape[-1])
    pmean = (probs * validf[..., None]).sum(dim=(0, 1)) / n
    balance = E * (f * pmean).sum()
    z = (torch.logsumexp(logits, dim=-1) ** 2 * validf).sum() / n
    return ccfg.moe_aux_weight * balance + ccfg.moe_zloss_weight * z


def _moe_combine_weights(gates, gate_idx, E, valid):
    w = (F.one_hot(gate_idx, E).float() * gates[..., None]).sum(dim=-2)
    return w * valid[..., None].float()


def _moe_nodrop(p, xn, ccfg, valid):
    _, probs, gates, gate_idx = _moe_route(p, xn, ccfg.moe_topk)
    E = probs.shape[-1]
    h = F.silu(
        torch.einsum("btd,edf->btef", xn, p["w1"]) + p["b1"]
    )
    y = torch.einsum("btef,efd->bted", h, p["w2"]) + p["b2"]
    w = _moe_combine_weights(gates, gate_idx, E, valid)
    return torch.einsum("bte,bted->btd", w, y)


def _moe_capacity(p, xn, ccfg, valid):
    """Twin of models/moe.py::_moe_capacity — grouped GShard dispatch
    with the identical (choice rank, time order) priority, so the same
    keep/drop set as the JAX engine."""
    B, T, D = xn.shape
    seg = int(ccfg.moe_group_size or 0)
    if seg:
        pad = (-T) % seg
        if pad:
            xn = F.pad(xn, (0, 0, 0, pad))
            valid = F.pad(valid, (0, pad))
        G = (T + pad) // seg
        out = _moe_capacity_grouped(
            p, xn.reshape(B * G, seg, D), ccfg,
            valid.reshape(B * G, seg),
        )
        return out.reshape(B, G * seg, D)[:, :T]
    return _moe_capacity_grouped(p, xn, ccfg, valid)


def _moe_capacity_grouped(p, xn, ccfg, valid):
    G, S, D = xn.shape
    E = ccfg.moe_experts
    k = ccfg.moe_topk
    C = max(int(math.ceil(k * S / E * ccfg.moe_capacity_factor)), 1)
    _, probs, gates, gate_idx = _moe_route(p, xn, k)
    validf = valid.float()
    dispatch = xn.new_zeros((G, S, E, C))
    combine = xn.new_zeros((G, S, E, C))
    base = xn.new_zeros((G, E))
    for j in range(k):
        oh = F.one_hot(gate_idx[..., j], E).float() * validf[..., None]
        pos = torch.cumsum(oh, dim=1) - oh + base[:, None, :]
        keep = oh * (pos < C).float()
        slot = F.one_hot(
            torch.clamp(pos, max=C - 1).long(), C
        ).float()  # (G, S, E, C)
        dispatch = dispatch + keep[..., None] * slot
        combine = combine + (keep * gates[..., j : j + 1])[..., None] * slot
        base = base + keep.sum(dim=1)
    ein = torch.einsum("gsec,gsd->gecd", dispatch, xn)
    h = F.silu(
        torch.einsum("gecd,edf->gecf", ein, p["w1"])
        + p["b1"][None, :, None, :]
    )
    y = torch.einsum(
        "gecf,efd->gecd", h, p["w2"]
    ) + p["b2"][None, :, None, :]
    return torch.einsum("gsec,gecd->gsd", combine, y)


def _moe_ffn(p, x, ccfg, lengths, positions):
    """MoE second macaron FFN (twin of the apply_block MoE branch).
    Returns (out, weighted aux)."""
    B, T = x.shape[0], x.shape[1]
    tok_valid = (positions >= 0).expand(B, T)
    if lengths is not None:
        tok_valid = tok_valid & (
            positions[None, :] < lengths[:, None]
        )
    xn = _conformer_layernorm(p["ln"], x)
    if ccfg.moe_capacity_factor > 0:
        out = _moe_capacity(p, xn, ccfg, tok_valid)
    else:
        out = _moe_nodrop(p, xn, ccfg, tok_valid)
    logits, probs, _, gate_idx = _moe_route(p, xn, ccfg.moe_topk)
    return out, _moe_aux(ccfg, logits, probs, gate_idx, tok_valid)


def conformer_encode(params, ccfg, xs_bm, lengths):
    """Twin of ``models/conformer.py::conformer_encode`` (offline
    training path: no carry, no mask_invalid).  Returns (x, moe_aux) —
    aux is 0 for the dense family."""
    x = xs_bm @ params["in_proj"]["w"] + params["in_proj"]["b"]
    positions = torch.arange(x.shape[1], device=x.device)
    aux_total = x.new_zeros(())
    for block in params["blocks"]:
        x = x + 0.5 * _conformer_ffn(block["ffn1"], x)
        x = x + _conformer_attention(
            block["attn"], x, ccfg, lengths, positions
        )
        x = x + _conformer_conv(block["conv"], x)
        if ccfg.moe_experts:
            moe_out, aux = _moe_ffn(
                block["ffn2"], x, ccfg, lengths, positions
            )
            x = x + 0.5 * moe_out
            aux_total = aux_total + aux
        else:
            x = x + 0.5 * _conformer_ffn(block["ffn2"], x)
        x = _conformer_layernorm(block["ln_out"], x)
    return x, aux_total / max(len(params["blocks"]), 1)


def encode(
    params: dict,
    config: Seq2SeqConfig,
    inputs: torch.Tensor,  # (B, T, C)
    lengths: torch.Tensor,  # (B,)
    subject_idx: int,
    train: bool = False,
    gen=None,
    return_aux: bool = False,
):
    """Twin of ``models/seq2seq.py::encode`` (both encoder families:
    reversed conv + biLSTM stack, or natural-order conv + conformer —
    dense or MoE — with the masked-mean decoder bridge).
    ``return_aux=True`` appends the MoE router aux loss (0 for every
    non-MoE configuration)."""
    xs = inputs.movedim(0, 1)  # (T, B, C)
    reverse = config.encoder_type != "conformer"
    if config.conv_sizes:
        xs = convolve_sequences(
            params, config, xs, subject_idx, train, gen,
            reverse_lengths=lengths if reverse else None,
        )
    else:
        if reverse:
            xs = reverse_padded(xs, lengths)
        d0 = config.decimation_factor
        xs = xs[: (xs.shape[0] // d0) * d0 : d0]
    d = config.decimation_factor
    enc_lengths = torch.clamp(
        torch.div(lengths + d - 1, d, rounding_mode="floor"),
        max=xs.shape[0],
    )

    if config.encoder_type == "conformer":
        from .models.conformer import ConformerConfig

        ccfg = config.conformer or ConformerConfig()
        xs_bm = xs.movedim(0, 1)  # (B, T', F)
        out_bm, moe_aux = conformer_encode(
            params["encoder"]["conformer"], ccfg, xs_bm, enc_lengths
        )
        T_out = out_bm.shape[1]
        step_mask = (
            torch.arange(T_out, device=out_bm.device)[None, :]
            < enc_lengths[:, None]
        )[..., None].to(out_bm.dtype)
        denom = torch.clamp(
            enc_lengths[:, None].to(out_bm.dtype), min=1
        )
        pooled = (out_bm * step_mask).sum(dim=1) / denom
        out = (out_bm * step_mask).movedim(0, 1)  # (T', B, D) masked
        if return_aux:
            return out, (pooled, pooled), enc_lengths, moe_aux
        return out, (pooled, pooled), enc_lengths

    out = xs
    final_h = final_c = None
    layers = params["encoder"]["rnn"]
    for i, layer in enumerate(layers):
        if config.BIDIRECTIONAL:
            masks = None
            if train and config.RNN_dropout > 0:
                B = out.shape[1]
                H = layer["fwd"]["wh"].shape[0]
                masks = (
                    _variational_mask(
                        (B, H), config.RNN_dropout, out.device, gen
                    ),
                    _variational_mask(
                        (B, H), config.RNN_dropout, out.device, gen
                    ),
                )
            out, (final_h, final_c) = bidirectional_lstm(
                layer["fwd"], layer["bwd"], out, enc_lengths, masks
            )
        else:
            mask = None
            if train and config.RNN_dropout > 0:
                B = out.shape[1]
                H = layer["fwd"]["wh"].shape[0]
                mask = _variational_mask(
                    (B, H), config.RNN_dropout, out.device, gen
                )
            out, (final_h, final_c) = lstm_scan(
                layer["fwd"], out, enc_lengths, None, mask
            )
        if i < len(layers) - 1:
            out = _ff_dropout(out, config.FF_dropout, train, gen)
    if return_aux:
        return out, (final_h, final_c), enc_lengths, out.new_zeros(())
    return out, (final_h, final_c), enc_lengths


def _decoder_init_state(params, config, enc_final):
    h, c = enc_final
    decoder = params["decoder"]
    if "bridge_h" in decoder:
        h = torch.tanh(_dense(decoder["bridge_h"], h))
        c = torch.tanh(_dense(decoder["bridge_c"], c))
    states = [(h, c)]
    B = h.shape[0]
    for size_params in decoder["rnn"][1:]:
        H = size_params["wh"].shape[0]
        states.append((h.new_zeros(B, H), h.new_zeros(B, H)))
    return states


def _attend(attn_params, h_dec, enc_out, enc_lengths):
    query = _dense(attn_params["wa"], h_dec)  # (..., B, E)
    scores = torch.einsum("...be,tbe->...bt", query, enc_out)
    valid = (
        torch.arange(enc_out.shape[0], device=enc_out.device)[None, :]
        < enc_lengths[:, None]
    )  # (B, T')
    scores = torch.where(valid, scores, scores.new_tensor(-1e9))
    weights = torch.softmax(scores, dim=-1)
    context = torch.einsum("...bt,tbe->...be", weights, enc_out)
    combined = torch.cat([h_dec, context], dim=-1)
    return torch.tanh(_dense(attn_params["wc"], combined))


def decoder_teacher_forcing(
    params: dict,
    config: Seq2SeqConfig,
    enc_final: tuple,
    targets: torch.Tensor,  # (B, L) int64
    train: bool = False,
    gen=None,
    enc_out: torch.Tensor | None = None,
    enc_lengths: torch.Tensor | None = None,
) -> torch.Tensor:
    decoder = params["decoder"]
    B, L = targets.shape
    shifted = torch.cat(
        [
            torch.full(
                (B, 1), config.pad_id, dtype=targets.dtype,
                device=targets.device,
            ),
            targets[:, :-1],
        ],
        dim=1,
    )
    emb = decoder["embedding"][shifted]  # (B, L, E)
    out = emb.movedim(0, 1)  # (L, B, E)
    states = _decoder_init_state(params, config, enc_final)
    for li, layer in enumerate(decoder["rnn"]):
        mask = None
        if train and config.RNN_dropout > 0:
            H = layer["wh"].shape[0]
            mask = _variational_mask(
                (B, H), config.RNN_dropout, out.device, gen
            )
        out, _ = lstm_scan(layer, out, None, states[li], mask)
        if li < len(decoder["rnn"]) - 1:
            out = _ff_dropout(out, config.FF_dropout, train, gen)
    if config.use_attention:
        out = _attend(decoder["attn"], out, enc_out, enc_lengths)
    return _dense(decoder["out"], out)  # (L, B, V)


def _decimate_targets(ts, lengths, stride, T_out, reverse=True):
    if reverse:
        ts = reverse_padded(ts, lengths)
    return ts[: T_out * stride : stride]


def seq2seq_loss(
    params: dict,
    config: Seq2SeqConfig,
    batch: dict[str, torch.Tensor],
    train: bool = True,
    penalty_scales: dict[str, float] | None = None,
    gen=None,
):
    """Twin of ``models/seq2seq.py::seq2seq_loss`` — same masking, same
    normalizations (CTC: summed per-sequence NLL / total label tokens,
    matching optax.ctc_loss + models/ctc.py)."""
    penalty_scales = penalty_scales or {}
    subject_idx = int(batch["subject_idx"])
    enc_out, enc_final, enc_lengths, moe_aux = encode(
        params, config, batch["encoder_inputs"],
        batch["encoder_lengths"], subject_idx, train, gen,
        return_aux=True,
    )
    T_out = enc_out.shape[0]
    step_mask = (
        torch.arange(T_out, device=enc_out.device)[:, None]
        < enc_lengths[None, :]
    ).float()  # (T', B)

    metrics: dict[str, float] = {}
    total = enc_out.new_zeros(())
    if config.encoder_type == "conformer" and (
        config.conformer is not None and config.conformer.moe_experts
    ):
        # already weighted inside _moe_ffn (twin of the JAX engine)
        total = total + moe_aux
        metrics["moe_aux"] = float(moe_aux.detach())

    for head in config.aux_heads:
        head_params = params["aux"][head.name]
        h = enc_out
        for mlp in head_params["mlp"]:
            h = torch.relu(_dense(mlp, h))
        pred = _dense(head_params["out"], h)  # (T', B, K)
        raw = batch[head.name]
        scale = penalty_scales.get(head.name, 1.0)
        if head.distribution == "CTC":
            logp = F.log_softmax(pred, dim=-1)  # (T', B, K+1)
            labels = batch[head.name].long()  # (B, Lc)
            label_lengths = batch[f"{head.name}_lengths"].long()
            per_seq = F.ctc_loss(
                logp, labels, enc_lengths.long(), label_lengths,
                blank=pred.shape[-1] - 1, reduction="none",
                zero_infinity=True,
            )
            loss = per_seq.sum() / torch.clamp(
                label_lengths.sum(), min=1
            )
        elif head.distribution == "categorical":
            ts = raw.movedim(0, 1).long()  # (T, B)
            aligned = _decimate_targets(
                ts, batch["encoder_lengths"], config.decimation_factor,
                T_out, reverse=config.encoder_type != "conformer",
            )
            logp = F.log_softmax(pred, dim=-1)
            nll = -torch.gather(logp, -1, aligned[..., None])[..., 0]
            loss = (nll * step_mask).sum() / torch.clamp(
                step_mask.sum(), min=1
            )
        elif head.distribution == "Gaussian":
            ts = raw.movedim(0, 1)  # (T, B, F)
            aligned = _decimate_targets(
                ts, batch["encoder_lengths"], config.decimation_factor,
                T_out, reverse=config.encoder_type != "conformer",
            )
            se = ((pred - aligned) ** 2).sum(dim=-1)
            loss = (se * step_mask).sum() / torch.clamp(
                step_mask.sum(), min=1
            )
        elif head.distribution == "Rayleigh":
            # log-σ head, NLL = 2 log σ + x²/(2σ²) − log x — mirrors
            # models/seq2seq.py exactly (engine-parity contract)
            ts = raw.movedim(0, 1)  # (T, B, F)
            aligned = _decimate_targets(
                ts, batch["encoder_lengths"], config.decimation_factor,
                T_out, reverse=config.encoder_type != "conformer",
            )
            x = torch.clamp(aligned, min=1e-6)
            nll = (
                2.0 * pred
                + 0.5 * x.square() * torch.exp(-2.0 * pred)
                - torch.log(x)
            ).sum(dim=-1)
            loss = (nll * step_mask).sum() / torch.clamp(
                step_mask.sum(), min=1
            )
        else:
            raise ValueError(
                f"aux head {head.name!r}: unknown distribution "
                f"{head.distribution!r} (expected 'categorical', 'CTC', "
                "'Gaussian', or 'Rayleigh')"
            )
        metrics[f"loss_{head.name}"] = float(loss.detach())
        total = total + scale * loss

    targets = batch["decoder_targets"].long()  # (B, L)
    logits = decoder_teacher_forcing(
        params, config, enc_final, targets, train, gen,
        enc_out=enc_out, enc_lengths=enc_lengths,
    )  # (L, B, V)
    L = targets.shape[1]
    dec_mask = (
        torch.arange(L, device=logits.device)[:, None]
        < batch["decoder_lengths"][None, :]
    ).float()  # (L, B)
    t_lb = targets.movedim(0, 1)  # (L, B)
    logp = F.log_softmax(logits, dim=-1)
    nll = -torch.gather(logp, -1, t_lb[..., None])[..., 0]
    dec_loss = (nll * dec_mask).sum() / torch.clamp(dec_mask.sum(), min=1)
    total = total + penalty_scales.get("decoder_targets", 1.0) * dec_loss
    metrics["loss_decoder"] = float(dec_loss.detach())

    pred_ids = logits.argmax(dim=-1)
    correct = (pred_ids == t_lb).float() * dec_mask
    metrics["token_accuracy"] = float(
        correct.sum() / torch.clamp(dec_mask.sum(), min=1)
    )
    metrics["loss_total"] = float(total.detach())
    return total, metrics


@torch.no_grad()
def greedy_decode(
    params: dict,
    config: Seq2SeqConfig,
    inputs: torch.Tensor,  # (B, T, C)
    lengths: torch.Tensor,
    subject_idx: int,
    temperature: float | None = None,
    gen=None,
) -> torch.Tensor:
    """Twin of ``models/seq2seq.py::greedy_decode`` (argmax at
    temperature 0/None; finished rows emit pad)."""
    if temperature is None:
        temperature = config.temperature
    enc_out, enc_final, enc_lengths = encode(
        params, config, inputs, lengths, subject_idx, train=False
    )
    decoder = params["decoder"]
    states = _decoder_init_state(params, config, enc_final)
    B = enc_out.shape[1]
    token = torch.full(
        (B,), config.pad_id, dtype=torch.long, device=enc_out.device
    )
    finished = torch.zeros(B, dtype=torch.bool, device=enc_out.device)
    emitted = []
    for _ in range(config.max_dec_len):
        x = decoder["embedding"][token]
        new_states = []
        out = x
        for layer, st in zip(decoder["rnn"], states):
            st_new, out = lstm_step(layer, st, out)
            new_states.append(st_new)
        states = new_states
        if config.use_attention:
            out = _attend(decoder["attn"], out, enc_out, enc_lengths)
        logits = _dense(decoder["out"], out)  # (B, V)
        if temperature and temperature > 0:
            probs = torch.softmax(logits / temperature, dim=-1)
            nxt = torch.multinomial(probs.cpu(), 1, generator=gen)[
                :, 0
            ].to(logits.device)
        else:
            nxt = logits.argmax(dim=-1)
        emit = torch.where(
            finished, torch.full_like(nxt, config.pad_id), nxt
        )
        finished = finished | (nxt == config.eos_id)
        token = emit
        emitted.append(emit)
    return torch.stack(emitted, dim=1)  # (B, L)


# --------------------------------------------------------------------------
# the trainer — reference machine_learning SequenceTrainer counterpart
# --------------------------------------------------------------------------


class SequenceTrainer:
    """Torch training loop over the packed corpus — counterpart of the
    reference's ``torch_sequence_networks.SequenceTrainer`` (reached
    via trainers.py:286-301): Adam + global-norm clip 10, EMA-assessed
    greedy decode every ``assessment_epoch_interval`` epochs, the same
    minibatch schedule as the JAX engine (``pipeline.make_schedule``).
    """

    def __init__(
        self,
        config: Seq2SeqConfig,
        datasets: dict[str, Any],  # partition → PackedDataset
        dec_list: Sequence[str],
        penalty_scales: dict[str, float] | None = None,
        batch_size: int = 128,
        learning_rate: float = 1e-3,
        ema_decay: float = 0.99,
        assessment_epoch_interval: int = 10,
        temperature: float = 0.0,
        seed: int = 0,
        REPORT_TRAINING_LOSS: bool = True,
    ):
        self.config = config
        self.datasets = datasets
        self.dec_list = list(dec_list)
        self.penalty_scales = dict(penalty_scales or {})
        self.batch_size = int(batch_size)
        self.learning_rate = float(learning_rate)
        self.ema_decay = float(ema_decay)
        self.assessment_epoch_interval = int(assessment_epoch_interval)
        self.temperature = float(temperature)
        self.seed = int(seed)
        self.REPORT_TRAINING_LOSS = REPORT_TRAINING_LOSS
        self.ema_leaves: list[torch.Tensor] | None = None

    # -- data --------------------------------------------------------------

    def _device_data(self, partition: str, device) -> dict:
        key = (partition, str(device))
        cache = getattr(self, "_data_cache", None)
        if cache is None:
            cache = self._data_cache = {}
        if key not in cache:
            ds = self.datasets[partition]
            cache[key] = {
                k: torch.as_tensor(v).to(device)
                for k, v in ds.batch_dict().items()
            }
        return cache[key]

    # -- training ----------------------------------------------------------

    def train_and_assess(
        self, N_epochs: int, net: TorchSequenceNetwork, device="cpu"
    ) -> dict[str, dict]:
        """Train ``net`` for ``N_epochs``; returns the same assessments
        history dict as ``MultiSubjectTrainer.fit`` (epoch → partition →
        WER/accuracy/confusions/references/hypotheses)."""
        net = net.to(device)
        opt = torch.optim.Adam(net.parameters(), lr=self.learning_rate)
        gen = torch.Generator(device="cpu").manual_seed(self.seed)
        self.ema_leaves = [
            p.detach().clone() for p in net.leaves
        ]
        train_ds = self.datasets["training"]
        data = self._device_data("training", device)
        rng_np = np.random.default_rng(self.seed)
        from .pipeline import make_schedule

        history: dict[str, dict] = {}
        done = 0
        while done < N_epochs:
            segment = min(
                self.assessment_epoch_interval, N_epochs - done
            )
            subjects, indices = make_schedule(
                train_ds, self.batch_size, segment, rng_np
            )
            seg_metrics: list[dict] = []
            for s, idx in zip(subjects, indices):
                batch = {
                    k: v[int(s)][torch.as_tensor(idx, device=device)]
                    for k, v in data.items()
                }
                batch["subject_idx"] = int(s)
                loss, metrics = seq2seq_loss(
                    net.params, self.config, batch, train=True,
                    penalty_scales=self.penalty_scales, gen=gen,
                )
                opt.zero_grad(set_to_none=True)
                loss.backward()
                torch.nn.utils.clip_grad_norm_(net.parameters(), 10.0)
                opt.step()
                with torch.no_grad():
                    for e, p in zip(self.ema_leaves, net.leaves):
                        e.mul_(self.ema_decay).add_(
                            p, alpha=1.0 - self.ema_decay
                        )
                seg_metrics.append(metrics)
            done += segment
            snapshot = self.assess(net, device=device)
            history[str(done)] = snapshot
            if self.REPORT_TRAINING_LOSS:
                mean_loss = float(
                    np.mean([m["loss_total"] for m in seg_metrics])
                )
                print(
                    f"[torch] epoch {done}: loss {mean_loss:.4f} "
                    "train WER "
                    f"{snapshot['training']['word_error_rate']:.3f} "
                    "val WER "
                    f"{snapshot['validation']['word_error_rate']:.3f}"
                )
        return history

    # -- assessment --------------------------------------------------------

    def _ema_params(self, net: TorchSequenceNetwork):
        if self.ema_leaves is None:
            return net.params
        return _tree.tree_unflatten(net._treedef, list(self.ema_leaves))

    def assess(
        self,
        net: TorchSequenceNetwork,
        partitions: Sequence[str] = ("training", "validation"),
        use_ema: bool = True,
        device="cpu",
    ) -> dict[str, dict]:
        """Greedy-decode each partition with the (EMA) weights — same
        scoring as ``MultiSubjectTrainer.assess``."""
        params = self._ema_params(net) if use_ema else net.params
        out: dict[str, dict] = {}
        gen = torch.Generator(device="cpu").manual_seed(self.seed)
        for partition in partitions:
            ds = self.datasets[partition]
            data = self._device_data(partition, device)
            all_refs, all_hyps = [], []
            true_ids, pred_ids = [], []
            for s in range(ds.num_subjects):
                n = int(ds.num_trials[s])
                if n == 0:
                    continue
                tokens = greedy_decode(
                    params, self.config,
                    data["encoder_inputs"][s][:n],
                    data["encoder_lengths"][s][:n],
                    s, temperature=self.temperature, gen=gen,
                ).cpu().numpy()
                hyps = target_inds_to_sequences(tokens, self.dec_list)
                refs = target_inds_to_sequences(
                    ds.decoder_targets[s][:n], self.dec_list
                )
                all_refs += refs
                all_hyps += hyps
                L = min(tokens.shape[1], ds.decoder_targets.shape[2])
                true_ids.append(ds.decoder_targets[s][:n, :L])
                pred_ids.append(tokens[:, :L])
            wers = wer_vector(all_refs, all_hyps)
            out[partition] = {
                "word_error_rate": (
                    float(np.mean(wers)) if len(wers) else 1.0
                ),
                "word_error_rates": wers,
                "accuracy": sequence_accuracy(all_refs, all_hyps),
                "decoder_confusions": confusion_matrix(
                    np.concatenate(true_ids)
                    if true_ids
                    else np.zeros((0, 1)),
                    np.concatenate(pred_ids)
                    if pred_ids
                    else np.zeros((0, 1)),
                    len(self.dec_list),
                ),
                "references": all_refs,
                "hypotheses": all_hyps,
            }
        return out
