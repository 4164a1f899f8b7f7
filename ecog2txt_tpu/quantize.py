"""Post-training int8 quantization for the gradient-free serving paths.

TPU v5e executes int8×int8→int32 on the MXU at ~1.57× the sustained
bf16 matmul throughput on this chip (measured: 232.5 TOP/s vs 148.0
TFLOP/s on 8192³ — RESULTS.md r3), so quantizing the conformer
encoder's GEMMs buys real decode/assessment throughput on top of the
bf16 path.  This is a SERVING-time transformation: training stays
bf16/f32; ``quantize_conformer_params`` rewrites a trained parameter
tree and the model dispatches per-leaf (``models.conformer._dot``).

Scheme (standard AQT-style dynamic quantization, no calibration data):

* weights: symmetric per-OUTPUT-channel int8 — ``scale[j] =
  max_i |w[i, j]| / 127``; stored once, offline.
* activations: symmetric per-TOKEN dynamic int8 — each (…, D) row is
  scaled by its own abs-max at run time.  Dynamic scales avoid any
  calibration pass and track the LayerNormed activations' range
  exactly; the reduce+round overhead is a few elementwise passes over
  an activation the following GEMM reads anyway.
* accumulation in int32; dequantize = int32 · (row_scale ⊗ col_scale),
  then cast to the stream dtype.  LayerNorm statistics, softmax, the
  attention core (q·k, attn·v) and the depthwise conv stay in the
  bf16/f32 path — they are bandwidth/VPU work, not MXU GEMMs, and
  keeping them exact bounds the end-to-end error.

The reference has no quantization story (TF1 f32 throughout); this is
a beyond-parity TPU feature (PARITY.md "Beyond the reference").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedWeight(NamedTuple):
    """Per-output-channel symmetric int8 weight.  A NamedTuple so it is
    a pytree (checkpointable, jit-transparent) while remaining
    ``isinstance``-dispatchable inside the model."""

    q: jax.Array  # (in_dim, out_dim) int8
    scale: jax.Array  # (out_dim,) f32


def quantize_weight(w: jax.Array) -> QuantizedWeight:
    """Symmetric per-output-channel int8 quantization of a (in, out)
    dense weight."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)  # (out,)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q=q, scale=scale)


def dequantize_weight(qw: QuantizedWeight) -> jax.Array:
    return qw.q.astype(jnp.float32) * qw.scale


def int8_dot(x: jax.Array, qw: QuantizedWeight, cd=jnp.float32) -> jax.Array:
    """``x @ w`` with dynamic per-token int8 activations against an
    int8 weight; returns the stream dtype ``cd``.

    ``x``: (..., in_dim).  Each leading-dim row gets its own symmetric
    scale, so LayerNormed rows with different magnitudes do not clip
    each other.  The MXU runs int8×int8→int32.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        qw.q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * qw.scale).astype(cd)


# conformer-block dense weights eligible for int8 (models/conformer.py
# GEMM sites); everything else (biases, layernorms, the depthwise conv
# taps) stays in the float path
_BLOCK_KEYS = {
    "ffn1": ("w1", "w2"),
    "ffn2": ("w1", "w2"),
    "attn": ("wqkv", "wo"),
    "conv": ("pw1", "pw2"),
}


def quantize_conformer_params(params: dict) -> dict:
    """Rewrite a trained conformer-encoder parameter tree (the
    ``params['encoder']['conformer']`` subtree, or that subtree itself)
    so every block GEMM weight becomes a :class:`QuantizedWeight`.
    The returned tree drops the float weights it replaces; the model
    dispatches on leaf type (``models.conformer._dot``)."""
    conf = params
    nested = "encoder" in params and isinstance(params["encoder"], dict) \
        and "conformer" in params["encoder"]
    if nested:
        conf = params["encoder"]["conformer"]

    new_conf = dict(conf)
    new_conf["in_proj"] = dict(conf["in_proj"])
    new_conf["in_proj"]["w"] = quantize_weight(conf["in_proj"]["w"])
    blocks = []
    for block in conf["blocks"]:
        nb = dict(block)
        for mod, keys in _BLOCK_KEYS.items():
            nm = dict(block[mod])
            for k in keys:
                w = block[mod].get(k)
                # 2-D dense kernels only: a MoE ffn2 carries
                # expert-STACKED (E, ·, ·) weights (models/moe.py),
                # which stay float (per-expert quantization is future
                # work; the MoE einsums are not plain dots)
                if w is not None and getattr(w, "ndim", 0) == 2:
                    nm[k] = quantize_weight(w)
            nb[mod] = nm
        blocks.append(nb)
    new_conf["blocks"] = blocks

    if not nested:
        return new_conf
    out = dict(params)
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["conformer"] = new_conf
    return out


def is_quantized(tree) -> bool:
    """True if any leaf subtree in ``tree`` is a QuantizedWeight."""
    return any(
        isinstance(leaf, QuantizedWeight)
        for leaf in jax.tree.leaves(
            tree, is_leaf=lambda x: isinstance(x, QuantizedWeight)
        )
    )
