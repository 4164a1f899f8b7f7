"""Checkpoint introspection: hyperparameters from tensor shapes.

The reference stores NO hyperparameter metadata — it reconstructs the
entire architecture by parsing checkpoint variable names/shapes
(``recover_model_sizes``, reference trainers.py:444-554: LSTM kernels
pack 4 matrices → size//4, projections transposed, conv kernels give
strides).  Our Orbax checkpoints carry explicit metadata, so this is a
**migration/debug tool** (SURVEY §5 checkpoint notes): given only the
raw arrays, recover the ``layer_sizes`` block and model dimensions.
"""

from __future__ import annotations

import os
from typing import Any


def _shape_tree(params: Any) -> dict:
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[key] = tuple(leaf.shape)
    return out


def recover_model_sizes(
    source: Any, in_channels: int | None = None
) -> dict:
    """Architecture description from a params pytree or an Orbax
    checkpoint directory.

    Returns a dict mirroring the manifest ``layer_sizes`` block plus
    inferred dimensions: num_subjects, conv strides (needs
    ``in_channels``), encoder/decoder LSTM sizes (recovered from the
    packed 4H gate kernels, like the reference's //4 rule), vocab size,
    aux head dims.
    """
    if isinstance(source, str):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(source))
        params = restored.get("params", restored)
    else:
        params = source
    shapes = _shape_tree(params)

    out: dict[str, Any] = {"layer_sizes": {}}
    conv_sizes, conv_strides = [], []
    in_dim = in_channels
    i = 0
    while f"subnet/conv/{i}/w" in shapes:
        s, rows, size = shapes[f"subnet/conv/{i}/w"]
        out["num_subjects"] = s
        conv_sizes.append(size)
        if in_dim is not None:
            conv_strides.append(rows // in_dim)
        in_dim = size
        i += 1
    out["layer_sizes"]["encoder_embedding"] = conv_sizes
    if conv_strides:
        out["conv_strides"] = conv_strides
        out["decimation_factor"] = int(
            __import__("numpy").prod(conv_strides)
        )

    rnn_sizes = []
    i = 0
    while f"encoder/rnn/{i}/fwd/wh" in shapes:
        # gate kernel (H, 4H): recover H (the reference divides packed
        # kernels by 4, trainers.py:526-529)
        rnn_sizes.append(shapes[f"encoder/rnn/{i}/fwd/wh"][0])
        i += 1
    out["layer_sizes"]["encoder_rnn"] = rnn_sizes
    out["BIDIRECTIONAL"] = "encoder/rnn/0/bwd/wh" in shapes
    if rnn_sizes:
        out["encoder_type"] = "lstm"

    if "encoder/conformer/in_proj/w" in shapes:
        # conformer family: blocks/dims/kernel (and MoE width) are
        # shape-recoverable; num_heads / chunk_size / left_context are
        # NOT (they leave no trace in the weight shapes) and carry over
        # from the constructed config — same limitation class as the
        # reference's name/shape parsing
        out["encoder_type"] = "conformer"
        conf: dict[str, int] = {
            "model_dim": shapes["encoder/conformer/in_proj/w"][1]
        }
        nb = 0
        while f"encoder/conformer/blocks/{nb}/ln_out/g" in shapes:
            nb += 1
        conf["num_blocks"] = nb
        if nb:
            b0 = "encoder/conformer/blocks/0"
            conf["ffn_dim"] = shapes[f"{b0}/ffn1/w1"][1]
            conf["conv_kernel"] = shapes[f"{b0}/conv/dw"][0]
            # MoE ffn2 (models/moe.py) — explicitly 0 for a dense tree
            # so restoring a dense checkpoint into an MoE-constructed
            # trainer switches the family OFF (the constructed
            # moe_experts must not survive the _replace)
            conf["moe_experts"] = (
                shapes[f"{b0}/ffn2/wg"][1]
                if f"{b0}/ffn2/wg" in shapes
                else 0
            )
        out["conformer"] = conf

    aux_sizes: list[int] = []
    for key, shape in sorted(shapes.items()):
        if key.startswith("aux/") and key.endswith("/mlp/0/w"):
            aux_sizes = [shape[1]]
        if key.startswith("aux/") and key.endswith("/out/w"):
            out.setdefault("aux_heads", {})[key.split("/")[1]] = shape[1]
    out["layer_sizes"]["encoder_1_projection"] = aux_sizes

    if "decoder/embedding" in shapes:
        vocab, emb = shapes["decoder/embedding"]
        out["vocab_size"] = vocab
        out["layer_sizes"]["decoder_embedding"] = [emb]
    dec_sizes = []
    i = 0
    while f"decoder/rnn/{i}/wh" in shapes:
        dec_sizes.append(shapes[f"decoder/rnn/{i}/wh"][0])
        i += 1
    out["layer_sizes"]["decoder_rnn"] = dec_sizes
    if "decoder/out/w" in shapes:
        # final projection → vocab (transposed in the reference,
        # trainers.py:513-520; stored forward here)
        out["layer_sizes"]["decoder_projection"] = []
        out.setdefault("vocab_size", shapes["decoder/out/w"][1])
    out["use_attention"] = "decoder/attn/wa/w" in shapes
    return out
