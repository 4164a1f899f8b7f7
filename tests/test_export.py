"""Exported serving artifact: StableHLO round-trip parity.

``serve.export_predictor`` is the TPU-native counterpart of the
reference's TF1 saved-model deployment (trainers.py:925-949): the
jitted predict function, weights baked in as constants, serialized with
``jax.export``.  These tests assert the artifact reproduces the live
predictor EXACTLY (same program, same backend → identical bits) and is
batch-polymorphic.
"""

import numpy as np
import pytest

import jax

from ecog2txt_tpu.models.conformer import ConformerConfig
from ecog2txt_tpu.models.seq2seq import Seq2SeqConfig, init_seq2seq
from ecog2txt_tpu.serve import (
    ExportedPredictor,
    OnlinePredictor,
    export_predictor,
    load_exported_predictor,
)

TARGETS = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]


def _lstm_predictor():
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    return OnlinePredictor(params, cfg, TARGETS, max_samples=64)


def _conformer_predictor(moe_experts=0, moe_capacity_factor=0.0,
                         moe_group_size=0):
    ccfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
        moe_experts=moe_experts,
        moe_capacity_factor=moe_capacity_factor,
        moe_group_size=moe_group_size,
    )
    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=ccfg,
    )
    params = init_seq2seq(jax.random.PRNGKey(1), cfg)
    return OnlinePredictor(params, cfg, TARGETS, max_samples=64)


@pytest.mark.parametrize(
    "family", ["lstm", "conformer", "moe", "moe_capacity"]
)
def test_export_roundtrip_exact(tmp_path, family):
    pred = {
        "lstm": _lstm_predictor,
        "conformer": _conformer_predictor,
        # routed top-k MoE FFN exports too (no-drop dispatch path)
        "moe": lambda: _conformer_predictor(moe_experts=4),
        # GShard static-capacity dispatch (the production-scale
        # setting, ADVICE r3): grouped capacity keeps C a config
        # constant, so the symbolic-batch export covers it too
        "moe_capacity": lambda: _conformer_predictor(
            moe_experts=4, moe_capacity_factor=1.25, moe_group_size=8
        ),
    }[family]()
    path = export_predictor(pred, str(tmp_path / family), platforms=("cpu",))
    loaded = load_exported_predictor(path)

    rng = np.random.default_rng(7)
    # conformer: the symbolic-batch export pins the depthwise conv to
    # its at-scale primitive branch; batch 256 (B·T' = 4096) puts the
    # live predictor on the same branch so the comparison is bit-exact
    B = 3 if family == "lstm" else 256
    x = rng.normal(size=(B, 50, 8)).astype(np.float32)
    live, exported = pred(x), loaded(x)
    assert (live["tokens"] == exported["tokens"]).all()
    # CPU XLA recompiles the symbolic-batch module with different
    # intra-op partitioning → last-ULP drift (CLAUDE.md: never assert
    # bit-equality across two differently-compiled CPU programs)
    np.testing.assert_allclose(
        live["probabilities"], exported["probabilities"],
        rtol=1e-4, atol=1e-5,
    )
    assert live["sequences"] == exported["sequences"]


def test_export_batch_polymorphic(tmp_path):
    """One artifact serves any batch size (symbolic batch dim)."""
    pred = _lstm_predictor()
    path = export_predictor(pred, str(tmp_path / "a"), platforms=("cpu",))
    loaded = ExportedPredictor(path)
    rng = np.random.default_rng(0)
    for b in (1, 2, 5):
        x = rng.normal(size=(b, 64, 8)).astype(np.float32)
        live, exported = pred(x), loaded(x)
        assert (live["tokens"] == exported["tokens"]).all()
    # a single (T, C) trial promotes to batch 1, like OnlinePredictor
    one = loaded(rng.normal(size=(40, 8)).astype(np.float32))
    assert one["tokens"].shape[0] == 1
    assert isinstance(one["sequences"][0], str)


def test_export_guards(tmp_path):
    pred = _lstm_predictor()
    path = export_predictor(pred, str(tmp_path / "a"), platforms=("cpu",))
    loaded = load_exported_predictor(path)
    with pytest.raises(ValueError, match="channels"):
        loaded(np.zeros((1, 40, 11), np.float32))
    # fewer channels zero-pad, as in OnlinePredictor
    out = loaded(np.zeros((1, 40, 5), np.float32))
    assert out["tokens"].shape[0] == 1

    import json
    import os

    bad = tmp_path / "bad"
    os.makedirs(bad)
    with open(bad / "predictor_meta.json", "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ValueError, match="artifact"):
        ExportedPredictor(str(bad))
