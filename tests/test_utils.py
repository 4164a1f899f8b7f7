"""Utils tests: profiling counters + checkpoint-shape introspection."""

import time

import jax
import numpy as np
import pytest

from ecog2txt_tpu.models import Seq2SeqConfig, init_seq2seq
from ecog2txt_tpu.models.seq2seq import AuxHead
from ecog2txt_tpu.utils import StepTimer, recover_model_sizes


def test_step_timer_throughput():
    t = StepTimer()
    t.start()
    time.sleep(0.01)
    t.lap(items=5)
    time.sleep(0.01)
    t.lap(items=5)
    s = t.summary()
    assert s["laps"] == 2
    assert s["total_s"] >= 0.02
    assert 0 < s["items_per_second"] < 5000


def test_step_timer_requires_start():
    with pytest.raises(RuntimeError):
        StepTimer().lap()


def test_recover_model_sizes_roundtrip():
    cfg = Seq2SeqConfig(
        vocab_size=30, num_subjects=2, in_channels=16, conv_sizes=(32,),
        decimation_factor=12, rnn_sizes=(48, 48), aux_proj_sizes=(24,),
        aux_heads=(AuxHead("encoder_1_targets", "categorical", 22),),
        dec_embedding_size=24, dec_rnn_sizes=(96,), max_dec_len=10,
        use_attention=True,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    out = recover_model_sizes(params, in_channels=16)
    assert out["num_subjects"] == 2
    assert out["layer_sizes"]["encoder_embedding"] == [32]
    assert out["conv_strides"] == [12]
    assert out["decimation_factor"] == 12
    assert out["layer_sizes"]["encoder_rnn"] == [48, 48]
    assert out["BIDIRECTIONAL"]
    assert out["layer_sizes"]["encoder_1_projection"] == [24]
    assert out["aux_heads"]["encoder_1_targets"] == 22
    assert out["layer_sizes"]["decoder_embedding"] == [24]
    assert out["layer_sizes"]["decoder_rnn"] == [96]
    assert out["vocab_size"] == 30
    assert out["use_attention"]


def test_recover_model_sizes_conformer_moe():
    """Conformer (incl. MoE) checkpoints are shape-recoverable too:
    blocks/dims/kernel/expert count; heads/chunking are not (no trace
    in the weight shapes) and stay with the constructed config."""
    from ecog2txt_tpu.models.conformer import ConformerConfig

    cfg = Seq2SeqConfig(
        vocab_size=30, num_subjects=1, in_channels=16, conv_sizes=(32,),
        decimation_factor=4, rnn_sizes=(48,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=24, dec_rnn_sizes=(96,),
        max_dec_len=10, encoder_type="conformer",
        conformer=ConformerConfig(
            num_blocks=3, model_dim=64, num_heads=4, ffn_dim=128,
            conv_kernel=6, chunk_size=8, left_context=1,
            moe_experts=4, moe_topk=2,
        ),
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    out = recover_model_sizes(params, in_channels=16)
    assert out["encoder_type"] == "conformer"
    assert out["conformer"] == {
        "model_dim": 64, "num_blocks": 3, "ffn_dim": 128,
        "conv_kernel": 6, "moe_experts": 4,
    }
    # a dense (non-MoE) tree recovers without the moe key
    import dataclasses

    dense_cfg = dataclasses.replace(
        cfg, conformer=cfg.conformer._replace(moe_experts=0)
    )
    dense = init_seq2seq(jax.random.PRNGKey(0), dense_cfg)
    out_d = recover_model_sizes(dense, in_channels=16)
    # explicitly 0 (not absent): restoring a dense checkpoint into an
    # MoE-constructed trainer must switch the MoE family OFF
    assert out_d["conformer"]["moe_experts"] == 0


def test_recover_from_checkpoint_dir(tmp_path):
    import orbax.checkpoint as ocp

    cfg = Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(16,),
        dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=6,
    )
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt-5")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": params})
    out = recover_model_sizes(path, in_channels=8)
    assert out["layer_sizes"]["encoder_rnn"] == [24]
    assert out["vocab_size"] == 12
    assert not out["use_attention"]
