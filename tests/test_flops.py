"""Cross-check utils/flops manual GEMM accounting against an
independent jaxpr-walking counter — the MFU numbers bench.py reports
are only as honest as these counts.

XLA's `cost_analysis()` cannot serve as the oracle: HloCostAnalysis
counts a while/scan body ONCE, not times its trip count, so any scanned
model (the LSTM stacks) is undercounted.  The oracle here traverses the
closed jaxpr instead, multiplying dot_general/conv FLOPs inside `scan`
by the scan length (and recursing through pjit/remat/custom-vjp call
primitives)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.models.conformer import ConformerConfig
from ecog2txt_tpu.models.seq2seq import (
    AuxHead, Seq2SeqConfig, init_seq2seq, seq2seq_loss,
)
from ecog2txt_tpu.utils.flops import seq2seq_forward_flops


def _prod(xs):
    return math.prod(int(x) for x in xs)


def _dot_flops(eqn):
    a = eqn.invars[0].aval
    b = eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = _prod(a.shape[i] for i in lc)
    batch = _prod(a.shape[i] for i in lb)
    m = _prod(
        d for i, d in enumerate(a.shape) if i not in set(lc) | set(lb)
    )
    n = _prod(
        d for i, d in enumerate(b.shape) if i not in set(rc) | set(rb)
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn):
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    fgc = int(eqn.params.get("feature_group_count", 1))
    bgc = int(eqn.params.get("batch_group_count", 1))
    k_spatial = _prod(rhs.shape[i] for i in dn.rhs_spec[2:])
    in_ch = int(rhs.shape[dn.rhs_spec[1]])  # per group
    return 2.0 * _prod(out.shape) * k_spatial * in_ch / bgc


def jaxpr_gemm_flops(jaxpr, mult: float = 1.0) -> float:
    """GEMM + conv FLOPs of a (closed) jaxpr, scan-aware."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += mult * _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += mult * _conv_flops(eqn)
        elif name == "scan":
            total += jaxpr_gemm_flops(
                eqn.params["jaxpr"], mult * int(eqn.params["length"])
            )
        elif name == "while":
            raise AssertionError(
                "while_loop has no static trip count — counter can't "
                "bound it"
            )
        elif name == "cond":
            total += max(
                jaxpr_gemm_flops(br, mult)
                for br in eqn.params["branches"]
            )
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if key in eqn.params:
                    total += jaxpr_gemm_flops(eqn.params[key], mult)
                    break
    return total


def _measured_forward_flops(config, B, T, dec_len):
    params = init_seq2seq(jax.random.PRNGKey(0), config)
    x = jnp.zeros((B, T, config.in_channels), jnp.float32)
    batch = {
        "encoder_inputs": x,
        "encoder_lengths": jnp.full((B,), T, jnp.int32),
        "decoder_targets": jnp.ones((B, dec_len), jnp.int32),
        "decoder_lengths": jnp.full((B,), dec_len, jnp.int32),
        "subject_idx": jnp.asarray(0, jnp.int32),
        "encoder_1_targets": jnp.zeros((B, T), jnp.int32),
    }

    def fwd(p, xx):
        out = seq2seq_loss(
            p, config, dict(batch, encoder_inputs=xx),
            jax.random.PRNGKey(1), train=False,
        )
        return out[0] if isinstance(out, tuple) else out

    jaxpr = jax.make_jaxpr(fwd)(params, x)
    return jaxpr_gemm_flops(jaxpr)


@pytest.mark.parametrize("encoder", ["lstm", "conformer"])
def test_manual_flops_match_jaxpr_count(encoder):
    B, T, dec_len = 4, 192, 6
    kwargs = dict(
        vocab_size=50, num_subjects=1, in_channels=24, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(32, 32), aux_proj_sizes=(16,),
        aux_heads=(AuxHead("encoder_1_targets", "categorical", 8),),
        dec_embedding_size=12, dec_rnn_sizes=(48,), max_dec_len=dec_len,
    )
    if encoder == "conformer":
        kwargs.update(
            encoder_type="conformer",
            conformer=ConformerConfig(
                num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
                conv_kernel=4, chunk_size=8, left_context=1,
            ),
        )
    config = Seq2SeqConfig(**kwargs)
    manual = seq2seq_forward_flops(config, T, dec_len=dec_len) * B
    counted = _measured_forward_flops(config, B, T, dec_len)
    ratio = counted / manual
    print(f"{encoder}: manual={manual:.4g} jaxpr={counted:.4g} "
          f"ratio={ratio:.3f}")
    # the manual count is the MODEL-flop convention (band-only
    # attention, no loss-side GEMMs); the executed program may compute
    # somewhat more (dense short-T attention) but never less, and a
    # structural miscount would blow past the band
    assert 0.95 <= ratio <= 1.6, (manual, counted)
