"""Parity tests for the fused Pallas banded attention
(ops/pallas_attention.py) against a dense reference implementing the
same chunk-causal semantics as models/conformer._attention_dense.

Run in interpreter mode on CPU (the kernels compile natively on TPU);
grad parity goes through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.ops.pallas_attention import banded_flash_attention


def dense_reference(q, k, v, offset, lengths, C, L):
    """Dense O(T²) oracle with the exact mask semantics: chunk-causal
    band on absolute positions, negative/over-length keys masked."""
    B, T, H, Dh = q.shape
    positions = jnp.arange(T) + offset
    qc = positions[:, None] // C
    kc = positions[None, :] // C
    mask = (kc <= qc) & (kc >= qc - L) & (positions[None, :] >= 0)
    if lengths is not None:
        mask = mask[None] & (positions[None, None, :] < lengths[:, None, None])
        mask = mask[:, None]
    else:
        mask = mask[None, None]
    logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / np.sqrt(Dh)
    logits = jnp.where(mask, logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", attn, v)


def make_qkv(rng, B, T, H, Dh, dtype=jnp.float32):
    ks = jax.random.split(rng, 3)
    return tuple(
        jax.random.normal(kk, (B, T, H, Dh), dtype) for kk in ks
    )


@pytest.mark.parametrize(
    "T,C,L,qr",
    [
        (40, 8, 1, None),  # single block, partial trailing chunk
        (96, 8, 1, 32),  # multi-block, exact fit
        (100, 8, 2, 32),  # multi-block, L=2, trailing pad
        (70, 16, 1, 16),  # QB == C == PREV
    ],
)
def test_fwd_matches_dense(T, C, L, qr):
    B, H, Dh = 2, 2, 8
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, T, H, Dh)
    lengths = jnp.array([T, max(T - 13, 1)], jnp.int32)
    got = banded_flash_attention(
        q, k, v, 0, lengths, chunk_size=C, left_context=L,
        query_rows=qr, interpret=True,
    )
    want = dense_reference(q, k, v, 0, lengths, C, L)
    # rows past a sequence's length are garbage in both paths
    valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None, None]
    np.testing.assert_allclose(
        jnp.where(valid, got, 0), jnp.where(valid, want, 0),
        rtol=1e-4, atol=1e-5,
    )


def test_fwd_no_lengths():
    B, T, H, Dh, C = 2, 64, 2, 8, 8
    q, k, v = make_qkv(jax.random.PRNGKey(1), B, T, H, Dh)
    got = banded_flash_attention(
        q, k, v, 0, None, chunk_size=C, left_context=1,
        query_rows=32, interpret=True,
    )
    want = dense_reference(q, k, v, 0, None, C, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("offset", [64, -16])
def test_fwd_offset(offset):
    """Positive offset (streaming window continuation) and negative
    offset (sequence-parallel pre-recording halo — those keys mask out
    and those queries' outputs are discarded)."""
    B, T, H, Dh, C = 2, 64, 2, 8, 8
    q, k, v = make_qkv(jax.random.PRNGKey(2), B, T, H, Dh)
    lengths = jnp.array([offset + T, offset + T - 9], jnp.int32)
    got = banded_flash_attention(
        q, k, v, offset, lengths, chunk_size=C, left_context=1,
        query_rows=32, interpret=True,
    )
    want = dense_reference(q, k, v, offset, lengths, C, 1)
    positions = jnp.arange(T) + offset
    valid = (
        (positions[None, :] >= 0) & (positions[None, :] < lengths[:, None])
    )[..., None, None]
    np.testing.assert_allclose(
        jnp.where(valid, got, 0), jnp.where(valid, want, 0),
        rtol=1e-4, atol=1e-5,
    )


def test_traced_offset_jit():
    B, T, H, Dh, C = 1, 32, 2, 8, 8
    q, k, v = make_qkv(jax.random.PRNGKey(3), B, T, H, Dh)

    @jax.jit
    def run(off):
        return banded_flash_attention(
            q, k, v, off, None, chunk_size=C, left_context=1,
            query_rows=16, interpret=True,
        )

    np.testing.assert_allclose(
        run(jnp.int32(16)),
        dense_reference(q, k, v, 16, None, C, 1),
        rtol=1e-4, atol=1e-5,
    )


def test_grad_matches_dense():
    B, T, H, Dh, C, L = 2, 96, 2, 8, 8, 1
    q, k, v = make_qkv(jax.random.PRNGKey(4), B, T, H, Dh)
    lengths = jnp.array([96, 77], jnp.int32)
    cot = jax.random.normal(jax.random.PRNGKey(5), (B, T, H, Dh))
    # only valid rows contribute to the loss (garbage rows are
    # discarded downstream in the real model, so their cotangent is 0)
    valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None, None]
    cot = jnp.where(valid, cot, 0)

    def loss_flash(q, k, v):
        out = banded_flash_attention(
            q, k, v, 0, lengths, chunk_size=C, left_context=L,
            query_rows=32, interpret=True,
        )
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_dense(q, k, v):
        out = dense_reference(q, k, v, 0, lengths, C, L)
        return jnp.sum(out.astype(jnp.float32) * cot)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=1e-4, err_msg=f"d{name}"
        )


def test_grad_bf16():
    B, T, H, Dh, C = 1, 64, 2, 8, 8
    q, k, v = make_qkv(jax.random.PRNGKey(6), B, T, H, Dh, jnp.bfloat16)

    def loss(fn, q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    flash = lambda q, k, v: banded_flash_attention(
        q, k, v, 0, None, chunk_size=C, left_context=1,
        query_rows=32, interpret=True,
    )
    dense = lambda q, k, v: dense_reference(q, k, v, 0, None, C, 1)
    got = jax.grad(lambda *a: loss(flash, *a), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(lambda *a: loss(dense, *a), argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        # slightly above the standard bf16 tolerance (CLAUDE.md): the
        # flash backward recomputes p from the saved LSE while the
        # dense oracle differentiates through its stored softmax — two
        # valid orders whose bf16 round-off differs by up to ~0.03
        np.testing.assert_allclose(
            g.astype(jnp.float32), w.astype(jnp.float32),
            rtol=5e-2, atol=3e-2, err_msg=f"d{name}",
        )


def test_conformer_flash_impl_matches_banded():
    """Full conformer encode with attention_impl='flash' equals the XLA
    banded path (and transitively dense — tested in test_conformer)."""
    from ecog2txt_tpu.models.conformer import (
        ConformerConfig, conformer_encode, init_conformer,
    )

    cfg = ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=8, left_context=1,
        attention_impl="banded",
    )
    params = init_conformer(jax.random.PRNGKey(7), cfg, 12)
    xs = jax.random.normal(jax.random.PRNGKey(8), (2, 50, 12))
    lengths = jnp.array([50, 37], jnp.int32)
    want, _ = conformer_encode(params, cfg, xs, lengths)
    got, _ = conformer_encode(
        params, cfg._replace(attention_impl="flash"), xs, lengths
    )
    valid = (jnp.arange(50)[None, :] < lengths[:, None])[..., None]
    np.testing.assert_allclose(
        jnp.where(valid, got, 0), jnp.where(valid, want, 0),
        rtol=1e-4, atol=1e-5,
    )


def test_conformer_flash_grad_matches_banded():
    from ecog2txt_tpu.models.conformer import (
        ConformerConfig, conformer_encode, init_conformer,
    )

    cfg = ConformerConfig(
        num_blocks=1, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=8, left_context=1,
        attention_impl="banded",
    )
    params = init_conformer(jax.random.PRNGKey(9), cfg, 12)
    xs = jax.random.normal(jax.random.PRNGKey(10), (2, 40, 12))
    lengths = jnp.array([40, 25], jnp.int32)

    def loss(params, impl):
        out, _ = conformer_encode(
            params, cfg._replace(attention_impl=impl), xs, lengths
        )
        valid = (jnp.arange(40)[None, :] < lengths[:, None])[..., None]
        return jnp.sum(jnp.where(valid, out, 0) ** 2)

    got = jax.grad(loss)(params, "flash")
    want = jax.grad(loss)(params, "banded")
    flat_g, _ = jax.tree_util.tree_flatten(got)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# fused_attention_layer: LN → qkv → rotary → banded attention in one
# kernel.  Oracle = the conformer's own dense attention module.
# ---------------------------------------------------------------------------


def _fused_vs_dense(B, T, D, H, C, L, off, dtype, rtol, atol):
    from ecog2txt_tpu.models.conformer import (
        ConformerConfig, init_conformer, _attention_dense,
    )
    from ecog2txt_tpu.ops.pallas_attention import fused_attention_layer

    cfg = ConformerConfig(
        num_blocks=1, model_dim=D, num_heads=H, ffn_dim=32,
        conv_kernel=4, chunk_size=C, left_context=L,
    )
    p = init_conformer(jax.random.PRNGKey(1), cfg, 8)["blocks"][0]["attn"]
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), dtype)
    lengths = jnp.asarray([T, max(1, T - 13)][:B], jnp.int32)
    positions = jnp.arange(T) + off
    # compare only rows that are valid queries (non-negative absolute
    # position, inside the sequence length) — the rest are garbage in
    # BOTH paths by contract
    valid = (
        (jnp.arange(T)[None, :] + off < lengths[:, None])
        & (jnp.arange(T)[None, :] + off >= 0)
    )[:, :, None].astype(jnp.float32)

    def fused(p, x):
        att = fused_attention_layer(
            p["wqkv"].astype(dtype), p["ln"]["g"], p["ln"]["b"],
            x, positions[0], lengths, chunk_size=C, left_context=L,
            num_heads=H, interpret=True,
        )
        return jnp.dot(att, p["wo"].astype(dtype))

    want = _attention_dense(p, x, cfg, lengths, positions, dtype)
    got = fused(p, x)
    np.testing.assert_allclose(
        np.asarray((got * valid).astype(jnp.float32)),
        np.asarray((want * valid).astype(jnp.float32)),
        rtol=rtol, atol=atol,
    )

    def loss_dense(p, x):
        out = _attention_dense(p, x, cfg, lengths, positions, dtype)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)) * valid)

    def loss_fused(p, x):
        return jnp.sum(jnp.sin(fused(p, x).astype(jnp.float32)) * valid)

    gw = jax.grad(loss_dense, argnums=(0, 1))(p, x)
    gg = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gg)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=rtol * 10, atol=atol * 10,
        )


@pytest.mark.parametrize(
    "T,C,L,off",
    [
        (50, 8, 1, 0),  # partial trailing chunk
        (40, 8, 2, 16),  # L=2, chunk-aligned traced-style offset
        (64, 8, 1, -8),  # negative-position halo
    ],
)
def test_fused_layer_matches_dense_module(T, C, L, off):
    _fused_vs_dense(2, T, 64, 4, C, L, off, jnp.float32, 1e-4, 1e-5)


def test_fused_layer_bf16():
    _fused_vs_dense(2, 96, 64, 4, 16, 1, 0, jnp.bfloat16, 5e-2, 2e-2)


def test_conformer_fused_impl_matches_banded():
    """Full 2-block encoder equality: attention_impl='fused' vs 'banded'
    (interpret kernels on CPU), values and parameter grads."""
    from ecog2txt_tpu.models.conformer import (
        ConformerConfig, conformer_encode, init_conformer,
    )

    B, T, in_dim = 2, 72, 12
    mk = lambda impl: ConformerConfig(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=8, left_context=1,
        attention_impl=impl,
    )
    params = init_conformer(jax.random.PRNGKey(0), mk("banded"), in_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, in_dim))
    lengths = jnp.asarray([T, T - 9], jnp.int32)

    def loss(p, impl):
        out, _ = conformer_encode(p, mk(impl), x, lengths)
        valid = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
        return jnp.sum(jnp.sin(out) * valid), out

    (lb, ob), gb = jax.value_and_grad(loss, has_aux=True)(params, "banded")
    (lf, of), gf = jax.value_and_grad(loss, has_aux=True)(params, "fused")
    np.testing.assert_allclose(float(lb), float(lf), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ob), np.asarray(of), rtol=1e-4, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
