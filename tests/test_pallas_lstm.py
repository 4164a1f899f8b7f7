"""Fused Pallas LSTM parity tests (interpreter mode on CPU).

Forward outputs, final states, and ALL gradients must match the
lax.scan reference (ops/lstm.py) to float32 tolerance for the
chunked-grid kernels (ops/pallas_lstm.py, use_pallas=True).  A second
manual-DMA kernel family was pruned in round 3 after measuring equal
on-chip (lessons: ops/lstm.py lstm_scan comment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.ops.lstm import init_lstm_params, lstm_scan

T, B, F, H = 12, 4, 6, 8


@pytest.fixture(scope="module")
def setup():
    params = init_lstm_params(jax.random.PRNGKey(0), F, H)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(T, B, F)), jnp.float32)
    lengths = jnp.asarray([T, 7, 3, 10], jnp.int32)
    return params, xs, lengths


IMPLS = [True]


def _run(params, xs, lengths, use_pallas, initial_state=None, mask=None):
    return lstm_scan(
        params, xs, lengths, initial_state, mask,
        use_pallas=use_pallas, pallas_interpret=True,
    )


@pytest.mark.parametrize("impl", IMPLS)
def test_forward_parity(setup, impl):
    params, xs, lengths = setup
    out_ref, (h_ref, c_ref) = _run(params, xs, lengths, False)
    out_pl, (h_pl, c_pl) = _run(params, xs, lengths, impl)
    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h_pl, h_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c_pl, c_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", IMPLS)
def test_forward_parity_no_lengths(setup, impl):
    params, xs, _ = setup
    out_ref, (h_ref, _) = _run(params, xs, None, False)
    out_pl, (h_pl, _) = _run(params, xs, None, impl)
    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h_pl, h_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", IMPLS)
def test_forward_parity_with_initial_state_and_mask(setup, impl):
    params, xs, lengths = setup
    rng = np.random.default_rng(1)
    h0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, H)) * 2.0, jnp.float32)
    out_ref, fs_ref = _run(params, xs, lengths, False, (h0, c0), mask)
    out_pl, fs_pl = _run(params, xs, lengths, impl, (h0, c0), mask)
    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fs_pl[0], fs_ref[0], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", IMPLS)
def test_gradient_parity(setup, impl):
    """Gradients wrt xs, wx, wh, b, h0, c0 all match the scan path."""
    params, xs, lengths = setup
    rng = np.random.default_rng(2)
    h0 = jnp.asarray(rng.normal(size=(B, H)) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, H)) * 0.3, jnp.float32)
    # loss touches the output sequence AND both final states
    w_out = jnp.asarray(rng.normal(size=(H,)), jnp.float32)

    def loss(params, xs, h0, c0, use_pallas):
        out, (hf, cf) = _run(params, xs, lengths, use_pallas, (h0, c0))
        return (
            jnp.sum(out * w_out) + 2.0 * jnp.sum(hf) + 0.5 * jnp.sum(cf**2)
        )

    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(params, xs, h0, c0, False)
    g_pl = jax.grad(loss, argnums=(0, 1, 2, 3))(params, xs, h0, c0, impl)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("impl", IMPLS)
def test_gradient_parity_with_dropout_mask(setup, impl):
    params, xs, lengths = setup
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, H)) * 2.0, jnp.float32)

    def loss(params, xs, use_pallas):
        out, (hf, _) = _run(params, xs, lengths, use_pallas, None, mask)
        return jnp.sum(out**2) + jnp.sum(hf)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, xs, False)
    g_pl = jax.grad(loss, argnums=(0, 1))(params, xs, impl)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("impl", IMPLS)
def test_invalid_step_upstream_grad_dropped(setup, impl):
    """Gradient flowing into outputs past the valid prefix must vanish
    (forward emits constant 0 there)."""
    params, xs, lengths = setup

    def loss(xs, use_pallas):
        out, _ = _run(params, xs, lengths, use_pallas)
        # deliberately touch ONLY the padding region of sequence 2 (len 3)
        return jnp.sum(out[5:, 2])

    g_ref = jax.grad(loss)(xs, False)
    g_pl = jax.grad(loss)(xs, impl)
    np.testing.assert_allclose(np.asarray(g_pl), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_ref), 0.0, atol=1e-7)


def test_bf16_streams_close_to_fp32(setup):
    """bf16 streaming (the TPU fast path under bf16 compute) stays close
    to the fp32 reference — loose tolerance, it IS lower precision."""
    import jax.numpy as jnp

    params, xs, lengths = setup
    out_ref, (h_ref, _) = lstm_scan(params, xs, lengths)
    out_bf, (h_bf, _) = lstm_scan(
        params, xs, lengths,
        compute_dtype=jnp.bfloat16, use_pallas=True, pallas_interpret=True,
    )
    assert out_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_bf, np.float32), out_ref, atol=0.05
    )
    np.testing.assert_allclose(np.asarray(h_bf), h_ref, atol=0.05)

    def loss(p, use_pallas):
        out, (hf, _) = lstm_scan(
            p, xs, lengths,
            compute_dtype=jnp.bfloat16 if use_pallas else jnp.float32,
            use_pallas=use_pallas, pallas_interpret=True,
        )
        return jnp.sum(out.astype(jnp.float32)) + jnp.sum(hf)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_bf = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_bf)):
        a, b = np.asarray(a), np.asarray(b, np.float32)
        denom = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.1


def test_reverse_time_kernel_parity(setup):
    """reverse_time recurrence == scan over the reversed sequence with
    outputs re-reversed (the gather-free biLSTM backward direction),
    including gradients."""
    from ecog2txt_tpu.ops.lstm import reverse_padded
    from ecog2txt_tpu.ops.pallas_lstm import fused_lstm_recurrence

    params, xs, lengths = setup

    def ref(p, xs):
        xs_rev = reverse_padded(xs, lengths)
        out_rev, (hf, cf) = _run(p, xs_rev, lengths, False)
        return reverse_padded(out_rev, lengths), hf, cf

    def rt(p, xs):
        xw = jnp.dot(xs, p["wx"]) + p["b"]
        mask = jnp.ones((B, H), jnp.float32)
        zeros = jnp.zeros((B, H), jnp.float32)
        return fused_lstm_recurrence(
            xw, p["wh"], lengths, zeros, zeros, mask, True, True
        )

    out_ref, h_ref, c_ref = ref(params, xs)
    out_rt, h_rt, c_rt = rt(params, xs)
    np.testing.assert_allclose(out_rt, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h_rt, h_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c_rt, c_ref, rtol=1e-5, atol=1e-6)

    w_out = jnp.asarray(np.random.default_rng(5).normal(size=(H,)), jnp.float32)

    def loss(p, xs, which):
        out, hf, cf = (ref if which == "ref" else rt)(p, xs)
        return jnp.sum(out * w_out) + 2.0 * jnp.sum(hf) + 0.5 * jnp.sum(cf**2)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, xs, "ref")
    g_rt = jax.grad(loss, argnums=(0, 1))(params, xs, "rt")
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_rt)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_bidirectional_grid_gather_free_parity(setup):
    """bidirectional_lstm(use_pallas=True) — the gather-free reverse_time
    path — matches the two-scan reference."""
    from ecog2txt_tpu.ops.lstm import bidirectional_lstm

    params_fwd, xs, lengths = setup
    params_bwd = init_lstm_params(jax.random.PRNGKey(11), F, H)
    rng = np.random.default_rng(8)
    masks = (
        jnp.asarray(rng.integers(0, 2, size=(B, H)) * 2.0, jnp.float32),
        jnp.asarray(rng.integers(0, 2, size=(B, H)) * 2.0, jnp.float32),
    )

    def loss(pf, pb, xs, use_pallas):
        out, (hf, cf) = bidirectional_lstm(
            pf, pb, xs, lengths, masks,
            use_pallas=use_pallas, pallas_interpret=True,
        )
        return jnp.sum(out**2) + jnp.sum(hf) + jnp.sum(cf)

    out_ref, fs_ref = bidirectional_lstm(
        params_fwd, params_bwd, xs, lengths, masks, use_pallas=False
    )
    out_pl, fs_pl = bidirectional_lstm(
        params_fwd, params_bwd, xs, lengths, masks,
        use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fs_pl[0], fs_ref[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fs_pl[1], fs_ref[1], rtol=1e-5, atol=1e-6)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(params_fwd, params_bwd, xs, False)
    g_pl = jax.grad(loss, argnums=(0, 1, 2))(params_fwd, params_bwd, xs, True)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_fused_bilstm_grid_parity(setup):
    """The experimental one-launch bidirectional grid kernel
    (fused_bilstm_grid) matches bidirectional_lstm, incl. gradients."""
    from ecog2txt_tpu.ops.lstm import bidirectional_lstm
    from ecog2txt_tpu.ops.pallas_lstm import fused_bilstm_grid

    params_fwd, xs, lengths = setup
    params_bwd = init_lstm_params(jax.random.PRNGKey(13), F, H)
    ones = jnp.ones((B, H), jnp.float32)

    def fused(pf, pb, xs):
        xwf = jnp.dot(xs, pf["wx"]) + pf["b"]
        xwb = jnp.dot(xs, pb["wx"]) + pb["b"]
        return fused_bilstm_grid(
            xwf, xwb, pf["wh"], pb["wh"], lengths, ones, ones, True
        )

    out_ref, (h_ref, c_ref) = bidirectional_lstm(
        params_fwd, params_bwd, xs, lengths, None, use_pallas=False
    )
    out_pl, h_pl, c_pl = fused(params_fwd, params_bwd, xs)
    np.testing.assert_allclose(out_pl, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h_pl, h_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c_pl, c_ref, rtol=1e-5, atol=1e-6)

    def loss(pf, pb, xs, fn):
        if fn == "ref":
            out, (hf, cf) = bidirectional_lstm(
                pf, pb, xs, lengths, None, use_pallas=False
            )
        else:
            out, hf, cf = fused(pf, pb, xs)
        return jnp.sum(out**2) + jnp.sum(hf) + jnp.sum(cf)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(
        params_fwd, params_bwd, xs, "ref"
    )
    g_pl = jax.grad(loss, argnums=(0, 1, 2))(
        params_fwd, params_bwd, xs, "pl"
    )
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )
