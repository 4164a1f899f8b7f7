"""`models.seq2seq._strided_conv` (the conv-primitive subsample front
end, r5) must reproduce the grouped-GEMM formulation it replaced —
forward, weight grads, and input (saliency) grads, f32 and bf16.
Reference seam: the reference's `_convolve_sequences`
(trainers.py:813-818); measured motivation in RESULTS.md r5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.models.seq2seq import _strided_conv


def _grouped_gemm(xs, wg):
    """The pre-r5 formulation: contract (stride, C) via dot_general."""
    stride, C, F = wg.shape
    T, B, _ = xs.shape
    T_out = T // stride
    xs_g = xs[: T_out * stride].reshape(T_out, stride, B, C)
    return jax.lax.dot_general(
        xs_g, wg,
        dimension_numbers=(((1, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(24, 3, 7, 4, 5), (36, 2, 16, 12, 10)])
def test_forward_and_grads_match_grouped_gemm(dtype, shape):
    T, B, C, stride, F = shape
    xs = jax.random.normal(jax.random.PRNGKey(0), (T, B, C)).astype(dtype)
    wg = (
        jax.random.normal(jax.random.PRNGKey(1), (stride, C, F)) * 0.1
    ).astype(dtype)

    out = _strided_conv(xs, wg)
    ref = _grouped_gemm(xs, wg)
    assert out.dtype == jnp.float32 and out.shape == ref.shape
    tol = 1e-5 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=tol, atol=tol
    )

    def loss_new(xs, wg):
        return jnp.sum(jnp.sin(_strided_conv(xs, wg)))

    def loss_ref(xs, wg):
        return jnp.sum(jnp.sin(_grouped_gemm(xs, wg)))

    gn = jax.jit(jax.grad(loss_new, argnums=(0, 1)))(xs, wg)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(xs, wg)
    for a, b, name in zip(gn, gr, ("dxs", "dwg")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(
            a / scale, b / scale, atol=tol, err_msg=name
        )
        assert a.shape == b.shape


def test_ragged_tail_rows_get_zero_input_grad():
    # T not a multiple of stride: the trailing rows never enter the
    # conv, so their input grads are exactly zero (the VJP zero-pads)
    T, B, C, stride, F = 26, 2, 5, 4, 3
    xs = jax.random.normal(jax.random.PRNGKey(0), (T, B, C))
    wg = jax.random.normal(jax.random.PRNGKey(1), (stride, C, F)) * 0.1
    T_used = (T // stride) * stride

    g = jax.grad(
        lambda xs: jnp.sum(_strided_conv(xs[:T_used], wg) ** 2)
    )(xs)
    assert np.asarray(g[T_used:]).max() == 0.0
    assert np.abs(np.asarray(g[:T_used])).max() > 0.0
