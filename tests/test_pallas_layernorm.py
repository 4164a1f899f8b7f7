"""Parity of the fused Pallas LayerNorm (ops/pallas_layernorm) against
the XLA path (models/conformer._layernorm) — forward and gradients,
f32 and bf16 streams, non-block-multiple row counts (interpret mode on
CPU, as for the other Pallas kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.models.conformer import _layernorm
from ecog2txt_tpu.ops.pallas_layernorm import layer_norm


def _mk(shape, dtype, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
    return (x * 3.0 + 1.0).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 40, 384), (5, 300, 384), (1, 1, 128)])
def test_forward_parity(dtype, shape):
    x = _mk(shape, dtype)
    g = jax.random.normal(jax.random.PRNGKey(1), shape[-1:]) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), shape[-1:]) * 0.1
    ref = _layernorm({"g": g, "b": b}, x)
    out = layer_norm(x, g, b)
    assert out.dtype == x.dtype
    tol = 1e-6 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grad_parity(dtype):
    x = _mk((3, 200, 384), dtype, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(1), (384,)) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (384,)) * 0.1

    def loss_ref(x, g, b):
        return jnp.sum(jnp.sin(_layernorm({"g": g, "b": b}, x)))

    def loss_ker(x, g, b):
        return jnp.sum(jnp.sin(layer_norm(x, g, b)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2))(x, g, b)
    # CPU reduction-order tolerances (CLAUDE.md); dg/db accumulate over
    # 600 rows so compare at relative scale
    for a, c in zip(gr, gk):
        a = np.asarray(a, np.float32)
        c = np.asarray(c, np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(a / scale, c / scale, atol=tol)


def test_jit_and_row_padding():
    # rows not a multiple of the kernel's block: padded internally,
    # sliced back; jit round-trip preserves values
    x = _mk((7, 13, 128), jnp.float32, seed=5)
    g = jnp.ones((128,))
    b = jnp.zeros((128,))
    out = jax.jit(lambda x: layer_norm(x, g, b))(x)
    ref = _layernorm({"g": g, "b": b}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
