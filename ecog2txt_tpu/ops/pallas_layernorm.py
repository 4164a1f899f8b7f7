"""Fused LayerNorm as a Pallas TPU kernel (forward + custom VJP).

Motivation (RESULTS.md r5 bench-scale decomposition): the conformer's
17 layernorms cost 3.6 ms of the 35 ms training step — ~10% — against
a ~0 GEMM roofline.  The XLA path (models/conformer._layernorm)
upcasts the bf16 stream to f32, makes separate mean/variance passes,
and materializes f32 intermediates between them; fusing the whole
normalization into one VMEM-resident pass per row block reads x once
(bf16) and writes y once (bf16), with the f32 statistics living only
in registers/VMEM stack.

Semantics are IDENTICAL to ``_layernorm``: statistics in f32 regardless
of stream dtype, ``rsqrt(var + eps)``, affine ``g``/``b`` in f32, output
cast back to the stream dtype.  The backward kernel recomputes the
per-row statistics from x (cheaper than saving them: the re-read of x
is needed for ``xhat`` anyway) and emits per-grid-block partial
``dg``/``db`` reductions that are summed outside the kernel.

Reference parity target: layer normalization inside the conformer
encoder blocks (models/conformer.py), the TPU-first replacement for the
reference's biLSTM encoder stack (SURVEY §2.8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


# rows per grid cell: BR×D bf16 in/out plus a handful of f32 (BR, D)
# stack temporaries — ~6 MB at D=384, comfortably inside the 12 MB
# VMEM budget (CLAUDE.md: near-limit kernels flake)
_BLOCK_ROWS = 1024


def _ln_fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (BR, D)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    g = g_ref[...].astype(jnp.float32)  # (1, D)
    b = b_ref[...].astype(jnp.float32)
    y_ref[...] = (xc * rs * g + b).astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, dy_ref, g_ref, dx_ref, dg_ref, db_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    xhat = xc * rs
    g = g_ref[...].astype(jnp.float32)  # (1, D)
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
    dx_ref[...] = ((dyg - m1 - xhat * m2) * rs).astype(dx_ref.dtype)
    # per-block partial reductions over rows; summed outside the kernel.
    # Mosaic needs the sublane (2nd-to-last) block dim divisible by 8,
    # so each partial is an (8, D) tile with the sum in row 0 and exact
    # zeros below (no fp error when the caller sums over everything)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0
    dg_ref[...] = jnp.where(
        row0, jnp.sum(dy * xhat, axis=0, keepdims=True), 0.0
    )[None]
    db_ref[...] = jnp.where(
        row0, jnp.sum(dy, axis=0, keepdims=True), 0.0
    )[None]


def _pad_rows(x2, br):
    r = x2.shape[0]
    pad = (-r) % br
    if pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((pad, x2.shape[1]), x2.dtype)], axis=0
        )
    return x2, r


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, g, b, eps=1e-6):
    """LayerNorm over the last axis of ``x`` (any leading shape).

    Drop-in for models/conformer._layernorm's math; requires the last
    dim to be a multiple of 128 lanes (conformer D=384 qualifies — the
    caller falls back to the XLA path otherwise)."""
    return _ln_fwd(x, g, b, eps)[0]


def _ln_fwd(x, g, b, eps):
    d = x.shape[-1]
    x2, r = _pad_rows(x.reshape(-1, d), _BLOCK_ROWS)
    grid = x2.shape[0] // _BLOCK_ROWS
    y2 = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=_default_interpret(),
    )(x2, g.reshape(1, d), b.reshape(1, d))
    return y2[:r].reshape(x.shape), (x, g)


def _ln_bwd(eps, res, dy):
    x, g = res
    d = x.shape[-1]
    x2, r = _pad_rows(x.reshape(-1, d), _BLOCK_ROWS)
    dy2, _ = _pad_rows(dy.reshape(-1, d).astype(x.dtype), _BLOCK_ROWS)
    grid = x2.shape[0] // _BLOCK_ROWS
    dx2, dgp, dbp = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0)),
            pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct((grid, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, d), jnp.float32),
        ],
        interpret=_default_interpret(),
    )(x2, dy2, g.reshape(1, d))
    # padded rows are all-zero: their dy is zero, so the partial
    # dg/db contributions vanish and dx rows are sliced away
    dx = dx2[:r].reshape(x.shape).astype(dy.dtype)
    # rows 1..7 of each (8, D) partial tile are exact zeros
    return dx, jnp.sum(dgp, axis=(0, 1)).astype(g.dtype), jnp.sum(
        dbp, axis=(0, 1)
    ).astype(g.dtype)


layer_norm.defvjp(_ln_fwd, _ln_bwd)
