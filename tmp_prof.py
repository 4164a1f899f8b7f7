"""Profile MOCHA-scale conformer encoder fwd+bwd; dump op stats."""
import time
import jax, jax.numpy as jnp
import numpy as np
import ecog2txt_tpu.models.conformer as cf

B, T = 128, 104
cfg = cf.ConformerConfig(num_blocks=4, model_dim=384, num_heads=6,
                         ffn_dim=1536, conv_kernel=8, chunk_size=16,
                         left_context=1, attention_impl="dense")
params = cf.init_conformer(jax.random.PRNGKey(0), cfg, 100)
x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 100), jnp.bfloat16)
lens = jnp.full((B,), T, jnp.int32)
def loss(p, xx):
    out, _ = cf.conformer_encode(p, cfg, xx, lens,
                                 compute_dtype=jnp.bfloat16)
    return jnp.sum(out.astype(jnp.float32) ** 2)
grad = jax.value_and_grad(loss)
@jax.jit
def fb(p, xx):
    l, g = grad(p, xx)
    return l + sum(jnp.sum(t).astype(jnp.float32)
                   for t in jax.tree.leaves(g))
float(fb(params, x))
with jax.profiler.trace("/tmp/trc"):
    for _ in range(3):
        r = fb(params, x)
    float(r)
print("trace done", flush=True)
