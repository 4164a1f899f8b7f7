import time
import jax, jax.numpy as jnp
import ecog2txt_tpu.models.conformer as cf
cfg = cf.ConformerConfig(num_blocks=4, model_dim=384, num_heads=6,
                         ffn_dim=1536, conv_kernel=8, chunk_size=16,
                         left_context=1, remat=True)
params = cf.init_conformer(jax.random.PRNGKey(0), cfg, 100)
B, T = 16, 65536
x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 100), jnp.bfloat16)
lens = jnp.full((B,), T, jnp.int32)
def loss(p, xx):
    out, _ = cf.conformer_encode(p, cfg, xx, lens, compute_dtype=jnp.bfloat16)
    return jnp.sum(out.astype(jnp.float32) ** 2)
grad = jax.grad(loss)
@jax.jit
def step(p, xx):
    def body(carry, _):
        g = grad(p, xx * (1 + 1e-30 * carry).astype(xx.dtype))
        s = sum(jnp.sum(l) for l in jax.tree.leaves(g))
        return carry + s * 1e-30, s
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=2)
    return c
t0 = time.perf_counter()
float(step(params, x))
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
reps = []
for _ in range(5):
    t0 = time.perf_counter()
    float(step(params, x))
    reps.append((time.perf_counter() - t0) / 2)
med = sorted(reps)[2]
print(f"B={B} T={T} remat fwd+bwd: {med*1e3:.1f} ms/step = "
      f"{B*T/med/1e3:.0f}k tokens/s", flush=True)
