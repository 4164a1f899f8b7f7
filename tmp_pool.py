import time
import numpy as np
import jax, jax.numpy as jnp
from ecog2txt_tpu.models.conformer import ConformerConfig
from ecog2txt_tpu.models.seq2seq import Seq2SeqConfig, init_seq2seq
from ecog2txt_tpu.serve import StreamingConformerSession, StreamingSessionPool

ccfg = ConformerConfig(num_blocks=4, model_dim=384, num_heads=6,
                       ffn_dim=1536, conv_kernel=8, chunk_size=16,
                       left_context=1)
cfg = Seq2SeqConfig(
    vocab_size=1809, num_subjects=1, in_channels=469, conv_sizes=(100,),
    decimation_factor=12, rnn_sizes=(400,), aux_proj_sizes=(),
    aux_heads=(), dec_embedding_size=150, dec_rnn_sizes=(800,),
    max_dec_len=20, encoder_type="conformer", conformer=ccfg,
    compute_dtype=jnp.bfloat16,
)
params = init_seq2seq(jax.random.PRNGKey(0), cfg)
targets = ["<pad>", "<EOS>", "<OOV>"]
N = 8
spc = cfg.decimation_factor * ccfg.chunk_size
rng = np.random.default_rng(0)
chunk = rng.normal(size=(spc, 469)).astype(np.float32)

pool = StreamingSessionPool(params, cfg, targets, capacity=N)
slots = [pool.add() for _ in range(N)]
for _ in range(3):
    for s in slots:
        pool.push(s, chunk)
float(jnp.sum(pool._blocks[-1][0]))
lat = []
for _ in range(15):
    t0 = time.perf_counter()
    for s in slots:
        pool.push(s, chunk)
    float(jnp.sum(pool._blocks[-1][0]))
    lat.append((time.perf_counter() - t0) * 1e3)
m = sorted(lat)[7]
print(f"pool({N}): {m:.1f} ms per round of {N} chunks "
      f"({m/N:.1f} ms/stream-chunk)", flush=True)

sess = StreamingConformerSession(params, cfg, targets)
for _ in range(3):
    sess.push(chunk)
float(jnp.sum(sess._enc_outs[-1]))
lat3 = []
for _ in range(15):
    t0 = time.perf_counter()
    sess.push(chunk)
    float(jnp.sum(sess._enc_outs[-1]))
    lat3.append((time.perf_counter() - t0) * 1e3)
m3 = sorted(lat3)[7]
print(f"single session: {m3:.1f} ms/chunk -> {N} streams need {N*m3:.0f} ms",
      flush=True)
print(f"chunk = {spc/200*1e3:.0f} ms signal; speedup {N*m3/m:.1f}x; "
      f"pool capacity ~{N*(spc/200*1e3)/m:.0f} realtime streams/chip",
      flush=True)
