"""MoE conformer (models/moe.py) + expert parallelism (parallel/expert.py).

The reference has no sparse-expert model; these are TPU-native
extensions (PARITY §2.9 EP row).  Contracts pinned here:

* the capacity (GShard dispatch) path equals the exact no-drop path
  whenever capacity is ample — they are the same routed function;
* gradients flow through experts AND router, and the weighted aux loss
  reaches seq2seq_loss's total/metrics;
* expert-sharded (dp × ep) training steps match the single-device step
  (CPU mesh tolerances — see CLAUDE.md on cross-sharding bit-equality);
* the no-drop path is per-token, so MoE streaming == MoE offline
  exactly; the population-dependent capacity path refuses to stream.
"""

import numpy as np
import pytest


def _ccfg(**kw):
    from ecog2txt_tpu.models.conformer import ConformerConfig

    base = dict(
        num_blocks=2, model_dim=32, num_heads=2, ffn_dim=64,
        conv_kernel=4, chunk_size=4, left_context=1,
        moe_experts=4, moe_topk=2,
    )
    base.update(kw)
    return ConformerConfig(**base)


def _cfg(**kw):
    from ecog2txt_tpu.models.seq2seq import Seq2SeqConfig

    return Seq2SeqConfig(
        vocab_size=12, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(24,), aux_proj_sizes=(),
        aux_heads=(), dec_embedding_size=12, dec_rnn_sizes=(48,),
        max_dec_len=6, encoder_type="conformer", conformer=_ccfg(**kw),
    )


def test_capacity_path_matches_nodrop_when_ample():
    import jax
    import jax.numpy as jnp

    import ecog2txt_tpu.models.conformer as cf

    ccfg = _ccfg()
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 20)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 40, 20))
    lens = jnp.asarray([40, 25, 40])
    out, _, aux = cf.conformer_encode(p, ccfg, x, lens, return_aux=True)
    out_cap, _, aux_cap = cf.conformer_encode(
        p, ccfg._replace(moe_capacity_factor=8.0), x, lens,
        return_aux=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_cap), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(aux), float(aux_cap), rtol=1e-5
    )
    # grouped dispatch (time segments, incl. a non-dividing length →
    # internal padding) is the same function when capacity is ample
    out_seg, _, aux_seg = cf.conformer_encode(
        p, ccfg._replace(moe_capacity_factor=8.0, moe_group_size=12),
        x, lens, return_aux=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_seg), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(aux), float(aux_seg), rtol=1e-5)
    # tight capacity drops tokens: still finite, now differs
    out_t, _, _ = cf.conformer_encode(
        p, ccfg._replace(moe_capacity_factor=0.25), x, lens,
        return_aux=True,
    )
    assert np.isfinite(np.asarray(out_t)).all()
    assert np.abs(np.asarray(out_t) - np.asarray(out)).max() > 1e-4


def test_grads_flow_and_aux_reaches_loss():
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.seq2seq import init_seq2seq, seq2seq_loss

    cfg = _cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    B, T = 4, 64
    batch = {
        "encoder_inputs": jax.random.normal(
            jax.random.PRNGKey(1), (B, T, 8)
        ),
        "encoder_lengths": jnp.asarray([64, 48, 64, 32]),
        "decoder_targets": jnp.asarray(
            [[3, 4, 1, 0], [5, 1, 0, 0], [6, 7, 1, 0], [8, 1, 0, 0]]
        ),
        "decoder_lengths": jnp.asarray([3, 2, 3, 2]),
        "subject_idx": jnp.asarray(0, jnp.int32),
    }

    def loss_fn(p):
        return seq2seq_loss(p, cfg, batch, jax.random.PRNGKey(2))

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    assert "moe_aux" in metrics and np.isfinite(float(metrics["moe_aux"]))
    assert float(metrics["moe_aux"]) > 0  # weighted balance+z > 0
    ffn2 = grads["encoder"]["conformer"]["blocks"][0]["ffn2"]
    for key in ("wg", "w1", "w2"):
        assert float(jnp.abs(ffn2[key]).sum()) > 0, key
    # the aux term is part of the total: zeroing its weights changes loss
    cfg0 = _cfg(moe_aux_weight=0.0, moe_zloss_weight=0.0)
    loss0, m0 = seq2seq_loss(params, cfg0, batch, jax.random.PRNGKey(2))
    assert float(m0["moe_aux"]) == 0.0
    np.testing.assert_allclose(
        float(loss) - float(metrics["moe_aux"]), float(loss0),
        rtol=1e-5,
    )


def test_ep_sharded_step_matches_single_device():
    """dp=2 × ep=4 over the 8-device CPU mesh: loss and every gradient
    leaf match the unsharded computation (the EP einsums + XLA's
    inserted collectives compute the same function)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import make_mesh, shard_params_ep

    ccfg = _ccfg(moe_capacity_factor=2.0)
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 20)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 40, 20))
    lens = jnp.full((8,), 40)

    def loss(p, x):
        o, _, a = cf.conformer_encode(
            p, ccfg, x, lens, return_aux=True
        )
        return jnp.sum(o**2) * 1e-3 + a

    l0, g0 = jax.jit(jax.value_and_grad(loss))(p, x)
    mesh = make_mesh(n_data=2, n_model=4)
    pe = shard_params_ep(p, mesh, 4, axis="model")
    assert pe["blocks"][0]["ffn2"]["w1"].sharding.spec == P("model")
    assert pe["blocks"][0]["ffn2"]["wg"].sharding.spec == P()
    xe = jax.device_put(x, NamedSharding(mesh, P("data")))
    l1, g1 = jax.jit(jax.value_and_grad(loss))(pe, xe)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_capacity_independent_of_batch_padding():
    """With moe_group_size set, an example's capacity-path outputs are
    identical whatever length its batch was padded to — capacity is a
    config constant, pad tokens never consume slots.  Capacity is
    TIGHT here so drops actually occur and would differ if C scaled
    with the padded length (the bug this test pins)."""
    import jax
    import jax.numpy as jnp

    import ecog2txt_tpu.models.conformer as cf

    ccfg = _ccfg(moe_capacity_factor=0.5, moe_group_size=16)
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 20)
    row = jax.random.normal(jax.random.PRNGKey(1), (1, 40, 20))
    lens = jnp.asarray([40])
    outs = []
    for T in (40, 64, 96):  # includes T < and > multiples of seg
        x = jnp.zeros((1, T, 20)).at[:, :40].set(row)
        o, _, _ = cf.conformer_encode(p, ccfg, x, lens, return_aux=True)
        outs.append(np.asarray(o)[:, :40])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-6)


def test_dense_checkpoint_into_moe_trainer_switches_family_off():
    """update_net_from_saved_model on a DENSE conformer tree must turn
    moe_experts off in an MoE-constructed config (recover_model_sizes
    reports moe_experts=0 explicitly), so the restored dense params
    run the dense ffn2 branch."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.seq2seq import init_seq2seq
    from ecog2txt_tpu.utils.introspect import recover_model_sizes

    dense_cfg = _cfg(moe_experts=0)
    dense_params = init_seq2seq(jax.random.PRNGKey(0), dense_cfg)
    sizes = recover_model_sizes(dense_params, in_channels=8)
    assert sizes["conformer"]["moe_experts"] == 0

    moe_cfg = _cfg()  # constructed WITH experts
    rebuilt = dataclasses.replace(
        moe_cfg,
        conformer=moe_cfg.conformer._replace(**sizes["conformer"]),
    )
    assert rebuilt.conformer.moe_experts == 0
    # the dense tree runs under the rebuilt config
    import ecog2txt_tpu.models.conformer as cf

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16))
    out, _ = cf.conformer_encode(
        dense_params["encoder"]["conformer"], rebuilt.conformer, x,
        jnp.asarray([16, 16]),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_ep_requires_divisible_experts():
    import jax

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import make_mesh, shard_params_ep

    p = cf.init_conformer(jax.random.PRNGKey(0), _ccfg(moe_experts=6), 20)
    mesh = make_mesh(n_data=2, n_model=4)
    with pytest.raises(ValueError):
        shard_params_ep(p, mesh, 6, axis="model")


def test_moe_streamed_equals_offline():
    """The no-drop MoE is per-token — the streamed == offline contract
    holds EXACTLY, like the dense conformer."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.models.seq2seq import greedy_decode, init_seq2seq
    from ecog2txt_tpu.serve import StreamingConformerSession

    cfg = _cfg()
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    targets = ["<pad>", "<EOS>", "<OOV>"] + [f"w{i}_" for i in range(9)]
    rng = np.random.default_rng(3)
    raw = rng.normal(size=(117, 8)).astype(np.float32)
    L = len(raw)
    T = ((L + 3) // 4) * 4
    inputs = np.zeros((1, T, 8), np.float32)
    inputs[:, :L] = raw
    off = np.asarray(greedy_decode(
        params, cfg, jnp.asarray(inputs), jnp.asarray([L]),
        jnp.asarray(0, jnp.int32), temperature=0.0,
    ))
    sess = StreamingConformerSession(params, cfg, targets)
    for lo in range(0, L, 29):
        sess.push(raw[lo : lo + 29])
    out = sess.endpoint()
    np.testing.assert_array_equal(np.asarray(out["tokens"]), off)


def test_capacity_streaming_refused():
    import jax

    from ecog2txt_tpu.models.conformer import ConformerStream
    from ecog2txt_tpu.models.seq2seq import init_seq2seq
    from ecog2txt_tpu.serve import StreamingSessionPool

    cfg = _cfg(moe_capacity_factor=1.0)
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="no-drop"):
        ConformerStream(
            params["encoder"]["conformer"], cfg.conformer
        )
    with pytest.raises(ValueError, match="no-drop"):
        StreamingSessionPool(
            params, cfg, ["<pad>", "<EOS>", "<OOV>"], capacity=2
        )


def test_moe_flops_accounting():
    from ecog2txt_tpu.utils.flops import (
        conformer_encoder_forward_flops_per_step,
    )

    dense = conformer_encoder_forward_flops_per_step(
        _ccfg(moe_experts=0), 20
    )
    moe = conformer_encoder_forward_flops_per_step(_ccfg(), 20)
    ccfg = _ccfg()
    D, F, E = ccfg.model_dim, ccfg.ffn_dim, ccfg.moe_experts
    # per block: ffn2 (4DF) replaced by router (2DE) + topk·4DF
    expected = dense + ccfg.num_blocks * (
        2.0 * D * E + (ccfg.moe_topk - 1) * 4.0 * D * F
    )
    assert moe == expected


@pytest.mark.slow
def test_trainer_expert_parallel_fit(tmp_path):
    """dp=2 × ep=4 end-to-end through MultiSubjectTrainer.fit on the
    8-device CPU mesh: the jitted segment runs with the expert leaves
    sharded, the loss falls, and moe_aux is live in the loss metrics."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.models.seq2seq import seq2seq_loss
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(str(tmp_path / "exp"))
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "encoder_type": "conformer",
            "batch_size": 8, "temperature": 0.0,
            "learning_rate": 3e-3, "N_epochs": 30,
            "data_parallel": True, "expert_parallel": 4,
            "conformer": {"num_blocks": 2, "model_dim": 32,
                          "num_heads": 2, "ffn_dim": 64,
                          "chunk_size": 2, "left_context": 1,
                          "conv_kernel": 2, "moe_experts": 4,
                          "moe_topk": 2},
        },
        VERBOSE=False,
    )
    assert tr.ep == ("model", 4)
    assert dict(tr.mesh.shape) == {"data": 2, "model": 4}

    def probe():
        data = tr.device_data("training")
        batch = {k: v[0][:8] for k, v in data.items()}
        batch["subject_idx"] = jnp.asarray(0, jnp.int32)
        loss, metrics = seq2seq_loss(
            tr.state.params, tr.net_config, batch,
            jax.random.PRNGKey(7), train=False,
        )
        return float(loss), metrics

    loss0, _ = probe()
    tr.fit(assess=False)
    loss1, metrics = probe()
    assert np.isfinite(loss1) and loss1 < loss0
    assert np.isfinite(float(metrics["moe_aux"]))
    # expert leaves stayed sharded through the jitted steps
    from jax.sharding import PartitionSpec as P

    w1 = tr.state.params["encoder"]["conformer"]["blocks"][0]["ffn2"]["w1"]
    assert w1.sharding.spec == P("model")


@pytest.mark.slow
def test_ep_checkpoint_elastic_resume(tmp_path):
    """Topology-elastic resume: an ep-sharded checkpoint written on a
    dp=2 × ep=4 mesh restores onto a DIFFERENT mesh shape (dp=4 × ep=2)
    — and onto no mesh at all — and both resumed trainers follow the
    SAME trajectory (restore re-places host arrays; fit's _place_state
    shards them for whatever mesh the new trainer has)."""
    import jax

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(str(tmp_path / "exp"))
    base = {
        "encoder_type": "conformer",
        "batch_size": 8, "temperature": 0.0,
        "learning_rate": 3e-3, "N_epochs": 6,
        "conformer": {"num_blocks": 2, "model_dim": 32,
                      "num_heads": 2, "ffn_dim": 64,
                      "chunk_size": 2, "left_context": 1,
                      "conv_kernel": 2, "moe_experts": 4,
                      "moe_topk": 2},
    }

    def make(extra):
        return MultiSubjectTrainer(
            mp, [1], SN_kwargs={**base, **extra}, VERBOSE=False
        )

    first = make({"data_parallel": True, "expert_parallel": 4})
    assert dict(first.mesh.shape) == {"data": 2, "model": 4}
    first.fit(assess=False)
    first.save_checkpoint()

    resumed = {}
    for name, extra in (
        ("resharded", {"data_parallel": True, "expert_parallel": 2}),
        ("unsharded", {}),
    ):
        tr = make(extra)
        tr.restore()
        assert int(tr.state.epoch) == 6
        tr.fit(num_epochs=6, assess=False)
        resumed[name] = tr
    assert dict(resumed["resharded"].mesh.shape) == {"data": 4, "model": 2}
    w1 = resumed["resharded"].state.params[
        "encoder"]["conformer"]["blocks"][0]["ffn2"]["w1"]
    assert "model" in str(w1.sharding.spec)
    for a, b in zip(
        jax.tree.leaves(resumed["resharded"].state.params),
        jax.tree.leaves(resumed["unsharded"].state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=5e-4,
        )


def test_sp_moe_encode_and_aux_parity():
    """Sequence-parallel MoE encode: valid-region outputs AND the aux
    loss equal the single-device encode — the per-shard router stats
    psum before the nonlinear loss, halo replicas excluded
    (stats_start).  Gradients (incl. the router's) match too."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import halo_steps, sequence_parallel_encode

    ccfg = _ccfg()
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
    mesh = Mesh(np.array(jax.devices()), ("seq",))
    n = 8
    T = n * max(halo_steps(ccfg), 2 * ccfg.chunk_size)
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, T, 8))
    lens = jnp.asarray([T, T - 10])
    m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]
    ref, _, aux_ref = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
    out, aux = sequence_parallel_encode(
        p, ccfg, xs, mesh, axis="seq", lengths=lens, return_aux=True
    )
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

    def loss_sp(p):
        o, a = sequence_parallel_encode(
            p, ccfg, xs, mesh, axis="seq", lengths=lens, return_aux=True
        )
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    def loss_1(p):
        o, _, a = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    g_sp = jax.jit(jax.grad(loss_sp))(p)
    g_1 = jax.jit(jax.grad(loss_1))(p)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
    # the capacity path composes only with shard-aligned dispatch
    # groups (r5, RESULTS.md): without a moe_group_size the population
    # would differ between a halo window and the offline encode, so the
    # error carries the alignment guidance instead of the old blanket
    # "no-drop only" refusal
    with pytest.raises(ValueError, match="shard-aligned"):
        sequence_parallel_encode(
            p, ccfg._replace(moe_capacity_factor=1.0), xs, mesh,
            axis="seq", lengths=lens,
        )


def test_ep_sp_encode_and_aux_parity():
    """ep × sp (the long-recording MoE 2-D mesh): experts sharded over
    'model' INSIDE the time-sharded shard_map — each device runs its
    E/K experts on its time shard and partial combines psum over
    'model' (models/moe.py::_moe_nodrop).  Outputs, aux loss, and
    gradients (expert-leaf grads flow back through their shard) all
    equal the single-device encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import halo_steps, sequence_parallel_encode

    ccfg = _ccfg()  # moe_experts=4 → 2 experts per 'model' device
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
    mesh = Mesh(
        np.array(jax.devices()).reshape(4, 2), ("seq", "model")
    )
    n = 4
    T = n * max(halo_steps(ccfg), 2 * ccfg.chunk_size)
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, T, 8))
    lens = jnp.asarray([T, T - 10])
    m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]
    ref, _, aux_ref = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
    out, aux = sequence_parallel_encode(
        p, ccfg, xs, mesh, axis="seq", lengths=lens, return_aux=True,
        ep_axis="model",
    )
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

    def loss_epsp(p):
        o, a = sequence_parallel_encode(
            p, ccfg, xs, mesh, axis="seq", lengths=lens,
            return_aux=True, ep_axis="model",
        )
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    def loss_1(p):
        o, _, a = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    g_epsp = jax.jit(jax.grad(loss_epsp))(p)
    g_1 = jax.jit(jax.grad(loss_1))(p)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_epsp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
    # the capacity path under sp needs shard-aligned dispatch groups
    # (moe_group_size=0 groups per padded row — refused with guidance)
    with pytest.raises(ValueError, match="shard-aligned|moe_group_size"):
        sequence_parallel_encode(
            p, ccfg._replace(moe_capacity_factor=1.0), xs, mesh,
            axis="seq", lengths=lens, ep_axis="model",
        )


@pytest.mark.slow
def test_trainer_ep_sp_fit(tmp_path):
    """SN_kwargs expert_parallel × sequence_parallel (+dp) builds the
    (data=2, model=2, seq=2) mesh and trains the MoE conformer through
    the expert-sharded time-sharded encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.models.seq2seq import seq2seq_loss
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(str(tmp_path / "exp"))
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "encoder_type": "conformer",
            "sequence_parallel": 2, "expert_parallel": 2,
            "data_parallel": True,
            "batch_size": 8, "temperature": 0.0,
            "learning_rate": 3e-3, "N_epochs": 30,
            "conformer": {"num_blocks": 2, "model_dim": 32,
                          "num_heads": 2, "ffn_dim": 64,
                          "chunk_size": 2, "left_context": 1,
                          "conv_kernel": 2, "moe_experts": 4,
                          "moe_topk": 2},
        },
        VERBOSE=False,
    )
    assert dict(tr.mesh.shape) == {"data": 2, "model": 2, "seq": 2}
    assert tr.sp == (tr.mesh, "seq", "model")
    assert tr.ep == ("model", 4)

    def probe():
        data = tr.device_data("training")
        batch = {k: v[0][:8] for k, v in data.items()}
        batch["subject_idx"] = jnp.asarray(0, jnp.int32)
        loss, metrics = seq2seq_loss(
            tr.state.params, tr.net_config, batch,
            jax.random.PRNGKey(7), train=False,
        )
        return float(loss), metrics

    loss0, _ = probe()
    tr.fit(assess=False)
    loss1, metrics = probe()
    assert np.isfinite(loss1) and loss1 < loss0
    assert np.isfinite(float(metrics["moe_aux"]))
    w1 = tr.state.params["encoder"]["conformer"]["blocks"][0]["ffn2"]["w1"]
    assert w1.sharding.spec == P("model")


def test_pp_moe_encode_and_aux_parity():
    """Pipelined MoE encode equals the single-device encode for BOTH
    MoE paths (capacity groups never cross batch rows, so microbatching
    preserves every group's drops); fill/drain ticks are excluded from
    the psum-ed statistics."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import pipeline_conformer_encode

    for extra in ({}, {"moe_capacity_factor": 2.0, "moe_group_size": 16}):
        ccfg = _ccfg(num_blocks=4, **extra)
        p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
        B, T = 8, 48
        xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, 8))
        lens = jnp.asarray([48, 30, 48, 48, 20, 48, 48, 41])
        m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]
        ref, _, aux_ref = cf.conformer_encode(
            p, ccfg, xs, lens, return_aux=True
        )
        mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
        out, aux = pipeline_conformer_encode(
            p, ccfg, xs, mesh, axis="pp", microbatches=4, lengths=lens,
            return_aux=True,
        )
        np.testing.assert_allclose(
            np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)


def test_ep_pp_encode_and_aux_parity():
    """ep × pp: the MoE expert dim sharded over 'model' inside every
    pipeline stage (stacked expert leaves P('pp', None, 'model'); local
    E/K experts per device, partial combines psum over 'model').
    Outputs, aux, and gradients equal the single-device encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import pipeline_conformer_encode

    ccfg = _ccfg(num_blocks=4)  # 2 blocks per stage, 2 experts/device
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
    B, T = 8, 48
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, 8))
    lens = jnp.asarray([48, 30, 48, 48, 20, 48, 48, 41])
    m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]
    ref, _, aux_ref = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("pp", "model"))
    out, aux = pipeline_conformer_encode(
        p, ccfg, xs, mesh, axis="pp", microbatches=2, lengths=lens,
        return_aux=True, ep_axis="model",
    )
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

    def loss_eppp(p):
        o, a = pipeline_conformer_encode(
            p, ccfg, xs, mesh, axis="pp", microbatches=2, lengths=lens,
            return_aux=True, ep_axis="model",
        )
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    def loss_1(p):
        o, _, a = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    g_eppp = jax.jit(jax.grad(loss_eppp))(p)
    g_1 = jax.jit(jax.grad(loss_1))(p)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_eppp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_sp_pp_encode_and_aux_parity():
    """sp × pp: the time axis sharded over 'seq' (one input-halo
    ppermute) WHILE the block stack pipelines over 'pp' (GPipe ring) —
    halo windows flow through every stage, so the local span's outputs
    are exact.  Outputs, MoE aux (halo + fill/drain ticks excluded from
    the stats), and gradients all equal the single-device encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import halo_steps, sp_pp_conformer_encode

    for moe in (True, False):
        ccfg = _ccfg(num_blocks=4) if moe else _ccfg(
            num_blocks=4, moe_experts=0
        )
        p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
        mesh = Mesh(
            np.array(jax.devices()[:4]).reshape(2, 2), ("seq", "pp")
        )
        n = 2
        T = n * max(halo_steps(ccfg), 2 * ccfg.chunk_size)
        B = 4
        xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, 8))
        lens = jnp.asarray([T, T - 10, T, T // 2])
        m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]
        ref, _, aux_ref = cf.conformer_encode(
            p, ccfg, xs, lens, return_aux=True
        )
        res = sp_pp_conformer_encode(
            p, ccfg, xs, mesh, seq_axis="seq", pp_axis="pp",
            microbatches=2, lengths=lens, return_aux=moe,
        )
        out, aux = res if moe else (res, None)
        np.testing.assert_allclose(
            np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
        )
        if moe:
            np.testing.assert_allclose(
                float(aux), float(aux_ref), rtol=1e-5
            )

            def loss_sppp(p):
                o, a = sp_pp_conformer_encode(
                    p, ccfg, xs, mesh, seq_axis="seq", pp_axis="pp",
                    microbatches=2, lengths=lens, return_aux=True,
                )
                return jnp.sum((o * m) ** 2) * 1e-3 + a

            def loss_1(p):
                o, _, a = cf.conformer_encode(
                    p, ccfg, xs, lens, return_aux=True
                )
                return jnp.sum((o * m) ** 2) * 1e-3 + a

            g_sppp = jax.jit(jax.grad(loss_sppp))(p)
            g_1 = jax.jit(jax.grad(loss_1))(p)
            for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_sppp)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
                )


def test_ep_sp_pp_encode_and_aux_parity():
    """ep × sp × pp (the full 3-way): halo time shards over 'seq' flow
    through the GPipe ring over 'pp' while every stage's expert dim
    shards over 'model' (stacked leaves P('pp', None, 'model'); local
    E/K experts, partial combines psum over 'model').  Outputs, aux
    (halo + fill/drain ticks excluded from the router stats), and
    gradients all equal the single-device encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import halo_steps, sp_pp_conformer_encode

    ccfg = _ccfg(num_blocks=4)  # 2 blocks/stage, 2 experts/device
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
    mesh = Mesh(
        np.array(jax.devices()).reshape(2, 2, 2), ("seq", "pp", "model")
    )
    T = 2 * max(halo_steps(ccfg), 2 * ccfg.chunk_size)
    B = 4
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, 8))
    lens = jnp.asarray([T, T - 10, T, T // 2])
    m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]
    ref, _, aux_ref = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
    out, aux = sp_pp_conformer_encode(
        p, ccfg, xs, mesh, seq_axis="seq", pp_axis="pp",
        microbatches=2, lengths=lens, return_aux=True, ep_axis="model",
    )
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

    def loss_3way(p):
        o, a = sp_pp_conformer_encode(
            p, ccfg, xs, mesh, seq_axis="seq", pp_axis="pp",
            microbatches=2, lengths=lens, return_aux=True,
            ep_axis="model",
        )
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    def loss_1(p):
        o, _, a = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    g_3way = jax.jit(jax.grad(loss_3way))(p)
    g_1 = jax.jit(jax.grad(loss_1))(p)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_3way)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


@pytest.mark.slow
def test_trainer_ep_sp_pp_fit(tmp_path):
    """SN_kwargs expert_parallel × sequence_parallel ×
    pipeline_parallel builds the (data=1, seq=2, pp=2, model=2) 4-D
    mesh and trains the MoE conformer through the expert-sharded
    sp × pp encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.models.seq2seq import seq2seq_loss
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(str(tmp_path / "exp"))
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "encoder_type": "conformer",
            "sequence_parallel": 2,
            "pipeline_parallel": 2, "pipeline_microbatches": 2,
            "expert_parallel": 2,
            "batch_size": 8, "temperature": 0.0,
            "learning_rate": 3e-3, "N_epochs": 30,
            "conformer": {"num_blocks": 2, "model_dim": 32,
                          "num_heads": 2, "ffn_dim": 64,
                          "chunk_size": 2, "left_context": 1,
                          "conv_kernel": 2, "moe_experts": 4,
                          "moe_topk": 2},
        },
        VERBOSE=False,
    )
    assert dict(tr.mesh.shape) == {
        "data": 1, "seq": 2, "pp": 2, "model": 2
    }
    assert tr.pp == (tr.mesh, "pp", 2)
    assert tr.sp == (tr.mesh, "seq", "model")
    assert tr.ep == ("model", 4)

    def probe():
        data = tr.device_data("training")
        batch = {k: v[0][:8] for k, v in data.items()}
        batch["subject_idx"] = jnp.asarray(0, jnp.int32)
        loss, metrics = seq2seq_loss(
            tr.state.params, tr.net_config, batch,
            jax.random.PRNGKey(7), train=False,
        )
        return float(loss), metrics

    loss0, _ = probe()
    tr.fit(assess=False)
    loss1, metrics = probe()
    assert np.isfinite(loss1) and loss1 < loss0
    assert np.isfinite(float(metrics["moe_aux"]))
    w1 = tr.state.params["encoder"]["conformer"]["blocks"][0]["ffn2"]["w1"]
    assert w1.sharding.spec == P("model")


@pytest.mark.slow
def test_trainer_ep_pp_fit(tmp_path):
    """SN_kwargs expert_parallel × pipeline_parallel (+dp) builds the
    (data=2, pp=2, model=2) mesh and trains the MoE conformer through
    the expert-sharded pipeline ring."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.models.seq2seq import seq2seq_loss
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(str(tmp_path / "exp"))
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "encoder_type": "conformer",
            "pipeline_parallel": 2, "pipeline_microbatches": 2,
            "expert_parallel": 2, "data_parallel": True,
            "batch_size": 8, "temperature": 0.0,
            "learning_rate": 3e-3, "N_epochs": 30,
            "conformer": {"num_blocks": 2, "model_dim": 32,
                          "num_heads": 2, "ffn_dim": 64,
                          "chunk_size": 2, "left_context": 1,
                          "conv_kernel": 2, "moe_experts": 4,
                          "moe_topk": 2},
        },
        VERBOSE=False,
    )
    assert dict(tr.mesh.shape) == {"data": 2, "pp": 2, "model": 2}
    assert tr.pp == (tr.mesh, "pp", 2, "model")
    assert tr.ep == ("model", 4)

    def probe():
        data = tr.device_data("training")
        batch = {k: v[0][:8] for k, v in data.items()}
        batch["subject_idx"] = jnp.asarray(0, jnp.int32)
        loss, metrics = seq2seq_loss(
            tr.state.params, tr.net_config, batch,
            jax.random.PRNGKey(7), train=False,
        )
        return float(loss), metrics

    loss0, _ = probe()
    tr.fit(assess=False)
    loss1, metrics = probe()
    assert np.isfinite(loss1) and loss1 < loss0
    assert np.isfinite(float(metrics["moe_aux"]))
    w1 = tr.state.params["encoder"]["conformer"]["blocks"][0]["ffn2"]["w1"]
    assert w1.sharding.spec == P("model")


@pytest.mark.slow
def test_trainer_sp_moe_fit(tmp_path):
    """SN_kwargs sequence_parallel trains a MoE conformer end-to-end
    (the aux loss flows through the time-sharded encode)."""
    import jax
    import jax.numpy as jnp

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.models.seq2seq import seq2seq_loss
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(str(tmp_path / "exp"))
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "encoder_type": "conformer",
            "sequence_parallel": 2,
            "batch_size": 8, "temperature": 0.0,
            "learning_rate": 3e-3, "N_epochs": 20,
            "conformer": {"num_blocks": 2, "model_dim": 32,
                          "num_heads": 2, "ffn_dim": 64,
                          "chunk_size": 2, "left_context": 1,
                          "conv_kernel": 2, "moe_experts": 4,
                          "moe_topk": 2},
        },
        VERBOSE=False,
    )

    def probe():
        data = tr.device_data("training")
        batch = {k: v[0][:8] for k, v in data.items()}
        batch["subject_idx"] = jnp.asarray(0, jnp.int32)
        loss, metrics = seq2seq_loss(
            tr.state.params, tr.net_config, batch,
            jax.random.PRNGKey(7), train=False,
        )
        return float(loss), metrics

    loss0, _ = probe()
    tr.fit(assess=False)
    loss1, metrics = probe()
    assert np.isfinite(loss1) and loss1 < loss0
    assert float(metrics["moe_aux"]) > 0


@pytest.mark.slow
def test_assess_saved_moe_conformer_rebuilds(tmp_path):
    """assess_saved_model on a MoE-conformer checkpoint constructed
    with DIFFERENT conformer dims rebuilds blocks/dims/experts from the
    tensor shapes (utils/introspect.py conformer branch) and assesses."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    conf_a = {"num_blocks": 2, "model_dim": 32, "num_heads": 2,
              "ffn_dim": 64, "chunk_size": 4, "left_context": 1,
              "conv_kernel": 4, "moe_experts": 4, "moe_topk": 2}
    mp_a = make_demo_experiment(str(tmp_path / "a"), subject_ids=(1,))
    tr_a = MultiSubjectTrainer(
        mp_a, [1],
        SN_kwargs={"encoder_type": "conformer", "conformer": conf_a,
                   "batch_size": 16, "max_dec_len": 10,
                   "learning_rate": 3e-3, "temperature": 0.0},
        VERBOSE=False,
    )
    tr_a.fit(num_epochs=10, assess=False)
    tr_a.save_checkpoint()
    wer_a = tr_a.assess(["validation"])["validation"]["word_error_rate"]

    conf_b = dict(conf_a, num_blocks=1, model_dim=16, ffn_dim=32,
                  moe_experts=0)
    mp_b = make_demo_experiment(str(tmp_path / "b"), subject_ids=(1,))
    tr_b = MultiSubjectTrainer(
        mp_b, [1],
        SN_kwargs={"encoder_type": "conformer", "conformer": conf_b,
                   "max_dec_len": 10, "temperature": 0.0,
                   "checkpoint_dir": tr_a.checkpoint_dir},
        VERBOSE=False,
    )
    out = tr_b.assess_saved_model()
    cc = tr_b.net_config.conformer
    assert (cc.num_blocks, cc.model_dim, cc.ffn_dim, cc.conv_kernel,
            cc.moe_experts) == (2, 32, 64, 4, 4)
    # non-shape-recoverable fields carry over from construction
    assert (cc.num_heads, cc.chunk_size) == (2, 4)
    assert out["validation"]["word_error_rate"] == wer_a


def test_trainer_ep_requires_moe():
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        mp = make_demo_experiment(
            d, subject_ids=(1,), encoder_type="conformer"
        )
        with pytest.raises(ValueError, match="MoE"):
            MultiSubjectTrainer(
                mp, [1],
                SN_kwargs={"expert_parallel": 4},
                VERBOSE=False,
            )


def test_capacity_sp_parity_with_aligned_groups():
    """r5 (VERDICT r4 #6): the GShard capacity dispatch composes with
    sequence parallelism when the dispatch groups are shard-aligned
    (moe_group_size | per-shard steps AND | halo): every time shard's
    groups then have exactly the offline populations, so drops — and
    therefore outputs and gradients — equal the unsharded encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import halo_steps, sequence_parallel_encode

    # cf=0.75 → C=3 < the ~4 assignments/expert/group: real drops
    ccfg = _ccfg(moe_capacity_factor=0.75, moe_group_size=8)
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
    n = 4
    halo = halo_steps(ccfg)
    assert halo % 8 == 0  # the alignment this test exercises
    T = n * max(halo, 2 * ccfg.chunk_size)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("seq", "model"))
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, T, 8))
    lens = jnp.asarray([T, T - 10])
    m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]

    ref, _, aux_ref = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
    # sanity: this operating point actually drops (capacity binds) —
    # an ample-capacity run differs
    ample, _ = cf.conformer_encode(
        p, ccfg._replace(moe_capacity_factor=8.0), xs, lens
    )
    assert not np.allclose(np.asarray(ref) * m, np.asarray(ample) * m,
                           atol=1e-5)

    out, aux = sequence_parallel_encode(
        p, ccfg, xs, mesh, axis="seq", lengths=lens, return_aux=True,
    )
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

    # misaligned groups are refused with guidance
    with pytest.raises(ValueError, match="shard-aligned|moe_group_size"):
        sequence_parallel_encode(
            p, ccfg._replace(moe_group_size=12), xs, mesh,
            axis="seq", lengths=lens,
        )


def test_capacity_ep_sp_parity_and_grads():
    """Capacity dispatch × manual expert parallelism × sp: each 'model'
    device slices its E/K experts out of the replicated dispatch/combine
    one-hots (sharding the expert FFN and dispatch einsum FLOPs) and the
    linear combine psums — outputs, aux, and gradients equal the
    single-device capacity encode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import halo_steps, sequence_parallel_encode

    ccfg = _ccfg(moe_capacity_factor=0.75, moe_group_size=8)
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
    n = 4
    T = n * max(halo_steps(ccfg), 2 * ccfg.chunk_size)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("seq", "model"))
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, T, 8))
    lens = jnp.asarray([T, T - 10])
    m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]

    ref, _, aux_ref = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
    out, aux = sequence_parallel_encode(
        p, ccfg, xs, mesh, axis="seq", lengths=lens, return_aux=True,
        ep_axis="model",
    )
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

    def loss_epsp(p):
        o, a = sequence_parallel_encode(
            p, ccfg, xs, mesh, axis="seq", lengths=lens,
            return_aux=True, ep_axis="model",
        )
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    def loss_1(p):
        o, _, a = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
        return jnp.sum((o * m) ** 2) * 1e-3 + a

    g_epsp = jax.jit(jax.grad(loss_epsp))(p)
    g_1 = jax.jit(jax.grad(loss_1))(p)
    for a, b in zip(jax.tree.leaves(g_1), jax.tree.leaves(g_epsp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_capacity_ep_sp_pp_parity():
    """Capacity dispatch through the full ep × sp × pp 3-way (the
    GPipe ring over halo time shards with expert-sharded stages)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import ecog2txt_tpu.models.conformer as cf
    from ecog2txt_tpu.parallel import halo_steps, sp_pp_conformer_encode

    ccfg = _ccfg(
        num_blocks=4, moe_capacity_factor=0.75, moe_group_size=8
    )  # 2 blocks/stage, 2 experts/device
    p = cf.init_conformer(jax.random.PRNGKey(0), ccfg, 8)
    mesh = Mesh(
        np.array(jax.devices()).reshape(2, 2, 2), ("seq", "pp", "model")
    )
    halo = halo_steps(ccfg)
    assert halo % 8 == 0
    T = 2 * max(halo, 2 * ccfg.chunk_size)
    xs = jax.random.normal(jax.random.PRNGKey(3), (4, T, 8))
    lens = jnp.asarray([T, T - 6, T - 1, T])
    m = (np.arange(T)[None, :] < np.asarray(lens)[:, None])[..., None]

    ref, _, aux_ref = cf.conformer_encode(p, ccfg, xs, lens, return_aux=True)
    out, aux = sp_pp_conformer_encode(
        p, ccfg, xs, mesh, seq_axis="seq", pp_axis="pp",
        microbatches=2, lengths=lens, return_aux=True, ep_axis="model",
    )
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)
