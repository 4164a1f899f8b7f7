"""Mesh/sharding tests on the 8-virtual-device CPU mesh (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.parallel import (
    batch_sharding,
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_params_tp,
)


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_tp_sharding_targets_wide_kernels():
    from ecog2txt_tpu.models import Seq2SeqConfig, init_seq2seq

    cfg = Seq2SeqConfig(
        vocab_size=64, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(16,), aux_proj_sizes=(8,),
        dec_embedding_size=8, dec_rnn_sizes=(32,), max_dec_len=4,
    )
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params_tp(init_seq2seq(jax.random.PRNGKey(0), cfg), mesh)
    # LSTM gate kernel (16, 64): last dim divisible by 2 → sharded
    wh = params["encoder"]["rnn"][0]["fwd"]["wh"]
    spec = wh.sharding.spec
    assert spec[-1] == "model"
    # vocab projection sharded too
    out_w = params["decoder"]["out"]["w"]
    assert out_w.sharding.spec[-1] == "model"
    # the SUBSAMPLE conv stays replicated (r5: a feature-sharded conv
    # weight meeting a 'seq'-sharded raw input miscompiles in GSPMD's
    # conv partitioner — minimal repro in RESULTS.md; its width is
    # sub-tile anyway)
    conv_w = params["subnet"]["conv"][0]["w"]
    assert all(s is None for s in conv_w.sharding.spec), conv_w.sharding


def test_tp_conformer_conv_module_pointwise_still_sharded():
    """The exclusion is the subsample stack ONLY: the conformer conv
    MODULE's pointwise kernels (blocks[i]['conv']['pw1']) are real tp
    targets and keep their 'model' sharding."""
    from ecog2txt_tpu.models import Seq2SeqConfig, init_seq2seq
    from ecog2txt_tpu.models.conformer import ConformerConfig

    cfg = Seq2SeqConfig(
        vocab_size=64, num_subjects=1, in_channels=8, conv_sizes=(16,),
        decimation_factor=4, rnn_sizes=(16,), aux_proj_sizes=(8,),
        dec_embedding_size=8, dec_rnn_sizes=(32,), max_dec_len=4,
        encoder_type="conformer",
        conformer=ConformerConfig(
            num_blocks=1, model_dim=64, num_heads=2, ffn_dim=128,
            conv_kernel=4, chunk_size=4, left_context=1,
        ),
    )
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params_tp(init_seq2seq(jax.random.PRNGKey(0), cfg), mesh)
    pw1 = params["encoder"]["conformer"]["blocks"][0]["conv"]["pw1"]
    assert pw1.sharding.spec[-1] == "model", pw1.sharding
    conv_w = params["subnet"]["conv"][0]["w"]
    assert all(s is None for s in conv_w.sharding.spec), conv_w.sharding


def test_dp_train_step_runs_and_reduces():
    """Data-parallel step over the 8-device mesh: loss finite, params
    update identically to the replicated math."""
    mesh = make_mesh()

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    import optax

    optimizer = optax.sgd(0.1)
    params = {"w": jnp.ones((4, 2))}
    params = replicate(params, mesh)
    ema = jax.tree.map(jnp.copy, params)
    opt_state = replicate(optimizer.init(params), mesh)
    rng = np.random.default_rng(0)
    batch = {
        "x": jax.device_put(
            jnp.asarray(rng.normal(size=(16, 4)), jnp.float32),
            batch_sharding(mesh),
        ),
        "y": jax.device_put(
            jnp.asarray(rng.normal(size=(16, 2)), jnp.float32),
            batch_sharding(mesh),
        ),
    }
    step = make_dp_train_step(loss_fn, optimizer, 0.9, mesh)
    with mesh:
        params2, ema2, _, loss, _ = step(
            params, ema, opt_state, batch, jax.random.PRNGKey(0)
        )
    assert np.isfinite(float(loss))
    # manual replicated update for comparison
    g = jax.grad(lambda p: loss_fn(p, batch, None)[0])({"w": jnp.ones((4, 2))})
    expected = 1.0 - 0.1 * np.asarray(g["w"])
    np.testing.assert_allclose(np.asarray(params2["w"]), expected, rtol=1e-5)


def test_trainer_data_parallel_end_to_end(tmp_path):
    """MultiSubjectTrainer with data_parallel=True trains over the
    8-device mesh and still learns."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,),
        layer_sizes={
            "encoder_embedding": [16], "encoder_rnn": [24],
            "encoder_1_projection": [16], "decoder_embedding": [12],
            "decoder_rnn": [48], "decoder_projection": [],
        },
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={
            "batch_size": 16,  # 2 per device
            "max_dec_len": 10, "learning_rate": 3e-3,
            "N_epochs": 40, "data_parallel": True,
        },
        VERBOSE=False,
    )
    assert tr.mesh is not None and tr.mesh.shape["data"] == 8
    history = tr.fit()
    wers = [h["training"]["word_error_rate"] for h in history.values()]
    # EMA-assessed WER lags early; by 40 epochs it must clearly fall
    assert wers[-1] < wers[0] - 0.05, f"no learning under dp: {wers}"


@pytest.mark.slow
def test_graft_entry_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # asserts finite loss internally
