"""Rayleigh aux head (VERDICT r4 missing #3): the schema's declared
``distribution`` for nonnegative analytic amplitudes (subjects.py:43;
reference subjects.py:369-384) drives a real NLL head — and an
undeclared distribution is a hard error, not silent MSE."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.models.seq2seq import (
    AuxHead,
    Seq2SeqConfig,
    init_seq2seq,
    rayleigh_nll,
    seq2seq_loss,
)
from ecog2txt_tpu.train import MultiSubjectTrainer

TINY = {
    "encoder_embedding": [16],
    "encoder_rnn": [24],
    "encoder_1_projection": [16],
    "decoder_embedding": [12],
    "decoder_rnn": [48],
    "decoder_projection": [],
}


def test_rayleigh_nll_matches_scipy():
    """rayleigh_nll is the exact −logpdf of scipy.stats.rayleigh."""
    from scipy import stats

    rng = np.random.default_rng(0)
    x = rng.rayleigh(scale=1.7, size=(5, 3)).astype(np.float32)
    log_sigma = rng.normal(size=(5, 3)).astype(np.float32)
    got = np.asarray(rayleigh_nll(jnp.asarray(log_sigma), jnp.asarray(x)))
    want = -stats.rayleigh.logpdf(x, scale=np.exp(log_sigma))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rayleigh_nll_mle_is_stationary():
    """∂(mean NLL)/∂logσ vanishes at the Rayleigh MLE σ²=mean(x²)/2."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.rayleigh(scale=0.4, size=4096).astype(np.float32))
    sigma_mle = jnp.sqrt(jnp.mean(jnp.square(x)) / 2.0)

    def mean_nll(log_sigma):
        return jnp.mean(rayleigh_nll(log_sigma, x))

    g = jax.grad(mean_nll)(jnp.log(sigma_mle))
    assert abs(float(g)) < 1e-4
    # and it really is a minimum: nearby σ score worse
    assert float(mean_nll(jnp.log(sigma_mle))) < float(
        mean_nll(jnp.log(sigma_mle) + 0.3)
    )
    assert float(mean_nll(jnp.log(sigma_mle))) < float(
        mean_nll(jnp.log(sigma_mle) - 0.3)
    )


def _tiny_cfg(distribution: str) -> Seq2SeqConfig:
    return Seq2SeqConfig(
        vocab_size=16,
        num_subjects=1,
        in_channels=8,
        conv_sizes=(8,),
        decimation_factor=2,
        rnn_sizes=(8,),
        aux_proj_sizes=(8,),
        aux_heads=(AuxHead("encoder_1_targets", distribution, 8),),
        dec_embedding_size=4,
        dec_rnn_sizes=(8,),
        max_dec_len=4,
    )


def _tiny_batch(cfg, B=2, T=12, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "encoder_inputs": jnp.asarray(
            rng.rayleigh(scale=0.5, size=(B, T, cfg.in_channels)).astype(
                np.float32
            )
        ),
        "encoder_lengths": jnp.full((B,), T, jnp.int32),
        "decoder_targets": jnp.asarray(
            rng.integers(3, cfg.vocab_size, size=(B, 4)).astype(np.int32)
        ),
        "decoder_lengths": jnp.full((B,), 4, jnp.int32),
        # ecog-as-target: the aux head regresses the input amplitudes
        "encoder_1_targets": None,  # filled below
        "subject_idx": jnp.asarray(0, jnp.int32),
    }


def test_rayleigh_head_loss_is_finite_and_head_specific():
    cfg = _tiny_cfg("Rayleigh")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg)
    batch["encoder_1_targets"] = batch["encoder_inputs"]
    loss, metrics = seq2seq_loss(
        params, cfg, batch, jax.random.PRNGKey(1), train=False
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["loss_encoder_1_targets"]))

    # the Gaussian head on the same data gives a DIFFERENT loss (the
    # declared distribution is honored, not routed to MSE)
    cfg_g = _tiny_cfg("Gaussian")
    loss_g, metrics_g = seq2seq_loss(
        params, cfg_g, batch, jax.random.PRNGKey(1), train=False
    )
    assert float(metrics_g["loss_encoder_1_targets"]) != pytest.approx(
        float(metrics["loss_encoder_1_targets"])
    )


def test_unknown_distribution_raises():
    cfg = _tiny_cfg("Laplace")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg)
    batch["encoder_1_targets"] = batch["encoder_inputs"]
    with pytest.raises(ValueError, match="unknown distribution"):
        seq2seq_loss(params, cfg, batch, jax.random.PRNGKey(1))


def test_torch_engine_rayleigh_matches_jax():
    """Engine parity: the torch mirror computes the same Rayleigh aux
    loss for the same params/batch."""
    torch = pytest.importorskip("torch")
    from ecog2txt_tpu import torch_engine as te

    cfg = _tiny_cfg("Rayleigh")
    params = init_seq2seq(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg)
    batch["encoder_1_targets"] = batch["encoder_inputs"]
    loss_j, metrics_j = seq2seq_loss(
        params, cfg, batch, jax.random.PRNGKey(1), train=False
    )
    net = te.TorchSequenceNetwork(cfg, params)
    tbatch = {
        k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()
    }
    loss_t, metrics_t = te.seq2seq_loss(
        net.params, cfg, tbatch, train=False
    )
    np.testing.assert_allclose(
        float(metrics_t["loss_encoder_1_targets"]),
        float(metrics_j["loss_encoder_1_targets"]),
        rtol=1e-4,
    )


def test_e2e_ecog_as_rayleigh_target(tmp_path):
    """End-to-end: a data_mapping with ecog as an aux target builds a
    Rayleigh head from the schema default and trains to finite,
    improving loss."""
    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY,
        data_mapping={
            "encoder_inputs": "ecog_sequence",
            "encoder_1_targets": "ecog_sequence",  # Rayleigh by default
            "decoder_targets": "text_sequence",
        },
        ecog_sequence_penalty_scale=0.05,
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                   "learning_rate": 3e-3},
        VERBOSE=False,
    )
    head = [h for h in tr.net_config.aux_heads
            if h.name == "encoder_1_targets"][0]
    assert head.distribution == "Rayleigh"
    assert head.out_dim == tr.target_subject.data_generator.num_ECoG_channels

    def probe():
        data = tr.device_data("training")
        batch = {k: v[0][:16] for k, v in data.items()}
        batch["subject_idx"] = jnp.asarray(0, jnp.int32)
        _, metrics = seq2seq_loss(
            tr.state.params, tr.net_config, batch,
            jax.random.PRNGKey(7), train=False,
        )
        return float(metrics["loss_encoder_1_targets"])

    loss0 = probe()
    tr.fit(num_epochs=8, assess=False)
    loss1 = probe()
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0  # the σ head actually fits
