"""End-to-end trainer tests (SURVEY §4: synthetic-subject featurize →
train tiny model → WER falls on memorizable data)."""

import os

import numpy as np
import pytest

from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.train import MultiSubjectTrainer

TINY = {
    "encoder_embedding": [24],
    "encoder_rnn": [32, 32],
    "encoder_1_projection": [24],
    "decoder_embedding": [16],
    "decoder_rnn": [64],
    "decoder_projection": [],
}


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    mp = make_demo_experiment(
        str(root / "exp"), subject_ids=(1,), layer_sizes=TINY, N_epochs=40
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10, "learning_rate": 3e-3},
        VERBOSE=False,
    )
    tr.history = tr.parallel_transfer_learn()
    return tr


def test_learning_happens(trainer):
    wers = [
        snap["training"]["word_error_rate"]
        for snap in trainer.history.values()
    ]
    assert wers[-1] < wers[0] - 0.2, f"no learning: {wers}"
    assert wers[-1] < 0.7


def test_assessment_structure(trainer):
    snap = list(trainer.history.values())[-1]
    for partition in ("training", "validation"):
        s = snap[partition]
        assert 0 <= s["word_error_rate"]
        assert 0 <= s["accuracy"] <= 1
        assert s["decoder_confusions"].shape[0] == trainer.net_config.vocab_size
        assert len(s["references"]) == len(s["hypotheses"])


def test_results_file_format(trainer):
    results_dir = trainer.manifest.resolve("saved_results_dir")
    files = [f for f in os.listdir(results_dir) if f.startswith("accuracies_")]
    assert files
    lines = open(os.path.join(results_dir, files[0])).read().splitlines()
    assert len(lines) == len(trainer.history)
    cols = lines[-1].split()
    assert len(cols) == 5  # train acc, train WER, val acc, val WER, epoch
    assert int(cols[-1]) == int(trainer.state.epoch)


def test_checkpoint_roundtrip(trainer):
    wer_before = trainer.assess(["validation"])["validation"]["word_error_rate"]
    epoch = int(trainer.state.epoch)
    import jax

    # perturb, then restore
    orig = trainer.state
    trainer.state = trainer.state._replace(
        ema=jax.tree.map(lambda a: a * 0.0, trainer.state.ema)
    )
    out = trainer.assess_saved_model(restore_epoch=epoch)
    assert out["validation"]["word_error_rate"] == pytest.approx(wer_before)
    assert int(trainer.state.epoch) == epoch


def test_restore_epoch_discovery(trainer):
    assert trainer.restore_epoch == int(trainer.state.epoch)


def test_subject_to_table(trainer):
    table = trainer.subject_to_table()
    assert table.loc[1, "channels"] == 16
    assert table.loc[1, "decimation"] == 12


def test_print_tensor_names(trainer):
    names = trainer.print_tensor_names()
    assert any(name.startswith("seq2seq/subnet") for name in names)
    assert any(name.startswith("seq2seq/encoder") for name in names)
    assert any(name.startswith("seq2seq/decoder") for name in names)


def test_saliency_shape(trainer):
    sal = trainer.get_saliencies("decoder_targets", "validation")
    ds = trainer.packed_dataset("validation")
    assert sal.shape[0] == int(ds.num_trials.sum())
    assert sal.shape[2] == trainer.net_config.in_channels
    assert np.abs(sal).sum() > 0


def test_encoder_embedding_shape(trainer):
    w = trainer.get_encoder_embedding()
    d = trainer.net_config.conv_strides[0]
    assert w.shape == (d * 16, 24)


def test_internal_activations(trainer):
    """The FULL probe (reference trainers.py:757-833): model-order
    (reversed) inputs, convolved inputs, and the reversed+decimated aux
    targets, alongside encoder outputs/final state."""
    acts = trainer.get_internal_activations("validation")
    assert acts["encoder_outputs"].shape[0] == 10
    assert acts["final_state_h"].shape == (10, 64)
    ds = trainer.packed_dataset("validation")
    s = ds.num_subjects - 1
    cfg = trainer.net_config
    T, C = ds.encoder_inputs.shape[2:]
    # reversed raw inputs: valid prefix flipped, padding untouched
    assert acts["model_order_inputs"].shape == (10, T, C)
    L = int(ds.encoder_lengths[s, 0])
    np.testing.assert_allclose(
        acts["model_order_inputs"][0, :L],
        ds.encoder_inputs[s, 0, :L][::-1],
    )
    # convolved inputs at the decimated rate, conv width features
    T_out = acts["encoder_outputs"].shape[1]
    assert acts["convolved_inputs"].shape == (
        10, T_out, cfg.conv_sizes[-1],
    )
    # aux target aligned to encoder steps: reversed + decimated
    aux = acts["aux_targets"]["encoder_1_targets"]
    assert aux.shape == (10, T_out)
    d = cfg.decimation_factor
    raw = ds.aux_targets["encoder_1_targets"][s, 0]
    expect = np.concatenate([raw[:L][::-1], raw[L:]])[: T_out * d : d]
    np.testing.assert_array_equal(aux[0], expect)


def test_tf_record_to_numpy(trainer):
    ex = next(trainer.tf_record_to_numpy_data(block=1))
    assert "ecog_sequence" in ex and "text_sequence" in ex


def test_vocab_pickle_created_when_induced(tmp_path):
    # induced path (no vocab file configured) writes the pickle
    mp = make_demo_experiment(
        str(tmp_path / "exp2"), subject_ids=(1,), layer_sizes=TINY
    )
    import yaml

    raw = yaml.safe_load(open(mp))
    for m in raw.values():
        m.pop("text_sequence_vocab_file")
        m.pop("phoneme_sequence_vocab_file")
    yaml.safe_dump(raw, open(mp, "w"))
    tr = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"max_dec_len": 10}, VERBOSE=False
    )
    assert os.path.exists(
        os.path.join(tr.checkpoint_dir, "text_sequence_vocab_file.pkl")
    )
    # special tokens prepended in order
    fl = tr.target_subject.data_manifests["decoder_targets"].feature_list
    assert fl[:3] == ["<pad>", "<EOS>", "<OOV>"]


def test_warmup_schedule_trains(tmp_path):
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                   "warmup_steps": 10, "lr_schedule": "warmup_cosine"},
        VERBOSE=False,
    )
    history = tr.fit(num_epochs=4)
    assert history


def test_checkpoint_every_assessment_and_resume(tmp_path):
    """Crash-recovery path: periodic checkpoints during fit, then a
    fresh trainer resumes from the newest one."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY,
        assessment_epoch_interval=5,
    )
    kwargs = {"batch_size": 16, "max_dec_len": 10,
              "checkpoint_every_assessment": True}
    tr = MultiSubjectTrainer(mp, [1], SN_kwargs=kwargs, VERBOSE=False)
    tr.fit(num_epochs=10, assess=False)
    assert tr.restore_epoch == 10
    # "crash": fresh trainer, resume picks up epoch 10 and continues
    tr2 = MultiSubjectTrainer(mp, [1], SN_kwargs=kwargs, VERBOSE=False)
    tr2.parallel_transfer_learn(RESUME=True, num_epochs=5, assess=False)
    assert int(tr2.state.epoch) == 15


def test_compute_dtype_wiring(tmp_path):
    import jax.numpy as jnp

    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"max_dec_len": 10, "compute_dtype": "bfloat16"},
        VERBOSE=False,
    )
    assert tr.net_config.compute_dtype == jnp.bfloat16
    history = tr.fit(num_epochs=4)
    assert history  # trains under bf16 compute


def test_divergence_detection_and_rollback(tmp_path):
    """Failure detection: a diverged (NaN) segment raises after rolling
    back to the newest checkpoint."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY,
        assessment_epoch_interval=5,
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                   "checkpoint_every_assessment": True},
        VERBOSE=False,
    )
    tr.fit(num_epochs=5, assess=False)  # good checkpoint at epoch 5
    # force divergence; the runner cache is keyed on learning_rate so
    # mutating it takes effect without clearing private state
    tr.learning_rate = 1e18
    with pytest.raises(FloatingPointError, match="restored checkpoint"):
        tr.fit(num_epochs=5, assess=False)
    assert int(tr.state.epoch) == 5  # rolled back, not left NaN
    import jax
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree.leaves(tr.state.params)
    )


@pytest.mark.slow
def test_assess_saved_model_rebuilds_architecture(tmp_path):
    """Assessing a checkpoint whose layer_sizes differ from the
    constructed trainer rebuilds the net from checkpoint shapes and
    reproduces the original WER (reference update_net_from_saved_model,
    trainers.py:383-408; VERDICT #2)."""
    mp_a = make_demo_experiment(
        str(tmp_path / "a"), subject_ids=(1,), layer_sizes=TINY
    )
    tr_a = MultiSubjectTrainer(
        mp_a, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                   "learning_rate": 3e-3, "temperature": 0.0},
        VERBOSE=False,
    )
    tr_a.fit(num_epochs=15, assess=False)
    tr_a.save_checkpoint()
    wer_a = tr_a.assess(["validation"])["validation"]["word_error_rate"]

    other = {
        "encoder_embedding": [20],
        "encoder_rnn": [28],
        "encoder_1_projection": [20],
        "decoder_embedding": [14],
        "decoder_rnn": [56],
        "decoder_projection": [],
    }
    mp_b = make_demo_experiment(
        str(tmp_path / "b"), subject_ids=(1,), layer_sizes=other
    )
    tr_b = MultiSubjectTrainer(
        mp_b, [1],
        SN_kwargs={"max_dec_len": 10, "temperature": 0.0,
                   "checkpoint_dir": tr_a.checkpoint_dir},
        VERBOSE=False,
    )
    assert tr_b.net_config.rnn_sizes != tr_a.net_config.rnn_sizes
    out = tr_b.assess_saved_model()
    # architecture recovered from A's checkpoint...
    assert tr_b.net_config.rnn_sizes == tr_a.net_config.rnn_sizes
    assert tr_b.net_config.conv_sizes == tr_a.net_config.conv_sizes
    assert tr_b.net_config.dec_rnn_sizes == tr_a.net_config.dec_rnn_sizes
    # ...and A's assessment reproduced exactly
    assert out["validation"]["word_error_rate"] == pytest.approx(wer_a)


def test_assessment_temperature_knob_is_live(trainer):
    """The manifest's ``temperature`` (0.384 in the demo, mirroring
    mocha-1_word_sequence.yaml:82) drives the assessment decode; an
    SN_kwargs override changes the compiled decode fn."""
    assert trainer.temperature == pytest.approx(0.384)
    sampled = trainer._decode_fn()
    trainer.SN_kwargs["temperature"] = 0.0
    try:
        greedy = trainer._decode_fn()
        assert greedy is not sampled  # knob rebuilds the decode path
        # sampled decode is reproducible under a fixed rng
        import jax
        import jax.numpy as jnp

        ds = trainer.packed_dataset("validation")
        rng = jax.random.PRNGKey(0)
        args = (
            trainer.state.ema,
            jnp.asarray(ds.encoder_inputs[0]),
            jnp.asarray(ds.encoder_lengths[0]),
            jnp.asarray(0, jnp.int32),
        )
        a = np.asarray(sampled(*args, rng))
        b = np.asarray(sampled(*args, rng))
        np.testing.assert_array_equal(a, b)
    finally:
        trainer.SN_kwargs.pop("temperature", None)


def test_beam_composes_with_temperature(trainer):
    """beam_width > 1 + temperature > 0: the tempered beam path decodes
    (VERDICT #4: the knobs compose instead of being exclusive)."""
    import jax
    import jax.numpy as jnp

    trainer.beam_width = 3
    try:
        decode = trainer._decode_fn()
        ds = trainer.packed_dataset("validation")
        tokens = np.asarray(
            decode(
                trainer.state.ema,
                jnp.asarray(ds.encoder_inputs[0]),
                jnp.asarray(ds.encoder_lengths[0]),
                jnp.asarray(0, jnp.int32),
                jax.random.PRNGKey(0),
            )
        )
        assert tokens.shape == (ds.encoder_inputs.shape[1],
                                trainer.net_config.max_dec_len)
    finally:
        trainer.beam_width = 1
        trainer._decode_fn()  # restore the greedy/sampled path


def test_restricted_clone_inherits_generator_overrides(tmp_path):
    """restricted_to_trials forwards DG/ES/vocab kwargs, so a
    perf-vs-training-size sweep retrains the SAME experiment
    (VERDICT #5: the clone used to drop them silently)."""
    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 8, "max_dec_len": 10},
        DG_kwargs={"noise_scale": 0.11, "grid_step": 2},
        ES_kwargs={"decimation_factor": 6},
        VERBOSE=False,
    )
    gen = tr.target_subject.data_generator
    assert gen.noise_scale == 0.11 and gen.grid_step == 2
    assert tr.target_subject.decimation_factor == 6
    clone = tr.restricted_to_trials(range(8))
    cgen = clone.target_subject.data_generator
    assert cgen.noise_scale == 0.11 and cgen.grid_step == 2
    assert clone.target_subject.decimation_factor == 6
    ds = clone.packed_dataset("training")
    assert int(ds.num_trials[0]) == 8

    from ecog2txt_tpu.experiments import _restricted_trainer

    sweep = _restricted_trainer(tr, learning_rate=1e-4)
    sgen = sweep.target_subject.data_generator
    assert sgen.noise_scale == 0.11 and sgen.grid_step == 2
    assert sweep.learning_rate == pytest.approx(1e-4)


@pytest.mark.slow
def test_streaming_sharded_training(tmp_path):
    """max_device_trials < corpus: host-sharded streaming path trains
    and matches epoch accounting."""
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 8, "max_dec_len": 10, "learning_rate": 3e-3,
                   "max_device_trials": 16},  # 40 trials -> 3 shards
        VERBOSE=False,
    )
    history = tr.fit(num_epochs=20)
    assert int(tr.state.epoch) == 20
    wers = [h["training"]["word_error_rate"] for h in history.values()]
    assert wers[-1] < wers[0]  # learns through the sharded path


def test_async_checkpoint_roundtrip(tmp_path):
    """save_checkpoint(wait=False) overlaps IO with the caller; any
    later restore first waits for the in-flight write and reads back
    identical params."""
    import jax
    import jax.numpy as jnp

    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"batch_size": 16, "max_dec_len": 10},
        VERBOSE=False,
    )
    tr.fit(num_epochs=2, assess=False)
    before = jax.tree.map(jnp.asarray, tr.state.params)
    path = tr.save_checkpoint(wait=False)
    assert tr._async_ckptr is not None
    tr.restore()  # waits for the async write, then reads it
    assert tr._async_ckptr is None
    for a, b in zip(
        jax.tree.leaves(before), jax.tree.leaves(tr.state.params)
    ):
        assert jnp.array_equal(a, jnp.asarray(b))
    assert int(tr.state.epoch) == 2 and path.endswith("ckpt-2")
