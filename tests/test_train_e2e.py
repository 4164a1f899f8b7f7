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
    acts = trainer.get_internal_activations("validation")
    assert acts["encoder_outputs"].shape[0] == 10
    assert acts["final_state_h"].shape == (10, 64)


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
    tr.learning_rate = 1e18  # force divergence
    tr._runner_cache = {}
    with pytest.raises(FloatingPointError, match="restored checkpoint"):
        tr.fit(num_epochs=5, assess=False)
    assert int(tr.state.epoch) == 5  # rolled back, not left NaN
    import jax
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree.leaves(tr.state.params)
    )


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
