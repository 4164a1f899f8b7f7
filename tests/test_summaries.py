"""TensorBoard summaries: the ``tf_summaries_dir`` manifest key.

The reference forwards this key to its TF2 trainer through ST_kwargs
(reference trainers.py:110-115; set in every shipped manifest, e.g.
mocha-1_word_sequence.yaml:85).  Here: the TF-free event writer's files
must load through TensorFlow's own ``summary_iterator`` (byte-level
compatibility), our readback must agree, and a trainer ``fit`` with the
key set must emit the training curves.
"""

import glob
import os

import numpy as np
import pytest

from ecog2txt_tpu.utils.summaries import SummaryWriter, iter_events


def _write_demo_events(logdir):
    with SummaryWriter(logdir) as writer:
        writer.scalar("loss/total", 1.5, step=1)
        writer.scalars(
            {"validation/word_error_rate": 0.25, "validation/accuracy": 0.75},
            step=10,
        )
        return writer.path


def test_tensorflow_reads_our_events(tmp_path):
    tf = pytest.importorskip("tensorflow")
    path = _write_demo_events(str(tmp_path))
    events = list(tf.compat.v1.train.summary_iterator(path))
    assert events[0].file_version == "brain.Event:2"
    assert events[0].wall_time > 1.7e9
    assert events[1].step == 1
    (value,) = events[1].summary.value
    assert value.tag == "loss/total"
    assert value.simple_value == 1.5
    assert events[2].step == 10
    got = {v.tag: v.simple_value for v in events[2].summary.value}
    assert got == {
        "validation/word_error_rate": 0.25,
        "validation/accuracy": 0.75,
    }


def test_iter_events_roundtrip(tmp_path):
    path = _write_demo_events(str(tmp_path))
    events = list(iter_events(path))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["scalars"] == {"loss/total": 1.5}
    assert events[2]["step"] == 10
    assert events[2]["scalars"]["validation/accuracy"] == 0.75
    assert all(e["wall_time"] > 1.7e9 for e in events)


def test_trainer_writes_training_curves(tmp_path):
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    mp = make_demo_experiment(
        str(tmp_path / "exp"),
        subject_ids=(1,),
        layer_sizes={
            "encoder_embedding": [8],
            "encoder_rnn": [12],
            "encoder_1_projection": [8],
            "decoder_embedding": [8],
            "decoder_rnn": [16],
            "decoder_projection": [],
        },
    )
    logdir = str(tmp_path / "tb")
    trainer = MultiSubjectTrainer(
        mp,
        [1],
        SN_kwargs={
            "batch_size": 16,
            "max_dec_len": 6,
            "N_epochs": 2,
            "tf_summaries_dir": logdir,
        },
        VERBOSE=False,
    )
    trainer.fit(num_epochs=2)
    (path,) = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    events = list(iter_events(path))
    scalar_events = [e for e in events if "scalars" in e]
    tags = {t for e in scalar_events for t in e["scalars"]}
    assert {
        "loss/total",
        "loss/decoder",
        "training/word_error_rate",
        "training/accuracy",
        "validation/word_error_rate",
        "validation/accuracy",
    } <= tags
    # the loss scalar matches what assess/history recorded, at the
    # segment's closing epoch
    loss_events = [e for e in scalar_events if "loss/total" in e["scalars"]]
    assert loss_events[-1]["step"] == 2
    assert np.isfinite(loss_events[-1]["scalars"]["loss/total"])


def test_explicit_none_disables(tmp_path):
    from ecog2txt_tpu.demo import make_demo_experiment
    from ecog2txt_tpu.train import MultiSubjectTrainer

    # the manifest names a directory, the way lab manifests do
    # (mocha-1_word_sequence.yaml:85) ...
    mp = make_demo_experiment(
        str(tmp_path / "exp"),
        subject_ids=(1,),
        tf_summaries_dir=str(tmp_path / "tb"),
    )
    # ... and an explicit None in SN_kwargs disables it anyway
    trainer = MultiSubjectTrainer(
        mp,
        [1],
        SN_kwargs={"tf_summaries_dir": None},
        VERBOSE=False,
    )
    assert trainer.summary_writer is None
    assert not os.path.exists(str(tmp_path / "tb"))
    # without the override the manifest key wins
    trainer2 = MultiSubjectTrainer(mp, [1], VERBOSE=False)
    assert trainer2.summary_writer is not None
    assert trainer2.summary_writer.logdir == str(tmp_path / "tb")
