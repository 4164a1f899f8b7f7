"""Experiment-sweep runner tests."""

import os

import numpy as np
import pytest

from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.experiments import grid_search, perf_vs_training_size
from ecog2txt_tpu.plotting import DecodingResults, GridSearchResults
from ecog2txt_tpu.train import MultiSubjectTrainer

TINY = {
    "encoder_embedding": [16],
    "encoder_rnn": [24],
    "encoder_1_projection": [16],
    "decoder_embedding": [12],
    "decoder_rnn": [48],
    "decoder_projection": [],
}


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweeps")
    mp = make_demo_experiment(
        str(root / "exp"), subject_ids=(1,), layer_sizes=TINY,
    )
    return MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10, "N_epochs": 6},
        VERBOSE=False,
    )


def test_restricted_to_trials(trainer):
    sub = trainer.restricted_to_trials([0, 2, 5])
    ds = sub.packed_dataset("training")
    assert int(ds.num_trials[0]) == 3
    full = trainer.packed_dataset("training")
    np.testing.assert_array_equal(
        ds.encoder_inputs[0, 1], full.encoder_inputs[0, 2]
    )
    assert len(ds.references[0]) == 3
    # validation untouched
    assert int(sub.packed_dataset("validation").num_trials[0]) == 10


@pytest.mark.slow
def test_perf_vs_training_size_archive(trainer):
    path = perf_vs_training_size(
        trainer, num_folds=2, fractions=(0.3, 1.0), num_epochs=4,
        suffix="tiny",
    )
    assert os.path.exists(path)
    res = DecodingResults(
        trainer.manifest.resolve("saved_results_dir"), 1, "tiny"
    )
    assert res.word_error_rate.shape == (2, 2)
    assert np.isfinite(np.asarray(res.word_error_rate)).all()
    # more data → more seconds
    seconds = res.nums_seconds.mean_across_folds
    assert seconds[1] > seconds[0]
    assert res.validation_blocks == [5]


@pytest.mark.slow
def test_perf_vs_training_size_max_host(tmp_path, monkeypatch):
    """The sweep runs on a host-memory-bounded corpus (max_host_trials)
    without EVER packing the training partition resident, and records
    the same seconds-of-speech as the resident sweep (same rng seed →
    same subsets; both compute from per-trial lengths)."""
    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY,
    )

    def make(extra):
        return MultiSubjectTrainer(
            mp, [1],
            SN_kwargs={"batch_size": 8, "max_dec_len": 10,
                       "N_epochs": 4, **extra},
            VERBOSE=False,
        )

    resident = make({})
    perf_vs_training_size(
        resident, num_folds=1, fractions=(0.5, 1.0), num_epochs=2,
        suffix="res",
    )

    orig = MultiSubjectTrainer.packed_dataset

    def guarded(self, partition, refresh=False):
        assert partition != "training", (
            "max_host sweep packed the training partition resident"
        )
        return orig(self, partition, refresh)

    monkeypatch.setattr(MultiSubjectTrainer, "packed_dataset", guarded)
    perf_vs_training_size(
        make({"max_host_trials": 8}), num_folds=1,
        fractions=(0.5, 1.0), num_epochs=2, suffix="host",
    )
    results_dir = resident.manifest.resolve("saved_results_dir")
    res = DecodingResults(results_dir, 1, "res")
    host = DecodingResults(results_dir, 1, "host")
    np.testing.assert_array_equal(
        np.asarray(host.nums_seconds), np.asarray(res.nums_seconds)
    )
    assert np.isfinite(np.asarray(host.word_error_rate)).all()


def test_sn_kwargs_layer_sizes_override(tmp_path):
    """SN_kwargs['layer_sizes'] overrides the manifest per scope —
    the knob architecture grid sweeps turn (VERDICT r2 #7)."""
    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"layer_sizes": {"encoder_rnn": [40, 40]}},
        VERBOSE=False,
    )
    assert tr.net_config.rnn_sizes == (40, 40)
    # unmentioned scopes fall through to the manifest
    assert tr.net_config.conv_sizes == tuple(TINY["encoder_embedding"])
    assert tr.net_config.dec_rnn_sizes == tuple(TINY["decoder_rnn"])


@pytest.mark.slow
def test_grid_search_architecture_cells(trainer):
    """A grid cell over encoder_rnn layer sizes retrains a DIFFERENT
    architecture per cell and records its WER (the reference's grid
    archives sweep layer_sizes, plotters.py:2159-2257)."""
    path = grid_search(
        trainer,
        {
            "layer_sizes": [
                {"encoder_rnn": [16]},
                {"encoder_rnn": [24, 24]},
            ]
        },
        num_epochs=4,
        suffix="arch",
    )
    gs = GridSearchResults(path)
    assert gs.wers.shape == (2,)
    assert np.isfinite(gs.wers).all()


@pytest.mark.slow
def test_grid_search_archive(trainer):
    path = grid_search(
        trainer,
        {"learning_rate": [1e-3, 3e-3], "batch_size": [8, 16]},
        num_epochs=4,
        suffix="tiny",
    )
    gs = GridSearchResults(path)
    assert gs.wers.shape == (2, 2)
    assert np.isfinite(gs.wers).all()
    best = gs.best()
    assert best["learning_rate"] in (1e-3, 3e-3)
