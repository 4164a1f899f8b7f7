"""Lazy host data pipeline (VERDICT r2 #4): RecordFile random access,
shard-at-a-time loading equal to slicing a fully packed corpus, and
training under a forced host budget with the same WER trajectory."""

import numpy as np
import pytest

from ecog2txt_tpu import records
from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.train import MultiSubjectTrainer

TINY = {
    "encoder_embedding": [16],
    "encoder_rnn": [24],
    "encoder_1_projection": [16],
    "decoder_embedding": [12],
    "decoder_rnn": [32],
    "decoder_projection": [],
}


@pytest.fixture(scope="module")
def demo_records(tmp_path_factory):
    root = tmp_path_factory.mktemp("lazy") / "exp"
    manifest = make_demo_experiment(
        str(root), subject_ids=(1, 2),
        grid_sizes={1: (4, 4), 2: (3, 4)},  # heterogeneous channels
        layer_sizes=TINY,
    )
    tr = MultiSubjectTrainer(manifest, [1, 2], VERBOSE=False)
    tr.write_tf_records_maybe()
    return manifest, tr


def test_record_file_random_access(demo_records):
    _, tr = demo_records
    gen = tr.ecog_subjects[0].data_generator
    block = sorted(tr.ecog_subjects[0].block_ids("training"))[0]
    path = gen.tf_record_path(block)
    sequential = list(records.read_examples(path))
    with records.RecordFile(path) as rf:
        assert len(rf) == len(sequential) > 0
        # random order access matches the sequential reader
        for i in [len(rf) - 1, 0, len(rf) // 2]:
            ex = rf.example(i)
            ref = sequential[i]
            assert set(ex) == set(ref)
            for k in ex:
                if isinstance(ex[k], list):
                    assert ex[k] == ref[k]
                else:
                    np.testing.assert_array_equal(ex[k], ref[k])


def test_record_file_python_fallback(demo_records, monkeypatch):
    """Without the native lib, the Python framing walk + decoder gives
    identical examples (and still CRC-verifies)."""
    _, tr = demo_records
    gen = tr.ecog_subjects[0].data_generator
    block = sorted(tr.ecog_subjects[0].block_ids("training"))[0]
    path = gen.tf_record_path(block)
    with records.RecordFile(path) as rf_native:
        native = [rf_native.example(i) for i in range(len(rf_native))]
    monkeypatch.setattr(records, "_load_native", lambda: None)
    with records.RecordFile(path) as rf_py:
        assert len(rf_py) == len(native)
        for i, ref in enumerate(native):
            ex = rf_py.example(i)
            for k in ref:
                if isinstance(ref[k], list):
                    assert ex[k] == ref[k]
                else:
                    np.testing.assert_array_equal(ex[k], ref[k])


def test_lazy_shards_equal_eager_slices(demo_records):
    """LazyShardedDataset shards == shard_dataset over the fully packed
    partition: every tensor identical, so the streaming trainer sees
    byte-identical batches under either host policy."""
    from ecog2txt_tpu.pipeline import (
        LazyShardedDataset,
        pack_partition,
        shard_dataset,
    )

    _, tr = demo_records
    kw = dict(
        pad_channels_to=tr.net_config.in_channels,
        pad_time_multiple=tr.net_config.decimation_factor,
    )
    eager = shard_dataset(
        pack_partition(tr.ecog_subjects, "training", **kw), 16
    )
    lazy = LazyShardedDataset(tr.ecog_subjects, "training", 16, **kw)
    assert len(lazy) == len(eager)
    lazy_list = list(lazy)
    for le, ee in zip(lazy_list, eager):
        np.testing.assert_array_equal(le.encoder_inputs, ee.encoder_inputs)
        np.testing.assert_array_equal(le.encoder_lengths, ee.encoder_lengths)
        np.testing.assert_array_equal(le.decoder_targets, ee.decoder_targets)
        np.testing.assert_array_equal(le.decoder_lengths, ee.decoder_lengths)
        np.testing.assert_array_equal(le.trial_mask, ee.trial_mask)
        assert set(le.aux_targets) == set(ee.aux_targets)
        for k in le.aux_targets:
            np.testing.assert_array_equal(le.aux_targets[k], ee.aux_targets[k])
    # re-iteration yields the same shards (the fit loop re-reads per
    # segment)
    again = next(iter(lazy))
    np.testing.assert_array_equal(
        again.encoder_inputs, lazy_list[0].encoder_inputs
    )
    lazy.close()


def test_lazy_restricted_shards_equal_eager(demo_records):
    """A lazy dataset with a trial_subset == shard_dataset over
    restrict_trials of the fully packed partition (the resident
    perf-vs-size path): identical tensors shard for shard, so
    host-memory-bounded sweeps see the exact batches the resident
    sweep does (VERDICT r3 #4)."""
    from ecog2txt_tpu.pipeline import (
        LazyShardedDataset,
        pack_partition,
        restrict_trials,
        shard_dataset,
    )

    _, tr = demo_records
    kw = dict(
        pad_channels_to=tr.net_config.in_channels,
        pad_time_multiple=tr.net_config.decimation_factor,
    )
    subset = [1, 4, 7, 2, 9, 11, 13, 0]  # unsorted on purpose
    full = pack_partition(tr.ecog_subjects, "training", **kw)
    eager = shard_dataset(restrict_trials(full, 0, subset), 6)
    lazy = LazyShardedDataset(
        tr.ecog_subjects, "training", 6, trial_subset={0: subset}, **kw
    )
    np.testing.assert_array_equal(
        lazy.num_trials,
        [len(subset), int(full.num_trials[1])],  # subject 2 untouched
    )
    lazy_list = list(lazy)
    # eager keeps full-N masked tail rows for subject 0; the common
    # shard prefix must be byte-identical
    assert len(lazy_list) <= len(eager)
    for le, ee in zip(lazy_list, eager):
        np.testing.assert_array_equal(le.encoder_inputs, ee.encoder_inputs)
        np.testing.assert_array_equal(le.encoder_lengths, ee.encoder_lengths)
        np.testing.assert_array_equal(le.decoder_targets, ee.decoder_targets)
        np.testing.assert_array_equal(le.trial_mask, ee.trial_mask)
        for k in le.aux_targets:
            np.testing.assert_array_equal(le.aux_targets[k], ee.aux_targets[k])
    # shards beyond the lazy count hold no active trials of ANY subject
    for ee in eager[len(lazy_list):]:
        assert int(ee.num_trials.sum()) == 0
    # seconds-of-speech probe used by perf_vs_training_size
    np.testing.assert_array_equal(
        LazyShardedDataset(
            tr.ecog_subjects, "training", 6, **kw
        ).trial_lengths(0),
        full.encoder_lengths[0][full.trial_mask[0]],
    )
    lazy.close()


@pytest.mark.slow
def test_restricted_max_host_same_trajectory(tmp_path):
    """restricted_to_trials composes with max_host_trials: the lazy
    restricted trainer follows the SAME WER trajectory as the resident
    restricted streaming path (VERDICT r3 #4 done-criterion —
    perf-vs-training-size sweeps now run on host-bounded corpora)."""
    def run(extra):
        mp = make_demo_experiment(
            str(tmp_path / f"exp_{sorted(extra)[0]}"), subject_ids=(1,),
            layer_sizes=TINY,
        )
        tr = MultiSubjectTrainer(
            mp, [1],
            SN_kwargs={
                "batch_size": 8, "max_dec_len": 10,
                "learning_rate": 3e-3, **extra,
            },
            VERBOSE=False,
        )
        restricted = tr.restricted_to_trials(list(range(0, 24, 2)))
        history = restricted.fit(num_epochs=10)
        return [
            h["training"]["word_error_rate"] for h in history.values()
        ]

    wers_host = run({"max_host_trials": 8})
    wers_dev = run({"max_device_trials": 8})
    assert wers_host == wers_dev


@pytest.mark.slow
def test_trainer_max_host_trials_same_trajectory(tmp_path):
    """Training under a forced host budget (max_host_trials) follows the
    SAME WER trajectory as the resident-corpus streaming path with the
    same shard size — shards and schedules are identical by
    construction (VERDICT r2 #4 done-criterion)."""
    from ecog2txt_tpu.demo import make_demo_experiment

    def run(extra):
        mp = make_demo_experiment(
            str(tmp_path / f"exp_{sorted(extra)[0]}"), subject_ids=(1,),
            layer_sizes=TINY,
        )
        tr = MultiSubjectTrainer(
            mp, [1],
            SN_kwargs={
                "batch_size": 8, "max_dec_len": 10,
                "learning_rate": 3e-3, **extra,
            },
            VERBOSE=False,
        )
        history = tr.fit(num_epochs=20)
        return [
            h["training"]["word_error_rate"] for h in history.values()
        ]

    wers_host = run({"max_host_trials": 16})
    wers_dev = run({"max_device_trials": 16})
    assert wers_host == wers_dev
    assert wers_host[-1] < wers_host[0]  # learns through the lazy path
