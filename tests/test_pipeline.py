"""Input-pipeline tests: packing, padding, scheduling."""

import numpy as np
import pytest

from ecog2txt_tpu.config import load_experiment_manifest
from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.pipeline import make_schedule, pack_partition
from ecog2txt_tpu.subjects import ECoGSubject
from ecog2txt_tpu.tokenizers import read_vocab_file


@pytest.fixture(scope="module")
def subjects(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    mp = make_demo_experiment(str(root / "exp"), subject_ids=(1, 2))
    ms = load_experiment_manifest(mp)
    out = []
    for sid in (1, 2):
        s = ECoGSubject(ms[sid], sid)
        vocab = read_vocab_file(ms[sid]["text_sequence_vocab_file"])
        phon = read_vocab_file(ms[sid]["phoneme_sequence_vocab_file"])
        s.set_feature_list("decoder_targets", vocab)
        s.set_feature_list("encoder_1_targets", phon)
        s.set_append_eos("decoder_targets", True)
        s.write_tf_records_maybe()
        out.append(s)
    return out


def test_pack_shapes(subjects):
    ds = pack_partition(subjects, "training", pad_time_multiple=12)
    S, N, T, C = ds.encoder_inputs.shape
    assert S == 2 and N == 40 and C == 16
    assert T % 12 == 0
    assert ds.trial_mask.all()  # both subjects have full 40 trials
    assert ds.decoder_targets.shape[:2] == (S, N)
    assert "encoder_1_targets" in ds.aux_targets
    assert ds.aux_targets["encoder_1_targets"].shape == (S, N, T)


def test_pack_lengths_match_content(subjects):
    ds = pack_partition(subjects, "validation", pad_time_multiple=12)
    for s in range(2):
        for n in range(int(ds.num_trials[s])):
            L = ds.encoder_lengths[s, n]
            # data beyond the length is zero padding
            assert np.abs(ds.encoder_inputs[s, n, L:]).sum() == 0
            assert np.abs(ds.encoder_inputs[s, n, :L]).sum() > 0


def test_pack_channel_padding(subjects):
    ds = pack_partition(
        subjects, "validation", pad_channels_to=24, pad_time_multiple=12
    )
    assert ds.encoder_inputs.shape[-1] == 24
    assert np.abs(ds.encoder_inputs[..., 16:]).sum() == 0


def test_references_detokenize(subjects):
    ds = pack_partition(subjects, "training")
    assert len(ds.references) == 2
    assert len(ds.references[0]) == 40
    assert any("<EOS>" in r for r in ds.references[0][0])


def test_schedule_covers_all_trials(subjects):
    ds = pack_partition(subjects, "training")
    rng = np.random.default_rng(0)
    subj, idx = make_schedule(ds, batch_size=16, num_epochs=1, rng=rng)
    assert idx.shape[1] == 16
    # every real trial of every subject appears at least once
    for s in range(2):
        seen = set(idx[subj == s].flatten().tolist())
        assert seen >= set(range(40))


def test_schedule_subject_subset(subjects):
    ds = pack_partition(subjects, "training")
    rng = np.random.default_rng(0)
    subj, _ = make_schedule(
        ds, batch_size=8, num_epochs=2, rng=rng, subject_subset=[1]
    )
    assert (subj == 1).all()


def test_schedule_epochs_scale_steps(subjects):
    ds = pack_partition(subjects, "training")
    rng = np.random.default_rng(0)
    s1, _ = make_schedule(ds, 8, 1, rng)
    s3, _ = make_schedule(ds, 8, 3, np.random.default_rng(0))
    assert len(s3) == 3 * len(s1)


def test_schedule_batch_larger_than_trials(subjects):
    ds = pack_partition(subjects, "validation")  # 10 trials/subject
    rng = np.random.default_rng(0)
    subj, idx = make_schedule(ds, batch_size=32, num_epochs=1, rng=rng)
    assert idx.shape[1] == 32
    # wrapped indices stay within the real trial range
    assert idx.max() < 10


def test_schedule_empty_raises(subjects):
    import pytest as _pytest

    ds = pack_partition(subjects, "validation")
    ds.trial_mask[:] = False
    with _pytest.raises(ValueError):
        make_schedule(ds, 8, 1, np.random.default_rng(0))


def test_shard_dataset(subjects):
    from ecog2txt_tpu.pipeline import shard_dataset

    ds = pack_partition(subjects, "training")  # 40 trials/subject
    shards = shard_dataset(ds, 16)
    assert len(shards) == 3
    assert all(s.encoder_inputs.shape[1] == 16 for s in shards)
    # trials conserved (last shard padded with masked rows)
    assert sum(int(s.num_trials.sum()) for s in shards) == int(
        ds.num_trials.sum()
    )
    np.testing.assert_array_equal(
        shards[1].encoder_inputs[0, 0], ds.encoder_inputs[0, 16]
    )
    assert shards[2].trial_mask[0, 8:].sum() == 0
    assert shards[1].references[0][0] == ds.references[0][16]
