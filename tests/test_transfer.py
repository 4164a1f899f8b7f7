"""Multi-subject transfer-learning tests: joint (parallel) and
sequential curricula over heterogeneous subjects (SURVEY §2.9:
multi-subnet parallel training is the reference's core parallelism)."""

import numpy as np
import pytest

from ecog2txt_tpu.demo import make_demo_experiment
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
    root = tmp_path_factory.mktemp("xfer")
    mp = make_demo_experiment(
        str(root / "exp"),
        subject_ids=(1, 2),
        layer_sizes=TINY,
        # heterogeneous channel counts: donor 3x4=12ch, target 4x4=16ch
        grid_sizes={1: (3, 4), 2: (4, 4)},
    )
    return MultiSubjectTrainer(
        mp, [1, 2],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10, "learning_rate": 3e-3,
                   "N_epochs": 20},
        VERBOSE=False,
    )


def test_heterogeneous_channels_padded(trainer):
    assert trainer.ecog_subjects[0].data_generator.num_ECoG_channels == 12
    assert trainer.ecog_subjects[1].data_generator.num_ECoG_channels == 16
    assert trainer.net_config.in_channels == 16
    ds = trainer.packed_dataset("training")
    # donor rows zero-padded in channels 12..16
    assert np.abs(ds.encoder_inputs[0, :, :, 12:]).sum() == 0
    assert np.abs(ds.encoder_inputs[1, :, :, 12:]).sum() > 0


def test_donor_trains_on_all_blocks(trainer):
    donor, target = trainer.ecog_subjects
    assert donor.block_ids("training") == {1, 2, 3, 4, 5, 6}
    assert target.block_ids("training") == {1, 2, 3, 4}


def test_parallel_transfer_learn_updates_both_subnets(trainer):
    import jax

    before = jax.tree.map(np.asarray, trainer.state.params["subnet"])
    history = trainer.parallel_transfer_learn()
    after = trainer.state.params["subnet"]
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        a = np.asarray(a)
        # both subject rows moved
        assert np.abs(a[0] - b[0]).sum() > 0
        assert np.abs(a[1] - b[1]).sum() > 0
    wers = [h["training"]["word_error_rate"] for h in history.values()]
    assert wers[-1] < wers[0]


def test_resume_restricts_to_target(trainer):
    import jax

    donor_before = np.asarray(trainer.state.params["subnet"]["conv"][0]["w"])[0]
    trainer.parallel_transfer_learn(RESUME=True, num_epochs=10, assess=False)
    donor_after = np.asarray(trainer.state.params["subnet"]["conv"][0]["w"])[0]
    # donor subnet untouched when only the target subject's batches run
    np.testing.assert_allclose(donor_before, donor_after, atol=1e-7)


def test_scope_mask_regexes(trainer):
    import jax

    mask = trainer._scope_mask(r"seq2seq/subnet")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, value in flat:
        top = str(path[0].key)
        assert value == (top == "subnet")
    mask = trainer._scope_mask(r"seq2seq/(?!subnet)")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, value in flat:
        top = str(path[0].key)
        assert value == (top != "subnet")


def test_frozen_core_stays_frozen(trainer):
    """fit with train_vars_scope='seq2seq/subnet' must not move shared
    encoder/decoder params (the sequential curriculum's pretraining
    phase, reference trainers.py:342-369)."""
    import jax

    enc_before = jax.tree.map(np.asarray, trainer.state.params["encoder"])
    dec_before = jax.tree.map(np.asarray, trainer.state.params["decoder"])
    sub_before = np.asarray(trainer.state.params["subnet"]["conv"][0]["w"])
    trainer.fit(
        subject_subset=[0],
        num_epochs=4,
        train_vars_scope=r"seq2seq/subnet",
        assess=False,
    )
    for b, a in zip(
        jax.tree.leaves(enc_before),
        jax.tree.leaves(trainer.state.params["encoder"]),
    ):
        np.testing.assert_allclose(b, np.asarray(a), atol=1e-7)
    for b, a in zip(
        jax.tree.leaves(dec_before),
        jax.tree.leaves(trainer.state.params["decoder"]),
    ):
        np.testing.assert_allclose(b, np.asarray(a), atol=1e-7)
    sub_after = np.asarray(trainer.state.params["subnet"]["conv"][0]["w"])
    assert np.abs(sub_after[0] - sub_before[0]).sum() > 0  # subnet moved


@pytest.mark.slow
def test_sequential_transfer_learn_runs(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq_xfer")
    mp = make_demo_experiment(
        str(root / "exp"), subject_ids=(1, 2), layer_sizes=TINY,
        grid_sizes={1: (3, 4), 2: (4, 4)},
    )
    tr = MultiSubjectTrainer(
        mp, [1, 2],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10, "learning_rate": 3e-3},
        VERBOSE=False,
    )
    history = tr.sequential_transfer_learn(
        pretraining=4, training=6, posttraining=4
    )
    assert history  # target phase assessed
    assert int(tr.state.epoch) == 6 + 4 + 6 + 4  # donor t + pre + target t+post
