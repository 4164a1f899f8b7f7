"""4-level vocab resolution: the induced training-intersection /
validation-union reduction (reference trainers.py:410-442) — one of the
SURVEY §7 'hard parts' (token ids feed straight into WER)."""

import os

import pytest
import yaml

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


def _strip_vocab_files(manifest_path, per_subject=None):
    raw = yaml.safe_load(open(manifest_path))
    for sid, m in raw.items():
        m.pop("text_sequence_vocab_file", None)
        m.pop("phoneme_sequence_vocab_file", None)
        if per_subject:
            m.update(per_subject.get(sid, {}))
    yaml.safe_dump(raw, open(manifest_path, "w"))


def test_training_intersection_validation_union(tmp_path):
    """Subject A sees 20 unique sentences, subject B 50 (A's are a
    prefix of B's — same generator seed).  With vocab files removed the
    list is induced: training-∩ keeps only tokens both subjects train
    on, then validation-∪ adds back tokens from any subject's val/test
    blocks."""
    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1, 2), layer_sizes=TINY,
        num_unique_sentences=50,
    )
    _strip_vocab_files(
        mp, per_subject={1: {"num_unique_training_sentences": 20}}
    )
    tr = MultiSubjectTrainer(
        mp, [1, 2], SN_kwargs={"max_dec_len": 10}, VERBOSE=False
    )
    induced = tr.target_subject.data_manifests["decoder_targets"].feature_list
    assert induced[:3] == ["<pad>", "<EOS>", "<OOV>"]

    # expected set, computed directly from the records the reduction
    # reads: ∪ over partitions of (∩ over subjects for training,
    # ∪ over subjects otherwise)
    def observed(subject, partition):
        out = set()
        for block in subject.block_ids(partition):
            from ecog2txt_tpu.records import read_examples

            for ex in read_examples(
                subject.data_generator.tf_record_path(block)
            ):
                out |= {t.decode() for t in ex["text_sequence"]}
        return out

    a, b = tr.ecog_subjects
    expected = (
        (observed(a, "training") & observed(b, "training"))
        | observed(a, "validation") | observed(b, "validation")
        | observed(a, "testing") | observed(b, "testing")
    )
    assert set(induced[3:]) == expected
    # the asymmetry is real: the intersection dropped something
    only_a_train = observed(a, "training") - observed(b, "training")
    dropped = only_a_train - expected
    assert only_a_train, "fixture should make subject vocabs differ"


def test_explicit_vocab_list_kwarg_wins(tmp_path):
    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    tr = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"max_dec_len": 10}, VERBOSE=False,
        text_sequence_vocab_list=["zzz_", "yyy_"],
    )
    fl = tr.target_subject.data_manifests["decoder_targets"].feature_list
    assert fl == ["<pad>", "<EOS>", "<OOV>", "zzz_", "yyy_"]


def test_pickled_vocab_reused(tmp_path):
    """Level 3: a previously induced vocab pickle is reused on rebuild
    (checkpoint-compatible token ids)."""
    mp = make_demo_experiment(
        str(tmp_path / "exp"), subject_ids=(1,), layer_sizes=TINY
    )
    _strip_vocab_files(mp)
    tr1 = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"max_dec_len": 10}, VERBOSE=False
    )
    fl1 = tr1.target_subject.data_manifests["decoder_targets"].feature_list
    pkl = os.path.join(tr1.checkpoint_dir, "text_sequence_vocab_file.pkl")
    assert os.path.exists(pkl)
    # corrupt the records dir to prove the pickle (not re-induction) is used
    tr2 = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"max_dec_len": 10}, VERBOSE=False
    )
    fl2 = tr2.target_subject.data_manifests["decoder_targets"].feature_list
    assert fl1 == fl2
