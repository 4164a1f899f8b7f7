"""Subject-layer + synthetic-generator tests (SURVEY §4: record schema
round-trip, dataset statistics, block partitioning)."""

import numpy as np
import pytest

from ecog2txt_tpu import EOS_token, pad_token
from ecog2txt_tpu.config import Manifest, load_experiment_manifest
from ecog2txt_tpu.datagen import SyntheticDataGenerator
from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.subjects import (
    ECoGSubject,
    SequenceCounter,
    SequenceDataManifest,
    TargetCounter,
    synchronize_sequence_counters,
)


@pytest.fixture
def demo(tmp_path):
    manifest_path = make_demo_experiment(str(tmp_path / "demo"))
    return load_experiment_manifest(manifest_path)


@pytest.fixture
def subject(demo):
    return ECoGSubject(demo[1], 1)


def test_synthetic_generator_deterministic(demo):
    g1 = SyntheticDataGenerator(demo[1], 1)
    g2 = SyntheticDataGenerator(demo[1], 1)
    t1 = list(g1._ecog_token_generator(1))
    t2 = list(g2._ecog_token_generator(1))
    assert len(t1) == len(t2) == 10
    np.testing.assert_array_equal(t1[0]["ecog_sequence"], t2[0]["ecog_sequence"])
    assert t1[0]["text_sequence"] == t2[0]["text_sequence"]
    assert all(w.endswith("_") for w in t1[0]["text_sequence"])
    # phonemes + audio present
    assert len(t1[0]["phoneme_sequence"]) > 0
    assert t1[0]["audio_sequence"].shape[1] == 13


def test_phoneme_labels_are_frame_aligned(demo):
    """Encoder aux targets are per-SAMPLE label sequences (reference
    trainers.py:789-799): one phoneme label per ECoG sample, so the
    reverse+decimate alignment in seq2seq_loss lines up."""
    gen = SyntheticDataGenerator(demo[1], 1)
    for trial in gen._ecog_token_generator(1):
        assert len(trial["phoneme_sequence"]) == len(trial["ecog_sequence"])
        # labels form word-sized runs, not one label per phoneme
        runs = sum(
            1
            for i in range(1, len(trial["phoneme_sequence"]))
            if trial["phoneme_sequence"][i] != trial["phoneme_sequence"][i - 1]
        )
        assert runs + 1 < len(trial["phoneme_sequence"])


def test_synthetic_sentences_discriminable(demo):
    """Different sentences → different ECoG; same sentence → same ECoG
    up to noise (what makes WER→0 learnable)."""
    gen = SyntheticDataGenerator(demo[1], 1)
    trials = list(gen._ecog_token_generator(1))
    by_text = {}
    for t in trials:
        by_text.setdefault(tuple(t["text_sequence"]), []).append(
            t["ecog_sequence"]
        )
    repeated = [v for v in by_text.values() if len(v) > 1]
    if repeated:
        a, b = repeated[0][0], repeated[0][1]
        assert a.shape == b.shape
        # identical templates, different noise → highly correlated
        corr = np.corrcoef(a.flatten(), b.flatten())[0, 1]
        assert corr > 0.9


def test_block_partitioning(subject):
    assert subject.block_ids("training") == {1, 2, 3, 4}
    assert subject.block_ids("validation") == {5}
    assert subject.block_ids("testing") == {6}
    assert subject.all_blocks == {1, 2, 3, 4, 5, 6}


def test_pretrain_all_blocks_folds_eval_into_training(demo):
    donor = ECoGSubject(demo[1], 1, pretrain_all_blocks=True)
    assert donor.block_ids("training") == {1, 2, 3, 4, 5, 6}


def test_target_specs_all_blocks(demo):
    s = ECoGSubject(demo[1], 1, target_specs={"x": 1})
    assert s.block_ids("validation") == {1, 2, 3, 4, 5, 6}


def test_decimation_factor_from_rates(subject):
    # 200 / 16.5 ≈ 12 (reference subjects.py:144-157)
    assert subject.decimation_factor == 12


def test_decimation_factor_explicit(demo):
    m = demo[1].updated({"decimation_factor": 4})
    assert ECoGSubject(m, 1).decimation_factor == 4


def test_data_manifests_wiring(subject):
    manifests = subject.data_manifests
    assert set(manifests) == {
        "encoder_inputs", "encoder_1_targets", "decoder_targets",
    }
    enc = manifests["encoder_inputs"]
    assert enc.distribution == "Rayleigh"
    assert enc.num_features == subject.data_generator.num_ECoG_channels == 16
    dec = manifests["decoder_targets"]
    assert dec.distribution == "categorical"


def test_input_mask_reduces_features(subject):
    mask = np.zeros(16, dtype=bool)
    mask[:5] = True
    subject.input_mask = mask
    assert subject.data_manifests["encoder_inputs"].num_features == 5


def test_records_roundtrip_and_parse(subject):
    class_list = subject.write_tf_records_maybe()
    assert len(class_list) > 0
    subject.set_feature_list("decoder_targets",
                             [pad_token, EOS_token, "<OOV>"] + class_list)
    subject.set_feature_list(
        "encoder_1_targets",
        [pad_token, EOS_token, "<OOV>"]
        + subject.data_generator.full_phoneme_list()[3:],
    )
    subject.set_append_eos("decoder_targets", True)
    examples = list(subject.iterate_examples("training"))
    assert len(examples) == 40  # 4 blocks × 10 trials
    ex = examples[0]
    assert ex["encoder_inputs"].ndim == 2
    assert ex["encoder_inputs"].shape[1] == 16
    assert ex["decoder_targets"].dtype == np.int32
    # APPEND_EOS puts EOS id last
    assert ex["decoder_targets"][-1] == 1


def test_manifest_parse_float_mask():
    m = SequenceDataManifest(
        "ecog_sequence", num_features_raw=4,
        input_mask=np.array([True, False, True, False]),
    )
    flat = np.arange(12, dtype=np.float32)
    out = m.parse(flat)
    assert out.shape == (3, 2)
    np.testing.assert_array_equal(out[:, 0], [0, 4, 8])
    assert m.padding_value == 0.0


def test_manifest_categorical_padding_value():
    m = SequenceDataManifest(
        "text_sequence", feature_list=[pad_token, EOS_token, "<OOV>", "a_"]
    )
    assert m.padding_value == 0
    assert m.num_features == 4


def test_target_counter():
    c = TargetCounter(["a_", "b_"])
    c.observe(["a_", "a_", "zzz_"])
    assert c.histogram() == {"a_": 2}
    assert c.num_oov == 1


def test_sequence_counter_clusters_variants():
    c = SequenceCounter(threshold=0.4)
    i0 = c.observe("the quick brown fox", ecog_length=10)
    i1 = c.observe("the quick brown box", ecog_length=12)  # 1/4 WER < 0.4
    i2 = c.observe("completely different sentence", ecog_length=20)
    assert i0 == i1 == 0 and i2 == 1
    stats = c.length_stats()
    assert stats["the quick brown fox"]["count"] == 2
    assert stats["the quick brown fox"]["mean_length"] == 11.0


def test_synchronize_counters():
    a, b = SequenceCounter(), SequenceCounter()
    a.observe("only in a")
    b.observe("only in b")
    synchronize_sequence_counters({"x": a, "y": b})
    assert set(a.unique_sentences) == set(b.unique_sentences)
    assert a.counts[a.unique_sentences.index("only in b")] == 0


def test_synchronize_counters_near_variant_wrinkle():
    """pad_to uses EXACT-string membership while observe() clusters by
    WER < threshold, so two partitions that each canonicalized a
    transcription variant differently keep BOTH variants after
    synchronization (each padded with a zero-count row for the other's
    variant).  This mirrors the reference's semantics
    (subjects.py:546-554 vs :576-600) — pinned here so the wrinkle is a
    documented contract, not an accident."""
    a, b = SequenceCounter(threshold=0.4), SequenceCounter(threshold=0.4)
    a.observe("the quick brown fox")
    b.observe("the quick brown box")  # 1/4 WER — same cluster in ONE counter
    assert b.observe("the quick brown fox") == 0  # clusters with 'box'
    synchronize_sequence_counters({"x": a, "y": b})
    # exact-string padding → both near-variants present in both counters
    assert set(a.unique_sentences) == {
        "the quick brown fox", "the quick brown box",
    }
    assert a.counts[a.unique_sentences.index("the quick brown box")] == 0
    assert b.counts[b.unique_sentences.index("the quick brown fox")] == 0
    # ...and a LATER observation on the synchronized counter lands in
    # the first cluster within threshold, not necessarily the exact row
    idx = a.observe("the quick brown box")
    assert a.unique_sentences[idx] == "the quick brown fox"


def test_filter_to_common_targets():
    """Cross-set target filtering (reference data_generators.py:535-562,
    kept for API completeness): examples whose target appears in only
    one set are dropped from that set."""
    from ecog2txt_tpu.datagen import filter_to_common_targets

    inputs_A = np.arange(4 * 3 * 2, dtype=float).reshape(4, 3, 2)
    targets_A = ["horse", "cow", "pig", "cow"]
    inputs_B = np.arange(3 * 3 * 2, dtype=float).reshape(3, 3, 2) + 100
    targets_B = ["cow", "dog", "pig"]
    iA, tA, iB, tB = filter_to_common_targets(
        inputs_A, targets_A, inputs_B, targets_B
    )
    assert tA == ["cow", "pig", "cow"] and tB == ["cow", "pig"]
    np.testing.assert_array_equal(iA, inputs_A[[1, 2, 3]])
    np.testing.assert_array_equal(iB, inputs_B[[0, 2]])
    # list-of-token-lists targets (the reference docstring's other case)
    tok_A = [["a", "b"], ["c"]]
    tok_B = [["c"], ["d"]]
    _, tA2, _, tB2 = filter_to_common_targets(
        inputs_A[:2], tok_A, inputs_B[:2], tok_B
    )
    assert tA2 == [["c"]] and tB2 == [["c"]]
