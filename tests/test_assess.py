"""WER / statistics tests."""

import numpy as np
import pytest

from ecog2txt_tpu import assess


def test_edit_distance_basics():
    assert assess.edit_distance([], []) == 0
    assert assess.edit_distance(list("abc"), list("abc")) == 0
    assert assess.edit_distance(list("kitten"), list("sitting")) == 3
    assert assess.edit_distance(list("abc"), []) == 3


def test_wer_vector():
    refs = ["the dog ran", "hello world"]
    hyps = ["the dog sat", "hello world"]
    np.testing.assert_allclose(assess.wer_vector(refs, hyps), [1 / 3, 0.0])


def test_wer_empty_reference():
    assert assess.word_error_rate([], ["a", "b"]) == 2.0
    assert assess.word_error_rate([], []) == 0.0


def test_sequence_accuracy():
    assert assess.sequence_accuracy(["a b", "c d"], ["a b", "c x"]) == 0.5


def test_confusion_matrix_ignores_out_of_range():
    cm = assess.confusion_matrix([0, 1, 7], [1, 1, 0], num_classes=3)
    assert cm.sum() == 2
    assert cm[0, 1] == 1 and cm[1, 1] == 1


def test_wilcoxon_directionality():
    rng = np.random.default_rng(0)
    a = rng.normal(0.1, 0.02, size=40)
    b = a + 0.05  # b clearly worse
    out = assess.WER_wilcoxon(a, b)
    assert out["p_value"] < 0.01
    assert out["effect_size"] > 0.9
    # reversed comparison not significant
    assert assess.WER_wilcoxon(b, a)["p_value"] > 0.5


def test_paired_t_welch_dof():
    rng = np.random.default_rng(1)
    a = rng.normal(0.1, 0.01, size=30)
    b = rng.normal(0.3, 0.1, size=20)
    out = assess.WER_paired_t_test(a, b)
    assert out["p_value"] < 1e-4
    assert 18 < out["dof"] < 25  # dominated by b's variance


def test_bootstrap_stratified():
    rng = np.random.default_rng(2)
    a = rng.normal(0.1, 0.02, size=60)
    b = rng.normal(0.2, 0.02, size=60)
    blocks = np.repeat([0, 1, 2], 20)
    out = assess.WER_bootstrap(a, b, blocks, blocks, num_resamples=2000)
    assert out["p_value"] < 0.05
    assert out["mean_diff"] < 0


def test_holm_bonferroni():
    rejected = assess.holm_bonferroni([0.001, 0.04, 0.03, 0.9], alpha=0.05)
    # step-down: 0.001 < 0.05/4 ✓; next smallest 0.03 vs 0.05/3 ✗ stop
    assert rejected == [True, False, False, False]


def test_results_summarizer():
    rng = np.random.default_rng(3)
    a = rng.normal(0.1, 0.02, size=40)
    b = a + 0.1
    out = assess.results_summarizer(
        [
            {"method": "wilcoxon", "wers_a": a, "wers_b": b, "label": "w"},
            {"method": "paired_t_test", "wers_a": a, "wers_b": b},
        ]
    )
    assert out[0]["label"] == "w"
    assert all("significant" in r for r in out)
    assert out[0]["significant"]


def test_unknown_comparator():
    with pytest.raises(ValueError):
        assess.results_comparator("nope")


def test_apply_comparisons_and_results_updater(tmp_path):
    """Archive-level comparison plumbing (reference plotters.py:2123-2156):
    load each (comparison, baseline) archive pair from a %-template path
    and annotate the stats dict with Holm ranks in place."""
    from ecog2txt_tpu.assess import apply_comparisons, results_updater
    from ecog2txt_tpu.plotting.results import save_decoding_results

    rng = np.random.default_rng(0)
    for suffix in ("", "_untargeted", "_noise"):
        save_decoding_results(
            str(tmp_path / f"perf_vs_training_size_1{suffix}"),
            word_error_rate=rng.uniform(0, 1, (3, 2)),
            accuracy=rng.uniform(0, 1, (3, 2)),
            nums_seconds=rng.uniform(60, 600, (3, 2)),
            training_blocks=[[1], [1, 2]],
            validation_blocks=[9],
        )
    template = str(tmp_path / "perf_vs_training_size_1%s")
    comparisons = {
        "_untargeted": {"": {"p_value": 0.01}},
        "_noise": {"": {"p_value": 0.002}},
    }
    seen = []
    apply_comparisons(
        template, comparisons,
        lambda b, c, bs, cs: seen.append(
            (bs, cs, b.word_error_rate.shape, c.num_folds)
        ),
        VERBOSE=False,
    )
    assert seen == [("", "_untargeted", (3, 2), 3), ("", "_noise", (3, 2), 3)]
    results_updater(template, comparisons, ranks=[2, 1], VERBOSE=False)
    assert comparisons["_untargeted"][""]["adjusted_p_value"] == \
        pytest.approx(0.02)
    assert comparisons["_untargeted"][""]["rank"] == 2
    assert comparisons["_noise"][""]["adjusted_p_value"] == \
        pytest.approx(0.002)
