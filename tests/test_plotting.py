"""Analysis/figure-layer tests (headless Agg)."""

import os

import numpy as np
import pytest

from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.plotting import (
    DecodingResults,
    GridSearchResults,
    ResultsMatrix,
    ResultsPlotter,
    cluster_embeddings,
    latex_legend,
    latex_table,
    plot_annotated_performances,
    plot_performance,
    plot_performances_vs_amount_of_training_data,
    save_decoding_results,
    save_grid_search,
    save_tikz,
    scatter_desequenced_data,
    suffix_to_label,
    tikz_errorbar_plot,
)
from ecog2txt_tpu.plotting.plotters import anti_alias
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
    root = tmp_path_factory.mktemp("plot")
    mp = make_demo_experiment(
        str(root / "exp"), subject_ids=(1,), layer_sizes=TINY,
        grid_size=(4, 4),
    )
    tr = MultiSubjectTrainer(
        mp, [1],
        SN_kwargs={"batch_size": 16, "max_dec_len": 10, "N_epochs": 10},
        VERBOSE=False,
    )
    tr.fit(assess=False)
    return tr


@pytest.fixture(scope="module")
def plotter(trainer):
    return ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)


def test_results_matrix_nan_stats():
    m = ResultsMatrix([[0.1, 0.2], [0.3, np.nan]])
    np.testing.assert_allclose(m.mean_across_folds, [0.2, 0.2])
    assert m.stderr_across_folds[1] == 0.0  # single non-nan fold


def test_decoding_results_roundtrip(tmp_path):
    wer = np.array([[0.5, 0.3], [0.6, 0.2]])
    path = save_decoding_results(
        str(tmp_path / "perf_vs_training_size_1_demo"),
        wer, 1 - wer, wer * 100,
        training_blocks=[[1, 2], [1, 2, 3]],
        validation_blocks=[5],
    )
    assert os.path.exists(path)
    res = DecodingResults(str(tmp_path), 1, "demo")
    np.testing.assert_allclose(res.word_error_rate, wer)
    assert res.training_blocks == [[1, 2], [1, 2, 3]]
    assert res.validation_blocks == [5]
    s = res.summary()
    assert "wer_mean" in s and len(s["wer_mean"]) == 2


def test_decoding_results_reads_reference_hkl(tmp_path):
    """A reference-toolchain .hkl archive (hickle = HDF5; flattened
    fold×datasize entries, legacy tuple wrapper, repr-quoted keys)
    round-trips into DecodingResults (reference plotters.py:51-119)."""
    import h5py

    # 2 folds × 3 datasizes, flattened the way the reference saves them
    wer = np.array([0.9, 0.5, 0.2, 0.8, 0.6, 0.3])
    acc = 1.0 - wer
    secs = np.array([60.0, 120, 240, 60, 120, 240])
    blocks = [[1], [1, 2], [1, 2, 3], [2], [2, 3], [1, 2, 3]]
    path = str(tmp_path / "perf_vs_training_size_9_xfer.hkl")
    with h5py.File(path, "w") as f:
        # legacy tuple wrapper: data → [dict]; quoted dict keys
        root = f.create_group("data")
        entry = root.create_group("data_0")
        entry.create_dataset("'word_error_rate'", data=wer)
        entry.create_dataset("'accuracy'", data=acc)
        entry.create_dataset("'nums_seconds'", data=secs)
        tb = entry.create_group("'training_blocks'")
        for i, b in enumerate(blocks):
            tb.create_dataset(f"data_{i}", data=np.asarray(b))
        entry.create_dataset("'validation_blocks'", data=np.asarray([5, 6]))

    res = DecodingResults(str(tmp_path), 9, "xfer")
    assert res.word_error_rate.shape == (2, 3)
    np.testing.assert_allclose(res.word_error_rate, wer.reshape(2, 3))
    np.testing.assert_allclose(
        res.word_error_rate.mean_across_folds, [0.85, 0.55, 0.25]
    )
    assert res.validation_blocks == [5, 6]
    # plain-key (hickle v3-style) layout loads too
    path2 = str(tmp_path / "perf_vs_training_size_9_v3.hkl")
    with h5py.File(path2, "w") as f:
        entry = f.create_group("data")
        entry.create_dataset("word_error_rate", data=wer)
        entry.create_dataset("accuracy", data=acc)
        entry.create_dataset("nums_seconds", data=secs)
        tb = entry.create_group("training_blocks")
        for i, b in enumerate(blocks):
            tb.create_dataset(f"item_{i}", data=np.asarray(b))
        entry.create_dataset("validation_blocks", data=np.asarray([5]))
    res2 = DecodingResults(str(tmp_path), 9, "v3")
    assert res2.word_error_rate.shape == (2, 3)


def test_grid_search_reads_reference_hkl(tmp_path):
    """A reference grid_search_*.hkl tuple (all_results, parameter_names,
    grids) loads into GridSearchResults (reference plotters.py:2216-2221)."""
    from ecog2txt_tpu.plotting.hkl import save_hkl

    lrs = np.array([1e-4, 1e-3])
    bss = np.array([16.0, 32, 64])
    g_lr, g_bs = np.meshgrid(lrs, bss, indexing="ij")
    wers = np.array([[0.5, 0.4, 0.3], [0.6, 0.2, 0.25]])
    path = save_hkl(
        str(tmp_path / "grid_search_1_conv_2_way"),
        (
            {"word_error_rate": wers.ravel()},
            ["learning_rate", "batch_size"],
            [g_lr.ravel(), g_bs.ravel()],
        ),
    )
    gs = GridSearchResults(path)
    assert gs.param_names == ["learning_rate", "batch_size"]
    np.testing.assert_allclose(gs.wers, wers)
    np.testing.assert_allclose(gs.param_values["batch_size"], bss)
    best = gs.best()
    assert best["wer"] == pytest.approx(0.2)
    assert best["learning_rate"] == pytest.approx(1e-3)
    proj = gs.project("batch_size", "learning_rate")
    assert proj.shape == (2, 3)


def test_hkl_roundtrip_nested():
    """save_hkl → load_hkl preserves dict/list/array nesting."""
    import tempfile

    from ecog2txt_tpu.plotting.hkl import load_hkl, save_hkl

    obj = {
        "matrix": np.arange(6.0).reshape(2, 3),
        "names": ["alpha", "beta"],
        "nested": {"k": np.asarray([1, 2, 3])},
    }
    with tempfile.TemporaryDirectory() as d:
        path = save_hkl(os.path.join(d, "x"), obj)
        back = load_hkl(path)
    np.testing.assert_allclose(back["matrix"], obj["matrix"])
    assert [str(s) for s in back["names"]] == ["alpha", "beta"]
    np.testing.assert_array_equal(back["nested"]["k"], [1, 2, 3])


def test_weight_norm_contribs(plotter, trainer):
    contribs = plotter.elec_contribs("weight_norms")
    assert contribs.shape == (16,)
    assert (contribs > 0).all()
    # hand-check: fold stride taps and norm per input channel
    w = trainer.get_encoder_embedding(0)
    stride = trainer.net_config.conv_strides[0]
    w3 = w.reshape(stride, 16, -1)
    np.testing.assert_allclose(
        contribs, np.linalg.norm(w3, axis=(0, 2)), rtol=1e-6
    )


def test_saliency_contribs(plotter):
    contribs = plotter.elec_contribs("saliency_map")
    assert contribs.shape == (16,)
    assert (contribs >= 0).all() and contribs.sum() > 0


def test_unknown_contrib_method(plotter):
    with pytest.raises(ValueError):
        plotter.elec_contribs("nope")


def test_occlusion_contribs(plotter):
    contribs = plotter.elec_contribs(
        "occlusion_tested", mask_extent=(2, 2), stride=2
    )
    assert contribs.shape == (16,)


def test_elec_contrib_figure(plotter):
    fig = plotter.plot_elec_contribs_2D("weight_norms")
    assert fig is not None


def test_anatomy_figure(plotter):
    for kind in ("bar", "box", "violin", "kde"):
        fig = plotter.plot_contribs_by_anatomy("weight_norms", kind=kind)
        assert fig is not None


def test_gaussian_kde_density():
    from ecog2txt_tpu.plotting.plotters import _gaussian_kde

    grid = np.linspace(-4, 4, 801)
    pts = np.array([-0.5, 0.0, 0.5])
    density = _gaussian_kde(pts, grid)
    # integrates to ~1 and peaks at the data
    assert abs(np.trapezoid(density, grid) - 1.0) < 0.02
    assert grid[np.argmax(density)] == pytest.approx(0.0, abs=0.02)
    assert _gaussian_kde(np.array([]), grid).sum() == 0.0


def test_bar_plot_ecog_sequence_lengths(plotter):
    """Length-alone classification WER (reference plotters.py:1213):
    the demo corpus repeats the same 10 sentences in train and val, so
    matching by mean length must be finite and the bars must exist."""
    wer = plotter.bar_plot_ecog_sequence_lengths(threshold=0.55)
    assert np.isfinite(wer) and wer >= 0.0


def test_bar_plot_nums_examples(plotter):
    counts = plotter.bar_plot_nums_examples()
    # the demo writes records for both partitions; every observed count
    # is a positive integer per block-type subset
    assert set(counts) == {"training", "validation"}
    assert sum(counts["training"].values()) > 0
    assert sum(counts["validation"].values()) > 0
    # explicit unique-sentence dict (the reference's hard-coded MOCHA
    # subsets) is accepted
    fig_counts = plotter.bar_plot_nums_examples(
        num_sentences_dict={0: 10, 1: 10}
    )
    assert fig_counts == counts


def test_confusion_figure(plotter, trainer):
    out = trainer.assess(["validation"])
    fig = plotter.plot_confusions(
        out["validation"]["decoder_confusions"],
        trainer.target_subject.data_manifests["decoder_targets"].feature_list,
    )
    assert fig is not None
    # ≥100 classes skips
    assert plotter.plot_confusions(np.zeros((120, 120))) is None


def test_occlusion_map_figure(plotter):
    fig = plotter.plot_occlusion_map(mask_extent=(2, 2), stride=2)
    assert fig is not None


def test_perf_vs_training_figure(plotter, tmp_path):
    wer = np.array([[0.5, 0.3], [0.6, 0.2]])
    path = save_decoding_results(
        str(tmp_path / "perf_vs_training_size_1_x"),
        wer, 1 - wer, wer * 600, [[1], [1, 2]], [5],
    )
    res = DecodingResults(str(tmp_path), 1, "x")
    fig = plotter.plot_performance_vs_training_data(res)
    assert fig is not None


def test_cross_plotter_curves(tmp_path):
    wer = np.array([[0.5, 0.3]])
    save_decoding_results(
        str(tmp_path / "perf_vs_training_size_7_y"),
        wer, 1 - wer, wer * 600, [[1]], [5],
    )
    res = DecodingResults(str(tmp_path), 7, "y")
    fig = plot_performances_vs_amount_of_training_data(
        [res, res], labels=["a", "b"]
    )
    assert fig is not None


def test_annotated_performances(rng):
    a = np.abs(rng.normal(0.1, 0.02, 30))
    b = a + 0.1
    fig, results = plot_annotated_performances(
        {"ours": a, "baseline": b},
        comparisons=[("ours", "baseline")],
    )
    assert results[0]["p_value"] < 0.01


def test_plot_performance_grouped(rng):
    values = rng.normal(0.3, 0.05, 40)
    groups = np.repeat(["a", "b"], 20)
    assert plot_performance(values, groups, kind="box") is not None


def test_cluster_embeddings(rng):
    emb = rng.normal(size=(40, 16))
    proj, ids, fig = cluster_embeddings(
        emb, class_list=[f"w{i}_" for i in range(40)], num_clusters=4
    )
    assert proj.shape == (40, 2)
    assert len(set(ids.tolist())) <= 4
    assert fig is not None


def test_scatter_desequenced(rng):
    seqs = [rng.normal(size=(t, 8)) for t in (10, 15, 5)]
    proj, ids, fig = scatter_desequenced_data(seqs)
    assert proj.shape == (30, 2)
    assert set(ids.tolist()) == {0, 1, 2}


def test_anti_alias_smooths():
    x = np.zeros((20, 1))
    x[10] = 1.0
    y = anti_alias(x, 4)
    assert y.max() < 1.0 and y.sum() == pytest.approx(1.0, rel=1e-6)


def test_suffix_to_label():
    """Reference taxonomy (plotters.py:1513-1575): transfer suffixes
    carry donor ids after 'with'; 'via' → sequential TL, plain 'with' →
    parallel PTL; 'mochastar' → dual/task transfer; ablation keywords."""
    assert suffix_to_label("") == "encoder-decoder"
    assert suffix_to_label("mocha1_400") == "encoder-decoder"
    assert suffix_to_label("400_via_tl_with_401_402_x") == "+subject TL (401, 402)"
    assert suffix_to_label("400_with_401_x") == "+subject PTL (401)"
    assert (
        suffix_to_label("400_mochastar_via_tl_with_401_x")
        == "+dual TL (401)"
    )
    assert suffix_to_label("400_mochastar_x") == "+task TL"
    assert suffix_to_label("400_untargeted") == "no MFCCs"
    assert suffix_to_label("400_undecimated") == "no conv."
    assert suffix_to_label("400_decimated") == "decimated"
    assert suffix_to_label("400_lowdensity") == "low density"
    assert suffix_to_label("400_noise") == "length info. only"
    assert suffix_to_label("400_viterbi") == "phoneme-based HMM"
    assert suffix_to_label("400_cross-attention") == "cross-attention"
    assert suffix_to_label("x", BOLD_LABEL=True).startswith("{\\bfseries")


def test_latex_emitters(tmp_path):
    table = latex_table([["a", 0.123456]], ["name", "wer"])
    assert r"\toprule" in table and "0.123" in table
    legend = latex_legend(["x"], [(0.1, 0.2, 0.3)])
    assert "definecolor" in legend
    tikz = tikz_errorbar_plot([1, 2], [0.5, 0.4], [0.01, 0.02])
    path = save_tikz(tikz, str(tmp_path / "figs" / "{0}.tex"), "curve")
    assert os.path.exists(path)
    assert "addplot" in open(path).read()


def test_grid_search(tmp_path):
    wers = np.array(
        [[[0.5, 0.4], [0.3, 0.2]], [[0.6, 0.5], [0.4, 0.1]]]
    )  # axes: lr, units, dropout
    path = save_grid_search(
        str(tmp_path / "grid_search_1"),
        ["lr", "units", "dropout"],
        [[1e-3, 1e-2], [64, 128], [0.1, 0.5]],
        wers,
    )
    gs = GridSearchResults(path)
    best = gs.best()
    assert best["wer"] == pytest.approx(0.1)
    assert best["lr"] == pytest.approx(1e-2)
    proj = gs.project("lr", "units", reduce="min")
    assert proj.shape == (2, 2)
    np.testing.assert_allclose(proj, [[0.4, 0.5], [0.2, 0.1]])
    assert gs.plot_projection("lr", "dropout") is not None


def test_grid_search_conditioned_projection(tmp_path):
    wers = np.arange(24, dtype=float).reshape(2, 3, 4) / 24.0
    path = save_grid_search(
        str(tmp_path / "grid_search_2"),
        ["lr", "units", "dropout"],
        [[1e-3, 1e-2], [64, 128, 256], [0.0, 0.1, 0.3, 0.5]],
        wers,
    )
    gs = GridSearchResults(path)
    # conditioning on a value slices that axis instead of marginalizing
    proj = gs.project("dropout", "units", conditions={"lr": 1e-2})
    np.testing.assert_allclose(proj, wers[1])
    with pytest.raises(ValueError):
        gs.project("dropout", "units", conditions={"units": 64})
    with pytest.raises(ValueError):
        gs.project("dropout", "units", conditions={"lr": 123.0})


def test_all_grid_search_projections(tmp_path):
    from ecog2txt_tpu.plotting import all_grid_search_projections

    wers = np.random.default_rng(0).uniform(0, 1, (2, 3, 2, 2))
    path = save_grid_search(
        str(tmp_path / "grid_search_3"),
        ["lr", "units", "dropout", "layers"],
        [[1e-3, 1e-2], [64, 128, 256], [0.1, 0.5], [2, 3]],
        wers,
    )
    # marginal (conditioned) params: lr × units → 6 subplots, 1 figure
    figs = all_grid_search_projections(path, ["lr", "units"])
    assert len(figs) == 1 and len(figs[0].axes) == 6
    # exactly two non-marginal (heatmap) params are required
    with pytest.raises(ValueError):
        all_grid_search_projections(path, ["lr", "dropout", "layers"])
    # 5 params, 3 marginal: outer 'a' → one figure per a value, 2x2 grid
    wers5 = np.random.default_rng(1).uniform(0, 1, (2,) * 5)
    path5 = save_grid_search(
        str(tmp_path / "grid_search_5"),
        list("abcde"),
        [[0, 1]] * 5,
        wers5,
    )
    figs = all_grid_search_projections(path5, ["a", "b", "c"])
    assert len(figs) == 2 and len(figs[0].axes) == 4
    import matplotlib.pyplot as plt

    plt.close("all")


def test_ith_param_range():
    from ecog2txt_tpu.plotting import ith_param_range

    axes = [np.array([1.0, 2.0]), np.array([10.0, 20.0, 30.0])]
    mesh = np.meshgrid(*axes, indexing="ij")
    grids = np.stack([m.ravel() for m in mesh], axis=1)
    np.testing.assert_allclose(
        ith_param_range(grids, 0, (2, 3)), axes[0]
    )
    np.testing.assert_allclose(
        ith_param_range(grids, 1, (2, 3)), axes[1]
    )


def test_latex_anatomical_legend(capsys):
    from ecog2txt_tpu.plotting import print_latex_anatomical_legend

    out = print_latex_anatomical_legend()
    printed = capsys.readouterr().out
    assert out in printed
    assert r"\providecolor{precentral}{RGB}{60,20,220}" in out
    assert r"\newcommand{\anatomyLegend}" in out
    # the legend splits into a second node after 'pars orbitalis'
    assert out.count(r"\node at (0,") == 2


def test_effect_of_tabularizer():
    from ecog2txt_tpu.plotting import effect_of_tabularizer

    stats = {"p_value": 1.5e-3, "statistic": 42.0, "effect_size": 0.61}
    summary = {
        1: {"expA": {"comparisons": {"wer": {"_untargeted": dict(stats)}}}},
        2: {"expA": {"comparisons": {"wer": {"_untargeted": dict(stats)}}}},
    }
    out = effect_of_tabularizer(summary, PRINT=False)
    assert out.count(r"\ecnum{") == 2
    assert "1.5e-03" in out and "42" in out and "0.61" in out
    assert out.strip().endswith(r"\end{tabular}")


def test_get_save_path(tmp_path):
    from types import SimpleNamespace

    from ecog2txt_tpu.plotting import get_save_path

    def plotter(d):
        manifest = SimpleNamespace(
            resolve=lambda key, *a: str(tmp_path / d / "fig_{0}.png")
        )
        return SimpleNamespace(subject=SimpleNamespace(manifest=manifest))

    p = get_save_path("png", [plotter("a/x"), plotter("a/y")])
    assert p == str(tmp_path / "a" / "fig_{0}.png")


def test_trainer_results_plotter_property(trainer):
    """trainer.results_plotter lazily builds a per-target-subject plotter
    (reference trainers.py:259-275) and is assignable."""
    rp = trainer.results_plotter
    assert rp.subject is trainer.target_subject and rp.trainer is trainer
    assert trainer.results_plotter is rp  # cached
    trainer.results_plotter = "sentinel"
    assert trainer.results_plotter == "sentinel"


def test_hkl_singleton_list_roundtrip(tmp_path):
    """A genuine top-level 1-element list survives save/load (the v3
    data_0 wrapper is detected by file layout, not by value)."""
    from ecog2txt_tpu.plotting.hkl import load_hkl, save_hkl

    arr = np.arange(4.0)
    path = save_hkl(str(tmp_path / "single"), [arr])
    back = load_hkl(path)
    assert isinstance(back, list) and len(back) == 1
    np.testing.assert_allclose(back[0], arr)


def test_effect_of_tabularizer_skips_empty_subjects():
    """A subject with no comparisons must not suppress the header or
    trip the baseline-consistency assert for later subjects."""
    from ecog2txt_tpu.plotting import effect_of_tabularizer

    stats = {"p_value": 2e-4, "statistic": 7.0, "effect_size": 0.3}
    summary = {
        1: {"expA": {"comparisons": {}}},  # assessed but never compared
        2: {"expA": {"comparisons": {"wer": {"_noise": dict(stats)}}}},
    }
    out = effect_of_tabularizer(summary, PRINT=False)
    assert out.count(r"\ecnum{") == 1
    assert r"\begin{tabular}" in out  # header emitted despite subject 1
