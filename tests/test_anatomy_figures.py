"""Anatomy loader + extended figure tests."""

import numpy as np
import pytest
from scipy.io import savemat

from ecog2txt_tpu.demo import make_demo_experiment
from ecog2txt_tpu.plotting.anatomy import (
    anatomy_labels_from_manifest,
    electrode_locs_3D,
    load_electrode_file,
    pool_label,
)
from ecog2txt_tpu.plotting.plotters import ResultsPlotter
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
def elec_mat(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("elec") / "TDT_elecs_all.mat")
    n = 16
    rng = np.random.default_rng(0)
    positions = rng.normal(size=(n, 3)) - [50, 0, 0]  # left hemisphere
    labels = np.array(
        [["e%d" % i, "precentral" if i < 8 else "superiortemporal"]
         for i in range(n)],
        dtype=object,
    )
    savemat(path, {"elecmatrix": positions, "anatomy": labels})
    return path


@pytest.fixture(scope="module")
def trainer(tmp_path_factory, elec_mat):
    root = tmp_path_factory.mktemp("figs")
    mp = make_demo_experiment(
        str(root / "exp"), subject_ids=(1,), layer_sizes=TINY,
        electrode_path=elec_mat,
    )
    tr = MultiSubjectTrainer(
        mp, [1], SN_kwargs={"batch_size": 16, "max_dec_len": 10,
                            "N_epochs": 6},
        VERBOSE=False,
    )
    tr.fit(assess=False)
    return tr


def test_pool_label():
    assert pool_label("ctx-lh-precentral") == "vSMC"
    assert pool_label("parstriangularis") == "IFG"
    assert pool_label("rostralmiddlefrontal") == "middle frontal"
    assert pool_label("somewhere else") == "somewhere else"


def test_load_electrode_file(elec_mat):
    info = load_electrode_file(elec_mat)
    assert info["positions"].shape == (16, 3)
    assert info["hemisphere"] == "lh"
    assert info["labels"][0] == "vSMC"
    assert info["labels"][-1] == "superior temporal"


def test_anatomy_from_manifest(trainer):
    labels = anatomy_labels_from_manifest(trainer.manifest)
    assert labels[0] == "vSMC"
    locs = electrode_locs_3D(trainer.manifest)
    assert locs.shape == (16, 3)


def test_plotter_uses_electrode_file(trainer):
    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    labels = plotter.anatomy_labels()
    assert set(labels) <= {"vSMC", "superior temporal"}
    fig = plotter.plot_contribs_by_anatomy("weight_norms")
    assert fig is not None


def test_3d_contrib_figure(trainer):
    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    fig = plotter.plot_elec_contribs_3D("weight_norms")
    assert fig is not None


def test_on_brain_figure_generic_surface(trainer):
    """Degraded brain-surface rendering: no mesh asset configured →
    generic pial-like ellipsoid under the electrode scatter
    (reference img_pipe path, plotters.py:771-795; VERDICT #10)."""
    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    fig = plotter.plot_elec_contribs_on_brain("weight_norms")
    assert fig is not None
    ax = fig.axes[0]
    assert ax.name == "3d"
    # the surface adds a Poly3DCollection beyond the electrode scatter
    assert len(ax.collections) >= 2


def test_on_brain_figure_with_mesh_file(trainer, tmp_path):
    """A configured cortical_mesh_file (.mat cortex struct with
    1-indexed tri, the img_pipe export convention) renders instead of
    the generic surface."""
    from ecog2txt_tpu.plotting.anatomy import load_cortical_mesh

    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]]
    ) * 30 - [60, 0, 0]
    tris = np.asarray([[1, 2, 3], [1, 2, 4], [1, 3, 4], [2, 3, 4]])  # 1-idx
    path = str(tmp_path / "cortex.mat")
    savemat(path, {"cortex": {"vert": verts, "tri": tris}})
    manifest = trainer.manifest.updated({"cortical_mesh_file": path})
    mesh = load_cortical_mesh(manifest)
    assert mesh["vertices"].shape == (4, 3)
    assert mesh["faces"].min() == 0  # converted to 0-indexing
    # npz form round-trips too
    npz = str(tmp_path / "cortex.npz")
    np.savez(npz, vertices=mesh["vertices"], faces=mesh["faces"])
    mesh2 = load_cortical_mesh(
        trainer.manifest.updated({"cortical_mesh_file": npz})
    )
    np.testing.assert_array_equal(mesh2["faces"], mesh["faces"])

    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    plotter.subject.manifest = manifest
    fig = plotter.plot_elec_contribs_on_brain("weight_norms")
    assert fig is not None


def test_activity_animation(trainer):
    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    ds = trainer.packed_dataset("validation")
    trial = ds.encoder_inputs[0, 0, : int(ds.encoder_lengths[0, 0])]
    anim = plotter.plot_activity_animation(trial, stride=48)
    assert anim is not None


def test_network_schematic(trainer):
    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    fig = plotter.plot_network_schematic("validation")
    assert fig is not None


def test_sentence_repeats_figure(trainer):
    counters = trainer.target_subject.count_targets(["training"])
    counted = {
        s: c
        for s, c in zip(
            counters["training"].unique_sentences,
            counters["training"].counts,
        )
    }
    plotter = ResultsPlotter(trainer.target_subject, trainer, VERBOSE=False)
    fig = plotter.plot_sentence_repeats(counted, nominal=4)
    assert fig is not None
