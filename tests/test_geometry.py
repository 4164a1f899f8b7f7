"""Electrode-geometry tests against hand-computed fixtures (SURVEY §4)."""

import numpy as np

from ecog2txt_tpu.geometry import (
    ElectrodeGrid,
    SubgridParams,
    bipolar_pairs,
    electrode_layout,
)


def test_layout_numbering_and_transpose():
    # 2x3 grid: numbers 5..0 reshaped to (2,3) then transposed → (3,2)
    layout = electrode_layout((2, 3))
    np.testing.assert_array_equal(layout, [[5, 2], [4, 1], [3, 0]])


def test_layout_grid_step():
    layout = electrode_layout((4, 4), grid_step=2)
    full = electrode_layout((4, 4))
    np.testing.assert_array_equal(layout, full[::2, ::2])
    assert layout.shape == (2, 2)


def test_good_channels_layout_order():
    grid = ElectrodeGrid(grid_size=(2, 3), bad_electrodes={4})
    # layout-flattened order [5,2,4,1,3,0] minus {4}
    assert grid.good_channels == [5, 2, 1, 3, 0]
    assert grid.num_channels == 5


def test_field_potentials_doubles_channels():
    grid = ElectrodeGrid(grid_size=(2, 2), USE_FIELD_POTENTIALS=True)
    base = ElectrodeGrid(grid_size=(2, 2)).good_channels
    assert grid.good_channels == base + [e + 4 for e in base]


def test_bipolar_pairs_adjacency():
    layout = np.array([[3, 1], [2, 0]])
    pairs = bipolar_pairs(layout)
    # horizontal first, then vertical
    assert pairs == [(3, 1), (2, 0), (3, 2), (1, 0)]


def test_bipolar_good_channels_exclude_bad_member():
    grid = ElectrodeGrid(
        grid_size=(2, 2), bad_electrodes={0}, REFERENCE_BIPOLAR=True
    )
    pairs = grid.bipolar_to_elec_map
    good = grid.good_channels
    for ch in good:
        assert 0 not in pairs[ch]
    # pairs containing electrode 0 are excluded
    assert all(0 in pairs[i] for i in set(range(len(pairs))) - set(good))


def test_subgrid_inds_and_mask():
    grid = ElectrodeGrid(grid_size=(4, 4))
    sub = SubgridParams(start=(0, 0), extent=(2, 2))
    inds = sub.inds(grid)
    mask = sub.channel_mask(grid)
    assert mask.sum() == len(inds) == 4
    occluded = SubgridParams(start=(0, 0), extent=(2, 2), OCCLUDE=True)
    assert sorted(inds + occluded.inds(grid)) == list(range(16))


def test_subgrid_occlusion_mask_complement():
    grid = ElectrodeGrid(grid_size=(4, 4), bad_electrodes={3, 7})
    keep = SubgridParams(start=(1, 1), extent=(2, 2))
    drop = SubgridParams(start=(1, 1), extent=(2, 2), OCCLUDE=True)
    assert not np.any(keep.channel_mask(grid) & drop.channel_mask(grid))
    assert np.all(keep.channel_mask(grid) | drop.channel_mask(grid))
