"""Hyperparameter grid-search projections.

Rebuilds the reference's grid-search heatmap machinery (reference
plotters.py:2159-2257): results of a hyperparameter sweep are stored as
``grid_search_{subject}_…`` archives mapping hyperparameter settings →
WER; 2-D projections marginalize (min or mean) over the remaining axes.
Native container is npz (hickle-free, like plotting.results).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def save_grid_search(
    path: str,
    param_names: Sequence[str],
    param_values: Sequence[Sequence],
    wers: np.ndarray,
) -> str:
    """``wers`` has one axis per hyperparameter, in ``param_names``
    order."""
    if not path.endswith(".npz"):
        path += ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        param_names=np.asarray(param_names, dtype=object),
        wers=np.asarray(wers, float),
        allow_pickle=True,
        **{
            f"values_{name}": np.asarray(vals)
            for name, vals in zip(param_names, param_values)
        },
    )
    return path


class GridSearchResults:
    def __init__(self, path: str):
        for ext in (".npz", ".hkl"):
            if not path.endswith(ext) and os.path.exists(path + ext):
                path += ext
                break
        if path.endswith(".hkl"):
            self._init_from_hkl(path)
            return
        with np.load(path, allow_pickle=True) as z:
            self.param_names = [str(n) for n in z["param_names"]]
            self.wers = z["wers"]
            self.param_values = {
                name: z[f"values_{name}"] for name in self.param_names
            }

    def _init_from_hkl(self, path: str) -> None:
        """Reference-toolchain archive: a hickle tuple ``(all_results,
        parameter_names, grids)`` where ``grids`` are meshgrid-flattened
        coordinates over the search grid (reference
        plotters.py:2216-2221, 2159-2199)."""
        from .hkl import find_mapping, load_hkl

        raw = load_hkl(path)
        if not (isinstance(raw, (list, tuple)) and len(raw) >= 3):
            raise ValueError(f"{path}: expected (results, names, grids)")
        all_results, parameter_names, grids = raw[0], raw[1], raw[2]
        results = find_mapping(all_results, ("word_error_rate",))
        if results is None:
            raise ValueError(f"{path}: no word_error_rate in results")
        self.param_names = [str(n) for n in np.atleast_1d(parameter_names)]
        grids = [np.asarray(g, float) for g in grids]
        # grid shape: per-axis unique-count, in meshgrid('ij') layout
        grid_shape = tuple(
            len(np.unique(g)) for g in grids
        )
        wers = np.asarray(results["word_error_rate"], float).reshape(
            grid_shape
        )
        self.wers = wers
        self.param_values = {}
        for i, name in enumerate(self.param_names):
            g = grids[i].reshape(grid_shape)
            index = tuple(
                slice(None) if j == i else 0 for j in range(len(grid_shape))
            )
            self.param_values[name] = g[index]

    def project(
        self, x_param: str, y_param: str, reduce: str = "min"
    ) -> np.ndarray:
        """Marginalize all other axes (min = best-case, mean = average)
        → (len(y values), len(x values)) heatmap matrix."""
        xi = self.param_names.index(x_param)
        yi = self.param_names.index(y_param)
        axes = tuple(
            i for i in range(self.wers.ndim) if i not in (xi, yi)
        )
        fn = {"min": np.nanmin, "mean": np.nanmean, "max": np.nanmax}[reduce]
        out = fn(self.wers, axis=axes) if axes else self.wers
        if xi < yi:
            out = out.T
        return out

    def best(self) -> dict:
        idx = np.unravel_index(np.nanargmin(self.wers), self.wers.shape)
        return {
            "wer": float(self.wers[idx]),
            **{
                name: self.param_values[name][i]
                for name, i in zip(self.param_names, idx)
            },
        }

    def plot_projection(
        self, x_param: str, y_param: str, reduce: str = "min", ax=None
    ):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=(6, 5))
        else:
            fig = ax.figure
        matrix = self.project(x_param, y_param, reduce)
        im = ax.imshow(matrix, cmap="viridis", aspect="auto")
        ax.set_xticks(
            range(len(self.param_values[x_param])),
            [str(v) for v in self.param_values[x_param]],
        )
        ax.set_yticks(
            range(len(self.param_values[y_param])),
            [str(v) for v in self.param_values[y_param]],
        )
        ax.set_xlabel(x_param)
        ax.set_ylabel(y_param)
        fig.colorbar(im, ax=ax, label=f"{reduce} WER")
        return fig
