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
        if not path.endswith(".npz") and os.path.exists(path + ".npz"):
            path += ".npz"
        with np.load(path, allow_pickle=True) as z:
            self.param_names = [str(n) for n in z["param_names"]]
            self.wers = z["wers"]
            self.param_values = {
                name: z[f"values_{name}"] for name in self.param_names
            }

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
