"""LaTeX / TikZ emitters.

Rebuilds the reference's LaTeX legend and table emitters (reference
plotters.py:2260-2310, 2420-2462) and the ``tpl_save``-style TikZ
export from ``utils_jgm`` (pgfplots-ready data tables +
``tikz_partial_path`` naming, mocha-1_word_sequence.yaml:80).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def latex_table(
    rows: Sequence[Sequence],
    headers: Sequence[str],
    caption: str = "",
    label: str = "",
    float_fmt: str = "{:.3f}",
) -> str:
    """Booktabs-style table body."""
    def fmt(cell):
        if isinstance(cell, (float, np.floating)):
            return float_fmt.format(cell)
        return str(cell).replace("_", r"\_")

    lines = [
        r"\begin{table}",
        r"\centering",
        r"\begin{tabular}{" + "l" * len(headers) + "}",
        r"\toprule",
        " & ".join(fmt(h) for h in headers) + r" \\",
        r"\midrule",
    ]
    for row in rows:
        lines.append(" & ".join(fmt(c) for c in row) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}"]
    if caption:
        lines.append(rf"\caption{{{caption}}}")
    if label:
        lines.append(rf"\label{{{label}}}")
    lines.append(r"\end{table}")
    return "\n".join(lines)


def latex_legend(
    labels: Sequence[str], colors: Sequence[tuple[float, float, float]]
) -> str:
    """Standalone color legend as TikZ markers (reference
    plotters.py:2260-2310)."""
    lines = [r"\begin{tikzpicture}"]
    for i, (label, rgb) in enumerate(zip(labels, colors)):
        r, g, b = (float(c) for c in rgb[:3])
        lines.append(
            rf"\definecolor{{legend{i}}}{{rgb}}{{{r:.3f},{g:.3f},{b:.3f}}}"
        )
        lines.append(
            rf"\node[circle,fill=legend{i},inner sep=2pt,"
            rf"label=right:{{{label}}}] at (0,{-0.5 * i:.2f}) {{}};"
        )
    lines.append(r"\end{tikzpicture}")
    return "\n".join(lines)


def tikz_errorbar_plot(
    x: np.ndarray,
    y: np.ndarray,
    yerr: np.ndarray | None = None,
    xlabel: str = "x",
    ylabel: str = "y",
    series_name: str = "series",
) -> str:
    """pgfplots axis with an errorbar series — the tikz figure-export
    path (reference exports every figure via utils_jgm.tpl_save)."""
    rows = []
    yerr = np.zeros_like(np.asarray(y, float)) if yerr is None else yerr
    for xi, yi, ei in zip(x, y, yerr):
        rows.append(f"{float(xi):.6f} {float(yi):.6f} {float(ei):.6f}")
    table = "\n".join(rows)
    return "\n".join(
        [
            r"\begin{tikzpicture}",
            rf"\begin{{axis}}[xlabel={{{xlabel}}}, ylabel={{{ylabel}}}]",
            r"\addplot+[error bars/.cd, y dir=both, y explicit]",
            r"table[x index=0, y index=1, y error index=2] {",
            table,
            r"};",
            rf"\addlegendentry{{{series_name}}}",
            r"\end{axis}",
            r"\end{tikzpicture}",
        ]
    )


def save_tikz(content: str, tikz_partial_path: str, name: str) -> str:
    """Write a ``.tex`` snippet to ``tikz_partial_path.format(name)``."""
    path = tikz_partial_path.format(name)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(content + "\n")
    return path
