"""Analysis & figure layer (rebuild of reference plotters.py, SURVEY §2.7)."""

from .results import (  # noqa: F401
    DecodingResults,
    ResultsMatrix,
    save_decoding_results,
)
from .plotters import ResultsPlotter, suffix_to_label  # noqa: F401
from .figures import (  # noqa: F401
    plot_annotated_performances,
    plot_performance,
    plot_performances_vs_amount_of_training_data,
    pvalue_annotate,
)
from .embeddings import cluster_embeddings, scatter_desequenced_data  # noqa: F401
from .gridsearch import GridSearchResults, save_grid_search  # noqa: F401
from .latex import latex_legend, latex_table, save_tikz, tikz_errorbar_plot  # noqa: F401
