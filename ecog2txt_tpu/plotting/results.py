"""Decoding-results archives.

Rebuilds the reference's results persistence (reference
plotters.py:51-119, 1578-1592): ``DecodingResults`` loads
``perf_vs_training_size_{subject}_{suffix}`` archives with
``training_blocks``, ``validation_blocks`` and fold×datasize matrices of
``word_error_rate`` / ``accuracy`` / ``nums_seconds``; ``ResultsMatrix``
provides nan-aware mean/stderr across folds.

The reference stores these as hickle (HDF5) files; hickle is not a
dependency here, so the native container is ``.npz`` (numpy archive,
same keys).  Loading falls back to pickle for old archives.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Sequence

import numpy as np


class ResultsMatrix(np.ndarray):
    """(N_folds, N_datasizes) matrix with nan-aware statistics
    (reference plotters.py:1578-1592)."""

    def __new__(cls, data):
        return np.asarray(data, dtype=float).view(cls)

    @property
    def mean_across_folds(self) -> np.ndarray:
        return np.nanmean(np.asarray(self), axis=0)

    @property
    def stderr_across_folds(self) -> np.ndarray:
        a = np.asarray(self)
        n = np.sum(~np.isnan(a), axis=0).clip(min=1)
        return np.nanstd(a, axis=0, ddof=0) / np.sqrt(n)


_MATRIX_KEYS = ("word_error_rate", "accuracy", "nums_seconds")


def save_decoding_results(
    path: str,
    word_error_rate: np.ndarray,
    accuracy: np.ndarray,
    nums_seconds: np.ndarray,
    training_blocks: Sequence[Sequence[int]],
    validation_blocks: Sequence[int],
) -> str:
    """Write a perf-vs-training-size archive (npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(
        path,
        word_error_rate=np.asarray(word_error_rate, float),
        accuracy=np.asarray(accuracy, float),
        nums_seconds=np.asarray(nums_seconds, float),
        training_blocks=np.asarray(
            [",".join(map(str, b)) for b in training_blocks], dtype=object
        ),
        validation_blocks=np.asarray(list(validation_blocks)),
        allow_pickle=True,
    )
    return path


class DecodingResults:
    """Load a perf-vs-training-size archive (reference
    plotters.py:51-119): ``perf_vs_training_size_{subject}_{suffix}``
    under ``saved_results_dir``."""

    def __init__(
        self,
        saved_results_dir: str,
        subject: int | str,
        suffix: str = "",
        path: str | None = None,
    ):
        if path is None:
            stem = f"perf_vs_training_size_{subject}"
            if suffix:
                stem += f"_{suffix}"
            path = os.path.join(saved_results_dir, stem)
        data = self._load(path)
        self.training_blocks = data["training_blocks"]
        self.validation_blocks = list(data["validation_blocks"])
        self.word_error_rate = ResultsMatrix(data["word_error_rate"])
        self.accuracy = ResultsMatrix(data["accuracy"])
        self.nums_seconds = ResultsMatrix(data["nums_seconds"])

    @staticmethod
    def _load(path: str) -> dict[str, Any]:
        for candidate in (path, path + ".npz", path + ".pkl"):
            if not os.path.exists(candidate):
                continue
            if candidate.endswith(".pkl"):
                with open(candidate, "rb") as f:
                    return pickle.load(f)
            with np.load(candidate, allow_pickle=True) as z:
                out = {k: z[k] for k in z.files}
            out["training_blocks"] = [
                [int(x) for x in str(s).split(",") if x]
                for s in out["training_blocks"]
            ]
            return out
        raise FileNotFoundError(f"no results archive at {path}(.npz|.pkl)")

    @property
    def num_folds(self) -> int:
        return self.word_error_rate.shape[0]

    @property
    def num_datasizes(self) -> int:
        return self.word_error_rate.shape[1]

    def summary(self) -> dict[str, np.ndarray]:
        return {
            "training_minutes": self.nums_seconds.mean_across_folds / 60.0,
            "wer_mean": self.word_error_rate.mean_across_folds,
            "wer_stderr": self.word_error_rate.stderr_across_folds,
            "accuracy_mean": self.accuracy.mean_across_folds,
        }
