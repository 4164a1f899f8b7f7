"""Compute ops: scan-based recurrences and (optional) Pallas TPU kernels."""

from .lstm import (  # noqa: F401
    init_lstm_params,
    lstm_scan,
    bidirectional_lstm,
    reverse_padded,
)
