"""Auxiliary subsystems: profiling/observability, checkpoint introspection."""

from .profiling import StepTimer, trace_to  # noqa: F401
from .introspect import recover_model_sizes  # noqa: F401
from .summaries import SummaryWriter, iter_events  # noqa: F401
