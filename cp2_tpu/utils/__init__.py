"""Utilities: logging/metrics, meters, seeding, profiling."""

from cp2_tpu.utils.compile_cache import enable_persistent_compilation_cache
from cp2_tpu.utils.logging import AverageMeter, MetricLogger, ProgressMeter, setup_logger
from cp2_tpu.utils.seed import seed_everything

__all__ = [
    "AverageMeter",
    "MetricLogger",
    "ProgressMeter",
    "setup_logger",
    "seed_everything",
    "enable_persistent_compilation_cache",
]
