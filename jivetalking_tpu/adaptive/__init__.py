"""Pass-1.5 adaptation layer: measurements -> per-file effective filter
config (pure function; ref: internal/processor/adaptive*.go)."""

from .adapt import AdaptiveDiagnostics, adapt_config
from .config import (
    BaseFilterConfig,
    FilterConfig,
    NORM_TARGET_LUFS,
    NORM_TOLERANCE_LU,
    default_filter_config,
    derive_effective_config,
)

__all__ = [
    "AdaptiveDiagnostics",
    "adapt_config",
    "BaseFilterConfig",
    "FilterConfig",
    "NORM_TARGET_LUFS",
    "NORM_TOLERANCE_LU",
    "default_filter_config",
    "derive_effective_config",
]
