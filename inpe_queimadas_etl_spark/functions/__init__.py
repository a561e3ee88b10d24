"""Scalar column helpers shared across the engine."""

from .core import (
    clean_text_value,
    decimal_comma_to_double,
    event_day,
    find_col,
    norm_name,
    normalize_columns,
)
from .legend import compute_breaks

__all__ = [
    "clean_text_value",
    "compute_breaks",
    "decimal_comma_to_double",
    "event_day",
    "find_col",
    "norm_name",
    "normalize_columns",
]
