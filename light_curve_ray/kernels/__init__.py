"""Pure single-process kernels (NumPy / stdlib only — no Ray imports).

Semantics are pinned to the reference crates (file:line citations in each
module) and verified by transliterated golden tests in ``tests/``.
"""

from .allclose import all_close
from .cosort import sort_multiple
from .grid import bucket_floor, bucket_grid, linspace
from .interp import interpolate
from .moments import (
    POINT_STAT_COLUMNS,
    finalize_features,
    point_stats_arrow,
)
from .gorilla import gorilla_decode, gorilla_encode

__all__ = [
    "all_close",
    "sort_multiple",
    "linspace",
    "bucket_floor",
    "bucket_grid",
    "interpolate",
    "POINT_STAT_COLUMNS",
    "point_stats_arrow",
    "finalize_features",
    "gorilla_encode",
    "gorilla_decode",
]
