"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship tiered rollup on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` come from light_curve_ray.pipelines.queries
— one entry per operator from SURVEY.md §2 (rollup tiers, gap-fill,
interpolation, dedup family, similarity search, text analysis, Gorilla,
multimodal plumbing), SQL-checked wherever ANSI SQL can express the
semantics.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init() / ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: events -> points ->
    tiered (1h/1d/30d) feature rollup -> gap-fill; returns the rollup
    Dataset (driver checks rows >= 0, stable schema)."""
    from light_curve_ray.pipelines.rollup import RollupConfig, run_rollup

    cfg = RollupConfig(
        input_paths="/root/testdata/sf0.001/events.parquet",
        input_kind="table",
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        tiers=("1h", "1d", "30d"),
        gorilla=False,
    )
    return run_rollup(cfg)["rollup"]


def queries() -> dict[str, Callable[[str], Any]]:
    from light_curve_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from light_curve_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
