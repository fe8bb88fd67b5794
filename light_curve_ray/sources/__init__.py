"""Sources: deterministic synthetic pages generator + parquet helpers."""

from .compact import compact_parquet, plan_buckets
from .pages import generate_pages_table, write_pages_parquet

__all__ = ["compact_parquet", "generate_pages_table", "plan_buckets",
           "write_pages_parquet"]
