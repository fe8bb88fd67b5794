"""Sources: deterministic synthetic pages generator + parquet helpers."""

from .pages import generate_pages_table, write_pages_parquet

__all__ = ["generate_pages_table", "write_pages_parquet"]
