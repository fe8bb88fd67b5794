"""Projection stage (SURVEY §2b-O3..O5): pages -> points.

Stateless, fully vectorized pyarrow.compute batch transform — no Python row
loop, no shuffle.  Emits the points table

    (lang: string, domain: string, t_us: int64, v: float64, w: float64)

where ``domain`` is parsed from ``url`` with the SAME regex as the Python
kernel and the DuckDB oracle (kernels/textkit.URL_DOMAIN_PATTERN), ``v`` is
the per-page scalar metric (extracted-text length in characters) and ``w`` a
unit weight.  Rows with null url/timestamp are filtered here (O4, fused into
the projection so no extra pass).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.textkit import URL_DOMAIN_PATTERN


def pages_to_points(batch: pa.Table) -> pa.Table:
    """pages (post-extract) -> points.  Vectorized; drops bad rows."""
    mask = pc.and_(pc.is_valid(batch["url"]), pc.is_valid(batch["warc_ts"]))
    batch = batch.filter(mask)
    extracted = pc.extract_regex(batch["url"], URL_DOMAIN_PATTERN)
    domain = pc.utf8_lower(pc.struct_field(extracted, "domain"))
    domain = pc.fill_null(domain, "")
    text = pc.fill_null(batch["text"], "")
    v = pc.cast(pc.utf8_length(text), pa.float64())
    t_us = pc.cast(batch["warc_ts"], pa.int64())
    n = len(batch)
    return pa.table(
        {
            "lang": pc.fill_null(batch["lang"], "und"),
            "domain": domain,
            "t_us": t_us,
            "v": v,
            "w": pa.array([1.0] * n, pa.float64()),
        }
    )


def table_to_points(
    batch: pa.Table,
    key_cols: list,
    ts_col: str,
    value_col: str,
    weight_col: str | None = None,
) -> pa.Table:
    """Generic timestamped-table -> points adapter (events, lineitem, ...).

    ``key_cols``: up to two columns mapped onto (lang, domain); one key col
    maps to domain with lang='all'.  Keeps the rollup operators reusable over
    any input shape (the capability matrix is about semantics, not schema).
    """
    mask = pc.and_(pc.is_valid(batch[ts_col]), pc.is_valid(batch[value_col]))
    for k in key_cols:
        mask = pc.and_(mask, pc.is_valid(batch[k]))
    batch = batch.filter(mask)
    n = len(batch)
    if len(key_cols) == 2:
        lang = pc.cast(batch[key_cols[0]], pa.string())
        domain = pc.cast(batch[key_cols[1]], pa.string())
    else:
        lang = pa.array(["all"] * n, pa.string())
        domain = pc.cast(batch[key_cols[0]], pa.string())
    ts = batch[ts_col]
    if pa.types.is_timestamp(ts.type):
        t_us = pc.cast(ts, pa.int64())
        if ts.type.unit == "s":
            t_us = pc.multiply(t_us, 1_000_000)
        elif ts.type.unit == "ms":
            t_us = pc.multiply(t_us, 1_000)
        elif ts.type.unit == "ns":
            t_us = pc.divide(t_us, 1_000)
    elif pa.types.is_date(ts.type):
        t_us = pc.multiply(pc.cast(pc.cast(ts, pa.date32()), pa.int64()), 86_400_000_000)
    else:
        t_us = pc.cast(ts, pa.int64())
    v = pc.cast(batch[value_col], pa.float64())
    w = (
        pc.cast(batch[weight_col], pa.float64())
        if weight_col
        else pa.array([1.0] * n, pa.float64())
    )
    return pa.table(
        {"lang": lang, "domain": domain, "t_us": t_us, "v": v, "w": w}
    )
