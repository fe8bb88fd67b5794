"""Single-process rollup oracle (SURVEY §5 "oracle tests").

~100 lines of pandas/NumPy that call the SAME kernels sequentially — no Ray.
The distributed pipeline must match this exactly on counts/bytes and to
atol on float features (mirrors the reference's random-vs-oracle pattern,
/root/reference/light-curve-common/src/sort_multiple.rs:56-65).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.grid import TIER_STEP_US
from ..kernels.moments import POINT_STAT_COLUMNS, finalize_features, point_stats_arrow
from ..stages.extract import extract_text_oracle
from ..stages.gapfill import gapfill_group, gorilla_group
from ..stages.project import pages_to_points


def oracle_points(pages: pa.Table) -> pa.Table:
    return pages_to_points(extract_text_oracle(pages))


def oracle_rollup(
    points: pa.Table,
    tiers=("1h", "1d", "30d"),
    n_std: float = 1.0,
    gapfill: bool = True,
) -> dict:
    """points -> {'rollup': DataFrame, 'series': DataFrame} sequentially."""
    pdf = points.to_pandas()
    rollups = []
    for tier in tiers:
        step = TIER_STEP_US[tier]
        work = pa.Table.from_pandas(
            pdf.assign(bucket_ts_us=(pdf["t_us"] // step) * step),
            preserve_index=False,
        )
        stats_tbl = point_stats_arrow(work, ["lang", "domain", "bucket_ts_us"])
        stats = {
            c: stats_tbl[c].to_numpy(zero_copy_only=False)
            for c in POINT_STAT_COLUMNS
        }
        feats = finalize_features(stats)
        df = pd.DataFrame(
            {
                "lang": stats_tbl["lang"].to_numpy(zero_copy_only=False),
                "domain": stats_tbl["domain"].to_numpy(zero_copy_only=False),
                "tier": tier,
                "bucket_ts_us": stats_tbl["bucket_ts_us"].to_numpy(zero_copy_only=False),
                **feats,
            }
        )
        # beyond_n_std: exact two-pass per bucket
        key = ["lang", "domain", "bucket_ts_us"]
        pts = pdf.assign(bucket_ts_us=(pdf["t_us"] // step) * step).merge(
            df[key + ["mean", "std"]], on=key, how="left"
        )
        absdev = np.abs(pts["v"] - pts["mean"])
        beyond = (
            pd.DataFrame(
                {
                    "n_beyond": (absdev > n_std * pts["std"]).astype(np.int64),
                    "sum_abs_dev": absdev,
                }
            )
            .groupby([pts["lang"], pts["domain"], pts["bucket_ts_us"]], sort=False)
            .sum()
            .reset_index()
        )
        df = df.merge(beyond, on=key, how="left")
        df["beyond_1_std"] = df["n_beyond"].fillna(0) / df["n"]
        from .rollup import _stetson_k

        with np.errstate(invalid="ignore", divide="ignore"):
            k = _stetson_k(
                df["sum_abs_dev"].fillna(0).to_numpy(dtype=np.float64),
                df["n"].to_numpy(dtype=np.float64),
                df["std"].to_numpy(dtype=np.float64),
            )
        df["stetson_k"] = np.where(np.isfinite(k), k, np.nan)
        df = df.drop(columns=["n_beyond", "sum_abs_dev"])
        if gapfill:
            df = (
                df.groupby(["lang", "domain"], sort=False, group_keys=False)
                .apply(gapfill_group)
                .reset_index(drop=True)
            )
        else:
            df["filled"] = False
        rollups.append(df)
    rollup = pd.concat(rollups, ignore_index=True)
    series = (
        rollup.groupby(["lang", "domain", "tier"], sort=False, group_keys=False)
        .apply(gorilla_group)
        .reset_index(drop=True)
    )
    return {"rollup": rollup, "series": series}
