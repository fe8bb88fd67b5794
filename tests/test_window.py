"""Sliding-window aggregate tests: state-merge windows vs a brute-force
per-window recomputation over raw points, including bucket GAPS (absent
slots contribute nothing) and multi-series blocks."""

import numpy as np
import pyarrow as pa


def test_sliding_window_matches_bruteforce(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.aggregate import (
        make_partial_stats_fn,
        merge_partials,
    )
    from light_curve_ray.stages.window import sliding_window_states

    step = 3_600_000_000
    rng = np.random.RandomState(4)
    rows = []
    for lang, dom, slots in [("en", "a", [0, 1, 2, 5, 6, 9]),
                             ("en", "b", [0, 3]),
                             ("de", "a", [2])]:
        for s in slots:
            for _ in range(rng.randint(1, 6)):
                rows.append((lang, dom,
                             s * step + int(rng.randint(0, step)),
                             float(rng.normal(10, 3))))
    tbl = pa.table({
        "lang": pa.array([r[0] for r in rows]),
        "domain": pa.array([r[1] for r in rows]),
        "t_us": pa.array([r[2] for r in rows], pa.int64()),
        "v": pa.array([r[3] for r in rows], pa.float64()),
        "w": pa.array([1.0] * len(rows), pa.float64()),
    })
    pts = rd.from_arrow(tbl).repartition(5)
    partials = pts.map_batches(make_partial_stats_fn(step),
                               batch_format="pyarrow", zero_copy_batch=True)
    fine = merge_partials(partials)
    got = sliding_window_states(fine, ["lang", "domain"], step,
                                window=3).to_pandas()
    got = got.sort_values(["lang", "domain", "bucket_ts_us"]
                          ).reset_index(drop=True)

    # brute force: every bucket's window recomputed from raw points
    import pandas as pd

    df = pd.DataFrame(rows, columns=["lang", "domain", "t_us", "v"])
    df["bucket"] = (df["t_us"] // step) * step
    exp_rows = []
    for (lang, dom, b), _ in df.groupby(["lang", "domain", "bucket"]):
        sel = df[(df["lang"] == lang) & (df["domain"] == dom)
                 & (df["bucket"] >= b - 2 * step) & (df["bucket"] <= b)]
        v = sel["v"].to_numpy()
        exp_rows.append((lang, dom, b, len(v), v.mean(),
                         v.std(ddof=1) if len(v) > 1 else np.nan,
                         v.min(), v.max()))
    exp = pd.DataFrame(exp_rows, columns=[
        "lang", "domain", "bucket_ts_us", "w_n", "w_mean", "w_std",
        "w_min", "w_max"]).sort_values(
        ["lang", "domain", "bucket_ts_us"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["lang", "domain", "bucket_ts_us", "w_n"]:
        assert list(got[c]) == list(exp[c]), c
    for c in ["w_mean", "w_std", "w_min", "w_max"]:
        g = got[c].to_numpy(float)
        e = exp[c].to_numpy(float)
        ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) < 1e-9)
        assert bool(np.all(ok)), c
