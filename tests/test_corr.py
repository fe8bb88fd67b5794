"""Bivariate co-moment aggregate: block partials + Pébay merge must equal a
direct whole-group numpy computation regardless of how rows are split into
blocks (the same merge-invariance property the univariate moments pin)."""

import numpy as np
import pyarrow as pa

from light_curve_ray.pipelines.queries import (
    _CORR_PARTIAL_SCHEMA,
    corr_merge_group,
    corr_partials,
)

KEYS = ["l_returnflag", "l_linestatus"]


def _table(rf, ls, x, y, d):
    return pa.table(
        {
            "l_returnflag": pa.array(rf, pa.string()),
            "l_linestatus": pa.array(ls, pa.string()),
            "l_extendedprice": pa.array(x, pa.float64()),
            "l_quantity": pa.array(y, pa.float64()),
            "l_discount": pa.array(d, pa.float64()),
        }
    )


def _direct(x, y, d):
    x, y, d = (np.asarray(a, float) for a in (x, y, d))
    cx, cy, cd = x - x.mean(), y - y.mean(), d - d.mean()
    corr_q = np.sum(cx * cy) / np.sqrt(np.sum(cx * cx) * np.sum(cy * cy))
    corr_d = np.sum(cx * cd) / np.sqrt(np.sum(cx * cx) * np.sum(cd * cd))
    slope = np.sum(cx * cy) / np.sum(cy * cy)  # REGR_SLOPE(x, y)
    return corr_q, corr_d, slope


def _run(tbl, splits):
    """Partial each slice independently, concat, merge per key."""
    parts = []
    lo = 0
    for hi in list(splits) + [len(tbl)]:
        if hi > lo:
            parts.append(
                corr_partials(tbl.slice(lo, hi - lo), KEYS,
                              "l_extendedprice", "l_quantity", "l_discount"))
        lo = hi
    partials = pa.concat_tables(parts) if parts else \
        _CORR_PARTIAL_SCHEMA.empty_table()
    out = {}
    df = partials.to_pandas()
    for key, grp in df.groupby(KEYS, sort=False):
        row = corr_merge_group(pa.Table.from_pandas(
            grp, schema=_CORR_PARTIAL_SCHEMA, preserve_index=False))
        out[key] = (
            row["n"][0].as_py(),
            row["corr_price_qty"][0].as_py(),
            row["corr_price_disc"][0].as_py(),
            row["slope_price_qty"][0].as_py(),
        )
    return out


def test_merge_matches_direct_any_split():
    rng = np.random.default_rng(7)
    n = 400
    rf = rng.choice(["A", "N", "R"], n).tolist()
    ls = rng.choice(["F", "O"], n).tolist()
    # |mean| >> std to exercise the centered-sums stability rationale
    x = (4e4 + 2e3 * rng.standard_normal(n)).tolist()
    y = rng.uniform(1, 50, n).tolist()
    d = rng.uniform(0, 0.1, n).tolist()
    tbl = _table(rf, ls, x, y, d)

    whole = _run(tbl, [])
    for splits in ([137], [50, 51, 300], list(range(1, n))):
        split_res = _run(tbl, splits)
        assert split_res.keys() == whole.keys()
        for key in whole:
            for a, b in zip(split_res[key], whole[key]):
                assert a == b or abs(a - b) < 1e-9 * max(1.0, abs(b))

    # and both equal the direct per-group numpy computation
    df = tbl.to_pandas()
    for key, grp in df.groupby(KEYS):
        cq, cd_, sl = _direct(grp["l_extendedprice"], grp["l_quantity"],
                              grp["l_discount"])
        n_, got_cq, got_cd, got_sl = whole[key]
        assert n_ == len(grp)
        assert abs(got_cq - cq) < 1e-9
        assert abs(got_cd - cd_) < 1e-9
        assert abs(got_sl - sl) < 1e-9 * max(1.0, abs(sl))


def test_degenerate_groups():
    # constant y -> corr/slope NULL; n=1 group -> all NULL
    tbl = _table(["A"] * 4 + ["B"], ["F"] * 4 + ["O"],
                 [10.0, 20.0, 30.0, 40.0, 5.0],
                 [7.0, 7.0, 7.0, 7.0, 3.0],
                 [0.1, 0.2, 0.3, 0.4, 0.0])
    res = _run(tbl, [2])
    a = res[("A", "F")]
    assert a[0] == 4
    assert a[1] is None and a[3] is None  # Var(qty)=0
    assert abs(a[2] - 1.0) < 1e-12  # price and discount perfectly correlated
    b = res[("B", "O")]
    assert b[0] == 1 and b[1] is None and b[2] is None and b[3] is None
