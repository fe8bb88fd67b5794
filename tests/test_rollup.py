"""End-to-end rollup tests: distributed pipeline vs single-process oracle on
the deterministic synthetic pages table (SURVEY §5 oracle tests)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from light_curve_ray.pipelines.oracle import oracle_points, oracle_rollup
from light_curve_ray.pipelines.rollup import RollupConfig, run_rollup
from light_curve_ray.sources.pages import generate_pages_table

KEY = ["lang", "domain", "tier", "bucket_ts_us"]


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    tbl = generate_pages_table(n_rows=1000, n_domains=20, seed=42)
    pq.write_table(tbl, str(d / "pages-0.parquet"))
    return str(d), tbl


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(KEY).reset_index(drop=True)


def test_rollup_matches_oracle(ray_session, pages_dir, tmp_path):
    d, tbl = pages_dir
    cfg = RollupConfig(
        input_paths=d,
        input_kind="pages",
        tiers=("1h", "1d", "30d"),
        out_dir=str(tmp_path / "out"),
        extract_concurrency=2,
    )
    result = run_rollup(cfg)
    got = _sorted(result["rollup"].to_pandas())

    exp = oracle_rollup(oracle_points(tbl))
    exp_rollup = _sorted(exp["rollup"])

    assert len(got) == len(exp_rollup)
    assert list(got["lang"]) == list(exp_rollup["lang"])
    assert list(got["domain"]) == list(exp_rollup["domain"])
    assert list(got["bucket_ts_us"]) == list(exp_rollup["bucket_ts_us"])
    np.testing.assert_array_equal(got["n"], exp_rollup["n"])
    np.testing.assert_array_equal(got["filled"], exp_rollup["filled"])
    for col in ["mean", "wmean", "std", "skew", "kurtosis", "amplitude",
                "beyond_1_std", "linear_trend_slope"]:
        g = got[col].to_numpy(dtype=np.float64)
        e = exp_rollup[col].to_numpy(dtype=np.float64)
        both_nan = np.isnan(g) & np.isnan(e)
        close = np.abs(g - e) < 1e-9 * np.maximum(1.0, np.abs(e))
        assert bool(np.all(both_nan | close)), col

    # gorilla series blobs: timestamps exact, values atol-equal after decode
    # (distributed Pébay merge order shifts means by ~1 ulp vs the
    # sequential oracle, so byte-identity across merge orders cannot hold;
    # encode->decode identity is pinned by test_gorilla.py)
    from light_curve_ray.kernels.gorilla import gorilla_decode

    got_series = result["series"].to_pandas().sort_values(["lang", "domain", "tier"]).reset_index(drop=True)
    exp_series = exp["series"].sort_values(["lang", "domain", "tier"]).reset_index(drop=True)
    assert len(got_series) == len(exp_series)
    for i in range(len(got_series)):
        gt, gv = gorilla_decode(bytes(got_series["points_gorilla"][i]))
        et, ev = gorilla_decode(bytes(exp_series["points_gorilla"][i]))
        np.testing.assert_array_equal(gt, et)
        np.testing.assert_allclose(gv, ev, rtol=1e-12)

    # parquet written partitioned by tier
    import os
    out = str(tmp_path / "out" / "rollup")
    assert any("tier=1h" in p for p in os.listdir(out))


def test_extract_byte_identical(ray_session, pages_dir):
    """The per-row invariant (BASELINE.json input_hint): distributed extract
    output is byte-identical per url to the single-process kernel."""
    import ray.data as rd

    from light_curve_ray.stages.extract import ExtractTextStage

    d, tbl = pages_dir
    ds = rd.read_parquet(d).map_batches(
        ExtractTextStage, batch_format="pyarrow", batch_size=128, concurrency=2
    )
    got = ds.to_pandas().drop_duplicates("url").set_index("url")["text"]
    exp_tbl = oracle_points(tbl)  # includes extraction via same kernel
    from light_curve_ray.stages.extract import extract_text_oracle

    exp = extract_text_oracle(tbl).to_pandas().drop_duplicates("url").set_index("url")["text"]
    assert len(got) == len(exp)
    for url in exp.index:
        assert got[url].encode() == exp[url].encode()


def test_tier_cascade_equals_direct(ray_session, pages_dir):
    """1d stats cascaded from 1h partials == 1d computed directly from points
    (exact sum algebra, stages/aggregate.shift_stats)."""
    d, tbl = pages_dir
    cfg = RollupConfig(input_paths=d, input_kind="pages", tiers=("1h", "1d"),
                       gapfill=False, gorilla=False, compute_beyond=False)
    res = run_rollup(cfg)
    got_1d = res["rollup"].to_pandas()
    got_1d = got_1d[got_1d["tier"] == "1d"]

    exp = oracle_rollup(oracle_points(tbl), tiers=("1d",), gapfill=False)["rollup"]
    m = got_1d.merge(exp, on=["lang", "domain", "bucket_ts_us"], suffixes=("_g", "_e"))
    assert len(m) == len(exp) == len(got_1d)
    for col in ["mean", "std", "skew", "kurtosis", "linear_trend_slope"]:
        g = m[f"{col}_g"].to_numpy(dtype=np.float64)
        e = m[f"{col}_e"].to_numpy(dtype=np.float64)
        ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) < 1e-8 * np.maximum(1, np.abs(e)))
        assert bool(np.all(ok)), col


def test_driver_tail_equals_distributed_tail(ray_session, pages_dir):
    """The adaptive in-process tail (small_rollup_limit) and the forced
    distributed tail produce identical rollups and equivalent series."""
    d, tbl = pages_dir
    base = dict(input_paths=d, input_kind="pages", tiers=("1h", "1d"),
                extract_concurrency=2)
    small = run_rollup(RollupConfig(**base))  # default: driver tail
    assert small["phases"].get("tail_mode") == "driver"
    # force BOTH scale paths: distributed sort-merge AND distributed tail
    dist = run_rollup(RollupConfig(**base, small_rollup_limit=0,
                                   driver_merge_limit=0))
    assert "tail_mode" not in dist["phases"]

    a = _sorted(small["rollup"].to_pandas())
    b = _sorted(dist["rollup"].to_pandas())
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["n"], b["n"])
    np.testing.assert_array_equal(a["filled"], b["filled"])
    for col in ["mean", "wmean", "std", "skew", "kurtosis", "amplitude",
                "beyond_1_std", "linear_trend_slope"]:
        g = a[col].to_numpy(np.float64)
        e = b[col].to_numpy(np.float64)
        ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) <= 1e-9 * np.maximum(1, np.abs(e)))
        assert bool(np.all(ok)), col

    sa = small["series"].to_pandas().sort_values(["lang", "domain", "tier"]).reset_index(drop=True)
    sb = dist["series"].to_pandas().sort_values(["lang", "domain", "tier"]).reset_index(drop=True)
    assert list(sa["n_buckets"]) == list(sb["n_buckets"])


def test_fused_extract_equals_split(ray_session, pages_dir):
    """Fused read+extract+project actors produce the same points as the
    split read -> actor-pool topology."""
    from light_curve_ray.pipelines.rollup import points_dataset

    d, tbl = pages_dir
    split = points_dataset(RollupConfig(
        input_paths=d, input_kind="pages", extract_concurrency=2))
    fused = points_dataset(RollupConfig(
        input_paths=d, input_kind="pages", extract_mode="fused",
        extract_concurrency=2))
    a = split.to_pandas().sort_values(["domain", "t_us", "v"]).reset_index(drop=True)
    b = fused.to_pandas().sort_values(["domain", "t_us", "v"]).reset_index(drop=True)
    assert len(a) == len(b)
    for c in ["lang", "domain", "t_us"]:
        assert list(a[c]) == list(b[c]), c
    np.testing.assert_array_equal(a["v"], b["v"])


def test_beyond_join_path_equals_broadcast(ray_session, pages_dir):
    """The Dataset.join scale path of the beyond pass matches the
    broadcast path (forced via beyond_broadcast_limit=0)."""
    d, tbl = pages_dir
    base = dict(input_paths=d, input_kind="pages", tiers=("1d",),
                gapfill=False, gorilla=False, extract_concurrency=2,
                small_rollup_limit=0)
    bc = run_rollup(RollupConfig(**base))
    jn = run_rollup(RollupConfig(**base, beyond_broadcast_limit=0))
    key = ["lang", "domain", "tier", "bucket_ts_us"]
    a = bc["rollup"].to_pandas().sort_values(key).reset_index(drop=True)
    b = jn["rollup"].to_pandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["n"], b["n"])
    ga = a["beyond_1_std"].to_numpy(np.float64)
    gb = b["beyond_1_std"].to_numpy(np.float64)
    ok = (np.isnan(ga) & np.isnan(gb)) | (np.abs(ga - gb) < 1e-12)
    assert bool(np.all(ok))


def test_rollup_metrics_present(ray_session, pages_dir):
    """O12: run_rollup surfaces per-stage rows, throughput and skew
    metrics in BOTH tail modes, and persists them next to the sink."""
    import json
    import os

    from light_curve_ray.pipelines.rollup import RollupConfig, run_rollup

    d, _tbl = pages_dir
    for limit, mode in ((10**9, "driver"), (0, "distributed")):
        out_dir = f"/tmp/lcr_test_metrics_{mode}"
        res = run_rollup(RollupConfig(
            input_paths=d, input_kind="pages", tiers=("1d",),
            small_rollup_limit=limit, out_dir=out_dir,
            extract_concurrency=2))
        m = res["metrics"]
        assert m["tail_mode"] == mode
        assert m["rows"]["points"] > 0
        assert m["rows"]["rollup"] > 0
        assert m["points_per_s"] and m["points_per_s"] > 0
        assert 0 < m["skew"]["top_domain_share"] <= 1
        assert m["skew"]["n_domains"] > 0
        assert "points" in m["phase_wall_s"]
        with open(os.path.join(out_dir, "metrics.json")) as f:
            assert json.load(f)["rows"]["rollup"] == m["rows"]["rollup"]


def test_rollup_empty_input(ray_session, tmp_path):
    """Degenerate inputs must not crash: pages table with zero valid rows
    yields an empty rollup in both tail modes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from light_curve_ray.pipelines.rollup import RollupConfig, run_rollup

    tbl = pa.table({
        "url": pa.array([None, None], pa.string()),
        "warc_ts": pa.array([None, None], pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>", b"<p>y</p>"], pa.binary()),
        "text": pa.array([None, None], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    })
    f = str(tmp_path / "empty.parquet")
    pq.write_table(tbl, f)
    for limit in (10**9, 0):
        res = run_rollup(RollupConfig(
            input_paths=f, input_kind="pages", tiers=("1d",),
            small_rollup_limit=limit, extract_concurrency=2))
        assert res["rollup"].count() == 0


def test_gapfill_block_kernel_matches_per_group():
    """gapfill_block_arrow (vectorized all-series) must be BIT-IDENTICAL
    to per-series gapfill_group_arrow on a key-sorted multi-series block
    with interior gaps, dense series, and single-bucket series."""
    import numpy as np
    import pyarrow as pa

    from light_curve_ray.kernels.grid import TIER_STEP_US
    from light_curve_ray.stages.gapfill import (
        ROLLUP_FEATURES,
        gapfill_block_arrow,
        gapfill_group_arrow,
    )

    rng = np.random.RandomState(7)
    rows = []
    base = 1_700_000_000_000_000
    series = [("en", "a.com", "1h", 24, 0.4), ("en", "b.com", "1h", 1, 0.0),
              ("de", "a.com", "1d", 10, 0.5), ("de", "c.com", "1h", 16, 0.0)]
    for lang, dom, tier, n_b, drop in series:
        step = TIER_STEP_US[tier]
        keep = [i for i in range(n_b) if i in (0, n_b - 1)
                or rng.uniform() >= drop]
        for i in keep:
            row = {"lang": lang, "domain": dom, "tier": tier,
                   "bucket_ts_us": base + i * step,
                   "n": int(rng.randint(1, 9))}
            for c in ROLLUP_FEATURES:
                if c != "n":
                    row[c] = (float(rng.normal(50, 20))
                              if rng.uniform() > 0.1 else float("nan"))
            rows.append(row)
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    tbl = pa.table(cols).sort_by([("lang", "ascending"),
                                  ("domain", "ascending"),
                                  ("tier", "ascending")])
    got = gapfill_block_arrow(tbl)
    # per-group reference over the same runs
    import pandas as pd

    key = ["lang", "domain", "tier"]
    pieces = []
    df = tbl.to_pandas()
    for _, g in df.groupby(key, sort=True):
        pieces.append(gapfill_group_arrow(
            pa.Table.from_pandas(g, preserve_index=False).cast(tbl.schema)))
    want = pa.concat_tables(pieces)
    sort_keys = [(c, "ascending") for c in key + ["bucket_ts_us"]]
    got_pd = got.sort_by(sort_keys).to_pandas()
    want_pd = want.sort_by(sort_keys).to_pandas()
    assert len(got_pd) == len(want_pd)
    for c in got_pd.columns:
        a, b = got_pd[c].to_numpy(), want_pd[c].to_numpy()
        if a.dtype.kind == "f":
            af, bf = a.astype(float), b.astype(float)
            ok = (np.isnan(af) & np.isnan(bf)) | (af == bf)
            assert bool(np.all(ok)), c  # bit-exact incl. interpolated mean
        else:
            assert list(a) == list(b), c


def test_gorilla_fused_equals_sorted_path(ray_session, pages_dir):
    """The fused Gorilla pass (grouped_block_map over the gap-fill
    output's whole-group blocks, no second sort) must equal the
    sorted-path encode byte for byte."""
    from light_curve_ray.pipelines.rollup import gorilla_series

    d, _ = pages_dir
    cfg = RollupConfig(input_paths=d, input_kind="pages", tiers=("1d",),
                      gorilla=False)
    rollup = run_rollup(cfg)["rollup"].materialize()
    fused = gorilla_series(rollup, groups_whole=True).to_pandas()
    sorted_p = gorilla_series(rollup, groups_whole=False).to_pandas()
    key = ["lang", "domain", "tier"]
    f = fused.sort_values(key).reset_index(drop=True)
    s = sorted_p.sort_values(key).reset_index(drop=True)
    assert len(f) == len(s) and len(f) > 0
    for c in key + ["n_buckets", "n_filled"]:
        assert list(f[c]) == list(s[c]), c
    assert all(bytes(a) == bytes(b) for a, b in
               zip(f["points_gorilla"], s["points_gorilla"]))
