"""Driver-facing query registry: one Ray Data pipeline per operator from
SURVEY.md §2, each paired (where ANSI-SQL can express it) with a DuckDB
oracle returning the SAME columns so the driver's row-count/schema/value-hash
check passes.

Float parity discipline: the engine and DuckDB sum doubles in different
orders, so raw float aggregates differ in the last ulps.  Both sides
therefore ROUND every float output to 6 decimals as the final step
(half-away rounding on both sides — kernels/rounding.py), and both sides
compute CENTRAL moments: the engine streams them with Pébay pairwise
merges (kernels/moments.py — raw power sums catastrophically cancel when
|mean| >> std, e.g. lineitem prices), while the oracle SQL uses a
two-pass centered-sum join (_rollup_sql's `c` CTE) — numerically
equivalent to 6 dp on the same data.  NaN/undefined values are Arrow
NULLs on the Ray side and SQL NULLs on the oracle side
(kernels/moments._NULLABLE_FEATURES).

Queries without an oracle entry (minhash/simhash/LSH/gorilla/multimodal —
genuinely non-SQL-expressible) get the driver's rows-only check and are
pinned instead by unit tests against single-process oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.grid import TIER_STEP_US
from ..stages.project import table_to_points
from .rollup import (
    RollupConfig,
    attach_beyond,
    finalize_tiers,
    gapfilled,
    points_dataset,
    tier_stats,
)

# ---------------------------------------------------------------- helpers

ROLLUP_COLS = [
    "lang", "domain", "tier", "bucket_ts_us", "n", "mean", "wmean", "std",
    "skew", "kurtosis", "amplitude", "beyond_1_std", "linear_trend_slope",
    "linear_trend_sigma", "mean_variance", "reduced_chi2",
    "excess_variance", "stetson_k",
]


# float columns whose magnitude is data-unbounded (χ² of a huge-w fixture
# reaches 1e10; mean_variance = std/mean and excess_variance ∝ 1/mean²
# blow up as mean → 0): rounded at 6 SIGNIFICANT digits instead of 6
# decimals so the engine-vs-oracle agreement requirement stays within
# double precision at any magnitude
_SIG_ROUND_COLS = frozenset({"reduced_chi2", "mean_variance",
                             "excess_variance", "linear_trend_sigma",
                             "revenue", "eta_e", "fit_reduced_chi2",
                             "time_mean_s", "time_standard_deviation_s",
                             "roms", "slope_price_qty"})


def _round6(tbl: pa.Table) -> pa.Table:
    """Final normalization: float cols rounded 9-dp-then-6-dp (half-away,
    matching the oracle's ROUND(ROUND(x,9),6) bit-for-bit and collapsing
    last-ulp merge-order differences across 6-dp tie boundaries —
    kernels/rounding.round6_tie_robust), non-finite -> NULL."""
    from ..kernels.rounding import round6_tie_robust, round_sig6_tie_robust

    cols = {}
    for name in tbl.column_names:
        col = tbl[name]
        if pa.types.is_floating(col.type):
            col = pc.cast(col, pa.float64())
            vals = col.to_numpy(zero_copy_only=False)
            mask = ~np.isfinite(vals)
            # unbounded-magnitude columns round at significant digits
            # (relative granularity); see kernels/rounding.round_sig_away
            rounder = (round_sig6_tie_robust if name in _SIG_ROUND_COLS
                       else round6_tie_robust)
            cols[name] = pa.array(rounder(vals), pa.float64(), mask=mask)
        else:
            cols[name] = col
    return pa.table(cols)


def _collect(ds) -> pa.Table:
    """Small-result collection (rollup-scale outputs only), Arrow-native:
    a pandas round-trip would promote nullable int64 columns (e.g. the
    asof join's matched timestamp) to float64 and the 9-dp tie-robust
    rounding then destroys epoch-µs-magnitude integers."""
    import ray

    if isinstance(ds, pa.Table):
        return _round6(ds)
    # materialize FIRST: to_arrow_refs() on a lazy plan consults schema(),
    # which executes a limit-1 COPY of the whole plan — a full second
    # execution for all-to-all plans (measured: +4.9 s on dmdt_map's
    # pair enumeration).  On a materialized dataset both are free.
    ds = ds.materialize()
    tables = [t for t in ray.get(ds.to_arrow_refs()) if len(t)]
    if not tables:
        return _round6(pa.Table.from_pandas(ds.to_pandas(),
                                            preserve_index=False))
    return _round6(pa.concat_tables(tables,
                                    promote_options="default"
                                    ).combine_chunks())


def _collect_raw(ds) -> pa.Table:
    """UNROUNDED small-result collection — for broadcast LOOKUP tables
    whose values feed further arithmetic mirrored against the oracle's
    unrounded aggregates (rounding a lookup would diverge both sides)."""
    import ray

    ds = ds.materialize()  # see _collect: avoids the schema() limit-1 rerun
    tables = [t for t in ray.get(ds.to_arrow_refs()) if len(t)]
    if not tables:
        sch = ds.schema()
        return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    return pa.concat_tables(tables,
                            promote_options="default").combine_chunks()


def _events_cfg(sf_dir: str, tiers: tuple) -> RollupConfig:
    return RollupConfig(
        input_paths=f"{sf_dir}/events.parquet",
        input_kind="table",
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        tiers=tiers,
    )


def _rollup_tier(cfg: RollupConfig, tier: str):
    """Engine path for one tier: cascade from 1h when tier is coarser —
    the driver's SQL oracle computes the tier DIRECTLY from raw points, so
    this check pins the cascade algebra (shift_stats) end-to-end."""
    points = points_dataset(cfg).materialize()  # two passes: stats + beyond
    tiers = ("1h",) if tier == "1h" else ("1h", tier)
    stats = tier_stats(points, tiers)
    feats = finalize_tiers({tier: stats[tier]})
    feats = attach_beyond(feats, points, cfg.n_std, cfg)
    return feats[tier]


# ------------------------------------------------------------ SQL builders

_FEATURE_SQL_TAIL = """
SELECT lang, domain, '{tier}' AS tier, bucket_ts_us, n,
  ROUND(mean, 6) AS mean,
  ROUND(wmean, 6) AS wmean,
  ROUND(std, 6) AS std,
  CASE WHEN m2 <= 1e-12 * scale THEN NULL
       ELSE ROUND(m3 / POWER(m2, 1.5), 6) END AS skew,
  CASE WHEN m2 <= 1e-12 * scale THEN NULL
       ELSE ROUND(m4 / (m2 * m2) - 3.0, 6) END AS kurtosis,
  ROUND(amplitude, 6) AS amplitude,
  ROUND(CAST(COALESCE(n_beyond, 0) AS DOUBLE) / n, 6) AS beyond_1_std,
  ROUND(slope0, 6) AS linear_trend_slope,
  {sig6_sg9} AS linear_trend_sigma,
  {sig6_mv9} AS mean_variance,
  {sig6_rc9} AS reduced_chi2,
  {sig6_ev9} AS excess_variance,
  CASE WHEN std IS NULL OR std <= 0.0 THEN NULL
       ELSE ROUND((COALESCE(sum_abs_dev, 0.0) / n)
                  / (std * SQRT((n - 1.0) / n)), 6) END AS stetson_k
FROM f LEFT JOIN bc USING (lang, domain, bucket_ts_us)
"""


def _sig_round_sql(x: str, digits: int) -> str:
    """Half-away rounding of ``x`` at ``digits`` SIGNIFICANT digits — the
    SQL mirror of kernels/rounding.round_sig_away, operation-for-operation
    (FLOOR/CEIL/POWER/LOG10 resolve to the same libm calls the numpy
    kernel makes on this host, so both sides produce identical doubles).
    Deliberately avoids the ``ROUND(`` token: _tie_robust_sql mechanically
    rewrites every ROUND(x, 6) in the oracle strings, and these
    expressions must not be touched by that rewrite."""
    p = f"POWER(10.0, FLOOR(LOG10(ABS({x}))) - {digits - 1})"
    return (f"CASE WHEN {x} = 0.0 THEN {x} + 0.0 "
            f"WHEN {x} >= 0.0 THEN FLOOR({x} / {p} + 0.5) * {p} + 0.0 "
            f"ELSE CEIL({x} / {p} - 0.5) * {p} + 0.0 END")


def _rollup_sql(points_sql: str, tier: str, n_std: float = 1.0) -> str:
    """Full-feature rollup SQL over a points CTE (lang, domain, t_us, v, w).

    Same algebra as kernels/moments.finalize_features: CENTRAL moments
    (computed here via a two-pass mean join — the oracle's luxury; the
    engine streams them via Pébay merges), so both sides are numerically
    stable for |mean| >> std.  beyond_1_std is the same two-pass join the
    engine does."""
    step = TIER_STEP_US[tier]
    return f"""
WITH pts AS ({points_sql}),
b AS (
  SELECT lang, domain,
         (t_us // {step}) * {step} AS bucket_ts_us,
         v, w,
         CAST(t_us - (t_us // {step}) * {step} AS DOUBLE) / 1e6 AS tp
  FROM pts
),
m AS (
  SELECT lang, domain, bucket_ts_us,
         COUNT(*) AS n, AVG(v) AS mean,
         SUM(w) AS sum_w, SUM(w * v) AS sum_wv,
         SUM(1.0 / w) AS sum_invw,
         MIN(v) AS vmin, MAX(v) AS vmax,
         SUM(tp) AS st1, SUM(tp * tp) AS st2, SUM(tp * v) AS stv
  FROM b GROUP BY 1, 2, 3
),
c AS (
  SELECT b.lang, b.domain, b.bucket_ts_us,
         SUM((b.v - m.mean) * (b.v - m.mean)) AS cm2,
         SUM((b.v - m.mean) * (b.v - m.mean) * (b.v - m.mean)) AS cm3,
         SUM((b.v - m.mean) * (b.v - m.mean) * (b.v - m.mean)
             * (b.v - m.mean)) AS cm4,
         SUM(b.w * (b.v - m.sum_wv / m.sum_w)
                 * (b.v - m.sum_wv / m.sum_w)) AS wcm2
  FROM b JOIN m USING (lang, domain, bucket_ts_us)
  GROUP BY 1, 2, 3
),
f AS (
  SELECT lang, domain, bucket_ts_us, n, st1, st2, stv,
    sum_w, sum_invw, cm2, wcm2,
    CASE WHEN n > 1 AND sum_w > 0.0
         THEN GREATEST(wcm2, 0.0) / (n - 1.0) END AS rc0,
    {_sig_round_sql("rc0", 9)} AS rc9,
    mean,
    mean * n AS s1,
    CASE WHEN sum_w > 0 THEN sum_wv / sum_w END AS wmean,
    CASE WHEN n > 1
         THEN SQRT(GREATEST(cm2, 0.0) / (n - 1)) END AS std,
    GREATEST(cm2, 0.0) / n AS m2,
    cm3 / n AS m3,
    cm4 / n AS m4,
    GREATEST(mean * mean + GREATEST(cm2, 0.0) / n, 1.0) AS scale,
    (vmax - vmin) / 2.0 AS amplitude,
    CAST(n AS DOUBLE) * st2 - st1 * st1 AS denom,
    st2 - st1 * st1 / n AS sxx,
    GREATEST(st2, 1.0) AS tscale,
    CASE WHEN std IS NULL OR mean = 0.0 THEN NULL
         ELSE std / mean END AS mv0,
    {_sig_round_sql("mv0", 9)} AS mv9,
    CASE WHEN n < 2 OR mean = 0.0 THEN NULL
         ELSE (GREATEST(cm2, 0.0) / (n - 1.0) - sum_invw / n)
              / (mean * mean) END AS ev0,
    {_sig_round_sql("ev0", 9)} AS ev9,
    CASE WHEN denom <= 1e-12 * n * tscale THEN NULL
         ELSE (n * stv - st1 * s1) / denom END AS slope0,
    CASE WHEN n < 3 OR slope0 IS NULL THEN NULL
         ELSE SQRT(GREATEST(GREATEST(cm2, 0.0)
              - slope0 * slope0 * sxx, 0.0)
              / (n - 2.0) / sxx) END AS sg0,
    {_sig_round_sql("sg0", 9)} AS sg9
  FROM m JOIN c USING (lang, domain, bucket_ts_us)
),
pb AS (
  SELECT b.lang, b.domain, b.bucket_ts_us,
         CASE WHEN ABS(b.v - f.mean) > {n_std} * f.std THEN 1 ELSE 0 END AS beyond,
         ABS(b.v - f.mean) AS abs_dev
  FROM b JOIN f USING (lang, domain, bucket_ts_us)
),
bc AS (
  SELECT lang, domain, bucket_ts_us, SUM(beyond) AS n_beyond,
         SUM(abs_dev) AS sum_abs_dev
  FROM pb GROUP BY 1, 2, 3
)
{_FEATURE_SQL_TAIL.format(tier=tier, sig6_rc9=_sig_round_sql("rc9", 6),
                          sig6_mv9=_sig_round_sql("mv9", 6),
                          sig6_ev9=_sig_round_sql("ev9", 6),
                          sig6_sg9=_sig_round_sql("sg9", 6))}
"""


EVENTS_POINTS_SQL = """
  SELECT 'all' AS lang, event_type AS domain,
         epoch_us(ts) AS t_us, value AS v, 1.0 AS w
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
"""

# The pages-path oracle (O1 read -> O2 extract -> O3 project -> O6 rollup):
# the Ray side runs the REAL pages pipeline over a deterministic pages
# fixture derived from `documents` (url/warc_ts/lang derived from doc_id;
# every doc_id % 3 == 0 row ships as html-only with text NULL, so the
# actor-pool extract stage must reconstruct the text); the oracle derives
# the SAME points directly from `documents` in SQL — extraction is pinned
# because v = LENGTH(extracted text) must equal LENGTH(documents.text)
# for every row (corpus texts are whitespace-normalized and entity-free,
# so extract_text(<p>text</p>) == text byte-for-byte; the byte-identity
# of the extractor itself is additionally pinned by tests/test_textkit.py).
_PAGES_FIXTURE_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
_PAGES_FIXTURE_DOMAINS = 40
_PAGES_FIXTURE_STEP_US = 3_600_000_000  # one hour per doc_id

PAGES_POINTS_SQL = f"""
  SELECT lang,
         'd' || CAST(doc_id % {_PAGES_FIXTURE_DOMAINS} AS VARCHAR)
             || '.example.com' AS domain,
         {_PAGES_FIXTURE_BASE_US} + doc_id * {_PAGES_FIXTURE_STEP_US}
           AS t_us,
         CAST(LENGTH(text) AS DOUBLE) AS v, 1.0 AS w
  FROM documents
"""

LINEITEM_POINTS_SQL = """
  SELECT l_returnflag AS lang, l_linestatus AS domain,
         epoch_us(l_shipdate) AS t_us, l_extendedprice AS v, l_quantity AS w
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
"""


def _gapfill_sql(points_sql: str, tier: str, n_std: float = 1.0) -> str:
    """Gap-filled rollup SQL: dense bucket grid per series, linear
    interpolation of ``mean`` on missing buckets (reference Interpolator
    semantics — interior-only here, grid spans first..last observed)."""
    step = TIER_STEP_US[tier]
    base = _rollup_sql(points_sql, tier, n_std)
    return f"""
WITH r AS ({base}),
bounds AS (
  SELECT lang, domain, MIN(bucket_ts_us) AS lo, MAX(bucket_ts_us) AS hi
  FROM r GROUP BY 1, 2
),
grid AS (
  SELECT lang, domain,
         UNNEST(generate_series(lo, hi, {step})) AS bucket_ts_us
  FROM bounds
),
j AS (
  SELECT g.lang, g.domain, g.bucket_ts_us,
         r.n, r.mean, r.wmean, r.std, r.skew, r.kurtosis, r.amplitude,
         r.beyond_1_std, r.linear_trend_slope, r.linear_trend_sigma,
         r.mean_variance, r.reduced_chi2, r.excess_variance, r.stetson_k
  FROM grid g LEFT JOIN r USING (lang, domain, bucket_ts_us)
),
w AS (
  SELECT *,
    LAST_VALUE(CASE WHEN n IS NOT NULL THEN bucket_ts_us END IGNORE NULLS)
      OVER (PARTITION BY lang, domain ORDER BY bucket_ts_us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    LAST_VALUE(CASE WHEN n IS NOT NULL THEN mean END IGNORE NULLS)
      OVER (PARTITION BY lang, domain ORDER BY bucket_ts_us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    FIRST_VALUE(CASE WHEN n IS NOT NULL THEN bucket_ts_us END IGNORE NULLS)
      OVER (PARTITION BY lang, domain ORDER BY bucket_ts_us
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t,
    FIRST_VALUE(CASE WHEN n IS NOT NULL THEN mean END IGNORE NULLS)
      OVER (PARTITION BY lang, domain ORDER BY bucket_ts_us
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
  FROM j
)
SELECT lang, domain, '{tier}' AS tier, bucket_ts_us,
  COALESCE(n, 0) AS n,
  CASE WHEN n IS NOT NULL THEN mean
       ELSE ROUND(
         ((CAST(next_t AS DOUBLE) - CAST(bucket_ts_us AS DOUBLE))
            / (CAST(next_t AS DOUBLE) - CAST(prev_t AS DOUBLE))) * prev_v
         + (1.0 - (CAST(next_t AS DOUBLE) - CAST(bucket_ts_us AS DOUBLE))
            / (CAST(next_t AS DOUBLE) - CAST(prev_t AS DOUBLE))) * next_v, 6)
  END AS mean,
  wmean, std, skew, kurtosis, amplitude, beyond_1_std, linear_trend_slope,
  linear_trend_sigma, mean_variance, reduced_chi2, excess_variance,
  stetson_k,
  (n IS NULL) AS filled
FROM w
"""


INTERP_GRID_SQL = """
WITH pts AS (
  SELECT event_type AS series,
         CAST(epoch_us(ts) AS DOUBLE) / 1e6 AS t, value AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
knots AS (SELECT series, t, AVG(v) AS v FROM pts GROUP BY 1, 2),
bounds AS (SELECT series, MIN(t) AS lo, MAX(t) AS hi FROM knots GROUP BY 1),
tgt AS (
  SELECT series, i, lo + ((hi - lo) / 100.0) * CAST(i AS DOUBLE) AS t
  FROM bounds, UNNEST(range(0, 101)) AS u(i)
),
l AS (
  SELECT g.series, g.i, g.t, k.t AS lt, k.v AS lv
  FROM tgt g ASOF LEFT JOIN knots k
    ON g.series = k.series AND g.t >= k.t
),
r AS (
  SELECT g.series, g.i, k.t AS rt, k.v AS rv
  FROM tgt g ASOF LEFT JOIN knots k
    ON g.series = k.series AND g.t <= k.t
)
SELECT l.series, CAST(l.i AS BIGINT) AS i,
  ROUND(CASE
    WHEN lt IS NULL THEN 0.0
    WHEN rt IS NULL THEN 0.0
    WHEN lt = rt THEN lv
    ELSE ((rt - l.t) / (rt - lt)) * lv
         + (1.0 - (rt - l.t) / (rt - lt)) * rv
  END, 6) AS v
FROM l JOIN r ON l.series = r.series AND l.i = r.i
"""


EVENTS_BY_TYPE_SQL = """
SELECT event_type,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 6) AS sum_value,
  ROUND(AVG(value), 6) AS avg_value,
  ROUND(MIN(value), 6) AS min_value,
  ROUND(MAX(value), 6) AS max_value
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
GROUP BY event_type
"""

HOT_KEYS_SQL = """
SELECT 'all' AS lang, event_type AS domain, COUNT(*) AS n_points
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
GROUP BY 1, 2
"""

DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""

DEDUP_EMBEDDING_SQL = """
WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
FROM nv a JOIN nv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.3
"""

ANN_TOPK_SQL = """
WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM nv ORDER BY vec_id LIMIT 10),
s AS (
  SELECT q.vec_id AS query_id, nv.vec_id AS vec_id,
         list_cosine_similarity(q.e, nv.e) AS cos_sim
  FROM q JOIN nv ON q.vec_id <> nv.vec_id
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY ROUND(cos_sim, 6) DESC, vec_id) AS r
  FROM s
)
SELECT query_id, vec_id, ROUND(cos_sim, 6) AS cos_sim FROM rk WHERE r <= 5
"""

TEXT_STATS_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
    LENGTH(text) AS n_chars,
    CASE WHEN TRIM(text) = '' THEN 0
         ELSE LEN(regexp_split_to_array(TRIM(text), '\s+')) END AS n_words,
    LEN(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens_bpe,
    LENGTH(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
    LENGTH(text) - LENGTH(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))
      AS n_punct,
    LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
    LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
    CASE WHEN TRIM(text) = '' THEN 0
         ELSE LEN(list_filter(regexp_split_to_array(TRIM(text), '\s+'),
              x -> LOWER(x) IN ('the','and','of','to','in','is','that',
                                'for','with','was'))) END AS n_stop
  FROM documents
)
SELECT doc_id,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(n_tokens_bpe AS BIGINT) AS n_tokens_bpe,
  CASE WHEN n_words > 0
       THEN ROUND(CAST(n_nonspace AS DOUBLE) / n_words, 6) ELSE 0.0
  END AS mean_word_len,
  CASE WHEN n_chars > 0
       THEN ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) ELSE 0.0
  END AS punct_ratio,
  CASE WHEN n_chars > 0
       THEN ROUND(CAST(n_digit AS DOUBLE) / n_chars, 6) ELSE 0.0
  END AS digit_ratio,
  CASE WHEN n_chars > 0
       THEN ROUND(CAST(n_upper AS DOUBLE) / n_chars, 6) ELSE 0.0
  END AS upper_ratio,
  CASE WHEN n_words > 0
       THEN ROUND(CAST(n_stop AS DOUBLE) / n_words, 6) ELSE 0.0
  END AS stopword_ratio
FROM t
"""


# ------------------------------------------------------------ Ray queries

def q_events_by_type(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def _valid(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.and_(pc.is_valid(batch["ts"]),
                               pc.is_valid(batch["value"])),
                       pc.is_valid(batch["event_type"]))
        return batch.filter(mask)

    ds = ds.map_batches(_valid, batch_format="pyarrow",
                        zero_copy_batch=True)
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    return _collect(out)


def q_rollup(tier: str):
    def run(sf_dir: str):
        cfg = _events_cfg(sf_dir, (tier,))
        ds = _rollup_tier(cfg, tier)
        tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        return _round6(tbl.select(ROLLUP_COLS))
    return run


def q_rollup_lineitem_1d(sf_dir: str):
    cfg = RollupConfig(
        input_paths=f"{sf_dir}/lineitem.parquet",
        input_kind="table",
        key_cols=["l_returnflag", "l_linestatus"],
        ts_col="l_shipdate",
        value_col="l_extendedprice",
        weight_col="l_quantity",
        tiers=("1d",),
    )
    ds = _rollup_tier(cfg, "1d")
    tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return _round6(tbl.select(ROLLUP_COLS))


def q_rollup_roundtrip(sf_dir: str):
    """O9 sink verification: run the FULL ``run_rollup`` pipeline with an
    ``out_dir``, then read the tier-partitioned parquet it wrote BACK from
    disk and hand those bytes to the driver's oracle (same SQL as
    rollup_1d).  A pass pins the sink end-to-end: partition layout, schema
    fidelity through the hive round-trip, and value fidelity of the
    written files — not just of the in-memory Dataset."""
    import shutil
    import tempfile
    from dataclasses import replace

    import ray.data as rd

    from .rollup import run_rollup

    out = tempfile.mkdtemp(prefix="lcr_roundtrip_", dir="/tmp")
    try:
        cfg = replace(_events_cfg(sf_dir, ("1d",)),
                      gapfill=False, gorilla=False, out_dir=out)
        run_rollup(cfg)
        tbl = pa.Table.from_pandas(
            rd.read_parquet(f"{out}/rollup").to_pandas(),
            preserve_index=False)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    # the hive partition column comes back dictionary-encoded; restore the
    # plain string type the in-memory rollup (and the oracle) carries
    idx = tbl.schema.get_field_index("tier")
    tbl = tbl.set_column(idx, "tier", pc.cast(tbl["tier"], pa.string()))
    return _round6(tbl.select(ROLLUP_COLS))


def q_gapfill_1d(sf_dir: str):
    cfg = _events_cfg(sf_dir, ("1d",))
    feats = _rollup_tier(cfg, "1d")
    # Round BEFORE gap-fill: the oracle SQL interpolates over its rounded
    # rollup CTE, so both sides must feed identical (rounded) knot values
    # into the interpolation for bit-equal filled means.
    feats = feats.map_batches(_round6, batch_format="pyarrow")
    dense = gapfilled(feats)
    tbl = pa.Table.from_pandas(dense.to_pandas(), preserve_index=False)
    return _round6(tbl.select(ROLLUP_COLS + ["filled"]))


SHAPE_FEATURES_SQL = """
WITH pts AS ({points}),
m AS (
  SELECT lang, domain, COUNT(*) AS n, AVG(v) AS mean,
         VAR_SAMP(v) AS var, STDDEV_SAMP(v) AS sd,
         MIN(v) AS vmin, MAX(v) AS vmax,
         QUANTILE_CONT(v, 0.5) AS med,
         QUANTILE_CONT(v, 0.1) AS q10,
         QUANTILE_CONT(v, 0.9) AS q90
  FROM pts GROUP BY 1, 2
),
s AS (
  SELECT lang, domain, v, t_us,
    SUM(v) OVER (PARTITION BY lang, domain ORDER BY t_us, v
                 ROWS UNBOUNDED PRECEDING) AS cum,
    ROW_NUMBER() OVER (PARTITION BY lang, domain
                       ORDER BY t_us, v) AS rn,
    LAG(v) OVER (PARTITION BY lang, domain ORDER BY t_us, v) AS pv,
    LAG(t_us) OVER (PARTITION BY lang, domain ORDER BY t_us, v) AS pt
  FROM pts
),
a AS (
  SELECT s.lang, s.domain,
    MAX(cum - rn * m.mean) AS cmax,
    MIN(cum - rn * m.mean) AS cmin,
    SUM(CASE WHEN pv IS NULL THEN 0.0 ELSE (v - pv) * (v - pv) END)
      AS sq_diff,
    MAX(CASE WHEN pt IS NOT NULL AND t_us != pt
             THEN ABS((v - pv) / (CAST(t_us - pt AS DOUBLE) / 1e6)) END)
      AS max_slope,
    QUANTILE_CONT(ABS(s.v - m.med), 0.5) AS mad,
    CAST(SUM(CASE WHEN ABS(s.v - m.med)
                       < 0.1 * (m.vmax - m.vmin) / 2.0
             THEN 1 ELSE 0 END) AS DOUBLE) / m.n AS mbrp
  FROM s JOIN m USING (lang, domain) GROUP BY 1, 2, m.n
)
SELECT m.lang, m.domain, m.n,
  CASE WHEN m.n < 2 OR m.sd <= 0 THEN NULL
       ELSE ROUND((a.cmax - a.cmin) / (m.n * m.sd), 6) END AS cusum,
  CASE WHEN m.n < 2 OR m.sd <= 0 THEN NULL
       ELSE ROUND(a.sq_diff / ((m.n - 1) * m.var), 6) END AS eta,
  ROUND(a.max_slope, 6) AS maximum_slope,
  ROUND(m.med, 6) AS median,
  ROUND(GREATEST(m.vmax - m.med, m.med - m.vmin), 6)
    AS percent_amplitude,
  ROUND(m.q90 - m.q10, 6) AS inter_percentile_range_10,
  ROUND(a.mad, 6) AS median_abs_deviation,
  ROUND(a.mbrp, 6) AS median_buffer_range_percentage
FROM m JOIN a USING (lang, domain)
"""


def _shape_features_over(points):
    """Shape-feature fan (kernels/shape.py) over any points dataset —
    shared by q_shape_features (raw series) and q_binned_shape_features
    (the Bins meta-feature's re-binned series)."""
    from ..kernels.shape import shape_features
    from ..stages.sorted_groups import sorted_group_map

    out_schema = pa.schema([
        ("lang", pa.string()), ("domain", pa.string()), ("n", pa.int64()),
        ("cusum", pa.float64()), ("eta", pa.float64()),
        ("maximum_slope", pa.float64()), ("median", pa.float64()),
        ("percent_amplitude", pa.float64()),
        ("inter_percentile_range_10", pa.float64()),
        ("median_abs_deviation", pa.float64()),
        ("median_buffer_range_percentage", pa.float64()),
    ])

    def _one(group: pa.Table) -> pa.Table:
        import numpy as np

        feats = shape_features(
            group["t_us"].to_numpy(zero_copy_only=False),
            group["v"].to_numpy(zero_copy_only=False))
        cols = {"lang": group["lang"][0].as_py(),
                "domain": group["domain"][0].as_py()}
        arrays = {k: pa.array([v_], pa.string()) for k, v_ in cols.items()}
        arrays["n"] = pa.array([feats["n"]], pa.int64())
        for f in ("cusum", "eta", "maximum_slope", "median",
                  "percent_amplitude", "inter_percentile_range_10",
                  "median_abs_deviation",
                  "median_buffer_range_percentage"):
            val = feats[f]
            arrays[f] = pa.array(
                [None if (isinstance(val, float) and np.isnan(val))
                 else val], pa.float64())
        return pa.table(arrays)

    return sorted_group_map(points, ["lang", "domain"], _one, out_schema)


def q_shape_features(sf_dir: str):
    """Order-dependent whole-series features (Cusum, Eta, MaximumSlope,
    median/percentile features — the light-curve-feature extractor family
    the reference README points at, kernels/shape.py) over the events
    series, ORACLE-CHECKED against a window-function SQL derivation.

    Topology: these features need each series co-located and time-ordered,
    so they ride the sorted-series exchange (sorted_group_map on the
    series key — the same one all-to-all the gap-fill tail pays), with the
    in-kernel (t, v) ordering making the result independent of block
    order.  They are deliberately NOT forced into the packed mergeable
    state: an unordered block partial cannot know point adjacency."""
    cfg = _events_cfg(sf_dir, ("1d",))
    return _collect(_shape_features_over(points_dataset(cfg)))


def q_binned_shape_features(sf_dir: str):
    """The light-curve Bins META-feature (README.md:18 catalog): re-bin
    each series into fixed time windows (1d bucket MEANS), then run the
    shape-feature fan over the binned series.  Bucket means are rounded
    to the shared 6-dp representative BEFORE the feature kernel on BOTH
    engines (the gapfill_1d knot discipline — features of ulp-different
    inputs would diverge beyond what output rounding can collapse);
    ORACLE-CHECKED by composing the bucket-mean CTE into the shape SQL."""
    from ray.data.aggregate import Mean

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)
    step = TIER_STEP_US["1d"]

    def _bucket(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["t_us"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "lang": batch["lang"], "domain": batch["domain"],
            "bucket_ts_us": pa.array((t // step) * step, pa.int64()),
            "v": batch["v"]})

    binned = points.map_batches(_bucket, batch_format="pyarrow",
                                zero_copy_batch=True)
    means = binned.groupby(["lang", "domain", "bucket_ts_us"]).aggregate(
        Mean("v", alias_name="v"))

    def _as_points(batch: pa.Table) -> pa.Table:
        return _round6(pa.table({
            "lang": batch["lang"], "domain": batch["domain"],
            "t_us": batch["bucket_ts_us"],
            "v": pc.cast(batch["v"], pa.float64()),
        }))

    pts = means.map_batches(_as_points, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _collect(_shape_features_over(pts))


PERCENTILE_RATIOS_SQL = """
WITH pts AS ({points}),
q AS (
  SELECT lang, domain, COUNT(*) AS n,
         QUANTILE_CONT(v, 0.05) AS q05, QUANTILE_CONT(v, 0.10) AS q10,
         QUANTILE_CONT(v, 0.25) AS q25, QUANTILE_CONT(v, 0.40) AS q40,
         QUANTILE_CONT(v, 0.50) AS med, QUANTILE_CONT(v, 0.60) AS q60,
         QUANTILE_CONT(v, 0.75) AS q75, QUANTILE_CONT(v, 0.90) AS q90,
         QUANTILE_CONT(v, 0.95) AS q95
  FROM pts GROUP BY 1, 2
)
SELECT lang, domain, n,
  CASE WHEN q95 = q05 THEN NULL
       ELSE ROUND((q60 - q40) / (q95 - q05), 6) END
    AS flux_percentile_ratio_mid20,
  CASE WHEN q95 = q05 THEN NULL
       ELSE ROUND((q75 - q25) / (q95 - q05), 6) END
    AS flux_percentile_ratio_mid50,
  CASE WHEN q95 = q05 THEN NULL
       ELSE ROUND((q90 - q10) / (q95 - q05), 6) END
    AS flux_percentile_ratio_mid80,
  CASE WHEN med = 0.0 THEN NULL
       ELSE ROUND((q95 - q05) / med, 6) END
    AS percent_difference_magnitude_percentile
FROM q
"""


def q_percentile_ratios(sf_dir: str):
    """Flux-percentile-ratio feature family (Richards et al. 2011 via
    the light-curve-feature catalog) per series: linear-interpolation
    quantiles (numpy percentile == SQL QUANTILE_CONT, the parity the
    shape family already pins) on the sorted-series exchange;
    ORACLE-CHECKED."""
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    names = ("flux_percentile_ratio_mid20", "flux_percentile_ratio_mid50",
             "flux_percentile_ratio_mid80",
             "percent_difference_magnitude_percentile")
    out_schema = pa.schema(
        [("lang", pa.string()), ("domain", pa.string()),
         ("n", pa.int64())] + [(f, pa.float64()) for f in names])

    def _one(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        q05, q10, q25, q40, med, q60, q75, q90, q95 = np.percentile(
            v, [5.0, 10.0, 25.0, 40.0, 50.0, 60.0, 75.0, 90.0, 95.0])
        span = q95 - q05
        vals = {
            "flux_percentile_ratio_mid20":
                (q60 - q40) / span if span != 0.0 else None,
            "flux_percentile_ratio_mid50":
                (q75 - q25) / span if span != 0.0 else None,
            "flux_percentile_ratio_mid80":
                (q90 - q10) / span if span != 0.0 else None,
            "percent_difference_magnitude_percentile":
                span / med if med != 0.0 else None,
        }
        arrays = {
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([len(v)], pa.int64()),
        }
        for f in names:
            arrays[f] = pa.array([vals[f]], pa.float64())
        return pa.table(arrays)

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


def q_anderson_darling(sf_dir: str):
    """AndersonDarlingNormal per series (kernels/shape — catalog
    feature).  No SQL oracle BY DESIGN: DuckDB has no erf, so the driver
    records the rows-only check; the statistic is pinned by unit oracles
    (normal data below the 1% critical value, uniform far above,
    shift/scale invariance, NaN guards — tests/test_shape.py)."""
    from ..kernels.shape import anderson_darling_normal
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)
    out_schema = pa.schema([
        ("lang", pa.string()), ("domain", pa.string()),
        ("n", pa.int64()), ("anderson_darling_normal", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        a2 = anderson_darling_normal(v)
        return pa.table({
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([len(v)], pa.int64()),
            "anderson_darling_normal": pa.array(
                [None if np.isnan(a2) else a2], pa.float64()),
        })

    return _collect(sorted_group_map(points, ["lang", "domain"], _one,
                                     out_schema))


def _otsu_sql(points_sql: str) -> str:
    """OtsuSplit oracle: sequential prefix sums over the v-sorted series
    (the SAME running-sum arithmetic as the kernel's np.cumsum), the
    between-class criterion rounded at 9 significant digits before the
    argmax (mirrors kernels/rounding.round_sig_away), class stds via
    VAR_SAMP (NULL below 2 points, matching the kernel)."""
    crit9 = _sig_round_sql("(d * d * rn * (n - rn))", 9)
    return f"""
WITH pts AS ({points_sql}),
m AS (SELECT lang, domain, COUNT(*) AS n FROM pts GROUP BY 1, 2),
s AS (
  SELECT lang, domain, v,
    SUM(v) OVER (PARTITION BY lang, domain ORDER BY v, t_us
                 ROWS UNBOUNDED PRECEDING) AS cum,
    ROW_NUMBER() OVER (PARTITION BY lang, domain ORDER BY v, t_us) AS rn
  FROM pts
),
tot AS (
  SELECT s.lang, s.domain, s.cum AS total
  FROM s JOIN m USING (lang, domain) WHERE s.rn = m.n
),
c AS (
  SELECT s.lang, s.domain, s.rn, m.n,
         (s.cum / s.rn - (tot.total - s.cum) / (m.n - s.rn)) AS d
  FROM s JOIN m USING (lang, domain) JOIN tot USING (lang, domain)
  WHERE s.rn < m.n
),
w AS (
  SELECT lang, domain, rn AS i_star, -d AS mean_diff FROM (
    SELECT lang, domain, rn, d,
           ROW_NUMBER() OVER (PARTITION BY lang, domain
                              ORDER BY {crit9} DESC, rn) AS pick
    FROM c) WHERE pick = 1
),
f AS (
  SELECT s.lang, s.domain,
         STDDEV_SAMP(CASE WHEN s.rn <= w.i_star THEN s.v END) AS sd_lo,
         STDDEV_SAMP(CASE WHEN s.rn >  w.i_star THEN s.v END) AS sd_hi
  FROM s JOIN w USING (lang, domain) GROUP BY 1, 2
)
SELECT m.lang, m.domain, m.n,
  CASE WHEN m.n < 2 THEN NULL
       ELSE ROUND(w.mean_diff, 6) END AS otsu_mean_diff,
  ROUND(f.sd_lo, 6) AS otsu_std_lower,
  ROUND(f.sd_hi, 6) AS otsu_std_upper,
  CASE WHEN m.n < 2 THEN NULL
       ELSE ROUND(CAST(w.i_star AS DOUBLE) / m.n, 6) END
    AS otsu_lower_ratio
FROM m LEFT JOIN w USING (lang, domain) LEFT JOIN f USING (lang, domain)
"""


def q_otsu_split(sf_dir: str):
    """OtsuSplit feature (kernels/shape.otsu_split — the light-curve-
    feature catalog's thresholding feature) per series, on the same
    sorted-series exchange as shape_features; ORACLE-CHECKED against the
    prefix-sum window SQL with a 9-significant-digit argmax contract."""
    from ..kernels.shape import otsu_split
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema([
        ("lang", pa.string()), ("domain", pa.string()), ("n", pa.int64()),
        ("otsu_mean_diff", pa.float64()),
        ("otsu_std_lower", pa.float64()),
        ("otsu_std_upper", pa.float64()),
        ("otsu_lower_ratio", pa.float64()),
    ])

    def _one(group: pa.Table) -> pa.Table:
        feats = otsu_split(group["v"].to_numpy(zero_copy_only=False))
        arrays = {
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([feats["n"]], pa.int64()),
        }
        for f in ("otsu_mean_diff", "otsu_std_lower", "otsu_std_upper",
                  "otsu_lower_ratio"):
            val = feats[f]
            arrays[f] = pa.array(
                [None if (isinstance(val, float) and np.isnan(val))
                 else val], pa.float64())
        return pa.table(arrays)

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


def _dmdt_sql(points_sql: str) -> str:
    """Pair-enumeration oracle for the dm-dt map: a per-series self-join
    (the oracle's O(n^2) luxury — the engine's lag loop stops at the
    30-day edge), binned by the SAME integer-microsecond dt edges and
    the same linear dm arithmetic (kernels/dmdt.py grid contract)."""
    from ..kernels.dmdt import (
        DM_MAX,
        DM_MIN,
        DM_WIDTH,
        dt_edges_sql_values,
    )

    return f"""
WITH pts AS ({points_sql}),
e(lgdt_bin, lo_us, hi_us) AS (VALUES {dt_edges_sql_values()}),
p AS (
  SELECT a.lang, a.domain, b.t_us - a.t_us AS dt_us, b.v - a.v AS dm
  FROM pts a JOIN pts b
    ON a.lang = b.lang AND a.domain = b.domain AND b.t_us > a.t_us
  WHERE b.v - a.v >= {DM_MIN} AND b.v - a.v < {DM_MAX}
),
c AS (
  SELECT p.lang, p.domain, e.lgdt_bin,
    CAST(FLOOR((p.dm - ({DM_MIN})) / {DM_WIDTH}) AS BIGINT) AS dm_bin,
    CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM p JOIN e ON p.dt_us >= e.lo_us AND p.dt_us < e.hi_us
  GROUP BY 1, 2, 3, 4
)
SELECT lang, domain, lgdt_bin, dm_bin, n_pairs,
  ROUND(CAST(n_pairs AS DOUBLE)
        / SUM(n_pairs) OVER (PARTITION BY lang, domain, lgdt_bin), 6)
    AS p_cond
FROM c
"""


def q_dmdt_map(sf_dir: str, fanout: int = 6):
    """dm-dt map (light-curve-dmdt crate, /root/reference/README.md:17;
    Mahabal et al. 2017, arXiv 1709.06257): per-series 2-D histogram of
    (dm, dt) over time-ordered point pairs — log-spaced integer-µs dt
    bins x linear dm bins, off-grid pairs dropped.  One non-empty-cell
    row per (series, dt_bin, dm_bin) carrying both the raw count and the
    crate's norm=dt conditional probability (each dt row sums to 1);
    ORACLE-CHECKED against the self-join pair enumeration.

    Topology: one sorted-series exchange (sorted_group_map), but the
    per-group step only PACKS each series and emits ``fanout`` strided
    lag-partition tasks (kernels/dmdt.dmdt_counts lag_stride — partial
    grids sum exactly), so a FEW GIANT series still spread over the
    whole pool (the sf0.1 shape: 5 series x 20k points left 27 of 32
    cores idle); partials merge in one cell-scale keyed groupby and
    p_cond is derived on the collected result.  For the web-scale
    many-small-series regime pass fanout=1 to skip the extra exchange."""
    from ray.data.aggregate import Sum

    from ..kernels.dmdt import dmdt_counts
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    packed_schema = pa.schema([
        ("lang", pa.string()), ("domain", pa.string()),
        ("off", pa.int64()), ("step", pa.int64()),
        ("t_bin", pa.large_binary()), ("v_bin", pa.large_binary()),
    ])

    def _pack(group: pa.Table) -> pa.Table:
        t = group["t_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = max(1, int(fanout))
        return pa.table({
            "lang": pa.array([group["lang"][0].as_py()] * k, pa.string()),
            "domain": pa.array([group["domain"][0].as_py()] * k,
                               pa.string()),
            "off": pa.array(np.arange(1, k + 1), pa.int64()),
            "step": pa.array([k] * k, pa.int64()),
            "t_bin": pa.array([t.tobytes()] * k, pa.large_binary()),
            "v_bin": pa.array([v.tobytes()] * k, pa.large_binary()),
        })

    tasks = sorted_group_map(points, ["lang", "domain"], _pack,
                             packed_schema)
    # one block per strided task so every partial runs in parallel
    tasks = tasks.repartition(32 * max(1, int(fanout)))

    def _partial(batch: pa.Table) -> pa.Table:
        outs = []
        for i in range(len(batch)):
            t = np.frombuffer(batch["t_bin"][i].as_py(), np.int64)
            v = np.frombuffer(batch["v_bin"][i].as_py(), np.float64)
            grid = dmdt_counts(t, v, lag_stride=(
                batch["off"][i].as_py(), batch["step"][i].as_py()))
            j, k = np.nonzero(grid)
            outs.append(pa.table({
                "lang": pa.array([batch["lang"][i].as_py()] * len(j),
                                 pa.string()),
                "domain": pa.array([batch["domain"][i].as_py()] * len(j),
                                   pa.string()),
                "lgdt_bin": pa.array(j, pa.int64()),
                "dm_bin": pa.array(k, pa.int64()),
                "n_part": pa.array(grid[j, k], pa.int64()),
            }))
        if not outs:
            return pa.schema([
                ("lang", pa.string()), ("domain", pa.string()),
                ("lgdt_bin", pa.int64()), ("dm_bin", pa.int64()),
                ("n_part", pa.int64())]).empty_table()
        return pa.concat_tables(outs)

    parts = tasks.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    merged = parts.groupby(["lang", "domain", "lgdt_bin", "dm_bin"]
                           ).aggregate(Sum("n_part", alias_name="n_pairs"))
    tbl = _collect_raw(merged)
    n_pairs = pc.cast(tbl["n_pairs"], pa.int64())
    tbl = pa.table({"lang": tbl["lang"], "domain": tbl["domain"],
                    "lgdt_bin": tbl["lgdt_bin"], "dm_bin": tbl["dm_bin"],
                    "n_pairs": n_pairs})
    # p_cond on the collected cell-scale result (the query RETURNS this
    # table anyway): per-dt-row totals via a vectorized group lookup
    key = (pc.binary_join_element_wise(
        tbl["lang"], tbl["domain"], "\x1f").to_pylist())
    j = tbl["lgdt_bin"].to_numpy(zero_copy_only=False)
    n = tbl["n_pairs"].to_numpy(zero_copy_only=False).astype(np.float64)
    import pandas as pd

    row_tot = pd.Series(n).groupby(
        [pd.Series(key), pd.Series(j)]).transform("sum").to_numpy()
    return _round6(tbl.append_column(
        "p_cond", pa.array(n / row_tot, pa.float64())))


def q_dmdt_gausses(sf_dir: str, cap: int = 4000):
    """Gaussian-error-smeared dm-dt map (light-curve-dmdt's `gausses`
    mode; kernels/dmdt.dmdt_gausses): each pair spreads normal
    probability mass over dm bins with sigma_pair = per-point errors
    added in quadrature (errors from the shared _SIGMA_SQL model).
    Rows-only BY DESIGN (erf has no SQL mirror); the kernel's unit
    oracles pin the sigma->0 limit against the SQL-checked count grid.
    ``cap``: deterministic per-series point budget (first ``cap`` points
    in (t, v) order) — the smeared enumeration costs ~3 CDF evals per
    pair, and the map is a per-curve FINGERPRINT whose shape saturates
    long before 10^8 pairs; real surveys feed individual light curves,
    not multi-year megaseries."""
    from ..kernels.dmdt import dmdt_gausses
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema([
        ("lang", pa.string()), ("domain", pa.string()),
        ("lgdt_bin", pa.int64()), ("dm_bin", pa.int64()),
        ("mass", pa.float64()),
    ])

    def _one(group: pa.Table) -> pa.Table:
        t_us = group["t_us"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        take = np.lexsort((v, t_us))[:cap]
        t_us, v = t_us[take], v[take]
        sigma = 1.0 + 0.1 * np.sqrt(np.abs(v))  # == _SIGMA_SQL
        grid = dmdt_gausses(t_us, v, sigma)
        j, k = np.nonzero(grid > 1e-12)
        m = len(j)
        return pa.table({
            "lang": pa.array([group["lang"][0].as_py()] * m, pa.string()),
            "domain": pa.array([group["domain"][0].as_py()] * m,
                               pa.string()),
            "lgdt_bin": pa.array(j, pa.int64()),
            "dm_bin": pa.array(k, pa.int64()),
            "mass": pa.array(grid[j, k], pa.float64()),
        })

    cells = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(cells)


def _conditional_entropy_sql(points_sql: str) -> str:
    """Occupancy-grid oracle for the fixed-fold conditional entropy:
    INT64 phase bins ((t mod P) * 8 // P) and the literally identical
    mag-bin float expression as kernels/features.conditional_entropy."""
    from ..kernels.features import CE_N_MAG, CE_N_PHASE, CE_PERIOD_US

    return f"""
WITH pts AS ({points_sql}),
m AS (SELECT lang, domain, COUNT(*) AS n, MIN(v) AS vmin, MAX(v) AS vmax
      FROM pts GROUP BY 1, 2),
b AS (
  SELECT p.lang, p.domain, m.n,
    (p.t_us % {CE_PERIOD_US}) * {CE_N_PHASE} // {CE_PERIOD_US} AS phi,
    LEAST({CE_N_MAG - 1},
          CAST(FLOOR((p.v - m.vmin) / (m.vmax - m.vmin)
                     * {float(CE_N_MAG)}) AS BIGINT)) AS mag
  FROM pts p JOIN m USING (lang, domain) WHERE m.vmax > m.vmin
),
c AS (SELECT lang, domain, n, phi, mag, COUNT(*) AS cnt
      FROM b GROUP BY 1, 2, 3, 4, 5),
g AS (SELECT lang, domain, phi, SUM(cnt) AS cphi
      FROM c GROUP BY 1, 2, 3),
ce AS (
  SELECT c.lang, c.domain,
    SUM((CAST(c.cnt AS DOUBLE) / c.n)
        * LN(CAST(g.cphi AS DOUBLE) / c.cnt)) AS h
  FROM c JOIN g USING (lang, domain, phi) GROUP BY 1, 2
)
SELECT m.lang, m.domain, m.n,
  ROUND(ce.h, 6) AS conditional_entropy
FROM m LEFT JOIN ce USING (lang, domain)
"""


def q_conditional_entropy(sf_dir: str):
    """Fixed-fold conditional entropy H(mag | phase) per series (Graham
    et al. 2013 via the light-curve-feature catalog's entropy family;
    kernels/features.conditional_entropy) — the period-SEARCH variant
    composes this kernel over trial periods like the periodogram query.
    One sorted-series exchange; ORACLE-CHECKED against the occupancy-grid
    SQL (int64 phase bins, shared mag-bin float expression)."""
    from ..kernels.features import conditional_entropy
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema([
        ("lang", pa.string()), ("domain", pa.string()), ("n", pa.int64()),
        ("conditional_entropy", pa.float64()),
    ])

    def _one(group: pa.Table) -> pa.Table:
        h = conditional_entropy(
            group["t_us"].to_numpy(zero_copy_only=False),
            group["v"].to_numpy(zero_copy_only=False))
        return pa.table({
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([len(group)], pa.int64()),
            "conditional_entropy": pa.array(
                [None if np.isnan(h) else h], pa.float64()),
        })

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


# Synthetic heteroscedastic error model for the weighted-feature query:
# sigma_i derived from the data itself with IEEE-exact ops (abs, sqrt,
# one multiply, one add) so both engines compute bit-identical weights.
_SIGMA_SQL = "1.0 + 0.1 * SQRT(ABS(v))"


def _weighted_features_sql(points_sql: str) -> str:
    return f"""
WITH pts AS ({points_sql}),
w AS (SELECT lang, domain, t_us, v, {_SIGMA_SQL} AS sg,
             1.0 / (({_SIGMA_SQL}) * ({_SIGMA_SQL})) AS w
      FROM pts),
m AS (
  SELECT lang, domain, COUNT(*) AS n, SUM(w) AS sw,
         SUM(w * v) / SUM(w) AS wmean, AVG(v) AS mean,
         VAR_SAMP(v) AS s2, AVG(sg * sg) AS msig2,
         MIN(t_us) AS tlo, MAX(t_us) AS thi
  FROM w GROUP BY 1, 2
),
d AS (
  SELECT w.lang, w.domain,
    AVG(ABS((w.v - m.wmean) / w.sg)) AS mad,
    AVG(((w.v - m.wmean) / w.sg) * ((w.v - m.wmean) / w.sg)) AS msq,
    SUM(w.w * (w.v - m.wmean) * (w.v - m.wmean)) AS chi2,
    SUM(w.w * ((CAST(w.t_us - m.tlo AS DOUBLE) / 1e6))) / SUM(w.w) AS mx
  FROM w JOIN m USING (lang, domain) GROUP BY 1, 2
),
s AS (
  SELECT w.lang, w.domain, w.v, w.sg,
    LAG(w.v) OVER (PARTITION BY w.lang, w.domain
                   ORDER BY w.t_us, w.v) AS pv,
    LAG(w.t_us) OVER (PARTITION BY w.lang, w.domain
                      ORDER BY w.t_us, w.v) AS pt,
    LAG(w.sg) OVER (PARTITION BY w.lang, w.domain
                    ORDER BY w.t_us, w.v) AS psg,
    w.t_us
  FROM w
),
sp AS (
  SELECT s.lang, s.domain,
    (SQRT(m.n / (m.n - 1.0)) * ((s.pv - m.wmean) / s.psg))
      * (SQRT(m.n / (m.n - 1.0)) * ((s.v - m.wmean) / s.sg)) AS p
  FROM s JOIN m USING (lang, domain)
  WHERE s.pv IS NOT NULL AND m.n >= 2
),
sj AS (
  SELECT lang, domain,
    SUM((CASE WHEN p < 0 THEN -1.0 WHEN p > 0 THEN 1.0 ELSE 0.0 END)
        * SQRT(ABS(p))) AS jsum
  FROM sp GROUP BY 1, 2
),
ee AS (
  SELECT lang, domain,
    SUM(CASE WHEN pt IS NOT NULL AND t_us != pt
        THEN ((v - pv) / (CAST(t_us - pt AS DOUBLE) / 1e6))
             * ((v - pv) / (CAST(t_us - pt AS DOUBLE) / 1e6)) END) AS sde
  FROM s GROUP BY 1, 2
),
lf AS (
  SELECT w.lang, w.domain,
    SUM(w.w * (CAST(w.t_us - m.tlo AS DOUBLE) / 1e6 - d.mx)
            * (CAST(w.t_us - m.tlo AS DOUBLE) / 1e6 - d.mx)) AS sxx,
    SUM(w.w * (CAST(w.t_us - m.tlo AS DOUBLE) / 1e6 - d.mx)
            * (w.v - m.wmean)) AS sxy
  FROM w JOIN m USING (lang, domain) JOIN d USING (lang, domain)
  GROUP BY 1, 2
),
fr AS (
  SELECT w.lang, w.domain,
    SUM(w.w * (w.v - ((m.wmean - (lf.sxy / lf.sxx) * d.mx)
                      + (lf.sxy / lf.sxx)
                        * (CAST(w.t_us - m.tlo AS DOUBLE) / 1e6)))
            * (w.v - ((m.wmean - (lf.sxy / lf.sxx) * d.mx)
                      + (lf.sxy / lf.sxx)
                        * (CAST(w.t_us - m.tlo AS DOUBLE) / 1e6))))
      AS rssw
  FROM w JOIN m USING (lang, domain) JOIN d USING (lang, domain)
       JOIN lf USING (lang, domain)
  WHERE m.n >= 3 AND lf.sxx > 0 GROUP BY 1, 2
),
raw AS (
  SELECT m.lang, m.domain, m.n,
    ROUND(m.wmean, 6) AS weighted_mean,
    CASE WHEN m.n < 2 THEN NULL
         ELSE d.chi2 / (m.n - 1) END AS rc,
    CASE WHEN m.n < 2 OR m.mean = 0.0 THEN NULL
         ELSE (m.s2 - m.msig2) / (m.mean * m.mean) END AS ev,
    CASE WHEN m.n < 2 OR m.mean = 0.0 THEN NULL
         ELSE SQRT(m.s2) / m.mean END AS mv,
    CASE WHEN d.msq <= 0.0 THEN NULL
         ELSE ROUND(d.mad / SQRT(d.msq), 6) END AS stetson_k,
    CASE WHEN m.n < 2 THEN NULL
         ELSE ROUND(sj.jsum / (m.n - 1), 6) END AS stetson_j,
    CASE WHEN m.n < 2 OR d.msq <= 0.0 THEN NULL
         ELSE ROUND(sj.jsum / (m.n - 1) * (d.mad / SQRT(d.msq))
                    / 0.798, 6) END AS stetson_l,
    CASE WHEN m.n < 2 OR m.s2 <= 0.0 OR ee.sde IS NULL THEN NULL
         ELSE (CAST(m.thi - m.tlo AS DOUBLE) / 1e6)
              * (CAST(m.thi - m.tlo AS DOUBLE) / 1e6) * ee.sde
              / (m.s2 * POWER(m.n - 1.0, 3)) END AS ee_,
    CASE WHEN m.n < 3 OR lf.sxx <= 0.0 THEN NULL
         ELSE ROUND(lf.sxy / lf.sxx, 6) END AS slope,
    CASE WHEN m.n < 3 OR lf.sxx <= 0.0 THEN NULL
         ELSE ROUND(SQRT(1.0 / lf.sxx), 6) END AS slope_sigma,
    CASE WHEN m.n < 3 OR lf.sxx <= 0.0 THEN NULL
         ELSE fr.rssw / (m.n - 2) END AS frc
  FROM m LEFT JOIN d USING (lang, domain)
         LEFT JOIN sj USING (lang, domain)
         LEFT JOIN ee USING (lang, domain)
         LEFT JOIN lf USING (lang, domain)
         LEFT JOIN fr USING (lang, domain)
),
-- unbounded-magnitude features round at SIGNIFICANT digits (9 then 6,
-- mirroring kernels/rounding.round_sig6_tie_robust via _SIG_ROUND_COLS)
r9 AS (
  SELECT lang, domain, n, weighted_mean, stetson_k, stetson_j,
    stetson_l, slope, slope_sigma,
    {_sig_round_sql("rc", 9)} AS rc9,
    {_sig_round_sql("ev", 9)} AS ev9,
    {_sig_round_sql("mv", 9)} AS mv9,
    {_sig_round_sql("ee_", 9)} AS ee9,
    {_sig_round_sql("frc", 9)} AS frc9
  FROM raw
)
SELECT lang, domain, n, weighted_mean,
  {_sig_round_sql("rc9", 6)} AS reduced_chi2,
  {_sig_round_sql("ev9", 6)} AS excess_variance,
  {_sig_round_sql("mv9", 6)} AS mean_variance,
  stetson_k, stetson_j, stetson_l,
  {_sig_round_sql("ee9", 6)} AS eta_e,
  slope, slope_sigma,
  {_sig_round_sql("frc9", 6)} AS fit_reduced_chi2
FROM r9
"""


def q_weighted_features(sf_dir: str):
    """Error-aware feature family (ReducedChi2, ExcessVariance,
    MeanVariance, StetsonK, EtaE, LinearFit — light-curve-feature
    catalog, kernels/features.weighted_features) per series, with
    per-point sigma derived from the data by the shared IEEE-exact
    expression (_SIGMA_SQL) so both engines weigh identically; one
    sorted-series exchange; ORACLE-CHECKED."""
    from ..kernels.features import WEIGHTED_FEATURES, weighted_features
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema(
        [("lang", pa.string()), ("domain", pa.string()),
         ("n", pa.int64())]
        + [(f, pa.float64()) for f in WEIGHTED_FEATURES if f != "n"])

    def _one(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        sigma = 1.0 + 0.1 * np.sqrt(np.abs(v))  # == _SIGMA_SQL
        feats = weighted_features(
            group["t_us"].to_numpy(zero_copy_only=False), v, sigma)
        arrays = {
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([feats["n"]], pa.int64()),
        }
        for f in WEIGHTED_FEATURES:
            if f == "n":
                continue
            val = feats[f]
            arrays[f] = pa.array(
                [None if (isinstance(val, float) and np.isnan(val))
                 else val], pa.float64())
        return pa.table(arrays)

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


def _time_features_sql(points_sql: str) -> str:
    return f"""
WITH pts AS ({points_sql}),
m AS (
  SELECT lang, domain, COUNT(*) AS n, MIN(t_us) AS tlo, MAX(t_us) AS thi
  FROM pts GROUP BY 1, 2
),
r AS (
  SELECT p.lang, p.domain,
         AVG(CAST(p.t_us - m.tlo AS DOUBLE) / 1e6) AS tmean,
         STDDEV_SAMP(CAST(p.t_us - m.tlo AS DOUBLE) / 1e6) AS tstd
  FROM pts p JOIN m USING (lang, domain) GROUP BY 1, 2
),
s AS (
  SELECT lang, domain, t_us,
         LAG(t_us) OVER (PARTITION BY lang, domain ORDER BY t_us) AS pt
  FROM pts
),
i AS (
  SELECT lang, domain,
         MIN(CAST(t_us - pt AS DOUBLE) / 1e6) AS min_iv,
         MAX(CAST(t_us - pt AS DOUBLE) / 1e6) AS max_iv
  FROM s WHERE pt IS NOT NULL GROUP BY 1, 2
),
r9 AS (
  SELECT m.lang, m.domain, m.n,
         CAST(m.thi - m.tlo AS DOUBLE) / 1e6 AS dur,
         i.min_iv, i.max_iv,
         {_sig_round_sql("r.tmean", 9)} AS tm9,
         {_sig_round_sql("r.tstd", 9)} AS ts9
  FROM m LEFT JOIN r USING (lang, domain)
         LEFT JOIN i USING (lang, domain)
)
SELECT lang, domain, n,
  ROUND(dur, 6) AS duration_s,
  ROUND(min_iv, 6) AS min_time_interval_s,
  ROUND(max_iv, 6) AS max_time_interval_s,
  {_sig_round_sql("tm9", 6)} AS time_mean_s,
  {_sig_round_sql("ts9", 6)} AS time_standard_deviation_s
FROM r9
"""


def q_time_features(sf_dir: str):
    """Sampling-cadence feature family (ObservationCount, Duration,
    Minimum/MaximumTimeInterval, TimeMean, TimeStandardDeviation —
    light-curve-feature catalog, kernels/features.time_features) per
    series.  duration/intervals are EXACT (int64 diffs, one divide);
    time mean/std are computed relative to the series' first point on
    both engines (bounded magnitudes, term-identical expressions) and
    ride the significant-digit rounding contract.  One sorted-series
    exchange; ORACLE-CHECKED."""
    from ..kernels.features import TIME_FEATURES, time_features
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema(
        [("lang", pa.string()), ("domain", pa.string()),
         ("n", pa.int64())]
        + [(f, pa.float64()) for f in TIME_FEATURES if f != "n"])

    def _one(group: pa.Table) -> pa.Table:
        feats = time_features(
            group["t_us"].to_numpy(zero_copy_only=False))
        arrays = {
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([feats["n"]], pa.int64()),
        }
        for f in TIME_FEATURES:
            if f == "n":
                continue
            val = feats[f]
            arrays[f] = pa.array(
                [None if (isinstance(val, float) and np.isnan(val))
                 else val], pa.float64())
        return pa.table(arrays)

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


def _roms_sql(points_sql: str) -> str:
    # sigma mirrors _SIGMA_SQL on the joined alias; median via
    # QUANTILE_CONT(0.5) == numpy linear-interp percentile (the parity
    # the percentile_ratios family pins)
    return f"""
WITH pts AS ({points_sql}),
m AS (
  SELECT lang, domain, COUNT(*) AS n, QUANTILE_CONT(v, 0.5) AS med
  FROM pts GROUP BY 1, 2
),
r AS (
  SELECT p.lang, p.domain,
         SUM(ABS(p.v - m.med)
             / (1.0 + 0.1 * SQRT(ABS(p.v)))) AS srm
  FROM pts p JOIN m USING (lang, domain) GROUP BY 1, 2
),
r9 AS (
  SELECT m.lang, m.domain, m.n,
         CASE WHEN m.n < 2 THEN NULL ELSE r.srm / (m.n - 1) END AS rm
  FROM m LEFT JOIN r USING (lang, domain)
),
r99 AS (
  SELECT lang, domain, n, {_sig_round_sql("rm", 9)} AS rm9 FROM r9
)
SELECT lang, domain, n, {_sig_round_sql("rm9", 6)} AS roms FROM r99
"""


def q_roms(sf_dir: str):
    """Roms — robust median statistic (Rose & Hintz 2007;
    light-curve-feature catalog, kernels/features.roms) per series, with
    the shared per-point sigma expression (_SIGMA_SQL) so both engines
    weigh identically; median == QUANTILE_CONT(0.5) parity; one
    sorted-series exchange; ORACLE-CHECKED."""
    from ..kernels.features import roms
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema([
        ("lang", pa.string()), ("domain", pa.string()),
        ("n", pa.int64()), ("roms", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        sigma = 1.0 + 0.1 * np.sqrt(np.abs(v))  # == _SIGMA_SQL
        # np.percentile's lerp, not np.median's (a+b)/2 — the QUANTILE_CONT
        # expression shape, so even-n midpoints agree to the last ulp
        val = roms(v, sigma)
        return pa.table({
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([len(v)], pa.int64()),
            "roms": pa.array(
                [None if np.isnan(val) else val], pa.float64()),
        })

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


def q_bazin_fit(sf_dir: str):
    """BazinFit (Bazin et al. 2009 transient profile; kernels/bazin.py)
    per series: deterministic hand-rolled Levenberg-Marquardt on the
    sorted-series exchange.  Nonlinear fit — no SQL oracle BY DESIGN
    (rows-only driver check); the unit oracle plants known parameters on
    synthetic curves and requires recovery (tests/test_bazin.py)."""
    from ..kernels.bazin import BAZIN_PARAMS, bazin_fit
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema(
        [("lang", pa.string()), ("domain", pa.string()),
         ("n", pa.int64())]
        + [(f, pa.float64()) for f in BAZIN_PARAMS] +
        [("rss", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        t_us = group["t_us"].to_numpy(zero_copy_only=False)
        t_s = (t_us - t_us.min()).astype(np.float64) / 1e6
        feats = bazin_fit(t_s, group["v"].to_numpy(zero_copy_only=False))
        arrays = {
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([feats["n"]], pa.int64()),
        }
        for f in list(BAZIN_PARAMS) + ["rss"]:
            val = feats[f]
            arrays[f] = pa.array(
                [None if (isinstance(val, float) and np.isnan(val))
                 else val], pa.float64())
        return pa.table(arrays)

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


def q_villar_fit(sf_dir: str):
    """VillarFit (Villar et al. 2019 supernova profile; kernels/villar.py)
    per series: deterministic multi-start Levenberg-Marquardt on the
    sorted-series exchange.  Nonlinear — no SQL oracle BY DESIGN
    (rows-only driver check); planted-parameter recovery is pinned by
    tests/test_villar.py."""
    from ..kernels.villar import VILLAR_PARAMS, villar_fit
    from ..stages.sorted_groups import sorted_group_map

    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg)

    out_schema = pa.schema(
        [("lang", pa.string()), ("domain", pa.string()),
         ("n", pa.int64())]
        + [(f, pa.float64()) for f in VILLAR_PARAMS] +
        [("rss", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        t_us = group["t_us"].to_numpy(zero_copy_only=False)
        t_s = (t_us - t_us.min()).astype(np.float64) / 1e6
        feats = villar_fit(t_s, group["v"].to_numpy(zero_copy_only=False))
        arrays = {
            "lang": pa.array([group["lang"][0].as_py()], pa.string()),
            "domain": pa.array([group["domain"][0].as_py()], pa.string()),
            "n": pa.array([feats["n"]], pa.int64()),
        }
        for f in list(VILLAR_PARAMS) + ["rss"]:
            val = feats[f]
            arrays[f] = pa.array(
                [None if (isinstance(val, float) and np.isnan(val))
                 else val], pa.float64())
        return pa.table(arrays)

    feats = sorted_group_map(points, ["lang", "domain"], _one, out_schema)
    return _collect(feats)


def _sliding_sql(points_sql: str, step_us: int, window: int) -> str:
    """Trailing-range window oracle: every window recomputed TWO-PASS
    from raw points via a range join (the oracle's luxury; the engine
    merges streamed states — same parity contract as the rollup)."""
    back = (window - 1) * step_us
    return f"""
WITH pts AS ({points_sql}),
b AS (
  SELECT lang, domain, (t_us // {step_us}) * {step_us} AS bucket_ts_us, v
  FROM pts
),
g AS (SELECT DISTINCT lang, domain, bucket_ts_us FROM b)
SELECT g.lang, g.domain, g.bucket_ts_us,
  COUNT(*) AS w_n,
  ROUND(AVG(p.v), 6) AS w_mean,
  ROUND(STDDEV_SAMP(p.v), 6) AS w_std,
  ROUND(MIN(p.v), 6) AS w_min,
  ROUND(MAX(p.v), 6) AS w_max
FROM g JOIN b p ON p.lang = g.lang AND p.domain = g.domain
  AND p.bucket_ts_us BETWEEN g.bucket_ts_us - {back} AND g.bucket_ts_us
GROUP BY 1, 2, 3
"""


def q_sliding_3h(sf_dir: str):
    """Sliding-window aggregate (stages/window): per series, each hourly
    bucket's stats merged with its two preceding bucket slots — the
    trailing 3h moving aggregate, computed from the SAME mergeable
    states the rollup streams (no second pass over points)."""
    from ..kernels.grid import TIER_STEP_US
    from ..stages.aggregate import make_partial_stats_fn, merge_partials
    from ..stages.window import sliding_window_states
    from .rollup import points_dataset

    cfg = _events_cfg(sf_dir, ("1h",))
    pts = points_dataset(cfg)
    step = TIER_STEP_US["1h"]
    partials = pts.map_batches(
        make_partial_stats_fn(step), batch_format="pyarrow",
        batch_size=cfg.points_batch_size, zero_copy_batch=True)
    fine = merge_partials(partials)
    out = sliding_window_states(fine, ["lang", "domain"], step, window=3)
    return _collect(out)


EVENTS_ASOF_SQL = """
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
),
big AS (
  SELECT event_type, t_us, MAX(v) AS big_v
  FROM pts WHERE v > 100.0 GROUP BY 1, 2
)
SELECT p.event_type, p.t_us, ROUND(p.v, 6) AS v,
       ROUND(b.big_v, 6) AS big_v_r, b.t_us AS t_us_r
FROM pts p ASOF LEFT JOIN big b
  ON p.event_type = b.event_type AND p.t_us >= b.t_us
"""


def q_events_asof(sf_dir: str):
    """Distributed AS-OF join (stages/asof): every event aligned with the
    latest 'significant' (v > 100) observation of ITS series at or before
    its timestamp — the classic two-band light-curve alignment, checked
    against DuckDB's native ASOF LEFT JOIN.  The right side is
    pre-aggregated to one row per (series, ts) so tie resolution is
    deterministic on both sides."""
    import ray.data as rd

    from ..stages.asof import asof_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def _pts(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["ts"]),
                            pc.is_valid(batch["value"])),
                    pc.is_valid(batch["event_type"]))
        batch = batch.filter(m)
        return pa.table({
            "event_type": batch["event_type"],
            "t_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
            "v": pc.cast(batch["value"], pa.float64()),
        })

    pts = ds.map_batches(_pts, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()  # two readers

    def _big_partial(batch: pa.Table) -> pa.Table:
        # map-side combine BEFORE the groupby shuffle: filter + one max
        # per (series, ts) per block
        from ..kernels.moments import _group_codes

        batch = batch.filter(pc.greater(batch["v"], 100.0))
        if len(batch) == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "t_us": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        inv, first = _group_codes(batch, ["event_type", "t_us"])
        v = batch["v"].to_numpy(zero_copy_only=False)
        mx = np.full(len(first), -np.inf)
        np.maximum.at(mx, inv, v)
        idx = pa.array(first, pa.int64())
        return pa.table({"event_type": batch["event_type"].take(idx),
                         "t_us": batch["t_us"].take(idx),
                         "v": pa.array(mx, pa.float64())})

    big = pts.map_batches(_big_partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["event_type", "t_us"]).max("v")

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "t_us": batch["t_us"],
                         "big_v": batch["max(v)"]})

    big = big.map_batches(_rename, batch_format="pyarrow")
    out = asof_join(pts, big, ["event_type"], "t_us", ["big_v"])
    return _collect(out)


EVENTS_RANGE_SQL = """
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
),
iv AS (
  SELECT event_type, t_us AS start_us, t_us + 7200000000 AS end_us,
         v AS iv_v
  FROM pts WHERE v > 200.0
)
SELECT p.event_type, p.t_us, ROUND(p.v, 6) AS v,
       i.start_us, i.end_us, ROUND(i.iv_v, 6) AS iv_v
FROM pts p JOIN iv i ON p.event_type = i.event_type
  AND p.t_us >= i.start_us AND p.t_us < i.end_us
"""


def q_events_range(sf_dir: str):
    """Distributed keyed RANGE join (stages/rangejoin): every event paired
    with each 'high-activity episode' of ITS series covering it — an
    episode opens at any observation with v > 200 and lasts 2 hours.
    Inner half-open semantics (start <= ts < end), checked against the
    equivalent DuckDB non-equi join."""
    import ray.data as rd

    from ..stages.rangejoin import range_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def _pts(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["ts"]),
                            pc.is_valid(batch["value"])),
                    pc.is_valid(batch["event_type"]))
        batch = batch.filter(m)
        return pa.table({
            "event_type": batch["event_type"],
            "t_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
            "v": pc.cast(batch["value"], pa.float64()),
        })

    pts = ds.map_batches(_pts, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()  # two readers

    def _episodes(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["v"], 200.0))
        return pa.table({
            "event_type": batch["event_type"],
            "start_us": batch["t_us"],
            "end_us": pc.add(batch["t_us"],
                             pa.scalar(7_200_000_000, pa.int64())),
            "iv_v": batch["v"],
        })

    episodes = pts.map_batches(_episodes, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = range_join(pts, episodes, ["event_type"], "t_us",
                     "start_us", "end_us", point_cols=["v"],
                     interval_cols=["iv_v"])
    return _collect(out)


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
GROUP BY 1
"""


QUANTILE_EVENTS_SQL = """
SELECT event_type,
  ROUND(quantile_cont(value, 0.25), 6) AS q25,
  ROUND(quantile_cont(value, 0.50), 6) AS q50,
  ROUND(quantile_cont(value, 0.90), 6) AS q90
FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
GROUP BY 1
"""


def _events_nonnull(sf_dir: str, cols: list):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def _clean(batch: pa.Table) -> pa.Table:
        m = None
        for c in cols:
            v = pc.is_valid(batch[c])
            m = v if m is None else pc.and_(m, v)
        return batch.filter(m)

    return ds.map_batches(_clean, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_distinct_users(sf_dir: str):
    """EXACT distributed distinct count (stages/sketch): distinct users
    per event series via block-level pre-distinct + one slim exchange —
    raw rows never shuffle, only each block's distinct (key, value)
    pairs.  ORACLE-CHECKED against COUNT(DISTINCT)."""
    from ..stages.sketch import distinct_count_exact

    ds = _events_nonnull(sf_dir, ["event_type", "user_id"])
    out = distinct_count_exact(ds, ["event_type"], ["user_id"],
                               out_col="n_users")
    return _collect(out)


def q_hll_users(sf_dir: str):
    """HyperLogLog distinct count per event series (stages/sketch,
    p=12 -> ~1.6% expected relative error, 4 KB registers per
    (block, key) on the exchange).  The estimate is a deterministic pure
    function of the input (fixed hash seed, order-free max-merge) but
    not SQL-expressible -> rows-only driver check; the error bound and
    merge invariance are unit-test oracles (tests/test_sketch.py)."""
    from ..stages.sketch import hll_distinct

    ds = _events_nonnull(sf_dir, ["event_type", "user_id"])
    out = hll_distinct(ds, ["event_type"], ["user_id"], p=12,
                       out_col="n_users_hll")
    return _collect(out)


def q_quantile_events(sf_dir: str):
    """Mergeable distributed quantiles (stages/sketch): per-series p25/
    p50/p90 from per-block compressed summaries merged in one slim
    exchange.  Capacity 2^16 keeps every test-scale group uncompressed,
    so the result is EXACTLY SQL quantile_cont (linear interpolation) —
    ORACLE-CHECKED; beyond capacity the same operator degrades gracefully
    to <= W/capacity rank error (property-tested)."""
    from ..stages.sketch import quantile_by_key

    ds = _events_nonnull(sf_dir, ["event_type", "value"])
    out = quantile_by_key(ds, ["event_type"], "value",
                          qs=[0.25, 0.50, 0.90],
                          names=["q25", "q50", "q90"], capacity=1 << 16)
    return _collect(out)


SESSIONS_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t_us FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
lagd AS (
  SELECT user_id, t_us,
    CASE WHEN LAG(t_us) OVER w IS NULL
           OR t_us - LAG(t_us) OVER w > 1800000000
         THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
),
s AS (
  -- default RANGE frame: tied timestamps are frame PEERS, so every tie
  -- gets the same running sum regardless of internal order (exactly one
  -- of a peer set carries brk=1 from the LAG) -> deterministic
  SELECT user_id, t_us,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY t_us) AS session_id
  FROM lagd
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  MIN(t_us) AS t_start_us, MAX(t_us) AS t_end_us
FROM s GROUP BY 1, 2
"""


def q_sessions(sf_dir: str):
    """Sessionization (stages/session): each user's event stream split at
    30-minute inactivity gaps — one vectorized diff/cumsum block kernel
    behind ONE keyed sort; ORACLE-CHECKED against the SQL LAG + running-
    sum derivation (tie-robust on duplicate timestamps by construction
    on both sides)."""
    from ..stages.session import sessionize

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])

    def _us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "t_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
        })

    pts = ds.map_batches(_us, batch_format="pyarrow", zero_copy_batch=True)
    out = sessionize(pts, ["user_id"], "t_us", gap_us=1_800_000_000)
    return _collect(out)


TFIDF_TERMS_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
),
dt AS (SELECT doc_id, term, COUNT(*) AS n FROM toks GROUP BY 1, 2),
dfs AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
sc AS (
  SELECT doc_id, term,
         ROUND(n * LN((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
  FROM dt JOIN dfs USING (term), nd
)
SELECT doc_id, term, tfidf, rn FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rn
  FROM sc)
WHERE rn <= 3
"""


def q_tfidf_terms(sf_dir: str):
    """Per-document TF-IDF top terms (stages/wordcount.tfidf_top_terms):
    document frequency computed and attached inside ONE term-keyed
    exchange (term_counts rows are distinct per (doc, term), so df is
    the run length — no df table, no join), smoothed IDF with the
    driver-scalar corpus size, grouped top-3 on the 6-dp-rounded score;
    ORACLE-CHECKED against the two-CTE SQL derivation."""
    import ray.data as rd

    from ..stages.wordcount import tfidf_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(tfidf_top_terms(ds, "doc_id", "text", k=3))


DOC_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
),
tc AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
tot AS (SELECT SUM(n) AS t FROM tc)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(LN(CAST(tc.n AS DOUBLE) / tot.t)), 6) AS avg_logp
FROM toks JOIN tc USING (term), tot
GROUP BY doc_id
"""


def q_doc_logprob(sf_dir: str):
    """Unigram language-model quality score per document
    (stages/wordcount.unigram_logprob_scores): corpus unigram table via
    the combiner wordcount, log-probs broadcast ONCE (ray.put sorted
    vocab + searchsorted lookup — never re-shipped per batch), stateless
    scoring map; ORACLE-CHECKED against the UNNEST + join SQL."""
    import ray.data as rd

    from ..stages.wordcount import unigram_logprob_scores

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(unigram_logprob_scores(ds, "doc_id", "text"))


DEDUP_COMPONENTS_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS component
FROM aug
"""


def q_dedup_components(sf_dir: str):
    """Dedup GROUP discovery end-to-end: exact-dup CHAIN edges (k-copy
    group ships k-1 edges, stages/dedup.exact_dup_chain_edges) ->
    generic connected components (stages/components) -> every doc
    labelled with its group's min id, singletons labelling themselves
    via attach_components.  ORACLE-CHECKED against MIN(doc_id) OVER
    (PARTITION BY text) on a corpus of singletons + planted triples —
    the transitive closure must be rediscovered from pairwise edges
    alone."""
    import ray.data as rd

    from ..stages.components import attach_components, connected_components
    from ..stages.dedup import exact_dup_chain_edges

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and ids.max() >= 100_000:
            # fixture offsets collide with real ids beyond this corpus
            # size; both sides hard-code them, so fail loudly
            raise ValueError(
                "dedup_components fixture assumes doc_id < 100000")
        texts = batch["text"]
        sel = np.nonzero(ids % 3 == 0)[0]
        idx = pa.array(sel, pa.int64())
        copies = texts.take(idx)
        return pa.table({
            "doc_id": pa.array(np.concatenate(
                [ids, ids[sel] + 100_000, ids[sel] + 300_000]), pa.int64()),
            "text": pa.concat_arrays(
                [texts.combine_chunks(), copies.combine_chunks(),
                 copies.combine_chunks()]),
        })

    aug = ds.map_batches(_augment, batch_format="pyarrow")
    edges = exact_dup_chain_edges(aug)
    comps = connected_components(edges)
    nodes = aug.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"]}),
        batch_format="pyarrow")
    return _collect(attach_components(nodes, "doc_id", comps))


TOP_TERMS_SQL = """
WITH toks AS (
  SELECT lang, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
),
counts AS (SELECT lang, term, COUNT(*) AS n FROM toks GROUP BY 1, 2)
SELECT lang, term, n, rn FROM (
  SELECT lang, term, n,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n DESC, term) AS rn
  FROM counts)
WHERE rn <= 10
"""


def q_top_terms(sf_dir: str):
    """Distributed wordcount + grouped top-k (stages/wordcount): Arrow
    C-speed tokenize + per-block combiner (the partial-aggregation
    discipline — distinct (lang,term) partials leave the block, never
    raw tokens), ONE keyed merge exchange, block-local top-k candidate
    pruning; ORACLE-CHECKED against the UNNEST/ROW_NUMBER SQL."""
    import ray.data as rd

    from ..stages.wordcount import top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    return _collect(top_terms(ds, ["lang"], "text", k=10))


INVERTED_INDEX_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
),
dt AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(doc_id, ',' ORDER BY doc_id) AS postings
FROM dt GROUP BY term
HAVING COUNT(*) BETWEEN 2 AND 1000000
"""


BIGRAM_PMI_SQL = """
WITH t AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS v
  FROM documents WHERE text IS NOT NULL
),
uni AS (SELECT u.term, COUNT(*) AS n FROM t, UNNEST(v) AS u(term)
        GROUP BY 1),
tot AS (SELECT SUM(n) AS s FROM uni),
bg AS (
  SELECT list_extract(v, i) AS a, list_extract(v, i + 1) AS b
  FROM (SELECT v, unnest(generate_series(1, len(v) - 1)) AS i FROM t)
),
bc AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2
       HAVING COUNT(*) >= 5),
sc AS (
  SELECT bc.a || ' ' || bc.b AS bigram, bc.n_ab,
         ROUND(LN((CAST(bc.n_ab AS DOUBLE) * tot.s)
                  / (CAST(ua.n AS DOUBLE) * ub.n)), 6) AS pmi
  FROM bc JOIN uni ua ON bc.a = ua.term
          JOIN uni ub ON bc.b = ub.term, tot
)
SELECT bigram, n_ab, pmi, rn FROM (
  SELECT bigram, n_ab, pmi,
         ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS rn FROM sc)
WHERE rn <= 20
"""


def q_bigram_pmi(sf_dir: str):
    """Collocation mining (stages/wordcount.bigram_pmi): top-20 bigrams
    by PMI with a count floor — combiner bigram counts, one keyed
    merge, unigram broadcast, rank on the shared 6-dp-rounded score;
    ORACLE-CHECKED against the list_filter/UNNEST SQL derivation."""
    import ray.data as rd

    from ..stages.wordcount import bigram_pmi

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(bigram_pmi(ds, "doc_id", "text", k=20, min_count=5))


def q_inverted_index(sf_dir: str):
    """Inverted index (stages/wordcount.inverted_index): posting lists
    for the df in [2, 50] band, ordered doc ids as canonical strings;
    df = term-run length inside the one term-keyed exchange — no second
    pass for the band filter; ORACLE-CHECKED against the ordered
    string_agg SQL."""
    import ray.data as rd

    from ..stages.wordcount import inverted_index

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(inverted_index(ds, "doc_id", "text",
                                   min_df=2, max_df=1_000_000))


def _split_sample_sql() -> str:
    from ..stages.sampling import hash_bucket_sql

    return f"""
SELECT doc_id, lang,
       CASE WHEN {hash_bucket_sql('doc_id', 0)} < 80
            THEN 'train' ELSE 'test' END AS split
FROM documents
WHERE {hash_bucket_sql('doc_id', 1)} < 30
"""


def q_split_sample(sf_dir: str):
    """Deterministic corpus subsampling + train/test split
    (stages/sampling): pure stateless map projections — no shuffle, no
    randomness, every doc lands in the same bucket at any cluster size —
    ORACLE-CHECKED bit-for-bit against the HUGEINT SQL mirror of the
    Knuth multiplicative hash."""
    import ray.data as rd

    from ..stages.sampling import attach_split, hash_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    out = attach_split(hash_sample(ds, "doc_id", 30, salt=1),
                       "doc_id", train_pct=80, salt=0)
    return _collect(out)


def _mixture_sample_sql() -> str:
    from ..stages.sampling import hash_bucket_fine_sql

    return f"""
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
t AS (SELECT lang,
             LEAST(1000000.0,
                   FLOOR(8000000.0 / SQRT(CAST(n AS DOUBLE)))) AS thr
      FROM c)
SELECT d.doc_id, d.lang
FROM documents d JOIN t USING (lang)
WHERE {hash_bucket_fine_sql('d.doc_id', 2)} < t.thr
"""


def q_mixture_sample(sf_dir: str):
    """Domain-mixture reweighting (stages/sampling.mixture_sample): each
    language keeps a deterministic rate = min(1, 8/sqrt(n_lang)) of its
    docs — inverse-sqrt temperature sampling, the head-domain
    downsampler of web-corpus mixing (the en-heavy head is genuinely
    downsampled vs the tail at both test scales).  Count pass is a slim
    keyed exchange at GROUP cardinality; the filter is a stateless map
    with a broadcast threshold LUT.  ORACLE-CHECKED bit-for-bit: the
    threshold uses only correctly-rounded IEEE ops in the oracle's
    exact expression order, and the hash is the HUGEINT-mirrored Knuth
    hash at ppm granularity."""
    import ray.data as rd

    from ..stages.sampling import mixture_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return _collect(mixture_sample(ds, "doc_id", "lang",
                                   scale=8.0, salt=2))


CHUNK_STRIDE_SQL = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS ts
  FROM documents),
c AS (
  SELECT doc_id, ts, len(ts) AS n,
         CASE WHEN len(ts) = 0 THEN 0
              ELSE 1 + CAST(CEIL(CAST(GREATEST(0, len(ts) - 64)
                                      AS DOUBLE) / 48) AS BIGINT)
         END AS k
  FROM tok),
e AS (SELECT doc_id, ts, n, UNNEST(range(k)) AS chunk_idx FROM c)
SELECT doc_id, chunk_idx,
       LEAST(64, n - chunk_idx*48) AS n_tokens,
       array_to_string(
         ts[chunk_idx*48 + 1 : chunk_idx*48 + LEAST(64, n - chunk_idx*48)],
         ' ') AS chunk
FROM e
"""


def q_chunk_stride(sf_dir: str):
    """Context-window chunking with overlap
    (stages/scan.chunk_stride_table): every doc splits into 64-token
    windows every 48 tokens (25% overlap — the LLM-ingest long-doc
    splitter).  Fully vectorized stateless flat-map: one RE2 split
    kernel, numpy repeat/cumsum gather-index arithmetic, one take, one
    binary_join — no Python touches a row, no exchange.
    ORACLE-CHECKED including the chunk TEXT itself (DuckDB's
    string_split_regex is RE2 too, so tokenization is identical)."""
    import ray.data as rd

    from ..stages.scan import chunk_stride

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(chunk_stride(ds, "doc_id", "text",
                                 window=64, stride=48))


JSONL_ROUNDTRIP_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents GROUP BY 1
"""


def _docs_roundtrip(sf_dir: str, fmt: str):
    """Shared sink+source round-trip harness over the documents table:
    stream to ``fmt`` (one shard per block — the resumable-output
    layout), read back, aggregate per lang.  Text lengths and ids must
    survive the encode/decode byte-exactly (JSON escaping / CSV quoting
    round-trip the multilingual text, embedded commas and newlines
    included).  ORACLE-CHECKED against the same aggregate computed
    directly on the parquet."""
    import shutil
    import tempfile

    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map

    tmp = tempfile.mkdtemp(prefix=f"{fmt}_rt_", dir="/tmp")
    try:
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
        if fmt == "json":
            docs.write_json(tmp)
            back = rd.read_json(tmp)
        elif fmt == "csv":
            docs.write_csv(tmp)
            back = rd.read_csv(tmp)
        elif fmt == "ipc":
            # custom binary source/sink: one Arrow IPC file per block
            # (atomic .tmp rename publish — the resumable layout), read
            # back through read_binary_files + a per-FILE decode stage
            # (the pattern for any format Ray Data has no reader for)
            import os
            import uuid

            def _write_block(batch: pa.Table) -> pa.Table:
                name = os.path.join(
                    tmp, f"part-{uuid.uuid4().hex}.arrow")
                with pa.OSFile(name + ".tmp", "wb") as f:
                    with pa.ipc.new_file(f, batch.schema) as w:
                        w.write_table(batch)
                os.rename(name + ".tmp", name)
                return pa.table({"path": pa.array([name], pa.string()),
                                 "rows": pa.array([len(batch)],
                                                  pa.int64())})

            manifest = docs.map_batches(
                _write_block, batch_format="pyarrow").materialize()
            assert manifest.count() > 0

            def _read_ipc(batch: pa.Table) -> pa.Table:
                tables = [
                    pa.ipc.open_file(pa.BufferReader(b)).read_all()
                    for b in batch["bytes"].to_pylist()  # per FILE
                ]
                return pa.concat_tables(tables)

            back = rd.read_binary_files(
                tmp, file_extensions=["arrow"]).map_batches(
                _read_ipc, batch_format="pyarrow")
        else:  # "compact": many tiny shards -> bin-packed rewrite
            import os

            from ..sources.compact import compact_parquet

            shards = os.path.join(tmp, "shards")
            packed = os.path.join(tmp, "compacted")
            docs.repartition(40).write_parquet(shards)
            info = compact_parquet(shards, packed,
                                   target_bytes=1 << 20)
            assert info["n_out"] < info["n_in"], info  # really compacted
            back = rd.read_parquet(packed)

        out_schema = pa.schema([
            ("lang", pa.string()), ("n_docs", pa.int64()),
            ("sum_chars", pa.int64()), ("sum_len", pa.int64()),
            ("min_id", pa.int64()), ("max_id", pa.int64()),
        ])

        def _partial(batch: pa.Table) -> pa.Table:
            lens = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
            t = pa.table({"lang": batch["lang"],
                          "n_chars": batch["n_chars"],
                          "len": lens, "doc_id": batch["doc_id"]})
            g = t.group_by(["lang"]).aggregate(
                [("n_chars", "count"), ("n_chars", "sum"),
                 ("len", "sum"), ("doc_id", "min"), ("doc_id", "max")])
            return g.rename_columns(["lang", "n_docs", "sum_chars",
                                     "sum_len", "min_id", "max_id"])

        partials = back.map_batches(_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)

        def _merge(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return out_schema.empty_table()
            starts, _ = _runs(batch, ["lang"])
            idx = pa.array(starts, pa.int64())

            def col(c):
                return batch[c].to_numpy(zero_copy_only=False)

            return pa.table({
                "lang": batch["lang"].take(idx),
                "n_docs": pa.array(np.add.reduceat(col("n_docs"), starts)),
                "sum_chars": pa.array(
                    np.add.reduceat(col("sum_chars"), starts)),
                "sum_len": pa.array(np.add.reduceat(col("sum_len"),
                                                    starts)),
                "min_id": pa.array(np.minimum.reduceat(col("min_id"),
                                                       starts)),
                "max_id": pa.array(np.maximum.reduceat(col("max_id"),
                                                       starts)),
            }, schema=out_schema)

        return _collect(sorted_group_map(partials, ["lang"], None,
                                         out_schema, block_fn=_merge))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_jsonl_roundtrip(sf_dir: str):
    """See _docs_roundtrip — line-delimited JSON sink + source."""
    return _docs_roundtrip(sf_dir, "json")


def q_csv_roundtrip(sf_dir: str):
    """See _docs_roundtrip — CSV sink + source (Arrow CSV writer quotes
    embedded commas/newlines; the reader re-parses them)."""
    return _docs_roundtrip(sf_dir, "csv")


def q_ipc_roundtrip(sf_dir: str):
    """See _docs_roundtrip — Arrow IPC (Feather v2) sink + source: the
    custom-binary-format pattern (read_binary_files + a per-file decode
    stage) for formats Ray Data has no native reader for; zero-copy
    schema fidelity (no JSON/CSV type erasure)."""
    return _docs_roundtrip(sf_dir, "ipc")


def q_compact_roundtrip(sf_dir: str):
    """Small-file compaction round-trip (sources/compact): 40 tiny
    shards bin-pack (first-fit-decreasing over file sizes, driver sees
    only metadata) into ~1 MB outputs rewritten by one Ray task per
    bucket — atomic .tmp rename publish, bucket-indexed resume.  The
    per-lang aggregate over the compacted copy must equal the direct
    parquet aggregate (row preservation).  See _docs_roundtrip."""
    return _docs_roundtrip(sf_dir, "compact")


def _ks_drift_sql() -> str:
    from ..stages.sampling import hash_bucket_sql

    return f"""
WITH e AS (
  SELECT event_type, value,
         CASE WHEN {hash_bucket_sql('event_id', 4)} < 50
              THEN 1 ELSE 0 END AS ia
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
    AND event_id IS NOT NULL),
agg AS (
  SELECT event_type, value,
         SUM(ia) AS a_cnt, COUNT(*) - SUM(ia) AS b_cnt
  FROM e GROUP BY 1, 2),
w AS (
  SELECT event_type, value,
         SUM(a_cnt) OVER (PARTITION BY event_type ORDER BY value) AS ca,
         SUM(b_cnt) OVER (PARTITION BY event_type ORDER BY value) AS cb,
         SUM(a_cnt) OVER (PARTITION BY event_type) AS na,
         SUM(b_cnt) OVER (PARTITION BY event_type) AS nb
  FROM agg)
SELECT event_type,
       CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       ROUND(MAX(ABS(CAST(ca AS DOUBLE) / na
                     - CAST(cb AS DOUBLE) / nb)), 6) AS ks
FROM w GROUP BY 1
"""


def q_ks_drift(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov drift detector per key (the
    distribution-shift gate between data splits): rows split A/B by the
    deterministic id hash (bit-exact HUGEINT mirror), then per
    event_type KS = max over distinct values of |ECDF_A - ECDF_B|.
    One keyed exchange; per-group kernel is vectorized (one argsort,
    run-boundary cumsums at distinct values).  Every arithmetic step is
    a single correctly-rounded division/compare, so the statistic
    matches the SQL window derivation exactly."""
    from ..stages.sampling import hash_bucket
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "value", "event_id"])
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("ks", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy(zero_copy_only=False)
        ids = group["event_id"].to_numpy(zero_copy_only=False)
        ia = (hash_bucket(ids, salt=4) < 50)
        na, nb = int(ia.sum()), int((~ia).sum())
        if na == 0 or nb == 0:
            ks = float("nan")
        else:
            order = np.argsort(v, kind="stable")
            vs, ias = v[order], ia[order]
            # ECDF evaluated at run ENDS of each distinct value
            last = np.empty(len(vs), dtype=bool)
            last[:-1] = vs[1:] != vs[:-1]
            last[-1] = True
            ca = np.cumsum(ias)[last].astype(np.float64)
            cb = np.cumsum(~ias)[last].astype(np.float64)
            ks = float(np.max(np.abs(ca / na - cb / nb)))
        return pa.table({
            "event_type": group["event_type"].slice(0, 1),
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "ks": pa.array([ks], pa.float64(),
                           mask=[not np.isfinite(ks)]),
        }, schema=out_schema)

    return _collect(sorted_group_map(ds, ["event_type"], _one,
                                     out_schema))


def _table_diff_sql() -> str:
    # table B derives deterministically from documents via the id hash:
    # h<5 removed, 5<=h<10 text rewritten, and a shifted-id copy of
    # h>=95 rows added — both engines build the same B
    from ..stages.sampling import hash_bucket_sql

    h = hash_bucket_sql("doc_id", 6)
    return f"""
WITH a AS (SELECT doc_id, text FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN {h} >= 5 AND {h} < 10
              THEN text || ' [edited]' ELSE text END AS text
  FROM documents WHERE {h} >= 5
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE {h} >= 95)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.text <> b.text
"""


def q_table_diff(sf_dir: str):
    """Table DIFF / reconciliation between two versions of a table —
    the audit op of incremental ingest (what changed between
    yesterday's crawl and today's?).  Scale topology: each side maps to
    slim (id, content-fingerprint, side-tag) rows — payloads never
    leave their blocks — then ONE id-keyed exchange classifies each id
    vectorized: only-A = removed, only-B = added, both-with-differing
    fingerprints = changed, identical = dropped.  The B version derives
    deterministically from the id hash on BOTH engines (the planting
    discipline); the oracle is a FULL OUTER JOIN with direct text
    comparison, so a fingerprint collision would fail the hash check —
    none occurs (blake2b-64).  ORACLE-CHECKED."""
    import ray.data as rd

    from ..kernels.hashing import hash_columns_blake2b
    from ..stages.sampling import hash_bucket
    from ..stages.sorted_groups import _runs, sorted_group_map

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _fp(batch: pa.Table, side: int) -> pa.Table:
        fp = hash_columns_blake2b(batch, ["text"]).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "fp": pa.array(fp, pa.int64()),
            "side": pa.array(np.full(len(batch), side, np.int8)),
        })

    def _side_a(batch: pa.Table) -> pa.Table:
        return _fp(batch, 0)

    def _side_b(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = hash_bucket(ids, salt=6)
        kept = batch.filter(pa.array(h >= 5))
        hk = hash_bucket(kept["doc_id"].to_numpy(zero_copy_only=False),
                         salt=6)
        edit = (hk >= 5) & (hk < 10)
        txt = pc.if_else(
            pa.array(edit),
            pc.binary_join_element_wise(kept["text"].combine_chunks(),
                                        " [edited]", ""),
            kept["text"].combine_chunks())
        kept = pa.table({"doc_id": kept["doc_id"], "text": txt})
        added = batch.filter(pa.array(h >= 95))
        added = pa.table({
            "doc_id": pc.add(added["doc_id"], 1_000_000),
            "text": added["text"]})
        return _fp(pa.concat_tables([kept, added]), 1)

    a = docs.map_batches(_side_a, batch_format="pyarrow",
                         zero_copy_batch=True)
    b = docs.map_batches(_side_b, batch_format="pyarrow",
                         zero_copy_batch=True)
    both = a.union(b)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("change", pa.string())])

    def _classify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("doc_id", "ascending"),
                             ("side", "ascending")])
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        fp = tbl["fp"].to_numpy(zero_copy_only=False)
        side = tbl["side"].to_numpy(zero_copy_only=False)
        first = np.empty(len(ids), dtype=bool)
        first[0] = True
        first[1:] = ids[1:] != ids[:-1]
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], len(ids))
        n = ends - starts
        one = n == 1
        # singleton rows: side 0 -> removed, side 1 -> added
        lab = np.where(side[starts] == 0, "removed", "added")
        # pairs with differing fingerprints -> changed
        pair = ~one
        changed = pair & (fp[starts] != fp[np.minimum(ends - 1,
                                                      starts + 1)])
        keep = one | changed
        lab = np.where(changed, "changed", lab)
        idx = pa.array(starts[keep], pa.int64())
        return pa.table({
            "doc_id": tbl["doc_id"].take(idx),
            "change": pa.array(lab[keep], pa.string()),
        }, schema=out_schema)

    return _collect(sorted_group_map(both, ["doc_id"], None, out_schema,
                                     block_fn=_classify))


def _edit_join_sql() -> str:
    # side B: for docs with h<30, a copy (id+1e6) whose (id%10)-th char
    # of the 24-char prefix is replaced by '#'; candidates share an
    # aligned 12-char half (pigeonhole: one substituted char touches at
    # most one half), verified at byte-levenshtein <= 3
    from ..stages.sampling import hash_bucket_sql

    h = hash_bucket_sql("doc_id", 8)
    return f"""
WITH a AS (
  SELECT doc_id, substr(text, 1, 24) AS s FROM documents),
b AS (
  SELECT doc_id + 1000000 AS doc_id,
         substr(s, 1, doc_id % 10) || '#'
           || substr(s, (doc_id % 10) + 2) AS s
  FROM a WHERE {h} < 30),
ca AS (SELECT doc_id, s, i, substr(s, i*12 + 1, 12) AS chunk
       FROM a, UNNEST([0, 1]) t(i)),
cb AS (SELECT doc_id, s, i, substr(s, i*12 + 1, 12) AS chunk
       FROM b, UNNEST([0, 1]) t(i))
SELECT DISTINCT ca.doc_id AS a_id, cb.doc_id AS b_id,
       levenshtein(ca.s, cb.s) AS dist
FROM ca JOIN cb ON ca.i = cb.i AND ca.chunk = cb.chunk
WHERE levenshtein(ca.s, cb.s) <= 3
"""


def q_edit_join(sf_dir: str):
    """Edit-distance SIMILARITY JOIN (PassJoin-style pigeonhole
    banding, Li et al. 2011): candidate pairs must share an aligned
    12-char half of the 24-char prefix — one substituted char touches
    at most one half, so the filter is LOSSLESS for the planted
    single-char mutations — then the candidate minority verifies with
    the byte-exact levenshtein DP (kernels/textkit.levenshtein ==
    DuckDB's byte-based levenshtein, 800-case fuzz-pinned).  Scale
    shape: 2 slim chunk rows per string, one chunk-keyed exchange
    emits bucket-local A x B pairs, strings attach via the gated
    broadcast for the verify.  Version B is planted from the id hash
    on both engines.  ORACLE-CHECKED including the distance values."""
    import ray.data as rd

    from ..kernels.textkit import levenshtein
    from ..stages.sampling import hash_bucket
    from ..stages.sorted_groups import _runs, sorted_group_map

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _sides(batch: pa.Table) -> pa.Table:
        s = pc.utf8_slice_codeunits(batch["text"].combine_chunks(),
                                    0, 24)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        a = pa.table({"doc_id": batch["doc_id"], "s": s,
                      "side": pa.array(np.zeros(len(ids), np.int8))})
        keep = hash_bucket(ids, salt=8) < 30
        ids_b = ids[keep]
        s_b = s.filter(pa.array(keep))
        p = (ids_b % 10).astype(np.int64)
        # Arrow slice kernels take scalar positions only: apply the
        # substitution per distinct position (10 vectorized passes)
        parts = []
        for pos in np.unique(p):
            m = p == pos
            mut = pc.utf8_replace_slice(
                s_b.filter(pa.array(m)),
                start=int(pos), stop=int(pos) + 1, replacement="#")
            parts.append(pa.table({
                "doc_id": pa.array(ids_b[m] + 1_000_000, pa.int64()),
                "s": mut,
                "side": pa.array(np.ones(int(m.sum()), np.int8)),
            }))
        return pa.concat_tables([a] + parts)

    sides = docs.map_batches(_sides, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _chunks(batch: pa.Table) -> pa.Table:
        outs = []
        for i in (0, 1):
            outs.append(pa.table({
                "i": pa.array(np.full(len(batch), i, np.int8)),
                "chunk": pc.utf8_slice_codeunits(
                    batch["s"].combine_chunks(), i * 12, i * 12 + 12),
                "doc_id": batch["doc_id"], "s": batch["s"],
                "side": batch["side"],
            }))
        return pa.concat_tables(outs)

    chunked = sides.map_batches(_chunks, batch_format="pyarrow",
                                zero_copy_batch=True)
    pair_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                             ("a_s", pa.string()), ("b_s", pa.string())])

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        na, nb = int((side == 0).sum()), int((side == 1).sum())
        if na == 0 or nb == 0:
            return pair_schema.empty_table()
        a = group.filter(pa.array(side == 0))
        b = group.filter(pa.array(side == 1))
        ia = pa.array(np.repeat(np.arange(na), nb).astype(np.int64))
        ib = pa.array(np.tile(np.arange(nb), na).astype(np.int64))
        return pa.table({
            "a_id": a["doc_id"].take(ia), "b_id": b["doc_id"].take(ib),
            "a_s": a["s"].take(ia), "b_s": b["s"].take(ib),
        }, schema=pair_schema)

    pairs = sorted_group_map(chunked, ["i", "chunk"], _bucket_pairs,
                             pair_schema, min_group_size=2)
    out_schema = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                            ("dist", pa.int64())])

    def _verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        # dedupe (a_id, b_id) within the batch, then DP-verify the
        # candidate minority (Python per pair — banded, never corpus)
        tbl = batch.sort_by([("a_id", "ascending"),
                             ("b_id", "ascending")])
        aid = tbl["a_id"].to_numpy(zero_copy_only=False)
        bid = tbl["b_id"].to_numpy(zero_copy_only=False)
        first = np.empty(len(aid), dtype=bool)
        first[0] = True
        first[1:] = (aid[1:] != aid[:-1]) | (bid[1:] != bid[:-1])
        keep = pa.array(np.nonzero(first)[0], pa.int64())
        tbl = tbl.take(keep)
        dists = [levenshtein(x, y) for x, y in
                 zip(tbl["a_s"].to_pylist(), tbl["b_s"].to_pylist())]
        d = np.array(dists, dtype=np.int64)
        ok = pa.array(d <= 3)
        return pa.table({
            "a_id": tbl["a_id"].filter(ok),
            "b_id": tbl["b_id"].filter(ok),
            "dist": pa.array(d[d <= 3]),
        }, schema=out_schema)

    # global pair dedup: one (a_id, b_id)-keyed exchange, verify inside
    verified = sorted_group_map(pairs, ["a_id", "b_id"], None,
                                out_schema, block_fn=_verify)
    return _collect(verified)


LEFT_JOIN_ORDERS_SQL = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(c.c_name) AS n_matched,
       COUNT(*) - COUNT(c.c_name) AS n_unmatched
FROM orders o
LEFT JOIN (SELECT c_custkey, c_name FROM customer
           WHERE c_acctbal > 5000.0) c
  ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def q_left_join_orders(sf_dir: str):
    """LEFT OUTER join through the broadcast lookup
    (stages/joins.attach_broadcast how='left'): every order keeps its
    row, unmatched custkeys null the dimension columns — the
    enrich-with-optional-dimension op.  The dimension (high-balance
    customers) broadcasts once; the fact table streams with no
    exchange; the aggregate distinguishes matched from unmatched via
    COUNT(col) vs COUNT(*).  ORACLE-CHECKED against SQL LEFT JOIN."""
    import ray.data as rd

    from ..stages.joins import attach_broadcast, collect_small
    from ..stages.sorted_groups import _runs, sorted_group_map

    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"]))
    rich = cust.filter(pc.greater(cust["c_acctbal"], 5000.0)).select(
        ["c_custkey", "c_name"])

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.rename_columns(["c_custkey", "o_orderpriority"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = attach_broadcast(orders, rich, "c_custkey", ["c_name"],
                              how="left")

    out_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n_orders", pa.int64()),
                            ("n_matched", pa.int64()),
                            ("n_unmatched", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderpriority": batch["o_orderpriority"],
            "matched": pc.cast(pc.is_valid(batch["c_name"]), pa.int64()),
        })
        g = t.group_by(["o_orderpriority"]).aggregate(
            [([], "count_all"), ("matched", "sum")])
        return g.rename_columns(["o_orderpriority", "n_orders",
                                 "n_matched"])

    partials = joined.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, _ = _runs(batch, ["o_orderpriority"])
        idx = pa.array(starts, pa.int64())
        n = np.add.reduceat(
            batch["n_orders"].to_numpy(zero_copy_only=False), starts)
        m = np.add.reduceat(
            batch["n_matched"].to_numpy(zero_copy_only=False), starts)
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"].take(idx),
            "n_orders": pa.array(n), "n_matched": pa.array(m),
            "n_unmatched": pa.array(n - m),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["o_orderpriority"],
                                     None, out_schema, block_fn=_merge))


def q_downsample_lttb(sf_dir: str):
    """Largest-Triangle-Three-Buckets downsampling per series
    (kernels/features.lttb, Steinarsson 2013): each key's points
    reduce to 24 visually-faithful points.  ROWS-ONLY by design — the
    left-anchor dependency chain is inherently sequential and has no
    SQL mirror; the kernel is pinned by a brute-force reference
    implementation in tests/test_features.py."""
    from ..kernels.features import lttb
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "event_id", "ts",
                                  "value"])
    out_schema = pa.schema([("event_type", pa.string()),
                            ("t_us", pa.int64()), ("v", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        t = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        v = group["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t))
        ts, vs = t[order], v[order]
        idx = lttb(ts.astype(np.float64), vs, 24)
        et = group["event_type"].slice(0, 1)[0].as_py()
        return pa.table({
            "event_type": pa.array([et] * len(idx), pa.string()),
            "t_us": pa.array(ts[idx], pa.int64()),
            "v": pa.array(np.round(vs[idx], 6)),
        }, schema=out_schema)

    return _collect_raw(sorted_group_map(ds, ["event_type"], _one,
                                         out_schema))


DOWNSAMPLE_MINMAX_SQL = """
WITH p AS (
  SELECT event_type, event_id, epoch_us(ts) AS t_us,
         CAST(value AS DOUBLE) AS v,
         (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_ts_us
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL),
r AS (
  SELECT event_type, bucket_ts_us, t_us, v,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts_us
                            ORDER BY v, t_us, event_id) AS rn_min,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts_us
                            ORDER BY v DESC, t_us, event_id) AS rn_max
  FROM p)
SELECT event_type, bucket_ts_us,
       CASE WHEN rn_min = 1 THEN 'min' ELSE 'max' END AS which,
       t_us, ROUND(v, 6) AS v
FROM r WHERE rn_min = 1 OR rn_max = 1
"""


def q_downsample_minmax(sf_dir: str):
    """MIN-MAX DOWNSAMPLING — the plot-grade reduction that preserves
    the envelope (spikes survive, unlike bucket averaging): per
    (series, day bucket) keep exactly the extreme points, deterministic
    (v, t, id) tie-break.  Per-key kernel: one lexsort, run boundaries
    give each bucket's min/max rows directly — no Python per bucket.
    A point that is BOTH extremes (single-point bucket) emits once as
    'min', matching the SQL CASE.  ORACLE-CHECKED row-level."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "event_id", "ts",
                                  "value"])
    out_schema = pa.schema([("event_type", pa.string()),
                            ("bucket_ts_us", pa.int64()),
                            ("which", pa.string()),
                            ("t_us", pa.int64()), ("v", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        t = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        v = group["value"].to_numpy(zero_copy_only=False)
        bucket = (t // _DAY_US) * _DAY_US
        order = np.lexsort((eid, t, v, bucket))
        b, tt, vv = bucket[order], t[order], v[order]
        first = np.empty(len(b), dtype=bool)
        first[0] = True
        first[1:] = b[1:] != b[:-1]
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], len(b))
        # min row = run start in (v, t, id) order; max row = the run's
        # LAST v, first (t, id) among its ties
        min_idx = starts
        vmax = vv[ends - 1]
        # first row of the max-value tie block: searchsorted within run
        max_idx = np.empty(len(starts), dtype=np.int64)
        for j, (s, e) in enumerate(zip(starts, ends)):
            max_idx[j] = s + np.searchsorted(vv[s:e], vmax[j], "left")
        et = group["event_type"].slice(0, 1)[0].as_py()
        both = max_idx == min_idx  # single-point / constant bucket
        keep_max = ~both
        idx_all = np.concatenate([min_idx, max_idx[keep_max]])
        which = ["min"] * len(min_idx) + ["max"] * int(keep_max.sum())
        return pa.table({
            "event_type": pa.array([et] * len(idx_all), pa.string()),
            "bucket_ts_us": pa.array(b[idx_all], pa.int64()),
            "which": pa.array(which, pa.string()),
            "t_us": pa.array(tt[idx_all], pa.int64()),
            "v": pa.array(round6_tie_robust(vv[idx_all]), pa.float64()),
        }, schema=out_schema)

    return _collect_raw(sorted_group_map(ds, ["event_type"], _one,
                                         out_schema))


def _ab_test_sql() -> str:
    from ..stages.sampling import hash_bucket_sql

    return f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN {hash_bucket_sql('user_id', 9)} < 50
              THEN 'a' ELSE 'b' END AS grp,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
                  THEN 1 ELSE 0 END) AS converted
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1),
s AS (
  SELECT SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN grp = 'a' THEN converted ELSE 0 END) AS c_a,
         SUM(CASE WHEN grp = 'b' THEN converted ELSE 0 END) AS c_b
  FROM u)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(c_a AS BIGINT) AS conv_a, CAST(c_b AS BIGINT) AS conv_b,
       ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM s
"""


def q_ab_test(sf_dir: str):
    """Two-proportion z-test (the experimentation-analytics readout):
    users split A/B by the bit-exact id hash (planting discipline),
    conversion = any >150-value 'purchase'; emits group sizes, conversions
    and the pooled z statistic.  Per-user conversion is a map-side
    MAX partial + one user-keyed exchange; the four global counters
    are integer-exact, and the z formula mirrors the oracle expression
    op-for-op (sqrt and divides are correctly rounded)."""
    from ..stages.sampling import hash_bucket
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "event_type", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        conv = pc.cast(pc.and_(pc.equal(batch["event_type"], "purchase"),
                               pc.greater(batch["value"], 150.0)),
                       pa.int64())
        t = pa.table({"user_id": batch["user_id"], "c": conv})
        g = t.group_by(["user_id"]).aggregate([("c", "max")])
        return g.rename_columns(["user_id", "converted"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    u_schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                          ("c_a", pa.int64()), ("c_b", pa.int64())])

    def _reduce(batch: pa.Table) -> pa.Table:
        """Whole user groups per batch: finish MAX per user, then the
        four counters for this batch's users."""
        if len(batch) == 0:
            return u_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        cv = tbl["converted"].to_numpy(zero_copy_only=False)
        first = np.empty(len(uid), dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(first)[0]
        conv = np.maximum.reduceat(cv, starts)
        grp_a = hash_bucket(uid[starts], salt=9) < 50
        return pa.table({
            "n_a": pa.array([int(grp_a.sum())], pa.int64()),
            "n_b": pa.array([int((~grp_a).sum())], pa.int64()),
            "c_a": pa.array([int(conv[grp_a].sum())], pa.int64()),
            "c_b": pa.array([int(conv[~grp_a].sum())], pa.int64()),
        }, schema=u_schema)

    counters = _collect_raw(sorted_group_map(
        partials, ["user_id"], None, u_schema, block_fn=_reduce))
    n_a = int(pc.sum(counters["n_a"]).as_py() or 0)
    n_b = int(pc.sum(counters["n_b"]).as_py() or 0)
    c_a = int(pc.sum(counters["c_a"]).as_py() or 0)
    c_b = int(pc.sum(counters["c_b"]).as_py() or 0)
    p = (c_a + c_b) / (n_a + n_b)
    import math

    z = (c_a / n_a - c_b / n_b) / math.sqrt(
        p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b))
    from ..kernels.rounding import round6_tie_robust

    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "conv_a": pa.array([c_a], pa.int64()),
        "conv_b": pa.array([c_b], pa.int64()),
        "z": pa.array(round6_tie_robust(np.array([z]))),
    })


JSON_PROPS_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
  FROM events
  WHERE event_type IS NOT NULL AND props IS NOT NULL
    AND regexp_extract(props, '"k":\\s*(\\d+)', 1) <> '')
SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS mean_k
FROM x GROUP BY 1
"""


def q_json_props(sf_dir: str):
    """Semi-structured property extraction (the web-scale JSON-scan op):
    pulls the integer field ``k`` out of the JSON ``props`` string with
    ONE vectorized Arrow regex kernel (`pc.extract_regex` — RE2, the
    same engine as DuckDB's regexp_extract, so match semantics mirror
    the oracle), then aggregates count/sum/mean per event_type.  No
    row-level json.loads anywhere: at crawl scale the field-extract
    regex IS how semi-structured scans are done.  Map-side partial
    (block group-by), one tiny driver merge (key-count scale)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("n", pa.int64()), ("sum_k", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["event_type"]),
                    pc.is_valid(batch["props"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return part_schema.empty_table()
        ext = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k})
        t = t.filter(pc.is_valid(t["k"]))
        g = t.group_by(["event_type"]).aggregate([("k", "count"),
                                                  ("k", "sum")])
        return g.rename_columns(["event_type", "n", "sum_k"])

    partials = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True))
    g = partials.group_by(["event_type"]).aggregate([("n", "sum"),
                                                     ("sum_k", "sum")])
    n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = g["sum_k_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    from ..kernels.rounding import round6_tie_robust

    return pa.table({
        "event_type": g["event_type"],
        "n": pa.array(n, pa.int64()),
        "sum_k": pa.array(s, pa.int64()),
        "mean_k": pa.array(round6_tie_robust(s.astype(np.float64) / n)),
    })


MARKOV_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
c AS (
  SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
"""


def q_markov_transitions(sf_dir: str):
    """First-order Markov transition matrix of user journeys (the
    sequence-model prep op): consecutive event-type pairs per user in
    total (ts, event_id) order, global pair counts and the row-
    normalized transition probability.  ONE user-keyed exchange
    (sorted_group_map); the block kernel is one lexsort + one shifted
    equality mask — pairs never cross user boundaries because blocks
    hold whole user groups — then a block-local Arrow group-count so
    only (from, to, n) partials (key-pair scale, ~|types|^2 rows per
    block) reach the driver merge.  p = n/total is one exact int
    division mirroring the oracle op-for-op."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    part_schema = pa.schema([("from_type", pa.string()),
                             ("to_type", pa.string()),
                             ("n", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return part_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("ts", "ascending"),
                             ("event_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        if not same.any():
            return part_schema.empty_table()
        t = pa.table({"from_type": pa.array(et[:-1][same], pa.string()),
                      "to_type": pa.array(et[1:][same], pa.string())})
        g = t.group_by(["from_type", "to_type"]).aggregate(
            [([], "count_all")])
        return pa.table({"from_type": g["from_type"],
                         "to_type": g["to_type"],
                         "n": g["count_all"]}, schema=part_schema)

    partials = _collect_raw(sorted_group_map(
        ds, ["user_id"], None, part_schema, block_fn=_block))
    g = partials.group_by(["from_type", "to_type"]).aggregate(
        [("n", "sum")])
    frm = g["from_type"].to_pylist()
    n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    totals = {}
    for f, c in zip(frm, n):
        totals[f] = totals.get(f, 0) + int(c)
    tot = np.array([totals[f] for f in frm], dtype=np.float64)
    from ..kernels.rounding import round6_tie_robust

    return pa.table({
        "from_type": g["from_type"],
        "to_type": g["to_type"],
        "n": pa.array(n, pa.int64()),
        "p": pa.array(round6_tie_robust(n.astype(np.float64) / tot)),
    })


COVISIT_PAIRS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_users
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def q_covisit_pairs(sf_dir: str):
    """Item-item co-occurrence counts (the recommender / co-visitation
    prep op): for every unordered event-type pair, how many users did
    BOTH.  Map-side (user, type) distinct shrinks the exchange to
    distinct pairs; one user-keyed exchange; the block kernel expands
    each user's sorted distinct-type run into i<j pairs FULLY
    vectorized by grouping runs into length classes (types are bounded,
    so there are at most |types| classes — each class is one reshape +
    one precomputed triu gather, no per-user Python).  Partials are
    pair-count scale; the driver merge is ~|types|^2 rows."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "event_type"])

    def _distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "event_type"]).aggregate([])

    pairs_in = ds.map_batches(_distinct, batch_format="pyarrow",
                              zero_copy_batch=True)
    part_schema = pa.schema([("type_a", pa.string()),
                             ("type_b", pa.string()),
                             ("n_users", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return part_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("event_type", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        # distinct again across merged map partials (same user from
        # several input blocks), still vectorized
        key_new = np.empty(len(uid), dtype=bool)
        key_new[0] = True
        key_new[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        uid, et = uid[key_new], et[key_new]
        first = np.empty(len(uid), dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(uid)))
        ta_parts, tb_parts = [], []
        for length in np.unique(lens):
            if length < 2:
                continue
            rs = starts[lens == length]
            idx = rs[:, None] + np.arange(length)
            ii, jj = np.triu_indices(length, 1)
            ta_parts.append(et[idx[:, ii].ravel()])
            tb_parts.append(et[idx[:, jj].ravel()])
        if not ta_parts:
            return part_schema.empty_table()
        t = pa.table({"type_a": pa.array(np.concatenate(ta_parts),
                                         pa.string()),
                      "type_b": pa.array(np.concatenate(tb_parts),
                                         pa.string())})
        g = t.group_by(["type_a", "type_b"]).aggregate(
            [([], "count_all")])
        return pa.table({"type_a": g["type_a"], "type_b": g["type_b"],
                         "n_users": g["count_all"]},
                        schema=part_schema)

    partials = _collect_raw(sorted_group_map(
        pairs_in, ["user_id"], None, part_schema, block_fn=_block))
    g = partials.group_by(["type_a", "type_b"]).aggregate(
        [("n_users", "sum")])
    return pa.table({"type_a": g["type_a"], "type_b": g["type_b"],
                     "n_users": g["n_users_sum"].cast(pa.int64())})


BENFORD_PRICES_SQL = """
WITH d AS (
  SELECT regexp_extract(CAST(l_extendedprice AS VARCHAR),
                        '([1-9])', 1) AS digit
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
c AS (SELECT digit, COUNT(*) AS n FROM d WHERE digit <> '' GROUP BY 1)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS freq
FROM c
"""


def q_benford_prices(sf_dir: str):
    """First-significant-digit distribution (Benford's-law data-quality
    profiling over a money column): the digit is the first [1-9] of the
    value's string form — DELIBERATELY format-robust, because DuckDB
    and Arrow disagree on double->string trailing '.0' and the
    scientific-notation threshold, but the first significant digit is
    invariant to both (verified: 1e+15 vs 1000000000000000.0, 0.000025
    vs 2.5e-05).  One vectorized cast + RE2 extract per block, map-side
    digit counts, 9-row driver merge.  No log10 anywhere — digit
    extraction stays transcendental-free per the rounding contract."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])
    part_schema = pa.schema([("digit", pa.string()), ("n", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        col = pc.filter(batch["l_extendedprice"],
                        pc.is_valid(batch["l_extendedprice"]))
        if len(col) == 0:
            return part_schema.empty_table()
        s = pc.cast(col, pa.string())
        d = pc.struct_field(pc.extract_regex(s, r"(?P<d>[1-9])"), "d")
        t = pa.table({"digit": d}).filter(pc.is_valid(d))
        g = t.group_by(["digit"]).aggregate([([], "count_all")])
        return pa.table({"digit": g["digit"],
                         "n": g["count_all"]}, schema=part_schema)

    partials = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True))
    g = partials.group_by(["digit"]).aggregate([("n", "sum")])
    n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    from ..kernels.rounding import round6_tie_robust

    return pa.table({
        "digit": g["digit"],
        "n": pa.array(n, pa.int64()),
        "freq": pa.array(round6_tie_robust(
            n.astype(np.float64) / float(n.sum()))),
    })


ANOMALY_MAD_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         ROUND(SUM(value) / COUNT(*), 6) AS m
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
r AS (
  SELECT event_type, day, m,
         MEDIAN(m) OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS rolmed
  FROM d),
md AS (SELECT event_type, MEDIAN(m) AS med FROM d GROUP BY 1),
mad AS (
  SELECT d.event_type, MEDIAN(ABS(d.m - md.med)) AS mad
  FROM d JOIN md USING (event_type) GROUP BY 1)
SELECT r.event_type, COUNT(*) AS n_days,
       CAST(SUM(CASE WHEN ABS(r.m - r.rolmed) > 3.0 * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       ROUND(MAX(ABS(r.m - r.rolmed)), 6) AS max_dev
FROM r JOIN mad ON r.event_type = mad.event_type
GROUP BY 1
"""


def q_anomaly_mad(sf_dir: str):
    """Robust telemetry anomaly detection per series: a day is
    anomalous when its mean deviates from the CENTERED 7-day rolling
    median by more than 3x the series' median-absolute-deviation.
    Daily means are map-side (sum,count) partials -> one series-keyed
    exchange; the per-series kernel is one sliding_window_view median
    for the interior plus the <=6 shrinking edge windows, then two
    medians for the MAD — all selection/interpolation arithmetic, no
    transcendentals.  PARITY DISCIPLINE: the daily mean is two-step
    6-dp rounded on BOTH sides BEFORE the median/threshold logic, so
    the engine's merge-order float noise cannot flip a point across
    the 3*MAD boundary (medians and compares on identical inputs are
    then bit-exact)."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day", "s", "n"])

    partials = ds.map_batches(_daily, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_days", pa.int64()),
                            ("n_anomalies", pa.int64()),
                            ("max_dev", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        # merge duplicate (type, day) partials from different blocks
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        kstarts = np.nonzero(key_new)[0]
        s = np.add.reduceat(s, kstarts)
        n = np.add.reduceat(n, kstarts)
        et = et[kstarts]
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        m_all = round6_tie_robust(s / n)
        rows = {"event_type": [], "n_days": [], "n_anomalies": [],
                "max_dev": []}
        for st, ln in zip(starts, lens):
            m = m_all[st:st + ln]
            if ln >= 7:
                from numpy.lib.stride_tricks import sliding_window_view
                interior = np.median(sliding_window_view(m, 7), axis=1)
                rolmed = np.empty(ln)
                rolmed[3:ln - 3] = interior
                for i in list(range(3)) + list(range(ln - 3, ln)):
                    rolmed[i] = np.median(m[max(0, i - 3):i + 4])
            else:
                rolmed = np.array([np.median(m[max(0, i - 3):i + 4])
                                   for i in range(ln)])
            mad = np.median(np.abs(m - np.median(m)))
            dev = np.abs(m - rolmed)
            rows["event_type"].append(et[st])
            rows["n_days"].append(int(ln))
            rows["n_anomalies"].append(int((dev > 3.0 * mad).sum()))
            rows["max_dev"].append(float(dev.max()))
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_days": pa.array(rows["n_days"], pa.int64()),
            "n_anomalies": pa.array(rows["n_anomalies"], pa.int64()),
            "max_dev": pa.array(round6_tie_robust(
                np.array(rows["max_dev"]))),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


WOW_CHANGE_SQL = """
WITH w AS (
  SELECT event_type, epoch_us(ts) // 604800000000 AS week,
         COUNT(*) AS n,
         CAST(FLOOR(ROUND(SUM(value), 6) * 1000000.0 + 0.5)
              AS BIGINT) AS sv
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
l AS (
  SELECT event_type, week, n, sv,
         LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS pn,
         LAG(sv) OVER (PARTITION BY event_type ORDER BY week) AS psv
  FROM w)
SELECT event_type, week, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n - pn AS DOUBLE) / pn, 6) AS n_wow,
       ROUND(CAST(sv - psv AS DOUBLE) / psv, 6) AS value_wow
FROM l WHERE pn IS NOT NULL
"""


def q_wow_change(sf_dir: str):
    """Week-over-week growth per series (the period-over-period KPI):
    weekly count and value-sum deltas as fractions of the prior week.
    Weekly sums are held in exact int64 micro-units (the integer-
    algebra discipline) so the delta NUMERATOR is exact and the single
    float division mirrors the oracle; counts are pure ints.  Map-side
    (type, week) partials, |types|·weeks driver merge, one shift per
    series."""
    from ..kernels.rounding import round6_tie_robust

    _WEEK_US = 604_800_000_000
    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("week", pa.int64()),
                             ("n", pa.int64()), ("s", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "week": pc.divide(t_us, _WEEK_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "week"]).aggregate(
            [("v", "count"), ("v", "sum")])
        return g.rename_columns(["event_type", "week", "n", "s"])

    parts = _collect_raw(ds.map_batches(_partial, batch_format="pyarrow",
                                        zero_copy_batch=True))
    g = parts.group_by(["event_type", "week"]).aggregate(
        [("n", "sum"), ("s", "sum")])
    df_et = np.array(g["event_type"].to_pylist(), dtype=object)
    wk = g["week"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    sv = np.floor(round6_tie_robust(
        g["s_sum"].to_numpy(zero_copy_only=False)) * 1_000_000.0
        + 0.5).astype(np.int64)
    order = np.lexsort((wk, df_et))
    df_et, wk, n, sv = df_et[order], wk[order], n[order], sv[order]
    same = np.empty(len(wk), dtype=bool)
    same[0] = False
    same[1:] = df_et[1:] == df_et[:-1]
    pn = np.roll(n, 1)
    psv = np.roll(sv, 1)
    return pa.table({
        "event_type": pa.array(df_et[same], pa.string()),
        "week": pa.array(wk[same], pa.int64()),
        "n": pa.array(n[same], pa.int64()),
        "n_wow": pa.array(round6_tie_robust(
            (n[same] - pn[same]).astype(np.float64) / pn[same])),
        "value_wow": pa.array(round6_tie_robust(
            (sv[same] - psv[same]).astype(np.float64) / psv[same])),
    })


LINES_PER_ORDER_HIST_SQL = """
WITH c AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem
  WHERE l_orderkey IS NOT NULL GROUP BY 1)
SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM c GROUP BY 1
"""


def q_lines_per_order_hist(sf_dir: str):
    """Distribution of group sizes (the aggregate-of-aggregate
    profiling op): how many orders have k line items.  First level is
    map-side per-order partial counts + ONE orderkey exchange; the
    second level collapses to |distinct sizes| rows inside the same
    exchange block (sizes are bounded), so the driver merge is
    histogram-scale."""
    import ray.data as rd

    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])

    def _partial(batch: pa.Table) -> pa.Table:
        col = pc.filter(batch["l_orderkey"],
                        pc.is_valid(batch["l_orderkey"]))
        t = pa.table({"l_orderkey": col})
        g = t.group_by(["l_orderkey"]).aggregate([([], "count_all")])
        return g.rename_columns(["l_orderkey", "n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    hist_schema = pa.schema([("n_lines", pa.int64()),
                             ("n_orders", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return hist_schema.empty_table()
        tbl = batch.sort_by([("l_orderkey", "ascending")])
        ok = tbl["l_orderkey"].to_numpy(zero_copy_only=False)
        cnt = tbl["n"].to_numpy(zero_copy_only=False)
        first = np.empty(len(ok), dtype=bool)
        first[0] = True
        first[1:] = ok[1:] != ok[:-1]
        sizes = np.add.reduceat(cnt, np.nonzero(first)[0])
        uniq, counts = np.unique(sizes, return_counts=True)
        return pa.table({"n_lines": pa.array(uniq, pa.int64()),
                         "n_orders": pa.array(counts, pa.int64())},
                        schema=hist_schema)

    parts = _collect_raw(sorted_group_map(
        partials, ["l_orderkey"], None, hist_schema, block_fn=_hist))
    g = parts.group_by(["n_lines"]).aggregate([("n_orders", "sum")])
    return pa.table({"n_lines": g["n_lines"].cast(pa.int64()),
                     "n_orders": g["n_orders_sum"].cast(pa.int64())})


THEILSEN_TREND_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         ROUND(SUM(value) / COUNT(*), 6) AS m
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
p AS (
  SELECT a.event_type,
         (b.m - a.m) / (b.day - a.day) AS slope
  FROM d a JOIN d b
    ON a.event_type = b.event_type AND a.day < b.day)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MEDIAN(slope), 6) AS theil_sen_slope
FROM p GROUP BY 1
"""


def q_theilsen_trend(sf_dir: str):
    """Theil-Sen robust trend per series: the MEDIAN of all pairwise
    day-slopes of the daily-mean series — the estimator that shrugs off
    the outlier days that break least-squares.  Daily means pre-round
    to 6dp on BOTH sides, so every pairwise slope (one subtract, one
    exact int divide) is the identical double and the median is
    selection-exact.  Pair enumeration is day-count² per series
    (bounded by the time window) and fully vectorized via triu
    indices inside the series exchange."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day", "s", "n"])

    partials = ds.map_batches(_daily, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_pairs", pa.int64()),
                            ("theil_sen_slope", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        ks = np.nonzero(key_new)[0]
        s, n = np.add.reduceat(s, ks), np.add.reduceat(n, ks)
        et, day = et[ks], day[ks]
        m = round6_tie_robust(s / n)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows = {"event_type": [], "n_pairs": [], "slope": []}
        for st, ln in zip(starts, lens):
            if ln < 2:
                continue
            ii, jj = np.triu_indices(ln, 1)
            mm, dd = m[st:st + ln], day[st:st + ln]
            slopes = (mm[jj] - mm[ii]) / (dd[jj] - dd[ii])
            rows["event_type"].append(et[st])
            rows["n_pairs"].append(len(slopes))
            rows["slope"].append(float(np.median(slopes)))
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
            "theil_sen_slope": pa.array(round6_tie_robust(
                np.array(rows["slope"], dtype=np.float64))),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


INTEGRITY_AUDIT_SQL = """
SELECT 'lineitem_without_order' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM lineitem l
WHERE l.l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'order_without_customer' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'order_without_lineitem' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM orders o
WHERE o.o_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey)
"""


def q_integrity_audit(sf_dir: str):
    """Referential-integrity audit across three relationships (the
    data-quality gate a warehouse load runs): orphaned lineitems,
    orders without customers, childless orders.  Each check is a
    broadcast anti-probe: the KEY SIDE collapses to distinct int64 keys
    (semi-join reduction map-side), broadcasts under the collect_small
    gate, and the fact side counts misses in one streaming pass — the
    documented Dataset.join switch applies above the gate.  Output is
    3 rows."""
    import ray.data as rd

    from ..stages.joins import collect_small

    def _distinct_keys(path: str, col: str) -> np.ndarray:
        t = collect_small(rd.read_parquet(path, columns=[col]))
        keys = t[col].to_numpy(zero_copy_only=False)
        return np.unique(keys[~pd_isnull_safe(keys)])

    def pd_isnull_safe(a):
        try:
            return np.isnan(a)
        except TypeError:
            return np.zeros(len(a), dtype=bool)

    def _count_misses(path: str, col: str, keys: np.ndarray) -> int:
        ds = rd.read_parquet(f"{sf_dir}/{path}", columns=[col])

        def _miss(batch: pa.Table) -> pa.Table:
            v = pc.filter(batch[col], pc.is_valid(batch[col]))
            a = v.to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, a)
            pos_c = np.minimum(pos, len(keys) - 1)
            miss = int((keys[pos_c] != a).sum()) if len(keys) \
                else len(a)
            return pa.table({"miss": pa.array([miss], pa.int64())})

        parts = _collect_raw(ds.map_batches(_miss,
                                            batch_format="pyarrow",
                                            zero_copy_batch=True))
        return int(parts["miss"].to_numpy().sum())

    order_keys = _distinct_keys(f"{sf_dir}/orders.parquet",
                                "o_orderkey")
    cust_keys = _distinct_keys(f"{sf_dir}/customer.parquet",
                               "c_custkey")
    li_keys = _distinct_keys(f"{sf_dir}/lineitem.parquet",
                             "l_orderkey")
    return pa.table({
        "relation": pa.array(["lineitem_without_order",
                              "order_without_customer",
                              "order_without_lineitem"], pa.string()),
        "n_orphans": pa.array([
            _count_misses("lineitem.parquet", "l_orderkey",
                          order_keys),
            _count_misses("orders.parquet", "o_custkey", cust_keys),
            _count_misses("orders.parquet", "o_orderkey", li_keys),
        ], pa.int64()),
    })


ROLLING_CORR_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000000.0 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    AND event_type IN ('click', 'purchase')
  GROUP BY 1, 2),
j AS (
  SELECT a.day, a.mi AS x, b.mi AS y
  FROM d a JOIN d b ON a.day = b.day
  WHERE a.event_type = 'click' AND b.event_type = 'purchase'),
w AS (
  SELECT day,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         SUM(CAST(x AS HUGEINT)) OVER win AS sx,
         SUM(CAST(y AS HUGEINT)) OVER win AS sy,
         SUM(CAST(x AS HUGEINT) * x) OVER win AS sxx,
         SUM(CAST(y AS HUGEINT) * y) OVER win AS syy,
         SUM(CAST(x AS HUGEINT) * y) OVER win AS sxy
  FROM j
  WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
                 AND CURRENT ROW))
SELECT day,
       ROUND(CAST(14 * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(14 * sxx - sx * sx AS DOUBLE)
                    * CAST(14 * syy - sy * sy AS DOUBLE)), 6)
         AS corr14
FROM w WHERE rn >= 14
"""


def q_rolling_corr(sf_dir: str):
    """Trailing 14-day rolling correlation between two daily series
    (click vs purchase means) — the co-movement monitor.  PARITY BY
    INTEGER ALGEBRA (the changepoint discipline, extended to second
    moments): daily means round to int64 micro-units, every window
    moment (Sx, Sy, Sxx, Syy, Sxy) is an EXACT integer (arbitrary-
    precision on the engine side, HUGEINT in the oracle — the products
    overflow int64 by design), and Pearson's r emerges from ONE
    float conversion + sqrt + divide in the same op order both sides.
    The distributed part is the daily-mean exchange; the joined series
    is day-count scale (bounded by the time window), so the window
    loop runs on exact Python ints driver-side."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        if len(batch) == 0:
            return part_schema.empty_table()
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day", "s", "n"])

    daily_schema = pa.schema([("event_type", pa.string()),
                              ("day", pa.int64()),
                              ("mi", pa.int64())])

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return daily_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        ks = np.nonzero(key_new)[0]
        s, n = np.add.reduceat(s, ks), np.add.reduceat(n, ks)
        mi = np.floor(round6_tie_robust(s / n) * 1_000_000.0
                      + 0.5).astype(np.int64)
        return pa.table({"event_type": pa.array(et[ks], pa.string()),
                         "day": pa.array(day[ks], pa.int64()),
                         "mi": pa.array(mi, pa.int64())},
                        schema=daily_schema)

    daily = _collect_raw(sorted_group_map(
        ds.map_batches(_daily, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "day"], None, daily_schema, block_fn=_merge))
    et = daily["event_type"].to_pylist()
    day = daily["day"].to_numpy(zero_copy_only=False)
    mi = daily["mi"].to_numpy(zero_copy_only=False)
    series = {}
    for t_ in ("click", "purchase"):
        mask = np.array([e == t_ for e in et])
        o = np.argsort(day[mask])
        series[t_] = dict(zip(day[mask][o].tolist(),
                              mi[mask][o].tolist()))
    days = sorted(set(series["click"]) & set(series["purchase"]))
    x = [int(series["click"][d]) for d in days]
    y = [int(series["purchase"][d]) for d in days]
    out_day, out_corr = [], []
    for i in range(13, len(days)):  # exact Python-int window moments
        xs, ys = x[i - 13:i + 1], y[i - 13:i + 1]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = 14 * sxy - sx * sy
        d1, d2 = 14 * sxx - sx * sx, 14 * syy - sy * sy
        out_day.append(days[i])
        out_corr.append(float(num)
                        / np.sqrt(float(d1) * float(d2)))
    return pa.table({
        "day": pa.array(out_day, pa.int64()),
        "corr14": pa.array(round6_tie_robust(
            np.array(out_corr, dtype=np.float64))),
    })


SESSION_PATH_TOPK_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
l AS (
  SELECT *, CASE WHEN LAG(t_us) OVER w IS NULL
                   OR t_us - LAG(t_us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
s0 AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id
                           ORDER BY t_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM l),
s AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                               ORDER BY t_us, event_id) AS rn
  FROM s0),
p AS (
  SELECT user_id, sid,
         STRING_AGG(event_type, '>' ORDER BY t_us, event_id) AS path
  FROM s WHERE rn <= 3 GROUP BY 1, 2),
c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1)
SELECT path, n_sessions FROM (
  SELECT path, n_sessions,
         ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rk
  FROM c)
WHERE rk <= 10
"""


def q_session_path_topk(sf_dir: str):
    """Top session OPENING PATHS (sequence-pattern mining): sessions
    split at 30-minute gaps, each keyed by its first up-to-three event
    types joined with '>'; the 10 most common openings.  One user-keyed
    exchange; paths build VECTORIZED by session-length class (len-1/2/
    3+ masks, elementwise object-string concatenation — no per-session
    Python), partial counts per block are path-cardinality scale
    (≤ |types|³), global top-k at the driver."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    part_schema = pa.schema([("path", pa.string()),
                             ("n_sessions", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("ts", "ascending"),
                             ("event_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        t_us = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (uid[1:] != uid[:-1]) | (t_us[1:] - t_us[:-1]
                                           > 1_800_000_000)
        starts = np.nonzero(brk)[0]
        lens = np.diff(np.append(starts, n))
        paths = np.empty(len(starts), dtype=object)
        m1 = lens == 1
        paths[m1] = et[starts[m1]]
        m2 = lens == 2
        paths[m2] = (et[starts[m2]] + ">") + et[starts[m2] + 1]
        m3 = lens >= 3
        paths[m3] = ((et[starts[m3]] + ">") + et[starts[m3] + 1]
                     + ">") + et[starts[m3] + 2]
        t = pa.table({"path": pa.array(paths, pa.string())})
        g = t.group_by(["path"]).aggregate([([], "count_all")])
        return pa.table({"path": g["path"],
                         "n_sessions": g["count_all"]},
                        schema=part_schema)

    parts = _collect_raw(sorted_group_map(
        ds, ["user_id"], None, part_schema, block_fn=_block))
    g = parts.group_by(["path"]).aggregate([("n_sessions", "sum")])
    path = np.array(g["path"].to_pylist(), dtype=object)
    cnt = g["n_sessions_sum"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    order = np.lexsort((path, -cnt))[:10]
    return pa.table({
        "path": pa.array(path[order], pa.string()),
        "n_sessions": pa.array(cnt[order], pa.int64()),
    })


DEDUP_KEEP_BEST_SQL = """
WITH r AS (
  SELECT lang,
         ROW_NUMBER() OVER (PARTITION BY text
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents WHERE text IS NOT NULL)
SELECT lang,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM r GROUP BY 1
"""


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware exact dedup (keep-BEST, not keep-first): within
    each exact-duplicate text group the survivor is the (max n_chars,
    min doc_id) row — the policy real corpus dedup uses when copies
    differ in provenance quality.  Same slim 16-byte fingerprint
    exchange as exact_dedup; the per-group argmax is one lexsort +
    run-first mask; output is per-lang kept/dropped counters."""
    import ray.data as rd

    from ..stages.dedup import add_fingerprint
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text", "n_chars"])

    def _fp(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["text"]))
        out = add_fingerprint(batch, "doc_id", "text")
        return pa.table({"fp": out["fp"], "doc_id": batch["doc_id"],
                         "lang": batch["lang"],
                         "n_chars": batch["n_chars"]})

    keyed = ds.map_batches(_fp, batch_format="pyarrow",
                           zero_copy_batch=True)
    part_schema = pa.schema([("lang", pa.string()),
                             ("n_kept", pa.int64()),
                             ("n_dropped", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        fp = batch["fp"].to_numpy(zero_copy_only=False)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, fp))
        fps = fp[order]
        first = np.empty(len(fps), dtype=bool)
        first[0] = True
        first[1:] = fps[1:] != fps[:-1]
        kept = np.empty(len(fps), dtype=bool)
        kept[order] = first
        t = pa.table({"lang": batch["lang"],
                      "k": pa.array(kept.astype(np.int64)),
                      "d": pa.array((~kept).astype(np.int64))})
        g = t.group_by(["lang"]).aggregate([("k", "sum"), ("d", "sum")])
        return g.rename_columns(["lang", "n_kept",
                                 "n_dropped"]).cast(part_schema)

    parts = _collect_raw(sorted_group_map(
        keyed, ["fp"], None, part_schema, block_fn=_block))
    g = parts.group_by(["lang"]).aggregate([("n_kept", "sum"),
                                            ("n_dropped", "sum")])
    return g.rename_columns(["lang", "n_kept",
                             "n_dropped"]).cast(part_schema)


CHI2_INDEPENDENCE_SQL = """
WITH d AS (
  SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
o AS (SELECT event_type, dow, COUNT(*) AS obs FROM d GROUP BY 1, 2),
m AS (
  SELECT event_type, dow, obs,
         SUM(obs) OVER (PARTITION BY event_type) AS row_n,
         SUM(obs) OVER (PARTITION BY dow) AS col_n,
         SUM(obs) OVER () AS n
  FROM o)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT event_type) - 1)
            * (COUNT(DISTINCT dow) - 1) AS BIGINT) AS dof,
       ROUND(SUM(POWER(obs - CAST(row_n AS DOUBLE) * col_n / n, 2)
                 / (CAST(row_n AS DOUBLE) * col_n / n)), 6) AS chi2
FROM m
"""


def q_chi2_independence(sf_dir: str):
    """Chi-squared independence test between event type and weekday
    (the contingency-table readout behind every segmentation sanity
    check).  Map-side (type, dow) integer counts, one tiny driver
    merge (|types|·7 cells), then the statistic over the full
    contingency table.  Expected counts row_n·col_n/n use only exact
    int->double conversions, one multiply and one divide in the SAME
    op order as the oracle; POWER(x, 2) is x*x on the engine side
    (squaring is exact either way).  Cell-count scale everywhere —
    never row scale."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("dow", pa.int64()), ("obs", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dow = (t_us // _DAY_US + 4) % 7
        t = pa.table({"event_type": batch["event_type"],
                      "dow": pa.array(dow, pa.int64())})
        g = t.group_by(["event_type", "dow"]).aggregate(
            [([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "dow": g["dow"], "obs": g["count_all"]},
                        schema=part_schema)

    parts = _collect_raw(ds.map_batches(_partial, batch_format="pyarrow",
                                        zero_copy_batch=True))
    g = parts.group_by(["event_type", "dow"]).aggregate([("obs", "sum")])
    et = g["event_type"].to_pylist()
    dow = g["dow"].to_numpy(zero_copy_only=False).astype(np.int64)
    obs = g["obs_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    row_n, col_n = {}, {}
    for t_, d_, o_ in zip(et, dow, obs):
        row_n[t_] = row_n.get(t_, 0) + int(o_)
        col_n[int(d_)] = col_n.get(int(d_), 0) + int(o_)
    n = float(obs.sum())
    rn = np.array([row_n[t_] for t_ in et], dtype=np.float64)
    cn = np.array([col_n[int(d_)] for d_ in dow], dtype=np.float64)
    exp = rn * cn / n
    dev = obs.astype(np.float64) - exp
    chi2 = float(np.sum(dev * dev / exp))
    return pa.table({
        "n_cells": pa.array([len(obs)], pa.int64()),
        "dof": pa.array([(len(row_n) - 1) * (len(col_n) - 1)],
                        pa.int64()),
        "chi2": pa.array(round6_tie_robust(np.array([chi2]))),
    })


TIME_TO_CONVERT_SQL = """
WITH f AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           AS t_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_purchase
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
  GROUP BY 1),
d AS (
  SELECT CAST(t_purchase - t_signup AS DOUBLE) / 86400000000.0
           AS delay_days
  FROM f
  WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
    AND t_purchase >= t_signup)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(QUANTILE_CONT(delay_days, 0.50), 6) AS p50_days,
       ROUND(QUANTILE_CONT(delay_days, 0.90), 6) AS p90_days,
       ROUND(MAX(delay_days), 6) AS max_days
FROM d
"""


def q_time_to_convert(sf_dir: str):
    """Time-to-convert distribution (the activation-latency funnel
    metric): per user, first 'signup' to first subsequent 'purchase',
    exact delay percentiles over the converted population.  Map-side
    per-user conditional-MIN partials (two int64 mins per user per
    block — the exchange carries user-count-scale slim rows, never
    events), one user-keyed merge, delays to the driver at CONVERTED-
    user scale for the exact quantile (np.percentile == QUANTILE_CONT,
    the pinned parity; the sketch swap is the documented crawl-scale
    path).  µs -> days by one exact division."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_type"])
    _I64MAX = np.int64(np.iinfo(np.int64).max)
    part_schema = pa.schema([("user_id", pa.int64()),
                             ("t_signup", pa.int64()),
                             ("t_purchase", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["signup", "purchase"]))
        batch = batch.filter(keep)
        if len(batch) == 0:
            return part_schema.empty_table()
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        sign = np.where(et == "signup", t_us, _I64MAX)
        purch = np.where(et == "purchase", t_us, _I64MAX)
        t = pa.table({"user_id": batch["user_id"],
                      "s": pa.array(sign, pa.int64()),
                      "p": pa.array(purch, pa.int64())})
        g = t.group_by(["user_id"]).aggregate([("s", "min"),
                                               ("p", "min")])
        return g.rename_columns(["user_id", "t_signup", "t_purchase"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    delay_schema = pa.schema([("delay_days", pa.float64())])

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return delay_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        s = tbl["t_signup"].to_numpy(zero_copy_only=False)
        p = tbl["t_purchase"].to_numpy(zero_copy_only=False)
        first = np.empty(len(uid), dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(first)[0]
        s = np.minimum.reduceat(s, starts)
        p = np.minimum.reduceat(p, starts)
        ok = (s != _I64MAX) & (p != _I64MAX) & (p >= s)
        d = (p[ok] - s[ok]).astype(np.float64) / 86_400_000_000.0
        return pa.table({"delay_days": pa.array(d)},
                        schema=delay_schema)

    delays = _collect_raw(sorted_group_map(
        partials, ["user_id"], None, delay_schema, block_fn=_merge))
    d = delays["delay_days"].to_numpy(zero_copy_only=False)
    q50, q90 = np.percentile(d, [50.0, 90.0])
    return pa.table({
        "n_converted": pa.array([len(d)], pa.int64()),
        "p50_days": pa.array(round6_tie_robust(np.array([q50]))),
        "p90_days": pa.array(round6_tie_robust(np.array([q90]))),
        "max_days": pa.array(round6_tie_robust(
            np.array([float(d.max())]))),
    })


GAP_QUANTILES_SQL = """
WITH s AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
l AS (
  SELECT event_type,
         CAST(t_us - LAG(t_us) OVER (PARTITION BY user_id, event_type
                                     ORDER BY t_us, event_id)
              AS DOUBLE) / 1000000.0 AS gap_s
  FROM s),
g AS (SELECT event_type, gap_s FROM l WHERE gap_s IS NOT NULL)
SELECT event_type, COUNT(*) AS n_gaps,
       ROUND(QUANTILE_CONT(gap_s, 0.50), 6) AS p50_s,
       ROUND(QUANTILE_CONT(gap_s, 0.90), 6) AS p90_s,
       ROUND(QUANTILE_CONT(gap_s, 0.99), 6) AS p99_s
FROM g GROUP BY 1
"""


def q_gap_quantiles(sf_dir: str):
    """Inter-arrival latency percentiles per series (the p50/p90/p99
    readout every telemetry pipeline publishes): gaps between a user's
    consecutive events OF THE SAME TYPE, exact linear-interpolation
    quantiles per type.  Two exchanges: a user-keyed one computes the
    gaps (lexsort + one diff, pairs never cross (user, type) runs),
    then a type-keyed one holds each type's gap population for the
    exact quantile (np.percentile == QUANTILE_CONT, the pinned
    parity); at crawl scale the second exchange's exact kernel swaps
    for the mergeable quantile sketch (kernels/sketch) — same query
    shape, documented trade.  Gaps convert µs -> s by one exact
    division so the 6-dp round keeps full precision."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    gap_schema = pa.schema([("event_type", pa.string()),
                            ("gap_s", pa.float64())])

    def _gaps(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return gap_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("event_type", "ascending"),
                             ("ts", "ascending"),
                             ("event_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        t_us = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        if not same.any():
            return gap_schema.empty_table()
        gaps = (t_us[1:] - t_us[:-1])[same].astype(np.float64) \
            / 1_000_000.0
        return pa.table({"event_type": pa.array(et[1:][same],
                                                pa.string()),
                         "gap_s": pa.array(gaps)}, schema=gap_schema)

    gaps = sorted_group_map(ds, ["user_id"], None, gap_schema,
                            block_fn=_gaps)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_gaps", pa.int64()),
                            ("p50_s", pa.float64()),
                            ("p90_s", pa.float64()),
                            ("p99_s", pa.float64())])

    def _quant(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        g = tbl["gap_s"].to_numpy(zero_copy_only=False)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows = {"event_type": [], "n_gaps": [], "p50_s": [],
                "p90_s": [], "p99_s": []}
        for st, ln in zip(starts, lens):
            q50, q90, q99 = np.percentile(g[st:st + ln],
                                          [50.0, 90.0, 99.0])
            rows["event_type"].append(et[st])
            rows["n_gaps"].append(int(ln))
            rows["p50_s"].append(q50)
            rows["p90_s"].append(q90)
            rows["p99_s"].append(q99)
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_gaps": pa.array(rows["n_gaps"], pa.int64()),
            "p50_s": pa.array(round6_tie_robust(
                np.array(rows["p50_s"]))),
            "p90_s": pa.array(round6_tie_robust(
                np.array(rows["p90_s"]))),
            "p99_s": pa.array(round6_tie_robust(
                np.array(rows["p99_s"]))),
        }, schema=out_schema)

    return _collect(sorted_group_map(gaps, ["event_type"], None,
                                     out_schema, block_fn=_quant))


PARETO_SHARE_SQL = """
WITH c AS (
  SELECT o_custkey AS custkey,
         CAST(FLOOR(ROUND(SUM(o_totalprice), 6) * 1000000.0 + 0.5)
              AS BIGINT) AS r
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1),
r AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r DESC, custkey) AS rn,
         COUNT(*) OVER () AS n, SUM(r) OVER () AS total
  FROM c)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(MAX(n) // 10 AS BIGINT) AS top_k,
       ROUND(CAST(SUM(CASE WHEN rn <= n // 10 THEN r ELSE 0 END)
                  AS DOUBLE)
             / CAST(MAX(total) AS DOUBLE), 6) AS top_decile_share
FROM r
"""


def q_pareto_share(sf_dir: str):
    """Revenue concentration (the Pareto/80-20 readout): the share of
    total revenue held by the top decile of customers.  INTEGER-EXACT
    end to end: per-customer revenue rounds to int64 micro-units, the
    top-decile boundary is an exact rank (distributed sort over
    (−r, custkey) + prefix-scan of the revenue VALUES — the same
    prefix_sum that ranks also accumulates the running revenue, so the
    top-k sum is read off ONE boundary row), and the share is a single
    exact division at the end.  No customer-scale driver collect."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.scan import prefix_sum
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    part_schema = pa.schema([("custkey", pa.int64()),
                             ("s", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["o_custkey"]),
                    pc.is_valid(batch["o_totalprice"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return part_schema.empty_table()
        t = pa.table({"custkey": batch["o_custkey"],
                      "price": batch["o_totalprice"]})
        g = t.group_by(["custkey"]).aggregate([("price", "sum")])
        return g.rename_columns(["custkey", "s"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    cust_schema = pa.schema([("custkey", pa.int64()),
                             ("r", pa.int64()),
                             ("neg_r", pa.int64())])

    def _cust(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return cust_schema.empty_table()
        tbl = batch.sort_by([("custkey", "ascending")])
        ck = tbl["custkey"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        first = np.empty(len(ck), dtype=bool)
        first[0] = True
        first[1:] = ck[1:] != ck[:-1]
        starts = np.nonzero(first)[0]
        r = np.floor(round6_tie_robust(np.add.reduceat(s, starts))
                     * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({"custkey": pa.array(ck[starts], pa.int64()),
                         "r": pa.array(r, pa.int64()),
                         "neg_r": pa.array(-r, pa.int64())},
                        schema=cust_schema)

    cust = sorted_group_map(partials, ["custkey"], None, cust_schema,
                            block_fn=_cust).materialize()
    n = cust.count()
    top_k = n // 10
    totals = _collect_raw(cust.map_batches(
        lambda t: pa.table({"tot": pa.array(
            [int(t["r"].to_numpy(zero_copy_only=False).sum())],
            pa.int64())}),
        batch_format="pyarrow"))
    total = int(totals["tot"].to_numpy().sum())

    # two prefix scans over the SAME (−r, custkey) order: unit weights
    # give the rank, revenue weights give the running sum; the single
    # boundary row (rank == top_k) carries cum_r (exclusive) + its own
    # r = the exact top-decile revenue
    ones = cust.map_batches(
        lambda t: t.append_column("one", pa.array(
            np.ones(len(t), np.int64))),
        batch_format="pyarrow")
    ranked = prefix_sum(ones, ["neg_r", "custkey"], "one",
                        out_col="rk")
    brow = _collect_raw(ranked.map_batches(
        lambda t: t.filter(pc.equal(pc.add(t["rk"], 1), top_k))
        .select(["custkey"]),
        batch_format="pyarrow"))
    bck = int(brow["custkey"][0].as_py())
    rev_ranked = prefix_sum(ones, ["neg_r", "custkey"], "r",
                            out_col="cum_r")
    rrow = _collect_raw(rev_ranked.map_batches(
        lambda t: t.filter(pc.equal(t["custkey"], bck))
        .select(["cum_r", "r"]),
        batch_format="pyarrow"))
    top_sum = int(rrow["cum_r"][0].as_py()) + int(rrow["r"][0].as_py())
    share = float(top_sum) / float(total)
    return pa.table({
        "n_customers": pa.array([n], pa.int64()),
        "top_k": pa.array([top_k], pa.int64()),
        "top_decile_share": pa.array(round6_tie_robust(
            np.array([share]))),
    })


RANGE_SPLITS_SQL = """
WITH v AS (
  SELECT value, event_id FROM events
  WHERE value IS NOT NULL AND event_id IS NOT NULL),
r AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
         COUNT(*) OVER () AS n
  FROM v)
SELECT i AS split_idx, value AS split_value
FROM r, UNNEST(range(1, 8)) t(i)
WHERE rn = (i * n) // 8
"""


def q_range_splits(sf_dir: str):
    """Range-partition planning (the infrastructure op behind every
    balanced distributed sort): the 7 split values that divide the
    value column into 8 equal-count ranges — exact rank boundaries,
    not samples.  One distributed sort + prefix-scan rank
    (stages/scan.prefix_sum), then ONLY the boundary rows (O(buckets))
    are collected; boundary ranks are floor(i*n/8) in exact integer
    arithmetic on both sides."""
    from ..stages.scan import prefix_sum

    ds = _events_nonnull(sf_dir, ["value", "event_id"])

    def _one(batch: pa.Table) -> pa.Table:
        return pa.table({
            "value": batch["value"], "event_id": batch["event_id"],
            "one": pa.array(np.ones(len(batch), np.int64)),
        })

    keyed = ds.map_batches(_one, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    n = keyed.count()
    targets = [(i * n) // 8 for i in range(1, 8)]
    t_idx = {t: i for i, t in enumerate(targets, start=1)}
    ranked = prefix_sum(keyed, ["value", "event_id"], "one",
                        out_col="rk")

    def _sel(batch: pa.Table) -> pa.Table:
        rn = pc.add(batch["rk"], 1)
        keep = pc.is_in(rn, value_set=pa.array(targets, pa.int64()))
        t = batch.filter(keep)
        rn_k = pc.add(t["rk"], 1).to_pylist()
        return pa.table({
            "split_idx": pa.array([t_idx[r] for r in rn_k], pa.int64()),
            "split_value": t["value"],
        })

    return _collect(ranked.map_batches(_sel, batch_format="pyarrow"))


SNAPSHOT_FFILL_SQL = """
WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         epoch_us(ts) AS t_us, event_id, value
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND value IS NOT NULL),
d AS (
  SELECT event_type, day,
         FIRST(value ORDER BY t_us DESC, event_id DESC) AS close
  FROM e GROUP BY 1, 2),
spine AS (
  SELECT event_type, UNNEST(range(mn, mx + 1)) AS day
  FROM (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
        FROM d GROUP BY 1)),
j AS (
  SELECT s.event_type, s.day, d.close,
         d.close IS NULL AS filled
  FROM spine s LEFT JOIN d ON s.event_type = d.event_type
                           AND s.day = d.day)
SELECT event_type, day,
       ROUND(LAST_VALUE(close IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY day), 6) AS close,
       filled
FROM j
"""


def q_snapshot_ffill(sf_dir: str):
    """Daily snapshot densification with forward-fill (how state tables
    are built from event streams): each series' daily CLOSE (last value
    of the day in total (ts, event_id) order) on a dense day spine from
    the series' first to last active day, gaps carrying the previous
    close (flagged).  Unlike gapfill (which zero-fills counts), this is
    the last-observation-carried-forward semantic.  Map-side per-day
    candidate pruning (only each block's last row per (type, day)
    survives), one series-keyed exchange, then a vectorized
    searchsorted fill per series."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "event_id",
                                  "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()),
                             ("t_us", pa.int64()),
                             ("event_id", pa.int64()),
                             ("value", pa.float64())])

    def _day_last(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "t_us": t_us,
                      "event_id": batch["event_id"],
                      "value": batch["value"]})
        tbl = t.sort_by([("event_type", "ascending"),
                         ("day", "ascending"), ("t_us", "ascending"),
                         ("event_id", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        last = np.empty(len(et), dtype=bool)
        last[-1] = True
        last[:-1] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        return tbl.filter(pa.array(last)).cast(part_schema)

    partials = ds.map_batches(_day_last, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("day", pa.int64()),
                            ("close", pa.float64()),
                            ("filled", pa.bool_())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending"), ("t_us", "ascending"),
                             ("event_id", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        v = tbl["value"].to_numpy(zero_copy_only=False)
        last = np.empty(len(et), dtype=bool)
        last[-1] = True
        last[:-1] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        et, day, v = et[last], day[last], v[last]
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        cols = {"event_type": [], "day": [], "close": [], "filled": []}
        for st, ln in zip(starts, lens):
            d = day[st:st + ln]
            val = v[st:st + ln]
            spine = np.arange(d[0], d[-1] + 1, dtype=np.int64)
            pos = np.searchsorted(d, spine, side="right") - 1
            cols["event_type"].append(
                np.full(len(spine), et[st], dtype=object))
            cols["day"].append(spine)
            cols["close"].append(val[pos])
            cols["filled"].append(~np.isin(spine, d))
        return pa.table({
            "event_type": pa.array(np.concatenate(cols["event_type"]),
                                   pa.string()),
            "day": pa.array(np.concatenate(cols["day"]), pa.int64()),
            "close": pa.array(round6_tie_robust(
                np.concatenate(cols["close"]))),
            "filled": pa.array(np.concatenate(cols["filled"]),
                               pa.bool_()),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


BOUNCE_RATE_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
l AS (
  SELECT *, CASE WHEN LAG(t_us) OVER w IS NULL
                   OR t_us - LAG(t_us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id
                           ORDER BY t_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM l),
g AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         FIRST(event_type ORDER BY t_us, event_id) AS entry_type
  FROM s GROUP BY 1, 2)
SELECT entry_type, COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END)
             / COUNT(*), 6) AS bounce_rate
FROM g GROUP BY 1
"""


def q_bounce_rate(sf_dir: str):
    """Bounce-rate by session entry type (the funnel-health readout):
    sessions split at 30-minute inactivity gaps in total (t, event_id)
    order, a single-event session is a bounce, each session is keyed by
    its FIRST event's type.  One user-keyed exchange; the block kernel
    is one lexsort + a gap diff + cumsum session ids + run-start takes
    — all vectorized; partials are |types| rows per block.  Unlike
    `sessions` (which emits the session table), this rolls straight to
    the per-entry-type counters so nothing event-scale leaves the
    exchange."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    part_schema = pa.schema([("entry_type", pa.string()),
                             ("n_sessions", pa.int64()),
                             ("n_bounces", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("ts", "ascending"),
                             ("event_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        t_us = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (uid[1:] != uid[:-1]) | (t_us[1:] - t_us[:-1]
                                           > 1_800_000_000)
        sess_start = np.nonzero(brk)[0]
        sess_len = np.diff(np.append(sess_start, n))
        entry = et[sess_start]
        bounce = (sess_len == 1).astype(np.int64)
        t = pa.table({"entry_type": pa.array(entry, pa.string()),
                      "b": pa.array(bounce, pa.int64())})
        g = t.group_by(["entry_type"]).aggregate(
            [([], "count_all"), ("b", "sum")])
        return pa.table({"entry_type": g["entry_type"],
                         "n_sessions": g["count_all"],
                         "n_bounces": g["b_sum"]}, schema=part_schema)

    parts = _collect_raw(sorted_group_map(
        ds, ["user_id"], None, part_schema, block_fn=_block))
    g = parts.group_by(["entry_type"]).aggregate(
        [("n_sessions", "sum"), ("n_bounces", "sum")])
    ns = g["n_sessions_sum"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    nb = g["n_bounces_sum"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    from ..kernels.rounding import round6_tie_robust

    return pa.table({
        "entry_type": g["entry_type"],
        "n_sessions": pa.array(ns, pa.int64()),
        "n_bounces": pa.array(nb, pa.int64()),
        "bounce_rate": pa.array(round6_tie_robust(
            nb.astype(np.float64) / ns)),
    })


VOCAB_BUILD_SQL = """
WITH w AS (
  SELECT UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
           AS term
  FROM documents WHERE text IS NOT NULL),
c AS (
  SELECT term, COUNT(*) AS tf FROM w WHERE term <> ''
  GROUP BY 1 HAVING COUNT(*) >= 10)
SELECT term, CAST(tf AS BIGINT) AS tf,
       ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS vocab_id
FROM c
"""


def q_vocab_build(sf_dir: str):
    """Tokenizer vocabulary construction (the training-prep op every
    text pipeline starts with): corpus term frequencies -> dense
    frequency-ordered integer ids (most frequent term = id 1, ties
    alphabetical).  Reuses the wordcount combiner (distinct-term
    partials leave each block, one keyed merge), then the id is the
    engine's GLOBAL rank — one distributed sort over (−tf, term) + the
    prefix-scan offset (stages/scan.prefix_sum), the same machinery as
    epoch_shuffle; no term-scale driver collect before the final
    bounded (min_count-filtered) result."""
    import ray.data as rd

    from ..stages.scan import prefix_sum
    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    counts = term_counts(ds, [], "text")

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["n"], 10)
        t = batch.filter(keep)
        return pa.table({
            "term": t["term"],
            "tf": t["n"].cast(pa.int64()),
            "neg_tf": pc.multiply(t["n"].cast(pa.int64()), -1),
            "one": pa.array(np.ones(len(t), np.int64)),
        })

    kept = counts.map_batches(_prep, batch_format="pyarrow",
                              zero_copy_batch=True)
    ranked = prefix_sum(kept, ["neg_tf", "term"], "one", out_col="rk")
    return _collect(ranked.map_batches(
        lambda t: pa.table({"term": t["term"], "tf": t["tf"],
                            "vocab_id": pc.add(t["rk"], 1)}),
        batch_format="pyarrow"))


EMBEDDING_DIM_STATS_SQL = """
SELECT i AS dim, COUNT(*) AS n,
       ROUND(SUM(CAST(embedding[i + 1] AS DOUBLE)) / COUNT(*), 6)
         AS mean,
       ROUND((SUM(CAST(embedding[i + 1] AS DOUBLE)
                  * CAST(embedding[i + 1] AS DOUBLE))
              - SUM(CAST(embedding[i + 1] AS DOUBLE))
                * SUM(CAST(embedding[i + 1] AS DOUBLE)) / COUNT(*))
             / (COUNT(*) - 1), 6) AS var
FROM embeddings, UNNEST(range(64)) t(i)
WHERE embedding IS NOT NULL
GROUP BY 1
"""


def q_embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION statistics of the embedding column (embedding-QA:
    a wrong per-dim mean/variance is how normalization bugs surface) —
    the engine's vector-columnar aggregate: each block's list column
    reshapes to an (n, 64) float64 matrix and contributes ONE
    (sum-vector, sumsq-vector, count) partial via two np.add.reduce
    calls; the driver merge is 64 rows regardless of corpus size.  The
    float32 elements are widened to float64 BEFORE squaring on both
    sides (the SQL casts mirror it) so the products are the identical
    doubles."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    part_schema = pa.schema([("dim", pa.int64()), ("n", pa.int64()),
                             ("s", pa.float64()), ("ss", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"]
        col = pc.filter(col, pc.is_valid(col))
        if len(col) == 0:
            return part_schema.empty_table()
        arr = col.combine_chunks() if isinstance(
            col, pa.ChunkedArray) else col
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0)
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        mat = flat.reshape(len(arr), -1)
        return pa.table({
            "dim": pa.array(np.arange(mat.shape[1]), pa.int64()),
            "n": pa.array(np.full(mat.shape[1], mat.shape[0],
                                  np.int64)),
            "s": pa.array(np.add.reduce(mat, axis=0)),
            "ss": pa.array(np.add.reduce(mat * mat, axis=0)),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(_partial, batch_format="pyarrow",
                                        zero_copy_batch=True))
    g = parts.group_by(["dim"]).aggregate(
        [("n", "sum"), ("s", "sum"), ("ss", "sum")])
    n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = g["s_sum"].to_numpy(zero_copy_only=False)
    ss = g["ss_sum"].to_numpy(zero_copy_only=False)
    return pa.table({
        "dim": g["dim"].cast(pa.int64()),
        "n": g["n_sum"].cast(pa.int64()),
        "mean": pa.array(round6_tie_robust(s / n)),
        "var": pa.array(round6_tie_robust(
            (ss - s * s / n) / (n - 1.0))),
    })


ATTRIBUTION_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS channel
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
p AS (SELECT COALESCE(channel, '(none)') AS channel FROM s
      WHERE event_type = 'purchase')
SELECT channel, COUNT(*) AS n_purchases FROM p GROUP BY 1
"""


def q_attribution(sf_dir: str):
    """Last-touch conversion attribution (the marketing-analytics op):
    every purchase is credited to the user's most recent PRECEDING
    non-purchase event type ('(none)' when the purchase opens the
    journey).  One user-keyed exchange; the block kernel is a
    segmented conditional forward-fill — a global cummax over
    non-purchase row indices, shifted one row, then reset at user
    boundaries by comparing against each row's run start (all
    vectorized; index monotonicity makes the cross-user leak check a
    single >= compare).  Partials are |channels| rows per block."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    part_schema = pa.schema([("channel", pa.string()),
                             ("n_purchases", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("ts", "ascending"),
                             ("event_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        n = len(uid)
        idx = np.arange(n, dtype=np.int64)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        run_start = idx[first][np.cumsum(first) - 1]
        nonp = et != "purchase"
        cm = np.maximum.accumulate(np.where(nonp, idx, -1))
        prev = np.empty(n, dtype=np.int64)
        prev[0] = -1
        prev[1:] = cm[:-1]
        # a previous user's index survived the global cummax iff it is
        # below this row's run start
        attrib = np.where(prev >= run_start, prev, -1)
        purch = et == "purchase"
        src = attrib[purch]
        channels = np.where(src >= 0, et[np.maximum(src, 0)], "(none)")
        t = pa.table({"channel": pa.array(channels, pa.string())})
        g = t.group_by(["channel"]).aggregate([([], "count_all")])
        return pa.table({"channel": g["channel"],
                         "n_purchases": g["count_all"]},
                        schema=part_schema)

    parts = _collect_raw(sorted_group_map(
        ds, ["user_id"], None, part_schema, block_fn=_block))
    g = parts.group_by(["channel"]).aggregate([("n_purchases", "sum")])
    return pa.table({"channel": g["channel"],
                     "n_purchases": g["n_purchases_sum"].cast(
                         pa.int64())})


SCD2_HISTORY_SQL = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
c AS (
  SELECT user_id, event_type AS state, ts, event_id FROM s
  WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, state, epoch_us(ts) AS valid_from_us,
       LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS valid_to_us
FROM c
"""


def q_scd2_history(sf_dir: str):
    """Slowly-changing-dimension (type-2) history build — the
    dimension-table maintenance op: collapse each user's event stream
    into validity intervals of their current state (consecutive equal
    states merge; each interval closes when the state CHANGES, the
    open interval has valid_to NULL).  One user-keyed exchange; the
    block kernel is one lexsort + a change mask + one shift — rows out
    are change-point scale, never event scale when states are sticky."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("state", pa.string()),
                            ("valid_from_us", pa.int64()),
                            ("valid_to_us", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("ts", "ascending"),
                             ("event_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        t_us = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        change = first.copy()
        change[1:] |= et[1:] != et[:-1]
        cu, cs, ct = uid[change], et[change], t_us[change]
        m = len(cu)
        # int64 end-to-end: epoch-µs magnitudes exceed float64's 2^53
        nxt_i = np.empty(m, dtype=np.int64)
        nxt_i[:-1] = ct[1:]
        nxt_i[-1] = 0
        same_user = np.empty(m, dtype=bool)
        same_user[:-1] = cu[1:] == cu[:-1]
        same_user[-1] = False
        valid_to = pa.array(nxt_i, pa.int64(), mask=~same_user)
        return pa.table({
            "user_id": pa.array(cu, pa.int64()),
            "state": pa.array(cs, pa.string()),
            "valid_from_us": pa.array(ct, pa.int64()),
            "valid_to_us": valid_to,
        }, schema=out_schema)

    return _collect(sorted_group_map(ds, ["user_id"], None, out_schema,
                                     block_fn=_block))


CHANGEPOINT_CUSUM_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000000.0 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
c AS (
  SELECT event_type, day, mi,
         SUM(mi) OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS cum,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(mi) OVER (PARTITION BY event_type) AS total
  FROM d),
s AS (
  SELECT event_type, day, n,
         ABS(CAST(n AS BIGINT) * cum - CAST(k AS BIGINT) * total)
           AS stat_i
  FROM c WHERE k < n),
r AS (
  SELECT event_type, day, stat_i, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY stat_i DESC, day) AS rn
  FROM s)
SELECT event_type, day AS change_day,
       ROUND(CAST(stat_i AS DOUBLE)
             / (CAST(n AS DOUBLE) * 1000000.0), 6) AS stat
FROM r WHERE rn = 1
"""


def q_changepoint_cusum(sf_dir: str):
    """Change-point detection per series (CUSUM / binary-segmentation
    first split): the day k maximizing |S_k - (k/n)·S_n| over the daily
    mean series — where a level shift most likely happened.  PARITY BY
    INTEGER ALGEBRA: daily means are 6-dp rounded then scaled to exact
    int64 micro-units, and the argmax statistic is computed as
    |n·cum_k - k·total| in pure int64 — immune to the windowed-SUM
    association-order difference between engines (DuckDB's segment-tree
    window sum vs numpy's sequential cumsum would otherwise diverge at
    the ulp and could flip the argmax between near-tied days).  The
    float statistic is recovered by ONE exact division at the end.
    One series-keyed exchange; ties break to the earliest day."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day", "s", "n"])

    partials = ds.map_batches(_daily, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("change_day", pa.int64()),
                            ("stat", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        n_ = tbl["n"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        kstarts = np.nonzero(key_new)[0]
        s = np.add.reduceat(s, kstarts)
        n_ = np.add.reduceat(n_, kstarts)
        et, day = et[kstarts], day[kstarts]
        mi = np.floor(round6_tie_robust(s / n_) * 1_000_000.0
                      + 0.5).astype(np.int64)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows = {"event_type": [], "change_day": [], "stat": []}
        for st, ln in zip(starts, lens):
            if ln < 2:
                continue
            m = mi[st:st + ln]
            cum = np.cumsum(m)
            total = int(cum[-1])
            k = np.arange(1, ln, dtype=np.int64)  # k < n
            stat_i = np.abs(ln * cum[:-1] - k * total)
            best = int(np.argmax(stat_i))
            rows["event_type"].append(et[st])
            rows["change_day"].append(int(day[st + best]))
            rows["stat"].append(float(stat_i[best])
                                / (float(ln) * 1_000_000.0))
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "change_day": pa.array(rows["change_day"], pa.int64()),
            "stat": pa.array(round6_tie_robust(
                np.array(rows["stat"], dtype=np.float64))),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


RFM_SEGMENTS_SQL = """
WITH c AS (
  SELECT o_custkey AS custkey,
         MAX(epoch_us(o_orderdate) // 86400000000) AS last_day,
         COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 6) AS monetary
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_totalprice IS NOT NULL
  GROUP BY 1),
s AS (
  SELECT custkey,
         NTILE(4) OVER (ORDER BY last_day, custkey) AS r,
         NTILE(4) OVER (ORDER BY n_orders, custkey) AS f,
         NTILE(4) OVER (ORDER BY monetary, custkey) AS m
  FROM c)
SELECT r, f, m, COUNT(*) AS n_customers FROM s GROUP BY 1, 2, 3
"""


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation — and the engine's GLOBAL (un-keyed)
    NTILE: window_ranks ranks within a partition key, but RFM quartiles
    order the WHOLE customer table three ways.  Design: per-customer
    aggregates (map-side partials + one custkey exchange), then per
    dimension ONE distributed sort + the prefix-scan rank
    (stages/scan.prefix_sum) — only the THREE quartile-boundary rows
    are collected (the (value, custkey) pairs at SQL NTILE's exact
    bucket-end ranks, extras to the first n%4 buckets), and one final
    broadcast pass assigns all three scores by lexicographic compare
    against those 9 pairs.  No customer-scale driver collect, no join:
    boundary rows are O(1).  Monetary is two-step 6-dp rounded on BOTH
    sides before ordering so merge-order sum noise cannot reorder
    near-tied customers."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.scan import prefix_sum
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    part_schema = pa.schema([("custkey", pa.int64()),
                             ("last_day", pa.int64()),
                             ("n_orders", pa.int64()),
                             ("msum", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["o_custkey"]),
                            pc.is_valid(batch["o_orderdate"])),
                    pc.is_valid(batch["o_totalprice"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return part_schema.empty_table()
        day = pc.divide(batch["o_orderdate"].cast(pa.int64()), _DAY_US)
        t = pa.table({"custkey": batch["o_custkey"], "day": day,
                      "price": batch["o_totalprice"]})
        g = t.group_by(["custkey"]).aggregate(
            [("day", "max"), ("day", "count"), ("price", "sum")])
        return g.rename_columns(["custkey", "last_day", "n_orders",
                                 "msum"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    cust_schema = pa.schema([("custkey", pa.int64()),
                             ("last_day", pa.int64()),
                             ("n_orders", pa.int64()),
                             ("monetary", pa.float64()),
                             ("one", pa.int64())])

    def _cust(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return cust_schema.empty_table()
        tbl = batch.sort_by([("custkey", "ascending")])
        ck = tbl["custkey"].to_numpy(zero_copy_only=False)
        first = np.empty(len(ck), dtype=bool)
        first[0] = True
        first[1:] = ck[1:] != ck[:-1]
        starts = np.nonzero(first)[0]
        last_day = np.maximum.reduceat(
            tbl["last_day"].to_numpy(zero_copy_only=False), starts)
        n_orders = np.add.reduceat(
            tbl["n_orders"].to_numpy(zero_copy_only=False), starts)
        msum = np.add.reduceat(
            tbl["msum"].to_numpy(zero_copy_only=False), starts)
        return pa.table({
            "custkey": pa.array(ck[starts], pa.int64()),
            "last_day": pa.array(last_day, pa.int64()),
            "n_orders": pa.array(n_orders, pa.int64()),
            "monetary": pa.array(round6_tie_robust(msum)),
            "one": pa.array(np.ones(len(starts), np.int64)),
        }, schema=cust_schema)

    cust = sorted_group_map(partials, ["custkey"], None, cust_schema,
                            block_fn=_cust).materialize()
    n = cust.count()
    size, rem = divmod(n, 4)
    ends = []
    c = 0
    for i in range(3):
        c += size + (1 if i < rem else 0)
        ends.append(c)

    def _boundaries(col: str) -> list:
        """The (value, custkey) pairs at NTILE's bucket-end ranks."""
        ranked = prefix_sum(cust, [col, "custkey"], "one", out_col="rk")

        def _sel(batch: pa.Table) -> pa.Table:
            rn = pc.add(batch["rk"], 1)
            keep = pc.is_in(rn, value_set=pa.array(ends, pa.int64()))
            t = batch.filter(keep)
            return pa.table({"rn": pc.add(t["rk"], 1), "v": t[col],
                             "ck": t["custkey"]})

        rows = _collect_raw(ranked.map_batches(
            _sel, batch_format="pyarrow")).sort_by([("rn", "ascending")])
        return list(zip(rows["v"].to_pylist(), rows["ck"].to_pylist()))

    bounds = {col: _boundaries(col)
              for col in ("last_day", "n_orders", "monetary")}
    seg_schema = pa.schema([("r", pa.int64()), ("f", pa.int64()),
                            ("m", pa.int64()),
                            ("n_customers", pa.int64())])

    def _assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return seg_schema.empty_table()
        ck = batch["custkey"].to_numpy(zero_copy_only=False)
        scores = {}
        for name, col in (("r", "last_day"), ("f", "n_orders"),
                          ("m", "monetary")):
            v = batch[col].to_numpy(zero_copy_only=False)
            s = np.ones(len(v), np.int64)
            for bv, bck in bounds[col]:
                s += ((v > bv) | ((v == bv) & (ck > bck))).astype(
                    np.int64)
            scores[name] = s
        t = pa.table({"r": pa.array(scores["r"], pa.int64()),
                      "f": pa.array(scores["f"], pa.int64()),
                      "m": pa.array(scores["m"], pa.int64())})
        g = t.group_by(["r", "f", "m"]).aggregate([([], "count_all")])
        return pa.table({"r": g["r"], "f": g["f"], "m": g["m"],
                         "n_customers": g["count_all"]},
                        schema=seg_schema)

    parts = _collect_raw(cust.map_batches(_assign,
                                          batch_format="pyarrow"))
    g = parts.group_by(["r", "f", "m"]).aggregate([("n_customers",
                                                    "sum")])
    return pa.table({"r": g["r"], "f": g["f"], "m": g["m"],
                     "n_customers": g["n_customers_sum"].cast(
                         pa.int64())})


DOW_PROFILE_SQL = """
WITH d AS (
  SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         value
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL)
SELECT event_type, dow, COUNT(*) AS n,
       ROUND(SUM(value) / COUNT(*), 6) AS mean_value,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY event_type), 6)
         AS share
FROM d GROUP BY 1, 2
"""


def q_dow_profile(sf_dir: str):
    """Day-of-week seasonal profile per series: volume, mean value and
    each weekday's share of the key's total.  The weekday is integer
    arithmetic on the epoch day ((day+4)%7 — 1970-01-01 was a
    Thursday), NOT a timestamp function, so both engines compute the
    identical integer with no timezone/locale surface.  Map-side
    (type, dow) partials; the driver merge is |types|*7 rows; share is
    one exact int division."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("dow", pa.int64()),
                             ("n", pa.int64()), ("s", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dow = (t_us // _DAY_US + 4) % 7
        t = pa.table({"event_type": batch["event_type"],
                      "dow": pa.array(dow, pa.int64()),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "dow"]).aggregate(
            [("v", "count"), ("v", "sum")])
        return g.rename_columns(["event_type", "dow", "n", "s"])

    parts = _collect_raw(ds.map_batches(_partial, batch_format="pyarrow",
                                        zero_copy_batch=True))
    g = parts.group_by(["event_type", "dow"]).aggregate(
        [("n", "sum"), ("s", "sum")])
    et = g["event_type"].to_pylist()
    n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = g["s_sum"].to_numpy(zero_copy_only=False)
    totals = {}
    for t_, c in zip(et, n):
        totals[t_] = totals.get(t_, 0) + int(c)
    tot = np.array([totals[t_] for t_ in et], dtype=np.float64)
    return pa.table({
        "event_type": g["event_type"],
        "dow": g["dow"].cast(pa.int64()),
        "n": pa.array(n, pa.int64()),
        "mean_value": pa.array(round6_tie_robust(s / n)),
        "share": pa.array(round6_tie_robust(
            n.astype(np.float64) / tot)),
    })


KANON_ROLLUP_SQL = """
WITH g AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2)
SELECT event_type,
       CAST(SUM(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_kept,
       CAST(SUM(CASE WHEN n < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_suppressed,
       CAST(SUM(CASE WHEN n >= 3 THEN n ELSE 0 END) AS BIGINT)
         AS rows_kept,
       CAST(SUM(CASE WHEN n < 3 THEN n ELSE 0 END) AS BIGINT)
         AS rows_suppressed
FROM g GROUP BY 1
"""


def q_kanon_rollup(sf_dir: str):
    """k-anonymity suppression audit (the privacy gate a training-data
    release pipeline runs): per (type, user) group counts, groups below
    k=3 are suppressed; emits kept/suppressed group and row counters
    per type.  Map-side (type, user) partial counts -> ONE user-keyed
    exchange (a user's groups co-locate) -> per-type integer counters,
    driver merge is |types| rows.  All-integer arithmetic, no rounding
    surface."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "user_id"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("user_id", pa.int64()),
                             ("n", pa.int64())])

    def _counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "user_id": g["user_id"],
                         "n": g["count_all"]}, schema=part_schema)

    partials = ds.map_batches(_counts, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("groups_kept", pa.int64()),
                            ("groups_suppressed", pa.int64()),
                            ("rows_kept", pa.int64()),
                            ("rows_suppressed", pa.int64())])

    def _audit(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("user_id", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (uid[1:] != uid[:-1])
        kstarts = np.nonzero(key_new)[0]
        n = np.add.reduceat(n, kstarts)
        et = et[kstarts]
        kept = n >= 3
        t = pa.table({"event_type": pa.array(et, pa.string()),
                      "gk": pa.array(kept.astype(np.int64)),
                      "gs": pa.array((~kept).astype(np.int64)),
                      "rk": pa.array(np.where(kept, n, 0)),
                      "rs": pa.array(np.where(kept, 0, n))})
        g = t.group_by(["event_type"]).aggregate(
            [("gk", "sum"), ("gs", "sum"), ("rk", "sum"), ("rs", "sum")])
        return g.rename_columns(["event_type", "groups_kept",
                                 "groups_suppressed", "rows_kept",
                                 "rows_suppressed"]).cast(out_schema)

    parts = _collect_raw(sorted_group_map(
        partials, ["user_id"], None, out_schema, block_fn=_audit))
    g = parts.group_by(["event_type"]).aggregate(
        [("groups_kept", "sum"), ("groups_suppressed", "sum"),
         ("rows_kept", "sum"), ("rows_suppressed", "sum")])
    return g.rename_columns(["event_type", "groups_kept",
                             "groups_suppressed", "rows_kept",
                             "rows_suppressed"]).cast(out_schema)


def _weighted_sample_sql() -> str:
    from ..stages.sampling import hash_bucket_fine_sql

    return f"""
WITH h AS (
  SELECT event_type, event_id,
         (CAST({hash_bucket_fine_sql('event_id', 5)} AS DOUBLE) + 1.0)
         / 1000000.0 / value AS prio
  FROM events
  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL AND value > 0.0),
r AS (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY prio, event_id) AS rn
  FROM h)
SELECT event_type, event_id, rn FROM r WHERE rn <= 20
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling per key (value-proportional
    priority sampling — high-value rows are preferentially kept, the
    reproducible importance-sampling op): priority = u/value with
    u = (fine-hash(id)+1)/1e6 in (0, 1], keep the 20 LOWEST priorities
    per type.  The hash is the bit-exact HUGEINT-mirrored house hash
    (split_sample discipline) and the priority is two IEEE divisions
    in the SAME op order as the oracle, so selection mirrors
    bit-for-bit.  Block-local per-key candidate pruning + one slim
    re-rank exchange (stages/topk.top_k_by_key) — at most k rows per
    key leave any block."""
    from ..stages.sampling import hash_bucket_fine
    from ..stages.topk import top_k_by_key

    ds = _events_nonnull(sf_dir, ["event_type", "event_id", "value"])

    def _prio(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["value"], 0.0))
        if len(batch) == 0:
            return pa.schema([("event_type", pa.string()),
                              ("event_id", pa.int64()),
                              ("prio", pa.float64())]).empty_table()
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        u = (hash_bucket_fine(ids, salt=5).astype(np.float64) + 1.0) \
            / 1_000_000.0
        return pa.table({"event_type": batch["event_type"],
                         "event_id": batch["event_id"],
                         "prio": pa.array(u / v)})

    keyed = ds.map_batches(_prio, batch_format="pyarrow",
                           zero_copy_batch=True)
    top = top_k_by_key(keyed, ["event_type"], "prio", 20,
                       tiebreak_col="event_id", descending=False)
    return _collect(top.map_batches(
        lambda t: t.select(["event_type", "event_id", "rn"]),
        batch_format="pyarrow"))


KMV_OVERLAP_SQL = """
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(DISTINCT a.user_id) AS est_overlap
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def q_kmv_overlap(sf_dir: str):
    """Audience-OVERLAP matrix via K-Minimum-Values sketches
    (kernels/sketch.kmv_*, Bar-Yossef 2002 / Beyer 2007) — the set
    operation HLL cannot do: distinct-user INTERSECTION between every
    pair of event types from k-sized sketches, never a user-level
    join.  Per-block per-type KMV partials (<= k u64 values each)
    merge in one type-keyed exchange; the 5 final sketches collect and
    the pair matrix computes sketch-side.  At test scale distinct
    users < k, where KMV is EXACT — hence a SQL oracle (same
    discipline as the exhaustive-probe ANN oracles); the estimation
    regime (n >> k) is pinned by error-bound unit tests."""
    from ..kernels.hashing import hash_columns_u64
    from ..kernels.sketch import kmv_add, kmv_intersection
    from ..stages.joins import collect_small
    from ..stages.sorted_groups import sorted_group_map

    k = 4096  # > distinct users at both test scales -> exact regime
    ds = _events_nonnull(sf_dir, ["event_type", "user_id"])
    sk_schema = pa.schema([("event_type", pa.string()),
                           ("kmv", pa.large_binary())])

    def _partial(batch: pa.Table) -> pa.Table:
        h = hash_columns_u64(batch, ["user_id"])
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        types, inv = np.unique(et, return_inverse=True)
        rows = {"event_type": [], "kmv": []}
        for i, t in enumerate(types):
            sk = kmv_add(np.empty(0, np.uint64), h[inv == i], k)
            rows["event_type"].append(str(t))
            rows["kmv"].append(sk.tobytes())
        return pa.table({"event_type": pa.array(rows["event_type"]),
                         "kmv": pa.array(rows["kmv"],
                                         pa.large_binary())},
                        schema=sk_schema)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _merge(group: pa.Table) -> pa.Table:
        sk = np.empty(0, np.uint64)
        for blob in group["kmv"]:
            sk = kmv_add(sk, np.frombuffer(blob.as_py(), np.uint64), k)
        return pa.table({"event_type": group["event_type"].slice(0, 1),
                         "kmv": pa.array([sk.tobytes()],
                                         pa.large_binary())},
                        schema=sk_schema)

    sketches = collect_small(sorted_group_map(
        partials, ["event_type"], _merge, sk_schema))
    names = sketches["event_type"].to_pylist()
    sks = {n: np.frombuffer(b.as_py(), np.uint64)
           for n, b in zip(names, sketches["kmv"])}
    rows = {"type_a": [], "type_b": [], "est_overlap": []}
    for i, ta in enumerate(sorted(sks)):
        for tb in sorted(sks)[i + 1:]:
            rows["type_a"].append(ta)
            rows["type_b"].append(tb)
            rows["est_overlap"].append(
                int(round(kmv_intersection(sks[ta], sks[tb], k))))
    return pa.table({"type_a": pa.array(rows["type_a"], pa.string()),
                     "type_b": pa.array(rows["type_b"], pa.string()),
                     "est_overlap": pa.array(rows["est_overlap"],
                                             pa.int64())})


INTERVAL_UNION_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + 1800000000 AS e
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
o AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM iv),
g AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e) AS isl
  FROM o),
i AS (SELECT user_id, isl, MAX(e) - MIN(s) AS len
      FROM g GROUP BY 1, 2)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(SUM(len) AS BIGINT) AS covered_us
FROM i GROUP BY 1
"""


def q_interval_union(sf_dir: str):
    """Interval-UNION coverage per user (sweep-line over overlapping
    intervals — how much wall-clock was the user actually active?):
    each event opens a 30-min interval; overlaps merge into islands;
    emits island count + total covered time.  One keyed exchange; the
    per-user kernel is sort + running-max (np.maximum.accumulate) —
    island starts where an interval begins after everything seen so
    far has ended.  All integer µs arithmetic, exact.  ORACLE-CHECKED
    against the window-function islands derivation."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_islands", pa.int64()),
                            ("covered_us", pa.int64())])
    span = 1_800_000_000

    def _one(group: pa.Table) -> pa.Table:
        t = np.sort(group["ts"].cast(pa.int64())
                    .to_numpy(zero_copy_only=False))
        s, e = t, t + span
        run_max = np.maximum.accumulate(e)
        new_isl = np.concatenate([[True], s[1:] > run_max[:-1]])
        starts = np.nonzero(new_isl)[0]
        ends = np.append(starts[1:], len(t))
        covered = int(np.sum(run_max[ends - 1] - s[starts]))
        return pa.table({
            "user_id": group["user_id"].slice(0, 1),
            "n_islands": pa.array([len(starts)], pa.int64()),
            "covered_us": pa.array([covered], pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(ds, ["user_id"], _one,
                                     out_schema))


TWAP_EVENTS_SQL = """
WITH p AS (
  SELECT event_type, event_id, epoch_us(ts) AS t,
         CAST(value AS DOUBLE) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL),
l AS (
  SELECT event_type, v,
         LEAD(t) OVER (PARTITION BY event_type
                       ORDER BY t, event_id) - t AS dt
  FROM p)
SELECT event_type, COUNT(dt) AS n_intervals,
       ROUND(SUM(v * dt) / SUM(dt), 6) AS twap
FROM l WHERE dt IS NOT NULL
GROUP BY 1
"""


def q_twap_events(sf_dir: str):
    """TIME-WEIGHTED average per key over the irregular cadence (the
    TWAP of finance / the correct mean when sampling is uneven — a
    burst of readings must not dominate the average): each value
    weights by its interval to the NEXT observation in (t, id) order;
    the last point carries no interval.  One keyed exchange; the
    per-key kernel is one lexsort + one diff — tie rows contribute
    zero-width intervals on both engines, so tie order cannot matter.
    ORACLE-CHECKED against the LEAD-window derivation (tie-robust
    rounding collapses the summation-order ulps)."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "event_id", "ts",
                                  "value"])
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_intervals", pa.int64()),
                            ("twap", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        t = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        v = group["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t))
        ts, vs = t[order].astype(np.float64), v[order]
        dt = np.diff(ts)
        denom = float(dt.sum())
        twap = float(np.sum(vs[:-1] * dt) / denom) if denom > 0 \
            else float("nan")
        twap6 = round6_tie_robust(np.array([twap]))[0]
        return pa.table({
            "event_type": group["event_type"].slice(0, 1),
            "n_intervals": pa.array([max(0, len(ts) - 1)], pa.int64()),
            "twap": pa.array([twap6], pa.float64(),
                             mask=[not np.isfinite(twap6)]),
        }, schema=out_schema)

    return _collect_raw(sorted_group_map(ds, ["event_type"], _one,
                                         out_schema))


ROLLING_WAU_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT DISTINCT day FROM d)
SELECT g.day, COUNT(DISTINCT e.user_id) AS wau
FROM g JOIN d e ON e.day BETWEEN g.day - 6 AND g.day
GROUP BY 1
"""


def q_rolling_wau(sf_dir: str):
    """Rolling 7-day distinct users per day (WAU — the windowed
    COUNT DISTINCT every growth dashboard needs, which plain windowed
    aggregation cannot express because distinctness doesn't merge):
    map-side (user, day) dedup, each active day then FANS OUT to the 7
    report days it supports (vectorized repeat — slim integer rows),
    one (user, report-day)-keyed dedup exchange, one day-keyed count.
    Exchange volume is 7 x active-pairs, never raw events.  Report
    days are exactly the ACTIVE days (mirrors the SQL grid join).
    ORACLE-CHECKED."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])

    def _expand(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = t_us // _DAY_US
        t = pa.table({"user_id": batch["user_id"],
                      "day": pa.array(day, pa.int64())})
        t = t.group_by(["user_id", "day"]).aggregate([])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        dy = t["day"].to_numpy(zero_copy_only=False)
        rep_u = np.repeat(uid, 7)
        rep_d = np.repeat(dy, 7) + np.tile(np.arange(7), len(dy))
        return pa.table({"user_id": pa.array(rep_u, pa.int64()),
                         "rday": pa.array(rep_d, pa.int64())})

    expanded = ds.map_batches(_expand, batch_format="pyarrow",
                              zero_copy_batch=True)
    pair_schema = pa.schema([("user_id", pa.int64()),
                             ("rday", pa.int64())])

    def _dedup_pairs(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pair_schema.empty_table()
        return batch.group_by(["user_id", "rday"]).aggregate([])

    pairs = sorted_group_map(expanded, ["user_id", "rday"], None,
                             pair_schema, block_fn=_dedup_pairs)
    out_schema = pa.schema([("day", pa.int64()), ("wau", pa.int64())])

    def _count(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("rday", "ascending")])
        starts, ends = _runs(tbl, ["rday"])
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "day": tbl["rday"].take(idx),
            "wau": pa.array((ends - starts).astype(np.int64)),
        }, schema=out_schema)

    counts = sorted_group_map(pairs, ["rday"], None, out_schema,
                              block_fn=_count)
    wau = _collect_raw(counts)
    # the SQL grid only reports ACTIVE days: drop fan-out days beyond
    # the observed range / inactive gaps via a broadcast of active days
    active = _collect_raw(
        _events_nonnull(sf_dir, ["ts"]).map_batches(
            lambda t: pa.table({
                "day": pa.array(np.unique(
                    t["ts"].cast(pa.int64())
                    .to_numpy(zero_copy_only=False) // _DAY_US),
                    pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day").count())
    keep = np.isin(wau["day"].to_numpy(zero_copy_only=False),
                   active["day"].to_numpy(zero_copy_only=False))
    return wau.filter(pa.array(keep))


PROFILE_EVENTS_SQL = """
SELECT * FROM (
  SELECT 'event_id' AS col, COUNT(*) AS n,
         COUNT(*) - COUNT(event_id) AS n_null,
         ROUND(MIN(CAST(event_id AS DOUBLE)), 6) AS min_num,
         ROUND(MAX(CAST(event_id AS DOUBLE)), 6) AS max_num,
         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
  FROM events
  UNION ALL
  SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
         ROUND(MIN(CAST(user_id AS DOUBLE)), 6),
         ROUND(MAX(CAST(user_id AS DOUBLE)), 6), NULL, NULL
  FROM events
  UNION ALL
  SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
         ROUND(MIN(value), 6), ROUND(MAX(value), 6), NULL, NULL
  FROM events
  UNION ALL
  SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
         ROUND(CAST(MIN(epoch_us(ts)) AS DOUBLE), 6),
         ROUND(CAST(MAX(epoch_us(ts)) AS DOUBLE), 6), NULL, NULL
  FROM events
  UNION ALL
  SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
         NULL, NULL, MIN(event_type), MAX(event_type)
  FROM events
)
"""


def q_profile_events(sf_dir: str):
    """One-pass TABLE PROFILER (the Deequ-style data-quality report):
    every column's row count, null count, numeric min/max (timestamps
    as epoch-µs) and lexicographic min/max for strings, from ONE
    streaming pass — each block emits one tiny partial row per column,
    the merge is elementwise min/max/sum at (blocks x columns) scale.
    The audit that runs before any pipeline trusts a new drop of data.
    ORACLE-CHECKED against a per-column UNION ALL of SQL aggregates."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map

    num_cols = ["event_id", "user_id", "value", "ts"]
    str_cols = ["event_type"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=num_cols + str_cols)
    out_schema = pa.schema([
        ("col", pa.string()), ("n", pa.int64()), ("n_null", pa.int64()),
        ("min_num", pa.float64()), ("max_num", pa.float64()),
        ("min_str", pa.string()), ("max_str", pa.string()),
    ])

    def _partial(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("col", "n", "n_null", "min_num",
                                "max_num", "min_str", "max_str")}
        for c in num_cols:
            arr = batch[c]
            if pa.types.is_timestamp(arr.type):
                arr = pc.cast(arr, pa.int64())
            arr = pc.cast(arr, pa.float64())
            mm = pc.min_max(arr)
            rows["col"].append(c)
            rows["n"].append(len(batch))
            rows["n_null"].append(arr.null_count)
            rows["min_num"].append(mm["min"].as_py())
            rows["max_num"].append(mm["max"].as_py())
            rows["min_str"].append(None)
            rows["max_str"].append(None)
        for c in str_cols:
            mm = pc.min_max(batch[c])
            rows["col"].append(c)
            rows["n"].append(len(batch))
            rows["n_null"].append(batch[c].null_count)
            rows["min_num"].append(None)
            rows["max_num"].append(None)
            rows["min_str"].append(mm["min"].as_py())
            rows["max_str"].append(mm["max"].as_py())
        return pa.table(
            {k: pa.array(v, out_schema.field(k).type)
             for k, v in rows.items()}, schema=out_schema)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        from ..kernels.rounding import round6_tie_robust

        starts, _ = _runs(batch, ["col"])
        idx = pa.array(starts, pa.int64())
        n = np.add.reduceat(batch["n"].to_numpy(zero_copy_only=False),
                            starts)
        nn = np.add.reduceat(
            batch["n_null"].to_numpy(zero_copy_only=False), starts)
        mn = np.fmin.reduceat(
            batch["min_num"].to_numpy(zero_copy_only=False), starts)
        mx = np.fmax.reduceat(
            batch["max_num"].to_numpy(zero_copy_only=False), starts)
        out = {"col": batch["col"].take(idx),
               "n": pa.array(n), "n_null": pa.array(nn),
               "min_num": pa.array(round6_tie_robust(mn), pa.float64(),
                                   mask=np.isnan(mn)),
               "max_num": pa.array(round6_tie_robust(mx), pa.float64(),
                                   mask=np.isnan(mx))}
        mins, maxs = [], []
        ends = np.append(starts[1:], len(batch))
        ms = batch["min_str"].to_pylist()
        xs = batch["max_str"].to_pylist()
        for s, e in zip(starts, ends):
            vals_m = [v for v in ms[s:e] if v is not None]
            vals_x = [v for v in xs[s:e] if v is not None]
            mins.append(min(vals_m) if vals_m else None)
            maxs.append(max(vals_x) if vals_x else None)
        out["min_str"] = pa.array(mins, pa.string())
        out["max_str"] = pa.array(maxs, pa.string())
        return pa.table(out, schema=out_schema)

    return _collect_raw(sorted_group_map(partials, ["col"], None,
                                         out_schema, block_fn=_merge))


XCORR_MATRIX_SQL = """
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL),
b AS (
  SELECT event_type,
         (t_us // 86400000000) * 86400000000 AS bucket_ts_us,
         AVG(v) AS m
  FROM pts GROUP BY 1, 2)
SELECT a.event_type AS type_a, c.event_type AS type_b,
       COUNT(*) AS n_days, ROUND(CORR(a.m, c.m), 6) AS xcorr
FROM b a JOIN b c
  ON a.bucket_ts_us = c.bucket_ts_us AND a.event_type < c.event_type
GROUP BY 1, 2
"""


def q_xcorr_matrix(sf_dir: str):
    """Pairwise cross-correlation MATRIX of the keys' daily mean series
    (which signals move together?): daily means from slim block
    partials (one day-keyed exchange at day x key cardinality), then
    the matrix assembles from the day-aligned value vectors — the
    result is key-pair cardinality, so the final assembly collects
    under the gate (the matrix is the OUTPUT, inherently small relative
    to the input).  Day alignment pairs only days where BOTH series
    exist, mirroring the SQL self-join.  ORACLE-CHECKED."""
    from ..stages.joins import collect_small
    from ..stages.sorted_groups import _runs, sorted_group_map

    pts = _events_nonnull(sf_dir, ["event_type", "ts", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (t_us // _DAY_US) * _DAY_US
        t = pa.table({"event_type": batch["event_type"],
                      "day_us": pa.array(day, pa.int64()),
                      "v": pc.cast(batch["value"], pa.float64())})
        g = t.group_by(["event_type", "day_us"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day_us", "s", "n"])

    partials = pts.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    daily_schema = pa.schema([("event_type", pa.string()),
                              ("day_us", pa.int64()),
                              ("m", pa.float64())])

    def _merge_day(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return daily_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day_us", "ascending")])
        starts, _ = _runs(tbl, ["event_type", "day_us"])
        idx = pa.array(starts, pa.int64())
        s = np.add.reduceat(tbl["s"].to_numpy(zero_copy_only=False),
                            starts)
        n = np.add.reduceat(tbl["n"].to_numpy(zero_copy_only=False),
                            starts)
        return pa.table({"event_type": tbl["event_type"].take(idx),
                         "day_us": tbl["day_us"].take(idx),
                         "m": pa.array(s / n)}, schema=daily_schema)

    daily = collect_small(sorted_group_map(
        partials, ["event_type", "day_us"], None, daily_schema,
        block_fn=_merge_day))

    et = daily["event_type"].to_pylist()
    day = daily["day_us"].to_numpy(zero_copy_only=False)
    m = daily["m"].to_numpy(zero_copy_only=False)
    series = {}
    for t in sorted(set(et)):
        mask = np.array([e == t for e in et])
        o = np.argsort(day[mask])
        series[t] = (day[mask][o], m[mask][o])
    rows = {"type_a": [], "type_b": [], "n_days": [], "xcorr": []}
    types = sorted(series)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            da, va = series[ta]
            db, vb = series[tb]
            pos = np.searchsorted(db, da)
            pos_c = np.minimum(pos, len(db) - 1)
            ok = db[pos_c] == da
            x, y = va[ok], vb[pos_c[ok]]
            rows["type_a"].append(ta)
            rows["type_b"].append(tb)
            rows["n_days"].append(int(ok.sum()))
            if len(x) >= 2:
                cx, cy = x - x.mean(), y - y.mean()
                den = np.sqrt(np.sum(cx * cx) * np.sum(cy * cy))
                rows["xcorr"].append(
                    float(np.sum(cx * cy) / den) if den > 0 else None)
            else:
                rows["xcorr"].append(None)
    return _round6(pa.table({
        "type_a": pa.array(rows["type_a"], pa.string()),
        "type_b": pa.array(rows["type_b"], pa.string()),
        "n_days": pa.array(rows["n_days"], pa.int64()),
        "xcorr": pa.array(rows["xcorr"], pa.float64()),
    }))


USER_STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY day) AS grp
  FROM d),
i AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
       COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS max_streak
FROM i GROUP BY 1
"""


def q_user_streaks(sf_dir: str):
    """Gaps-and-islands per user (the engagement-streak op): distinct
    active days per user, runs of CONSECUTIVE days are islands; emits
    days, island count and the longest streak.  Map-side (user, day)
    dedup shrinks the exchange to distinct pairs; the per-user kernel
    is sort + one diff (island starts where the day gap exceeds 1) —
    all integer arithmetic, no rounding surface.  ORACLE-CHECKED
    against the classic day-minus-ROW_NUMBER islands derivation."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])

    def _pairs(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"user_id": batch["user_id"],
                      "day": pa.array(t_us // _DAY_US, pa.int64())})
        return t.group_by(["user_id", "day"]).aggregate([])

    pairs = ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_days", pa.int64()),
                            ("n_streaks", pa.int64()),
                            ("max_streak", pa.int64())])

    def _one(group: pa.Table) -> pa.Table:
        days = np.unique(group["day"].to_numpy(zero_copy_only=False))
        starts = np.nonzero(
            np.concatenate([[True], np.diff(days) > 1]))[0]
        lens = np.diff(np.append(starts, len(days)))
        return pa.table({
            "user_id": group["user_id"].slice(0, 1),
            "n_days": pa.array([len(days)], pa.int64()),
            "n_streaks": pa.array([len(starts)], pa.int64()),
            "max_streak": pa.array([int(lens.max())], pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(pairs, ["user_id"], _one,
                                     out_schema))


WINDOW_RANKS_SQL = """
SELECT event_id, event_type,
       NTILE(4) OVER (PARTITION BY event_type
                      ORDER BY value, event_id) AS ntile4,
       ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
                                  ORDER BY value), 6) AS pct_rank,
       ROUND(CUME_DIST() OVER (PARTITION BY event_type
                               ORDER BY value), 6) AS cume_dist
FROM events
WHERE event_id IS NOT NULL AND event_type IS NOT NULL
  AND value IS NOT NULL
"""


def q_window_ranks(sf_dir: str):
    """The rank-window family per key with EXACT tie semantics:
    NTILE(4) over the (value, event_id) total order (first n%k buckets
    take the extra row — SQL's definition, not floor(rank*k/n)),
    PERCENT_RANK = (rank_min-1)/(n-1) (ties share the min rank), and
    CUME_DIST = rows_lte/n.  One keyed exchange; the per-key kernel is
    one argsort + two searchsorted calls — ranks, tie groups and
    bucket boundaries all vectorized.  The ratios are exact integer
    divisions, but n_lte/n can land EXACTLY on a 6-dp half where
    numpy's banker rounding and SQL's half-away diverge — hence the
    shared tie-robust rounding."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_id", "event_type", "value"])
    out_schema = pa.schema([("event_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("ntile4", pa.int64()),
                            ("pct_rank", pa.float64()),
                            ("cume_dist", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        n = len(v)
        order = np.lexsort((eid, v))  # total order (value, event_id)
        # row number in total order, per original row
        rownum = np.empty(n, dtype=np.int64)
        rownum[order] = np.arange(n)
        vs = v[order]
        # ties: min rank and rows<=v via searchsorted on sorted values
        rank_min = np.searchsorted(vs, v, side="left")  # 0-based
        n_lte = np.searchsorted(vs, v, side="right")
        pct = rank_min / (n - 1) if n > 1 else np.zeros(n)
        cume = n_lte / n
        # SQL NTILE: first (n % 4) buckets take ceil(n/4) rows
        q, r = divmod(n, 4)
        big = (q + 1) * r  # rows covered by the larger buckets
        ntile = np.where(
            rownum < big,
            rownum // (q + 1) if q + 1 else 0,
            r + (rownum - big) // q if q else r) + 1
        return pa.table({
            "event_id": group["event_id"],
            "event_type": group["event_type"],
            "ntile4": pa.array(ntile.astype(np.int64)),
            "pct_rank": pa.array(round6_tie_robust(
                np.asarray(pct, np.float64))),
            "cume_dist": pa.array(round6_tie_robust(
                np.asarray(cume, np.float64))),
        }, schema=out_schema)

    return _collect_raw(sorted_group_map(ds, ["event_type"], _one,
                                         out_schema))


GINI_EVENTS_SQL = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2),
r AS (
  SELECT event_type, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS k,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM c)
SELECT event_type, CAST(MAX(k) AS BIGINT) AS n_users,
       ROUND(2.0 * SUM(CAST(i AS DOUBLE) * n) / (MAX(k) * MAX(tot))
             - (MAX(k) + 1.0) / MAX(k), 6) AS gini
FROM r GROUP BY 1
"""


def q_gini_events(sf_dir: str):
    """Per-key GINI coefficient of user-activity concentration (the
    inequality metric of traffic audits: is one bot 90% of a type's
    events?).  Two-level aggregate: map-side (type, user) count
    partials (distinct-pair exchange), then a per-type vectorized
    kernel — sort counts ascending, Gini = 2·Σ(i·x_i)/(k·Σx) − (k+1)/k.
    Tie order cannot matter (equal x under consecutive ranks
    contribute a fixed Σi·x), so the statistic is deterministic and
    ORACLE-CHECKED against the ROW_NUMBER window derivation."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "user_id"])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "user_id", "n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_users", pa.int64()),
                            ("gini", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        # merge split (type,user) partials, then rank-weighted sum
        tbl = group.sort_by([("user_id", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        first = np.empty(len(uid), dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(first)[0]
        x = np.sort(np.add.reduceat(n, starts)).astype(np.float64)
        k = len(x)
        i = np.arange(1, k + 1, dtype=np.float64)
        gini = 2.0 * float(np.sum(i * x)) / (k * float(x.sum())) \
            - (k + 1.0) / k
        return pa.table({
            "event_type": group["event_type"].slice(0, 1),
            "n_users": pa.array([k], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], _one,
                                     out_schema))


ROBUST_MEAN_SQL = """
WITH e AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
q AS (
  SELECT event_type,
         QUANTILE_CONT(v, 0.1) AS lo, QUANTILE_CONT(v, 0.9) AS hi
  FROM e GROUP BY 1)
SELECT e.event_type,
       COUNT(*) FILTER (e.v >= q.lo AND e.v <= q.hi) AS n_kept,
       ROUND(AVG(e.v) FILTER (e.v >= q.lo AND e.v <= q.hi), 6)
         AS trimmed_mean,
       ROUND(AVG(LEAST(GREATEST(e.v, q.lo), q.hi)), 6)
         AS winsorized_mean
FROM e JOIN q USING (event_type)
GROUP BY 1
"""


def q_robust_mean(sf_dir: str):
    """Per-key 10% TRIMMED and WINSORIZED means — the outlier-immune
    aggregates of data-quality reporting.  One keyed exchange; the
    per-key kernel computes the [q10, q90] fences with np.percentile's
    lerp form (== DuckDB QUANTILE_CONT to the last ulp — the roms pin),
    then a trimmed mean over the in-fence subset and a winsorized mean
    with values clamped to the fences.  Membership is ulp-identical on
    both engines because the fence lands strictly between data points
    whenever the percentile position is fractional.  ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "value"])
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_kept", pa.int64()),
                            ("trimmed_mean", pa.float64()),
                            ("winsorized_mean", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lo = float(np.percentile(v, 10.0))
        hi = float(np.percentile(v, 90.0))
        keep = (v >= lo) & (v <= hi)
        tm = float(v[keep].mean()) if keep.any() else float("nan")
        wm = float(np.minimum(np.maximum(v, lo), hi).mean())
        tm6 = round6_tie_robust(np.array([tm]))[0]
        wm6 = round6_tie_robust(np.array([wm]))[0]
        return pa.table({
            "event_type": group["event_type"].slice(0, 1),
            "n_kept": pa.array([int(keep.sum())], pa.int64()),
            "trimmed_mean": pa.array([tm6], pa.float64(),
                                     mask=[not np.isfinite(tm6)]),
            "winsorized_mean": pa.array([wm6], pa.float64(),
                                        mask=[not np.isfinite(wm6)]),
        }, schema=out_schema)

    return _collect_raw(sorted_group_map(ds, ["event_type"], _one,
                                         out_schema))


CUMULATIVE_USERS_SQL = """
WITH e AS (
  SELECT user_id,
         (epoch_us(ts) // 86400000000) * 86400000000 AS day_us
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
f AS (SELECT user_id, MIN(day_us) AS first_day FROM e GROUP BY 1),
d AS (SELECT first_day AS day_us, COUNT(*) AS new_users
      FROM f GROUP BY 1)
SELECT day_us, new_users,
       SUM(new_users) OVER (ORDER BY day_us) AS cum_users
FROM d
"""


def q_cumulative_users(sf_dir: str):
    """Cumulative distinct users per day (the growth-accounting
    running-distinct): COUNT(DISTINCT) OVER a running window is
    quadratic done naively, but first-seen reduction makes it linear —
    per-user MIN(day) (one keyed exchange at user cardinality,
    map-side min partials), per-day new-user counts (day-cardinality
    exchange), then the distributed prefix scan turns new-per-day into
    cumulative.  Composition of three existing primitives; every step
    integer-exact.  ORACLE-CHECKED against the window SUM over the
    first-seen derivation."""
    from ..stages.scan import prefix_sum
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])

    def _min_partial(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (t_us // _DAY_US) * _DAY_US
        t = pa.table({"user_id": batch["user_id"],
                      "day_us": pa.array(day, pa.int64())})
        g = t.group_by(["user_id"]).aggregate([("day_us", "min")])
        return g.rename_columns(["user_id", "first_day"])

    partials = ds.map_batches(_min_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    first_schema = pa.schema([("day_us", pa.int64()),
                              ("new_users", pa.int64())])

    def _per_day(batch: pa.Table) -> pa.Table:
        """Merge per-user min partials, then count first-days — the
        batch holds whole user groups (sorted_group_map contract)."""
        if len(batch) == 0:
            return first_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending")])
        starts, _ = _runs(tbl, ["user_id"])
        fd = np.minimum.reduceat(
            tbl["first_day"].to_numpy(zero_copy_only=False), starts)
        days, counts = np.unique(fd, return_counts=True)
        return pa.table({"day_us": pa.array(days, pa.int64()),
                         "new_users": pa.array(counts.astype(np.int64))},
                        schema=first_schema)

    per_user_day = sorted_group_map(partials, ["user_id"], None,
                                    first_schema, block_fn=_per_day)
    # the per-day rows can still split across blocks -> one more slim
    # day-keyed merge, then the prefix scan orders by day globally
    def _day_merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return first_schema.empty_table()
        starts, _ = _runs(batch, ["day_us"])
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "day_us": batch["day_us"].take(idx),
            "new_users": pa.array(np.add.reduceat(
                batch["new_users"].to_numpy(zero_copy_only=False),
                starts)),
        }, schema=first_schema)

    daily = sorted_group_map(per_user_day, ["day_us"], None,
                             first_schema, block_fn=_day_merge)
    cum = prefix_sum(daily, ["day_us"], "new_users", out_col="cum_excl")
    return _collect(cum.map_batches(
        lambda t: pa.table({
            "day_us": t["day_us"],
            "new_users": t["new_users"],
            "cum_users": pc.add(t["cum_excl"], t["new_users"]),
        }),
        batch_format="pyarrow"))


MODE_EVENTS_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
r AS (
  SELECT user_id, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c)
SELECT user_id, event_type AS mode_type, n AS n_mode
FROM r WHERE rn = 1
"""


def q_mode_events(sf_dir: str):
    """Per-key MODE (argmax-by-count with deterministic tie-break —
    the categorical-profile compaction: each user's dominant event
    type).  Map-side (user, type) count partials shrink the exchange
    to distinct-pair cardinality; the per-user kernel merges partial
    counts and picks (max n, min type) vectorized.  ORACLE-CHECKED
    against the ROW_NUMBER window."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "event_type"])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["user_id", "event_type", "n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("mode_type", pa.string()),
                            ("n_mode", pa.int64())])

    def _one(group: pa.Table) -> pa.Table:
        tbl = group.sort_by([("event_type", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        tot = np.add.reduceat(n, starts)
        # ties break toward the lexicographically smallest type: argmax
        # returns the FIRST max and types are already sorted ascending
        best = int(np.argmax(tot))
        return pa.table({
            "user_id": group["user_id"].slice(0, 1),
            "mode_type": pa.array([et[starts[best]]], pa.string()),
            "n_mode": pa.array([int(tot[best])], pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["user_id"], _one,
                                     out_schema))


ACF_DAILY_SQL = """
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
b AS (
  SELECT event_type,
         (t_us // 86400000000) * 86400000000 AS bucket_ts_us,
         AVG(v) AS m
  FROM pts GROUP BY 1, 2
)
SELECT a.event_type, k.lag AS lag,
       COUNT(*) AS n_pairs, ROUND(CORR(a.m, c.m), 6) AS acf
FROM b a
JOIN (VALUES (1), (2), (3)) k(lag) ON TRUE
JOIN b c ON c.event_type = a.event_type
        AND c.bucket_ts_us = a.bucket_ts_us + k.lag * 86400000000
GROUP BY 1, 2
"""

_DAY_US = 86_400_000_000


def q_acf_daily(sf_dir: str):
    """Sample autocorrelation of each key's DAILY mean series at
    calendar lags 1-3 days (the seasonality probe of the light-curve
    feature family): per-(type, day) means from slim block partials,
    then one keyed exchange and a vectorized per-type kernel — day
    pairing by searchsorted on the day grid (gaps pair only where both
    days exist, mirroring the SQL self-join), Pearson over the pairs.
    ORACLE-CHECKED against the lagged self-join + CORR."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    pts = _events_nonnull(sf_dir, ["event_type", "ts", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (t_us // _DAY_US) * _DAY_US
        t = pa.table({"event_type": batch["event_type"],
                      "day_us": pa.array(day, pa.int64()),
                      "v": pc.cast(batch["value"], pa.float64())})
        g = t.group_by(["event_type", "day_us"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day_us", "s", "n"])

    partials = pts.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("lag", pa.int32()),
                            ("n_pairs", pa.int64()),
                            ("acf", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        tbl = group.sort_by([("day_us", "ascending")])
        days = tbl["day_us"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        # merge the per-block partials of each day
        first = np.empty(len(days), dtype=bool)
        first[0] = True
        first[1:] = days[1:] != days[:-1]
        starts = np.nonzero(first)[0]
        d = days[starts]
        m = np.add.reduceat(s, starts) / np.add.reduceat(n, starts)
        rows = {"event_type": [], "lag": [], "n_pairs": [], "acf": []}
        et = group["event_type"][0].as_py()
        for lag in (1, 2, 3):
            pos = np.searchsorted(d, d + lag * _DAY_US)
            pos_c = np.minimum(pos, len(d) - 1)
            ok = d[pos_c] == d + lag * _DAY_US
            x, y = m[ok], m[pos_c[ok]]
            rows["event_type"].append(et)
            rows["lag"].append(lag)
            rows["n_pairs"].append(int(ok.sum()))
            if len(x) >= 2:
                cx, cy = x - x.mean(), y - y.mean()
                den = np.sqrt(np.sum(cx * cx) * np.sum(cy * cy))
                rows["acf"].append(
                    float(np.sum(cx * cy) / den) if den > 0 else None)
            else:
                rows["acf"].append(None)
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "lag": pa.array(rows["lag"], pa.int32()),
            "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
            "acf": pa.array(rows["acf"], pa.float64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], _one,
                                     out_schema))


SPEARMAN_EVENTS_SQL = """
WITH e AS (
  SELECT event_type, ts, value FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
r AS (
  SELECT event_type,
         RANK() OVER (PARTITION BY event_type ORDER BY value)
           + (COUNT(*) OVER (PARTITION BY event_type, value) - 1) / 2.0
           AS rv,
         RANK() OVER (PARTITION BY event_type ORDER BY ts)
           + (COUNT(*) OVER (PARTITION BY event_type, ts) - 1) / 2.0
           AS rt
  FROM e)
SELECT event_type, COUNT(*) AS n,
       ROUND(CORR(rv, rt), 6) AS spearman
FROM r GROUP BY 1
"""


def q_spearman_events(sf_dir: str):
    """Per-key SPEARMAN rank correlation of value vs time — the robust
    (outlier-immune) monotonic-trend detector: average-ranks with exact
    tie handling, then Pearson over the ranks.  One keyed exchange
    (sorted_group_map on event_type); ranks are per-group vectorized
    (argsort + run-length tie averaging, no Python per row).  Per-key
    rows must fit a block — the same per-series assumption as the shape
    features (a per-key rank is inherently a per-key sort).
    ORACLE-CHECKED against the RANK()/COUNT() average-rank window
    derivation + CORR."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()),
                            ("spearman", pa.float64())])

    def _avg_ranks(x: np.ndarray) -> np.ndarray:
        """Average rank (1-based) with exact tie handling."""
        order = np.argsort(x, kind="stable")
        xs = x[order]
        n = len(x)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = xs[1:] != xs[:-1]
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], n)
        avg = (starts + ends - 1) / 2.0 + 1.0  # mean of 1-based positions
        ranks = np.empty(n, dtype=np.float64)
        ranks[order] = np.repeat(avg, ends - starts)
        return ranks

    def _one(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy(zero_copy_only=False)
        t = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        rv = _avg_ranks(v.astype(np.float64))
        rt = _avg_ranks(t.astype(np.float64))
        cv, ct = rv - rv.mean(), rt - rt.mean()
        denom = np.sqrt(np.sum(cv * cv) * np.sum(ct * ct))
        rho = float(np.sum(cv * ct) / denom) if denom > 0 else float("nan")
        return pa.table({
            "event_type": group["event_type"].slice(0, 1),
            "n": pa.array([len(group)], pa.int64()),
            "spearman": pa.array([rho], pa.float64(),
                                 mask=[not np.isfinite(rho)]),
        }, schema=out_schema)

    return _collect(sorted_group_map(ds, ["event_type"], _one,
                                     out_schema))


USER_SEQUENCES_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       STRING_AGG(event_type, ',' ORDER BY ts, event_id) AS seq
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL
  AND event_type IS NOT NULL AND event_id IS NOT NULL
GROUP BY 1
"""


def q_user_sequences(sf_dir: str):
    """Per-user ORDERED event-sequence assembly (the behavior-sequence
    builder of session/recommendation training data): every user's
    event types concatenate in (ts, event_id) order.  One keyed
    exchange (sorted_group_map on user_id), then a fully vectorized
    block kernel: re-sort the block by (user, ts, id), derive runs,
    build ONE ListArray from the run offsets, one binary_join — no
    Python per group.  Order inside the group is total (event_id
    tie-break), so the string is deterministic.  ORACLE-CHECKED against
    STRING_AGG(... ORDER BY ts, event_id)."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def _clean(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(batch["user_id"]),
                    pc.is_valid(batch["ts"])),
            pc.and_(pc.is_valid(batch["event_type"]),
                    pc.is_valid(batch["event_id"])))
        return batch.filter(m)

    clean = ds.map_batches(_clean, batch_format="pyarrow",
                           zero_copy_batch=True)
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_events", pa.int64()),
                            ("seq", pa.string())])

    def _assemble(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("ts", "ascending"),
                             ("event_id", "ascending")])
        starts, ends = _runs(tbl, ["user_id"])
        offs = np.append(starts, len(tbl)).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            tbl["event_type"].combine_chunks())
        seq = pc.binary_join(lists, ",")
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "user_id": tbl["user_id"].take(idx),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "seq": pc.cast(seq, pa.string()),
        }, schema=out_schema)

    return _collect(sorted_group_map(clean, ["user_id"], None,
                                     out_schema, block_fn=_assemble))


CC_EVENTS_SQL = """
SELECT event_id,
       MIN(event_id) OVER (PARTITION BY user_id) AS component
FROM events
WHERE event_id IS NOT NULL AND user_id IS NOT NULL
"""


def q_cc_events(sf_dir: str):
    """Distributed connected components (stages/components: alternating
    large-star/small-star over slim int64 edge pairs, exact star-check
    stop rule) — ORACLE-CHECKED end to end: the edge fixture chains each
    user's events consecutively (edge i->i+1 in event_id order, chains up
    to hundreds of hops), the GENERIC component algorithm — which never
    sees user_id — must rediscover exactly MIN(event_id) OVER (PARTITION
    BY user_id), and isolated nodes (single-event users) label
    themselves via attach_components."""
    from ..stages.components import attach_components, connected_components
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_id", "user_id"])

    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _chain_edges(batch: pa.Table) -> pa.Table:
        """Whole-block kernel over user-sorted rows: consecutive
        event_id pairs within each user run, vectorized."""
        if len(batch) == 0:
            return edge_schema.empty_table()
        starts, ends = _runs(batch, ["user_id"])
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        inv = np.repeat(np.arange(len(starts)), ends - starts)
        order = np.lexsort((ev, inv))
        ev_s, inv_s = ev[order], inv[order]
        adjacent = inv_s[1:] == inv_s[:-1]
        return pa.table({"a": ev_s[:-1][adjacent],
                         "b": ev_s[1:][adjacent]}, schema=edge_schema)

    edges = sorted_group_map(ds, ["user_id"], None, edge_schema,
                             block_fn=_chain_edges)
    comps = connected_components(edges)
    nodes = ds.map_batches(
        lambda t: pa.table({"event_id": t["event_id"]}),
        batch_format="pyarrow")
    return _collect(attach_components(nodes, "event_id", comps))


def q_periodogram_peaks(sf_dir: str):
    """Spectral peak extraction: the 2 strongest periodogram frequencies
    per series — both sides rank the SAME 6-dp-rounded power (the
    shared rounding contract) with the harmonic index as tie-break, so
    the argmax cannot diverge on merge-order ulps; ORACLE-CHECKED."""
    import ray.data as rd

    from ..stages.topk import top_k_by_key

    tbl = q_periodogram(sf_dir)  # power already tie-robust-rounded
    ds = rd.from_arrow(tbl)
    return _collect(top_k_by_key(ds, ["event_type"], "power", 2,
                                 tiebreak_col="k", descending=True))


PACK_SEQUENCES_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
),
tc AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY 1),
c AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tok AS cum
  FROM tc
)
SELECT doc_id, n_tok,
       CAST(cum // 2048 AS BIGINT) AS pack_id,
       CAST(cum % 2048 AS BIGINT) AS pack_offset
FROM c
"""


def q_pack_sequences(sf_dir: str):
    """Sequence packing for pretraining examples (stages/scan): token
    counts per doc (the shared tokenizer), then a DISTRIBUTED EXCLUSIVE
    PREFIX SUM — one ordering sort, block totals scanned at
    block-count scale, per-block offset map — cutting fixed 2048-token
    windows; pure integer arithmetic, ORACLE-CHECKED against the
    running-sum window SQL."""
    import ray.data as rd

    from ..stages.scan import pack_sequences
    from ..stages.wordcount import doc_token_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    counts = doc_token_counts(ds, "doc_id", "text")
    return _collect(pack_sequences(counts, "doc_id", "n_tok", 2048))


def _epoch_shuffle_sql() -> str:
    from ..stages.sampling import hash_bucket_sql

    # full 0..2^32 hash (not the %100 bucket): drop the trailing %100
    h = hash_bucket_sql("doc_id", 7).rsplit(" % 100", 1)[0]
    return f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY {h}, doc_id) AS BIGINT)
         AS shuffle_rank
FROM documents
"""


def q_epoch_shuffle(sf_dir: str):
    """Deterministic epoch shuffle: every doc gets its global rank in
    salted-hash order (epoch = salt) — the reproducible
    training-data-order op (same permutation at any cluster size, a new
    permutation per epoch).  Rank = one ordering sort + the prefix-scan
    offsets (stages/scan.prefix_sum with unit weights); ORACLE-CHECKED
    against ROW_NUMBER over the bit-exact hash mirror."""
    import ray.data as rd

    from ..stages.sampling import _GOLD, _KNUTH, _MOD32
    from ..stages.scan import prefix_sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def _h(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        r1 = (ids.astype(np.uint64) * _KNUTH) % _MOD32
        h = ((r1 ^ ((np.uint64(7) * _GOLD) % _MOD32)) * _KNUTH) % _MOD32
        return pa.table({"doc_id": batch["doc_id"],
                         "h": pa.array(h.astype(np.int64), pa.int64()),
                         "one": pa.array(np.ones(len(ids), np.int64))})

    keyed = ds.map_batches(_h, batch_format="pyarrow",
                           zero_copy_batch=True)
    ranked = prefix_sum(keyed, ["h", "doc_id"], "one", out_col="rk")
    return _collect(ranked.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "shuffle_rank": pc.add(t["rk"], 1)}),
        batch_format="pyarrow"))


DECONTAMINATE_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, '[ \t\n\r\f\v]+') AS w
  FROM documents WHERE text IS NOT NULL
),
ev AS (SELECT doc_id, w FROM t WHERE doc_id % 10 = 0),
corpus AS (
  SELECT doc_id, w FROM t WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 400000 AS doc_id, list_slice(w, len(w)//2 + 1, len(w))
  FROM ev
),
eg AS (
  SELECT DISTINCT array_to_string(list_slice(w, i, i + 7), ' ') AS gram
  FROM (SELECT w, unnest(generate_series(1, len(w) - 7)) AS i FROM ev)
),
cg AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, i + 7), ' ') AS gram
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM corpus)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
FROM cg JOIN eg USING (gram) GROUP BY 1
"""


def q_decontaminate(sf_dir: str):
    """Eval-set decontamination (stages/dedup.decontaminate_counts):
    per corpus doc, its distinct 8-word grams appearing anywhere in the
    eval split — eval grams broadcast once, corpus probes with
    vectorized membership, NO exchange on the corpus side.  Fixture:
    eval = doc_id % 10 == 0, corpus = the rest ∪ planted second-half
    copies of eval docs (+400000, the passage-dedup list_slice trick);
    ORACLE-CHECKED against the DuckDB gram join."""
    import ray.data as rd

    from ..stages.dedup import decontaminate_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _eval_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 10 == 0))

    def _corpus_side(batch: pa.Table) -> pa.Table:
        import re

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) and ids.max() >= 400_000:
            raise ValueError(
                "decontaminate fixture assumes doc_id < 400000")
        keep = batch.filter(pa.array(ids % 10 != 0))
        ev = batch.filter(pa.array(ids % 10 == 0))
        pat = re.compile(r"[ \t\n\r\f\v]+")
        planted_ids, planted_tx = [], []
        for did, txt in zip(ev["doc_id"].to_pylist(),
                            ev["text"].to_pylist()):
            w = pat.split(txt or "")
            planted_ids.append(did + 400_000)
            planted_tx.append(" ".join(w[len(w) // 2:]))
        planted = pa.table({"doc_id": pa.array(planted_ids, pa.int64()),
                            "text": pa.array(planted_tx, pa.string())})
        return pa.concat_tables([keep, planted])

    eval_ds = ds.map_batches(_eval_side, batch_format="pyarrow")
    corpus = ds.map_batches(_corpus_side, batch_format="pyarrow")
    return _collect(decontaminate_counts(corpus, eval_ds, window=8))


EWMA_DAILY_SQL = """
WITH RECURSIVE pts AS (
  SELECT event_type, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
b AS (
  SELECT event_type,
         (t_us // 86400000000) * 86400000000 AS bucket_ts_us,
         AVG(v) AS m, COUNT(*) AS n
  FROM pts GROUP BY 1, 2
),
rb AS (
  SELECT event_type, bucket_ts_us, m, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY bucket_ts_us) AS rn
  FROM b
),
s(event_type, rn, ewma) AS (
  SELECT event_type, rn, m FROM rb WHERE rn = 1
  UNION ALL
  SELECT p.event_type, p.rn, 0.2 * p.m + 0.8 * s.ewma
  FROM rb p JOIN s ON p.event_type = s.event_type AND p.rn = s.rn + 1
)
SELECT rb.event_type, rb.bucket_ts_us, rb.n,
       ROUND(rb.m, 6) AS mean, ROUND(s.ewma, 6) AS ewma
FROM rb JOIN s USING (event_type, rn)
"""


def q_ewma_daily(sf_dir: str):
    """Exponential smoothing per series over the daily bucket means —
    the inherently SEQUENTIAL time-series op (s_i = a*v_i + (1-a)*s_1..)
    the mergeable-state family cannot express: each series co-locates on
    the one keyed sort and smooths in-kernel with pandas' C ewm
    (adjust=False computes exactly the oracle's recursion — the same
    two products per step, and IEEE addition commutes, so the values
    track the recursive-CTE oracle step-for-step); ORACLE-CHECKED."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])

    def _pts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "t_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
            "v": pc.cast(batch["value"], pa.float64()),
        })

    pts = ds.map_batches(_pts, batch_format="pyarrow",
                         zero_copy_batch=True)
    step = 86_400_000_000
    out_schema = pa.schema([
        ("event_type", pa.string()), ("bucket_ts_us", pa.int64()),
        ("n", pa.int64()), ("mean", pa.float64()),
        ("ewma", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        import pandas as pd

        t = group["t_us"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        b = (t // step) * step
        order = np.argsort(b, kind="stable")
        b_s, v_s = b[order], v[order]
        starts = np.concatenate(
            [[0], np.nonzero(b_s[1:] != b_s[:-1])[0] + 1])
        ends = np.append(starts[1:], len(b_s))
        n = (ends - starts).astype(np.int64)
        m = np.add.reduceat(v_s, starts) / n
        ew = pd.Series(m).ewm(alpha=0.2, adjust=False).mean().to_numpy()
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()]
                                   * len(n), pa.string()),
            "bucket_ts_us": pa.array(b_s[starts], pa.int64()),
            "n": pa.array(n, pa.int64()),
            "mean": pa.array(m, pa.float64()),
            "ewma": pa.array(ew, pa.float64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(pts, ["event_type"], _one,
                                     out_schema))


DAILY_RETENTION_SQL = """
WITH du AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 86400000000) * 86400000000 AS day_us
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
)
SELECT a.day_us,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_retained
FROM du a LEFT JOIN du b
  ON a.user_id = b.user_id AND b.day_us = a.day_us - 86400000000
GROUP BY 1
"""


def q_daily_retention(sf_dir: str):
    """Day-over-day retention: per day, active users and how many were
    also active the PREVIOUS day.  Slim two-level distinct (the
    distinct_count_exact discipline: block pre-distinct, 16-byte (user,
    day) pairs), ONE user-keyed sort, vectorized consecutive-day
    detection inside each user run, per-day partial counts summed in a
    tiny day-keyed groupby; ORACLE-CHECKED against the self-join SQL."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])
    step = 86_400_000_000

    def _pairs(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch["ts"], pa.int64()),
                    pa.int64()).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        d = (t // step) * step
        tbl = pa.table({"user_id": pa.array(u, pa.int64()),
                        "day_us": pa.array(d, pa.int64())})
        return tbl.group_by(["user_id", "day_us"]).aggregate(
            []).select(["user_id", "day_us"])

    pairs = ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    mid_schema = pa.schema([("day_us", pa.int64()),
                            ("active", pa.int64()),
                            ("retained", pa.int64())])

    def _per_user(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return mid_schema.empty_table()
        starts, ends = _runs(batch, ["user_id"])
        days = batch["day_us"].to_numpy(zero_copy_only=False)
        inv = np.repeat(np.arange(len(starts)), ends - starts)
        order = np.lexsort((days, inv))
        d_s, inv_s = days[order], inv[order]
        # distinct (user, day) pairs may still duplicate ACROSS blocks
        # of the pre-distinct pass; runs here are whole users, so a
        # global dedup within the run is exact
        keep = np.ones(len(d_s), dtype=bool)
        keep[1:] = ~((inv_s[1:] == inv_s[:-1]) & (d_s[1:] == d_s[:-1]))
        d_s, inv_s = d_s[keep], inv_s[keep]
        retained = np.zeros(len(d_s), dtype=np.int64)
        same_user = inv_s[1:] == inv_s[:-1]
        consec = same_user & (d_s[1:] - d_s[:-1] == step)
        retained[1:][consec] = 1
        uday, idx = np.unique(d_s, return_inverse=True)
        act = np.bincount(idx)
        ret = np.bincount(idx, weights=retained).astype(np.int64)
        return pa.table({"day_us": pa.array(uday, pa.int64()),
                         "active": pa.array(act, pa.int64()),
                         "retained": pa.array(ret, pa.int64())},
                        schema=mid_schema)

    partials = sorted_group_map(pairs, ["user_id"], None, mid_schema,
                                block_fn=_per_user)
    summed = partials.groupby("day_us").sum(["active", "retained"])
    return _collect(summed.map_batches(
        lambda t: pa.table({
            "day_us": t["day_us"],
            "n_active": pc.cast(t["sum(active)"], pa.int64()),
            "n_retained": pc.cast(t["sum(retained)"], pa.int64())}),
        batch_format="pyarrow"))


COHORT_RETENTION_SQL = """
WITH du AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 604800000000) * 604800000000 AS week_us
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
c AS (SELECT user_id, MIN(week_us) AS cohort_week_us FROM du GROUP BY 1)
SELECT c.cohort_week_us,
       CAST((du.week_us - c.cohort_week_us) // 604800000000 AS BIGINT)
         AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM du JOIN c USING (user_id)
GROUP BY 1, 2
"""


def _cohort_retention_ds(sf_dir: str, driver_limit_rows: int = 2_000_000):
    """Dataset half of q_cohort_retention, exposed so tests can force the
    distributed-sort path (driver_limit_rows=0) and pin it equal."""
    from ray.data.aggregate import Sum

    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])
    step = 604_800_000_000

    def _pairs(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch["ts"], pa.int64()),
                    pa.int64()).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        w = (t // step) * step
        tbl = pa.table({"user_id": pa.array(u, pa.int64()),
                        "week_us": pa.array(w, pa.int64())})
        return tbl.group_by(["user_id", "week_us"]).aggregate(
            []).select(["user_id", "week_us"])

    pairs = ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    out_schema = pa.schema([("cohort_week_us", pa.int64()),
                            ("week_offset", pa.int64()),
                            ("n_part", pa.int64())])

    def _cohort_block(batch: pa.Table) -> pa.Table:
        """Vectorized whole-user-group kernel over a user-sorted batch:
        dedupe (user, week) across blocks, cohort = each user's first
        week, emit per-block PARTIAL (cohort, offset) counts."""
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        w = batch["week_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        keep = np.empty(len(us), dtype=bool)
        keep[0] = True
        keep[1:] = (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])
        us, ws = us[keep], ws[keep]
        new_user = np.empty(len(us), dtype=bool)
        new_user[0] = True
        new_user[1:] = us[1:] != us[:-1]
        starts = np.nonzero(new_user)[0]
        runs = np.diff(np.append(starts, len(us)))
        cohort = np.repeat(ws[starts], runs)
        part = pa.table({"cohort_week_us": pa.array(cohort, pa.int64()),
                         "week_offset": pa.array((ws - cohort) // step,
                                                 pa.int64())})
        p = part.group_by(["cohort_week_us", "week_offset"]).aggregate(
            [([], "count_all")])
        return pa.table({"cohort_week_us": p["cohort_week_us"],
                         "week_offset": p["week_offset"],
                         "n_part": pc.cast(p["count_all"], pa.int64())})

    # ONE user-keyed exchange does distinct + per-user MIN + offsets
    # (the former pipeline paid a (user,week) groupby, a user groupby,
    # and an UNGATED user-count-scale driver collect for the cohort
    # broadcast — a scale-killer at crawl scale, VERDICT r3 #3)
    parts = sorted_group_map(pairs, ["user_id"], None, out_schema,
                             block_fn=_cohort_block,
                             driver_limit_rows=driver_limit_rows)
    out = parts.groupby(["cohort_week_us", "week_offset"]).aggregate(
        Sum("n_part", alias_name="n_users"))
    return out.map_batches(
        lambda t: pa.table({
            "cohort_week_us": t["cohort_week_us"],
            "week_offset": t["week_offset"],
            "n_users": pc.cast(t["n_users"], pa.int64())}),
        batch_format="pyarrow")


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by their FIRST active week
    (the cohort), counted in every later week they return — the
    standard growth-analytics triangle.  Block pre-distinct (user, week)
    pairs, then ONE user-keyed sorted_group_map whose vectorized block
    kernel dedupes, derives each user's cohort (min week) and emits
    partial (cohort, offset) counts — no per-user driver collect, no
    broadcast; final merge is one tiny keyed groupby; ORACLE-CHECKED."""
    return _collect(_cohort_retention_ds(sf_dir))


FUNNEL_USERS_SQL = """
WITH m AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS ta,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS tb
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1
)
SELECT user_id, ta AS t_click, tb AS t_purchase
FROM m WHERE ta IS NOT NULL AND tb IS NOT NULL AND ta < tb
"""


def q_funnel_users(sf_dir: str):
    """Funnel analysis: users whose first 'click' precedes their first
    'purchase' — per-user MIN-per-stage is a MERGEABLE aggregate, so
    the whole funnel is block partials + one slim user-keyed groupby
    and a stateless filter; ORACLE-CHECKED against the conditional-MIN
    SQL."""
    from ray.data.aggregate import Min

    ds = _events_nonnull(sf_dir, ["user_id", "event_type", "ts"])

    def _stage_times(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64())
        et = batch["event_type"]
        big = np.int64(1 << 62)
        tn = t.to_numpy(zero_copy_only=False)
        ea = np.where(np.asarray(pc.equal(et, "click")), tn, big)
        eb = np.where(np.asarray(pc.equal(et, "purchase")), tn, big)
        return pa.table({"user_id": batch["user_id"],
                         "ta": pa.array(ea, pa.int64()),
                         "tb": pa.array(eb, pa.int64())})

    staged = ds.map_batches(_stage_times, batch_format="pyarrow",
                            zero_copy_batch=True)
    mins = staged.groupby("user_id").aggregate(
        Min("ta", alias_name="ta"), Min("tb", alias_name="tb"))

    big = 1 << 62

    def _funnel(batch: pa.Table) -> pa.Table:
        ta = batch["ta"].to_numpy(zero_copy_only=False)
        tb = batch["tb"].to_numpy(zero_copy_only=False)
        keep = (ta < big) & (tb < big) & (ta < tb)
        out = batch.filter(pa.array(keep))
        return pa.table({"user_id": out["user_id"],
                         "t_click": out["ta"],
                         "t_purchase": out["tb"]})

    return _collect(mins.map_batches(_funnel, batch_format="pyarrow",
                                     zero_copy_batch=True))


def _corpus_prep_sql() -> str:
    from ..stages.sampling import hash_bucket_sql

    return f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
),
tc AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY 1),
gated AS (
  SELECT d.doc_id, d.text, tc.n_tok
  FROM documents d JOIN tc USING (doc_id) WHERE tc.n_tok >= 50
),
dedup AS (
  SELECT doc_id, text, n_tok FROM (
    SELECT doc_id, text, n_tok,
           MIN(doc_id) OVER (PARTITION BY text) AS m FROM gated)
  WHERE doc_id = m
),
corp AS (SELECT * FROM dedup WHERE doc_id % 10 <> 0),
evw AS (
  SELECT regexp_split_to_array(text, '[ \t\n\r\f\v]+') AS w
  FROM documents WHERE doc_id % 10 = 0 AND text IS NOT NULL
),
evg AS (
  SELECT DISTINCT array_to_string(list_slice(w, i, i + 7), ' ') AS gram
  FROM (SELECT w, unnest(generate_series(1, len(w) - 7)) AS i FROM evw)
),
cw AS (
  SELECT doc_id, regexp_split_to_array(text, '[ \t\n\r\f\v]+') AS w
  FROM corp
),
cg AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(w, i, i + 7), ' ') AS gram
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM cw)
),
contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN evg USING (gram)),
clean AS (
  SELECT doc_id, n_tok FROM corp
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
sp AS (
  SELECT doc_id, n_tok,
         CASE WHEN {hash_bucket_sql('doc_id', 0)} < 80
              THEN 'train' ELSE 'test' END AS split
  FROM clean
),
tr AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tok AS cum
  FROM sp WHERE split = 'train'
)
SELECT doc_id, n_tok, 'train' AS split,
       CAST(cum // 2048 AS BIGINT) AS pack_id,
       CAST(cum % 2048 AS BIGINT) AS pack_offset
FROM tr
UNION ALL
SELECT doc_id, n_tok, 'test' AS split,
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM sp WHERE split = 'test'
"""


def q_corpus_prep(sf_dir: str):
    """The COMPOSED flagship LLM-data pipeline, end-to-end in one lazy
    Dataset chain: token-count quality gate -> exact-dedup corpus filter
    -> eval-set decontamination (anti-join on the broadcast overlap ids)
    -> deterministic 80/20 split -> train-set sequence packing via the
    distributed prefix scan.  Every stage is an existing operator; the
    whole composition is ORACLE-CHECKED against one SQL derivation —
    the 'a user can run their entire prep as one pipeline' proof."""
    import ray.data as rd

    from ..stages.dedup import decontaminate_counts, exact_dedup
    from ..stages.joins import anti_join_broadcast, attach_broadcast, \
        collect_small, semi_join_broadcast
    from ..stages.sampling import attach_split
    from ..stages.scan import pack_sequences
    from ..stages.wordcount import doc_token_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    # 1. token counts (shared tokenizer) -> quality gate n_tok >= 50
    counts = doc_token_counts(docs, "doc_id", "text")
    lookup = collect_small(counts)
    gated = attach_broadcast(docs, lookup, "doc_id", ["n_tok"],
                             how="inner")
    gated = gated.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tok"], 50)),
        batch_format="pyarrow")

    # 2. exact-dedup corpus filter: winner ids (16-byte-row shuffle)
    # semi-joined back via broadcast — the partitioned Dataset.join path
    # (exact_dedup_filter, pinned by the dedup_filter query) is the
    # web-scale variant; winner-id sets here are gate-small
    winners = exact_dedup(gated).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"]}),
        batch_format="pyarrow")
    deduped = semi_join_broadcast(gated, "doc_id", winners)

    # 3. decontamination vs the eval split (doc_id % 10 == 0)
    corp = deduped.map_batches(
        lambda t: t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 10 != 0)),
        batch_format="pyarrow")
    eval_ds = docs.map_batches(
        lambda t: t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 10 == 0)),
        batch_format="pyarrow")
    contaminated = decontaminate_counts(corp, eval_ds, window=8)
    clean = anti_join_broadcast(
        corp, "doc_id",
        contaminated.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"]}),
            batch_format="pyarrow"))

    # 4. deterministic split; 5. pack the train docs
    sp = attach_split(
        clean.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "n_tok": t["n_tok"]}),
            batch_format="pyarrow"),
        "doc_id", train_pct=80, salt=0)
    train = sp.map_batches(
        lambda t: t.filter(pc.equal(t["split"], "train"))
                   .select(["doc_id", "n_tok"]),
        batch_format="pyarrow")
    packed = pack_sequences(train, "doc_id", "n_tok", 2048)
    packed = packed.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"], "n_tok": t["n_tok"],
            "split": pa.array(["train"] * len(t), pa.string()),
            "pack_id": t["pack_id"], "pack_offset": t["pack_offset"]}),
        batch_format="pyarrow")
    test = sp.map_batches(
        lambda t: (lambda f: pa.table({
            "doc_id": f["doc_id"], "n_tok": f["n_tok"],
            "split": pa.array(["test"] * len(f), pa.string()),
            "pack_id": pa.nulls(len(f), pa.int64()),
            "pack_offset": pa.nulls(len(f), pa.int64())}))(
                t.filter(pc.equal(t["split"], "test"))),
        batch_format="pyarrow")
    return _collect(packed.union(test))


EVENTS_CUBE_SQL = """
SELECT event_type,
       (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_v
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
GROUP BY GROUPING SETS ((event_type, day_us), (event_type), (day_us),
                        ())
"""


LATEST_EVENTS_SQL = """
SELECT user_id, event_id, t_us FROM (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id) AS rn
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
) WHERE rn = 1
"""


def q_latest_events(sf_dir: str):
    """Upsert/compaction semantics: the LATEST record per key (last
    event per user by timestamp, event_id tie-break) — grouped top-1
    through the block-pruning topk stage (at most one row per key
    leaves any block); ORACLE-CHECKED against ROW_NUMBER DESC."""
    from ..stages.topk import top_k_by_key

    ds = _events_nonnull(sf_dir, ["user_id", "event_id", "ts"])

    def _t(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "t_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
        })

    pts = ds.map_batches(_t, batch_format="pyarrow", zero_copy_batch=True)
    # ROW_NUMBER(ORDER BY t DESC, event_id ASC) = 1: negate the
    # tie-break is unnecessary — topk's tiebreak is ascending, matching
    top = top_k_by_key(pts, ["user_id"], "t_us", 1,
                       tiebreak_col="event_id", descending=True)
    return _collect(top.map_batches(
        lambda t: t.select(["user_id", "event_id", "t_us"]),
        batch_format="pyarrow"))


def q_incremental_rollup(sf_dir: str):
    """Incremental continuous aggregation — the mergeable-state promise
    made driver-visible: the input splits into an OLD batch (first ~20
    days) and a NEW batch (the rest); each produces its own partial
    states INDEPENDENTLY (as a nightly ingest would), the two partial
    sets merge WITHOUT touching old points again, and the finalized 1d
    rollup must equal the oracle computed over ALL points at once."""
    cfg = _events_cfg(sf_dir, ("1d",))
    points = points_dataset(cfg).materialize()
    cut_us = 1_700_000_000_000_000 + 20 * 86_400_000_000

    old = points.map_batches(
        lambda t: t.filter(pa.array(
            t["t_us"].to_numpy(zero_copy_only=False) < cut_us)),
        batch_format="pyarrow")
    new = points.map_batches(
        lambda t: t.filter(pa.array(
            t["t_us"].to_numpy(zero_copy_only=False) >= cut_us)),
        batch_format="pyarrow")
    stats_old = tier_stats(old, ("1h", "1d"))
    stats_new = tier_stats(new, ("1h", "1d"))

    from ..stages.aggregate import merge_partials

    merged = merge_partials(stats_old["1d"].union(stats_new["1d"]))
    feats = finalize_tiers({"1d": merged})
    feats = attach_beyond(feats, points, cfg.n_std, cfg)
    return _collect(feats["1d"])


def q_events_cube(sf_dir: str):
    """OLAP grouping-sets cube: (type, day) / (type) / (day) / ()
    aggregates in one pass — the FINEST level reduces from raw points
    once (block combiner + one keyed groupby), every coarser level
    CASCADES from it (the retention-tier discipline: sums of sums, no
    second pass over the fact table); ORACLE-CHECKED against GROUPING
    SETS (coarse-level float sums differ from the oracle's direct
    summation only in merge order — the shared tie-robust rounding
    collapses it)."""
    from ray.data.aggregate import Count, Sum

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    step = 86_400_000_000

    def _pts(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(batch["ts"], pa.int64()),
                    pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "day_us": pa.array((t // step) * step, pa.int64()),
            "v": pc.cast(batch["value"], pa.float64()),
        })

    pts = ds.map_batches(_pts, batch_format="pyarrow",
                         zero_copy_batch=True)
    base = pts.groupby(["event_type", "day_us"]).aggregate(
        Count(alias_name="n"), Sum("v", alias_name="sv")).materialize()

    def _shape(tbl: pa.Table, with_type: bool, with_day: bool,
               n_col: str, sv_col: str) -> pa.Table:
        k = len(tbl)
        return pa.table({
            "event_type": (tbl["event_type"] if with_type
                           else pa.nulls(k, pa.string())),
            "day_us": (tbl["day_us"] if with_day
                       else pa.nulls(k, pa.int64())),
            "n": pc.cast(tbl[n_col], pa.int64()),
            "sum_v": pc.cast(tbl[sv_col], pa.float64()),
        })

    fine = base.map_batches(
        lambda t: _shape(t, True, True, "n", "sv"),
        batch_format="pyarrow")
    by_type = base.groupby("event_type").sum(["n", "sv"]).map_batches(
        lambda t: _shape(t, True, False, "sum(n)", "sum(sv)"),
        batch_format="pyarrow")
    by_day = base.groupby("day_us").sum(["n", "sv"]).map_batches(
        lambda t: _shape(t, False, True, "sum(n)", "sum(sv)"),
        batch_format="pyarrow")
    total = _collect_raw(base)
    grand = pa.table({
        "event_type": pa.nulls(1, pa.string()),
        "day_us": pa.nulls(1, pa.int64()),
        "n": pa.array([int(np.sum(
            total["n"].to_numpy(zero_copy_only=False)))], pa.int64()),
        "sum_v": pa.array([float(np.sum(
            total["sv"].to_numpy(zero_copy_only=False)))], pa.float64()),
    })
    import ray.data as rd

    return _collect(fine.union(by_type, by_day, rd.from_arrow(grand)))


def q_heavy_users(sf_dir: str):
    """Top-10 heavy hitters (stages/sketch.heavy_hitters_cms): one pass
    emitting block-local candidates + one linear Count-Min blob per
    block; blobs sum in any order, estimates are one-sided (never an
    undercount).  Rows-only driver check — the estimate is
    sketch-valued; overestimate/exactness/merge-invariance are the unit
    oracles (tests/test_sketch.py)."""
    from ..stages.sketch import heavy_hitters_cms

    ds = _events_nonnull(sf_dir, ["user_id"])
    return _collect(heavy_hitters_cms(ds, ["user_id"], k=10))


HISTOGRAM_EVENTS_SQL = """
WITH m AS (
  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT e.event_type,
       CAST(CASE WHEN m.vmax = m.vmin THEN 0
            ELSE LEAST(FLOOR((e.value - m.vmin)
                             / ((m.vmax - m.vmin) / 10.0)), 9.0)
            END AS BIGINT) AS bin,
       COUNT(*) AS n
FROM events e JOIN m USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY 1, 2
"""


def q_histogram_events(sf_dir: str):
    """Per-key equi-width histogram: two-pass — per-type (min, max) via
    one slim groupby, broadcast to a stateless binning map (bin
    arithmetic mirrors the SQL operation-for-operation so boundary
    points land identically), per-block combiner counts, one keyed
    merge; ORACLE-CHECKED."""
    from ray.data.aggregate import Max, Min

    from ..stages.joins import attach_broadcast
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "value"])
    mm = _collect_raw(ds.groupby("event_type").aggregate(
        Min("value", alias_name="vmin"), Max("value", alias_name="vmax")))
    with_mm = attach_broadcast(ds, mm, "event_type", ["vmin", "vmax"])

    out_schema = pa.schema([("event_type", pa.string()),
                            ("bin", pa.int64()), ("n", pa.int64())])

    def _bins(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        lo = batch["vmin"].to_numpy(zero_copy_only=False)
        hi = batch["vmax"].to_numpy(zero_copy_only=False)
        # mirrors the SQL expression exactly, incl. the div-by-10 order
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.floor((v - lo) / ((hi - lo) / 10.0))
        b = np.where(hi == lo, 0.0, np.minimum(raw, 9.0)).astype(np.int64)
        tbl = pa.table({"event_type": batch["event_type"],
                        "bin": pa.array(b, pa.int64())})
        g = tbl.group_by(["event_type", "bin"]).aggregate([("bin", "count")])
        return g.rename_columns(["event_type", "bin", "n"])

    partials = with_mm.map_batches(_bins, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, _ = _runs(batch, ["event_type", "bin"])
        sums = np.add.reduceat(
            batch["n"].to_numpy(zero_copy_only=False), starts)
        idx = pa.array(starts, pa.int64())
        return pa.table({"event_type": batch["event_type"].take(idx),
                         "bin": batch["bin"].take(idx),
                         "n": pa.array(sums, pa.int64())},
                        schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type", "bin"],
                                     None, out_schema, block_fn=_merge))


ZSCORE_EVENTS_SQL = """
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6)
         AS z
FROM events
WHERE value IS NOT NULL AND event_id IS NOT NULL
"""


def q_zscore_events(sf_dir: str):
    """Per-key z-score normalization (feature-engineering staple):
    per-type (mean, std) via one slim groupby aggregate, broadcast to a
    stateless map — the fact table never shuffles; ORACLE-CHECKED
    against the window SQL (merge-order ulps collapsed by the shared
    tie-robust rounding)."""
    from ray.data.aggregate import Mean, Std

    from ..stages.joins import attach_broadcast

    ds = _events_nonnull(sf_dir, ["event_id", "event_type", "value"])
    mm = _collect_raw(ds.groupby("event_type").aggregate(
        Mean("value", alias_name="mu"), Std("value", alias_name="sd")))
    with_mm = attach_broadcast(ds, mm, "event_type", ["mu", "sd"])

    from ..kernels.rounding import round6_tie_robust

    def _z(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        mu = batch["mu"].to_numpy(zero_copy_only=False)
        sd = batch["sd"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - mu) / sd
        mask = ~np.isfinite(z)
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "z": pa.array(round6_tie_robust(z), pa.float64(),
                                       mask=mask)})

    return _collect(with_mm.map_batches(_z, batch_format="pyarrow",
                                        zero_copy_batch=True))


def _impute_events_sql() -> str:
    # the synthetic events table has no stored NULLs, so both engines
    # PLANT the same deterministic ~10% nulls from the event_id hash
    # (the pii_redact discipline) — the imputation genuinely fires
    from ..stages.sampling import hash_bucket_sql

    return f"""
WITH e AS (
  SELECT event_id, event_type,
         CASE WHEN {hash_bucket_sql('event_id', 3)} < 10
              THEN NULL ELSE value END AS value
  FROM events
  WHERE event_id IS NOT NULL AND event_type IS NOT NULL)
SELECT event_id, event_type,
       ROUND(COALESCE(value,
                      AVG(value) OVER (PARTITION BY event_type)), 6)
         AS value_imputed,
       value IS NULL AS was_null
FROM e
"""


def q_impute_events(sf_dir: str):
    """Per-key mean imputation (the null-fill preprocessing staple):
    per-type means over the NON-NULL values via one slim groupby
    aggregate, broadcast to a stateless coalesce map — the fact table
    never shuffles, nulls fill with their key's mean, non-null values
    pass through untouched.  ORACLE-CHECKED against the window-AVG
    COALESCE (merge-order ulps collapsed by tie-robust rounding on the
    filled values only)."""
    import ray.data as rd
    from ray.data.aggregate import Mean

    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import attach_broadcast
    from ..stages.sampling import hash_bucket

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def _clean(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["event_id"]),
                                     pc.is_valid(batch["event_type"])))
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        plant = hash_bucket(ids, salt=3) < 10
        v = pc.if_else(pa.array(plant),
                       pa.nulls(len(batch), pa.float64()),
                       pc.cast(batch["value"], pa.float64()))
        return batch.set_column(batch.schema.get_field_index("value"),
                                "value", v)

    clean = ds.map_batches(_clean, batch_format="pyarrow",
                           zero_copy_batch=True)
    mm = _collect_raw(clean.groupby("event_type").aggregate(
        Mean("value", alias_name="mu")))
    with_mu = attach_broadcast(clean, mm, "event_type", ["mu"])

    def _fill(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        mu = batch["mu"].to_numpy(zero_copy_only=False)
        isnull = np.isnan(v)
        filled = round6_tie_robust(np.where(isnull, mu, v))
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "value_imputed": pa.array(filled, pa.float64()),
            "was_null": pa.array(isnull),
        })

    return _collect_raw(with_mu.map_batches(
        _fill, batch_format="pyarrow", zero_copy_batch=True))


ANTI_JOIN_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 6) AS total
FROM orders
WHERE o_custkey NOT IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def q_anti_join_orders(sf_dir: str):
    """Broadcast LEFT ANTI join (stages/joins.anti_join_broadcast — the
    corpus-exclusion/blocklist op): orders from customers NOT in the
    BUILDING segment; the blocklist side never shuffles (dedup + sort +
    one ray.put, vectorized searchsorted membership probe per batch),
    the fact side streams with no exchange; ORACLE-CHECKED against
    NOT IN."""
    import ray.data as rd

    from ..stages.joins import anti_join_broadcast

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    block = cust.map_batches(
        lambda t: pa.table({"o_custkey": t.filter(pc.equal(
            t["c_mktsegment"], "BUILDING"))["c_custkey"]}),
        batch_format="pyarrow")
    out = anti_join_broadcast(orders, "o_custkey", block)
    out = out.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "o_custkey": t["o_custkey"],
                            "total": t["o_totalprice"]}),
        batch_format="pyarrow")
    return _collect(out)


def _stratified_quota_sql() -> str:
    from ..stages.sampling import hash_bucket_sql

    return f"""
SELECT lang, doc_id, h, rn FROM (
  SELECT lang, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
  FROM (SELECT lang, doc_id,
               CAST({hash_bucket_sql('doc_id', 2)} AS BIGINT) AS h
        FROM documents))
WHERE rn <= 20
"""


def q_stratified_quota(sf_dir: str):
    """Exact per-group quota sampling: the 20 docs per lang with the
    smallest salted hash buckets (deterministic 'random' order, doc_id
    tie-break) — the balanced-subsample op (equal representation per
    language regardless of corpus skew).  Rides the grouped top-k stage
    ASCENDING over the sampling hash; ORACLE-CHECKED against the
    ROW_NUMBER SQL with the bit-exact hash mirror."""
    import ray.data as rd

    from ..stages.sampling import hash_bucket
    from ..stages.topk import top_k_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def _h(batch: pa.Table) -> pa.Table:
        b = hash_bucket(batch["doc_id"].to_numpy(zero_copy_only=False),
                        salt=2)
        return pa.table({"lang": batch["lang"], "doc_id": batch["doc_id"],
                         "h": pa.array(b, pa.int64())})

    keyed = ds.map_batches(_h, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = top_k_by_key(keyed, ["lang"], "h", 20, tiebreak_col="doc_id",
                       descending=False)
    return _collect(out)


TOPK_ORDERS_SQL = """
SELECT c_mktsegment, o_orderkey, ROUND(total, 6) AS total,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice AS total,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey)
           AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rn <= 3
"""


def q_topk_orders(sf_dir: str):
    """Grouped top-k (stages/topk): the 3 highest-value orders per market
    segment with a deterministic ROW_NUMBER rank — block-local per-key
    candidate pruning (at most k rows per key leave any block) + one
    slim re-rank exchange; the customer dimension attaches via broadcast
    lookup (stages/joins), never a shuffle.  ORACLE-CHECKED against the
    SQL window-function derivation."""
    import ray.data as rd

    from ..stages.joins import attach_broadcast, collect_small
    from ..stages.topk import top_k_by_key

    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["o_custkey"],
                         "o_orderkey": batch["o_orderkey"],
                         "total": pc.cast(batch["o_totalprice"],
                                          pa.float64())})

    keyed = orders.map_batches(_key, batch_format="pyarrow",
                               zero_copy_batch=True)
    seg = attach_broadcast(keyed, cust, "c_custkey", ["c_mktsegment"])
    top = top_k_by_key(seg, ["c_mktsegment"], "total", 3,
                       tiebreak_col="o_orderkey")

    def _sel(batch: pa.Table) -> pa.Table:
        return batch.select(["c_mktsegment", "o_orderkey", "total", "rn"])

    return _collect(top.map_batches(_sel, batch_format="pyarrow"))


def _skew_join_sql() -> str:
    return f"""
WITH j AS (
  SELECT o.o_orderpriority,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
),
a AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(rev) AS rev0
  FROM j GROUP BY 1
),
n9 AS (SELECT o_orderpriority, n_items,
       {_sig_round_sql('rev0', 9)} AS rev9 FROM a)
SELECT o_orderpriority, n_items,
       {_sig_round_sql('rev9', 6)} AS revenue FROM n9
"""


def q_skew_join(sf_dir: str):
    """Fact-to-fact join through the SKEW-SAFE router
    (stages/joins.join_skew_safe): a Count-Min pass nominates the top
    hot keys, whose rows join map-side via the duplicate-tolerant
    broadcast (attach_broadcast_multi) while the cold majority takes
    the straggler-free partitioned Dataset.join; the two disjoint
    streams union.  hot_k=16 so both paths genuinely carry rows at
    test scale (parity under FORCED 50%-skew is unit-pinned).  Same
    revenue aggregate + sig-round contract as revenue_by_segment;
    ORACLE-CHECKED against the plain SQL join."""
    import ray.data as rd

    from ..stages.joins import join_skew_safe
    from ..stages.sorted_groups import _runs, sorted_group_map

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        price = pc.cast(batch["l_extendedprice"], pa.float64())
        disc = pc.cast(batch["l_discount"], pa.float64())
        return pa.table({
            "o_orderkey": batch["l_orderkey"],
            "rev": pc.multiply(price, pc.subtract(
                pa.scalar(1.0, pa.float64()), disc)),
        })

    fact = li.map_batches(_rev, batch_format="pyarrow",
                          zero_copy_batch=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    # detect on the pruned single-column source read (no rev map)
    detect = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"]).rename_columns(
        {"l_orderkey": "o_orderkey"})
    joined = join_skew_safe(fact, "o_orderkey", orders,
                            ["o_orderpriority"], hot_k=16,
                            detect=detect)

    out_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n_items", pa.int64()),
                            ("revenue", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(["o_orderpriority", "rev"])
             .group_by(["o_orderpriority"])
             .aggregate([("rev", "count"), ("rev", "sum")]))
        return g.rename_columns(["o_orderpriority", "n_items", "revenue"])

    partials = joined.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, _ = _runs(batch, ["o_orderpriority"])
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"].take(idx),
            "n_items": pa.array(np.add.reduceat(
                batch["n_items"].to_numpy(zero_copy_only=False), starts)),
            "revenue": pa.array(np.add.reduceat(
                batch["revenue"].to_numpy(zero_copy_only=False), starts)),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["o_orderpriority"], None,
                                     out_schema, block_fn=_merge))


def _revenue_sql() -> str:
    return f"""
WITH j AS (
  SELECT c.c_mktsegment,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
a AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_items,
         SUM(rev) AS rev0
  FROM j GROUP BY 1
),
n9 AS (SELECT c_mktsegment, n_items,
       {_sig_round_sql('rev0', 9)} AS rev9 FROM a)
SELECT c_mktsegment, n_items,
       {_sig_round_sql('rev9', 6)} AS revenue FROM n9
"""


def q_revenue_by_segment(sf_dir: str):
    """Three-table join aggregation (TPC-H-flavoured): lineitem ⋈ orders
    ⋈ customer → revenue per market segment.  Join discipline per
    SURVEY §4: both dimension sides (orders keyed by orderkey, customer
    by custkey) broadcast via ray.put + vectorized searchsorted lookup
    inside map_batches — ONE streaming pass over the fact table, and the
    only exchange is the 5-row segment aggregate.  Above the broadcast
    gate (collect_small raises past 2M rows) the orders side switches to
    the hash-partitioned Dataset.join — parity-pinned in
    tests/test_joins_topk.py.  Revenue compares at 6 SIGNIFICANT digits
    (sums are unbounded-magnitude; same contract as reduced_chi2)."""
    import ray.data as rd

    from ..stages.joins import attach_broadcast, collect_small

    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]))
    orders = collect_small(rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def _rev(batch: pa.Table) -> pa.Table:
        price = pc.cast(batch["l_extendedprice"], pa.float64())
        disc = pc.cast(batch["l_discount"], pa.float64())
        return pa.table({
            "o_orderkey": batch["l_orderkey"],
            "rev": pc.multiply(price, pc.subtract(
                pa.scalar(1.0, pa.float64()), disc)),
        })

    facts = li.map_batches(_rev, batch_format="pyarrow",
                           zero_copy_batch=True)
    facts = attach_broadcast(facts, orders, "o_orderkey", ["o_custkey"])

    def _cust_key(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["o_custkey"],
                         "rev": batch["rev"]})

    facts = attach_broadcast(
        facts.map_batches(_cust_key, batch_format="pyarrow",
                          zero_copy_batch=True),
        cust, "c_custkey", ["c_mktsegment"])

    def _partial(batch: pa.Table) -> pa.Table:
        from ..kernels.moments import _group_codes

        if len(batch) == 0:
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "n_items": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.float64())})
        inv, first = _group_codes(batch, ["c_mktsegment"])
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        sums = np.bincount(inv, weights=rev)
        counts = np.bincount(inv)
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"].take(
                pa.array(first, pa.int64())),
            "n_items": pa.array(counts, pa.int64()),
            "revenue": pa.array(sums, pa.float64()),
        })

    partials = facts.map_batches(_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    agg = partials.groupby("c_mktsegment").sum(["n_items", "revenue"])

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "n_items": pc.cast(batch["sum(n_items)"], pa.int64()),
            "revenue": pc.cast(batch["sum(revenue)"], pa.float64()),
        })

    return _collect(agg.map_batches(_final, batch_format="pyarrow"))


_LS_T = 2_592_000.0  # 30 days in seconds: the events span; w_k = 2*pi*k/T
_LS_NFREQ = 8

PERIODOGRAM_SQL = f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS v
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
),
m AS (
  SELECT event_type, MIN(t_us) AS t0, AVG(v) AS ybar, COUNT(*) AS n
  FROM pts GROUP BY 1
),
f AS (SELECT unnest(generate_series(1, {_LS_NFREQ})) AS k),
g AS (
  SELECT p.event_type, f.k,
    2.0 * PI() * f.k / {_LS_T} AS w,
    (p.t_us - m.t0) / 1000000.0 AS t,
    p.v - m.ybar AS d
  FROM pts p JOIN m USING (event_type) CROSS JOIN f
),
tau AS (
  SELECT event_type, k,
    ATAN2(SUM(SIN(2.0 * w * t)), SUM(COS(2.0 * w * t)))
      / (2.0 * ANY_VALUE(w)) AS tau,
    ANY_VALUE(w) AS w
  FROM g GROUP BY 1, 2
),
agg AS (
  SELECT g.event_type, g.k,
    SUM(g.d * COS(g.w * (g.t - tau.tau))) AS cd,
    SUM(g.d * SIN(g.w * (g.t - tau.tau))) AS sd,
    SUM(COS(g.w * (g.t - tau.tau)) * COS(g.w * (g.t - tau.tau))) AS cc,
    SUM(SIN(g.w * (g.t - tau.tau)) * SIN(g.w * (g.t - tau.tau))) AS ss
  FROM g JOIN tau USING (event_type, k) GROUP BY 1, 2
),
vr AS (
  SELECT event_type, SUM(d * d) / (ANY_VALUE(m.n) - 1) AS s2
  FROM g JOIN m USING (event_type) WHERE k = 1 GROUP BY 1
)
SELECT agg.event_type, CAST(agg.k AS BIGINT) AS k,
  ROUND(0.5 * (cd * cd / cc + sd * sd / ss) / vr.s2, 6) AS power
FROM agg JOIN vr USING (event_type)
"""


def q_periodogram(sf_dir: str):
    """Distributed Lomb-Scargle periodogram (kernels/periodogram): the
    classic irregular-sampling spectral statistic of the light-curve
    world, per event series at 8 harmonics of the 30-day observation
    span — series co-located by the same one keyed sort every per-series
    kernel pays, power evaluated in one (freq x points) broadcast.
    ORACLE-CHECKED against the identical tau-offset formula written in
    pure SQL trig (same libm on both sides; 6-dp rounded)."""
    from ..kernels.periodogram import lomb_scargle
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])

    def _pts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "t_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
            "v": pc.cast(batch["value"], pa.float64()),
        })

    pts = ds.map_batches(_pts, batch_format="pyarrow",
                         zero_copy_batch=True)
    omegas = 2.0 * np.pi * np.arange(1, _LS_NFREQ + 1) / _LS_T
    out_schema = pa.schema([("event_type", pa.string()),
                            ("k", pa.int64()), ("power", pa.float64())])

    def _one(group: pa.Table) -> pa.Table:
        t_us = group["t_us"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        # identical arithmetic to the SQL: (t_us - min) / 1e6, d = v - avg
        t = (t_us - t_us.min()) / 1_000_000.0
        p = lomb_scargle(t, v, omegas)
        et = group["event_type"][0].as_py()
        return pa.table({
            "event_type": pa.array([et] * _LS_NFREQ, pa.string()),
            "k": pa.array(np.arange(1, _LS_NFREQ + 1), pa.int64()),
            "power": pa.array(p, pa.float64()),
        }).cast(out_schema)

    out = sorted_group_map(pts, ["event_type"], _one, out_schema)
    return _collect(out)


def q_interp_grid(sf_dir: str):
    """SURVEY §2b-O15: the reference's own end-to-end (R5+R6) as a query —
    per-series uniform linspace grid + reference-exact interpolation.

    Per-series apply goes through stages/sorted_groups.sorted_group_map
    (one sort + in-block run dispatch) like every other per-group kernel
    in the repo — not ``groupby().map_groups`` (one Ray task per group,
    pathological at millions of series)."""
    import ray.data as rd

    from ..kernels.grid import linspace
    from ..kernels.interp import interpolate
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def _points(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["ts"]), pc.is_valid(batch["value"]))
        batch = batch.filter(m)
        return pa.table({
            "series": batch["event_type"],
            "t": pc.divide(pc.cast(pc.cast(batch["ts"], pa.int64()),
                                   pa.float64()), 1e6),
            "v": pc.cast(batch["value"], pa.float64()),
        })

    pts = ds.map_batches(_points, batch_format="pyarrow",
                         zero_copy_batch=True)

    out_schema = pa.schema([("series", pa.string()), ("i", pa.int64()),
                            ("v", pa.float64())])

    def _interp(g: pa.Table) -> pa.Table:
        # dedupe knots at identical t (mean), sort, 101-point linspace
        # grid.  Stable sort keeps equal-t values in row order, so the
        # per-knot sequential sum visits them in the same order the
        # oracle's AVG does.
        t = g["t"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.argsort(t, kind="stable")
        ts, vs = t[order], v[order]
        x, starts = np.unique(ts, return_index=True)
        sums = np.add.reduceat(vs, starts)
        counts = np.diff(np.append(starts, len(ts)))
        y = sums / counts
        grid = linspace(x[0], x[-1], 101)
        out = interpolate(x, y, grid, left=0.0, right=0.0)
        # output the grid INDEX, not raw t: at epoch-second magnitude the
        # 6-dp rounding of t sits below one float64 ulp, so numpy/DuckDB
        # half-even vs half-away tie-breaking flips the last digit
        return pa.table({
            "series": pa.array([g["series"][0].as_py()] * 101, pa.string()),
            "i": pa.array(np.arange(101, dtype=np.int64)),
            "v": pa.array(out, pa.float64()),
        })

    return _collect(sorted_group_map(pts, ["series"], _interp, out_schema))


def _pages_fixture(sf_dir: str, with_dups: bool = False) -> str:
    """Deterministic pages parquet derived from documents (cached in /tmp).

    Schema = the north-star input_hint: (url: string, warc_ts:
    timestamp[us], html: binary, text: string, lang: string).  Rows with
    doc_id % 3 == 0 carry ONLY html (text NULL) and must round-trip
    byte-identically through the extract stage; the rest carry text.
    ``with_dups``: re-append every doc_id % 10 == 0 row (same url, same
    warc_ts — a re-crawl), so the O10 dedup stage must drop exactly those
    for the shared SQL oracle (one point per doc) to match."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    src = f"{sf_dir}/documents.parquet"
    tag = hashlib.blake2b(
        os.path.abspath(src).encode(), digest_size=8).hexdigest()
    if with_dups:
        tag += "_dup"
    out_dir = f"/tmp/lcr_pages_fixture_{tag}"
    marker = os.path.join(out_dir, "_DONE")
    path = os.path.join(out_dir, "pages.parquet")
    if os.path.exists(marker):
        return path
    docs = pq.read_table(src, columns=["doc_id", "text", "lang"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    urls, ts, htmls, out_text = [], [], [], []
    for i, t in zip(ids, texts):
        urls.append(
            f"https://d{i % _PAGES_FIXTURE_DOMAINS}.example.com/doc/{i}")
        ts.append(_PAGES_FIXTURE_BASE_US + i * _PAGES_FIXTURE_STEP_US)
        if i % 3 == 0:
            htmls.append(
                ("<html><head><title>skip me</title>"
                 "<script>var x = 1;</script></head><body>"
                 f"<p>{t}</p><!-- comment --></body></html>").encode())
            out_text.append(None)
        else:
            htmls.append(None)
            out_text.append(t)
    tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    if with_dups:
        dup_idx = [j for j, i in enumerate(ids) if i % 10 == 0]
        tbl = pa.concat_tables([tbl, tbl.take(pa.array(dup_idx,
                                                       pa.int64()))])
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, path, row_group_size=2048)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def q_pages_rollup_1d(sf_dir: str):
    """Flagship pages path, oracle-checked end-to-end: parquet pages ->
    actor-pool extract (O2) -> projection (O3-O5) -> 1d feature rollup
    (O6) — the first driver-oracle query to exercise the extract stage."""
    cfg = RollupConfig(
        input_paths=_pages_fixture(sf_dir),
        input_kind="pages",
        tiers=("1d",),
        extract_mode="actors",
        extract_concurrency=(2, 4),
        read_num_blocks=4,
    )
    ds = _rollup_tier(cfg, "1d")
    tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return _round6(tbl.select(ROLLUP_COLS))


def q_pages_dedup_rollup_1d(sf_dir: str):
    """O10 oracle end-to-end: the pages fixture with re-crawled duplicate
    (url, warc_ts) rows planted, run with dedup_pages=True (slim two-pass
    dedup) — the SQL oracle counts each document exactly once, so any
    missed or over-dropped duplicate breaks the value hash."""
    cfg = RollupConfig(
        input_paths=_pages_fixture(sf_dir, with_dups=True),
        input_kind="pages",
        tiers=("1d",),
        dedup_pages=True,
        extract_mode="tasks",
        read_num_blocks=4,
    )
    ds = _rollup_tier(cfg, "1d")
    tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return _round6(tbl.select(ROLLUP_COLS))


def q_hot_keys(sf_dir: str):
    """Skew pre-pass (SURVEY §4): per-key point counts — the hot-list input
    for salting decisions."""
    from ray.data.aggregate import Count

    cfg = _events_cfg(sf_dir, ("1h",))
    pts = points_dataset(cfg)
    out = pts.groupby(["lang", "domain"]).aggregate(
        Count(alias_name="n_points"))
    return _collect(out)


def q_dedup_exact(sf_dir: str):
    import ray.data as rd

    from ..stages.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(exact_dedup(ds))


_AUG_DOCS_CACHE: dict = {}


def _augmented_documents(sf_dir: str):
    """documents ∪ exact copies (+100000) ∪ perturbed copies (+200000, every
    7th word dropped, doc_id % 5 == 0) — a deterministic near-dup corpus so
    the minhash/simhash/jaccard queries have non-trivial output on testdata
    (which itself contains no duplicate texts).

    Memoized per sf_dir: three dedup queries consume the identical
    materialized fixture in one driver session; rebuilding it cost ~2 s
    per query at sf0.1 (fixture construction, not the operator under
    measurement)."""
    import ray.data as rd

    cached = _AUG_DOCS_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        if ids and max(ids) >= 100_000:
            # the fixed +100k/+200k fixture offsets collide with real ids
            # beyond this corpus size; the oracle SQL hard-codes the same
            # offsets, so both sides must fail loudly rather than silently
            # fan out duplicate doc_ids (round-2 ADVICE)
            raise ValueError(
                "_augmented_documents fixture assumes doc_id < 100000")
        out_id = list(ids)
        out_tx = list(texts)
        for i, t in zip(ids, texts):
            out_id.append(i + 100_000)
            out_tx.append(t)
            if i % 5 == 0:
                words = (t or "").split()
                out_id.append(i + 200_000)
                out_tx.append(" ".join(
                    w for j, w in enumerate(words) if j % 7 != 0))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    # materialized: the dedup queries consume this fixture 1-3 times
    # (pairs stage + both join sides); it is corpus-scale-SMALL test input,
    # not a production pages table
    out = ds.map_batches(_augment, batch_format="pyarrow").materialize()
    _AUG_DOCS_CACHE[sf_dir] = out
    return out


DEDUP_FILTER_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
),
w AS (SELECT MIN(doc_id) AS doc_id FROM aug GROUP BY text)
SELECT a.doc_id, a.text FROM aug a JOIN w USING (doc_id)
"""


_EXACT_DUP_CACHE: dict = {}


def _exact_dup_documents(sf_dir: str):
    """documents ∪ exact copies (+100000) — the shared fixture of
    dedup_filter and both LSH recall-floor queries (their oracle SQL
    hard-codes the same offset).  Memoized per sf_dir like
    _augmented_documents."""
    import ray.data as rd

    cached = _EXACT_DUP_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _dup(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        tx = batch["text"].to_pylist()
        if ids and max(ids) >= 100_000:
            raise ValueError(
                "exact-dup fixture assumes doc_id < 100000")
        return pa.table({
            "doc_id": pa.array(ids + [i + 100_000 for i in ids], pa.int64()),
            "text": pa.array(tx + tx, pa.string()),
        })

    out = ds.map_batches(_dup, batch_format="pyarrow").materialize()
    _EXACT_DUP_CACHE[sf_dir] = out
    return out


def q_dedup_filter(sf_dir: str):
    """Corpus-level exact dedup (T1 as a FILTER): documents ∪ exact copies
    reduced back to one canonical min-id row per distinct text, via the
    winners hash-join — output is the deduped corpus itself."""
    from ..stages.dedup import exact_dedup_filter

    aug = _exact_dup_documents(sf_dir)
    # corpus is pinned -> size join aggregators to its row count (actor
    # spawn is the fixed cost at small scale; CPU cap governs at scale)
    import ray

    nparts = int(min(
        max(2, int(ray.cluster_resources().get("CPU", 8)) // 2),
        max(2, aug.count() // 25_000 + 2)))
    return _collect(exact_dedup_filter(aug, num_partitions=nparts))


QUALITY_FILTER_SQL = r"""
WITH t AS (
  SELECT doc_id, LENGTH(text) AS n_chars,
    CASE WHEN TRIM(text) = '' THEN 0
         ELSE LEN(regexp_split_to_array(TRIM(text), '\s+')) END AS n_words,
    LENGTH(text) - LENGTH(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))
      AS n_punct
  FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_words AS BIGINT) AS n_words
FROM t
WHERE n_words >= 15 AND n_chars >= 80
  AND CAST(n_punct AS DOUBLE) / n_chars <= 0.1
"""


def q_quality_filter(sf_dir: str):
    """T10 as a GATE: documents surviving length/punctuation thresholds
    (unrounded integer/ratio comparisons — boundary-exact vs SQL)."""
    import ray.data as rd

    from ..stages.textstats import quality_filter_dataset

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _collect(quality_filter_dataset(ds))


def q_dedup_minhash(sf_dir: str):
    from ..stages.dedup import minhash_dedup_pairs

    ds = _augmented_documents(sf_dir)
    pairs = minhash_dedup_pairs(ds, threshold=0.5)
    return _collect(pairs)


def q_dedup_simhash(sf_dir: str):
    from ..stages.dedup import simhash_dedup_pairs

    ds = _augmented_documents(sf_dir)
    pairs = simhash_dedup_pairs(ds, max_hamming=3)
    return _collect(pairs)


def q_dedup_ngram_jaccard(sf_dir: str):
    """LSH candidates re-scored with n-gram Jaccard (verify stage) — the
    join path: pairs ⋈ corpus on doc_a then doc_b, no driver-side corpus
    materialization (the round-1 broadcast-dict wiring did not scale)."""
    from ..stages.dedup import minhash_dedup_pairs, ngram_jaccard_verify_join

    ds = _augmented_documents(sf_dir)
    cand = minhash_dedup_pairs(ds, threshold=0.5)
    verified = ngram_jaccard_verify_join(cand, ds, min_jaccard=0.5)
    return _collect(verified)


LSH_RECALL_FLOOR_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM aug a JOIN aug b ON a.text = b.text AND a.doc_id < b.doc_id
"""


def q_dedup_lsh_recall_floor(sf_dir: str):
    """Recall floor of the MinHash LSH chain, ORACLE-CHECKED: exact
    duplicates have identical signatures, so the chain must surface every
    byte-identical text pair — the engine's candidate pairs filtered to
    text_a == text_b must EQUAL the SQL text-equality self-join over the
    same documents ∪ exact-copies fixture.  A dropped exact pair fails
    rows, a phantom pair fails the hash (round-2 VERDICT item 8: the LSH
    family was rows-only)."""
    from ..stages.dedup import exact_dup_pair_floor, minhash_dedup_pairs

    aug = _exact_dup_documents(sf_dir)
    cand = minhash_dedup_pairs(aug, threshold=0.5)
    return _collect(exact_dup_pair_floor(cand, aug))


def q_dedup_simhash_recall_floor(sf_dir: str):
    """Recall floor of the SimHash chain, ORACLE-CHECKED — the SimHash
    twin of q_dedup_lsh_recall_floor: byte-identical texts have Hamming
    distance 0, within any ``max_hamming``, so the banded chain must
    surface every equal-text pair; filtered to text-equality the engine
    pair set must EQUAL the SQL self-join."""
    from ..stages.dedup import exact_dup_pair_floor, simhash_dedup_pairs

    aug = _exact_dup_documents(sf_dir)
    cand = simhash_dedup_pairs(aug, max_hamming=3)
    return _collect(exact_dup_pair_floor(cand, aug))


PASSAGE_DEDUP_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, '[ \t\n\r\f\v]+') AS w
  FROM documents WHERE text IS NOT NULL
),
aug AS (
  SELECT doc_id, w FROM t
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, list_slice(w, len(w)//2 + 1, len(w))
  FROM t WHERE doc_id % 3 = 0
),
g AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 7), ' ') AS gram
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM aug)
),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
dup AS (SELECT gram FROM gd GROUP BY gram HAVING COUNT(*) > 1)
SELECT gd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_passages
FROM gd JOIN dup USING (gram)
GROUP BY 1
"""


def q_passage_dedup(sf_dir: str):
    """Passage-level dedup (stages/dedup.passage_dup_counts): per doc,
    the number of distinct 8-word windows shared with at least one other
    document — Lee et al. 2022's duplicated-passage detection at n-gram
    granularity, ORACLE-CHECKED against a DuckDB gram self-join over the
    same corpus ∪ second-half copies fixture (every 3rd doc's back half
    re-appears under id+100000, so PARTIAL overlap is exercised, not
    just whole-doc copies)."""
    import ray.data as rd

    from ..stages.dedup import passage_dup_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        if ids and max(ids) >= 100_000:
            raise ValueError("passage fixture assumes doc_id < 100000")
        out_id, out_tx = [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            out_id.append(i)
            out_tx.append(t)
            if i % 3 == 0:
                # SQL list_slice(w, len//2+1, len) == python w[len//2:]
                import re
                w = re.split(r"[ \t\n\r\f\v]+", t)
                out_id.append(i + 100_000)
                out_tx.append(" ".join(w[len(w) // 2:]))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    aug = ds.map_batches(_aug, batch_format="pyarrow")
    return _collect(passage_dup_counts(aug, window=8))


def q_dedup_embedding(sf_dir: str):
    import ray.data as rd

    from ..stages.similarity import embedding_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = embedding_pairs(ds, tau=0.3)
    return _collect(pairs)


EMBEDDING_COMPONENTS_SQL = """
WITH RECURSIVE
nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
e AS (
  SELECT a.vec_id AS s, b.vec_id AS t
  FROM nv a JOIN nv b
  ON a.vec_id <> b.vec_id AND list_cosine_similarity(a.e, b.e) >= 0.4
),
reach(s, t) AS (
  SELECT vec_id, vec_id FROM nv
  UNION
  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
)
SELECT s AS vec_id, MIN(t) AS component FROM reach GROUP BY s
"""


def q_embedding_components(sf_dir: str):
    """Near-duplicate GROUPS over DATA-DRIVEN similarity edges: cosine
    pairs at tau=0.4 (stages/similarity.embedding_pairs — the same
    boundary the green dedup_embedding query pins) clustered by the
    generic components stage; ORACLE-CHECKED against a recursive-CTE
    transitive closure — an INDEPENDENT closure algorithm (path
    enumeration) agreeing with the star-contraction labels on real
    multi-hop components (sizes up to ~8 at sf0.01, ~75 at sf0.1)."""
    import ray.data as rd

    from ..stages.components import attach_components, connected_components
    from ..stages.similarity import embedding_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    pairs = embedding_pairs(ds, tau=0.4)
    edges = pairs.map_batches(
        lambda t: pa.table({"a": t["vec_a"], "b": t["vec_b"]}),
        batch_format="pyarrow")
    comps = connected_components(edges)
    nodes = ds.map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"]}),
        batch_format="pyarrow")
    return _collect(attach_components(nodes, "vec_id", comps))


def q_ann_topk(sf_dir: str):
    import ray.data as rd

    from ..stages.similarity import ann_topk, load_corpus

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ids, mat = load_corpus(ds)
    nq = min(10, len(ids))
    out = ann_topk(ds, ids[:nq], mat[:nq], k=5)
    return _collect(out)


def q_ann_topk_lsh(sf_dir: str):
    import ray.data as rd

    from ..stages.similarity import ann_topk_lsh, load_corpus

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ids, mat = load_corpus(ds)
    nq = min(10, len(ids))
    out = ann_topk_lsh(ds, ids[:nq], mat[:nq], k=5, nbits=8)
    return _collect(out)


def q_ann_topk_ivf(sf_dir: str):
    import ray.data as rd

    from ..stages.similarity import ann_topk_ivf, load_corpus

    # materialized: consumed twice (quantizer training + the IVF scan),
    # and a MaterializedDataset lets train_ivf_centroids spread-sample
    # blocks across the whole corpus instead of a head window
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).materialize()
    ids, mat = load_corpus(ds)
    nq = min(10, len(ids))
    out = ann_topk_ivf(ds, ids[:nq], mat[:nq], k=5, n_centroids=16,
                       nprobe=4)
    return _collect(out)


def q_ann_topk_ivf_full(sf_dir: str):
    """IVF with nprobe == n_centroids: every query scans every cell, so
    the result is EXACT by construction and the brute-force SQL oracle
    applies — this oracle-checks the whole IVF machinery (quantizer
    training, cell assignment, per-cell scan, partial top-k, final merge);
    the approximate-nprobe variant stays rows-only + recall-pinned."""
    import ray.data as rd

    from ..stages.similarity import ann_topk_ivf, load_corpus

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).materialize()
    ids, mat = load_corpus(ds)
    nq = min(10, len(ids))
    out = ann_topk_ivf(ds, ids[:nq], mat[:nq], k=5, n_centroids=16,
                       nprobe=16)
    return _collect(out)


def q_text_stats(sf_dir: str):
    import ray.data as rd

    from ..stages.textstats import text_stats_dataset

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = text_stats_dataset(ds, with_lang=False, with_fingerprint=False)
    return _collect(out)


GOPHER_REPETITION_SQL = r"""
WITH d AS (
  SELECT doc_id, text, LENGTH(text) AS n_chars
  FROM documents WHERE text IS NOT NULL
),
l AS (
  SELECT doc_id, ln
  FROM d, UNNEST(list_filter(string_split(text, chr(10)),
                             x -> TRIM(x, ' ' || chr(9) || chr(13)
                                       || chr(12) || chr(11)) != ''))
       AS t(ln)
),
lc AS (SELECT doc_id, ln, COUNT(*) AS c FROM l GROUP BY 1, 2),
la AS (
  SELECT doc_id,
    CAST(SUM(c) AS BIGINT) AS n_lines,
    1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c) AS dup_line_frac,
    SUM(LENGTH(ln) * c) AS total_chars,
    SUM(CASE WHEN c > 1 THEN LENGTH(ln) * c ELSE 0 END) AS dup_chars
  FROM lc GROUP BY 1
),
w AS (SELECT doc_id, n_chars,
             regexp_split_to_array(TRIM(text), '\s+') AS ws
      FROM d WHERE TRIM(text) != ''),
g2c AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS gram
    FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
  ) GROUP BY 1, 2
),
g2t AS (
  SELECT doc_id, gram, c FROM (
    SELECT doc_id, gram, c,
      ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY c DESC, gram ASC) AS rn
    FROM g2c
  ) WHERE rn = 1
),
g3a AS (
  SELECT doc_id,
    SUM(CASE WHEN c > 1 THEN c * LENGTH(gram) ELSE 0 END) AS dup3
  FROM (
    SELECT doc_id, gram, COUNT(*) AS c FROM (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram
      FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3
    ) GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT d.doc_id,
  CAST(COALESCE(la.n_lines, 0) AS BIGINT) AS n_lines,
  ROUND(COALESCE(la.dup_line_frac, 0.0), 6) AS dup_line_frac,
  ROUND(COALESCE(CASE WHEN la.total_chars > 0
        THEN CAST(la.dup_chars AS DOUBLE) / la.total_chars END, 0.0), 6)
    AS dup_line_char_frac,
  ROUND(COALESCE(CASE WHEN d.n_chars > 0
        THEN (g2t.c * LENGTH(g2t.gram)) / CAST(d.n_chars AS DOUBLE) END,
        0.0), 6) AS top_2gram_char_frac,
  ROUND(COALESCE(CASE WHEN d.n_chars > 0
        THEN CAST(g3a.dup3 AS DOUBLE) / d.n_chars END, 0.0), 6)
    AS dup_3gram_char_frac
FROM d LEFT JOIN la USING (doc_id)
       LEFT JOIN g2t USING (doc_id)
       LEFT JOIN g3a USING (doc_id)
"""


def q_gopher_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 Table A1; kernels/textkit.repetition_signals): duplicate-line
    row/char fractions, top-2-gram character fraction, duplicated-3-gram
    character fraction — the classic LLM corpus repetition filters.
    Stateless vectorized-plumbing map over the documents table (no
    exchange at all); integer counts + one divide per signal, so the
    oracle parity is exact; ORACLE-CHECKED."""
    import ray.data as rd

    from ..kernels.textkit import REPETITION_COLUMNS, repetition_signals

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _rep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["text"]))
        rows = [repetition_signals(t)
                for t in batch["text"].to_pylist()]
        cols = {"doc_id": pc.cast(batch["doc_id"], pa.int64())}
        for c in REPETITION_COLUMNS:
            typ = pa.int64() if c == "n_lines" else pa.float64()
            cols[c] = pa.array([r[c] for r in rows], typ)
        return pa.table(cols)

    return _collect(ds.map_batches(_rep, batch_format="pyarrow",
                                   zero_copy_batch=True))


PII_REDACT_SQL = r"""
WITH planted AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
    || CASE WHEN doc_id % 2 = 0
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.0.' || CAST(doc_id % 199 AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 3 = 0
            THEN ' call 555-'
                 || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                 || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END AS t
  FROM documents WHERE text IS NOT NULL
),
s1 AS (
  SELECT doc_id, t,
         LEN(REGEXP_EXTRACT_ALL(
             t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           AS n_email,
         REGEXP_REPLACE(
             t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t1
  FROM planted
),
s2 AS (
  SELECT doc_id, n_email,
         LEN(REGEXP_EXTRACT_ALL(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))
           AS n_ip,
         REGEXP_REPLACE(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g')
           AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ip,
         LEN(REGEXP_EXTRACT_ALL(t2, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
           AS n_phone,
         REGEXP_REPLACE(t2, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')
           AS t3
  FROM s2
)
SELECT doc_id, n_email, n_ip, n_phone,
       LENGTH(t3) AS redacted_len,
       SUBSTR(t3, 1, 80) AS redacted_prefix
FROM s3
"""


def q_pii_redact(sf_dir: str):
    """PII redaction — the classic webtext-corpus scrub (emails, IPv4,
    phone numbers replaced with typed tokens; kernels/textkit.redact_pii,
    count-then-replace per pattern in a fixed order).  The synthetic
    documents carry no PII, so a deterministic doc_id-derived blurb is
    planted on BOTH engines (email always; IP on even ids; phone on
    doc_id%3==0) — the redactor genuinely fires and false positives on
    the original text would also break parity.  Pure Arrow RE2 kernels
    (count_substring_regex / replace_substring_regex) — and DuckDB's
    regexp_* is RE2 too, so the oracle runs the identical automaton.
    Stateless vectorized map, no exchange; ORACLE-CHECKED."""
    import ray.data as rd

    from ..kernels.textkit import redact_pii

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _redact(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["text"]))
        did = pc.cast(batch["doc_id"], pa.int64())
        s = lambda x: pc.cast(x, pa.string())  # noqa: E731
        empty = pa.scalar("", pa.string())
        ip_part = pc.if_else(
            pc.equal(pc.bit_wise_and(did, 1), 0),
            pc.binary_join_element_wise(
                " from 10.", s(_pc_mod(did, 256)), ".0.",
                s(_pc_mod(did, 199)), ""),
            empty)
        ph_part = pc.if_else(
            pc.equal(_pc_mod(did, 3), 0),
            pc.binary_join_element_wise(
                " call 555-", pc.utf8_lpad(s(_pc_mod(did, 1000)), 3, "0"),
                "-", pc.utf8_lpad(s(_pc_mod(did, 10000)), 4, "0"), ""),
            empty)
        planted = pc.binary_join_element_wise(
            batch["text"], " contact user", s(did), "@example.com",
            ip_part, ph_part, "")
        red, counts = redact_pii(planted)
        return pa.table({
            "doc_id": did,
            "n_email": pc.cast(counts["email"], pa.int64()),
            "n_ip": pc.cast(counts["ip"], pa.int64()),
            "n_phone": pc.cast(counts["phone"], pa.int64()),
            "redacted_len": pc.cast(pc.utf8_length(red), pa.int64()),
            "redacted_prefix": pc.utf8_slice_codeunits(red, 0, 80),
        })

    return _collect(ds.map_batches(_redact, batch_format="pyarrow",
                                   zero_copy_batch=True))


def _pc_mod(arr, m: int):
    """Nonnegative int modulo as Arrow compute (doc_id >= 0 here)."""
    return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))


def _corr_lineitem_sql() -> str:
    """Oracle for q_corr_lineitem: DuckDB's CORR / REGR_SLOPE per group.
    corr is bounded in [-1, 1] (plain two-step 6-dp round); the slope is
    magnitude-unbounded, so it takes the significant-digit discipline
    (slope_price_qty is in _SIG_ROUND_COLS)."""
    return f"""
WITH s AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CORR(l_extendedprice, l_quantity) AS cq0,
         CORR(l_extendedprice, l_discount) AS cd0,
         REGR_SLOPE(l_extendedprice, l_quantity) AS sl0
  FROM lineitem GROUP BY 1, 2),
r9 AS (
  SELECT l_returnflag, l_linestatus, n, cq0, cd0,
         {_sig_round_sql("sl0", 9)} AS sl9
  FROM s)
SELECT l_returnflag, l_linestatus, n,
  ROUND(cq0, 6) AS corr_price_qty,
  ROUND(cd0, 6) AS corr_price_disc,
  {_sig_round_sql("sl9", 6)} AS slope_price_qty
FROM r9
"""


_CORR_PARTIAL_SCHEMA = pa.schema([
    ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
    ("n", pa.int64()),
    ("mx", pa.float64()), ("my", pa.float64()), ("md", pa.float64()),
    ("m2x", pa.float64()), ("m2y", pa.float64()), ("m2d", pa.float64()),
    ("cxy", pa.float64()), ("cxd", pa.float64()),
])

_CORR_OUT_SCHEMA = pa.schema([
    ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
    ("n", pa.int64()),
    ("corr_price_qty", pa.float64()), ("corr_price_disc", pa.float64()),
    ("slope_price_qty", pa.float64()),
])


def corr_partials(batch: pa.Table, keys: list, xcol: str, ycol: str,
                  dcol: str) -> pa.Table:
    """Per-block bivariate co-moment partials (the map-side combine of
    the correlation aggregate): per key-run n, means and CENTERED sums
    (M2x, M2y, M2d, Cxy, Cxd) — centered per block (exact two-pass
    within the run, vectorized via reduceat), so the cross-block merge
    is the numerically stable Pébay co-moment update, never raw power
    sums (which catastrophically cancel when |mean| >> std, e.g.
    extendedprice ~ 4e4 vs std ~ 2e4 is mild here but the rollup
    pipeline's discipline applies everywhere)."""
    from ..stages.sorted_groups import _runs

    if len(batch) == 0:
        return _CORR_PARTIAL_SCHEMA.empty_table()
    tbl = batch.select(keys + [xcol, ycol, dcol]).sort_by(
        [(k, "ascending") for k in keys])
    starts, ends = _runs(tbl, keys)
    x = tbl[xcol].to_numpy(zero_copy_only=False).astype(np.float64)
    y = tbl[ycol].to_numpy(zero_copy_only=False).astype(np.float64)
    d = tbl[dcol].to_numpy(zero_copy_only=False).astype(np.float64)
    n = ends - starts
    mx = np.add.reduceat(x, starts) / n
    my = np.add.reduceat(y, starts) / n
    md = np.add.reduceat(d, starts) / n
    rep = np.repeat(np.arange(len(starts)), n)
    cx, cy, cd_ = x - mx[rep], y - my[rep], d - md[rep]
    idx = pa.array(starts.astype(np.int64))
    return pa.table({
        "l_returnflag": tbl[keys[0]].take(idx),
        "l_linestatus": tbl[keys[1]].take(idx),
        "n": pa.array(n.astype(np.int64)),
        "mx": pa.array(mx), "my": pa.array(my), "md": pa.array(md),
        "m2x": pa.array(np.add.reduceat(cx * cx, starts)),
        "m2y": pa.array(np.add.reduceat(cy * cy, starts)),
        "m2d": pa.array(np.add.reduceat(cd_ * cd_, starts)),
        "cxy": pa.array(np.add.reduceat(cx * cy, starts)),
        "cxd": pa.array(np.add.reduceat(cx * cd_, starts)),
    }, schema=_CORR_PARTIAL_SCHEMA)


def corr_merge_group(group: pa.Table) -> pa.Table:
    """Reduce one key's partial rows to the finalized (corr, slope) row —
    sequential Pébay bivariate merge (Pébay 2008 eq. 3.12 generalized to
    co-moments): exact regardless of how the input was partitioned
    (tests pin 1-block == k-block)."""
    import math

    cols = {c: group[c].to_numpy(zero_copy_only=False)
            for c in ("n", "mx", "my", "md", "m2x", "m2y", "m2d",
                      "cxy", "cxd")}
    N = float(cols["n"][0])
    Mx, My, Md = cols["mx"][0], cols["my"][0], cols["md"][0]
    M2x, M2y, M2d = cols["m2x"][0], cols["m2y"][0], cols["m2d"][0]
    Cxy, Cxd = cols["cxy"][0], cols["cxd"][0]
    for i in range(1, len(group)):
        n2 = float(cols["n"][i])
        N2 = N + n2
        dx, dy, dd = cols["mx"][i] - Mx, cols["my"][i] - My, \
            cols["md"][i] - Md
        f = N * n2 / N2
        M2x += cols["m2x"][i] + dx * dx * f
        M2y += cols["m2y"][i] + dy * dy * f
        M2d += cols["m2d"][i] + dd * dd * f
        Cxy += cols["cxy"][i] + dx * dy * f
        Cxd += cols["cxd"][i] + dx * dd * f
        Mx += dx * n2 / N2
        My += dy * n2 / N2
        Md += dd * n2 / N2
        N = N2
    denom_q = math.sqrt(M2x * M2y)
    denom_d = math.sqrt(M2x * M2d)
    cq = Cxy / denom_q if denom_q > 0.0 else float("nan")
    cd_ = Cxd / denom_d if denom_d > 0.0 else float("nan")
    # REGR_SLOPE(price, qty): price regressed ON qty -> Cxy / Var(qty)
    sl = Cxy / M2y if M2y > 0.0 else float("nan")
    return pa.table({
        "l_returnflag": group["l_returnflag"].slice(0, 1),
        "l_linestatus": group["l_linestatus"].slice(0, 1),
        "n": pa.array([int(N)], pa.int64()),
        "corr_price_qty": pa.array([cq], pa.float64(),
                                   mask=[not math.isfinite(cq)]),
        "corr_price_disc": pa.array([cd_], pa.float64(),
                                    mask=[not math.isfinite(cd_)]),
        "slope_price_qty": pa.array([sl], pa.float64(),
                                    mask=[not math.isfinite(sl)]),
    }, schema=_CORR_OUT_SCHEMA)


def q_corr_lineitem(sf_dir: str):
    """Per-key Pearson correlation + regression slope as a MERGEABLE
    bivariate co-moment aggregate (the missing sibling of the rollup's
    univariate Welford/Pébay family): one pruned-column pass computes
    per-block centered co-moment partials (n, means, M2x, M2y, M2d,
    Cxy, Cxd) grouped inside the block, so only blocks × keys slim
    partial rows hit the exchange — the same map-side-combine topology
    the 14-stat rollup uses; the per-key merge is the exact Pébay
    co-moment update.  At 10^12 rows the exchange stays
    O(blocks × keys), never O(rows).  ORACLE-CHECKED against DuckDB
    CORR / REGR_SLOPE."""
    import ray.data as rd

    from ..stages.sorted_groups import sorted_group_map

    keys = ["l_returnflag", "l_linestatus"]
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=keys + ["l_extendedprice", "l_quantity", "l_discount"])
    partials = ds.map_batches(
        lambda t: corr_partials(t, keys, "l_extendedprice", "l_quantity",
                                "l_discount"),
        batch_format="pyarrow", zero_copy_batch=True)
    return _collect(sorted_group_map(partials, keys, corr_merge_group,
                                     _CORR_OUT_SCHEMA))


BLOOM_SEMIJOIN_SQL = """
SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 6) AS sum_qty
FROM lineitem
WHERE l_orderkey IN
  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def q_bloom_semijoin(sf_dir: str, confirm: str = "broadcast"):
    """Lineitem rows restricted to urgent orders via the bloom-filter
    RUNTIME-PREFILTER semi-join (stages/joins.semi_join_bloom): the key
    side builds a distributed OR-merged bloom, every lineitem block
    drops non-members map-side BEFORE any exchange, and the fpp-rate
    false positives are removed by an exact confirm over the ~20%
    survivors only — at 100 TB the fact table never shuffles at full
    width.  n_hint comes from parquet METADATA (no read).  The result
    is the exact semi-join; ORACLE-CHECKED against an IN-subquery.
    ``confirm='join'`` exercises the partitioned-join confirm path
    (pinned equal by tests)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.joins import semi_join_bloom
    from ..stages.sorted_groups import _runs, sorted_group_map

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
                   .select(["o_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    fact = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_quantity"])
    # ~1/5 of orders are urgent; a metadata-derived hint only sizes m
    kept = semi_join_bloom(fact, "l_orderkey", urgent, "o_orderkey",
                           n_hint=max(64, n_orders // 4), fpp=0.01,
                           confirm=confirm)

    out_schema = pa.schema([("l_returnflag", pa.string()),
                            ("n", pa.int64()), ("sum_qty", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(["l_returnflag", "l_quantity"])
             .group_by(["l_returnflag"])
             .aggregate([("l_quantity", "count"), ("l_quantity", "sum")]))
        return g.rename_columns(["l_returnflag", "n", "sum_qty"])

    partials = kept.map_batches(_partial, batch_format="pyarrow",
                                zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, _ = _runs(batch, ["l_returnflag"])
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "l_returnflag": batch["l_returnflag"].take(idx),
            "n": pa.array(np.add.reduceat(
                batch["n"].to_numpy(zero_copy_only=False), starts)),
            "sum_qty": pa.array(np.add.reduceat(
                batch["sum_qty"].to_numpy(zero_copy_only=False), starts)),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["l_returnflag"], None,
                                     out_schema, block_fn=_merge))


def q_lang_fingerprint(sf_dir: str):
    import ray.data as rd

    from ..stages.textstats import text_stats_dataset

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = text_stats_dataset(ds, with_lang=True, with_fingerprint=True)
    out = out.select_columns(["doc_id", "lang_pred", "fingerprint_hex"])
    return _collect(out)


def _series_grid_sql(points_sql: str, tiers: tuple) -> str:
    """Per-series dense-grid stats SQL: for each (lang, domain, tier) the
    inclusive bucket-grid length and the number of gap-filled buckets —
    the SQL-expressible projection of the run_rollup series output."""
    parts = []
    for tier in tiers:
        step = TIER_STEP_US[tier]
        parts.append(f"""
SELECT lang, domain, '{tier}' AS tier,
  CAST((MAX(b) - MIN(b)) / {step} + 1 AS BIGINT) AS n_buckets,
  CAST((MAX(b) - MIN(b)) / {step} + 1 - COUNT(DISTINCT b) AS BIGINT)
    AS n_filled
FROM (SELECT lang, domain, (t_us // {step}) * {step} AS b
      FROM pts) GROUP BY lang, domain""")
    body = "\nUNION ALL\n".join(parts)
    return f"WITH pts AS ({points_sql})\n{body}"


def q_series_grid_stats(sf_dir: str):
    """Oracle-checked series assembly: full rollup -> gap-fill -> one row
    per (lang, domain, tier) with grid length + filled count, pinned
    against a direct SQL derivation from raw points (the dense-grid and
    fill semantics of O7, end-to-end through run_rollup)."""
    from .rollup import run_rollup

    cfg = _events_cfg(sf_dir, ("1h", "1d", "30d"))
    res = run_rollup(cfg)
    tbl = pa.Table.from_pandas(res["series"].to_pandas(),
                               preserve_index=False)
    return _round6(tbl.select(
        ["lang", "domain", "tier", "n_buckets", "n_filled"]))


def q_series_gorilla(sf_dir: str):
    """Flagship tail, ORACLE-CHECKED THROUGH THE BLOB: tiered rollup ->
    gap-fill -> one Gorilla blob per series -> gorilla_decode, and every
    compared value is computed FROM THE DECODED ARRAYS (grid size, first/
    last timestamp, 6-dp value sum).  The SQL oracle recomputes the same
    aggregates from the raw events via the gap-fill SQL, so a single
    corrupted bit in encode/decode breaks the hash.  Rounding discipline
    as q_gapfill_1d: knots rounded before interpolation AND values rounded
    before encode, so both sides sum identical 6-dp values."""
    from ..kernels.gorilla import gorilla_decode
    from ..kernels.rounding import round6_tie_robust
    from .rollup import gapfilled, gorilla_series

    parts = []
    for tier in ("1h", "1d", "30d"):
        cfg = _events_cfg(sf_dir, (tier,))
        feats = _rollup_tier(cfg, tier)
        feats = feats.map_batches(_round6, batch_format="pyarrow")
        dense = gapfilled(feats).map_batches(_round6,
                                             batch_format="pyarrow")
        series = pa.Table.from_pandas(
            gorilla_series(dense).to_pandas(), preserve_index=False)
        t_min, t_max, v_sum, n_dec = [], [], [], []
        for blob in series["points_gorilla"].to_pylist():
            t, v = gorilla_decode(blob)
            n_dec.append(len(t))
            t_min.append(int(t[0]) if len(t) else 0)
            t_max.append(int(t[-1]) if len(t) else 0)
            v_sum.append(float(np.nansum(v)))
        out = series.select(["lang", "domain", "tier", "n_buckets",
                             "n_filled"])
        out = out.append_column("n_decoded", pa.array(n_dec, pa.int64()))
        out = out.append_column("t_min_us", pa.array(t_min, pa.int64()))
        out = out.append_column("t_max_us", pa.array(t_max, pa.int64()))
        out = out.append_column(
            "v_sum", pa.array(round6_tie_robust(np.array(v_sum)),
                              pa.float64()))
        parts.append(out)
    return pa.concat_tables(parts)


_PAYLOAD_CACHE: dict = {}


def _payload_fixture(sf_dir: str):
    """Deterministic binary payloads keyed by doc_id in six formats —
    RIFF/WAVE PCM audio, binary PPM images, LZW-COMPRESSED GIF,
    DEFLATE-compressed PNG, and DCT-era BASELINE JPEG (4:2:0 / 4:4:4 /
    grayscale, restart markers) all decodable for real by the
    from-scratch codecs, plus the LCRF video-stand-in container
    (mp3/h264/progressive-JPEG remain the marked codec='real'
    integration point, see stages/multimodal.py).  Memoized per sf_dir;
    shared by q_multimodal_decode and q_multimodal_features."""
    import ray.data as rd

    from ..stages.multimodal import (
        fake_payload,
        synth_gif,
        synth_jpeg,
        synth_png,
        synth_ppm,
        synth_wav,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _payloads(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            if i % 6 == 0:
                payloads.append(synth_wav(800 + i % 400, 100.0 + i % 300,
                                          seed=i))
            elif i % 6 == 1:
                payloads.append(synth_ppm(16 + i % 48, 12 + i % 16, seed=i))
            elif i % 6 == 2:
                payloads.append(synth_gif(16 + i % 32, 12 + i % 16, seed=i,
                                          interlaced=(i % 12 == 2)))
            elif i % 6 == 3:
                payloads.append(synth_png(12 + i % 24, 10 + i % 12, seed=i,
                                          color_type=(2 if i % 12 == 3
                                                      else 0)))
            elif i % 6 == 4:
                payloads.append(synth_jpeg(
                    16 + i % 33, 12 + i % 21, seed=i,
                    mode=("gray", "444", "420")[i % 3],
                    restart_every=(2 if i % 12 == 4 else 0)))
            else:
                payloads.append(fake_payload("video", 64 + i % 64,
                                             48 + i % 16, 1 + i % 5, seed=i))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "payload": pa.array(payloads, pa.binary())})

    # memoize the synthesized payload fixture per sf_dir (same
    # discipline as _AUG_DOCS_CACHE): the Python encoders cost ~4-5 s at
    # sf0.1 and are fixture construction, not the decode stage under
    # measurement
    cached = _PAYLOAD_CACHE.get(sf_dir)
    if cached is None:
        cached = ds.map_batches(_payloads,
                                batch_format="pyarrow").materialize()
        _PAYLOAD_CACHE[sf_dir] = cached
    return cached


def q_multimodal_decode(sf_dir: str):
    """Multimodal decode over the six-format payload fixture (see
    _payload_fixture): every format decoded for real by the from-scratch
    codecs; rows-only driver check, codec round-trips unit-pinned."""
    from ..stages.multimodal import decode_payloads

    return _collect(decode_payloads(_payload_fixture(sf_dir),
                                    batch_size=64))


def q_dedup_image(sf_dir: str):
    """IMAGE near-duplicate pairs: payload fixture -> perceptual dHash
    (stages/multimodal.MediaFeatureStage) -> the generic 4x16-bit-banded
    Hamming chain (stages/dedup.hamming_pairs_banded — the SAME slim
    band-row exchange the SimHash text chain rides).  Every image gets
    an exact COPY planted under doc_id + 1_000_000 (deterministic
    synthesis), so the chain must surface one hamming=0 pair per image —
    a built-in recall floor; rows-only driver check (dHash has no SQL
    mirror), banding-vs-bruteforce parity unit-pinned.

    Restricted to the fixture's NOISE-content images (the PPMs,
    doc_id % 6 == 1): the synthetic PNG/JPEG payloads are gradients,
    which dHash correctly reports as one giant perceptual-duplicate
    class — true, but it floods the pair set; with the noise images the
    planted copies are the ONLY near-dups, so the output is exactly one
    hamming=0 pair per image."""
    import pyarrow.compute as pc_

    from ..stages.dedup import hamming_pairs_banded
    from ..stages.multimodal import media_features

    feats = media_features(_payload_fixture(sf_dir), batch_size=64)
    imgs = feats.filter(
        lambda r: r["kind"] == "image" and r["dhash"] is not None
        and r["doc_id"] % 6 == 1)

    def _slim(batch: pa.Table) -> pa.Table:
        base = pa.table({"doc_id": pc_.cast(batch["doc_id"], pa.int64()),
                         "h64": batch["dhash"]})
        copy = pa.table({"doc_id": pc_.add(base["doc_id"], 1_000_000),
                         "h64": base["h64"]})
        return pa.concat_tables([base, copy])

    slim = imgs.map_batches(_slim, batch_format="pyarrow")
    return _collect(hamming_pairs_banded(slim, "doc_id", "h64",
                                         max_hamming=3))


_PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")

PIVOT_EVENTS_SQL = f"""
SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
{", ".join(
    f'''  CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)
       AS BIGINT) AS {t}_n,
  ROUND(SUM(CASE WHEN event_type = '{t}' THEN value ELSE 0.0 END), 6)
    AS {t}_sum''' for t in _PIVOT_TYPES)}
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
GROUP BY 1
"""


def _pivot_events_ds(sf_dir: str):
    """Dataset half of q_pivot_events (also feeds q_unpivot_events)."""
    from ray.data.aggregate import Sum

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    day = 86_400_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        d = (t // day) * day
        cols = {"day_us": pa.array(d, pa.int64())}
        for name in _PIVOT_TYPES:
            m = np.asarray(pc.equal(et, name))
            cols[f"{name}_n"] = pa.array(m.astype(np.int64), pa.int64())
            cols[f"{name}_sum"] = pa.array(np.where(m, v, 0.0),
                                           pa.float64())
        tbl = pa.table(cols)
        # block-level pre-pivot: one partial row per (block, day)
        aggs = [(f"{n}_{k}", "sum") for n in _PIVOT_TYPES
                for k in ("n", "sum")]
        p = tbl.group_by(["day_us"]).aggregate(aggs)
        return pa.table(
            {"day_us": p["day_us"],
             **{f"{n}_{k}": p[f"{n}_{k}_sum"] for n in _PIVOT_TYPES
                for k in ("n", "sum")}})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    sums = [Sum(f"{n}_{k}", alias_name=f"{n}_{k}")
            for n in _PIVOT_TYPES for k in ("n", "sum")]
    out = parts.groupby("day_us").aggregate(*sums)

    def _finish(batch: pa.Table) -> pa.Table:
        cols = {"day_us": batch["day_us"]}
        for n in _PIVOT_TYPES:
            cols[f"{n}_n"] = pc.cast(batch[f"{n}_n"], pa.int64())
            cols[f"{n}_sum"] = pc.cast(batch[f"{n}_sum"], pa.float64())
        return pa.table(cols)

    return out.map_batches(_finish, batch_format="pyarrow")


def q_pivot_events(sf_dir: str):
    """PIVOT (long -> wide): per day, one (count, sum) column pair per
    event type — the standard reshaping op for feature tables.  Fully
    map-side: each block emits one pre-pivoted partial row set
    (vectorized CASE arithmetic), then ONE slim keyed groupby sums the
    partials — the fact table never shuffles in long form, only
    day-count-scale wide partials do; ORACLE-CHECKED against the
    CASE-aggregation SQL."""
    return _collect(_pivot_events_ds(sf_dir))


UNPIVOT_EVENTS_SQL = """
SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS v_sum
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
GROUP BY 1, 2
"""


def q_unpivot_events(sf_dir: str):
    """UNPIVOT (wide -> long), composed as the pivot's inverse: melt the
    wide per-day table back into (day, event_type, n_events, v_sum) rows
    — a vectorized stateless map (np.repeat/tile, no exchange at all),
    zero-count cells dropped.  The round trip pivot -> unpivot must
    reproduce the DIRECT long aggregation, which is exactly what the
    SQL oracle computes — ORACLE-CHECKED end-to-end."""
    wide = _pivot_events_ds(sf_dir)

    def _melt(batch: pa.Table) -> pa.Table:
        m = len(batch)
        day = batch["day_us"].to_numpy(zero_copy_only=False)
        k = len(_PIVOT_TYPES)
        n_out = np.empty(m * k, np.int64)
        s_out = np.empty(m * k, np.float64)
        for i, t in enumerate(_PIVOT_TYPES):
            n_out[i::k] = batch[f"{t}_n"].to_numpy(zero_copy_only=False)
            s_out[i::k] = batch[f"{t}_sum"].to_numpy(
                zero_copy_only=False)
        tbl = pa.table({
            "day_us": pa.array(np.repeat(day, k), pa.int64()),
            "event_type": pa.array(list(_PIVOT_TYPES) * m, pa.string()),
            "n_events": pa.array(n_out, pa.int64()),
            "v_sum": pa.array(s_out, pa.float64()),
        })
        return tbl.filter(pc.greater(tbl["n_events"], 0))

    return _collect(wide.map_batches(_melt, batch_format="pyarrow",
                                     zero_copy_batch=True))


def q_multimodal_features(sf_dir: str):
    """Modality-specific feature extraction (stages/multimodal.
    MediaFeatureStage): audio spectral features via the real FFT
    (centroid/dominant-frequency/rms), image perceptual dHash + area
    thumbnail stats (the resize op), GIF deterministic frame-sample
    indices — the brief's decode/feature-extract/resize/frame-sample
    set made concrete.  Rows-only BY DESIGN (FFT/hash outputs have no
    SQL mirror); kernels unit-pinned in tests/test_textstats_multimodal.py."""
    from ..stages.multimodal import media_features

    return _collect(media_features(_payload_fixture(sf_dir),
                                   batch_size=64))


MAX_DRAWDOWN_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value), 6) * 1000000 + 0.5) AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
c AS (
  SELECT event_type, day,
         SUM(mi) OVER (PARTITION BY event_type ORDER BY day) AS cum
  FROM d),
p AS (
  SELECT event_type, day,
         MAX(cum) OVER (PARTITION BY event_type ORDER BY day) - cum AS dd
  FROM c),
r AS (
  SELECT event_type, day, dd,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY dd DESC, day) AS rn
  FROM p)
SELECT event_type, day AS trough_day,
       ROUND(dd / 1000000.0, 6) AS max_drawdown
FROM r WHERE rn = 1
"""


def q_max_drawdown(sf_dir: str):
    """Maximum drawdown per series (the risk metric over the cumulative
    daily-flow curve): deepest drop from a running peak, with the
    trough day (ties -> earliest).  PARITY BY INTEGER ALGEBRA
    (changepoint_cusum discipline): daily sums are two-step-rounded to
    6 dp then scaled to exact int64 micro-units, and cumsum / running
    max / argmax all run in pure int64 — immune to the windowed-SUM
    association-order ulp difference between engines that could flip
    the argmax between near-tied troughs.  One series-keyed exchange;
    map-side daily partials keep it day-count scale."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate([("v", "sum")])
        return g.rename_columns(["event_type", "day", "s"])

    partials = ds.map_batches(_daily, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("trough_day", pa.int64()),
                            ("max_drawdown", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        kstarts = np.nonzero(key_new)[0]
        s = np.add.reduceat(s, kstarts)
        et, day = et[kstarts], day[kstarts]
        mi = np.floor(round6_tie_robust(s) * 1_000_000.0
                      + 0.5).astype(np.int64)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows_et, rows_day, rows_dd = [], [], []
        for st, ln in zip(starts, lens):
            cum = np.cumsum(mi[st:st + ln])
            dd = np.maximum.accumulate(cum) - cum
            best = int(np.argmax(dd))
            rows_et.append(et[st])
            rows_day.append(int(day[st + best]))
            rows_dd.append(float(dd[best]) / 1_000_000.0)
        return pa.table({
            "event_type": pa.array(rows_et, pa.string()),
            "trough_day": pa.array(rows_day, pa.int64()),
            "max_drawdown": pa.array(round6_tie_robust(
                np.array(rows_dd, dtype=np.float64))),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


FORECAST_BACKTEST_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2)
SELECT a.event_type,
       COUNT(*) AS n_days,
       ROUND(AVG(ABS(a.c - b.c)), 6) AS mae,
       ROUND(AVG(2.0 * ABS(a.c - b.c) / (a.c + b.c)), 6) AS smape
FROM d a JOIN d b ON b.event_type = a.event_type AND b.day = a.day - 7
GROUP BY 1
"""


def q_forecast_backtest(sf_dir: str):
    """Seasonal-naive forecast backtest per series (the forecasting
    baseline every pipeline evaluates against): predict day d's event
    count with day d-7's, score MAE and sMAPE over every day that has
    a lag-7 predecessor.  Counts are exact integers, so MAE is
    order-immune (integer sum / count); sMAPE's float term-sum order
    difference is absorbed by the two-step output round.  Map-side
    daily count partials -> one series-keyed exchange; the lag-7 match
    is one np.searchsorted per series block."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US)})
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "day", "c"])

    partials = ds.map_batches(_daily, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_days", pa.int64()),
                            ("mae", pa.float64()),
                            ("smape", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        c = tbl["c"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        kstarts = np.nonzero(key_new)[0]
        c = np.add.reduceat(c, kstarts).astype(np.int64)
        et, day = et[kstarts], day[kstarts]
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows = {"event_type": [], "n_days": [], "mae": [], "smape": []}
        for st, ln in zip(starts, lens):
            d = day[st:st + ln]
            cc = c[st:st + ln]
            pos = np.searchsorted(d, d - 7)
            ok = (pos < ln) & (d[np.minimum(pos, ln - 1)] == d - 7)
            if not ok.any():
                continue
            actual = cc[ok]
            pred = cc[pos[ok]]
            err = np.abs(actual - pred)
            rows["event_type"].append(et[st])
            rows["n_days"].append(int(ok.sum()))
            rows["mae"].append(float(err.sum()) / float(ok.sum()))
            rows["smape"].append(float(np.sum(
                2.0 * err / (actual + pred))) / float(ok.sum()))
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_days": pa.array(rows["n_days"], pa.int64()),
            "mae": pa.array(round6_tie_robust(
                np.array(rows["mae"], dtype=np.float64))),
            "smape": pa.array(round6_tie_robust(
                np.array(rows["smape"], dtype=np.float64))),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


_COPURCHASE_EDGES_CTE = """
op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p)"""

TRIANGLE_COUNT_SQL = f"""
WITH {_COPURCHASE_EDGES_CTE}
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*)
        FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
"""


def _emit_run_pairs(vals: np.ndarray, starts: np.ndarray,
                    lens: np.ndarray):
    """i<j pair emission over sorted runs, vectorized by length class
    (the covisit_pairs trick): runs of equal length are one reshape +
    one precomputed triu gather — no per-run Python."""
    us_parts, vs_parts = [], []
    for length in np.unique(lens):
        if length < 2:
            continue
        sel = starts[lens == length]
        idx = sel[:, None] + np.arange(length)
        m = vals[idx]
        iu, ju = np.triu_indices(int(length), 1)
        us_parts.append(m[:, iu].ravel())
        vs_parts.append(m[:, ju].ravel())
    if not us_parts:
        e = np.empty(0, np.int64)
        return e, e
    return np.concatenate(us_parts), np.concatenate(vs_parts)


_EK_SCHEMA = pa.schema([("k", pa.int64())])


def _copurchase_order_parts(sf_dir: str):
    """Distinct (l_orderkey, l_partkey) rows of lineitem — the bipartite
    incidence every co-purchase graph query starts from (map-side
    distinct; cross-block dups are finished inside the order-keyed
    exchange downstream)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def _distinct_op(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["l_orderkey"]),
                                     pc.is_valid(batch["l_partkey"])))
        return batch.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    return ds.map_batches(_distinct_op, batch_format="pyarrow",
                          zero_copy_batch=True)


def _distinct_order_count(op) -> int:
    """Exact distinct l_orderkey count of the incidence dataset (block
    pre-distinct partials -> one driver-side unique at order scale is
    WRONG at crawl scale, so this goes through the house exact distinct
    exchange)."""
    from ..stages.sketch import distinct_count_exact

    one = op.map_batches(
        lambda b: pa.table({"g": np.zeros(len(b), np.int64),
                            "o": b["l_orderkey"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    out = _collect_raw(distinct_count_exact(one, ["g"], ["o"],
                                            out_col="n"))
    return int(out["n"][0].as_py()) if len(out) else 0


def _copurchase_pairs_raw(sf_dir: str):
    """One row per (order, unordered part pair) occurrence, packed to
    the int64 edge key u<<32|v: one orderkey exchange, sorted-run pair
    emission (covisit length-class vectorization)."""
    from ..stages.sorted_groups import sorted_group_map

    op = _copurchase_order_parts(sf_dir)
    ek_schema = _EK_SCHEMA

    def _order_pairs(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return ek_schema.empty_table()
        tbl = batch.sort_by([("l_orderkey", "ascending"),
                             ("l_partkey", "ascending")])
        o = tbl["l_orderkey"].to_numpy(zero_copy_only=False)
        p = tbl["l_partkey"].to_numpy(zero_copy_only=False)
        # re-dedup across merged map partials
        keep = np.empty(len(o), dtype=bool)
        keep[0] = True
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        o, p = o[keep], p[keep]
        first = np.empty(len(o), dtype=bool)
        first[0] = True
        first[1:] = o[1:] != o[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(o)))
        u, v = _emit_run_pairs(p, starts, lens)
        # u < v within each sorted run; pack to one int64 edge key
        return pa.table({"k": (u << np.int64(32)) | v}, schema=ek_schema)

    return sorted_group_map(op, ["l_orderkey"], None, ek_schema,
                            block_fn=_order_pairs)


def _copurchase_pair_counts(sf_dir: str):
    """(k, nuv): how many orders contain each unordered part pair — one
    more k-keyed exchange over the raw pair stream (block combiners
    first, so the exchange carries distinct-pair partials)."""
    from ..stages.sorted_groups import sorted_group_map

    raw = _copurchase_pairs_raw(sf_dir)
    cnt_schema = pa.schema([("k", pa.int64()), ("nuv", pa.int64())])

    def _block_count(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["k"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "nuv"]).cast(cnt_schema)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return cnt_schema.empty_table()
        tbl = batch.sort_by([("k", "ascending")])
        k = tbl["k"].to_numpy(zero_copy_only=False)
        n = tbl["nuv"].to_numpy(zero_copy_only=False)
        first = np.empty(len(k), dtype=bool)
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({"k": k[ks], "nuv": np.add.reduceat(n, ks)},
                        schema=cnt_schema)

    return sorted_group_map(
        raw.map_batches(_block_count, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["k"], None, cnt_schema, block_fn=_merge)


def _copurchase_edges(sf_dir: str):
    """Distinct undirected part co-purchase edges (u < v, packed to one
    int64 key u<<32|v), materialized: distinct (order, part) map-side,
    one orderkey exchange for sorted-run pair emission, one edge-key
    exchange for the global distinct.  Shared by triangle_count and
    pagerank_parts (SQL mirror: _COPURCHASE_EDGES_CTE)."""
    from ..stages.sorted_groups import sorted_group_map

    pairs = _copurchase_pairs_raw(sf_dir)
    ek_schema = _EK_SCHEMA

    def _block_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["k"]).aggregate([])

    def _run_distinct(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return ek_schema.empty_table()
        k = batch.sort_by([("k", "ascending")])["k"].to_numpy(
            zero_copy_only=False)
        keep = np.empty(len(k), dtype=bool)
        keep[0] = True
        keep[1:] = k[1:] != k[:-1]
        return pa.table({"k": k[keep]}, schema=ek_schema)

    return sorted_group_map(
        pairs.map_batches(_block_distinct, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["k"], None, ek_schema, block_fn=_run_distinct).materialize()


def _copurchase_degrees(edges):
    """(sorted node ids, degree) of the packed-edge dataset — node-count
    scale, merged on the driver from per-block partials."""
    deg_schema = pa.schema([("node", pa.int64()), ("d", pa.int64())])

    def _block_deg(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([k >> np.int64(32),
                                k & np.int64(0xFFFFFFFF)])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"node": uniq, "d": cnt.astype(np.int64)},
                        schema=deg_schema)

    deg_parts = _collect_raw(edges.map_batches(
        _block_deg, batch_format="pyarrow", zero_copy_batch=True))
    node_all = deg_parts["node"].to_numpy(zero_copy_only=False)
    d_all = deg_parts["d"].to_numpy(zero_copy_only=False)
    order = np.argsort(node_all, kind="stable")
    node_all, d_all = node_all[order], d_all[order]
    if not len(node_all):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    first = np.empty(len(node_all), dtype=bool)
    first[0] = True
    first[1:] = node_all[1:] != node_all[:-1]
    nstarts = np.nonzero(first)[0]
    return node_all[nstarts], np.add.reduceat(d_all, nstarts)


def q_triangle_count(sf_dir: str):
    """Triangle counting on the part co-purchase graph (nodes =
    partkeys, an edge where two parts share an order) — the classic
    graph-analytics kernel for community structure.  The algorithm is
    degree-ordered wedge counting (O(m^1.5) work, the web-scale
    standard): edges are oriented from the (degree, id)-lower endpoint,
    wedges are emitted only from each node's out-neighborhood, and a
    wedge closes a triangle iff its (b, c) endpoint pair is itself an
    edge — each triangle counted exactly once at its order-minimal
    vertex.  Shuffles: one orderkey exchange (pair emission), one
    edge-key exchange (global distinct), one src exchange (wedges).
    The degree table is node-count scale (broadcast); the edge-key
    membership probe broadcasts the sorted int64 key set under the
    collect gate — above ~2M edges the documented switch is a
    (b,c)-keyed Dataset.join of wedges against edges."""
    import ray

    from ..stages.sorted_groups import sorted_group_map

    edges = _copurchase_edges(sf_dir)
    n_edges = edges.count()
    nodes, deg = _copurchase_degrees(edges)
    nodes_ref = ray.put(nodes)
    deg_ref = ray.put(deg)
    # sorted edge-key set for the closure probe (gated broadcast; the
    # >2M-edge path is a (b,c)-keyed Dataset.join documented above)
    edge_keys = np.sort(np.concatenate(
        [t["k"].to_numpy(zero_copy_only=False)
         for t in ray.get(edges.to_arrow_refs()) if len(t)] or
        [np.empty(0, np.int64)]))
    ek_ref = ray.put(edge_keys)

    dir_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _orient(batch: pa.Table) -> pa.Table:
        import ray as _ray
        nd = _ray.get(nodes_ref)
        dg = _ray.get(deg_ref)
        k = batch["k"].to_numpy(zero_copy_only=False)
        u = k >> np.int64(32)
        v = k & np.int64(0xFFFFFFFF)
        du = dg[np.searchsorted(nd, u)]
        dv = dg[np.searchsorted(nd, v)]
        # orient low (degree, id) -> high: u < v already breaks ties
        flip = du > dv
        src = np.where(flip, v, u)
        dst = np.where(flip, u, v)
        return pa.table({"src": src, "dst": dst}, schema=dir_schema)

    directed = edges.map_batches(_orient, batch_format="pyarrow",
                                 zero_copy_batch=True)
    cnt_schema = pa.schema([("n", pa.int64())])

    def _wedge_close(batch: pa.Table) -> pa.Table:
        import ray as _ray
        ek = _ray.get(ek_ref)
        if len(batch) < 2:
            return pa.table({"n": np.zeros(1, np.int64)},
                            schema=cnt_schema)
        tbl = batch.sort_by([("src", "ascending"), ("dst", "ascending")])
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        first = np.empty(len(src), dtype=bool)
        first[0] = True
        first[1:] = src[1:] != src[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(src)))
        b, c = _emit_run_pairs(dst, starts, lens)
        if len(b) == 0:
            return pa.table({"n": np.zeros(1, np.int64)},
                            schema=cnt_schema)
        lo = np.minimum(b, c)
        hi = np.maximum(b, c)
        wk = (lo << np.int64(32)) | hi
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
        return pa.table({"n": np.array([int(hit.sum())], np.int64)},
                        schema=cnt_schema)

    closed = sorted_group_map(directed, ["src"], None, cnt_schema,
                              block_fn=_wedge_close)
    n_tri = int(sum(t["n"].to_numpy(zero_copy_only=False).sum()
                    for t in ray.get(closed.materialize().to_arrow_refs())
                    if len(t)))
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64())})


TEXT_NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
         AS text_norm,
       length(trim(regexp_replace(lower(nfc_normalize(text)),
                                  '\s+', ' ', 'g'))) AS n_chars_norm
FROM documents
WHERE doc_id IS NOT NULL AND text IS NOT NULL
"""


def q_text_normalize(sf_dir: str):
    """Corpus text normalization (the canonical LLM-data cleanup pass
    before dedup/tokenization): Unicode NFC, casefold, whitespace-run
    collapse, trim — emitted as the cleaned text column itself.  Fully
    vectorized Arrow kernels (utf8_normalize / utf8_lower /
    replace_substring_regex are all RE2/utf8proc-backed, byte-identical
    to DuckDB's nfc_normalize + lower + regexp_replace — probed on the
    corpus); zero Python in the row path; streams map-only with no
    shuffle."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("text_norm", pa.string()),
                            ("n_chars_norm", pa.int64())])

    def _norm(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["doc_id"]),
                                     pc.is_valid(batch["text"])))
        t = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_normalize(batch["text"], form="NFC")),
            r"\s+", " "))
        return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                         "text_norm": t,
                         "n_chars_norm": pc.utf8_length(t).cast(pa.int64())},
                        schema=out_schema)

    return _collect(ds.map_batches(_norm, batch_format="pyarrow",
                                   zero_copy_batch=True))


def _negative_sampling_sql() -> str:
    from ..stages.sampling import hash_bucket_fine_sql

    h = hash_bucket_fine_sql("(uw.user_id * 64 + ty.idx)", 7)
    return f"""
WITH pos AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week,
         event_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL),
ty AS (
  SELECT event_type, ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx
  FROM (SELECT DISTINCT event_type FROM pos)),
uw AS (SELECT DISTINCT user_id, week FROM pos),
cand AS (
  SELECT uw.user_id, uw.week, ty.event_type, {h} AS h
  FROM uw CROSS JOIN ty
  WHERE NOT EXISTS (SELECT 1 FROM pos
                    WHERE pos.user_id = uw.user_id
                      AND pos.week = uw.week
                      AND pos.event_type = ty.event_type)),
r AS (
  SELECT user_id, week, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, week
                            ORDER BY h, event_type) AS rn
  FROM cand)
SELECT user_id, week, event_type AS neg_type, rn AS rank
FROM r WHERE rn <= 2
"""


def q_negative_sampling(sf_dir: str):
    """Deterministic negative sampling for training pairs (the
    contrastive / recommender data-prep op): for every active
    (user, week), the 2 event types the user did NOT touch that week,
    ranked by the house SQL-mirrorable integer hash
    (stages/sampling.hash_bucket_fine) over (user, type) — so the
    sample is reproducible run-to-run and shard-invariant.  The type
    vocabulary is tiny and broadcast; positives shrink map-side to
    distinct (user, week, type) and take ONE user-keyed exchange; the
    per-block kernel builds the (user, week) x type presence mask and
    ranks the complement fully vectorized (nonzero/lexsort — no
    per-group Python)."""
    from ..stages.sampling import hash_bucket_fine
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_type"])
    _WEEK_US = 604_800_000_000

    def _distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch["user_id"],
                      "week": pc.divide(batch["ts"].cast(pa.int64()),
                                        _WEEK_US),
                      "event_type": batch["event_type"]})
        return t.group_by(["user_id", "week", "event_type"]).aggregate([])

    pairs = ds.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True)
    # vocabulary: bounded type set, merged on the driver (per-key scale)
    voc_parts = _collect_raw(pairs.map_batches(
        lambda b: b.select(["event_type"]).group_by(
            ["event_type"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True))
    vocab = np.unique(np.asarray(
        voc_parts["event_type"].to_pylist(), dtype=object))
    v_n = len(vocab)
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("week", pa.int64()),
                            ("neg_type", pa.string()),
                            ("rank", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("user_id", "ascending"),
                             ("week", "ascending"),
                             ("event_type", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        wk = tbl["week"].to_numpy(zero_copy_only=False)
        et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
        keep = np.empty(len(uid), dtype=bool)
        keep[0] = True
        keep[1:] = ((uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])
                    | (et[1:] != et[:-1]))
        uid, wk, et = uid[keep], wk[keep], et[keep]
        first = np.empty(len(uid), dtype=bool)
        first[0] = True
        first[1:] = (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])
        run = np.cumsum(first) - 1
        users, weeks = uid[first], wk[first]
        present = np.zeros((len(users), v_n), dtype=bool)
        present[run, np.searchsorted(vocab, et)] = True
        cu, ct = np.nonzero(~present)
        if len(cu) == 0:
            return out_schema.empty_table()
        h = hash_bucket_fine(users[cu] * 64 + ct, salt=7)
        order = np.lexsort((ct, h, cu))
        cu, ct = cu[order], ct[order]
        nfirst = np.empty(len(cu), dtype=bool)
        nfirst[0] = True
        nfirst[1:] = cu[1:] != cu[:-1]
        rank = np.arange(len(cu)) - np.maximum.accumulate(
            np.where(nfirst, np.arange(len(cu)), 0)) + 1
        sel = rank <= 2
        return pa.table({
            "user_id": pa.array(users[cu[sel]], pa.int64()),
            "week": pa.array(weeks[cu[sel]], pa.int64()),
            "neg_type": pa.array(vocab[ct[sel]], pa.string()),
            "rank": pa.array(rank[sel], pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(pairs, ["user_id"], None,
                                     out_schema, block_fn=_block))


HOURLY_ENTROPY_SQL = """
WITH h AS (
  SELECT event_type,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
         COUNT(*) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT event_type, SUM(n) AS tot FROM h GROUP BY 1),
ent AS (
  SELECT h.event_type,
         SUM(-(CAST(h.n AS DOUBLE) / t.tot)
             * LN(CAST(h.n AS DOUBLE) / t.tot)) AS e
  FROM h JOIN t USING (event_type) GROUP BY 1),
pk AS (
  SELECT event_type, hour,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, hour) AS rn
  FROM h)
SELECT ent.event_type, ROUND(ent.e, 6) AS hour_entropy,
       pk.hour AS peak_hour
FROM ent JOIN pk USING (event_type) WHERE pk.rn = 1
"""


def q_hourly_entropy(sf_dir: str):
    """Temporal-regularity profile per series: Shannon entropy of the
    hour-of-day activity histogram (low = strongly diurnal, ln 24 =
    uniform) plus the peak hour (integer-count argmax, ties -> earliest
    hour, so the argmax is order-immune).  Map-side (type, hour) count
    partials -> one series-keyed exchange over <= 24 rows per series;
    the ln term-sum order difference vs the SQL oracle is absorbed by
    the two-step output round (conditional_entropy precedent)."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])
    _HOUR_US = 3_600_000_000

    def _hourly(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "hour": pc.divide(
                          pc.subtract(t_us, pc.multiply(
                              pc.divide(t_us, _DAY_US), _DAY_US)),
                          _HOUR_US)})
        g = t.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "hour", "n"])

    partials = ds.map_batches(_hourly, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("hour_entropy", pa.float64()),
                            ("peak_hour", pa.int64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("hour", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        hour = tbl["hour"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (hour[1:] != hour[:-1])
        kstarts = np.nonzero(key_new)[0]
        n = np.add.reduceat(n, kstarts).astype(np.int64)
        et, hour = et[kstarts], hour[kstarts]
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows_et, rows_e, rows_pk = [], [], []
        for st, ln in zip(starts, lens):
            cnt = n[st:st + ln]
            p = cnt / cnt.sum()
            rows_et.append(et[st])
            rows_e.append(float(np.sum(-p * np.log(p))))
            rows_pk.append(int(hour[st + int(np.argmax(cnt))]))
        return pa.table({
            "event_type": pa.array(rows_et, pa.string()),
            "hour_entropy": pa.array(round6_tie_robust(
                np.array(rows_e, dtype=np.float64))),
            "peak_hour": pa.array(rows_pk, pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


PAGERANK_PARTS_SQL = f"""
WITH {_COPURCHASE_EDGES_CTE},
sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v AS a, u AS b FROM e),
deg AS (SELECT a, COUNT(*) AS d FROM sym GROUP BY 1),
r1 AS (
  SELECT s.a, ROUND(0.15 + 0.85 * SUM(1.0 / db.d), 6) AS r
  FROM sym s JOIN deg db ON db.a = s.b GROUP BY s.a),
r2 AS (
  SELECT s.a, ROUND(0.15 + 0.85 * SUM(r1.r / db.d), 6) AS r
  FROM sym s JOIN deg db ON db.a = s.b JOIN r1 ON r1.a = s.b
  GROUP BY s.a)
SELECT a AS part, r AS pagerank FROM r2
"""


def q_pagerank_parts(sf_dir: str):
    """PageRank (2 fixed power iterations, damping 0.85, uniform init)
    over the part co-purchase graph — the iterative-graph-computation
    pattern (each iteration: broadcast the node-rank vector, stream the
    edge list once, merge node-scale partial contribution sums).
    PARITY: ranks are two-step-rounded after EVERY iteration on both
    sides, so cross-engine ulp drift cannot compound; the per-node
    contribution terms (rank/degree) are then bitwise-identical doubles
    and the remaining term-sum order difference is absorbed by the next
    round.  Edges stream per iteration (never collected); node state is
    per-key scale — at web scale the documented switch is hash-
    partitioned rank join instead of the broadcast vector."""
    import ray

    from ..kernels.rounding import round6_tie_robust

    edges = _copurchase_edges(sf_dir)
    nodes, deg = _copurchase_degrees(edges)
    if len(nodes) == 0:
        return pa.table({"part": pa.array([], pa.int64()),
                         "pagerank": pa.array([], pa.float64())})
    nodes_ref = ray.put(nodes)
    part_schema = pa.schema([("node", pa.int64()), ("c", pa.float64())])
    rank = np.ones(len(nodes), dtype=np.float64)

    for _ in range(2):
        contrib_ref = ray.put(rank / deg)

        def _block_contrib(batch: pa.Table) -> pa.Table:
            nd = ray.get(nodes_ref)
            cv = ray.get(contrib_ref)
            k = batch["k"].to_numpy(zero_copy_only=False)
            u = np.searchsorted(nd, k >> np.int64(32))
            v = np.searchsorted(nd, k & np.int64(0xFFFFFFFF))
            acc = np.bincount(u, weights=cv[v], minlength=len(nd))
            acc += np.bincount(v, weights=cv[u], minlength=len(nd))
            nz = np.nonzero(acc)[0]
            return pa.table({"node": nd[nz], "c": acc[nz]},
                            schema=part_schema)

        parts = _collect_raw(edges.map_batches(
            _block_contrib, batch_format="pyarrow", zero_copy_batch=True))
        total = np.zeros(len(nodes), dtype=np.float64)
        idx = np.searchsorted(nodes, parts["node"].to_numpy(
            zero_copy_only=False))
        np.add.at(total, idx, parts["c"].to_numpy(zero_copy_only=False))
        rank = round6_tie_robust(0.15 + 0.85 * total)

    return pa.table({"part": pa.array(nodes, pa.int64()),
                     "pagerank": pa.array(rank, pa.float64())})


KNN_ACCURACY_SQL = """
WITH nv AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
            WHERE vec_id IS NOT NULL AND label IS NOT NULL
              AND embedding IS NOT NULL),
s AS (
  SELECT a.vec_id AS qid, a.label AS qlab, b.vec_id AS vid,
         b.label AS vlab, list_cosine_similarity(a.e, b.e) AS cos
  FROM nv a JOIN nv b ON a.vec_id <> b.vec_id),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY ROUND(cos, 6) DESC, vid) AS r
  FROM s)
SELECT CAST(qlab AS BIGINT) AS label, COUNT(*) AS n,
       CAST(SUM(CASE WHEN vlab = qlab THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(SUM(CASE WHEN vlab = qlab THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS accuracy
FROM rk WHERE r = 1 GROUP BY 1
"""


def q_knn_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the embedding corpus (the
    embedding-quality eval every retrieval pipeline runs): each vector's
    nearest neighbor by cosine (rounded-6dp rank, vec_id tie-break — the
    ann_topk ordering discipline) votes its label; accuracy reported per
    label.  Engine path: the corpus broadcasts once (query side), every
    block matmuls against it and keeps a per-block best-per-query, one
    query-keyed exchange merges block winners; labels attach from the
    broadcast node-scale lookup.  Accuracy is exact integer counts /
    division at the end."""
    import ray
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import load_corpus
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def _clean(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["vec_id"]),
                            pc.is_valid(batch["label"])),
                    pc.is_valid(batch["embedding"]))
        return batch.filter(m)

    ds = ds.map_batches(_clean, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    ids, mat = load_corpus(ds)
    # node-scale label lookup aligned to the sorted ids
    lab_parts = _collect_raw(ds.map_batches(
        lambda b: b.select(["vec_id", "label"]),
        batch_format="pyarrow", zero_copy_batch=True))
    lid = lab_parts["vec_id"].to_numpy(zero_copy_only=False)
    lv = lab_parts["label"].to_numpy(zero_copy_only=False)
    labels = np.empty(len(ids), dtype=lv.dtype)
    labels[np.searchsorted(ids, lid)] = lv
    qref = ray.put((ids, mat, labels))
    part_schema = pa.schema([("qid", pa.int64()), ("vid", pa.int64()),
                             ("cos", pa.float64())])

    def _block_best(batch: pa.Table) -> pa.Table:
        from ..stages.similarity import _emb_matrix, _normalize
        qids, qmat, _ = ray.get(qref)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        bmat = _normalize(_emb_matrix(batch, "embedding"))
        sims = qmat @ bmat.T
        sims[qids[:, None] == vids[None, :]] = -np.inf
        # per-query block winner by (rounded cos desc, vid asc)
        r = round6_tie_robust(sims)
        vorder = np.argsort(vids, kind="stable")
        r = r[:, vorder]
        best = np.argmax(r, axis=1)
        rows = np.arange(len(qids))
        keep = np.isfinite(r[rows, best])
        return pa.table({
            "qid": pa.array(qids[keep], pa.int64()),
            "vid": pa.array(vids[vorder][best[keep]], pa.int64()),
            "cos": pa.array(r[rows[keep], best[keep]], pa.float64()),
        }, schema=part_schema)

    partials = ds.map_batches(_block_best, batch_format="pyarrow",
                              zero_copy_batch=True)
    win_schema = pa.schema([("qid", pa.int64()), ("vid", pa.int64())])

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return win_schema.empty_table()
        tbl = batch.sort_by([("qid", "ascending"), ("cos", "descending"),
                             ("vid", "ascending")])
        q = tbl["qid"].to_numpy(zero_copy_only=False)
        v = tbl["vid"].to_numpy(zero_copy_only=False)
        first = np.empty(len(q), dtype=bool)
        first[0] = True
        first[1:] = q[1:] != q[:-1]
        return pa.table({"qid": q[first], "vid": v[first]},
                        schema=win_schema)

    winners = _collect_raw(sorted_group_map(partials, ["qid"], None,
                                            win_schema, block_fn=_merge))
    qi = np.searchsorted(ids, winners["qid"].to_numpy(
        zero_copy_only=False))
    vi = np.searchsorted(ids, winners["vid"].to_numpy(
        zero_copy_only=False))
    qlab, vlab = labels[qi], labels[vi]
    uniq = np.unique(qlab)
    n = np.array([(qlab == u).sum() for u in uniq], dtype=np.int64)
    ok = np.array([((qlab == u) & (vlab == qlab)).sum() for u in uniq],
                  dtype=np.int64)
    return pa.table({
        "label": pa.array(uniq.astype(np.int64), pa.int64()),
        "n": pa.array(n, pa.int64()),
        "n_correct": pa.array(ok, pa.int64()),
        "accuracy": pa.array(round6_tie_robust(ok / n), pa.float64()),
    })


TEMPORAL_MOTIFS_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_pairs
FROM ev a JOIN ev b ON b.user_id = a.user_id
  AND b.t > a.t AND b.t <= a.t + 3600000000
GROUP BY 1, 2
"""


def q_temporal_motifs(sf_dir: str):
    """Temporal motif counts (the event-sequence mining op): for every
    ordered type pair (A, B), how many times some user did B within one
    hour strictly AFTER doing A — the windowed generalization of the
    adjacent-transition Markov counts.  One user-keyed exchange; per
    user run the window bounds come from two searchsorted calls on the
    time-sorted run (strict > excludes equal-timestamp pairs, so the
    count is order-convention-free) and the pair expansion is the
    repeat/cumsum gather.  Block partials collapse to the bounded
    |types|^2 key space before the driver merge."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "event_type", "ts"])
    _H_US = 3_600_000_000
    part_schema = pa.schema([("type_a", pa.string()),
                             ("type_b", pa.string()),
                             ("n_pairs", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return part_schema.empty_table()
        tbl = pa.table({"user_id": batch["user_id"],
                        "t": batch["ts"].cast(pa.int64()),
                        "event_type": batch["event_type"]}).sort_by(
            [("user_id", "ascending"), ("t", "ascending")])
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        t = tbl["t"].to_numpy(zero_copy_only=False)
        et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
        first = np.empty(len(uid), dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(uid)))
        a_parts, b_parts = [], []
        # per-run searchsorted (runs are single users; the window scan
        # is two sorted probes + one gather per run)
        for st, ln in zip(starts, lens):
            if ln < 2:
                continue
            tr = t[st:st + ln]
            lo = np.searchsorted(tr, tr, side="right")
            hi = np.searchsorted(tr, tr + _H_US, side="right")
            cnt = hi - lo
            tot = int(cnt.sum())
            if tot == 0:
                continue
            rep_i = np.repeat(np.arange(ln), cnt)
            base = np.repeat(np.cumsum(cnt) - cnt, cnt)
            j = np.repeat(lo, cnt) + (np.arange(tot) - base)
            a_parts.append(et[st + rep_i])
            b_parts.append(et[st + j])
        if not a_parts:
            return part_schema.empty_table()
        pairs = pa.table({
            "type_a": pa.array(np.concatenate(a_parts), pa.string()),
            "type_b": pa.array(np.concatenate(b_parts), pa.string()),
        })
        g = pairs.group_by(["type_a", "type_b"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["type_a", "type_b", "n_pairs"]).cast(
            part_schema)

    partials = _collect_raw(sorted_group_map(
        ds, ["user_id"], None, part_schema, block_fn=_block))
    merged = partials.group_by(["type_a", "type_b"]).aggregate(
        [("n_pairs", "sum")])
    return merged.rename_columns(["type_a", "type_b", "n_pairs"])


LAG_FEATURES_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value), 6) * 1000000 + 0.5) AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
f AS (
  SELECT event_type, day, mi,
         LAG(mi, 1) OVER w AS l1,
         LAG(mi, 7) OVER w AS l7,
         SUM(mi) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS c7
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
SELECT event_type, day,
       ROUND(mi / 1000000.0, 6) AS v,
       ROUND(l1 / 1000000.0, 6) AS lag1,
       ROUND(l7 / 1000000.0, 6) AS lag7,
       ROUND(CAST(s7 AS DOUBLE) / c7 / 1000000.0, 6) AS rmean7
FROM f
"""


def q_lag_features(sf_dir: str):
    """Per-series lag-feature matrix (the feature-engineering
    materialization a forecasting / anomaly model trains on): daily
    value, row-lag-1, row-lag-7 and trailing-7-row mean per series.
    PARITY BY INTEGER ALGEBRA: daily sums are two-step-rounded then
    scaled to exact int64 micro-units; lags are exact gathers and the
    rolling mean is an int cumsum difference divided once at the end —
    no float accumulates across rows on either side.  Leading rows
    keep NULL lags (both engines).  Map-side daily partials -> one
    series-keyed exchange."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate([("v", "sum")])
        return g.rename_columns(["event_type", "day", "s"])

    partials = ds.map_batches(_daily, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("day", pa.int64()),
                            ("v", pa.float64()),
                            ("lag1", pa.float64()),
                            ("lag7", pa.float64()),
                            ("rmean7", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("day", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        s = tbl["s"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(et), dtype=bool)
        key_new[0] = True
        key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        kstarts = np.nonzero(key_new)[0]
        s = np.add.reduceat(s, kstarts)
        et, day = et[kstarts], day[kstarts]
        mi = np.floor(round6_tie_robust(s) * 1_000_000.0
                      + 0.5).astype(np.int64)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(et)), 0))
        pos = np.arange(len(et)) - run_start  # row index within series
        n = len(et)

        def _lag(k: int):
            out = np.full(n, np.nan)
            ok = pos >= k
            out[ok] = mi[np.nonzero(ok)[0] - k] / 1_000_000.0
            return out

        cum = np.cumsum(mi)
        # trailing-7-row sum: cum[i] - cum[i-w] within the run
        w = np.minimum(pos + 1, 7)
        prev = np.arange(n) - w
        sum7 = cum - np.where(prev >= 0, cum[np.maximum(prev, 0)], 0)
        # rows whose window would cross the run start use pos+1 rows,
        # so prev = run_start - 1 and the subtraction stays in-run
        rmean = sum7.astype(np.float64) / w / 1_000_000.0
        return pa.table({
            "event_type": pa.array(et, pa.string()),
            "day": pa.array(day, pa.int64()),
            "v": pa.array(round6_tie_robust(mi / 1_000_000.0)),
            "lag1": pa.array(round6_tie_robust(_lag(1))),
            "lag7": pa.array(round6_tie_robust(_lag(7))),
            "rmean7": pa.array(round6_tie_robust(rmean)),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["event_type"], None,
                                     out_schema, block_fn=_series))


WEIGHTED_MEDIAN_SQL = """
WITH x AS (
  SELECT l_returnflag AS rf,
         CAST(FLOOR(ROUND(l_extendedprice, 6) * 1000000 + 0.5)
              AS BIGINT) AS pi,
         CAST(FLOOR(l_quantity) AS BIGINT) AS w
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_quantity IS NOT NULL),
g AS (SELECT rf, pi, SUM(w) AS w FROM x GROUP BY 1, 2),
c AS (
  SELECT rf, pi,
         SUM(w) OVER (PARTITION BY rf ORDER BY pi) AS cw,
         SUM(w) OVER (PARTITION BY rf) AS tw
  FROM g),
m AS (SELECT rf, MIN(pi) AS med_pi FROM c WHERE 2 * cw >= tw GROUP BY 1)
SELECT m.rf AS l_returnflag,
       ROUND(m.med_pi / 1000000.0, 6) AS wmedian_price,
       CAST(t.tw AS BIGINT) AS total_weight
FROM m JOIN (SELECT rf, CAST(SUM(w) AS BIGINT) AS tw FROM g
             GROUP BY 1) t ON t.rf = m.rf
"""


def q_weighted_median(sf_dir: str):
    """Quantity-weighted median price per return flag (the weighted
    percentile every pricing / billing readout needs — the unweighted
    quantile sketch can't express it).  PARITY BY INTEGER ALGEBRA:
    prices two-step-round to exact int64 micro-units, weights are
    integer quantities, and the median is the smallest price whose
    cumulative weight satisfies 2*cw >= tw in pure integers — no float
    compare anywhere.  Map-side (flag, price) weight partials collapse
    the exchange to distinct-price scale; one key exchange."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])
    part_schema = pa.schema([("rf", pa.string()), ("pi", pa.int64()),
                             ("w", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["l_returnflag"]),
                            pc.is_valid(batch["l_extendedprice"])),
                    pc.is_valid(batch["l_quantity"]))
        batch = batch.filter(m)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        pi = np.floor(round6_tie_robust(price) * 1_000_000.0
                      + 0.5).astype(np.int64)
        w = np.floor(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        t = pa.table({"rf": batch["l_returnflag"], "pi": pi, "w": w})
        g = t.group_by(["rf", "pi"]).aggregate([("w", "sum")])
        return g.rename_columns(["rf", "pi", "w"]).cast(part_schema)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([("l_returnflag", pa.string()),
                            ("wmedian_price", pa.float64()),
                            ("total_weight", pa.int64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("rf", "ascending"), ("pi", "ascending")])
        rf = tbl["rf"].to_numpy(zero_copy_only=False)
        pi = tbl["pi"].to_numpy(zero_copy_only=False)
        w = tbl["w"].to_numpy(zero_copy_only=False)
        key_new = np.empty(len(rf), dtype=bool)
        key_new[0] = True
        key_new[1:] = (rf[1:] != rf[:-1]) | (pi[1:] != pi[:-1])
        kstarts = np.nonzero(key_new)[0]
        w = np.add.reduceat(w, kstarts)
        rf, pi = rf[kstarts], pi[kstarts]
        first = np.empty(len(rf), dtype=bool)
        first[0] = True
        first[1:] = rf[1:] != rf[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(rf)))
        rows_rf, rows_m, rows_t = [], [], []
        for st, ln in zip(starts, lens):
            ww = w[st:st + ln]
            cw = np.cumsum(ww)
            tw = int(cw[-1])
            k = int(np.searchsorted(2 * cw, tw))
            rows_rf.append(rf[st])
            rows_m.append(float(pi[st + k]) / 1_000_000.0)
            rows_t.append(tw)
        return pa.table({
            "l_returnflag": pa.array(rows_rf, pa.string()),
            "wmedian_price": pa.array(round6_tie_robust(
                np.array(rows_m, dtype=np.float64))),
            "total_weight": pa.array(rows_t, pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(partials, ["rf"], None,
                                     out_schema, block_fn=_series))


BURSTINESS_SQL = """
WITH s AS (
  SELECT event_type, epoch_us(ts) // 1000000 AS t
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
g AS (
  SELECT event_type,
         t - LAG(t) OVER (PARTITION BY event_type ORDER BY t) AS gap
  FROM s),
a AS (
  SELECT event_type, COUNT(gap) AS n, SUM(gap) AS s1,
         SUM(gap * gap) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_gap_s,
       ROUND(SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)) / s1, 6) AS cv_gap,
       ROUND((SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)) - s1)
             / (SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)) + s1), 6)
         AS burstiness
FROM a
"""


def q_burstiness(sf_dir: str):
    """Burstiness / coefficient-of-variation of inter-arrival times per
    series (Goh & Barabasi B = (sigma-mu)/(sigma+mu): -1 periodic, 0
    Poisson, ->1 bursty).  PARITY BY INTEGER ALGEBRA: gaps are
    floor-second integers, the moment sums S1/S2 accumulate as exact
    Python ints (SQL: HUGEINT), and sigma enters only as
    SQRT(n*S2 - S1^2) of the SAME exact integer on both sides — the n
    denominators cancel in B, so no intermediate float exists to
    diverge.  Equal timestamps contribute gap 0 regardless of tie
    order (the gap multiset of a sorted sequence is order-free).  One
    series-keyed exchange."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])

    def _secs(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "t": pc.divide(batch["ts"].cast(pa.int64()),
                                        1_000_000)})

    pts = ds.map_batches(_secs, batch_format="pyarrow",
                         zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_gaps", pa.int64()),
                            ("mean_gap_s", pa.float64()),
                            ("cv_gap", pa.float64()),
                            ("burstiness", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("t", "ascending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        t = tbl["t"].to_numpy(zero_copy_only=False)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows = {"event_type": [], "n_gaps": [], "mean": [], "cv": [],
                "b": []}
        for st, ln in zip(starts, lens):
            if ln < 2:
                continue
            gap = np.diff(t[st:st + ln])
            n = int(len(gap))
            s1 = int(gap.sum())
            s2 = int((gap * gap).sum())
            var_num = n * s2 - s1 * s1  # exact Python int
            sq = float(np.sqrt(float(var_num)))
            rows["event_type"].append(et[st])
            rows["n_gaps"].append(n)
            rows["mean"].append(float(s1) / n)
            rows["cv"].append(sq / s1 if s1 else float("nan"))
            rows["b"].append((sq - s1) / (sq + s1)
                             if (sq + s1) else float("nan"))
        return pa.table({
            "event_type": pa.array(rows["event_type"], pa.string()),
            "n_gaps": pa.array(rows["n_gaps"], pa.int64()),
            "mean_gap_s": pa.array(round6_tie_robust(
                np.array(rows["mean"], dtype=np.float64))),
            "cv_gap": pa.array(round6_tie_robust(
                np.array(rows["cv"], dtype=np.float64))),
            "burstiness": pa.array(round6_tie_robust(
                np.array(rows["b"], dtype=np.float64))),
        }, schema=out_schema)

    return _collect(sorted_group_map(pts, ["event_type"], None,
                                     out_schema, block_fn=_series))


EMBEDDING_QUANTIZE_SQL = """
WITH u AS (
  SELECT vec_id, label, d.dim AS dim,
         CAST(embedding[d.dim] AS DOUBLE) AS x
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS dim) d
  WHERE vec_id IS NOT NULL AND label IS NOT NULL
    AND embedding IS NOT NULL),
mm AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM u GROUP BY 1),
q AS (
  SELECT u.vec_id, u.label, u.x,
         CASE WHEN mm.hi > mm.lo THEN
           mm.lo + FLOOR((u.x - mm.lo) / (mm.hi - mm.lo) * 255.0 + 0.5)
                   * (mm.hi - mm.lo) / 255.0
         ELSE u.x END AS recon
  FROM u JOIN mm USING (dim))
SELECT CAST(label AS BIGINT) AS label, COUNT(DISTINCT vec_id) AS n_vecs,
       ROUND(AVG((x - recon) * (x - recon)) * 1000000.0, 6)
         AS mse_e6
FROM q GROUP BY 1
"""


def q_embedding_quantize(sf_dir: str):
    """Scalar int8 quantization of the embedding corpus (the SQ8
    compression every vector store offers) with per-label mean squared
    reconstruction error: per-dimension [min, max] trains on ONE
    streaming pass (dim-scale state on the driver), codes are
    FLOOR(t * 255 + 0.5) on identical doubles both sides, and the MSE
    term values are bitwise-identical cross-engine (float32 inputs
    widen exactly; min/max are elementwise-exact) so only the term-sum
    order differs — absorbed by the two-step output round.  Scaled by
    1e6 so 6-dp rounding keeps real precision."""
    import ray
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def _clean(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["vec_id"]),
                            pc.is_valid(batch["label"])),
                    pc.is_valid(batch["embedding"]))
        return batch.filter(m)

    ds = ds.map_batches(_clean, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    mm_schema = pa.schema([("dim", pa.int64()), ("lo", pa.float64()),
                           ("hi", pa.float64())])

    def _block_minmax(batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, "embedding").astype(np.float64)
        d = mat.shape[1]
        return pa.table({"dim": np.arange(d, dtype=np.int64),
                         "lo": mat.min(axis=0), "hi": mat.max(axis=0)},
                        schema=mm_schema)

    parts = _collect_raw(ds.map_batches(_block_minmax,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True))
    dims = parts["dim"].to_numpy(zero_copy_only=False)
    n_dim = int(dims.max()) + 1
    lo = np.full(n_dim, np.inf)
    hi = np.full(n_dim, -np.inf)
    np.minimum.at(lo, dims, parts["lo"].to_numpy(zero_copy_only=False))
    np.maximum.at(hi, dims, parts["hi"].to_numpy(zero_copy_only=False))
    mm_ref = ray.put((lo, hi))
    err_schema = pa.schema([("label", pa.int64()), ("n_vecs", pa.int64()),
                            ("se", pa.float64()), ("n_terms", pa.int64())])

    def _block_err(batch: pa.Table) -> pa.Table:
        lo_, hi_ = ray.get(mm_ref)
        mat = _emb_matrix(batch, "embedding").astype(np.float64)
        span = hi_ - lo_
        ok = span > 0
        t = np.zeros_like(mat)
        t[:, ok] = (mat[:, ok] - lo_[ok]) / span[ok]
        code = np.floor(t * 255.0 + 0.5)
        recon = np.where(ok, lo_ + code * span / 255.0, mat)
        se = (mat - recon) ** 2
        lab = batch["label"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq = np.unique(lab)
        rows_se = np.array([se[lab == u].sum() for u in uniq])
        rows_nv = np.array([(lab == u).sum() for u in uniq],
                           dtype=np.int64)
        return pa.table({
            "label": pa.array(uniq, pa.int64()),
            "n_vecs": pa.array(rows_nv, pa.int64()),
            "se": pa.array(rows_se, pa.float64()),
            "n_terms": pa.array(rows_nv * mat.shape[1], pa.int64()),
        }, schema=err_schema)

    parts = _collect_raw(ds.map_batches(_block_err,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True))
    lab = parts["label"].to_numpy(zero_copy_only=False)
    uniq = np.unique(lab)
    nv = np.array([parts["n_vecs"].to_numpy(
        zero_copy_only=False)[lab == u].sum() for u in uniq],
        dtype=np.int64)
    se = np.array([parts["se"].to_numpy(
        zero_copy_only=False)[lab == u].sum() for u in uniq])
    nt = np.array([parts["n_terms"].to_numpy(
        zero_copy_only=False)[lab == u].sum() for u in uniq],
        dtype=np.int64)
    return pa.table({
        "label": pa.array(uniq, pa.int64()),
        "n_vecs": pa.array(nv, pa.int64()),
        "mse_e6": pa.array(round6_tie_robust(se / nt * 1_000_000.0),
                           pa.float64()),
    })


TRENDING_DECAY_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
mx AS (SELECT MAX(day) AS dmax FROM d)
SELECT event_type, COUNT(*) AS n_days,
       ROUND(SUM(c * POWER(2.0, day - dmax)), 6) AS trending_score
FROM d CROSS JOIN mx GROUP BY 1
"""


def q_trending_decay(sf_dir: str):
    """Exponentially time-decayed activity score per series (the
    trending readout: half-life one day, anchored at the corpus's
    newest day).  The decay factor is a DYADIC power 2^(day-dmax), so
    every term c*2^-k is an exact float64 (count 17 bits + 30-day span
    < the 53-bit mantissa) and the score is sum-order-free at this
    window length — POWER(2.0, -k) is exact in both engines.  Map-side
    daily count partials collapse to |types| x |days| rows (bounded at
    any corpus scale) before the driver merge."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US)})
        g = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "day", "c"])

    parts = _collect_raw(ds.map_batches(_daily, batch_format="pyarrow",
                                        zero_copy_batch=True))
    et = np.asarray(parts["event_type"].to_pylist(), dtype=object)
    day = parts["day"].to_numpy(zero_copy_only=False)
    c = parts["c"].to_numpy(zero_copy_only=False)
    if len(et) == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_days": pa.array([], pa.int64()),
                         "trending_score": pa.array([], pa.float64())})
    order = np.lexsort((day, et))
    et, day, c = et[order], day[order], c[order]
    key_new = np.empty(len(et), dtype=bool)
    key_new[0] = True
    key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
    ks = np.nonzero(key_new)[0]
    c = np.add.reduceat(c, ks)
    et, day = et[ks], day[ks]
    dmax = int(day.max())
    w = np.ldexp(1.0, (day - dmax).astype(np.int64))
    score = c * w
    first = np.empty(len(et), dtype=bool)
    first[0] = True
    first[1:] = et[1:] != et[:-1]
    starts = np.nonzero(first)[0]
    return pa.table({
        "event_type": pa.array(et[starts], pa.string()),
        "n_days": pa.array(np.diff(np.append(starts, len(et))),
                           pa.int64()),
        "trending_score": pa.array(round6_tie_robust(
            np.add.reduceat(score, starts))),
    })


TYPE_JACCARD_SQL = """
WITH p AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
s AS (SELECT event_type, COUNT(*) AS n FROM p GROUP BY 1),
i AS (
  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS nb
  FROM p a JOIN p b ON b.user_id = a.user_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT i.ta AS type_a, i.tb AS type_b, sa.n AS n_a, sb.n AS n_b,
       i.nb AS n_both,
       ROUND(CAST(i.nb AS DOUBLE) / (sa.n + sb.n - i.nb), 6) AS jaccard
FROM i JOIN s sa ON sa.event_type = i.ta
       JOIN s sb ON sb.event_type = i.tb
"""


def q_type_jaccard(sf_dir: str):
    """Exact Jaccard similarity of user AUDIENCES between event-type
    pairs (the segment-overlap readout; the KMV query estimates this,
    here it's exact): |A∩B| comes from the covisit pair counts
    (map-side distinct + one user-keyed exchange), |A| from per-type
    distinct-user counts, and J = both/(na+nb-both) is one division of
    exact integers.  Everything after the user exchange is
    |types|^2-scale."""
    from ..kernels.rounding import round6_tie_robust

    from ..stages.sketch import distinct_count_exact

    both = q_covisit_pairs(sf_dir)  # (type_a, type_b, n_users), exact
    singles = distinct_count_exact(
        _events_nonnull(sf_dir, ["event_type", "user_id"]),
        ["event_type"], ["user_id"], out_col="n_users")
    st = _collect_raw(singles)
    s_map = dict(zip(st["event_type"].to_pylist(),
                     st["n_users"].to_pylist()))
    bt = both
    ta = bt["type_a"].to_pylist()
    tb = bt["type_b"].to_pylist()
    nb = np.asarray(bt["n_users"].to_pylist(), dtype=np.int64)
    na = np.array([s_map[t] for t in ta], dtype=np.int64)
    nbb = np.array([s_map[t] for t in tb], dtype=np.int64)
    return pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "n_a": pa.array(na, pa.int64()),
        "n_b": pa.array(nbb, pa.int64()),
        "n_both": pa.array(nb, pa.int64()),
        "jaccard": pa.array(round6_tie_robust(
            nb / (na + nbb - nb)), pa.float64()),
    })


KEYNESS_TERMS_SQL = """
WITH toks AS (
  SELECT lang, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
),
tl AS (SELECT lang, term, COUNT(*) AS a FROM toks GROUP BY 1, 2),
lt AS (SELECT lang, SUM(a) AS tot_l FROM tl GROUP BY 1),
tt AS (SELECT term, SUM(a) AS tot_t FROM tl GROUP BY 1),
nn AS (SELECT SUM(a) AS n FROM tl),
x AS (
  SELECT tl.lang, tl.term, tl.a,
         tt.tot_t - tl.a AS b, lt.tot_l - tl.a AS c,
         nn.n - tt.tot_t - lt.tot_l + tl.a AS d, nn.n AS n
  FROM tl JOIN tt USING (term) JOIN lt USING (lang) CROSS JOIN nn
  WHERE CAST(tl.a AS HUGEINT) * nn.n
        > CAST(tt.tot_t AS HUGEINT) * lt.tot_l),
k AS (
  SELECT lang, term, a,
         CAST(a * d - b * c AS DOUBLE) * CAST(a * d - b * c AS DOUBLE)
           * CAST(n AS DOUBLE)
           / (CAST((a + b) * (c + d) AS DOUBLE)
              * CAST((a + c) * (b + d) AS DOUBLE)) AS chi2
  FROM x)
SELECT lang, term, CAST(a AS BIGINT) AS n, ROUND(chi2, 6) AS keyness, rn
FROM (SELECT lang, term, a, chi2,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY chi2 DESC, term) AS rn
      FROM k)
WHERE rn <= 5
"""


def q_keyness_terms(sf_dir: str):
    """Distinctive vocabulary per language (corpus-linguistics keyness;
    the 'what words characterize this slice' readout of every corpus
    audit): chi-squared of each term's 2x2 contingency vs the rest of
    the corpus, top-5 OVER-represented terms per language.  PARITY BY
    CONSTRUCTION: a/b/c/d are exact int64 counts, the over-representation
    filter is an exact integer cross-multiply (a*N > tot_t*tot_l), and
    chi2 is built from casts of exact integers combined in the SAME
    left-associated float ops as the oracle — so the unrounded doubles
    are bitwise identical and the DESC rank needs no pre-round.  Uses
    the shared wordcount tokenizer (stages/wordcount); one (lang, term)
    exchange, then a term-keyed exchange for the term marginals; the
    per-language totals are |langs|-scale broadcast state."""
    import ray
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map
    from ..stages.topk import top_k_by_key
    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    tc = term_counts(ds, ["lang"], "text").materialize()
    # per-language token totals + grand total: |langs|-scale
    lt_parts = _collect_raw(tc.map_batches(
        lambda b: b.select(["lang", "n"]).group_by(["lang"]).aggregate(
            [("n", "sum")]).rename_columns(["lang", "n"]),
        batch_format="pyarrow", zero_copy_batch=True))
    ll = np.asarray(lt_parts["lang"].to_pylist(), dtype=object)
    ln = lt_parts["n"].to_numpy(zero_copy_only=False)
    lkeys = np.unique(ll)
    ltot = np.array([ln[ll == k].sum() for k in lkeys], dtype=np.int64)
    n_total = int(ltot.sum())
    lt_ref = ray.put((lkeys, ltot, n_total))
    out_schema = pa.schema([("lang", pa.string()), ("term", pa.string()),
                            ("n", pa.int64()), ("chi2", pa.float64())])

    def _per_term(batch: pa.Table) -> pa.Table:
        lkeys_, ltot_, n_ = ray.get(lt_ref)
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("term", "ascending"),
                             ("lang", "ascending")])
        term = np.asarray(tbl["term"].to_pylist(), dtype=object)
        lang = np.asarray(tbl["lang"].to_pylist(), dtype=object)
        a = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.empty(len(term), dtype=bool)
        first[0] = True
        first[1:] = term[1:] != term[:-1]
        run = np.cumsum(first) - 1
        tot_t = np.bincount(run, weights=a).astype(np.int64)[run]
        tl_ = ltot_[np.searchsorted(lkeys_, lang)]
        keep = a * n_ > tot_t * tl_  # exact int cross-multiply
        if not keep.any():
            return out_schema.empty_table()
        a, term, lang = a[keep], term[keep], lang[keep]
        tot_t, tl_ = tot_t[keep], tl_[keep]
        b = tot_t - a
        c = tl_ - a
        d = n_ - tot_t - tl_ + a
        sq = (a * d - b * c).astype(np.float64)
        chi2 = (sq * sq * np.float64(n_)
                / (((a + b) * (c + d)).astype(np.float64)
                   * ((a + c) * (b + d)).astype(np.float64)))
        return pa.table({"lang": pa.array(lang, pa.string()),
                         "term": pa.array(term, pa.string()),
                         "n": pa.array(a, pa.int64()),
                         "chi2": pa.array(chi2, pa.float64())},
                        schema=out_schema)

    scored = sorted_group_map(tc, ["term"], None, out_schema,
                              block_fn=_per_term)
    top = top_k_by_key(scored, ["lang"], "chi2", 5, tiebreak_col="term",
                       descending=True)
    out = _collect_raw(top)
    return pa.table({
        "lang": out["lang"],
        "term": out["term"],
        "n": out["n"],
        "keyness": pa.array(round6_tie_robust(
            out["chi2"].to_numpy(zero_copy_only=False))),
        "rn": out["rn"],
    })


REPEAT_PURCHASE_SQL = """
WITH o AS (
  SELECT o_custkey AS ck, epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
g AS (
  SELECT ck, day - LAG(day) OVER (PARTITION BY ck ORDER BY day) AS gap
  FROM o)
SELECT CAST(COUNT(gap) AS BIGINT) AS n_repeat_orders,
       CAST(SUM(CASE WHEN gap <= 7 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within_7d,
       ROUND(SUM(CASE WHEN gap <= 7 THEN 1 ELSE 0 END) * 1.0
             / COUNT(gap), 6) AS repeat_7d_rate
FROM g WHERE gap IS NOT NULL
"""


def q_repeat_purchase(sf_dir: str):
    """Repeat-purchase velocity (the loyalty readout): of all orders
    that follow an earlier order by the same customer, the share placed
    within 7 days.  Day gaps of a customer's sorted order dates are an
    order-free multiset (equal dates give gap 0 whatever the tie
    order), counts are exact integers, one customer-keyed exchange."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])

    def _days(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["o_custkey"]),
                    pc.is_valid(batch["o_orderdate"]))
        batch = batch.filter(m)
        return pa.table({
            "ck": batch["o_custkey"],
            "day": pc.divide(batch["o_orderdate"].cast(pa.int64()),
                             _DAY_US)})

    pts = ds.map_batches(_days, batch_format="pyarrow",
                         zero_copy_batch=True)
    part_schema = pa.schema([("n", pa.int64()), ("w", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return pa.table({"n": [0], "w": [0]}, schema=part_schema)
        tbl = batch.sort_by([("ck", "ascending"), ("day", "ascending")])
        ck = tbl["ck"].to_numpy(zero_copy_only=False)
        day = tbl["day"].to_numpy(zero_copy_only=False)
        same = ck[1:] == ck[:-1]
        gap = day[1:] - day[:-1]
        n = int(same.sum())
        w = int((same & (gap <= 7)).sum())
        return pa.table({"n": [n], "w": [w]}, schema=part_schema)

    parts = _collect_raw(sorted_group_map(pts, ["ck"], None, part_schema,
                                          block_fn=_block))
    n = int(parts["n"].to_numpy(zero_copy_only=False).sum())
    w = int(parts["w"].to_numpy(zero_copy_only=False).sum())
    return pa.table({
        "n_repeat_orders": pa.array([n], pa.int64()),
        "n_within_7d": pa.array([w], pa.int64()),
        "repeat_7d_rate": pa.array(round6_tie_robust(
            np.array([w / n if n else float("nan")]))),
    })


COPURCHASE_LIFT_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
pu AS (SELECT p, COUNT(*) AS np FROM op GROUP BY 1),
pr AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS nuv
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p GROUP BY 1, 2),
x AS (
  SELECT pr.u, pr.v, pr.nuv,
         CAST(pr.nuv * n.n_orders AS DOUBLE)
           / CAST(pa.np * pb.np AS DOUBLE) AS lift
  FROM pr JOIN pu pa ON pa.p = pr.u JOIN pu pb ON pb.p = pr.v
       CROSS JOIN n
  WHERE pr.nuv >= 3)
SELECT u AS part_a, v AS part_b, nuv AS n_both,
       ROUND(lift, 6) AS lift, rn
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, u, v) AS rn
      FROM x)
WHERE rn <= 10
"""


def q_copurchase_lift(sf_dir: str):
    """Market-basket lift: the 10 part pairs most over-represented in
    shared orders relative to independence, lift = nuv*N/(nu*nv), at
    support >= 3.  PARITY BY CONSTRUCTION: all four counts are exact
    int64, the lift double is the same one division of the same exact
    products on both sides (bitwise identical), so the global DESC rank
    needs no pre-round; ties break (part_a, part_b).  Pair counts take
    one orderkey exchange + one pair-key exchange; part frequencies are
    part-count-scale broadcast; each block keeps only its local top-10
    candidates before the driver's final merge."""
    import ray

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    from ..stages.sketch import distinct_count_exact

    pairs = _copurchase_pair_counts(sf_dir)
    op = _copurchase_order_parts(sf_dir)
    # part frequencies (part-count scale) + distinct order count.
    # Exact distinct-order count per part: _copurchase_order_parts'
    # map-side distinct is block-local, so a plain count inflates on
    # cross-block (order, part) dups (caught by item_cosine's oracle;
    # lift's top-10 + support filter happened to mask it at test scale)
    pf_tbl = _collect_raw(distinct_count_exact(
        op, ["l_partkey"], ["l_orderkey"], out_col="np")).to_pandas()
    pf = pf_tbl.groupby("l_partkey")["np"].sum().sort_index()
    p_ids = pf.index.values.astype(np.int64)
    p_np = pf.values.astype(np.int64)
    n_orders = _distinct_order_count(op)
    ref = ray.put((p_ids, p_np, n_orders))
    cand_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                             ("nuv", pa.int64()), ("lift", pa.float64())])

    def _block_top(batch: pa.Table) -> pa.Table:
        pi, pn, no = ray.get(ref)
        k = batch["k"].to_numpy(zero_copy_only=False)
        nuv = batch["nuv"].to_numpy(zero_copy_only=False)
        keep = nuv >= 3
        if not keep.any():
            return cand_schema.empty_table()
        k, nuv = k[keep], nuv[keep]
        u = k >> np.int64(32)
        v = k & np.int64(0xFFFFFFFF)
        nu = pn[np.searchsorted(pi, u)]
        nv = pn[np.searchsorted(pi, v)]
        lift = (nuv * no).astype(np.float64) / (nu * nv).astype(
            np.float64)
        top = np.lexsort((v, u, -lift))[:10]
        return pa.table({"u": u[top], "v": v[top], "nuv": nuv[top],
                         "lift": lift[top]}, schema=cand_schema)

    cands = _collect_raw(pairs.map_batches(
        _block_top, batch_format="pyarrow", zero_copy_batch=True))
    u = cands["u"].to_numpy(zero_copy_only=False)
    v = cands["v"].to_numpy(zero_copy_only=False)
    nuv = cands["nuv"].to_numpy(zero_copy_only=False)
    lift = cands["lift"].to_numpy(zero_copy_only=False)
    top = np.lexsort((v, u, -lift))[:10]
    return pa.table({
        "part_a": pa.array(u[top], pa.int64()),
        "part_b": pa.array(v[top], pa.int64()),
        "n_both": pa.array(nuv[top], pa.int64()),
        "lift": pa.array(round6_tie_robust(lift[top]), pa.float64()),
        "rn": pa.array(np.arange(1, len(top) + 1), pa.int64()),
    })


DEDUP_NORMALIZED_SQL = r"""
WITH n AS (
  SELECT doc_id, text,
         substr(trim(regexp_replace(lower(nfc_normalize(text)),
                                    '\s+', ' ', 'g')), 1, 120) AS tn
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
g AS (
  SELECT tn, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_raw
  FROM n GROUP BY 1 HAVING COUNT(*) > 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COALESCE(SUM(n_docs), 0) AS BIGINT) AS n_docs_in_groups,
       CAST(COALESCE(SUM(n_docs), 0) - COUNT(*) AS BIGINT)
         AS n_removable,
       CAST(COALESCE(SUM(CASE WHEN n_raw > 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_groups_distinct_raw
FROM g
"""


def q_dedup_normalized(sf_dir: str):
    """Prefix-fingerprint near-dup audit (the boilerplate / shared-
    opening detector a corpus pipeline runs before expensive MinHash):
    duplicate groups under the NFC/casefold/whitespace-collapsed
    120-char PREFIX, how many docs they cover, how many are removable,
    and how many groups hold byte-distinct raw texts (true near-miss
    dups rather than exact copies).  Group keys travel as 64-bit
    fingerprints of the normalized prefix and the raw text (16-byte
    shuffle rows, the exact_dedup discipline); one fingerprint-keyed
    exchange; the summary is exact integer partials."""
    import ray.data as rd

    from ..kernels.textkit import blake64
    from ..stages.sorted_groups import sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    fp_schema = pa.schema([("fpn", pa.int64()), ("fpr", pa.int64())])

    def _fp_i64(col) -> np.ndarray:
        vals = col.to_pylist()
        return np.fromiter(
            (blake64((s or "").encode("utf-8")) for s in vals),
            dtype=np.uint64, count=len(vals)).view(np.int64)

    def _fps(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["doc_id"]),
                                     pc.is_valid(batch["text"])))
        tn = pc.utf8_slice_codeunits(
            pc.utf8_trim_whitespace(pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_normalize(batch["text"],
                                                form="NFC")),
                r"\s+", " ")), 0, 120)
        return pa.table({
            "fpn": pa.array(_fp_i64(tn), pa.int64()),
            "fpr": pa.array(_fp_i64(batch["text"]), pa.int64()),
        }, schema=fp_schema)

    keyed = ds.map_batches(_fps, batch_format="pyarrow",
                           zero_copy_batch=True)
    part_schema = pa.schema([("ng", pa.int64()), ("nd", pa.int64()),
                             ("no", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"ng": [0], "nd": [0], "no": [0]},
                            schema=part_schema)
        tbl = batch.sort_by([("fpn", "ascending"), ("fpr", "ascending")])
        fpn = tbl["fpn"].to_numpy(zero_copy_only=False)
        fpr = tbl["fpr"].to_numpy(zero_copy_only=False)
        first = np.empty(len(fpn), dtype=bool)
        first[0] = True
        first[1:] = fpn[1:] != fpn[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(fpn)))
        dup = lens > 1
        ng = int(dup.sum())
        nd = int(lens[dup].sum())
        # groups with >1 distinct raw text: count raw-fp changes per run
        raw_new = np.empty(len(fpn), dtype=bool)
        raw_new[0] = True
        raw_new[1:] = (fpn[1:] != fpn[:-1]) | (fpr[1:] != fpr[:-1])
        run = np.cumsum(first) - 1
        n_raw = np.bincount(run, weights=raw_new).astype(np.int64)
        no = int(((n_raw > 1) & dup).sum())
        return pa.table({"ng": [ng], "nd": [nd], "no": [no]},
                        schema=part_schema)

    parts = _collect_raw(sorted_group_map(keyed, ["fpn"], None,
                                          part_schema, block_fn=_block))
    ng = int(parts["ng"].to_numpy(zero_copy_only=False).sum())
    nd = int(parts["nd"].to_numpy(zero_copy_only=False).sum())
    no = int(parts["no"].to_numpy(zero_copy_only=False).sum())
    return pa.table({
        "n_groups": pa.array([ng], pa.int64()),
        "n_docs_in_groups": pa.array([nd], pa.int64()),
        "n_removable": pa.array([nd - ng], pa.int64()),
        "n_groups_distinct_raw": pa.array([no], pa.int64()),
    })


SHIP_DELAY_QUANTILES_SQL = """
WITH d AS (
  SELECT o.o_orderpriority AS priority,
         CAST(epoch_us(l.l_shipdate) // 86400000000
              - epoch_us(o.o_orderdate) // 86400000000 AS DOUBLE)
           AS delay_d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    AND o.o_orderpriority IS NOT NULL)
SELECT priority,
       ROUND(QUANTILE_CONT(delay_d, 0.50), 6) AS p50_d,
       ROUND(QUANTILE_CONT(delay_d, 0.90), 6) AS p90_d,
       ROUND(QUANTILE_CONT(delay_d, 0.99), 6) AS p99_d
FROM d GROUP BY 1
"""


def q_ship_delay_quantiles(sf_dir: str):
    """Fulfilment-latency SLA percentiles: order-to-ship delay in whole
    days, p50/p90/p99 per order priority — a fact-to-dimension join
    feeding the exact mergeable quantile sketch (stages/sketch
    .quantile_by_key, == QUANTILE_CONT under capacity).  The orders
    side (orderkey -> priority, orderdate) broadcasts under the
    collect_small gate with the documented Dataset.join switch above
    it; delays are exact integer day differences so the only float is
    the quantile interpolation itself."""
    import ray.data as rd

    from ..stages.joins import attach_broadcast, collect_small
    from ..stages.sketch import quantile_by_key

    orders = collect_small(rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def _prep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["l_orderkey"]),
                    pc.is_valid(batch["l_shipdate"]))
        batch = batch.filter(m)
        return pa.table({
            "o_orderkey": batch["l_orderkey"],
            "ship_day": pc.divide(batch["l_shipdate"].cast(pa.int64()),
                                  _DAY_US)})

    pts = li.map_batches(_prep, batch_format="pyarrow",
                         zero_copy_batch=True)
    odays = pa.table({
        "o_orderkey": orders["o_orderkey"],
        "priority": orders["o_orderpriority"],
        "order_day": pc.divide(orders["o_orderdate"].cast(pa.int64()),
                               _DAY_US)})
    joined = attach_broadcast(pts, odays, "o_orderkey",
                              ["priority", "order_day"])

    def _delay(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["priority"]),
                    pc.is_valid(batch["order_day"]))
        batch = batch.filter(m)
        d = pc.subtract(batch["ship_day"], batch["order_day"])
        return pa.table({"priority": batch["priority"],
                         "delay_d": d.cast(pa.float64())})

    delays = joined.map_batches(_delay, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = quantile_by_key(delays, ["priority"], "delay_d",
                          [0.50, 0.90, 0.99],
                          ["p50_d", "p90_d", "p99_d"])
    return _collect(out)


LABEL_CENTROIDS_SQL = """
WITH u AS (
  SELECT label, d.dim AS dim, CAST(embedding[d.dim] AS DOUBLE) AS x
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS dim) d
  WHERE vec_id IS NOT NULL AND label IS NOT NULL
    AND embedding IS NOT NULL)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       COUNT(*) AS n, ROUND(AVG(x), 6) AS centroid
FROM u GROUP BY 1, 2
"""


def q_label_centroids(sf_dir: str):
    """Per-class embedding prototypes (the class-centroid table a
    nearest-centroid classifier / drift monitor trains): mean vector
    per label, emitted long-form as (label, dim, n, centroid).
    Per-block partial sums are one bincount-weighted matmul per label
    (vectorized; blocks emit |labels| x dim rows, never row scale);
    the driver merge sums exact float32-widened doubles and the
    term-order difference vs SQL AVG is absorbed by the two-step
    round.  Dims are 1-based to match the SQL UNNEST subscript."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    part_schema = pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["vec_id"]),
                            pc.is_valid(batch["label"])),
                    pc.is_valid(batch["embedding"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return part_schema.empty_table()
        mat = _emb_matrix(batch, "embedding").astype(np.float64)
        lab = batch["label"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        n_lab, dim = len(uniq), mat.shape[1]
        sums = np.zeros((n_lab, dim))
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv, minlength=n_lab).astype(np.int64)
        return pa.table({
            "label": np.repeat(uniq, dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                           n_lab),
            "s": sums.ravel(),
            "n": np.repeat(cnt, dim),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(_partial, batch_format="pyarrow",
                                        zero_copy_batch=True))
    lab = parts["label"].to_numpy(zero_copy_only=False)
    dim = parts["dim"].to_numpy(zero_copy_only=False)
    s = parts["s"].to_numpy(zero_copy_only=False)
    n = parts["n"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dim, lab))
    lab, dim, s, n = lab[order], dim[order], s[order], n[order]
    first = np.empty(len(lab), dtype=bool)
    if not len(lab):
        return pa.table({"label": pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "centroid": pa.array([], pa.float64())})
    first[0] = True
    first[1:] = (lab[1:] != lab[:-1]) | (dim[1:] != dim[:-1])
    ks = np.nonzero(first)[0]
    s = np.add.reduceat(s, ks)
    n = np.add.reduceat(n, ks)
    return pa.table({
        "label": pa.array(lab[ks], pa.int64()),
        "dim": pa.array(dim[ks], pa.int64()),
        "n": pa.array(n, pa.int64()),
        "centroid": pa.array(round6_tie_robust(s / n), pa.float64()),
    })


TAIL_MEAN_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(FLOOR(ROUND(value, 6) * 1000000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
r AS (
  SELECT event_type, vi,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY vi DESC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM x)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS k,
       ROUND(SUM(vi) / 1000000.0 / COUNT(*), 6) AS tail_mean_p95
FROM r WHERE rn <= CAST(CEIL(n / 20.0) AS BIGINT) GROUP BY 1
"""


def q_tail_mean(sf_dir: str):
    """Expected shortfall / top-5% tail mean per series (the CVaR-style
    risk readout a plain quantile can't give): mean of the k = ceil(n/20)
    largest values.  PARITY BY INTEGER ALGEBRA: values two-step-round to
    exact int64 micro-units BEFORE ranking, so the top-k MULTISET is
    order-free (boundary ties have equal quantized value and identical
    sums), k = (n+19)//20 == CEIL(n/20.0) exactly, and the mean is one
    division of exact integers.  Map-side per-type partial top-k
    candidate pruning would apply at crawl scale; here one series-keyed
    exchange holds each series."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "value"])

    def _quant(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1_000_000.0
                      + 0.5).astype(np.int64)
        return pa.table({"event_type": batch["event_type"], "vi": vi})

    pts = ds.map_batches(_quant, batch_format="pyarrow",
                         zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()), ("k", pa.int64()),
                            ("tail_mean_p95", pa.float64())])

    def _series(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        tbl = batch.sort_by([("event_type", "ascending"),
                             ("vi", "descending")])
        et = tbl["event_type"].to_numpy(zero_copy_only=False)
        vi = tbl["vi"].to_numpy(zero_copy_only=False)
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = et[1:] != et[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(et)))
        rows = {"et": [], "n": [], "k": [], "m": []}
        for st, ln in zip(starts, lens):
            k = (int(ln) + 19) // 20
            top = vi[st:st + k]
            rows["et"].append(et[st])
            rows["n"].append(int(ln))
            rows["k"].append(k)
            rows["m"].append(float(int(top.sum())) / 1_000_000.0 / k)
        return pa.table({
            "event_type": pa.array(rows["et"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "k": pa.array(rows["k"], pa.int64()),
            "tail_mean_p95": pa.array(round6_tie_robust(
                np.array(rows["m"], dtype=np.float64))),
        }, schema=out_schema)

    return _collect(sorted_group_map(pts, ["event_type"], None,
                                     out_schema, block_fn=_series))


XCORR_LAG_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
l AS (SELECT UNNEST(range(-3, 4)) AS lag),
j AS (
  SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
         a.mi AS x, b.mi AS y
  FROM d a JOIN l ON TRUE
       JOIN d b ON b.event_type <> a.event_type
        AND b.day = a.day + l.lag),
s AS (
  SELECT ta, tb, lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM j GROUP BY 1, 2, 3 HAVING COUNT(*) >= 10),
r AS (
  SELECT ta, tb, lag, n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / SQRT(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
                       AS DOUBLE)) AS r
  FROM s
  WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0),
best AS (
  SELECT ta, tb, lag, n, r,
         ROW_NUMBER() OVER (PARTITION BY ta, tb
                            ORDER BY r DESC, lag) AS rn
  FROM r)
SELECT ta AS type_a, tb AS type_b, CAST(lag AS BIGINT) AS best_lag,
       n, ROUND(r, 6) AS best_r
FROM best WHERE rn = 1
"""


def q_xcorr_lag(sf_dir: str):
    """Lead-lag detection between series (which signal anticipates
    which): for every ordered type pair, the day offset in [-3, 3]
    maximizing Pearson correlation of the daily-mean series.  PARITY BY
    CONSTRUCTION: daily means quantize to exact int64 milli-units (the
    quantization is part of the operator contract), all five moment
    sums are exact integers (engine: Python bigints, oracle: HUGEINT),
    and r is the SAME one division of the same exact casts on both
    sides — so the per-pair argmax over identical doubles needs no
    pre-round; ties break to the smaller lag.  Map-side daily partials
    collapse to |types| x |days| rows before the driver's pair-lag
    loop (bounded at any corpus scale)."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day", "s", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(_daily, batch_format="pyarrow",
                                        zero_copy_batch=True))
    et = np.asarray(parts["event_type"].to_pylist(), dtype=object)
    day = parts["day"].to_numpy(zero_copy_only=False)
    s = parts["s"].to_numpy(zero_copy_only=False)
    n = parts["n"].to_numpy(zero_copy_only=False)
    order = np.lexsort((day, et))
    et, day, s, n = et[order], day[order], s[order], n[order]
    if len(et) == 0:
        return pa.table({"type_a": pa.array([], pa.string()),
                         "type_b": pa.array([], pa.string()),
                         "best_lag": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "best_r": pa.array([], pa.float64())})
    key_new = np.empty(len(et), dtype=bool)
    key_new[0] = True
    key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
    ks = np.nonzero(key_new)[0]
    s = np.add.reduceat(s, ks)
    n = np.add.reduceat(n, ks)
    et, day = et[ks], day[ks]
    mi = np.floor(round6_tie_robust(s / n) * 1000.0 + 0.5).astype(
        np.int64)
    series = {}
    first = np.empty(len(et), dtype=bool)
    first[0] = True
    first[1:] = et[1:] != et[:-1]
    for st, ln in zip(np.nonzero(first)[0],
                      np.diff(np.append(np.nonzero(first)[0], len(et)))):
        series[et[st]] = (day[st:st + ln], mi[st:st + ln])
    rows = {"ta": [], "tb": [], "lag": [], "n": [], "r": []}
    for ta in sorted(series):
        da, xa = series[ta]
        for tb in sorted(series):
            if tb == ta:
                continue
            db, xb = series[tb]
            best = None
            for lag in range(-3, 4):
                pos = np.searchsorted(db, da + lag)
                ok = (pos < len(db)) & (db[np.minimum(pos, len(db) - 1)]
                                        == da + lag)
                nn = int(ok.sum())
                if nn < 10:
                    continue
                x = [int(v) for v in xa[ok]]
                y = [int(v) for v in xb[pos[ok]]]
                sx, sy = sum(x), sum(y)
                sxy = sum(a * b for a, b in zip(x, y))
                sxx = sum(a * a for a in x)
                syy = sum(b * b for b in y)
                dx = nn * sxx - sx * sx
                dy = nn * syy - sy * sy
                if dx <= 0 or dy <= 0:
                    continue
                r = float(nn * sxy - sx * sy) / np.sqrt(float(dx * dy))
                if best is None or r > best[0]:
                    best = (r, lag, nn)
            if best is not None:
                rows["ta"].append(ta)
                rows["tb"].append(tb)
                rows["lag"].append(best[1])
                rows["n"].append(best[2])
                rows["r"].append(best[0])
    return pa.table({
        "type_a": pa.array(rows["ta"], pa.string()),
        "type_b": pa.array(rows["tb"], pa.string()),
        "best_lag": pa.array(rows["lag"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "best_r": pa.array(round6_tie_robust(
            np.array(rows["r"], dtype=np.float64))),
    })


_BM25_QUERY_TERMS = ("join", "filter", "stream")

BM25_SCORES_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
tot AS (SELECT SUM(dl) AS tot FROM dl),
qt AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE term IN ('join', 'filter', 'stream') GROUP BY 1, 2),
dfs AS (SELECT term, COUNT(*) AS df FROM qt GROUP BY 1),
sc AS (
  SELECT qt.doc_id, COUNT(*) AS n_hit,
         SUM(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * 2.2)
             / (tf + 1.2 * (1.0 - 0.75
                            + 0.75 * (dl.dl * n_docs) / tot.tot)))
           AS score
  FROM qt JOIN dfs USING (term) JOIN dl USING (doc_id), nd, tot
  GROUP BY 1)
SELECT doc_id, CAST(n_hit AS BIGINT) AS n_hit,
       ROUND(score, 6) AS bm25
FROM sc
"""


def q_bm25_scores(sf_dir: str):
    """Okapi BM25 relevance scoring of every document against a fixed
    query-term set (k1=1.2, b=0.75) — the lexical half of a hybrid
    retrieval pipeline.  Topology: ONE tokenize pass (the shared
    combiner wordcount gives distinct (doc, term) rows), a doc-keyed
    merge for per-doc length + query-term tfs, then TINY per-block
    partials reduce the three global scalars (df per query term, total
    token count) on the driver — corpus-size-independent — and a final
    stateless map scores each matching doc.  No ranking decision rides
    on floats: all score inputs are exact integers and the score is
    output-only (6-dp-rounded), so engine/oracle parity is by
    construction."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n_docs = ds.count()
    dt = term_counts(ds, ["doc_id"])  # distinct (doc_id, term, n)

    qterms = list(_BM25_QUERY_TERMS)
    stat_schema = pa.schema(
        [("doc_id", pa.int64()), ("dl", pa.int64())]
        + [(f"tf{i}", pa.int64()) for i in range(len(qterms))])

    def _per_doc(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return stat_schema.empty_table()
        starts, ends = _runs(batch, ["doc_id"])
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = np.add.reduceat(n, starts)
        terms = batch["term"].to_numpy(zero_copy_only=False)
        idx = pa.array(starts, pa.int64())
        cols = {"doc_id": batch["doc_id"].take(idx),
                "dl": pa.array(dl, pa.int64())}
        # np.add.reduceat over a masked copy: tf of term q within each run
        for i, q in enumerate(qterms):
            masked = np.where(terms == q, n, 0)
            cols[f"tf{i}"] = pa.array(np.add.reduceat(masked, starts),
                                      pa.int64())
        return pa.table(cols, schema=stat_schema)

    stats = sorted_group_map(dt, ["doc_id"], None, stat_schema,
                             block_fn=_per_doc).materialize()

    # block partials -> driver: (sum dl, df per query term) — a handful
    # of rows per block regardless of corpus size
    def _partial(batch: pa.Table) -> pa.Table:
        cols = {"tot": pa.array(
            [int(batch["dl"].to_numpy(zero_copy_only=False).sum())
             if len(batch) else 0], pa.int64())}
        for i in range(len(qterms)):
            tf = batch[f"tf{i}"].to_numpy(zero_copy_only=False)
            cols[f"df{i}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(cols)

    part = _collect_raw(stats.map_batches(_partial, batch_format="pyarrow"))
    tot = int(pc.sum(part["tot"]).as_py() or 0)
    dfs = [int(pc.sum(part[f"df{i}"]).as_py() or 0)
           for i in range(len(qterms))]
    idf = [float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
           for df in dfs]

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_hit", pa.int64()),
                            ("bm25", pa.float64())])

    def _score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        norm = 1.0 - 0.75 + 0.75 * (dl * n_docs) / tot
        score = np.zeros(len(batch), dtype=np.float64)
        n_hit = np.zeros(len(batch), dtype=np.int64)
        for i in range(len(qterms)):
            tf = batch[f"tf{i}"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            hit = tf > 0
            contrib = idf[i] * (tf * 2.2) / (tf + 1.2 * norm)
            score = np.where(hit, score + contrib, score)
            n_hit += hit.astype(np.int64)
        keep = n_hit > 0
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(keep)),
            "n_hit": pa.array(n_hit[keep], pa.int64()),
            "bm25": pa.array(round6_tie_robust(score[keep])),
        }, schema=out_schema)

    return _collect(stats.map_batches(_score, batch_format="pyarrow",
                                      zero_copy_batch=True))


RRF_FUSION_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''),
st AS (SELECT doc_id, COUNT(*) AS n_tok,
              COUNT(DISTINCT term) AS n_terms
       FROM toks GROUP BY 1),
r AS (SELECT doc_id, n_tok, n_terms,
             ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) AS ra,
             ROW_NUMBER() OVER (ORDER BY n_terms DESC, doc_id) AS rb
      FROM st),
sc AS (SELECT doc_id, n_tok, n_terms,
              CAST(ra AS BIGINT) AS rank_len,
              CAST(rb AS BIGINT) AS rank_vocab,
              ROUND(1.0 / (60 + ra) + 1.0 / (60 + rb), 6) AS rrf
       FROM r)
SELECT doc_id, n_tok, n_terms, rank_len, rank_vocab, rrf, rn FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn
  FROM sc)
WHERE rn <= 20
"""


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two document rankings (the standard
    hybrid-search merge, k=60): rank by total tokens and rank by
    distinct vocabulary, fuse with sum(1/(60+rank)), return the top-20
    fused.  Both input rankings order by exact INTEGERS with doc_id
    tie-break, the fused score is a sum of two exact rationals
    (identical doubles cross-engine), and the final ranking orders by
    the 6-dp-ROUNDED score — so no float-order ambiguity anywhere.
    Per-doc stats come from the combiner wordcount; the slim
    (doc_id, n_tok, n_terms) table passes the gated broadcast collect
    (global ranking at crawl scale would use the range-partition
    planner — q_range_splits — instead)."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import collect_small
    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    dt = term_counts(ds, ["doc_id"])
    stat_schema = pa.schema([("doc_id", pa.int64()),
                             ("n_tok", pa.int64()),
                             ("n_terms", pa.int64())])

    def _per_doc(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return stat_schema.empty_table()
        starts, ends = _runs(batch, ["doc_id"])
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "doc_id": batch["doc_id"].take(idx),
            "n_tok": pa.array(np.add.reduceat(n, starts), pa.int64()),
            "n_terms": pa.array(ends - starts, pa.int64()),
        }, schema=stat_schema)

    st = collect_small(
        sorted_group_map(dt, ["doc_id"], None, stat_schema,
                         block_fn=_per_doc))
    doc = st["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = st["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_terms = st["n_terms"].to_numpy(zero_copy_only=False).astype(np.int64)

    def _rank(key: np.ndarray) -> np.ndarray:
        order = np.lexsort((doc, -key))
        rank = np.empty(len(doc), dtype=np.int64)
        rank[order] = np.arange(1, len(doc) + 1)
        return rank

    ra, rb = _rank(n_tok), _rank(n_terms)
    rrf = round6_tie_robust(1.0 / (60 + ra) + 1.0 / (60 + rb))
    order = np.lexsort((doc, -rrf))[:20]
    return _collect(pa.table({
        "doc_id": pa.array(doc[order], pa.int64()),
        "n_tok": pa.array(n_tok[order], pa.int64()),
        "n_terms": pa.array(n_terms[order], pa.int64()),
        "rank_len": pa.array(ra[order], pa.int64()),
        "rank_vocab": pa.array(rb[order], pa.int64()),
        "rrf": pa.array(rrf[order], pa.float64()),
        "rn": pa.array(np.arange(1, len(order) + 1), pa.int64()),
    }))


ZIPF_SLOPE_SQL = """
WITH toks AS (
  SELECT lang, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''),
tc AS (SELECT lang, term, COUNT(*) AS n FROM toks GROUP BY 1, 2),
rk AS (SELECT lang, n,
              ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY n DESC, term) AS rn
       FROM tc),
top AS (SELECT * FROM rk WHERE rn <= 100),
s AS (SELECT lang, COUNT(*) AS k,
             SUM(LN(CAST(rn AS DOUBLE))) AS sx,
             SUM(LN(CAST(n AS DOUBLE))) AS sy,
             SUM(LN(CAST(rn AS DOUBLE)) * LN(CAST(n AS DOUBLE))) AS sxy,
             SUM(LN(CAST(rn AS DOUBLE)) * LN(CAST(rn AS DOUBLE))) AS sxx
      FROM top GROUP BY 1)
SELECT lang, CAST(k AS BIGINT) AS n_terms,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope
FROM s
"""


def q_zipf_slope(sf_dir: str):
    """Zipf's-law fit per language: OLS slope of ln(frequency) on
    ln(rank) over each language's top-100 terms — the corpus-health
    readout (natural text ~ -1; templated/spam corpora flatten).  Term
    ranking is on exact integer counts with the term string as
    tie-break, so the top-100 SET is order-free; only the final slope
    is float (logs of identical integers, 6-dp-rounded output).  One
    combiner wordcount + one lang-keyed exchange; the per-lang fit
    touches 100 rows."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    tc = term_counts(ds, ["lang"])
    out_schema = pa.schema([("lang", pa.string()),
                            ("n_terms", pa.int64()),
                            ("zipf_slope", pa.float64())])

    def _fit(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["lang"])
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        terms = batch["term"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = {"lang": [], "k": [], "slope": []}
        for st_, en in zip(starts, ends):
            sub_n, sub_t = n[st_:en], terms[st_:en]
            order = np.lexsort((sub_t, -sub_n))[:100]
            k = len(order)
            if k < 2:
                continue
            x = np.log(np.arange(1, k + 1, dtype=np.float64))
            y = np.log(sub_n[order].astype(np.float64))
            sx, sy = x.sum(), y.sum()
            sxy, sxx = (x * y).sum(), (x * x).sum()
            rows["lang"].append(langs[st_])
            rows["k"].append(k)
            rows["slope"].append((k * sxy - sx * sy) / (k * sxx - sx * sx))
        return pa.table({
            "lang": pa.array(rows["lang"], pa.string()),
            "n_terms": pa.array(rows["k"], pa.int64()),
            "zipf_slope": pa.array(round6_tie_robust(
                np.array(rows["slope"], dtype=np.float64))),
        }, schema=out_schema)

    return _collect(sorted_group_map(tc, ["lang"], None, out_schema,
                                     block_fn=_fit))


HEAPS_LAW_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''),
mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
dt AS (SELECT doc_id, term FROM toks GROUP BY 1, 2),
ft AS (SELECT term, MIN(doc_id) AS first_doc FROM dt GROUP BY 1),
tokdec AS (SELECT (doc_id * 10) // m AS dec, COUNT(*) AS toks_n,
                  COUNT(DISTINCT doc_id) AS docs_n
           FROM toks, mx GROUP BY 1),
vocdec AS (SELECT (first_doc * 10) // m AS dec, COUNT(*) AS v
           FROM ft, mx GROUP BY 1),
d AS (SELECT UNNEST(range(10)) AS dec)
SELECT CAST(d.dec AS BIGINT) AS decile,
       CAST(SUM(COALESCE(t.docs_n, 0)) OVER (ORDER BY d.dec)
            AS BIGINT) AS docs_cum,
       CAST(SUM(COALESCE(t.toks_n, 0)) OVER (ORDER BY d.dec)
            AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(v.v, 0)) OVER (ORDER BY d.dec)
            AS BIGINT) AS vocab_cum
FROM d LEFT JOIN tokdec t ON t.dec = d.dec
       LEFT JOIN vocdec v ON v.dec = d.dec
"""


def q_heaps_law(sf_dir: str):
    """Vocabulary-growth (Heaps-law) curve: cumulative distinct
    vocabulary vs cumulative token count at 10 doc-id-decile
    checkpoints — the dedup-planning readout (how fast does new text
    stop contributing new types?).  Distributed shape: each term's
    FIRST occurrence is a min-reduce over the distinct (doc, term)
    rows (one term-keyed exchange), token/doc totals per decile come
    from per-doc counts (one doc-keyed exchange shared with the
    wordcount family), and only 10-row partials reach the driver for
    the cumulative sum.  All outputs are exact integers — no float
    parity surface at all."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..stages.wordcount import doc_token_counts, term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    m = int(ds.max("doc_id")) + 1

    # per-doc token totals -> (decile, docs_n, toks_n) partials
    per_doc = doc_token_counts(ds, "doc_id")

    def _doc_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"dec": pa.array([], pa.int64()),
                             "docs_n": pa.array([], pa.int64()),
                             "toks_n": pa.array([], pa.int64())})
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        ntok = batch["n_tok"].to_numpy(zero_copy_only=False)
        dec = (doc * 10) // m
        docs = np.bincount(dec, minlength=10).astype(np.int64)
        toks = np.bincount(dec, weights=ntok, minlength=10).astype(np.int64)
        return pa.table({"dec": pa.array(np.arange(10), pa.int64()),
                         "docs_n": pa.array(docs, pa.int64()),
                         "toks_n": pa.array(toks, pa.int64())})

    docp = _collect_raw(per_doc.map_batches(
        _doc_partial, batch_format="pyarrow"))

    # first occurrence per term -> vocab per decile partials
    dt = term_counts(ds, ["doc_id"])
    first_schema = pa.schema([("dec", pa.int64()), ("v", pa.int64())])

    def _first(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return first_schema.empty_table()
        starts, ends = _runs(batch, ["term"])
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        firsts = np.minimum.reduceat(doc, starts)
        dec = (firsts * 10) // m
        v = np.bincount(dec, minlength=10).astype(np.int64)
        return pa.table({"dec": pa.array(np.arange(10), pa.int64()),
                         "v": pa.array(v, pa.int64())},
                        schema=first_schema)

    vocp = _collect_raw(sorted_group_map(dt, ["term"], None, first_schema,
                                         block_fn=_first))

    def _accum(tbl: pa.Table, col: str) -> np.ndarray:
        dec = tbl["dec"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.zeros(10, dtype=np.int64)
        np.add.at(out, dec, val)
        return out

    docs_cum = np.cumsum(_accum(docp, "docs_n"))
    toks_cum = np.cumsum(_accum(docp, "toks_n"))
    voc_cum = np.cumsum(_accum(vocp, "v"))
    return _collect(pa.table({
        "decile": pa.array(np.arange(10), pa.int64()),
        "docs_cum": pa.array(docs_cum, pa.int64()),
        "tokens_cum": pa.array(toks_cum, pa.int64()),
        "vocab_cum": pa.array(voc_cum, pa.int64()),
    }))


WOE_IV_SQL = """
WITH b AS (
  SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders),
c AS (SELECT bin, COUNT(*) AS n,
             SUM(bad) AS n_bad, COUNT(*) - SUM(bad) AS n_good
      FROM b GROUP BY 1),
t AS (SELECT SUM(n_good) AS gt, SUM(n_bad) AS bt FROM c)
SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_good AS BIGINT) AS n_good,
       CAST(n_bad AS BIGINT) AS n_bad,
       ROUND(LN(((n_good + 0.5) / gt) / ((n_bad + 0.5) / bt)), 6) AS woe,
       ROUND((((n_good + 0.5) / gt) - ((n_bad + 0.5) / bt))
             * LN(((n_good + 0.5) / gt) / ((n_bad + 0.5) / bt)), 6)
         AS iv_term
FROM c, t
"""


def q_woe_iv(sf_dir: str):
    """Weight-of-evidence / information-value binning of order price
    against the 'failed order' outcome — the classic credit-scoring /
    feature-selection transform.  Integer bin edges (floor(price/50k)),
    per-block bincount partials reduce to ONE tiny (bin, good, bad)
    table on the driver regardless of fact size, and the smoothed
    (+0.5) WOE/IV formulas are computed identically from exact integer
    counts on both sides (only ln is float, 6-dp-rounded output)."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice", "o_orderstatus"])

    def _partial(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        bad = pc.equal(batch["o_orderstatus"], "F").to_numpy(
            zero_copy_only=False)
        bins = np.floor(price / 50000).astype(np.int64)
        nb = int(bins.max()) + 1 if len(bins) else 1
        n_bad = np.bincount(bins, weights=bad, minlength=nb)
        n_all = np.bincount(bins, minlength=nb)
        return pa.table({
            "bin": pa.array(np.arange(nb), pa.int64()),
            "n": pa.array(n_all.astype(np.int64), pa.int64()),
            "n_bad": pa.array(n_bad.astype(np.int64), pa.int64()),
        })

    part = _collect_raw(ds.map_batches(_partial, batch_format="pyarrow",
                                       zero_copy_batch=True))
    bins = part["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
    nb = int(bins.max()) + 1 if len(bins) else 1
    n = np.zeros(nb, dtype=np.int64)
    n_bad = np.zeros(nb, dtype=np.int64)
    np.add.at(n, bins, part["n"].to_numpy(zero_copy_only=False))
    np.add.at(n_bad, bins, part["n_bad"].to_numpy(zero_copy_only=False))
    keep = n > 0
    n, n_bad = n[keep], n_bad[keep]
    idx = np.arange(nb)[keep]
    n_good = n - n_bad
    gt, bt = float(n_good.sum()), float(n_bad.sum())
    pg = (n_good + 0.5) / gt
    pb = (n_bad + 0.5) / bt
    woe = np.log(pg / pb)
    return _collect(pa.table({
        "bin": pa.array(idx, pa.int64()),
        "n": pa.array(n, pa.int64()),
        "n_good": pa.array(n_good, pa.int64()),
        "n_bad": pa.array(n_bad, pa.int64()),
        "woe": pa.array(round6_tie_robust(woe)),
        "iv_term": pa.array(round6_tie_robust((pg - pb) * woe)),
    }))


TARGET_ENCODE_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(FLOOR(ROUND(o_totalprice, 6) * 100 + 0.5) AS BIGINT)
           AS cents
  FROM orders),
j AS (SELECT o.o_orderkey, c.c_mktsegment AS segment, o.cents
      FROM o JOIN customer c ON c.c_custkey = o.o_custkey),
w AS (SELECT o_orderkey, segment, cents,
             SUM(cents) OVER (PARTITION BY segment) AS seg_sum,
             COUNT(*) OVER (PARTITION BY segment) AS seg_n
      FROM j)
SELECT o_orderkey, segment,
       CASE WHEN seg_n > 1
            THEN ROUND((seg_sum - cents) / (100.0 * (seg_n - 1)), 6)
            END AS loo_price
FROM w
"""


def q_target_encode(sf_dir: str):
    """Leave-one-out target encoding of the customer market segment by
    order price — the leakage-safe categorical encoder of a training
    feature pipeline.  Segment comes from a BROADCAST dimension lookup
    (never a shuffle), per-segment (sum, count) reduce via per-block
    partials to a 5-row driver table shipped back as scalars, and the
    LOO mean (seg_sum - self)/(100*(seg_n - 1)) is one division of
    exact integer cents on both sides — bitwise-identical doubles
    before the shared 6-dp rounding."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import attach_broadcast, collect_small

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]))
    cust = pa.table({"o_custkey": cust["c_custkey"],
                     "segment": cust["c_mktsegment"]})

    def _cents(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(price) * 100.0 + 0.5).astype(
            np.int64)
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_custkey": batch["o_custkey"],
                         "cents": pa.array(vi, pa.int64())})

    fact = attach_broadcast(
        orders.map_batches(_cents, batch_format="pyarrow",
                           zero_copy_batch=True),
        cust, "o_custkey", ["segment"]).materialize()

    def _seg_partial(batch: pa.Table) -> pa.Table:
        grouped = batch.group_by(["segment"]).aggregate(
            [("cents", "sum"), ([], "count_all")])
        return grouped.rename_columns(["segment", "s", "c"])

    part = _collect_raw(fact.map_batches(_seg_partial,
                                         batch_format="pyarrow"))
    seg_sum: dict = {}
    seg_n: dict = {}
    for seg, s, c in zip(part["segment"].to_pylist(),
                         part["s"].to_pylist(), part["c"].to_pylist()):
        seg_sum[seg] = seg_sum.get(seg, 0) + int(s)
        seg_n[seg] = seg_n.get(seg, 0) + int(c)

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("segment", pa.string()),
                            ("loo_price", pa.float64())])

    def _loo(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        segs = batch["segment"].to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ssum = np.array([seg_sum[s] for s in segs], dtype=np.int64)
        sn = np.array([seg_n[s] for s in segs], dtype=np.int64)
        ok = sn > 1
        loo = np.where(ok, (ssum - cents) / (100.0 * np.maximum(sn - 1, 1)),
                       np.nan)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "segment": batch["segment"],
            "loo_price": pa.array(round6_tie_robust(loo), pa.float64(),
                                  mask=~ok),
        }, schema=out_schema)

    return _collect(fact.map_batches(_loo, batch_format="pyarrow",
                                     zero_copy_batch=True))


PSI_DRIFT_SQL = """
WITH e AS (
  SELECT epoch_us(ts) AS t_us,
         CAST(FLOOR(ROUND(value, 6) * 1000000 + 0.5) AS BIGINT) AS vi
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
s AS (SELECT MIN(t_us) AS t0, MIN(vi) AS mn, MAX(vi) AS mx FROM e),
b AS (
  SELECT CASE WHEN (t_us - t0) // 86400000000 < 15 THEN 1 ELSE 0 END
           AS is_base,
         ((vi - mn) * 10) // (mx - mn + 1) AS bin
  FROM e, s),
c AS (SELECT bin,
             SUM(is_base) AS n_base,
             COUNT(*) - SUM(is_base) AS n_curr
      FROM b GROUP BY 1),
t AS (SELECT SUM(n_base) AS tb, SUM(n_curr) AS tc FROM c)
SELECT bin, CAST(n_base AS BIGINT) AS n_base,
       CAST(n_curr AS BIGINT) AS n_curr,
       ROUND((((n_base + 0.5) / (tb + 5.0)) - ((n_curr + 0.5) / (tc + 5.0)))
             * LN(((n_base + 0.5) / (tb + 5.0))
                  / ((n_curr + 0.5) / (tc + 5.0))), 6) AS psi_term
FROM c, t
"""


def q_psi_drift(sf_dir: str):
    """Population-stability-index drift between the first 15 days and
    the rest of the event stream — the binned distribution-shift
    monitor (KS measures the max gap; PSI weights every bin).  Two
    corpus passes, each reducing to a driver table whose size is the
    BLOCK count: pass 1 finds (t0, value min/max) for the integer bin
    edges, pass 2 bincounts per (half, bin).  Smoothed (+0.5/bin)
    proportions and the (p-q)ln(p/q) terms are identical double ops
    from exact integers on both sides."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["ts", "value"])

    def _quant(batch: pa.Table) -> pa.Table:
        t_us = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1_000_000.0 + 0.5).astype(
            np.int64)
        return pa.table({"t_us": pa.array(t_us, pa.int64()),
                         "vi": pa.array(vi, pa.int64())})

    pts = ds.map_batches(_quant, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    def _extent(batch: pa.Table) -> pa.Table:
        t = batch["t_us"].to_numpy(zero_copy_only=False)
        v = batch["vi"].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return pa.table({"t0": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({"t0": pa.array([int(t.min())], pa.int64()),
                         "mn": pa.array([int(v.min())], pa.int64()),
                         "mx": pa.array([int(v.max())], pa.int64())})

    ext = _collect_raw(pts.map_batches(_extent, batch_format="pyarrow"))
    t0 = int(pc.min(ext["t0"]).as_py())
    mn = int(pc.min(ext["mn"]).as_py())
    mx = int(pc.max(ext["mx"]).as_py())

    def _hist(batch: pa.Table) -> pa.Table:
        t = batch["t_us"].to_numpy(zero_copy_only=False)
        v = batch["vi"].to_numpy(zero_copy_only=False)
        is_base = ((t - t0) // 86_400_000_000) < 15
        bins = ((v - mn) * 10) // (mx - mn + 1)
        nb = np.bincount(bins[is_base], minlength=10).astype(np.int64)
        nc = np.bincount(bins[~is_base], minlength=10).astype(np.int64)
        return pa.table({"bin": pa.array(np.arange(10), pa.int64()),
                         "n_base": pa.array(nb, pa.int64()),
                         "n_curr": pa.array(nc, pa.int64())})

    part = _collect_raw(pts.map_batches(_hist, batch_format="pyarrow"))
    bins = part["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
    nb = np.zeros(10, dtype=np.int64)
    nc = np.zeros(10, dtype=np.int64)
    np.add.at(nb, bins, part["n_base"].to_numpy(zero_copy_only=False))
    np.add.at(nc, bins, part["n_curr"].to_numpy(zero_copy_only=False))
    keep = (nb + nc) > 0
    tb, tc = float(nb.sum()), float(nc.sum())
    p = (nb[keep] + 0.5) / (tb + 5.0)
    q = (nc[keep] + 0.5) / (tc + 5.0)
    return _collect(pa.table({
        "bin": pa.array(np.arange(10)[keep], pa.int64()),
        "n_base": pa.array(nb[keep], pa.int64()),
        "n_curr": pa.array(nc[keep], pa.int64()),
        "psi_term": pa.array(round6_tie_robust((p - q) * np.log(p / q))),
    }))


CALIBRATION_DECILES_SQL = """
WITH pos AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_totalprice > 300000),
c AS (
  SELECT c_custkey,
         CAST(FLOOR(ROUND(c_acctbal, 6) * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN c_custkey IN (SELECT o_custkey FROM pos)
              THEN 1 ELSE 0 END AS y
  FROM customer),
r AS (SELECT cents, y,
             ROW_NUMBER() OVER (ORDER BY cents, c_custkey) - 1 AS r,
             COUNT(*) OVER () AS n
      FROM c)
SELECT CAST((r * 10) // n AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate,
       ROUND(SUM(cents) / (100.0 * COUNT(*)), 6) AS mean_acctbal
FROM r GROUP BY 1
"""


def q_calibration_deciles(sf_dir: str):
    """Score-calibration decile table: customers ranked by account
    balance (the 'model score'), outcome = placed a >300k order; per
    decile the positive rate and mean score — the standard lift /
    calibration readout for a propensity model.  Ranking is on exact
    integer cents with custkey tie-break and the decile id is integer
    algebra (r*10//n, NOT NTILE — NTILE front-loads remainders and is
    not reproducible from a formula), so bucket membership is
    order-free; rates and means are single divisions of exact
    integers.  Both sides pass the gated dimension-scale collect
    (the positive-custkey set broadcasts; a crawl-scale score table
    would rank via the range-partition planner instead)."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import collect_small

    def _big_spenders(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["o_totalprice"], 300000)
        ids = batch["o_custkey"].filter(keep)
        return pa.table({"o_custkey": pc.unique(ids)})

    pos_t = collect_small(rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"]
    ).map_batches(_big_spenders, batch_format="pyarrow",
                  zero_copy_batch=True))
    pos = np.unique(pos_t["o_custkey"].to_numpy(zero_copy_only=False))

    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal"]))
    key = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    bal = cust["c_acctbal"].to_numpy(zero_copy_only=False)
    cents = np.floor(round6_tie_robust(bal) * 100.0 + 0.5).astype(np.int64)
    y = np.isin(key, pos).astype(np.int64)
    order = np.lexsort((key, cents))
    cents, y = cents[order], y[order]
    n = len(cents)
    dec = (np.arange(n, dtype=np.int64) * 10) // n
    cnt = np.bincount(dec, minlength=10).astype(np.int64)
    npos = np.bincount(dec, weights=y, minlength=10).astype(np.int64)
    csum_i = np.zeros(10, dtype=np.int64)
    np.add.at(csum_i, dec, cents)
    keep = cnt > 0
    return _collect(pa.table({
        "decile": pa.array(np.arange(10)[keep], pa.int64()),
        "n": pa.array(cnt[keep], pa.int64()),
        "n_pos": pa.array(npos[keep], pa.int64()),
        "pos_rate": pa.array(round6_tie_robust(
            npos[keep] / cnt[keep].astype(np.float64))),
        "mean_acctbal": pa.array(round6_tie_robust(
            csum_i[keep] / (100.0 * cnt[keep]))),
    }))


def _daily_milli_series(sf_dir: str) -> dict:
    """Per-type daily-mean series quantized to exact int64 milli-units
    (the shared quantization contract of xcorr_lag / the SF family):
    map-side (type, day) partials collapse to |types| x |days| rows
    before the driver merge — bounded at any corpus scale.  Returns
    {event_type: (days:int64[], mi:int64[], n:int64[])}, days sorted."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(t_us, _DAY_US),
                      "v": batch["value"]})
        g = t.group_by(["event_type", "day"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return g.rename_columns(["event_type", "day", "s", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(_daily, batch_format="pyarrow",
                                        zero_copy_batch=True))
    et = np.asarray(parts["event_type"].to_pylist(), dtype=object)
    day = parts["day"].to_numpy(zero_copy_only=False)
    s = parts["s"].to_numpy(zero_copy_only=False)
    n = parts["n"].to_numpy(zero_copy_only=False)
    if len(et) == 0:
        return {}
    order = np.lexsort((day, et))
    et, day, s, n = et[order], day[order], s[order], n[order]
    key_new = np.empty(len(et), dtype=bool)
    key_new[0] = True
    key_new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
    ks = np.nonzero(key_new)[0]
    s = np.add.reduceat(s, ks)
    n = np.add.reduceat(n, ks)
    et, day = et[ks], day[ks]
    mi = np.floor(round6_tie_robust(s / n) * 1000.0 + 0.5).astype(np.int64)
    out = {}
    first = np.empty(len(et), dtype=bool)
    first[0] = True
    first[1:] = et[1:] != et[:-1]
    starts = np.nonzero(first)[0]
    for st, ln in zip(starts, np.diff(np.append(starts, len(et)))):
        out[et[st]] = (day[st:st + ln], mi[st:st + ln],
                       n[st:st + ln].astype(np.int64))
    return out


STRUCTURE_FUNCTION_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
p AS (
  SELECT a.event_type, b.day - a.day AS dt, b.mi - a.mi AS dv
  FROM d a JOIN d b ON b.event_type = a.event_type AND b.day > a.day),
bb AS (
  SELECT event_type,
         CASE WHEN dt < 2 THEN 0 WHEN dt < 4 THEN 1 WHEN dt < 8 THEN 2
              WHEN dt < 16 THEN 3 ELSE 4 END AS dt_bin, dv
  FROM p)
SELECT event_type, CAST(dt_bin AS BIGINT) AS dt_bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(dv * dv) / (1000000.0 * COUNT(*)), 6) AS sf_value
FROM bb GROUP BY 1, 2
"""


def q_structure_function(sf_dir: str):
    """First-order structure function per series — the astronomy
    variability-vs-timescale diagnostic (Simonetti et al. 1985; the
    light-curve family's SF companion to the dm-dt map): mean squared
    difference of the daily-mean series over all day pairs, bucketed
    into doubling time-lag bins [1,2) [2,4) [4,8) [8,16) [16,inf).
    PARITY BY INTEGER ALGEBRA: daily means quantize to exact milli
    units (shared contract with xcorr_lag), bin edges are integer day
    compares, squared-difference sums are exact integers, and sf is
    ONE division.  The pair enumeration runs on the |types| x |days|
    rollup — bounded at any corpus scale."""

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "bin": [], "n": [], "sf": []}
    edges = np.array([2, 4, 8, 16], dtype=np.int64)
    for et in sorted(series):
        day, mi, _ = series[et]
        i, j = np.triu_indices(len(day), k=1)
        dt = day[j] - day[i]
        dv = mi[j] - mi[i]
        bins = np.searchsorted(edges, dt, side="right")
        for b in np.unique(bins):
            m = bins == b
            npairs = int(m.sum())
            ssum = int((dv[m].astype(object) ** 2).sum())
            rows["et"].append(et)
            rows["bin"].append(int(b))
            rows["n"].append(npairs)
            rows["sf"].append(float(ssum) / (1_000_000.0 * npairs))
    from ..kernels.rounding import round6_tie_robust
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "dt_bin": pa.array(rows["bin"], pa.int64()),
        "n_pairs": pa.array(rows["n"], pa.int64()),
        "sf_value": pa.array(round6_tie_robust(
            np.array(rows["sf"], dtype=np.float64))),
    }))


PHASE_FOLD_SQL = """
WITH x AS (
  SELECT event_type,
         ((epoch_us(ts) % 604800000000) * 8) // 604800000000 AS phase_bin,
         CAST(FLOOR(ROUND(value, 6) * 1000000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL)
SELECT event_type, CAST(phase_bin AS BIGINT) AS phase_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(vi) / (1000000.0 * COUNT(*)), 6) AS mean_value
FROM x GROUP BY 1, 2
"""


def q_phase_fold(sf_dir: str):
    """Phase-folded profile per series: fold every timestamp on a
    fixed 7-day period into 8 phase bins and aggregate the mean — the
    periodic-signal readout (folded light curve) at a known period.
    Bin ids are pure integer algebra on epoch microseconds, values
    quantize to exact micro-units before the sum, and the mean is one
    exact-integer division — no float parity surface.  One map-side
    (type, bin) partial pass; the exchange carries at most
    |types| x 8 rows per block."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    _P_US = 604_800_000_000
    part_schema = pa.schema([("event_type", pa.string()),
                             ("phase_bin", pa.int64()),
                             ("s", pa.int64()), ("n", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1_000_000.0 + 0.5).astype(
            np.int64)
        pb = ((t_us % _P_US) * 8) // _P_US
        t = pa.table({"event_type": batch["event_type"],
                      "phase_bin": pa.array(pb, pa.int64()),
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "phase_bin"]).aggregate(
            [("vi", "sum"), ("vi", "count")])
        return g.rename_columns(
            ["event_type", "phase_bin", "s", "n"]).cast(part_schema)

    parts = ds.map_batches(_fold, batch_format="pyarrow",
                           zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("phase_bin", pa.int64()),
                            ("n", pa.int64()),
                            ("mean_value", pa.float64())])

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, _ = _runs(batch, ["event_type", "phase_bin"])
        idx = pa.array(starts, pa.int64())
        s = np.add.reduceat(
            batch["s"].to_numpy(zero_copy_only=False), starts)
        n = np.add.reduceat(
            batch["n"].to_numpy(zero_copy_only=False), starts)
        return pa.table({
            "event_type": batch["event_type"].take(idx),
            "phase_bin": batch["phase_bin"].take(idx),
            "n": pa.array(n, pa.int64()),
            "mean_value": pa.array(round6_tie_robust(
                s / (1_000_000.0 * n))),
        }, schema=out_schema)

    return _collect(sorted_group_map(parts, ["event_type", "phase_bin"],
                                     None, out_schema, block_fn=_merge))


def _kcore_sql(k: int = 3, rounds: int = 8) -> str:
    """Unrolled-iteration k-core oracle: exactly ``rounds`` peel steps
    (the engine runs the SAME fixed count — the bounded-round contract
    makes the operator reproducible without a convergence test)."""
    # MATERIALIZED hints: every round references its predecessor three
    # times — without them DuckDB inlines the base parquet scan once per
    # reference and exhausts the process fd limit at 8 rounds
    base = _COPURCHASE_EDGES_CTE.replace(
        "op AS (", "op AS MATERIALIZED (").replace(
        "e AS (", "e AS MATERIALIZED (")
    sql = "WITH " + base
    prev = "e"
    for r in range(rounds):
        sql += f""",
d{r} AS (SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM {prev}
    UNION ALL SELECT v AS node FROM {prev}) GROUP BY 1),
n{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d >= {k}),
e{r} AS MATERIALIZED (SELECT u, v FROM {prev}
         WHERE u IN (SELECT node FROM n{r})
           AND v IN (SELECT node FROM n{r}))"""
        prev = f"e{r}"
    sql += f"""
SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS degree FROM (
  SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev})
GROUP BY 1
"""
    return sql


def q_kcore_graph(sf_dir: str):
    """k-core decomposition (k=3, 8 peel rounds) of the part
    co-purchase graph — the dense-substructure filter that strips
    low-degree fringe before community detection.  The peel is the
    standard distributed iteration (degrees -> drop nodes < k ->
    semi-join edges), run a FIXED 8 rounds so both sides compute the
    identical residual graph without a convergence race; all state is
    integer.  Edges reuse the shared co-purchase pipeline (one
    orderkey exchange + one edge-key distinct); the peel runs on the
    slim packed-int64 edge list under the gated broadcast collect —
    above ~2M edges each round is the documented degree-groupby +
    edge semi-join Dataset pass."""
    import ray

    from ..stages.joins import collect_small

    edges = _copurchase_edges(sf_dir)
    ek = collect_small(edges)["k"].to_numpy(zero_copy_only=False)
    u = ek >> np.int64(32)
    v = ek & np.int64(0xFFFFFFFF)
    for _ in range(8):
        nodes, deg = np.unique(np.concatenate([u, v]),
                               return_counts=True)
        keep_nodes = nodes[deg >= 3]
        ku = np.isin(u, keep_nodes)
        kv = np.isin(v, keep_nodes)
        m = ku & kv
        u, v = u[m], v[m]
    nodes, deg = np.unique(np.concatenate([u, v]), return_counts=True)
    return _collect(pa.table({
        "part": pa.array(nodes, pa.int64()),
        "degree": pa.array(deg.astype(np.int64), pa.int64()),
    }))


ISOTONIC_DAILY_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi,
         COUNT(*) AS n
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
idx AS (
  SELECT event_type, day, mi, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM d),
pre AS (
  SELECT event_type, day, mi, n, i,
         SUM(mi) OVER (PARTITION BY event_type ORDER BY i) AS s
  FROM idx),
a AS (
  SELECT pj.event_type, pj.i AS j, pk.i AS k,
         CAST(pk.s - pj.s + pj.mi AS DOUBLE)
           / (1000.0 * (pk.i - pj.i + 1)) AS avg
  FROM pre pj JOIN pre pk
    ON pk.event_type = pj.event_type AND pk.i >= pj.i),
m AS (
  SELECT a.event_type, a.j, i.i AS i, MIN(a.avg) AS lo
  FROM a JOIN idx i
    ON i.event_type = a.event_type AND i.i >= a.j AND i.i <= a.k
  GROUP BY 1, 2, 3),
fit AS (
  SELECT event_type, i, MAX(lo) AS fitted
  FROM m WHERE j <= i GROUP BY 1, 2)
SELECT p.event_type, p.day, CAST(p.n AS BIGINT) AS n,
       ROUND(f.fitted, 6) AS fitted
FROM pre p JOIN fit f ON f.event_type = p.event_type AND f.i = p.i
"""


def q_isotonic_daily(sf_dir: str):
    """Isotonic (monotone non-decreasing) regression of the daily-mean
    series per type via pool-adjacent-violators — the shape-constrained
    trend fit (calibration curves, dose-response, monotone KPIs).
    Engine: PAVA with EXACT integer block state (milli-unit sums,
    counts; violation test by integer cross-multiplication — no float
    compare anywhere in the algorithm); oracle: the classical minimax
    identity fitted[i] = max_{j<=i} min_{k>=i} mean(y[j..k]) expanded
    over prefix sums (O(n^3) rows — test-scale only, the identity IS
    the proof of equivalence).  Both sides divide the same exact
    integers once at output."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "day": [], "n": [], "fit": []}
    for et in sorted(series):
        day, mi, n = series[et]
        # PAVA: blocks of (sum, count); merge while mean decreases
        sums: list = []
        cnts: list = []
        for y in mi:
            sums.append(int(y))
            cnts.append(1)
            while (len(sums) > 1
                   and sums[-2] * cnts[-1] > sums[-1] * cnts[-2]):
                s2, c2 = sums.pop(), cnts.pop()
                sums[-1] += s2
                cnts[-1] += c2
        pos = 0
        for s_, c_ in zip(sums, cnts):
            val = float(s_) / (1000.0 * c_)
            for _ in range(c_):
                rows["et"].append(et)
                rows["day"].append(int(day[pos]))
                rows["n"].append(int(n[pos]))
                rows["fit"].append(val)
                pos += 1
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "day": pa.array(rows["day"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "fitted": pa.array(round6_tie_robust(
            np.array(rows["fit"], dtype=np.float64))),
    }))


_DAILY_MILLI_CTE = """
d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2)"""


VONNEUMANN_SQL = f"""
WITH {_DAILY_MILLI_CTE},
s AS (
  SELECT event_type, mi,
         LAG(mi) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM d)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(COUNT(*) * SUM(CASE WHEN prev IS NULL THEN 0
                  ELSE (mi - prev) * (mi - prev) END) AS DOUBLE)
             / (COUNT(*) * SUM(mi * mi) - SUM(mi) * SUM(mi)), 6) AS eta
FROM s GROUP BY 1
HAVING COUNT(*) > 1
   AND COUNT(*) * SUM(mi * mi) - SUM(mi) * SUM(mi) > 0
"""


def q_vonneumann_daily(sf_dir: str):
    """Von Neumann eta per series — the light-curve catalog's
    variability-vs-noise ratio (Eta, von Neumann 1941; Malanchev et
    al. 2021 catalog): mean squared successive difference of the
    daily-mean series over its variance.  PARITY BY INTEGER ALGEBRA:
    on the shared milli-quantized daily series both numerator
    n*sum(d^2) and denominator n*sum(x^2)-sum(x)^2 are exact integers
    (the milli scale cancels in the ratio) and eta is ONE division.
    Bounded at |types| x |days| before the driver merge."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "n": [], "eta": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        n = len(mi)
        if n <= 1:
            continue
        mo = mi.astype(object)
        sd2 = int(((mo[1:] - mo[:-1]) ** 2).sum())
        sxx = int((mo ** 2).sum())
        sx = int(mo.sum())
        den = n * sxx - sx * sx
        if den <= 0:
            continue
        rows["et"].append(et)
        rows["n"].append(n)
        rows["eta"].append(float(n * sd2) / den)
    from ..kernels.rounding import round6_tie_robust
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_days": pa.array(rows["n"], pa.int64()),
        "eta": pa.array(round6_tie_robust(
            np.array(rows["eta"], dtype=np.float64))),
    }))


PERM_ENTROPY_SQL = f"""
WITH {_DAILY_MILLI_CTE},
w AS (
  SELECT event_type,
         LAG(mi, 2) OVER (PARTITION BY event_type ORDER BY day) AS a,
         LAG(mi, 1) OVER (PARTITION BY event_type ORDER BY day) AS b,
         mi AS c
  FROM d),
p AS (
  SELECT event_type,
         4 * CAST(b > a AS INT) + 2 * CAST(c > b AS INT)
           + CAST(c > a AS INT) AS pat
  FROM w WHERE a IS NOT NULL),
cnts AS (SELECT event_type, pat, COUNT(*) AS cnt FROM p GROUP BY 1, 2),
tot AS (SELECT event_type, SUM(cnt) AS n FROM cnts GROUP BY 1)
SELECT c.event_type, CAST(t.n AS BIGINT) AS n_windows,
       ROUND(SUM(-(CAST(c.cnt AS DOUBLE) / t.n)
                 * LN(CAST(c.cnt AS DOUBLE) / t.n)), 6) AS pattern_entropy
FROM cnts c JOIN tot t USING (event_type)
GROUP BY 1, 2
"""


def q_perm_entropy(sf_dir: str):
    """Permutation (ordinal-pattern) entropy per series (Bandt &
    Pompe 2002): classify every 3-day window of the daily-mean series
    by its comparison pattern (a 3-bit integer code b>a | c>b | c>a —
    ties are part of the code, so the classification is exact integer
    algebra on the shared milli series) and take the Shannon entropy
    of the pattern histogram.  Low entropy = rigid trend, ln 6 =
    fully disordered.  The ln term-sum order difference vs the SQL
    oracle is absorbed by the two-step round (hourly_entropy
    precedent); everything before the entropy is integer-exact."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "n": [], "h": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        if len(mi) < 3:
            continue
        a, b, c = mi[:-2], mi[1:-1], mi[2:]
        pat = (4 * (b > a).astype(np.int64)
               + 2 * (c > b).astype(np.int64)
               + (c > a).astype(np.int64))
        _, cnt = np.unique(pat, return_counts=True)
        n = int(cnt.sum())
        pr = cnt.astype(np.float64) / n
        rows["et"].append(et)
        rows["n"].append(n)
        rows["h"].append(float((-pr * np.log(pr)).sum()))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_windows": pa.array(rows["n"], pa.int64()),
        "pattern_entropy": pa.array(round6_tie_robust(
            np.array(rows["h"], dtype=np.float64))),
    }))


RUNS_TEST_SQL = f"""
WITH {_DAILY_MILLI_CTE},
t AS (SELECT event_type, SUM(mi) AS sx, COUNT(*) AS n FROM d GROUP BY 1),
s AS (
  SELECT d.event_type, d.day,
         CASE WHEN d.mi * t.n > t.sx THEN 1 ELSE -1 END AS sgn
  FROM d JOIN t USING (event_type)
  WHERE d.mi * t.n <> t.sx),
r AS (
  SELECT event_type, sgn,
         LAG(sgn) OVER (PARTITION BY event_type ORDER BY day) AS prev
  FROM s)
SELECT event_type,
       CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
       CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus,
       CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
FROM r GROUP BY 1
"""


def q_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs statistic per series: sign the daily-mean
    series about its own mean (above / below; exact equality drops —
    the compare is the integer cross-multiply mi*n vs sum(mi), no
    float threshold anywhere) and count the maximal same-sign runs in
    day order.  Few runs = trending/clustered series, many = rapid
    alternation.  All three outputs are exact integers, so the parity
    surface is empty.  Bounded at |types| x |days|."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "p": [], "m": [], "r": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        n = len(mi)
        sx = int(mi.astype(object).sum())
        lhs = mi.astype(object) * n
        sgn = np.where(lhs > sx, 1, -1)[lhs != sx]
        if len(sgn) == 0:
            continue
        rows["et"].append(et)
        rows["p"].append(int((sgn == 1).sum()))
        rows["m"].append(int((sgn == -1).sum()))
        rows["r"].append(1 + int((sgn[1:] != sgn[:-1]).sum()))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_plus": pa.array(rows["p"], pa.int64()),
        "n_minus": pa.array(rows["m"], pa.int64()),
        "n_runs": pa.array(rows["r"], pa.int64()),
    }))


SAX_WORDS_SQL = f"""
WITH {_DAILY_MILLI_CTE},
mm AS (SELECT event_type, MIN(mi) AS mn, MAX(mi) AS mx FROM d GROUP BY 1),
sym AS (
  SELECT d.event_type, d.day,
         ((d.mi - mm.mn) * 4) // (mm.mx - mm.mn + 1) AS s
  FROM d JOIN mm USING (event_type)),
w AS (
  SELECT event_type,
         LAG(s, 2) OVER (PARTITION BY event_type ORDER BY day) AS s0,
         LAG(s, 1) OVER (PARTITION BY event_type ORDER BY day) AS s1,
         s AS s2
  FROM sym)
SELECT event_type, CAST(16 * s0 + 4 * s1 + s2 AS BIGINT) AS word,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w WHERE s0 IS NOT NULL GROUP BY 1, 2
"""


def q_sax_words(sf_dir: str):
    """SAX-style symbolization per series (Lin et al. 2003, with
    equal-width instead of Gaussian breakpoints so every boundary is
    integer): map each daily mean to one of 4 symbols by integer
    range division ((mi-min)*4 // (max-min+1)), slide a 3-symbol
    window in day order and count each word (word id = base-4 digits
    16*s0+4*s1+s2).  The motif-histogram primitive behind symbolic
    timeseries indexing — and a pure-integer pipeline end to end, so
    the parity surface is empty."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "w": [], "n": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        if len(mi) < 3:
            continue
        mn, mx = int(mi.min()), int(mi.max())
        s = ((mi.astype(object) - mn) * 4) // (mx - mn + 1)
        s = s.astype(np.int64)
        word = 16 * s[:-2] + 4 * s[1:-1] + s[2:]
        wv, cnt = np.unique(word, return_counts=True)
        rows["et"].extend([et] * len(wv))
        rows["w"].extend(wv.tolist())
        rows["n"].extend(cnt.tolist())
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "word": pa.array(rows["w"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
    }))


def _kmeans_ctes(k: int = 4, rounds: int = 3) -> str:
    """Unrolled fixed-round Lloyd's oracle CTE chain on milli-quantized
    vectors: distances are exact BIGINT sums, assignment breaks ties to
    the lowest cluster id, and each centroid update re-quantizes with
    FLOOR(sum/count + 0.5) on identical doubles — so every round is
    reproducible cross-engine (the kcore unrolled-iteration contract).
    MATERIALIZED hints keep DuckDB from re-inlining the base scan."""
    sql = """WITH u AS MATERIALIZED (
  SELECT vec_id, d.dim AS dim,
         CAST(FLOOR(ROUND(CAST(embedding[d.dim] AS DOUBLE), 6) * 1000
                    + 0.5) AS BIGINT) AS vi
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS dim) d
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
init AS (SELECT DISTINCT vec_id FROM u ORDER BY vec_id LIMIT {k}),
c0 AS MATERIALIZED (
  SELECT r.cl, u.dim, u.vi AS cm
  FROM (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl
        FROM init) r JOIN u USING (vec_id))""".format(k=k)
    for r in range(rounds):
        sql += """,
d{r} AS (
  SELECT u.vec_id, c.cl, SUM((u.vi - c.cm) * (u.vi - c.cm)) AS dist
  FROM u JOIN c{r} c USING (dim) GROUP BY 1, 2),
a{r} AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cl) AS rn
    FROM d{r}) WHERE rn = 1),
c{nxt} AS MATERIALIZED (
  SELECT a.cl, u.dim,
         CAST(FLOOR(CAST(SUM(u.vi) AS DOUBLE) / COUNT(*) + 0.5)
              AS BIGINT) AS cm
  FROM a{r} a JOIN u USING (vec_id) GROUP BY 1, 2)""".format(
            r=r, nxt=r + 1)
    return sql


def _kmeans_sql(k: int = 4, rounds: int = 3) -> str:
    return _kmeans_ctes(k, rounds) + """
SELECT c.cl AS cluster, CAST(c.dim AS BIGINT) AS dim,
       s.n, c.cm AS centroid_milli
FROM c{last} c JOIN (SELECT cl, COUNT(*) AS n FROM a{pl} GROUP BY 1) s
  USING (cl)
""".format(last=rounds, pl=rounds - 1)


def _kmeans_mix_sql(k: int = 4, rounds: int = 3) -> str:
    """Final-partition label mix: the oracle's last assignment
    a{rounds-1} joined back to the labels column."""
    return _kmeans_ctes(k, rounds) + """
SELECT a.cl AS cluster, CAST(e.label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM a{pl} a JOIN embeddings e ON e.vec_id = a.vec_id
WHERE e.label IS NOT NULL
GROUP BY 1, 2
""".format(pl=rounds - 1)


def _kmeans_lloyd(sf_dir: str, k: int = 4, rounds: int = 3,
                  columns: list | None = None) -> dict:
    """Shared fixed-round Lloyd driver (see q_kmeans_embeddings for the
    parity contract).  Returns {ds, milli, cls, cents, sizes, n_dim,
    cls_assign, cents_assign} where (cls_assign, cents_assign) is the
    state the LAST assignment ran with — the state that reproduces the
    oracle's final a{rounds-1} partition for downstream passes."""
    import ray
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=columns or ["vec_id", "embedding"])

    def _clean(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.is_valid(batch["vec_id"]),
                                    pc.is_valid(batch["embedding"])))

    ds = ds.map_batches(_clean, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def _milli(batch: pa.Table) -> np.ndarray:
        mat = _emb_matrix(batch, "embedding")
        return np.floor(round6_tie_robust(mat) * 1000.0
                        + 0.5).astype(np.int64)

    def _cand(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        vi = _milli(batch)
        order = np.argsort(vid)[:k]
        n_dim = vi.shape[1]
        return pa.table({
            "vec_id": pa.array(np.repeat(vid[order], n_dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(n_dim, dtype=np.int64),
                                    len(order)), pa.int64()),
            "vi": pa.array(vi[order].ravel(), pa.int64())})

    cand = _collect_raw(ds.map_batches(_cand, batch_format="pyarrow",
                                       zero_copy_batch=True)).to_pandas()
    top = sorted(cand["vec_id"].unique())[:k]
    piv = cand[cand["vec_id"].isin(top)].pivot(
        index="vec_id", columns="dim", values="vi").sort_index()
    cents = piv.values.astype(np.int64)           # (k, D), row i = cl i
    cls = np.arange(len(cents), dtype=np.int64)   # live cluster ids
    n_dim = cents.shape[1]
    part_schema = pa.schema([("cl", pa.int64()), ("dim", pa.int64()),
                             ("s", pa.int64()), ("n", pa.int64())])

    sizes = None
    cls_assign, cents_assign = cls, cents
    for _ in range(rounds):
        cls_assign, cents_assign = cls, cents
        cref = ray.put((cls, cents))

        def _assign(batch: pa.Table) -> pa.Table:
            cls_, c_ = ray.get(cref)
            vi = _milli(batch)
            d = ((vi[:, None, :] - c_[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)      # ties -> first = lowest cl
            rows = {"cl": [], "dim": [], "s": [], "n": []}
            for j, cl_id in enumerate(cls_):
                m = a == j
                cnt = int(m.sum())
                if cnt == 0:
                    continue
                rows["cl"].extend([int(cl_id)] * n_dim)
                rows["dim"].extend(range(n_dim))
                rows["s"].extend(vi[m].sum(axis=0).tolist())
                rows["n"].extend([cnt] * n_dim)
            return pa.table({k_: pa.array(v, pa.int64())
                             for k_, v in rows.items()},
                            schema=part_schema)

        parts = _collect_raw(ds.map_batches(
            _assign, batch_format="pyarrow",
            zero_copy_batch=True)).to_pandas()
        agg = parts.groupby(["cl", "dim"]).agg(
            s=("s", "sum"), n=("n", "sum")).reset_index()
        cls = np.sort(agg["cl"].unique()).astype(np.int64)
        piv_s = agg.pivot(index="cl", columns="dim",
                          values="s").sort_index().values
        piv_n = agg.pivot(index="cl", columns="dim",
                          values="n").sort_index().values
        cents = np.floor(piv_s.astype(np.float64) / piv_n
                         + 0.5).astype(np.int64)
        sizes = agg[agg["dim"] == 0].set_index("cl")["n"]

    return {"ds": ds, "milli": _milli, "cls": cls, "cents": cents,
            "sizes": sizes, "n_dim": n_dim, "cls_assign": cls_assign,
            "cents_assign": cents_assign}


def q_kmeans_embeddings(sf_dir: str):
    """Distributed k-means (k=4, 3 fixed Lloyd rounds) over the
    embedding corpus — the clustering primitive behind IVF index
    training and corpus bucketing, here as a first-class query.
    PARITY BY INTEGER ALGEBRA: vectors quantize to exact milli int64
    (shared contract), distances are exact integer sums with ties to
    the lowest cluster id, and each centroid update re-quantizes via
    FLOOR(sum/count + 0.5) on identical doubles, so all three rounds
    are bit-reproducible vs the unrolled SQL oracle.  Ray shape: init
    picks the k lowest vec_ids (per-block candidates -> driver merge,
    block-count scale); each round is one map_batches pass emitting
    (cluster, dim) partial sums — a k x dim bounded exchange, never
    row-scale; centroids broadcast via ray.put.  Empty clusters drop
    exactly as the oracle's inner join drops them."""
    st = _kmeans_lloyd(sf_dir)
    cls, cents, sizes, n_dim = (st["cls"], st["cents"], st["sizes"],
                                st["n_dim"])
    rows = {"cluster": [], "dim": [], "n": [], "cm": []}
    for i, cl_id in enumerate(cls):
        rows["cluster"].extend([int(cl_id)] * n_dim)
        rows["dim"].extend(range(1, n_dim + 1))   # 1-based like the SQL
        rows["n"].extend([int(sizes.loc[cl_id])] * n_dim)
        rows["cm"].extend(cents[i].tolist())
    return _collect(pa.table({
        "cluster": pa.array(rows["cluster"], pa.int64()),
        "dim": pa.array(rows["dim"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "centroid_milli": pa.array(rows["cm"], pa.int64()),
    }))


JSD_DRIFT_SQL = """
WITH c AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type, COUNT(*) AS n
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT day, SUM(n) AS tot FROM c GROUP BY 1),
days AS (SELECT day, LAG(day) OVER (ORDER BY day) AS prev FROM t),
pairs AS (SELECT day, prev FROM days WHERE prev IS NOT NULL),
u AS (SELECT p.day, p.prev, x.event_type
      FROM pairs p CROSS JOIN (SELECT DISTINCT event_type FROM c) x),
j AS (
  SELECT u.day,
         CAST(COALESCE(cq.n, 0) AS DOUBLE) / tq.tot AS q,
         CAST(COALESCE(cp.n, 0) AS DOUBLE) / tp.tot AS p
  FROM u
  LEFT JOIN c cq ON cq.day = u.day AND cq.event_type = u.event_type
  JOIN t tq ON tq.day = u.day
  LEFT JOIN c cp ON cp.day = u.prev AND cp.event_type = u.event_type
  JOIN t tp ON tp.day = u.prev)
SELECT day,
       ROUND(SUM(CASE WHEN p > 0
                      THEN 0.5 * p * LN(p / ((p + q) / 2)) ELSE 0 END
               + CASE WHEN q > 0
                      THEN 0.5 * q * LN(q / ((p + q) / 2))
                      ELSE 0 END), 6) AS jsd
FROM j GROUP BY 1
"""


def q_jsd_drift(sf_dir: str):
    """Day-over-day distribution drift of the event-type mix, scored
    with Jensen-Shannon divergence — the bounded symmetric KL the
    drift monitors of a corpus pipeline alarm on (0 = identical mix,
    ln 2 = disjoint).  The (day, type) count table is map-side
    partials -> a |days| x |types| bounded driver merge; each day's P
    and Q are exact-integer ratios widened to identical doubles, the
    per-type JS terms are bitwise-identical cross-engine, and the
    term-sum order difference is absorbed by the two-step round
    (hourly_entropy precedent)."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])
    part_schema = pa.schema([("day", pa.int64()),
                             ("event_type", pa.string()),
                             ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        t = pa.table({"day": pc.divide(batch["ts"].cast(pa.int64()),
                                       _DAY_US),
                      "event_type": batch["event_type"]})
        g = t.group_by(["day", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "event_type", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _daily, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    cnt = parts.groupby(["day", "event_type"])["n"].sum().unstack(
        fill_value=0).sort_index()
    mat = cnt.values.astype(np.float64)
    tot = mat.sum(axis=1, keepdims=True)
    pr = mat / tot
    p, q = pr[:-1], pr[1:]
    m = (p + q) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = (np.where(p > 0, 0.5 * p * np.log(p / m), 0.0)
                 + np.where(q > 0, 0.5 * q * np.log(q / m), 0.0))
    return _collect(pa.table({
        "day": pa.array(cnt.index.values[1:].astype(np.int64), pa.int64()),
        "jsd": pa.array(round6_tie_robust(terms.sum(axis=1))),
    }))


HOLT_DAILY_SQL = f"""
WITH RECURSIVE {_DAILY_MILLI_CTE},
rb AS (
  SELECT event_type, day, CAST(mi AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM d),
s(event_type, rn, l, b) AS (
  SELECT event_type, rn, x, CAST(0 AS DOUBLE) FROM rb WHERE rn = 1
  UNION ALL
  SELECT p.event_type, p.rn,
         0.5 * p.x + 0.5 * (s.l + s.b),
         0.5 * ((0.5 * p.x + 0.5 * (s.l + s.b)) - s.l) + 0.5 * s.b
  FROM rb p JOIN s ON p.event_type = s.event_type AND p.rn = s.rn + 1)
SELECT rb.event_type, rb.day,
       ROUND(s.l / 1000.0, 6) AS level,
       ROUND(s.b / 1000.0, 6) AS trend
FROM rb JOIN s USING (event_type, rn)
"""


def q_holt_daily(sf_dir: str):
    """Holt double exponential smoothing (level + trend, alpha = gamma
    = 0.5) per series over the daily-mean sequence — the trend-aware
    sibling of ewma_daily and the state of every short-horizon ops
    forecaster.  The recursion runs on exact milli-int inputs widened
    to identical doubles; every step is the same IEEE expression tree
    as the recursive-CTE oracle (0.5 products are exact, one rounded
    add per term), so the states track the oracle step-for-step.
    Sequential per series but bounded at |types| x |days| on the
    driver (the ewma_daily co-location argument)."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "day": [], "l": [], "b": []}
    for et in sorted(series):
        day, mi, _ = series[et]
        x = mi.astype(np.float64)
        lv, tr = x[0], 0.0
        rows["et"].append(et)
        rows["day"].append(int(day[0]))
        rows["l"].append(lv)
        rows["b"].append(tr)
        for i in range(1, len(x)):
            l_new = 0.5 * x[i] + 0.5 * (lv + tr)
            tr = 0.5 * (l_new - lv) + 0.5 * tr
            lv = l_new
            rows["et"].append(et)
            rows["day"].append(int(day[i]))
            rows["l"].append(lv)
            rows["b"].append(tr)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "day": pa.array(rows["day"], pa.int64()),
        "level": pa.array(round6_tie_robust(
            np.array(rows["l"]) / 1000.0)),
        "trend": pa.array(round6_tie_robust(
            np.array(rows["b"]) / 1000.0)),
    }))


LOCAL_PEAKS_SQL = f"""
WITH {_DAILY_MILLI_CTE},
w AS (
  SELECT event_type, mi,
         LAG(mi) OVER (PARTITION BY event_type ORDER BY day) AS prev,
         LEAD(mi) OVER (PARTITION BY event_type ORDER BY day) AS nxt
  FROM d)
SELECT event_type,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                      AND mi > prev AND mi > nxt
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                      AND mi < prev AND mi < nxt
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_valleys
FROM w GROUP BY 1
"""


def q_local_peaks(sf_dir: str):
    """Local extrema census per series: count strict interior peaks
    (mi > both neighbors) and valleys (mi < both) of the daily-mean
    sequence in day order — the time-domain roughness companion to
    the frequency-domain periodogram_peaks.  Pure integer compares on
    the shared milli series, so the parity surface is empty; bounded
    at |types| x |days| on the driver."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "p": [], "v": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        rows["et"].append(et)
        if len(mi) < 3:
            rows["p"].append(0)
            rows["v"].append(0)
            continue
        a, b, c = mi[:-2], mi[1:-1], mi[2:]
        rows["p"].append(int(((b > a) & (b > c)).sum()))
        rows["v"].append(int(((b < a) & (b < c)).sum()))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_peaks": pa.array(rows["p"], pa.int64()),
        "n_valleys": pa.array(rows["v"], pa.int64()),
    }))


LDIVERSITY_SQL = """
WITH g AS (
  SELECT event_type, (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
         COUNT(DISTINCT user_id) AS l
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND user_id IS NOT NULL
  GROUP BY 1, 2)
SELECT event_type,
       CAST(SUM(CASE WHEN l >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_pass,
       CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_fail,
       CAST(MIN(l) AS BIGINT) AS min_diversity
FROM g GROUP BY 1
"""


def q_ldiversity_audit(sf_dir: str):
    """l-diversity audit (the companion gate to kanon_rollup): for
    each quasi-identifier group (event_type, hour-of-day), count the
    DISTINCT sensitive values (user_id) present; a group passes at
    l = 3.  Emits pass/fail group counters and the minimum diversity
    per type — the release/no-release privacy readout.  ONE
    (type, hour)-keyed exchange co-locates each QI group, the distinct
    count is an in-group sort-unique, and the per-type fold is a
    bounded |types| x 24 driver merge.  All integers."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "user_id"])
    _HOUR_US = 3_600_000_000

    def _proj(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64())
        hour = pc.divide(pc.subtract(
            t_us, pc.multiply(pc.divide(t_us, _DAY_US), _DAY_US)),
            _HOUR_US)
        return pa.table({"event_type": batch["event_type"],
                         "hour": hour,
                         "user_id": batch["user_id"].cast(pa.int64())})

    proj = ds.map_batches(_proj, batch_format="pyarrow",
                          zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("hour", pa.int64()), ("l", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["event_type", "hour"])
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        idx = pa.array(starts, pa.int64())
        ls = [len(np.unique(uid[s:e])) for s, e in zip(starts, ends)]
        return pa.table({
            "event_type": batch["event_type"].take(idx),
            "hour": batch["hour"].take(idx),
            "l": pa.array(ls, pa.int64())}, schema=out_schema)

    groups = _collect_raw(sorted_group_map(
        proj, ["event_type", "hour"], None, out_schema,
        block_fn=_block)).to_pandas()
    agg = groups.groupby("event_type").agg(
        groups_pass=("l", lambda s: int((s >= 3).sum())),
        groups_fail=("l", lambda s: int((s < 3).sum())),
        min_diversity=("l", "min")).reset_index()
    return _collect(pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "groups_pass": pa.array(agg["groups_pass"], pa.int64()),
        "groups_fail": pa.array(agg["groups_fail"], pa.int64()),
        "min_diversity": pa.array(agg["min_diversity"], pa.int64()),
    }))


EMBEDDING_COVARIANCE_SQL = """
WITH u AS MATERIALIZED (
  SELECT vec_id, d.dim AS dim,
         CAST(FLOOR(ROUND(CAST(embedding[d.dim] AS DOUBLE), 6) * 1000
                    + 0.5) AS BIGINT) AS vi
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS dim) d
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
cp AS (
  SELECT a.dim AS i, b.dim AS j, COUNT(*) AS n,
         SUM(a.vi * b.vi) AS sij
  FROM u a JOIN u b ON b.vec_id = a.vec_id AND b.dim >= a.dim
  GROUP BY 1, 2),
s AS (SELECT dim, SUM(vi) AS si FROM u GROUP BY 1)
SELECT CAST(cp.i AS BIGINT) AS i, CAST(cp.j AS BIGINT) AS j,
       CAST(cp.n AS BIGINT) AS n,
       ROUND(CAST(cp.n * cp.sij - sa.si * sb.si AS DOUBLE)
             / (1000000.0 * cp.n * (cp.n - 1)), 6) AS cov
FROM cp JOIN s sa ON sa.dim = cp.i JOIN s sb ON sb.dim = cp.j
"""


def q_embedding_covariance(sf_dir: str):
    """Full sample covariance matrix of the embedding corpus (upper
    triangle, 1-based dims) — the PCA/whitening precursor every
    embedding pipeline trains.  Ray shape: each block contributes ONE
    integer Gram-matrix partial (X^T X via int64 matmul on the shared
    milli quantization) plus column sums — a dim^2-bounded exchange
    regardless of corpus size, the canonical distributed-covariance
    pattern.  PARITY BY INTEGER ALGEBRA: n*Sij - Si*Sj is exact int64
    both sides and cov is ONE division (milli^2 scale folded into the
    1e6 divisor)."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def _clean(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_(pc.is_valid(batch["vec_id"]),
                                    pc.is_valid(batch["embedding"])))

    part_schema = pa.schema([("i", pa.int64()), ("j", pa.int64()),
                             ("sij", pa.int64()), ("si", pa.int64()),
                             ("sj", pa.int64()), ("n", pa.int64())])

    def _gram(batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, "embedding")
        vi = np.floor(round6_tie_robust(mat) * 1000.0
                      + 0.5).astype(np.int64)
        n, d = vi.shape
        gram = vi.T @ vi                      # (D, D) exact int64
        si = vi.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "sij": pa.array(gram[iu, ju], pa.int64()),
            "si": pa.array(si[iu], pa.int64()),
            "sj": pa.array(si[ju], pa.int64()),
            "n": pa.array(np.full(len(iu), n, dtype=np.int64)),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(_clean, batch_format="pyarrow",
                                        zero_copy_batch=True)
                         .map_batches(_gram, batch_format="pyarrow",
                                      zero_copy_batch=True)).to_pandas()
    agg = parts.groupby(["i", "j"]).agg(
        sij=("sij", "sum"), si=("si", "sum"), sj=("sj", "sum"),
        n=("n", "sum")).reset_index()
    num = (agg["n"].astype(object) * agg["sij"].astype(object)
           - agg["si"].astype(object) * agg["sj"].astype(object))
    den = 1_000_000.0 * agg["n"].values * (agg["n"].values - 1)
    cov = np.array([float(v) for v in num]) / den
    return _collect(pa.table({
        "i": pa.array(agg["i"].values.astype(np.int64), pa.int64()),
        "j": pa.array(agg["j"].values.astype(np.int64), pa.int64()),
        "n": pa.array(agg["n"].values.astype(np.int64), pa.int64()),
        "cov": pa.array(round6_tie_robust(cov)),
    }))


MAX_CONCURRENCY_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t_us FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
lagd AS (
  SELECT user_id, t_us,
    CASE WHEN LAG(t_us) OVER w IS NULL
           OR t_us - LAG(t_us) OVER w > 1800000000
         THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
s AS (
  SELECT user_id, t_us,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY t_us) AS session_id
  FROM lagd),
iv AS (
  SELECT user_id, session_id, MIN(t_us) AS st, MAX(t_us) + 1 AS en
  FROM s GROUP BY 1, 2),
dl AS (SELECT st AS t, 1 AS dlt FROM iv
       UNION ALL SELECT en AS t, -1 AS dlt FROM iv),
net AS (SELECT t, SUM(dlt) AS nd FROM dl GROUP BY 1),
run AS (SELECT t, SUM(nd) OVER (ORDER BY t) AS conc FROM net)
SELECT t // 86400000000 AS day,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM run GROUP BY 1
"""


def q_max_concurrency(sf_dir: str):
    """Peak concurrent sessions per day — the capacity-planning
    sweep-line: sessionize per user (30-min gap, the sessions-query
    contract), emit +1/-1 interval deltas (end exclusive at
    t_end + 1), collapse deltas to a NET delta per timestamp (so tied
    starts/ends are order-immune), run one global exclusive prefix
    sum over time order, and take the per-day max of the running
    concurrency at its change points.  Ray shape: sessionize is one
    user-keyed exchange, the net collapse one t-keyed exchange, the
    prefix sum block-totals-to-driver (block-count scale), and the
    day max a bounded |days| driver fold.  All integers."""
    from ..stages.scan import prefix_sum
    from ..stages.session import sessionize
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])

    def _us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "t_us": batch["ts"].cast(pa.int64()),
        })

    pts = ds.map_batches(_us, batch_format="pyarrow", zero_copy_batch=True)
    sess = sessionize(pts, ["user_id"], "t_us", gap_us=1_800_000_000)
    delta_schema = pa.schema([("t", pa.int64()), ("dlt", pa.int64())])

    def _deltas(batch: pa.Table) -> pa.Table:
        st = batch["t_start_us"].to_numpy(zero_copy_only=False)
        en = batch["t_end_us"].to_numpy(zero_copy_only=False) + 1
        return pa.table({
            "t": pa.array(np.concatenate([st, en]), pa.int64()),
            "dlt": pa.array(np.concatenate(
                [np.ones(len(st), dtype=np.int64),
                 -np.ones(len(en), dtype=np.int64)]), pa.int64()),
        }, schema=delta_schema)

    deltas = sess.map_batches(_deltas, batch_format="pyarrow",
                              zero_copy_batch=True)
    net_schema = pa.schema([("t", pa.int64()), ("nd", pa.int64())])

    def _net(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return net_schema.empty_table()
        starts, _ = _runs(batch, ["t"])
        nd = np.add.reduceat(
            batch["dlt"].to_numpy(zero_copy_only=False), starts)
        return pa.table({
            "t": batch["t"].take(pa.array(starts, pa.int64())),
            "nd": pa.array(nd, pa.int64())}, schema=net_schema)

    net = sorted_group_map(deltas, ["t"], None, net_schema,
                           block_fn=_net)
    run = prefix_sum(net, ["t"], "nd", out_col="cum_excl")
    part_schema = pa.schema([("day", pa.int64()), ("mx", pa.int64())])

    def _daymax(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        t = batch["t"].to_numpy(zero_copy_only=False)
        conc = (batch["cum_excl"].to_numpy(zero_copy_only=False)
                + batch["nd"].to_numpy(zero_copy_only=False))
        day = t // _DAY_US
        uniq = np.unique(day)
        mx = [int(conc[day == u].max()) for u in uniq]
        return pa.table({"day": pa.array(uniq, pa.int64()),
                         "mx": pa.array(mx, pa.int64())},
                        schema=part_schema)

    parts = _collect_raw(run.map_batches(
        _daymax, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = parts.groupby("day")["mx"].max().reset_index()
    return _collect(pa.table({
        "day": pa.array(agg["day"].values.astype(np.int64), pa.int64()),
        "max_concurrent": pa.array(agg["mx"].values.astype(np.int64),
                                   pa.int64()),
    }))


ITEM_COSINE_SQL = """
WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
pc AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS c
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p GROUP BY 1, 2),
ic AS (SELECT p, COUNT(*) AS cu FROM op GROUP BY 1),
sym AS (SELECT u AS item, v AS partner, c FROM pc
        UNION ALL SELECT v AS item, u AS partner, c FROM pc),
sc AS (
  SELECT s.item, s.partner,
         CAST(s.c AS DOUBLE) / SQRT(CAST(ci.cu * cj.cu AS DOUBLE)) AS cos
  FROM sym s JOIN ic ci ON ci.p = s.item JOIN ic cj ON cj.p = s.partner)
SELECT item, partner, ROUND(cos, 6) AS cosine, rn FROM (
  SELECT item, partner, cos,
         ROW_NUMBER() OVER (PARTITION BY item
                            ORDER BY cos DESC, partner) AS rn
  FROM sc)
WHERE rn <= 3
"""


def q_item_cosine(sf_dir: str):
    """Item-item cosine similarity over the co-purchase graph (the
    neighborhood model behind item-to-item recommenders, Linden et
    al. 2003): sim(u, v) = c_uv / sqrt(c_u * c_v) on exact integer
    order counts, top-3 partners per item.  PARITY: the cosine is one
    division of one IEEE sqrt of exact integers — bitwise identical
    cross-engine, so the DESC rank needs no pre-round; ties break on
    partner id.  Ray shape: shared co-purchase pair counts (one
    orderkey exchange + one pair-key exchange), part frequencies
    broadcast at part-catalog scale, pair rows scored in-block, ONE
    item-keyed exchange for the per-item top-3."""
    import ray

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map

    from ..stages.sketch import distinct_count_exact

    pairs = _copurchase_pair_counts(sf_dir)
    op = _copurchase_order_parts(sf_dir)
    # exact distinct-order count per part: the map-side distinct of
    # _copurchase_order_parts is block-local only, so a plain count
    # would inflate on cross-block (order, part) dups — route through
    # the exact-distinct exchange instead
    pf_tbl = _collect_raw(distinct_count_exact(
        op, ["l_partkey"], ["l_orderkey"], out_col="np")).to_pandas()
    pf = pf_tbl.groupby("l_partkey")["np"].sum().sort_index()
    p_ids = pf.index.values.astype(np.int64)
    p_np = pf.values.astype(np.int64)
    ref = ray.put((p_ids, p_np))
    sym_schema = pa.schema([("item", pa.int64()), ("partner", pa.int64()),
                            ("cos", pa.float64())])

    def _score(batch: pa.Table) -> pa.Table:
        pi, pn = ray.get(ref)
        k = batch["k"].to_numpy(zero_copy_only=False)
        nuv = batch["nuv"].to_numpy(zero_copy_only=False)
        u = k >> np.int64(32)
        v = k & np.int64(0xFFFFFFFF)
        nu = pn[np.searchsorted(pi, u)]
        nv = pn[np.searchsorted(pi, v)]
        cos = nuv.astype(np.float64) / np.sqrt(
            (nu * nv).astype(np.float64))
        return pa.table({
            "item": pa.array(np.concatenate([u, v]), pa.int64()),
            "partner": pa.array(np.concatenate([v, u]), pa.int64()),
            "cos": pa.array(np.concatenate([cos, cos]), pa.float64()),
        }, schema=sym_schema)

    sym = pairs.map_batches(_score, batch_format="pyarrow",
                            zero_copy_batch=True)
    out_schema = pa.schema([("item", pa.int64()), ("partner", pa.int64()),
                            ("cosine", pa.float64()), ("rn", pa.int64())])

    def _topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["item"])
        item = batch["item"].to_numpy(zero_copy_only=False)
        part = batch["partner"].to_numpy(zero_copy_only=False)
        cos = batch["cos"].to_numpy(zero_copy_only=False)
        rows = {"item": [], "partner": [], "cosine": [], "rn": []}
        for s, e in zip(starts, ends):
            order = np.lexsort((part[s:e], -cos[s:e]))[:3]
            rows["item"].extend(item[s:e][order].tolist())
            rows["partner"].extend(part[s:e][order].tolist())
            rows["cosine"].extend(cos[s:e][order].tolist())
            rows["rn"].extend(range(1, len(order) + 1))
        return pa.table({
            "item": pa.array(rows["item"], pa.int64()),
            "partner": pa.array(rows["partner"], pa.int64()),
            "cosine": pa.array(round6_tie_robust(
                np.array(rows["cosine"], dtype=np.float64))),
            "rn": pa.array(rows["rn"], pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(sym, ["item"], None, out_schema,
                                     block_fn=_topk))


SEASONAL_DECOMPOSE_SQL = f"""
WITH {_DAILY_MILLI_CTE},
t AS (SELECT event_type, SUM(mi) AS sall, COUNT(*) AS nall
      FROM d GROUP BY 1),
s AS (SELECT event_type, day % 7 AS dow, SUM(mi) AS sd, COUNT(*) AS nd
      FROM d GROUP BY 1, 2)
SELECT s.event_type, CAST(s.dow AS BIGINT) AS dow,
       CAST(s.nd AS BIGINT) AS n_days,
       ROUND(CAST(s.sd AS DOUBLE) / s.nd / 1000.0
             - CAST(t.sall AS DOUBLE) / t.nall / 1000.0, 6) AS seasonal
FROM s JOIN t USING (event_type)
"""


def q_seasonal_decompose(sf_dir: str):
    """Weekly seasonal profile per series (the classical-decomposition
    seasonal component at period 7): mean daily value per day-of-week
    minus the series' overall mean — the additive seasonal index a
    forecaster subtracts before trend fitting.  PARITY: both terms are
    single divisions of exact integer sums in the same IEEE order
    (sd/nd/1000 - sall/nall/1000); bounded at |types| x 7."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "dow": [], "n": [], "s": []}
    for et in sorted(series):
        day, mi, _ = series[et]
        sall, nall = int(mi.astype(object).sum()), len(mi)
        dow = day % 7
        for dw in np.unique(dow):
            m = dow == dw
            sd, nd = int(mi[m].astype(object).sum()), int(m.sum())
            rows["et"].append(et)
            rows["dow"].append(int(dw))
            rows["n"].append(nd)
            rows["s"].append(float(sd) / nd / 1000.0
                             - float(sall) / nall / 1000.0)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "dow": pa.array(rows["dow"], pa.int64()),
        "n_days": pa.array(rows["n"], pa.int64()),
        "seasonal": pa.array(round6_tie_robust(
            np.array(rows["s"], dtype=np.float64))),
    }))


SHIFT_WEIGHTS_SQL = """
WITH v AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(value, 6) * 1000000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
mm AS (SELECT (MIN(day) + MAX(day)) // 2 AS thr FROM v),
b AS (SELECT event_type, vi // 25000000 AS bin,
             CASE WHEN day <= (SELECT thr FROM mm) THEN 1 ELSE 2 END
               AS period
      FROM v),
c AS (SELECT event_type, bin,
        SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS n2
      FROM b GROUP BY 1, 2),
t AS (SELECT event_type, SUM(n1) AS t1, SUM(n2) AS t2
      FROM c GROUP BY 1)
SELECT c.event_type, CAST(c.bin AS BIGINT) AS bin,
       CAST(c.n1 AS BIGINT) AS n_source, CAST(c.n2 AS BIGINT) AS n_target,
       ROUND(CAST(c.n2 * t.t1 AS DOUBLE) / (c.n1 * t.t2), 6) AS weight
FROM c JOIN t USING (event_type)
WHERE c.n1 > 0
"""


def q_shift_weights(sf_dir: str):
    """Covariate-shift importance weights (density-ratio by binning —
    the reweighting every train/serve drift correction starts from):
    split the timeline at its midpoint day, histogram each period's
    value distribution per type on fixed 25-unit integer bins, and
    weight each source bin by (n2/t2)/(n1/t1) — the factor that
    reweights period-1 data to the period-2 distribution.  All counts
    exact integers; the weight is ONE division of exact integer
    products.  Map-side (type, bin, period) partials -> a bounded
    |types| x |bins| driver merge."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    # period can't be assigned until the global midpoint day is known,
    # so partials carry the day: (type, bin, day) counts are still
    # bounded (|types| x |bins| x |days|) before the driver merge
    part_schema = pa.schema([("event_type", pa.string()),
                             ("bin", pa.int64()), ("day", pa.int64()),
                             ("n", pa.int64())])

    def _bins(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch["ts"].cast(pa.int64()), _DAY_US)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1_000_000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "bin": pa.array(vi // 25_000_000, pa.int64()),
                      "day": day})
        g = t.group_by(["event_type", "bin", "day"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["event_type", "bin", "day", "n"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _bins, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    day = parts["day"].values
    thr = (int(day.min()) + int(day.max())) // 2
    parts["p"] = np.where(day <= thr, 1, 2)
    c = parts.groupby(["event_type", "bin", "p"])["n"].sum().unstack(
        "p", fill_value=0).reset_index()
    n1 = c[1].values.astype(np.int64) if 1 in c.columns else \
        np.zeros(len(c), dtype=np.int64)
    n2 = c[2].values.astype(np.int64) if 2 in c.columns else \
        np.zeros(len(c), dtype=np.int64)
    c["n1"], c["n2"] = n1, n2
    t = c.groupby("event_type").agg(t1=("n1", "sum"),
                                    t2=("n2", "sum")).reset_index()
    m = c.merge(t, on="event_type")
    m = m[m["n1"] > 0]
    w = (m["n2"].values * m["t1"].values).astype(np.float64) / (
        m["n1"].values * m["t2"].values)
    return _collect(pa.table({
        "event_type": pa.array(m["event_type"].values, pa.string()),
        "bin": pa.array(m["bin"].values.astype(np.int64), pa.int64()),
        "n_source": pa.array(m["n1"].values.astype(np.int64), pa.int64()),
        "n_target": pa.array(m["n2"].values.astype(np.int64), pa.int64()),
        "weight": pa.array(round6_tie_robust(w)),
    }))


POT_CLUSTERS_SQL = f"""
WITH {_DAILY_MILLI_CTE},
r AS (
  SELECT event_type, day, mi,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mi DESC, day) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d),
thr AS (SELECT event_type, mi AS thr FROM r WHERE rk = (n + 9) // 10),
f AS (
  SELECT d.event_type, d.day,
         CASE WHEN d.mi >= t.thr THEN 1 ELSE 0 END AS ex
  FROM d JOIN thr t USING (event_type)),
g AS (
  SELECT event_type, day, ex,
         LAG(ex) OVER (PARTITION BY event_type ORDER BY day) AS pex
  FROM f),
c AS (
  SELECT event_type, ex,
         SUM(CASE WHEN ex = 1 AND (pex IS NULL OR pex = 0)
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY day) AS cid
  FROM g),
cl AS (SELECT event_type, cid, COUNT(*) AS len
       FROM c WHERE ex = 1 GROUP BY 1, 2)
SELECT t.event_type, t.thr AS thr_milli, s.n_exceed, x.n_clusters,
       x.max_len
FROM thr t
JOIN (SELECT event_type, CAST(SUM(ex) AS BIGINT) AS n_exceed
      FROM f GROUP BY 1) s USING (event_type)
JOIN (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(MAX(len) AS BIGINT) AS max_len
      FROM cl GROUP BY 1) x USING (event_type)
"""


def q_pot_clusters(sf_dir: str):
    """Peaks-over-threshold exceedance clustering (the extremal-index
    diagnostic of extreme-value theory): threshold each series at its
    exact empirical 90th-percentile order statistic (the rank
    ceil(n/10) value DESC — an integer, no interpolated quantile
    anywhere), flag exceedance days, and measure the maximal
    consecutive-day runs: exceedance count, cluster count and longest
    cluster.  Clustered exceedances (long runs) mean extremes arrive
    dependent, not i.i.d.  Pure integer algebra on the shared milli
    series; bounded at |types| x |days|."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "thr": [], "ne": [], "nc": [], "ml": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        n = len(mi)
        k = (n + 9) // 10
        thr = int(np.sort(mi)[::-1][k - 1])
        ex = (mi >= thr).astype(np.int64)
        starts = ((ex == 1)
                  & np.concatenate([[True], ex[:-1] == 0])).astype(bool)
        n_clusters = int(starts.sum())
        # run lengths: distance between cluster starts and run ends
        max_len = 0
        run = 0
        for e in ex:
            run = run + 1 if e else 0
            max_len = max(max_len, run)
        rows["et"].append(et)
        rows["thr"].append(thr)
        rows["ne"].append(int(ex.sum()))
        rows["nc"].append(n_clusters)
        rows["ml"].append(max_len)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "thr_milli": pa.array(rows["thr"], pa.int64()),
        "n_exceed": pa.array(rows["ne"], pa.int64()),
        "n_clusters": pa.array(rows["nc"], pa.int64()),
        "max_len": pa.array(rows["ml"], pa.int64()),
    }))


OHLC_DAILY_SQL = """
WITH v AS (
  SELECT event_type, event_id, epoch_us(ts) AS t_us,
         epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(value, 6) * 1000000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    AND event_id IS NOT NULL)
SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
       FIRST(vi ORDER BY t_us, event_id) AS open_micro,
       MAX(vi) AS high_micro, MIN(vi) AS low_micro,
       FIRST(vi ORDER BY t_us DESC, event_id DESC) AS close_micro
FROM v GROUP BY 1, 2
"""


def q_ohlc_daily(sf_dir: str):
    """Daily OHLC bars per series — the open/high/low/close compaction
    every market-data and metrics pipeline runs: first and last value
    by (ts, event_id) order plus the min/max, on exact micro-int
    values so the parity surface is empty.  Mergeable by construction
    (argmin/argmax over the totally-ordered (ts, event_id) key merge
    associatively), so blocks emit one partial row per (type, day) and
    the exchange is |types| x |days| bounded."""
    import pandas as pd

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value",
                                  "event_id"])
    from ..kernels.rounding import round6_tie_robust

    part_schema = pa.schema([
        ("event_type", pa.string()), ("day", pa.int64()),
        ("n", pa.int64()),
        ("ot", pa.int64()), ("oe", pa.int64()), ("ov", pa.int64()),
        ("ct", pa.int64()), ("ce", pa.int64()), ("cv", pa.int64()),
        ("hi", pa.int64()), ("lo", pa.int64())])

    def _bars(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1_000_000.0
                      + 0.5).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        day = t_us // _DAY_US
        order = np.lexsort((eid, t_us, day, et))
        et, day = et[order], day[order]
        t_us, eid, vi = t_us[order], eid[order], vi[order]
        first = np.empty(len(et), dtype=bool)
        first[0] = True
        first[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        starts = np.nonzero(first)[0]
        ends = np.append(starts[1:], len(et))
        rows = {k: [] for k in part_schema.names}
        for s, e in zip(starts, ends):
            rows["event_type"].append(et[s])
            rows["day"].append(int(day[s]))
            rows["n"].append(int(e - s))
            rows["ot"].append(int(t_us[s]))
            rows["oe"].append(int(eid[s]))
            rows["ov"].append(int(vi[s]))
            rows["ct"].append(int(t_us[e - 1]))
            rows["ce"].append(int(eid[e - 1]))
            rows["cv"].append(int(vi[e - 1]))
            rows["hi"].append(int(vi[s:e].max()))
            rows["lo"].append(int(vi[s:e].min()))
        return pa.table(
            {"event_type": pa.array(rows["event_type"], pa.string()),
             **{k: pa.array(rows[k], pa.int64())
                for k in part_schema.names[1:]}}, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _bars, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()

    def _merge(g: pd.DataFrame) -> pd.Series:
        o = g.sort_values(["ot", "oe"]).iloc[0]
        c = g.sort_values(["ct", "ce"]).iloc[-1]
        return pd.Series({
            "n": int(g["n"].sum()),
            "open_micro": int(o["ov"]), "high_micro": int(g["hi"].max()),
            "low_micro": int(g["lo"].min()), "close_micro": int(c["cv"])})

    agg = parts.groupby(["event_type", "day"]).apply(
        _merge, include_groups=False).reset_index()
    return _collect(pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "day": pa.array(agg["day"].values.astype(np.int64), pa.int64()),
        "n": pa.array(agg["n"].values.astype(np.int64), pa.int64()),
        "open_micro": pa.array(
            agg["open_micro"].values.astype(np.int64), pa.int64()),
        "high_micro": pa.array(
            agg["high_micro"].values.astype(np.int64), pa.int64()),
        "low_micro": pa.array(
            agg["low_micro"].values.astype(np.int64), pa.int64()),
        "close_micro": pa.array(
            agg["close_micro"].values.astype(np.int64), pa.int64()),
    }))


CONTINGENCY_RESIDUALS_SQL = """
WITH o AS (
  SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow,
         COUNT(*) AS n
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2),
rt AS (SELECT event_type, SUM(n) AS r FROM o GROUP BY 1),
ct AS (SELECT dow, SUM(n) AS c FROM o GROUP BY 1),
tt AS (SELECT SUM(n) AS t FROM o)
SELECT o.event_type, CAST(o.dow AS BIGINT) AS dow,
       CAST(o.n AS BIGINT) AS n,
       ROUND((o.n - CAST(rt.r * ct.c AS DOUBLE) / tt.t)
             / SQRT(CAST(rt.r * ct.c AS DOUBLE) / tt.t), 6) AS residual
FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN tt
"""


def q_contingency_residuals(sf_dir: str):
    """Standardized Pearson residuals of the event_type x day-of-week
    contingency table — the per-cell readout behind the global
    chi2_independence test (which cells drive the dependence, and in
    which direction).  All marginals are exact integers; each residual
    is the same IEEE expression (obs - rc/t)/sqrt(rc/t) cross-engine.
    Map-side (type, dow) partials -> a |types| x 7 bounded merge."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("dow", pa.int64()), ("n", pa.int64())])

    def _cells(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch["ts"].cast(pa.int64()), _DAY_US)
        t = pa.table({"event_type": batch["event_type"],
                      "dow": pc.subtract(
                          day, pc.multiply(pc.divide(day, 7), 7))})
        g = t.group_by(["event_type", "dow"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "dow", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _cells, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    o = parts.groupby(["event_type", "dow"])["n"].sum().reset_index()
    rt = o.groupby("event_type")["n"].sum()
    ct = o.groupby("dow")["n"].sum()
    t = int(o["n"].sum())
    exp = (rt.loc[o["event_type"]].values.astype(np.int64)
           * ct.loc[o["dow"]].values.astype(np.int64)).astype(
               np.float64) / t
    resid = (o["n"].values - exp) / np.sqrt(exp)
    return _collect(pa.table({
        "event_type": pa.array(o["event_type"].values, pa.string()),
        "dow": pa.array(o["dow"].values.astype(np.int64), pa.int64()),
        "n": pa.array(o["n"].values.astype(np.int64), pa.int64()),
        "residual": pa.array(round6_tie_robust(resid)),
    }))


SOURCE_LANG_COSINE_SQL = """
WITH c AS (
  SELECT source, lang, COUNT(*) AS n FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         SUM(a.n * b.n) AS dot
  FROM c a JOIN c b ON b.lang = a.lang AND a.source < b.source
  GROUP BY 1, 2),
nr AS (SELECT source, SUM(n * n) AS nrm FROM c GROUP BY 1)
SELECT p.source_a, p.source_b,
       ROUND(CAST(p.dot AS DOUBLE)
             / SQRT(CAST(na.nrm * nb.nrm AS DOUBLE)), 6) AS cosine
FROM p JOIN nr na ON na.source = p.source_a
       JOIN nr nb ON nb.source = p.source_b
"""


def q_source_lang_cosine(sf_dir: str):
    """Pairwise source similarity by language mix: cosine between the
    per-source language count vectors — the corpus-composition
    comparison a crawl-curation pipeline uses to spot redundant or
    anomalous sources.  Counts, dots and norms are exact integers; the
    cosine is one division of one IEEE sqrt (item_cosine parity).
    Map-side (source, lang) partials -> |sources| x |langs| bounded
    merge; the pair space is |sources|^2 — catalog scale."""
    from ..kernels.rounding import round6_tie_robust
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "lang"])
    part_schema = pa.schema([("source", pa.string()),
                             ("lang", pa.string()), ("n", pa.int64())])

    def _cnt(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["source"]),
                                     pc.is_valid(batch["lang"])))
        g = batch.group_by(["source", "lang"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source", "lang", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _cnt, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    c = parts.groupby(["source", "lang"])["n"].sum().unstack(
        fill_value=0).sort_index()
    mat = c.values.astype(np.int64)
    srcs = list(c.index)
    rows = {"a": [], "b": [], "cos": []}
    nrm = (mat.astype(object) ** 2).sum(axis=1)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            dot = int((mat[i].astype(object) * mat[j].astype(
                object)).sum())
            rows["a"].append(srcs[i])
            rows["b"].append(srcs[j])
            rows["cos"].append(
                float(dot) / np.sqrt(float(int(nrm[i]) * int(nrm[j]))))
    return _collect(pa.table({
        "source_a": pa.array(rows["a"], pa.string()),
        "source_b": pa.array(rows["b"], pa.string()),
        "cosine": pa.array(round6_tie_robust(
            np.array(rows["cos"], dtype=np.float64))),
    }))


MANNWHITNEY_U_SQL = """
WITH v AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(value, 6) * 1000000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
mm AS (SELECT (MIN(day) + MAX(day)) // 2 AS thr FROM v),
s AS (SELECT event_type, vi,
             CASE WHEN day <= (SELECT thr FROM mm) THEN 1 ELSE 2 END
               AS period
      FROM v),
u AS (
  SELECT a.event_type,
         SUM(CASE WHEN a.vi > b.vi THEN 2
                  WHEN a.vi = b.vi THEN 1 ELSE 0 END) AS u2
  FROM (SELECT event_type, vi FROM s WHERE period = 1) a
  JOIN (SELECT event_type, vi FROM s WHERE period = 2) b
    USING (event_type)
  GROUP BY 1),
n AS (SELECT event_type,
        SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS n2
      FROM s GROUP BY 1)
SELECT n.event_type, CAST(n.n1 AS BIGINT) AS n1,
       CAST(n.n2 AS BIGINT) AS n2,
       CAST(u.u2 AS BIGINT) AS u_times_2
FROM n JOIN u USING (event_type)
"""


def q_mannwhitney_u(sf_dir: str):
    """Mann-Whitney U between each series' first and second half of
    the timeline (split at the midpoint day) — the nonparametric
    location-shift test drift monitors prefer over the t-test.  The
    statistic is kept EXACT: 2U = 2*#(x1 > x2) + #(x1 == x2) over all
    cross-period pairs, an integer.  Ray shape: per-block (type, vi,
    period) count partials collapse to the distinct-value histogram
    (micro-quantization bounds it), the driver merges histograms and
    computes 2U from cumulative counts — never materializing pairs."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("vi", pa.int64()), ("day", pa.int64()),
                             ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch["ts"].cast(pa.int64()), _DAY_US)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1_000_000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "vi": pa.array(vi, pa.int64()), "day": day})
        g = t.group_by(["event_type", "vi", "day"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "vi", "day", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    thr = (int(parts["day"].min()) + int(parts["day"].max())) // 2
    parts["p"] = np.where(parts["day"].values <= thr, 1, 2)
    h = parts.groupby(["event_type", "vi", "p"])["n"].sum().unstack(
        "p", fill_value=0).reset_index()
    rows = {"et": [], "n1": [], "n2": [], "u2": []}
    for et, sub in h.groupby("event_type"):
        sub = sub.sort_values("vi")
        n1v = sub[1].values.astype(object) if 1 in sub.columns else \
            np.zeros(len(sub), dtype=object)
        n2v = sub[2].values.astype(object) if 2 in sub.columns else \
            np.zeros(len(sub), dtype=object)
        cum2 = np.concatenate([[0], np.cumsum(n2v)[:-1]])
        u2 = int((n1v * (2 * cum2 + n2v)).sum())
        rows["et"].append(et)
        rows["n1"].append(int(n1v.sum()))
        rows["n2"].append(int(n2v.sum()))
        rows["u2"].append(u2)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n1": pa.array(rows["n1"], pa.int64()),
        "n2": pa.array(rows["n2"], pa.int64()),
        "u_times_2": pa.array(rows["u2"], pa.int64()),
    }))


def q_cluster_label_mix(sf_dir: str):
    """Label composition of the final k-means partition — the cluster
    purity readout (does unsupervised structure recover the labels?):
    rerun the LAST Lloyd assignment (the state that produced the final
    centroids, so the partition is exactly the oracle's a2) and count
    labels per cluster.  One extra map_batches pass emitting
    (cluster, label) count partials — a k x |labels| bounded exchange;
    null labels cluster but drop from the mix, matching the oracle's
    inner join.  All-integer output: empty parity surface."""
    import ray

    st = _kmeans_lloyd(sf_dir, columns=["vec_id", "embedding", "label"])
    cref = ray.put((st["cls_assign"], st["cents_assign"]))
    milli = st["milli"]
    part_schema = pa.schema([("cluster", pa.int64()),
                             ("label", pa.int64()), ("n", pa.int64())])

    def _mix(batch: pa.Table) -> pa.Table:
        cls_, c_ = ray.get(cref)
        vi = milli(batch)
        d = ((vi[:, None, :] - c_[None, :, :]) ** 2).sum(axis=2)
        a = cls_[np.argmin(d, axis=1)]
        lab = batch["label"]
        ok = pc.is_valid(lab).to_numpy(zero_copy_only=False)
        lab = lab.to_numpy(zero_copy_only=False)
        t = pa.table({"cluster": pa.array(a[ok], pa.int64()),
                      "label": pa.array(
                          lab[ok].astype(np.int64), pa.int64())})
        g = t.group_by(["cluster", "label"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cluster", "label", "n"]).cast(
            part_schema)

    parts = _collect_raw(st["ds"].map_batches(
        _mix, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    agg = parts.groupby(["cluster", "label"])["n"].sum().reset_index()
    return _collect(pa.table({
        "cluster": pa.array(agg["cluster"].values.astype(np.int64),
                            pa.int64()),
        "label": pa.array(agg["label"].values.astype(np.int64),
                          pa.int64()),
        "n": pa.array(agg["n"].values.astype(np.int64), pa.int64()),
    }))


DEGREE_HIST_SQL = f"""
WITH {_COPURCHASE_EDGES_CTE},
dg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY 1)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM dg GROUP BY 1
"""


def q_degree_hist(sf_dir: str):
    """Degree distribution of the part co-purchase graph — the
    first-look structural census (scale-free tail? disconnected
    fringe?) every graph pipeline reports before running components /
    PageRank.  Edges reuse the shared co-purchase pipeline; degrees
    and the histogram are pure integer counts (empty parity surface).
    The slim packed-int64 edge list rides the gated broadcast collect
    (kcore contract); above the gate each step is the documented
    degree-groupby Dataset pass."""
    from ..stages.joins import collect_small

    edges = _copurchase_edges(sf_dir)
    ek = collect_small(edges)["k"].to_numpy(zero_copy_only=False)
    u = ek >> np.int64(32)
    v = ek & np.int64(0xFFFFFFFF)
    _, deg = np.unique(np.concatenate([u, v]), return_counts=True)
    dv, cnt = np.unique(deg, return_counts=True)
    return _collect(pa.table({
        "degree": pa.array(dv.astype(np.int64), pa.int64()),
        "n_nodes": pa.array(cnt.astype(np.int64), pa.int64()),
    }))


OVERDISPERSION_SQL = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS cnt
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6) AS mean_count,
       ROUND(CAST(COUNT(*) * SUM(cnt * cnt) - SUM(cnt) * SUM(cnt)
                  AS DOUBLE)
             / ((COUNT(*) - 1) * SUM(cnt)), 6) AS dispersion
FROM c GROUP BY 1
HAVING COUNT(*) > 1 AND SUM(cnt) > 0
"""


def q_overdispersion(sf_dir: str):
    """Count-process overdispersion per series: variance-to-mean ratio
    of the daily event counts (1 = Poisson, >1 = bursty/clumped — the
    diagnostic that decides Poisson vs negative-binomial modeling).
    Both the mean and the ratio [n*S2 - S^2]/[(n-1)*S] are single
    divisions of exact integer sums.  Map-side (type, day) count
    partials -> |types| x |days| bounded driver merge."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()), ("n", pa.int64())])

    def _daily(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch["event_type"],
                      "day": pc.divide(batch["ts"].cast(pa.int64()),
                                       _DAY_US)})
        g = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "day", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _daily, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    c = parts.groupby(["event_type", "day"])["n"].sum().reset_index()
    rows = {"et": [], "nd": [], "mc": [], "disp": []}
    for et, sub in c.groupby("event_type"):
        cnt = sub["n"].values.astype(object)
        n = len(cnt)
        s = int(cnt.sum())
        s2 = int((cnt ** 2).sum())
        if n <= 1 or s == 0:
            continue
        rows["et"].append(et)
        rows["nd"].append(n)
        rows["mc"].append(float(s) / n)
        rows["disp"].append(float(n * s2 - s * s) / ((n - 1) * s))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_days": pa.array(rows["nd"], pa.int64()),
        "mean_count": pa.array(round6_tie_robust(
            np.array(rows["mc"], dtype=np.float64))),
        "dispersion": pa.array(round6_tie_robust(
            np.array(rows["disp"], dtype=np.float64))),
    }))


HHI_USERS_SQL = """
WITH g AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(n * n) AS DOUBLE) / (SUM(n) * SUM(n)), 6) AS hhi
FROM g GROUP BY 1
"""


def q_hhi_users(sf_dir: str):
    """Herfindahl-Hirschman concentration of activity per series: the
    sum of squared user shares (1/n_users = perfectly even, 1 = one
    user dominates) — the audience-concentration companion to
    pareto_share.  HHI = sum(n_u^2) / (sum n_u)^2 on exact integer
    per-user counts — ONE division.  One (type, user)-keyed exchange
    finishes the counts; the per-type fold is sum(n^2)/sum(n) partials
    at |types| scale."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "user_id"])
    pre_schema = pa.schema([("event_type", pa.string()),
                            ("user_id", pa.int64()), ("n", pa.int64())])

    def _pre(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["event_type", "user_id", "n"]).cast(pre_schema)

    pre = ds.map_batches(_pre, batch_format="pyarrow",
                         zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("nu", pa.int64()), ("s", pa.int64()),
                            ("s2", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["event_type", "user_id"])
        nv = batch["n"].to_numpy(zero_copy_only=False)
        n_user = np.add.reduceat(nv, starts)
        et = batch["event_type"].take(pa.array(starts, pa.int64()))
        t = pa.table({"event_type": et,
                      "nu": pa.array(np.ones(len(starts), np.int64)),
                      "s": pa.array(n_user, pa.int64()),
                      "s2": pa.array(n_user * n_user, pa.int64())},
                     schema=out_schema)
        g = t.group_by(["event_type"]).aggregate(
            [("nu", "sum"), ("s", "sum"), ("s2", "sum")])
        return g.rename_columns(
            ["event_type", "nu", "s", "s2"]).cast(out_schema)

    parts = _collect_raw(sorted_group_map(
        pre, ["event_type", "user_id"], None, out_schema,
        block_fn=_fold)).to_pandas()
    agg = parts.groupby("event_type").agg(
        nu=("nu", "sum"), s=("s", "sum"), s2=("s2", "sum")).reset_index()
    # square in INTEGER space like the oracle's SUM(n)*SUM(n) — a float
    # product would round differently once sums pass 2^26
    hhi = np.array([float(int(a)) / float(int(s) ** 2)
                    for a, s in zip(agg["s2"].values, agg["s"].values)])
    return _collect(pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "n_users": pa.array(agg["nu"].values.astype(np.int64),
                            pa.int64()),
        "hhi": pa.array(round6_tie_robust(hhi)),
    }))


QUANTILE_BANDS_SQL = """
WITH v AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(value, 6) * 1000000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
r AS (
  SELECT event_type, day, vi,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY vi) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, day) AS n
  FROM v)
SELECT event_type, day, CAST(MAX(n) AS BIGINT) AS n,
       MAX(CASE WHEN rn = (n + 9) // 10 THEN vi END) AS p10_micro,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN vi END) AS p50_micro,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN vi END) AS p90_micro
FROM r GROUP BY 1, 2
"""


def q_quantile_bands_daily(sf_dir: str):
    """Daily p10/p50/p90 bands per series — the percentile ribbon
    behind every latency/metric dashboard, kept EXACT: each band is
    the ceil(q*n)-th ascending order statistic of the day's micro-int
    values (no interpolated quantile, no float threshold), so the
    parity surface is empty.  ONE (type, day)-keyed exchange
    co-locates each day; the block kernel sorts each run once and
    gathers the three ranks."""
    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])

    def _proj(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1_000_000.0
                      + 0.5).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "day": pc.divide(batch["ts"].cast(pa.int64()), _DAY_US),
            "vi": pa.array(vi, pa.int64())})

    proj = ds.map_batches(_proj, batch_format="pyarrow",
                          zero_copy_batch=True)
    out_schema = pa.schema([
        ("event_type", pa.string()), ("day", pa.int64()),
        ("n", pa.int64()), ("p10_micro", pa.int64()),
        ("p50_micro", pa.int64()), ("p90_micro", pa.int64())])

    def _bands(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["event_type", "day"])
        vi = batch["vi"].to_numpy(zero_copy_only=False)
        idx = pa.array(starts, pa.int64())
        rows = {"n": [], "p10": [], "p50": [], "p90": []}
        for s, e in zip(starts, ends):
            x = np.sort(vi[s:e])
            n = len(x)
            rows["n"].append(n)
            rows["p10"].append(int(x[(n + 9) // 10 - 1]))
            rows["p50"].append(int(x[(n + 1) // 2 - 1]))
            rows["p90"].append(int(x[(9 * n + 9) // 10 - 1]))
        return pa.table({
            "event_type": batch["event_type"].take(idx),
            "day": batch["day"].take(idx),
            "n": pa.array(rows["n"], pa.int64()),
            "p10_micro": pa.array(rows["p10"], pa.int64()),
            "p50_micro": pa.array(rows["p50"], pa.int64()),
            "p90_micro": pa.array(rows["p90"], pa.int64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(proj, ["event_type", "day"], None,
                                     out_schema, block_fn=_bands))


CHARCLASS_STATS_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
       CAST(SUM(LENGTH(text)
                - LENGTH(REGEXP_REPLACE(text, '[a-zA-Z]', '', 'g')))
            AS BIGINT) AS letters,
       CAST(SUM(LENGTH(text)
                - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))
            AS BIGINT) AS digits,
       CAST(SUM(LENGTH(text)
                - LENGTH(REGEXP_REPLACE(text, ' ', '', 'g')))
            AS BIGINT) AS spaces
FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
GROUP BY 1
"""


def q_charclass_stats(sf_dir: str):
    """Character-class census per language — the byte-level corpus
    profile (ASCII-letter / digit / space mass) a crawl pipeline uses
    to catch mis-tagged languages and binary-contaminated text.  Per
    character counts via one vectorized RE2 pass per class
    (pc.count_substring_regex == DuckDB regexp semantics, the
    pii_redact precedent); all outputs exact integers.  Map-side
    per-lang partials -> |langs| bounded merge."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    part_schema = pa.schema([
        ("lang", pa.string()), ("n_docs", pa.int64()),
        ("n_chars", pa.int64()), ("letters", pa.int64()),
        ("digits", pa.int64()), ("spaces", pa.int64())])

    def _census(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["lang"]),
                                     pc.is_valid(batch["text"])))
        t = pa.table({
            "lang": batch["lang"],
            "n_docs": pa.array(np.ones(len(batch), np.int64)),
            "n_chars": pc.utf8_length(batch["text"]).cast(pa.int64()),
            "letters": pc.count_substring_regex(
                batch["text"], "[a-zA-Z]").cast(pa.int64()),
            "digits": pc.count_substring_regex(
                batch["text"], "[0-9]").cast(pa.int64()),
            "spaces": pc.count_substring_regex(
                batch["text"], " ").cast(pa.int64()),
        })
        g = t.group_by(["lang"]).aggregate(
            [("n_docs", "sum"), ("n_chars", "sum"), ("letters", "sum"),
             ("digits", "sum"), ("spaces", "sum")])
        return g.rename_columns(part_schema.names).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _census, batch_format="pyarrow", zero_copy_batch=True)).to_pandas()
    agg = parts.groupby("lang").sum().reset_index()
    return _collect(pa.table({
        "lang": pa.array(agg["lang"], pa.string()),
        **{c: pa.array(agg[c].values.astype(np.int64), pa.int64())
           for c in ["n_docs", "n_chars", "letters", "digits",
                     "spaces"]},
    }))


DUP_RATE_BY_SOURCE_SQL = """
WITH cp AS (
  SELECT text, COUNT(*) AS n_copies FROM documents
  WHERE source IS NOT NULL AND text IS NOT NULL GROUP BY 1)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cp.n_copies > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_docs
FROM documents d JOIN cp ON cp.text = d.text
WHERE d.source IS NOT NULL AND d.text IS NOT NULL
GROUP BY 1
"""


def q_dup_rate_by_source(sf_dir: str):
    """Duplicate contamination per source — the curation readout that
    decides which feeds to throttle: for every source, how many of its
    docs share their exact text with ANY doc corpus-wide.  Engine:
    blake2b-64 raw-text fingerprints (the exact-dedup contract), ONE
    fingerprint-keyed exchange co-locates all copies, the block kernel
    tags each doc with its group size and folds to per-source
    counters in-block — the driver merge is |sources| bounded.  All
    integer."""
    import ray.data as rd

    from ..kernels.textkit import blake64
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    fp_schema = pa.schema([("fp", pa.int64()), ("source", pa.string())])

    def _fp(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["source"]),
                                     pc.is_valid(batch["text"])))
        fps = [blake64(t.encode("utf-8"))
               for t in batch["text"].to_pylist()]
        return pa.table({
            "fp": pa.array(np.array(fps, dtype=np.uint64).view(np.int64),
                           pa.int64()),
            "source": batch["source"]}, schema=fp_schema)

    fps = ds.map_batches(_fp, batch_format="pyarrow",
                         zero_copy_batch=True)
    out_schema = pa.schema([("source", pa.string()),
                            ("n_docs", pa.int64()),
                            ("n_dup_docs", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["fp"])
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        sizes = ends - starts
        dup = np.repeat(sizes > 1, sizes)
        t = pa.table({"source": pa.array(src, pa.string()),
                      "n_docs": pa.array(np.ones(len(src), np.int64)),
                      "n_dup_docs": pa.array(
                          dup.astype(np.int64), pa.int64())})
        g = t.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("n_dup_docs", "sum")])
        return g.rename_columns(out_schema.names).cast(out_schema)

    parts = _collect_raw(sorted_group_map(
        fps, ["fp"], None, out_schema, block_fn=_fold)).to_pandas()
    agg = parts.groupby("source").sum().reset_index()
    return _collect(pa.table({
        "source": pa.array(agg["source"], pa.string()),
        "n_docs": pa.array(agg["n_docs"].values.astype(np.int64),
                           pa.int64()),
        "n_dup_docs": pa.array(
            agg["n_dup_docs"].values.astype(np.int64), pa.int64()),
    }))


SKYLINE_DAILY_SQL = f"""
WITH {_DAILY_MILLI_CTE},
s AS (
  SELECT event_type, day, mi,
         MAX(mi) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 1 FOLLOWING
                                AND UNBOUNDED FOLLOWING) AS sufmax
  FROM d)
SELECT event_type, day, mi AS mean_milli
FROM s WHERE sufmax IS NULL OR mi > sufmax
"""


def q_skyline_daily(sf_dir: str):
    """Skyline (Pareto-maxima) of each daily series: the days whose
    mean strictly exceeds every LATER day's mean — the
    record-from-the-right frontier (the 2-D skyline operator of
    Borzsony et al. 2001 specialized to the time axis), i.e. the
    all-time-high staircase read backwards.  Pure integer compares via
    one suffix-max sweep on the shared milli series; bounded at
    |types| x |days|."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "day": [], "mi": []}
    for et in sorted(series):
        day, mi, _ = series[et]
        sufmax = np.concatenate(
            [np.maximum.accumulate(mi[::-1])[::-1][1:],
             [np.iinfo(np.int64).min]])
        keep = mi > sufmax
        rows["et"].extend([et] * int(keep.sum()))
        rows["day"].extend(day[keep].tolist())
        rows["mi"].extend(mi[keep].tolist())
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "day": pa.array(rows["day"], pa.int64()),
        "mean_milli": pa.array(rows["mi"], pa.int64()),
    }))


BOOLEAN_SEARCH_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''
)
SELECT doc_id,
       CAST(SUM(CASE WHEN term = 'data' THEN 1 ELSE 0 END) AS BIGINT)
         AS tf_data,
       CAST(SUM(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS BIGINT)
         AS tf_merge
FROM toks GROUP BY 1
HAVING SUM(CASE WHEN term = 'data' THEN 1 ELSE 0 END) > 0
   AND SUM(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) > 0
"""


def q_boolean_search(sf_dir: str):
    """Conjunctive boolean retrieval: documents whose token stream
    contains BOTH query terms ('data' AND 'merge'), with per-doc term
    frequencies — the AND-of-postings primitive a search stack runs
    before ranking.  Fully row-local (one vectorized tokenize + two
    equality counts per block, house tokenizer), so it's a pure
    map/filter with NO exchange at any corpus size.  All integer."""
    import ray.data as rd

    from ..stages.wordcount import TOKEN_SPLIT_RE

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("tf_data", pa.int64()),
                            ("tf_merge", pa.int64())])

    def _search(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["doc_id"]),
                                     pc.is_valid(batch["text"])))
        toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]),
                                      TOKEN_SPLIT_RE)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        owner = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        tfd = np.zeros(len(batch), dtype=np.int64)
        tfm = np.zeros(len(batch), dtype=np.int64)
        isd = pc.equal(flat, "data").to_numpy(zero_copy_only=False)
        ism = pc.equal(flat, "merge").to_numpy(zero_copy_only=False)
        np.add.at(tfd, owner[isd], 1)
        np.add.at(tfm, owner[ism], 1)
        keep = (tfd > 0) & (tfm > 0)
        return pa.table({
            "doc_id": batch["doc_id"].take(
                pa.array(np.nonzero(keep)[0], pa.int64())),
            "tf_data": pa.array(tfd[keep], pa.int64()),
            "tf_merge": pa.array(tfm[keep], pa.int64()),
        }, schema=out_schema)

    return _collect(ds.map_batches(_search, batch_format="pyarrow",
                                   zero_copy_batch=True))


ASSORTATIVITY_SQL = f"""
WITH {_COPURCHASE_EDGES_CTE},
dg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY 1),
pts AS (
  SELECT du.degree AS x, dv.degree AS y
  FROM e JOIN dg du ON du.node = e.u JOIN dg dv ON dv.node = e.v
  UNION ALL
  SELECT dv.degree AS x, du.degree AS y
  FROM e JOIN dg du ON du.node = e.u JOIN dg dv ON dv.node = e.v)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
             / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6)
         AS assortativity
FROM pts
"""


def q_assortativity(sf_dir: str):
    """Degree assortativity of the co-purchase graph (Newman 2002):
    Pearson correlation of endpoint degrees over all directed edge
    incidences — do hubs attach to hubs (r > 0, social-style) or to
    the fringe (r < 0, hub-and-spoke)?  Because the incidence set is
    symmetric, Sx = Sy and Sxx = Syy, so the correlation reduces to
    (n*Sxy - Sx^2-style) — ONE division of exact integer sums, no
    sqrt.  Degrees ride the gated edge-list collect (kcore contract);
    all sums are bounded driver folds."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import collect_small

    edges = _copurchase_edges(sf_dir)
    ek = collect_small(edges)["k"].to_numpy(zero_copy_only=False)
    u = ek >> np.int64(32)
    v = ek & np.int64(0xFFFFFFFF)
    nodes, deg = np.unique(np.concatenate([u, v]), return_counts=True)
    du = deg[np.searchsorted(nodes, u)].astype(object)
    dv = deg[np.searchsorted(nodes, v)].astype(object)
    x = np.concatenate([du, dv])
    y = np.concatenate([dv, du])
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    r = float(n * sxy - sx * sy) / (n * sxx - sx * sx)
    return _collect(pa.table({
        "n_points": pa.array([n], pa.int64()),
        "assortativity": pa.array(round6_tie_robust(
            np.array([r], dtype=np.float64))),
    }))


TYPE_WJACCARD_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
u AS (SELECT DISTINCT user_id FROM c),
tt AS (SELECT DISTINCT a.event_type AS ta, b.event_type AS tb
       FROM c a JOIN c b ON a.event_type < b.event_type),
j AS (
  SELECT tt.ta, tt.tb,
         COALESCE(ca.n, 0) AS na, COALESCE(cb.n, 0) AS nb
  FROM tt CROSS JOIN u
  LEFT JOIN c ca ON ca.user_id = u.user_id AND ca.event_type = tt.ta
  LEFT JOIN c cb ON cb.user_id = u.user_id AND cb.event_type = tt.tb)
SELECT ta AS type_a, tb AS type_b,
       CAST(SUM(LEAST(na, nb)) AS BIGINT) AS sum_min,
       CAST(SUM(GREATEST(na, nb)) AS BIGINT) AS sum_max,
       ROUND(CAST(SUM(LEAST(na, nb)) AS DOUBLE)
             / SUM(GREATEST(na, nb)), 6) AS wjaccard
FROM j GROUP BY 1, 2
"""


def q_type_weighted_jaccard(sf_dir: str):
    """Weighted (multiset) Jaccard between event-type activity
    profiles: sum over users of min(count_a, count_b) over sum of
    max — the frequency-aware sibling of type_jaccard (binary
    presence), the standard weighted-set similarity of histogram
    sketching.  ONE user-keyed exchange co-locates each user's type
    counts; the block kernel folds per-user min/max into |type-pair|
    partials, so nothing user-scale reaches the driver.  Exact
    integers + one division."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "user_id"])
    pre_schema = pa.schema([("user_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("n", pa.int64())])

    def _pre(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["user_id", "event_type", "n"]).cast(pre_schema)

    pre = ds.map_batches(_pre, batch_format="pyarrow",
                         zero_copy_batch=True)
    part_schema = pa.schema([("ta", pa.string()), ("tb", pa.string()),
                             ("smin", pa.int64()), ("smax", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        starts, ends = _runs(batch, ["user_id"])
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        nv = batch["n"].to_numpy(zero_copy_only=False)
        acc: dict = {}
        for s, e in zip(starts, ends):
            # merge duplicate (user, type) partials within the run
            types, inv = np.unique(et[s:e], return_inverse=True)
            cnt = np.zeros(len(types), dtype=np.int64)
            np.add.at(cnt, inv, nv[s:e])
            for i in range(len(types)):
                for j in range(i + 1, len(types)):
                    key = (types[i], types[j])
                    mn, mx = acc.get(key, (0, 0))
                    acc[key] = (mn + min(int(cnt[i]), int(cnt[j])),
                                mx + max(int(cnt[i]), int(cnt[j])))
        if not acc:
            return part_schema.empty_table()
        ks = sorted(acc)
        return pa.table({
            "ta": pa.array([k[0] for k in ks], pa.string()),
            "tb": pa.array([k[1] for k in ks], pa.string()),
            "smin": pa.array([acc[k][0] for k in ks], pa.int64()),
            "smax": pa.array([acc[k][1] for k in ks], pa.int64()),
        }, schema=part_schema)

    parts = _collect_raw(sorted_group_map(
        pre, ["user_id"], None, part_schema,
        block_fn=_fold)).to_pandas()
    agg = parts.groupby(["ta", "tb"]).agg(
        smin=("smin", "sum"), smax=("smax", "sum")).reset_index()
    wj = agg["smin"].values.astype(np.float64) / agg["smax"].values
    return _collect(pa.table({
        "type_a": pa.array(agg["ta"], pa.string()),
        "type_b": pa.array(agg["tb"], pa.string()),
        "sum_min": pa.array(agg["smin"].values.astype(np.int64),
                            pa.int64()),
        "sum_max": pa.array(agg["smax"].values.astype(np.int64),
                            pa.int64()),
        "wjaccard": pa.array(round6_tie_robust(wj)),
    }))




ADAMIC_ADAR_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
e AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY 1),
inc AS (SELECT u AS w, v AS nbr FROM e
        UNION ALL SELECT v AS w, u AS nbr FROM e),
wed AS (
  SELECT i1.nbr AS u, i2.nbr AS v, i1.w AS w
  FROM inc i1 JOIN inc i2 ON i2.w = i1.w AND i1.nbr < i2.nbr),
aa AS (
  SELECT wed.u AS u, wed.v AS v, COUNT(*) AS n_common,
         SUM(1.0 / LN(deg.d)) AS s
  FROM wed JOIN deg ON deg.node = wed.w
  GROUP BY 1, 2)
SELECT aa.u AS u, aa.v AS v, CAST(aa.n_common AS BIGINT) AS n_common,
       ROUND(aa.s, 6) AS adamic_adar
FROM aa LEFT JOIN e ON e.u = aa.u AND e.v = aa.v
WHERE e.u IS NULL
"""


def q_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction over the SUPPORTED part co-purchase
    graph (edges = part pairs sharing >= 2 orders — the market-basket
    support convention; the unsupported graph is hub-dense and AA over
    it is quadratic noise): for every non-adjacent candidate pair the
    score sums 1/ln(deg(w)) over common neighbors w.  Engine path: the
    supported edge list comes off the existing pair-count exchange;
    degrees merge on the driver (node-scale, the pagerank discipline)
    and broadcast as a weight vector; wedge enumeration is one
    neighbor-keyed exchange with vectorized per-run pair emission (each
    wedge row carries ONLY the packed pair key + its center's weight);
    one pair-keyed exchange sums terms; existing edges leave via the
    broadcast anti-join (edge-scale key set; the partitioned-join switch
    applies beyond the gate).  Common neighbors have deg >= 2 by
    definition, so ln(deg) never hits ln(1) = 0.  Term-sum order
    differences are absorbed by the two-step output rounding;
    ORACLE-CHECKED against the SQL wedge self-join."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.joins import anti_join_broadcast

    pairs = _copurchase_pair_counts(sf_dir)
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"k": t.filter(pc.greater_equal(t["nuv"], 2))["k"]},
            schema=_EK_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    nodes, deg = _copurchase_degrees(edges)
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64()),
                      "adamic_adar": pa.array([], pa.float64())})
    if len(nodes) == 0:
        return empty
    w_aa = np.where(deg >= 2, 1.0 / np.log(np.maximum(deg, 2)), 0.0)
    wref = ray.put((nodes, w_aa))

    inc_schema = pa.schema([("w", pa.int64()), ("nbr", pa.int64())])

    def _inc(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        u = k >> np.int64(32)
        v = k & np.int64(0xFFFFFFFF)
        return pa.table({"w": np.concatenate([u, v]),
                         "nbr": np.concatenate([v, u])},
                        schema=inc_schema)

    inc = edges.map_batches(_inc, batch_format="pyarrow",
                            zero_copy_batch=True)

    term_schema = pa.schema([("k", pa.int64()), ("s", pa.float64()),
                             ("nc", pa.int64())])

    def _wedge_terms(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return term_schema.empty_table()
        tbl = batch.sort_by([("w", "ascending"), ("nbr", "ascending")])
        w = tbl["w"].to_numpy(zero_copy_only=False)
        nb = tbl["nbr"].to_numpy(zero_copy_only=False)
        first = np.empty(len(w), dtype=bool)
        first[0] = True
        first[1:] = w[1:] != w[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(w)))
        nd, wv = ray.get(wref)
        # run-pair emission with the CENTER's weight carried per pair
        # (the _emit_run_pairs trick, plus a repeat of w per length class)
        us, vs, ws = [], [], []
        for length in np.unique(lens):
            if length < 2:
                continue
            sel = starts[lens == length]
            idx = sel[:, None] + np.arange(length)
            m = nb[idx]
            iu, ju = np.triu_indices(int(length), 1)
            us.append(m[:, iu].ravel())
            vs.append(m[:, ju].ravel())
            cw = wv[np.searchsorted(nd, w[sel])]
            ws.append(np.repeat(cw, len(iu)))
        if not us:
            return term_schema.empty_table()
        u = np.concatenate(us)
        v = np.concatenate(vs)
        weight = np.concatenate(ws)
        # block combiner: sum terms per pair before the exchange
        key = (u << np.int64(32)) | v
        order = np.argsort(key, kind="stable")
        key = key[order]
        weight = weight[order]
        kf = np.empty(len(key), dtype=bool)
        kf[0] = True
        kf[1:] = key[1:] != key[:-1]
        ks = np.nonzero(kf)[0]
        return pa.table({"k": key[ks],
                         "s": np.add.reduceat(weight, ks),
                         "nc": np.diff(np.append(ks, len(key)))
                                 .astype(np.int64)},
                        schema=term_schema)

    from ..stages.sorted_groups import sorted_group_map
    terms = sorted_group_map(
        inc, ["w"], None, term_schema, block_fn=_wedge_terms)
    scored = terms.groupby("k").aggregate(
        Sum("s", alias_name="s"), Sum("nc", alias_name="n_common"))
    cand = anti_join_broadcast(scored, "k", edges)

    def _unpack(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(k >> np.int64(32), pa.int64()),
            "v": pa.array(k & np.int64(0xFFFFFFFF), pa.int64()),
            "n_common": batch["n_common"].cast(pa.int64()),
            "adamic_adar": batch["s"].cast(pa.float64()),
        })

    return _collect(cand.map_batches(_unpack, batch_format="pyarrow",
                                     zero_copy_batch=True))


_Q3_CUTOFF_US = 883612800000000  # 1998-01-01 in epoch microseconds

SHIPPING_PRIORITY_SQL = """
WITH o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) AS orderdate_us,
         o_orderpriority
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01'
    AND o_custkey IN (SELECT c_custkey FROM customer
                      WHERE c_mktsegment = 'BUILDING')),
r AS (
  SELECT l.l_orderkey AS l_orderkey,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS rev_total
  FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY 1)
SELECT l_orderkey, orderdate_us, o_orderpriority, rev_total,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT r.l_orderkey, o.orderdate_us, o.o_orderpriority, r.rev_total,
         ROW_NUMBER() OVER (
           ORDER BY CAST(FLOOR(r.rev_total * 1e6 + 0.5) AS BIGINT) DESC,
                    r.l_orderkey) AS rn
  FROM r JOIN o ON o.o_orderkey = r.l_orderkey)
WHERE rn <= 10
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped shipping-priority top-k: unshipped revenue of
    BUILDING-segment orders placed before the cutoff, top 10 orders by
    revenue.  Engine path: the segment key set broadcasts into a
    semi-join filter on orders (no exchange); qualifying orders collect
    under collect_small's loud 2M gate and broadcast into lineitem
    (beyond the gate the documented switch is stages/joins.join_skew_safe
    — orders-after-filter is fact-scale on a real crawl); revenue sums
    per order through one keyed exchange; the global top-10 rides
    top_k_by_key's two-level partial top-k (at most 10 rows leave each
    block).  ORDERING discipline: revenue is two-step-rounded FIRST,
    scaled to exact int64 micro-units, and ranked integer-side on both
    engines (sum-order ulps can never flip the rank)."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import (attach_broadcast, collect_small,
                                semi_join_broadcast)
    from ..stages.topk import top_k_by_key

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    seg = cust.map_batches(
        lambda t: pa.table({"o_custkey": t.filter(pc.equal(
            t["c_mktsegment"], "BUILDING"))["c_custkey"]}),
        batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])

    def _ord_clean(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64())
        keep = pc.and_(pc.is_valid(ts), pc.less(ts, _Q3_CUTOFF_US))
        batch = batch.filter(keep)
        return pa.table({
            "l_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "orderdate_us": batch["o_orderdate"].cast(pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    ord_f = semi_join_broadcast(
        orders.map_batches(_ord_clean, batch_format="pyarrow",
                           zero_copy_batch=True),
        "o_custkey", seg)
    lookup = collect_small(ord_f.map_batches(
        lambda t: t.select(["l_orderkey", "orderdate_us",
                            "o_orderpriority"]),
        batch_format="pyarrow"))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def _li_rev(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64())
        keep = pc.and_(pc.is_valid(ts), pc.greater(ts, _Q3_CUTOFF_US))
        batch = batch.filter(keep)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = ep * (1.0 - dc)
        t = pa.table({"l_orderkey": batch["l_orderkey"],
                      "rev": pa.array(rev, pa.float64())})
        # block combiner before the keyed exchange
        return t.group_by(["l_orderkey"]).aggregate([("rev", "sum")]) \
                .rename_columns(["l_orderkey", "rev"])

    from ray.data.aggregate import Sum
    joined = semi_join_broadcast(
        li.map_batches(_li_rev, batch_format="pyarrow",
                       zero_copy_batch=True),
        "l_orderkey",
        pa.table({"l_orderkey": lookup["l_orderkey"]}))
    sums = joined.groupby("l_orderkey").aggregate(
        Sum("rev", alias_name="rev"))

    def _rank_prep(batch: pa.Table) -> pa.Table:
        rev = round6_tie_robust(
            batch["rev"].to_numpy(zero_copy_only=False))
        micro = np.floor(rev * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "g": pa.array(np.zeros(len(batch), np.int64)),
            "l_orderkey": batch["l_orderkey"],
            "rev_total": pa.array(rev, pa.float64()),
            "micro": pa.array(micro, pa.int64()),
        })

    ranked = top_k_by_key(
        sums.map_batches(_rank_prep, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["g"], "micro", 10, tiebreak_col="l_orderkey", descending=True)
    out = attach_broadcast(ranked, lookup, "l_orderkey",
                           ["orderdate_us", "o_orderpriority"])
    out = out.map_batches(
        lambda t: t.select(["l_orderkey", "orderdate_us",
                            "o_orderpriority", "rev_total", "rn"]),
        batch_format="pyarrow")
    return _collect(out)


REGIONAL_VOLUME_SQL = """
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS volume
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""

_Q5_LO_US = 820454400000000   # 1996-01-01 epoch-us
_Q5_HI_US = 883612800000000   # 1998-01-01 epoch-us


def q_regional_volume(sf_dir: str):
    """TPC-H Q5-shaped regional supplier volume: revenue per ASIA nation
    where the supplier and the ordering customer share the nation, over
    a two-year order window.  Engine path: a star-join flattened into
    broadcast lookups — region->nation (tiny), supplier->nationkey and
    the date-filtered orders->customer-nationkey map each collect under
    collect_small's loud gate and attach map-side (customer and orders
    are user/fact-scale on a real crawl: the documented switch is
    join_skew_safe on l_orderkey, then on o_custkey); the lineitem fact
    table STREAMS with zero exchange — per-block partial sums by
    supplier nation (25 keys) merge on the driver.  ORACLE-CHECKED
    against the 6-table SQL join."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import attach_broadcast, collect_small

    region = collect_small(rd.read_parquet(f"{sf_dir}/region.parquet"))
    asia_rk = region.filter(pc.equal(region["r_name"], "ASIA"))[
        "r_regionkey"].to_numpy(zero_copy_only=False)
    nation = collect_small(rd.read_parquet(f"{sf_dir}/nation.parquet"))
    nmask = np.isin(nation["n_regionkey"].to_numpy(zero_copy_only=False),
                    asia_rk)
    asia_keys = nation["n_nationkey"].to_numpy(
        zero_copy_only=False)[nmask]
    asia_names = nation["n_name"].to_numpy(zero_copy_only=False)[nmask]
    nm_order = np.argsort(asia_keys, kind="stable")
    asia_keys, asia_names = asia_keys[nm_order], asia_names[nm_order]

    supp = collect_small(rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]))
    smask = np.isin(supp["s_nationkey"].to_numpy(zero_copy_only=False),
                    asia_keys)
    supp_tbl = pa.table({
        "l_suppkey": supp["s_suppkey"].filter(pa.array(smask)),
        "s_nationkey": supp["s_nationkey"].filter(pa.array(smask))})

    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]))
    cmask = np.isin(cust["c_nationkey"].to_numpy(zero_copy_only=False),
                    asia_keys)
    cust_tbl = pa.table({
        "o_custkey": cust["c_custkey"].filter(pa.array(cmask)),
        "c_nationkey": cust["c_nationkey"].filter(pa.array(cmask))})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def _ord_win(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64())
        keep = pc.and_(pc.and_(pc.is_valid(ts),
                               pc.greater_equal(ts, _Q5_LO_US)),
                       pc.less(ts, _Q5_HI_US))
        batch = batch.filter(keep)
        return pa.table({"l_orderkey": batch["o_orderkey"],
                         "o_custkey": batch["o_custkey"]})

    ord_map = collect_small(attach_broadcast(
        orders.map_batches(_ord_win, batch_format="pyarrow",
                           zero_copy_batch=True),
        cust_tbl, "o_custkey", ["c_nationkey"]).map_batches(
            lambda t: t.select(["l_orderkey", "c_nationkey"]),
            batch_format="pyarrow"))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    part_schema = pa.schema([("nationkey", pa.int64()),
                             ("rev", pa.float64())])
    fact = attach_broadcast(
        attach_broadcast(li, ord_map, "l_orderkey", ["c_nationkey"]),
        supp_tbl, "l_suppkey", ["s_nationkey"])

    def _partial(batch: pa.Table) -> pa.Table:
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        sn = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        m = cn == sn
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        sn = sn[m]
        rev = ep * (1.0 - dc)
        order = np.argsort(sn, kind="stable")
        sn, rev = sn[order], rev[order]
        if not len(sn):
            return part_schema.empty_table()
        first = np.empty(len(sn), dtype=bool)
        first[0] = True
        first[1:] = sn[1:] != sn[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({"nationkey": sn[ks],
                         "rev": np.add.reduceat(rev, ks)},
                        schema=part_schema)

    parts = _collect_raw(fact.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True))
    nk = parts["nationkey"].to_numpy(zero_copy_only=False)
    rv = parts["rev"].to_numpy(zero_copy_only=False)
    total = np.zeros(len(asia_keys), dtype=np.float64)
    np.add.at(total, np.searchsorted(asia_keys, nk), rv)
    present = np.zeros(len(asia_keys), dtype=bool)
    present[np.searchsorted(asia_keys, nk)] = True
    return _collect(pa.table({
        "nation": pa.array(asia_names[present]),
        "volume": pa.array(round6_tie_robust(total[present]),
                            pa.float64()),
    }))


GINI_STUMP_SQL = """
WITH d AS (
  SELECT LEAST(CAST(LENGTH(text) // 16 AS BIGINT), 63) AS b,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
pb AS (SELECT b, COUNT(*) AS n, SUM(y) AS pos FROM d GROUP BY 1),
cum AS (
  SELECT b,
         SUM(n) OVER (ORDER BY b) AS nl,
         SUM(pos) OVER (ORDER BY b) AS pl,
         (SELECT SUM(n) FROM pb) AS nt,
         (SELECT SUM(pos) FROM pb) AS pt
  FROM pb),
sc AS (
  SELECT b, nl, nt - nl AS nr, pl, pt - pl AS pr,
         (pl * pl + (nl - pl) * (nl - pl)) * 1.0 / nl
           + ((pt - pl) * (pt - pl)
              + ((nt - nl) - (pt - pl)) * ((nt - nl) - (pt - pl)))
             * 1.0 / (nt - nl) AS h,
         nt
  FROM cum WHERE nl < nt)
SELECT CAST((b + 1) * 16 AS BIGINT) AS threshold,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       CAST(pl AS BIGINT) AS pos_left, CAST(pr AS BIGINT) AS pos_right,
       ROUND((nt - h) / nt, 6) AS gini
FROM sc ORDER BY h DESC, b LIMIT 1
"""


def q_gini_stump(sf_dir: str):
    """Gini decision stump (the feature-binning split a quality
    classifier bootstraps from): best length threshold separating
    English from non-English docs by weighted Gini impurity, over 64
    fixed-width length bins (bounded candidate set — scale-safe where
    per-distinct-value candidates are not).  Engine path: per-block
    (bin, count, pos) partials stream to a driver fold (64 keys x
    blocks, no exchange at all); the split scan is a cumsum over the
    sorted bins.  PARITY: the score h = sum-of-squares/side is computed
    as exact-int numerators converted to double then divided —
    bit-identical in DuckDB and numpy — so the argmax needs no rounding
    guard; tie-break on the lower bin."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "lang"])
    part_schema = pa.schema([("b", pa.int64()), ("n", pa.int64()),
                             ("pos", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["text"]),
                                     pc.is_valid(batch["lang"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        ln = pc.utf8_length(batch["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = np.minimum(ln // 16, 63)
        y = pc.equal(batch["lang"], "en").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(b, kind="stable")
        b, y = b[order], y[order]
        first = np.empty(len(b), dtype=bool)
        first[0] = True
        first[1:] = b[1:] != b[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({"b": b[ks],
                         "n": np.diff(np.append(ks, len(b)))
                                .astype(np.int64),
                         "pos": np.add.reduceat(y, ks)},
                        schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True))
    bb = parts["b"].to_numpy(zero_copy_only=False)
    nn = parts["n"].to_numpy(zero_copy_only=False)
    pp = parts["pos"].to_numpy(zero_copy_only=False)
    bins = np.zeros(64, dtype=np.int64)
    poss = np.zeros(64, dtype=np.int64)
    np.add.at(bins, bb, nn)
    np.add.at(poss, bb, pp)
    present = bins > 0
    bvals = np.nonzero(present)[0].astype(np.int64)
    nl = np.cumsum(bins[present])
    pl = np.cumsum(poss[present])
    nt, pt = int(nl[-1]), int(pl[-1])
    cand = nl < nt
    bvals, nl, pl = bvals[cand], nl[cand], pl[cand]
    nr, pr = nt - nl, pt - pl
    ql, qr = nl - pl, nr - pr
    h = (pl * pl + ql * ql).astype(np.float64) / nl.astype(np.float64) \
        + (pr * pr + qr * qr).astype(np.float64) / nr.astype(np.float64)
    best = np.lexsort((bvals, -h))[0]
    gini = (float(nt) - h[best]) / float(nt)
    return _collect(pa.table({
        "threshold": pa.array([(int(bvals[best]) + 1) * 16], pa.int64()),
        "n_left": pa.array([int(nl[best])], pa.int64()),
        "n_right": pa.array([int(nr[best])], pa.int64()),
        "pos_left": pa.array([int(pl[best])], pa.int64()),
        "pos_right": pa.array([int(pr[best])], pa.int64()),
        "gini": pa.array([gini], pa.float64()),
    }))




KENDALL_TAU_SQL = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t, CAST(value AS DOUBLE) AS v,
         event_id
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL),
p AS (
  SELECT a.event_type AS event_type,
         SUM(CASE WHEN (a.t < b.t AND a.v < b.v)
                    OR (a.t > b.t AND a.v > b.v) THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN (a.t < b.t AND a.v > b.v)
                    OR (a.t > b.t AND a.v < b.v) THEN 1 ELSE 0 END) AS d
  FROM e a JOIN e b
    ON b.event_type = a.event_type AND a.event_id < b.event_id
  GROUP BY 1),
n AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1),
tx AS (
  SELECT event_type, SUM(m * (m - 1) / 2) AS xtie
  FROM (SELECT event_type, t, COUNT(*) AS m FROM e GROUP BY 1, 2)
  GROUP BY 1),
ty AS (
  SELECT event_type, SUM(m * (m - 1) / 2) AS ytie
  FROM (SELECT event_type, v, COUNT(*) AS m FROM e GROUP BY 1, 2)
  GROUP BY 1)
SELECT n.event_type AS event_type, CAST(n.n AS BIGINT) AS n,
       CAST(p.c AS BIGINT) AS concordant,
       CAST(p.d AS BIGINT) AS discordant,
       ROUND((p.c - p.d)
             / SQRT((n.n * (n.n - 1) / 2 - tx.xtie)
                    * (n.n * (n.n - 1) / 2 - ty.ytie)), 6) AS tau_b
FROM n JOIN p USING (event_type) JOIN tx USING (event_type)
       JOIN ty USING (event_type)
"""


def _count_inversions(a: np.ndarray):
    """Strict inversions (pairs i<j with a[i] > a[j]) by vectorized
    merge counting — O(n log^2 n), no Python per-element loop."""
    n = len(a)
    if n < 2:
        return np.sort(a), 0
    left, cl = _count_inversions(a[:n // 2])
    right, cr = _count_inversions(a[n // 2:])
    # elements of `left` strictly greater than each right element
    idx = np.searchsorted(left, right, side="right")
    cross = int((len(left) - idx).sum())
    merged = np.concatenate([left, right])
    merged.sort()
    return merged, cl + cr + cross


def _tie_pairs(sorted_vals) -> int:
    """sum m*(m-1)/2 over runs of equal values (input pre-sorted)."""
    n = len(sorted_vals)
    if n == 0:
        return 0
    first = np.empty(n, dtype=bool)
    first[0] = True
    if sorted_vals.ndim == 1:
        first[1:] = sorted_vals[1:] != sorted_vals[:-1]
    else:
        first[1:] = (sorted_vals[1:] != sorted_vals[:-1]).any(axis=1)
    runs = np.diff(np.append(np.nonzero(first)[0], n))
    return int((runs * (runs - 1) // 2).sum())


def q_kendall_tau(sf_dir: str):
    """Kendall tau-b rank correlation of value vs time per event type —
    the tie-aware monotone-trend test (Mann-Kendall's core statistic).
    Engine path: one event_type-keyed exchange co-locates each series;
    the per-group kernel is Knight's O(n log n) method (sort by (t, v),
    count strict y-inversions via vectorized merge counting) instead of
    the oracle's O(n^2) pair join — the whole point at crawl scale.
    All counts are exact integers; tau_b divides the exact (c - d) by
    sqrt of the exact tie-adjusted pair products (converted to double
    once, mirroring the SQL), so no rounding guard is needed;
    ORACLE-CHECKED against the brute-force pair enumeration."""
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value",
                                  "event_id"])
    out_schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("concordant", pa.int64()), ("discordant", pa.int64()),
        ("tau_b", pa.float64())])

    def _group(group: pa.Table) -> pa.Table:
        t = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = group["value"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        order = np.lexsort((v, t))
        t, v = t[order], v[order]
        n = len(t)
        n0 = n * (n - 1) // 2
        xtie = _tie_pairs(t)
        ytie = _tie_pairs(np.sort(v))
        xytie = _tie_pairs(np.stack([t, v.view(np.int64)], axis=1))
        _, dis = _count_inversions(v)
        cmd = n0 - xtie - ytie + xytie - 2 * dis   # c - d, exact
        both = n0 - xtie - ytie + xytie             # untied pairs
        c = (both + cmd) // 2
        d = (both - cmd) // 2
        denom = np.sqrt(float((n0 - xtie) * (n0 - ytie)))
        tau = float(cmd) / denom if denom > 0 else float("nan")
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()]),
            "n": pa.array([n], pa.int64()),
            "concordant": pa.array([c], pa.int64()),
            "discordant": pa.array([d], pa.int64()),
            "tau_b": pa.array([tau], pa.float64()),
        }, schema=out_schema)

    return _collect(sorted_group_map(ds, ["event_type"], _group,
                                     out_schema))


MUTUAL_INFORMATION_SQL = """
WITH d AS (
  SELECT lang, source FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL),
cj AS (SELECT lang, source, COUNT(*) AS nij FROM d GROUP BY 1, 2),
cl AS (SELECT lang, SUM(nij) AS ni FROM cj GROUP BY 1),
cs AS (SELECT source, SUM(nij) AS nj FROM cj GROUP BY 1),
nt AS (SELECT SUM(nij) AS n FROM cj),
mi AS (
  SELECT SUM((cj.nij * 1.0 / nt.n)
             * LN((cj.nij * nt.n) * 1.0 / (cl.ni * cs.nj))) AS mi
  FROM cj JOIN cl USING (lang) JOIN cs USING (source) CROSS JOIN nt),
hl AS (SELECT -SUM((ni * 1.0 / nt.n) * LN(ni * 1.0 / nt.n)) AS h
       FROM cl CROSS JOIN nt),
hs AS (SELECT -SUM((nj * 1.0 / nt.n) * LN(nj * 1.0 / nt.n)) AS h
       FROM cs CROSS JOIN nt)
SELECT ROUND(mi.mi, 6) AS mi, ROUND(hl.h, 6) AS h_lang,
       ROUND(hs.h, 6) AS h_source,
       ROUND(mi.mi / SQRT(hl.h * hs.h), 6) AS nmi
FROM mi CROSS JOIN hl CROSS JOIN hs
"""


def q_mutual_information(sf_dir: str):
    """Discrete mutual information between document language and source
    (the field-dependence audit a corpus-mixing pipeline runs before
    stratifying): MI, the two marginal entropies, and normalized MI
    (MI / sqrt(H_lang * H_source)).  Engine path: per-block contingency
    partials fold on the driver (langs x sources is category-scale,
    bounded) — the fact table streams with no exchange; every cell term
    divides exact integer products converted to double (bit-identical
    to the SQL), and term-sum order differences are absorbed by the
    two-step output rounding.  ORACLE-CHECKED."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    part_schema = pa.schema([("lang", pa.string()),
                             ("source", pa.string()),
                             ("nij", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["lang"]),
                                     pc.is_valid(batch["source"])))
        g = batch.group_by(["lang", "source"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "source", "nij"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True))
    df = parts.to_pandas().groupby(["lang", "source"],
                                   as_index=False)["nij"].sum()
    nij = df["nij"].values.astype(np.int64)
    ntot = int(nij.sum())
    ni = df.groupby("lang")["nij"].transform("sum").values.astype(
        np.int64)
    nj = df.groupby("source")["nij"].transform("sum").values.astype(
        np.int64)
    mi = float(np.sum((nij * 1.0 / ntot)
                      * np.log((nij * ntot) * 1.0 / (ni * nj))))
    li = df.groupby("lang")["nij"].sum().values.astype(np.int64)
    si = df.groupby("source")["nij"].sum().values.astype(np.int64)
    hl = float(-np.sum((li * 1.0 / ntot) * np.log(li * 1.0 / ntot)))
    hs = float(-np.sum((si * 1.0 / ntot) * np.log(si * 1.0 / ntot)))
    return _collect(pa.table({
        "mi": pa.array([mi], pa.float64()),
        "h_lang": pa.array([hl], pa.float64()),
        "h_source": pa.array([hs], pa.float64()),
        "nmi": pa.array([mi / np.sqrt(hl * hs)], pa.float64()),
    }))


KAPLAN_MEIER_SQL = """
WITH RECURSIVE e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
u AS (SELECT user_id, MIN(day) AS fd, MAX(day) AS ld FROM e GROUP BY 1),
g AS (SELECT MAX(ld) AS gmax FROM u),
lt AS (
  SELECT user_id, ld - fd AS lifetime,
         CASE WHEN ld = (SELECT gmax FROM g) THEN 1 ELSE 0 END
           AS censored
  FROM u),
days AS (
  SELECT UNNEST(range(0, CAST((SELECT MAX(lifetime) FROM lt) AS BIGINT)
                         + 1)) AS day),
cnt AS (
  SELECT d.day AS day,
         (SELECT COUNT(*) FROM lt WHERE lifetime >= d.day) AS at_risk,
         (SELECT COUNT(*) FROM lt
          WHERE lifetime = d.day AND censored = 0) AS deaths
  FROM days d),
s(day, at_risk, deaths, surv) AS (
  SELECT day, at_risk, deaths, 1.0 - deaths * 1.0 / at_risk
  FROM cnt WHERE day = 0
  UNION ALL
  SELECT c.day, c.at_risk, c.deaths,
         s.surv * (1.0 - c.deaths * 1.0 / c.at_risk)
  FROM cnt c JOIN s ON c.day = s.day + 1)
SELECT CAST(day AS BIGINT) AS day, CAST(at_risk AS BIGINT) AS at_risk,
       CAST(deaths AS BIGINT) AS deaths, ROUND(surv, 6) AS survival
FROM s
"""


def q_kaplan_meier(sf_dir: str):
    """Kaplan-Meier survival curve of user activity lifetime (days from
    first to last event; users whose last event falls on the corpus's
    final day are right-censored) — the churn/retention estimator.
    Engine path: per-user (first, last) day via one user-keyed
    aggregate exchange; lifetimes reduce to per-(lifetime, censored)
    counts (day-scale, bounded) that fold on the driver; the survival
    product is the sequential cumprod over exact factors
    1 - deaths/at_risk — each factor divides exact ints (bit-identical
    to the recursive-CTE oracle) and np.cumprod multiplies in the same
    left-to-right order as the recursion, so the doubles match
    step-for-step (the ewma_daily argument).  ORACLE-CHECKED."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _days(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["user_id"]),
                                     pc.is_valid(batch["ts"])))
        day = pc.divide(batch["ts"].cast(pa.int64()), 86400000000)
        return pa.table({"user_id": batch["user_id"], "day": day})

    udays = ds.map_batches(_days, batch_format="pyarrow",
                           zero_copy_batch=True)
    per_user = udays.groupby("user_id").aggregate(
        Min("day", alias_name="fd"), Max("day", alias_name="ld"))

    lt_schema = pa.schema([("lifetime", pa.int64()),
                           ("censored", pa.int64()),
                           ("n", pa.int64())])

    def _lt_partial(batch: pa.Table) -> pa.Table:
        fd = batch["fd"].to_numpy(zero_copy_only=False)
        ld = batch["ld"].to_numpy(zero_copy_only=False)
        return pa.table({"lifetime": ld - fd, "ld": ld,
                         "user_id": batch["user_id"]})

    lt = per_user.map_batches(_lt_partial, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    gmax = int(lt.max("ld"))

    def _counts(batch: pa.Table) -> pa.Table:
        life = batch["lifetime"].to_numpy(zero_copy_only=False)
        cen = (batch["ld"].to_numpy(zero_copy_only=False)
               == gmax).astype(np.int64)
        key = life * 2 + cen
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"lifetime": uniq // 2, "censored": uniq % 2,
                         "n": cnt.astype(np.int64)}, schema=lt_schema)

    parts = _collect_raw(lt.map_batches(
        _counts, batch_format="pyarrow", zero_copy_batch=True))
    life = parts["lifetime"].to_numpy(zero_copy_only=False)
    cen = parts["censored"].to_numpy(zero_copy_only=False)
    n = parts["n"].to_numpy(zero_copy_only=False)
    maxlt = int(life.max())
    deaths = np.zeros(maxlt + 1, dtype=np.int64)
    totals = np.zeros(maxlt + 1, dtype=np.int64)
    np.add.at(deaths, life[cen == 0], n[cen == 0])
    np.add.at(totals, life, n)
    # at_risk[d] = users with lifetime >= d (suffix sum)
    at_risk = np.cumsum(totals[::-1])[::-1]
    factors = 1.0 - deaths.astype(np.float64) / at_risk.astype(
        np.float64)
    surv = np.cumprod(factors)
    return _collect(pa.table({
        "day": pa.array(np.arange(maxlt + 1, dtype=np.int64)),
        "at_risk": pa.array(at_risk, pa.int64()),
        "deaths": pa.array(deaths, pa.int64()),
        "survival": pa.array(surv, pa.float64()),
    }))


# Horner weights for the 8-char ascii prefix hash (31^7 .. 31^0)
_FH_POWS = [27512614111, 887503681, 28629151, 923521, 29791, 961, 31, 1]
_FH_BUCKETS = 256

FEATURE_HASHING_SQL = f"""
WITH w AS (
  SELECT UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
           AS term
  FROM documents WHERE text IS NOT NULL),
terms AS (SELECT DISTINCT term FROM w WHERE term <> ''),
hb AS (
  SELECT term,
         ({" + ".join(
             f"CAST(COALESCE(ascii(substr(term, {i + 1}, 1)), 0)"
             f" AS BIGINT) * {p}" for i, p in enumerate(_FH_POWS))})
           % {_FH_BUCKETS} AS bucket
  FROM terms),
loads AS (SELECT bucket, COUNT(*) AS load FROM hb GROUP BY 1),
all_b AS (
  SELECT r.range AS bucket, COALESCE(l.load, 0) AS load
  FROM range({_FH_BUCKETS}) r LEFT JOIN loads l ON l.bucket = r.range)
SELECT CAST(load AS BIGINT) AS load, COUNT(*) AS n_buckets
FROM all_b GROUP BY 1
"""


def q_feature_hashing(sf_dir: str):
    """Hashing-trick collision audit (the dimensionality check before
    hashed bag-of-words features): every distinct corpus term hashes to
    one of 256 buckets via an 8-char ascii-prefix Horner polynomial
    (exact-integer, SQL-mirrorable — tokens are [a-z0-9]+ so the ascii
    prefix is well-defined); the result is the bucket-load histogram
    (how many buckets hold k distinct terms, zero-load buckets
    included).  Engine path: rides the wordcount combiner's distinct
    term stream (vocab-scale, Heaps-bounded); hashing is one vectorized
    byte-matrix fold per block (terms -> fixed-width S8 -> uint8
    matrix, no per-term Python); 256-wide partials fold on the driver.
    ORACLE-CHECKED against the unrolled-ascii SQL."""
    import ray.data as rd

    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    terms = term_counts(ds, [], text_col="text")
    part_schema = pa.schema([("bucket", pa.int64()),
                             ("n_terms", pa.int64())])
    pows = np.array(_FH_POWS, dtype=np.uint64)

    def _bucket_partial(batch: pa.Table) -> pa.Table:
        t = batch["term"].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return part_schema.empty_table()
        s8 = t.astype("S8")  # ascii tokens: utf-8 == bytes, \0-padded
        codes = np.frombuffer(s8.tobytes(), dtype=np.uint8).reshape(
            -1, 8).astype(np.uint64)
        h = codes @ pows
        b = (h % np.uint64(_FH_BUCKETS)).astype(np.int64)
        cnt = np.bincount(b, minlength=_FH_BUCKETS).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": nz.astype(np.int64),
                         "n_terms": cnt[nz]}, schema=part_schema)

    parts = _collect_raw(terms.map_batches(
        _bucket_partial, batch_format="pyarrow", zero_copy_batch=True))
    loads = np.zeros(_FH_BUCKETS, dtype=np.int64)
    np.add.at(loads, parts["bucket"].to_numpy(zero_copy_only=False),
              parts["n_terms"].to_numpy(zero_copy_only=False))
    uniq, cnt = np.unique(loads, return_counts=True)
    return _collect(pa.table({
        "load": pa.array(uniq, pa.int64()),
        "n_buckets": pa.array(cnt.astype(np.int64), pa.int64()),
    }))




CLUSTERING_COEF_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
e AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY 1),
inc AS (SELECT u AS w, v AS nbr FROM e
        UNION ALL SELECT v AS w, u AS nbr FROM e),
wed AS (
  SELECT i1.w AS x, i1.nbr AS u, i2.nbr AS v
  FROM inc i1 JOIN inc i2 ON i2.w = i1.w AND i1.nbr < i2.nbr),
tri AS (
  SELECT x, COUNT(*) AS triangles
  FROM wed JOIN e ON e.u = wed.u AND e.v = wed.v GROUP BY 1)
SELECT d.node AS node, CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
       ROUND(COALESCE(t.triangles, 0) * 2.0 / (d.d * (d.d - 1)), 6)
         AS clustering
FROM deg d LEFT JOIN tri t ON t.x = d.node
WHERE d.d >= 2
"""


def q_clustering_coef(sf_dir: str):
    """Local clustering coefficient per node of the supported part
    co-purchase graph (triangles through the node / C(deg, 2) — the
    community-density feature next to [degree, pagerank] in any graph
    feature table).  Engine path: shares the supported-edge derivation
    with adamic_adar; the sorted edge-key array broadcasts ONCE and the
    wedge stage (one neighbor-keyed exchange, vectorized run-pair
    emission) closes each wedge against it with a searchsorted
    membership probe — per-center triangle counts leave the block
    pre-combined, one node-keyed fold on the driver (node-scale, the
    pagerank discipline).  coefficient = exact-int 2*tri / d(d-1),
    bit-identical both engines.  ORACLE-CHECKED."""
    import ray

    from ..stages.sorted_groups import sorted_group_map

    pairs = _copurchase_pair_counts(sf_dir)
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"k": t.filter(pc.greater_equal(t["nuv"], 2))["k"]},
            schema=_EK_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    nodes, deg = _copurchase_degrees(edges)
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "degree": pa.array([], pa.int64()),
                      "triangles": pa.array([], pa.int64()),
                      "clustering": pa.array([], pa.float64())})
    if len(nodes) == 0:
        return empty
    ek = np.sort(_collect_raw(edges)["k"].to_numpy(
        zero_copy_only=False))
    ekref = ray.put(ek)

    inc_schema = pa.schema([("w", pa.int64()), ("nbr", pa.int64())])

    def _inc(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        u = k >> np.int64(32)
        v = k & np.int64(0xFFFFFFFF)
        return pa.table({"w": np.concatenate([u, v]),
                         "nbr": np.concatenate([v, u])},
                        schema=inc_schema)

    inc = edges.map_batches(_inc, batch_format="pyarrow",
                            zero_copy_batch=True)
    tri_schema = pa.schema([("node", pa.int64()),
                            ("tri", pa.int64())])

    def _close_wedges(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return tri_schema.empty_table()
        tbl = batch.sort_by([("w", "ascending"), ("nbr", "ascending")])
        w = tbl["w"].to_numpy(zero_copy_only=False)
        nb = tbl["nbr"].to_numpy(zero_copy_only=False)
        first = np.empty(len(w), dtype=bool)
        first[0] = True
        first[1:] = w[1:] != w[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(w)))
        ekeys = ray.get(ekref)
        cs, ts = [], []
        for length in np.unique(lens):
            if length < 2:
                continue
            sel = starts[lens == length]
            idx = sel[:, None] + np.arange(length)
            m = nb[idx]
            iu, ju = np.triu_indices(int(length), 1)
            pk = (m[:, iu].astype(np.int64) << np.int64(32)) \
                 | m[:, ju].astype(np.int64)
            pos = np.minimum(np.searchsorted(ekeys, pk),
                             len(ekeys) - 1)
            closed = (ekeys[pos] == pk).sum(axis=1)
            cs.append(w[sel])
            ts.append(closed.astype(np.int64))
        if not cs:
            return tri_schema.empty_table()
        return pa.table({"node": np.concatenate(cs),
                         "tri": np.concatenate(ts)},
                        schema=tri_schema)

    parts = _collect_raw(sorted_group_map(
        inc, ["w"], None, tri_schema, block_fn=_close_wedges))
    tri = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(tri, np.searchsorted(
        nodes, parts["node"].to_numpy(zero_copy_only=False)),
        parts["tri"].to_numpy(zero_copy_only=False))
    keep = deg >= 2
    coeff = (tri[keep] * 2.0) / (deg[keep] * (deg[keep] - 1))
    return _collect(pa.table({
        "node": pa.array(nodes[keep], pa.int64()),
        "degree": pa.array(deg[keep], pa.int64()),
        "triangles": pa.array(tri[keep], pa.int64()),
        "clustering": pa.array(coeff, pa.float64()),
    }))


ANOVA_EVENTS_SQL = """
WITH e AS (
  SELECT event_type AS grp, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL),
g AS (SELECT grp, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
      FROM e GROUP BY 1),
tot AS (SELECT SUM(n) AS n, SUM(s) AS s,
               CAST(COUNT(*) AS BIGINT) AS k FROM g),
parts AS (
  SELECT (SELECT SUM(s * s / n) FROM g) - tot.s * tot.s / tot.n AS ssb,
         (SELECT SUM(ss - s * s / n) FROM g) AS ssw,
         tot.k AS k, tot.n AS n
  FROM tot)
SELECT k, CAST(n AS BIGINT) AS n, ROUND(ssb, 6) AS ssb,
       ROUND(ssw, 6) AS ssw,
       ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat
FROM parts
"""


def q_anova_events(sf_dir: str):
    """One-way ANOVA F-test of event value across event types (the
    does-this-category-matter screen before any per-type modeling):
    between/within sums of squares via the algebraic identity
    SSW = sum(ss_g - s_g^2/n_g), SSB = sum(s_g^2/n_g) - s^2/n over
    per-group (n, sum, sum-of-squares) — the moments discipline: each
    block emits 3-wide partials, one category-keyed fold on the driver,
    the fact table never shuffles.  The oracle computes the SAME
    identity so both engines share every operand; remaining term-order
    ulps are absorbed by the two-step output rounding.  ORACLE-CHECKED."""
    import ray.data as rd

    ds = _events_nonnull(sf_dir, ["event_type", "value"])
    part_schema = pa.schema([("grp", pa.string()), ("n", pa.int64()),
                             ("s", pa.float64()), ("ss", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = g[1:] != g[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({
            "grp": g[ks],
            "n": np.diff(np.append(ks, len(g))).astype(np.int64),
            "s": np.add.reduceat(v, ks),
            "ss": np.add.reduceat(v * v, ks),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    g = parts.groupby("grp").agg(n=("n", "sum"), s=("s", "sum"),
                                 ss=("ss", "sum"))
    n = int(g.n.sum())
    s = float(g.s.sum())
    k = len(g)
    ssb = float((g.s * g.s / g.n).sum()) - s * s / n
    ssw = float((g.ss - g.s * g.s / g.n).sum())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return _collect(pa.table({
        "k": pa.array([k], pa.int64()),
        "n": pa.array([n], pa.int64()),
        "ssb": pa.array([ssb], pa.float64()),
        "ssw": pa.array([ssw], pa.float64()),
        "f_stat": pa.array([f], pa.float64()),
    }))


NTILE_STATS_SQL = """
WITH e AS (
  SELECT event_id, CAST(value AS DOUBLE) AS v FROM events
  WHERE value IS NOT NULL AND event_id IS NOT NULL),
t AS (SELECT v, NTILE(10) OVER (ORDER BY v, event_id) AS tile FROM e)
SELECT CAST(tile AS BIGINT) AS tile, COUNT(*) AS n,
       ROUND(MIN(v), 6) AS vmin, ROUND(MAX(v), 6) AS vmax,
       ROUND(SUM(v) / COUNT(*), 6) AS vmean
FROM t GROUP BY 1
"""


def q_ntile_stats(sf_dir: str):
    """Global equi-depth decile stats of event value (the quantile
    binning every feature-engineering pass runs): NTILE(10) over
    (value, event_id) — first n%10 tiles one row larger, the SQL
    convention — with per-tile count/min/max/mean.  Engine path: rank =
    one distributed sort + the prefix-scan block offsets
    (stages/scan.prefix_sum, the epoch_shuffle machinery); the
    rank->tile map is closed-form integer arithmetic per block (no
    second pass), and the 10-key aggregate folds on the driver from
    block partials.  ORACLE-CHECKED against the window-function SQL."""
    import ray.data as rd

    from ..stages.scan import prefix_sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def _clean(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["event_id"]),
                                     pc.is_valid(batch["value"])))
        return pa.table({
            "event_id": batch["event_id"],
            "v": batch["value"].cast(pa.float64()),
            "one": pa.array(np.ones(len(batch), np.int64)),
        })

    keyed = ds.map_batches(_clean, batch_format="pyarrow",
                           zero_copy_batch=True)
    ranked = prefix_sum(keyed, ["v", "event_id"], "one",
                        out_col="rk").materialize()
    n = ranked.count()
    q, r = divmod(n, 10)
    part_schema = pa.schema([
        ("tile", pa.int64()), ("n", pa.int64()),
        ("vmin", pa.float64()), ("vmax", pa.float64()),
        ("vsum", pa.float64())])

    def _tile_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        rk = batch["rk"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        big = r * (q + 1)
        tile = np.where(rk < big, rk // max(q + 1, 1) + 1,
                        r + (rk - big) // max(q, 1) + 1)
        order = np.argsort(tile, kind="stable")
        tile, v = tile[order], v[order]
        first = np.empty(len(tile), dtype=bool)
        first[0] = True
        first[1:] = tile[1:] != tile[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({
            "tile": tile[ks],
            "n": np.diff(np.append(ks, len(tile))).astype(np.int64),
            "vmin": np.minimum.reduceat(v, ks),
            "vmax": np.maximum.reduceat(v, ks),
            "vsum": np.add.reduceat(v, ks),
        }, schema=part_schema)

    parts = _collect_raw(ranked.map_batches(
        _tile_partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    g = parts.groupby("tile").agg(n=("n", "sum"), vmin=("vmin", "min"),
                                  vmax=("vmax", "max"),
                                  vsum=("vsum", "sum")).reset_index()
    return _collect(pa.table({
        "tile": pa.array(g.tile.values.astype(np.int64)),
        "n": pa.array(g.n.values.astype(np.int64)),
        "vmin": pa.array(g.vmin.values, pa.float64()),
        "vmax": pa.array(g.vmax.values, pa.float64()),
        "vmean": pa.array(g.vsum.values / g.n.values, pa.float64()),
    }))


HITS_SCORES_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
a1 AS (SELECT p, COUNT(*) AS a1 FROM op GROUP BY 1),
h1 AS (SELECT o, SUM(a1.a1) AS h1 FROM op JOIN a1 USING (p)
       GROUP BY o),
a2 AS (SELECT p, SUM(h1.h1) AS a2 FROM op JOIN h1 USING (o)
       GROUP BY p),
mx AS (SELECT MAX(a2) AS m FROM a2)
SELECT a2.p AS part, CAST(a1.a1 AS BIGINT) AS degree,
       CAST(a2.a2 AS BIGINT) AS authority_raw,
       ROUND(a2.a2 * 1.0 / mx.m, 6) AS authority
FROM a2 JOIN a1 USING (p) CROSS JOIN mx
"""


def q_hits_scores(sf_dir: str):
    """HITS authority scores (2 fixed iterations, hub init 1) over the
    bipartite order-part incidence — the other classic link-analysis
    ranking next to pagerank_parts.  UNNORMALIZED inner iterations keep
    every intermediate an exact INTEGER (a1 = part degree, h1 = sum of
    neighbor degrees, a2 = sum of hub scores), so there is no float
    drift to round away; the single normalization (a2 / max a2)
    happens once at the end on exact ints.  Engine path: ONE keyed
    exchange total — the order-keyed distinct leaves every block
    holding whole order groups, so pass 1 folds part degrees from
    block partials (part-scale, driver merge), and pass 2 broadcasts
    a1, computes each order's hub score IN-BLOCK (groups are whole)
    and emits per-part authority partials that fold on the driver; the
    hub table never collects and never re-shuffles.  ORACLE-CHECKED."""
    import ray

    from ..stages.sorted_groups import sorted_group_map

    op = _copurchase_order_parts(sf_dir)

    def _dedupe(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    op = op.map_batches(_dedupe, batch_format="pyarrow",
                        zero_copy_batch=True)
    # finish the cross-block distinct inside one keyed exchange; blocks
    # downstream hold WHOLE order groups (the sorted_group_map contract)
    op_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("l_partkey", pa.int64())])

    def _run_distinct(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return op_schema.empty_table()
        t = batch.sort_by([("l_orderkey", "ascending"),
                           ("l_partkey", "ascending")])
        o = t["l_orderkey"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(o), dtype=bool)
        keep[0] = True
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        return pa.table({"l_orderkey": o[keep], "l_partkey": p[keep]},
                        schema=op_schema)

    op = sorted_group_map(op, ["l_orderkey"], None, op_schema,
                          block_fn=_run_distinct).materialize()

    deg_schema = pa.schema([("l_partkey", pa.int64()),
                            ("a1", pa.int64())])

    def _deg_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_partkey"]).aggregate([([], "count_all")])
        return g.rename_columns(["l_partkey", "a1"]).cast(deg_schema)

    a1_df = _collect_raw(op.map_batches(
        _deg_partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas().groupby(
        "l_partkey", as_index=False)["a1"].sum()
    a1k = a1_df.l_partkey.values.astype(np.int64)
    a1v = a1_df.a1.values.astype(np.int64)
    order = np.argsort(a1k, kind="stable")
    a1k, a1v = a1k[order], a1v[order]
    a1ref = ray.put((a1k, a1v))

    a2_schema = pa.schema([("l_partkey", pa.int64()),
                           ("a2", pa.int64())])

    def _a2_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return a2_schema.empty_table()
        ks, vs = ray.get(a1ref)
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        a1p = vs[np.searchsorted(ks, p)]
        first = np.empty(len(o), dtype=bool)
        first[0] = True
        first[1:] = o[1:] != o[:-1]
        run = np.cumsum(first) - 1
        starts = np.nonzero(first)[0]
        h1 = np.add.reduceat(a1p, starts)      # whole groups per block
        contrib = h1[run]                       # h1 of this row's order
        po = np.argsort(p, kind="stable")
        ps, cs = p[po], contrib[po]
        pf = np.empty(len(ps), dtype=bool)
        pf[0] = True
        pf[1:] = ps[1:] != ps[:-1]
        ks2 = np.nonzero(pf)[0]
        return pa.table({"l_partkey": ps[ks2],
                         "a2": np.add.reduceat(cs, ks2)},
                        schema=a2_schema)

    # batch_size=None: whole blocks — block boundaries are group-aligned
    # by the sorted exchange above, a sliced default batch would not be
    a2_df = _collect_raw(op.map_batches(
        _a2_partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)).to_pandas().groupby(
        "l_partkey", as_index=False)["a2"].sum()
    p = a2_df.l_partkey.values.astype(np.int64)
    a2v = a2_df.a2.values.astype(np.int64)
    a1_out = a1v[np.searchsorted(a1k, p)]
    m = int(a2v.max()) if len(a2v) else 1
    return _collect(pa.table({
        "part": pa.array(p, pa.int64()),
        "degree": pa.array(a1_out, pa.int64()),
        "authority_raw": pa.array(a2v, pa.int64()),
        "authority": pa.array(a2v * 1.0 / m, pa.float64()),
    }))




PYTH_MEANS_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(SUM(v) / COUNT(*), 6) AS mean_arith,
       ROUND(EXP(SUM(LN(v)) / COUNT(*)), 6) AS mean_geo,
       ROUND(COUNT(*) / SUM(1.0 / v), 6) AS mean_harm
FROM (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND value > 0)
GROUP BY 1
"""


def q_pyth_means(sf_dir: str):
    """The three Pythagorean means per event type (arithmetic,
    geometric, harmonic — the robust-center triple for skewed rate
    data).  All three are mergeable moments: each block emits
    (n, sum v, sum ln v, sum 1/v) partials, one category-scale driver
    fold, no exchange.  ln/exp ride the shared libm (the doc_logprob
    precedent) and term-sum order differences are absorbed by the
    two-step output rounding; positivity is part of the operator
    contract (v > 0 filter on both sides).  ORACLE-CHECKED."""
    import ray.data as rd

    ds = _events_nonnull(sf_dir, ["event_type", "value"])
    part_schema = pa.schema([("grp", pa.string()), ("n", pa.int64()),
                             ("s", pa.float64()),
                             ("sln", pa.float64()),
                             ("sinv", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        m = v > 0
        g, v = g[m], v[m]
        if not len(g):
            return part_schema.empty_table()
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = g[1:] != g[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({
            "grp": g[ks],
            "n": np.diff(np.append(ks, len(g))).astype(np.int64),
            "s": np.add.reduceat(v, ks),
            "sln": np.add.reduceat(np.log(v), ks),
            "sinv": np.add.reduceat(1.0 / v, ks),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    g = parts.groupby("grp").agg(n=("n", "sum"), s=("s", "sum"),
                                 sln=("sln", "sum"),
                                 sinv=("sinv", "sum")).reset_index()
    n = g.n.values.astype(np.int64)
    return _collect(pa.table({
        "event_type": pa.array(g.grp.values, pa.string()),
        "n": pa.array(n, pa.int64()),
        "mean_arith": pa.array(g.s.values / n, pa.float64()),
        "mean_geo": pa.array(np.exp(g.sln.values / n), pa.float64()),
        "mean_harm": pa.array(n / g.sinv.values, pa.float64()),
    }))


LEXICAL_RICHNESS_SQL = """
WITH t AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
           AS term
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
tc AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM t WHERE term <> ''
  GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax,
       ROUND(COUNT(*) * 1.0 / SUM(tf), 6) AS ttr,
       ROUND(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
             * 1.0 / SUM(tf), 6) AS hapax_share
FROM tc GROUP BY 1
"""


def q_lexical_richness(sf_dir: str):
    """Per-document lexical richness (type-token ratio + hapax share —
    the repetition/diversity quality signals next to gopher_repetition):
    every document is one row, so the whole computation is a SINGLE
    stateless map over the corpus — tokenize with the arrow regex
    splitter, flatten the list column once, and derive per-doc
    type/hapax counts from one lexsort + run reduction (no per-doc
    Python, no exchange at all).  Ratios divide exact ints;
    ORACLE-CHECKED against the UNNEST SQL."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("n_types", pa.int64()), ("n_hapax", pa.int64()),
        ("ttr", pa.float64()), ("hapax_share", pa.float64())])

    def _doc_stats(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["doc_id"]),
                                     pc.is_valid(batch["text"])))
        if len(batch) == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), "[^a-z0-9]+")
        toks = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.values.to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(len(batch)),
                        np.diff(offs).astype(np.int64))
        keep = flat != ""
        flat, row = flat[keep], row[keep]
        n_tokens = np.bincount(row, minlength=len(batch)).astype(
            np.int64)
        order = np.lexsort((flat, row))
        rs, fs = row[order], flat[order]
        first = np.empty(len(rs), dtype=bool)
        if len(rs):
            first[0] = True
            first[1:] = (rs[1:] != rs[:-1]) | (fs[1:] != fs[:-1])
        runs = np.diff(np.append(np.nonzero(first)[0], len(rs)))
        run_row = rs[first] if len(rs) else np.empty(0, np.int64)
        n_types = np.bincount(run_row, minlength=len(batch)).astype(
            np.int64)
        n_hapax = np.bincount(run_row[runs == 1],
                              minlength=len(batch)).astype(np.int64)
        nz = n_tokens > 0
        return pa.table({
            "doc_id": batch["doc_id"].to_numpy(
                zero_copy_only=False)[nz],
            "n_tokens": n_tokens[nz],
            "n_types": n_types[nz],
            "n_hapax": n_hapax[nz],
            "ttr": n_types[nz] * 1.0 / n_tokens[nz],
            "hapax_share": n_hapax[nz] * 1.0 / n_tokens[nz],
        }, schema=out_schema)

    return _collect(ds.map_batches(_doc_stats, batch_format="pyarrow",
                                   zero_copy_batch=True))


GRUBBS_OUTLIERS_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL),
st AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
  FROM e GROUP BY 1),
sc AS (
  SELECT e.event_type, e.event_id, e.v,
         ABS(e.v - st.s / st.n)
           / SQRT((st.ss - st.s * st.s / st.n) / (st.n - 1)) AS score
  FROM e JOIN st USING (event_type)),
r AS (
  SELECT event_type, event_id, v, ROUND(score, 6) AS score6,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(FLOOR(ROUND(score, 6) * 1e6 + 0.5) AS BIGINT)
                      DESC, event_id) AS rn
  FROM sc)
SELECT event_type, event_id, ROUND(v, 6) AS value, score6 AS score,
       CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
"""


def q_grubbs_outliers(sf_dir: str):
    """Grubbs-style studentized extreme outliers: the 3 most deviant
    events per type by |v - mean| / std (sample std) — the
    anomaly-triage readout after anomaly_mad's robust variant.  Engine
    path: per-type (n, sum, sum-sq) moments fold on the driver and
    broadcast; scoring is stateless per block, and the per-type top-3
    rides top_k_by_key's two-level partial top-k.  ORDERING discipline:
    mean/std carry sum-order ulps, so the score is two-step-rounded
    FIRST, scaled to exact int64 micro-units, and ranked integer-side
    on both engines.  ORACLE-CHECKED."""
    import ray

    from ..kernels.rounding import round6_tie_robust
    from ..stages.topk import top_k_by_key

    ds = _events_nonnull(sf_dir, ["event_type", "event_id", "value"])
    part_schema = pa.schema([("grp", pa.string()), ("n", pa.int64()),
                             ("s", pa.float64()), ("ss", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = g[1:] != g[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({
            "grp": g[ks],
            "n": np.diff(np.append(ks, len(g))).astype(np.int64),
            "s": np.add.reduceat(v, ks),
            "ss": np.add.reduceat(v * v, ks),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    st = parts.groupby("grp").agg(n=("n", "sum"), s=("s", "sum"),
                                  ss=("ss", "sum"))
    st["mean"] = st.s / st.n
    st["std"] = np.sqrt((st.ss - st.s * st.s / st.n) / (st.n - 1))
    keys = np.sort(st.index.values)
    mu = st["mean"].reindex(keys).values
    sd = st["std"].reindex(keys).values
    ref = ray.put((keys, mu, sd))

    def _score(batch: pa.Table) -> pa.Table:
        ks, m, s = ray.get(ref)
        g = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        pos = np.searchsorted(ks, g)
        score = round6_tie_robust(np.abs(v - m[pos]) / s[pos])
        return pa.table({
            "event_type": batch["event_type"],
            "event_id": batch["event_id"],
            "value": pa.array(v, pa.float64()),
            "score": pa.array(score, pa.float64()),
            "micro": pa.array(np.floor(score * 1e6 + 0.5).astype(
                np.int64), pa.int64()),
        })

    scored = ds.map_batches(_score, batch_format="pyarrow",
                            zero_copy_batch=True)
    top = top_k_by_key(scored, ["event_type"], "micro", 3,
                       tiebreak_col="event_id", descending=True)
    return _collect(top.map_batches(
        lambda t: t.select(["event_type", "event_id", "value", "score",
                            "rn"]),
        batch_format="pyarrow"))


_BLOCKLIST_PAT = "(^|[^a-z0-9])(slow|spark|big)([^a-z0-9]|$)"

BLOCKLIST_RATE_SQL = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN regexp_matches(lower(text),
                          '{_BLOCKLIST_PAT}') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged,
       ROUND(SUM(CASE WHEN regexp_matches(lower(text),
                          '{_BLOCKLIST_PAT}') THEN 1 ELSE 0 END)
             * 1.0 / COUNT(*), 6) AS flag_rate
FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
GROUP BY 1
"""


def q_blocklist_rate(sf_dir: str):
    """Blocklist hit rate per source (the safety/policy-filter audit a
    corpus pipeline runs before mixing): share of documents containing
    any blocked term as a standalone token, via one compiled RE2 regex
    (token-boundary guarded — pc.match_substring_regex and DuckDB
    regexp_matches share RE2 semantics, the pii_redact precedent).
    Stateless per-block flag + per-source integer partials, one
    category-scale driver fold; rates divide exact ints.
    ORACLE-CHECKED."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    part_schema = pa.schema([("source", pa.string()),
                             ("n_docs", pa.int64()),
                             ("n_flagged", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["source"]),
                                     pc.is_valid(batch["text"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        hit = pc.match_substring_regex(
            pc.utf8_lower(batch["text"]), _BLOCKLIST_PAT).to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, hit = src[order], hit[order]
        first = np.empty(len(src), dtype=bool)
        first[0] = True
        first[1:] = src[1:] != src[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({
            "source": src[ks],
            "n_docs": np.diff(np.append(ks, len(src))).astype(
                np.int64),
            "n_flagged": np.add.reduceat(hit, ks),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    g = parts.groupby("source").agg(
        n_docs=("n_docs", "sum"),
        n_flagged=("n_flagged", "sum")).reset_index()
    return _collect(pa.table({
        "source": pa.array(g.source.values, pa.string()),
        "n_docs": pa.array(g.n_docs.values.astype(np.int64)),
        "n_flagged": pa.array(g.n_flagged.values.astype(np.int64)),
        "flag_rate": pa.array(
            g.n_flagged.values * 1.0 / g.n_docs.values, pa.float64()),
    }))




_PCA_COV_CTE = """
u AS MATERIALIZED (
  SELECT vec_id, d.dim AS dim,
         CAST(FLOOR(ROUND(CAST(embedding[d.dim] AS DOUBLE), 6) * 1000
                    + 0.5) AS BIGINT) AS vi
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS dim) d
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
cp AS (
  SELECT a.dim AS i, b.dim AS j, COUNT(*) AS n,
         SUM(a.vi * b.vi) AS sij
  FROM u a JOIN u b ON b.vec_id = a.vec_id AND b.dim >= a.dim
  GROUP BY 1, 2),
s AS (SELECT dim, SUM(vi) AS si FROM u GROUP BY 1),
ctri AS (
  SELECT cp.i AS i, cp.j AS j, cp.n AS n,
         CAST(cp.n * cp.sij - sa.si * sb.si AS DOUBLE) AS c
  FROM cp JOIN s sa ON sa.dim = cp.i JOIN s sb ON sb.dim = cp.j),
cfull AS (
  SELECT i, j, n, c FROM ctri
  UNION ALL SELECT j AS i, i AS j, n, c FROM ctri WHERE i <> j)"""

PCA_TOP_EIGEN_SQL = f"""
WITH {_PCA_COV_CTE},
v0 AS (SELECT DISTINCT i AS dim, 1.0 AS v FROM cfull),
w1 AS (SELECT i AS dim, SUM(c * v0.v) AS w
       FROM cfull JOIN v0 ON v0.dim = cfull.j GROUP BY 1),
v1 AS (SELECT dim, ROUND(w / (SELECT SQRT(SUM(w * w)) FROM w1), 6)
                AS v FROM w1),
w2 AS (SELECT i AS dim, SUM(c * v1.v) AS w
       FROM cfull JOIN v1 ON v1.dim = cfull.j GROUP BY 1),
v2 AS (SELECT dim, ROUND(w / (SELECT SQRT(SUM(w * w)) FROM w2), 6)
                AS v FROM w2),
w3 AS (SELECT i AS dim, SUM(c * v2.v) AS w
       FROM cfull JOIN v2 ON v2.dim = cfull.j GROUP BY 1),
v3 AS (SELECT dim, ROUND(w / (SELECT SQRT(SUM(w * w)) FROM w3), 6)
                AS v FROM w3),
quad AS (
  SELECT SUM(va.v * cfull.c * vb.v) AS q,
         ANY_VALUE(cfull.n) AS n
  FROM cfull JOIN v3 va ON va.dim = cfull.i
             JOIN v3 vb ON vb.dim = cfull.j)
SELECT v3.dim AS dim, v3.v AS loading,
       ROUND(quad.q / (1000000.0 * quad.n * (quad.n - 1)), 6)
         AS eigenvalue
FROM v3 CROSS JOIN quad
"""


def q_pca_top_eigen(sf_dir: str):
    """Top principal component of the embedding corpus by 3 fixed power
    iterations (all-ones init) over the EXACT-INTEGER covariance
    numerators n*Sij - Si*Sj from the shared milli quantization — the
    PCA/whitening readout on top of embedding_covariance's Gram
    exchange (each block ships ONE dim^2 int64 Gram partial; corpus
    size never matters).  PARITY: the iteration vector is
    two-step-rounded after every normalize (the pagerank discipline),
    so matvec term-order ulps cannot compound; the Rayleigh-quotient
    eigenvalue divides by the exact milli^2 * n(n-1) scale at the end.
    ORACLE-CHECKED against the unrolled 3-iteration SQL."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    part_schema = pa.schema([("i", pa.int64()), ("j", pa.int64()),
                             ("sij", pa.int64()), ("si", pa.int64()),
                             ("n", pa.int64())])

    def _gram(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["vec_id"]),
                                     pc.is_valid(batch["embedding"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        mat = _emb_matrix(batch, "embedding")
        vi = np.floor(round6_tie_robust(mat) * 1000.0
                      + 0.5).astype(np.int64)
        n, d = vi.shape
        gram = vi.T @ vi
        si = vi.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "sij": pa.array(gram[iu, ju], pa.int64()),
            "si": pa.array(np.where(iu == ju, si[iu], 0), pa.int64()),
            "n": pa.array(np.full(len(iu), n, dtype=np.int64)),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _gram, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    d = int(parts.i.max())
    S = np.zeros((d, d), dtype=np.int64)
    np.add.at(S, (parts.i.values - 1, parts.j.values - 1),
              parts.sij.values)
    si = np.zeros(d, dtype=np.int64)
    diag = parts[parts.i == parts.j]
    np.add.at(si, diag.i.values - 1, diag.si.values)
    n = int(parts[(parts.i == 1) & (parts.j == 1)].n.sum())
    S = S + np.triu(S, 1).T                    # mirror to full symmetric
    C = (n * S - np.outer(si, si)).astype(np.float64)

    v = np.ones(d, dtype=np.float64)
    for _ in range(3):
        w = C @ v
        v = round6_tie_robust(w / np.sqrt(np.sum(w * w)))
    quad = float(v @ (C @ v))
    eig = quad / (1e6 * n * (n - 1))
    return _collect(pa.table({
        "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
        "loading": pa.array(v, pa.float64()),
        "eigenvalue": pa.array(np.full(d, eig), pa.float64()),
    }))


MARKOV_PERPLEXITY_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
pr AS (
  SELECT event_type AS f, nxt AS t, COUNT(*) AS nft
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
pf AS (SELECT f, SUM(nft) AS nf FROM pr GROUP BY 1),
tr AS (SELECT user_id, event_type AS f, nxt AS t FROM s
       WHERE nxt IS NOT NULL),
sc AS (
  SELECT tr.user_id AS user_id, COUNT(*) AS n_trans,
         SUM(LN(pr.nft * 1.0 / pf.nf)) AS slogp
  FROM tr JOIN pr ON pr.f = tr.f AND pr.t = tr.t
          JOIN pf ON pf.f = tr.f
  GROUP BY 1)
SELECT user_id, CAST(n_trans AS BIGINT) AS n_trans,
       ROUND(slogp / n_trans, 6) AS avg_logp,
       ROUND(EXP(-slogp / n_trans), 6) AS perplexity
FROM sc
"""


def q_markov_perplexity(sf_dir: str):
    """Per-user sequence perplexity under the corpus-global first-order
    Markov model (the behavioral-anomaly score: users whose event
    streams the global model finds surprising): transition probabilities
    from the full corpus, each user scored by exp(-mean ln p) over
    their own transitions.  Engine path: ONE user-keyed exchange
    groups sequences; pass 1 folds the (from, to) transition counts
    from in-block pair partials (category^2-scale driver merge), pass 2
    re-reads the SAME materialized grouped blocks (batch_size=None —
    group-aligned) and scores each user in-block against the broadcast
    log-prob matrix.  Each ln term divides exact ints (bit-identical
    both engines); per-user sum order is absorbed by the two-step
    output rounding.  ORACLE-CHECKED."""
    import ray

    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    grp_schema = pa.schema([("user_id", pa.int64()),
                            ("ts", pa.timestamp("us")),
                            ("event_id", pa.int64()),
                            ("event_type", pa.string())])

    def _identity(batch: pa.Table) -> pa.Table:
        return batch.cast(grp_schema)

    grouped = sorted_group_map(ds, ["user_id"], None, grp_schema,
                               block_fn=_identity).materialize()

    def _seq_pairs(batch: pa.Table):
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]
        return u, et[:-1][same] if len(u) > 1 else et[:0], \
            et[1:][same] if len(u) > 1 else et[:0], same

    cnt_schema = pa.schema([("f", pa.string()), ("t", pa.string()),
                            ("nft", pa.int64())])

    def _count_partial(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return cnt_schema.empty_table()
        _, fr, to, _ = _seq_pairs(batch)
        if not len(fr):
            return cnt_schema.empty_table()
        t = pa.table({"f": fr, "t": to})
        g = t.group_by(["f", "t"]).aggregate([([], "count_all")])
        return g.rename_columns(["f", "t", "nft"]).cast(cnt_schema)

    counts = _collect_raw(grouped.map_batches(
        _count_partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)).to_pandas().groupby(
        ["f", "t"], as_index=False)["nft"].sum()
    nf = counts.groupby("f")["nft"].transform("sum")
    counts["logp"] = np.log(counts.nft.values * 1.0 / nf.values)
    # "|" separator: numpy/pandas U-string concat silently DROPS \x00,
    # so a NUL separator degrades to bare concatenation on both paths
    keys = (counts.f + "|" + counts.t).values
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], counts.logp.values[order]))

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_trans", pa.int64()),
                            ("avg_logp", pa.float64()),
                            ("perplexity", pa.float64())])

    def _score(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return out_schema.empty_table()
        u_sorted, fr, to, same = _seq_pairs(batch)
        if not len(fr):
            return out_schema.empty_table()
        ks, lp = ray.get(ref)
        pk = np.char.add(np.char.add(fr.astype(str), "|"),
                         to.astype(str))
        logp = lp[np.searchsorted(ks, pk)]
        uu = u_sorted[:-1][same]
        first = np.empty(len(uu), dtype=bool)
        first[0] = True
        first[1:] = uu[1:] != uu[:-1]
        starts = np.nonzero(first)[0]
        nt = np.diff(np.append(starts, len(uu))).astype(np.int64)
        slog = np.add.reduceat(logp, starts)
        avg = slog / nt
        return pa.table({
            "user_id": pa.array(uu[starts], pa.int64()),
            "n_trans": pa.array(nt, pa.int64()),
            "avg_logp": pa.array(avg, pa.float64()),
            "perplexity": pa.array(np.exp(-avg), pa.float64()),
        }, schema=out_schema)

    return _collect(grouped.map_batches(
        _score, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True))


BFS_LEVELS_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
e AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
inc AS (SELECT u AS w, v AS nbr FROM e
        UNION ALL SELECT v AS w, u AS nbr FROM e),
l0 AS (SELECT MIN(u) AS node FROM
       (SELECT u FROM e UNION ALL SELECT v FROM e) t(u)),
n1 AS (SELECT DISTINCT nbr AS node FROM inc
       JOIN l0 ON inc.w = l0.node),
l1 AS (SELECT node FROM n1
       WHERE node NOT IN (SELECT node FROM l0)),
n2 AS (SELECT DISTINCT nbr AS node FROM inc
       JOIN l1 ON inc.w = l1.node),
l2 AS (SELECT node FROM n2
       WHERE node NOT IN (SELECT node FROM l0)
         AND node NOT IN (SELECT node FROM l1)),
n3 AS (SELECT DISTINCT nbr AS node FROM inc
       JOIN l2 ON inc.w = l2.node),
l3 AS (SELECT node FROM n3
       WHERE node NOT IN (SELECT node FROM l0)
         AND node NOT IN (SELECT node FROM l1)
         AND node NOT IN (SELECT node FROM l2))
SELECT node, 0 AS level FROM l0
UNION ALL SELECT node, 1 FROM l1
UNION ALL SELECT node, 2 FROM l2
UNION ALL SELECT node, 3 FROM l3
"""


def q_bfs_levels(sf_dir: str):
    """3-hop BFS levels from the lowest-id node of the supported
    co-purchase graph (the neighborhood-expansion primitive under
    "related items within k hops"): frontier sets are node-scale
    driver arrays (the pagerank state discipline); each hop streams
    the edge list once with the frontier broadcast and folds the
    discovered-neighbor partials — all set algebra on exact int ids,
    no floats anywhere.  ORACLE-CHECKED against the unrolled
    3-expansion SQL."""
    import ray

    pairs = _copurchase_pair_counts(sf_dir)
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"k": t.filter(pc.greater_equal(t["nuv"], 2))["k"]},
            schema=_EK_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    nodes, _deg = _copurchase_degrees(edges)
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "level": pa.array([], pa.int64())})
    if len(nodes) == 0:
        return empty
    seed = int(nodes.min())
    seen = {seed}
    levels = [np.array([seed], dtype=np.int64)]
    nbr_schema = pa.schema([("node", pa.int64())])
    for _hop in range(3):
        fref = ray.put(np.sort(levels[-1]))

        def _expand(batch: pa.Table) -> pa.Table:
            fr = ray.get(fref)
            k = batch["k"].to_numpy(zero_copy_only=False)
            u = k >> np.int64(32)
            v = k & np.int64(0xFFFFFFFF)
            pos_u = np.minimum(np.searchsorted(fr, u), len(fr) - 1)
            pos_v = np.minimum(np.searchsorted(fr, v), len(fr) - 1)
            hit_u = fr[pos_u] == u
            hit_v = fr[pos_v] == v
            out = np.unique(np.concatenate([v[hit_u], u[hit_v]]))
            return pa.table({"node": out}, schema=nbr_schema)

        found = _collect_raw(edges.map_batches(
            _expand, batch_format="pyarrow", zero_copy_batch=True))
        cand = np.unique(found["node"].to_numpy(zero_copy_only=False))
        fresh = np.array([c for c in cand if c not in seen],
                         dtype=np.int64)
        if not len(fresh):
            break
        seen.update(fresh.tolist())
        levels.append(fresh)
    out_node = np.concatenate(levels)
    out_level = np.concatenate([np.full(len(l), i, dtype=np.int64)
                                for i, l in enumerate(levels)])
    return _collect(pa.table({
        "node": pa.array(out_node, pa.int64()),
        "level": pa.array(out_level, pa.int64()),
    }))


FREQUENT_TRIPLES_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
pr AS (
  SELECT a.o AS o, a.p AS u, b.p AS v
  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
tr AS (
  SELECT pr.u AS u, pr.v AS v, c.p AS w
  FROM pr JOIN op c USING (o) WHERE pr.v < c.p)
SELECT u, v, w, COUNT(*) AS support
FROM tr GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
"""

# itemsets pack into one int64 (3 x 21-bit ids) for the count exchange
_TRIPLE_ID_BITS = 21


def q_frequent_triples(sf_dir: str):
    """Frequent 3-itemsets of the co-purchase baskets with support >= 2
    (the Apriori step after copurchase_lift's pairs — candidate
    bundles).  Engine path: rides the order-keyed exchange; per-order
    triple emission is vectorized by basket-length class (the
    covisit-pairs trick lifted to 3-combinations), triples pack into
    ONE int64 key (3 x 21-bit ids — a loud guard raises if a partkey
    ever outgrows the packing), block combiners shrink the key exchange
    to distinct-triple partials, one keyed count merge + support
    filter.  All integer arithmetic.  ORACLE-CHECKED against the
    3-way self-join SQL."""
    from itertools import combinations

    from ..stages.sorted_groups import sorted_group_map

    op = _copurchase_order_parts(sf_dir)
    key_schema = pa.schema([("k3", pa.int64()), ("n", pa.int64())])
    bits = _TRIPLE_ID_BITS

    def _order_triples(batch: pa.Table) -> pa.Table:
        if len(batch) < 3:
            return key_schema.empty_table()
        tbl = batch.sort_by([("l_orderkey", "ascending"),
                             ("l_partkey", "ascending")])
        o = tbl["l_orderkey"].to_numpy(zero_copy_only=False)
        p = tbl["l_partkey"].to_numpy(zero_copy_only=False)
        if p.max() >= (1 << bits):
            raise ValueError(
                "frequent_triples: partkey exceeds the 21-bit packing; "
                "widen to a 3-column groupby for this catalog")
        keep = np.empty(len(o), dtype=bool)
        keep[0] = True
        keep[1:] = (o[1:] != o[:-1]) | (p[1:] != p[:-1])
        o, p = o[keep], p[keep]
        first = np.empty(len(o), dtype=bool)
        first[0] = True
        first[1:] = o[1:] != o[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(o)))
        keys = []
        for length in np.unique(lens):
            if length < 3:
                continue
            sel = starts[lens == length]
            idx = sel[:, None] + np.arange(length)
            m = p[idx]
            comb = np.array(list(combinations(range(int(length)), 3)),
                            dtype=np.int64)
            k3 = ((m[:, comb[:, 0]] << np.int64(2 * bits))
                  | (m[:, comb[:, 1]] << np.int64(bits))
                  | m[:, comb[:, 2]]).ravel()
            keys.append(k3)
        if not keys:
            return key_schema.empty_table()
        k3 = np.concatenate(keys)
        uniq, cnt = np.unique(k3, return_counts=True)
        return pa.table({"k3": uniq, "n": cnt.astype(np.int64)},
                        schema=key_schema)

    per_order = sorted_group_map(op, ["l_orderkey"], None, key_schema,
                                 block_fn=_order_triples)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return key_schema.empty_table()
        t = batch.sort_by([("k3", "ascending")])
        k = t["k3"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        first = np.empty(len(k), dtype=bool)
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        ks = np.nonzero(first)[0]
        return pa.table({"k3": k[ks], "n": np.add.reduceat(n, ks)},
                        schema=key_schema)

    merged = sorted_group_map(per_order, ["k3"], None, key_schema,
                              block_fn=_merge)
    mask = np.int64((1 << bits) - 1)

    def _unpack(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["n"], 2))
        k = t["k3"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(k >> np.int64(2 * bits), pa.int64()),
            "v": pa.array((k >> np.int64(bits)) & mask, pa.int64()),
            "w": pa.array(k & mask, pa.int64()),
            "support": t["n"],
        })

    return _collect(merged.map_batches(_unpack, batch_format="pyarrow",
                                       zero_copy_batch=True))


HURST_RS_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
r AS (SELECT event_type, mi,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               - 1 AS idx
      FROM d),
g AS (
  SELECT event_type, w.wsz AS wsz, r.idx // w.wsz AS win,
         ROW_NUMBER() OVER (PARTITION BY event_type, w.wsz,
                            r.idx // w.wsz ORDER BY r.idx) AS k,
         SUM(r.mi) OVER (PARTITION BY event_type, w.wsz,
                         r.idx // w.wsz ORDER BY r.idx) AS cum,
         COUNT(*) OVER (PARTITION BY event_type, w.wsz,
                        r.idx // w.wsz) AS cnt,
         SUM(r.mi) OVER (PARTITION BY event_type, w.wsz,
                         r.idx // w.wsz) AS tot,
         SUM(r.mi * r.mi) OVER (PARTITION BY event_type, w.wsz,
                                r.idx // w.wsz) AS tot2
  FROM r CROSS JOIN (SELECT UNNEST([5, 10, 15]) AS wsz) w),
s AS (
  SELECT event_type, wsz, win,
         MAX(cnt * cum - k * tot) - MIN(cnt * cum - k * tot) AS rn,
         ANY_VALUE(cnt) AS n, ANY_VALUE(tot) AS si,
         ANY_VALUE(tot2) AS s2
  FROM g WHERE cnt = wsz GROUP BY 1, 2, 3),
rs AS (
  SELECT event_type, wsz, COUNT(*) AS n_windows,
         ROUND(AVG(CAST(rn AS DOUBLE)
                   / SQRT(CAST(n * s2 - si * si AS DOUBLE))), 6)
           AS avg_rs
  FROM s WHERE n * s2 - si * si > 0 GROUP BY 1, 2),
h AS (
  SELECT event_type, COUNT(*) AS m,
         SUM(LN(CAST(wsz AS DOUBLE))) AS sx, SUM(LN(avg_rs)) AS sy,
         SUM(LN(CAST(wsz AS DOUBLE)) * LN(avg_rs)) AS sxy,
         SUM(LN(CAST(wsz AS DOUBLE)) * LN(CAST(wsz AS DOUBLE))) AS sxx
  FROM rs WHERE avg_rs > 0 GROUP BY 1)
SELECT rs.event_type AS event_type, CAST(rs.wsz AS BIGINT) AS w_size,
       CAST(rs.n_windows AS BIGINT) AS n_windows, rs.avg_rs AS avg_rs,
       ROUND((h.m * h.sxy - h.sx * h.sy)
             / (h.m * h.sxx - h.sx * h.sx), 6) AS hurst
FROM rs JOIN h USING (event_type)
"""


def q_hurst_rs(sf_dir: str):
    """Hurst exponent by rescaled-range (R/S) analysis of each series'
    daily-mean sequence — the long-memory / self-similarity diagnostic
    (H > 0.5 trending, < 0.5 mean-reverting) astronomy and traffic
    analysis both lean on.  The R/S algebra is kept EXACT on the shared
    milli series: for a window of n integer values, n·cumdev_k =
    n·cum_k − k·tot is an integer, so R·n = max − min of it, and
    S·n = sqrt(n·S2 − Si²) — R/S = Rn / sqrt(n·S2 − Si²), one integer
    divide + sqrt, bit-identical both engines.  Per-(type, window-size)
    mean R/S is two-step-rounded, and the Hurst slope regresses
    ln(R/S) on ln(w) from those ROUNDED means (same-libm logs on
    identical doubles).  Driver work is |types| x |days| — bounded."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "w": [], "nw": [], "rs": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        for w in (5, 10, 15):
            vals = []
            for b in range(len(mi) // w):
                x = mi[b * w:(b + 1) * w].astype(np.int64)
                cum = np.cumsum(x)
                k = np.arange(1, w + 1, dtype=np.int64)
                nd = w * cum - k * cum[-1]
                rn = int(nd.max() - nd.min())
                s2n = int(w * int((x * x).sum()) - int(cum[-1]) ** 2)
                if s2n > 0:
                    vals.append(float(rn) / np.sqrt(float(s2n)))
            if vals:
                rows["et"].append(et)
                rows["w"].append(w)
                rows["nw"].append(len(vals))
                rows["rs"].append(float(round6_tie_robust(
                    np.array([np.mean(vals)]))[0]))
    out = {"event_type": [], "w_size": [], "n_windows": [],
           "avg_rs": [], "hurst": []}
    ets = sorted(set(rows["et"]))
    for et in ets:
        idx = [i for i, e in enumerate(rows["et"])
               if e == et and rows["rs"][i] > 0]
        if not idx:          # mirror the oracle's inner join: no slope
            continue         # row -> the type's rs rows drop too
        lx = np.log(np.array([rows["w"][i] for i in idx], np.float64))
        ly = np.log(np.array([rows["rs"][i] for i in idx], np.float64))
        m = len(idx)
        hurst = ((m * float((lx * ly).sum()) -
                  float(lx.sum()) * float(ly.sum()))
                 / (m * float((lx * lx).sum()) - float(lx.sum()) ** 2))
        for i in [j for j, e in enumerate(rows["et"]) if e == et]:
            out["event_type"].append(et)
            out["w_size"].append(rows["w"][i])
            out["n_windows"].append(rows["nw"][i])
            out["avg_rs"].append(rows["rs"][i])
            out["hurst"].append(hurst)
    return _collect(pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "w_size": pa.array(out["w_size"], pa.int64()),
        "n_windows": pa.array(out["n_windows"], pa.int64()),
        "avg_rs": pa.array(out["avg_rs"], pa.float64()),
        "hurst": pa.array(out["hurst"], pa.float64()),
    }))


WELCH_TTEST_SQL = """
WITH v AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
mm AS (SELECT (MIN(day) + MAX(day)) // 2 AS thr FROM v),
a AS (
  SELECT event_type,
         SUM(CASE WHEN day <= (SELECT thr FROM mm)
                  THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN day <= (SELECT thr FROM mm)
                  THEN vi ELSE 0 END) AS s1,
         SUM(CASE WHEN day <= (SELECT thr FROM mm)
                  THEN vi * vi ELSE 0 END) AS q1,
         SUM(CASE WHEN day > (SELECT thr FROM mm)
                  THEN 1 ELSE 0 END) AS n2,
         SUM(CASE WHEN day > (SELECT thr FROM mm)
                  THEN vi ELSE 0 END) AS s2,
         SUM(CASE WHEN day > (SELECT thr FROM mm)
                  THEN vi * vi ELSE 0 END) AS q2
  FROM v GROUP BY 1),
b AS (
  SELECT event_type, n1, n2,
         CAST(n1 * q1 - s1 * s1 AS DOUBLE)
           / CAST(n1 * n1 * (n1 - 1) AS DOUBLE) AS va,
         CAST(n2 * q2 - s2 * s2 AS DOUBLE)
           / CAST(n2 * n2 * (n2 - 1) AS DOUBLE) AS vb,
         CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md
  FROM a WHERE n1 > 1 AND n2 > 1)
SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(md / SQRT(va + vb), 6) AS t_stat,
       ROUND((va + vb) * (va + vb)
             / (va * va / (n1 - 1) + vb * vb / (n2 - 1)), 6) AS df
FROM b
"""


def q_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t-test between each series' first and
    second timeline halves (midpoint-day split, the mannwhitney_u
    design) — the parametric drift companion.  Everything derives from
    FOUR exact integers per (type, period): n, Σvi, Σvi² on the milli
    quantization, merged associatively from per-block partials; the
    variance-of-mean va = (n·Q − S²)/(n²(n−1)) is one exact-int divide,
    and t / Welch–Satterthwaite df are short IEEE chains on identical
    doubles — bit-identical before the output rounding."""
    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()), ("n", pa.int64()),
                             ("s", pa.int64()), ("q", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        from ..kernels.rounding import round6_tie_robust
        day = pc.divide(batch["ts"].cast(pa.int64()), _DAY_US)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1000.0 + 0.5).astype(
            np.int64)
        t = pa.table({"event_type": batch["event_type"], "day": day,
                      "vi": pa.array(vi, pa.int64()),
                      "qi": pa.array(vi * vi, pa.int64())})
        g = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all"), ("vi", "sum"), ("qi", "sum")])
        return g.rename_columns(
            ["event_type", "day", "n", "s", "q"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    thr = (int(parts["day"].min()) + int(parts["day"].max())) // 2
    parts["p"] = np.where(parts["day"].values <= thr, 1, 2)
    agg = parts.groupby(["event_type", "p"])[["n", "s", "q"]].sum()
    rows = {"et": [], "n1": [], "n2": [], "t": [], "df": []}
    for et in sorted({i[0] for i in agg.index}):
        if (et, 1) not in agg.index or (et, 2) not in agg.index:
            continue
        g1, g2 = agg.loc[(et, 1)], agg.loc[(et, 2)]
        n1, s1, q1 = (int(g1["n"]), int(g1["s"]), int(g1["q"]))
        n2, s2, q2 = (int(g2["n"]), int(g2["s"]), int(g2["q"]))
        if n1 < 2 or n2 < 2:
            continue
        va = float(n1 * q1 - s1 * s1) / float(n1 * n1 * (n1 - 1))
        vb = float(n2 * q2 - s2 * s2) / float(n2 * n2 * (n2 - 1))
        md = float(s1) / n1 - float(s2) / n2
        se2 = va + vb
        rows["et"].append(et)
        rows["n1"].append(n1)
        rows["n2"].append(n2)
        rows["t"].append(md / np.sqrt(se2))
        rows["df"].append(se2 * se2 / (va * va / (n1 - 1)
                                       + vb * vb / (n2 - 1)))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n1": pa.array(rows["n1"], pa.int64()),
        "n2": pa.array(rows["n2"], pa.int64()),
        "t_stat": pa.array(rows["t"], pa.float64()),
        "df": pa.array(rows["df"], pa.float64()),
    }))


CRAMERS_V_SQL = """
WITH d AS (
  SELECT lang, source FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL),
o AS (SELECT lang, source, COUNT(*) AS obs FROM d GROUP BY 1, 2),
m AS (
  SELECT obs,
         SUM(obs) OVER (PARTITION BY lang) AS row_n,
         SUM(obs) OVER (PARTITION BY source) AS col_n,
         SUM(obs) OVER () AS n
  FROM o),
c AS (
  -- full-grid chi2 via the obs²/exp identity: zero cells contribute
  -- nothing to Σ obs²/exp, so Σ_all (obs−exp)²/exp = Σ_obs obs²/exp − n
  SELECT SUM(obs * obs / (CAST(row_n AS DOUBLE) * col_n / n))
           - ANY_VALUE(n) AS chi2,
         ANY_VALUE(n) AS n,
         (SELECT COUNT(DISTINCT lang) FROM o) AS r,
         (SELECT COUNT(DISTINCT source) FROM o) AS k
  FROM m)
SELECT CAST(r AS BIGINT) AS n_langs, CAST(k AS BIGINT) AS n_sources,
       CAST(n AS BIGINT) AS n_docs, ROUND(chi2, 6) AS chi2,
       ROUND(SQRT(chi2 / (n * LEAST(r - 1, k - 1))), 6) AS cramers_v
FROM c
"""


def q_cramers_v(sf_dir: str):
    """Cramér's V association strength between document language and
    source — the normalized [0, 1] effect size on top of the
    chi2_independence contingency discipline, over a DIFFERENT
    table/pair (lang x source on documents).  Map-side integer cell
    counts, |langs| x |sources| driver merge, expected counts in the
    oracle's exact op order (row_n_float · col_n / n); V divides the
    unrounded chi2 by n·min(r−1, k−1) before one sqrt."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    part_schema = pa.schema([("lang", pa.string()),
                             ("source", pa.string()),
                             ("obs", pa.int64())])

    def _cnt(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["lang"]),
                                     pc.is_valid(batch["source"])))
        g = batch.group_by(["lang", "source"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "source", "obs"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _cnt, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["lang", "source"], as_index=False)[
        "obs"].sum()
    row_n = cells.groupby("lang")["obs"].transform("sum").values.astype(
        np.float64)
    col_n = cells.groupby("source")["obs"].transform(
        "sum").values.astype(np.float64)
    obs = cells["obs"].values.astype(np.float64)
    n = float(obs.sum())
    exp = row_n * col_n / n
    # full-grid chi2 from observed cells only: zero cells add nothing
    # to Σ obs²/exp, and Σ_all (obs−exp)²/exp = Σ obs²/exp − n
    chi2 = float(np.sum(obs * obs / exp)) - n
    r = cells["lang"].nunique()
    k = cells["source"].nunique()
    v = np.sqrt(chi2 / (n * min(r - 1, k - 1)))
    return _collect(pa.table({
        "n_langs": pa.array([r], pa.int64()),
        "n_sources": pa.array([k], pa.int64()),
        "n_docs": pa.array([int(n)], pa.int64()),
        "chi2": pa.array(round6_tie_robust(np.array([chi2]))),
        "cramers_v": pa.array(round6_tie_robust(np.array([v]))),
    }))


TCLOSENESS_SQL = """
WITH v AS (
  SELECT event_type, (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
mm AS (SELECT MIN(vi) AS lo, MAX(vi) AS hi FROM v),
b AS (SELECT event_type, hour,
             (vi - mm.lo) * 10 // (mm.hi - mm.lo + 1) AS bin
      FROM v, mm),
c AS (SELECT event_type, hour, bin, COUNT(*) AS n FROM b
      GROUP BY 1, 2, 3),
grp AS (SELECT DISTINCT event_type, hour FROM c),
bins AS (SELECT UNNEST(range(10)) AS bin),
gfull AS (
  SELECT g.event_type AS event_type, g.hour AS hour,
         bins.bin AS bin, COALESCE(c.n, 0) AS n
  FROM grp g CROSS JOIN bins
  LEFT JOIN c ON c.event_type = g.event_type AND c.hour = g.hour
             AND c.bin = bins.bin),
gc AS (
  SELECT event_type, hour, bin,
         SUM(n) OVER (PARTITION BY event_type, hour
                      ORDER BY bin) AS cp,
         SUM(n) OVER (PARTITION BY event_type, hour) AS ng
  FROM gfull),
t1 AS (SELECT event_type, bin, SUM(n) AS tn FROM gfull GROUP BY 1, 2),
t2 AS (
  SELECT event_type, bin,
         SUM(tn) OVER (PARTITION BY event_type ORDER BY bin) AS cq,
         SUM(tn) OVER (PARTITION BY event_type) AS nt
  FROM t1),
emd AS (
  SELECT gc.event_type AS event_type, gc.hour AS hour,
         ROUND(SUM(ABS(CAST(gc.cp AS DOUBLE) / gc.ng
                       - CAST(t2.cq AS DOUBLE) / t2.nt)
                   ORDER BY gc.bin) / 9.0, 6) AS t
  FROM gc JOIN t2 ON t2.event_type = gc.event_type
                 AND t2.bin = gc.bin
  WHERE gc.bin < 9
  GROUP BY 1, 2)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN t > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_fail,
       ROUND(MAX(t), 6) AS max_t
FROM emd GROUP BY 1
"""


def q_tcloseness_audit(sf_dir: str):
    """t-closeness audit — the third privacy gate after kanon_rollup
    and ldiversity_audit: for each quasi-identifier group (event_type,
    hour-of-day), the ordered earth-mover's distance between the
    group's sensitive-value distribution (value in 10 equal-width
    GLOBAL bins, integer edges on the milli quantization) and its
    type's overall distribution; a group fails at t > 0.2.  EMD for an
    ordered attribute is mean |cumP − cumQ| over interior bins — every
    term an exact-int ratio, summed in bin order on both engines, and
    the per-group t is two-step PRE-rounded before the threshold
    compare and max (the changepoint_cusum discipline).  Two bounded
    passes: global min/max, then |types| x 24 x 10 count partials."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    _HOUR_US = 3_600_000_000

    def _vi(batch: pa.Table) -> np.ndarray:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return np.floor(round6_tie_robust(v) * 1000.0
                        + 0.5).astype(np.int64)

    mm_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def _minmax(batch: pa.Table) -> pa.Table:
        vi = _vi(batch)
        if not len(vi):
            return mm_schema.empty_table()
        return pa.table({"lo": pa.array([int(vi.min())], pa.int64()),
                         "hi": pa.array([int(vi.max())], pa.int64())},
                        schema=mm_schema)

    mm = _collect_raw(ds.map_batches(_minmax, batch_format="pyarrow",
                                     zero_copy_batch=True))
    lo = int(pc.min(mm["lo"]).as_py())
    hi = int(pc.max(mm["hi"]).as_py())
    span = hi - lo + 1
    part_schema = pa.schema([("event_type", pa.string()),
                             ("hour", pa.int64()), ("bin", pa.int64()),
                             ("n", pa.int64())])

    def _cnt(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = (t_us % _DAY_US) // _HOUR_US
        bins = (_vi(batch) - lo) * 10 // span
        t = pa.table({"event_type": batch["event_type"],
                      "hour": pa.array(hour, pa.int64()),
                      "bin": pa.array(bins, pa.int64())})
        g = t.group_by(["event_type", "hour", "bin"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(
            ["event_type", "hour", "bin", "n"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _cnt, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["event_type", "hour", "bin"],
                          as_index=False)["n"].sum()
    rows = {"et": [], "ng": [], "gf": [], "mt": []}
    for et, sub in cells.groupby("event_type"):
        tq = np.zeros(10, dtype=np.int64)
        np.add.at(tq, sub["bin"].values.astype(np.int64),
                  sub["n"].values.astype(np.int64))
        cq = np.cumsum(tq)
        nt = int(cq[-1])
        ts_ = []
        for _hr, hsub in sub.groupby("hour"):
            gp = np.zeros(10, dtype=np.int64)
            np.add.at(gp, hsub["bin"].values.astype(np.int64),
                      hsub["n"].values.astype(np.int64))
            cp = np.cumsum(gp)
            ng = int(cp[-1])
            t = 0.0
            for k in range(9):
                t += abs(float(cp[k]) / ng - float(cq[k]) / nt)
            ts_.append(float(round6_tie_robust(
                np.array([t / 9.0]))[0]))
        ts_ = np.array(ts_, dtype=np.float64)
        rows["et"].append(et)
        rows["ng"].append(len(ts_))
        rows["gf"].append(int((ts_ > 0.2).sum()))
        rows["mt"].append(float(ts_.max()))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_groups": pa.array(rows["ng"], pa.int64()),
        "groups_fail": pa.array(rows["gf"], pa.int64()),
        "max_t": pa.array(rows["mt"], pa.float64()),
    }))


ROLLING_MEDIAN_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2)
SELECT event_type, day,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window,
       ROUND(MEDIAN(mi) OVER w / 1000.0, 6) AS med7
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_rolling_median_7d(sf_dir: str):
    """Trailing 7-day rolling MEDIAN of each series' daily mean — the
    robust smoother dashboards prefer over the rolling mean (one bad
    day cannot drag it).  The window is a day-RANGE (missing days
    shrink the window, they do not shift it).  Median over exact milli
    ints is an int or int+0.5 — bit-exact both engines; the engine
    side is a two-pointer day-range walk over the bounded
    |types| x |days| driver series."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "day": [], "n": [], "m": []}
    for et in sorted(series):
        days, mi, _ = series[et]
        for i in range(len(days)):
            loi = int(np.searchsorted(days, days[i] - 6, side="left"))
            w = mi[loi:i + 1]
            rows["et"].append(et)
            rows["day"].append(int(days[i]))
            rows["n"].append(len(w))
            rows["m"].append(float(np.median(w)) / 1000.0)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "day": pa.array(rows["day"], pa.int64()),
        "n_in_window": pa.array(rows["n"], pa.int64()),
        "med7": pa.array(rows["m"], pa.float64()),
    }))


OOV_RATE_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''),
tc AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
vocab AS (SELECT term FROM tc WHERE n >= 5),
dt AS (SELECT doc_id, term, COUNT(*) AS n FROM toks GROUP BY 1, 2),
d AS (
  SELECT doc_id, SUM(n) AS n_tok,
         SUM(CASE WHEN term NOT IN (SELECT term FROM vocab)
                  THEN n ELSE 0 END) AS n_oov
  FROM dt GROUP BY 1)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(n_oov AS BIGINT) AS n_oov,
       ROUND(CAST(n_oov AS DOUBLE) / n_tok, 6) AS oov_rate
FROM d
"""


def q_oov_rate(sf_dir: str):
    """Per-document out-of-vocabulary rate against the corpus
    vocabulary (count >= 5 under the shared tokenizer) — the coverage
    gate run before committing to a tokenizer/vocab for training.
    Engine path: one term-keyed exchange builds the global counts
    (block combiners first), the vocab broadcasts (Heaps-law bounded,
    the unigram-LM discipline), and a second doc-keyed exchange scores
    each doc via a sorted-vocab searchsorted probe — integer counts
    end to end, one ratio at the output."""
    import ray
    import ray.data as rd

    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    gc_ = _collect_raw(term_counts(ds, [], "text"))
    terms = np.asarray(gc_["term"].to_pylist(), dtype=object)
    n = gc_["n"].to_numpy(zero_copy_only=False)
    vocab = np.sort(terms[n >= 5].astype(str))
    vref = ray.put(vocab)

    per_doc = term_counts(ds, ["doc_id"], "text")
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_tok", pa.int64()),
                            ("n_oov", pa.int64()),
                            ("oov_rate", pa.float64())])

    def _score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        voc = ray.get(vref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        tn = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tm = np.asarray(batch["term"].to_pylist(), dtype=str)
        if len(voc):
            pos = np.minimum(np.searchsorted(voc, tm), len(voc) - 1)
            oov = voc[pos] != tm
        else:
            oov = np.ones(len(tm), dtype=bool)
        first = np.empty(len(did), dtype=bool)
        first[0] = True
        first[1:] = did[1:] != did[:-1]
        starts = np.nonzero(first)[0]
        ntok = np.add.reduceat(tn, starts)
        noov = np.add.reduceat(np.where(oov, tn, 0), starts)
        return pa.table({
            "doc_id": pa.array(did[starts], pa.int64()),
            "n_tok": pa.array(ntok, pa.int64()),
            "n_oov": pa.array(noov, pa.int64()),
            "oov_rate": pa.array(noov.astype(np.float64)
                                 / ntok.astype(np.float64)),
        }, schema=out_schema)

    from ..stages.sorted_groups import sorted_group_map
    return _collect(sorted_group_map(per_doc, ["doc_id"], None,
                                     out_schema, block_fn=_score))


PAIRWISE_SCALE_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
p AS (
  SELECT a.event_type AS event_type, ABS(a.mi - b.mi) AS ad
  FROM d a JOIN d b ON b.event_type = a.event_type AND b.day > a.day)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MEDIAN(ad) / 1000.0, 6) AS median_pair_diff,
       ROUND(CAST(SUM(ad) AS DOUBLE) / COUNT(*) / 1000.0, 6)
         AS mean_pair_diff
FROM p GROUP BY 1
"""


def q_pairwise_scale(sf_dir: str):
    """Rousseeuw-style pairwise robust scale per series: the median
    and mean of |x_i − x_j| over ALL day pairs of the daily-mean
    sequence (the Qn/Sn family's core statistic — a 50%-breakdown
    scale estimate needing no location).  The pair space is
    |days|²/2 per type — bounded by the calendar, enumerated on the
    driver from the shared milli series; every |Δ| is an exact int,
    so median (int or +0.5) and mean (int sum / n) are bit-identical
    cross-engine before the closing unit conversion."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "np_": [], "md": [], "mn": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        if len(mi) < 2:
            continue
        diff = np.abs(mi[:, None] - mi[None, :])
        iu = np.triu_indices(len(mi), k=1)
        ad = diff[iu]
        rows["et"].append(et)
        rows["np_"].append(len(ad))
        rows["md"].append(float(np.median(ad)) / 1000.0)
        rows["mn"].append(float(int(ad.sum())) / len(ad) / 1000.0)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_pairs": pa.array(rows["np_"], pa.int64()),
        "median_pair_diff": pa.array(rows["md"], pa.float64()),
        "mean_pair_diff": pa.array(rows["mn"], pa.float64()),
    }))


_GEOMEDIAN_U_CTE = """
u AS MATERIALIZED (
  SELECT label, vec_id, d.dim AS dim,
         CAST(FLOOR(ROUND(CAST(embedding[d.dim] AS DOUBLE), 6) * 1000
                    + 0.5) AS BIGINT) AS vi
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS dim) d
  WHERE vec_id IS NOT NULL AND label IS NOT NULL
    AND embedding IS NOT NULL)"""

GEOMEDIAN_SQL = f"""
WITH {_GEOMEDIAN_U_CTE},
y0 AS (
  SELECT label, dim,
         CAST(FLOOR(CAST(SUM(vi) AS DOUBLE) / COUNT(*) + 0.5)
              AS BIGINT) AS y
  FROM u GROUP BY 1, 2),
d1 AS (
  SELECT u.label AS label, u.vec_id AS vec_id,
         SQRT(CAST(SUM((u.vi - y0.y) * (u.vi - y0.y)) AS DOUBLE)) AS d
  FROM u JOIN y0 ON y0.label = u.label AND y0.dim = u.dim
  GROUP BY 1, 2),
w1 AS (
  SELECT u.label AS label, u.dim AS dim,
         SUM(u.vi / d1.d) AS sxd, SUM(1.0 / d1.d) AS sw
  FROM u JOIN d1 ON d1.label = u.label AND d1.vec_id = u.vec_id
  WHERE d1.d > 0 GROUP BY 1, 2),
y1 AS (
  SELECT label, dim,
         CAST(FLOOR(ROUND(sxd / sw, 6) + 0.5) AS BIGINT) AS y
  FROM w1),
d2 AS (
  SELECT u.label AS label, u.vec_id AS vec_id,
         SQRT(CAST(SUM((u.vi - y1.y) * (u.vi - y1.y)) AS DOUBLE)) AS d
  FROM u JOIN y1 ON y1.label = u.label AND y1.dim = u.dim
  GROUP BY 1, 2),
w2 AS (
  SELECT u.label AS label, u.dim AS dim,
         SUM(u.vi / d2.d) AS sxd, SUM(1.0 / d2.d) AS sw
  FROM u JOIN d2 ON d2.label = u.label AND d2.vec_id = u.vec_id
  WHERE d2.d > 0 GROUP BY 1, 2)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       ROUND(sxd / sw / 1000.0, 6) AS geomedian
FROM w2
"""


def q_geometric_median(sf_dir: str):
    """Per-label geometric median of the embedding cloud by two
    Weiszfeld iterations from the (milli-quantized) mean — the robust
    class prototype that, unlike label_centroids' mean, one outlier
    vector cannot drag.  PARITY: the iterate is re-quantized to exact
    milli ints after every step (floor(round6(x)+0.5) — the pagerank/
    PCA iteration discipline), so each distance d_i = sqrt(int) is
    bit-identical cross-engine and sum-order ulps in the Σx/d fold
    cannot compound; exact-coincidence points (d = 0) drop from the
    fold on both sides (the standard Weiszfeld guard).  Each pass
    ships |labels| x dim partials per block — corpus size never
    reaches the driver."""
    import ray
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def _clean(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["vec_id"]),
                            pc.is_valid(batch["label"])),
                    pc.is_valid(batch["embedding"]))
        return batch.filter(m)

    def _vi_lab(batch: pa.Table):
        mat = _emb_matrix(batch, "embedding")
        vi = np.floor(round6_tie_robust(mat) * 1000.0
                      + 0.5).astype(np.int64)
        lab = batch["label"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return vi, lab

    mean_schema = pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                             ("s", pa.int64()), ("n", pa.int64())])

    def _mean_partial(batch: pa.Table) -> pa.Table:
        batch = _clean(batch)
        if len(batch) == 0:
            return mean_schema.empty_table()
        vi, lab = _vi_lab(batch)
        uniq, inv = np.unique(lab, return_inverse=True)
        dim = vi.shape[1]
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, vi)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": np.repeat(uniq, dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                           len(uniq)),
            "s": sums.ravel(), "n": np.repeat(cnt, dim),
        }, schema=mean_schema)

    mp = _collect_raw(ds.map_batches(
        _mean_partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    mg = mp.groupby(["label", "dim"], as_index=False)[["s", "n"]].sum()
    labels = np.sort(mg["label"].unique())
    dim = int(mg["dim"].max())
    y = np.zeros((len(labels), dim), dtype=np.int64)
    li = {int(l_): i for i, l_ in enumerate(labels)}
    y[[li[int(l_)] for l_ in mg["label"]],
      mg["dim"].values.astype(np.int64) - 1] = np.floor(
        mg["s"].values.astype(np.float64)
        / mg["n"].values.astype(np.float64) + 0.5).astype(np.int64)

    w_schema = pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                          ("sxd", pa.float64()), ("sw", pa.float64())])

    def _weiszfeld_pass(y_now: np.ndarray,
                        labels: np.ndarray) -> np.ndarray:
        """One broadcast-y fold: per-block Σ vi/d and Σ 1/d partials."""
        li = {int(l_): i for i, l_ in enumerate(labels)}
        yref = ray.put((y_now, labels))

        def _partial(batch: pa.Table) -> pa.Table:
            batch = _clean(batch)
            if len(batch) == 0:
                return w_schema.empty_table()
            yb, labs = ray.get(yref)
            vi, lab = _vi_lab(batch)
            idx = np.minimum(np.searchsorted(labs, lab),
                             max(len(labs) - 1, 0))
            hit = labs[idx] == lab     # mirror the SQL join: labels
            if not hit.any():          # absent from y drop entirely
                return w_schema.empty_table()
            vi, lab, idx = vi[hit], lab[hit], idx[hit]
            dlt = vi - yb[idx]
            d = np.sqrt((dlt * dlt).sum(axis=1).astype(np.float64))
            keep = d > 0
            if not keep.any():
                return w_schema.empty_table()
            vi, lab, d = vi[keep], lab[keep], d[keep]
            uniq, inv = np.unique(lab, return_inverse=True)
            nd = vi.shape[1]
            sxd = np.zeros((len(uniq), nd))
            np.add.at(sxd, inv, vi / d[:, None])
            sw = np.zeros(len(uniq))
            np.add.at(sw, inv, 1.0 / d)
            return pa.table({
                "label": np.repeat(uniq, nd),
                "dim": np.tile(np.arange(1, nd + 1, dtype=np.int64),
                               len(uniq)),
                "sxd": sxd.ravel(), "sw": np.repeat(sw, nd),
            }, schema=w_schema)

        parts = _collect_raw(ds.map_batches(
            _partial, batch_format="pyarrow",
            zero_copy_batch=True)).to_pandas()
        g = parts.groupby(["label", "dim"], as_index=False)[
            ["sxd", "sw"]].sum()
        raw = np.full((len(labels), dim), np.nan)
        raw[[li[int(l_)] for l_ in g["label"]],
            g["dim"].values.astype(np.int64) - 1] = (
            g["sxd"].values / g["sw"].values)
        return raw

    raw1 = _weiszfeld_pass(y, labels)
    fin = np.isfinite(raw1).all(axis=1)   # a label with no d>0 row has
    labels, raw1 = labels[fin], raw1[fin]  # no y1 row (SQL join drops it)
    y1 = np.floor(round6_tie_robust(raw1) + 0.5).astype(np.int64)
    raw2 = _weiszfeld_pass(y1, labels)
    out_lab = np.repeat(labels, dim)
    out_dim = np.tile(np.arange(1, dim + 1, dtype=np.int64),
                      len(labels))
    gm = raw2.ravel() / 1000.0
    ok = np.isfinite(gm)
    return _collect(pa.table({
        "label": pa.array(out_lab[ok], pa.int64()),
        "dim": pa.array(out_dim[ok], pa.int64()),
        "geomedian": pa.array(gm[ok], pa.float64()),
    }))


_Y1996_US = 820454400000000   # 1996-01-01 epoch-us
_Y1998_US = 883612800000000   # 1998-01-01
_Y1997_US = 852076800000000   # 1997-01-01
_Q2_1997_US = 859852800000000  # 1997-04-01


def _year_of_us(t_us: np.ndarray) -> np.ndarray:
    """Calendar year of epoch-µs ints — exact integer both engines
    (numpy datetime64[Y] mirrors SQL EXTRACT(YEAR ...))."""
    return (t_us.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970)


def _month_of_us(t_us: np.ndarray) -> np.ndarray:
    """yyyymm int of epoch-µs — mirrors EXTRACT(YEAR)*100 + MONTH."""
    m = t_us.astype("datetime64[us]").astype(
        "datetime64[M]").astype(np.int64)
    return (m // 12 + 1970) * 100 + (m % 12 + 1)


VOLUME_SHIPPING_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS volume
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def q_volume_shipping(sf_dir: str):
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between
    two nations (supplier side vs customer side, both directions) per
    ship year.  Engine path: the nation/supplier/customer dimensions
    broadcast as key->nation maps (catalog-scale, collect_small's loud
    gate; the web-scale switch is join_skew_safe on the fact keys);
    the date-windowed orders->cust-nation map collects once; lineitem
    STREAMS with zero exchange — per-block partial sums by
    (supp_nation, cust_nation, year), a 2 x 2 x |years| driver merge.
    Ship year via exact integer datetime64[Y] (mirrors EXTRACT)."""
    import ray.data as rd

    from ..stages.joins import collect_small, semi_join_broadcast

    nation = collect_small(rd.read_parquet(f"{sf_dir}/nation.parquet"))
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    nn = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    want = {"NATION_1", "NATION_2"}
    keys = {int(k): str(n) for k, n in zip(nk, nn) if str(n) in want}
    kset = np.sort(np.array(list(keys), dtype=np.int64))

    supp = collect_small(rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]))
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False)
    sn_ = supp["s_nationkey"].to_numpy(zero_copy_only=False)
    smask = np.isin(sn_, kset)
    s_keys = np.sort(sk[smask])
    s_nat = sn_[smask][np.argsort(sk[smask], kind="stable")]

    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]))
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cn_ = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    cmask = np.isin(cn_, kset)
    cust_tbl = pa.table({"o_custkey": pa.array(ck[cmask], pa.int64()),
                         "c_nationkey": pa.array(cn_[cmask],
                                                 pa.int64())})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    from ..stages.joins import attach_broadcast
    ord_map = collect_small(attach_broadcast(
        semi_join_broadcast(orders, "o_custkey",
                            pa.table({"o_custkey":
                                      cust_tbl["o_custkey"]})),
        cust_tbl, "o_custkey", ["c_nationkey"]).map_batches(
            lambda t: t.select(["o_orderkey", "c_nationkey"]),
            batch_format="pyarrow"))
    o_keys = ord_map["o_orderkey"].to_numpy(zero_copy_only=False)
    o_nat = ord_map["c_nationkey"].to_numpy(zero_copy_only=False)
    oo = np.argsort(o_keys, kind="stable")
    o_keys, o_nat = o_keys[oo], o_nat[oo]
    import ray
    bref = ray.put((s_keys, s_nat, o_keys, o_nat))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount",
                                  "l_shipdate"])
    part_schema = pa.schema([("sn", pa.int64()), ("cn", pa.int64()),
                             ("l_year", pa.int64()),
                             ("vol", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64())
        keep = pc.and_(pc.and_(pc.is_valid(ts),
                               pc.greater_equal(ts, _Y1996_US)),
                       pc.less(ts, _Y1998_US))
        batch = batch.filter(keep)
        if len(batch) == 0:
            return part_schema.empty_table()
        skeys, snat, okeys, onat = ray.get(bref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        lok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        if not len(skeys) or not len(okeys):
            return part_schema.empty_table()
        si = np.minimum(np.searchsorted(skeys, lsk), len(skeys) - 1)
        oi = np.minimum(np.searchsorted(okeys, lok), len(okeys) - 1)
        hit = (skeys[si] == lsk) & (okeys[oi] == lok)
        if not hit.any():
            return part_schema.empty_table()
        sn2 = snat[si[hit]]
        cn2 = onat[oi[hit]]
        cross = sn2 != cn2          # the two-direction Q7 predicate
        if not cross.any():
            return part_schema.empty_table()
        sub = batch.filter(pa.array(hit))
        t_us = sub["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)[cross]
        ep = sub["l_extendedprice"].to_numpy(
            zero_copy_only=False)[cross]
        dc = sub["l_discount"].to_numpy(zero_copy_only=False)[cross]
        t = pa.table({"sn": pa.array(sn2[cross], pa.int64()),
                      "cn": pa.array(cn2[cross], pa.int64()),
                      "l_year": pa.array(_year_of_us(t_us), pa.int64()),
                      "vol": pa.array(ep * (1.0 - dc), pa.float64())})
        g = t.group_by(["sn", "cn", "l_year"]).aggregate([("vol",
                                                           "sum")])
        return g.rename_columns(["sn", "cn", "l_year", "vol"]).cast(
            part_schema)

    parts = _collect_raw(li.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = parts.groupby(["sn", "cn", "l_year"], as_index=False)[
        "vol"].sum()
    return _collect(pa.table({
        "supp_nation": pa.array([keys[int(k)] for k in agg["sn"]],
                                pa.string()),
        "cust_nation": pa.array([keys[int(k)] for k in agg["cn"]],
                                pa.string()),
        "l_year": pa.array(agg["l_year"].values, pa.int64()),
        "volume": pa.array(agg["vol"].values, pa.float64()),
    }))


PROMO_SHARE_SQL = """
SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) * 100
            + EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT) AS month,
       ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END), 6) AS promo_rev,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
         AS total_rev,
       ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice
                                   * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
         AS promo_share
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q_promo_share(sf_dir: str):
    """TPC-H Q14-shaped promotion-revenue share per ship month: the
    percent of monthly revenue carried by PROMO-type parts.  The part
    dimension broadcasts as a sorted promo-flag key set (catalog-scale
    under collect_small's gate); lineitem streams one windowed pass
    with per-block (month, promo_rev, total_rev) partials — a
    12-row driver merge; the share divides the UNROUNDED merged sums
    exactly as the oracle does."""
    import ray
    import ray.data as rd

    from ..stages.joins import collect_small

    part = collect_small(rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]))
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    promo = np.asarray(
        [t == "PROMO" for t in part["p_type"].to_pylist()], dtype=bool)
    po = np.argsort(pk, kind="stable")
    pk, promo = pk[po], promo[po]
    bref = ray.put((pk, promo))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    part_schema = pa.schema([("month", pa.int64()),
                             ("sp", pa.float64()),
                             ("st", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.int64())
        keep = pc.and_(pc.and_(pc.is_valid(ts),
                               pc.greater_equal(ts, _Y1997_US)),
                       pc.less(ts, _Y1998_US))
        batch = batch.filter(keep)
        if len(batch) == 0:
            return part_schema.empty_table()
        keys, flag = ray.get(bref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pi = np.minimum(np.searchsorted(keys, lpk), len(keys) - 1)
        hit = keys[pi] == lpk        # inner join: unknown parts drop
        if not hit.any():
            return part_schema.empty_table()
        sub = batch.filter(pa.array(hit))
        t_us = sub["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ep = sub["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = sub["l_discount"].to_numpy(zero_copy_only=False)
        rev = ep * (1.0 - dc)
        isp = flag[pi[hit]]
        t = pa.table({"month": pa.array(_month_of_us(t_us), pa.int64()),
                      "sp": pa.array(np.where(isp, rev, 0.0)),
                      "st": pa.array(rev, pa.float64())})
        g = t.group_by(["month"]).aggregate([("sp", "sum"),
                                             ("st", "sum")])
        return g.rename_columns(["month", "sp", "st"]).cast(part_schema)

    parts = _collect_raw(li.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = parts.groupby("month", as_index=False)[["sp", "st"]].sum()
    return _collect(pa.table({
        "month": pa.array(agg["month"].values, pa.int64()),
        "promo_rev": pa.array(agg["sp"].values, pa.float64()),
        "total_rev": pa.array(agg["st"].values, pa.float64()),
        "promo_share": pa.array(100.0 * agg["sp"].values
                                / agg["st"].values, pa.float64()),
    }))


RETURNS_TOPK_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-04-01'),
r AS (
  SELECT o.o_custkey AS c_custkey,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY 1)
SELECT c_custkey, c_name, return_rev, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT r.c_custkey, c.c_name, ROUND(r.rev, 6) AS return_rev,
         ROW_NUMBER() OVER (
           ORDER BY CAST(FLOOR(ROUND(r.rev, 6) * 1e6 + 0.5)
                         AS BIGINT) DESC, r.c_custkey) AS rn
  FROM r JOIN customer c ON c.c_custkey = r.c_custkey)
WHERE rn <= 20
"""


def q_returns_topk(sf_dir: str):
    """TPC-H Q10-shaped returned-item losers: top 20 customers by
    revenue of RETURNED lineitems against a one-quarter order window.
    The windowed orders->customer map collects under the loud gate
    (fact-scale at crawl size: join_skew_safe is the documented
    switch); lineitem streams with per-block per-customer combiners,
    ONE keyed exchange sums, and the global top-20 rides
    top_k_by_key's two-level partial top-k ranked on exact micro-unit
    ints AFTER the two-step round (the shipping_priority ordering
    discipline)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..kernels.rounding import round6_tie_robust
    from ..stages.joins import (attach_broadcast, collect_small,
                                semi_join_broadcast)
    from ..stages.topk import top_k_by_key

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def _win(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64())
        keep = pc.and_(pc.and_(pc.is_valid(ts),
                               pc.greater_equal(ts, _Y1997_US)),
                       pc.less(ts, _Q2_1997_US))
        batch = batch.filter(keep)
        return pa.table({"l_orderkey": batch["o_orderkey"],
                         "c_custkey": batch["o_custkey"]})

    ord_map = collect_small(orders.map_batches(
        _win, batch_format="pyarrow", zero_copy_batch=True))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_returnflag"])

    def _rev(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        t = pa.table({"l_orderkey": batch["l_orderkey"],
                      "rev": pa.array(ep * (1.0 - dc), pa.float64())})
        return t.group_by(["l_orderkey"]).aggregate(
            [("rev", "sum")]).rename_columns(["l_orderkey", "rev"])

    fact = attach_broadcast(
        semi_join_broadcast(
            li.map_batches(_rev, batch_format="pyarrow",
                           zero_copy_batch=True),
            "l_orderkey",
            pa.table({"l_orderkey": ord_map["l_orderkey"]})),
        ord_map, "l_orderkey", ["c_custkey"])
    sums = fact.groupby("c_custkey").aggregate(
        Sum("rev", alias_name="rev"))

    def _rank_prep(batch: pa.Table) -> pa.Table:
        rev = round6_tie_robust(
            batch["rev"].to_numpy(zero_copy_only=False))
        return pa.table({
            "g": pa.array(np.zeros(len(batch), np.int64)),
            "c_custkey": batch["c_custkey"],
            "return_rev": pa.array(rev, pa.float64()),
            "micro": pa.array(np.floor(rev * 1e6 + 0.5).astype(
                np.int64), pa.int64()),
        })

    ranked = top_k_by_key(
        sums.map_batches(_rank_prep, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["g"], "micro", 20, tiebreak_col="c_custkey", descending=True)
    cust = collect_small(rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]))
    out = attach_broadcast(ranked, cust, "c_custkey", ["c_name"])
    return _collect(out.map_batches(
        lambda t: t.select(["c_custkey", "c_name", "return_rev",
                            "rn"]),
        batch_format="pyarrow"))


BRAND_SUPPLIERS_SQL = """
SELECT p.p_brand AS p_brand,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS part_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
"""


def q_brand_suppliers(sf_dir: str):
    """TPC-H Q16-shaped catalog breadth: distinct suppliers and parts
    observed shipping each brand.  The part dimension broadcasts as a
    sorted partkey->brand map; blocks pre-distinct their
    (brand, suppkey, partkey) triples (the exact-distinct discipline —
    duplicate shipments collapse before anything moves), ONE keyed
    exchange dedups globally, and the per-brand distinct counts fold
    in-group.  All integers."""
    import ray
    import ray.data as rd

    from ..stages.joins import collect_small
    from ..stages.sorted_groups import _runs, sorted_group_map

    part = collect_small(rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]))
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    pb = np.asarray(part["p_brand"].to_pylist(), dtype=object)
    po = np.argsort(pk, kind="stable")
    pk, pb = pk[po], pb[po]
    bref = ray.put((pk, np.array([str(x) for x in pb])))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    pair_schema = pa.schema([("p_brand", pa.string()),
                             ("l_suppkey", pa.int64()),
                             ("l_partkey", pa.int64())])

    def _pairs(batch: pa.Table) -> pa.Table:
        keys, brands = ray.get(bref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pi = np.minimum(np.searchsorted(keys, lpk), len(keys) - 1)
        hit = keys[pi] == lpk
        if not hit.any():
            return pair_schema.empty_table()
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[hit]
        br = brands[pi[hit]]
        pkv = lpk[hit]
        t = pa.table({"p_brand": pa.array(br, pa.string()),
                      "l_suppkey": pa.array(lsk, pa.int64()),
                      "l_partkey": pa.array(pkv, pa.int64())})
        g = t.group_by(["p_brand", "l_suppkey",
                        "l_partkey"]).aggregate([([], "count_all")])
        return g.drop_columns(["count_all"]).cast(pair_schema)

    pairs = li.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    out_schema = pa.schema([("p_brand", pa.string()),
                            ("supplier_cnt", pa.int64()),
                            ("part_cnt", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["p_brand"])
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pk_ = batch["l_partkey"].to_numpy(zero_copy_only=False)
        idx = pa.array(starts, pa.int64())
        scnt = [len(np.unique(sk[s:e])) for s, e in zip(starts, ends)]
        pcnt = [len(np.unique(pk_[s:e])) for s, e in zip(starts, ends)]
        return pa.table({
            "p_brand": batch["p_brand"].take(idx),
            "supplier_cnt": pa.array(scnt, pa.int64()),
            "part_cnt": pa.array(pcnt, pa.int64())}, schema=out_schema)

    return _collect(sorted_group_map(pairs, ["p_brand"], None,
                                     out_schema, block_fn=_fold))


MARKOV_ENTROPY_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL),
pr AS (
  SELECT event_type AS f, nxt AS t, COUNT(*) AS nft
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
pf AS (SELECT f, SUM(nft) AS nf FROM pr GROUP BY 1),
tot AS (SELECT SUM(nft) AS n FROM pr),
hrow AS (
  SELECT pr.f AS f, pf.nf AS nf,
         SUM((pr.nft * 1.0 / pf.nf)
             * LN(pr.nft * 1.0 / pf.nf) ORDER BY pr.t) AS negh
  FROM pr JOIN pf USING (f) GROUP BY 1, 2)
SELECT f AS event_type, CAST(nf AS BIGINT) AS n_from,
       ROUND(-negh, 6) AS row_entropy,
       ROUND(SUM(-(nf * 1.0 / tot.n) * negh)
               OVER () / LN(2.0), 6) AS entropy_rate_bits
FROM hrow, tot
"""


def q_markov_entropy_rate(sf_dir: str):
    """Entropy rate of the corpus-global first-order Markov chain over
    event types (the sequence-compressibility ceiling the
    markov_perplexity scores are measured against): per-state
    conditional entropies H(next | from) weighted by the empirical
    state frequencies, in bits.  Everything derives from the
    transition count table — a |types|² driver merge of per-block
    pair partials riding the SAME user-keyed exchange as
    markov_perplexity; each p·ln p term divides exact ints and the
    per-row fold runs in next-state order on both engines."""
    import ray

    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_id",
                                  "event_type"])
    grp_schema = pa.schema([("user_id", pa.int64()),
                            ("ts", pa.timestamp("us")),
                            ("event_id", pa.int64()),
                            ("event_type", pa.string())])
    grouped = sorted_group_map(ds, ["user_id"], None, grp_schema,
                               block_fn=lambda b: b.cast(grp_schema))
    cnt_schema = pa.schema([("f", pa.string()), ("t", pa.string()),
                            ("nft", pa.int64())])

    def _count_partial(batch: pa.Table) -> pa.Table:
        if len(batch) < 2:
            return cnt_schema.empty_table()
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        ts_ = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts_, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]
        fr, to = et[:-1][same], et[1:][same]
        if not len(fr):
            return cnt_schema.empty_table()
        t = pa.table({"f": fr, "t": to})
        g = t.group_by(["f", "t"]).aggregate([([], "count_all")])
        return g.rename_columns(["f", "t", "nft"]).cast(cnt_schema)

    counts = _collect_raw(grouped.map_batches(
        _count_partial, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)).to_pandas().groupby(
        ["f", "t"], as_index=False)["nft"].sum()
    n_all = int(counts["nft"].sum())
    rows = {"f": [], "nf": [], "h": []}
    for f, sub in counts.sort_values(["f", "t"]).groupby("f",
                                                         sort=True):
        nf = int(sub["nft"].sum())
        p = sub["nft"].values.astype(np.float64) * 1.0 / nf
        negh = float((p * np.log(p)).sum())
        rows["f"].append(f)
        rows["nf"].append(nf)
        rows["h"].append(negh)
    nfv = np.array(rows["nf"], dtype=np.float64)
    nh = np.array(rows["h"], dtype=np.float64)
    rate = float((-(nfv * 1.0 / n_all) * nh).sum()) / np.log(2.0)
    return _collect(pa.table({
        "event_type": pa.array(rows["f"], pa.string()),
        "n_from": pa.array(rows["nf"], pa.int64()),
        "row_entropy": pa.array(round6_tie_robust(-nh)),
        "entropy_rate_bits": pa.array(
            round6_tie_robust(np.full(len(nh), rate))),
    }))


GUMBEL_MAXIMA_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
blk AS (
  SELECT event_type, day // 7 AS blk, MAX(mi) AS bm
  FROM d GROUP BY 1, 2),
m AS (
  SELECT event_type, COUNT(*) AS k, SUM(bm) AS sb, SUM(bm * bm) AS qb
  FROM blk GROUP BY 1)
SELECT event_type, CAST(k AS BIGINT) AS n_blocks,
       ROUND(CAST(sb AS DOUBLE) / k / 1000.0, 6) AS max_mean,
       ROUND(SQRT(CAST(k * qb - sb * sb AS DOUBLE)
                  / CAST(k * (k - 1) AS DOUBLE))
             * SQRT(6.0) / PI() / 1000.0, 6) AS gumbel_beta,
       ROUND((CAST(sb AS DOUBLE) / k
              - 0.5772156649015329
                * SQRT(CAST(k * qb - sb * sb AS DOUBLE)
                       / CAST(k * (k - 1) AS DOUBLE))
                * SQRT(6.0) / PI()) / 1000.0, 6) AS gumbel_mu
FROM m WHERE k > 1
"""


def q_gumbel_maxima(sf_dir: str):
    """Gumbel extreme-value fit by block maxima + method of moments —
    the classical EVT companion to pot_clusters: weekly maxima of each
    series' daily mean, then β = s·√6/π and μ = m − γβ (γ =
    Euler–Mascheroni) from the block-maxima moments.  The maxima and
    their moment sums are exact ints off the shared milli series
    (sample std via the k·Q − S² identity), so both engines feed
    IDENTICAL doubles into the same two-constant chain; driver work
    is |types| x |weeks|."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "k": [], "mm": [], "b": [], "mu": []}
    for et in sorted(series):
        days, mi, _ = series[et]
        blk = days // 7
        order = np.argsort(blk, kind="stable")
        blk, v = blk[order], mi[order]
        first = np.empty(len(blk), dtype=bool)
        first[0] = True
        first[1:] = blk[1:] != blk[:-1]
        starts = np.nonzero(first)[0]
        bm = np.maximum.reduceat(v, starts)
        k = len(bm)
        if k < 2:
            continue
        sb = int(bm.sum())
        qb = int((bm.astype(np.int64) ** 2).sum())
        mean = float(sb) / k
        s = np.sqrt(float(k * qb - sb * sb) / float(k * (k - 1)))
        beta = s * np.sqrt(6.0) / np.pi
        mu = mean - 0.5772156649015329 * beta
        rows["et"].append(et)
        rows["k"].append(k)
        rows["mm"].append(mean / 1000.0)
        rows["b"].append(beta / 1000.0)
        rows["mu"].append(mu / 1000.0)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_blocks": pa.array(rows["k"], pa.int64()),
        "max_mean": pa.array(round6_tie_robust(
            np.array(rows["mm"], np.float64))),
        "gumbel_beta": pa.array(round6_tie_robust(
            np.array(rows["b"], np.float64))),
        "gumbel_mu": pa.array(round6_tie_robust(
            np.array(rows["mu"], np.float64))),
    }))


RECORD_DAYS_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
r AS (
  SELECT event_type, day, mi,
         MAX(mi) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prev_max
  FROM d)
SELECT event_type,
       CAST(SUM(CASE WHEN prev_max IS NULL OR mi > prev_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
       CAST(MAX(CASE WHEN prev_max IS NULL OR mi > prev_max
                     THEN day END) AS BIGINT) AS last_record_day,
       CAST(MAX(mi) AS BIGINT) AS running_max_milli
FROM r GROUP BY 1
"""


def q_record_days(sf_dir: str):
    """Record statistics per series: how many days set a new running
    maximum of the daily mean, when the last record fell, and the
    final maximum — the 'is the series still making highs' readout
    (record counts also calibrate i.i.d.-ness: ~H_n records expected
    under exchangeability).  Strict integer compares on the shared
    milli series; |types| x |days| driver walk."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "n": [], "last": [], "mx": []}
    for et in sorted(series):
        days, mi, _ = series[et]
        run = np.maximum.accumulate(mi)
        rec = np.empty(len(mi), dtype=bool)
        rec[0] = True
        rec[1:] = mi[1:] > run[:-1]
        rows["et"].append(et)
        rows["n"].append(int(rec.sum()))
        rows["last"].append(int(days[np.nonzero(rec)[0][-1]]))
        rows["mx"].append(int(run[-1]))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_records": pa.array(rows["n"], pa.int64()),
        "last_record_day": pa.array(rows["last"], pa.int64()),
        "running_max_milli": pa.array(rows["mx"], pa.int64()),
    }))


CHURN_LABELS_SQL = """
WITH v AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
mm AS (SELECT (MIN(day) + MAX(day)) // 2 AS thr FROM v),
u AS (
  SELECT user_id,
         COUNT(DISTINCT CASE WHEN day <= (SELECT thr FROM mm)
                             THEN day END) AS days_a,
         COUNT(DISTINCT CASE WHEN day > (SELECT thr FROM mm)
                             THEN day END) AS days_b
  FROM v GROUP BY 1)
SELECT user_id, CAST(days_a AS BIGINT) AS days_a,
       CAST(days_b AS BIGINT) AS days_b,
       CAST(CASE WHEN days_b = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS churned
FROM u WHERE days_a > 0
"""


def q_churn_labels(sf_dir: str):
    """Churn-label construction — the supervised-training-set builder:
    users active in the first timeline half (midpoint-day split),
    labeled churned iff silent in the second half, with distinct-active-
    day counts as base features.  One user-keyed exchange; blocks emit
    distinct (user, day) pairs first (the exact-distinct discipline),
    the per-user fold is an in-group unique split.  All integers."""
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts"])
    pair_schema = pa.schema([("user_id", pa.int64()),
                             ("day", pa.int64())])

    def _pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch["user_id"].cast(pa.int64()),
                      "day": pc.divide(batch["ts"].cast(pa.int64()),
                                       _DAY_US)})
        g = t.group_by(["user_id", "day"]).aggregate(
            [([], "count_all")])
        return g.drop_columns(["count_all"]).cast(pair_schema)

    pairs = ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    mm = _collect_raw(pairs.map_batches(
        lambda t: pa.table({"lo": pa.array(
            [pc.min(t["day"]).as_py()], pa.int64()),
            "hi": pa.array([pc.max(t["day"]).as_py()], pa.int64())}),
        batch_format="pyarrow"))
    thr = (int(pc.min(mm["lo"]).as_py())
           + int(pc.max(mm["hi"]).as_py())) // 2
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("days_a", pa.int64()),
                            ("days_b", pa.int64()),
                            ("churned", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["user_id"])
        day = batch["day"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        da, db = [], []
        for s, e in zip(starts, ends):
            d = np.unique(day[s:e])
            da.append(int((d <= thr).sum()))
            db.append(int((d > thr).sum()))
        da = np.array(da, dtype=np.int64)
        db = np.array(db, dtype=np.int64)
        keep = da > 0
        return pa.table({
            "user_id": pa.array(uid[starts][keep], pa.int64()),
            "days_a": pa.array(da[keep], pa.int64()),
            "days_b": pa.array(db[keep], pa.int64()),
            "churned": pa.array((db[keep] == 0).astype(np.int64),
                                pa.int64())}, schema=out_schema)

    return _collect(sorted_group_map(pairs, ["user_id"], None,
                                     out_schema, block_fn=_fold))


INEQUALITY_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
h AS (SELECT event_type, vi, COUNT(*) AS n FROM v WHERE vi > 0
      GROUP BY 1, 2),
m AS (
  SELECT event_type, SUM(n) AS nn, SUM(n * vi) AS s,
         SUM(n * vi * vi) AS q,
         SUM(n * (vi * LN(CAST(vi AS DOUBLE)))) AS a
  FROM h GROUP BY 1),
d AS (
  SELECT h.event_type AS event_type,
         SUM(h.n * ABS(h.vi - CAST(m.s AS DOUBLE) / m.nn)) AS adev
  FROM h JOIN m USING (event_type) GROUP BY 1)
SELECT m.event_type AS event_type, CAST(m.nn AS BIGINT) AS n,
       ROUND(m.a / m.s - LN(CAST(m.s AS DOUBLE) / m.nn), 6)
         AS theil_t,
       ROUND(d.adev / (2.0 * m.s), 6) AS hoover,
       ROUND(SQRT(CAST(m.nn * m.q - m.s * m.s AS DOUBLE)
                  / CAST(m.nn * (m.nn - 1) AS DOUBLE))
             / (CAST(m.s AS DOUBLE) / m.nn), 6) AS cv
FROM m JOIN d USING (event_type)
WHERE m.nn > 1
"""


def q_inequality_indices(sf_dir: str):
    """Theil-T, Hoover (Robin Hood) index and coefficient of variation
    of each series' positive values — the inequality/concentration
    triple complementing gini_events and hhi_users.  All three fold
    from the DISTINCT-VALUE histogram of the milli quantization (the
    mannwhitney_u exchange shape — micro-bounded, never row scale):
    S, N, Q are exact ints; Theil's Σ n·v·ln v and Hoover's
    Σ n·|v − μ| run per distinct value with identical elementwise op
    order, and sum-order ulps land only in the rounded outputs."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("vi", pa.int64()), ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "vi": pa.array(vi, pa.int64())})
        t = t.filter(pc.greater(t["vi"], 0))
        g = t.group_by(["event_type", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "vi", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    hist = parts.groupby(["event_type", "vi"], as_index=False)[
        "n"].sum()
    rows = {"et": [], "n": [], "th": [], "ho": [], "cv": []}
    for et, sub in hist.sort_values(["event_type", "vi"]).groupby(
            "event_type", sort=True):
        v = sub["vi"].values.astype(np.int64)
        n = sub["n"].values.astype(np.int64)
        nn = int(n.sum())
        if nn < 2:
            continue
        s = int((n * v).sum())
        q = int((n * v * v).sum())
        a = float((n * (v * np.log(v.astype(np.float64)))).sum())
        mu = float(s) / nn
        adev = float((n * np.abs(v - mu)).sum())
        std = np.sqrt(float(nn * q - s * s) / float(nn * (nn - 1)))
        rows["et"].append(et)
        rows["n"].append(nn)
        rows["th"].append(a / s - np.log(float(s) / nn))
        rows["ho"].append(adev / (2.0 * s))
        rows["cv"].append(std / mu)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "theil_t": pa.array(round6_tie_robust(
            np.array(rows["th"], np.float64))),
        "hoover": pa.array(round6_tie_robust(
            np.array(rows["ho"], np.float64))),
        "cv": pa.array(round6_tie_robust(
            np.array(rows["cv"], np.float64))),
    }))


CIRCULAR_HOUR_SQL = """
WITH v AS (
  SELECT event_type,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hour
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
h AS (SELECT event_type, hour, COUNT(*) AS n FROM v GROUP BY 1, 2),
m AS (
  SELECT event_type, SUM(n) AS nn,
         SUM(n * COS(2 * PI() * hour / 24) ORDER BY hour) AS c,
         SUM(n * SIN(2 * PI() * hour / 24) ORDER BY hour) AS s
  FROM h GROUP BY 1)
SELECT event_type, CAST(nn AS BIGINT) AS n,
       ROUND(SQRT(c * c + s * s) / nn, 6) AS resultant,
       ROUND(((ATAN2(s, c) / (2 * PI()) * 24 + 24) % 24), 6)
         AS peak_hour
FROM m
"""


def q_circular_hour_stats(sf_dir: str):
    """Circular (von Mises-style) hour-of-day statistics per series:
    the mean-resultant length R (0 = uniform around the clock, 1 = one
    spike — the concentration readout hourly_entropy approximates) and
    the circular-mean peak hour.  Folds from the bounded
    |types| x 24 hour histogram; the trig terms hit at most 24
    distinct angles with identical op order and an ORDERED fold on
    both engines, and atan2 sees bit-identical (s, c)."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts"])
    _HOUR_US = 3_600_000_000
    part_schema = pa.schema([("event_type", pa.string()),
                             ("hour", pa.int64()), ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = (t_us % _DAY_US) // _HOUR_US
        t = pa.table({"event_type": batch["event_type"],
                      "hour": pa.array(hour, pa.int64())})
        g = t.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "hour", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    hist = parts.groupby(["event_type", "hour"], as_index=False)[
        "n"].sum()
    rows = {"et": [], "n": [], "r": [], "ph": []}
    for et, sub in hist.sort_values(["event_type", "hour"]).groupby(
            "event_type", sort=True):
        h = sub["hour"].values.astype(np.float64)
        n = sub["n"].values.astype(np.float64)
        ang = 2 * np.pi * h / 24
        c = float((n * np.cos(ang)).sum())
        s = float((n * np.sin(ang)).sum())
        nn = int(n.sum())
        rows["et"].append(et)
        rows["n"].append(nn)
        rows["r"].append(np.sqrt(c * c + s * s) / nn)
        rows["ph"].append((np.arctan2(s, c) / (2 * np.pi) * 24
                           + 24) % 24)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "resultant": pa.array(round6_tie_robust(
            np.array(rows["r"], np.float64))),
        "peak_hour": pa.array(round6_tie_robust(
            np.array(rows["ph"], np.float64))),
    }))


BEHAVIOR_KAPPA_SQL = """
WITH v AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL),
mm AS (SELECT (MIN(day) + MAX(day)) // 2 AS thr FROM v),
c AS (
  SELECT user_id,
         CASE WHEN day <= (SELECT thr FROM mm) THEN 1 ELSE 2 END
           AS period,
         event_type, COUNT(*) AS n
  FROM v GROUP BY 1, 2, 3),
m AS (
  SELECT user_id, period, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, period
                            ORDER BY n DESC, event_type) AS rn
  FROM c),
lab AS (SELECT user_id, period, event_type FROM m WHERE rn = 1),
ab AS (
  SELECT a.user_id AS user_id, a.event_type AS la, b.event_type AS lb
  FROM lab a JOIN lab b ON b.user_id = a.user_id
  WHERE a.period = 1 AND b.period = 2),
tot AS (SELECT COUNT(*) AS nu,
               SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree
        FROM ab),
marg AS (
  SELECT SUM((na * 1.0 / nu) * (nb * 1.0 / nu) ORDER BY cls) AS pe
  FROM (
    SELECT COALESCE(a.cls, b.cls) AS cls,
           COALESCE(a.n, 0) AS na, COALESCE(b.n, 0) AS nb, tot.nu AS nu
    FROM (SELECT la AS cls, COUNT(*) AS n FROM ab GROUP BY 1) a
    FULL JOIN (SELECT lb AS cls, COUNT(*) AS n FROM ab GROUP BY 1) b
      ON b.cls = a.cls
    CROSS JOIN tot))
SELECT CAST(tot.nu AS BIGINT) AS n_users,
       ROUND(tot.agree * 1.0 / tot.nu, 6) AS po,
       ROUND(marg.pe, 6) AS pe,
       ROUND((tot.agree * 1.0 / tot.nu - marg.pe)
             / (1 - marg.pe), 6) AS kappa
FROM tot, marg
"""


def q_behavior_kappa(sf_dir: str):
    """Cohen's kappa for behavioral consistency: each user's MODAL
    event type in the first vs second timeline half (midpoint-day
    split; ties break to the lexicographically smallest type), scored
    as two raters labeling the same users — chance-corrected agreement
    near 0 means the 'dominant behavior' feature is not stable enough
    to train on.  Engine path: ONE user-keyed exchange; each
    group-aligned block resolves its users' modal pair (la, lb)
    in-block and emits the |types|² pair-count matrix partial — user
    count never reaches the driver.  po, pe and kappa derive from
    exact integer counts (pe folds in class order on both engines)."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["user_id", "ts", "event_type"])

    def _proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "day": pc.divide(batch["ts"].cast(pa.int64()), _DAY_US),
            "event_type": batch["event_type"]})

    proj = ds.map_batches(_proj, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    mm = _collect_raw(proj.map_batches(
        lambda t: pa.table({"lo": pa.array(
            [pc.min(t["day"]).as_py()], pa.int64()),
            "hi": pa.array([pc.max(t["day"]).as_py()], pa.int64())}),
        batch_format="pyarrow"))
    thr = (int(pc.min(mm["lo"]).as_py())
           + int(pc.max(mm["hi"]).as_py())) // 2
    pair_schema = pa.schema([("la", pa.string()), ("lb", pa.string()),
                             ("n", pa.int64())])

    def _modal(uid, per, et):
        """(user, period, type) rows -> per (user, period) modal type
        with (count desc, type asc) tie-break; returns dict."""
        # "|" separator — numpy U-string ops silently DROP embedded
        # \x00 (it is the padding terminator), so NUL keys never match
        key = np.char.add(np.char.add(uid.astype(str), "|"),
                          per.astype(str))
        t = pa.table({"k": key, "et": et})
        g = t.group_by(["k", "et"]).aggregate([([], "count_all")])
        k = np.asarray(g["k"].to_pylist(), dtype=object)
        e = np.asarray(g["et"].to_pylist(), dtype=object)
        n = g["count_all"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, -n, k))
        k, e = k[order], e[order]
        first = np.empty(len(k), dtype=bool)
        if not len(k):
            return {}
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        starts = np.nonzero(first)[0]
        return {k[i]: e[i] for i in starts}

    def _block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pair_schema.empty_table()
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = batch["day"].to_numpy(zero_copy_only=False)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        per = np.where(day <= thr, 1, 2)
        modal = _modal(uid, per, et)
        las, lbs = [], []
        for u in np.unique(uid):
            ka, kb = f"{u}|1", f"{u}|2"
            if ka in modal and kb in modal:
                las.append(modal[ka])
                lbs.append(modal[kb])
        if not las:
            return pair_schema.empty_table()
        t = pa.table({"la": pa.array(las, pa.string()),
                      "lb": pa.array(lbs, pa.string())})
        g = t.group_by(["la", "lb"]).aggregate([([], "count_all")])
        return g.rename_columns(["la", "lb", "n"]).cast(pair_schema)

    mat = _collect_raw(sorted_group_map(
        proj, ["user_id"], None, pair_schema,
        block_fn=_block)).to_pandas().groupby(
        ["la", "lb"], as_index=False)["n"].sum()
    nu = int(mat["n"].sum())
    agree = int(mat.loc[mat["la"] == mat["lb"], "n"].sum())
    na = mat.groupby("la")["n"].sum()
    nb = mat.groupby("lb")["n"].sum()
    classes = sorted(set(na.index) | set(nb.index))
    pe = 0.0
    for cls in classes:
        pe += ((int(na.get(cls, 0)) * 1.0 / nu)
               * (int(nb.get(cls, 0)) * 1.0 / nu))
    po = agree * 1.0 / nu
    return _collect(pa.table({
        "n_users": pa.array([nu], pa.int64()),
        "po": pa.array(round6_tie_robust(np.array([po]))),
        "pe": pa.array(round6_tie_robust(np.array([pe]))),
        "kappa": pa.array(round6_tie_robust(
            np.array([(po - pe) / (1 - pe)]))),
    }))


STREAK_STATS_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
md AS (SELECT event_type, MEDIAN(mi) AS med FROM d GROUP BY 1),
f AS (
  SELECT d.event_type AS event_type, d.day AS day,
         CASE WHEN d.mi > md.med THEN 1 ELSE 0 END AS above
  FROM d JOIN md USING (event_type)),
g AS (
  SELECT event_type, above,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
         - ROW_NUMBER() OVER (PARTITION BY event_type, above
                              ORDER BY day) AS grp
  FROM f),
runs AS (
  SELECT event_type, above, grp, COUNT(*) AS len
  FROM g GROUP BY 1, 2, 3)
SELECT event_type,
       CAST(COUNT(CASE WHEN above = 1 THEN 1 END) AS BIGINT)
         AS n_runs_above,
       CAST(COALESCE(MAX(CASE WHEN above = 1 THEN len END), 0)
            AS BIGINT) AS longest_above,
       CAST(COALESCE(MAX(CASE WHEN above = 0 THEN len END), 0)
            AS BIGINT) AS longest_below
FROM runs GROUP BY 1
"""


def q_streak_stats(sf_dir: str):
    """Run-length (gaps-and-islands) statistics per series: the number
    of above-median runs and the longest streaks above/below the
    series' own median of daily means — momentum/persistence readouts
    that complement runs_test's sign statistic.  The median over exact
    milli ints is an int or int+0.5, so every day's above/below flag
    is a bit-exact compare; run lengths fold on the bounded
    |types| x |days| driver series."""
    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "nr": [], "la": [], "lb": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        med = np.median(mi)
        above = mi > med
        edge = np.empty(len(mi), dtype=bool)
        edge[0] = True
        edge[1:] = above[1:] != above[:-1]
        starts = np.nonzero(edge)[0]
        lens = np.diff(np.append(starts, len(mi)))
        flags = above[starts]
        la = int(lens[flags].max()) if flags.any() else 0
        lb = int(lens[~flags].max()) if (~flags).any() else 0
        rows["et"].append(et)
        rows["nr"].append(int(flags.sum()))
        rows["la"].append(la)
        rows["lb"].append(lb)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_runs_above": pa.array(rows["nr"], pa.int64()),
        "longest_above": pa.array(rows["la"], pa.int64()),
        "longest_below": pa.array(rows["lb"], pa.int64()),
    }))


SENTENCE_STATS_SQL = """
WITH s AS (
  SELECT lang, UNNEST(regexp_split_to_array(text, '[.!?]+')) AS sent
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
w AS (
  SELECT lang,
         LEN(LIST_FILTER(regexp_split_to_array(lower(sent),
                                               '[^a-z0-9]+'),
                         x -> x <> '')) AS n_words
  FROM s),
nz AS (SELECT lang, n_words FROM w WHERE n_words > 0)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sentences,
       ROUND(CAST(SUM(n_words) AS DOUBLE) / COUNT(*), 6)
         AS mean_words,
       CAST(MAX(n_words) AS BIGINT) AS max_words
FROM nz GROUP BY 1
"""


def q_sentence_stats(sf_dir: str):
    """Sentence-length profile per language — the style/fluency
    readout text-quality filters threshold on (machine-generated and
    boilerplate text skew short): sentences split on [.!?]+ runs,
    words under the corpus tokenizer, zero-word sentences dropped.
    All-Arrow inside each block (split_pattern_regex for sentences,
    count_substring_regex for the word count — RE2 on both engines),
    per-block (lang, n_words) histogram partials, bounded driver
    merge.  Integer counts; one mean ratio at the output."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    part_schema = pa.schema([("lang", pa.string()),
                             ("n_words", pa.int64()),
                             ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["lang"]),
                                     pc.is_valid(batch["text"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        sents = pc.split_pattern_regex(batch["text"], "[.!?]+")
        lens = pc.list_value_length(sents).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(sents)
        lang = batch["lang"].take(pa.array(np.repeat(
            np.arange(len(batch), dtype=np.int64), lens)))
        nw = pc.count_substring_regex(pc.utf8_lower(flat),
                                      "[a-z0-9]+")
        t = pa.table({"lang": lang, "n_words": nw.cast(pa.int64())})
        t = t.filter(pc.greater(t["n_words"], 0))
        g = t.group_by(["lang", "n_words"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "n_words", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    hist = parts.groupby(["lang", "n_words"], as_index=False)[
        "n"].sum()
    rows = {"lang": [], "ns": [], "mw": [], "mx": []}
    for lang, sub in hist.groupby("lang"):
        n = sub["n"].values.astype(np.int64)
        w = sub["n_words"].values.astype(np.int64)
        ns = int(n.sum())
        rows["lang"].append(lang)
        rows["ns"].append(ns)
        rows["mw"].append(float(int((n * w).sum())) / ns)
        rows["mx"].append(int(w.max()))
    return _collect(pa.table({
        "lang": pa.array(rows["lang"], pa.string()),
        "n_sentences": pa.array(rows["ns"], pa.int64()),
        "mean_words": pa.array(rows["mw"], pa.float64()),
        "max_words": pa.array(rows["mx"], pa.int64()),
    }))


ORDER_SHIP_SPAN_SQL = """
WITH o AS (
  SELECT l_orderkey,
         (epoch_us(MAX(l_shipdate)) // 86400000000
          - epoch_us(MIN(l_shipdate)) // 86400000000) AS span_days
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
  GROUP BY 1)
SELECT CAST(span_days // 7 AS BIGINT) AS span_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(span_days) AS DOUBLE) / COUNT(*), 6)
         AS mean_span_days
FROM o GROUP BY 1
"""


def q_order_ship_span(sf_dir: str):
    """Order fulfilment-span histogram: days between an order's first
    and last lineitem shipment, bucketed by week — the logistics
    long-tail readout (multi-shipment orders stretch the right tail).
    Per-block (order, min, max) combiners collapse before ONE
    order-keyed exchange resolves cross-block orders; spans then fold
    into a bounded |weeks| histogram.  All integer day arithmetic."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    part_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("lo", pa.int64()), ("hi", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch["l_orderkey"]),
            pc.is_valid(batch["l_shipdate"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        day = pc.divide(batch["l_shipdate"].cast(pa.int64()), _DAY_US)
        t = pa.table({"l_orderkey": batch["l_orderkey"], "day": day})
        g = t.group_by(["l_orderkey"]).aggregate([("day", "min"),
                                                  ("day", "max")])
        return g.rename_columns(["l_orderkey", "lo", "hi"]).cast(
            part_schema)

    partials = li.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    hist_schema = pa.schema([("span_weeks", pa.int64()),
                             ("n", pa.int64()), ("s", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return hist_schema.empty_table()
        starts, ends = _runs(batch, ["l_orderkey"])
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        span = np.array([int(hi[s:e].max()) - int(lo[s:e].min())
                         for s, e in zip(starts, ends)],
                        dtype=np.int64)
        t = pa.table({"span_weeks": pa.array(span // 7, pa.int64()),
                      "span": pa.array(span, pa.int64())})
        g = t.group_by(["span_weeks"]).aggregate(
            [([], "count_all"), ("span", "sum")])
        return g.rename_columns(["span_weeks", "n", "s"]).cast(
            hist_schema)

    parts = _collect_raw(sorted_group_map(
        partials, ["l_orderkey"], None, hist_schema,
        block_fn=_fold)).to_pandas()
    agg = parts.groupby("span_weeks", as_index=False)[["n", "s"]].sum()
    return _collect(pa.table({
        "span_weeks": pa.array(agg["span_weeks"].values, pa.int64()),
        "n_orders": pa.array(agg["n"].values, pa.int64()),
        "mean_span_days": pa.array(
            agg["s"].values.astype(np.float64)
            / agg["n"].values.astype(np.float64), pa.float64()),
    }))


LABEL_SEPARATION_SQL = """
WITH v AS (
  SELECT label, vec_id, d.dim AS dim,
         CAST(FLOOR(ROUND(CAST(embedding[d.dim] AS DOUBLE), 6) * 1000
                    + 0.5) AS BIGINT) AS vi
  FROM embeddings,
       LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS dim) d
  WHERE vec_id IS NOT NULL AND label IS NOT NULL
    AND embedding IS NOT NULL),
nrm AS (
  SELECT label, vec_id,
         SQRT(CAST(SUM(vi * vi) AS DOUBLE)) AS nr
  FROM v GROUP BY 1, 2),
u AS (
  SELECT v.label AS label, v.dim AS dim, v.vec_id AS vec_id,
         v.vi / nrm.nr AS xn
  FROM v JOIN nrm ON nrm.vec_id = v.vec_id AND nrm.label = v.label
  WHERE nrm.nr > 0),
s AS (
  SELECT label, dim, SUM(xn) AS sx,
         COUNT(DISTINCT vec_id) AS _nv
  FROM u GROUP BY 1, 2),
n AS (SELECT label, COUNT(DISTINCT vec_id) AS nc FROM u GROUP BY 1),
q AS (
  SELECT s.label AS label, SUM(s.sx * s.sx ORDER BY s.dim) AS ss,
         ANY_VALUE(n.nc) AS nc
  FROM s JOIN n USING (label) GROUP BY 1),
x AS (
  SELECT a.label AS label,
         SUM(SUM(a.sx * b.sx) / (a2.nc * 1.0 * b2.nc))
           OVER (PARTITION BY a.label) AS betw_sum,
         1 AS dummy
  FROM s a JOIN s b ON b.dim = a.dim AND b.label <> a.label
  JOIN n a2 ON a2.label = a.label JOIN n b2 ON b2.label = b.label
  GROUP BY a.label, b.label, a2.nc, b2.nc),
xx AS (SELECT label, ANY_VALUE(betw_sum) AS betw FROM x GROUP BY 1),
l AS (SELECT COUNT(*) AS nl FROM n)
SELECT q.label AS label, CAST(q.nc AS BIGINT) AS n_vecs,
       ROUND((q.ss - q.nc) / (q.nc * 1.0 * (q.nc - 1)), 6)
         AS within_cos,
       ROUND(xx.betw / (l.nl - 1), 6) AS between_cos
FROM q JOIN xx USING (label), l
WHERE q.nc > 1
"""


def q_label_separation(sf_dir: str):
    """Embedding-space class separation: mean pairwise cosine WITHIN
    each label vs the mean centroid-cosine BETWEEN it and every other
    label — the 'are these labels even separable' audit run before
    training a classifier on the embeddings.  Uses the sum-of-
    normalized-vectors identity (Σ-within-pairs cos = (‖S‖² − n)/2),
    so blocks ship only |labels| x dim partial sums of unit vectors —
    never a pair.  Norms are sqrt-of-int (bit-identical); the fold
    ulps land in rounded outputs only (the label_centroids
    discipline)."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    part_schema = pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                             ("sx", pa.float64()), ("n", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["vec_id"]),
                            pc.is_valid(batch["label"])),
                    pc.is_valid(batch["embedding"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return part_schema.empty_table()
        mat = _emb_matrix(batch, "embedding")
        vi = np.floor(round6_tie_robust(mat) * 1000.0
                      + 0.5).astype(np.int64)
        nr = np.sqrt((vi * vi).sum(axis=1).astype(np.float64))
        keep = nr > 0
        if not keep.any():
            return part_schema.empty_table()
        xn = vi[keep] / nr[keep, None]
        lab = batch["label"].to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        uniq, inv = np.unique(lab, return_inverse=True)
        dim = xn.shape[1]
        sums = np.zeros((len(uniq), dim))
        np.add.at(sums, inv, xn)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": np.repeat(uniq, dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                           len(uniq)),
            "sx": sums.ravel(), "n": np.repeat(cnt, dim),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    g = parts.groupby(["label", "dim"], as_index=False).agg(
        sx=("sx", "sum"), n=("n", "sum"))
    labels = np.sort(g["label"].unique())
    dim = int(g["dim"].max())
    S = np.zeros((len(labels), dim))
    li = {int(l_): i for i, l_ in enumerate(labels)}
    S[[li[int(l_)] for l_ in g["label"]],
      g["dim"].values.astype(np.int64) - 1] = g["sx"].values
    nc = g.groupby("label")["n"].max().reindex(labels).values.astype(
        np.int64)
    rows = {"lab": [], "nv": [], "w": [], "b": []}
    for i, lab in enumerate(labels):
        n_i = int(nc[i])
        if n_i < 2:
            continue
        ss = float((S[i] * S[i]).sum())
        within = (ss - n_i) / (n_i * 1.0 * (n_i - 1))
        betw = 0.0
        for j in range(len(labels)):
            if j == i:
                continue
            betw += float((S[i] * S[j]).sum()) / (n_i * 1.0
                                                  * int(nc[j]))
        rows["lab"].append(int(lab))
        rows["nv"].append(n_i)
        rows["w"].append(within)
        rows["b"].append(betw / (len(labels) - 1))
    return _collect(pa.table({
        "label": pa.array(rows["lab"], pa.int64()),
        "n_vecs": pa.array(rows["nv"], pa.int64()),
        "within_cos": pa.array(round6_tie_robust(
            np.array(rows["w"], np.float64))),
        "between_cos": pa.array(round6_tie_robust(
            np.array(rows["b"], np.float64))),
    }))


QUANTILE_NORMALIZE_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
r AS (
  SELECT event_type, day, mi,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mi, day) AS rank
  FROM d),
mn AS (SELECT MIN(cnt) AS rmax FROM
       (SELECT COUNT(*) AS cnt FROM d GROUP BY event_type)),
q AS (
  SELECT rank, CAST(SUM(mi) AS DOUBLE) / COUNT(*) / 1000.0 AS qv
  FROM r WHERE rank <= (SELECT rmax FROM mn) GROUP BY 1)
SELECT r.event_type AS event_type, CAST(r.day AS BIGINT) AS day,
       CAST(r.mi AS BIGINT) AS mi, CAST(r.rank AS BIGINT) AS rank,
       ROUND(q.qv, 6) AS qnorm
FROM r JOIN q USING (rank)
WHERE r.rank <= (SELECT rmax FROM mn)
"""


def q_quantile_normalize(sf_dir: str):
    """Quantile normalization across series (the batch-effect
    correction used on expression/feature matrices): each series'
    daily means are ranked (ties broken by day — deterministic), and
    rank r maps to the MEAN of all series' r-th order statistics, so
    every series leaves with an identical marginal distribution.
    Ranks beyond the shortest series drop (the equal-length contract).
    Rank and order-stat algebra is exact-int on the shared milli
    series; the per-rank mean is one int-sum ratio.  Driver work is
    |types| x |days|."""
    series = _daily_milli_series(sf_dir)
    ranked = {}
    for et in sorted(series):
        days, mi, _ = series[et]
        order = np.lexsort((days, mi))
        ranked[et] = (days[order], mi[order])
    if not ranked:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "day": pa.array([], pa.int64()),
                         "mi": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "qnorm": pa.array([], pa.float64())})
    rmax = min(len(v[0]) for v in ranked.values())
    sums = np.zeros(rmax, dtype=np.int64)
    for et, (_, mi) in ranked.items():
        sums += mi[:rmax]
    qv = sums.astype(np.float64) / len(ranked) / 1000.0
    rows = {"et": [], "day": [], "mi": [], "rank": [], "q": []}
    for et, (days, mi) in ranked.items():
        rows["et"].extend([et] * rmax)
        rows["day"].extend(days[:rmax].tolist())
        rows["mi"].extend(mi[:rmax].tolist())
        rows["rank"].extend(range(1, rmax + 1))
        rows["q"].extend(qv.tolist())
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "day": pa.array(rows["day"], pa.int64()),
        "mi": pa.array(rows["mi"], pa.int64()),
        "rank": pa.array(rows["rank"], pa.int64()),
        "qnorm": pa.array(rows["q"], pa.float64()),
    }))


TERM_BURSTINESS_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''),
dt AS (SELECT doc_id, term, COUNT(*) AS n FROM toks GROUP BY 1, 2),
t AS (SELECT term, COUNT(*) AS df, SUM(n) AS cf FROM dt GROUP BY 1
      HAVING SUM(n) >= 10)
SELECT term, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
       ROUND(CAST(cf AS DOUBLE) / df, 6) AS burstiness
FROM t
"""


def q_term_burstiness(sf_dir: str):
    """Church-Gale term burstiness: for each vocabulary term with
    collection frequency >= 10, the mean occurrences per CONTAINING
    document (cf/df) — content words burst (high cf/df), function
    words spread evenly; the classic stopword/keyword separator that
    complements tfidf_terms.  Engine path: the shared per-doc term
    counts ride one doc-keyed combiner pass, then ONE term-keyed
    exchange folds df (run length) and cf (run sum) in-group.  All
    integers; one ratio at the output."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    per_doc = term_counts(ds, ["doc_id"], "text")
    out_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                            ("cf", pa.int64()),
                            ("burstiness", pa.float64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["term"])
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = (np.array(ends) - np.array(starts)).astype(np.int64)
        cf = np.add.reduceat(n, starts)
        keep = cf >= 10
        idx = pa.array(np.asarray(starts)[keep], pa.int64())
        return pa.table({
            "term": batch["term"].take(idx),
            "df": pa.array(df[keep], pa.int64()),
            "cf": pa.array(cf[keep], pa.int64()),
            "burstiness": pa.array(cf[keep].astype(np.float64)
                                   / df[keep].astype(np.float64)),
        }, schema=out_schema)

    return _collect(sorted_group_map(per_doc, ["term"], None,
                                     out_schema, block_fn=_fold))


_LETTERS = "abcdefghijklmnopqrstuvwxyz"

CHAR_ENTROPY_SQL = ("""
WITH c AS (
  SELECT lang,
"""
+ ",\n".join(
    f"         SUM(LENGTH(lower(text)) - LENGTH(REPLACE(lower(text),"
    f" '{ch}', ''))) AS n_{ch}" for ch in _LETTERS)
+ """
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
  GROUP BY 1),
u AS (
"""
+ "\n  UNION ALL\n".join(
    f"  SELECT lang, '{ch}' AS ch, n_{ch} AS n FROM c" for ch in
    _LETTERS)
+ """
),
t AS (SELECT lang, SUM(n) AS total FROM u GROUP BY 1)
SELECT u.lang AS lang, CAST(t.total AS BIGINT) AS n_letters,
       ROUND(-SUM(CASE WHEN u.n > 0 THEN (u.n * 1.0 / t.total)
                            * LN(u.n * 1.0 / t.total)
                       ELSE 0 END ORDER BY u.ch), 6) AS char_entropy,
       CAST(COUNT(CASE WHEN u.n > 0 THEN 1 END) AS BIGINT)
         AS n_distinct
FROM u JOIN t USING (lang) GROUP BY 1, 2
""")


def q_char_entropy(sf_dir: str):
    """Letter-distribution Shannon entropy per language over a–z of
    the lowercased corpus — the cheapest language/ciphertext/gibberish
    fingerprint (English plateaus near 2.9 nats; uniform noise hits
    ln 26).  Per-block 26-counter partials via vectorized substring
    counting (Arrow C-speed, no per-char Python), a |langs| x 26
    driver merge, then p·ln p over exact integer ratios folded in
    letter order on both engines."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    part_schema = pa.schema([("lang", pa.string())]
                            + [(f"n_{ch}", pa.int64())
                               for ch in _LETTERS])

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["lang"]),
                                     pc.is_valid(batch["text"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        low = pc.utf8_lower(batch["text"])
        cols = {"lang": batch["lang"]}
        for ch in _LETTERS:
            cols[f"n_{ch}"] = pc.count_substring(low, ch).cast(
                pa.int64())
        t = pa.table(cols)
        g = t.group_by(["lang"]).aggregate(
            [(f"n_{ch}", "sum") for ch in _LETTERS])
        return g.rename_columns(["lang"] + [f"n_{ch}"
                                            for ch in _LETTERS]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = parts.groupby("lang", as_index=False).sum()
    rows = {"lang": [], "tot": [], "h": [], "nd": []}
    for _, row in agg.sort_values("lang").iterrows():
        n = np.array([int(row[f"n_{ch}"]) for ch in _LETTERS],
                     dtype=np.int64)
        tot = int(n.sum())
        h = 0.0
        for k in n:          # letter order — mirrors ORDER BY u.ch
            if k > 0:
                p = k * 1.0 / tot
                h += -(p * np.log(p))
        rows["lang"].append(row["lang"])
        rows["tot"].append(tot)
        rows["h"].append(h)
        rows["nd"].append(int((n > 0).sum()))
    return _collect(pa.table({
        "lang": pa.array(rows["lang"], pa.string()),
        "n_letters": pa.array(rows["tot"], pa.int64()),
        "char_entropy": pa.array(round6_tie_robust(
            np.array(rows["h"], np.float64))),
        "n_distinct": pa.array(rows["nd"], pa.int64()),
    }))


REORDER_GAPS_SQL = """
WITH o AS (
  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
g AS (
  SELECT o_custkey, day,
         day - LAG(day) OVER (PARTITION BY o_custkey
                              ORDER BY day) AS gap
  FROM (SELECT DISTINCT o_custkey, day FROM o))
SELECT CAST(gap // 7 AS BIGINT) AS gap_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(*), 6)
         AS mean_gap_days
FROM g WHERE gap IS NOT NULL GROUP BY 1
"""


def q_reorder_gaps(sf_dir: str):
    """Inter-purchase interval histogram: days between a customer's
    consecutive DISTINCT order days, bucketed by week — the
    repeat-purchase cadence every CLV / churn model starts from.
    Blocks pre-distinct (customer, day) pairs, ONE customer-keyed
    exchange sorts each customer's days in-group and emits gap
    partials, then a bounded |weeks| histogram merge.  All integer
    day arithmetic."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    pair_schema = pa.schema([("o_custkey", pa.int64()),
                             ("day", pa.int64())])

    def _pairs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch["o_custkey"]),
            pc.is_valid(batch["o_orderdate"])))
        t = pa.table({"o_custkey": batch["o_custkey"],
                      "day": pc.divide(
                          batch["o_orderdate"].cast(pa.int64()),
                          _DAY_US)})
        g = t.group_by(["o_custkey", "day"]).aggregate(
            [([], "count_all")])
        return g.drop_columns(["count_all"]).cast(pair_schema)

    pairs = orders.map_batches(_pairs, batch_format="pyarrow",
                               zero_copy_batch=True)
    hist_schema = pa.schema([("gap_weeks", pa.int64()),
                             ("n", pa.int64()), ("s", pa.int64())])

    def _fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return hist_schema.empty_table()
        starts, ends = _runs(batch, ["o_custkey"])
        day = batch["day"].to_numpy(zero_copy_only=False)
        gaps = []
        for st, en in zip(starts, ends):
            d = np.unique(day[st:en])
            if len(d) > 1:
                gaps.append(np.diff(d))
        if not gaps:
            return hist_schema.empty_table()
        gap = np.concatenate(gaps)
        t = pa.table({"gap_weeks": pa.array(gap // 7, pa.int64()),
                      "gap": pa.array(gap, pa.int64())})
        g = t.group_by(["gap_weeks"]).aggregate(
            [([], "count_all"), ("gap", "sum")])
        return g.rename_columns(["gap_weeks", "n", "s"]).cast(
            hist_schema)

    parts = _collect_raw(sorted_group_map(
        pairs, ["o_custkey"], None, hist_schema,
        block_fn=_fold)).to_pandas()
    agg = parts.groupby("gap_weeks", as_index=False)[["n", "s"]].sum()
    return _collect(pa.table({
        "gap_weeks": pa.array(agg["gap_weeks"].values, pa.int64()),
        "n_gaps": pa.array(agg["n"].values, pa.int64()),
        "mean_gap_days": pa.array(
            agg["s"].values.astype(np.float64)
            / agg["n"].values.astype(np.float64), pa.float64()),
    }))


WILSON_CI_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
md AS (SELECT MEDIAN(vi) AS med FROM v),
a AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CASE WHEN vi > (SELECT med FROM md)
                  THEN 1 ELSE 0 END) AS k
  FROM v GROUP BY 1),
b AS (
  SELECT event_type, n, k, k * 1.0 / n AS p,
         1.959963984540054 AS z
  FROM a WHERE n > 0)
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       ROUND(p, 6) AS p_hat,
       ROUND((p + z * z / (2 * n)
              - z * SQRT(p * (1 - p) / n + z * z / (4.0 * n * n)))
             / (1 + z * z / n), 6) AS wilson_lo,
       ROUND((p + z * z / (2 * n)
              + z * SQRT(p * (1 - p) / n + z * z / (4.0 * n * n)))
             / (1 + z * z / n), 6) AS wilson_hi
FROM b
"""


def q_wilson_ci(sf_dir: str):
    """Wilson 95% score interval for each series' share of
    above-global-median values — the closed-form binomial CI monitors
    prefer over the normal approximation at small n or extreme p.  The
    global median folds from the distinct-value histogram of the milli
    quantization (an int or int+0.5 — exact), each type's (k, n) are
    exact integer tallies, and the Wilson algebra is one shared IEEE
    chain on p = k/n (z is the same 1.959963984540054 literal on both
    engines)."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("vi", pa.int64()), ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "vi", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    hist = parts.groupby(["event_type", "vi"], as_index=False)[
        "n"].sum()
    gl = hist.groupby("vi", as_index=False)["n"].sum().sort_values(
        "vi")
    vals = gl["vi"].values.astype(np.int64)
    cnts = gl["n"].values.astype(np.int64)
    cum = np.cumsum(cnts)
    nn = int(cum[-1])
    lo_pos, hi_pos = (nn + 1) // 2, nn // 2 + 1
    lo_v = vals[np.searchsorted(cum, lo_pos)]
    hi_v = vals[np.searchsorted(cum, hi_pos)]
    med = (float(lo_v) + float(hi_v)) / 2.0
    z = 1.959963984540054
    rows = {"et": [], "n": [], "k": [], "p": [], "lo": [], "hi": []}
    for et, sub in hist.groupby("event_type"):
        n = int(sub["n"].sum())
        k = int(sub.loc[sub["vi"] > med, "n"].sum())
        p = k * 1.0 / n
        half = z * np.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
        cen = p + z * z / (2 * n)
        den = 1 + z * z / n
        rows["et"].append(et)
        rows["n"].append(n)
        rows["k"].append(k)
        rows["p"].append(p)
        rows["lo"].append((cen - half) / den)
        rows["hi"].append((cen + half) / den)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "k": pa.array(rows["k"], pa.int64()),
        "p_hat": pa.array(round6_tie_robust(
            np.array(rows["p"], np.float64))),
        "wilson_lo": pa.array(round6_tie_robust(
            np.array(rows["lo"], np.float64))),
        "wilson_hi": pa.array(round6_tie_robust(
            np.array(rows["hi"], np.float64))),
    }))


EFFECTIVE_DIM_SQL = f"""
WITH {_PCA_COV_CTE}
SELECT CAST(MAX(i) AS BIGINT) AS dim,
       ROUND(SUM(CASE WHEN i = j THEN c ELSE 0 END)
             / (1000000.0 * ANY_VALUE(n) * (ANY_VALUE(n) - 1)), 6)
         AS total_variance,
       ROUND(POWER(SUM(CASE WHEN i = j THEN c ELSE 0 END), 2)
             / SUM(c * c), 6) AS effective_dim
FROM cfull
"""


def q_effective_dim(sf_dir: str):
    """Participation ratio — the effective dimensionality of the
    embedding cloud, (Σλ)²/Σλ² over covariance eigenvalues — WITHOUT
    an eigendecomposition: Σλ = trace(C) and Σλ² = ‖C‖²_F, both exact
    sums over the integer covariance numerators n·Sij − Si·Sj from the
    shared Gram exchange (each block ships ONE dim² int64 partial).
    A collapsed embedding space (effective_dim ≪ dim) is the classic
    representation-failure alarm.  Scale cancels in the ratio; total
    variance reports in the milli²-normalized units of
    embedding_covariance."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.similarity import _emb_matrix

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    part_schema = pa.schema([("i", pa.int64()), ("j", pa.int64()),
                             ("sij", pa.int64()), ("si", pa.int64()),
                             ("n", pa.int64())])

    def _gram(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch["vec_id"]),
                                     pc.is_valid(batch["embedding"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        mat = _emb_matrix(batch, "embedding")
        vi = np.floor(round6_tie_robust(mat) * 1000.0
                      + 0.5).astype(np.int64)
        n, d = vi.shape
        gram = vi.T @ vi
        si = vi.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "sij": pa.array(gram[iu, ju], pa.int64()),
            "si": pa.array(np.where(iu == ju, si[iu], 0), pa.int64()),
            "n": pa.array(np.full(len(iu), n, dtype=np.int64)),
        }, schema=part_schema)

    parts = _collect_raw(ds.map_batches(
        _gram, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    d = int(parts.i.max())
    S = np.zeros((d, d), dtype=np.int64)
    np.add.at(S, (parts.i.values - 1, parts.j.values - 1),
              parts.sij.values)
    si = np.zeros(d, dtype=np.int64)
    diag = parts[parts.i == parts.j]
    np.add.at(si, diag.i.values - 1, diag.si.values)
    n = int(parts[(parts.i == 1) & (parts.j == 1)].n.sum())
    S = S + np.triu(S, 1).T
    C = (n * S - np.outer(si, si)).astype(np.float64)
    tr = float(np.trace(C))
    frob2 = float((C * C).sum())
    return _collect(pa.table({
        "dim": pa.array([d], pa.int64()),
        "total_variance": pa.array(round6_tie_robust(
            np.array([tr / (1e6 * n * (n - 1))]))),
        "effective_dim": pa.array(round6_tie_robust(
            np.array([tr * tr / frob2]))),
    }))


DISCOUNT_BANDS_SQL = """
WITH l AS (
  SELECT CAST(FLOOR(ROUND(l_discount, 6) * 100 + 0.5) AS BIGINT)
           AS disc_pct,
         CAST(FLOOR(ROUND(l_quantity, 6) + 0.5) AS BIGINT) // 10
           AS qty_band,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
    AND l_extendedprice IS NOT NULL)
SELECT disc_pct, qty_band, CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(rev), 6) AS rev_sum
FROM l GROUP BY 1, 2
"""


def q_discount_bands(sf_dir: str):
    """Revenue surface over (discount percent, quantity band) — the
    TPC-H Q19-flavoured pricing-policy grid (does deep discounting on
    big lots actually carry revenue?).  Integer band edges from the
    shared rounding quantization (no float boundary can flip a row's
    cell), per-block cell partials, a bounded |bands|² driver merge."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount"])
    part_schema = pa.schema([("disc_pct", pa.int64()),
                             ("qty_band", pa.int64()),
                             ("n", pa.int64()), ("rev", pa.float64())])

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.and_(
            pc.is_valid(batch["l_discount"]),
            pc.is_valid(batch["l_quantity"])),
            pc.is_valid(batch["l_extendedprice"])))
        if len(batch) == 0:
            return part_schema.empty_table()
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        qt = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "disc_pct": pa.array(np.floor(
                round6_tie_robust(dc) * 100 + 0.5).astype(np.int64)),
            "qty_band": pa.array((np.floor(round6_tie_robust(qt)
                                           + 0.5).astype(np.int64)
                                  // 10), pa.int64()),
            "rev": pa.array(ep * (1.0 - dc), pa.float64())})
        g = t.group_by(["disc_pct", "qty_band"]).aggregate(
            [([], "count_all"), ("rev", "sum")])
        return g.rename_columns(["disc_pct", "qty_band", "n",
                                 "rev"]).cast(part_schema)

    parts = _collect_raw(li.map_batches(
        _partial, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = parts.groupby(["disc_pct", "qty_band"], as_index=False).agg(
        n=("n", "sum"), rev=("rev", "sum"))
    return _collect(pa.table({
        "disc_pct": pa.array(agg["disc_pct"].values, pa.int64()),
        "qty_band": pa.array(agg["qty_band"].values, pa.int64()),
        "n_items": pa.array(agg["n"].values, pa.int64()),
        "rev_sum": pa.array(agg["rev"].values, pa.float64()),
    }))


RICH_CLUB_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
e AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (
  SELECT w, COUNT(*) AS d FROM (
    SELECT u AS w FROM e UNION ALL SELECT v AS w FROM e)
  GROUP BY 1),
ks AS (SELECT UNNEST([2, 4, 8]) AS k),
nodes AS (
  SELECT ks.k AS k, COUNT(*) AS nk
  FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
ek AS (
  SELECT ks.k AS k, COUNT(*) AS mk
  FROM ks, e
  JOIN deg du ON du.w = e.u JOIN deg dv ON dv.w = e.v
  WHERE du.d > ks.k AND dv.d > ks.k
  GROUP BY 1)
SELECT nodes.k AS k, CAST(nodes.nk AS BIGINT) AS n_nodes,
       CAST(COALESCE(ek.mk, 0) AS BIGINT) AS n_edges,
       ROUND(2.0 * COALESCE(ek.mk, 0)
             / (nodes.nk * (nodes.nk - 1)), 6) AS phi
FROM nodes LEFT JOIN ek USING (k)
WHERE nodes.nk > 1
"""


def q_rich_club(sf_dir: str):
    """Rich-club coefficient of the co-purchase graph at degree
    thresholds k ∈ {2, 4, 8}: the density φ(k) = 2·E_k / (N_k(N_k−1))
    among nodes of degree > k — hub products trading with each other
    far above chance is the classic catalog-concentration signal.
    Engine path: the supported edge list streams ONCE with the sorted
    degree table broadcast; each block emits per-k (edge, node)
    tallies — a 3-row exchange; φ is exact-int arithmetic plus one
    ratio."""
    import ray

    pairs = _copurchase_pair_counts(sf_dir)
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"k": t.filter(pc.greater_equal(t["nuv"], 2))["k"]},
            schema=_EK_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    nodes, deg = _copurchase_degrees(edges)
    out_empty = pa.table({"k": pa.array([], pa.int64()),
                          "n_nodes": pa.array([], pa.int64()),
                          "n_edges": pa.array([], pa.int64()),
                          "phi": pa.array([], pa.float64())})
    if not len(nodes):
        return out_empty
    dref = ray.put((nodes, deg))
    ks = np.array([2, 4, 8], dtype=np.int64)
    part_schema = pa.schema([("k", pa.int64()), ("mk", pa.int64())])

    def _edge_tally(batch: pa.Table) -> pa.Table:
        nd, dg = ray.get(dref)
        kk = batch["k"].to_numpy(zero_copy_only=False)
        u = kk >> np.int64(32)
        v = kk & np.int64(0xFFFFFFFF)
        du = dg[np.searchsorted(nd, u)]
        dv = dg[np.searchsorted(nd, v)]
        mks = [int(((du > kthr) & (dv > kthr)).sum()) for kthr in ks]
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "mk": pa.array(mks, pa.int64())},
                        schema=part_schema)

    parts = _collect_raw(edges.map_batches(
        _edge_tally, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    mk = parts.groupby("k")["mk"].sum()
    rows = {"k": [], "nk": [], "mk": [], "phi": []}
    for kthr in ks:
        nk = int((deg > kthr).sum())
        if nk < 2:
            continue
        m = int(mk.get(kthr, 0))
        rows["k"].append(int(kthr))
        rows["nk"].append(nk)
        rows["mk"].append(m)
        rows["phi"].append(2.0 * m / (nk * (nk - 1)))
    return _collect(pa.table({
        "k": pa.array(rows["k"], pa.int64()),
        "n_nodes": pa.array(rows["nk"], pa.int64()),
        "n_edges": pa.array(rows["mk"], pa.int64()),
        "phi": pa.array(rows["phi"], pa.float64()),
    }))


KRUSKAL_WALLIS_SQL = """
WITH v AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
h AS (SELECT event_type, dow, vi, COUNT(*) AS n FROM v
      GROUP BY 1, 2, 3),
g AS (SELECT event_type, vi, SUM(n) AS nv FROM h GROUP BY 1, 2),
rk AS (
  SELECT event_type, vi, nv,
         2 * (SUM(nv) OVER (PARTITION BY event_type ORDER BY vi)
              - nv) + nv + 1 AS r2
  FROM g),
rj AS (
  SELECT h.event_type AS event_type, h.dow AS dow,
         SUM(h.n) AS nj, SUM(h.n * rk.r2) AS r2j
  FROM h JOIN rk ON rk.event_type = h.event_type AND rk.vi = h.vi
  GROUP BY 1, 2),
agg AS (
  SELECT event_type, SUM(nj) AS nn,
         SUM(CAST(r2j AS DOUBLE) * r2j / (4.0 * nj)
             ORDER BY dow) AS srr
  FROM rj GROUP BY 1),
ties AS (
  SELECT event_type, SUM(nv * nv * nv - nv) AS tsum FROM g
  GROUP BY 1),
hh AS (
  SELECT agg.event_type AS event_type, agg.nn AS nn,
         12.0 / (agg.nn * (agg.nn + 1.0)) * agg.srr
           - 3 * (agg.nn + 1.0) AS h_raw,
         1.0 - CAST(ties.tsum AS DOUBLE)
               / (CAST(agg.nn AS DOUBLE) * agg.nn * agg.nn - agg.nn)
           AS cfac
  FROM agg JOIN ties USING (event_type))
SELECT event_type, CAST(nn AS BIGINT) AS n,
       ROUND(h_raw, 6) AS h_stat,
       ROUND(h_raw / cfac, 6) AS h_adj
FROM hh WHERE cfac > 0
"""


def q_kruskal_wallis(sf_dir: str):
    """Kruskal–Wallis rank test of value-by-weekday per series — the
    nonparametric companion to anova_events (rank-based, so one heavy
    tail cannot fake a seasonal effect), with the standard tie
    correction.  EXACT rank algebra: midranks live in half-units
    (r2 = 2·cum_before + n_v + 1, an integer), per-dow rank sums R2_j
    are exact ints off the bounded (type, dow, value) histogram, and
    H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1) folds in dow order on both
    engines.  Cell-count scale everywhere."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("dow", pa.int64()), ("vi", pa.int64()),
                             ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "dow": pa.array((t_us // _DAY_US + 4) % 7,
                                      pa.int64()),
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "dow", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "dow", "vi",
                                 "n"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["event_type", "dow", "vi"],
                          as_index=False)["n"].sum()
    rows = {"et": [], "n": [], "h": [], "ha": []}
    for et, sub in cells.groupby("event_type"):
        gv = sub.groupby("vi")["n"].sum().sort_index()
        vals = gv.index.values.astype(np.int64)
        nv = gv.values.astype(np.int64)
        cumb = np.concatenate([[0], np.cumsum(nv)[:-1]])
        r2 = 2 * cumb + nv + 1            # midrank in half-units
        r2map = dict(zip(vals.tolist(), r2.tolist()))
        nn = int(nv.sum())
        srr = 0.0
        for dow in sorted(sub["dow"].unique()):
            dsub = sub[sub["dow"] == dow]
            nj = int(dsub["n"].sum())
            r2j = int(sum(int(n_) * r2map[int(v_)]
                          for v_, n_ in zip(dsub["vi"], dsub["n"])))
            srr += float(r2j) * r2j / (4.0 * nj)
        h_raw = 12.0 / (nn * (nn + 1.0)) * srr - 3 * (nn + 1.0)
        tsum = int((nv.astype(object) ** 3 - nv).sum())
        cfac = 1.0 - float(tsum) / (float(nn) * nn * nn - nn)
        if cfac <= 0:
            continue
        rows["et"].append(et)
        rows["n"].append(nn)
        rows["h"].append(h_raw)
        rows["ha"].append(h_raw / cfac)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "h_stat": pa.array(round6_tie_robust(
            np.array(rows["h"], np.float64))),
        "h_adj": pa.array(round6_tie_robust(
            np.array(rows["ha"], np.float64))),
    }))


HUBER_LOCATION_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
m0 AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(2 * MEDIAN(vi) AS BIGINT) AS m2
  FROM v GROUP BY 1),
md AS (
  SELECT v.event_type AS event_type,
         CAST(2 * MEDIAN(ABS(2 * v.vi - m0.m2)) AS BIGINT) AS mad4
  FROM v JOIN m0 USING (event_type) GROUP BY 1),
cc AS (
  SELECT m0.event_type AS event_type, m0.n AS n, m0.m2 AS m2,
         md.mad4 AS mad4,
         1.345 * (1.4826 * (mad4 / 4.0)) AS c
  FROM m0 JOIN md USING (event_type)),
hh0 AS (SELECT event_type, vi, COUNT(*) AS nv FROM v GROUP BY 1, 2),
i1 AS (
  SELECT h.event_type AS event_type,
         SUM(((CASE WHEN ABS(h.vi - cc.m2 / 2.0) = 0 THEN 1
                    ELSE LEAST(1.0, cc.c / ABS(h.vi - cc.m2 / 2.0))
               END) * h.nv) * h.vi ORDER BY h.vi) /
         SUM((CASE WHEN ABS(h.vi - cc.m2 / 2.0) = 0 THEN 1
                   ELSE LEAST(1.0, cc.c / ABS(h.vi - cc.m2 / 2.0))
              END) * h.nv ORDER BY h.vi) AS mu_raw
  FROM hh0 h JOIN cc USING (event_type) GROUP BY 1),
y1 AS (
  SELECT event_type,
         CAST(FLOOR(ROUND(mu_raw, 6) + 0.5) AS BIGINT) AS mu1
  FROM i1),
i2 AS (
  SELECT h.event_type AS event_type,
         SUM(((CASE WHEN ABS(h.vi - y1.mu1) = 0 THEN 1
                    ELSE LEAST(1.0, cc.c / ABS(h.vi - y1.mu1)) END)
              * h.nv) * h.vi ORDER BY h.vi) /
         SUM((CASE WHEN ABS(h.vi - y1.mu1) = 0 THEN 1
                   ELSE LEAST(1.0, cc.c / ABS(h.vi - y1.mu1)) END)
             * h.nv ORDER BY h.vi) AS mu_raw
  FROM hh0 h JOIN cc USING (event_type) JOIN y1 USING (event_type)
  GROUP BY 1)
SELECT cc.event_type AS event_type, CAST(cc.n AS BIGINT) AS n,
       ROUND(cc.m2 / 2000.0, 6) AS median_v,
       ROUND(1.4826 * (cc.mad4 / 4.0) / 1000.0, 6) AS mad_scale,
       ROUND(i2.mu_raw / 1000.0, 6) AS huber_mu
FROM cc JOIN i2 USING (event_type)
"""


def q_huber_location(sf_dir: str):
    """Huber M-estimator of location per series (c = 1.345·σ̂,
    σ̂ = 1.4826·MAD) by two IRLS iterations from the median — the
    textbook robust mean that downweights instead of discarding (the
    soft version of robust_mean's trim).  EXACT-ALGEBRA discipline:
    median and MAD live in half-/quarter-units ints off the
    distinct-value histogram, the iterate re-quantizes to milli ints
    after iteration 1 (floor(round6+0.5) — the geomedian discipline),
    so every weight sees an exact |x − μ| and the weighted folds run
    in value order on both engines."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("vi", pa.int64()), ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "vi", "n"]).cast(
            part_schema)

    def _wmedian2(vals: np.ndarray, cnts: np.ndarray) -> int:
        """Weighted median in HALF-units (2x) — exact int."""
        cum = np.cumsum(cnts)
        nn = int(cum[-1])
        lo = int(vals[np.searchsorted(cum, (nn + 1) // 2)])
        hi = int(vals[np.searchsorted(cum, nn // 2 + 1)])
        return lo + hi

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    hist = parts.groupby(["event_type", "vi"], as_index=False)[
        "n"].sum()
    rows = {"et": [], "n": [], "med": [], "mad": [], "mu": []}
    for et, sub in hist.sort_values(["event_type", "vi"]).groupby(
            "event_type", sort=True):
        vals = sub["vi"].values.astype(np.int64)
        cnts = sub["n"].values.astype(np.int64)
        nn = int(cnts.sum())
        m2 = _wmedian2(vals, cnts)
        a2 = np.abs(2 * vals - m2)
        ao = np.argsort(a2, kind="stable")
        mad4 = _wmedian2(a2[ao], cnts[ao])
        c = 1.345 * (1.4826 * (mad4 / 4.0))

        def _irls(mu_milli: float) -> float:
            ad = np.abs(vals - mu_milli)
            w = np.where(ad == 0, 1.0,
                         np.minimum(1.0, c / np.where(ad == 0, 1.0,
                                                      ad)))
            num = float((w * cnts * vals).sum())
            den = float((w * cnts).sum())
            return num / den

        mu_raw = _irls(m2 / 2.0)
        mu1 = float(np.floor(round6_tie_robust(
            np.array([mu_raw]))[0] + 0.5))
        mu2 = _irls(mu1)
        rows["et"].append(et)
        rows["n"].append(nn)
        rows["med"].append(m2 / 2000.0)
        rows["mad"].append(1.4826 * (mad4 / 4.0) / 1000.0)
        rows["mu"].append(mu2 / 1000.0)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "median_v": pa.array(round6_tie_robust(
            np.array(rows["med"], np.float64))),
        "mad_scale": pa.array(round6_tie_robust(
            np.array(rows["mad"], np.float64))),
        "huber_mu": pa.array(round6_tie_robust(
            np.array(rows["mu"], np.float64))),
    }))


TAIL_CODEPENDENCE_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
q AS (SELECT event_type, QUANTILE_CONT(mi, 0.9) AS p90
      FROM d GROUP BY 1),
f AS (
  SELECT d.event_type AS event_type, d.day AS day,
         CASE WHEN d.mi > q.p90 THEN 1 ELSE 0 END AS hot
  FROM d JOIN q USING (event_type)),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_days,
         SUM(a.hot) AS na, SUM(b.hot) AS nb,
         SUM(a.hot * b.hot) AS nboth
  FROM f a JOIN f b ON b.day = a.day AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, CAST(n_days AS BIGINT) AS n_days,
       CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       CAST(nboth AS BIGINT) AS nboth,
       ROUND(CAST(nboth * n_days AS DOUBLE) / (na * nb), 6)
         AS tail_lift
FROM p WHERE na > 0 AND nb > 0
"""


def q_tail_codependence(sf_dir: str):
    """Upper-tail co-exceedance between every series pair: on days
    both series exist, how often do BOTH exceed their own p90, vs the
    independence expectation (lift = P(both)·n / (P(a)·P(b)·n²)·n —
    the tail-dependence screen EVT risk models start from; pot_clusters
    and gumbel_maxima are its per-series siblings).  The p90s use the
    shared numpy-lerp-exact linear quantile on exact milli ints; day
    joins, exceedance flags and the lift numerator are all integers.
    Driver work is |types|² x |days|."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    flags = {}
    for et in sorted(series):
        days, mi, _ = series[et]
        p90 = np.quantile(mi, 0.9)
        flags[et] = (days, mi > p90)
    ets = sorted(flags)
    rows = {"a": [], "b": [], "nd": [], "na": [], "nb": [],
            "nboth": [], "lift": []}
    for i in range(len(ets)):
        for j in range(i + 1, len(ets)):
            da, ha = flags[ets[i]]
            db, hb = flags[ets[j]]
            common, ia, ib = np.intersect1d(da, db,
                                            return_indices=True)
            if not len(common):
                continue
            fa, fb = ha[ia], hb[ib]
            na, nb = int(fa.sum()), int(fb.sum())
            if na == 0 or nb == 0:
                continue
            nboth = int((fa & fb).sum())
            nd = len(common)
            rows["a"].append(ets[i])
            rows["b"].append(ets[j])
            rows["nd"].append(nd)
            rows["na"].append(na)
            rows["nb"].append(nb)
            rows["nboth"].append(nboth)
            rows["lift"].append(float(nboth * nd) / (na * nb))
    return _collect(pa.table({
        "type_a": pa.array(rows["a"], pa.string()),
        "type_b": pa.array(rows["b"], pa.string()),
        "n_days": pa.array(rows["nd"], pa.int64()),
        "na": pa.array(rows["na"], pa.int64()),
        "nb": pa.array(rows["nb"], pa.int64()),
        "nboth": pa.array(rows["nboth"], pa.int64()),
        "tail_lift": pa.array(round6_tie_robust(
            np.array(rows["lift"], np.float64))),
    }))


JARQUE_BERA_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
c AS (SELECT event_type, MIN(vi) AS c0 FROM v GROUP BY 1),
w AS (SELECT v.event_type AS event_type,
             CAST(v.vi - c.c0 AS HUGEINT) AS w
      FROM v JOIN c USING (event_type)),
s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(w) AS s1, SUM(w * w) AS s2,
         SUM(w * w * w) AS s3, SUM(w * w * w * w) AS s4
  FROM w GROUP BY 1),
m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM s),
k AS (
  SELECT event_type, n, mu, r2, r3, r4,
         r2 - mu * mu AS m2,
         r3 - 3.0 * mu * r2 + 2.0 * (mu * mu * mu) AS m3,
         r4 - 4.0 * mu * r3 + 6.0 * (mu * mu) * r2
            - 3.0 * (mu * mu * mu * mu) AS m4
  FROM m),
f AS (
  SELECT event_type, n,
         m3 / (m2 * SQRT(m2)) AS skew,
         m4 / (m2 * m2) - 3.0 AS exk
  FROM k WHERE m2 > 0)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(skew, 6) AS skewness,
       ROUND(exk, 6) AS ex_kurtosis,
       ROUND(n / 6.0 * (skew * skew + exk * exk / 4.0), 6) AS jb_stat
FROM f
"""


def q_jarque_bera(sf_dir: str):
    """Jarque–Bera normality test per series (skewness/kurtosis based —
    the moment-space companion to anderson_darling, and unlike AD it IS
    SQL-expressible because it needs no erf).  EXACT algebra end to end:
    values quantize to milli ints, each block emits a bounded
    (type, value) histogram (cell-count scale leaves the block, never
    raw rows), and the driver folds exact arbitrary-precision integer
    power sums S1..S4 over the merged cells — shifting by the per-type
    integer MIN first so magnitudes stay well inside HUGEINT on the
    oracle side.  Only the final moment ratios are floats, with the
    multiply/divide tree written identically to the SQL mirror
    (sqrt-only, no pow).  ORACLE-CHECKED against the HUGEINT power-sum
    SQL."""
    import math

    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("vi", pa.int64()), ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "vi", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["event_type", "vi"],
                          as_index=False)["n"].sum()
    rows = {"et": [], "n": [], "sk": [], "ek": [], "jb": []}
    for et, sub in cells.groupby("event_type"):
        vi = sub["vi"].to_numpy(np.int64)
        cnt = sub["n"].to_numpy(np.int64)
        w = (vi - int(vi.min())).astype(object)
        co = cnt.astype(object)
        n = int(cnt.sum())
        s1 = int((w * co).sum())
        s2 = int((w * w * co).sum())
        s3 = int((w * w * w * co).sum())
        s4 = int((w * w * w * w * co).sum())
        nf = float(n)
        mu = float(s1) / nf
        r2 = float(s2) / nf
        r3 = float(s3) / nf
        r4 = float(s4) / nf
        m2 = r2 - mu * mu
        if m2 <= 0:
            continue
        m3 = r3 - 3.0 * mu * r2 + 2.0 * (mu * mu * mu)
        m4 = (r4 - 4.0 * mu * r3 + 6.0 * (mu * mu) * r2
              - 3.0 * (mu * mu * mu * mu))
        skew = m3 / (m2 * math.sqrt(m2))
        exk = m4 / (m2 * m2) - 3.0
        rows["et"].append(et)
        rows["n"].append(n)
        rows["sk"].append(skew)
        rows["ek"].append(exk)
        rows["jb"].append(n / 6.0 * (skew * skew + exk * exk / 4.0))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "skewness": pa.array(round6_tie_robust(
            np.array(rows["sk"], np.float64))),
        "ex_kurtosis": pa.array(round6_tie_robust(
            np.array(rows["ek"], np.float64))),
        "jb_stat": pa.array(round6_tie_robust(
            np.array(rows["jb"], np.float64))),
    }))


MANN_KENDALL_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
p AS (
  SELECT a.event_type AS event_type,
         CAST(SUM(CASE WHEN b.mi > a.mi THEN 1
                       WHEN b.mi < a.mi THEN -1 ELSE 0 END)
              AS BIGINT) AS s
  FROM d a JOIN d b
    ON b.event_type = a.event_type AND b.day > a.day
  GROUP BY 1),
n0 AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
t AS (
  SELECT event_type,
         CAST(SUM(tn * (tn - 1) * (2 * tn + 5)) AS BIGINT) AS tsum
  FROM (SELECT event_type, mi, COUNT(*) AS tn FROM d GROUP BY 1, 2)
  GROUP BY 1),
vv AS (
  SELECT n0.event_type AS event_type, n0.n AS n, p.s AS s,
         CAST(n0.n * (n0.n - 1) * (2 * n0.n + 5) - t.tsum AS DOUBLE)
           / 18.0 AS var_s
  FROM n0 JOIN p USING (event_type) JOIN t USING (event_type))
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(s AS BIGINT) AS s_stat,
       ROUND(var_s, 6) AS var_s,
       ROUND(CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s)
                  WHEN s < 0 THEN (s + 1) / SQRT(var_s)
                  ELSE 0.0 END, 6) AS z
FROM vv WHERE var_s > 0
"""


def q_mann_kendall(sf_dir: str):
    """Mann–Kendall monotonic-trend test per series over the shared
    daily-mean milli sequence — the nonparametric sibling of
    theilsen_trend (same S-statistic family: sign-of-pair-difference
    sums are immune to outliers that wreck a least-squares slope).
    S = Σ_{i<j} sign(m_j − m_i) is an EXACT integer off the quantized
    series; Var(S) carries the standard tie correction as an exact
    integer numerator over 18.0; only z touches floats (one sqrt,
    mirrored).  Work after the (type, day) partial collapse is
    day-count scale — bounded at any corpus size.  ORACLE-CHECKED
    against the pair-enumeration self-join SQL."""
    import math

    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "n": [], "s": [], "v": [], "z": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        n = len(mi)
        if n < 2:
            continue
        s = 0
        for j in range(1, n):
            s += int((mi[:j] < mi[j]).sum())
            s -= int((mi[:j] > mi[j]).sum())
        _, tn = np.unique(mi, return_counts=True)
        tn = tn.astype(object)
        tsum = int((tn * (tn - 1) * (2 * tn + 5)).sum())
        num = n * (n - 1) * (2 * n + 5) - tsum
        var_s = float(num) / 18.0
        if var_s <= 0:
            continue
        if s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        rows["et"].append(et)
        rows["n"].append(n)
        rows["s"].append(s)
        rows["v"].append(var_s)
        rows["z"].append(z)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_days": pa.array(rows["n"], pa.int64()),
        "s_stat": pa.array(rows["s"], pa.int64()),
        "var_s": pa.array(round6_tie_robust(
            np.array(rows["v"], np.float64))),
        "z": pa.array(round6_tie_robust(
            np.array(rows["z"], np.float64))),
    }))


READABILITY_ARI_SQL = """
WITH c AS (
  SELECT doc_id,
         length(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g'))
           AS chars,
         length(regexp_extract_all(text, '\\S+')) AS words,
         length(regexp_extract_all(text, '[.!?]+')) AS sentences
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id, CAST(chars AS BIGINT) AS chars,
       CAST(words AS BIGINT) AS words,
       CAST(sentences AS BIGINT) AS sentences,
       ROUND(4.71 * (CAST(chars AS DOUBLE) / words)
             + 0.5 * (CAST(words AS DOUBLE)
                      / GREATEST(1, sentences))
             - 21.43, 6) AS ari
FROM c WHERE words > 0
"""


def q_readability_ari(sf_dir: str):
    """Automated Readability Index per document — the classic
    count-based readability grade (ARI = 4.71·chars/words +
    0.5·words/sentences − 21.43), the quality-filter signal next to
    text_stats/sentence_stats that needs NO dictionary or syllable
    model, so every count is exact and cross-engine.  One stateless
    Arrow map over the corpus: chars/words/sentences are RE2
    match-counts (pc.count_substring_regex == DuckDB
    regexp_extract_all length, verified same semantics), zero Python
    per row, no exchange at all.  ORACLE-CHECKED."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("chars", pa.int64()),
                            ("words", pa.int64()),
                            ("sentences", pa.int64()),
                            ("ari", pa.float64())])

    def _ari(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["text"]))
        if len(batch) == 0:
            return out_schema.empty_table()
        txt = batch["text"]
        chars = pc.count_substring_regex(
            txt, "[A-Za-z0-9]").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        words = pc.count_substring_regex(
            txt, r"\S+").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        sents = pc.count_substring_regex(
            txt, "[.!?]+").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        keep = words > 0
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        chars, words, sents = chars[keep], words[keep], sents[keep]
        s1 = np.maximum(1, sents).astype(np.float64)
        ari = (4.71 * (chars.astype(np.float64) / words)
               + 0.5 * (words.astype(np.float64) / s1) - 21.43)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "chars": pa.array(chars, pa.int64()),
            "words": pa.array(words, pa.int64()),
            "sentences": pa.array(sents, pa.int64()),
            "ari": pa.array(round6_tie_robust(ari), pa.float64()),
        }, schema=out_schema)

    return _collect(ds.map_batches(_ari, batch_format="pyarrow",
                                   zero_copy_batch=True))


CHAO1_RICHNESS_SQL = """
WITH toks AS (
  SELECT t.term
  FROM documents,
       UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
         AS t(term)
  WHERE t.term <> ''),
tc AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
ff AS (SELECT n, COUNT(*) AS cnt FROM tc GROUP BY 1),
s AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS v_types,
         CAST(COALESCE(SUM(CASE WHEN n = 1 THEN cnt END), 0)
              AS BIGINT) AS f1,
         CAST(COALESCE(SUM(CASE WHEN n = 2 THEN cnt END), 0)
              AS BIGINT) AS f2,
         CAST(SUM(n * cnt) AS BIGINT) AS n_tokens
  FROM ff)
SELECT v_types, f1, f2, n_tokens,
       ROUND(v_types + CAST(f1 * (f1 - 1) AS DOUBLE)
             / (2.0 * (f2 + 1.0)), 6) AS chao1,
       ROUND(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS coverage
FROM s
"""


def q_chao1_richness(sf_dir: str):
    """Chao1 unseen-vocabulary estimator + Good's coverage over the
    whole corpus — "how much vocabulary has this crawl NOT seen yet",
    the capture–recapture companion to heaps_law (Heaps fits growth,
    Chao1 bounds the asymptote from hapax/dis counts alone).  Pipeline:
    the shared wordcount exchange (stages/wordcount.term_counts — block
    combiners, ONE keyed merge) then a frequency-of-frequencies
    collapse inside map_batches, so what reaches the driver is
    |distinct count values| rows — log-scale tiny at any corpus size.
    v/f1/f2/N are exact ints; the bias-corrected f1(f1−1)/(2(f2+1))
    form avoids the f2=0 pole.  ORACLE-CHECKED."""
    import ray.data as rd

    from ..kernels.rounding import round6_tie_robust
    from ..stages.wordcount import term_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    tc = term_counts(ds, [], "text")
    ff_schema = pa.schema([("n", pa.int64()), ("cnt", pa.int64())])

    def _ff(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return ff_schema.empty_table()
        g = pa.table({"n": batch["n"]}).group_by(["n"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["n", "cnt"]).cast(ff_schema)

    parts = _collect_raw(tc.map_batches(
        _ff, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    ff = parts.groupby("n")["cnt"].sum()
    v = int(ff.sum())
    f1 = int(ff.get(1, 0))
    f2 = int(ff.get(2, 0))
    n_tok = int((ff.index.values.astype(object)
                 * ff.values.astype(object)).sum())
    chao1 = float(v) + float(f1 * (f1 - 1)) / (2.0 * (f2 + 1.0))
    coverage = 1.0 - float(f1) / float(n_tok)
    return _collect(pa.table({
        "v_types": pa.array([v], pa.int64()),
        "f1": pa.array([f1], pa.int64()),
        "f2": pa.array([f2], pa.int64()),
        "n_tokens": pa.array([n_tok], pa.int64()),
        "chao1": pa.array(round6_tie_robust(
            np.array([chao1], np.float64))),
        "coverage": pa.array(round6_tie_robust(
            np.array([coverage], np.float64))),
    }))


FRIEDMAN_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
w AS (SELECT event_type, day // 7 AS week, day % 7 AS dow, mi
      FROM d),
fullw AS (SELECT event_type, week FROM w GROUP BY 1, 2
          HAVING COUNT(*) = 7),
b AS (SELECT w.event_type AS event_type, w.week AS week,
             w.dow AS dow, w.mi AS mi
      FROM w JOIN fullw USING (event_type, week)),
r AS (
  SELECT event_type, week, dow,
         2 * (RANK() OVER (PARTITION BY event_type, week
                           ORDER BY mi) - 1)
           + COUNT(*) OVER (PARTITION BY event_type, week, mi) + 1
           AS r2
  FROM b),
agg AS (SELECT event_type, COUNT(DISTINCT week) AS n,
               CAST(SUM(r2 * r2) AS HUGEINT) AS a2
        FROM r GROUP BY 1),
rj AS (SELECT event_type, dow, CAST(SUM(r2) AS HUGEINT) AS r2j
       FROM r GROUP BY 1, 2),
s2 AS (SELECT rj.event_type AS event_type,
              CAST(SUM((rj.r2j - 8 * agg.n) * (rj.r2j - 8 * agg.n))
                   AS HUGEINT) AS s2
       FROM rj JOIN agg USING (event_type) GROUP BY 1),
f AS (SELECT agg.event_type AS event_type, agg.n AS n, s2.s2 AS s2,
             agg.a2 - 448 * agg.n AS den
      FROM agg JOIN s2 USING (event_type))
SELECT event_type, CAST(n AS BIGINT) AS n_weeks,
       ROUND(6.0 * s2 / den, 6) AS q_stat
FROM f WHERE den > 0
"""


def q_friedman_test(sf_dir: str):
    """Friedman rank test per series — blocks = calendar weeks,
    treatments = the 7 within-week positions of the daily-mean milli
    sequence (the repeated-measures companion to kruskal_wallis: does
    the weekly shape repeat, judged block-by-block so a trending level
    cannot fake it).  Only COMPLETE 7-day weeks enter.  EXACT algebra:
    within-block midranks in half-units (r2 = 2·cnt_less + cnt_eq + 1,
    an integer), per-position rank sums R2_j and A2 = Σr2² exact ints,
    and the tie-corrected statistic reduces to Q = 6·S2/(A2 − 448n)
    with S2 = Σ_j (R2_j − 8n)² — ONE float division.  Per-series work
    is week-count scale."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "n": [], "q": []}
    for et in sorted(series):
        days, mi, _ = series[et]
        week = days // 7
        uw, wcnt = np.unique(week, return_counts=True)
        full = set(uw[wcnt == 7].tolist())
        if not full:
            continue
        dow = days % 7
        r2sum = {}
        a2 = 0
        n = 0
        for wv in sorted(full):
            mask = week == wv
            x = mi[mask]
            dw = dow[mask]
            # midrank in half-units: r2 = 2*cnt_less + cnt_eq + 1
            cnt_less = (x[:, None] > x[None, :]).sum(axis=1)
            cnt_eq = (x[:, None] == x[None, :]).sum(axis=1)
            r2 = 2 * cnt_less + cnt_eq + 1
            for p, rv in zip(dw.tolist(), r2.tolist()):
                r2sum[p] = r2sum.get(p, 0) + int(rv)
            a2 += int((r2.astype(object) ** 2).sum())
            n += 1
        s2 = sum((rv - 8 * n) ** 2 for rv in r2sum.values())
        den = a2 - 448 * n
        if den <= 0:
            continue
        rows["et"].append(et)
        rows["n"].append(n)
        rows["q"].append(6.0 * s2 / den)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_weeks": pa.array(rows["n"], pa.int64()),
        "q_stat": pa.array(round6_tie_robust(
            np.array(rows["q"], np.float64))),
    }))


BROWN_FORSYTHE_SQL = """
WITH v AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
m AS (SELECT event_type, dow, CAST(2 * MEDIAN(vi) AS BIGINT) AS m2
      FROM v GROUP BY 1, 2),
z AS (SELECT v.event_type AS event_type, v.dow AS dow,
             ABS(2 * v.vi - m.m2) AS z2
      FROM v JOIN m USING (event_type, dow)),
g AS (SELECT event_type, dow, COUNT(*) AS n,
             CAST(SUM(z2) AS HUGEINT) AS sz,
             CAST(SUM(z2 * z2) AS HUGEINT) AS szz
      FROM z GROUP BY 1, 2),
a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(sz) AS HUGEINT) AS st,
         SUM(CAST(sz AS DOUBLE) * sz / n ORDER BY dow) AS betg,
         SUM(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n
             ORDER BY dow) AS win
  FROM g GROUP BY 1),
b AS (SELECT event_type, k, nn,
             betg - CAST(st AS DOUBLE) * st / nn AS ssb,
             win AS ssw
      FROM a)
SELECT event_type, k, nn AS n, ROUND(ssb, 6) AS ssb,
       ROUND(ssw, 6) AS ssw,
       ROUND((ssb / (k - 1)) / (ssw / (nn - k)), 6) AS f_bf
FROM b WHERE k > 1 AND ssw > 0
"""


def q_brown_forsythe(sf_dir: str):
    """Brown–Forsythe (median-centred Levene) test of variance
    homogeneity across weekdays per series — "is the SPREAD seasonal
    even when the level isn't", the variance-side companion to
    anova_events/kruskal_wallis.  EXACT-ALGEBRA discipline: group
    medians live in half-units (m2 = 2·median, an integer — the shared
    MEDIAN-doubling trick), the centred scores z2 = |2·vi − m2| are
    exact ints, and per-(type, dow) (n, Σz2, Σz2²) integer partials
    collapse off the bounded value histogram; the ANOVA-identity F on z
    mirrors the oracle operand-for-operand (dow-ordered folds).  The
    half-unit scale factor cancels in F.  Cell-count scale everywhere.
    ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("dow", pa.int64()), ("vi", pa.int64()),
                             ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        vi = np.floor(round6_tie_robust(v) * 1000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "dow": pa.array((t_us // _DAY_US + 4) % 7,
                                      pa.int64()),
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "dow", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "dow", "vi",
                                 "n"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["event_type", "dow", "vi"],
                          as_index=False)["n"].sum()
    rows = {"et": [], "k": [], "n": [], "ssb": [], "ssw": [],
            "f": []}
    for et, sub in cells.groupby("event_type"):
        stats = []          # (dow, n_j, Sz_j, Szz_j) exact ints
        for dow, dsub in sub.groupby("dow"):
            vi = dsub["vi"].to_numpy(np.int64)
            cnt = dsub["n"].to_numpy(np.int64)
            order = np.argsort(vi, kind="stable")
            vi, cnt = vi[order], cnt[order]
            nj = int(cnt.sum())
            cum = np.cumsum(cnt)
            lo = int(vi[np.searchsorted(cum, (nj - 1) // 2 + 1)])
            hi = int(vi[np.searchsorted(cum, nj // 2 + 1)])
            m2 = lo + hi
            z2 = np.abs(2 * vi - m2).astype(object)
            co = cnt.astype(object)
            stats.append((int(dow), nj, int((z2 * co).sum()),
                          int((z2 * z2 * co).sum())))
        k = len(stats)
        if k < 2:
            continue
        nn = sum(s[1] for s in stats)
        st = sum(s[2] for s in stats)
        betg = 0.0
        win = 0.0
        for _, nj, sz, szz in sorted(stats):
            betg += float(sz) * sz / nj
            win += float(szz) - float(sz) * sz / nj
        ssb = betg - float(st) * st / nn
        ssw = win
        if ssw <= 0:
            continue
        rows["et"].append(et)
        rows["k"].append(k)
        rows["n"].append(nn)
        rows["ssb"].append(ssb)
        rows["ssw"].append(ssw)
        rows["f"].append((ssb / (k - 1)) / (ssw / (nn - k)))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "k": pa.array(rows["k"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "ssb": pa.array(round6_tie_robust(
            np.array(rows["ssb"], np.float64))),
        "ssw": pa.array(round6_tie_robust(
            np.array(rows["ssw"], np.float64))),
        "f_bf": pa.array(round6_tie_robust(
            np.array(rows["f"], np.float64))),
    }))


SAMPLE_ENTROPY_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
med AS (SELECT event_type, CAST(2 * MEDIAN(mi) AS BIGINT) AS med2
        FROM d GROUP BY 1),
madt AS (
  SELECT d.event_type AS event_type,
         CAST(2 * MEDIAN(ABS(2 * d.mi - med.med2)) AS BIGINT) AS mad4
  FROM d JOIN med USING (event_type) GROUP BY 1),
seq AS (
  SELECT event_type, mi,
         LEAD(mi, 1) OVER (PARTITION BY event_type ORDER BY day)
           AS m1,
         LEAD(mi, 2) OVER (PARTITION BY event_type ORDER BY day)
           AS m2v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
           AS idx
  FROM d),
n0 AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY 1),
p AS (
  SELECT a.event_type AS event_type,
         SUM(CASE WHEN a.m1 IS NOT NULL AND b.m1 IS NOT NULL
                   AND 4 * GREATEST(ABS(a.mi - b.mi),
                                    ABS(a.m1 - b.m1)) <= m.mad4
                  THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN a.m2v IS NOT NULL AND b.m2v IS NOT NULL
                   AND 4 * GREATEST(ABS(a.mi - b.mi),
                                    ABS(a.m1 - b.m1),
                                    ABS(a.m2v - b.m2v)) <= m.mad4
                  THEN 1 ELSE 0 END) AS a
  FROM seq a
  JOIN seq b ON b.event_type = a.event_type AND b.idx > a.idx
  JOIN madt m ON m.event_type = a.event_type
  GROUP BY 1)
SELECT p.event_type AS event_type, CAST(n0.n AS BIGINT) AS n_days,
       CAST(p.b AS BIGINT) AS b_count, CAST(p.a AS BIGINT) AS a_count,
       ROUND(-LN(CAST(p.a AS DOUBLE) / p.b), 6) AS sampen
FROM p JOIN n0 USING (event_type) WHERE p.a > 0 AND p.b > 0
"""


def q_sample_entropy(sf_dir: str):
    """Sample entropy (m = 2, Chebyshev distance, r = the series MAD)
    of each daily-mean sequence — the regularity/complexity index next
    to perm_entropy (SampEn sees amplitude structure permutation
    entropy is blind to; low SampEn = self-similar, forecastable).
    EXACT matching: the tolerance lives in quarter-units (mad4 = 4·MAD
    via the doubled-MEDIAN trick, an integer), so every template
    comparison 4·max|Δ| ≤ mad4 is integer-only and B (m=2 pairs) and A
    (m=3 pairs) are exact counts; −ln(A/B) is the single float.
    Template pairs are O(days²) per series — day-count scale, bounded
    at any corpus size.  ORACLE-CHECKED against the LEAD self-join
    SQL."""
    import math

    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "n": [], "b": [], "a": [], "se": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        n = len(mi)
        if n < 4:
            continue
        x = np.sort(mi)
        med2 = int(x[(n - 1) // 2]) + int(x[n // 2])
        dev2 = np.sort(np.abs(2 * mi - med2))
        mad4 = int(dev2[(n - 1) // 2]) + int(dev2[n // 2])
        d = np.abs(mi[None, :] - mi[:, None])
        c2 = np.maximum(d[:-1, :-1], d[1:, 1:])
        iu2 = np.triu_indices(n - 1, 1)
        b = int((4 * c2[iu2] <= mad4).sum())
        c3 = np.maximum(c2[:-1, :-1], d[2:, 2:])
        iu3 = np.triu_indices(n - 2, 1)
        a = int((4 * c3[iu3] <= mad4).sum())
        if a <= 0 or b <= 0:
            continue
        rows["et"].append(et)
        rows["n"].append(n)
        rows["b"].append(b)
        rows["a"].append(a)
        rows["se"].append(-math.log(a / b))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_days": pa.array(rows["n"], pa.int64()),
        "b_count": pa.array(rows["b"], pa.int64()),
        "a_count": pa.array(rows["a"], pa.int64()),
        "sampen": pa.array(round6_tie_robust(
            np.array(rows["se"], np.float64))),
    }))


BOLLINGER_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
w AS (
  SELECT event_type, day, mi,
         SUM(mi) OVER win AS s,
         SUM(mi * mi) OVER win AS q,
         COUNT(*) OVER win AS c
  FROM d
  WINDOW win AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
f AS (SELECT * FROM w WHERE c = 7),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(CASE WHEN (7 * mi - s) * (7 * mi - s)
                            > 4 * (7 * q - s * s)
                        AND 7 * mi > s THEN 1 ELSE 0 END)
              AS BIGINT) AS n_above,
         CAST(SUM(CASE WHEN (7 * mi - s) * (7 * mi - s)
                            > 4 * (7 * q - s * s)
                        AND 7 * mi < s THEN 1 ELSE 0 END)
              AS BIGINT) AS n_below,
         SUM(SQRT(CAST(7 * q - s * s AS DOUBLE)) ORDER BY day) AS wsum
  FROM f GROUP BY 1)
SELECT event_type, n_windows, n_above, n_below,
       ROUND(4.0 * wsum / (7000.0 * n_windows), 6) AS mean_band_width
FROM g
"""


def q_bollinger_daily(sf_dir: str):
    """Bollinger bands on the daily-mean series — a trailing 7-row
    window (the last 7 OBSERVED days) per series, counting closes
    outside mean ± 2·sigma plus the mean band width (4·sigma, the
    volatility profile).  EXACT band test: with S = Sigma mi and
    Q = Sigma mi^2 over the window (exact int64 in milli-units), the
    condition |mi − S/7| > 2·sigma is the integer inequality
    (7·mi − S)^2 > 4·(7·Q − S^2) — no float enters the decision, so
    the engine and the oracle's HUGEINT window sums agree bit-for-bit.
    The width 4·sqrt(7Q − S^2)/7000 uses IEEE-exact sqrt; the
    window-ordered fold mirrors the oracle's ORDER BY day SUM.
    Sliding sums are cumsum differences — day-count scale per series,
    bounded at any corpus size.  ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "nw": [], "na": [], "nb": [], "w": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        n = len(mi)
        if n < 7:
            continue
        cs = np.concatenate(([0], np.cumsum(mi, dtype=np.int64)))
        cq = np.concatenate(([0], np.cumsum(mi.astype(np.int64) ** 2,
                                            dtype=np.int64)))
        s = cs[7:] - cs[:-7]
        q = cq[7:] - cq[:-7]
        x = mi[6:]
        lhs = (7 * x - s) ** 2
        rhs = 4 * (7 * q - s * s)
        out = lhs > rhs
        na = int((out & (7 * x > s)).sum())
        nb = int((out & (7 * x < s)).sum())
        wsum = 0.0
        for v in np.sqrt((7 * q - s * s).astype(np.float64)).tolist():
            wsum += v  # sequential fold == oracle's ORDER BY day SUM
        rows["et"].append(et)
        rows["nw"].append(len(x))
        rows["na"].append(na)
        rows["nb"].append(nb)
        rows["w"].append(4.0 * wsum / (7000.0 * len(x)))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_windows": pa.array(rows["nw"], pa.int64()),
        "n_above": pa.array(rows["na"], pa.int64()),
        "n_below": pa.array(rows["nb"], pa.int64()),
        "mean_band_width": pa.array(round6_tie_robust(
            np.array(rows["w"], np.float64))),
    }))


NDCG_SQL = """
WITH u AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(FLOOR(ROUND(SUM(value), 6) * 1000000 + 0.5)
              AS BIGINT) AS svi
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2),
r AS (
  SELECT event_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY svi DESC, user_id) AS rnk,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cnt DESC, user_id) AS irnk
  FROM u),
d AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN rnk <= 10
                       THEN cnt * (2520 // rnk) ELSE 0 END)
              AS BIGINT) AS dcg_num,
         CAST(SUM(CASE WHEN irnk <= 10
                       THEN cnt * (2520 // irnk) ELSE 0 END)
              AS BIGINT) AS idcg_num
  FROM r GROUP BY 1)
SELECT event_type, n_users, dcg_num, idcg_num,
       ROUND(CAST(dcg_num AS DOUBLE) / idcg_num, 6) AS ndcg
FROM d WHERE idcg_num > 0
"""


def q_ndcg_eval(sf_dir: str):
    """Harmonic-discount NDCG@10 per series — ranking-quality eval of
    "rank users by total spend, judge by true engagement": the
    predicted ranking orders users by Sigma value (micro-unit integer
    after the two-step pre-round, user_id tie-break) and the graded
    relevance gain is the user's event COUNT.  EXACT algebra: with
    the harmonic discount 1/i cleared by L = lcm(1..10) = 2520,
    DCG@10 = Sigma gain_i·(2520/i) / 2520 — so dcg_num and idcg_num
    (ideal = gains sorted desc, tie-order-invariant) are exact ints
    and NDCG = dcg_num/idcg_num is ONE float division.  The (type,
    user) aggregation collapses map-side to user-count-scale partials
    (same footprint discipline as funnel_users).  ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "user_id", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("user_id", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])

    def _parts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [("value", "sum"), ("value", "count")])
        return g.rename_columns(["event_type", "user_id", "s",
                                 "n"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _parts, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    u = parts.groupby(["event_type", "user_id"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    weights = {i: 2520 // i for i in range(1, 11)}
    rows = {"et": [], "nu": [], "d": [], "i": [], "g": []}
    for et, sub in u.groupby("event_type"):
        svi = np.floor(round6_tie_robust(sub["s"].to_numpy(np.float64))
                       * 1e6 + 0.5).astype(np.int64)
        cnt = sub["n"].to_numpy(np.int64)
        uid = sub["user_id"].to_numpy(np.int64)
        pred = np.lexsort((uid, -svi))[:10]
        ideal = np.lexsort((uid, -cnt))[:10]
        dcg = sum(int(cnt[j]) * weights[i + 1]
                  for i, j in enumerate(pred))
        idcg = sum(int(cnt[j]) * weights[i + 1]
                   for i, j in enumerate(ideal))
        if idcg <= 0:
            continue
        rows["et"].append(et)
        rows["nu"].append(len(sub))
        rows["d"].append(dcg)
        rows["i"].append(idcg)
        rows["g"].append(dcg / idcg)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_users": pa.array(rows["nu"], pa.int64()),
        "dcg_num": pa.array(rows["d"], pa.int64()),
        "idcg_num": pa.array(rows["i"], pa.int64()),
        "ndcg": pa.array(round6_tie_robust(
            np.array(rows["g"], np.float64))),
    }))


ADJUSTED_RAND_SQL = """
WITH d AS (
  SELECT source,
         CASE WHEN n_chars < 150 THEN 0 WHEN n_chars < 300 THEN 1
              WHEN n_chars < 450 THEN 2 ELSE 3 END AS band
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
c AS (SELECT source, band, CAST(COUNT(*) AS HUGEINT) AS n
      FROM d GROUP BY 1, 2),
sij AS (SELECT CAST(SUM(n * (n - 1) / 2) AS HUGEINT) AS sij FROM c),
sa AS (SELECT CAST(SUM(t * (t - 1) / 2) AS HUGEINT) AS sa,
              CAST(COUNT(*) AS BIGINT) AS k_source
       FROM (SELECT SUM(n) AS t FROM c GROUP BY source)),
sb AS (SELECT CAST(SUM(t * (t - 1) / 2) AS HUGEINT) AS sb,
              CAST(COUNT(*) AS BIGINT) AS k_band
       FROM (SELECT SUM(n) AS t FROM c GROUP BY band)),
tot AS (SELECT CAST(SUM(n) AS HUGEINT) AS n FROM c)
SELECT CAST(n AS BIGINT) AS n_docs, k_source, k_band,
       CAST(sij AS BIGINT) AS sum_pair_cells,
       ROUND(CAST(2 * (n * (n - 1) / 2) * sij - 2 * sa * sb AS DOUBLE)
             / ((n * (n - 1) / 2) * (sa + sb) - 2 * sa * sb), 6) AS ari
FROM sij, sa, sb, tot
WHERE (n * (n - 1) / 2) * (sa + sb) - 2 * sa * sb <> 0
"""


def q_adjusted_rand(sf_dir: str):
    """Adjusted Rand Index between two document partitions — source
    vs fixed length bands (integer edges 150/300/450, convention-free
    per the dmdt grid discipline): "does provenance predict document
    shape", the chance-corrected co-clustering agreement.  EXACT
    algebra: the contingency cells n_ij, marginals and every binomial
    C(.,2) are exact ints (Python bigint == oracle HUGEINT), and with
    P = C(n,2) the index ARI = (2·P·Sij − 2·Sa·Sb)/(P·(Sa+Sb) −
    2·Sa·Sb) is ONE float division of two exact ints (the /2 cleared
    so odd Sa+Sb stays integral).  Cells collapse map-side —
    |sources|x4 rows cross the wire at any corpus size.
    ORACLE-CHECKED."""
    import ray.data as rd
    from ..kernels.rounding import round6_tie_robust

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    part_schema = pa.schema([("source", pa.string()),
                             ("band", pa.int64()), ("n", pa.int64())])

    def _cells(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["source"]),
                    pc.is_valid(batch["n_chars"]))
        batch = batch.filter(m)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        band = ((nc >= 150).astype(np.int64) + (nc >= 300)
                + (nc >= 450))
        t = pa.table({"source": batch["source"],
                      "band": pa.array(band, pa.int64())})
        g = t.group_by(["source", "band"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["source", "band", "n"]).cast(
            part_schema)

    parts = _collect_raw(ds.map_batches(
        _cells, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["source", "band"], as_index=False)["n"].sum()
    if cells.empty:
        return pa.table({"n_docs": pa.array([], pa.int64()),
                         "k_source": pa.array([], pa.int64()),
                         "k_band": pa.array([], pa.int64()),
                         "sum_pair_cells": pa.array([], pa.int64()),
                         "ari": pa.array([], pa.float64())})
    nij = [int(v) for v in cells["n"]]
    n = sum(nij)
    a = [int(v) for v in cells.groupby("source")["n"].sum()]
    b = [int(v) for v in cells.groupby("band")["n"].sum()]
    sij = sum(v * (v - 1) // 2 for v in nij)
    sa = sum(v * (v - 1) // 2 for v in a)
    sb = sum(v * (v - 1) // 2 for v in b)
    p = n * (n - 1) // 2
    den = p * (sa + sb) - 2 * sa * sb
    rows = ([(n, len(a), len(b), sij,
              (2 * p * sij - 2 * sa * sb) / den)]
            if den != 0 else [])
    return _collect(pa.table({
        "n_docs": pa.array([r[0] for r in rows], pa.int64()),
        "k_source": pa.array([r[1] for r in rows], pa.int64()),
        "k_band": pa.array([r[2] for r in rows], pa.int64()),
        "sum_pair_cells": pa.array([r[3] for r in rows], pa.int64()),
        "ari": pa.array(round6_tie_robust(
            np.array([r[4] for r in rows], np.float64))),
    }))


HAAR_ENERGY_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
r0 AS (SELECT event_type, mi AS x,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY day) AS rn
       FROM d),
l1 AS (SELECT event_type, (rn - 1) // 2 AS i,
              SUM(CASE WHEN rn % 2 = 1 THEN x ELSE -x END) AS dd,
              SUM(x) AS s, COUNT(*) AS c
       FROM r0 GROUP BY 1, 2),
r1 AS (SELECT event_type, s AS x, dd,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY i) AS rn
       FROM l1 WHERE c = 2),
l2 AS (SELECT event_type, (rn - 1) // 2 AS i,
              SUM(CASE WHEN rn % 2 = 1 THEN x ELSE -x END) AS dd,
              SUM(x) AS s, COUNT(*) AS c
       FROM r1 GROUP BY 1, 2),
r2 AS (SELECT event_type, s AS x, dd,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY i) AS rn
       FROM l2 WHERE c = 2),
l3 AS (SELECT event_type, (rn - 1) // 2 AS i,
              SUM(CASE WHEN rn % 2 = 1 THEN x ELSE -x END) AS dd,
              COUNT(*) AS c
       FROM r2 GROUP BY 1, 2),
e AS (
  SELECT event_type, 1 AS level, COUNT(*) AS n_coef,
         SUM(dd * dd) AS ssd FROM r1 GROUP BY 1
  UNION ALL
  SELECT event_type, 2 AS level, COUNT(*) AS n_coef,
         SUM(dd * dd) AS ssd FROM r2 GROUP BY 1
  UNION ALL
  SELECT event_type, 3 AS level, COUNT(*) AS n_coef,
         SUM(dd * dd) AS ssd FROM l3 WHERE c = 2 GROUP BY 1)
SELECT event_type, CAST(level AS BIGINT) AS level,
       CAST(n_coef AS BIGINT) AS n_coef,
       ROUND(CAST(ssd AS DOUBLE)
             / (POWER(2, level) * 1000000.0), 6) AS energy
FROM e WHERE n_coef > 0
"""


def q_haar_energy(sf_dir: str):
    """Haar wavelet detail energy by level (1-3) of each daily-mean
    series — the multi-resolution variance profile: level-1 energy is
    day-to-day jitter, level-3 is ~week-scale swing (the wavelet
    companion to structure_function's time-domain bins).  EXACT
    cascade: unnormalized details d = x_even − x_odd and smooths
    s = x_even + x_odd stay int64 milli-units through all levels
    (odd tails dropped per level, the standard dyadic truncation),
    energies Sigma d^2 are exact ints, and the orthonormal 2^level
    scaling plus milli^2 conversion is ONE division by the constant
    2^level * 1e6 both sides.  Per-series work is linear in days.
    ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "lv": [], "nc": [], "en": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        x = mi.astype(np.int64)
        for level in (1, 2, 3):
            m = len(x) // 2
            if m == 0:
                break
            ev, od = x[0:2 * m:2], x[1:2 * m:2]
            dd = ev - od
            x = ev + od
            rows["et"].append(et)
            rows["lv"].append(level)
            rows["nc"].append(m)
            rows["en"].append(float(int((dd.astype(object) ** 2).sum()))
                              / (2.0 ** level * 1e6))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "level": pa.array(rows["lv"], pa.int64()),
        "n_coef": pa.array(rows["nc"], pa.int64()),
        "energy": pa.array(round6_tie_robust(
            np.array(rows["en"], np.float64))),
    }))


ROC_AUC_SQL = """
WITH u AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(FLOOR(ROUND(SUM(value), 6) * 1000000 + 0.5)
              AS HUGEINT) AS svi
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT event_type, SUM(svi) AS tots, SUM(cnt) AS totn
      FROM u GROUP BY 1),
g AS (
  SELECT u.event_type AS event_type, cnt,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN svi * totn > tots * cnt
                       THEN 1 ELSE 0 END) AS BIGINT) AS mp
  FROM u JOIN t USING (event_type) GROUP BY 1, 2),
w AS (
  SELECT event_type, m, mp,
         2 * (SUM(m) OVER (PARTITION BY event_type ORDER BY cnt)
              - m) + m + 1 AS r2
  FROM g),
a AS (
  SELECT event_type, CAST(SUM(mp * r2) AS BIGINT) AS sr2,
         CAST(SUM(mp) AS BIGINT) AS n_pos,
         CAST(SUM(m - mp) AS BIGINT) AS n_neg
  FROM w GROUP BY 1)
SELECT event_type, n_pos, n_neg,
       CAST(sr2 - n_pos * (n_pos + 1) AS BIGINT) AS u_stat_x2,
       ROUND(CAST(sr2 - n_pos * (n_pos + 1) AS DOUBLE)
             / (2.0 * n_pos * n_neg), 6) AS auc
FROM a WHERE n_pos > 0 AND n_neg > 0
"""


def q_roc_auc(sf_dir: str):
    """Rank-based ROC AUC per series — "does a user's activity count
    predict above-average spend per event": score = the user's event
    count (exact int), label = the user's mean value beats the type
    mean, decided by the exact integer cross-multiplication
    svi*N > S*cnt on two-step-pre-rounded micro-unit sums (no float
    division enters the label).  EXACT Mann-Whitney identity:
    midranks in half-units (r2 = 2*cnt_less + cnt_eq + 1, the shared
    half-unit trick), so AUC = (Sigma_pos r2 − np(np+1)) / (2*np*nn)
    is exact ints over ONE float division — ties between positive and
    negative users contribute exactly 1/2 each.  (type,user) partials
    combine map-side (count + sum are both mergeable).
    ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "user_id", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("user_id", pa.int64()),
                             ("n", pa.int64()), ("s", pa.float64())])

    def _parts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["event_type", "user_id", "n",
                                 "s"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _parts, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    u = parts.groupby(["event_type", "user_id"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"))
    rows = {"et": [], "np": [], "nn": [], "u2": [], "auc": []}
    for et, sub in u.groupby("event_type"):
        cnt = sub["n"].to_numpy(np.int64)
        svi = np.floor(round6_tie_robust(sub["s"].to_numpy(np.float64))
                       * 1e6 + 0.5).astype(np.int64)
        tots = int(svi.astype(object).sum())
        totn = int(cnt.sum())
        pos = np.array([int(a) * totn > tots * int(b)
                        for a, b in zip(svi, cnt)], bool)
        n_pos, n_neg = int(pos.sum()), int((~pos).sum())
        if n_pos == 0 or n_neg == 0:
            continue
        order = np.argsort(cnt, kind="stable")
        cs, ps = cnt[order], pos[order]
        # half-unit midranks off the sorted run-length structure
        uniq, start = np.unique(cs, return_index=True)
        m = np.diff(np.append(start, len(cs)))
        less = start  # cumulative count strictly below each value
        r2_by_run = 2 * less + m + 1
        run_of = np.repeat(np.arange(len(uniq)), m)
        sr2 = int(r2_by_run[run_of][ps].sum())
        u2 = sr2 - n_pos * (n_pos + 1)
        rows["et"].append(et)
        rows["np"].append(n_pos)
        rows["nn"].append(n_neg)
        rows["u2"].append(u2)
        rows["auc"].append(u2 / (2.0 * n_pos * n_neg))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_pos": pa.array(rows["np"], pa.int64()),
        "n_neg": pa.array(rows["nn"], pa.int64()),
        "u_stat_x2": pa.array(rows["u2"], pa.int64()),
        "auc": pa.array(round6_tie_robust(
            np.array(rows["auc"], np.float64))),
    }))


NAIVE_BAYES_SQL = """
WITH f AS (
  SELECT event_type AS cls,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         CASE WHEN value >= 400.0 THEN 4 WHEN value >= 200.0 THEN 3
              WHEN value >= 100.0 THEN 2 WHEN value >= 50.0 THEN 1
              ELSE 0 END AS band,
         (epoch_us(ts) % 86400000000) // 21600000000 AS hb
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
nc AS (SELECT cls, CAST(COUNT(*) AS HUGEINT) AS n FROM f GROUP BY 1),
c1 AS (SELECT cls, dow, CAST(COUNT(*) AS HUGEINT) AS c
       FROM f GROUP BY 1, 2),
c2 AS (SELECT cls, band, CAST(COUNT(*) AS HUGEINT) AS c
       FROM f GROUP BY 1, 2),
c3 AS (SELECT cls, hb, CAST(COUNT(*) AS HUGEINT) AS c
       FROM f GROUP BY 1, 2),
cells AS (SELECT DISTINCT dow, band, hb FROM f),
score AS (
  SELECT cells.dow, cells.band, cells.hb, nc.cls,
         nc.n * (COALESCE(c1.c, 0) + 1) * (COALESCE(c2.c, 0) + 1)
              * (COALESCE(c3.c, 0) + 1) AS num,
         (nc.n + 7) * (nc.n + 5) * (nc.n + 4) AS den
  FROM cells CROSS JOIN nc
  LEFT JOIN c1 ON c1.cls = nc.cls AND c1.dow = cells.dow
  LEFT JOIN c2 ON c2.cls = nc.cls AND c2.band = cells.band
  LEFT JOIN c3 ON c3.cls = nc.cls AND c3.hb = cells.hb),
best AS (
  SELECT a.dow, a.band, a.hb, a.cls
  FROM score a
  WHERE NOT EXISTS (
    SELECT 1 FROM score b
    WHERE b.dow = a.dow AND b.band = a.band AND b.hb = a.hb
      AND (b.num * a.den > a.num * b.den
           OR (b.num * a.den = a.num * b.den AND b.cls < a.cls)))),
p AS (
  SELECT f.cls AS event_type, best.cls AS pred
  FROM f JOIN best USING (dow, band, hb))
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN pred = event_type THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       ROUND(SUM(CASE WHEN pred = event_type THEN 1.0 ELSE 0 END)
             / COUNT(*), 6) AS recall
FROM p GROUP BY 1
"""


def q_naive_bayes(sf_dir: str):
    """Naive-Bayes event-type classifier with broadcast-model
    inference — the canonical "train tiny model, score the corpus"
    stage: Laplace-smoothed categorical NB over (weekday, fixed value
    band 50/100/200/400, 6h hour band), resubstitution recall per
    class.  EXACT argmax: posterior scores are the fractions
    N_c*Prod(cnt+1) / Prod(N_c+K_f), and the winner per feature cell
    is decided by bigint CROSS-MULTIPLICATION (ties to the smaller
    class label) — Python bigints mirror the oracle's HUGEINT
    operand-for-operand, no float enters the decision.  The decision
    grid is only 7x5x4 = 140 cells, so per-row inference is a
    vectorized gather off the precomputed cell->class table (the
    broadcast-lookup inference pattern); count tables combine
    map-side.  ORACLE-CHECKED."""

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("cls", pa.string()), ("dow", pa.int64()),
                             ("band", pa.int64()), ("hb", pa.int64()),
                             ("n", pa.int64())])

    def _feat(batch: pa.Table):
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        dow = (t_us // _DAY_US + 4) % 7
        band = ((v >= 50.0).astype(np.int64) + (v >= 100.0)
                + (v >= 200.0) + (v >= 400.0))
        hb = (t_us % _DAY_US) // 21_600_000_000
        return dow, band, hb

    def _counts(batch: pa.Table) -> pa.Table:
        dow, band, hb = _feat(batch)
        t = pa.table({"cls": batch["event_type"],
                      "dow": pa.array(dow, pa.int64()),
                      "band": pa.array(band, pa.int64()),
                      "hb": pa.array(hb, pa.int64())})
        g = t.group_by(["cls", "dow", "band", "hb"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cls", "dow", "band", "hb",
                                 "n"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _counts, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["cls", "dow", "band", "hb"],
                          as_index=False)["n"].sum()
    if cells.empty:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "n_correct": pa.array([], pa.int64()),
                         "recall": pa.array([], pa.float64())})
    classes = sorted(cells["cls"].unique())
    n_c = cells.groupby("cls")["n"].sum().to_dict()
    t1 = cells.groupby(["cls", "dow"])["n"].sum().to_dict()
    t2 = cells.groupby(["cls", "band"])["n"].sum().to_dict()
    t3 = cells.groupby(["cls", "hb"])["n"].sum().to_dict()
    # exact-argmax decision table over the observed feature cells
    best = {}
    for dow, band, hb in {(int(d), int(b), int(h)) for d, b, h in
                          zip(cells["dow"], cells["band"],
                              cells["hb"])}:
        win = None
        for c in classes:
            n = int(n_c[c])
            num = (n * (int(t1.get((c, dow), 0)) + 1)
                   * (int(t2.get((c, band), 0)) + 1)
                   * (int(t3.get((c, hb), 0)) + 1))
            den = (n + 7) * (n + 5) * (n + 4)
            if win is None or num * win[1] > win[0] * den:
                win = (num, den, c)
        best[(dow, band, hb)] = win[2]
    # broadcast-lookup inference pass: vectorized gather per batch
    cls_idx = {c: i for i, c in enumerate(classes)}
    lut = np.full(7 * 5 * 4, -1, np.int64)
    for (dow, band, hb), c in best.items():
        lut[(dow * 5 + band) * 4 + hb] = cls_idx[c]
    conf_schema = pa.schema([("event_type", pa.string()),
                             ("ok", pa.int64()), ("n", pa.int64())])

    def _score(batch: pa.Table) -> pa.Table:
        dow, band, hb = _feat(batch)
        pred = lut[(dow * 5 + band) * 4 + hb]
        truth = np.asarray(
            [cls_idx.get(c, -2) for c in
             batch["event_type"].to_pylist()], np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "ok": pa.array((pred == truth).astype(np.int64),
                                     pa.int64())})
        g = t.group_by(["event_type"]).aggregate(
            [("ok", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "ok",
                                 "n"]).cast(conf_schema)

    conf = _collect_raw(ds.map_batches(
        _score, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = conf.groupby("event_type", as_index=False).agg(
        ok=("ok", "sum"), n=("n", "sum")).sort_values("event_type")
    from ..kernels.rounding import round6_tie_robust
    return _collect(pa.table({
        "event_type": pa.array(agg["event_type"].tolist(),
                               pa.string()),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
        "n_correct": pa.array(agg["ok"].to_numpy(np.int64)),
        "recall": pa.array(round6_tie_robust(
            agg["ok"].to_numpy(np.float64)
            / agg["n"].to_numpy(np.float64))),
    }))


MATRIX_PROFILE_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
w AS (
  SELECT event_type, day, mi AS x0,
         LEAD(mi, 1) OVER win AS x1, LEAD(mi, 2) OVER win AS x2,
         LEAD(mi, 3) OVER win AS x3,
         ROW_NUMBER() OVER win AS idx
  FROM d WINDOW win AS (PARTITION BY event_type ORDER BY day)),
v AS (SELECT * FROM w WHERE x3 IS NOT NULL),
p AS (
  SELECT a.event_type AS event_type, a.idx AS idx, a.day AS day,
         MIN((a.x0 - b.x0) * (a.x0 - b.x0)
             + (a.x1 - b.x1) * (a.x1 - b.x1)
             + (a.x2 - b.x2) * (a.x2 - b.x2)
             + (a.x3 - b.x3) * (a.x3 - b.x3)) AS mp
  FROM v a JOIN v b ON b.event_type = a.event_type
                   AND ABS(a.idx - b.idx) >= 2
  GROUP BY 1, 2, 3),
r AS (
  SELECT event_type, idx, day, mp,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mp DESC, idx) AS rn
  FROM p)
SELECT r.event_type AS event_type,
       CAST(s.n AS BIGINT) AS n_windows,
       CAST(r.idx AS BIGINT) AS discord_idx,
       CAST(r.day AS BIGINT) AS discord_day,
       ROUND(CAST(r.mp AS DOUBLE) / 1000000.0, 6) AS discord_d2,
       ROUND(CAST(s.mn AS DOUBLE) / 1000000.0, 6) AS motif_d2,
       ROUND(CAST(s.sm AS DOUBLE) / (1000000.0 * s.n), 6) AS mean_mp
FROM r JOIN (SELECT event_type, COUNT(*) AS n, MIN(mp) AS mn,
                    SUM(mp) AS sm
             FROM p GROUP BY 1) s USING (event_type)
WHERE r.rn = 1
"""


def q_matrix_profile(sf_dir: str):
    """Matrix profile (window = 4 observed days, trivial-match
    exclusion |i−j| >= 2) of each daily-mean series — the discord /
    motif detector: each subsequence's distance to its nearest
    non-overlapping neighbor; the max of that profile is the series'
    most anomalous week-shape (discord), the min its most repeated
    one (motif).  EXACT: squared euclidean distances between
    milli-unit windows are exact int64, the profile is an integer
    MIN per window, and discord selection orders by (mp DESC, idx) —
    integer compares only; the three reported floats are single
    divisions by 1e6.  Per-series O(windows^2 * 4) int work — day-
    count scale, bounded at any corpus size (the per-series work does
    not grow with corpus rows).  ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "nw": [], "di": [], "dd": [], "d2": [],
            "mo": [], "mm": []}
    for et in sorted(series):
        days, mi, _ = series[et]
        n = len(mi)
        nw = n - 3
        if nw < 3:
            continue
        w = np.stack([mi[i:i + nw] for i in range(4)],
                     axis=1).astype(np.int64)
        diff = w[:, None, :] - w[None, :, :]
        d2 = (diff * diff).sum(axis=2)
        big = np.int64(2 ** 62)
        ii = np.arange(nw)
        excl = np.abs(ii[:, None] - ii[None, :]) < 2
        d2[excl] = big
        mp = d2.min(axis=1)
        best = int(np.lexsort((ii, -mp))[0])  # max mp, tie -> min idx
        rows["et"].append(et)
        rows["nw"].append(nw)
        rows["di"].append(best + 1)
        rows["dd"].append(int(days[best]))
        rows["d2"].append(float(mp[best]) / 1e6)
        rows["mo"].append(float(mp.min()) / 1e6)
        rows["mm"].append(float(int(mp.astype(object).sum()))
                          / (1e6 * nw))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_windows": pa.array(rows["nw"], pa.int64()),
        "discord_idx": pa.array(rows["di"], pa.int64()),
        "discord_day": pa.array(rows["dd"], pa.int64()),
        "discord_d2": pa.array(round6_tie_robust(
            np.array(rows["d2"], np.float64))),
        "motif_d2": pa.array(round6_tie_robust(
            np.array(rows["mo"], np.float64))),
        "mean_mp": pa.array(round6_tie_robust(
            np.array(rows["mm"], np.float64))),
    }))


LABEL_PROP_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
e AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON b.o = a.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
n AS (SELECT u AS node FROM e UNION SELECT v AS node FROM e),
inc AS (SELECT u AS w, v AS nbr FROM e
        UNION ALL SELECT v AS w, u AS nbr FROM e),
l0 AS (SELECT node, node AS lab FROM n),
c1 AS (SELECT i.w AS w, l.lab AS lab, COUNT(*) AS c
       FROM inc i JOIN l0 l ON l.node = i.nbr GROUP BY 1, 2),
l1 AS (SELECT w AS node, lab FROM c1
       QUALIFY ROW_NUMBER() OVER (PARTITION BY w
                                  ORDER BY c DESC, lab) = 1),
c2 AS (SELECT i.w AS w, l.lab AS lab, COUNT(*) AS c
       FROM inc i JOIN l1 l ON l.node = i.nbr GROUP BY 1, 2),
l2 AS (SELECT w AS node, lab FROM c2
       QUALIFY ROW_NUMBER() OVER (PARTITION BY w
                                  ORDER BY c DESC, lab) = 1)
SELECT lab AS label, CAST(COUNT(*) AS BIGINT) AS size
FROM l2 GROUP BY 1
"""


def q_label_propagation(sf_dir: str):
    """Two synchronous rounds of label propagation over the SUPPORTED
    part co-purchase graph (edges = part pairs sharing >= 2 orders,
    the adamic_adar convention) — the linear-time community detector
    next to cc_events' exact components: labels start as node ids and
    each round every node adopts its neighbors' plurality label
    (count DESC, then smallest label — a fully deterministic integer
    argmax).  Engine path: the supported edge list comes off the
    existing pair-count exchange; per round, the node->label map
    broadcasts (node-count scale, the pagerank discipline), neighbor-
    label counts collapse map-side per block, and the driver resolves
    the plurality argmax with one lexsort.  Output: community label ->
    size.  ORACLE-CHECKED against the QUALIFY/ROW_NUMBER SQL."""
    import ray

    pairs = _copurchase_pair_counts(sf_dir)
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"k": t.filter(pc.greater_equal(t["nuv"], 2))["k"]},
            schema=_EK_SCHEMA),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    nodes, _deg = _copurchase_degrees(edges)
    if len(nodes) == 0:
        return pa.table({"label": pa.array([], pa.int64()),
                         "size": pa.array([], pa.int64())})

    inc_schema = pa.schema([("w", pa.int64()), ("nbr", pa.int64())])

    def _inc(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        u = k >> np.int64(32)
        v = k & np.int64(0xFFFFFFFF)
        return pa.table({"w": np.concatenate([u, v]),
                         "nbr": np.concatenate([v, u])},
                        schema=inc_schema)

    inc = edges.map_batches(_inc, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    cnt_schema = pa.schema([("w", pa.int64()), ("lab", pa.int64()),
                            ("c", pa.int64())])
    labels = nodes.copy()
    for _round in range(2):
        lref = ray.put((nodes, labels))

        def _count(batch: pa.Table, _lref=lref) -> pa.Table:
            nd, lb = ray.get(_lref)
            w = batch["w"].to_numpy(zero_copy_only=False)
            nbr = batch["nbr"].to_numpy(zero_copy_only=False)
            lab = lb[np.searchsorted(nd, nbr)]
            t = pa.table({"w": w, "lab": lab})
            g = t.group_by(["w", "lab"]).aggregate([([], "count_all")])
            return g.rename_columns(["w", "lab", "c"]).cast(cnt_schema)

        parts = _collect_raw(inc.map_batches(
            _count, batch_format="pyarrow", zero_copy_batch=True))
        w = parts["w"].to_numpy(zero_copy_only=False)
        lab = parts["lab"].to_numpy(zero_copy_only=False)
        c = parts["c"].to_numpy(zero_copy_only=False)
        # merge block partials, then plurality argmax per node
        order = np.lexsort((lab, w))
        w, lab, c = w[order], lab[order], c[order]
        kf = np.empty(len(w), dtype=bool)
        kf[0] = True
        kf[1:] = (w[1:] != w[:-1]) | (lab[1:] != lab[:-1])
        ks = np.nonzero(kf)[0]
        w, lab = w[ks], lab[ks]
        c = np.add.reduceat(c, ks)
        pick = np.lexsort((lab, -c, w))
        first = np.empty(len(w), dtype=bool)
        wp = w[pick]
        first[0] = True
        first[1:] = wp[1:] != wp[:-1]
        sel = pick[first]
        new_labels = labels.copy()
        new_labels[np.searchsorted(nodes, w[sel])] = lab[sel]
        labels = new_labels
    uniq, size = np.unique(labels, return_counts=True)
    return _collect(pa.table({
        "label": pa.array(uniq, pa.int64()),
        "size": pa.array(size.astype(np.int64), pa.int64()),
    }))


NGRAM_NOVELTY_SQL = """
WITH t AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS arr
  FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL
    AND text IS NOT NULL),
g AS (
  SELECT DISTINCT doc_id, source,
         arr[i.i + 1] || ' ' || arr[i.i + 2] || ' ' || arr[i.i + 3]
           AS gram
  FROM t, UNNEST(range(len(arr) - 2)) AS i(i)),
f AS (SELECT gram, MIN(doc_id) AS fd FROM g GROUP BY 1)
SELECT g.source AS source, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN f.fd = g.doc_id THEN 1.0 ELSE 0 END)
             / COUNT(*), 6) AS novelty_rate
FROM g JOIN f USING (gram)
GROUP BY 1
"""


def q_ngram_novelty(sf_dir: str):
    """Per-source trigram novelty rate — the corpus-growth /
    contamination profile behind dedup policy: of each document's
    DISTINCT word trigrams, the fraction not seen in any earlier
    document (first-seen = MIN doc_id over the whole corpus; a
    source whose rate collapses is re-crawling known text).  Engine
    path: per block, Arrow-native tokenize (the shared utf8_lower +
    split_pattern_regex discipline) -> consecutive-triple join ->
    per-doc DISTINCT grams; ONE gram-keyed exchange
    (sorted_group_map) where each gram-run credits its min-doc row's
    source with the novelty and every row's source with the total —
    the output partials are |sources|-scale, so nothing wider than
    the gram exchange ever moves.  At web scale the gram key would be
    a 128-bit hash instead of the string (documented switch; string
    keys keep the oracle exact here).  ORACLE-CHECKED."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..stages.wordcount import TOKEN_SPLIT_RE

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    gram_schema = pa.schema([("gram", pa.string()),
                             ("doc_id", pa.int64()),
                             ("source", pa.string())])

    def _grams(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["doc_id"]),
                            pc.is_valid(batch["source"])),
                    pc.is_valid(batch["text"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return gram_schema.empty_table()
        toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]),
                                      TOKEN_SPLIT_RE)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64),
                            lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        ft = flat.filter(pa.array(keep))
        fd = doc_rep[keep]
        if len(fd) < 3:
            return gram_schema.empty_table()
        tri = (fd[:-2] == fd[1:-1]) & (fd[1:-1] == fd[2:])
        idx = np.nonzero(tri)[0]
        if len(idx) == 0:
            return gram_schema.empty_table()
        ia = pa.array(idx, pa.int64())
        gram = pc.binary_join_element_wise(
            ft.take(ia), ft.take(pa.array(idx + 1, pa.int64())),
            ft.take(pa.array(idx + 2, pa.int64())), " ")
        rows = pa.table({
            "gram": gram,
            "doc_id": batch["doc_id"].take(pa.array(fd[idx],
                                                    pa.int64())),
            "source": batch["source"].take(pa.array(fd[idx],
                                                    pa.int64()))})
        return rows.group_by(["gram", "doc_id", "source"]).aggregate(
            []).cast(gram_schema)

    grams = ds.map_batches(_grams, batch_format="pyarrow",
                           zero_copy_batch=True)
    out_schema = pa.schema([("source", pa.string()),
                            ("n_grams", pa.int64()),
                            ("n_novel", pa.int64())])

    def _credit(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["gram"])
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        run_id = np.repeat(np.arange(len(starts)),
                           (ends - starts))
        # argmin doc per gram-run: first row of each run after a
        # (run, doc) sort
        order = np.lexsort((doc, run_id))
        rf = np.empty(len(order), dtype=bool)
        rid = run_id[order]
        rf[0] = True
        rf[1:] = rid[1:] != rid[:-1]
        novel_rows = order[rf]
        src = batch["source"]
        tot = pa.table({"source": src}).group_by(
            ["source"]).aggregate([([], "count_all")])
        nov = pa.table({"source": src.take(pa.array(
            novel_rows, pa.int64()))}).group_by(
            ["source"]).aggregate([([], "count_all")])
        tp = dict(zip(tot["source"].to_pylist(),
                      tot["count_all"].to_pylist()))
        np_ = dict(zip(nov["source"].to_pylist(),
                       nov["count_all"].to_pylist()))
        srcs = sorted(tp)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "n_grams": pa.array([tp[s] for s in srcs], pa.int64()),
            "n_novel": pa.array([np_.get(s, 0) for s in srcs],
                                pa.int64())}, schema=out_schema)

    parts = _collect_raw(sorted_group_map(
        grams, ["gram"], None, out_schema,
        block_fn=_credit)).to_pandas()
    agg = parts.groupby("source", as_index=False).agg(
        n_grams=("n_grams", "sum"),
        n_novel=("n_novel", "sum")).sort_values("source")
    from ..kernels.rounding import round6_tie_robust
    return _collect(pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "n_grams": pa.array(agg["n_grams"].to_numpy(np.int64)),
        "n_novel": pa.array(agg["n_novel"].to_numpy(np.int64)),
        "novelty_rate": pa.array(round6_tie_robust(
            agg["n_novel"].to_numpy(np.float64)
            / agg["n_grams"].to_numpy(np.float64))),
    }))


LARGE_ORDERS_SQL = """
WITH q AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem WHERE l_orderkey IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
SELECT o.o_orderkey AS o_orderkey, o.o_custkey AS o_custkey,
       epoch_us(o.o_orderdate) AS orderdate_us,
       ROUND(o.o_totalprice, 6) AS o_totalprice, q.total_qty
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
"""


def q_large_orders(sf_dir: str):
    """TPC-H Q18-shaped large-volume orders: orders whose total line
    quantity exceeds 300 units, with customer / date / price
    attached.  Quantities are integral doubles, so the per-order sum
    is an exact int64 and the >300 gate is an integer compare.
    Engine path: lineitem collapses map-side to (orderkey, qty-sum)
    partials, ONE orderkey exchange merges them, the filtered
    survivor set (rare by construction) broadcasts into the orders
    scan under collect_small's gate — orders never shuffles.
    ORACLE-CHECKED."""
    import ray
    import ray.data as rd
    from ..kernels.rounding import round6_tie_robust

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    part_schema = pa.schema([("k", pa.int64()), ("q", pa.int64())])

    def _parts(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["l_orderkey"]),
                    pc.is_valid(batch["l_quantity"]))
        batch = batch.filter(m)
        t = pa.table({"k": batch["l_orderkey"],
                      "q": pc.cast(batch["l_quantity"], pa.int64())})
        g = t.group_by(["k"]).aggregate([("q", "sum")])
        return g.rename_columns(["k", "q"]).cast(part_schema)

    parts = _collect_raw(li.map_batches(
        _parts, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    tot = parts.groupby("k", as_index=False)["q"].sum()
    big = tot[tot["q"] > 300]
    keys = np.sort(big["k"].to_numpy(np.int64))
    qty = big.set_index("k")["q"]
    qmap = qty.loc[keys].to_numpy(np.int64)
    bref = ray.put((keys, qmap))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"])

    def _attach(batch: pa.Table) -> pa.Table:
        ks, qs = ray.get(bref)
        empty = pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "orderdate_us": pa.array([], pa.int64()),
            "o_totalprice": pa.array([], pa.float64()),
            "total_qty": pa.array([], pa.int64())})
        if len(ks) == 0:
            return empty
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        pos_c = np.minimum(np.searchsorted(ks, ok), len(ks) - 1)
        hit = ks[pos_c] == ok
        batch = batch.filter(pa.array(hit))
        if len(batch) == 0:
            return empty
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "orderdate_us": batch["o_orderdate"].cast(pa.int64()),
            "o_totalprice": batch["o_totalprice"],
            "total_qty": pa.array(qs[np.searchsorted(ks, ok)],
                                  pa.int64())})

    return _collect(orders.map_batches(_attach, batch_format="pyarrow",
                                       zero_copy_batch=True))


SMALL_QTY_REVENUE_SQL = """
WITH s AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY 1),
f AS (
  SELECT p.p_brand AS p_brand, l.l_extendedprice AS price
  FROM lineitem l
  JOIN s ON s.l_partkey = l.l_partkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_quantity IS NOT NULL AND l.l_extendedprice IS NOT NULL
    AND p.p_brand IS NOT NULL
    AND 5 * CAST(l.l_quantity AS BIGINT) * s.cnt < s.sq)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(price) / 7.0, 6) AS avg_yearly
FROM f GROUP BY 1
"""


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17-shaped small-quantity revenue: per brand, the
    average yearly revenue (7 calendar years of data) from line items
    whose quantity is below 20% of that part's average quantity.  The
    20% gate is the EXACT integer cross-multiplication
    5*qty*cnt < sum_qty (quantities are integral doubles), so no
    float division enters the filter; revenue sums round at the
    output.  Engine path: pass 1 collapses lineitem map-side to
    (partkey, cnt, qty-sum) partials (part-count scale); the per-part
    stats and the part->brand map broadcast (ray.put) into pass 2's
    filter-and-sum over lineitem — no lineitem shuffle at all, two
    streaming scans.  ORACLE-CHECKED."""
    import ray
    import ray.data as rd
    from ..kernels.rounding import round6_tie_robust

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
    part_schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                             ("sq", pa.int64())])

    def _stats(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["l_partkey"]),
                    pc.is_valid(batch["l_quantity"]))
        batch = batch.filter(m)
        t = pa.table({"k": batch["l_partkey"],
                      "q": pc.cast(batch["l_quantity"], pa.int64())})
        g = t.group_by(["k"]).aggregate([([], "count_all"),
                                         ("q", "sum")])
        return g.rename_columns(["k", "n", "sq"]).cast(part_schema)

    parts = _collect_raw(li.map_batches(
        _stats, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    st = parts.groupby("k", as_index=False).agg(
        n=("n", "sum"), sq=("sq", "sum"))
    pk = np.sort(st["k"].to_numpy(np.int64))
    byk = st.set_index("k")
    cnt = byk["n"].loc[pk].to_numpy(np.int64)
    sq = byk["sq"].loc[pk].to_numpy(np.int64)

    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pb = _collect_raw(pt).to_pandas().dropna()
    bk = np.sort(pb["p_partkey"].to_numpy(np.int64))
    brands = pb.set_index("p_partkey")["p_brand"].loc[bk].to_numpy(
        object)
    bref = ray.put((pk, cnt, sq, bk, brands))

    out_schema = pa.schema([("p_brand", pa.string()),
                            ("n_items", pa.int64()),
                            ("rev", pa.float64())])

    def _filter(batch: pa.Table) -> pa.Table:
        kp, kc, ks, kb, kbr = ray.get(bref)
        m = pc.and_(pc.and_(pc.is_valid(batch["l_partkey"]),
                            pc.is_valid(batch["l_quantity"])),
                    pc.is_valid(batch["l_extendedprice"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return out_schema.empty_table()
        key = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(kp, key)
        small = 5 * q * kc[pos] < ks[pos]
        bpos = np.searchsorted(kb, key)
        has_brand = (np.take(kb, np.minimum(bpos, len(kb) - 1),
                             mode="clip") == key) if len(kb) \
            else np.zeros(len(key), bool)
        keep = small & has_brand
        if not keep.any():
            return out_schema.empty_table()
        t = pa.table({
            "p_brand": pa.array(kbr[np.searchsorted(kb, key[keep])],
                                pa.string()),
            "price": batch["l_extendedprice"].filter(
                pa.array(keep))})
        g = t.group_by(["p_brand"]).aggregate(
            [([], "count_all"), ("price", "sum")])
        return g.rename_columns(["p_brand", "n_items",
                                 "rev"]).cast(out_schema)

    rows = _collect_raw(li.map_batches(
        _filter, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = rows.groupby("p_brand", as_index=False).agg(
        n_items=("n_items", "sum"),
        rev=("rev", "sum")).sort_values("p_brand")
    return _collect(pa.table({
        "p_brand": pa.array(agg["p_brand"].tolist(), pa.string()),
        "n_items": pa.array(agg["n_items"].to_numpy(np.int64)),
        "avg_yearly": pa.array(round6_tie_robust(
            agg["rev"].to_numpy(np.float64) / 7.0)),
    }))


_IDLE_CUTOFF_US = 962409600000000  # 2000-07-01 in epoch microseconds

IDLE_BALANCE_SQL = """
WITH pos AS (
  SELECT c_custkey, c_nationkey,
         CAST(FLOOR(ROUND(c_acctbal, 6) * 1000000 + 0.5) AS HUGEINT)
           AS avi,
         c_acctbal
  FROM customer
  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
    AND c_acctbal IS NOT NULL AND c_acctbal > 0.0),
t AS (SELECT SUM(avi) AS s, CAST(COUNT(*) AS HUGEINT) AS n FROM pos),
recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-07-01'),
idle AS (
  SELECT pos.c_nationkey AS c_nationkey, pos.c_acctbal AS bal
  FROM pos, t
  WHERE pos.avi * t.n > t.s
    AND pos.c_custkey NOT IN (SELECT o_custkey FROM recent))
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
       ROUND(SUM(bal), 6) AS total_acctbal
FROM idle GROUP BY 1
"""


def q_idle_balance(sf_dir: str):
    """TPC-H Q22-shaped idle-balance audit: customers with an
    above-average positive account balance and NO order since
    2000-07-01, grouped by nation.  The above-average gate is the
    exact integer cross-multiplication avi*N > S on two-step
    pre-rounded micro-unit balances (no float division decides
    membership); balance sums round at the output.  Engine path: the
    global (S, N) pair folds map-side; the recent-buyer key set
    (distinct custkeys of a date-pruned orders scan) broadcasts as a
    sorted int64 array into the customer scan — an anti-join with no
    shuffle (beyond the collect gate the documented switch is the
    partitioned anti-join in stages/joins).  ORACLE-CHECKED."""
    import ray
    import ray.data as rd
    from ..kernels.rounding import round6_tie_robust

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def _clean(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch["c_custkey"]),
                            pc.is_valid(batch["c_nationkey"])),
                    pc.and_(pc.is_valid(batch["c_acctbal"]),
                            pc.greater(batch["c_acctbal"], 0.0)))
        return batch.filter(m)

    pos = cust.map_batches(_clean, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    # global mean gate: micro-int fold, map-side partials
    sn_schema = pa.schema([("s", pa.float64()), ("n", pa.int64())])

    def _sn(batch: pa.Table) -> pa.Table:
        avi = np.floor(round6_tie_robust(
            batch["c_acctbal"].to_numpy(zero_copy_only=False))
            * 1e6 + 0.5)
        return pa.table({"s": pa.array([float(avi.sum())],
                                       pa.float64()),
                         "n": pa.array([len(avi)], pa.int64())},
                        schema=sn_schema)

    snp = _collect_raw(pos.map_batches(
        _sn, batch_format="pyarrow", zero_copy_batch=True))
    s_total = int(sum(int(v) for v in snp["s"].to_pylist()))
    n_total = int(sum(snp["n"].to_pylist()))
    if n_total == 0:
        return pa.table({"c_nationkey": pa.array([], pa.int32()),
                         "n_custs": pa.array([], pa.int64()),
                         "total_acctbal": pa.array([], pa.float64())})

    ords = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"])

    def _recent(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["o_custkey"]),
                    pc.greater_equal(batch["o_orderdate"].cast(
                        pa.int64()), _IDLE_CUTOFF_US))
        t = pa.table({"k": batch.filter(m)["o_custkey"]})
        return t.group_by(["k"]).aggregate([])

    recent = np.unique(_collect_raw(ords.map_batches(
        _recent, batch_format="pyarrow",
        zero_copy_batch=True))["k"].to_numpy(zero_copy_only=False))
    rref = ray.put((recent, s_total, n_total))

    out_schema = pa.schema([("c_nationkey", pa.int32()),
                            ("n", pa.int64()), ("bal", pa.float64())])

    def _pick(batch: pa.Table) -> pa.Table:
        rec, s, n = ray.get(rref)
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        avi = np.floor(round6_tie_robust(bal) * 1e6 + 0.5)
        above = np.array([int(a) * n > s for a in avi], bool)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        pos_i = np.searchsorted(rec, ck)
        has = (np.take(rec, np.minimum(pos_i, len(rec) - 1),
                       mode="clip") == ck) if len(rec) \
            else np.zeros(len(ck), bool)
        keep = above & ~has
        t = pa.table({"c_nationkey": batch["c_nationkey"].filter(
                          pa.array(keep)),
                      "bal": pa.array(bal[keep], pa.float64())})
        g = t.group_by(["c_nationkey"]).aggregate(
            [([], "count_all"), ("bal", "sum")])
        return g.rename_columns(["c_nationkey", "n",
                                 "bal"]).cast(out_schema)

    rows = _collect_raw(pos.map_batches(
        _pick, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    agg = rows.groupby("c_nationkey", as_index=False).agg(
        n=("n", "sum"), bal=("bal", "sum")).sort_values("c_nationkey")
    return _collect(pa.table({
        "c_nationkey": pa.array(agg["c_nationkey"].to_numpy(np.int32),
                                pa.int32()),
        "n_custs": pa.array(agg["n"].to_numpy(np.int64)),
        "total_acctbal": pa.array(round6_tie_robust(
            agg["bal"].to_numpy(np.float64))),
    }))


DFA_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
med AS (SELECT event_type, CAST(2 * MEDIAN(mi) AS BIGINT) AS med2
        FROM d GROUP BY 1),
p AS (
  SELECT d.event_type AS event_type,
         ROW_NUMBER() OVER win AS rn,
         SUM(2 * mi - med2) OVER (PARTITION BY d.event_type
                                  ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS pk
  FROM d JOIN med USING (event_type)
  WINDOW win AS (PARTITION BY d.event_type ORDER BY day)),
sc AS (SELECT UNNEST([4, 8, 16]) AS s),
b AS (
  SELECT event_type, s, (rn - 1) // s AS box, (rn - 1) % s AS x,
         CAST(pk AS BIGINT) AS pk
  FROM p, sc),
bx AS (SELECT event_type, s, box, MIN(pk) AS mn,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM b GROUP BY 1, 2, 3),
st AS (
  SELECT b.event_type AS event_type, b.s AS s, b.box AS box,
         SUM(b.pk - bx.mn) AS sy,
         SUM((b.pk - bx.mn) * (b.pk - bx.mn)) AS syy,
         SUM(b.x * (b.pk - bx.mn)) AS sxy
  FROM b JOIN bx USING (event_type, s, box)
  WHERE bx.c = b.s
  GROUP BY 1, 2, 3),
cn AS (SELECT s, s * (s - 1) // 2 AS sx,
              (s - 1) * s * (2 * s - 1) // 6 AS sxx
       FROM sc),
nn AS (
  SELECT st.event_type AS event_type, st.s AS s, st.box AS box,
         CAST((cn.s * cn.sxx - cn.sx * cn.sx)
                * (st.s * st.syy - st.sy * st.sy)
              - (st.s * st.sxy - cn.sx * st.sy)
                * (st.s * st.sxy - cn.sx * st.sy) AS BIGINT) AS n_num,
         CAST(st.s * (cn.s * cn.sxx - cn.sx * cn.sx) AS BIGINT)
           AS sdd
  FROM st JOIN cn ON cn.s = st.s),
f AS (
  SELECT event_type, s, CAST(COUNT(*) AS BIGINT) AS nb,
         SUM(CAST(n_num AS DOUBLE) / sdd ORDER BY box) AS total
  FROM nn GROUP BY 1, 2)
SELECT event_type, CAST(s AS BIGINT) AS scale, nb AS n_boxes,
       ROUND(SQRT(total / (nb * s * 4000000.0)), 6) AS fluct
FROM f WHERE nb >= 2
"""


def q_dfa_fluctuation(sf_dir: str):
    """Detrended fluctuation analysis F(s) at scales 4/8/16 observed
    days per series — the fractal-scaling profile next to hurst_rs
    (DFA detrends each box, so slow trends can't masquerade as
    long-range memory; the log-log slope of F(s) is the DFA
    exponent).  EXACT per-box algebra: the profile is the running sum
    of 2*mi − med2 (the doubled-median trick, exact ints), each box
    shifts by its min (least-squares residuals are shift-invariant —
    this caps magnitudes at int64-safe bounds), and the detrended
    SS_res = [D*(s*Syy − Sy²) − (s*Sxy − Sx*Sy)²] / (s*D) has an
    exact-int numerator over the constant denominator s*D; the
    box-ordered float fold and single sqrt mirror the oracle
    operand-for-operand.  Day-count-scale per-series work.
    ORACLE-CHECKED."""
    import math

    from ..kernels.rounding import round6_tie_robust

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "s": [], "nb": [], "f": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        n = len(mi)
        if n < 8:
            continue
        x = np.sort(mi)
        med2 = int(x[(n - 1) // 2]) + int(x[n // 2])
        prof = np.cumsum(2 * mi.astype(np.int64) - med2)
        for s in (4, 8, 16):
            nb = n // s
            if nb < 2:
                continue
            sx = s * (s - 1) // 2
            sxx = (s - 1) * s * (2 * s - 1) // 6
            dd = s * sxx - sx * sx
            xs = np.arange(s, dtype=np.int64)
            total = 0.0
            for b in range(nb):
                y = prof[b * s:(b + 1) * s]
                y = (y - y.min()).astype(object)
                sy = int(y.sum())
                syy = int((y * y).sum())
                sxy = int((xs.astype(object) * y).sum())
                n_num = (dd * (s * syy - sy * sy)
                         - (s * sxy - sx * sy) ** 2)
                total += float(n_num) / (s * dd)
            rows["et"].append(et)
            rows["s"].append(s)
            rows["nb"].append(nb)
            rows["f"].append(math.sqrt(total / (nb * s * 4000000.0)))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "scale": pa.array(rows["s"], pa.int64()),
        "n_boxes": pa.array(rows["nb"], pa.int64()),
        "fluct": pa.array(round6_tie_robust(
            np.array(rows["f"], np.float64))),
    }))


LIS_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(FLOOR(ROUND(SUM(value) / COUNT(*), 6) * 1000 + 0.5)
              AS BIGINT) AS mi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
v AS (
  SELECT event_type, mi,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY day) AS idx
  FROM d),
chain(event_type, idx, mi, k) AS (
  SELECT event_type, idx, mi, 1 FROM v
  UNION
  SELECT v.event_type, v.idx, v.mi, c.k + 1
  FROM chain c
  JOIN v ON v.event_type = c.event_type AND v.idx > c.idx
        AND v.mi > c.mi),
n0 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
       FROM v GROUP BY 1)
SELECT chain.event_type AS event_type, n0.n_days,
       CAST(MAX(chain.k) AS BIGINT) AS lis_len
FROM chain JOIN n0 USING (event_type)
GROUP BY 1, 2
"""


def q_lis_daily(sf_dir: str):
    """Longest strictly-increasing SUBSEQUENCE of each daily-mean
    series — the order-structure depth next to streak_stats'
    contiguous runs (a trending series has LIS near n, a mean-
    reverting one near 2*sqrt(n)).  EXACT: milli-unit integers
    compare exactly, so the classic O(n log n) patience-sorting tails
    array gives the same length as the oracle's recursive set
    fixpoint S_k = "indices that end an increasing chain of length k"
    (DuckDB recursive CTE with UNION dedup).  Day-count-scale
    per-series work.  ORACLE-CHECKED."""
    import bisect

    series = _daily_milli_series(sf_dir)
    rows = {"et": [], "n": [], "l": []}
    for et in sorted(series):
        _, mi, _ = series[et]
        tails = []
        for vv in mi.tolist():
            i = bisect.bisect_left(tails, vv)
            if i == len(tails):
                tails.append(vv)
            else:
                tails[i] = vv
        rows["et"].append(et)
        rows["n"].append(len(mi))
        rows["l"].append(len(tails))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_days": pa.array(rows["n"], pa.int64()),
        "lis_len": pa.array(rows["l"], pa.int64()),
    }))


SOURCE_GRAM_OVERLAP_SQL = """
WITH t AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS arr
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
g AS (
  SELECT DISTINCT source,
         arr[i.i + 1] || ' ' || arr[i.i + 2] || ' ' || arr[i.i + 3]
           AS gram
  FROM t, UNNEST(range(len(arr) - 2)) AS i(i)),
tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM g GROUP BY 1),
p AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(COUNT(*) AS BIGINT) AS ns
  FROM g a JOIN g b ON b.gram = a.gram AND a.source < b.source
  GROUP BY 1, 2)
SELECT p.sa AS source_a, p.sb AS source_b, ta.n AS n_a, tb.n AS n_b,
       p.ns AS n_shared,
       ROUND(CAST(p.ns AS DOUBLE) / (ta.n + tb.n - p.ns), 6)
         AS jaccard
FROM p JOIN tot ta ON ta.source = p.sa
JOIN tot tb ON tb.source = p.sb
"""


def q_source_gram_overlap(sf_dir: str):
    """Pairwise trigram-set Jaccard between sources — the provenance
    overlap matrix behind mixing decisions (two sources with high
    overlap are near-mirrors; their combined weight double-counts):
    for each source pair, |shared distinct trigrams| over the union.
    EXACT: set intersections/unions are integer counts, Jaccard is
    ONE float division.  Engine path: per block Arrow-native trigrams
    -> distinct (gram, source); ONE gram-keyed exchange
    (sorted_group_map) where each gram-run distincts its sources and
    emits run-pair partials via the shared length-class trick —
    |sources|^2-scale partials out, the gram never re-shuffles.
    At web scale the gram key would hash (same switch as
    ngram_novelty).  ORACLE-CHECKED."""
    import ray.data as rd

    from ..stages.sorted_groups import _runs, sorted_group_map
    from ..stages.wordcount import TOKEN_SPLIT_RE

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    gs_schema = pa.schema([("gram", pa.string()),
                           ("source", pa.string())])

    def _grams(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["source"]),
                    pc.is_valid(batch["text"]))
        batch = batch.filter(m)
        if len(batch) == 0:
            return gs_schema.empty_table()
        toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]),
                                      TOKEN_SPLIT_RE)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64),
                            lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        ft = flat.filter(pa.array(keep))
        fd = doc_rep[keep]
        if len(fd) < 3:
            return gs_schema.empty_table()
        tri = (fd[:-2] == fd[1:-1]) & (fd[1:-1] == fd[2:])
        idx = np.nonzero(tri)[0]
        if len(idx) == 0:
            return gs_schema.empty_table()
        gram = pc.binary_join_element_wise(
            ft.take(pa.array(idx, pa.int64())),
            ft.take(pa.array(idx + 1, pa.int64())),
            ft.take(pa.array(idx + 2, pa.int64())), " ")
        rows = pa.table({"gram": gram,
                         "source": batch["source"].take(
                             pa.array(fd[idx], pa.int64()))})
        return rows.group_by(["gram", "source"]).aggregate(
            []).cast(gs_schema)

    grams = ds.map_batches(_grams, batch_format="pyarrow",
                           zero_copy_batch=True)
    # partial rows: sb == "" marks a per-source distinct-gram total
    out_schema = pa.schema([("sa", pa.string()), ("sb", pa.string()),
                            ("n", pa.int64())])

    def _pairs(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["gram"])
        run_id = np.repeat(np.arange(len(starts)), (ends - starts))
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        import pandas as pd
        dd = pd.DataFrame({"r": run_id, "s": src}).drop_duplicates()
        dd = dd.sort_values(["r", "s"])
        r = dd["r"].to_numpy(np.int64)
        s = dd["s"].to_numpy(object)
        # per-source totals off the per-run distinct rows
        tsrc, tcnt = np.unique(s.astype(str), return_counts=True)
        parts = [pa.table({"sa": pa.array(tsrc, pa.string()),
                           "sb": pa.array([""] * len(tsrc),
                                          pa.string()),
                           "n": pa.array(tcnt.astype(np.int64))},
                          schema=out_schema)]
        rf = np.empty(len(r), dtype=bool)
        if len(r):
            rf[0] = True
            rf[1:] = r[1:] != r[:-1]
            rs = np.nonzero(rf)[0]
            rl = np.diff(np.append(rs, len(r)))
            pa_list, pb_list = [], []
            for length in np.unique(rl):
                if length < 2:
                    continue
                sel = rs[rl == length]
                idx = sel[:, None] + np.arange(length)
                m = s[idx]
                iu, ju = np.triu_indices(int(length), 1)
                pa_list.append(m[:, iu].ravel())
                pb_list.append(m[:, ju].ravel())
            if pa_list:
                ua = np.concatenate(pa_list).astype(str)
                ub = np.concatenate(pb_list).astype(str)
                key = pd.DataFrame({"sa": ua, "sb": ub})
                cnt = key.value_counts().reset_index(name="n")
                parts.append(pa.table({
                    "sa": pa.array(cnt["sa"].tolist(), pa.string()),
                    "sb": pa.array(cnt["sb"].tolist(), pa.string()),
                    "n": pa.array(cnt["n"].to_numpy(np.int64))},
                    schema=out_schema))
        return pa.concat_tables(parts)

    parts = _collect_raw(sorted_group_map(
        grams, ["gram"], None, out_schema,
        block_fn=_pairs)).to_pandas()
    tot = parts[parts["sb"] == ""].groupby("sa")["n"].sum().to_dict()
    pr = parts[parts["sb"] != ""].groupby(
        ["sa", "sb"], as_index=False)["n"].sum().sort_values(
        ["sa", "sb"])
    from ..kernels.rounding import round6_tie_robust
    na = np.array([tot[s] for s in pr["sa"]], np.int64)
    nb = np.array([tot[s] for s in pr["sb"]], np.int64)
    ns = pr["n"].to_numpy(np.int64)
    return _collect(pa.table({
        "source_a": pa.array(pr["sa"].tolist(), pa.string()),
        "source_b": pa.array(pr["sb"].tolist(), pa.string()),
        "n_a": pa.array(na), "n_b": pa.array(nb),
        "n_shared": pa.array(ns),
        "jaccard": pa.array(round6_tie_robust(
            ns.astype(np.float64) / (na + nb - ns))),
    }))


WASSERSTEIN_SQL = """
WITH v AS (
  SELECT event_type,
         CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (6, 0)
              THEN 1 ELSE 0 END AS wk,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL),
h AS (SELECT event_type, wk, vi, CAST(COUNT(*) AS BIGINT) AS c
      FROM v GROUP BY 1, 2, 3),
sup AS (SELECT DISTINCT event_type, vi FROM h),
m AS (
  SELECT sup.event_type AS event_type, sup.vi AS vi,
         COALESCE(a.c, 0) AS ca, COALESCE(b.c, 0) AS cb
  FROM sup
  LEFT JOIN h a ON a.event_type = sup.event_type AND a.vi = sup.vi
               AND a.wk = 1
  LEFT JOIN h b ON b.event_type = sup.event_type AND b.vi = sup.vi
               AND b.wk = 0),
c AS (
  SELECT event_type, vi,
         SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb,
         LEAD(vi) OVER w AS nxt
  FROM m WINDOW w AS (PARTITION BY event_type ORDER BY vi)),
n AS (SELECT event_type,
             CAST(SUM(CASE WHEN wk = 1 THEN c ELSE 0 END) AS HUGEINT)
               AS na,
             CAST(SUM(CASE WHEN wk = 0 THEN c ELSE 0 END) AS HUGEINT)
               AS nb
      FROM h GROUP BY 1),
w1 AS (
  SELECT c.event_type AS event_type,
         SUM(ABS(cuma * nb - cumb * na) * (nxt - vi)) AS num
  FROM c JOIN n USING (event_type)
  WHERE nxt IS NOT NULL GROUP BY 1)
SELECT w1.event_type AS event_type, CAST(na AS BIGINT) AS n_weekend,
       CAST(nb AS BIGINT) AS n_weekday,
       ROUND(CAST(num AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 1000.0), 6)
         AS w1
FROM w1 JOIN n USING (event_type) WHERE na > 0 AND nb > 0
"""


def q_wasserstein_weekend(sf_dir: str):
    """1-D Wasserstein (earth mover's) distance between each series'
    weekend and weekday value distributions — the distribution-shift
    magnitude in VALUE UNITS (where ks_drift gives a unitless sup-gap,
    W1 says "weekend values sit X units away on average").  EXACT:
    over the discrete milli-unit support, W1 = Sigma |cumA*nb −
    cumB*na| * gap / (na*nb) — the numerator accumulates in exact
    ints off the bounded value histogram (the CDF-difference identity
    with the na*nb common denominator clearing both normalizations),
    and ONE float division lands the result.  Cell-count scale: the
    (type, weekend, milli-value) histogram collapses map-side.
    ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "ts", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("wk", pa.int64()), ("vi", pa.int64()),
                             ("n", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        t_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        dow = (t_us // _DAY_US + 4) % 7
        wk = ((dow == 0) | (dow == 6)).astype(np.int64)
        vi = np.floor(round6_tie_robust(v) * 1000.0
                      + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "wk": pa.array(wk, pa.int64()),
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "wk", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "wk", "vi",
                                 "n"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = parts.groupby(["event_type", "wk", "vi"],
                          as_index=False)["n"].sum()
    rows = {"et": [], "na": [], "nb": [], "w1": []}
    for et, sub in cells.groupby("event_type"):
        piv = sub.pivot_table(index="vi", columns="wk", values="n",
                              fill_value=0, aggfunc="sum")
        vi = piv.index.to_numpy(np.int64)
        ca = (piv[1].to_numpy(np.int64) if 1 in piv.columns
              else np.zeros(len(vi), np.int64))
        cb = (piv[0].to_numpy(np.int64) if 0 in piv.columns
              else np.zeros(len(vi), np.int64))
        na, nb = int(ca.sum()), int(cb.sum())
        if na == 0 or nb == 0:
            continue
        cuma = np.cumsum(ca.astype(object))
        cumb = np.cumsum(cb.astype(object))
        gaps = (vi[1:] - vi[:-1]).astype(object)
        num = int((abs(cuma[:-1] * nb - cumb[:-1] * na)
                   * gaps).sum()) if len(vi) > 1 else 0
        rows["et"].append(et)
        rows["na"].append(na)
        rows["nb"].append(nb)
        rows["w1"].append(float(num) / (float(na) * float(nb)
                                        * 1000.0))
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_weekend": pa.array(rows["na"], pa.int64()),
        "n_weekday": pa.array(rows["nb"], pa.int64()),
        "w1": pa.array(round6_tie_robust(
            np.array(rows["w1"], np.float64))),
    }))


EDGE_SUPPORT_SQL = f"""
WITH {_COPURCHASE_EDGES_CTE},
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
s AS (SELECT a AS u, b AS v FROM tri
      UNION ALL SELECT b, c FROM tri
      UNION ALL SELECT a, c FROM tri),
cnt AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS sup
        FROM s GROUP BY 1, 2),
f AS (SELECT e.u AS u, e.v AS v, COALESCE(cnt.sup, 0) AS sup
      FROM e LEFT JOIN cnt USING (u, v))
SELECT sup AS support, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM f GROUP BY 1
"""


def q_edge_support_hist(sf_dir: str):
    """Per-edge triangle-support histogram of the part co-purchase
    graph — the k-truss profile (an edge with support >= k−2 survives
    the k-truss; the histogram says how much of the graph is
    community-glued vs tree-like).  Engine path: the shared
    degree-oriented wedge emission (each triangle discovered exactly
    once at its (degree,id)-minimal vertex, O(m^1.5) work), but
    instead of counting, every closed wedge credits its THREE packed
    edge keys; one edge-key exchange sums credits and the driver
    folds the (support -> count) histogram, with the zero bucket =
    |E| − |supported edges|.  All integers.  ORACLE-CHECKED."""
    import ray

    from ..stages.sorted_groups import sorted_group_map

    edges = _copurchase_edges(sf_dir)
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table({"support": pa.array([], pa.int64()),
                         "n_edges": pa.array([], pa.int64())})
    nodes, deg = _copurchase_degrees(edges)
    nodes_ref = ray.put(nodes)
    deg_ref = ray.put(deg)
    edge_keys = np.sort(np.concatenate(
        [t["k"].to_numpy(zero_copy_only=False)
         for t in ray.get(edges.to_arrow_refs()) if len(t)]
        or [np.empty(0, np.int64)]))
    ek_ref = ray.put(edge_keys)

    dir_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def _orient(batch: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        dg = ray.get(deg_ref)
        k = batch["k"].to_numpy(zero_copy_only=False)
        u = k >> np.int64(32)
        v = k & np.int64(0xFFFFFFFF)
        du = dg[np.searchsorted(nd, u)]
        dv = dg[np.searchsorted(nd, v)]
        flip = du > dv
        return pa.table({"src": np.where(flip, v, u),
                         "dst": np.where(flip, u, v)},
                        schema=dir_schema)

    directed = edges.map_batches(_orient, batch_format="pyarrow",
                                 zero_copy_batch=True)
    cred_schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def _wedge_credit(batch: pa.Table) -> pa.Table:
        ek = ray.get(ek_ref)
        if len(batch) < 2:
            return cred_schema.empty_table()
        tbl = batch.sort_by([("src", "ascending"),
                             ("dst", "ascending")])
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        first = np.empty(len(src), dtype=bool)
        first[0] = True
        first[1:] = src[1:] != src[:-1]
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(src)))
        # pairs (b, c) with the wedge center w repeated per pair
        bs, cs, ws = [], [], []
        for length in np.unique(lens):
            if length < 2:
                continue
            sel = starts[lens == length]
            idx = sel[:, None] + np.arange(length)
            m = dst[idx]
            iu, ju = np.triu_indices(int(length), 1)
            bs.append(m[:, iu].ravel())
            cs.append(m[:, ju].ravel())
            ws.append(np.repeat(src[sel], len(iu)))
        if not bs:
            return cred_schema.empty_table()
        b = np.concatenate(bs)
        c = np.concatenate(cs)
        w = np.concatenate(ws)
        lo = np.minimum(b, c)
        hi = np.maximum(b, c)
        wk = (lo << np.int64(32)) | hi
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos,
                                               len(ek) - 1)] == wk)
        if not hit.any():
            return cred_schema.empty_table()
        b, c, w, wk = b[hit], c[hit], w[hit], wk[hit]
        k1 = (np.minimum(w, b) << np.int64(32)) | np.maximum(w, b)
        k2 = (np.minimum(w, c) << np.int64(32)) | np.maximum(w, c)
        allk = np.concatenate([wk, k1, k2])
        uniq, cnts = np.unique(allk, return_counts=True)
        return pa.table({"k": uniq, "n": cnts.astype(np.int64)},
                        schema=cred_schema)

    credits = sorted_group_map(directed, ["src"], None, cred_schema,
                               block_fn=_wedge_credit)
    parts = _collect_raw(credits).to_pandas()
    sup = parts.groupby("k")["n"].sum() if len(parts) else None
    if sup is None or sup.empty:
        return pa.table({
            "support": pa.array([0], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64())})
    vals, cnts = np.unique(sup.to_numpy(np.int64),
                           return_counts=True)
    n_zero = n_edges - int(cnts.sum())
    support = vals.tolist()
    counts = cnts.tolist()
    if n_zero > 0:
        support = [0] + support
        counts = [n_zero] + counts
    return pa.table({
        "support": pa.array(support, pa.int64()),
        "n_edges": pa.array(counts, pa.int64())})


MRR_SQL = """
WITH u AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(FLOOR(ROUND(SUM(value), 6) * 1000000 + 0.5)
              AS HUGEINT) AS svi
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT event_type, SUM(svi) AS tots, SUM(cnt) AS totn
      FROM u GROUP BY 1),
r AS (
  SELECT u.event_type AS event_type,
         CASE WHEN svi * totn > tots * cnt THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY u.event_type
                            ORDER BY svi DESC, user_id) AS rnk
  FROM u JOIN t USING (event_type)),
a AS (
  SELECT event_type, CAST(SUM(rel) AS BIGINT) AS n_rel,
         CAST(MIN(CASE WHEN rel = 1 THEN rnk END) AS BIGINT) AS fr,
         CAST(SUM(CASE WHEN rel = 1 AND rnk <= 10 THEN 1 ELSE 0 END)
              AS BIGINT) AS hits10
  FROM r GROUP BY 1)
SELECT event_type, n_rel, fr AS first_rel_rank,
       ROUND(1.0 / fr, 6) AS mrr, hits10,
       ROUND(CAST(hits10 AS DOUBLE) / n_rel, 6) AS recall_at_10
FROM a WHERE n_rel > 0
"""


def q_mrr_eval(sf_dir: str):
    """Mean-reciprocal-rank + recall@10 per series — the remaining
    classic retrieval-eval pair next to ndcg_eval/roc_auc, on the
    same deterministic setup (predicted ranking = users by micro-int
    total spend, relevant = above-type-mean spenders via the exact
    integer cross-mult label): MRR = 1/(first relevant rank) and
    recall@10 = hits/|relevant| are each ONE float division of exact
    ints.  Same mergeable (type,user) partial combine.
    ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "user_id", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("user_id", pa.int64()),
                             ("n", pa.int64()), ("s", pa.float64())])

    def _parts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["event_type", "user_id", "n",
                                 "s"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _parts, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    u = parts.groupby(["event_type", "user_id"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"))
    rows = {"et": [], "nr": [], "fr": [], "mrr": [], "h": [],
            "rc": []}
    for et, sub in u.groupby("event_type"):
        cnt = sub["n"].to_numpy(np.int64)
        svi = np.floor(round6_tie_robust(sub["s"].to_numpy(np.float64))
                       * 1e6 + 0.5).astype(np.int64)
        uid = sub["user_id"].to_numpy(np.int64)
        tots = int(svi.astype(object).sum())
        totn = int(cnt.sum())
        rel = np.array([int(a) * totn > tots * int(b)
                        for a, b in zip(svi, cnt)], bool)
        n_rel = int(rel.sum())
        if n_rel == 0:
            continue
        order = np.lexsort((uid, -svi))
        rel_sorted = rel[order]
        fr = int(np.nonzero(rel_sorted)[0][0]) + 1
        hits10 = int(rel_sorted[:10].sum())
        rows["et"].append(et)
        rows["nr"].append(n_rel)
        rows["fr"].append(fr)
        rows["mrr"].append(1.0 / fr)
        rows["h"].append(hits10)
        rows["rc"].append(float(hits10) / n_rel)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_rel": pa.array(rows["nr"], pa.int64()),
        "first_rel_rank": pa.array(rows["fr"], pa.int64()),
        "mrr": pa.array(round6_tie_robust(
            np.array(rows["mrr"], np.float64))),
        "hits10": pa.array(rows["h"], pa.int64()),
        "recall_at_10": pa.array(round6_tie_robust(
            np.array(rows["rc"], np.float64))),
    }))


LC_CATALOG_SQL = """
WITH v AS (
  SELECT event_type, event_id, epoch_us(ts) AS t_us,
         CAST(FLOOR(ROUND(value, 6) * 1000 + 0.5) AS BIGINT) AS vi
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL AND event_id IS NOT NULL),
med AS (
  SELECT event_type, CAST(2 * MEDIAN(vi) AS BIGINT) AS med2,
         MIN(vi) AS mn, MAX(vi) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v GROUP BY 1),
mb AS (
  SELECT v.event_type AS event_type,
         CAST(SUM(CASE WHEN 10 * ABS(2 * v.vi - med.med2)
                            < (med.mx - med.mn)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_buf,
         MAX(ABS(2 * v.vi - med.med2)) AS maxdev2
  FROM v JOIN med USING (event_type) GROUP BY 1),
lastn AS (
  SELECT event_type, vi,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY t_us DESC, event_id DESC) AS rb
  FROM v),
pst AS (
  SELECT a.event_type AS event_type,
         CAST(SUM(CASE WHEN a.vi > b.vi THEN 1
                       WHEN a.vi < b.vi THEN -1 ELSE 0 END)
              AS BIGINT) AS net
  FROM lastn a JOIN lastn b
    ON b.event_type = a.event_type AND b.rb = a.rb + 1
  WHERE a.rb <= 30 GROUP BY 1),
srt AS (
  SELECT event_type, vi,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY vi) AS r
  FROM v),
ipr AS (
  SELECT s1.event_type AS event_type, s2.vi - s1.vi AS spread
  FROM srt s1
  JOIN med ON med.event_type = s1.event_type
  JOIN srt s2 ON s2.event_type = s1.event_type
            AND s2.r = 9 * (med.n - 1) // 10 + 1
  WHERE s1.r = (med.n - 1) // 10 + 1)
SELECT med.event_type AS event_type, med.n AS n,
       ROUND(med.med2 / 2000.0, 6) AS median,
       ROUND(CAST(mb.n_buf AS DOUBLE) / med.n, 6)
         AS median_buffer_range_pct,
       ROUND(CAST(mb.maxdev2 AS DOUBLE) / ABS(med.med2), 6)
         AS percent_amplitude,
       ROUND(CAST(pst.net AS DOUBLE) / 30.0, 6) AS pair_slope_trend,
       ROUND(ipr.spread / 1000.0, 6) AS inter_percentile_range
FROM med JOIN mb USING (event_type)
JOIN pst USING (event_type) JOIN ipr USING (event_type)
WHERE med.med2 <> 0 AND med.n > 30
"""


def q_lc_catalog_features(sf_dir: str):
    """Four more light-curve feature-catalog rows per series
    (reference ecosystem parity — the catalog light-curve-feature
    exports these next to the moments the rollup already computes;
    /root/reference/README.md:18): MedianBufferRangePercentage
    (fraction of points within a tenth of the full range around the
    median — the integer compare 10*|2v − med2| < max − min),
    PercentAmplitude (max|v − median| / |median|, one division of
    exact ints via the doubled-median trick), PairSlopeTrend (sign
    balance of the last 30 consecutive time-ordered differences,
    event_id tie-break — exact counts over 30), and
    InterPercentileRange p10..p90 (index convention (n−1)//10 and
    9*(n−1)//10 on the sorted milli values — exact int spread).
    The (type, milli-value) histogram + last-30 tail collapse
    map-side; per-series driver work is value-support scale.
    ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "event_id", "ts",
                                  "value"])
    hist_schema = pa.schema([("event_type", pa.string()),
                             ("vi", pa.int64()), ("n", pa.int64())])
    tail_schema = pa.schema([("event_type", pa.string()),
                             ("t_us", pa.int64()),
                             ("event_id", pa.int64()),
                             ("vi", pa.int64())])

    def _hist(batch: pa.Table) -> pa.Table:
        vi = np.floor(round6_tie_robust(
            batch["value"].to_numpy(zero_copy_only=False)) * 1000.0
            + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "vi": pa.array(vi, pa.int64())})
        g = t.group_by(["event_type", "vi"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "vi",
                                 "n"]).cast(hist_schema)

    def _tail(batch: pa.Table) -> pa.Table:
        # block-local last-30 candidates per type (mergeable: the
        # global last-30 is within the union of block last-30s)
        vi = np.floor(round6_tie_robust(
            batch["value"].to_numpy(zero_copy_only=False)) * 1000.0
            + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "t_us": batch["ts"].cast(pa.int64()),
                      "event_id": batch["event_id"],
                      "vi": pa.array(vi, pa.int64())})
        df = t.to_pandas()
        keep = df.sort_values(["t_us", "event_id"],
                              ascending=False).groupby(
            "event_type").head(31)
        return pa.Table.from_pandas(keep, preserve_index=False).cast(
            tail_schema)

    hist = _collect_raw(ds.map_batches(
        _hist, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    cells = hist.groupby(["event_type", "vi"], as_index=False)[
        "n"].sum()
    tails = _collect_raw(ds.map_batches(
        _tail, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    rows = {"et": [], "n": [], "md": [], "mb": [], "pa_": [],
            "ps": [], "ip": []}
    for et, sub in cells.groupby("event_type"):
        vi = sub["vi"].to_numpy(np.int64)
        cnt = sub["n"].to_numpy(np.int64)
        order = np.argsort(vi)
        vi, cnt = vi[order], cnt[order]
        n = int(cnt.sum())
        if n <= 30:
            continue
        cum = np.cumsum(cnt)
        lo = int(vi[np.searchsorted(cum, (n - 1) // 2 + 1)])
        hi = int(vi[np.searchsorted(cum, n // 2 + 1)])
        med2 = lo + hi
        if med2 == 0:
            continue
        mn, mx = int(vi[0]), int(vi[-1])
        dev2 = np.abs(2 * vi - med2)
        n_buf = int(cnt[10 * dev2 < (mx - mn)].sum())
        maxdev2 = int(dev2.max())
        i10 = int(vi[np.searchsorted(cum, (n - 1) // 10 + 1)])
        i90 = int(vi[np.searchsorted(cum, 9 * (n - 1) // 10 + 1)])
        tl = tails[tails["event_type"] == et].sort_values(
            ["t_us", "event_id"], ascending=False).head(31)
        tv = tl["vi"].to_numpy(np.int64)
        d = tv[:-1] - tv[1:]  # newest-first: a.vi - next-older b.vi
        d = d[:30]
        net = int(np.sign(d).sum())
        rows["et"].append(et)
        rows["n"].append(n)
        rows["md"].append(med2 / 2000.0)
        rows["mb"].append(float(n_buf) / n)
        rows["pa_"].append(float(maxdev2) / abs(med2))
        rows["ps"].append(net / 30.0)
        rows["ip"].append((i90 - i10) / 1000.0)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "median": pa.array(round6_tie_robust(
            np.array(rows["md"], np.float64))),
        "median_buffer_range_pct": pa.array(round6_tie_robust(
            np.array(rows["mb"], np.float64))),
        "percent_amplitude": pa.array(round6_tie_robust(
            np.array(rows["pa_"], np.float64))),
        "pair_slope_trend": pa.array(round6_tie_robust(
            np.array(rows["ps"], np.float64))),
        "inter_percentile_range": pa.array(round6_tie_robust(
            np.array(rows["ip"], np.float64))),
    }))


AVG_PRECISION_SQL = """
WITH u AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(FLOOR(ROUND(SUM(value), 6) * 1000000 + 0.5)
              AS HUGEINT) AS svi
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND value IS NOT NULL
  GROUP BY 1, 2),
t AS (SELECT event_type, SUM(svi) AS tots, SUM(cnt) AS totn
      FROM u GROUP BY 1),
r AS (
  SELECT u.event_type AS event_type,
         CASE WHEN svi * totn > tots * cnt THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY u.event_type
                            ORDER BY svi DESC, user_id) AS rnk
  FROM u JOIN t USING (event_type)),
h AS (
  SELECT event_type, rel, rnk,
         SUM(rel) OVER (PARTITION BY event_type ORDER BY rnk)
           AS hits
  FROM r),
a AS (
  SELECT event_type,
         CAST(SUM(rel) AS BIGINT) AS n_rel,
         SUM(CASE WHEN rel = 1
                  THEN CAST(hits AS DOUBLE) / rnk
                  ELSE 0.0 END ORDER BY rnk) AS ap_sum
  FROM h GROUP BY 1)
SELECT event_type, n_rel,
       ROUND(ap_sum / n_rel, 6) AS avg_precision
FROM a WHERE n_rel > 0
"""


def q_avg_precision(sf_dir: str):
    """Average precision per series — the last classic IR-eval member
    next to ndcg_eval / mrr_eval / roc_auc, same deterministic setup
    (spend ranking, above-mean relevance): AP = mean over relevant
    ranks of precision@rank.  Each precision term hits/rank is ONE
    exact-int division; the rank-ordered fold mirrors the oracle's
    ORDER BY rnk SUM operand-for-operand, and the final /n_rel is the
    single closing division.  Mergeable (type,user) partials.
    ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust

    ds = _events_nonnull(sf_dir, ["event_type", "user_id", "value"])
    part_schema = pa.schema([("event_type", pa.string()),
                             ("user_id", pa.int64()),
                             ("n", pa.int64()), ("s", pa.float64())])

    def _parts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["event_type", "user_id", "n",
                                 "s"]).cast(part_schema)

    parts = _collect_raw(ds.map_batches(
        _parts, batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()
    u = parts.groupby(["event_type", "user_id"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"))
    rows = {"et": [], "nr": [], "ap": []}
    for et, sub in u.groupby("event_type"):
        cnt = sub["n"].to_numpy(np.int64)
        svi = np.floor(round6_tie_robust(sub["s"].to_numpy(np.float64))
                       * 1e6 + 0.5).astype(np.int64)
        uid = sub["user_id"].to_numpy(np.int64)
        tots = int(svi.astype(object).sum())
        totn = int(cnt.sum())
        rel = np.array([int(a) * totn > tots * int(b)
                        for a, b in zip(svi, cnt)], bool)
        n_rel = int(rel.sum())
        if n_rel == 0:
            continue
        order = np.lexsort((uid, -svi))
        rs = rel[order]
        ap_sum = 0.0
        hits = 0
        for rnk, r in enumerate(rs.tolist(), start=1):
            if r:
                hits += 1
                ap_sum += float(hits) / rnk
        rows["et"].append(et)
        rows["nr"].append(n_rel)
        rows["ap"].append(ap_sum / n_rel)
    return _collect(pa.table({
        "event_type": pa.array(rows["et"], pa.string()),
        "n_rel": pa.array(rows["nr"], pa.int64()),
        "avg_precision": pa.array(round6_tie_robust(
            np.array(rows["ap"], np.float64))),
    }))


GAP_ALARM_SQL = """
WITH e AS (
  SELECT event_type, user_id, epoch_us(ts) AS t_us
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND ts IS NOT NULL),
g AS (
  SELECT event_type, user_id,
         t_us - LAG(t_us) OVER (PARTITION BY event_type, user_id
                                ORDER BY t_us) AS gap
  FROM e),
s AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         MAX(gap) AS mx, CAST(2 * MEDIAN(gap) AS BIGINT) AS med2
  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
f AS (SELECT event_type,
             CASE WHEN 2 * mx > 5 * med2 THEN 1 ELSE 0 END AS alarm
      FROM s WHERE n_gaps >= 4)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(alarm) AS BIGINT) AS n_alarms,
       ROUND(CAST(SUM(alarm) AS DOUBLE) / COUNT(*), 6) AS alarm_rate
FROM f GROUP BY 1
"""


def q_gap_alarm(sf_dir: str):
    """Inter-arrival gap alarms per series — the ops-monitoring
    "did this user's cadence break" flag: a (type, user) pair alarms
    when its MAX inter-event gap exceeds 5x its MEDIAN gap (and it
    has >= 4 gaps, so the median is meaningful).  EXACT: gaps are
    epoch-microsecond int64 differences; the 5x threshold is the
    integer cross-multiplication 2*max > 5*med2 via the doubled-
    MEDIAN trick — no float enters the flag; the alarm rate is ONE
    division.  Per-(type,user) gap stats come off one user-keyed
    sorted pass (sorted_group_map discipline at scale; here the
    per-pair event lists collapse map-side to gap partials is NOT
    valid — gaps need global time order — so the exchange is the
    (type,user) sort itself).  ORACLE-CHECKED."""
    from ..kernels.rounding import round6_tie_robust
    from ..stages.sorted_groups import _runs, sorted_group_map

    ds = _events_nonnull(sf_dir, ["event_type", "user_id", "ts"])
    ev_schema = pa.schema([("event_type", pa.string()),
                           ("user_id", pa.int64()),
                           ("t_us", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "user_id": batch["user_id"],
                         "t_us": batch["ts"].cast(pa.int64())},
                        schema=ev_schema)

    ev = ds.map_batches(_prep, batch_format="pyarrow",
                        zero_copy_batch=True)
    out_schema = pa.schema([("event_type", pa.string()),
                            ("alarm", pa.int64()),
                            ("n", pa.int64())])

    def _flags(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["event_type", "user_id"])
        t = batch["t_us"].to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        rows_et, rows_alarm = [], []
        for s0, e0 in zip(starts.tolist(), ends.tolist()):
            ts = np.sort(t[s0:e0])
            gaps = np.diff(ts)
            if len(gaps) < 4:
                continue
            gs = np.sort(gaps)
            m = len(gs)
            med2 = int(gs[(m - 1) // 2]) + int(gs[m // 2])
            rows_et.append(et[s0].as_py())
            rows_alarm.append(int(2 * int(gs[-1]) > 5 * med2))
        if not rows_et:
            return out_schema.empty_table()
        tt = pa.table({"event_type": pa.array(rows_et, pa.string()),
                       "alarm": pa.array(rows_alarm, pa.int64())})
        g = tt.group_by(["event_type"]).aggregate(
            [("alarm", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "alarm",
                                 "n"]).cast(out_schema)

    parts = _collect_raw(sorted_group_map(
        ev, ["event_type", "user_id"], None, out_schema,
        block_fn=_flags)).to_pandas()
    agg = parts.groupby("event_type", as_index=False).agg(
        alarm=("alarm", "sum"), n=("n", "sum")).sort_values(
        "event_type")
    return _collect(pa.table({
        "event_type": pa.array(agg["event_type"].tolist(),
                               pa.string()),
        "n_users": pa.array(agg["n"].to_numpy(np.int64)),
        "n_alarms": pa.array(agg["alarm"].to_numpy(np.int64)),
        "alarm_rate": pa.array(round6_tie_robust(
            agg["alarm"].to_numpy(np.float64)
            / agg["n"].to_numpy(np.float64))),
    }))


def build_queries() -> dict:
    # ORDERING CONTRACT: the correctness driver verifies a bounded PREFIX of
    # this dict (50 entries in r03).  Least-recently-driver-verified families
    # go FIRST each round so the prefix rotates coverage: round 3's driver
    # record stopped at entry 50 and never reached the dedup/similarity/
    # text/multimodal tail, so round 4 leads with exactly that tail (plus
    # the queries new this round), then the r03-verified set.
    return {
        # -- never driver-verified as of r03 (VERDICT r03 item #2:
        # these four lead the dict so the driver's bounded prefix
        # finally records them) --
        "dedup_lsh_recall_floor": q_dedup_lsh_recall_floor,
        "dedup_simhash_recall_floor": q_dedup_simhash_recall_floor,
        "ann_topk_ivf_full": q_ann_topk_ivf_full,
        "embedding_components": q_embedding_components,
        # -- new in round 4 --
        "jarque_bera": q_jarque_bera,
        "mann_kendall": q_mann_kendall,
        "readability_ari": q_readability_ari,
        "chao1_richness": q_chao1_richness,
        "friedman_test": q_friedman_test,
        "brown_forsythe": q_brown_forsythe,
        "sample_entropy": q_sample_entropy,
        "bollinger_daily": q_bollinger_daily,
        "ndcg_eval": q_ndcg_eval,
        "adjusted_rand": q_adjusted_rand,
        "haar_energy": q_haar_energy,
        "roc_auc": q_roc_auc,
        "naive_bayes": q_naive_bayes,
        "matrix_profile": q_matrix_profile,
        "label_propagation": q_label_propagation,
        "ngram_novelty": q_ngram_novelty,
        "large_orders": q_large_orders,
        "small_qty_revenue": q_small_qty_revenue,
        "idle_balance": q_idle_balance,
        "dfa_fluctuation": q_dfa_fluctuation,
        "lis_daily": q_lis_daily,
        "source_gram_overlap": q_source_gram_overlap,
        "wasserstein_weekend": q_wasserstein_weekend,
        "edge_support_hist": q_edge_support_hist,
        "mrr_eval": q_mrr_eval,
        "lc_catalog_features": q_lc_catalog_features,
        "avg_precision": q_avg_precision,
        "gap_alarm": q_gap_alarm,
        "dmdt_map": q_dmdt_map,
        "dmdt_gausses": q_dmdt_gausses,
        "conditional_entropy": q_conditional_entropy,
        "weighted_features": q_weighted_features,
        "gopher_repetition": q_gopher_repetition,
        "binned_shape_features": q_binned_shape_features,
        "pivot_events": q_pivot_events,
        "unpivot_events": q_unpivot_events,
        "bazin_fit": q_bazin_fit,
        "villar_fit": q_villar_fit,
        "time_features": q_time_features,
        "roms": q_roms,
        "pii_redact": q_pii_redact,
        "corr_lineitem": q_corr_lineitem,
        "bloom_semijoin": q_bloom_semijoin,
        "mixture_sample": q_mixture_sample,
        "chunk_stride": q_chunk_stride,
        "skew_join": q_skew_join,
        "user_sequences": q_user_sequences,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "impute_events": q_impute_events,
        "csv_roundtrip": q_csv_roundtrip,
        "spearman_events": q_spearman_events,
        "ks_drift": q_ks_drift,
        "acf_daily": q_acf_daily,
        "mode_events": q_mode_events,
        "cumulative_users": q_cumulative_users,
        "robust_mean": q_robust_mean,
        "compact_roundtrip": q_compact_roundtrip,
        "gini_events": q_gini_events,
        "left_join_orders": q_left_join_orders,
        "table_diff": q_table_diff,
        "edit_join": q_edit_join,
        "window_ranks": q_window_ranks,
        "user_streaks": q_user_streaks,
        "xcorr_matrix": q_xcorr_matrix,
        "profile_events": q_profile_events,
        "rolling_wau": q_rolling_wau,
        "twap_events": q_twap_events,
        "downsample_minmax": q_downsample_minmax,
        "downsample_lttb": q_downsample_lttb,
        "interval_union": q_interval_union,
        "kmv_overlap": q_kmv_overlap,
        "ab_test": q_ab_test,
        "json_props": q_json_props,
        "markov_transitions": q_markov_transitions,
        "covisit_pairs": q_covisit_pairs,
        "benford_prices": q_benford_prices,
        "anomaly_mad": q_anomaly_mad,
        "rfm_segments": q_rfm_segments,
        "dow_profile": q_dow_profile,
        "kanon_rollup": q_kanon_rollup,
        "weighted_sample": q_weighted_sample,
        "attribution": q_attribution,
        "scd2_history": q_scd2_history,
        "changepoint_cusum": q_changepoint_cusum,
        "vocab_build": q_vocab_build,
        "embedding_dim_stats": q_embedding_dim_stats,
        "range_splits": q_range_splits,
        "snapshot_ffill": q_snapshot_ffill,
        "bounce_rate": q_bounce_rate,
        "gap_quantiles": q_gap_quantiles,
        "pareto_share": q_pareto_share,
        "ipc_roundtrip": q_ipc_roundtrip,
        "chi2_independence": q_chi2_independence,
        "time_to_convert": q_time_to_convert,
        "rolling_corr": q_rolling_corr,
        "session_path_topk": q_session_path_topk,
        "dedup_keep_best": q_dedup_keep_best,
        "wow_change": q_wow_change,
        "lines_per_order_hist": q_lines_per_order_hist,
        "theilsen_trend": q_theilsen_trend,
        "integrity_audit": q_integrity_audit,
        "max_drawdown": q_max_drawdown,
        "forecast_backtest": q_forecast_backtest,
        "triangle_count": q_triangle_count,
        "text_normalize": q_text_normalize,
        "negative_sampling": q_negative_sampling,
        "hourly_entropy": q_hourly_entropy,
        "pagerank_parts": q_pagerank_parts,
        "knn_accuracy": q_knn_accuracy,
        "temporal_motifs": q_temporal_motifs,
        "lag_features": q_lag_features,
        "weighted_median": q_weighted_median,
        "burstiness": q_burstiness,
        "embedding_quantize": q_embedding_quantize,
        "trending_decay": q_trending_decay,
        "type_jaccard": q_type_jaccard,
        "keyness_terms": q_keyness_terms,
        "repeat_purchase": q_repeat_purchase,
        "copurchase_lift": q_copurchase_lift,
        "dedup_normalized": q_dedup_normalized,
        "ship_delay_quantiles": q_ship_delay_quantiles,
        "label_centroids": q_label_centroids,
        "tail_mean": q_tail_mean,
        "xcorr_lag": q_xcorr_lag,
        "bm25_scores": q_bm25_scores,
        "rrf_fusion": q_rrf_fusion,
        "zipf_slope": q_zipf_slope,
        "heaps_law": q_heaps_law,
        "woe_iv": q_woe_iv,
        "target_encode": q_target_encode,
        "psi_drift": q_psi_drift,
        "calibration_deciles": q_calibration_deciles,
        "structure_function": q_structure_function,
        "phase_fold": q_phase_fold,
        "kcore_graph": q_kcore_graph,
        "isotonic_daily": q_isotonic_daily,
        "vonneumann_daily": q_vonneumann_daily,
        "perm_entropy": q_perm_entropy,
        "runs_test": q_runs_test,
        "sax_words": q_sax_words,
        "kmeans_embeddings": q_kmeans_embeddings,
        "jsd_drift": q_jsd_drift,
        "holt_daily": q_holt_daily,
        "local_peaks": q_local_peaks,
        "ldiversity_audit": q_ldiversity_audit,
        "embedding_covariance": q_embedding_covariance,
        "max_concurrency": q_max_concurrency,
        "item_cosine": q_item_cosine,
        "seasonal_decompose": q_seasonal_decompose,
        "shift_weights": q_shift_weights,
        "pot_clusters": q_pot_clusters,
        "ohlc_daily": q_ohlc_daily,
        "contingency_residuals": q_contingency_residuals,
        "source_lang_cosine": q_source_lang_cosine,
        "mannwhitney_u": q_mannwhitney_u,
        "cluster_label_mix": q_cluster_label_mix,
        "degree_hist": q_degree_hist,
        "overdispersion": q_overdispersion,
        "hhi_users": q_hhi_users,
        "quantile_bands_daily": q_quantile_bands_daily,
        "charclass_stats": q_charclass_stats,
        "dup_rate_by_source": q_dup_rate_by_source,
        "skyline_daily": q_skyline_daily,
        "boolean_search": q_boolean_search,
        "assortativity": q_assortativity,
        "type_weighted_jaccard": q_type_weighted_jaccard,
        "adamic_adar": q_adamic_adar,
        "shipping_priority": q_shipping_priority,
        "regional_volume": q_regional_volume,
        "gini_stump": q_gini_stump,
        "kendall_tau": q_kendall_tau,
        "mutual_information": q_mutual_information,
        "kaplan_meier": q_kaplan_meier,
        "feature_hashing": q_feature_hashing,
        "clustering_coef": q_clustering_coef,
        "anova_events": q_anova_events,
        "ntile_stats": q_ntile_stats,
        "hits_scores": q_hits_scores,
        "pyth_means": q_pyth_means,
        "lexical_richness": q_lexical_richness,
        "grubbs_outliers": q_grubbs_outliers,
        "blocklist_rate": q_blocklist_rate,
        "pca_top_eigen": q_pca_top_eigen,
        "markov_perplexity": q_markov_perplexity,
        "bfs_levels": q_bfs_levels,
        "frequent_triples": q_frequent_triples,
        "hurst_rs": q_hurst_rs,
        "welch_ttest": q_welch_ttest,
        "cramers_v": q_cramers_v,
        "tcloseness_audit": q_tcloseness_audit,
        "rolling_median_7d": q_rolling_median_7d,
        "oov_rate": q_oov_rate,
        "pairwise_scale": q_pairwise_scale,
        "geometric_median": q_geometric_median,
        "volume_shipping": q_volume_shipping,
        "promo_share": q_promo_share,
        "returns_topk": q_returns_topk,
        "brand_suppliers": q_brand_suppliers,
        "markov_entropy_rate": q_markov_entropy_rate,
        "gumbel_maxima": q_gumbel_maxima,
        "record_days": q_record_days,
        "churn_labels": q_churn_labels,
        "inequality_indices": q_inequality_indices,
        "circular_hour_stats": q_circular_hour_stats,
        "behavior_kappa": q_behavior_kappa,
        "streak_stats": q_streak_stats,
        "sentence_stats": q_sentence_stats,
        "order_ship_span": q_order_ship_span,
        "label_separation": q_label_separation,
        "quantile_normalize": q_quantile_normalize,
        "term_burstiness": q_term_burstiness,
        "char_entropy": q_char_entropy,
        "reorder_gaps": q_reorder_gaps,
        "wilson_ci": q_wilson_ci,
        "effective_dim": q_effective_dim,
        "discount_bands": q_discount_bands,
        "rich_club": q_rich_club,
        "kruskal_wallis": q_kruskal_wallis,
        "huber_location": q_huber_location,
        "tail_codependence": q_tail_codependence,
        # -- last driver-verified in r02 --
        "hot_keys": q_hot_keys,
        "dedup_exact": q_dedup_exact,
        "dedup_filter": q_dedup_filter,
        "quality_filter": q_quality_filter,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding": q_dedup_embedding,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "text_stats": q_text_stats,
        "lang_fingerprint": q_lang_fingerprint,
        "series_grid_stats": q_series_grid_stats,
        "series_gorilla": q_series_gorilla,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_features": q_multimodal_features,
        "dedup_image": q_dedup_image,
        # -- driver-verified green in r03, in the r03 order --
        "events_by_type": q_events_by_type,
        "rollup_1h": q_rollup("1h"),
        "rollup_1d": q_rollup("1d"),
        "rollup_30d": q_rollup("30d"),
        "gapfill_1d": q_gapfill_1d,
        "rollup_roundtrip": q_rollup_roundtrip,
        "interp_grid": q_interp_grid,
        "events_asof": q_events_asof,
        "events_range": q_events_range,
        "distinct_users": q_distinct_users,
        "hll_users": q_hll_users,
        "quantile_events": q_quantile_events,
        "passage_dedup": q_passage_dedup,
        "sessions": q_sessions,
        "cc_events": q_cc_events,
        "split_sample": q_split_sample,
        "top_terms": q_top_terms,
        "dedup_components": q_dedup_components,
        "tfidf_terms": q_tfidf_terms,
        "doc_logprob": q_doc_logprob,
        "anti_join_orders": q_anti_join_orders,
        "stratified_quota": q_stratified_quota,
        "histogram_events": q_histogram_events,
        "zscore_events": q_zscore_events,
        "heavy_users": q_heavy_users,
        "pack_sequences": q_pack_sequences,
        "decontaminate": q_decontaminate,
        "epoch_shuffle": q_epoch_shuffle,
        "inverted_index": q_inverted_index,
        "bigram_pmi": q_bigram_pmi,
        "ewma_daily": q_ewma_daily,
        "daily_retention": q_daily_retention,
        "funnel_users": q_funnel_users,
        "cohort_retention": q_cohort_retention,
        "corpus_prep": q_corpus_prep,
        "events_cube": q_events_cube,
        "latest_events": q_latest_events,
        "incremental_rollup": q_incremental_rollup,
        "topk_orders": q_topk_orders,
        "revenue_by_segment": q_revenue_by_segment,
        "periodogram": q_periodogram,
        "periodogram_peaks": q_periodogram_peaks,
        "sliding_3h": q_sliding_3h,
        "shape_features": q_shape_features,
        "otsu_split": q_otsu_split,
        "percentile_ratios": q_percentile_ratios,
        "anderson_darling": q_anderson_darling,
        "rollup_lineitem_1d": q_rollup_lineitem_1d,
        "pages_rollup_1d": q_pages_rollup_1d,
        "pages_dedup_rollup_1d": q_pages_dedup_rollup_1d,
    }


def _series_gorilla_sql(points_sql: str) -> str:
    """Per-series aggregates of the gap-filled grid, one arm per tier —
    the oracle for q_series_gorilla, whose engine-side numbers are decoded
    back OUT of the Gorilla blobs."""
    arms = []
    for tier in ("1h", "1d", "30d"):
        g = _gapfill_sql(points_sql, tier)
        arms.append(f"""
SELECT lang, domain, tier,
  COUNT(*) AS n_buckets,
  CAST(SUM(CASE WHEN filled THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
  COUNT(*) AS n_decoded,
  MIN(bucket_ts_us) AS t_min_us,
  MAX(bucket_ts_us) AS t_max_us,
  ROUND(SUM(mean), 6) AS v_sum
FROM ({g}) GROUP BY 1, 2, 3""")
    return " UNION ALL ".join(arms)


def _tie_robust_sql(sql: str) -> str:
    """ROUND(x, 6) -> ROUND(ROUND(x, 9), 6) throughout an oracle query —
    the SQL half of the two-step rounding contract (see
    kernels/rounding.round6_tie_robust; _round6 applies the Ray half).
    Purely mechanical: every ROUND in the oracle strings is a 6-dp final
    round (audited), so the paired replace below rewrites exactly those.

    The trailing `+ 0.0` collapses -0.0 -> +0.0: DuckDB's ROUND of a
    tiny-negative value (e.g. cm3/POWER(m2,1.5) where symmetric deltas
    cancel to ~-1e-18) preserves the sign and emits -0.0, while the
    engine's merged moments cancel to exact +0.0 — value-equal but
    byte-different, so the driver's value hash fails (round-2 regression
    on rollup_1h/rollup_lineitem_1d).  kernels/rounding.round_decimals_away
    applies the same normalization on the Ray side."""
    return (sql.replace("ROUND(", "(ROUND(ROUND(")
               .replace(", 6)", ", 9), 6) + 0.0)"))


def build_oracle_sql() -> dict:
    base = {
        "events_by_type": EVENTS_BY_TYPE_SQL,
        "rollup_1h": _rollup_sql(EVENTS_POINTS_SQL, "1h"),
        "rollup_1d": _rollup_sql(EVENTS_POINTS_SQL, "1d"),
        "rollup_30d": _rollup_sql(EVENTS_POINTS_SQL, "30d"),
        "gapfill_1d": _gapfill_sql(EVENTS_POINTS_SQL, "1d"),
        "rollup_roundtrip": _rollup_sql(EVENTS_POINTS_SQL, "1d"),
        "interp_grid": INTERP_GRID_SQL,
        "events_asof": EVENTS_ASOF_SQL,
        "events_range": EVENTS_RANGE_SQL,
        "distinct_users": DISTINCT_USERS_SQL,
        "quantile_events": QUANTILE_EVENTS_SQL,
        "passage_dedup": PASSAGE_DEDUP_SQL,
        "sessions": SESSIONS_SQL,
        "cc_events": CC_EVENTS_SQL,
        "split_sample": _split_sample_sql(),
        "top_terms": TOP_TERMS_SQL,
        "dedup_components": DEDUP_COMPONENTS_SQL,
        "tfidf_terms": TFIDF_TERMS_SQL,
        "doc_logprob": DOC_LOGPROB_SQL,
        "anti_join_orders": ANTI_JOIN_ORDERS_SQL,
        "stratified_quota": _stratified_quota_sql(),
        "histogram_events": HISTOGRAM_EVENTS_SQL,
        "zscore_events": ZSCORE_EVENTS_SQL,
        "pack_sequences": PACK_SEQUENCES_SQL,
        "decontaminate": DECONTAMINATE_SQL,
        "epoch_shuffle": _epoch_shuffle_sql(),
        "inverted_index": INVERTED_INDEX_SQL,
        "bigram_pmi": BIGRAM_PMI_SQL,
        "ewma_daily": EWMA_DAILY_SQL,
        "daily_retention": DAILY_RETENTION_SQL,
        "funnel_users": FUNNEL_USERS_SQL,
        "cohort_retention": COHORT_RETENTION_SQL,
        "corpus_prep": _corpus_prep_sql(),
        "events_cube": EVENTS_CUBE_SQL,
        "latest_events": LATEST_EVENTS_SQL,
        # the incremental merge must equal the FULL-data rollup
        "incremental_rollup": _rollup_sql(EVENTS_POINTS_SQL, "1d"),
        "topk_orders": TOPK_ORDERS_SQL,
        "revenue_by_segment": _revenue_sql(),
        "periodogram": PERIODOGRAM_SQL,
        "periodogram_peaks": f"""
SELECT event_type, k, power, rn FROM (
  SELECT event_type, k, power,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY power DESC, k) AS rn
  FROM ({PERIODOGRAM_SQL}))
WHERE rn <= 2
""",
        "sliding_3h": _sliding_sql(EVENTS_POINTS_SQL,
                                   3_600_000_000, 3),
        "shape_features": SHAPE_FEATURES_SQL.format(points=EVENTS_POINTS_SQL),
        # Bins meta-feature: the same shape SQL over 1d bucket-mean points
        # (means rounded to the shared 6-dp representative on both sides)
        "binned_shape_features": SHAPE_FEATURES_SQL.format(
            points=f"""
  SELECT lang, domain, bucket_ts_us AS t_us, ROUND(AVG(v), 6) AS v,
         1.0 AS w
  FROM (SELECT lang, domain,
               (t_us // {TIER_STEP_US['1d']}) * {TIER_STEP_US['1d']}
                 AS bucket_ts_us, v
        FROM ({EVENTS_POINTS_SQL}))
  GROUP BY 1, 2, 3"""),
        "dmdt_map": _dmdt_sql(EVENTS_POINTS_SQL),
        "conditional_entropy": _conditional_entropy_sql(EVENTS_POINTS_SQL),
        "weighted_features": _weighted_features_sql(EVENTS_POINTS_SQL),
        "time_features": _time_features_sql(EVENTS_POINTS_SQL),
        "roms": _roms_sql(EVENTS_POINTS_SQL),
        "pii_redact": PII_REDACT_SQL,
        "corr_lineitem": _corr_lineitem_sql(),
        "bloom_semijoin": BLOOM_SEMIJOIN_SQL,
        "mixture_sample": _mixture_sample_sql(),
        "chunk_stride": CHUNK_STRIDE_SQL,
        "skew_join": _skew_join_sql(),
        "user_sequences": USER_SEQUENCES_SQL,
        "jsonl_roundtrip": JSONL_ROUNDTRIP_SQL,
        "impute_events": _impute_events_sql(),
        "csv_roundtrip": JSONL_ROUNDTRIP_SQL,
        "spearman_events": SPEARMAN_EVENTS_SQL,
        "ks_drift": _ks_drift_sql(),
        "acf_daily": ACF_DAILY_SQL,
        "mode_events": MODE_EVENTS_SQL,
        "cumulative_users": CUMULATIVE_USERS_SQL,
        "robust_mean": ROBUST_MEAN_SQL,
        "compact_roundtrip": JSONL_ROUNDTRIP_SQL,
        "gini_events": GINI_EVENTS_SQL,
        "left_join_orders": LEFT_JOIN_ORDERS_SQL,
        "table_diff": _table_diff_sql(),
        "edit_join": _edit_join_sql(),
        "window_ranks": WINDOW_RANKS_SQL,
        "user_streaks": USER_STREAKS_SQL,
        "xcorr_matrix": XCORR_MATRIX_SQL,
        "profile_events": PROFILE_EVENTS_SQL,
        "rolling_wau": ROLLING_WAU_SQL,
        "twap_events": TWAP_EVENTS_SQL,
        "downsample_minmax": DOWNSAMPLE_MINMAX_SQL,
        "interval_union": INTERVAL_UNION_SQL,
        "kmv_overlap": KMV_OVERLAP_SQL,
        "ab_test": _ab_test_sql(),
        "json_props": JSON_PROPS_SQL,
        "markov_transitions": MARKOV_TRANSITIONS_SQL,
        "covisit_pairs": COVISIT_PAIRS_SQL,
        "benford_prices": BENFORD_PRICES_SQL,
        "anomaly_mad": ANOMALY_MAD_SQL,
        "rfm_segments": RFM_SEGMENTS_SQL,
        "dow_profile": DOW_PROFILE_SQL,
        "kanon_rollup": KANON_ROLLUP_SQL,
        "weighted_sample": _weighted_sample_sql(),
        "attribution": ATTRIBUTION_SQL,
        "scd2_history": SCD2_HISTORY_SQL,
        "changepoint_cusum": CHANGEPOINT_CUSUM_SQL,
        "vocab_build": VOCAB_BUILD_SQL,
        "embedding_dim_stats": EMBEDDING_DIM_STATS_SQL,
        "range_splits": RANGE_SPLITS_SQL,
        "snapshot_ffill": SNAPSHOT_FFILL_SQL,
        "bounce_rate": BOUNCE_RATE_SQL,
        "gap_quantiles": GAP_QUANTILES_SQL,
        "pareto_share": PARETO_SHARE_SQL,
        "ipc_roundtrip": JSONL_ROUNDTRIP_SQL,
        "chi2_independence": CHI2_INDEPENDENCE_SQL,
        "time_to_convert": TIME_TO_CONVERT_SQL,
        "rolling_corr": ROLLING_CORR_SQL,
        "session_path_topk": SESSION_PATH_TOPK_SQL,
        "dedup_keep_best": DEDUP_KEEP_BEST_SQL,
        "wow_change": WOW_CHANGE_SQL,
        "lines_per_order_hist": LINES_PER_ORDER_HIST_SQL,
        "theilsen_trend": THEILSEN_TREND_SQL,
        "integrity_audit": INTEGRITY_AUDIT_SQL,
        "max_drawdown": MAX_DRAWDOWN_SQL,
        "forecast_backtest": FORECAST_BACKTEST_SQL,
        "triangle_count": TRIANGLE_COUNT_SQL,
        "text_normalize": TEXT_NORMALIZE_SQL,
        "negative_sampling": _negative_sampling_sql(),
        "hourly_entropy": HOURLY_ENTROPY_SQL,
        "pagerank_parts": PAGERANK_PARTS_SQL,
        "knn_accuracy": KNN_ACCURACY_SQL,
        "temporal_motifs": TEMPORAL_MOTIFS_SQL,
        "lag_features": LAG_FEATURES_SQL,
        "weighted_median": WEIGHTED_MEDIAN_SQL,
        "burstiness": BURSTINESS_SQL,
        "embedding_quantize": EMBEDDING_QUANTIZE_SQL,
        "trending_decay": TRENDING_DECAY_SQL,
        "type_jaccard": TYPE_JACCARD_SQL,
        "keyness_terms": KEYNESS_TERMS_SQL,
        "repeat_purchase": REPEAT_PURCHASE_SQL,
        "copurchase_lift": COPURCHASE_LIFT_SQL,
        "dedup_normalized": DEDUP_NORMALIZED_SQL,
        "ship_delay_quantiles": SHIP_DELAY_QUANTILES_SQL,
        "label_centroids": LABEL_CENTROIDS_SQL,
        "tail_mean": TAIL_MEAN_SQL,
        "xcorr_lag": XCORR_LAG_SQL,
        "bm25_scores": BM25_SCORES_SQL,
        "rrf_fusion": RRF_FUSION_SQL,
        "zipf_slope": ZIPF_SLOPE_SQL,
        "heaps_law": HEAPS_LAW_SQL,
        "woe_iv": WOE_IV_SQL,
        "target_encode": TARGET_ENCODE_SQL,
        "psi_drift": PSI_DRIFT_SQL,
        "calibration_deciles": CALIBRATION_DECILES_SQL,
        "structure_function": STRUCTURE_FUNCTION_SQL,
        "phase_fold": PHASE_FOLD_SQL,
        "kcore_graph": _kcore_sql(),
        "isotonic_daily": ISOTONIC_DAILY_SQL,
        "vonneumann_daily": VONNEUMANN_SQL,
        "perm_entropy": PERM_ENTROPY_SQL,
        "runs_test": RUNS_TEST_SQL,
        "sax_words": SAX_WORDS_SQL,
        "kmeans_embeddings": _kmeans_sql(),
        "jsd_drift": JSD_DRIFT_SQL,
        "holt_daily": HOLT_DAILY_SQL,
        "local_peaks": LOCAL_PEAKS_SQL,
        "ldiversity_audit": LDIVERSITY_SQL,
        "embedding_covariance": EMBEDDING_COVARIANCE_SQL,
        "max_concurrency": MAX_CONCURRENCY_SQL,
        "item_cosine": ITEM_COSINE_SQL,
        "seasonal_decompose": SEASONAL_DECOMPOSE_SQL,
        "shift_weights": SHIFT_WEIGHTS_SQL,
        "pot_clusters": POT_CLUSTERS_SQL,
        "ohlc_daily": OHLC_DAILY_SQL,
        "contingency_residuals": CONTINGENCY_RESIDUALS_SQL,
        "source_lang_cosine": SOURCE_LANG_COSINE_SQL,
        "mannwhitney_u": MANNWHITNEY_U_SQL,
        "cluster_label_mix": _kmeans_mix_sql(),
        "degree_hist": DEGREE_HIST_SQL,
        "overdispersion": OVERDISPERSION_SQL,
        "hhi_users": HHI_USERS_SQL,
        "quantile_bands_daily": QUANTILE_BANDS_SQL,
        "charclass_stats": CHARCLASS_STATS_SQL,
        "dup_rate_by_source": DUP_RATE_BY_SOURCE_SQL,
        "skyline_daily": SKYLINE_DAILY_SQL,
        "boolean_search": BOOLEAN_SEARCH_SQL,
        "assortativity": ASSORTATIVITY_SQL,
        "type_weighted_jaccard": TYPE_WJACCARD_SQL,
        "adamic_adar": ADAMIC_ADAR_SQL,
        "shipping_priority": SHIPPING_PRIORITY_SQL,
        "regional_volume": REGIONAL_VOLUME_SQL,
        "gini_stump": GINI_STUMP_SQL,
        "kendall_tau": KENDALL_TAU_SQL,
        "mutual_information": MUTUAL_INFORMATION_SQL,
        "kaplan_meier": KAPLAN_MEIER_SQL,
        "feature_hashing": FEATURE_HASHING_SQL,
        "clustering_coef": CLUSTERING_COEF_SQL,
        "anova_events": ANOVA_EVENTS_SQL,
        "ntile_stats": NTILE_STATS_SQL,
        "hits_scores": HITS_SCORES_SQL,
        "pyth_means": PYTH_MEANS_SQL,
        "lexical_richness": LEXICAL_RICHNESS_SQL,
        "grubbs_outliers": GRUBBS_OUTLIERS_SQL,
        "blocklist_rate": BLOCKLIST_RATE_SQL,
        "pca_top_eigen": PCA_TOP_EIGEN_SQL,
        "markov_perplexity": MARKOV_PERPLEXITY_SQL,
        "bfs_levels": BFS_LEVELS_SQL,
        "frequent_triples": FREQUENT_TRIPLES_SQL,
        "hurst_rs": HURST_RS_SQL,
        "welch_ttest": WELCH_TTEST_SQL,
        "cramers_v": CRAMERS_V_SQL,
        "tcloseness_audit": TCLOSENESS_SQL,
        "rolling_median_7d": ROLLING_MEDIAN_SQL,
        "oov_rate": OOV_RATE_SQL,
        "pairwise_scale": PAIRWISE_SCALE_SQL,
        "geometric_median": GEOMEDIAN_SQL,
        "volume_shipping": VOLUME_SHIPPING_SQL,
        "promo_share": PROMO_SHARE_SQL,
        "returns_topk": RETURNS_TOPK_SQL,
        "brand_suppliers": BRAND_SUPPLIERS_SQL,
        "markov_entropy_rate": MARKOV_ENTROPY_SQL,
        "gumbel_maxima": GUMBEL_MAXIMA_SQL,
        "record_days": RECORD_DAYS_SQL,
        "churn_labels": CHURN_LABELS_SQL,
        "inequality_indices": INEQUALITY_SQL,
        "circular_hour_stats": CIRCULAR_HOUR_SQL,
        "behavior_kappa": BEHAVIOR_KAPPA_SQL,
        "streak_stats": STREAK_STATS_SQL,
        "sentence_stats": SENTENCE_STATS_SQL,
        "order_ship_span": ORDER_SHIP_SPAN_SQL,
        "label_separation": LABEL_SEPARATION_SQL,
        "quantile_normalize": QUANTILE_NORMALIZE_SQL,
        "term_burstiness": TERM_BURSTINESS_SQL,
        "char_entropy": CHAR_ENTROPY_SQL,
        "reorder_gaps": REORDER_GAPS_SQL,
        "wilson_ci": WILSON_CI_SQL,
        "effective_dim": EFFECTIVE_DIM_SQL,
        "discount_bands": DISCOUNT_BANDS_SQL,
        "rich_club": RICH_CLUB_SQL,
        "kruskal_wallis": KRUSKAL_WALLIS_SQL,
        "huber_location": HUBER_LOCATION_SQL,
        "jarque_bera": JARQUE_BERA_SQL,
        "mann_kendall": MANN_KENDALL_SQL,
        "readability_ari": READABILITY_ARI_SQL,
        "chao1_richness": CHAO1_RICHNESS_SQL,
        "friedman_test": FRIEDMAN_SQL,
        "brown_forsythe": BROWN_FORSYTHE_SQL,
        "sample_entropy": SAMPLE_ENTROPY_SQL,
        "bollinger_daily": BOLLINGER_SQL,
        "ndcg_eval": NDCG_SQL,
        "adjusted_rand": ADJUSTED_RAND_SQL,
        "haar_energy": HAAR_ENERGY_SQL,
        "roc_auc": ROC_AUC_SQL,
        "naive_bayes": NAIVE_BAYES_SQL,
        "matrix_profile": MATRIX_PROFILE_SQL,
        "label_propagation": LABEL_PROP_SQL,
        "ngram_novelty": NGRAM_NOVELTY_SQL,
        "large_orders": LARGE_ORDERS_SQL,
        "small_qty_revenue": SMALL_QTY_REVENUE_SQL,
        "idle_balance": IDLE_BALANCE_SQL,
        "dfa_fluctuation": DFA_SQL,
        "lis_daily": LIS_SQL,
        "source_gram_overlap": SOURCE_GRAM_OVERLAP_SQL,
        "wasserstein_weekend": WASSERSTEIN_SQL,
        "edge_support_hist": EDGE_SUPPORT_SQL,
        "mrr_eval": MRR_SQL,
        "lc_catalog_features": LC_CATALOG_SQL,
        "avg_precision": AVG_PRECISION_SQL,
        "gap_alarm": GAP_ALARM_SQL,
        "tail_codependence": TAIL_CODEPENDENCE_SQL,
        "otsu_split": _otsu_sql(EVENTS_POINTS_SQL),
        "percentile_ratios": PERCENTILE_RATIOS_SQL.format(
            points=EVENTS_POINTS_SQL),
        "rollup_lineitem_1d": _rollup_sql(LINEITEM_POINTS_SQL, "1d"),
        "pages_rollup_1d": _rollup_sql(PAGES_POINTS_SQL, "1d"),
        "pages_dedup_rollup_1d": _rollup_sql(PAGES_POINTS_SQL, "1d"),
        "hot_keys": HOT_KEYS_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "dedup_filter": DEDUP_FILTER_SQL,
        "quality_filter": QUALITY_FILTER_SQL,
        "dedup_lsh_recall_floor": LSH_RECALL_FLOOR_SQL,
        # same equal-text self-join: Hamming(identical texts) = 0
        "dedup_simhash_recall_floor": LSH_RECALL_FLOOR_SQL,
        "dedup_embedding": DEDUP_EMBEDDING_SQL,
        "embedding_components": EMBEDDING_COMPONENTS_SQL,
        "ann_topk": ANN_TOPK_SQL,
        # exhaustive-probe IVF is exact, so the brute-force oracle applies
        "ann_topk_ivf_full": ANN_TOPK_SQL,
        "text_stats": TEXT_STATS_SQL,
        "gopher_repetition": GOPHER_REPETITION_SQL,
        "pivot_events": PIVOT_EVENTS_SQL,
        "unpivot_events": UNPIVOT_EVENTS_SQL,
        "series_grid_stats": _series_grid_sql(EVENTS_POINTS_SQL,
                                              ("1h", "1d", "30d")),
        # every compared value decoded back OUT of the Gorilla blobs
        "series_gorilla": _series_gorilla_sql(EVENTS_POINTS_SQL),
        # minhash/simhash/ngram-jaccard/approx-lsh-ivf/multimodal/lang_id:
        # not SQL-expressible -> rows-only driver check + unit-test oracles
    }
    return {name: _tie_robust_sql(sql) for name, sql in base.items()}
