"""Deterministic hash sampling / splitting (stages/sampling)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from light_curve_ray.stages.sampling import hash_bucket


def test_bucket_range_and_determinism():
    ids = np.arange(100_000, dtype=np.int64)
    b1 = hash_bucket(ids, salt=0)
    b2 = hash_bucket(ids, salt=0)
    assert (b1 == b2).all()
    assert b1.min() >= 0 and b1.max() <= 99
    # roughly uniform: every bucket within 3x of the mean
    counts = np.bincount(b1, minlength=100)
    assert counts.min() > 1000 // 3 * 2 and counts.max() < 3000


def test_salts_independent():
    ids = np.arange(50_000, dtype=np.int64)
    a = hash_bucket(ids, salt=0) < 50
    b = hash_bucket(ids, salt=1) < 50
    # joint fraction near product of marginals (independence)
    joint = float((a & b).mean())
    assert abs(joint - float(a.mean()) * float(b.mean())) < 0.02


def test_uint64_wrap_matches_hugeint():
    """Huge ids overflow int64 in the product — numpy's uint64 wrap must
    equal exact mod-2^32 arithmetic (the SQL HUGEINT mirror)."""
    ids = np.array([2**40 + 7, 2**62 - 1, 0, 12345678901], dtype=np.int64)
    for salt in (0, 1, 7):
        got = hash_bucket(ids, salt=salt)
        s = (salt * 2654435769) % 4294967296
        for i, v in enumerate(ids.tolist()):
            r1 = (v * 2654435761) % 4294967296
            exact = (((r1 ^ s) * 2654435761) % 4294967296) % 100
            assert got[i] == exact


def test_sql_mirror_matches_duckdb():
    import duckdb

    from light_curve_ray.stages.sampling import hash_bucket_sql

    ids = np.concatenate([np.arange(2000, dtype=np.int64),
                          np.array([2**40 + 7, 2**62 - 1, 12345678901],
                                   dtype=np.int64)])
    con = duckdb.connect()
    con.register("t", pa.table({"id": pa.array(ids, pa.int64())}))
    for salt in (0, 1, 5):
        sql = con.execute(
            f"SELECT {hash_bucket_sql('id', salt)} FROM t"
        ).fetchnumpy()
        got = hash_bucket(ids, salt)
        assert (np.asarray(list(sql.values())[0], dtype=np.int64)
                == got).all()


def test_split_partition_and_sample_subset(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.sampling import attach_split, hash_sample

    tbl = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
    ds = rd.from_arrow(tbl).repartition(8)
    sp = attach_split(ds, "doc_id", train_pct=80).to_pandas()
    assert len(sp) == 5000
    frac = (sp["split"] == "train").mean()
    assert 0.75 < frac < 0.85
    # partitioning-invariant: same assignment at a different layout
    sp2 = attach_split(rd.from_arrow(tbl).repartition(2),
                       "doc_id").to_pandas()
    m1 = dict(zip(sp["doc_id"], sp["split"]))
    m2 = dict(zip(sp2["doc_id"], sp2["split"]))
    assert m1 == m2

    sub = hash_sample(ds, "doc_id", 10).to_pandas()
    assert 0.05 < len(sub) / 5000 < 0.15
    # subsample of a subsample at a higher pct is a superset
    sub30 = set(hash_sample(ds, "doc_id", 30).to_pandas()["doc_id"])
    assert set(sub["doc_id"]) <= sub30


def test_fine_bucket_sql_mirror_matches_duckdb():
    import duckdb

    from light_curve_ray.stages.sampling import (
        hash_bucket_fine,
        hash_bucket_fine_sql,
    )

    ids = np.concatenate([np.arange(3000, dtype=np.int64),
                          np.array([2**40 + 7, 2**62 - 1, 12345678901],
                                   dtype=np.int64)])
    con = duckdb.connect()
    con.register("t", pa.table({"id": pa.array(ids, pa.int64())}))
    for salt in (0, 2, 9):
        sql = con.execute(
            f"SELECT {hash_bucket_fine_sql('id', salt)} FROM t"
        ).fetchnumpy()
        got = hash_bucket_fine(ids, salt)
        assert got.min() >= 0 and got.max() < 1_000_000
        assert (np.asarray(list(sql.values())[0], dtype=np.int64)
                == got).all()


def test_mixture_sample_rates_and_partition_invariance(ray_session):
    """Head group downsampled toward scale*sqrt(n), tail kept whole;
    the kept SET is identical at different block partitionings."""
    import ray
    import ray.data as rd

    from light_curve_ray.stages.sampling import mixture_sample

    rng = np.random.default_rng(5)
    groups = np.array(["head"] * 40000 + ["tail"] * 50)
    ids = rng.permutation(len(groups)).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "grp": pa.array(groups)})

    def kept_ids(n_blocks):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        out = mixture_sample(ds, "doc_id", "grp", scale=8.0, salt=2)
        ts = [t for t in ray.get(out.materialize().to_arrow_refs())
              if len(t)]
        res = pa.concat_tables(ts)
        return (np.sort(res["doc_id"].to_numpy(zero_copy_only=False)),
                res)

    k4, res = kept_ids(4)
    k13, _ = kept_ids(13)
    assert np.array_equal(k4, k13)
    g = res["grp"].to_numpy(zero_copy_only=False)
    n_head = int((g == "head").sum())
    n_tail = int((g == "tail").sum())
    # head rate = 8/sqrt(40000) = 4% (binomial-ish tolerance); tail all kept
    assert abs(n_head - 1600) < 250
    assert n_tail == 50
