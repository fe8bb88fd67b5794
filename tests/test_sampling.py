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
