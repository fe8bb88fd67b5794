"""Join/top-k/session stage tests: broadcast lookup vs partitioned
Dataset.join parity, grouped top-k vs brute force (ties + short groups),
sessionize vs brute force (duplicate timestamps, exact-gap boundary)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_attach_broadcast_matches_dataset_join(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.joins import attach_broadcast

    rng = np.random.RandomState(21)
    facts = pa.table({
        "k": pa.array(rng.randint(0, 40, 500).astype(np.int64)),
        "x": pa.array(rng.normal(0, 1, 500)),
    })
    dim = pa.table({
        "k": pa.array(np.arange(0, 35, dtype=np.int64)),  # 35..39 unmatched
        "label": pa.array([f"L{i}" for i in range(35)]),
    })
    got = attach_broadcast(rd.from_arrow(facts).repartition(5), dim,
                           "k", ["label"])
    got_tbl = pa.concat_tables(
        list(got.iter_batches(batch_format="pyarrow")))
    joined = rd.from_arrow(facts).join(
        rd.from_arrow(dim), "inner", 4, on=("k",))
    want_tbl = pa.concat_tables(
        list(joined.iter_batches(batch_format="pyarrow")))
    ga = sorted(zip(got_tbl["k"].to_pylist(),
                    [round(v, 12) for v in got_tbl["x"].to_pylist()],
                    got_tbl["label"].to_pylist()))
    wa = sorted(zip(want_tbl["k"].to_pylist(),
                    [round(v, 12) for v in want_tbl["x"].to_pylist()],
                    want_tbl["label"].to_pylist()))
    assert ga == wa and len(ga) > 0
    # left join: unmatched keys survive with NULL label
    left = attach_broadcast(rd.from_arrow(facts), dim, "k", ["label"],
                            how="left")
    lt = pa.concat_tables(list(left.iter_batches(batch_format="pyarrow")))
    assert len(lt) == len(facts)
    n_unmatched = int((facts["k"].to_numpy() >= 35).sum())
    assert lt["label"].null_count == n_unmatched


def test_attach_broadcast_rejects_duplicate_dim_keys(ray_session):
    import pytest
    import ray.data as rd

    from light_curve_ray.stages.joins import attach_broadcast

    facts = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    dim = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "v": pa.array([1.0, 2.0])})
    with pytest.raises(ValueError, match="duplicate"):
        attach_broadcast(facts, dim, "k", ["v"])


def test_top_k_by_key_matches_bruteforce(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.topk import top_k_by_key

    rng = np.random.RandomState(8)
    n = 400
    # coarse values force ties; id is the unique tie-break
    tbl = pa.table({
        "g": pa.array([f"g{rng.randint(0, 6)}" for _ in range(n)]),
        "v": pa.array(rng.randint(0, 12, n).astype(np.float64)),
        "id": pa.array(np.random.RandomState(9).permutation(n)
                       .astype(np.int64)),
    })
    out = top_k_by_key(rd.from_arrow(tbl).repartition(7), ["g"], "v",
                       k=5, tiebreak_col="id")
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    import collections
    rows = collections.defaultdict(list)
    for g, v, i in zip(tbl["g"].to_pylist(), tbl["v"].to_pylist(),
                       tbl["id"].to_pylist()):
        rows[g].append((-v, i))
    want = {}
    for g, lst in rows.items():
        for rn, (_, i) in enumerate(sorted(lst)[:5], 1):
            want[(g, i)] = rn
    got_map = {(g, i): rn for g, i, rn in zip(
        got["g"].to_pylist(), got["id"].to_pylist(),
        got["rn"].to_pylist())}
    assert got_map == want
    # a group smaller than k returns all its rows
    small = pa.table({"g": ["solo"], "v": [1.0],
                      "id": pa.array([7], pa.int64())})
    out2 = top_k_by_key(rd.from_arrow(small), ["g"], "v", k=5,
                        tiebreak_col="id")
    t2 = pa.concat_tables(list(out2.iter_batches(batch_format="pyarrow")))
    assert len(t2) == 1 and t2["rn"][0].as_py() == 1


def test_sessionize_matches_bruteforce(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.session import sessionize

    rng = np.random.RandomState(4)
    rows = []
    for u in range(8):
        t = 0
        for _ in range(rng.randint(5, 60)):
            t += int(rng.choice([10, 50, 150, 999, 1000, 1001, 5000]))
            rows.append((u, t))
            if rng.rand() < 0.2:
                rows.append((u, t))  # duplicate timestamp
    tbl = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "t": pa.array([r[1] for r in rows], pa.int64()),
    })
    gap = 1000  # exact-gap boundary: diff == 1000 must NOT break
    out = sessionize(rd.from_arrow(tbl).repartition(6), ["u"], "t",
                     gap_us=gap)
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    import collections
    per_user = collections.defaultdict(list)
    for u, t in rows:
        per_user[u].append(t)
    want = {}
    for u, ts in per_user.items():
        ts.sort()
        sid = 0
        prev = None
        for t in ts:
            if prev is None or t - prev > gap:
                sid += 1
                want[(u, sid)] = [t, t, 0]
            want[(u, sid)][1] = t
            want[(u, sid)][2] += 1
            prev = t
    got_map = {}
    for i in range(len(got)):
        key = (got["u"][i].as_py(), got["session_id"][i].as_py())
        got_map[key] = [got["t_start_us"][i].as_py(),
                        got["t_end_us"][i].as_py(),
                        got["n_events"][i].as_py()]
    assert got_map == want


def test_anti_join_broadcast(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.joins import anti_join_broadcast

    ds = rd.from_arrow(pa.table({"k": pa.array(range(100), pa.int64()),
                                 "v": pa.array(range(100), pa.int64())}))
    block = rd.from_arrow(pa.table(
        {"k": pa.array([3, 3, 7, 999], pa.int64())}))  # dup + absent key
    out = anti_join_broadcast(ds, "k", block).to_pandas()
    assert len(out) == 98
    assert 3 not in set(out["k"]) and 7 not in set(out["k"])
    # numpy-sequence blocklist, and an empty blocklist
    out2 = anti_join_broadcast(ds, "k", np.array([0, 99])).to_pandas()
    assert len(out2) == 98 and 0 not in set(out2["k"])
    out3 = anti_join_broadcast(ds, "k", np.array([], dtype=np.int64))
    assert out3.count() == 100


def test_semi_join_broadcast(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.joins import semi_join_broadcast

    ds = rd.from_arrow(pa.table({"k": pa.array(range(50), pa.int64()),
                                 "v": pa.array(range(50), pa.int64())}))
    keep = rd.from_arrow(pa.table(
        {"k": pa.array([1, 1, 7, 999], pa.int64())}))
    out = semi_join_broadcast(ds, "k", keep).to_pandas()
    assert sorted(out["k"]) == [1, 7]
    empty = semi_join_broadcast(ds, "k", np.array([], dtype=np.int64))
    assert empty.count() == 0


def test_attach_broadcast_multi_duplicates(ray_session):
    import ray
    import ray.data as rd

    from light_curve_ray.stages.joins import attach_broadcast_multi

    fact = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 2], pa.int64()),
        "x": pa.array([10.0, 20.0, 30.0, 40.0]),
    })).repartition(2)
    lookup = pa.table({
        "k": pa.array([2, 2, 1, 9], pa.int64()),
        "tag": pa.array(["a", "b", "c", "z"]),
    })
    out = attach_broadcast_multi(fact, lookup, "k", ["tag"])
    rows = sorted(
        (r["k"], r["x"], r["tag"])
        for t in ray.get(out.materialize().to_arrow_refs())
        for r in t.to_pylist())
    # k=3 unmatched -> dropped; k=2 rows multiply by the two matches
    assert rows == [(1, 10.0, "c"), (2, 20.0, "a"), (2, 20.0, "b"),
                    (2, 40.0, "a"), (2, 40.0, "b")]


def test_join_skew_safe_matches_plain_join_under_forced_skew(ray_session):
    import ray
    import ray.data as rd

    from light_curve_ray.stages.joins import (
        join_skew_safe,
        semi_join_broadcast,
    )

    rng = np.random.default_rng(21)
    # one viral key = half of all fact rows, tail uniform
    keys = np.concatenate([np.full(5000, 7), rng.integers(100, 2000, 5000)])
    fact = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "x": pa.array(rng.standard_normal(len(keys))),
    })).repartition(8)
    ok = np.unique(np.concatenate([[7], rng.integers(100, 2000, 800)]))
    other = rd.from_arrow(pa.table({
        "k": pa.array(ok, pa.int64()),
        "tag": pa.array([f"t{v}" for v in ok]),
    })).repartition(3)

    got_ds = join_skew_safe(fact, "k", other, ["tag"], hot_k=8)
    got = pa.concat_tables(
        [t for t in ray.get(got_ds.materialize().to_arrow_refs())
         if len(t)])
    want_ds = fact.join(other, "inner", 8, on=("k",))
    want = pa.concat_tables(
        [t for t in ray.get(want_ds.materialize().to_arrow_refs())
         if len(t)])

    def canon(t):
        df = t.select(["k", "x", "tag"]).to_pandas()
        return df.sort_values(["k", "x", "tag"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(want))
    # the hot path genuinely carried rows: the viral key is in the output
    assert (canon(got)["k"] == 7).sum() == 5000
