"""range_join tests: vectorized interval fan-out vs a brute-force
nested-loop reference — multi-key, boundary inclusivity (ts == start in,
ts == end out for closed='left'), empty-interval keys, point covered by
several overlapping intervals, and closed='both' semantics."""

import numpy as np
import pyarrow as pa


def _brute(pts, ivs, closed):
    out = set()
    for pi, (k, t) in enumerate(zip(pts["k"], pts["t_us"])):
        for ii, (ik, s, e) in enumerate(
                zip(ivs["k"], ivs["start_us"], ivs["end_us"])):
            hit = (ik == k and t >= s
                   and (t < e if closed == "left" else t <= e))
            if hit:
                out.add((k, t, round(pts["v"][pi], 9), s, e,
                         round(ivs["x"][ii], 9)))
    return out


def _run(ray_session, closed):
    import ray.data as rd

    from light_curve_ray.stages.rangejoin import range_join

    rng = np.random.RandomState(7)
    n_p, n_i = 500, 90
    pts = {
        "k": [f"s{rng.randint(0, 6)}" for _ in range(n_p)],
        "t_us": rng.randint(0, 5_000, n_p).astype(np.int64).tolist(),
        "v": rng.normal(0, 1, n_p).tolist(),
    }
    starts = rng.randint(0, 5_000, n_i).astype(np.int64)
    ivs = {
        "k": [f"s{rng.randint(0, 5)}" for _ in range(n_i)],  # s5: none
        "start_us": starts.tolist(),
        "end_us": (starts + rng.randint(1, 800, n_i)).tolist(),
        "x": rng.normal(5, 1, n_i).tolist(),
    }
    # force exact-boundary hits both ways: a point AT an interval start
    # (always in) and a point AT an interval end (in only for 'both')
    ivs["k"] += [pts["k"][0], pts["k"][1]]
    ivs["start_us"] += [pts["t_us"][0], pts["t_us"][1] - 10]
    ivs["end_us"] += [pts["t_us"][0] + 50, pts["t_us"][1]]
    ivs["x"] += [100.0, 101.0]

    left = rd.from_arrow(pa.table(
        {k: pa.array(v) for k, v in pts.items()})).repartition(7)
    right = rd.from_arrow(pa.table(
        {k: pa.array(v) for k, v in ivs.items()})).repartition(3)
    out = range_join(left, right, ["k"], "t_us", "start_us", "end_us",
                     point_cols=["v"], interval_cols=["x"], closed=closed)
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
        or [pa.table({})])
    got = set(zip(tbl["k"].to_pylist(), tbl["t_us"].to_pylist(),
                  [round(v, 9) for v in tbl["v"].to_pylist()],
                  tbl["start_us"].to_pylist(), tbl["end_us"].to_pylist(),
                  [round(x, 9) for x in tbl["x"].to_pylist()]))
    want = _brute(pts, ivs, closed)
    assert got == want
    assert len(tbl) == len(want)  # no duplicate pair emission
    return tbl


def test_range_join_matches_bruteforce_halfopen(ray_session):
    tbl = _run(ray_session, "left")
    # the planted at-start point must appear, paired with x=100.0
    assert 100.0 in tbl["x"].to_pylist()
    # the planted at-end point must NOT pair with x=101.0 (half-open)
    assert 101.0 not in tbl["x"].to_pylist()


def test_range_join_matches_bruteforce_closed_both(ray_session):
    tbl = _run(ray_session, "both")
    assert 101.0 in tbl["x"].to_pylist()


def test_range_join_distributed_path_equal(ray_session):
    """Force the distributed-sort path (driver_limit_rows=0 gate is inside
    sorted_group_map; here just assert schema + duplicate-key points both
    emit) on a tiny overlapping fixture."""
    import ray.data as rd

    from light_curve_ray.stages.rangejoin import range_join

    pts = pa.table({"k": ["a", "a", "a"],
                    "t_us": pa.array([5, 5, 20], pa.int64()),
                    "v": [1.0, 2.0, 3.0]})
    ivs = pa.table({"k": ["a", "a"],
                    "start_us": pa.array([0, 4], pa.int64()),
                    "end_us": pa.array([10, 30], pa.int64()),
                    "x": [7.0, 8.0]})
    out = range_join(rd.from_arrow(pts), rd.from_arrow(ivs),
                     ["k"], "t_us", "start_us", "end_us",
                     point_cols=["v"], interval_cols=["x"])
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    # both duplicate-ts points match both intervals; t=20 matches only the
    # second -> 2*2 + 1 = 5 pairs
    assert len(tbl) == 5
    assert tbl.schema.names == ["k", "t_us", "v", "start_us", "end_us", "x"]
