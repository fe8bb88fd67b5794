"""Connected components (stages/components) vs an in-process union-find
oracle: random graphs, chains (multi-round convergence), forests,
duplicate/self-loop edges, isolated-node attachment."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min id reachable
    comp = {}
    for i in n_ids:
        r = find(i)
        comp.setdefault(r, []).append(i)
    out = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            out[i] = m
    return out


def _run_cc(edges):
    import ray.data as rd

    from light_curve_ray.stages.components import connected_components

    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(4)
    out = connected_components(ds).to_pandas()
    return dict(zip(out["node"], out["component"]))


def _check(edges):
    nodes = sorted({x for e in edges for x in e})
    expect = _union_find(nodes, edges)
    got = _run_cc(edges)
    assert got == expect


def test_chain_multihop(ray_session):
    # one 200-hop chain: forces several large/small-star rounds
    _check([(i, i + 1) for i in range(200)])


def test_two_chains_and_bridge(ray_session):
    edges = [(i, i + 1) for i in range(0, 50)]
    edges += [(i, i + 1) for i in range(100, 150)]
    edges += [(30, 130)]  # bridge merges the two chains
    _check(edges)


def test_random_graphs(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(20, 200))
        m = int(rng.integers(n // 2, 2 * n))
        ids = rng.choice(10_000, size=n, replace=False)
        edges = [(int(ids[rng.integers(n)]), int(ids[rng.integers(n)]))
                 for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        _check(edges)


def test_duplicate_and_reversed_edges(ray_session):
    _check([(1, 2), (2, 1), (1, 2), (5, 4), (4, 5), (2, 3)])


def test_self_loops_dropped(ray_session):
    _check([(1, 1), (1, 2), (3, 3), (3, 4)])


def test_attach_isolated_nodes(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.components import (
        attach_components,
        connected_components,
    )

    edges = rd.from_arrow(pa.table({"a": pa.array([10, 11], pa.int64()),
                                    "b": pa.array([11, 12], pa.int64())}))
    comps = connected_components(edges)
    nodes = rd.from_arrow(pa.table(
        {"doc": pa.array([10, 11, 12, 99, 7], pa.int64())}))
    out = attach_components(nodes, "doc", comps).to_pandas()
    got = dict(zip(out["doc"], out["component"]))
    assert got == {10: 10, 11: 10, 12: 10, 99: 99, 7: 7}
    assert len(out) == 5


def test_empty_edges(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.components import connected_components

    ds = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())}))
    assert connected_components(ds).count() == 0


def test_cc_events_query_vs_duckdb(ray_session):
    import duckdb

    from light_curve_ray.pipelines.queries import CC_EVENTS_SQL, q_cc_events

    sf = "/root/testdata/sf0.001"
    got = q_cc_events(sf).to_pandas().sort_values("event_id").reset_index(
        drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = con.execute(CC_EVENTS_SQL).df().sort_values("event_id") \
        .reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
    assert (got["component"].to_numpy() == exp["component"].to_numpy()).all()


def test_distributed_sort_path_parity(ray_session):
    """driver_limit_rows=0 forces the distributed sort in every round;
    result must equal the adaptive in-process path bit-for-bit."""
    import ray.data as rd

    from light_curve_ray.stages.components import connected_components

    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 300, (400, 2))
             if a != b]
    tbl = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                    "b": pa.array([e[1] for e in edges], pa.int64())})
    fast = connected_components(rd.from_arrow(tbl).repartition(4))
    dist = connected_components(rd.from_arrow(tbl).repartition(4),
                                driver_limit_rows=0)
    f = fast.to_pandas().sort_values("node").reset_index(drop=True)
    d = dist.to_pandas().sort_values("node").reset_index(drop=True)
    assert (f["node"].to_numpy() == d["node"].to_numpy()).all()
    assert (f["component"].to_numpy() == d["component"].to_numpy()).all()


def test_attach_components_exact_above_2_53(ray_session):
    """Component ids above 2^53 must survive exactly (a float64 null
    round-trip silently rounds them — regression from self-review)."""
    import ray.data as rd

    from light_curve_ray.stages.components import attach_components

    big = 4611686018427387905  # 2^62 + 1: not float64-representable
    comps = rd.from_arrow(pa.table(
        {"node": pa.array([big + 2], pa.int64()),
         "component": pa.array([big], pa.int64())}))
    nodes = rd.from_arrow(pa.table(
        {"doc": pa.array([big + 2, big + 9], pa.int64())}))
    out = attach_components(nodes, "doc", comps).to_pandas()
    got = dict(zip(out["doc"], out["component"]))
    assert got == {big + 2: big, big + 9: big + 9}
