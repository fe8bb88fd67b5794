"""Sketch family tests: exact clz64, HLL error bound + merge-order
invariance, quantile summary exactness (== numpy linear == SQL
quantile_cont) when uncompressed and bounded rank error when compressed,
and the distributed stages vs brute force on multi-block random input."""

import numpy as np
import pyarrow as pa
import pytest

from light_curve_ray.kernels.sketch import (clz64, hll_add_hashes,
                                            hll_estimate, hll_init,
                                            hll_merge, qsummary_from_values,
                                            qsummary_merge,
                                            qsummary_quantile)


def test_clz64_exact_incl_float_rounding_traps():
    xs = np.array([0, 1, 2, (1 << 53) - 1, 1 << 53, (1 << 54) - 1,
                   1 << 63, (1 << 64) - 1, (1 << 60) - 1], dtype=np.uint64)
    want = [64 if x == 0 else 64 - int(x).bit_length() for x in xs.tolist()]
    assert clz64(xs).tolist() == want
    rng = np.random.RandomState(3)
    r = rng.randint(0, 1 << 62, 5000).astype(np.uint64)
    assert clz64(r).tolist() == [
        64 - int(x).bit_length() if x else 64 for x in r.tolist()]


def test_hll_error_bound_and_merge_invariance():
    from light_curve_ray.kernels.hashing import hash_columns_u64

    for n_true in (100, 5000, 300_000):
        tbl = pa.table({"x": pa.array(np.arange(n_true, dtype=np.int64))})
        h = hash_columns_u64(tbl, ["x"])
        regs = hll_init(12)
        hll_add_hashes(regs, h, 12)
        est = hll_estimate(regs)
        assert abs(est - n_true) / n_true < 0.06  # ~4 sigma at p=12
        # merge of arbitrary splits == whole
        parts = np.array_split(h, 7)
        merged = hll_init(12)
        for part in parts:
            r = hll_init(12)
            hll_add_hashes(r, part, 12)
            merged = hll_merge(merged, r)
        assert np.array_equal(merged, regs)


def test_qsummary_uncompressed_matches_numpy_linear():
    rng = np.random.RandomState(5)
    v = rng.normal(0, 1, 4000)
    qs = np.array([0.0, 0.01, 0.25, 0.5, 0.9, 0.999, 1.0])
    sv, sw = qsummary_from_values(v, 1 << 16)
    assert (qsummary_quantile(sv, sw, qs)
            == np.quantile(v, qs, method="linear")).all()
    # merged from ragged blocks, still uncompressed -> still exact
    a = qsummary_from_values(v[:1234], 1 << 16)
    b = qsummary_from_values(v[1234:], 1 << 16)
    mv, mw = qsummary_merge(*a, *b, 1 << 16)
    assert (qsummary_quantile(mv, mw, qs)
            == np.quantile(v, qs, method="linear")).all()


def test_qsummary_compressed_rank_error_bounded():
    rng = np.random.RandomState(9)
    big = np.concatenate([rng.normal(0, 1, 100_000),
                          rng.exponential(3, 50_000)])
    cap = 512
    parts = np.array_split(big, 13)
    sv, sw = qsummary_from_values(parts[0], cap)
    for part in parts[1:]:
        sv, sw = qsummary_merge(sv, sw, *qsummary_from_values(part, cap),
                                cap)
    assert sv.size <= cap
    assert sw.sum() == big.size  # total weight preserved
    qs = np.array([0.1, 0.25, 0.5, 0.75, 0.9])
    for q, approx in zip(qs, qsummary_quantile(sv, sw, qs)):
        rank = (big <= approx).mean()
        assert abs(rank - q) < 0.02, (q, rank)
    # extremes are kept exactly through every compression
    assert qsummary_quantile(sv, sw, np.array([0.0]))[0] == big.min()
    assert qsummary_quantile(sv, sw, np.array([1.0]))[0] == big.max()


@pytest.fixture(scope="module")
def keyed_input(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(17)
    n = 30_000
    tbl = pa.table({
        "k": pa.array([f"g{rng.randint(0, 7)}" for _ in range(n)]),
        "u": pa.array(rng.randint(0, 900, n).astype(np.int64)),
        "v": pa.array(rng.normal(50, 20, n)),
    })
    return tbl, rd.from_arrow(tbl).repartition(11)


def _collect_tbl(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def test_distinct_count_exact_distributed(keyed_input):
    from light_curve_ray.stages.sketch import distinct_count_exact

    tbl, ds = keyed_input
    out = _collect_tbl(distinct_count_exact(ds, ["k"], ["u"]))
    got = dict(zip(out["k"].to_pylist(), out["n_distinct"].to_pylist()))
    import collections
    want = collections.defaultdict(set)
    for k, u in zip(tbl["k"].to_pylist(), tbl["u"].to_pylist()):
        want[k].add(u)
    assert got == {k: len(s) for k, s in want.items()}


def test_hll_distinct_distributed_within_bound(keyed_input):
    from light_curve_ray.stages.sketch import hll_distinct

    tbl, ds = keyed_input
    out = _collect_tbl(hll_distinct(ds, ["k"], ["u"], p=12))
    import collections
    want = collections.defaultdict(set)
    for k, u in zip(tbl["k"].to_pylist(), tbl["u"].to_pylist()):
        want[k].add(u)
    for k, est in zip(out["k"].to_pylist(),
                      out["n_distinct_hll"].to_pylist()):
        true = len(want[k])
        assert abs(est - true) / true < 0.06, (k, est, true)
    # determinism: a second run with different partitioning -> same bytes
    out2 = _collect_tbl(hll_distinct(
        ds.repartition(3), ["k"], ["u"], p=12))
    a = dict(zip(out["k"].to_pylist(), out["n_distinct_hll"].to_pylist()))
    b = dict(zip(out2["k"].to_pylist(), out2["n_distinct_hll"].to_pylist()))
    assert a == b


def test_quantile_by_key_distributed_exact(keyed_input):
    from light_curve_ray.stages.sketch import quantile_by_key

    tbl, ds = keyed_input
    qs = [0.25, 0.5, 0.9]
    out = _collect_tbl(quantile_by_key(
        ds, ["k"], "v", qs=qs, names=["q25", "q50", "q90"],
        capacity=1 << 16))
    import collections
    vals = collections.defaultdict(list)
    for k, v in zip(tbl["k"].to_pylist(), tbl["v"].to_pylist()):
        vals[k].append(v)
    for i, k in enumerate(out["k"].to_pylist()):
        want = np.quantile(np.array(vals[k]), qs, method="linear")
        got = [out["q25"][i].as_py(), out["q50"][i].as_py(),
               out["q90"][i].as_py()]
        assert np.array_equal(got, want), (k, got, want)


def test_quantile_by_key_compressed_path(keyed_input):
    """capacity far below group size -> compression engages, rank error
    stays bounded."""
    from light_curve_ray.stages.sketch import quantile_by_key

    tbl, ds = keyed_input
    out = _collect_tbl(quantile_by_key(
        ds, ["k"], "v", qs=[0.5], names=["q50"], capacity=256))
    import collections
    vals = collections.defaultdict(list)
    for k, v in zip(tbl["k"].to_pylist(), tbl["v"].to_pylist()):
        vals[k].append(v)
    for k, got in zip(out["k"].to_pylist(), out["q50"].to_pylist()):
        arr = np.array(vals[k])
        rank = (arr <= got).mean()
        assert abs(rank - 0.5) < 0.05, (k, rank)


def test_cms_overestimate_and_exact_at_width(ray_session):
    import numpy as np
    import pyarrow as pa

    from light_curve_ray.kernels.hashing import hash_columns_u64
    from light_curve_ray.kernels.sketch import cms_add, cms_init, cms_query

    rng = np.random.default_rng(5)
    # Zipf-ish: value i appears ~ 1000/i times
    vals = np.concatenate([np.full(1000 // (i + 1), i)
                           for i in range(60)])
    rng.shuffle(vals)
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    h = hash_columns_u64(tbl, ["v"])
    c = cms_init(4, 4096)
    cms_add(c, h)
    uniq = pa.table({"v": pa.array(np.arange(60), pa.int64())})
    est = cms_query(c, hash_columns_u64(uniq, ["v"]))
    exact = np.array([(vals == i).sum() for i in range(60)])
    assert (est >= exact).all()
    # 60 keys in 4x4096 cells: collisions essentially impossible
    assert (est == exact).all()


def test_heavy_hitters_topk_and_partition_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.sketch import heavy_hitters_cms

    rng = np.random.default_rng(9)
    vals = np.concatenate([np.full(2000 // (i + 1), 100 + i)
                           for i in range(50)])
    rng.shuffle(vals)
    tbl = pa.table({"user": pa.array(vals, pa.int64())})

    out4 = heavy_hitters_cms(rd.from_arrow(tbl).repartition(4),
                             ["user"], k=5).to_pandas()
    out1 = heavy_hitters_cms(rd.from_arrow(tbl).repartition(1),
                             ["user"], k=5).to_pandas()
    # exact top-5 (ample width -> exact estimates)
    exact = sorted(((int((vals == v).sum()), int(v))
                    for v in np.unique(vals)),
                   key=lambda t: (-t[0], t[1]))[:5]
    assert list(out4["user"]) == [v for _, v in exact]
    assert list(out4["est_count"]) == [n for n, _ in exact]
    # linear sketch: identical at any partitioning
    assert out4.equals(out1)


def test_kmv_estimate_and_intersection_bounds():
    """KMV distinct + intersection estimates within the (k-1)^-1/2
    relative-error regime; merge partition-order invariance; exactness
    below k."""
    import pyarrow as pa

    from light_curve_ray.kernels.hashing import _hash_columns_u64_numpy
    from light_curve_ray.kernels.sketch import (
        kmv_add,
        kmv_estimate,
        kmv_intersection,
    )

    def hashes(ids):
        return _hash_columns_u64_numpy(
            pa.table({"x": pa.array(ids, pa.int64())}), ["x"])

    k = 1024
    A = np.arange(0, 60_000)
    B = np.arange(40_000, 110_000)  # |A ∩ B| = 20_000, |A ∪ B| = 110_000
    sa = kmv_add(np.empty(0, np.uint64), hashes(A), k)
    sb = kmv_add(np.empty(0, np.uint64), hashes(B), k)
    assert abs(kmv_estimate(sa, k) - 60_000) < 0.15 * 60_000
    assert abs(kmv_estimate(sb, k) - 70_000) < 0.15 * 70_000
    assert abs(kmv_intersection(sa, sb, k) - 20_000) < 0.2 * 20_000

    # merge = k smallest of the union, independent of partitioning
    s2 = np.empty(0, np.uint64)
    for part in np.array_split(A, 7):
        s2 = kmv_add(s2, hashes(part), k)
    assert np.array_equal(sa, s2)
    s3 = np.empty(0, np.uint64)
    for part in np.array_split(A[::-1].copy(), 3):
        s3 = kmv_add(s3, hashes(part), k)
    assert np.array_equal(sa, s3)

    # below k the sketch IS the distinct set: exact
    small = np.arange(500)
    ss = kmv_add(np.empty(0, np.uint64), hashes(small), k)
    assert kmv_estimate(ss, k) == 500.0
    st = kmv_add(np.empty(0, np.uint64), hashes(small[:300]), k)
    assert round(kmv_intersection(ss, st, k)) == 300


def test_misra_gries_guarantees():
    import numpy as np

    from light_curve_ray.kernels.sketch import mg_from_counts, mg_merge

    rng = np.random.RandomState(0)
    keys = rng.zipf(1.5, 20000) % 500
    uk, c = np.unique(keys, return_counts=True)
    n = int(c.sum())
    k = 20
    mk, mc = mg_from_counts(uk, c, k)
    true = dict(zip(uk.tolist(), c.tolist()))
    assert len(mk) <= k
    for kk, cc in zip(mk, mc):
        # underestimate only, error bounded by n/(k+1)
        assert cc <= true[kk]
        assert true[kk] - cc <= n // (k + 1) + 1
    # every item with frequency > n/(k+1) must survive the cut
    thresh = n / (k + 1)
    heavy = {int(u) for u, cnt in zip(uk, c) if cnt > thresh}
    assert heavy <= set(mk.tolist())


def test_misra_gries_merge_bound_and_exactness():
    import numpy as np

    from light_curve_ray.kernels.sketch import mg_from_counts, mg_merge

    rng = np.random.RandomState(1)
    keys = rng.zipf(1.3, 30000) % 300
    uk, c = np.unique(keys, return_counts=True)
    true = dict(zip(uk.tolist(), c.tolist()))
    half = len(uk) // 2
    a = mg_from_counts(uk[:half], c[:half], 16)
    b = mg_from_counts(uk[half:], c[half:], 16)
    mk, mc = mg_merge(*a, *b, 16)
    assert len(mk) <= 16
    for kk, cc in zip(mk, mc):
        assert cc <= true[kk]
    # fewer distinct keys than counters -> MG is EXACT
    ek, ec = mg_from_counts(np.array([5, 2, 9]), np.array([7, 3, 11]), 16)
    assert ek.tolist() == [2, 5, 9] and ec.tolist() == [3, 7, 11]
