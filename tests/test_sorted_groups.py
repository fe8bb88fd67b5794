"""sorted_group_map unit tests: exactness under block-boundary-straddling
groups (the core invariant the gap-fill/Gorilla/LSH stages rely on)."""

import numpy as np
import pyarrow as pa


def test_sorted_group_map_exact_over_many_blocks(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.sorted_groups import sorted_group_map

    rng = np.random.RandomState(21)
    n = 20_000
    keys = rng.randint(0, 300, n)  # ~67 rows/key -> every key straddles
    vals = rng.standard_normal(n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.float64()),
    })).repartition(16)

    out_schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                            ("s", pa.float64())])

    def per_group(g: pa.Table) -> pa.Table:
        v = g["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([g["k"][0].as_py()], pa.int64()),
            "n": pa.array([len(g)], pa.int64()),
            "s": pa.array([float(v.sum())], pa.float64()),
        })

    import pandas as pd

    exp = (pd.DataFrame({"k": keys, "v": vals})
           .groupby("k").agg(n=("v", "size"), s=("v", "sum"))
           .reset_index())
    # both paths — in-process (default gate admits 20k rows) and forced
    # distributed — must be exact; every group exactly once, full count/sum
    for limit in (2_000_000, 0):
        got = sorted_group_map(ds, ["k"], per_group, out_schema,
                               driver_limit_rows=limit).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        assert len(got) == len(exp)
        np.testing.assert_array_equal(got["k"], exp["k"])
        np.testing.assert_array_equal(got["n"], exp["n"])
        np.testing.assert_allclose(got["s"], exp["s"], rtol=1e-9)


def test_sorted_group_map_min_group_size(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.sorted_groups import sorted_group_map

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 3, 3], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
    })).repartition(3)
    out_schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def per_group(g: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array([g["k"][0].as_py()], pa.int64()),
                         "n": pa.array([len(g)], pa.int64())})

    for limit in (2_000_000, 0):  # in-process and distributed paths
        got = sorted_group_map(ds, ["k"], per_group, out_schema,
                               min_group_size=2,
                               driver_limit_rows=limit).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        assert list(got["k"]) == [2, 3]  # singleton key 1 skipped
        assert list(got["n"]) == [2, 3]


def test_residual_groupby_path_matches(ray_session):
    """Forcing residual_block_cap=0 routes boundary groups through
    groupby().map_groups; output must equal the single-partition path."""
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.sorted_groups import sorted_group_map

    rng = np.random.RandomState(3)
    n = 2000
    tbl = pa.table({
        "k": pa.array(rng.randint(0, 50, n), pa.int64()),
        "v": pa.array(rng.normal(0, 1, n), pa.float64()),
    })
    schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                        ("s", pa.float64())])

    def agg(g):
        return pa.table({
            "k": pa.array([g["k"][0].as_py()], pa.int64()),
            "n": pa.array([len(g)], pa.int64()),
            "s": pa.array([float(np.sort(
                g["v"].to_numpy(zero_copy_only=False)).sum())],
                pa.float64()),
        })

    ds = rd.from_arrow(tbl).repartition(16)
    a = sorted_group_map(ds, ["k"], agg, schema,
                         driver_limit_rows=0).to_pandas()
    b = sorted_group_map(ds, ["k"], agg, schema, residual_block_cap=0,
                         driver_limit_rows=0).to_pandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)
    assert a.equals(b)
    assert a["n"].sum() == n
