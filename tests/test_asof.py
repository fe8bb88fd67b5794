"""asof_join tests: vectorized block alignment vs a brute-force per-row
reference — multi-key, exact-timestamp ties (inclusive), lefts before any
right, and empty-right series."""

import numpy as np
import pyarrow as pa


def _brute(left, right):
    out = []
    for k, t in zip(left["k"], left["t_us"]):
        best = None
        for rk, rt, rv in zip(right["k"], right["t_us"], right["x"]):
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, rv)
        out.append(best)
    return out


def test_asof_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.asof import asof_join

    rng = np.random.RandomState(11)
    n_l, n_r = 400, 120
    left = {
        "k": [f"s{rng.randint(0, 6)}" for _ in range(n_l)],
        "t_us": rng.randint(0, 10_000, n_l).astype(np.int64).tolist(),
        "v": rng.normal(0, 1, n_l).tolist(),
    }
    right = {
        "k": [f"s{rng.randint(0, 5)}" for _ in range(n_r)],  # s5 empty
        "t_us": rng.randint(0, 10_000, n_r).astype(np.int64).tolist(),
        "x": rng.normal(5, 1, n_r).tolist(),
    }
    # force exact-ts ties: inclusive semantics must surface these rows
    for j in range(10):
        right["k"].append(left["k"][j])
        right["t_us"].append(left["t_us"][j])
        right["x"].append(100.0 + j)
    # dedupe right per (k, ts) so the match value is deterministic
    seen = {}
    for k, t, x in zip(right["k"], right["t_us"], right["x"]):
        key = (k, t)
        if key not in seen or x > seen[key]:
            seen[key] = x
    right = {"k": [k for k, _ in seen], "t_us": [t for _, t in seen],
             "x": list(seen.values())}

    lds = rd.from_arrow(pa.table({c: pa.array(v) for c, v in left.items()}
                                 )).repartition(7)
    rds = rd.from_arrow(pa.table({c: pa.array(v) for c, v in right.items()}
                                 )).repartition(3)
    got = asof_join(lds, rds, ["k"], "t_us", ["x"]).to_pandas()
    got = got.sort_values(["k", "t_us", "v"]).reset_index(drop=True)

    import pandas as pd

    lf = pd.DataFrame(left).sort_values(["k", "t_us", "v"]
                                        ).reset_index(drop=True)
    exp = _brute(lf.to_dict("list"), right)
    assert len(got) == len(lf)
    for i, best in enumerate(exp):
        if best is None:
            assert np.isnan(got["x_r"][i]), i
            assert pd.isna(got["t_us_r"][i]), i
        else:
            assert got["t_us_r"][i] == best[0], i
            assert got["x_r"][i] == best[1], i
    # ties included: the planted same-ts rights must be matched by their
    # own left rows
    assert (got["x_r"] >= 100.0).sum() >= 1
