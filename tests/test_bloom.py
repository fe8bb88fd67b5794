"""Bloom kernel properties (no false negatives, fpp near target, OR-merge
partition invariance) and the bloom semi-join's two confirm paths pinned
equal to the exact semi-join — including under a deliberately undersized
filter where false positives are guaranteed."""

import numpy as np
import pyarrow as pa
import pytest

from light_curve_ray.kernels.bloom import (
    bloom_add,
    bloom_empty,
    bloom_params,
    bloom_probe,
)


def test_params_sane():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    assert 9000 < m < 11000  # ~9.59 bits/key at 1%
    assert k == 7


def test_no_false_negatives_and_fpp():
    rng = np.random.default_rng(3)
    members = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    others = rng.integers(0, 2**63, 20000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    m, k = bloom_params(len(members), 0.01)
    bits = bloom_empty(m)
    bloom_add(bits, members, k)
    assert bloom_probe(bits, members, k).all()
    fpp = bloom_probe(bits, others, k).mean()
    assert fpp < 0.03  # target 0.01, generous bound


def test_or_merge_partition_invariance():
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 2**63, 3000, dtype=np.uint64)
    m, k = bloom_params(len(keys), 0.01)
    whole = bloom_empty(m)
    bloom_add(whole, keys, k)
    for n_parts in (2, 7, 64):
        acc = bloom_empty(m)
        for chunk in np.array_split(keys, n_parts):
            part = bloom_empty(m)
            bloom_add(part, chunk, k)
            np.bitwise_or(acc, part, out=acc)
        assert np.array_equal(acc, whole)


@pytest.mark.parametrize("confirm", ["broadcast", "join"])
@pytest.mark.parametrize("n_hint", [4000, 8])  # 8 => filter saturates,
def test_semi_join_bloom_exact(ray_session, confirm, n_hint):
    # false positives guaranteed, the confirm must remove them
    import ray.data as rd

    from light_curve_ray.stages.joins import semi_join_bloom

    rng = np.random.default_rng(11)
    fact_keys = rng.integers(0, 4000, 20000)
    fact = rd.from_arrow(pa.table({
        "k": pa.array(fact_keys, pa.int64()),
        "v": pa.array(rng.standard_normal(20000)),
    })).repartition(8)
    member = np.unique(rng.integers(0, 4000, 700))
    keys = rd.from_arrow(pa.table({"key": pa.array(member, pa.int64())})
                         ).repartition(3)

    import ray

    got = semi_join_bloom(fact, "k", keys, "key", n_hint=n_hint,
                          confirm=confirm)
    tables = [t for t in ray.get(got.materialize().to_arrow_refs())
              if len(t)]
    out = pa.concat_tables(tables)
    got_k = np.sort(out["k"].to_numpy(zero_copy_only=False))
    want_mask = np.isin(fact_keys, member)
    want_k = np.sort(fact_keys[want_mask])
    assert np.array_equal(got_k, want_k)
    # values survive untouched
    assert len(out) == int(want_mask.sum())
