"""Distributed prefix sum + sequence packing (stages/scan)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_prefix_sum_vs_numpy(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.scan import prefix_sum

    rng = np.random.default_rng(31)
    ids = rng.permutation(5000).astype(np.int64)
    vals = rng.integers(0, 100, 5000).astype(np.int64)
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    out = prefix_sum(rd.from_arrow(tbl).repartition(7),
                     ["id"], "v").to_pandas().sort_values("id")
    order = np.argsort(ids)
    expect = np.cumsum(vals[order]) - vals[order]
    assert (out["cum_excl"].to_numpy() == expect).all()
    assert (out["id"].to_numpy() == ids[order]).all()


def test_prefix_sum_partition_invariance(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.scan import prefix_sum

    tbl = pa.table({"id": pa.array(range(200), pa.int64()),
                    "v": pa.array([i % 7 for i in range(200)], pa.int64())})
    a = prefix_sum(rd.from_arrow(tbl).repartition(1), ["id"],
                   "v").to_pandas().sort_values("id").reset_index(drop=True)
    b = prefix_sum(rd.from_arrow(tbl).repartition(13), ["id"],
                   "v").to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.scan import pack_sequences

    rng = np.random.default_rng(41)
    n_tok = rng.integers(1, 900, 300).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "n_tok": pa.array(n_tok, pa.int64())})
    out = pack_sequences(rd.from_arrow(tbl).repartition(5),
                         window=1024).to_pandas().sort_values("doc_id")
    # offsets within window, pack ids non-decreasing in doc order
    assert (out["pack_offset"] < 1024).all()
    assert (out["pack_id"].to_numpy()[1:]
            >= out["pack_id"].to_numpy()[:-1]).all()
    # reconstruct: offset == running total mod window boundaries
    cum = np.cumsum(n_tok) - n_tok
    assert (out["pack_id"].to_numpy() == cum // 1024).all()
    assert (out["pack_offset"].to_numpy() == cum % 1024).all()


def test_chunk_stride_matches_bruteforce():
    import pyarrow as pa

    from light_curve_ray.stages.scan import chunk_stride_table

    rng = np.random.default_rng(13)
    docs, ids = [], []
    for i in range(50):
        n = int(rng.integers(0, 200))
        docs.append(" ".join(f"t{i}_{j}" for j in range(n)))
        ids.append(i)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(docs, pa.string())})
    W, S = 16, 11
    out = chunk_stride_table(tbl, "doc_id", "text", W, S)
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk"])
           for r in out.to_pylist()}
    want = {}
    for i, txt in zip(ids, docs):
        toks = __import__("re").split(r"\s+", txt)
        j = 0
        while True:
            piece = toks[j * S: j * S + W]
            if not piece and j > 0:
                break
            want[(i, j)] = (len(piece), " ".join(piece))
            if j * S + W >= len(toks):
                break
            j += 1
    assert got == want


def test_chunk_stride_edges():
    import pyarrow as pa

    from light_curve_ray.stages.scan import chunk_stride_table

    # exact-window doc -> one chunk; window==stride -> disjoint tiling
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": ["a b c d", "a b c d e f"]})
    out = chunk_stride_table(tbl, "doc_id", "text", 4, 4).to_pylist()
    assert [(r["doc_id"], r["chunk_idx"], r["chunk"]) for r in out] == [
        (1, 0, "a b c d"), (2, 0, "a b c d"), (2, 1, "e f")]
    empty = chunk_stride_table(tbl.slice(0, 0), "doc_id", "text", 4, 4)
    assert len(empty) == 0


def test_prefix_sum_tiny_multiblock(ray_session):
    """Ray's sort emits empty degenerate-schema partitions on tiny
    inputs — prefix_sum must normalize them (regression)."""
    import ray
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.scan import prefix_sum

    t1 = pa.table({"k": pa.array([2], pa.int64()),
                   "n": pa.array([120], pa.int64())})
    t2 = pa.table({"k": pa.array([1], pa.int64()),
                   "n": pa.array([30], pa.int64())})
    out = prefix_sum(rd.from_arrow([t1, t2]), ["k"], "n")
    rows = sorted(
        (r["k"], r["n"], r["cum_excl"])
        for t in ray.get(out.materialize().to_arrow_refs())
        for r in t.to_pylist())
    assert rows == [(1, 30, 0), (2, 120, 30)]
