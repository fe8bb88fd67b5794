"""Distributed connected components over an edge list — the clustering
step a dedup pipeline needs AFTER pair generation (minhash/simhash/
embedding pairs are EDGES; a duplicate *group* is a connected component,
and keeping one survivor per component is the corpus-level dedup).

Algorithm: alternating Large-Star / Small-Star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond") — the edge set itself is
the distributed state, each half-round is ONE keyed sorted exchange of
slim (int64, int64) pairs plus a vectorized whole-block kernel, no node
ever accumulates its whole component (unlike hash-to-min, whose min node
receives the full component — a skew bomb at web scale), and the edge
count never grows (each directed adjacency row yields at most one output
edge).  Converges to per-component stars around the minimum node id in
O(log^2 n) rounds worst-case, O(log n) in practice.

Stop rule (exact, not probabilistic): the large-star pass ALSO emits,
per node, lambda(v) = min(neighbors(v) + {v}) and a star-consistency bit
(v is its own lambda, or ALL its neighbors equal lambda(v)) — computed
from the same keyed exchange, zero extra all-to-alls; the edge set is a
fixed point if and only if every node is star-consistent, so the loop
exits exactly at convergence — no changed-edge-count heuristics, no
fixed round budget.

Partitioning assumption: none beyond the sorts' own hash/range exchange —
edges arrive in any order, any block layout.  Skew note: the minimum node
of a component of size k holds degree k-1 in the final star, so the LAST
rounds concentrate one group of size O(component) per component in the
keyed sort; components at web scale are dedup groups (size << corpus),
not the corpus itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sorted_groups import _runs, sorted_group_map

_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _symmetrize(batch: pa.Table) -> pa.Table:
    """(a,b) -> adjacency rows (a,b) and (b,a), self-loops dropped."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    keep = a != b
    a, b = a[keep], b[keep]
    return pa.table({"a": np.concatenate([a, b]),
                     "b": np.concatenate([b, a])}, schema=_EDGE_SCHEMA)


def _group_mins(batch: pa.Table):
    """Per whole-group (key-sorted by 'a'): run bounds, key values,
    neighbor arrays and per-run min(neighbors + {key})."""
    starts, ends = _runs(batch, ["a"])
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    nb_min = np.minimum.reduceat(b, starts)
    keys = a[starts]
    m = np.minimum(keys, nb_min)
    return starts, ends, a, b, keys, m


_FUSED_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("kind", pa.int8())])
_KIND_EDGE, _KIND_LAB_STAR, _KIND_LAB_NONSTAR = 0, 1, 2


def _fused_large_star_block(batch: pa.Table) -> pa.Table:
    """One pass over the symmetric-adjacency sort doing BOTH per-round
    jobs: the convergence check (per-node lambda + star-consistency row)
    and the large-star edges (every neighbor x > u links to
    m = min(N(u) + {u})) — they need the identical keyed exchange, so
    fusing them saves one all-to-all per round."""
    if len(batch) == 0:
        return _FUSED_SCHEMA.empty_table()
    starts, ends, a, b, keys, m = _group_mins(batch)
    lens = ends - starts
    m_row = np.repeat(m, lens)
    bad = np.add.reduceat((b != m_row).astype(np.int64), starts)
    star = (keys == m) | (bad == 0)
    mask = b > a  # x > u
    out_a = np.concatenate([b[mask], keys])
    out_b = np.concatenate([m_row[mask], m])
    kind = np.concatenate([
        np.zeros(int(mask.sum()), dtype=np.int8),
        np.where(star, _KIND_LAB_STAR, _KIND_LAB_NONSTAR).astype(np.int8)])
    return pa.table({"a": out_a, "b": out_b, "kind": kind},
                    schema=_FUSED_SCHEMA)


def _to_max_keyed(batch: pa.Table) -> pa.Table:
    """Small-star map step: key every edge by its LARGER endpoint."""
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    keep = a != b
    a, b = a[keep], b[keep]
    return pa.table({"a": np.maximum(a, b), "b": np.minimum(a, b)},
                    schema=_EDGE_SCHEMA)


def _small_star_block(batch: pa.Table) -> pa.Table:
    """Small-star over a max-keyed sorted block: all of N(u) + {u} link
    to m = min(N(u)) (all neighbors are < u here), except m itself."""
    if len(batch) == 0:
        return _EDGE_SCHEMA.empty_table()
    starts, ends, a, b, keys, m = _group_mins(batch)
    lens = ends - starts
    m_row = np.repeat(m, lens)
    mask = b != m_row  # x != m among neighbors
    out_a = np.concatenate([b[mask], keys])  # neighbors != m, plus u itself
    out_b = np.concatenate([m_row[mask], m])
    keep = out_a != out_b
    return pa.table({"a": out_a[keep], "b": out_b[keep]},
                    schema=_EDGE_SCHEMA)


def _cc_in_process(edge_tbl: pa.Table, max_rounds: int):
    """The SAME star loop on a driver-local table — identical kernels
    (_fused_large_star_block etc.), local sorts instead of exchanges.
    A path graph needs ~log2(diameter) rounds of 3 passes each; at
    ~0.5-1 s of fixed Ray overhead per pass, an under-gate graph spent
    ~95% of its wall on dispatch (measured 38 s for a 100k-node chain
    fixture at sf0.1 -> ~1 s here).  Parity with the distributed path is
    pinned by tests (driver_limit_rows=0)."""
    import pyarrow.compute as pc

    edges = edge_tbl
    for _ in range(max_rounds):
        adj = _symmetrize(edges).sort_by([("a", "ascending")])
        fused = _fused_large_star_block(adj)
        kind = fused["kind"]
        if pc.sum(pc.cast(pc.equal(kind, _KIND_LAB_NONSTAR),
                          pa.int64())).as_py() in (0, None):
            labs = fused.filter(pc.greater(kind, _KIND_EDGE))
            return pa.table({"node": labs["a"], "component": labs["b"]})
        lstar = fused.filter(pc.equal(kind, _KIND_EDGE)).select(["a", "b"])
        maxk = _to_max_keyed(lstar).sort_by([("a", "ascending")])
        edges = _small_star_block(maxk)
    raise RuntimeError(f"connected_components: no convergence in "
                       f"{max_rounds} rounds")


def connected_components(edges, max_rounds: int = 64,
                         driver_limit_rows: int = 2_000_000):
    """Edge list Dataset(a:int64, b:int64) -> Dataset(node:int64,
    component:int64) with component = min node id reachable.  Nodes are
    every id appearing in an edge; attach isolated nodes afterwards with
    :func:`attach_components`.

    Per round: ONE fused symmetric-adjacency exchange (convergence check
    + large-star together) and, when not yet converged, ONE max-keyed
    exchange (small-star).

    Adaptive small-input path (the sorted_group_map discipline): an edge
    list at or under ``driver_limit_rows`` — 16 B/row, so ≤ ~32 MB —
    runs the WHOLE loop in-process with the same kernels; the iterative
    algorithm's per-round Ray dispatch otherwise dominates (a star round
    is 3 passes, a long chain needs ~log2(diameter) rounds).  Web-scale
    edge lists exceed the gate and take the distributed loop below;
    ``driver_limit_rows=0`` forces it (tests pin the paths equal)."""
    import pyarrow.compute as pc

    if driver_limit_rows:
        import ray
        import ray.data as rd

        edges = edges.materialize()
        if (edges.count() <= driver_limit_rows
                and (edges.size_bytes() or 0) <= (256 << 20)):
            tables = [t for t in ray.get(edges.to_arrow_refs()) if len(t)]
            if not tables:
                return rd.from_arrow(pa.table(
                    {"node": pa.array([], pa.int64()),
                     "component": pa.array([], pa.int64())}))
            tbl = pa.concat_tables(tables).combine_chunks()
            return rd.from_arrow(_cc_in_process(tbl, max_rounds))

    for _ in range(max_rounds):
        adj = edges.map_batches(_symmetrize, batch_format="pyarrow",
                                zero_copy_batch=True)
        fused = sorted_group_map(adj, ["a"], None, _FUSED_SCHEMA,
                                 block_fn=_fused_large_star_block,
                                 driver_limit_rows=driver_limit_rows
                                 ).materialize()
        n_bad = fused.map_batches(
            lambda t: pa.table(
                {"bad": pa.array(
                    [int(pc.sum(pc.cast(
                        pc.equal(t["kind"], _KIND_LAB_NONSTAR),
                        pa.int64())).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow").sum("bad")
        if not n_bad:
            return fused.map_batches(
                lambda t: pa.table(
                    {"node": t["a"], "component": t["b"]}).filter(
                        pc.greater(t["kind"], _KIND_EDGE)),
                batch_format="pyarrow")
        lstar = fused.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], _KIND_EDGE))
                       .select(["a", "b"]),
            batch_format="pyarrow")
        maxk = lstar.map_batches(_to_max_keyed, batch_format="pyarrow",
                                 zero_copy_batch=True)
        edges = sorted_group_map(maxk, ["a"], None, _EDGE_SCHEMA,
                                 block_fn=_small_star_block,
                                 driver_limit_rows=driver_limit_rows
                                 ).materialize()
    raise RuntimeError(f"connected_components: no convergence in "
                       f"{max_rounds} rounds")


def attach_components(nodes, node_col: str, comps,
                      driver_limit_rows: int = 2_000_000):
    """Left-attach component ids onto a node Dataset; nodes absent from
    the edge set (isolated) become their own singleton component.

    Topology: one keyed sorted exchange over the union of node rows and
    label rows (the label side is component-map-scale, the node side is
    corpus-scale but slim) — no driver materialization, no broadcast
    assumption about the label count."""
    out_schema = pa.schema([(node_col, pa.int64()),
                            ("component", pa.int64())])

    def _tag_nodes(batch: pa.Table) -> pa.Table:
        n = batch[node_col]
        return pa.table({"node": n,
                         "component": pa.nulls(len(batch), pa.int64())})

    tagged_nodes = nodes.map_batches(_tag_nodes, batch_format="pyarrow")
    unioned = comps.union(tagged_nodes)

    def _resolve(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        import pyarrow.compute as pc

        starts, _ = _runs(batch, ["node"])
        node = batch["node"].to_numpy(zero_copy_only=False)
        # INT64-exact null handling: a float64 round-trip (NaN-for-null)
        # silently rounds ids above 2^53 — fill nulls with int64.max as
        # the min-identity sentinel instead (a component label can never
        # be int64.max: labels are min node ids, and a graph whose every
        # node is int64.max has one node)
        sentinel = np.iinfo(np.int64).max
        comp = pc.fill_null(batch["component"],
                            sentinel).to_numpy(zero_copy_only=False)
        per_run = np.minimum.reduceat(comp, starts)
        keys = node[starts]
        out = np.where(per_run == sentinel, keys, per_run)
        return pa.table({node_col: pa.array(keys, pa.int64()),
                         "component": pa.array(out, pa.int64())})

    return sorted_group_map(unioned, ["node"], None, out_schema,
                            block_fn=_resolve,
                            driver_limit_rows=driver_limit_rows)
