"""Distributed term counting (wordcount) + top terms per group — the
vocabulary/term-frequency pass of a text-corpus pipeline (stopword
discovery, domain-vocabulary drift, TF tables for quality scoring).

Topology (the classic combiner discipline, SURVEY §4):

1. tokenize + PARTIAL COUNT inside each ``map_batches`` block — Arrow
   C-speed end to end (utf8_lower -> split_pattern_regex ->
   list_flatten -> hash group-by within the block).  A 6 KB doc yields
   ~1k tokens but only ~300 distinct (lang, term) partials, so the
   combiner shrinks the exchange ~3-4x before anything moves;
2. ONE keyed exchange on (group, term) merges partials (sorted runs +
   np.add.reduceat — no per-group dispatch);
3. optional grouped top-k via stages/topk (block-local candidate
   pruning first: at most k rows per group leave any block).

Tokenization contract (shared with the DuckDB oracle): lowercase, split
on ``[^a-z0-9]+`` (RE2 semantics on both sides), drop empty tokens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sorted_groups import _runs, sorted_group_map

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _tokenize_count_block(batch: pa.Table, key_cols: list,
                          text_col: str) -> pa.Table:
    """One block: explode tokens, count per (keys..., term) locally."""
    toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]),
                                  TOKEN_SPLIT_RE)
    lens = pc.list_value_length(toks)
    lens_np = lens.to_numpy(zero_copy_only=False)
    lens_np = np.where(np.isnan(lens_np), 0, lens_np).astype(np.int64)
    flat = pc.list_flatten(toks)
    cols = {c: batch[c].take(pa.array(np.repeat(
        np.arange(len(batch), dtype=np.int64), lens_np)))
        for c in key_cols}
    cols["term"] = flat
    tbl = pa.table(cols)
    tbl = tbl.filter(pc.not_equal(tbl["term"], ""))
    grouped = tbl.group_by(key_cols + ["term"]).aggregate([
        ("term", "count")])
    return grouped.rename_columns(key_cols + ["term", "n"])


def term_counts(ds, key_cols: list, text_col: str = "text"):
    """Dataset(... text ...) -> Dataset(keys..., term, n:int64) with n =
    corpus-wide token count per (keys, term)."""
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    out_schema = pa.schema([(c, types[c]) for c in key_cols]
                           + [("term", pa.string()), ("n", pa.int64())])

    partials = ds.map_batches(
        lambda t: _tokenize_count_block(t, key_cols, text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, _ = _runs(batch, key_cols + ["term"])
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(n, starts)
        idx = pa.array(starts, pa.int64())
        cols = {c: batch[c].take(idx) for c in key_cols + ["term"]}
        cols["n"] = pa.array(sums, pa.int64())
        return pa.table(cols, schema=out_schema)

    return sorted_group_map(partials, key_cols + ["term"], None,
                            out_schema, block_fn=_merge)


def doc_token_counts(ds, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Per-document total token count (shared tokenizer):
    Dataset -> (id, n_tok:int64), zero-token docs absent — the SQL
    GROUP-BY contract.  Sums the distinct (doc, term) counts from
    :func:`term_counts` in one doc-keyed merge; shared by the packing
    query and the composed corpus-prep pipeline."""
    per_doc = term_counts(ds, [id_col], text_col)
    out_schema = pa.schema([(id_col, pa.int64()), ("n_tok", pa.int64())])

    def _sum(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, _ = _runs(batch, [id_col])
        sums = np.add.reduceat(
            batch["n"].to_numpy(zero_copy_only=False), starts)
        idx = pa.array(starts, pa.int64())
        return pa.table({id_col: batch[id_col].take(idx),
                         "n_tok": pa.array(sums, pa.int64())},
                        schema=out_schema)

    return sorted_group_map(per_doc, [id_col], None, out_schema,
                            block_fn=_sum)


def tfidf_top_terms(ds, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3, round6=None):
    """Top-k TF-IDF terms per document:
    ``tfidf = tf * ln((N + 1) / (df + 1))`` (smoothed IDF).

    Document frequency is computed AND attached in ONE term-keyed
    exchange: term_counts' output is already distinct per (doc, term),
    so within each term run df is simply the run length — no separate
    df table, no join.  N (corpus size) is a driver-side scalar.
    Ranking uses the 6-dp-rounded score (the shared engine/oracle
    rounding contract) with the term as the deterministic tie-break."""
    n_docs = ds.count()

    counts = term_counts(ds, [id_col], text_col)
    out_schema = pa.schema([(id_col, pa.int64()),
                            ("term", pa.string()),
                            ("n", pa.int64()), ("df", pa.int64())])

    def _attach_df(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["term"])
        df = np.repeat(ends - starts, ends - starts).astype(np.int64)
        return pa.table({id_col: batch[id_col], "term": batch["term"],
                         "n": batch["n"],
                         "df": pa.array(df, pa.int64())},
                        schema=out_schema)

    with_df = sorted_group_map(counts, ["term"], None, out_schema,
                               block_fn=_attach_df)

    if round6 is None:
        from ..kernels.rounding import round6_tie_robust as round6

    def _score(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        # operation order mirrors the SQL oracle exactly:
        # n * LN((N + 1.0) / (df + 1.0))
        score = n * np.log((n_docs + 1.0) / (df + 1.0))
        return pa.table({id_col: batch[id_col], "term": batch["term"],
                         "tfidf": pa.array(round6(score), pa.float64())})

    scored = with_df.map_batches(_score, batch_format="pyarrow",
                                 zero_copy_batch=True)
    from .topk import top_k_by_key

    return top_k_by_key(scored, [id_col], "tfidf", k,
                        tiebreak_col="term", descending=True)


def unigram_logprob_scores(ds, id_col: str = "doc_id",
                           text_col: str = "text",
                           vocab_limit: int = 20_000_000, round6=None):
    """Per-document mean log unigram probability — the language-model
    quality score a corpus filter thresholds on (a doc of globally-rare
    tokens scores low; boilerplate scores high).

    Two phases:

    1. corpus unigram table (term, n) via :func:`term_counts` (block
       combiners + one keyed exchange), converted to log-probs
       ``ln(n / T)`` once;
    2. the vocab ships to every worker as ONE broadcast object
       (``ray.put`` of a sorted term array + logp array; looked up with
       vectorized ``np.searchsorted`` — never re-shipped per batch),
       and each doc scores in a stateless map.  Broadcast assumption,
       documented: a unigram vocab is corpus-sublinear (Heaps' law —
       ~millions of distinct terms at web scale, <1 GB as Arrow
       strings); ``vocab_limit`` fails loudly if violated.

    Docs with zero tokens produce NO output row (the SQL GROUP BY
    contract).  Every token is present in the vocab by construction
    (same corpus, same tokenizer)."""
    import ray

    from .joins import collect_small

    counts = term_counts(ds, [], text_col)
    vocab = collect_small(counts, max_rows=vocab_limit)
    n = vocab["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = float(n.sum())
    # vocab stays an ARROW array: lookups below use pc.index_in, which
    # probes in Arrow C without materializing tokens as Python strings
    vocab_terms = vocab["term"].combine_chunks()
    logp = np.log(n / total)  # LN(CAST(n AS DOUBLE) / t)
    ref = ray.put((vocab_terms, logp))

    if round6 is None:
        from ..kernels.rounding import round6_tie_robust as round6

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("avg_logp", pa.float64())])

    def _score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        vt, lp = _ray.get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]),
                                      TOKEN_SPLIT_RE)
        lens_np = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False)
        lens_np = np.where(np.isnan(lens_np), 0, lens_np).astype(np.int64)
        flat = pc.list_flatten(toks)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                            lens_np)
        keep = np.asarray(pc.not_equal(flat, ""))
        doc_idx = doc_idx[keep]
        if len(doc_idx) == 0:
            return out_schema.empty_table()
        # Arrow-native position lookup — no Python-string detour
        pos = np.asarray(pc.index_in(flat.filter(pa.array(keep)),
                                     value_set=vt))
        tok_lp = lp[pos]
        n_docs = len(batch)
        sums = np.bincount(doc_idx, weights=tok_lp, minlength=n_docs)
        cnts = np.bincount(doc_idx, minlength=n_docs)
        present = cnts > 0
        ids = batch[id_col].to_numpy(zero_copy_only=False)[present]
        avg = sums[present] / cnts[present]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(cnts[present], pa.int64()),
                         "avg_logp": pa.array(round6(avg), pa.float64())},
                        schema=out_schema)

    return ds.map_batches(_score, batch_format="pyarrow",
                          zero_copy_batch=True)


def inverted_index(ds, id_col: str = "doc_id", text_col: str = "text",
                   min_df: int = 2, max_df: int = 50):
    """Posting lists: for each term with ``min_df <= df <= max_df``, the
    ordered doc-id list (as a comma-joined string — canonical, driver-
    comparable).  The df band is the practical retrieval filter:
    singletons are noise, stopword-frequency terms are scanned, not
    listed.

    One term-keyed exchange over the distinct (doc, term) rows (the
    term_counts output); each whole term-run emits its sorted posting
    string in a vectorized block kernel — df is the run length, so the
    band filter needs no second pass."""
    counts = term_counts(ds, [id_col], text_col)
    out_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                            ("postings", pa.string())])

    def _postings(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, ["term"])
        lens = ends - starts
        # vectorized band mask FIRST: at web scale the singleton
        # majority (df < min_df) must not even enter the Python loop
        band = (lens >= min_df) & (lens <= max_df)
        if not band.any():
            return out_schema.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = np.nonzero(band)[0]
        term_col = batch["term"]
        posts = [",".join(map(str, np.sort(ids[starts[i]:ends[i]])
                              .tolist())) for i in sel]
        idx = pa.array(starts[sel], pa.int64())
        return pa.table({"term": term_col.take(idx),
                         "df": pa.array(lens[sel], pa.int64()),
                         "postings": pa.array(posts, pa.string())},
                        schema=out_schema)

    return sorted_group_map(counts, ["term"], None, out_schema,
                            block_fn=_postings)


_PAIR_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string()),
                          ("n_ab", pa.int64())])


def _adjacent_pair_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-block adjacent-token bigram partial counts (the bigram
    combiner shared by PMI and Kneser-Ney): tokenize Arrow-native,
    pair tokens adjacent WITHIN a doc, hash-count within the block."""
    toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]),
                                  TOKEN_SPLIT_RE)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.where(np.isnan(lens), 0, lens).astype(np.int64)
    flat = pc.list_flatten(toks)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    keep = np.asarray(pc.not_equal(flat, ""))
    flat = flat.filter(pa.array(keep)).combine_chunks()
    doc_idx = doc_idx[keep]
    if len(doc_idx) < 2:
        return _PAIR_SCHEMA.empty_table()
    adj = np.nonzero(doc_idx[1:] == doc_idx[:-1])[0]
    if adj.size == 0:
        return _PAIR_SCHEMA.empty_table()
    # Arrow-native gather: tokens never materialize as Python strs
    ia = pa.array(adj, pa.int64())
    ib = pa.array(adj + 1, pa.int64())
    tbl = pa.table({"a": flat.take(ia), "b": flat.take(ib)})
    g = tbl.group_by(["a", "b"]).aggregate([("a", "count")])
    return g.rename_columns(["a", "b", "n_ab"])


def kneser_ney_bigrams(ds, text_col: str = "text", k: int = 20,
                       min_count: int = 5, discount: float = 0.75,
                       stats_limit: int = 20_000_000, round6=None):
    """Top-k bigrams by interpolated Kneser-Ney probability — the
    smoothing every n-gram LM production stack uses (Kneser & Ney 1995;
    Chen & Goodman 1999):

        P_kn(b|a) = (c(a,b) − d) / c(a·)
                    + d · N1+(a,·) / c(a·) · (N1+(·,b) / T)

    with discount d, context count c(a·), continuation fan-outs
    N1+(a,·) / N1+(·,b) and total distinct-bigram count T.

    Topology: the shared adjacent-pair combiner, then ONE a-keyed
    exchange whose block kernel merges (a,b) duplicates AND attaches
    the per-context stats (c(a·), N1+(a,·)) from the a-runs — whole-a
    groups colocate, so no second context pass.  The continuation
    table (distinct b → N1+(·,b)) is vocab-scale (Heaps' law) and
    broadcasts once under ``stats_limit``'s loud gate; T is its exact
    sum.  Scoring is a stateless map; ranking is the distributed
    grouped top-k on the 6-dp-rounded score (bigram tie-break)."""
    import ray

    from .joins import collect_small
    from .topk import top_k_by_key

    partials = ds.map_batches(
        lambda b: _adjacent_pair_partials(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    stats_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("n_ab", pa.int64()), ("cw", pa.int64()),
                              ("n1f", pa.int64())])

    def _merge_a(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return stats_schema.empty_table()
        g = (batch.group_by(["a", "b"]).aggregate([("n_ab", "sum")])
             .rename_columns(["a", "b", "n_ab"])
             .sort_by([("a", "ascending"), ("b", "ascending")]))
        starts, ends = _runs(g, ["a"])
        lens = ends - starts
        n = g["n_ab"].to_numpy(zero_copy_only=False)
        cw = np.repeat(np.add.reduceat(n, starts), lens)
        n1f = np.repeat(lens, lens)
        return pa.table({"a": g["a"], "b": g["b"],
                         "n_ab": pa.array(n, pa.int64()),
                         "cw": pa.array(cw, pa.int64()),
                         "n1f": pa.array(n1f, pa.int64())},
                        schema=stats_schema)

    merged = sorted_group_map(partials, ["a"], None, stats_schema,
                              block_fn=_merge_a).materialize()

    # continuation stats: rows are globally distinct bigrams now, so
    # per-block b-counts sum to N1+((·,b)); vocab-scale -> broadcast
    def _bpart(batch: pa.Table) -> pa.Table:
        g = batch.select(["b"]).group_by(["b"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["b", "nb"])

    bstats = collect_small(
        merged.map_batches(_bpart, batch_format="pyarrow",
                           zero_copy_batch=True),
        max_rows=stats_limit)
    btab = (bstats.group_by(["b"]).aggregate([("nb", "sum")])
            .rename_columns(["b", "nbs"]))
    b_terms = btab["b"].combine_chunks()
    n1b = btab["nbs"].to_numpy(zero_copy_only=False).astype(np.float64)
    total_t = float(n1b.sum())
    ref = ray.put((b_terms, n1b))

    if round6 is None:
        from ..kernels.rounding import round6_tie_robust as round6

    out_schema = pa.schema([("bigram", pa.string()),
                            ("n_ab", pa.int64()),
                            ("p_kn", pa.float64()), ("g", pa.int64())])

    def _score(batch: pa.Table) -> pa.Table:
        vt, nb = ray.get(ref)
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False)
        m = n_ab >= min_count
        if not m.any():
            return out_schema.empty_table()
        sel = batch.filter(pa.array(m))
        n_ab = n_ab[m].astype(np.float64)
        cw = sel["cw"].to_numpy(zero_copy_only=False).astype(np.float64)
        n1f = sel["n1f"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        pos = np.asarray(pc.index_in(sel["b"].combine_chunks(),
                                     value_set=vt))
        cont = nb[pos]
        # operation order mirrors the SQL expression exactly:
        # (c - d)/cw + d*n1f/cw*(cont/T)
        p = ((n_ab - discount) / cw
             + discount * n1f / cw * (cont / total_t))
        big = pc.binary_join_element_wise(sel["a"].combine_chunks(),
                                          sel["b"].combine_chunks(),
                                          " ")
        return pa.table({"bigram": big,
                         "n_ab": pa.array(n_ab.astype(np.int64)),
                         "p_kn": pa.array(round6(p), pa.float64()),
                         "g": pa.array(np.zeros(int(m.sum()),
                                                np.int64))},
                        schema=out_schema)

    scored = merged.map_batches(_score, batch_format="pyarrow",
                                zero_copy_batch=True)
    top = top_k_by_key(scored, ["g"], "p_kn", k, tiebreak_col="bigram",
                       descending=True)
    return top.map_batches(lambda t: t.drop_columns(["g"]),
                           batch_format="pyarrow")


def bigram_pmi(ds, id_col: str = "doc_id", text_col: str = "text",
               k: int = 20, min_count: int = 5,
               vocab_limit: int = 20_000_000, round6=None):
    """Collocation mining: top-k adjacent-token bigrams by pointwise
    mutual information  pmi = ln(n_ab * T / (n_a * n_b)), count floor
    ``min_count``.

    One combiner pass emits per-block bigram partials (adjacent pairs
    within each doc, vectorized via np.char on the flattened token
    array), ONE bigram-keyed exchange merges them; unigram counts
    broadcast once (the Heaps'-law vocab assumption, same as the LM
    scorer); ranking uses the 6-dp-rounded score with the bigram string
    as tie-break — the shared deterministic-argmax contract."""
    import ray

    from .joins import collect_small

    uni = collect_small(term_counts(ds, [], text_col),
                        max_rows=vocab_limit)
    n_u = uni["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = float(n_u.sum())
    ref = ray.put((uni["term"].combine_chunks(), n_u))

    pair_schema = _PAIR_SCHEMA

    partials = ds.map_batches(
        lambda b: _adjacent_pair_partials(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pair_schema.empty_table()
        starts, _ = _runs(batch, ["a", "b"])
        sums = np.add.reduceat(
            batch["n_ab"].to_numpy(zero_copy_only=False), starts)
        idx = pa.array(starts, pa.int64())
        return pa.table({"a": batch["a"].take(idx),
                         "b": batch["b"].take(idx),
                         "n_ab": pa.array(sums, pa.int64())},
                        schema=pair_schema)

    merged = sorted_group_map(partials, ["a", "b"], None, pair_schema,
                              block_fn=_merge)

    if round6 is None:
        from ..kernels.rounding import round6_tie_robust as round6

    out_schema = pa.schema([("bigram", pa.string()),
                            ("n_ab", pa.int64()), ("pmi", pa.float64()),
                            ("g", pa.int64())])

    def _score(batch: pa.Table) -> pa.Table:
        vt, nu = ray.get(ref)
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False)
        m = n_ab >= min_count
        if not m.any():
            return out_schema.empty_table()
        sel = batch.filter(pa.array(m))
        n_ab = n_ab[m]
        a, b = sel["a"].combine_chunks(), sel["b"].combine_chunks()
        na = nu[np.asarray(pc.index_in(a, value_set=vt))]
        nb = nu[np.asarray(pc.index_in(b, value_set=vt))]
        # operation order mirrors the SQL: (n_ab * T) / (n_a * n_b)
        pmi = np.log((n_ab.astype(np.float64) * total) / (na * nb))
        big = pc.binary_join_element_wise(a, b, " ")
        return pa.table({"bigram": big,
                         "n_ab": pa.array(n_ab, pa.int64()),
                         "pmi": pa.array(round6(pmi), pa.float64()),
                         "g": pa.array(np.zeros(len(n_ab), np.int64))},
                        schema=out_schema)

    scored = merged.map_batches(_score, batch_format="pyarrow",
                                zero_copy_batch=True)
    from .topk import top_k_by_key

    top = top_k_by_key(scored, ["g"], "pmi", k, tiebreak_col="bigram",
                       descending=True)
    return top.map_batches(lambda t: t.drop_columns(["g"]),
                           batch_format="pyarrow")


def top_terms(ds, key_cols: list, text_col: str = "text", k: int = 10):
    """Top-k most frequent terms per key group, ROW_NUMBER-ranked with
    (count DESC, term ASC) — the fully-specified deterministic order."""
    from .topk import top_k_by_key

    counts = term_counts(ds, key_cols, text_col)
    return top_k_by_key(counts, key_cols, "n", k,
                        tiebreak_col="term", descending=True)
