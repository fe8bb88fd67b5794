"""Dedup-stage tests: exact dedup vs a hand-built oracle; MinHash/SimHash
LSH pipelines must find planted near-duplicates; n-gram Jaccard verify must
score exact copies at 1.0 (SURVEY §5 oracle-test pattern applied to the
training-data operators)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


@pytest.fixture(scope="module")
def dup_corpus():
    """60 base docs; ids 1000+ are exact copies of 0-19; ids 2000+ are
    near-copies (one word changed) of 0-9."""
    rng = np.random.RandomState(3)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(60):
        n = 30 + int(rng.randint(0, 20))
        rows.append((i, " ".join(words[j] for j in rng.randint(0, 10, n))))
    for i in range(20):
        rows.append((1000 + i, rows[i][1]))  # exact copies
    for i in range(10):
        toks = rows[i][1].split()
        toks[5] = "CHANGED"
        rows.append((2000 + i, " ".join(toks)))  # near copies
    return rows


def test_exact_dedup(ray_session, dup_corpus):
    from light_curve_ray.stages.dedup import exact_dedup

    out = exact_dedup(_docs_ds(dup_corpus)).to_pandas()
    # 60 distinct texts + 10 near-copies (distinct) = 70 groups
    assert len(out) == 70
    dups = out[out["n_copies"] > 1].sort_values("doc_id")
    assert len(dups) == 20
    assert list(dups["doc_id"]) == list(range(20))  # min id kept
    assert (dups["n_copies"] == 2).all()


def test_minhash_finds_exact_and_near_copies(ray_session, dup_corpus):
    from light_curve_ray.stages.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(_docs_ds(dup_corpus),
                                threshold=0.5).to_pandas()
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    # every exact copy pair must be found with est ~1.0
    for i in range(20):
        assert (i, 1000 + i) in found, i
    exact = pairs[pairs["doc_a"] < 20]
    exact = exact[exact["doc_b"] == exact["doc_a"] + 1000]
    assert (exact["est_jaccard"] == 1.0).all()
    # near-copies (1 of ~40 words changed -> J ~ 0.85) mostly found
    near_found = sum((i, 2000 + i) in found for i in range(10))
    assert near_found >= 8


def test_ngram_jaccard_verify(ray_session, dup_corpus):
    import ray

    from light_curve_ray.stages.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_verify,
    )

    lookup = ray.put({i: t for i, t in dup_corpus})
    cand = minhash_dedup_pairs(_docs_ds(dup_corpus), threshold=0.5)
    verified = ngram_jaccard_verify(cand, lookup).to_pandas()
    exact = verified[(verified["doc_a"] < 20)
                     & (verified["doc_b"] == verified["doc_a"] + 1000)]
    assert len(exact) == 20
    assert (exact["jaccard"] == 1.0).all()
    near = verified[(verified["doc_a"] < 10)
                    & (verified["doc_b"] == verified["doc_a"] + 2000)]
    assert (near["jaccard"] < 1.0).all()
    assert (near["jaccard"] > 0.5).all()


def test_simhash_pairs(ray_session, dup_corpus):
    from light_curve_ray.stages.dedup import simhash_dedup_pairs

    pairs = simhash_dedup_pairs(_docs_ds(dup_corpus),
                                max_hamming=3).to_pandas()
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    for i in range(20):  # exact copies -> hamming 0 -> always found
        assert (i, 1000 + i) in found, i
    h0 = pairs[(pairs["doc_a"] < 20)
               & (pairs["doc_b"] == pairs["doc_a"] + 1000)]
    assert len(h0) == 20 and (h0["hamming"] == 0).all()


def test_minhash_stage_matches_kernel(ray_session, dup_corpus):
    """Distributed signatures byte-match the single-process kernel."""
    from light_curve_ray.kernels.hashing import (
        minhash_signature,
        shingle_hashes,
    )
    from light_curve_ray.stages.dedup import MinHashStage

    stage = MinHashStage(num_perm=64)
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in dup_corpus[:10]], pa.int64()),
        "text": pa.array([r[1] for r in dup_corpus[:10]], pa.string()),
    })
    out = stage(tbl)
    for i in range(10):
        expected = minhash_signature(
            shingle_hashes(dup_corpus[i][1].split(), k=3), num_perm=64)
        got = np.frombuffer(out["sig"][i].as_py(), dtype=np.uint64)
        np.testing.assert_array_equal(got, expected)


def test_pages_dedup_rows(ray_session, tmp_path):
    """O10: duplicate (url, warc_ts) pages dropped before rollup; the
    synthetic corpus plants ~1% duplicates."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from light_curve_ray.sources.pages import generate_pages_table
    from light_curve_ray.stages.dedup import dedup_rows_sorted

    tbl = generate_pages_table(n_rows=800, n_domains=10, seed=7,
                               dup_frac=0.05)
    f = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, f)
    n_unique = len({(u, t) for u, t in
                    zip(tbl["url"].to_pylist(), tbl["warc_ts"].to_pylist())})
    assert n_unique < len(tbl)  # duplicates planted
    out = dedup_rows_sorted(rd.read_parquet(f), ["url", "warc_ts"])
    df = out.to_pandas()
    assert len(df) == n_unique
    assert not df.duplicated(["url", "warc_ts"]).any()

    # end-to-end: rollup over deduped pages counts each page once
    from light_curve_ray.pipelines.rollup import RollupConfig, run_rollup

    res = run_rollup(RollupConfig(input_paths=f, input_kind="pages",
                                  dedup_pages=True, tiers=("30d",),
                                  gapfill=False, gorilla=False,
                                  extract_concurrency=2))
    total_n = res["rollup"].to_pandas()["n"].sum()
    assert total_n == n_unique


def test_dedup_pages_slim(ray_session, tmp_path):
    """Slim two-pass pages dedup: fat rows only shuffle when duplicated,
    survivor among differing payloads is the deterministic min-content-
    hash row, and non-duplicated rows stream through untouched."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from light_curve_ray.stages.dedup import dedup_pages_slim

    n = 400
    urls = [f"https://d{i % 7}.example.com/p/{i}" for i in range(n)]
    ts = list(range(n))
    html = [(f"<p>page {i} " + "x" * 6000 + "</p>").encode()
            for i in range(n)]
    # plant dups: 10 keys duplicated, with DIFFERING payloads (re-crawl)
    dup_ids = list(range(0, 50, 5))
    for i in dup_ids:
        urls.append(urls[i])
        ts.append(ts[i])
        html.append((f"<p>page {i} RECRAWLED " + "y" * 6000 + "</p>").encode())
    tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.int64()),
        "html": pa.array(html, pa.binary()),
        "text": pa.array([None] * len(urls), pa.string()),
        "lang": pa.array(["en"] * len(urls), pa.string()),
    })
    f = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, f, row_group_size=100)

    stats = {}
    out = dedup_pages_slim(rd.read_parquet(f), ["url", "warc_ts"],
                           stats_out=stats).to_pandas()
    assert len(out) == n
    assert not out.duplicated(["url", "warc_ts"]).any()
    # only the planted keys were routed into the sort path (slim shuffle)
    assert stats["dup_keys"] == len(dup_ids)
    # deterministic winner: min content hash among the duplicate payloads
    import hashlib

    def cfp(h, t):
        # mirrors kernels/hashing.hash_columns_blake2b: fields joined with
        # \x1f BETWEEN them (binary_join_element_wise), nulls -> \x00
        d = hashlib.blake2b(digest_size=8)
        d.update(h if h is not None else b"\x00")
        d.update(b"\x1f")
        d.update(t.encode() if isinstance(t, str) else (t or b"\x00"))
        return int.from_bytes(d.digest(), "big")

    for i in dup_ids:
        cands = [(cfp(html[i], None), html[i]),
                 (cfp(html[n + dup_ids.index(i)], None),
                  html[n + dup_ids.index(i)])]
        want = min(cands)[1]
        got = out[out.url == urls[i]]["html"].iloc[0]
        assert bytes(got) == want
    # run twice -> identical survivors (determinism)
    out2 = dedup_pages_slim(rd.read_parquet(f),
                            ["url", "warc_ts"]).to_pandas()
    a = out.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = out2.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert a[["url", "warc_ts"]].equals(b[["url", "warc_ts"]])
    assert all(bytes(x) == bytes(y) for x, y in zip(a.html, b.html))


def test_dedup_pages_slim_no_dups(ray_session, tmp_path):
    """No duplicates -> pure pass-through (no sort stage at all)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from light_curve_ray.stages.dedup import dedup_pages_slim

    tbl = pa.table({
        "url": pa.array([f"u{i}" for i in range(100)], pa.string()),
        "warc_ts": pa.array(list(range(100)), pa.int64()),
        "html": pa.array([b"<p>x</p>"] * 100, pa.binary()),
    })
    f = str(tmp_path / "p.parquet")
    pq.write_table(tbl, f)
    stats = {}
    out = dedup_pages_slim(rd.read_parquet(f), ["url", "warc_ts"],
                           content_cols=("html",),
                           stats_out=stats).to_pandas()
    assert len(out) == 100
    assert stats["dup_keys"] == 0


def test_ngram_jaccard_join_matches_broadcast(ray_session, dup_corpus):
    """T5 scale path: the two-join verify produces the SAME scored pairs
    as the broadcast-lookup variant."""
    import ray
    import ray.data as rd

    from light_curve_ray.stages.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_verify,
        ngram_jaccard_verify_join,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in dup_corpus], pa.int64()),
        "text": pa.array([r[1] for r in dup_corpus], pa.string()),
    })).materialize()
    cand = minhash_dedup_pairs(docs, threshold=0.4).materialize()
    assert cand.count() > 0
    # broadcast_limit=0 forces the two-join scale path (the adaptive
    # default would take the broadcast branch at this corpus size)
    joined = ngram_jaccard_verify_join(cand, docs,
                                       broadcast_limit=0).to_pandas()
    lookup = {r[0]: r[1] for r in dup_corpus}
    bcast = ngram_jaccard_verify(cand, ray.put(lookup)).to_pandas()
    a = sorted(map(tuple, joined[["doc_a", "doc_b", "jaccard"]].to_numpy()))
    b = sorted(map(tuple, bcast[["doc_a", "doc_b", "jaccard"]].to_numpy()))
    assert a == b


def test_token_hashes_tail_sensitive():
    """Long tokens differing only in their TAIL must hash apart (the
    round-1 16-byte-prefix scheme collided URLs sharing a long prefix)."""
    from light_curve_ray.kernels.hashing import token_hashes

    a = "https://example.com/very/long/path/page1"
    b = "https://example.com/very/long/path/page2"
    ha, hb = token_hashes([a, b])
    assert ha != hb
    # determinism: same token hashes identically across separate calls
    h1 = token_hashes(["deterministic-token"])[0]
    h2 = token_hashes(["deterministic-token"])[0]
    assert h1 == h2
    # the documented residual collision class: >16-byte tokens sharing
    # first 8 + last 8 bytes + byte length and differing ONLY in middle
    # bytes DO collide (by design -- head+tail sampling)
    mid_a = "ABCDEFGHxxxxxxxxSTUVWXYZ"
    mid_b = "ABCDEFGHyyyyyyyySTUVWXYZ"
    assert len(mid_a) == len(mid_b) > 16
    ca, cb = token_hashes([mid_a, mid_b])
    assert ca == cb
    # while distinct SHORT tokens (fully covered by the 16-byte window)
    # must hash apart
    sa, sb = token_hashes(["shortA", "shortB"])
    assert sa != sb


def test_exact_dedup_filter(ray_session):
    """Corpus filter: one canonical min-id row per distinct text, full
    row (text preserved) in the output."""
    import ray.data as rd

    from light_curve_ray.stages.dedup import exact_dedup_filter

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["aa", "bb", "aa", "cc", "bb", "aa"], pa.string()),
    })
    out = exact_dedup_filter(rd.from_arrow(tbl)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2, 4]
    assert list(out["text"]) == ["aa", "bb", "cc"]


def test_minhash_est_attach_paths_equal(ray_session, dup_corpus):
    """The broadcast-gather and join est_jaccard attach paths must produce
    identical pair sets and estimates (the scale path is the join; the
    broadcast path is the small-corpus fast path)."""
    from light_curve_ray.stages.dedup import minhash_dedup_pairs

    a = minhash_dedup_pairs(_docs_ds(dup_corpus), threshold=0.5,
                            broadcast_limit=200_000).to_pandas()
    b = minhash_dedup_pairs(_docs_ds(dup_corpus), threshold=0.5,
                            broadcast_limit=0).to_pandas()
    key = ["doc_a", "doc_b", "est_jaccard"]
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_passage_dup_counts_planted(ray_session):
    """Planted shared passages: doc B embeds an 8-word run of doc A in
    fresh surroundings -> both get exactly the shared windows counted;
    an unrelated doc and a doc below the window size report nothing."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.dedup import passage_dup_counts

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = {
        1: "one two three " + shared + " nine ten eleven twelve",
        2: "aa bb cc dd " + shared + " ee ff gg hh",
        3: "totally different words with no overlap at all here now ok",
        4: "tiny doc",  # < window -> no grams
    }
    tbl = pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })
    out = pa.concat_tables(list(passage_dup_counts(
        rd.from_arrow(tbl).repartition(3), window=8)
        .iter_batches(batch_format="pyarrow")))
    got = dict(zip(out["doc_id"].to_pylist(),
                   out["n_dup_passages"].to_pylist()))
    # only the single fully-shared window is common (surroundings differ)
    assert got == {1: 1, 2: 1}

    # a doc duplicated wholesale shares EVERY window
    tbl2 = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([docs[1], docs[1]], pa.string()),
    })
    out2 = pa.concat_tables(list(passage_dup_counts(
        rd.from_arrow(tbl2), window=8).iter_batches(
            batch_format="pyarrow")))
    n_words = len(docs[1].split())
    assert sorted(out2["n_dup_passages"].to_pylist()) == [
        n_words - 7, n_words - 7]


def test_decontaminate_planted_overlap(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.dedup import decontaminate_counts

    words = [f"w{i}" for i in range(30)]
    eval_text = " ".join(words)
    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [
            " ".join(words[5:20]),      # inside the eval doc: contaminated
            " ".join(reversed(words)),  # same vocab, different order: clean
            "totally different text with nothing shared at all ok",
        ]})
    ev = pa.table({"doc_id": pa.array([100], pa.int64()),
                   "text": [eval_text]})
    out = decontaminate_counts(rd.from_arrow(corpus), rd.from_arrow(ev),
                               window=8).to_pandas()
    got = dict(zip(out["doc_id"], out["n_contaminated"]))
    # doc 1 has 15 tokens -> 8 distinct 8-grams, ALL inside the eval doc
    assert got == {1: 8}


def test_exact_dup_pair_floor_paths_equal(ray_session, dup_corpus):
    """The gated-broadcast fingerprint probe and the forced two-join
    path (num_partitions set) must produce the same exact-pair floor,
    and every planted exact-copy pair must be present."""
    from light_curve_ray.stages.dedup import (
        exact_dup_pair_floor,
        minhash_dedup_pairs,
    )

    docs = _docs_ds(dup_corpus)
    cand = minhash_dedup_pairs(docs, threshold=0.5).materialize()
    a = exact_dup_pair_floor(cand, docs).to_pandas()
    b = exact_dup_pair_floor(cand, docs, num_partitions=4).to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b"]].to_numpy()))
    assert key(a) == key(b)
    got = set(key(a))
    for i in range(20):  # planted exact copies surface
        assert (i, 1000 + i) in got or (1000 + i, i) in got


def test_exact_dup_pair_floor_null_text_never_matches(ray_session):
    """SQL `a.text = b.text` never matches NULL — a null-text doc must
    not pair with another null or with an empty text, on either path."""
    import ray.data as rd

    from light_curve_ray.stages.dedup import exact_dup_pair_floor

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([None, None, "", "same", "same"], pa.string()),
    }))
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 1, 2, 4], pa.int64()),
        "doc_b": pa.array([2, 3, 3, 5], pa.int64()),
    }))
    for kw in ({}, {"num_partitions": 2}):
        out = exact_dup_pair_floor(pairs, docs, **kw).to_pandas()
        got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
        assert got == {(4, 5)}


def test_hamming_pairs_banded_matches_bruteforce(ray_session):
    """Generic 64-bit Hamming banding (image-dHash path) vs exhaustive
    pair enumeration, including a planted 2-bit near-dup."""
    import ray.data as rd

    from light_curve_ray.kernels.hashing import hamming_matrix64
    from light_curve_ray.stages.dedup import hamming_pairs_banded

    rng = np.random.RandomState(17)
    hashes = rng.randint(0, 2**63, 40, dtype=np.int64)
    hashes = np.concatenate([
        hashes,
        hashes[:3],                      # exact dups (hamming 0)
        hashes[3:5] ^ np.int64(0b101),   # 2-bit near-dups
    ])
    ids = np.arange(len(hashes), dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "h64": pa.array(hashes, pa.int64()),
    })).repartition(4)
    got = hamming_pairs_banded(ds, "doc_id", "h64",
                               max_hamming=3).to_pandas()
    got_set = {(min(a, b), max(a, b), h) for a, b, h in
               got[["doc_a", "doc_b", "hamming"]].to_numpy()}

    d = hamming_matrix64(hashes.view(np.uint64))
    exp = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if d[i, j] <= 3:
                exp.add((i, j, d[i, j]))
    assert got_set == exp
    assert any(h == 2 for _, _, h in exp)  # the planted near-dups exist

    import pytest

    with pytest.raises(ValueError):
        hamming_pairs_banded(ds, "doc_id", "h64", max_hamming=4)
