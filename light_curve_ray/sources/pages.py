"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md F1).

Schema fixed by BASELINE.json ``input_hint``:
    (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

Properties engineered into the data (all seeded, zero wall-clock dependence):
- domains drawn with Zipf(s=1.2) weights -> a hot head for skew/salting tests;
- per-domain irregular exponential inter-arrival (mean 3h), mirroring the
  reference bench curve's irregular cadence and ~24-day gap
  (/root/reference/light-curve-interpol/benches/lib.rs:284-287);
- duplicate (url, warc_ts) rows (~1%) to exercise exact dedup (SURVEY §2b-O10);
- HTML with nested tags, entities, script/style blocks and multi-byte UTF-8 —
  everything the extractor must normalize byte-identically;
- ``text`` pre-filled for ~30% of rows (pass-through path), null otherwise
  (extract-from-html path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
_LANGS = ["en", "de", "ru", "ja", "und"]

_WORDS = (
    "alpha beta gamma delta epsilon crawl web page data stream archive "
    "index rollup bucket series metric flux curve light survey telescope"
).split()

_HTML_TEMPLATE = (
    "<html><head><title>{title}</title><script>var t={i};</script>"
    "<style>.x{{color:red}}</style></head>"
    "<body><h1>{title} &amp; more</h1><p>{para} &lt;tag&gt; café "
    "ünicode — {i}</p><div>{para2}</div>{body}"
    "<noscript>ignored</noscript></body></html>"
)

_PARA_TEMPLATE = '<div class="s{j}"><h2>sec {j}</h2><p>{words}</p></div>'


def _paragraph(rng: np.random.RandomState, n: int) -> str:
    return " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n))


def generate_pages_table(
    n_rows: int = 1000,
    n_domains: int = 20,
    seed: int = 42,
    dup_frac: float = 0.01,
    page_kb: float = 1.0,
) -> pa.Table:
    """Build the pages table as one pyarrow Table (pure function of args)."""
    rng = np.random.RandomState(seed)
    # Zipf(s=1.2) domain weights (FIXTURES F1)
    ranks = np.arange(1, n_domains + 1, dtype=np.float64)
    weights = ranks ** -1.2
    weights /= weights.sum()
    domain_ids = rng.choice(n_domains, size=n_rows, p=weights)
    domain_names = np.array([f"site{d:04d}.example.org" for d in range(n_domains)])
    domain_langs = np.array([_LANGS[d % len(_LANGS)] for d in range(n_domains)])

    # Per-domain irregular timestamps: exponential inter-arrival, mean 3h.
    t_us = np.empty(n_rows, dtype=np.int64)
    for d in range(n_domains):
        idx = np.where(domain_ids == d)[0]
        if idx.size == 0:
            continue
        drng = np.random.RandomState(seed * 100003 + d)
        deltas = drng.exponential(3 * 3600e6, size=idx.size)
        # inject an observing gap for every 7th domain (reference bench's
        # ~24-day gap, benches/lib.rs:284-287)
        if d % 7 == 3 and idx.size > 4:
            deltas[idx.size // 2] += 24 * 86400e6
        t_us[idx] = BASE_EPOCH_US + np.cumsum(deltas).astype(np.int64)

    path_i = np.zeros(n_rows, dtype=np.int64)
    counters = np.zeros(n_domains, dtype=np.int64)
    for i, d in enumerate(domain_ids):
        path_i[i] = counters[d]
        counters[d] += 1

    # extra body sections sized so each page lands near ``page_kb`` KB —
    # Common-Crawl-like pages are multi-KB, and per-page size is what makes
    # the extract stage's compute meaningful in benchmarks
    n_paras = max(0, int((page_kb * 1024 - 400) // 300))
    urls, htmls, texts, langs = [], [], [], []
    for i in range(n_rows):
        d = domain_ids[i]
        urls.append(f"https://{domain_names[d]}/page/{path_i[i]}")
        para = _paragraph(rng, 8 + int(rng.randint(0, 40)))
        para2 = _paragraph(rng, 4 + int(rng.randint(0, 20)))
        body = "".join(
            _PARA_TEMPLATE.format(j=j, words=_paragraph(rng, 45))
            for j in range(n_paras)
        )
        htmls.append(
            _HTML_TEMPLATE.format(
                title=f"doc {i}", i=i, para=para, para2=para2, body=body
            ).encode("utf-8")
        )
        texts.append(para if rng.rand() < 0.3 else None)  # pass-through path
        langs.append(domain_langs[d])

    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(t_us, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    # ~1% duplicated (url, warc_ts) rows for dedup tests
    n_dup = int(n_rows * dup_frac)
    if n_dup:
        dup_idx = rng.choice(n_rows, size=n_dup, replace=False)
        tbl = pa.concat_tables([tbl, tbl.take(np.sort(dup_idx))])
    return tbl


def write_pages_parquet(
    out_dir: str,
    n_rows: int,
    n_domains: int,
    seed: int = 42,
    rows_per_file: int = 250_000,
    page_kb: float = 1.0,
    row_group_size: int | None = None,
) -> list:
    """Write the pages table as multiple parquet files (shards) so Ray Data
    gets block-per-fragment parallelism.  Returns the file paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    shard = 0
    for start in range(0, n_rows, rows_per_file):
        n = min(rows_per_file, n_rows - start)
        tbl = generate_pages_table(n, n_domains, seed=seed + shard,
                                   page_kb=page_kb)
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        # small row groups give readers (and the fused read+extract actor
        # stage) sub-file task granularity — less straggler quantization
        pq.write_table(tbl, path, row_group_size=row_group_size)
        paths.append(path)
        shard += 1
    return paths
