"""Text-analysis stages over the ``documents`` table: token counting,
quality scoring, language ID, fingerprinting.

These are the text-pipeline operators a large-scale training-data engine
needs alongside the rollup core.  All per-document kernels live in
kernels/textkit.py (pure Python, deterministic across workers — same
byte-identity discipline as the HTML extractor, SURVEY §2b-O2); this module
is the Ray Data plumbing: a stateful actor-pool ``map_batches`` class whose
``__init__`` pre-compiles every regex/stopword table once per actor
(construct-once / apply-many, mirroring the reference Interpolator lifecycle
at /root/reference/light-curve-interpol/src/lib.rs:4-13).

Output columns are split in two groups:

- SQL-parity columns (n_chars, n_words, n_tokens_bpe, mean_word_len,
  punct_ratio, digit_ratio, upper_ratio, stopword_ratio) — each has an exact
  DuckDB translation in pipelines/queries.py for the driver's oracle check
  (documents are ASCII in the testdata, so RE2-vs-Python \\w/\\s class
  differences cannot bite; the kernels themselves are Unicode-correct).
- heuristic columns (lang_pred, fingerprint_hex) — deterministic but not
  SQL-expressible; checked rows-only by the driver and pinned by unit tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.textkit import (
    fingerprint,
    lang_id,
    quality_scores,
    token_count_bpe,
    token_count_ws,
)

TEXT_STAT_COLUMNS = (
    "n_chars",
    "n_words",
    "n_tokens_bpe",
    "mean_word_len",
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
    "stopword_ratio",
)


class TextStatsStage:
    """documents batch -> per-doc text statistics (Arrow in / Arrow out).

    Per-document scoring is row-wise Python (regex findall, char classes) —
    the actor-pool-parallel case; column assembly stays vectorized.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 with_lang: bool = True, with_fingerprint: bool = True):
        self.id_col = id_col
        self.text_col = text_col
        self.with_lang = with_lang
        self.with_fingerprint = with_fingerprint
        # warm the kernels so regex compilation happens once per actor
        quality_scores("warm up text")
        token_count_bpe("warm, up!")
        lang_id("the and of warm")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        stats = {c: np.empty(n, dtype=np.float64) for c in TEXT_STAT_COLUMNS}
        langs: list = [""] * n
        fps: list = [""] * n
        for i, t in enumerate(texts):
            t = t or ""
            q = quality_scores(t)
            stats["n_chars"][i] = q["n_chars"]
            stats["n_words"][i] = q["n_words"]
            stats["n_tokens_bpe"][i] = token_count_bpe(t)
            stats["mean_word_len"][i] = q["mean_word_len"]
            stats["punct_ratio"][i] = q["punct_ratio"]
            stats["digit_ratio"][i] = q["digit_ratio"]
            stats["upper_ratio"][i] = q["upper_ratio"]
            stats["stopword_ratio"][i] = q["stopword_ratio"]
            if self.with_lang:
                langs[i] = lang_id(t)
            if self.with_fingerprint:
                fps[i] = f"{fingerprint(t):016x}"
        cols = {self.id_col: batch[self.id_col]}
        for c in ("n_chars", "n_words", "n_tokens_bpe"):
            cols[c] = pa.array(stats[c].astype(np.int64), pa.int64())
        for c in ("mean_word_len", "punct_ratio", "digit_ratio",
                  "upper_ratio", "stopword_ratio"):
            cols[c] = pa.array(stats[c], pa.float64())
        if self.with_lang:
            cols["lang_pred"] = pa.array(langs, pa.string())
        if self.with_fingerprint:
            cols["fingerprint_hex"] = pa.array(fps, pa.string())
        return pa.table(cols)


def text_stats_dataset(ds, **kwargs):
    """documents Dataset -> text-stats Dataset (actor pool, arrow batches)."""
    return ds.map_batches(
        TextStatsStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(2, 8),
        num_cpus=1,
    )


def quality_filter_dataset(ds, min_words: int = 15, min_chars: int = 80,
                           max_punct_ratio: float = 0.1,
                           id_col: str = "doc_id", **kwargs):
    """Quality gate: documents surviving the length/punctuation thresholds
    -> (doc_id, n_chars, n_words).

    Thresholds are applied to the UNROUNDED stats: every operand is an
    exact integer or a single integer-ratio division, so the engine and
    the SQL oracle compute bit-identical doubles and agree at the
    boundary (no rounding hazard).  Stacks in front of dedup/tokenize in
    a real pipeline; here it is its own oracle-checked operator."""
    import pyarrow.compute as pc

    stats = text_stats_dataset(ds, id_col=id_col, with_lang=False,
                               with_fingerprint=False, **kwargs)

    def _keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(batch["n_words"], min_words),
                    pc.greater_equal(batch["n_chars"], min_chars)),
            pc.less_equal(batch["punct_ratio"], max_punct_ratio))
        return batch.filter(mask).select([id_col, "n_chars", "n_words"])

    return stats.map_batches(_keep, batch_format="pyarrow",
                             zero_copy_batch=True)


def token_count_oracle(texts: list) -> dict:
    """Single-process oracle for tests: same kernels, sequential."""
    return {
        "ws": [token_count_ws(t or "") for t in texts],
        "bpe": [token_count_bpe(t or "") for t in texts],
    }
