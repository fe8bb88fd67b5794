"""Text-extraction stage (SURVEY §2b-O2): HTML -> canonical text.

Stateful actor-pool stage: pass the CLASS to ``map_batches`` so Ray builds an
actor pool — parser state (compiled regexes, tag tables) is built once per
actor in ``__init__``, batches flow through ``__call__``.  The same kernel
function (kernels/textkit.extract_text) is callable single-process, which is
how the byte-identical-per-url invariant is verified (tests/test_textkit.py).

Construct-once / apply-many mirrors the reference's Interpolator lifecycle
(struct built once, applied per series — /root/reference/light-curve-interpol/
src/lib.rs:4-13 + benches/lib.rs:328-335).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.textkit import extract_text


class ExtractTextStage:
    """Fill null ``text`` from ``html``; drop the fat ``html`` column after.

    Arrow in / Arrow out.  The per-document parse is inherently row-wise
    (stdlib HTMLParser), which is exactly the actor-pool-parallel case; all
    column plumbing stays vectorized.
    """

    def __init__(self, drop_html: bool = True):
        self.drop_html = drop_html
        # touch the kernel once so import/compile cost is paid at actor init
        extract_text(b"<p>warm</p>")

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        mask = pc.is_null(text)
        if pc.any(mask).as_py():
            # only the null-text MINORITY crosses the Arrow->Python
            # boundary: take the needed html rows, parse, then a
            # vectorized replace_with_mask scatter — a batch with 1%
            # nulls no longer pays a 100% to_pylist round-trip
            idx = pc.indices_nonzero(mask)
            html_sub = batch["html"].take(idx).to_pylist()
            repl = pa.array(
                [extract_text(h) if h is not None else "" for h in html_sub],
                pa.string())
            text = pc.replace_with_mask(
                text.combine_chunks() if isinstance(text, pa.ChunkedArray)
                else text,
                mask.combine_chunks() if isinstance(mask, pa.ChunkedArray)
                else mask,
                repl.cast(text.type))
        batch = batch.set_column(batch.column_names.index("text"), "text", text)
        if self.drop_html:
            batch = batch.drop_columns(["html"])
        return batch


_PROCESS_STAGE: ExtractTextStage | None = None


def extract_text_task(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of the extract stage.

    Same kernel, but scheduled as plain map_batches tasks: Ray worker
    processes are long-lived, so the stage (compiled tables) is constructed
    ONCE per process via a module-level cache — construct-once/apply-many
    without dedicating CPU slots to a fixed actor pool.  Preferable when
    the stage state is cheap (this parser) because reads and extraction
    then share the whole CPU budget instead of a static split; use the
    actor-pool class when state is expensive (models, big indexes).
    """
    global _PROCESS_STAGE
    if _PROCESS_STAGE is None:
        _PROCESS_STAGE = ExtractTextStage()
    return _PROCESS_STAGE(batch)


class FusedPagesToPointsStage:
    """Fused read+extract+project actor: file path in, POINTS out.

    The split topology (read tasks -> extract actor pool) moves every
    decoded html block through the object store and statically partitions
    CPU slots between readers and extractors — at high core counts the
    extractors sit ~25% idle waiting on reads.  Fusing the read into the
    actor makes each worker own its shard end-to-end: one parquet read
    (pyarrow, single-threaded — parallelism comes from the pool), one
    extraction pass, one vectorized projection, and only the ~1000x
    smaller points table ever enters the object store.  This is the
    standard Ray Data pattern for custom sources: map_batches over a
    Dataset of file paths.
    """

    def __init__(self, columns: list | None = None):
        self.columns = columns
        self.extract = ExtractTextStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from .project import pages_to_points

        outs = []
        names = batch.column_names
        n = len(batch)
        starts = (batch["rg_start"].to_pylist() if "rg_start" in names
                  else [-1] * n)
        ends = (batch["rg_end"].to_pylist() if "rg_end" in names
                else [-1] * n)
        for path, s, e in zip(batch["path"].to_pylist(), starts, ends):
            if s is None or e is None or e < 0:
                pages = pq.read_table(path, columns=self.columns,
                                      use_threads=False)
                outs.append(pages_to_points(self.extract(pages)))
            else:
                # span of contiguous row groups, streamed ONE AT A TIME:
                # heap holds a single decoded row group of pages plus the
                # ~1000x smaller accumulated points, regardless of span
                pf = pq.ParquetFile(path)
                for rg in range(s, e):
                    # use_threads=False: each worker decodes its OWN row
                    # group single-threaded — the pool is already one
                    # worker per core, and Arrow's default per-process
                    # thread pool (ncpu threads x 31 workers) oversubscribes
                    # the box ~30x (measured 3x per-page CPU inflation)
                    pages = pf.read_row_group(rg, columns=self.columns,
                                              use_threads=False)
                    outs.append(pages_to_points(self.extract(pages)))
        return pa.concat_tables(outs)


_FUSED_STAGE: FusedPagesToPointsStage | None = None


def fused_pages_to_points_task(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of the fused stage (extract_mode='fused_tasks').

    Scheduled as plain map_batches tasks on Ray's long-lived REUSABLE
    worker processes (cached stage, construct-once per process) instead of
    a per-execution actor pool.  An actor pool spawns fresh processes on
    EVERY dataset execution — at 31 actors that is seconds of spawn+import
    inside the measured run and between pipeline phases; reusable workers
    persist across executions, so a warmed cluster stays warm.  Use the
    actor-pool class only when stage state is expensive (models, indexes).
    """
    global _FUSED_STAGE
    if _FUSED_STAGE is None:
        _FUSED_STAGE = FusedPagesToPointsStage()
    return _FUSED_STAGE(batch)


def extract_text_oracle(tbl: pa.Table) -> pa.Table:
    """Single-process oracle: same kernel, sequential, whole table."""
    stage = ExtractTextStage()
    return stage(tbl)
