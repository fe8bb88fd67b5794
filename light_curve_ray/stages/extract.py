"""Text-extraction stage (SURVEY §2b-O2): HTML -> canonical text.

Stateful actor-pool stage: pass the CLASS to ``map_batches`` so Ray builds an
actor pool — parser state (compiled regexes, tag tables) is built once per
actor in ``__init__``, batches flow through ``__call__``.  The same kernel
function (kernels/textkit.extract_text) is callable single-process, which is
how the byte-identical-per-url invariant is verified (tests/test_pages_pipeline.py).

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
        html = batch["html"]
        need = pc.is_null(text).to_numpy(zero_copy_only=False)
        if need.any():
            text_py = text.to_pylist()
            html_py = html.to_pylist()
            for i in need.nonzero()[0]:
                h = html_py[i]
                text_py[i] = extract_text(h) if h is not None else ""
            text = pa.array(text_py, pa.string())
        batch = batch.set_column(batch.column_names.index("text"), "text", text)
        if self.drop_html:
            batch = batch.drop_columns(["html"])
        return batch


def extract_text_oracle(tbl: pa.Table) -> pa.Table:
    """Single-process oracle: same kernel, sequential, whole table."""
    stage = ExtractTextStage()
    return stage(tbl)
