"""Python UDTF surface (SURVEY.md §2.12) — the one UDF form the rest of the
engine doesn't otherwise exercise.

The engine's Python boundary policy stands: hot paths use JVM expressions or
Arrow-batched mapInPandas/applyInPandas (row-at-a-time UDTFs are the slow
path). A UDTF earns its place where its unique features matter — a lateral
table function usable directly from SQL (``SELECT ... FROM tbl, udtf(col)``)
with per-row fan-out that plain scalar UDFs can't express. :class:`SpanRows`
is that surface, deliberately mirroring :func:`operators.corpus.doc_spans`
so a test can pin the Python path to the JVM path row-for-row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, span string")
class SpanRows:
    """Lateral fan-out of a document into its non-overlapping k-token spans.

    SQL usage once registered (``spark.udtf.register("span_rows", SpanRows)``):

        SELECT d.doc_id, s.pos, s.span
        FROM documents d, LATERAL span_rows(d.text, 8) s

    Semantics match ``doc_spans`` exactly: spans are ``text.split(' ')``
    sliced at a fixed grid, the final span may be ragged. The JVM
    sequence+slice+posexplode form in ``operators/corpus.py`` is the
    production path; this is the SQL-callable API-surface twin.
    """

    def eval(self, text: str, k: int):  # noqa: D102 — UDTF contract method
        if text is None or k is None or k <= 0:
            return
        w = text.split(" ")
        for i, start in enumerate(range(0, len(w), k)):
            yield i, " ".join(w[start : start + k])
