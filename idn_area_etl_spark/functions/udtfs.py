"""User-defined table functions — the engine's UDTF extension surface.

The reference's only extension point is the extractor plugin
(SURVEY.md §2.10; reference extractors.py:24-100): a table-in,
multi-row-out transform.  Spark 4 exposes the same shape to end users
as Python UDTFs (one input row → many output rows, usable in SQL via
``LATERAL``).  UDTFs are the *slow path* — row-at-a-time Python — so
the engine keeps every built-in operator as native expressions
(``explode`` + higher-order functions) and offers UDTFs only for
logic that genuinely needs imperative per-row iteration.

``WordBigrams`` is the registered demonstration: it is deliberately
equivalent to the native ``explode``-based pipeline so tests can pin
that the UDTF surface produces identical results to the fast path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, bigram: string")
class WordBigrams:
    """Emit (position, word-bigram) rows for a text value.

    SQL: ``SELECT t.* FROM docs, LATERAL word_bigrams(text) t``.
    """

    def eval(self, text: str):  # noqa: D102 — Spark UDTF protocol
        toks = [t for t in (text or "").lower().split() if t]
        for i in range(len(toks) - 1):
            yield i, f"{toks[i]} {toks[i + 1]}"


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on a session (idempotent)."""
    spark.udtf.register("word_bigrams", WordBigrams)
