"""Python UDTF extension surface (SURVEY.md §2.8) — user-defined TABLE
functions registrable into Spark SQL and usable via LATERAL joins.

UDTFs are the Python slow path: anything expressible with
posexplode/transform (like this tokenizer) should be — and elsewhere in
this repo is — a native expression. The shipped UDTFs are
Arrow-optimized (useArrow=True -> ArrowEvalPythonUDTF: batched Arrow
transfer instead of row-at-a-time pickling). The deliverable here is the
extension POINT: users of the reference register custom per-record
expansions (log splitters, IOC extractors) and need the same hook on
Spark. Keep UDTF bodies off the hot ingest path; they exist for
long-tail custom expansions where expression composition runs out.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="idx bigint, token string, start bigint", useArrow=True)
class TokenizeOffsets:
    """(index, token, character offset) per whitespace token — the
    token-with-span shape annotation pipelines need."""

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        if text is None:
            return
        pos = 0
        for i, tok in enumerate(text.split(" ")):
            yield i, tok, pos
            pos += len(tok) + 1


def register_udtfs(spark: SparkSession) -> None:
    """Register the shipped UDTFs into the session's SQL catalog."""
    spark.udtf.register("tokenize_offsets", TokenizeOffsets)
