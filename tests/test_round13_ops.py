"""Round-13 pins: op-cache lifecycle (no cached frame survives into the
next query's execution) and the registry wrapper that enforces it."""

from __future__ import annotations

from streamalert_spark.ops import dedup


def _mini_docs(spark):
    from streamalert_spark.session import local_rows_df

    rows = [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w v u")]
    return local_rows_df(spark, rows, "doc_id bigint, text string")


def test_swap_cache_released_between_queries(spark):
    """A _swap_cache'd frame from one op invocation must not stay
    persisted once the NEXT registry query starts (r12 verdict item 4:
    lingering corpus-scale caches bill memory to every later query)."""
    docs = _mini_docs(spark)
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    assert pairs.count() >= 1
    cached = dedup._OP_CACHE.get("jaccard")
    assert cached is not None and cached.storageLevel.useMemory

    # entering ANY registered query releases every op cache first
    from streamalert_spark.queries import load_all

    registry = load_all()
    registry["dedup_exact"].fn(spark, "/root/testdata/sf0.001")
    assert "jaccard" not in dedup._OP_CACHE
    assert not cached.storageLevel.useMemory


def test_release_op_caches_idempotent_and_complete(spark):
    docs = _mini_docs(spark)
    dedup.ngram_jaccard_pairs(docs, threshold=0.5).count()
    dedup.minhash_lsh_candidates(docs).count()
    assert dedup._OP_CACHE
    dedup.release_op_caches()
    assert dedup._OP_CACHE == {}
    dedup.release_op_caches()  # second call is a no-op, not an error
    assert dedup._OP_CACHE == {}


def test_within_query_reuse_untouched(spark):
    """The release hook must not break within-query cache reuse: results
    through the registry wrapper stay identical to the raw op."""
    docs = _mini_docs(spark)
    out = sorted(
        tuple(r)
        for r in dedup.lsh_verified_pairs(docs, threshold=0.5).collect()
    )
    out2 = sorted(
        tuple(r)
        for r in dedup.lsh_verified_pairs(docs, threshold=0.5).collect()
    )
    assert out == out2
