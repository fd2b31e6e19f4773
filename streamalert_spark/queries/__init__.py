"""Query registry — the engine's public, driver-checkable query surface.

Every implemented operator family from SURVEY.md §2 registers at least one
named query here. Each entry pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with an equivalent DuckDB-runnable ANSI SQL oracle (or None for
genuinely non-SQL-expressible operators — the driver then records a weaker
rows-only check).

Determinism contract (both sides must hash-match):
- money/metric aggregates go through DECIMAL so sum order cannot perturb
  low-order float bits, then cast back to DOUBLE;
- every computed column is aliased identically in Spark and oracle SQL;
- ORDER BY always carries a unique tie-break column;
- hashing uses md5-of-string (portable) — never engine-native hash().
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RegisteredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a named query with its DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# Names surfaced FIRST in the registry (and therefore in queries()/
# oracle_sql()). External correctness harnesses that sample a prefix of
# the registry check these before anything else; the list holds (a)
# queries that have never had an external correctness row and (b)
# queries whose underlying operators changed most recently and should be
# re-verified first. Every other query follows in registration order.
_VERIFY_FIRST = [
    # ---- round-8 new queries prepend HERE (keep list length <= 50) ----
    "span_dedup_scrub",            # new: first-occurrence span dedup rewrite
    "bigram_lm_doc_scores",        # new: fixed-point bigram-LM filter
    "cross_source_ngram_matrix",   # new: source-pair contamination matrix
    "embedding_quantize_topk",     # new: SQ8 int8-dot ANN
    "skew_key_diagnostics",        # new: hot-key share/ratio report
    "interval_overlap_agg",        # new: grid-bucketed overlap join
    "mad_outlier_summary",         # new: median/MAD robust outliers
    "stream_hll_distinct_bounded",  # new: streaming mergeable HLL state
    "resample_fill_gaps",          # new: zero-filled hourly spine
    "stream_pattern_match_ooo_bounded",  # new: watermark-staged OOO CEP
    "gopher_quality_flags",        # new: Gopher document quality rules
    "quality_logistic_score",      # new: fixed-weight quality classifier
    "cross_doc_dup_rate",          # new: cross-doc 4-gram duplication
    "user_risk_rfm",               # new: RFM behavioral banding
    "pseudonymize_consistent",     # new: keyed pseudonym + join audit
    "dedup_keep_best",             # new: per-cluster representative keep
    "hard_negative_mining",        # new: cross-label top-k negatives
    "stream_static_enrich_bounded",  # new: stream-static dim join
    # round-8 changed operators — re-verify first: cep.py grew state
    # eviction (remove-on-reset + timeouts), the ti ingester's dedup is
    # now arrival-order last-write-wins, the alert-writer demo batches
    # are larger (physical only)
    "stream_pattern_match_bounded",
    "threat_intel_feed_ingest",
    "alert_output_writer_ledger",
    # last green driver row is ROUND 4 — the full 29-query stale tail
    # (computed from CORRECTNESS_r02..r07)
    "q4_priority_with_returns",
    "q6_forecast_revenue",
    "q12_shipping_priority_counts",
    "q13_customer_distribution",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    "time_rollup_multi",
    "set_operations_cohorts",
    "ranking_functions_surface",
    "pack_sequences",
    "vocab_topk",
    "mixture_reweight",
    "tfidf_top_terms",
    "bpe_merge_pairs",
    "pii_detect_redact",
    "clean_text_normalize",
    "udtf_tokenize_offsets",
    "udaf_lower_median",
    "ivf_ann_topk",
    "boilerplate_ngram_spans",
    "graph_triangles",
    "pagerank_top_nodes",
    "dedup_resolution",
    "dedup_components",
    "lsh_verified_pairs",
    "semantic_cell_neardup",
    "semantic_decontamination",
    # ^ 50 entries — the external sampler's full prefix (18 r8-new or
    # r8-changed + 3 re-gated + the complete 29-query r4-stale tail).
    # Registered after the prefix filled (lead r9 with them):
    # ip_prefix_anonymize_audit, dedup_cascade_stages,
    # decontaminate_containment, stream_histogram_quantiles_bounded,
    # beaconing_pairs, impossible_travel_hops, decayed_risk_scores,
    # typosquat_domain_verdicts, table_pii_profile,
    # stream_decayed_counters_bounded, token_drift_tvd,
    # event_transition_matrix, basket_association_rules,
    # top_session_paths, new_entity_emergence, ktruss_edges.
    # Staleness is
    # STRUCTURAL: with a
    # ~177-query registry and a 50-slot external sample, a full refresh
    # takes 4 rounds — the in-repo parity sweep (tests/test_oracle_parity)
    # covers every query every run; this list only decides which names
    # the external sampler re-checks soonest. After r8 the oldest
    # driver-green row for any oracle-paired query should be r5.
]


def load_all() -> dict[str, RegisteredQuery]:
    """Import every query module (side-effect: registration) and return the
    registry, ordered verify-first (see _VERIFY_FIRST) then by registration."""
    from streamalert_spark.queries import (  # noqa: F401
        analytics_ext,
        analytics_sketch,
        curation_ext,
        llm_ops,
        multimodal_surface,
        parsers_surface,
        pii_surface,
        pipeline,
        pipeline_ext,
        scale_ext,
        sources_surface,
        sql_joins_ext,
        sql_surface,
        sql_tpch_ext,
        surface_ext,
        training_ext,
        warehouse_ext,
    )

    head = [n for n in _VERIFY_FIRST if n in QUERIES]
    ordered = {n: QUERIES[n] for n in head}
    ordered.update({n: q for n, q in QUERIES.items() if n not in ordered})
    return ordered
