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
    # round-5 new or changed operators — verify first
    "inverted_index_terms",      # r4 driver-red: output now scalar postings
    "bloom_semijoin_reduction",  # new: portable bloom fact-scan pre-filter
    "cms_heavy_hitters",         # new: count-min sketch frequency estimates
    "table_profile_lineitem",    # new: one-pass data-quality profile
    "kmv_join_overlap",          # new: set-operation sketch (join planning)
    "zorder_pruning_ledger",     # new: Morton layout + file-skip audit
    "cdc_merge_snapshot",        # new: MERGE INTO changelog application
    "salted_topk_per_type",      # new: skew-safe exact top-k
    "winsorize_event_values",    # new: percentile clipping
    "scd2_status_history",       # new: SCD2 dimension build
    "scd2_point_in_time",        # new: temporal dimension join
    "compaction_plan_bins",      # new: small-file compaction planner
    "stream_cdc_apply_bounded",  # new: streaming MERGE INTO loop
    "equidepth_histogram",       # new: quantile-calibrated buckets
    "referential_integrity_audit",  # new: FK orphan audit
    "freshness_gap_report",      # new: missing-hour completeness audit
    "seasonal_rate_spikes",      # new: hour-of-day baseline anomalies
    "stream_dedup_gate_bounded",  # new: streaming ingest dedup gate
    "kmv_sketch_rollup",         # new: lossless sketch merge proof
    "train_eval_split_manifest",  # new: reproducible split membership
    "kcore_dense_nodes",         # new: iterative k-core peeling
    "snapshot_diff_feed",        # new: inverse CDC (snapshot diff)
    "incremental_agg_maintenance",  # new: lossless moment-state merge
    "weighted_sample_docs",      # new: deterministic E-S weighted sample
    "app_source_salesforce",     # new: salesforce protocol port
    "app_source_stream_resume",  # new: streaming checkpoint-restart resume
    "bpe_learned_merges",        # gained a recursive-CTE oracle (was rows-only)
    "bpe_encode_tokens",         # new: tokenizer encode step
    "fuzzy_name_pairs",          # prefix-filtered q-gram blocking
    "entity_resolution_groups",  # new: fuzzy graph -> components capstone
    "incremental_dedup_pairs",   # new: cross-corpus ingest dedup gate
    "salted_exact_distinct_users",  # new: skew-safe exact distinct
    "stream_first_seen_bounded",    # new: stateful streaming under the hash gate
    "histogram_quantile_sketch",    # new: mergeable quantile sketch
    "stream_rate_alerts_bounded",   # new: windowed streaming alerts under the hash gate
    "app_source_backfill",       # _rows/record_payload seam touched
    # last green driver row is ROUND 2 — oldest signal, re-verify now
    "classify_strict_json",
    "rule_alerts_native",
    "normalized_artifacts",
    "threat_intel_hits",
    "lookup_enrich",
    "alert_merge_windowed",
    "alert_merge_greedy",
    "alert_merge_greedy_groups",
    "rule_datatype_routing",
    "streamquery_feedback",
    "simhash_neardup_pairs",
    "source_kinesis_decode",
    "source_sns_extract",
    "source_s3_records",
    "q1_pricing_summary",
    "revenue_by_nation",
    "q3_shipping_priority",
    "scheduled_hourly_counts",
    "rule_promotion_counts",
    "json_extract_props",
    "string_filter_surface",
    "topn_per_user",
    "cidr_exclusion_filter",
    "log_patterns_route",
    "optional_backfill_bool",
    "nested_csv_column",
    # last green driver row is ROUND 3 — core families next
    "parse_csv_strict",
    "parse_csv_multiline",
    "parse_kv",
    "parse_syslog",
    "json_regex_key_extract",
    "parse_json_envelope_explode",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_lsh_candidates",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
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
