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
    # ---- round-9 new queries prepend HERE (keep list length <= 50) ----
    "bootstrap_ci_means",          # new: deterministic multiplier CI
    "lpa_communities",             # new: synchronous label propagation
    "password_spray_windows",      # new: low-and-slow auth spray gate
    "ann_matryoshka_audit",        # new: MRL prefix-dim recall audit
    "touch_attribution",           # new: U-shaped revenue attribution
    "cusum_changepoints",          # new: CUSUM persistent-shift detector
    "oov_rate_by_source",          # new: vocab-coverage OOV audit
    "link_prediction_scores",      # new: common-neighbor/Jaccard 2-hop
    "ewma_control_chart",          # new: fixed-point EWMA spike alerts
    "stream_ewma_alerts_bounded",  # new: stateful streaming EWMA twin
    "training_shard_manifest",     # new: seeded global-shuffle shards
    "score_quantile_normalize",    # new: per-source rank calibration
    "dns_tunnel_scores",           # new: DNS exfil label statistics
    # r8-registered, never externally sampled (registered after r8's
    # prefix filled) -- claims until the driver hash-checks them:
    "ip_prefix_anonymize_audit",
    "dedup_cascade_stages",
    "decontaminate_containment",
    "stream_histogram_quantiles_bounded",
    "beaconing_pairs",
    "impossible_travel_hops",
    "decayed_risk_scores",        # r9: dead first age_h withColumn removed
    "typosquat_domain_verdicts",
    "table_pii_profile",
    "stream_decayed_counters_bounded",
    "token_drift_tvd",            # r9: oracle gained the zero-total guard
    "event_transition_matrix",
    "basket_association_rules",
    "top_session_paths",
    "new_entity_emergence",
    "ktruss_edges",
    # round-9 changed queries -- re-verify first:
    "alert_merge_greedy",         # r9: gained the full-payload JSON oracle
    "stream_pattern_match_ooo_bounded",  # r9: 1-in-5 key subset + oracle
    # last green driver row is ROUND 5 -- the head of the 44-query
    # r5-stale tail (computed from CORRECTNESS_r02..r08); r9-new queries
    # displaced the rest, which lead r10 (listed below)
    "classify_strict_json",
    "rule_alerts_native",
    "normalized_artifacts",
    "alert_merge_windowed",
    "alert_merge_greedy_groups",
    "rule_datatype_routing",
    "streamquery_feedback",
    "simhash_neardup_pairs",
    "source_kinesis_decode",
    "source_sns_extract",
    "source_s3_records",
    "app_source_backfill",
    "fuzzy_name_pairs",
    "inverted_index_terms",
    "cms_heavy_hitters",
    "table_profile_lineitem",
    "zorder_pruning_ledger",
    "cdc_merge_snapshot",
    "salted_topk_per_type",
    # ^ 50 entries -- the external sampler's full prefix (13 r9-new +
    # 16 never-sampled + 2 r9-changed + 19 of the r5-stale tail). Still
    # r5-stale after r9 (lead r10 with them): winsorize_event_values,
    # scd2_status_history, compaction_plan_bins,
    # stream_cdc_apply_bounded,
    # equidepth_histogram,
    # referential_integrity_audit,
    # freshness_gap_report, seasonal_rate_spikes,
    # stream_dedup_gate_bounded, kmv_sketch_rollup,
    # train_eval_split_manifest, kcore_dense_nodes, snapshot_diff_feed,
    # incremental_agg_maintenance, weighted_sample_docs,
    # app_source_salesforce, app_source_stream_resume,
    # bpe_learned_merges, bpe_encode_tokens, entity_resolution_groups,
    # incremental_dedup_pairs, salted_exact_distinct_users,
    # stream_first_seen_bounded, histogram_quantile_sketch,
    # stream_rate_alerts_bounded.
    # Staleness is STRUCTURAL: with a ~210-query registry and a 50-slot
    # external sample, a full refresh takes 4+ rounds -- the in-repo
    # parity sweep (tests/test_oracle_parity) covers every query every
    # run; this list only decides which names the external sampler
    # re-checks soonest. After r9 the oldest driver-green row for any
    # oracle-paired query should be r5 (the 23 leftovers above), with
    # everything else r6+.
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
