"""Warehouse temporal-dimension surface: SCD2 history build from a
changelog and the point-in-time join that reads it back — the standard
pattern for "what did this entity look like when the fact happened?".

Timestamps in history outputs are emitted as explicitly-formatted strings
(with 'current' for the open interval) — NULL-timestamp cells and raw
timestamp rendering are both harness hazards; formatted strings are
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.queries import query
from streamalert_spark.session import read_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# changelog -> compressed history, shared by both oracles
_HIST_CTE = """
c AS (
  SELECT user_id, event_type AS status, ts,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events WHERE user_id IS NOT NULL
),
ch AS (SELECT user_id, status, ts FROM c WHERE prev IS NULL OR status <> prev),
hist AS (
  SELECT user_id, status, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
  FROM ch
)
"""

_SCD2_ORACLE = f"""
WITH {_HIST_CTE}
SELECT user_id, status,
       strftime(valid_from, '{_TS_FMT_DUCK}') AS valid_from,
       COALESCE(strftime(valid_to, '{_TS_FMT_DUCK}'), 'current') AS valid_to,
       CAST(valid_to IS NULL AS BIGINT) AS is_current
FROM hist
ORDER BY user_id, valid_from
"""


def _history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.scd import scd2_from_changelog

    ev = read_table(spark, sf_dir, "events")
    changes = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id", F.col("event_type").alias("status"), "ts")
    )
    return scd2_from_changelog(changes, ["user_id"], ["status"], "ts")


@query("scd2_status_history", oracle=_SCD2_ORACLE,
       doc="SCD Type-2 dimension build from a keyed changelog: "
           "consecutive-duplicate compression (an event that does not "
           "change the tracked attribute must not open a version), then "
           "lead(ts) closes each [valid_from, valid_to) interval; the "
           "open interval is the current row. Two key-partitioned "
           "windows — one shuffle of the changelog, O(1) state per row. "
           "The write side of every 'as the entity was then' question.")
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _history(spark, sf_dir)
    return (
        h.select(
            "user_id", "status",
            F.date_format("valid_from", _TS_FMT_SPARK).alias("valid_from"),
            F.coalesce(F.date_format("valid_to", _TS_FMT_SPARK),
                       F.lit("current")).alias("valid_to"),
            "is_current",
        )
        .repartition(1).sortWithinPartitions("user_id", "valid_from")
    )


_PIT_ORACLE = f"""
WITH {_HIST_CTE},
probes AS (
  SELECT event_id, user_id, ts + INTERVAL 1 HOUR AS probe_ts
  FROM events WHERE user_id IS NOT NULL AND event_id % 100 = 0
)
SELECT p.event_id, p.user_id,
       strftime(p.probe_ts, '{_TS_FMT_DUCK}') AS probe_ts, h.status
FROM probes p JOIN hist h ON h.user_id = p.user_id
  AND h.valid_from <= p.probe_ts
  AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
ORDER BY p.event_id
"""


@query("scd2_point_in_time", oracle=_PIT_ORACLE,
       doc="Point-in-time (temporal) join against the SCD2 history: each "
           "probe attaches the dimension version whose [valid_from, "
           "valid_to) interval contains its timestamp — at most one "
           "match because intervals partition the timeline per key. The "
           "dimension history rides a SIZE-GATED broadcast (a multi-TB "
           "SCD2 history of a large dimension falls back to a key-equi "
           "sort-merge join with the interval predicate as post-filter); "
           "under the gate the interval predicate evaluates fact-side and "
           "the fact table never shuffles. Probes are events sampled at "
           "event_id % 100, asked one hour into their future.")
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.scd import point_in_time_join

    ev = read_table(spark, sf_dir, "events")
    probes = (
        ev.filter(F.col("user_id").isNotNull()
                  & (F.col("event_id") % 100 == 0))
        .select("event_id", "user_id",
                (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("probe_ts"))
    )
    hist = _history(spark, sf_dir).drop("is_current")
    out = point_in_time_join(probes, hist, ["user_id"], "probe_ts")
    return (
        out.select("event_id", "user_id",
                   F.date_format("probe_ts", _TS_FMT_SPARK).alias("probe_ts"),
                   "status")
        .repartition(1).sortWithinPartitions("event_id")
    )


# --------------------------------------------------------- compaction plan

_COMPACT_TARGET = 131072  # bytes per output file (demo scale)
_ROW_BYTES = 512          # synthetic per-row cost for the file ledger

_COMPACT_ORACLE = f"""
WITH files AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) * {_ROW_BYTES} AS bytes
  FROM events GROUP BY 1, 2
),
planned AS (
  SELECT event_type, hour, bytes,
         CAST(floor((SUM(bytes) OVER (PARTITION BY event_type ORDER BY hour
                                      ROWS UNBOUNDED PRECEDING) - bytes)
                    / {float(_COMPACT_TARGET)!r}) AS BIGINT) AS bin
  FROM files
)
SELECT event_type, bin, COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       strftime(MIN(hour), '{_TS_FMT_DUCK}') AS first_hour,
       strftime(MAX(hour), '{_TS_FMT_DUCK}') AS last_hour
FROM planned GROUP BY 1, 2
ORDER BY event_type, bin
"""


@query("compaction_plan_bins", oracle=_COMPACT_ORACLE,
       doc="Small-file compaction plan (the OPTIMIZE primitive): "
           "hour-sized ingest 'files' per event type pack sequentially "
           "into target-size output bins — bin = floor(bytes_before / "
           "target), one window pass per table partition, no global "
           "sort, and sequential packing preserves the partition's "
           "existing (time) order unlike first-fit-decreasing. The "
           "output ledger (files and bytes per bin, hour span) is what "
           "a maintenance job would execute; at 100 TB streaming ingest "
           "makes this the difference between open()-bound and "
           "bandwidth-bound scans.")
def compaction_plan_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.layout import compaction_plan

    ev = read_table(spark, sf_dir, "events")
    files = (
        ev.groupBy("event_type",
                   F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg((F.count(F.lit(1)) * _ROW_BYTES).alias("bytes"))
    )
    plan = compaction_plan(files, "event_type", "hour", "bytes",
                           _COMPACT_TARGET)
    return (
        plan.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_files"),
             F.sum("bytes").cast("bigint").alias("total_bytes"),
             F.date_format(F.min("hour"), _TS_FMT_SPARK).alias("first_hour"),
             F.date_format(F.max("hour"), _TS_FMT_SPARK).alias("last_hour"))
        .repartition(1).sortWithinPartitions("event_type", "bin")
    )


# ------------------------------------------------- referential integrity

_RI_ORACLE = """
SELECT 'events.user_id -> customer' AS fk,
       COUNT(*) AS orphan_rows,
       COUNT(DISTINCT e.user_id) AS orphan_keys
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
WHERE e.user_id IS NOT NULL AND c.c_custkey IS NULL
UNION ALL
SELECT 'lineitem.l_orderkey -> orders',
       COUNT(*), COUNT(DISTINCT l.l_orderkey)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'orders.o_custkey -> customer',
       COUNT(*), COUNT(DISTINCT o.o_custkey)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
ORDER BY fk
"""


def _orphans(fact: DataFrame, fk: str, dim: DataFrame, pk: str,
             label: str) -> DataFrame:
    orphan = (fact.filter(F.col(fk).isNotNull())
              .join(dim.select(F.col(pk).alias(fk)), [fk], "left_anti"))
    return orphan.agg(
        F.lit(label).alias("fk"),
        F.count(F.lit(1)).alias("orphan_rows"),
        F.count_distinct(F.col(fk)).alias("orphan_keys"),
    )


@query("referential_integrity_audit", oracle=_RI_ORACLE,
       doc="Cross-table referential-integrity audit: orphaned foreign "
           "keys counted for three relationships (events.user_id and "
           "orders.o_custkey against customer, lineitem.l_orderkey "
           "against orders) via keys-only left-anti joins — the ingest "
           "health gate that catches a partial dimension load before "
           "downstream joins silently drop fact rows. Dim sides project "
           "to the key column only (broadcastable); a clean relationship "
           "still reports its zero row, so the audit shape is stable.")
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    parts = [
        _orphans(ev, "user_id", cust, "c_custkey",
                 "events.user_id -> customer"),
        _orphans(li, "l_orderkey", orders, "o_orderkey",
                 "lineitem.l_orderkey -> orders"),
        _orphans(orders, "o_custkey", cust, "c_custkey",
                 "orders.o_custkey -> customer"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.repartition(1).sortWithinPartitions("fk")


# ------------------------------------------------------- freshness gaps

_GAPS_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h
  FROM events
),
bounds AS (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM b GROUP BY 1),
expected AS (
  SELECT event_type, CAST(x AS BIGINT) AS h
  FROM bounds, UNNEST(generate_series(lo, hi, 3600)) t(x)
),
actual AS (SELECT DISTINCT event_type, h FROM b)
SELECT e.event_type,
       strftime(make_timestamp(e.h * 1000000), '%Y-%m-%d %H:00') AS missing_hour
FROM expected e LEFT JOIN actual a USING (event_type, h)
WHERE a.h IS NULL
ORDER BY event_type, missing_hour
"""


@query("freshness_gap_report", oracle=_GAPS_ORACLE,
       doc="Ingest freshness/completeness audit: hours with ZERO events "
           "per type between each type's first and last hour — "
           "sequence() generates the expected hour spine (group-bounds "
           "sized, no calendar table), a left-anti join against the "
           "observed hours yields the gaps. The monitoring primitive "
           "behind 'did the feed stall' alerts; at 100 TB the spine stays "
           "tiny (hours, not rows) so the audit costs one distinct over "
           "the scan.")
def freshness_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h"))
    bounds = b.groupBy("event_type").agg(F.min("h").alias("lo"),
                                         F.max("h").alias("hi"))
    expected = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("h"))
    actual = b.distinct()
    missing = expected.join(actual, ["event_type", "h"], "left_anti")
    return (
        missing.select(
            "event_type",
            F.date_format(F.timestamp_seconds("h"),
                          "yyyy-MM-dd HH:00").alias("missing_hour"))
        .repartition(1).sortWithinPartitions("event_type", "missing_hour")
    )


# -------------------------------------------- incremental agg maintenance

_INC_AGG_ORACLE = """
WITH dec AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
daily AS (
  SELECT event_type, day, COUNT(*) AS cnt, SUM(v) AS s, SUM(v * v) AS ss
  FROM dec GROUP BY 1, 2
),
merged AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
         SUM(s) AS ms, SUM(ss) AS mss
  FROM daily GROUP BY 1
),
direct AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
  FROM dec GROUP BY 1
)
SELECT m.event_type, m.n AS n_events,
       ROUND(CAST(m.ms AS DOUBLE) / m.n, 6) AS avg_merged,
       ROUND(CAST(d.s AS DOUBLE) / m.n, 6) AS avg_direct,
       ROUND(sqrt(CAST(m.mss AS DOUBLE) / m.n
                  - (CAST(m.ms AS DOUBLE) / m.n)
                    * (CAST(m.ms AS DOUBLE) / m.n)), 6) AS std_merged,
       ROUND(sqrt(CAST(d.ss AS DOUBLE) / m.n
                  - (CAST(d.s AS DOUBLE) / m.n)
                    * (CAST(d.s AS DOUBLE) / m.n)), 6) AS std_direct
FROM merged m JOIN direct d ON d.event_type = m.event_type
ORDER BY m.event_type
"""


@query("incremental_agg_maintenance", oracle=_INC_AGG_ORACLE,
       doc="Incremental (materialized-view) aggregate maintenance: "
           "per-day moment state (count, DECIMAL sum, DECIMAL sum of "
           "squares) merges by addition into totals whose avg/stddev "
           "EQUAL the direct full-scan computation — both paths are "
           "output columns, so the hash check proves the merge is "
           "lossless. Decimal moments are the reason: float sums are "
           "order-dependent and a daily-merged float avg would drift "
           "from the recompute; decimal addition is exact and "
           "associative. At 100 TB only the daily path runs — new days "
           "merge into the state table and history is never re-scanned.")
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    dec = ev.select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"))
    daily = (dec.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).alias("cnt"),
                  F.sum("v").alias("s"),
                  F.sum(F.col("v") * F.col("v")).alias("ss")))
    merged = (daily.groupBy("event_type")
              .agg(F.sum("cnt").cast("bigint").alias("n"),
                   F.sum("s").alias("ms"), F.sum("ss").alias("mss")))
    direct = (dec.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("dn"),
                   F.sum("v").alias("ds"),
                   F.sum(F.col("v") * F.col("v")).alias("dss")))
    j = merged.join(direct, "event_type")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_m = d("ms") / F.col("n")
    mean_d = d("ds") / F.col("n")
    return (
        j.select(
            "event_type", F.col("n").alias("n_events"),
            F.round(mean_m, 6).alias("avg_merged"),
            F.round(mean_d, 6).alias("avg_direct"),
            F.round(F.sqrt(d("mss") / F.col("n") - mean_m * mean_m), 6)
             .alias("std_merged"),
            F.round(F.sqrt(d("dss") / F.col("n") - mean_d * mean_d), 6)
             .alias("std_direct"),
        )
        .repartition(1).sortWithinPartitions("event_type")
    )


# ---------------------------------------------------------- join IVM

_IVM_JOIN_ORACLE = """
SELECT o.o_orderkey AS orderkey,
       o.o_custkey AS custkey,
       c.c_name AS c_name,
       CAST(o.o_totalprice AS DOUBLE) AS totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY orderkey
"""


@query("incremental_join_maintenance", oracle=_IVM_JOIN_ORACLE,
       doc="Incremental view maintenance for a JOIN (insert-only delta "
           "rule): the materialized orders x customer join is maintained "
           "under an insert batch on EACH side via dJ = dA><B + A><dB + "
           "dA><dB — every term joins a DELTA against a stored side "
           "(delta broadcast size-gated), so the stored relations are "
           "scanned but never shuffled and maintenance costs O(|delta| + "
           "matches), independent of the view size. The oracle is the "
           "full recompute over the complete tables: maintained == "
           "recomputed IS the IVM correctness theorem, hash-checked.")
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.ivm import maintain_join

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name")
    a_old = orders.filter(F.col("o_orderkey") % 4 != 0)
    a_delta = orders.filter(F.col("o_orderkey") % 4 == 0)
    b_old = cust.filter(F.col("custkey") % 5 != 0)
    b_delta = cust.filter(F.col("custkey") % 5 == 0)
    j_old = a_old.join(b_old, ["custkey"])
    maintained = maintain_join(j_old, a_old, a_delta, b_old, b_delta,
                               ["custkey"])
    return (
        maintained.select(
            F.col("o_orderkey").alias("orderkey"),
            "custkey",
            "c_name",
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .repartition(1).sortWithinPartitions("orderkey")
    )


# ---------------------------------------------------------- unpivot/melt

_UNPIVOT_ORACLE = """
SELECT measure, CAST(n AS BIGINT) AS n,
       CAST(total AS DOUBLE) AS total
FROM (
  SELECT 'l_quantity' AS measure, COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', COUNT(*),
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem
  UNION ALL
  SELECT 'l_discount', COUNT(*),
         SUM(CAST(l_discount AS DECIMAL(18,2))) FROM lineitem
  UNION ALL
  SELECT 'l_tax', COUNT(*),
         SUM(CAST(l_tax AS DECIMAL(18,2))) FROM lineitem
)
ORDER BY measure
"""


@query("unpivot_measure_totals", oracle=_UNPIVOT_ORACLE,
       doc="Wide-to-long UNPIVOT (DataFrame.unpivot — Spark's native "
           "melt, the inverse of the pivot surface): four lineitem "
           "measures unpivot into (measure, value) rows in the map "
           "stage, then one partial-aggregated groupBy(measure) — 4 "
           "groups however wide the table, decimal-exact sums. The "
           "long-form shape every per-metric monitoring/quality rollup "
           "consumes.")
def unpivot_measure_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)"))
              .cast("double").alias("total"))
        .repartition(1).sortWithinPartitions("measure")
    )


# ---------------------------------------------------------------------------
# Merkle-style replica anti-entropy — locate divergent buckets by digest.
# ---------------------------------------------------------------------------

from streamalert_spark.ops.sketch import hex_prefix_int, hex_prefix_int_sql

_AE_BUCKETS = 512
# Bucket digest = SUM(48-bit md5 prefixes) mod 2^62, with the sum carried
# EXACTLY (DuckDB HUGEINT / Spark DECIMAL(38,0)) before the reduction. A
# plain BIGINT sum wraps silently in Spark but errors in DuckDB once a
# bucket holds ~2^15 rows (~17M orders over 512 buckets) — an engine
# divergence at exactly the scale anti-entropy exists for. The explicit
# modulus keeps the digest algebra commutative and engine-identical at any
# row count (and is the identity at bench SFs, so values are unchanged).
_AE_DIGEST_MOD = 1 << 62

_AE_ORACLE = f"""
WITH a AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
b AS (
  SELECT k,
         cents + CASE WHEN substring(md5('upd:' || CAST(k AS VARCHAR)), 1, 2)
                           = '00' THEN 1 ELSE 0 END AS cents
  FROM a
  WHERE substring(md5('del:' || CAST(k AS VARCHAR)), 1, 2) <> '00'
),
da AS (
  SELECT k % {_AE_BUCKETS} AS bucket,
         md5(CAST(k AS VARCHAR) || ':' || CAST(cents AS VARCHAR)) AS h
  FROM a
),
db AS (
  SELECT k % {_AE_BUCKETS} AS bucket,
         md5(CAST(k AS VARCHAR) || ':' || CAST(cents AS VARCHAR)) AS h
  FROM b
),
sa AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_a,
         CAST(SUM({hex_prefix_int_sql('h')}) % {_AE_DIGEST_MOD} AS BIGINT)
           AS digest_a
  FROM da GROUP BY bucket
),
sb AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM({hex_prefix_int_sql('h')}) % {_AE_DIGEST_MOD} AS BIGINT)
           AS digest_b
  FROM db GROUP BY bucket
)
SELECT COALESCE(sa.bucket, sb.bucket) AS bucket,
       COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
       COALESCE(digest_a, 0) AS digest_a,
       COALESCE(digest_b, 0) AS digest_b
FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket
WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0)
   OR COALESCE(digest_a, 0) <> COALESCE(digest_b, 0)
ORDER BY bucket
"""


@query("replica_antientropy_buckets", oracle=_AE_ORACLE,
       doc="Merkle-style anti-entropy between a table and its replica: "
           "each side folds every row into a commutative per-bucket "
           "digest (sum of 48-bit md5 prefixes over the row's canonical "
           "key:cents string — order-independent, so partial aggregation "
           "and any partitioning produce the same digest), and only "
           "buckets whose (count, digest) pairs disagree surface. The "
           "replica is a deterministic md5-gated mutation of orders "
           "(~1/256 rows deleted, ~1/256 updated by one cent). This is "
           "how 100 TB replicas reconcile without shipping rows: two "
           "scans reduced to 512 bucket rows each, a tiny join, and "
           "divergent buckets alone proceed to row-level diff (at scale "
           "the bucket tree recurses; one level demonstrates the "
           "digest algebra). Float prices never enter the digest — "
           "integer cents do.")
def replica_antientropy_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (read_table(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").alias("k"),
                 F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                 .alias("cents")))
    ks = F.col("k").cast("string")
    b = (a.filter(F.substring(F.md5(F.concat(F.lit("del:"), ks)), 1, 2)
                  != "00")
         .select("k", (F.col("cents")
                       + F.when(F.substring(
                           F.md5(F.concat(F.lit("upd:"), ks)), 1, 2) == "00",
                           F.lit(1)).otherwise(F.lit(0))).alias("cents")))

    def digests(df, n_col, d_col):
        h = F.md5(F.concat(ks, F.lit(":"), F.col("cents").cast("string")))
        return (df.select((F.col("k") % _AE_BUCKETS).alias("bucket"),
                          hex_prefix_int(h).alias("hi"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).cast("bigint").alias(n_col),
                     (F.sum(F.col("hi").cast("decimal(38,0)"))
                      % F.lit(_AE_DIGEST_MOD)).cast("bigint")
                     .alias(d_col)))

    sa, sb = digests(a, "n_a", "digest_a"), digests(b, "n_b", "digest_b")
    joined = sa.join(sb, "bucket", "full_outer")
    return (
        joined.select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
            F.coalesce("digest_a", F.lit(0)).cast("bigint")
            .alias("digest_a"),
            F.coalesce("digest_b", F.lit(0)).cast("bigint")
            .alias("digest_b"))
        .filter((F.col("n_a") != F.col("n_b"))
                | (F.col("digest_a") != F.col("digest_b")))
        .repartition(1).sortWithinPartitions("bucket")
    )


# ---------------------------------------------------------------------------
# GDPR tombstone purge audit — delete-request propagation manifest.
# ---------------------------------------------------------------------------

_TOMBSTONE_ORACLE = """
WITH ev AS (
  SELECT 'events' AS table_name,
         CAST(COUNT(*) FILTER (WHERE substring(md5('erase:' ||
              CAST(user_id AS VARCHAR)), 1, 1) = '0') AS BIGINT)
           AS rows_purged,
         CAST(COUNT(*) FILTER (WHERE substring(md5('erase:' ||
              CAST(user_id AS VARCHAR)), 1, 1) <> '0') AS BIGINT)
           AS rows_retained,
         CAST(COUNT(DISTINCT CASE WHEN substring(md5('erase:' ||
              CAST(user_id AS VARCHAR)), 1, 1) = '0' THEN user_id END)
              AS BIGINT) AS subjects_purged
  FROM events WHERE user_id IS NOT NULL
),
o AS (
  SELECT 'orders' AS table_name,
         CAST(COUNT(*) FILTER (WHERE substring(md5('erase:' ||
              CAST(o_custkey AS VARCHAR)), 1, 1) = '0') AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE substring(md5('erase:' ||
              CAST(o_custkey AS VARCHAR)), 1, 1) <> '0') AS BIGINT),
         CAST(COUNT(DISTINCT CASE WHEN substring(md5('erase:' ||
              CAST(o_custkey AS VARCHAR)), 1, 1) = '0' THEN o_custkey END)
              AS BIGINT)
  FROM orders
),
c AS (
  SELECT 'customer' AS table_name,
         CAST(COUNT(*) FILTER (WHERE substring(md5('erase:' ||
              CAST(c_custkey AS VARCHAR)), 1, 1) = '0') AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE substring(md5('erase:' ||
              CAST(c_custkey AS VARCHAR)), 1, 1) <> '0') AS BIGINT),
         CAST(COUNT(DISTINCT CASE WHEN substring(md5('erase:' ||
              CAST(c_custkey AS VARCHAR)), 1, 1) = '0' THEN c_custkey END)
              AS BIGINT)
  FROM customer
)
SELECT * FROM ev UNION ALL SELECT * FROM o UNION ALL SELECT * FROM c
ORDER BY table_name
"""


@query("tombstone_purge_audit", oracle=_TOMBSTONE_ORACLE,
       doc="Right-to-erasure propagation manifest: a deterministic "
           "md5-gated subject set (~1/16 of ids) stands in for the "
           "tombstone table, and every subject-bearing table reports "
           "rows purged / retained / distinct subjects touched in ONE "
           "conditional-aggregate scan each (no per-table anti-join "
           "materialization — the purge itself would be the same "
           "predicate pushed into a rewrite). Per table this is a "
           "single partial-aggregated reduction to one row; tables "
           "audit independently, so a 100 TB estate fans out "
           "per-table with no cross-table shuffle.")
def tombstone_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def audit(table: str, id_col: str) -> DataFrame:
        df = read_table(spark, sf_dir, table)
        if table == "events":
            df = df.filter(F.col(id_col).isNotNull())
        gate = F.substring(
            F.md5(F.concat(F.lit("erase:"), F.col(id_col).cast("string"))),
            1, 1) == "0"
        agg = df.agg(
            F.sum(F.when(gate, 1).otherwise(0)).cast("bigint")
            .alias("rows_purged"),
            F.sum(F.when(gate, 0).otherwise(1)).cast("bigint")
            .alias("rows_retained"),
            F.count_distinct(F.when(gate, F.col(id_col))).cast("bigint")
            .alias("subjects_purged"))
        return agg.select(F.lit(table).alias("table_name"),
                          "rows_purged", "rows_retained", "subjects_purged")

    out = (audit("events", "user_id")
           .unionByName(audit("orders", "o_custkey"))
           .unionByName(audit("customer", "c_custkey")))
    return out.repartition(1).sortWithinPartitions("table_name")
