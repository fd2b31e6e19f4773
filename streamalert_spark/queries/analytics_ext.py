"""Extended analytics queries: sessionization, rollup aggregates, the
LSH-bucketed ANN scale path, and a composite corpus-quality filter.

These go beyond the reference's literal surface (SURVEY.md §7.2 item 10 /
BASELINE.json north star) but stay oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from streamalert_spark.ops import dedup, text
from streamalert_spark.queries import query
from streamalert_spark.session import read_table


# ---------------------------------------------------------------- sessionization

_SESSION_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, es,
         CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY es, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
numbered AS (
  SELECT user_id, event_id, ts, es,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY es, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(es) AS session_start_s,
       MAX(es) AS session_end_s,
       MAX(es) - MIN(es) AS duration_s
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@query("sessionize_events", oracle=_SESSION_ORACLE,
       doc="Gap-based sessionization (30-min inactivity) via window functions.")
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es")
    )
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(F.col("es") - F.lag("es").over(w) > 1800, 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("es").alias("session_start_s"),
            F.max("es").alias("session_end_s"),
            (F.max("es") - F.min("es")).alias("duration_s"),
        )
        .repartition(1).sortWithinPartitions("user_id", "session_id")
    )


# ---------------------------------------------------------------- rollup

_ROLLUP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("rollup_pricing", oracle=_ROLLUP_ORACLE,
       doc="ROLLUP grouping-sets aggregate with decimal-exact sums.")
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .repartition(1).sortWithinPartitions(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


# ---------------------------------------------------------------- LSH ANN scale path

def _hyperplanes(num_planes: int = 6, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 planes shared verbatim with the oracle SQL."""
    return [
        [1.0 if (i * (k + 3) + k) % 7 < 3 else -1.0 for i in range(dim)]
        for k in range(num_planes)
    ]


def _lsh_ann_oracle(threshold: float = 0.4) -> str:
    planes = _hyperplanes()
    bit_exprs = []
    for plane in planes:
        lit = "[" + ", ".join(str(x) for x in plane) + "]"
        bit_exprs.append(
            "CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit}::DOUBLE[])[i])) >= 0 "
            "THEN '1' ELSE '0' END"
        )
    bucket = " || ".join(bit_exprs)
    cos = """
    ROUND(
      list_sum(list_transform(range(1, 65),
               i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
         * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
    6)"""
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
)
SELECT x.vec_id AS a, y.vec_id AS b, {cos} AS score
FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE {cos} >= {threshold}
ORDER BY a, b
"""


@query("ann_lsh_bucketed", oracle=_lsh_ann_oracle(),  # 0.4: corpus max pair ~0.6
       doc="Random-hyperplane LSH bucketing + exact cosine verify — the ANN "
           "scale path (bucket join instead of cross join).")
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.similarity import lsh_bucketed_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    return lsh_bucketed_pairs(emb, _hyperplanes(), threshold=0.4).repartition(1).sortWithinPartitions("a", "b")


# ---------------------------------------------------------------- corpus quality filter

_CORPUS_ORACLE = """
WITH canon AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
stats AS (
  SELECT d.doc_id, d.lang,
         len(string_split(d.text, ' ')) AS n_tokens,
         CAST(len(list_filter(string_split(d.text, ' '),
              w -> list_contains(['a','the','and','of','to','in','is','it'], w))) AS DOUBLE)
           / len(string_split(d.text, ' ')) AS stop_ratio
  FROM documents d JOIN canon c ON d.doc_id = c.doc_id
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM stats
WHERE n_tokens >= 30 AND stop_ratio >= 0.01
ORDER BY doc_id
"""


@query("corpus_quality_filter", oracle=_CORPUS_ORACLE,
       doc="Composite training-data filter: exact-dedup canonical docs with "
           "token-count and stopword-ratio gates.")
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    canon = dedup.exact_dedup(docs).select(F.col("canonical_doc_id").alias("doc_id"))
    toks = text.tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda w: w.isin(text.EN_STOPWORDS))).cast("double") / n_tokens
    )
    return (
        docs.join(canon, "doc_id", "left_semi")
        .select("doc_id", "lang", n_tokens.cast("bigint").alias("n_tokens"),
                stop_ratio.alias("stop_ratio"))
        .filter((F.col("n_tokens") >= 30) & (F.col("stop_ratio") >= 0.01))
        .drop("stop_ratio")
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------- funnel analysis

_FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
  FROM events
),
v AS (
  SELECT user_id, MIN(es) AS t1 FROM e WHERE event_type = 'view'
  GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.es) AS t2, MIN(v.t1) AS t1
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.es > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.es) AS t3, MIN(c.t2) AS t2
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.es > c.t2
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT '1_view' AS stage, COUNT(*) AS n_users,
         CAST(NULL AS DOUBLE) AS avg_step_secs FROM v
  UNION ALL
  SELECT '2_click', COUNT(*),
         ROUND(CAST(SUM(t2 - t1) AS DOUBLE) / COUNT(*), 6) FROM c
  UNION ALL
  SELECT '3_purchase', COUNT(*),
         ROUND(CAST(SUM(t3 - t2) AS DOUBLE) / COUNT(*), 6) FROM p
)
ORDER BY stage
"""


@query("funnel_stages", oracle=_FUNNEL_ORACLE,
       doc="Ordered 3-stage funnel (view -> click -> purchase, strictly "
           "increasing timestamps): per-user earliest-qualifying-event "
           "joins keyed on user_id, partial-aggregated; stage rollups are "
           "scalar aggregates.")
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("es"))
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("es").alias("t1")))
    c = (ev.filter(F.col("event_type") == "click").join(v, "user_id")
         .filter(F.col("es") > F.col("t1"))
         .groupBy("user_id")
         .agg(F.min("es").alias("t2"), F.min("t1").alias("t1")))
    p = (ev.filter(F.col("event_type") == "purchase").join(c, "user_id")
         .filter(F.col("es") > F.col("t2"))
         .groupBy("user_id")
         .agg(F.min("es").alias("t3"), F.min("t2").alias("t2")))
    stage = lambda df, name, cur, prev: df.agg(  # noqa: E731
        F.lit(name).alias("stage"),
        F.count(F.lit(1)).alias("n_users"),
        (F.round(F.sum(F.col(cur) - F.col(prev)).cast("double")
                 / F.count(F.lit(1)), 6) if prev else
         F.lit(None).cast("double")).alias("avg_step_secs"),
    )
    out = (
        stage(v, "1_view", "t1", None)
        .unionByName(stage(c, "2_click", "t2", "t1"))
        .unionByName(stage(p, "3_purchase", "t3", "t2"))
    )
    return out.repartition(1).sortWithinPartitions("stage")


# ---------------------------------------------------------------- cohort retention

_COHORT_ORACLE = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS wk
  FROM events
),
firsts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_wk, e.wk - f.cohort_wk AS wk_offset
  FROM e JOIN firsts f ON e.user_id = f.user_id
),
sizes AS (
  SELECT cohort_wk, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_wk
)
SELECT a.cohort_wk, a.wk_offset,
       COUNT(*) AS n_active,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(s.cohort_size), 6) AS retention
FROM activity a JOIN sizes s ON a.cohort_wk = s.cohort_wk
GROUP BY a.cohort_wk, a.wk_offset
ORDER BY a.cohort_wk, a.wk_offset
"""


@query("cohort_retention", oracle=_COHORT_ORACLE,
       doc="Weekly cohort retention: first-seen week per user, distinct "
           "(user, week-offset) activity, retention share per cohort cell "
           "— all aggregates partial-aggregated on user/cohort keys; the "
           "cohort-size side of the final join is weeks-scale and "
           "broadcasts.")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("wk"))
    firsts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_wk",
                (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"))
        .distinct()
    )
    sizes = firsts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    return (
        activity.join(F.broadcast(sizes), "cohort_wk")
        .groupBy("cohort_wk", "wk_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.round(F.count(F.lit(1)).cast("double")
                    / F.min("cohort_size"), 6).alias("retention"),
        )
        .repartition(1).sortWithinPartitions("cohort_wk", "wk_offset")
    )


# ---------------------------------------------------------------- latest per key

_LATEST_ORACLE = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
  FROM events
),
mx AS (SELECT user_id, MAX(es) AS es FROM e GROUP BY user_id)
SELECT e.user_id, e.es AS latest_es, MIN(e.event_id) AS event_id
FROM e JOIN mx ON e.user_id = mx.user_id AND e.es = mx.es
GROUP BY e.user_id, e.es
ORDER BY e.user_id
"""


@query("latest_event_per_user", oracle=_LATEST_ORACLE,
       doc="Latest-version-per-key dedup (CDC-style): max-timestamp "
           "aggregate + equality join back, min-id tie-break — both "
           "aggregates partial-aggregated; the shuffle carries (key, ts) "
           "scalars, never full rows, vs a per-key window that would "
           "shuffle the whole table.")
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es"))
    mx = ev.groupBy("user_id").agg(F.max("es").alias("es"))
    return (
        ev.join(mx, ["user_id", "es"])
        .groupBy("user_id", F.col("es").alias("latest_es"))
        .agg(F.min("event_id").alias("event_id"))
        .repartition(1).sortWithinPartitions("user_id")
    )


# ---------------------------------------------------------------- native session windows

_SESSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
),
flagged AS (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
numbered AS (
  SELECT user_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       CAST(MIN(us) AS BIGINT) AS session_start_us,
       CAST(MAX(us) + 1800000000 AS BIGINT) AS session_end_us,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""


@query("session_window_agg", oracle=_SESSION_WINDOW_ORACLE,
       doc="Native session_window aggregation (30-min gap, window-end "
           "exclusive => new session at gap >= 1800s) — Spark's built-in "
           "session operator, micro-exact vs a LAG/SUM oracle. One "
           "shuffle keyed user_id; the same expression runs under "
           "Structured Streaming with a watermark (test_streaming.py).")
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            # ts is TIMESTAMP_NTZ: diff from the NTZ epoch is timezone-
            # independent (unix_micros would require LTZ and hang the
            # result on the driver session's timezone)
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
                   "00:00:00', session_window.start)")
             .alias("session_start_us"),
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
                   "00:00:00', session_window.end)")
             .alias("session_end_us"),
            "n_events",
        )
        .repartition(1).sortWithinPartitions("user_id", "session_start_us")
    )


# ---------------------------------------------------------------- pivot

_PIVOT_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@query("event_type_pivot", oracle=_PIVOT_ORACLE,
       doc="Pivot event_type to columns (explicit value list, so no extra "
           "distinct-values job). Plan is two aggregates: partial-"
           "aggregated groupBy(user, type), then pivotfirst by user — the "
           "second shuffle carries one row per (user, type), never the "
           "event table.")
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", types).count()
    # pivot leaves null for absent combos; the oracle's FILTER counts 0
    filled = out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t)
          for t in types],
    )
    return filled.repartition(1).sortWithinPartitions("user_id")


# ---------------------------------------------------------------- range-frame moving aggregate

_MOVING_ORACLE = """
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 86400000000 PRECEDING
                               AND CURRENT ROW) AS DOUBLE) AS day_sum,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN 86400000000 PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS day_n
FROM e
ORDER BY user_id, event_id
"""


@query("moving_day_window", oracle=_MOVING_ORACLE,
       doc="Trailing 24h per-user moving sum/count via a RANGE window "
           "frame over integer event-time micros — decimal-exact sums "
           "(sliding-frame float accumulation drifts across engines); "
           "shuffle keyed user_id only.")
def moving_day_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    w = (W.partitionBy("user_id").orderBy("us")
         .rangeBetween(-86400000000, 0))
    return (
        ev.select(
            "user_id", "event_id",
            F.sum("v").over(w).cast("double").alias("day_sum"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("day_n"),
        )
        .repartition(1).sortWithinPartitions("user_id", "event_id")
    )


# ---------------------------------------------------------------- as-of join

_ASOF_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
l AS (SELECT user_id, event_id, us FROM e WHERE event_type <> 'purchase'),
r AS (SELECT user_id, event_id, us, value FROM e WHERE event_type = 'purchase'),
u AS (
  SELECT user_id, event_id, us, 0 AS is_r,
         CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS BIGINT) AS rid
  FROM l
  UNION ALL
  SELECT user_id, event_id, us, 1, value, event_id FROM r
),
attached AS (
  SELECT user_id, event_id, us, is_r,
         last_value(rv IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY us, is_r DESC, CASE WHEN is_r = 1 THEN rid END
           ROWS UNBOUNDED PRECEDING) AS asof_value,
         last_value(CASE WHEN is_r = 1 THEN us END IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY us, is_r DESC, CASE WHEN is_r = 1 THEN rid END
           ROWS UNBOUNDED PRECEDING) AS asof_us
  FROM u
)
SELECT user_id, event_id, CAST(us AS BIGINT) AS us,
       asof_value, CAST(asof_us AS BIGINT) AS asof_us
FROM attached WHERE is_r = 0
ORDER BY user_id, event_id
"""


@query("asof_last_purchase", oracle=_ASOF_ORACLE,
       doc="Backward as-of join: every non-purchase event gets the most "
           "recent purchase value/time at-or-before it per user — union + "
           "keyed window (one hashpartition shuffle, per-key local sort, "
           "no custom code path).")
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.asof import asof_join_backward

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("us"))
    left = ev.filter(F.col("event_type") != "purchase") \
        .select("user_id", "event_id", "us")
    right = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "event_id", "us", "value",
                F.col("us").alias("r_us"))
    out = asof_join_backward(left, right, key="user_id", ts="us",
                             order_col="event_id",
                             value_cols=["value", "r_us"])
    return (
        out.select(
            "user_id", "event_id", "us",
            F.col("asof_value").alias("asof_value"),
            F.col("asof_r_us").cast("bigint").alias("asof_us"),
        )
        .repartition(1).sortWithinPartitions("user_id", "event_id")
    )


# ---------------------------------------------------------------- range join

# 20 deterministic maintenance windows: day-long, every 2 days from
# 2024-01-01 (events span ~5 weeks) — literals, identical in the oracle.
_WINDOW_BASE_US = 1704067200000000  # 2024-01-01T00:00:00Z
_WINDOW_STEP_US = 2 * 86400000000
_WINDOW_LEN_US = 86400000000

_RANGE_JOIN_ORACLE = f"""
WITH e AS (
  SELECT event_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
w AS (
  SELECT CAST(i AS BIGINT) AS window_id,
         {_WINDOW_BASE_US} + i * {_WINDOW_STEP_US} AS lo,
         {_WINDOW_BASE_US} + i * {_WINDOW_STEP_US} + {_WINDOW_LEN_US} AS hi
  FROM range(0, 20) AS t(i)
)
SELECT w.window_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM e JOIN w ON e.us BETWEEN w.lo AND w.hi
GROUP BY w.window_id
ORDER BY w.window_id
"""


@query("range_join_windows", oracle=_RANGE_JOIN_ORACLE,
       doc="Point-in-interval range join, bucketized: intervals explode "
           "into day-wide buckets and broadcast, points equi-join on their "
           "bucket — a hash join instead of the nested-loop plan a raw "
           "BETWEEN join produces; exact BETWEEN applied post-join.")
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.rangejoin import bucketed_range_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "value",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("us"))
    windows = spark.range(20).select(
        F.col("id").cast("bigint").alias("window_id"),
        (F.lit(_WINDOW_BASE_US) + F.col("id") * _WINDOW_STEP_US).alias("lo"),
        (F.lit(_WINDOW_BASE_US) + F.col("id") * _WINDOW_STEP_US
         + _WINDOW_LEN_US).alias("hi"),
    )
    joined = bucketed_range_join(
        ev, windows, point_col="us", lo_col="lo", hi_col="hi",
        bucket_width=_WINDOW_LEN_US)
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("sum_value"),
        )
        .repartition(1).sortWithinPartitions("window_id")
    )


# ---------------------------------------------------------------- SCD type-2 intervals

_SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE event_type = 'signup'
)
SELECT user_id, event_id, value,
       CAST(us AS BIGINT) AS effective_from_us,
       CAST(LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            AS BIGINT) AS effective_to_us,
       CAST(CASE WHEN LEAD(us) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id) IS NULL
            THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM e
ORDER BY user_id, effective_from_us, event_id
"""


@query("scd2_intervals", oracle=_SCD2_ORACLE,
       doc="SCD type-2 interval build: each change-log row becomes a "
           "validity interval [ts, next ts) via LEAD, open-ended + "
           "is_current on the last — one shuffle keyed user_id; the "
           "as-of join reads these intervals back.")
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events") \
        .filter(F.col("event_type") == "signup") \
        .select(
            "user_id", "event_id", "value",
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
                   "00:00:00', ts)").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    nxt = F.lead("us").over(w)
    return (
        ev.select(
            "user_id", "event_id", "value",
            F.col("us").alias("effective_from_us"),
            nxt.alias("effective_to_us"),
            F.when(nxt.isNull(), 1).otherwise(0).cast("bigint")
             .alias("is_current"),
        )
        .repartition(1)
        .sortWithinPartitions("user_id", "effective_from_us", "event_id")
    )


# ------------------------------------------- CEP sequence-pattern detection

_PATTERN_SEQ_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
  FROM events
),
r AS (
  SELECT user_id, event_id, event_type, es,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY es, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY es, event_id) AS tr
  FROM ev
),
isl AS (
  SELECT user_id, event_type, rn - tr AS grp,
         CAST(COUNT(*) AS BIGINT) AS n_failures,
         MIN(es) AS run_start_s, MAX(es) AS run_end_s,
         MAX(rn) AS end_rn
  FROM r GROUP BY user_id, event_type, rn - tr
),
err AS (SELECT * FROM isl WHERE event_type = 'error' AND n_failures >= 2)
SELECT e.user_id, e.n_failures, e.run_start_s, e.run_end_s,
       n.es AS success_s
FROM err e
JOIN r n ON n.user_id = e.user_id AND n.rn = e.end_rn + 1
WHERE n.event_type = 'purchase' AND n.es <= e.run_end_s + 2592000
ORDER BY e.user_id, run_start_s
"""


@query("pattern_sequence_alerts", oracle=_PATTERN_SEQ_ORACLE,
       doc="CEP sequence-pattern detection (MATCH_RECOGNIZE-style, the "
           "classic brute-force-then-success rule: >= 2 CONSECUTIVE "
           "'error' events per user followed IMMEDIATELY by a 'purchase' "
           "within 30 days of the last error; thresholds calibrated to "
           "the synthetic event cadence, median inter-event gap ~7h). Native gaps-and-islands: two "
           "user-partitioned windows number runs, islands aggregate, the "
           "successor event joins back on the same user_id hash "
           "partitioning. Reference analogue: the community duo/cloudtrail "
           "brute-force rules evaluate per-record; this is the batch "
           "sequence form Spark expresses with zero Python. Consecutive "
           "means NO intervening event of any other type -- stricter than "
           "funnel_stages' earliest-qualifying ordering.")
def pattern_sequence_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").alias("es"))
    w_all = W.partitionBy("user_id").orderBy("es", "event_id")
    w_typ = W.partitionBy("user_id", "event_type").orderBy("es", "event_id")
    r = ev.select(
        "user_id", "event_id", "event_type", "es",
        F.row_number().over(w_all).alias("rn"),
        F.row_number().over(w_typ).alias("tr"),
    )
    isl = (
        r.groupBy("user_id", "event_type", (F.col("rn") - F.col("tr")).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_failures"),
             F.min("es").alias("run_start_s"),
             F.max("es").alias("run_end_s"),
             F.max("rn").alias("end_rn"))
    )
    err = isl.filter((F.col("event_type") == "error")
                     & (F.col("n_failures") >= 2))
    nxt = r.select("user_id", F.col("rn").alias("nrn"),
                   F.col("event_type").alias("ntype"),
                   F.col("es").alias("success_s"))
    out = (
        err.join(nxt, (err["user_id"] == nxt["user_id"])
                 & (nxt["nrn"] == err["end_rn"] + 1))
        .filter((F.col("ntype") == "purchase")
                & (F.col("success_s") <= F.col("run_end_s") + 2592000))
        .select(err["user_id"], "n_failures", "run_start_s", "run_end_s",
                "success_s")
    )
    return out.repartition(1).sortWithinPartitions("user_id", "run_start_s")


# ------------------------------------------------- RFM behavioral scoring

_RFM_ORACLE = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
u AS (
  SELECT user_id, MAX(es) AS last_es,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(v) AS monetary_dec
  FROM e GROUP BY user_id
),
g AS (SELECT MAX(es) AS gmax FROM e),
s AS (
  SELECT u.user_id, (g.gmax - u.last_es) // 86400 AS rec_days,
         u.n_events, u.monetary_dec
  FROM u, g
),
scored AS (
  SELECT user_id, rec_days, n_events,
         ROUND(CAST(monetary_dec AS DOUBLE), 2) AS monetary,
         CAST(CASE WHEN rec_days = 0 THEN 3
                   WHEN rec_days = 1 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
         CAST(CASE WHEN n_events >= 80 THEN 5 WHEN n_events >= 70 THEN 4
                   WHEN n_events >= 65 THEN 3 WHEN n_events >= 55 THEN 2
                   ELSE 1 END AS BIGINT) AS f_score,
         CAST(CASE WHEN monetary_dec >= 5000 THEN 5
                   WHEN monetary_dec >= 4000 THEN 4
                   WHEN monetary_dec >= 3000 THEN 3
                   WHEN monetary_dec >= 2000 THEN 2
                   ELSE 1 END AS BIGINT) AS m_score
  FROM s
)
SELECT user_id, rec_days, n_events, monetary, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm,
       CASE WHEN f_score >= 4 AND m_score >= 4 THEN 'champion'
            WHEN f_score >= 4 THEN 'frequent'
            WHEN m_score >= 4 THEN 'big_spender'
            WHEN r_score = 1 THEN 'lapsing'
            ELSE 'regular' END AS segment
FROM scored
ORDER BY user_id
"""


@query("user_risk_rfm", oracle=_RFM_ORACLE,
       doc="RFM behavioral scoring (recency/frequency/monetary) with "
           "FIXED band thresholds — quantile banding would need a global "
           "sort (RangePartitioning, banned from the query surface) and "
           "cross-engine interpolation; fixed bands are the scale-safe "
           "form (constants, one groupBy, one 1-row scalar attach). "
           "Monetary sums ride DECIMAL so add order can't perturb bits.")
def user_risk_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    u = ev.groupBy("user_id").agg(
        F.max("es").alias("last_es"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("v").alias("monetary_dec"),
    )
    gmax = ev.agg(F.max("es").alias("gmax"))
    s = u.crossJoin(F.broadcast(gmax)).withColumn(
        "rec_days", F.expr("(gmax - last_es) DIV 86400"))
    r = (F.when(F.col("rec_days") == 0, 3)
         .when(F.col("rec_days") == 1, 2).otherwise(1)).cast("bigint")
    f = (F.when(F.col("n_events") >= 80, 5)
         .when(F.col("n_events") >= 70, 4)
         .when(F.col("n_events") >= 65, 3)
         .when(F.col("n_events") >= 55, 2).otherwise(1)).cast("bigint")
    m = (F.when(F.col("monetary_dec") >= 5000, 5)
         .when(F.col("monetary_dec") >= 4000, 4)
         .when(F.col("monetary_dec") >= 3000, 3)
         .when(F.col("monetary_dec") >= 2000, 2).otherwise(1)).cast("bigint")
    scored = s.select(
        "user_id", "rec_days", "n_events",
        F.round(F.col("monetary_dec").cast("double"), 2).alias("monetary"),
        r.alias("r_score"), f.alias("f_score"), m.alias("m_score"),
    )
    seg = (F.when((F.col("f_score") >= 4) & (F.col("m_score") >= 4),
                  "champion")
           .when(F.col("f_score") >= 4, "frequent")
           .when(F.col("m_score") >= 4, "big_spender")
           .when(F.col("r_score") == 1, "lapsing")
           .otherwise("regular"))
    return (
        scored.withColumn(
            "rfm",
            F.col("r_score") * 100 + F.col("f_score") * 10
            + F.col("m_score"))
        .withColumn("segment", seg)
        .repartition(1).sortWithinPartitions("user_id")
    )


# ---------------------------------------------------- interval overlap join

_INTERVAL_OVERLAP_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_quantity,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS lo_d,
         (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
           + 1 + (l_linenumber * 7) % 25 AS hi_d
  FROM lineitem
),
win AS (
  SELECT o_orderkey AS window_id,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS w_lo,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') + 13 AS w_hi
  FROM orders WHERE o_orderkey % 991 = 0
)
SELECT window_id,
       CAST(w_lo AS BIGINT) AS w_lo, CAST(w_hi AS BIGINT) AS w_hi,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS DOUBLE) AS sum_qty
FROM li JOIN win ON lo_d <= w_hi AND w_lo <= hi_d
GROUP BY window_id, w_lo, w_hi
ORDER BY window_id
"""


@query("interval_overlap_agg", oracle=_INTERVAL_OVERLAP_ORACLE,
       doc="Interval-x-interval OVERLAP join (shipment spans vs audit "
           "windows) via the grid-bucket strategy: both sides explode "
           "into <=2 buckets, equi-join on bucket, exact overlap "
           "post-filter, each pair claimed once at the overlap-start "
           "bucket — a hash join where a raw overlap predicate would "
           "nested-loop. Windows ride a size-gated broadcast.")
def interval_overlap_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.rangejoin import bucketed_interval_overlap_join

    epoch = F.lit("1970-01-01")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity",
        F.datediff(F.to_date("l_shipdate"), epoch).cast("bigint")
         .alias("lo_d"),
        (F.datediff(F.to_date("l_shipdate"), epoch).cast("bigint")
         + 1 + (F.col("l_linenumber") * 7) % 25).alias("hi_d"),
    )
    win = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 991 == 0)
        .select(
            F.col("o_orderkey").alias("window_id"),
            F.datediff(F.to_date("o_orderdate"), epoch).cast("bigint")
             .alias("w_lo"),
            (F.datediff(F.to_date("o_orderdate"), epoch).cast("bigint")
             + 13).alias("w_hi"),
        )
    )
    joined = bucketed_interval_overlap_join(
        li, win, "lo_d", "hi_d", "w_lo", "w_hi", bucket_width=32)
    return (
        joined.groupBy("window_id", "w_lo", "w_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("decimal(18,2)").cast("double").alias("sum_qty"),
        )
        .repartition(1).sortWithinPartitions("window_id")
    )


# ------------------------------------------------- resample with gap fill

_RESAMPLE_ORACLE = """
WITH e AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr
  FROM events
),
c AS (
  SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY event_type, hr
),
b AS (SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM e GROUP BY event_type),
spine AS (SELECT event_type, UNNEST(range(lo, hi + 1)) AS hr FROM b)
SELECT s.event_type, CAST(s.hr AS BIGINT) AS hr,
       COALESCE(c.n, 0) AS n_events
FROM spine s LEFT JOIN c USING (event_type, hr)
ORDER BY event_type, hr
"""


@query("resample_fill_gaps", oracle=_RESAMPLE_ORACLE,
       doc="Hourly resample with zero-filled gaps per key: the dense "
           "time spine is generated FROM each key's own [min, max] hour "
           "bounds (sequence + explode — no driver-side calendar, no "
           "cross join with a global range), then left-joined back to "
           "the hourly counts. Two shuffles keyed (type, hour) and "
           "(type); spine size is keys x span, independent of row count.")
def resample_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts) DIV 3600000000").alias("hr"))
    counts = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    bounds = ev.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("hr"))
    return (
        spine.join(counts, ["event_type", "hr"], "left")
        .select("event_type", F.col("hr").cast("bigint").alias("hr"),
                F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"))
        .repartition(1).sortWithinPartitions("event_type", "hr")
    )


# ---------------------------------------------- event transition matrix

_TRANSITION_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE user_id IS NOT NULL
),
hops AS (
  SELECT event_type AS t_from,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS t_to
  FROM e
),
c AS (
  SELECT t_from, t_to, CAST(COUNT(*) AS BIGINT) AS n
  FROM hops WHERE t_to IS NOT NULL GROUP BY t_from, t_to
),
tot AS (SELECT t_from, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY t_from)
SELECT c.t_from, c.t_to, c.n,
       (c.n * 1000000) // t.n_from AS p_ppm,
       CAST(row_number() OVER (PARTITION BY c.t_from
                               ORDER BY c.n DESC, c.t_to) AS BIGINT)
         AS rank_within_from
FROM c JOIN tot t USING (t_from)
ORDER BY t_from, t_to
"""


@query("event_transition_matrix", oracle=_TRANSITION_ORACLE,
       doc="First-order behavioral transition matrix: per-user "
           "consecutive event pairs -> P(next | current) in exact "
           "integer ppm, with each row's rank among its source state's "
           "successors — the Markov baseline that anomaly rules compare "
           "a session against. One user-keyed window + one "
           "(from, to) count shuffle; matrix size is states^2, "
           "independent of row count.")
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()).select(
        "user_id", "event_id", "event_type",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    hops = (ev.select(F.col("event_type").alias("t_from"),
                      F.lead("event_type").over(w).alias("t_to"))
            .filter(F.col("t_to").isNotNull()))
    c = hops.groupBy("t_from", "t_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.groupBy("t_from").agg(F.sum("n").cast("bigint").alias("n_from"))
    w_rank = W.partitionBy("t_from").orderBy(F.col("n").desc(), "t_to")
    return (
        c.join(tot, "t_from")
        .withColumn("p_ppm",
                    F.expr("(n * CAST(1000000 AS BIGINT)) DIV n_from"))
        .withColumn("rank_within_from",
                    F.row_number().over(w_rank).cast("bigint"))
        .drop("n_from")
        .repartition(1).sortWithinPartitions("t_from", "t_to")
    )


# ------------------------------------------------- association rules

_ASSOC_ORACLE = """
WITH b AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_type AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
c1 AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY item),
pairs AS (
  SELECT x.item AS item_a, y.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item
  GROUP BY x.item, y.item
)
SELECT p.item_a, p.item_b, p.c_ab,
       (p.c_ab * 1000000) // a.c AS conf_a_to_b_ppm,
       (p.c_ab * 1000000) // bb.c AS conf_b_to_a_ppm,
       (p.c_ab * n.n_baskets * 1000000) // (a.c * bb.c) AS lift_x1e6
FROM pairs p
JOIN c1 a ON a.item = p.item_a
JOIN c1 bb ON bb.item = p.item_b
CROSS JOIN n
ORDER BY p.c_ab DESC, p.item_a, p.item_b
LIMIT 25
"""


@query("basket_association_rules", oracle=_ASSOC_ORACLE,
       doc="Market-basket association rules over order baskets: pair "
           "support, both conditional confidences, and lift — all exact "
           "integer ppm (lift > 1e6 means the pair co-occurs more than "
           "independence predicts). The pair self-join is keyed by "
           "basket, so fan-out is bounded by basket size squared (never "
           "corpus-squared); item counts join back on the item key; the "
           "1-row basket total rides a broadcast. Top-25 by TakeOrdered.")
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    from streamalert_spark.ops.hints import gated_broadcast

    b = (li.join(gated_broadcast(part),
                 li.l_partkey == part.p_partkey)
         .select(F.col("l_orderkey").alias("basket"),
                 F.col("p_type").alias("item"))
         .distinct())
    n = b.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    c1 = b.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    x = b.alias("x")
    y = b.alias("y")
    pairs = (
        x.join(y, (F.col("x.basket") == F.col("y.basket"))
               & (F.col("x.item") < F.col("y.item")))
        .groupBy(F.col("x.item").alias("item_a"),
                 F.col("y.item").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    out = (
        pairs
        .join(c1.select(F.col("item").alias("item_a"),
                        F.col("c").alias("c_a")), "item_a")
        .join(c1.select(F.col("item").alias("item_b"),
                        F.col("c").alias("c_b")), "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a", "item_b", "c_ab",
            F.expr("(c_ab * CAST(1000000 AS BIGINT)) DIV c_a")
             .alias("conf_a_to_b_ppm"),
            F.expr("(c_ab * CAST(1000000 AS BIGINT)) DIV c_b")
             .alias("conf_b_to_a_ppm"),
            F.expr("(c_ab * n_baskets * CAST(1000000 AS BIGINT)) "
                   "DIV (c_a * c_b)").alias("lift_x1e6"),
        )
    )
    return out.orderBy(F.col("c_ab").desc(), "item_a", "item_b").limit(25)


# ---------------------------------------------------- top session paths

_SESSION_PATHS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS rn
  FROM e
),
paths AS (
  SELECT user_id,
         string_agg(event_type, ' > ' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 5 GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths GROUP BY path
ORDER BY n_users DESC, path
LIMIT 20
"""


@query("top_session_paths", oracle=_SESSION_PATHS_ORACLE,
       doc="Path mining: each user's first 5 events in order form a "
           "path string; the 20 most common paths. One user-keyed "
           "window (rank <= 5 caps the per-user carry), one path "
           "count shuffle, TakeOrdered top-k.")
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()).select(
        "user_id", "event_id", "event_type",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    ranked = (ev.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 5))
    paths = (
        ranked.groupBy("user_id")
        .agg(F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"]),
            " > ").alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path").limit(20)
    )


# ------------------------------------------------ new-entity emergence

_EMERGENCE_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_ts
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
)
SELECT CAST(epoch_us(first_ts) // 86400000000 AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_new_entities
FROM firsts GROUP BY day ORDER BY day
"""


@query("new_entity_emergence", oracle=_EMERGENCE_ORACLE,
       doc="New-entity emergence curve: each entity's first-seen day, "
           "rolled up to new-entities-per-day — the batch twin of the "
           "streaming first_seen detector, and the curve a sudden "
           "credential-stuffing wave bends. Two partial-aggregated "
           "shuffles (min per entity, count per day).")
def new_entity_emergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()).select(
        "user_id",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("us"))
    firsts = ev.groupBy("user_id").agg(F.min("us").alias("first_us"))
    return (
        firsts.select(F.expr("first_us DIV 86400000000").cast("bigint")
                      .alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_entities"))
        .repartition(1).sortWithinPartitions("day")
    )


# ---------------------------------------------------------------------------
# Position-based (U-shaped) touch attribution — first/last view per purchase
# ---------------------------------------------------------------------------

_TOUCH_ATTR_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, value,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) * 1000000) AS BIGINT) AS us
  FROM events WHERE user_id IS NOT NULL
),
u AS (
  SELECT user_id, event_id, us, 0 AS is_p,
         us AS vus, CAST(NULL AS DOUBLE) AS pval
  FROM e WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, event_id, us, 1, CAST(NULL AS BIGINT), value
  FROM e WHERE event_type = 'purchase'
),
attached AS (
  SELECT user_id, event_id, us, is_p, pval,
         first_value(vus IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_p, event_id
           ROWS UNBOUNDED PRECEDING) AS first_view_us,
         last_value(vus IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_p, event_id
           ROWS UNBOUNDED PRECEDING) AS last_view_us
  FROM u
),
scored AS (
  SELECT user_id, event_id, us, first_view_us, last_view_us,
         CAST(floor(pval * 100 + 0.5) AS BIGINT) AS cents
  FROM attached WHERE is_p = 1
)
SELECT user_id, event_id, us,
       CAST(first_view_us AS BIGINT) AS first_view_us,
       CAST(last_view_us AS BIGINT) AS last_view_us,
       cents,
       CASE WHEN first_view_us IS NULL THEN CAST(0 AS BIGINT)
            ELSE CAST((cents * 2) // 5 AS BIGINT) END AS cents_first_touch,
       CASE WHEN first_view_us IS NULL THEN CAST(0 AS BIGINT)
            ELSE cents - CAST((cents * 2) // 5 AS BIGINT)
       END AS cents_last_touch,
       CASE WHEN first_view_us IS NULL THEN cents
            ELSE CAST(0 AS BIGINT) END AS cents_unattributed
FROM scored
ORDER BY user_id, event_id
"""


@query("touch_attribution", oracle=_TOUCH_ATTR_ORACLE,
       doc="Position-based (U-shaped) revenue attribution: each purchase "
           "credits its user's FIRST and LAST preceding view 40/60 in "
           "exact integer cents (remainder to last touch; no preceding "
           "view -> unattributed). Both touches attach in ONE "
           "union+keyed-window pass (the backward-as-of pattern run "
           "twice over the same sorted frame — first_value and "
           "last_value IGNORE NULLS share the window), so the cost is "
           "one user-keyed shuffle regardless of lookback depth; a "
           "per-purchase views join would be O(views x purchases) per "
           "user.")
def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()).select(
        "user_id", "event_id", "event_type", "value",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts)").alias("us"))
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "us",
        F.lit(0).alias("is_p"), F.col("us").alias("vus"),
        F.lit(None).cast("double").alias("pval"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "us",
        F.lit(1).alias("is_p"), F.lit(None).cast("bigint").alias("vus"),
        F.col("value").alias("pval"))
    u = views.unionByName(purchases)
    w = (W.partitionBy("user_id").orderBy("us", "is_p", "event_id")
         .rowsBetween(W.unboundedPreceding, 0))
    attached = u.select(
        "user_id", "event_id", "us", "is_p", "pval",
        F.first("vus", ignorenulls=True).over(w).alias("first_view_us"),
        F.last("vus", ignorenulls=True).over(w).alias("last_view_us"))
    scored = (attached.filter(F.col("is_p") == 1)
              .withColumn("cents", F.expr(
                  "CAST(floor(pval * 100 + 0.5) AS BIGINT)")))
    no_view = F.col("first_view_us").isNull()
    first_cut = F.expr("(cents * 2) DIV 5").cast("bigint")
    return (
        scored.select(
            "user_id", "event_id", "us",
            F.col("first_view_us").cast("bigint").alias("first_view_us"),
            F.col("last_view_us").cast("bigint").alias("last_view_us"),
            "cents",
            F.when(no_view, F.lit(0)).otherwise(first_cut)
             .cast("bigint").alias("cents_first_touch"),
            F.when(no_view, F.lit(0)).otherwise(F.col("cents") - first_cut)
             .cast("bigint").alias("cents_last_touch"),
            F.when(no_view, F.col("cents")).otherwise(F.lit(0))
             .cast("bigint").alias("cents_unattributed"))
        .repartition(1).sortWithinPartitions("user_id", "event_id")
    )


# -------------------------------------------------- CUPED-adjusted A/B lift

_CUPED_ORACLE = """
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
),
bounds AS (SELECT (MIN(d) + MAX(d) + 1) // 2 AS split FROM ev),
pu AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN d < (SELECT split FROM bounds)
                       THEN cents ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN d >= (SELECT split FROM bounds)
                       THEN cents ELSE 0 END) AS BIGINT) AS y
  FROM ev GROUP BY user_id
),
pooled AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sx2,
         CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM pu
),
theta AS (
  SELECT CAST(CASE WHEN n * sx2 - sx * sx = 0 THEN 0
                   ELSE ((n * sxy - sx * sy) * 1000000)
                        // (n * sx2 - sx * sx) END AS BIGINT) AS theta_fp,
         CAST((sx * 1000000) // n AS BIGINT) AS mean_x_all_fp
  FROM pooled
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST((CAST(SUM(y) AS HUGEINT) * 1000000) // COUNT(*) AS BIGINT)
           AS mean_y_fp,
         CAST((CAST(SUM(x) AS HUGEINT) * 1000000) // COUNT(*) AS BIGINT)
           AS mean_x_fp
  FROM pu GROUP BY arm
)
SELECT a.arm, a.n_users, a.mean_y_fp, a.mean_x_fp, t.theta_fp,
       CAST(CAST(a.mean_y_fp AS HUGEINT)
            - (CAST(t.theta_fp AS HUGEINT)
               * (CAST(a.mean_x_fp AS HUGEINT)
                  - CAST(t.mean_x_all_fp AS HUGEINT)))
            // 1000000 AS BIGINT) AS adj_mean_y_fp
FROM arms a, theta t
ORDER BY a.arm
"""


@query("cuped_ab_adjusted_lift", oracle=_CUPED_ORACLE,
       doc="CUPED variance-reduced A/B readout (Deng et al. 2013, the "
           "industry-standard experiment adjustment): arm = user_id "
           "parity, y = post-period spend, covariate x = PRE-period "
           "spend; theta = Cov(x,y)/Var(x) from pooled integer power "
           "sums, and each arm reports its raw and theta-adjusted mean "
           "(adj = y_mean - theta*(x_mean - x_all)) — pre-period "
           "imbalance between arms is removed before the lift is read. "
           "Everything is exact fixed point: power sums ride "
           "HUGEINT/DECIMAL(38,0), theta and the adjustment use the "
           "truncating DIV=// pair, a zero covariate variance "
           "degrades to theta=0 in both engines. Scale: one per-user "
           "conditional-sum shuffle, one 2-row arm aggregate, and two "
           "single-row broadcasts — nothing else.")
def cuped_ab_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (read_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
          .select("user_id",
                  F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                         "'1970-01-01 00:00:00', ts) DIV 1000000 "
                         "DIV 86400").alias("d"),
                  F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
                  .alias("cents")))
    bounds = ev.agg(
        F.expr("(MIN(d) + MAX(d) + 1) DIV 2").alias("split"))
    pu = (ev.crossJoin(F.broadcast(bounds))
          .groupBy("user_id")
          .agg(F.sum(F.when(F.col("d") < F.col("split"), F.col("cents"))
                     .otherwise(F.lit(0))).cast("bigint").alias("x"),
               F.sum(F.when(F.col("d") >= F.col("split"), F.col("cents"))
                     .otherwise(F.lit(0))).cast("bigint").alias("y"))
          .select((F.col("user_id") % 2).alias("arm"), "x", "y"))
    pooled = pu.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sx2"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"))
    theta = pooled.select(
        F.expr("CAST(CASE WHEN n * sx2 - sx * sx = 0 THEN 0 "
               "ELSE ((n * sxy - sx * sy) * 1000000) "
               "DIV (n * sx2 - sx * sx) END AS BIGINT)").alias("theta_fp"),
        F.expr("CAST((sx * 1000000) DIV n AS BIGINT)")
        .alias("mean_x_all_fp"))
    arms = (pu.groupBy("arm")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("y").cast("decimal(38,0)").alias("sy_a"),
                 F.sum("x").cast("decimal(38,0)").alias("sx_a"))
            .select("arm", "n_users",
                    F.expr("CAST((sy_a * 1000000) DIV n_users AS BIGINT)")
                    .alias("mean_y_fp"),
                    F.expr("CAST((sx_a * 1000000) DIV n_users AS BIGINT)")
                    .alias("mean_x_fp")))
    # The adjustment rides DECIMAL(38,0)/HUGEINT like the power sums: with
    # month-scale per-user pre-period spend (mean_x_fp ~1e18 micro-cents)
    # theta_fp * gap can exceed int64 — Spark would wrap silently while
    # DuckDB errors, so both engines widen BEFORE the multiply and only the
    # final /1e6 quotient (back in comfortable BIGINT range) narrows.
    return (
        arms.crossJoin(F.broadcast(theta))
        .select("arm", "n_users", "mean_y_fp", "mean_x_fp", "theta_fp",
                F.expr("CAST(CAST(mean_y_fp AS DECIMAL(38,0)) "
                       "- (CAST(theta_fp AS DECIMAL(38,0)) "
                       "* (CAST(mean_x_fp AS DECIMAL(38,0)) "
                       "- CAST(mean_x_all_fp AS DECIMAL(38,0)))) "
                       "DIV 1000000 AS BIGINT)")
                .alias("adj_mean_y_fp"))
        .repartition(1).sortWithinPartitions("arm")
    )


# ------------------------------------------------- time-weighted average

_TWAP_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
),
stepped AS (
  SELECT user_id, s, cents,
         LEAD(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
           AS next_s
  FROM seq
),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(next_s - s) AS HUGEINT) AS span_s,
         CAST(SUM(cents * (next_s - s)) AS HUGEINT) AS area
  FROM stepped WHERE next_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_obs,
       CAST(span_s AS BIGINT) AS span_s,
       CAST((area * 1000000) // span_s AS BIGINT) AS twap_fp
FROM agg
WHERE span_s > 0
ORDER BY user_id
"""


@query("twap_locf_per_user", oracle=_TWAP_ORACLE,
       doc="Time-weighted average value per user with last-observation-"
           "carried-forward (the TWAP/step-integral every metering, "
           "billing, and position-exposure pipeline needs): each "
           "observation holds until the next one, so the average is "
           "integral(value dt)/span — a row-count mean over-weights "
           "bursts of cheap events, TWAP does not. Exact integers "
           "end-to-end: cents x duration areas sum in "
           "HUGEINT/DECIMAL(38,0) (a month-long hold at $1000 is "
           "~2.6e11 cent-seconds per row). One per-user LEAD window "
           "(hash-partitioned) + one partial-aggregated shuffle; "
           "same-timestamp ties order by event_id deterministically "
           "and contribute zero-duration steps.")
def twap_locf_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    seq = (read_table(spark, sf_dir, "events")
           .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
           .select("user_id", "event_id",
                   F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                          "'1970-01-01 00:00:00', ts) DIV 1000000")
                   .alias("s"),
                   F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
                   .alias("cents")))
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    stepped = (seq.withColumn("next_s", F.lead("s").over(w))
               .filter(F.col("next_s").isNotNull()))
    agg = (stepped.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"),
                F.sum(F.col("next_s") - F.col("s"))
                .cast("decimal(38,0)").alias("span_s"),
                F.sum(F.col("cents") * (F.col("next_s") - F.col("s")))
                .cast("decimal(38,0)").alias("area")))
    return (
        agg.filter(F.col("span_s") > 0)
        .select("user_id", "n_obs",
                F.col("span_s").cast("bigint").alias("span_s"),
                F.expr("(area * 1000000) DIV span_s").cast("bigint")
                .alias("twap_fp"))
        .repartition(1).sortWithinPartitions("user_id")
    )


# --------------------------------------------------- Kaplan-Meier survival

_KM_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d
  FROM events WHERE user_id IS NOT NULL
),
hi AS (SELECT MAX(d) AS hi FROM ev),
spans AS (
  SELECT user_id, MIN(d) AS fd,
         MIN(CASE WHEN event_type = 'purchase' THEN d END) AS pd
  FROM ev GROUP BY user_id
),
pu AS (
  -- event = first purchase; a deterministic md5 gate (~1/4 of users)
  -- simulates tracking loss user_id%4 days after first activity:
  -- gated users whose purchase would land after that day are CENSORED
  SELECT user_id,
         CASE WHEN substring(md5('cens:' || CAST(user_id AS VARCHAR)),
                             1, 1) IN ('0','1','2','3')
                   AND (pd IS NULL OR pd - fd > user_id % 4)
              THEN user_id % 4
              WHEN pd IS NOT NULL THEN pd - fd
              ELSE (SELECT hi FROM hi) - fd END AS t,
         CASE WHEN substring(md5('cens:' || CAST(user_id AS VARCHAR)),
                             1, 1) IN ('0','1','2','3')
                   AND (pd IS NULL OR pd - fd > user_id % 4)
              THEN 0
              WHEN pd IS NOT NULL THEN 1
              ELSE 0 END AS churned
  FROM spans
),
hist AS (
  SELECT t, CAST(SUM(churned) AS BIGINT) AS d_t,
         CAST(COUNT(*) AS BIGINT) AS c_t
  FROM pu GROUP BY t
),
maxt AS (SELECT MAX(t) AS mt FROM hist),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM pu),
walk AS (
  SELECT CAST(0 AS BIGINT) AS t,
         (SELECT total FROM n) AS at_risk,
         COALESCE((SELECT d_t FROM hist WHERE t = 0), 0) AS deaths,
         COALESCE((SELECT c_t FROM hist WHERE t = 0), 0) AS leavers,
         (1000000 * ((SELECT total FROM n)
                     - COALESCE((SELECT d_t FROM hist WHERE t = 0), 0)))
           // (SELECT total FROM n) AS survival_fp
  UNION ALL
  SELECT w.t + 1,
         w.at_risk - w.leavers,
         COALESCE(h.d_t, 0),
         COALESCE(h.c_t, 0),
         CASE WHEN w.at_risk - w.leavers > 0
              THEN (w.survival_fp * (w.at_risk - w.leavers
                                     - COALESCE(h.d_t, 0)))
                   // (w.at_risk - w.leavers)
              ELSE w.survival_fp END
  FROM walk w LEFT JOIN hist h ON h.t = w.t + 1
  WHERE w.t < (SELECT mt FROM maxt)
)
SELECT t, at_risk, deaths, survival_fp
FROM walk
ORDER BY t
"""


@query("km_survival_curve", oracle=_KM_ORACLE,
       doc="Kaplan-Meier time-to-conversion curve with RIGHT-CENSORING: "
           "the event is a user's FIRST PURCHASE (t = days since first "
           "activity); a deterministic md5 gate censors ~1/4 of users "
           "user_id%4 days in (simulated tracking loss, independent of "
           "the purchase process — the KM independence assumption), and "
           "never-purchasers censor at window end. Censored users leave "
           "the risk set without counting as conversions — the "
           "correction naive conversion curves get wrong. S(t) multiplies "
           "(at_risk - deaths)/at_risk per day in exact fixed point "
           "(truncating DIV each step, so both engines walk the same "
           "integers). Scale: one per-user span aggregate, a lifetime "
           "histogram of <= day-range rows, and a single JVM fold over "
           "that bounded spine — the corpus never enters the product.")
def km_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (read_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .select("user_id", "event_type",
                  F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                         "'1970-01-01 00:00:00', ts) DIV 1000000 "
                         "DIV 86400").alias("d")))
    hi = ev.agg(F.max("d").alias("hi"))
    gate = (F.substring(F.md5(F.concat(F.lit("cens:"),
                                       F.col("user_id").cast("string"))),
                        1, 1).isin("0", "1", "2", "3")
            & (F.col("pd").isNull()
               | (F.col("pd") - F.col("fd") > F.col("user_id") % 4)))
    pu = (ev.groupBy("user_id")
          .agg(F.min("d").alias("fd"),
               F.min(F.when(F.col("event_type") == "purchase",
                            F.col("d"))).alias("pd"))
          .crossJoin(F.broadcast(hi))
          .select(
              F.when(gate, F.col("user_id") % 4)
              .when(F.col("pd").isNotNull(), F.col("pd") - F.col("fd"))
              .otherwise(F.col("hi") - F.col("fd")).alias("t"),
              F.when(gate, 0)
              .when(F.col("pd").isNotNull(), 1)
              .otherwise(0).alias("churned")))
    hist = (pu.groupBy("t")
            .agg(F.sum("churned").cast("bigint").alias("d_t"),
                 F.count(F.lit(1)).cast("bigint").alias("c_t")))
    one = (hist.agg(
        F.map_from_entries(F.collect_list(
            F.struct("t", F.struct("d_t", "c_t")))).alias("m"),
        F.max("t").alias("mt"),
        F.sum("c_t").cast("bigint").alias("total")))
    d_ = "COALESCE(m[t].d_t, CAST(0 AS BIGINT))"
    c_ = "COALESCE(m[t].c_t, CAST(0 AS BIGINT))"
    fold = f"""
    aggregate(
      sequence(CAST(0 AS BIGINT), mt),
      named_struct(
        'at_risk', total, 's_fp', CAST(1000000 AS BIGINT),
        'rows', CAST(array() AS array<struct<t:bigint,at_risk:bigint,
                     deaths:bigint,survival_fp:bigint>>)),
      (acc, t) -> named_struct(
        'at_risk', acc.at_risk - {c_},
        's_fp', CASE WHEN acc.at_risk > 0
                     THEN (acc.s_fp * (acc.at_risk - {d_}))
                          DIV acc.at_risk
                     ELSE acc.s_fp END,
        'rows', concat(acc.rows, array(named_struct(
            't', CAST(t AS BIGINT),
            'at_risk', acc.at_risk,
            'deaths', {d_},
            'survival_fp', CASE WHEN acc.at_risk > 0
                THEN (acc.s_fp * (acc.at_risk - {d_})) DIV acc.at_risk
                ELSE acc.s_fp END))))
    ).rows
    """
    return (
        one.select(F.explode(F.expr(fold)).alias("e"))
        .select(F.col("e.t").alias("t"),
                F.col("e.at_risk").alias("at_risk"),
                F.col("e.deaths").alias("deaths"),
                F.col("e.survival_fp").alias("survival_fp"))
        .repartition(1).sortWithinPartitions("t")
    )
