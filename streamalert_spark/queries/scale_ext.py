"""Scale-path near-dup queries: SimHash hamming pairs via pigeonhole
blocking, and IVF-style cell-pruned ANN. Both oracle-checked.

These are the operators that replace quadratic forms at 100 TB:
- simhash_neardup_pairs shuffles O(docs x blocks) instead of O(docs^2);
- ivf_ann_topk scores ~n_probe/n_cells of the corpus instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops import dedup, similarity
from streamalert_spark.ops.bloom import (
    BLOOM_K, BLOOM_M, bloom_bit_sql, bloom_calibrate,
)
from streamalert_spark.queries import query
from streamalert_spark.session import read_table


# ------------------------------------------------------- simhash hamming pairs

_SIMS_CTE = """
toks AS (
  SELECT DISTINCT doc_id, w
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
hashed AS (SELECT doc_id, md5(w) AS h FROM toks),
votes AS (
  SELECT doc_id, j,
    SUM(CASE WHEN
      (CAST(strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1 AS BIGINT)
       // CAST(pow(2, 3 - j % 4) AS BIGINT)) % 2 = 1
    THEN 1 ELSE -1 END) AS v
  FROM hashed, UNNEST(range(0, 64)) AS t(j)
  GROUP BY doc_id, j
),
sims AS (
  SELECT doc_id,
         string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
  FROM votes GROUP BY doc_id
)
"""

_SIMHASH_PAIRS_ORACLE = f"""
WITH {_SIMS_CTE}
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(hamming(x.simhash, y.simhash) AS BIGINT) AS dist
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE hamming(x.simhash, y.simhash) <= 3
ORDER BY a, b
"""


@query("simhash_neardup_pairs", oracle=_SIMHASH_PAIRS_ORACLE,
       doc="SimHash near-dup pairs (hamming<=3) via pigeonhole block join + "
           "XOR popcount verify — the O(n x blocks) scale path.")
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(docs, max_hamming=3).repartition(1).sortWithinPartitions("a", "b")


# ------------------------------------------------------------------- IVF ANN

_IVF_COS = """
ROUND(
  list_sum(list_transform(range(1, 65),
           i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
  / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
6)
"""

_IVF_ORACLE = f"""
WITH seeds AS (SELECT vec_id AS seed_id, embedding AS sv FROM embeddings ORDER BY vec_id LIMIT 8),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.seed_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_COS.format(a="e.embedding", b="s.sv")} DESC, s.seed_id
           ) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
),
probes AS (
  SELECT s.seed_id FROM seeds s CROSS JOIN q
  ORDER BY {_IVF_COS.format(a="q.qv", b="s.sv")} DESC, s.seed_id
  LIMIT 2
)
SELECT e.vec_id, {_IVF_COS.format(a="e.embedding", b="q.qv")} AS score
FROM assign a
JOIN embeddings e ON a.vec_id = e.vec_id
CROSS JOIN q
WHERE a.cell IN (SELECT seed_id FROM probes)
ORDER BY score DESC, e.vec_id
LIMIT 10
"""


@query("ivf_ann_topk", oracle=_IVF_ORACLE,
       doc="IVF ANN: deterministic coarse quantizer, n_probe=2 of 8 cells, "
           "exact cosine within probed cells.")
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, n_cells=8, n_probe=2, k=10)


# IVF quality audit — recall@k of the cell-pruned search vs brute force.

_IVF_RECALL_ORACLE = f"""
WITH seeds AS (SELECT vec_id AS seed_id, embedding AS sv FROM embeddings ORDER BY vec_id LIMIT 8),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.seed_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_IVF_COS.format(a="e.embedding", b="s.sv")} DESC, s.seed_id
           ) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
),
probes AS (
  SELECT s.seed_id FROM seeds s CROSS JOIN q
  ORDER BY {_IVF_COS.format(a="q.qv", b="s.sv")} DESC, s.seed_id
  LIMIT 2
),
ivf AS (
  SELECT e.vec_id
  FROM assign a
  JOIN embeddings e ON a.vec_id = e.vec_id
  CROSS JOIN q
  WHERE a.cell IN (SELECT seed_id FROM probes)
  ORDER BY {_IVF_COS.format(a="e.embedding", b="q.qv")} DESC, e.vec_id
  LIMIT 10
),
exact AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN q
  ORDER BY {_IVF_COS.format(a="e.embedding", b="q.qv")} DESC, e.vec_id
  LIMIT 10
)
SELECT CAST(10 AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM exact WHERE vec_id IN (SELECT vec_id FROM ivf)) AS ivf_hits,
       ROUND((SELECT COUNT(*) FROM exact
              WHERE vec_id IN (SELECT vec_id FROM ivf)) / 10.0, 6) AS recall
"""


@query("ivf_recall_audit", oracle=_IVF_RECALL_ORACLE,
       doc="IVF ANN QUALITY AUDIT: recall@10 of the n_probe=2/8-cell "
           "pruned search against the exact brute-force cosine top-10 — "
           "the measured guarantee behind scanning ~n_probe/n_cells of "
           "the corpus. The companion of lsh_quality_audit on the "
           "embedding side; both engines replay the identical "
           "quantize/probe/rank arithmetic, so the recall itself "
           "hash-checks.")
def ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id",
                F.round(similarity.cosine(F.col("embedding"), F.col("qv")), 6)
                 .alias("score"))
        .repartition(1)
        .sortWithinPartitions(F.col("score").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    ivf = similarity.ivf_topk(emb, n_cells=8, n_probe=2, k=10).select("vec_id")
    hits = exact.join(ivf, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("ivf_hits"))
    return hits.select(
        F.lit(10).cast("bigint").alias("k"),
        "ivf_hits",
        F.round(F.col("ivf_hits") / F.lit(10.0), 6).alias("recall"),
    )


# ------------------------------------------------- bloom semi-join reduction

_DIM_PRED = "c_mktsegment = 'BUILDING' AND c_acctbal > 9000"

_BLOOM_MEMBER_SQL = " AND ".join(
    f"({bloom_bit_sql('f.key', i)} IN (SELECT pos FROM bits))"
    for i in range(BLOOM_K)
)

_BLOOM_BITS_SQL = " UNION ALL ".join(
    f"SELECT {bloom_bit_sql('key', i)} AS pos FROM dim"
    for i in range(BLOOM_K)
)

_BLOOM_ORACLE = f"""
WITH dim AS (
  SELECT DISTINCT c_custkey AS key FROM customer WHERE {_DIM_PRED}
),
bits AS (SELECT DISTINCT pos FROM ({_BLOOM_BITS_SQL})),
fkeys AS (SELECT DISTINCT o_custkey AS key FROM orders),
fmember AS (SELECT f.key, ({_BLOOM_MEMBER_SQL}) AS pass FROM fkeys f)
SELECT dim_keys, fact_rows, bloom_pass_rows, exact_pass_rows,
       bloom_pass_rows - exact_pass_rows AS false_positive_rows
FROM (
  SELECT
    (SELECT COUNT(*) FROM dim) AS dim_keys,
    (SELECT COUNT(*) FROM orders) AS fact_rows,
    (SELECT COUNT(*) FROM orders o JOIN fmember m ON o.o_custkey = m.key
     WHERE m.pass) AS bloom_pass_rows,
    (SELECT COUNT(*) FROM orders o
     WHERE o.o_custkey IN (SELECT key FROM dim)) AS exact_pass_rows
)
"""


@query("bloom_semijoin_reduction", oracle=_BLOOM_ORACLE,
       doc="Bloom-filter semi-join reduction accounting: an m-bit portable "
           "bloom (bit_i = hex12(md5(i||':'||key)) % m) built over a "
           "selective customer dimension pre-filters the orders fact scan "
           "before the exact join — the broadcast state is m BITS "
           "regardless of key count/width, the membership test is a pure "
           "codegen expression, and the post-filter shuffle carries only "
           "matches plus the bounded false-positive fraction. Output is "
           "the reduction ledger (rows passing bloom vs exact, false "
           "positives) — hash-identical to the oracle because the bit "
           "placement is engine-portable, unlike Spark's native "
           "xxhash64 runtime bloom filter (which this mirrors).")
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.bloom import bloom_bitmap, bloom_member

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    dim = (
        cust.filter((F.col("c_mktsegment") == "BUILDING")
                    & (F.col("c_acctbal") > 9000))
        .select(F.col("c_custkey").alias("key")).distinct()
    )
    bitmap = bloom_bitmap(dim, "key", m=BLOOM_M, k=BLOOM_K)
    from streamalert_spark.ops.hints import gated_broadcast

    flagged = orders.join(
        gated_broadcast(dim.withColumn("_dim", F.lit(1))),
        orders["o_custkey"] == F.col("key"), "left")
    stats = flagged.agg(
        F.count(F.lit(1)).alias("fact_rows"),
        F.sum(F.when(bloom_member(F.col("o_custkey"), bitmap, k=BLOOM_K), 1)
              .otherwise(0)).cast("bigint").alias("bloom_pass_rows"),
        F.sum(F.coalesce(F.col("_dim"), F.lit(0)))
         .cast("bigint").alias("exact_pass_rows"),
    )
    dim_count = dim.agg(F.count(F.lit(1)).alias("dim_keys"))
    return stats.crossJoin(F.broadcast(dim_count)).select(
        "dim_keys", "fact_rows", "bloom_pass_rows", "exact_pass_rows",
        (F.col("bloom_pass_rows") - F.col("exact_pass_rows"))
        .alias("false_positive_rows"),
    )


# Calibrated (non-demo) bloom: m/k derived from a target capacity and
# false-positive probability by the production sizing formula, proving the
# whole surface — bit placement, bitmap build, membership SQL, oracle
# generation — is parameterized by (m, k), not baked to the 256-bit demo.
_CAL_M, _CAL_K = bloom_calibrate(2000, 0.01)   # -> m=19171, k=7

_CAL_DIM_PRED = "s_acctbal > 5000"

_CAL_MEMBER_SQL = " AND ".join(
    f"({bloom_bit_sql('f.key', i, m=_CAL_M)} IN (SELECT pos FROM bits))"
    for i in range(_CAL_K)
)

_CAL_BITS_SQL = " UNION ALL ".join(
    f"SELECT {bloom_bit_sql('key', i, m=_CAL_M)} AS pos FROM dim"
    for i in range(_CAL_K)
)

_CAL_BLOOM_ORACLE = f"""
WITH dim AS (
  SELECT DISTINCT s_suppkey AS key FROM supplier WHERE {_CAL_DIM_PRED}
),
bits AS (SELECT DISTINCT pos FROM ({_CAL_BITS_SQL})),
fkeys AS (SELECT DISTINCT l_suppkey AS key FROM lineitem),
fmember AS (SELECT f.key, ({_CAL_MEMBER_SQL}) AS pass FROM fkeys f)
SELECT {_CAL_M} AS m_bits, {_CAL_K} AS k_hashes,
       dim_keys, fact_rows, bloom_pass_rows, exact_pass_rows,
       bloom_pass_rows - exact_pass_rows AS false_positive_rows
FROM (
  SELECT
    (SELECT COUNT(*) FROM dim) AS dim_keys,
    (SELECT COUNT(*) FROM lineitem) AS fact_rows,
    (SELECT COUNT(*) FROM lineitem l JOIN fmember m ON l.l_suppkey = m.key
     WHERE m.pass) AS bloom_pass_rows,
    (SELECT COUNT(*) FROM lineitem l
     WHERE l.l_suppkey IN (SELECT key FROM dim)) AS exact_pass_rows
)
"""


@query("bloom_calibrated_semijoin", oracle=_CAL_BLOOM_ORACLE,
       doc="Bloom semi-join reduction at PRODUCTION calibration: m and k "
           "come from bloom_calibrate(capacity=2000, fpp=1%) — the "
           "-n*ln(p)/ln(2)^2 sizing optimum — instead of the 256-bit "
           "demo constant, and the DuckDB oracle is GENERATED from the "
           "same (m, k), proving the portable bit placement and the "
           "oracle surface scale with the calibration. Supplier dim "
           "pre-filters the lineitem fact scan; broadcast state is m "
           "bits (~2.3 KB here, ~12 MB for 10M keys at 1%) however wide "
           "the keys are.")
def bloom_calibrated_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.bloom import bloom_bitmap, bloom_member
    from streamalert_spark.ops.hints import gated_broadcast

    supp = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    dim = (
        supp.filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_suppkey").alias("key")).distinct()
    )
    bitmap = bloom_bitmap(dim, "key", m=_CAL_M, k=_CAL_K)
    flagged = li.join(
        gated_broadcast(dim.withColumn("_dim", F.lit(1))),
        li["l_suppkey"] == F.col("key"), "left")
    stats = flagged.agg(
        F.count(F.lit(1)).alias("fact_rows"),
        F.sum(F.when(bloom_member(F.col("l_suppkey"), bitmap, k=_CAL_K), 1)
              .otherwise(0)).cast("bigint").alias("bloom_pass_rows"),
        F.sum(F.coalesce(F.col("_dim"), F.lit(0)))
         .cast("bigint").alias("exact_pass_rows"),
    )
    dim_count = dim.agg(F.count(F.lit(1)).alias("dim_keys"))
    return stats.crossJoin(F.broadcast(dim_count)).select(
        F.lit(_CAL_M).cast("bigint").alias("m_bits"),
        F.lit(_CAL_K).cast("bigint").alias("k_hashes"),
        "dim_keys", "fact_rows", "bloom_pass_rows", "exact_pass_rows",
        (F.col("bloom_pass_rows") - F.col("exact_pass_rows"))
        .alias("false_positive_rows"),
    )


# ---------------------------------------------------- z-order pruning ledger

_Z_FILES_SHIFT = 4096   # 2^(2*Z_BITS) / 16 files
_Z_BOX = (32, 47, 16, 31)  # x_lo, x_hi, y_lo, y_hi in encoded coords


def _zorder_oracle() -> str:
    from streamalert_spark.ops.layout import z_value_sql

    zx = z_value_sql("x", "y")
    x_lo, x_hi, y_lo, y_hi = _Z_BOX
    return f"""
WITH base AS (
  SELECT event_id, user_id % 256 AS x,
         LEAST(CAST(floor(value / 4.0) AS BIGINT), 255) AS y
  FROM events
),
assigned AS (
  SELECT 'zorder' AS layout, {zx} // {_Z_FILES_SHIFT} AS file_id, x, y FROM base
  UNION ALL SELECT 'xsort', x // 16, x, y FROM base
  UNION ALL SELECT 'hash', event_id % 16, x, y FROM base
)
SELECT layout, CAST(file_id AS BIGINT) AS file_id, COUNT(*) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
       CAST(NOT (MAX(x) < {x_lo} OR MIN(x) > {x_hi}
                 OR MAX(y) < {y_lo} OR MIN(y) > {y_hi}) AS BIGINT) AS candidate,
       CAST(NOT (MAX(y) < {y_lo} OR MIN(y) > {y_hi}) AS BIGINT) AS candidate_yband
FROM assigned GROUP BY layout, file_id
ORDER BY layout, file_id
"""


@query("zorder_pruning_ledger", oracle=_zorder_oracle(),
       doc="Z-order clustering vs single-column sort vs hash layout, "
           "audited by the scan planner's own test: events map to 16 "
           "'files' under each layout, and each file's min/max column "
           "stats decide whether a 2-D box predicate can skip it. The "
           "Morton interleave is pure shift/mask arithmetic (codegen, "
           "engine-portable); the ledger shows z-order files covering "
           "compact hyper-rectangles (few candidates), x-sort pruning "
           "only on x, hash layout pruning nothing — the write-path "
           "operator behind OPTIMIZE ZORDER, with repartitionByRange on "
           "z as the production write step.")
def zorder_pruning_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.layout import layout_ledger, z_value

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(256)).alias("x"),
        F.least(F.floor(F.col("value") / 4.0), F.lit(255)).cast("bigint").alias("y"),
    )
    z = z_value(F.col("x"), F.col("y"))
    assigned = base.select(
        "x", "y",
        F.explode(F.array(
            F.struct(F.lit("zorder").alias("layout"),
                     (z / _Z_FILES_SHIFT).cast("bigint").alias("file_id")),
            F.struct(F.lit("xsort").alias("layout"),
                     (F.col("x") / 16).cast("bigint").alias("file_id")),
            F.struct(F.lit("hash").alias("layout"),
                     F.pmod(F.col("event_id"), F.lit(16)).alias("file_id")),
        )).alias("a"),
    ).select(F.col("a.layout").alias("layout"),
             F.col("a.file_id").alias("file_id"), "x", "y")
    return (layout_ledger(assigned, _Z_BOX)
            .repartition(1).sortWithinPartitions("layout", "file_id"))


# ----------------------------------------------------- shared CDC fixtures

# one definition of the change feed, shared by cdc_merge_snapshot and
# snapshot_diff_feed (Spark side and oracle CTE text alike) so the two
# queries can never drift apart
_CDC_CTES = """
base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
changes AS (
  SELECT user_id AS c_custkey, event_id AS seq,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         'updated-' || CAST(user_id AS VARCHAR) AS c_name,
         ROUND(value, 2) AS c_acctbal
  FROM events WHERE user_id IS NOT NULL
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM changes
  ) WHERE rn = 1
),
merged AS (
  SELECT b.* FROM base b
  WHERE b.c_custkey NOT IN (SELECT c_custkey FROM latest)
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'D'
)
"""


def _customer_cdc_frames(spark: SparkSession, sf_dir: str):
    """(base snapshot, change feed) — the Spark twin of _CDC_CTES."""
    cust = read_table(spark, sf_dir, "customer")
    ev = read_table(spark, sf_dir, "events")
    base = cust.select("c_custkey", "c_name", "c_acctbal")
    changes = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            F.col("user_id").alias("c_custkey"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "error", "D")
             .otherwise("U").alias("op"),
            F.concat(F.lit("updated-"),
                     F.col("user_id").cast("string")).alias("c_name"),
            F.round("value", 2).alias("c_acctbal"),
        )
    )
    return base, changes


# ------------------------------------------------------ CDC merge snapshot

_CDC_ORACLE = f"""
WITH {_CDC_CTES}
SELECT * FROM merged
ORDER BY c_custkey
"""


@query("cdc_merge_snapshot", oracle=_CDC_ORACLE,
       doc="CDC changelog application (MERGE INTO semantics): events act "
           "as a keyed change stream over the customer snapshot — latest "
           "change per key wins (row_number over the CDC sequence), "
           "'error' events delete the key, others upsert (replacing "
           "existing customers and INSERTING never-seen keys), untouched "
           "rows carry through. Plan: one shuffle of the (small) "
           "changelog + a keys-only left-anti join against the base — "
           "the base is read once and shuffled zero times, which is the "
           "whole point at 100 TB.")
def cdc_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.cdc import apply_changelog

    base, changes = _customer_cdc_frames(spark, sf_dir)
    return (
        apply_changelog(base, changes, ["c_custkey"], "seq", "op")
        .repartition(1).sortWithinPartitions("c_custkey")
    )


# ------------------------------------------------------- salted exact top-k

_TOPK_ORACLE = """
SELECT event_type, ROUND(value, 6) AS value, event_id,
       CAST(rn AS BIGINT) AS rank
FROM (
  SELECT event_type, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn <= 3
ORDER BY event_type, rank
"""


@query("salted_topk_per_type", oracle=_TOPK_ORACLE,
       doc="EXACT top-3 events per type via salted two-stage top-k: the "
           "window form sorts EVERY row of a key on one reducer (the "
           "hot-key serialization point at 100 TB); here stage 1 ranks "
           "inside (key, salt) — the hot key's sort spreads over 16 "
           "parallel spill-able bucket sorts — and stage 2 re-ranks the "
           "surviving 16*k rows per key. Result identical to the window "
           "definition (the oracle IS the window form).")
def salted_topk_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.skew import salted_topk

    ev = read_table(spark, sf_dir, "events")
    out = salted_topk(ev, keys=["event_type"],
                      order_cols=["value", "event_id"],
                      payload_cols=["value", "event_id"], k=3)
    return (
        out.select("event_type", F.round("value", 6).alias("value"),
                   "event_id", "rank")
        .repartition(1).sortWithinPartitions("event_type", "rank")
    )


# ------------------------------------------------------ snapshot diff feed

_DIFF_ORACLE = f"""
WITH {_CDC_CTES},
d AS (
  SELECT COALESCE(b.c_custkey, m.c_custkey) AS c_custkey,
         CASE WHEN b.c_custkey IS NULL THEN 'I'
              WHEN m.c_custkey IS NULL THEN 'D'
              WHEN b.c_name IS DISTINCT FROM m.c_name
                   OR b.c_acctbal IS DISTINCT FROM m.c_acctbal THEN 'U'
         END AS op,
         b.c_name AS old_c_name, m.c_name AS new_c_name,
         b.c_acctbal AS old_c_acctbal, m.c_acctbal AS new_c_acctbal
  FROM base b FULL OUTER JOIN merged m ON b.c_custkey = m.c_custkey
)
SELECT * FROM d WHERE op IS NOT NULL
ORDER BY c_custkey
"""


@query("snapshot_diff_feed", oracle=_DIFF_ORACLE,
       doc="Snapshot-diff CDC feed — the INVERSE of changelog "
           "application: diffing yesterday's snapshot against today's "
           "yields the insert/update/delete feed (one full-outer join "
           "on the key; null-safe struct comparison finds changed "
           "rows, unchanged rows emit nothing). Round-trip theorem "
           "pinned in tests: apply(diff(old, new)) onto old == new. "
           "This is how CDC bootstraps from sources that only hand "
           "you periodic full dumps; bucket both snapshots on the key "
           "and the join runs exchange-free.")
def snapshot_diff_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.cdc import apply_changelog, snapshot_diff

    base, changes = _customer_cdc_frames(spark, sf_dir)
    new = apply_changelog(base, changes, ["c_custkey"], "seq", "op")
    return (
        snapshot_diff(base, new, ["c_custkey"])
        .repartition(1).sortWithinPartitions("c_custkey")
    )


# --------------------------------------------------- salted skew join

_SALTED_JOIN_ORACLE = """
WITH skewed AS (
  -- 50% of events collapse onto hot key 0; the rest spread over 1..99
  SELECT CASE WHEN event_id % 2 = 0 THEN 0
              ELSE 1 + event_id % 99 END AS k,
         event_id
  FROM events
),
dim(k, label) AS (
  SELECT i, 'seg-' || CAST(i % 7 AS VARCHAR) FROM range(0, 100) t(i)
)
SELECT d.label, COUNT(*) AS n_events,
       CAST(SUM(s.event_id) AS BIGINT) AS sum_ids
FROM skewed s JOIN dim d ON s.k = d.k
GROUP BY d.label
ORDER BY d.label
"""


@query("salted_skew_join_agg", oracle=_SALTED_JOIN_ORACLE,
       doc="Salted equi-join under a manufactured hot key (50% of events "
           "collapse onto one key): the left side gains a uniform salt, "
           "the dim side replicates once per salt value, and the join "
           "key becomes (k, salt) — the hot key's rows spread over "
           "`salt` reducers instead of one straggler task. This is the "
           "manual rewrite for joins AQE's skew splitting cannot touch "
           "(streaming-static joins, pre-bucketed sides); the salt is "
           "random but the result is provably salt-invariant, which the "
           "hash check proves. At bench scale the replicated dim rides "
           "a broadcast anyway — the salted SHUFFLE path is pinned "
           "separately in tests/test_skew.py.")
def salted_skew_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.skew import salted_join

    ev = read_table(spark, sf_dir, "events")
    skewed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(1 + F.col("event_id") % 99).alias("k"),
        "event_id",
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg-"), (F.col("id") % 7).cast("string"))
        .alias("label"),
    )
    return (
        salted_join(skewed, dim, "k", salt=8)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("event_id").cast("bigint").alias("sum_ids"))
        .repartition(1).sortWithinPartitions("label")
    )


# ------------------------------------------------- int8-quantized ANN top-k

_QUANT_TOPK_ORACLE = """
WITH sc AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS s
  FROM embeddings
),
qv AS (SELECT embedding AS qe, s AS qs FROM sc WHERE vec_id = 0),
terms AS (
  SELECT c.vec_id, c.s, qv.qs,
         CAST(SUM(CAST(
           (CASE WHEN c.s = 0 THEN 0
                 ELSE floor(CAST(c.embedding[i] AS DOUBLE) * 127.0 / c.s
                            + 0.5) END)
         * (CASE WHEN qv.qs = 0 THEN 0
                 ELSE floor(CAST(qv.qe[i] AS DOUBLE) * 127.0 / qv.qs
                            + 0.5) END) AS BIGINT)) AS BIGINT) AS dot_q
  FROM sc c, qv, UNNEST(range(1, len(c.embedding) + 1)) AS t(i)
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id, c.s, qv.qs
)
SELECT vec_id, dot_q,
       round(((CAST(dot_q AS DOUBLE) * s) * qs) / 16129.0, 6) AS score
FROM terms
ORDER BY dot_q DESC, vec_id
LIMIT 10
"""


@query("embedding_quantize_topk", oracle=_QUANT_TOPK_ORACLE,
       doc="SQ8-quantized ANN: per-vector symmetric int8 quantization "
           "(floor-half-up, deterministic), EXACT BIGINT dot products "
           "for the ranking, dequantized double score on top. 4x less "
           "candidate memory than float32 brute force; one scan + "
           "TakeOrdered, the 1-row quantized query broadcasts.")
def embedding_quantize_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    q8 = similarity.quantize_int8(emb)
    qrow = (q8.filter(F.col("vec_id") == 0)
              .select(F.col("q_scale").alias("s_q"),
                      F.col("q_vec").alias("v_q")))
    cand = q8.filter(F.col("vec_id") != 0)
    scored = (
        cand.crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            similarity.int8_dot(F.col("q_vec"), F.col("v_q")).alias("dot_q"),
            "q_scale", "s_q",
        )
        .select(
            "vec_id", "dot_q",
            F.round((F.col("dot_q").cast("double") * F.col("q_scale")
                     * F.col("s_q")) / F.lit(16129.0), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("dot_q").desc(), "vec_id").limit(10)


# ------------------------------------------------------ skew diagnostics

_SKEW_DIAG_ORACLE = """
WITH counts AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM counts
),
top AS (SELECT * FROM counts ORDER BY cnt DESC, key LIMIT 10)
SELECT key, cnt, total_rows, n_keys,
       (cnt * 1000000) // total_rows AS share_ppm,
       (cnt * n_keys * 1000) // total_rows AS ratio_to_avg_x1000
FROM top, tot
ORDER BY cnt DESC, key
"""


@query("skew_key_diagnostics", oracle=_SKEW_DIAG_ORACLE,
       doc="Hot-key diagnostics BEFORE a shuffle: per-key counts, top-10 "
           "keys with exact integer share (ppm) and ratio-to-average "
           "(x1000) — the measurement that decides between plain "
           "hash-join, AQE skew split, and manual salting. One "
           "partial-aggregated count shuffle + a broadcast 1-row global; "
           "top-N is TakeOrderedAndProject, no global sort.")
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.skew import skew_diagnostics

    orders = read_table(spark, sf_dir, "orders")
    out = skew_diagnostics(orders, "o_custkey", top_n=10)
    return out.repartition(1).sortWithinPartitions(
        F.col("cnt").desc(), "key")


# ----------------------------- Matryoshka truncation quality audit (ANN)

_MATRYOSHKA_ORACLE = """
WITH sc AS (
  SELECT vec_id,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS s,
         embedding
  FROM embeddings
),
q AS (
  SELECT vec_id,
         list_transform(
           embedding,
           x -> CAST(CASE WHEN s = 0 THEN 0
                          ELSE floor(CAST(x AS DOUBLE) * 127.0 / s + 0.5)
                     END AS BIGINT)) AS qv
  FROM sc
),
probes AS (SELECT vec_id AS probe_id, qv AS pv FROM q
           WHERE vec_id % 100 = 0),
dots AS (
  SELECT p.probe_id, c.vec_id,
         CAST(SUM(c.qv[i] * p.pv[i]) AS BIGINT) AS dot_full,
         CAST(SUM(CASE WHEN i <= 32 THEN c.qv[i] * p.pv[i] ELSE 0 END)
              AS BIGINT) AS dot_half
  FROM probes p, q c, UNNEST(range(1, len(c.qv) + 1)) AS t(i)
  WHERE c.vec_id <> p.probe_id
  GROUP BY p.probe_id, c.vec_id
),
ranked AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY dot_full DESC, vec_id) AS rn_full,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY dot_half DESC, vec_id) AS rn_half
  FROM dots
)
SELECT probe_id,
       CAST(SUM(CASE WHEN rn_full <= 10 AND rn_half <= 10
                     THEN 1 ELSE 0 END) AS BIGINT) AS overlap_at_10,
       CAST(MIN(CASE WHEN rn_full = 1 THEN vec_id END) AS BIGINT)
         AS top1_full,
       CAST(MIN(CASE WHEN rn_half = 1 THEN vec_id END) AS BIGINT)
         AS top1_half
FROM ranked
GROUP BY probe_id
ORDER BY probe_id
"""


@query("ann_matryoshka_audit", oracle=_MATRYOSHKA_ORACLE,
       doc="Matryoshka-truncation quality audit (Kusupati et al. MRL): "
           "for each probe, rank the corpus by exact int8 dot over the "
           "FULL 64 dims and over the first-32 PREFIX, and report "
           "recall overlap@10 + both top-1s — the measurement that "
           "decides whether a deployment can serve the cheaper prefix "
           "index. Quantized BIGINT dots + vec_id tie-breaks make both "
           "rankings bit-stable across engines. Probes broadcast; the "
           "corpus-sized work is one scan producing both dots in one "
           "pass, then two per-probe windows (partitioned by probe — "
           "the probe count, not the corpus, bounds any partition).")
def ann_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = read_table(spark, sf_dir, "embeddings")
    q8 = similarity.quantize_int8(emb)
    probes = (q8.filter(F.col("vec_id") % 100 == 0)
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("q_vec").alias("pv")))
    dots = (
        q8.filter(F.col("vec_id").isNotNull())
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id", "vec_id",
            similarity.int8_dot(F.col("q_vec"), F.col("pv"))
            .alias("dot_full"),
            similarity.int8_dot(F.slice("q_vec", 1, 32),
                                F.slice("pv", 1, 32)).alias("dot_half"),
        )
    )
    wf = W.partitionBy("probe_id").orderBy(F.col("dot_full").desc(), "vec_id")
    wh = W.partitionBy("probe_id").orderBy(F.col("dot_half").desc(), "vec_id")
    ranked = dots.select(
        "probe_id", "vec_id",
        F.row_number().over(wf).alias("rn_full"),
        F.row_number().over(wh).alias("rn_half"))
    return (
        ranked.groupBy("probe_id")
        .agg(
            F.sum(F.when((F.col("rn_full") <= 10) & (F.col("rn_half") <= 10),
                         1).otherwise(0)).cast("bigint")
            .alias("overlap_at_10"),
            F.min(F.when(F.col("rn_full") == 1, F.col("vec_id")))
            .cast("bigint").alias("top1_full"),
            F.min(F.when(F.col("rn_half") == 1, F.col("vec_id")))
            .cast("bigint").alias("top1_half"))
        .repartition(1).sortWithinPartitions("probe_id")
    )


# ------------------------------------------------------- k-center coreset

_KC_QUANT_DUCK = ("list_transform(embedding, "
                  "x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) "
                  "AS BIGINT))")

# exact integer squared L2 between two quantized 64-dim lists
_KC_DIST_DUCK = ("list_sum(list_transform(range(1, 65), "
                 "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")


def _kc_oracle() -> str:
    dist = _KC_DIST_DUCK
    parts = [f"WITH q AS (SELECT vec_id, {_KC_QUANT_DUCK} AS qv "
             "FROM embeddings),",
             "c0 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),",
             "d1 AS (SELECT q.vec_id, q.qv, "
             f"CAST({dist.format(a='q.qv', b='c0.qv')} AS BIGINT) AS mind "
             "FROM q, c0)"]
    for j in range(1, 8):
        parts.append(
            f", c{j} AS (SELECT vec_id, qv, mind FROM d{j} "
            f"ORDER BY mind DESC, vec_id LIMIT 1)")
        if j < 7:
            parts.append(
                f", d{j + 1} AS (SELECT d.vec_id, d.qv, LEAST(d.mind, "
                f"CAST({dist.format(a='d.qv', b=f'c{j}.qv')} AS BIGINT)) "
                f"AS mind FROM d{j} d, c{j})")
    sel = ["SELECT CAST(0 AS BIGINT) AS sel_idx, vec_id, "
           "CAST(0 AS BIGINT) AS radius FROM c0"]
    sel += [f"SELECT CAST({j} AS BIGINT), vec_id, mind FROM c{j}"
            for j in range(1, 8)]
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel) \
        + "\nORDER BY sel_idx"


_KCENTER_ORACLE = _kc_oracle()


@query("kcenter_coreset", oracle=_KCENTER_ORACLE,
       doc="Greedy k-center coreset selection (Gonzalez 2-approximation) "
           "over int-quantized embeddings: seed with the min vec_id, "
           "then 7x pick the vector FARTHEST from the selected set "
           "(max of running-min squared L2, ties to min vec_id) — the "
           "standard diverse-sample / facility-location pick for "
           "labeling budgets and eval-set construction. Distances are "
           "exact bigint squared L2 on floor(x*1000+0.5) quantized "
           "coordinates (the k-means fixed-point trick), so the greedy "
           "trajectory is bit-identical across engines. Scale: each of "
           "the 7 rounds is one JVM-side zip_with projection over the "
           "corpus plus a TakeOrderedAndProject argmax; the selected "
           "set lives on the driver as 8x64 ints (metadata), the "
           "running-min column rides a localCheckpoint so lineage "
           "stays flat — never a pairwise matrix.")
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import local_rows_df

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
               "* 1000 + 0.5) AS BIGINT))").alias("qv"))

    def dist_to(center_vals):
        arr = "CAST(array(" + ",".join(str(v) for v in center_vals) \
            + ") AS array<bigint>)"
        return F.expr(
            f"aggregate(zip_with(qv, {arr}, (a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)")

    seed = q.orderBy("vec_id").limit(1).collect()[0]
    selected = [(0, int(seed["vec_id"]), 0)]
    cur = q.withColumn("mind", dist_to(seed["qv"])).localCheckpoint()
    for j in range(1, 8):
        far = (cur.orderBy(F.col("mind").desc(), "vec_id")
               .limit(1).collect()[0])
        selected.append((j, int(far["vec_id"]), int(far["mind"])))
        if j < 7:
            cur = (cur.withColumn(
                "mind", F.least(F.col("mind"), dist_to(far["qv"])))
                .localCheckpoint())
    return local_rows_df(
        spark, selected, "sel_idx bigint, vec_id bigint, radius bigint")


# ----------------------------------------------------- reciprocal-rank fusion

_RRF_DOT_DUCK = ("list_sum(list_transform(range(1, 65), "
                 "i -> {a}[i] * {b}[i]))")

_RRF_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
           AS fv,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 16 + 0.5) AS BIGINT)) AS cv
  FROM embeddings
),
probe AS (SELECT fv AS pf, cv AS pc FROM q WHERE vec_id = 0),
ranked_a AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY dot DESC, vec_id) AS rnk
  FROM (SELECT q.vec_id,
               CAST({_RRF_DOT_DUCK.format(a='q.fv', b='probe.pf')}
                    AS BIGINT) AS dot
        FROM q, probe WHERE q.vec_id <> 0
        ORDER BY dot DESC, q.vec_id LIMIT 32)
),
ranked_b AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY dot DESC, vec_id) AS rnk
  FROM (SELECT q.vec_id,
               CAST({_RRF_DOT_DUCK.format(a='q.cv', b='probe.pc')}
                    AS BIGINT) AS dot
        FROM q, probe WHERE q.vec_id <> 0
        ORDER BY dot DESC, q.vec_id LIMIT 32)
),
fused AS (
  SELECT COALESCE(a.vec_id, b.vec_id) AS vec_id,
         CAST(COALESCE(1000000 // (60 + a.rnk), 0)
              + COALESCE(1000000 // (60 + b.rnk), 0) AS BIGINT) AS rrf_fp,
         CAST(COALESCE(a.rnk, 0) AS BIGINT) AS rank_full,
         CAST(COALESCE(b.rnk, 0) AS BIGINT) AS rank_coarse
  FROM ranked_a a FULL OUTER JOIN ranked_b b ON a.vec_id = b.vec_id
)
SELECT vec_id, rrf_fp, rank_full, rank_coarse
FROM fused
ORDER BY rrf_fp DESC, vec_id
LIMIT 10
"""


@query("rrf_fused_topk", oracle=_RRF_ORACLE,
       doc="Reciprocal-rank fusion (Cormack et al.) of two retrieval "
           "channels for the same probe: a full-precision integer-dot "
           "ranking (floor(x*1000) quantization) and a coarse 4-bit-ish "
           "one (floor(x*16)) — the standard way to merge lexical + "
           "dense or cheap + exact rankers without score calibration, "
           "since RRF only consumes RANKS: score = sum 1e6/(60+rank), "
           "exact integer. Scale: each channel is one corpus-scan "
           "TakeOrderedAndProject top-32 (no global sort — rank windows "
           "run on the 32 survivors), the fuse is a 32x32 outer join of "
           "driver-bounded lists, and a missing rank contributes 0 "
           "exactly as the RRF formula prescribes.")
def rrf_fused_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
               "* 1000 + 0.5) AS BIGINT))").alias("fv"),
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) "
               "* 16 + 0.5) AS BIGINT))").alias("cv"))
    probe = (q.filter(F.col("vec_id") == 0)
             .select(F.col("fv").alias("pf"), F.col("cv").alias("pc")))
    cand = q.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(probe))
    dot = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
           "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    w32 = W.partitionBy(F.lit(0)).orderBy(F.col("dot").desc(), "vec_id")

    def channel(a, b, rank_name):
        return (cand.select("vec_id",
                            F.expr(dot.format(a=a, b=b)).alias("dot"))
                .orderBy(F.col("dot").desc(), "vec_id").limit(32)
                .withColumn(rank_name,
                            F.row_number().over(w32).cast("bigint"))
                .select("vec_id", rank_name))

    ra = channel("fv", "pf", "rank_full")
    rb = channel("cv", "pc", "rank_coarse")
    fused = (ra.join(rb, "vec_id", "full_outer")
             .select(
                 "vec_id",
                 (F.coalesce(F.expr("1000000 DIV (60 + rank_full)"),
                             F.lit(0))
                  + F.coalesce(F.expr("1000000 DIV (60 + rank_coarse)"),
                               F.lit(0))).cast("bigint").alias("rrf_fp"),
                 F.coalesce("rank_full", F.lit(0)).cast("bigint")
                 .alias("rank_full"),
                 F.coalesce("rank_coarse", F.lit(0)).cast("bigint")
                 .alias("rank_coarse")))
    return fused.orderBy(F.col("rrf_fp").desc(), "vec_id").limit(10)
