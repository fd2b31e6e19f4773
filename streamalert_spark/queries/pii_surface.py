"""PII-scrub and repetition-signal query surface.

The documents table carries no real PII, so the PII query appends
deterministic PII spans (email, IPv4, phone, SSN, credit card — half the
cards Luhn-valid, half not) to each doc as a function of doc_id — the
same synthesize-then-run-the-real-operator pattern as the URL and
source-decode queries — then runs the REAL detectors/redactor from
ops/pii.py. Redacted text is md5'd to keep the result compact while
still hash-checking every replacement byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops import pii, text
from streamalert_spark.queries import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


def _with_pii(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    ssn4 = F.lpad(s(did % 10000), 4, "0")
    parts = [
        F.col("text"),
        F.concat_ws("", F.lit(" user"), s(did), F.lit("@mail"), s(did % 10),
                    F.lit(".example.com")),
        F.concat_ws("", F.lit(" from 10."), s(did % 200), F.lit("."),
                    s((did * 7) % 250), F.lit("."), s(did % 250)),
        F.when(did % 2 == 0,
               F.concat_ws("", F.lit(" call 555-010-"), ssn4)).otherwise(F.lit("")),
        F.when(did % 3 == 0,
               F.concat_ws("", F.lit(" ssn 123-45-"), ssn4)).otherwise(F.lit("")),
        F.when(did % 8 == 0, F.lit(" card 4111 1111 1111 1111"))
         .when(did % 8 == 4, F.lit(" card 4111-1111-1111-1112"))
         .otherwise(F.lit("")),
    ]
    return docs.withColumn("text", F.concat(*parts))


_PII_TEXT_SQL = """
  text || ' user' || doc_id || '@mail' || (doc_id % 10) || '.example.com'
       || ' from 10.' || (doc_id % 200) || '.' || ((doc_id * 7) % 250)
       || '.' || (doc_id % 250)
       || CASE WHEN doc_id % 2 = 0
               THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END
       || CASE WHEN doc_id % 3 = 0
               THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END
       || CASE WHEN doc_id % 8 = 0 THEN ' card 4111 1111 1111 1111'
               WHEN doc_id % 8 = 4 THEN ' card 4111-1111-1111-1112'
               ELSE '' END
"""

_PII_ORACLE = rf"""
WITH piid AS (
  SELECT doc_id, {_PII_TEXT_SQL} AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '\b\d{{3}}-\d{{2}}-\d{{4}}\b')) AS BIGINT) AS n_ssns,
  CAST(len(regexp_extract_all(text, '\b\d{{4}}[- ]\d{{4}}[- ]\d{{4}}[- ]\d{{4}}\b|\b\d{{16}}\b')) AS BIGINT) AS n_ccs,
  CAST(len(regexp_extract_all(text, '\b\d{{3}}[-.]\d{{3}}[-.]\d{{4}}\b')) AS BIGINT) AS n_phones,
  CAST(len(list_filter(
      list_transform(
        regexp_extract_all(text, '\b\d{{4}}[- ]\d{{4}}[- ]\d{{4}}[- ]\d{{4}}\b|\b\d{{16}}\b'),
        m -> regexp_replace(m, '[- ]', '', 'g')),
      d -> len(d) > 0 AND
           list_sum(list_transform(range(1, len(d) + 1),
             i -> CASE WHEN i % 2 = 0
                  THEN CASE WHEN 2 * (ascii(substr(reverse(d), i, 1)) - 48) > 9
                       THEN 2 * (ascii(substr(reverse(d), i, 1)) - 48) - 9
                       ELSE 2 * (ascii(substr(reverse(d), i, 1)) - 48) END
                  ELSE ascii(substr(reverse(d), i, 1)) - 48 END)) % 10 = 0
  )) AS BIGINT) AS n_ccs_luhn_valid,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
            '\b\d{{3}}-\d{{2}}-\d{{4}}\b', '<SSN>', 'g'),
          '\b\d{{4}}[- ]\d{{4}}[- ]\d{{4}}[- ]\d{{4}}\b|\b\d{{16}}\b', '<CC>', 'g'),
        '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b', '<IP>', 'g'),
      '\b\d{{3}}[-.]\d{{3}}[-.]\d{{4}}\b', '<PHONE>', 'g')
  ) AS redacted_md5
FROM piid
ORDER BY doc_id
"""


@query("pii_detect_redact", oracle=_PII_ORACLE,
       doc="PII sweep: detect emails/IPv4/phones/SSNs/cards (Luhn-checked "
           "via expression-only array fold) and redact with typed tokens — "
           "one projection, zero shuffle.")
def pii_detect_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_pii(_docs(spark, sf_dir))
    return (
        pii.scan(docs)
        .withColumn("redacted_md5", F.md5("redacted_text"))
        .drop("redacted_text")
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH toked AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
grams AS (
  SELECT doc_id, n,
         list_transform(range(1, n), i -> toks[i] || ' ' || toks[i + 1]) AS bi,
         list_transform(range(1, n - 1),
                        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tri
  FROM toked
),
base AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         CASE WHEN len(bi) > 0
              THEN ROUND(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi), 6)
         END AS dup_bigram_frac,
         CASE WHEN len(tri) > 0
              THEN ROUND(1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri), 6)
         END AS dup_trigram_frac,
         bi
  FROM grams
),
gram_counts AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM base, UNNEST(bi) AS t(g)
  GROUP BY doc_id, g
),
top_share AS (
  SELECT doc_id, ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_share
  FROM gram_counts GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.dup_bigram_frac, b.dup_trigram_frac,
       t.top_bigram_share
FROM base b LEFT JOIN top_share t USING (doc_id)
ORDER BY b.doc_id
"""


@query("repetition_signals", oracle=_REPETITION_ORACLE,
       doc="Gopher-style repetition quality signals: within-doc duplicate "
           "bigram/trigram fractions (zero-shuffle array exprs) + top-bigram "
           "share (doc-keyed partial aggregates).")
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        text.repetition_signals(_docs(spark, sf_dir))
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Text hygiene (NFC + control-strip + whitespace collapse)
# ---------------------------------------------------------------------------

_CLEAN_ORACLE = r"""
WITH dirty AS (
  SELECT doc_id,
         text || '  re' || chr(769) || 'sume' || chr(7) || '  tail ' AS raw
  FROM documents
),
cleaned AS (
  SELECT doc_id, raw,
         trim(regexp_replace(
             regexp_replace(nfc_normalize(raw),
                            '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
             '\s+', ' ', 'g')) AS clean
  FROM dirty
)
SELECT doc_id,
       CAST(length(raw) AS BIGINT) AS n_chars_raw,
       CAST(length(clean) AS BIGINT) AS n_chars_clean,
       md5(clean) AS clean_md5
FROM cleaned
ORDER BY doc_id
"""


@query("clean_text_normalize", oracle=_CLEAN_ORACLE,
       doc="Corpus text hygiene: Unicode NFC (Arrow-batched — no Spark "
           "builtin), control-char strip, whitespace collapse, trim — one "
           "projection, zero shuffle; md5 hash-checks every byte.")
def clean_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # decomposed accent + BEL control char + ragged whitespace, appended
    # deterministically so the cleaner has real work on every row
    raw = F.concat(F.col("text"), F.lit("  résume\x07  tail "))
    return (
        docs.select(
            "doc_id",
            F.length(raw).cast("bigint").alias("n_chars_raw"),
            F.length(text.clean_text(raw)).cast("bigint")
             .alias("n_chars_clean"),
            F.md5(text.clean_text(raw)).alias("clean_md5"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# UDTF extension surface
# ---------------------------------------------------------------------------

_UDTF_ORACLE = """
WITH toked AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE doc_id < 50
),
indexed AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx, toks[i] AS token,
         len(toks[i]) AS ln
  FROM toked, UNNEST(range(1, len(toks) + 1)) AS t(i)
)
SELECT doc_id, idx, token,
       CAST(COALESCE(SUM(ln + 1) OVER (
            PARTITION BY doc_id ORDER BY idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS start
FROM indexed
ORDER BY doc_id, idx
"""


@query("udtf_tokenize_offsets", oracle=_UDTF_ORACLE,
       doc="Python UDTF extension point: LATERAL tokenize_offsets(text) "
           "yields (idx, token, char offset) per token (docs 0-49). UDTFs "
           "are the documented slow path — this query exists to exercise "
           "the registration + LATERAL plumbing, not the tokenizer (whose "
           "native twin is the token_counts projection).")
def udtf_tokenize_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.udtfs import register_udtfs
    from streamalert_spark.queries.sql_surface import register_views

    register_udtfs(spark)
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT d.doc_id, f.idx, f.token, f.start
        FROM (SELECT doc_id, text FROM documents WHERE doc_id < 50) d,
             LATERAL tokenize_offsets(d.text) f
        ORDER BY d.doc_id, f.idx
    """).repartition(1).sortWithinPartitions("doc_id", "idx")


# ---------------------------------------------------------------------------
# UDAF extension surface
# ---------------------------------------------------------------------------

_UDAF_ORACLE = """
SELECT event_type,
       CAST(list_sort(list(CAST(value * 100 AS BIGINT)))
            [CAST(floor((COUNT(*) - 1) / 2) AS INT) + 1] AS BIGINT)
         AS median_cents,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("udaf_lower_median", oracle=_UDAF_ORACLE,
       doc="Python UDAF extension point: Arrow grouped-agg pandas UDF "
           "computing the integer lower median of value-cents per "
           "event_type (order-statistic semantics — integer-exact across "
           "engines where float UDAFs are not). Documented slow path: "
           "each group's column materializes per task.")
def udaf_lower_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.udafs import group_count_agg, lower_median_agg
    from streamalert_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    return (
        ev.groupBy("event_type")
        .agg(lower_median_agg(F.col("cents")).alias("median_cents"),
             group_count_agg(F.col("cents")).alias("n"))
        .repartition(1).sortWithinPartitions("event_type")
    )


# ------------------------------------------- k-anonymity / l-diversity audit

_KANON_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS group_size,
         CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
              AS BIGINT) AS l_distinct
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, group_size, l_distinct,
       CASE WHEN group_size >= 5 THEN 1 ELSE 0 END AS k_anonymous,
       CASE WHEN l_distinct >= 3 THEN 1 ELSE 0 END AS l_diverse
FROM g
ORDER BY c_nationkey, c_mktsegment
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE,
       doc="Privacy-release audit for a training-data export: every "
           "quasi-identifier equivalence class (nation, market segment) "
           "is scored for k-anonymity (class size >= k=5 -- Sweeney 2002) "
           "and l-diversity of the sensitive attribute (>= l=3 distinct "
           "account-balance bands -- Machanavajjhala et al. 2007). One "
           "hash aggregate with a partial-agg distinct; at 100 TB the QI "
           "grouping is the same shuffle any groupBy pays and the "
           "distinct rides Spark's two-phase COUNT DISTINCT expansion.")
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    cust = read_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
    g = (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"),
             F.countDistinct(band).alias("l_distinct"))
    )
    return (
        g.select(
            "c_nationkey", "c_mktsegment", "group_size", "l_distinct",
            F.when(F.col("group_size") >= 5, 1).otherwise(0)
             .cast("int").alias("k_anonymous"),
            F.when(F.col("l_distinct") >= 3, 1).otherwise(0)
             .cast("int").alias("l_diverse"),
        )
        .repartition(1).sortWithinPartitions("c_nationkey", "c_mktsegment")
    )


# ------------------------------------- consistent pseudonymization audit

_PSEUDO_SALT = "release-2024q3"

_PSEUDO_ORACLE = f"""
WITH cust AS (
  SELECT md5('{_PSEUDO_SALT}:' || CAST(c_custkey AS VARCHAR)) AS pseud,
         c_nationkey
  FROM customer
),
ords AS (
  SELECT md5('{_PSEUDO_SALT}:' || CAST(o_custkey AS VARCHAR)) AS pseud,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
cagg AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(COUNT(DISTINCT pseud) AS BIGINT) AS n_pseudonyms
  FROM cust GROUP BY c_nationkey
),
oagg AS (
  SELECT c.c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(o.price) AS total_dec
  FROM ords o JOIN cust c ON c.pseud = o.pseud
  GROUP BY c.c_nationkey
)
SELECT cagg.c_nationkey, n_customers, n_pseudonyms,
       COALESCE(n_orders, 0) AS n_orders,
       ROUND(CAST(COALESCE(total_dec, 0) AS DOUBLE), 2) AS total_price
FROM cagg LEFT JOIN oagg ON oagg.c_nationkey = cagg.c_nationkey
ORDER BY cagg.c_nationkey
"""


@query("pseudonymize_consistent", oracle=_PSEUDO_ORACLE,
       doc="Consistent pseudonymization across tables: customer and "
           "orders keys are independently replaced by the SAME keyed "
           "md5 pseudonym (ops/pii.py pseudonymize — the HMAC seam), and "
           "the audit proves referential integrity survives: per nation, "
           "pseudonym count == customer count (injective at this scale) "
           "and orders still join their customers THROUGH the pseudonym "
           "only. Join keys are uniform md5 strings — unskewable; the "
           "customer side rides a size-gated broadcast.")
def pseudonymize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.hints import gated_broadcast
    from streamalert_spark.session import read_table

    cust = read_table(spark, sf_dir, "customer").select(
        pii.pseudonymize(F.col("c_custkey"), _PSEUDO_SALT).alias("pseud"),
        "c_nationkey",
    )
    ords = read_table(spark, sf_dir, "orders").select(
        pii.pseudonymize(F.col("o_custkey"), _PSEUDO_SALT).alias("pseud"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    cagg = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.count_distinct("pseud").cast("bigint").alias("n_pseudonyms"),
    )
    oagg = (
        ords.join(gated_broadcast(cust), "pseud")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
             F.sum("price").alias("total_dec"))
    )
    return (
        cagg.join(oagg, "c_nationkey", "left")
        .select(
            "c_nationkey", "n_customers", "n_pseudonyms",
            F.coalesce(F.col("n_orders"), F.lit(0).cast("bigint"))
             .alias("n_orders"),
            F.round(F.coalesce(F.col("total_dec"),
                               F.lit(0).cast("decimal(18,2)"))
                     .cast("double"), 2).alias("total_price"),
        )
        .repartition(1).sortWithinPartitions("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Prefix-preserving IP pseudonymization + structure audit (CryptoPAn-style)
# ---------------------------------------------------------------------------

def _ip_anon_oracle() -> str:
    from streamalert_spark.ops.pii import (
        common_prefix_len_sql, ip_bits_sql, prefix_preserving_anon_sql,
    )

    return f"""
WITH ips AS (
  SELECT DISTINCT CAST(167772160 + (user_id * 7919) % 16777216 AS BIGINT)
         AS ip
  FROM events WHERE user_id IS NOT NULL
),
b AS (SELECT ip, {ip_bits_sql('ip')} AS bits FROM ips),
a AS (SELECT ip, bits, {prefix_preserving_anon_sql('bits')} AS anon_ip
      FROM b),
ab AS (SELECT ip, bits, anon_ip, {ip_bits_sql('anon_ip')} AS anon_bits
       FROM a),
p AS (
  SELECT bits, anon_bits,
         lead(bits) OVER (PARTITION BY substring(bits, 1, 12)
                          ORDER BY ip) AS nbits,
         lead(anon_bits) OVER (PARTITION BY substring(bits, 1, 12)
                               ORDER BY ip) AS nabits
  FROM ab
),
c AS (
  SELECT {common_prefix_len_sql('bits', 'nbits')} AS cpl_orig,
         {common_prefix_len_sql('anon_bits', 'nabits')} AS cpl_anon
  FROM p WHERE nbits IS NOT NULL
)
SELECT cpl_orig AS cpl, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN cpl_orig = cpl_anon THEN 1 ELSE 0 END)
            AS BIGINT) AS n_preserved
FROM c GROUP BY cpl_orig ORDER BY cpl
"""


@query("ip_prefix_anonymize_audit", oracle=_ip_anon_oracle(),
       doc="CryptoPAn-style prefix-preserving IP pseudonymization (Xu et "
           "al.): bit i of the pseudonym = bit XOR keyed-PRF(first i-1 "
           "bits), so subnets survive anonymization and the audit proves "
           "it — per common-prefix-length bucket, EVERY consecutive pair "
           "preserves its cpl exactly (n_preserved == n_pairs). The "
           "anonymizer is a zero-shuffle generated projection; the audit "
           "windows are hash-partitioned by /12 prefix. Spark and the "
           "oracle consume the SAME generated SQL expression text, so "
           "the bit derivation cannot drift between engines.")
def ip_prefix_anonymize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from streamalert_spark.ops.pii import (
        common_prefix_len_sql, ip_bits_sql, prefix_preserving_anon,
    )
    from streamalert_spark.session import read_table

    ips = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select((F.lit(167772160) + (F.col("user_id") * 7919) % 16777216)
                .cast("bigint").alias("ip"))
        .distinct()
    )
    ab = (
        prefix_preserving_anon(ips, "ip")
        .withColumn("bits", F.expr(ip_bits_sql("ip")))
        .withColumn("anon_bits", F.expr(ip_bits_sql("anon_ip")))
    )
    w = W.partitionBy(F.expr("substring(bits, 1, 12)")).orderBy("ip")
    p = (
        ab.select(
            "bits", "anon_bits",
            F.lead("bits").over(w).alias("nbits"),
            F.lead("anon_bits").over(w).alias("nabits"),
        )
        .filter(F.col("nbits").isNotNull())
    )
    c = p.select(
        F.expr(common_prefix_len_sql("bits", "nbits")).alias("cpl_orig"),
        F.expr(common_prefix_len_sql("anon_bits", "nabits")).alias("cpl_anon"),
    )
    return (
        c.groupBy(F.col("cpl_orig").alias("cpl"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("cpl_orig") == F.col("cpl_anon"), 1)
                   .otherwise(0)).cast("bigint").alias("n_preserved"),
        )
        .repartition(1).sortWithinPartitions("cpl")
    )


# ---------------------------------------------------------------------------
# Table PII profile (governance scan: every string column x every type)
# ---------------------------------------------------------------------------

_PII_TYPES = (
    ("cc", pii.CC_PATTERN),
    ("email", pii.EMAIL_PATTERN),
    ("ipv4", pii.IPV4_PATTERN),
    ("phone", pii.PHONE_PATTERN),
    ("ssn", pii.SSN_PATTERN),
)

_PII_PROFILE_COLS = ("lang", "source", "text")


def _pii_profile_oracle() -> str:
    # plain string building (no f-string) so the regex braces stay literal
    parts = []
    for col in _PII_PROFILE_COLS:
        for tname, pat in _PII_TYPES:
            sql_pat = pat.replace("'", "''")
            parts.append(
                "SELECT '" + col + "' AS col_name, '" + tname
                + "' AS pii_type,\n"
                + "  CAST(SUM(len(regexp_extract_all(" + col + ", '"
                + sql_pat + "'))) AS BIGINT) AS n_hits,\n"
                + "  CAST(SUM(CASE WHEN len(regexp_extract_all(" + col
                + ", '" + sql_pat + "')) > 0 THEN 1 ELSE 0 END) AS BIGINT)"
                + " AS n_rows_with_hits\nFROM piid")
    return ("WITH piid AS (\n  SELECT doc_id, " + _PII_TEXT_SQL
            + " AS text, lang, source FROM documents\n)\n"
            + "\nUNION ALL\n".join(parts)
            + "\nORDER BY col_name, pii_type")


@query("table_pii_profile", oracle=_pii_profile_oracle(),
       doc="Governance PII profile of a whole table: every string column "
           "scanned against every PII pattern, reporting total hits and "
           "rows-with-hits per (column, type) — the scan that proves "
           "which columns are clean (zeros are the deliverable) and "
           "which need the redaction pass. Columns stack via explode in "
           "ONE scan; regexes stay literal (codegen'd); only the 15-row "
           "rollup shuffles.")
def table_pii_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_pii(_docs(spark, sf_dir))
    stacked = docs.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"), F.col(c).alias("v"))
        for c in _PII_PROFILE_COLS
    ])).alias("s")).select("s.col_name", "s.v")
    per_type = F.array(*[
        F.struct(F.lit(t).alias("pii_type"),
                 pii._count(F.col("v"), p).alias("c"))
        for t, p in _PII_TYPES
    ])
    hits = (stacked.select("col_name", F.explode(per_type).alias("h"))
            .select("col_name", "h.pii_type", "h.c"))
    return (
        hits.groupBy("col_name", "pii_type")
        .agg(F.sum("c").cast("bigint").alias("n_hits"),
             F.sum(F.when(F.col("c") > 0, 1).otherwise(0)).cast("bigint")
              .alias("n_rows_with_hits"))
        .repartition(1).sortWithinPartitions("col_name", "pii_type")
    )
