"""Scale-path near-dup queries: SimHash hamming pairs via pigeonhole
blocking, and IVF-style cell-pruned ANN. Both oracle-checked.

These are the operators that replace quadratic forms at 100 TB:
- simhash_neardup_pairs shuffles O(docs x blocks) instead of O(docs^2);
- ivf_ann_topk scores ~n_probe/n_cells of the corpus instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamalert_spark.ops import dedup, similarity
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
