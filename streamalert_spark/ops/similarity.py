"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against a query vector. The dot
  product is a native zip_with + aggregate over the array — JVM-side,
  sequential accumulation (deterministic order). At 100 TB this is one scan
  + a top-k (TakeOrdered) — no shuffle beyond the final k.
- cosine_pairs: all-pairs near-duplicate detection above a threshold. The
  pairwise form is the verifier; the scale path buckets vectors first
  (random-hyperplane LSH — sign bits of projections) so the join is
  per-bucket, not cross.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from streamalert_spark.session import local_rows_df


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two array columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector. Rounded score +
    unique tie-break keeps the result deterministic across engines."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    score = F.round(cosine(F.col(vec_col), q), 6)
    return (
        df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_blocks: int = 8,
) -> DataFrame:
    """All-pairs cosine >= threshold (near-duplicate embeddings).

    Block-nested-loop join, fully distributed: vectors are hashed into
    ``num_blocks`` blocks by id, the B*(B+1)/2 unordered block pairs fan out
    via a broadcast of the tiny block-pair table, and each (bi, bj) task
    scores its two blocks against each other with one float64 BLAS matmul.
    Nothing is ever materialized on the driver; per-task work is
    O((n/B)^2 * dim) and the shuffle replicates each row (B+1)/2 times on
    average — pick B ~ sqrt(n_rows / rows_per_task) at scale. Exact
    (every pair is scored once); LSH (lsh_bucketed_pairs) is the
    approximate path when even O(n^2/B) pairs is too much.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    pair_rows = [(bi, bj) for bi in range(num_blocks) for bj in range(bi, num_blocks)]
    # Two independently-constructed plans (fresh literal frames, renamed
    # columns) so the cogroup below is not an ambiguous self-join.
    left_pairs = local_rows_df(spark, pair_rows, "bi int, bj int")
    right_pairs = local_rows_df(spark, pair_rows, "r_bi int, r_bj int")
    blk = (F.col(id_col) % num_blocks).cast("int")
    left = (
        df.select(F.col(id_col).alias("l_id"), F.col(vec_col).alias("l_vec"),
                  blk.alias("l_blk"))
        .join(F.broadcast(left_pairs), F.col("l_blk") == F.col("bi"))
    )
    right = (
        df.select(F.col(id_col).alias("r_id"), F.col(vec_col).alias("r_vec"),
                  blk.alias("r_blk"))
        .join(F.broadcast(right_pairs), F.col("r_blk") == F.col("r_bj"))
    )

    def score(left_pdf: pd.DataFrame, right_pdf: pd.DataFrame) -> pd.DataFrame:
        if left_pdf.empty or right_pdf.empty:
            return pd.DataFrame({"a": [], "b": [], "score": []})
        X = np.array(left_pdf["l_vec"].tolist(), dtype=np.float64)
        Y = np.array(right_pdf["r_vec"].tolist(), dtype=np.float64)
        x_ids = left_pdf["l_id"].to_numpy()
        y_ids = right_pdf["r_id"].to_numpy()
        xn = np.sqrt((X * X).sum(axis=1))
        yn = np.sqrt((Y * Y).sum(axis=1))
        S = np.round((X @ Y.T) / np.outer(xn, yn), 6)
        # bi < bj pairs each unordered pair exactly once across block pairs;
        # the id inequality both orders (a, b) and dedupes the bi == bj case.
        keep = (S >= threshold) & (x_ids[:, None] != y_ids[None, :])
        ai, bj = np.nonzero(keep)
        a, b = x_ids[ai], y_ids[bj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"a": lo, "b": hi, "score": S[ai, bj]})
        return out.drop_duplicates(subset=["a", "b"])

    id_type = dict(df.dtypes)[id_col]
    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("r_bi", "r_bj"))
        .applyInPandas(score, schema=f"a {id_type}, b {id_type}, score double")
    )


def batch_cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k for a BATCH of query vectors in one corpus scan.

    The query set broadcasts (probe batches are small by definition);
    scoring is corpus-parallel. Top-k is a two-phase aggregate: each scan
    partition keeps only its local top-k per query, then the global merge
    sees q x partitions x k rows — the shuffle never carries the scored
    corpus, so the plan survives any corpus size. Ties break on vec_id
    ascending via a negated-id sort key (no float negation, so scores
    round-trip exactly).
    """
    q = df.filter(F.col(id_col).isin([int(i) for i in query_ids])).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    scored = df.crossJoin(F.broadcast(q)).select(
        "q_id", F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("score"))
    item = F.struct(
        F.col("score"), (-F.col(id_col)).alias("nv"), F.col(id_col).alias("vid"))
    local = (
        scored.groupBy("q_id", F.spark_partition_id().alias("p"))
        .agg(F.slice(F.sort_array(F.collect_list(item), asc=False), 1, k).alias("tk"))
    )
    merged = (
        local.select("q_id", F.explode("tk").alias("t"))
        .groupBy("q_id")
        .agg(F.slice(F.sort_array(F.collect_list("t"), asc=False), 1, k).alias("tk"))
    )
    return (
        merged.select("q_id", F.posexplode("tk").alias("rank0", "t"))
        .select(
            "q_id",
            F.col("t.vid").alias(id_col),
            F.col("t.score").alias("score"),
            (F.col("rank0") + 1).cast("bigint").alias("rank"),
        )
    )


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Pure-expression all-pairs form (sequential double accumulation,
    engine-portable to the last bit). Norms are computed once per vector —
    bit-identical to per-pair recomputation, 3x less work."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                  norm(F.col(vec_col)).alias("na"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                  norm(F.col(vec_col)).alias("nb"))
    score = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def _half_up6(x: float) -> float:
    """Round half away from zero at 6 decimals — matches Spark F.round /
    DuckDB ROUND so driver-side probe selection agrees with both engines."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _pydot(u: list[float], v: list[float]) -> float:
    acc = 0.0
    for x, y in zip(u, v):
        acc += x * y
    return acc


def _pynorm(u: list[float]) -> float:
    import math

    acc = 0.0
    for x in u:
        acc += x * x
    return math.sqrt(acc)


def ivf_topk(
    df: DataFrame,
    n_cells: int = 8,
    n_probe: int = 2,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: int = 0,
) -> DataFrame:
    """IVF-style ANN: deterministic coarse quantizer + cell-pruned search.

    Centroids are the n_cells lowest-id vectors (deterministic stand-in for
    k-means — the plan shape is identical); every vector is assigned to its
    max-cosine centroid in one projection pass; the query probes only the
    n_probe nearest cells, so the scored fraction is ~n_probe/n_cells of the
    corpus. Centroids + query are collected driver-side (metadata scale:
    n_cells+1 rows) and inlined as literals — the scan itself never
    collects. Python-side probe ranking reproduces engine arithmetic
    exactly (sequential double accumulation + half-away-from-zero rounding).
    """
    # TRUE lowest-id seeds (orderBy + limit), robust to sparse or
    # non-zero-based id spaces where `id < n_cells` could find none
    seeds_rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    seeds = sorted((int(r[0]), [float(v) for v in r[1]]) for r in seeds_rows)
    if not seeds:
        raise ValueError("ivf_topk: input has no vectors to seed centroids from")
    q = [float(v) for v in df.filter(F.col(id_col) == query_id).select(vec_col).head()[0]]
    qn = _pynorm(q)
    ranked = sorted((-_half_up6(_pydot(q, sv) / (qn * _pynorm(sv))), sid) for sid, sv in seeds)
    probes = [sid for _, sid in ranked[:n_probe]]

    vn = norm(F.col(vec_col))
    cell_structs = F.array(*[
        F.struct(
            (-F.round(
                dot(F.col(vec_col), F.array(*[F.lit(v) for v in sv]))
                / (vn * F.lit(_pynorm(sv))), 6)).alias("ns"),
            F.lit(sid).alias("seed"),
        )
        for sid, sv in seeds
    ])
    qlit = F.array(*[F.lit(v) for v in q])
    score = F.round(dot(F.col(vec_col), qlit) / (vn * F.lit(qn)), 6)
    return (
        df.select(F.col(id_col), score.alias("score"),
                  F.array_min(cell_structs)["seed"].alias("cell"))
        .filter(F.col("cell").isin(probes))
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_bucketed_pairs(
    df: DataFrame,
    hyperplanes: list[list[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scale path: random-hyperplane LSH — bucket = sign-bit string of the
    projections; candidate pairs share a bucket; exact cosine verifies.
    The join is on the bucket key, so the shuffle is O(n), and per-bucket
    pair counts stay small when the planes split the space evenly."""
    bucket_bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in plane])) >= 0, "1").otherwise("0")
        for plane in hyperplanes
    ]
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), F.concat(*bucket_bits).alias("bucket")
    )
    a = bucketed.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    b = bucketed.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    score = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", score.alias("score"))
        .filter(F.col("score") >= threshold)
        .distinct()
    )


def hash_planes(num_planes: int, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes via Knuth
    multiplicative hashing — each component's sign is the top bit of
    (i·2654435761 + k·2246822519) mod 2³². Integer arithmetic only —
    reproducible verbatim in an engine-portable SQL oracle, and with
    more entropy than the period-7 pattern of
    queries.analytics_ext._hyperplanes at large plane counts.

    Measured caveat (round 12, SCALE.md): plane choice does NOT fix
    signature-bucket skew on directionally-dense corpora. On the sf10
    test embeddings per-bit balance is a perfect 0.500 under raw,
    mean-centered, and median thresholds for BOTH generators, yet one
    signature bucket holds ~23% of vectors — the bits are individually
    balanced but jointly correlated because the DATA clusters. Sign
    bits cannot split a genuine similarity cluster without dropping
    true pairs; see banded_hyperplane_pairs' scope note."""
    return [
        [1.0 if ((i * 2654435761 + k * 2246822519) & 0xFFFFFFFF) >> 31
         else -1.0 for i in range(dim)]
        for k in range(num_planes)
    ]


def derive_rows_per_band(n: int, target_bucket: int = 1_000,
                         floor: int = 4) -> int:
    """The banded-LSH sizing rule: bits per band r = max(floor,
    ceil(log2(n / target_bucket))), so the EXPECTED bucket size
    n / 2^r stays ~target_bucket at any corpus scale. Derived from a
    COUNT on both engines (the oracle computes the identical expression
    in SQL), so Spark and DuckDB agree at every SF without baking an
    SF-specific constant into the query."""
    import math

    if n <= target_bucket:
        return floor
    return max(floor, math.ceil(math.log2(n / target_bucket)))


def banded_hyperplane_pairs(
    df: DataFrame,
    planes: list[list[float]],
    bands: int,
    rows_per_band: int,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Banded random-hyperplane LSH near-dup pairs — the scale-path
    embedding pair finder, staged in round 12 after the third measured
    decade caught the fixed-bucket variants' quadratic term.

    ``cell_bucketed_pairs`` (IVF-flat, n_cells FIXED) and the
    single-band ``lsh_bucketed_pairs`` (2^planes buckets FIXED) both
    verify O(n²/buckets) candidate pairs, and the cell variant's join
    parallelism is additionally capped at the cell count: measured,
    semantic_cell_neardup ran 10.5 s at sf1 (20k vectors) and did NOT
    FINISH 30+ minutes at sf10 (200k vectors, 7-task join). Banding
    fixes both axes the way the MinHash doc-dedup path does:

    - bits per band ``rows_per_band`` (r) controls EXPECTED bucket size
      n/2^r — grow r with log2(n) (``derive_rows_per_band``) so the
      bucket COUNT tracks n and parallelism is thousands of
      (band, signature) keys, never a fixed constant;
    - ``bands`` (b) buys recall back: P(candidate) = 1-(1-s^r)^b for
      bit-agreement rate s = 1 - angle/π — the near-dup regime
      (cos ≥ 0.9, s ≥ 0.86) keeps recall high at useful r.

    Shuffle is O(n·b) rows (the vector rides to its b band keys);
    verification is exact cosine, so precision is exact by
    construction; `distinct()` dedups pairs that collide in several
    bands. Output is independent of physical partitioning.

    SCOPE (measured, SCALE.md r12): expected-size math governs only as
    far as the data cooperates — a corpus with a directionally-dense
    cluster keeps that cluster in one signature bucket at ANY r (bits
    that split it would drop true pairs), and a corpus whose TRUE pair
    density is quadratic (the rotated-replica test embeddings measure
    95k → 9.7M pairs across one decade at threshold 0.4) makes every
    exact pair emitter super-linear on output alone. For such data the
    100-TB contract is bounded-output search (ivf_topk,
    batch_cosine_topk) or candidate + connected components, not
    all-pairs emission; this op is the right shape where near-dup
    density is sparse (natural corpora at cos ≥ 0.9).
    """
    nbits = bands * rows_per_band
    if len(planes) < nbits:
        raise ValueError(
            f"banded_hyperplane_pairs: need {nbits} planes, got {len(planes)}")
    bits = [
        F.when(dot(F.col(vec_col),
                   F.array(*[F.lit(float(x)) for x in planes[i]])) >= 0,
               "1").otherwise("0")
        for i in range(nbits)
    ]
    band_keys = F.array(*[
        F.concat(F.lit(f"{b}:"),
                 *bits[b * rows_per_band:(b + 1) * rows_per_band])
        for b in range(bands)
    ])
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), F.explode(band_keys).alias("bk"))
    a = bucketed.select(F.col(id_col).alias("a"),
                        F.col(vec_col).alias("va"), "bk")
    b_ = bucketed.select(F.col(id_col).alias("b"),
                         F.col(vec_col).alias("vb"), "bk")
    score = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b_, "bk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", score.alias("score"))
        .filter(F.col("score") >= threshold)
        .distinct()
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means over an embedding column — the semantic-clustering
    pass behind cluster-balanced sampling and within-cluster dedup.

    Deterministic: init centroids are the k lowest-id vectors; ties in
    the assignment argmin break to the lowest cluster index (sort_array
    on (dist, idx) structs). Returns (id, cluster) assignments.

    Scale: each iteration is ONE scan projecting k squared-L2 distances
    (centroids inlined as literals — k x dim scalars) + ONE
    partial-aggregated groupBy(cluster, dim) mean whose result (k x dim
    rows) is collected to the driver: per-iteration driver traffic is
    metadata-scale, the corpus never moves. The update uses an index
    explode rather than elementwise array aggregation so the mean stays
    a plain partial-aggregated AVG at any dimensionality.
    """
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>")
                     .alias("v"))
    seed_rows = vecs.orderBy(id_col).limit(k).collect()
    centroids = [list(r["v"]) for r in seed_rows]

    def assign(cents: list[list[float]]) -> DataFrame:
        dists = [
            F.struct(
                F.aggregate(
                    F.zip_with(F.col("v"),
                               F.array(*[F.lit(x) for x in c]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(cents)
        ]
        best = F.sort_array(F.array(*dists))[0]["i"]
        return vecs.withColumn("cluster", best.cast("bigint"))

    for _ in range(iters):
        assigned = assign(centroids)
        means = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim").agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["dim"])] = r["m"]
        for ci, dims in by_cluster.items():
            new[ci] = [dims[d] for d in range(len(dims))]
        centroids = new

    return assign(centroids).select(id_col, "cluster")


def cell_bucketed_pairs(
    df: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Centroid-cell-bucketed near-dup pairs — the IVF counterpart to
    lsh_bucketed_pairs: assign every vector to its max-cosine coarse cell
    (deterministic lowest-id seed centroids, ties to the lowest seed id),
    then run exact cosine only WITHIN cells. The cross join shrinks from
    O(n^2) to O(n^2 / cells) with uniform cells; recall trades at cell
    boundaries exactly like IVF search. Centroids inline as literals
    (metadata-scale driver traffic); the corpus shuffles once on cell id.

    SCALE SCOPE (measured, round 12): n_cells is FIXED, so within-cell
    pair work is still quadratic in n and the join's parallelism is the
    cell count — at 200k vectors the 8-cell variant did not finish 30+
    minutes in a 7-task join. This op is the small-corpus / demo shape;
    at scale use bounded-output search (ivf_topk, batch_cosine_topk) or
    banded_hyperplane_pairs, whose bits-per-band grow with log2(n).
    """
    # TRUE lowest-id seeds (orderBy + limit), robust to sparse or
    # non-zero-based id spaces where `id < n_cells` could find none —
    # an empty seed set would null out the array_min cell assignment
    # and silently return zero pairs
    seeds_rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    seeds = sorted((int(r[0]), [float(v) for v in r[1]]) for r in seeds_rows)
    if not seeds:
        raise ValueError("cell_bucketed_pairs: input has no vectors to seed cells from")
    vn = norm(F.col(vec_col))
    cell_structs = F.array(*[
        F.struct(
            (-F.round(
                dot(F.col(vec_col), F.array(*[F.lit(v) for v in sv]))
                / (vn * F.lit(_pynorm(sv))), 6)).alias("ns"),
            F.lit(sid).alias("seed"),
        )
        for sid, sv in seeds
    ])
    assigned = df.select(
        F.col(id_col), F.col(vec_col),
        vn.alias("vn"),
        F.array_min(cell_structs)["seed"].alias("cell"),
    )
    a = assigned.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                        F.col("vn").alias("na"), "cell")
    b = assigned.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                        F.col("vn").alias("nb"), "cell")
    score = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .select("cell", "a", "b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


KMEANS_FIXED_SCALE = 1_000_000


def kmeans_lloyd_fixed(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-point Lloyd's k-means: components quantize ONCE to integer
    micro-units (floor(x*1e6 + 0.5) — pure double ops, identical in any
    IEEE engine), distances are exact BIGINT sums, and each centroid
    update is an exact integer floor-division of (component sum, count).
    No floating-point accumulation anywhere, so the full iterative loop
    is bit-reproducible across engines and partitionings — the property
    the float variant (``kmeans_lloyd``) cannot have, because a
    float mean depends on reduction order. Same plan shape as the float
    variant: one scan per iteration, k×dim driver traffic.

    Init centroids are the k lowest-id vectors; argmin ties break to the
    lowest cluster index. Returns (id, cluster) assignments."""
    from streamalert_spark.ops.dedup import _swap_cache

    # the quantized vector table feeds every iteration's assign AND the
    # per-iteration centroid aggregate (plus the seed collect): cache it
    # once so the source scan + transform run once, not 2*iters+2 times
    vecs = _swap_cache("km_vecs", df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * KMEANS_FIXED_SCALE
                              + F.lit(0.5)).cast("bigint"),
        ).alias("v"),
    ))
    seed_rows = vecs.orderBy(id_col).limit(k).collect()
    centroids = [list(r["v"]) for r in seed_rows]

    def assign(cents: list[list[int]]) -> DataFrame:
        dists = [
            F.struct(
                F.aggregate(
                    F.zip_with(F.col("v"),
                               F.array(*[F.lit(int(x)) for x in c]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("bigint"), lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(cents)
        ]
        best = F.sort_array(F.array(*dists))[0]["i"]
        return vecs.withColumn("cluster", best.cast("bigint"))

    for _ in range(iters):
        assigned = assign(centroids)
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep position
        for r in sums:
            # Python // floors — matches the oracle's posmod floor-div
            new[int(r["cluster"])][int(r["dim"])] = int(r["s"]) // int(r["n"])
        centroids = new

    return assign(centroids).select(id_col, "cluster")


def hard_negatives(
    df: DataFrame,
    query_ids: list[int],
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for retrieval / contrastive training: for
    each query vector, the top-k most similar vectors carrying a
    DIFFERENT label — same-label neighbors are positives, so the hardest
    negatives are the highest-scoring cross-label hits (the standard
    in-batch-negatives upgrade: mine globally, not per batch).

    Same plan shape as batch_cosine_topk: the probe batch broadcasts,
    the label filter runs before scoring can shuffle anything, and top-k
    is the two-phase aggregate (per-partition local top-k, then a
    q x partitions x k merge) — the scored corpus itself never shuffles,
    so the plan survives any corpus size."""
    q = df.filter(F.col(id_col).isin([int(i) for i in query_ids])).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"))
    scored = (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(label_col) != F.col("q_label"))
        .select("q_id", F.col(id_col),
                F.round(cosine(F.col(vec_col), F.col("q_vec")), 6)
                 .alias("score"))
    )
    item = F.struct(
        F.col("score"), (-F.col(id_col)).alias("nv"), F.col(id_col).alias("vid"))
    local = (
        scored.groupBy("q_id", F.spark_partition_id().alias("p"))
        .agg(F.slice(F.sort_array(F.collect_list(item), asc=False), 1, k).alias("tk"))
    )
    merged = (
        local.select("q_id", F.explode("tk").alias("t"))
        .groupBy("q_id")
        .agg(F.slice(F.sort_array(F.collect_list("t"), asc=False), 1, k).alias("tk"))
    )
    return (
        merged.select("q_id", F.posexplode("tk").alias("rank0", "t"))
        .select(
            "q_id",
            F.col("t.vid").alias(id_col),
            F.col("t.score").alias("score"),
            (F.col("rank0") + 1).cast("bigint").alias("rank"),
        )
    )


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Per-vector symmetric int8 quantization — the standard ANN memory
    optimization (FAISS SQ8): scale = max(|x|), q_j = floor(x_j*127/scale
    + 0.5). Quantized dot products are EXACT BIGINT arithmetic, so the
    ranking is bit-stable across engines and cluster sizes; the dequant
    score multiplies the integer dot by the two scales (pure IEEE double
    ops on deterministic inputs). 4x memory cut for the candidate scan.

    All array expressions — zero shuffle, zero Python; floor(x+0.5) is
    used instead of round() so both engines share one deterministic
    half-up rule.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs))
    qv = F.transform(
        v, lambda x: F.when(scale == 0, F.lit(0)).otherwise(
            F.floor(x * 127.0 / scale + 0.5)).cast("bigint"))
    return df.select(F.col(id_col), scale.alias("q_scale"), qv.alias("q_vec"))


def int8_dot(a, b):
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("bigint"), lambda acc, v: acc + v)
