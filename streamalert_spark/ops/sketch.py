"""Sketch / statistics operators with CROSS-ENGINE-EXACT semantics.

Motivation: the built-in approximate aggregates (approx_count_distinct's
HLL++, percentile_approx's KLL) are engine-specific sketches — their
results can never be oracle-checked against another engine. These
operators get sublinear-sketch behavior from portable primitives:

- KMV (k-minimum-values) cardinality: the k smallest md5(value) hashes
  determine the estimate (k-1)/frac(kth_min). md5 is identical
  everywhere, lexicographic hex order IS numeric order, and the
  hex->fraction conversion is a fixed-order 13-digit sum (52 bits —
  exact in a double), so the estimate is bit-identical across engines.
  Memory is O(k) per group at any cardinality — the same scaling story
  as HLL with a checkable answer.
- Rate-spike detection: mean + 3-sigma thresholds derived ONLY from
  integer sums (n, sum, sum-of-squares are exact bigints), compared via
  the algebraic rearrangement  (c*n - s) > 3*sqrt(n*ss - s*s)  so the
  single sqrt/multiply are the only float ops — each correctly-rounded
  IEEE, hence identical on both engines.

Scale: both are one groupBy over the scan (partial-aggregated); KMV
additionally windows within the small per-group hash set. No driver
collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 32
# 13 hex digits = 52 bits: the largest prefix exactly representable in a
# double, so the fixed-order digit sum is bit-identical across engines
KMV_HEX_DIGITS = 13
# 12 hex digits = 48 bits: comfortably exact in a 64-bit integer on both
# engines — the integer twin of the fraction prefix above
HEX_INT_DIGITS = 12


def hex_fraction(h: Column) -> Column:
    """md5-hex prefix as a fraction of the hash space in [0, 1): a
    fixed-order sum of digit_i * 16^-(i+1) over the first 13 digits."""
    frac = F.lit(0.0)
    for i in range(KMV_HEX_DIGITS):
        digit = (F.position(F.substring(h, i + 1, 1),
                            F.lit("0123456789abcdef")) - 1).cast("double")
        frac = frac + digit * F.lit(float(16.0 ** -(i + 1)))
    return frac


def hex_fraction_sql(col: str) -> str:
    """The identical fixed-order digit sum as engine-portable SQL text."""
    terms = [
        f"(CAST(STRPOS('0123456789abcdef', SUBSTRING({col}, {i + 1}, 1)) - 1 "
        f"AS DOUBLE)) * {16.0 ** -(i + 1)!r}"
        for i in range(KMV_HEX_DIGITS)
    ]
    # left-to-right chain matches the Column fold above exactly
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def hex_prefix_int(h: Column) -> Column:
    """First 12 hex digits of an md5 hex string as an exact bigint — the
    portable integer hash every mod-based placement (count-min columns,
    bloom bits) derives from. 48 bits never overflows either engine."""
    return F.conv(F.substring(h, 1, HEX_INT_DIGITS), 16, 10).cast("bigint")


def hex_prefix_int_sql(col: str) -> str:
    """The identical 12-digit hex->bigint conversion as engine-portable SQL
    text (digit-positional sum — DuckDB has no conv())."""
    terms = [
        f"(CAST(STRPOS('0123456789abcdef', SUBSTRING({col}, {i + 1}, 1)) - 1 "
        f"AS BIGINT)) * {16 ** (HEX_INT_DIGITS - 1 - i)}"
        for i in range(HEX_INT_DIGITS)
    ]
    return "(" + " + ".join(terms) + ")"


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Output: (group, kth_min_hash, kmv_estimate, exact_distinct). When a
    group has fewer than k distinct values the estimate IS the exact
    count (standard KMV fallback). One shuffle on (group, value) for the
    distinct, then a window over the per-group k-minimum hash set.
    """
    hashed = (
        df.select(F.col(group_col), F.col(value_col).cast("string").alias("v"))
        # NULL values are excluded (COUNT DISTINCT semantics) — also keeps
        # the hash ordering engine-portable (Spark sorts NULL first,
        # DuckDB last)
        .filter(F.col("v").isNotNull())
        .distinct()
        .select(group_col, F.md5(F.col("v")).alias("h"))
    )
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = hashed.select(
        group_col, "h",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("n_exact"),
    )
    kth = ranked.filter(
        (F.col("rn") == F.least(F.lit(k), F.col("n_exact")))
    )
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) / hex_fraction(F.col("h")), 4))
    return kth.select(
        F.col(group_col),
        F.col("h").alias("kth_min_hash"),
        est.alias("kmv_estimate"),
        F.col("n_exact").cast("bigint").alias("exact_distinct"),
    )


def rate_spikes(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    sigma: float = 3.0,
) -> DataFrame:
    """Hours whose event count exceeds the key's mean + sigma*stddev_pop
    over all its hours — the rate-based anomaly primitive under
    threshold/alert rules.

    Exactness: per-key n, sum, sum-of-squares are integer-exact bigints;
    the comparison is the rearranged  (c*n - s) > sigma*sqrt(n*ss - s*s)
    with every product computed in DOUBLE (cast the exact integers first,
    then multiply — a bigint product n*ss or s*s would silently wrap past
    2^63 on a key with billions of events, NaN the sqrt, and suppress all
    its spikes). Each double op is correctly-rounded IEEE over identical
    operands, hence identical on both engines. Two shuffles: (key, hour)
    count, then key-window stats over the (small) per-key hour set.
    """
    hourly = (
        df.select(F.col(key_col), F.date_trunc("hour", F.col(ts_col)).alias("hour"))
        .groupBy(key_col, "hour")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(key_col)
    stats = hourly.select(
        key_col, "hour", "cnt",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dev = d("cnt") * d("n") - d("s")
    disc = d("n") * d("ss") - d("s") * d("s")
    return (
        stats.filter(dev > F.lit(sigma) * F.sqrt(disc))
        .select(
            key_col, "hour",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(dev, 6).alias("dev"),
            F.round(F.lit(sigma) * F.sqrt(disc), 6).alias("threshold"),
        )
    )


def seasonal_rate_spikes(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    sigma: float = 3.0,
) -> DataFrame:
    """Rate spikes against a SEASONAL baseline: each hour compares to the
    mean of its own hour-of-day across the series, not the flat mean —
    the fix for diurnal traffic where every evening peak would trip a
    flat threshold (``rate_spikes``) and real 3am anomalies would hide
    under the daily average.

    Same integer-exact construction as ``rate_spikes``: per (key,
    hour-of-day) n/sum/sum-of-squares are exact bigints, compared via
    (c*n - s) > sigma*sqrt(n*ss - s*s) in DOUBLE — engine-identical.
    Two partial-aggregated shuffles; the seasonal window holds ~n/24
    rows per (key, hod) group.
    """
    hourly = (
        df.select(F.col(key_col),
                  F.date_trunc("hour", F.col(ts_col)).alias("hour"))
        .groupBy(key_col, "hour")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("hod", F.hour("hour").cast("bigint"))
    )
    w = Window.partitionBy(key_col, "hod")
    stats = hourly.select(
        key_col, "hour", "hod", "cnt",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    dev = d("cnt") * d("n") - d("s")
    disc = d("n") * d("ss") - d("s") * d("s")
    return (
        stats.filter(dev > F.lit(sigma) * F.sqrt(disc))
        .select(
            key_col, "hour", "hod",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(dev, 6).alias("dev"),
            F.round(F.lit(sigma) * F.sqrt(disc), 6).alias("threshold"),
        )
    )


def histogram_quantiles(
    df,
    key_col: str,
    value_col: str,
    width: float = 10.0,
    quantiles: tuple = (0.5, 0.9, 0.99),
):
    """Approximate quantiles from a fixed-width histogram — the ONE-PASS,
    MERGEABLE scale path next to the exact sort-based percentile: state
    is one count per occupied bucket (mergeable across partitions,
    executors, or micro-batches by addition), and the estimate
    interpolates linearly inside the bucket holding rank q*n.

    Engine-portable by construction: bucket = floor(value / width) and
    the interpolation use only IEEE-exact-rounded arithmetic on exact
    integer counts — no log() whose libm low bits could differ. Fixed
    width is the demo calibration; production picks power-of-two or
    quantile-calibrated edges, same plan.
    """
    from pyspark.sql import functions as F

    bucket = F.floor(F.col(value_col) / F.lit(width)).cast("bigint")
    hist = (df.groupBy(key_col, bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    return quantiles_from_histogram(hist, key_col, width, quantiles)


def quantiles_from_histogram(
    hist,
    key_col: str,
    width: float = 10.0,
    quantiles: tuple = (0.5, 0.9, 0.99),
):
    """Quantile estimates from an ALREADY-BUILT (key, bucket, cnt) frame —
    the merge-side half of ``histogram_quantiles``, usable on any source
    of mergeable bin counts (a batch groupBy, a union of per-day
    histograms, a streaming state store's final counts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key_col).orderBy("bucket")
    c = (hist.withColumn("cum", F.sum("cnt").over(w))
         .withColumn("cum_before", F.col("cum") - F.col("cnt"))
         .withColumn("n", F.max(F.col("cum")).over(Window.partitionBy(key_col))))

    def est(q: float):
        r = F.lit(q) * F.col("n")
        hit = (F.col("cum_before") < r) & (F.col("cum") >= r)
        val = F.round(
            F.col("bucket") * width
            + width * (r - F.col("cum_before")) / F.col("cnt"), 6)
        return F.max(F.when(hit, val))

    aggs = [est(q).alias(f"p{int(q * 100)}_est") for q in quantiles]
    aggs.append(F.max("n").cast("bigint").alias("n_events"))
    return c.groupBy(key_col).agg(*aggs)


def kmv_overlap(
    a_df: DataFrame,
    a_col: str,
    b_df: DataFrame,
    b_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """KMV set-operation sketch between two key columns: Jaccard,
    intersection, and union DISTINCT-cardinality estimates from the k
    smallest portable hashes of each side — the join-planning diagnostic
    that answers "how much do these 100 TB tables' keys overlap?" without
    ever shuffling either table's full key set.

    Theta-sketch-style estimator: theta = kth smallest hash of the union
    sketch; c = matching hashes (present in BOTH sides' sketches) below
    theta; union_est = (k-1)/theta, jaccard_est = c/k, intersection_est =
    jaccard_est * union_est. When the union sketch holds fewer than k
    hashes the sketches saw everything and all three are exact.

    Scale: each side reduces to its k minimum hashes via orderBy+limit
    (TakeOrderedAndProject — per-partition top-k then a k-row merge, no
    global sort shuffle); everything downstream operates on <= 2k rows.
    Same-value hashes are identical across sides (md5 of the string form),
    so sketch membership IS value membership.
    """
    def kmin(df: DataFrame, col: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .select(F.md5("v").alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    ha = kmin(a_df, a_col).select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    hb = kmin(b_df, b_col).select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    u = (
        ha.unionByName(hb)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    # <= 2k rows from here on: the single-partition window is metadata-scale
    w = Window.orderBy("h")
    r = u.select(
        "h", "in_a", "in_b",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))).alias("n"),
    )
    kth = F.least(F.lit(k), F.col("n"))
    agg = r.agg(
        F.max(F.when(F.col("rn") == kth, F.col("h"))).alias("theta_h"),
        F.max("n").alias("n"),
        F.sum(F.when((F.col("rn") <= k) & (F.col("in_a") == 1)
                     & (F.col("in_b") == 1), 1).otherwise(0)).alias("c"),
    )
    exact_small = F.col("n") < k
    union_est = F.when(exact_small, F.col("n").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / hex_fraction(F.col("theta_h")), 4))
    jac = F.round(F.col("c") / F.least(F.lit(k), F.col("n")).cast("double"), 4)
    inter_est = F.when(exact_small, F.col("c").cast("double")).otherwise(
        F.round((F.col("c") / F.lit(float(k)))
                * (F.lit(float(k - 1)) / hex_fraction(F.col("theta_h"))), 4))
    return agg.select(
        F.col("c").cast("bigint").alias("sketch_matches"),
        jac.alias("jaccard_est"),
        inter_est.alias("intersection_est"),
        union_est.alias("union_est"),
    )


# ---------------------------------------------------------------- count-min

CMS_W = 64  # columns per row — collision rate calibrated for the demo scale
CMS_D = 4   # independent hash rows; estimate = min over rows


def _cms_cells(key: Column, w: int, d: int) -> Column:
    """Array of the d (depth, col) cells a key increments: col_i =
    hex12(md5(\"i:\" || key)) % w — portable because md5 and the 48-bit
    prefix are engine-identical."""
    return F.array(*[
        F.struct(
            F.lit(i).cast("bigint").alias("depth"),
            F.pmod(hex_prefix_int(F.md5(F.concat(F.lit(f"{i}:"), key))),
                   F.lit(w)).alias("col"),
        )
        for i in range(d)
    ])


def cms_sketch(df: DataFrame, key_col: str, w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """Count-min sketch of a key column: d*w counters, each key increments
    one counter per depth row. Output (depth, col, cnt) — at most d*w rows
    regardless of input size, mergeable across partitions / micro-batches /
    days by addition on (depth, col).

    Scale: the explode multiplies rows by d BEFORE the shuffle, but the
    groupBy has only d*w distinct groups so map-side partial aggregation
    collapses every task's output to <= d*w rows — the shuffle carries the
    sketch, not the data. No driver state, no UDFs.
    """
    keyed = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .filter(F.col("k").isNotNull())
    )
    cells = keyed.select(F.explode(_cms_cells(F.col("k"), w, d)).alias("c"))
    return (
        cells.groupBy(F.col("c.depth").alias("depth"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    df: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> DataFrame:
    """Point-frequency estimates for ``keys_df[key_col]`` from a count-min
    sketch of ``df[key_col]``: min over the d counters each key hashes to.
    Classic CMS guarantee: estimate >= true count always (one-sided error),
    overshoot bounded by collisions per cell. The sketch side is <= d*w
    rows — broadcast by the optimizer; the probe join never shuffles the
    corpus."""
    sketch = cms_sketch(df, key_col, w, d)
    probes = (
        keys_df.select(F.col(key_col).cast("string").alias("k"))
        .distinct()
        .select("k", F.explode(_cms_cells(F.col("k"), w, d)).alias("c"))
        .select("k", F.col("c.depth").alias("depth"), F.col("c.col").alias("col"))
    )
    # LEFT join: a probe cell no key ever incremented is a ZERO counter —
    # an inner join would silently take the min over the nonzero cells
    # only and over-estimate keys absent from (or rare in) the data
    return (
        probes.join(F.broadcast(sketch), ["depth", "col"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
             .cast("bigint").alias("cms_estimate"))
    )


# --------------------------------------------------------------- HyperLogLog

HLL_B = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_B
HLL_RHO_BITS = 48              # rho derived from a 12-hex-digit (48-bit) hash
HLL_RHO_MAX = HLL_RHO_BITS + 1
# alpha_m * m^2 * 2^49 precomputed in Python — BOTH engines receive the
# same double literal, so the one division below is the only float op.
# alpha for m=64 is 0.709 (Flajolet et al. Fig. 3 constant).
HLL_NUMERATOR = 0.709 * HLL_M * HLL_M * float(1 << HLL_RHO_MAX)

def _hll_rho_from(prefix: Column) -> Column:
    """rho(value) = 1 + leading zero BITS of the 48-bit hash prefix,
    computed from hex-string shape alone — no log2, no loops: 4 bits per
    leading '0' hex digit, plus the first non-zero digit's own leading
    zeros (1->3, 2-3->2, 4-7->1, 8-f->0). All-zero prefix -> 49."""
    trimmed = F.regexp_replace(prefix, "^0+", "")
    n0 = F.lit(HEX_INT_DIGITS) - F.length(trimmed)
    d = F.substring(trimmed, 1, 1)
    lz = (
        F.when(d == "1", 3)
        .when(d.isin("2", "3"), 2)
        .when(d.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(F.length(trimmed) == 0, F.lit(HLL_RHO_MAX)) \
        .otherwise(n0 * 4 + lz + 1)


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group HyperLogLog cardinality estimate, CROSS-ENGINE-EXACT.

    Register j holds max(rho) over values hashing to bucket j (64
    buckets). The harmonic-mean denominator sum_j 2^(-M_j) is computed as
    the EXACT integer sum_j 2^(49-M_j) (bit shifts, <= 64 * 2^49 < 2^63 —
    no float accumulation, no ordering sensitivity); empty registers
    contribute 2^49. The single float op is the final division by the
    precomputed alpha*m^2*2^49 literal. No small/large-range corrections
    (they need ln) — the raw estimator, accurate for n >> 2.5*m, which is
    the regime a 64-register sketch is for; the exact count is derived
    from the registers' own deduped frame to expose the error. Output: (group, hll_sum, hll_estimate,
    exact_distinct)."""
    deduped = _hll_deduped(df, group_col, value_col)
    regs = _hll_regs_from_deduped(deduped, group_col)
    # exact count from the SAME deduped frame the registers hash — one
    # distinct subtree, ReusedExchange-eligible, never a second
    # count_distinct scan of the input
    exact = deduped.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("exact_distinct"))
    sums = hll_sums(exact.select(group_col), regs, group_col)
    return (
        sums.join(exact, group_col)
        .select(
            group_col,
            F.col("hll_sum").cast("bigint").alias("hll_sum"),
            F.round(F.lit(HLL_NUMERATOR) / F.col("hll_sum").cast("double"), 4)
             .alias("hll_estimate"),
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        )
    )


def hll_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group HLL register table (group, bucket, m_j) — the sketch
    STATE. Registers merge LOSSLESSLY by MAX(m_j) per bucket across any
    partitioning of the data (days, sources, executors): max of maxes is
    the max — why HLL sketches union without recomputation, hash-proven
    by the hll_sketch_rollup query."""
    return _hll_regs_from_deduped(
        _hll_deduped(df, group_col, value_col), group_col)


def _hll_deduped(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    v = F.col(value_col).cast("string")
    return (
        df.select(F.col(group_col), v.alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
    )


def _hll_regs_from_deduped(deduped: DataFrame, group_col: str) -> DataFrame:
    hashed = deduped.select(
        group_col,
        F.pmod(hex_prefix_int(F.md5(F.concat(F.lit("hb:"), F.col("v")))),
               F.lit(HLL_M)).alias("bucket"),
        _hll_rho_from(
            F.substring(F.md5(F.concat(F.lit("hr:"), F.col("v"))),
                        1, HEX_INT_DIGITS)).alias("rho"),
    )
    return hashed.groupBy(group_col, "bucket").agg(F.max("rho").alias("m_j"))


def hll_sums(groups: DataFrame, regs: DataFrame, group_col: str) -> DataFrame:
    """(group, hll_sum): the exact-integer harmonic denominator from a
    register table. ``groups`` supplies the group spine so EMPTY registers
    contribute 2^49 (M_j = 0) — crossJoined with the 64-bucket range."""
    spine = groups.crossJoin(
        F.broadcast(groups.sparkSession.range(HLL_M)
                    .select(F.col("id").cast("int").alias("bucket"))))
    terms = (
        spine.join(regs, [group_col, "bucket"], "left")
        .select(
            group_col,
            F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                   f"{HLL_RHO_MAX} - coalesce(m_j, 0))").alias("term"),
        )
    )
    return terms.groupBy(group_col).agg(
        F.sum("term").cast("bigint").alias("hll_sum"))


# Engine-portable SQL twins of the HLL pieces — generated next to the
# Column forms above so a change to the rho/bucket/term derivation can
# never drift between the Spark plan and the DuckDB oracles that check it.

def hll_trimmed_sql(v: str) -> str:
    """SQL: the zero-trimmed 12-hex-digit rho-hash prefix of value ``v``."""
    return (f"regexp_replace(substring(md5('hr:' || {v}), 1, "
            f"{HEX_INT_DIGITS}), '^0+', '')")


def hll_bucket_sql(v: str) -> str:
    """SQL: the register bucket of value ``v``."""
    hb = "md5('hb:' || " + v + ")"
    return f"({hex_prefix_int_sql(hb)}) % {HLL_M}"


def hll_rho_sql(trimmed: str) -> str:
    """SQL: rho from a zero-trimmed hex prefix — mirrors _hll_rho_from."""
    d = f"substring({trimmed}, 1, 1)"
    return (f"CASE WHEN length({trimmed}) = 0 THEN {HLL_RHO_MAX} "
            f"ELSE ({HEX_INT_DIGITS} - length({trimmed})) * 4 "
            f"+ CASE WHEN {d} = '1' THEN 3 "
            f"WHEN {d} IN ('2','3') THEN 2 "
            f"WHEN {d} IN ('4','5','6','7') THEN 1 "
            f"ELSE 0 END + 1 END")


def hll_term_sql(m_j: str) -> str:
    """SQL: a register's exact-integer harmonic term 2^(49 - M_j)."""
    return f"(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - COALESCE({m_j}, 0)))"


# ---------------------------------------------------------------------------
# Space-saving heavy hitters — mergeable bounded-memory frequency summary.
# ---------------------------------------------------------------------------

def space_saving_summary(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """Mergeable space-saving heavy-hitter summary (Metwally et al.,
    "Efficient computation of frequent and top-k elements"; merge rule
    from Agarwal et al., "Mergeable Summaries"): each partition reduces
    to at most k (key, count) rows plus one error row, regardless of
    partition size, so SHUFFLE/DRIVER traffic is O(partitions * k) at
    any corpus scale. (Executor working memory is NOT k-bounded: the
    per-partition pass counts exactly before trimming, O(distinct keys
    in the partition) — the classic k-counter eviction loop would bound
    it but needs per-row Python; size partitions accordingly.)

    Per partition (one Arrow-batched ``mapInPandas`` pass): exact counts
    over the partition, trimmed to the k largest with tie-break by key;
    the (k+1)-th count is the partition's trim bound e_p (a trimmed
    exact-count summary IS a space-saving summary with error e_p). The
    merge is pure DataFrame algebra:

    - ``est(key)``  = sum of the key's surviving partition counts
      (never overcounts: est <= true);
    - ``err(key)``  = sum of e_p over partitions that TRIMMED the key
      (true <= est + err);
    - any key with true frequency > sum(e_p) over all partitions is
      guaranteed to survive in at least one partition.

    The estimates depend on the physical partitioning (the bounds do
    not), so this op is property-pinned rather than oracle-paired —
    the deterministic-output alternative for exact heavy hitters is
    ``cms_point_estimates`` / a plain count shuffle.

    Returns (key, est, err_hi, est_hi = est + err_hi, total_e) —
    total_e (the global trim budget Σ e_p, identical on every row) rides
    along so audits can check the survival guarantee for ABSENT keys:
    any key with true frequency > total_e must be present.
    """
    import pandas as pd

    keyed = df.select(F.col(key_col).cast("string").alias("key"))

    def summarize(batches):
        counts: dict[str, int] = {}
        n_null = 0
        for pdf in batches:
            for key, c in pdf["key"].value_counts(dropna=True).items():
                counts[key] = counts.get(key, 0) + int(c)
            n_null += int(pdf["key"].isna().sum())
        if not counts and n_null == 0:
            return
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = items[:k]
        e_p = items[k][1] if len(items) > k else 0
        yield pd.DataFrame({
            "key": [key for key, _ in kept] + [None],
            "cnt": [c for _, c in kept] + [0],
            "e_p": [e_p] * (len(kept) + 1),
        })

    summary = keyed.mapInPandas(
        summarize, schema="key string, cnt bigint, e_p bigint")
    # One marker row per non-empty partition carries e_p; their sum is the
    # global trim budget total_e (a 1-row aggregate, broadcast back).
    total_e = (summary.filter(F.col("key").isNull())
               .agg(F.sum("e_p").cast("bigint").alias("total_e")))
    kept = (summary.filter(F.col("key").isNotNull())
            .groupBy("key")
            .agg(F.sum("cnt").cast("bigint").alias("est"),
                 F.sum("e_p").cast("bigint").alias("covered_e")))
    return (kept.crossJoin(F.broadcast(total_e))
            .select("key", "est",
                    (F.col("total_e") - F.col("covered_e")).cast("bigint")
                    .alias("err_hi"),
                    (F.col("est") + F.col("total_e") - F.col("covered_e"))
                    .cast("bigint").alias("est_hi"),
                    F.col("total_e").cast("bigint").alias("total_e")))


def space_saving_topk(df: DataFrame, key_col: str, k: int = 64,
                      top: int = 10) -> DataFrame:
    """Top candidates from the space-saving summary, ordered by guaranteed
    count (est desc, key asc tie-break), upper bound attached. Every true
    top-`top` key whose frequency exceeds the global trim budget is
    present IN THE SUMMARY; the est-ordered limit(top) cut can still
    drop one in favor of a lighter key whose est happens to be higher
    (est is a lower bound). `k >> top` shrinks the budget and with it
    the candidate uncertainty."""
    s = space_saving_summary(df, key_col, k=k)
    return s.orderBy(F.col("est").desc(), F.col("key").asc()).limit(top)
