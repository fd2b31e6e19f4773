"""Rule promotion: staged-rule statistics over the alerts table.

Reference (streamalert/rule_promotion/): per staged rule, count alerts since
staging began (statistic.py:23-31: SELECT rule_name, count(*) ... WHERE dt >=
'{date}' GROUP BY rule_name), produce an info digest ordered by count
(statistic.py:52-63), and promote rules whose alert count stayed at/below
threshold (promoter.py:85-143).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from streamalert_spark.session import local_rows_df


@dataclass
class StagingInfo:
    rule_name: str
    staged_at_dt: str          # 'YYYY-MM-DD-HH'


def alert_counts_since(
    spark: SparkSession,
    alerts: DataFrame,
    staged: list[StagingInfo],
) -> DataFrame:
    """(rule_name, alert_count) for staged rules since their staging dt —
    the promotion count query (statistic.py:23-31). dt is the partition
    column, so each rule's predicate prunes to its staging window."""
    frames = []
    for info in staged:
        frames.append(
            alerts.filter(
                (F.col("rule_name") == info.rule_name)
                & (F.col("dt") >= info.staged_at_dt)
            ).groupBy("rule_name").agg(F.count(F.lit(1)).alias("alert_count"))
        )
    if not frames:
        return spark.createDataFrame([], "rule_name string, alert_count bigint")
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    # rules with zero alerts produce no group row; backfill them
    seen = {r["rule_name"] for r in out.select("rule_name").collect()}
    missing = [(i.rule_name, 0) for i in staged if i.rule_name not in seen]
    if missing:
        out = out.unionByName(
            local_rows_df(spark, missing, "rule_name string, alert_count bigint")
        )
    return out.orderBy(F.col("alert_count").desc(), "rule_name")


def promotable_rules(counts: DataFrame, threshold: int = 0) -> list[str]:
    """Rules whose staged alert count <= threshold (promoter.py:85-143 —
    the reference promotes quiet rules)."""
    return [
        r["rule_name"]
        for r in counts.filter(F.col("alert_count") <= threshold).collect()
    ]


def digest(counts: DataFrame) -> str:
    """Human digest ordered by count desc (statistic.py:52-63)."""
    lines = [
        f"{r['rule_name']}: {r['alert_count']} alerts"
        for r in counts.collect()
    ]
    return "\n".join(lines)
