"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query at sf0.001; queries()/oracle_sql()
expose every implemented operator from SURVEY.md §2 plus the LLM-pipeline
operators, each paired with a DuckDB-runnable ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from streamalert_spark.queries import load_all

    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from streamalert_spark.queries import load_all

    return {name: rq.fn for name, rq in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    from streamalert_spark.queries import load_all

    return {name: rq.oracle for name, rq in load_all().items() if rq.oracle is not None}
