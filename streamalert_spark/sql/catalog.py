"""Catalog operations — the reference's Athena client DDL surface on the
Spark catalog.

Reference (streamalert/shared/athena.py): the AthenaClient wraps async SQL
execution plus a small DDL surface — check_database_exists (athena.py:302),
check_table_exists (athena.py:308), drop_table (athena.py:152),
drop_all_tables (athena.py:137), get_table_partitions (athena.py:169, SHOW
PARTITIONS) — and the partitioner Lambda registers partitions with ALTER
TABLE ADD (athena_partitioner/main.py:179-207). Spark SQL is synchronous
and discovers partitions natively, so the async poll loop
(athena.py:185-244) and ADD PARTITION statement building disappear;
``register_partitions`` is the MSCK-equivalent for externally-written
files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class CatalogClient:
    """The AthenaClient DDL surface (shared/athena.py) on spark.catalog."""

    def __init__(self, spark: SparkSession, database: str = "default"):
        self.spark = spark
        self.database = database

    def check_database_exists(self) -> bool:
        """athena.py:302-306."""
        return self.spark.catalog.databaseExists(self.database)

    def check_table_exists(self, table_name: str) -> bool:
        """athena.py:308-316."""
        return self.spark.catalog.tableExists(f"{self.database}.{table_name}")

    def list_tables(self) -> list[str]:
        """SHOW TABLES (athena.py:74-89 unique-values path)."""
        return [t.name for t in self.spark.catalog.listTables(self.database)]

    def drop_table(self, table_name: str) -> bool:
        """DROP TABLE IF EXISTS (athena.py:152-167)."""
        self.spark.sql(
            f"DROP TABLE IF EXISTS `{self.database}`.`{table_name}`")
        return not self.check_table_exists(table_name)

    def drop_all_tables(self) -> bool:
        """athena.py:137-150."""
        return all(self.drop_table(t) for t in self.list_tables())

    def get_table_partitions(self, table_name: str) -> list[str]:
        """SHOW PARTITIONS (athena.py:169-183) — e.g. ['dt=2024-01-01-00']."""
        rows = self.spark.sql(
            f"SHOW PARTITIONS `{self.database}`.`{table_name}`").collect()
        return [r[0] for r in rows]

    def register_partitions(self, table_name: str) -> None:
        """The athena_partitioner replacement: sync partitions written by
        external writers (MSCK REPAIR TABLE; main.py:179-207's ALTER TABLE
        ADD PARTITION loop collapses to one statement)."""
        self.spark.sql(
            f"MSCK REPAIR TABLE `{self.database}`.`{table_name}`")

    def run_query(self, sql: str):
        """Synchronous spark.sql in place of run_async_query + poll
        (athena.py:185-259)."""
        return self.spark.sql(sql)
