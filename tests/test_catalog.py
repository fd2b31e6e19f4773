"""CatalogClient: the Athena DDL surface (shared/athena.py) on spark.catalog."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_catalog_table_lifecycle(spark, tmp_path):
    from streamalert_spark.sql.catalog import CatalogClient

    cat = CatalogClient(spark)
    assert cat.check_database_exists()
    spark.sql("DROP TABLE IF EXISTS cat_demo")

    df = spark.range(10).select(
        F.col("id"),
        F.concat(F.lit("2024-01-01-0"), (F.col("id") % 2).cast("string")).alias("dt"),
    )
    (df.write.mode("overwrite")
     .option("path", str(tmp_path / "cat_demo"))
     .partitionBy("dt").format("parquet").saveAsTable("cat_demo"))

    assert cat.check_table_exists("cat_demo")
    assert "cat_demo" in cat.list_tables()
    parts = cat.get_table_partitions("cat_demo")
    assert sorted(parts) == ["dt=2024-01-01-00", "dt=2024-01-01-01"]

    # externally-written partition becomes visible after register_partitions
    extra = spark.range(3).select(F.col("id"))
    extra.write.mode("overwrite").parquet(str(tmp_path / "cat_demo" / "dt=2024-01-01-02"))
    cat.register_partitions("cat_demo")
    assert "dt=2024-01-01-02" in cat.get_table_partitions("cat_demo")
    assert cat.run_query("SELECT COUNT(*) AS n FROM cat_demo").collect()[0]["n"] == 13

    assert cat.drop_table("cat_demo")
    assert not cat.check_table_exists("cat_demo")
