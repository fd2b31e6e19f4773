"""Helper for BOUNDED streaming showcase queries (the driver-checkable
``stream_*_bounded`` family): scope the state shuffle to a few partitions
for the duration of the run.

A stateful streaming query creates one state-store instance per shuffle
partition, and every micro-batch commits every store — at the session
default (200) a 6-micro-batch demo pays ~1200 state commits for a few
hundred rows, pure fixed overhead. These demos are hash-checked to be
partition-count-invariant (the sweeps suite re-runs them under
shuffle.partitions=7), so scoping the conf down is a physical-only change.
Production streams DON'T want this: size shuffle partitions to the real
key cardinality and executor count; the state-partition count is fixed at
the FIRST start of a checkpoint, which is why the scope must cover
``start()`` (where it is captured), not the whole query object's life.
"""

from __future__ import annotations

from contextlib import contextmanager
from streamalert_spark.session import local_rows_df


@contextmanager
def bounded_stream_shuffle(spark, n: int = 8):
    """Temporarily set spark.sql.shuffle.partitions to ``n``."""
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if saved is not None:
            spark.conf.set(key, saved)
        else:
            spark.conf.unset(key)


def run_bounded_to_rows(spark, df, schema: str, shuffle_n: int = 8):
    """Drain a BOUNDED stream through a temp parquet sink under the
    scoped state-shuffle conf and hand back its rows as a fresh local
    DataFrame of ``schema`` — the shared shape of every stream_*_bounded
    showcase query (materialize, then remove the work dir so repeated
    driver/bench invocations leave no /tmp residue)."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="bounded_stream_")
    try:
        with bounded_stream_shuffle(spark, shuffle_n):
            q = (
                df.writeStream.format("parquet")
                .option("path", f"{work}/out")
                .option("checkpointLocation", f"{work}/ckpt")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = spark.read.schema(schema).parquet(f"{work}/out").collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return local_rows_df(spark, rows, schema)
