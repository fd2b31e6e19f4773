"""streamalert_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of airbnb/streamalert.

The reference (read-only at /root/reference) is a serverless log-analysis
pipeline: classifier -> rules engine -> alert merger -> alert processor, plus
scheduled Athena SQL and a Parquet/Athena historical store. This package
re-expresses that surface Spark-first:

- classification = schema registry + from_json/from_csv/str_to_map/regexp
  projections with strict key-set semantics (reference: streamalert/classifier/)
- normalization/enrichment = generated projections + broadcast joins
  (reference: streamalert/shared/normalize.py, rules_engine/threat_intel.py)
- rules = native Column pre-filters + vectorized predicate evaluation
  (reference: streamalert/shared/rule.py, rules_engine/rules_engine.py)
- alert merge = stateful grouping (applyInPandas / applyInPandasWithState)
  (reference: streamalert/alert_merger/main.py, shared/alert.py)
- scheduled queries = spark.sql with the reference's time-macro parameters
  (reference: streamalert/scheduled_queries/)
- historical store = dt-partitioned Parquet tables with sanitized columns
  (reference: streamalert/shared/firehose.py, athena_partitioner/)

Everything here is built on the public Apache Spark / PySpark API.
"""

__version__ = "0.1.0"
