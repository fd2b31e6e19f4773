from streamalert_spark.sources.decode import (  # noqa: F401
    kinesis_decode,
    s3_records,
    sns_extract,
)
