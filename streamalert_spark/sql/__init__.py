from streamalert_spark.sql.scheduled import (
    QueryPack,
    QueryPackRepository,
    ScheduledQueryRunner,
    generate_time_parameters,
)

__all__ = [
    "QueryPack",
    "QueryPackRepository",
    "ScheduledQueryRunner",
    "generate_time_parameters",
]
