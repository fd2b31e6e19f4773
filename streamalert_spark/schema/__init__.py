from streamalert_spark.schema.types import schema_to_struct, type_default_expr
from streamalert_spark.schema.registry import LogSchema, SchemaRegistry
from streamalert_spark.schema.sanitize import sanitize_key, sanitize_columns

__all__ = [
    "schema_to_struct",
    "type_default_expr",
    "LogSchema",
    "SchemaRegistry",
    "sanitize_key",
    "sanitize_columns",
]
