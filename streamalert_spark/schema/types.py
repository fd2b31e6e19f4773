"""Schema-token -> Spark type mapping.

The reference declares log schemas as JSON where each value is a string
naming a primitive or a structural placeholder (reference:
streamalert/classifier/parsers.py:65-70, type coercion at parsers.py:294-369;
Athena mapping at streamalert_cli/athena/helpers.py:35-43):

  "string"  -> str(value)            -> StringType
  "integer" -> int(value)            -> LongType   (Athena bigint)
  "float"   -> float(value)          -> DoubleType (Athena decimal(10,3))
  "boolean" -> str(value).lower()=='true' -> BooleanType
  {}        -> free-form object      -> MapType(String, String)
  {nested}  -> recursive dict schema -> StructType
  []        -> untyped list          -> ArrayType(String)

Coercion semantics preserved for golden-test fidelity:
- parse failure invalidates the record (parsers.py:332-347);
- boolean is the lenient string comparison, so 'True'/'TRUE' -> true and
  anything else -> false (parsers.py:349-350);
- falsy values are skipped by conversion, i.e. left as declared-type defaults
  (parsers.py:321-323);
- missing optional keys are back-filled with type defaults
  '', 0, 0.0, False, {}, [] (parsers.py:138-142,157-171).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def schema_to_struct(schema: dict[str, Any]) -> T.StructType:
    """Convert a reference-style declared schema dict to a StructType."""
    return T.StructType([
        T.StructField(key, _token_to_type(tok), nullable=True)
        for key, tok in schema.items()
    ])


def _token_to_type(tok: Any) -> T.DataType:
    if isinstance(tok, str):
        mapping = {
            "string": T.StringType(),
            "integer": T.LongType(),
            "float": T.DoubleType(),
            "boolean": T.StringType(),  # kept as string pre-coercion; see coerce_boolean
        }
        if tok not in mapping:
            raise ValueError(f"unknown schema token: {tok!r}")
        return mapping[tok]
    if isinstance(tok, dict):
        if not tok:
            return T.MapType(T.StringType(), T.StringType())
        return T.StructType([
            T.StructField(k, _token_to_type(v), nullable=True) for k, v in tok.items()
        ])
    if isinstance(tok, list):
        return T.ArrayType(T.StringType())
    raise ValueError(f"unknown schema token: {tok!r}")


def coerce_boolean(col: Column) -> Column:
    """Reference boolean semantics: str(value).lower() == 'true'
    (parsers.py:349-350). Never fails; non-'true' strings are false."""
    return F.lower(col.cast("string")) == F.lit("true")


def type_default(tok: Any):
    """Type-default values used for optional-key backfill (parsers.py:157-171)."""
    if isinstance(tok, str):
        return {"string": "", "integer": 0, "float": 0.0, "boolean": False}[tok]
    if isinstance(tok, dict):
        return {}
    if isinstance(tok, list):
        return []
    raise ValueError(f"unknown schema token: {tok!r}")


def type_default_expr(tok: Any) -> Column:
    """The same defaults as Spark literal Columns, for coalesce() backfill."""
    if isinstance(tok, str):
        return {
            "string": F.lit(""),
            "integer": F.lit(0).cast("bigint"),
            "float": F.lit(0.0),
            "boolean": F.lit(False),
        }[tok]
    if isinstance(tok, dict) and not tok:
        return F.from_json(F.lit("{}"), "map<string,string>")
    if isinstance(tok, dict):
        struct = _token_to_type(tok)
        return F.from_json(F.lit("{}"), struct)
    if isinstance(tok, list):
        return F.array().cast("array<string>")
    raise ValueError(f"unknown schema token: {tok!r}")
