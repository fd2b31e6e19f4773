"""Parser plugin registry.

The reference registers parsers with @parser and dispatches by the schema's
declared parser name (reference: streamalert/classifier/parsers.py:35-57,
503-513; formats: json, csv, kv, syslog). A parser here is an *expression
generator*: given a raw string column and a LogSchema it emits

  1. an optional row-expansion step (``explode`` — e.g. json_path
     'logEvents[*].message' yields N inner records per outer payload,
     carrying envelope keys along, parsers.py:410-448), and
  2. a projection to an all-string struct of declared fields
     (``parse_expr``) plus a validity predicate (``valid_expr``).

Type coercion and strict key-set checking are parser-independent and live in
streamalert_spark.classify. Everything stays JVM-side (from_json/from_csv/
str_to_map/regexp_extract) — no Python UDFs in the parse path, so whole-stage
codegen covers classification even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from streamalert_spark.schema.registry import LogSchema

PARSERS: dict[str, "ParserBase"] = {}


def parser(cls):
    """Register a parser class by its ``name`` (parsers.py:35-57)."""
    PARSERS[cls.name] = cls()
    return cls


def get_parser(name: str) -> "ParserBase":
    return PARSERS[name]


class ParserBase:
    name = "base"

    def explode(self, df: DataFrame, raw_col: str, schema: LogSchema) -> tuple[DataFrame, str]:
        """Optional row expansion (json_path / envelope). Default: identity.

        Returns (df, raw_col) where raw_col names the (possibly new) column
        holding one record's raw text per row. Implementations that extract
        envelopes add a ``streamalert_envelope_keys`` struct column.
        """
        return df, raw_col

    def parse_expr(self, schema: LogSchema, raw: Column) -> Column:
        """Struct column of all declared fields as raw strings (pre-coercion)."""
        raise NotImplementedError

    def valid_expr(self, schema: LogSchema, raw: Column, parsed: Column) -> Column:
        """Parser-specific validity (key-set / column-count / regex match).

        Must reference only ``raw`` and ``parsed`` as given — never re-derive
        the parse from ``raw``. The classifier materializes ``parsed`` exactly
        once behind a Generate barrier; re-deriving would multiply the parse
        per field reference (a ~20x regression for from_csv). Parsers that
        need parse-time signals embed helper fields (``_sa_corrupt``,
        ``_sa_nfields``) in the parse struct instead.
        """
        raise NotImplementedError
