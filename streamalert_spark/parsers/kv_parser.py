"""Key-value parser: native array expressions with full reference semantics.

Reference behavior (streamalert/classifier/parsers.py:748-812):
- split the payload on ``delimiter``; blank fields are dropped before the
  count check (parsers.py:787);
- the non-blank field count must equal the schema's field count
  (parsers.py:789-790);
- each field splits into key/value on the FIRST ``separator``
  (parsers.py:798); fields lacking the separator are skipped
  (parsers.py:793-796);
- a duplicate key assigns its value to the schema key at that field's
  POSITION (``kv_payload[list(schema)[index]] = value``, parsers.py:800-806)
  — e.g. schema (name, result, test) with 'name=foo result=bar name=baz'
  yields {name: foo, result: bar, test: baz};
- later assignments win (plain dict assignment).

All of this compiles to array/lambda expressions (split / filter /
transform / zip_with) — JVM-side, codegen-friendly, no UDF. Whole-stage
codegen's subexpression elimination keeps the shared arrays evaluated once
per row within the projection.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from streamalert_spark.parsers.base import ParserBase, parser
from streamalert_spark.schema.registry import LogSchema


def _delims(schema: LogSchema) -> tuple[str, str]:
    conf = schema.configuration
    return conf.get("delimiter", " "), conf.get("separator", "=")


def _entries(schema: LogSchema, raw: Column) -> Column:
    """array<struct<k,v>> of effective-key/value pairs, in field order."""
    delim, sep = _delims(schema)
    fields = F.filter(
        F.split(raw, re.escape(delim), -1), lambda f: f != F.lit("")
    )
    parts = F.transform(fields, lambda f: F.split(f, re.escape(sep), 2))
    keys0 = F.transform(parts, lambda p: F.get(p, 0))
    schema_keys = F.array(*[F.lit(k) for k in schema.schema])
    # duplicate key at position i -> renamed to schema key i (positional
    # fallback, parsers.py:800-806); F.get is OOB-null, never ANSI-throws
    eff_keys = F.transform(
        keys0,
        lambda k, i: F.when(
            F.array_position(F.slice(keys0, F.lit(1), i), k) > 0,
            F.get(schema_keys, i),
        ).otherwise(k),
    )
    entries = F.zip_with(
        eff_keys, parts,
        lambda k, p: F.struct(k.alias("k"), F.get(p, 1).alias("v")),
    )
    # fields without the separator contribute nothing (parsers.py:793-796)
    return F.filter(entries, lambda e: e["v"].isNotNull())


@parser
class KvParser(ParserBase):
    name = "kv"

    def parse_expr(self, schema: LogSchema, raw: Column) -> Column:
        delim, _ = _delims(schema)
        entries = _entries(schema, raw)
        nfields = F.size(
            F.filter(F.split(raw, re.escape(delim), -1), lambda f: f != F.lit(""))
        )
        # last assignment wins (dict-assignment semantics): take the final
        # entry per schema key
        def last_value(name: str) -> Column:
            matches = F.filter(entries, lambda e: e["k"] == F.lit(name))
            return F.get(matches, F.size(matches) - 1)["v"]

        return F.struct(
            *[last_value(name).alias(name) for name in schema.schema],
            nfields.alias("_sa_nfields"),
            F.transform(entries, lambda e: e["k"]).alias("_sa_keys"),
        )

    def valid_expr(self, schema: LogSchema, raw: Column, parsed: Column) -> Column:
        # strict field count (parsers.py:789-790) + strict key-set equality
        # modulo optionals (parsers.py:244-272)
        count_ok = parsed["_sa_nfields"] == len(schema.schema)
        keys = parsed["_sa_keys"]
        required = F.array(*[F.lit(k) for k in sorted(schema.required_keys)])
        allowed = F.array(*[
            F.lit(k)
            for k in sorted(schema.required_keys | set(schema.optional_top_level_keys))
        ])
        none_missing = F.size(F.array_except(required, keys)) == 0
        no_extra = F.size(F.array_except(keys, allowed)) == 0
        return raw.isNotNull() & count_ok & none_missing & no_extra
