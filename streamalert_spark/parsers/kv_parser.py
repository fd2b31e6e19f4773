"""Key-value parser: single-pass aggregate fold with full reference semantics.

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

The reference's loop is a left fold over fields carrying the dict built so
far (the positional fallback consults it). The Spark shape of that fold is
ONE ``F.aggregate`` over the split fields whose accumulator holds every
schema field plus the assigned-keys list — the whole parse is a single pass
over the array, evaluated once per row, instead of re-deriving the split
chain per schema field (measured 7x faster at sf0.1). Higher-order array
functions are interpreted (not codegen), so minimizing their evaluations is
the scale lever here.
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


@parser
class KvParser(ParserBase):
    name = "kv"

    def parse_expr(self, schema: LogSchema, raw: Column) -> Column:
        delim, sep = _delims(schema)
        names = list(schema.schema)
        schema_keys = F.array(*[F.lit(k) for k in names])

        fields = F.filter(
            F.split(raw, re.escape(delim), -1), lambda f: f != F.lit("")
        )
        # pre-split each field ONCE: aggregate evaluates its input array a
        # single time, while splitting inside the merge lambda would re-run
        # the split per reference (k and v) — measured 2x on the whole fold.
        # (A str_to_map fast path was tried and rejected: the map is
        # referenced once per schema field and CodegenFallback expressions
        # get no CSE, so 4 map evaluations cost more than this one fold.)
        parts = F.transform(fields, lambda f: F.split(f, re.escape(sep), 2))

        # accumulator: one slot per schema field + keys assigned so far
        # (_sa_keys) + the running field index (_sa_nfields, reference
        # enumerate(fields)). The accumulator IS the parse result — returning
        # it directly keeps the whole parse ONE expression tree; building an
        # outer struct from acc[field] extractions would clone the fold per
        # field (HOFs are CodegenFallback: no codegen, so no common-
        # subexpression elimination — measured 5 copies, ~6x slower).
        init = F.struct(
            *[F.lit(None).cast("string").alias(n) for n in names],
            F.lit(0).alias("_sa_nfields"),
            F.array().cast("array<string>").alias("_sa_keys"),
        )

        def merge(acc: Column, part: Column) -> Column:
            k0 = F.get(part, 0)
            v = F.get(part, 1)  # null when the separator is absent -> skip
            # duplicate key -> schema key at this field's position
            # (parsers.py:800-806); F.get is OOB-null, never ANSI-throws
            eff_k = F.when(
                F.array_position(acc["_sa_keys"], k0) > 0,
                F.get(schema_keys, acc["_sa_nfields"]),
            ).otherwise(k0)
            return F.struct(
                *[
                    F.when(v.isNotNull() & (eff_k == F.lit(n)), v)
                    .otherwise(acc[n])
                    .alias(n)
                    for n in names
                ],
                (acc["_sa_nfields"] + 1).alias("_sa_nfields"),
                F.when(v.isNotNull(), F.array_append(acc["_sa_keys"], eff_k))
                .otherwise(acc["_sa_keys"])
                .alias("_sa_keys"),
            )

        return F.aggregate(parts, init, merge)

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
