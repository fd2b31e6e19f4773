"""JSON parser: single from_json pass + strict key-set semantics.

Reference behavior (streamalert/classifier/parsers.py:516-622):
- json.loads the payload;
- optional ``json_path`` (JMESPath like 'logEvents[*].message') extracts a
  list of inner records (parsers.py:429-448);
- optional ``embedded_json`` re-parses each extracted string as JSON
  (parsers.py:565-593);
- optional ``envelope_keys`` projects outer fields onto every inner record
  under 'streamalert:envelope_keys' (parsers.py:410-427);
- strict key-set equality: record keys == schema keys modulo declared
  optional_top_level_keys (parsers.py:244-272) — extra keys REJECT the
  record, unlike from_json's permissive default.

Spark expression strategy: ``from_json`` into an all-StringType struct reads
every JSON value (number/bool/object/array) as its raw text in one parse;
per-field coercion happens later with reference semantics. Key-set checking
uses ``json_object_keys`` + array algebra — native, codegen-friendly, no UDF.

json_path supports the jmespath subset the reference's configs can carry:
the shipped shapes 'a[*]', 'a[*].b', dotted 'a.b' (fast paths below), plus
indexes, slices, and filter projections via the subset compiler in
parsers/jmespath_subset.py — all from_json + explode + get_json_object,
the idiomatic Spark equivalents of JMESPath projections.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamalert_spark.parsers.base import ParserBase, parser
from streamalert_spark.schema.registry import LogSchema

# fast-path shapes: single-segment head/tail only (a dotted segment would
# read as a literal backticked field name in the from_json DDL — dotted
# paths route through the general [*] chain below instead)
_JSON_PATH_RE = re.compile(r"^(?P<head>[A-Za-z0-9_]+)\[\*\](?:\.(?P<tail>[A-Za-z0-9_]+))?$")

# Reference JSONParser._regex (parsers.py:520): greedy JSON-blob grab from a
# free-text field. Java regex needs the braces escaped; semantics (greedy .+,
# first match via search) are identical.
_JSON_BLOB_PATTERN = r"(\{.+[:,].+\}|\[.+[,:].+\])"


def all_string_struct_ddl(field_names: list[str]) -> str:
    return ", ".join(f"`{name}` string" for name in field_names)


def keyset_valid(raw: Column, required: set[str], optional: set[str]) -> Column:
    """required ⊆ keys(raw) ⊆ required ∪ optional, as native array ops.

    Folded to ONE equality — sort(keys ∪ optional) == sorted(required ∪
    optional) — which holds iff both subset conditions do (array_union
    dedups). A single json_object_keys evaluation per candidate instead of
    three: the JSON re-parse per reference dominates strict-validation cost
    and Filter codegen does not reliably CSE it. coalesce(.., false) keeps
    the tri-state false (not null) so first-match-wins negation holds.
    """
    keys = F.json_object_keys(raw)
    opt = F.array(*[F.lit(k) for k in sorted(optional)])
    allowed = F.array(*[F.lit(k) for k in sorted(required | optional)])
    return F.coalesce(F.array_sort(F.array_union(keys, opt)) == allowed, F.lit(False))


@parser
class JsonParser(ParserBase):
    name = "json"

    def explode(self, df: DataFrame, raw_col: str, schema: LogSchema) -> tuple[DataFrame, str]:
        path = schema.json_path
        envelope = schema.envelope_keys
        if envelope:
            env_ddl = all_string_struct_ddl(sorted(envelope))
            df = df.withColumn(
                "streamalert_envelope_keys",
                F.from_json(F.col(raw_col), env_ddl),
            )
        if not path:
            rkey = schema.json_regex_key
            if rkey:
                # json_regex_key (parsers.py:565-593): regex-extract a JSON
                # blob from a free-text field; no match -> null raw -> record
                # invalid, matching the reference's [(data, False)] return.
                # A blob that parses to a non-dict also invalidates, because
                # json_object_keys(raw) is null for arrays/scalars.
                # explode(array(...)) materializes the extraction once: the
                # downstream from_json + raw passthrough are CodegenFallback
                # (no CSE), so an unbarriered column would re-run the regex
                # chain per consumer (measured 2x at sf0.1).
                blob = F.regexp_extract(
                    F.get_json_object(F.col(raw_col), "$." + rkey),
                    _JSON_BLOB_PATTERN, 1,
                )
                df = df.withColumn("_sa_raw", F.explode(F.array(F.nullif(blob, F.lit("")))))
                return df, "_sa_raw"
            return df, raw_col
        if path == "[*]":
            # root-level array payload (e.g. trendmicro malware events,
            # parsers.py:429-448 jmespath '[*]'): every element is a record.
            inner = F.from_json(F.col(raw_col), "array<string>")
            df = df.withColumn("_sa_raw", F.explode(inner))
            return df, "_sa_raw"
        m = _JSON_PATH_RE.match(path)
        if m:
            head, tail = m.group("head"), m.group("tail")
            if tail:
                # 'logEvents[*].message' — array of objects, take one string field
                ddl = f"`{head}` array<struct<`{tail}`:string>>"
                inner = F.from_json(F.col(raw_col), ddl)[head]
                df = df.withColumn("_sa_inner", F.explode(inner))
                df = df.withColumn("_sa_raw", F.col("_sa_inner")[tail]).drop("_sa_inner")
            else:
                ddl = f"`{head}` array<string>"
                inner = F.from_json(F.col(raw_col), ddl)[head]
                df = df.withColumn("_sa_raw", F.explode(inner))
            return df, "_sa_raw"
        if "[" in path:
            # general jmespath subset — projections ([*], slices, filter
            # expressions), indexes, dotted prefixes/suffixes — compiled
            # to get_json_object / explode chains by the subset compiler
            # (see parsers/jmespath_subset.py for the exact grammar).
            from streamalert_spark.parsers.jmespath_subset import apply_json_path

            df, cur, temps = apply_json_path(df, raw_col, path, tag="jp")
            df = df.withColumn("_sa_raw", cur).drop(*temps)
            return df, "_sa_raw"
        # plain dotted path 'a.b' — single record extraction
        df = df.withColumn("_sa_raw", F.get_json_object(F.col(raw_col), "$." + path))
        return df, "_sa_raw"

    def parse_expr(self, schema: LogSchema, raw: Column) -> Column:
        ddl = all_string_struct_ddl(list(schema.schema))
        return F.from_json(raw, ddl)

    def valid_expr(self, schema: LogSchema, raw: Column, parsed: Column) -> Column:
        required = schema.required_keys
        optional = set(schema.optional_top_level_keys)
        return parsed.isNotNull() & keyset_valid(raw, required, optional)
