"""CSV parser: from_csv with strict column-count semantics.

Reference behavior (streamalert/classifier/parsers.py:625-745):
- csv.reader with configurable delimiter/quotechar/escapechar
  (parsers.py:630-645);
- the row is invalid unless the value count equals the schema's field count
  exactly (parsers.py:726-728);
- a schema field may itself be a nested CSV (dict sub-schema) — the column's
  text is re-parsed as CSV into the sub-fields (parsers.py:732-740);
- CSV records can arrive embedded in JSON via json_path
  (parsers.py:676-683).

Spark strategy: ``from_csv`` into an all-string struct. Column-count
strictness uses PERMISSIVE mode's corrupt-record column for over-width rows
plus a last-field-null check for under-width rows; nested CSV columns chain
a second from_csv. All JVM-native.

Escapechar schemas (reference: cloudwatch:rds_aurora, the only shipped one)
take an Arrow-batched csv.reader kernel instead: univocity's escape applies
only around quote characters, so it diverges from csv.reader on escaped
delimiters (``a\\,b`` is ONE field to csv.reader), escape collapse in
unquoted values, and doubled-quote handling when an escapechar is set —
value- and split-level deltas no post-parse projection can reconcile.
csv.reader (C implementation, vectorized batch transfer) IS the reference
semantics, and escapechar schemas are the rare path by construction.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamalert_spark.parsers.base import ParserBase, parser
from streamalert_spark.parsers.json_parser import all_string_struct_ddl
from streamalert_spark.schema.registry import LogSchema

_CORRUPT = "_sa_corrupt"


def _options(schema: LogSchema) -> dict[str, str]:
    conf = schema.configuration
    return {
        "sep": conf.get("delimiter", ","),
        "quote": conf.get("quotechar", '"'),
        # reference escapechar defaults to None — no escape processing
        # (parsers.py:641-645); NUL disables Univocity's backslash default
        "escape": conf.get("escapechar", "\u0000"),
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": _CORRUPT,
    }


@parser
class CsvParser(ParserBase):
    name = "csv"

    def explode(self, df: DataFrame, raw_col: str, schema: LogSchema) -> tuple[DataFrame, str]:
        # CSV embedded in JSON (parsers.py:676-683): json_path names the
        # JSON field holding the CSV line.
        path = schema.json_path
        src = raw_col
        if path:
            df = df.withColumn("_sa_raw", F.get_json_object(F.col(raw_col), "$." + path))
            if schema.envelope_keys:
                env_ddl = all_string_struct_ddl(sorted(schema.envelope_keys))
                df = df.withColumn("streamalert_envelope_keys", F.from_json(F.col(raw_col), env_ddl))
            src = "_sa_raw"
        # Multi-line payloads: one csv.reader pass yields one record per
        # line (parsers.py:705-712 `for row in reader`); a payload matches
        # the schema when >=1 line is valid, invalid lines are counted
        # individually. A newline is a record boundary only when an EVEN
        # number of quote chars follows it (quote-parity lookahead), so
        # newlines inside quoted fields stay in the field value — same
        # semantics as csv.reader; doubled-quote escapes keep parity.
        # The lookahead rescans the payload tail per newline (O(L x
        # lines) worst case) — payloads are record-sized, so this is
        # bounded. A single trailing newline terminates the last row
        # rather than starting an empty one.
        quote = schema.configuration.get("quotechar", '"')
        escape = schema.configuration.get("escapechar")
        q = re.escape(quote)
        if escape:
            # Escape-aware parity (csv.reader with escapechar): quotes
            # consumed by the escapechar don't count toward parity, and a
            # newline preceded by an odd run of escapechars is itself
            # escaped (literal, not a boundary). Java lookbehind must be
            # bounded, so odd-run detection caps at 17 consecutive
            # escapes — beyond any real payload.
            e = re.escape(escape)
            out = rf"(?:{e}.|[^{q}{e}])"     # one unit outside a bare quote
            odd_run = rf"(?:^|[^{e}]){e}(?:{e}{e}){{0,8}}"
            boundary = (rf"(?s)(?<!{odd_run})\r?\n"
                        rf"(?=(?:{out}*{q}{out}*{q})*{out}*$)")
            fast_gate = (F.locate(quote, F.col(src)) == 0) & \
                        (F.locate(escape, F.col(src)) == 0)
        else:
            boundary = rf"\r?\n(?=(?:[^{q}]*{q}[^{q}]*{q})*[^{q}]*$)"
            fast_gate = F.locate(quote, F.col(src)) == 0
        # fast path: payloads containing no quote (or escape) char at all
        # (the common case for machine-generated CSV) split on the plain
        # newline — the parity lookahead only runs where one is present
        lines = F.when(
            fast_gate, F.split(F.col(src), r"\r?\n")
        ).otherwise(F.split(F.col(src), boundary))
        lines = F.when(
            (F.size(lines) > 1) & (F.element_at(lines, -1) == ""),
            F.slice(lines, 1, F.size(lines) - 1),
        ).otherwise(lines)
        df = df.withColumn(
            "_sa_csv_line",
            F.explode(F.coalesce(lines, F.array(F.lit(None).cast("string")))),
        )
        return df, "_sa_csv_line"

    def _ddl(self, schema: LogSchema) -> str:
        cols = ", ".join(f"`{name}` string" for name in schema.schema)
        return f"{cols}, `{_CORRUPT}` string"

    def parse_expr(self, schema: LogSchema, raw: Column) -> Column:
        # all fields come out as raw strings; nested CSV columns
        # (parsers.py:732-740 — a dict token in a csv schema) re-parse during
        # coercion (classify._coerce_field with fmt='csv'). The _sa_corrupt
        # helper field stays in the struct so valid_expr never re-parses.
        if schema.configuration.get("escapechar"):
            return self._py_reader_udf(schema)(raw)
        return F.from_csv(raw, self._ddl(schema), _options(schema))

    def _py_reader_udf(self, schema: LogSchema):
        """csv.reader-exact struct parser for escapechar schemas
        (parsers.py:630-645) — one Arrow-batched pandas UDF producing the
        same struct shape as from_csv (all fields + _sa_corrupt), so
        valid_expr and coercion are path-agnostic. Count-mismatched or
        unparseable lines set _sa_corrupt and null fields (strict count:
        parsers.py:726-728)."""
        import csv as _csv
        import io as _io

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        names = list(schema.schema)
        conf = schema.configuration
        delim = conf.get("delimiter", ",")
        quote = conf.get("quotechar", '"')
        esc = conf.get("escapechar")
        ncols = len(names)

        def parse(s):
            out = {c: [] for c in [*names, _CORRUPT]}
            for line in s:
                vals, corrupt = None, None
                if line is not None:
                    try:
                        rows_ = list(_csv.reader(
                            _io.StringIO(line), delimiter=delim,
                            quotechar=quote, escapechar=esc,
                        ))
                        got = rows_[0] if rows_ else []
                    except _csv.Error:
                        got = []
                    if len(got) == ncols:
                        vals = got
                    else:
                        corrupt = line
                for i, c in enumerate(names):
                    out[c].append(vals[i] if vals is not None else None)
                out[_CORRUPT].append(corrupt)
            return pd.DataFrame(out)

        # real annotation objects: the module's `from __future__ import
        # annotations` stringifies inline hints, which pandas_udf's
        # signature inference cannot resolve
        parse.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
        return pandas_udf(parse, self._ddl(schema))

    def valid_expr(self, schema: LogSchema, raw: Column, parsed: Column) -> Column:
        names = list(schema.schema)
        # over-width rows land in the corrupt column; under-width rows leave
        # the last declared field null (strict count: parsers.py:726-728)
        not_over = parsed[_CORRUPT].isNull()
        not_under = parsed[names[-1]].isNotNull()
        return raw.isNotNull() & not_over & not_under
