"""Key-value parser: str_to_map projection.

Reference behavior (streamalert/classifier/parsers.py:748-812): split the
payload on ``delimiter``, split each token into key/value on the first
``separator``, require the field count to equal the schema's field count;
duplicate keys fall back to positional naming in the reference (rare —
unsupported here, rows with duplicate keys keep the LAST value per Spark
map semantics and still pass the count check only if distinct keys match).
"""

from __future__ import annotations

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
        kv = F.str_to_map(raw, F.lit(delim), F.lit(sep))
        # _sa_nfields / _sa_keys helper fields let valid_expr check the
        # strict field count and key presence without a second str_to_map.
        return F.struct(
            *[kv[name].alias(name) for name in schema.schema],
            F.size(F.split(raw, F.lit(delim).cast("string"), -1)).alias("_sa_nfields"),
            F.map_keys(kv).alias("_sa_keys"),
        )

    def valid_expr(self, schema: LogSchema, raw: Column, parsed: Column) -> Column:
        # strict field count (parsers.py:785-790) + every declared key present
        count_ok = parsed["_sa_nfields"] == len(schema.schema)
        keys_ok = F.size(
            F.array_except(
                F.array(*[F.lit(k) for k in schema.schema]),
                parsed["_sa_keys"],
            )
        ) == 0
        return raw.isNotNull() & count_ok & keys_ok
