"""Syslog parser: one regex, four named groups.

Reference behavior (streamalert/classifier/parsers.py:815-844): match
``timestamp host application: message`` with the fixed pattern below; a
non-matching line is invalid. Schema is fixed: timestamp, host,
application, message — all strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from streamalert_spark.parsers.base import ParserBase, parser
from streamalert_spark.schema.registry import LogSchema

# parsers.py:819-822 verbatim, with named groups converted to indexes and
# inner groups made non-capturing (Spark regexp_extract is index-based).
# Groups: 1=timestamp, 2=host, 3=application, 4=message.
SYSLOG_REGEX = (
    r"(^\w{3}\s\d{2}\s(?:\d{2}:?)+)\s"
    r"((?:\w[-]*)+)\s"
    r"(\w+)(?:\[\w+\])*:\s"
    r"(.*$)"
)

_GROUPS = {"timestamp": 1, "host": 2, "application": 3, "message": 4}


@parser
class SyslogParser(ParserBase):
    name = "syslog"

    def parse_expr(self, schema: LogSchema, raw: Column) -> Column:
        return F.struct(*[
            F.regexp_extract(raw, SYSLOG_REGEX, _GROUPS[name]).alias(name)
            for name in schema.schema
        ])

    def valid_expr(self, schema: LogSchema, raw: Column, parsed: Column) -> Column:
        return raw.isNotNull() & raw.rlike(SYSLOG_REGEX)
