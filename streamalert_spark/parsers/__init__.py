from streamalert_spark.parsers.base import PARSERS, ParserBase, get_parser
from streamalert_spark.parsers import json_parser, csv_parser, kv_parser, syslog_parser  # noqa: F401 — registration

__all__ = ["PARSERS", "ParserBase", "get_parser"]
