"""Key sanitization for the historical store.

The reference replaces every non-word character in record keys with '_'
before Firehose/Athena storage so column names are Hive-safe (reference:
streamalert/shared/firehose.py:42-44,131-166 — e.g.
'streamalert:envelope_keys' -> 'streamalert_envelope_keys',
'detail-type' -> 'detail_type'). Parquet columns here follow the same rule.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

_RE_INVALID = re.compile(r"\W")


def sanitize_key(key: str) -> str:
    """Replace every non-word character with underscore (firehose.py:42-44)."""
    return _RE_INVALID.sub("_", key)


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename all top-level columns to their sanitized form."""
    renames = {c: sanitize_key(c) for c in df.columns if sanitize_key(c) != c}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def sanitized_table_name(name: str, max_len: int = 64) -> str:
    """Sanitize a table/stream name, md5-suffixing when truncation is needed
    (reference: firehose.py:305-336 generate_firehose_name)."""
    safe = re.sub(r"[^a-zA-Z0-9_]", "_", name)
    if len(safe) <= max_len:
        return safe
    digest = hashlib.md5(safe.encode()).hexdigest()[:8]  # noqa: S324 — naming, not crypto
    return safe[: max_len - 9] + "_" + digest
