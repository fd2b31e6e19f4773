"""Python UDAF extension surface (SURVEY.md §2.8) — Arrow-batched
grouped-aggregate pandas UDFs usable inside groupBy().agg().

Like UDTFs, this is the extension POINT, not the hot path: a grouped-agg
UDF materializes each group's column in executor memory, so corpus-scale
aggregations should use builtins or the binned-exact patterns
(quality_buckets). It exists for long-tail custom statistics.

The shipped example is integer lower-median: order-statistic semantics
(element at floor((n-1)/2) of the sorted values) chosen because it is
integer-exact — both engines agree bit-for-bit where a mean-of-middles
median or any float UDAF would hang cross-engine equality on summation
order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


# UDF objects are created lazily inside functions: pandas_udf parses its
# DDL return type against the ACTIVE session, so module-level creation
# crashes when the module is imported on an executor (same pattern as
# ops/text.py _nfc_udf). Annotations are set as real objects because the
# module uses `from __future__ import annotations`.


def lower_median_agg(col) -> Column:
    """Grouped-agg UDAF: integer lower median of a bigint column."""

    def _lower_median(v):
        s = v.dropna().sort_values().reset_index(drop=True)
        if len(s) == 0:
            return None
        return int(s.iloc[(len(s) - 1) // 2])

    _lower_median.__annotations__ = {"v": pd.Series, "return": int}
    return pandas_udf(_lower_median, "bigint")(col)


def group_count_agg(col) -> Column:
    """Pandas twin of count(*): grouped-agg pandas UDFs cannot mix with
    JVM aggregates in one agg(), so UDAF queries count through this."""

    def _group_count(v):
        return len(v)

    _group_count.__annotations__ = {"v": pd.Series, "return": int}
    return pandas_udf(_group_count, "bigint")(col)
