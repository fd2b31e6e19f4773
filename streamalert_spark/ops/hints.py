"""Size-gated broadcast hints for SF-scaling join sides.

An unconditional ``F.broadcast`` hint is an order, not a suggestion: Spark
builds and ships the side whatever it turns out to contain, and the hint
also blocks AQE from switching the join back to shuffle when the runtime
size explodes. That is right for scale-free inputs (TPC-H ``nation`` is 25
rows at every SF; a global-aggregate threshold is one row by construction)
but wrong for anything that grows with the data: at the 100 TB design
point ``customer`` is terabytes and a forced broadcast is a guaranteed
executor/driver OOM.

``gated_broadcast`` applies the hint only when Catalyst's own plan-time
size estimate for the frame is under a byte budget. The estimate comes
from the optimized logical plan (file sizes for scans, propagated through
projections/filters/aggregates by the size-only stats visitor), costs no
Spark job, and is the same quantity the planner uses for its own
auto-broadcast decision — we are just applying it at a higher, explicit
budget. Over the budget — or when the estimate is unavailable (a plan
whose every leaf lacks statistics reports Long.MaxValue) — the frame is
returned unhinted and AQE's runtime statistics pick the join strategy,
which at scale is the only safe default.

At bench scale (sf0.001–0.1, every table well under a megabyte on disk)
the gate always passes, so the broadcast plans the plan-shape tests pin
are unchanged; `tests/test_plan_shape.py::test_gated_broadcast_*` pins
both sides of the gate and that query results are identical either way.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Default byte budget for an explicit broadcast hint. Well under a sane
# executor heap share and Spark's 8 GB broadcast hard limit, but far above
# the default 10 MB autoBroadcastJoinThreshold: TPC-H dims at bench SFs are
# kilobytes, and at production SFs a customer/part/supplier relation blows
# past this and correctly falls back to a shuffle join. Override per
# deployment via ``spark.streamalert.broadcastHintBytes`` so the budget can
# be aligned with the actual executor memory (e.g. smaller executors ->
# smaller budget).
BROADCAST_SIZE_LIMIT = 256 * 1024 * 1024

BROADCAST_LIMIT_CONF = "spark.streamalert.broadcastHintBytes"

_warned_no_estimate = False


def broadcast_limit(df: DataFrame) -> int:
    """The active hint budget: ``spark.streamalert.broadcastHintBytes`` if
    set on the session, else ``BROADCAST_SIZE_LIMIT``.

    A set-but-unparsable value raises ValueError — a deployment that
    thinks it tuned the budget must not silently run on the default."""
    try:
        conf = df.sparkSession.conf.get(BROADCAST_LIMIT_CONF, None)
    except Exception:  # noqa: BLE001 — conf ACCESS is best-effort ...
        return BROADCAST_SIZE_LIMIT
    if conf is not None:
        try:
            return int(conf)
        except ValueError:  # ... but a malformed VALUE must be visible
            raise ValueError(
                f"{BROADCAST_LIMIT_CONF} must be an integer byte count, "
                f"got {conf!r} (e.g. use 268435456, not '256MB')"
            ) from None
    return BROADCAST_SIZE_LIMIT


def plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's plan-time sizeInBytes estimate for ``df``, or None.

    Reads the optimized logical plan's statistics (no job runs). Returns
    None when the internal API is unavailable (e.g. Spark Connect, where
    ``_jdf`` does not exist) — the caller must then treat the size as
    unknown/unbounded. Logs once per process when that happens so a
    deployment whose every gate silently degrades to no-hint is observable.
    """
    global _warned_no_estimate
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:  # noqa: BLE001 — estimate is best-effort by contract
        if not _warned_no_estimate:
            _warned_no_estimate = True
            log.warning(
                "plan-time size estimate unavailable (Spark Connect?); "
                "every gated_broadcast degrades to no-hint and AQE decides"
            )
        return None


def gated_broadcast(df: DataFrame, limit_bytes: int | None = None) -> DataFrame:
    """``F.broadcast(df)`` iff the plan-time size estimate fits the budget.

    Unknown estimates (None, or Catalyst's Long.MaxValue default for
    stat-less leaves) fail the gate: the un-hinted frame still broadcasts
    whenever Spark's own threshold or AQE runtime stats say it is small,
    so the conservative path costs nothing at bench scale that the
    optimizer can't win back, and never OOMs at 100 TB.
    """
    limit = broadcast_limit(df) if limit_bytes is None else limit_bytes
    est = plan_size_estimate(df)
    if est is not None and est <= limit:
        return F.broadcast(df)
    return df
