"""Runnable example: the security-analytics detection pack as one feed.

    python examples/run_detections.py [sf_dir]  # default /root/testdata/sf0.001

Runs the behavioral detections over the events table — CEP sequence
match (error-run then purchase), beaconing periodicity, impossible
travel, password spray, EWMA spike alerts, CUSUM rate shifts, decayed
risk top entities — and prints ONE normalized JSON line per detection
(detector, entity, window, measure), the shape a SOC pipeline ships to
its alert bus. Every detector is the same registry query the driver
hash-checks; this file only composes and normalizes them.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from streamalert_spark.queries import load_all  # noqa: E402
from streamalert_spark.session import get_spark  # noqa: E402

# detector -> (query name, entity column, window/time column, measure column)
DETECTORS = {
    "cep_error_run_then_purchase": ("pattern_sequence_alerts",
                                    "user_id", "run_start_s", "n_failures"),
    "beaconing": ("beaconing_pairs", "user_id", None, "irregularity_ppm"),
    "impossible_travel": ("impossible_travel_hops",
                          "user_id", None, "max_speed2_ratio"),
    "password_spray": ("password_spray_windows", "src", "d", "n_users"),
    "ewma_spike": ("ewma_control_chart", "event_type", "h", "x"),
    "cusum_rate_shift": ("cusum_changepoints", "event_type", "h", "cusum"),
    "decayed_risk_top": ("decayed_risk_scores",
                         "user_id", None, "decayed_score_fp"),
}


def normalize(name: str, df: DataFrame, entity: str, when: str | None,
              measure: str) -> DataFrame:
    cols = set(df.columns)
    sel = [
        F.lit(name).alias("detector"),
        F.col(entity).cast("string").alias("entity"),
        (F.col(when).cast("bigint") if when and when in cols
         else F.lit(None).cast("bigint")).alias("window_at"),
        (F.col(measure).cast("double") if measure in cols
         else F.lit(None).cast("double")).alias("measure"),
    ]
    return df.select(*sel)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="detections_example")
    registry = load_all()

    feed = None
    counts: dict[str, int] = {}
    for detector, (qname, entity, when, measure) in DETECTORS.items():
        out = normalize(detector, registry[qname].fn(spark, sf_dir),
                        entity, when, measure)
        feed = out if feed is None else feed.unionByName(out)
    rows = feed.collect()
    for r in rows:
        counts[r["detector"]] = counts.get(r["detector"], 0) + 1
        print(json.dumps({
            "detector": r["detector"], "entity": r["entity"],
            "window_at": r["window_at"], "measure": r["measure"],
        }, sort_keys=True))
    print(json.dumps({"stage": "summary", "detections": counts},
                     sort_keys=True), file=sys.stderr)


if __name__ == "__main__":
    main()
