"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import get_spark

    spark = get_spark(app_name="streamalert_spark_bench")
    registry = load_all()

    timings: dict[str, float] = {}
    total = 0.0
    for name, rq in registry.items():
        t0 = time.perf_counter()
        try:
            df = rq.fn(spark, sf_dir)
            n = df.count()
        except Exception as exc:  # noqa: BLE001 — report, don't die mid-bench
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"  {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
