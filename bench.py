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
        # best of 2: the first execution pays one-time codegen compile + JIT
        # (measured 3-10x inflation on a cold JVM); the second is the
        # steady-state cost a long-lived cluster session would see.
        best = None
        n = 0
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                df = rq.fn(spark, sf_dir)
                n = df.count()
            except Exception as exc:  # noqa: BLE001 — report, don't die mid-bench
                print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
                best = -1.0
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if best > 0:
            total += best
        print(f"  {name}: {best:.3f}s rows={n}", file=sys.stderr)

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
