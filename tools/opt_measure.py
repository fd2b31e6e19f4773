"""Round-12 optimization harness: per-query timing + formatted-plan capture.

For each selected registry query this tool records, at the bench SF:
- wall seconds for the bench action (`.count()`, min over --passes runs,
  interleaved across queries like bench.py so one contention window cannot
  poison a single query's column), and
- wall seconds for a noop-sink run (`write.format("noop")`), which
  materializes EVERY column (guide §1.4) — the honest compute cost when
  count() would let the optimizer prune the query, and
- `.explain("formatted")` written to plans/<round>/<name>_<tag>.txt so plan
  claims in OPTIMIZATION_r12.md are checkable without running Spark.

Usage: python tools/opt_measure.py --names a,b,c [--tag before|after]
       [--top 20] [--passes 2] [--noop] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _top_names(n: int) -> list[str]:
    with open(os.path.join(REPO, "BENCH_LAST.json")) as fh:
        record = json.load(fh)
    mins = {name: v["min"] for name, v in record["queries"].items()
            if isinstance(v, dict) and v.get("min", -1) > 0}
    return [name for name, _ in
            sorted(mins.items(), key=lambda kv: -kv[1])[:n]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--tag", default="")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    names = [n for n in args.names.split(",") if n]
    if args.top:
        names += [n for n in _top_names(args.top) if n not in names]
    if not names:
        ap.error("need --names or --top")

    from streamalert_spark.queries import load_all
    from streamalert_spark.session import get_spark

    spark = get_spark(app_name="streamalert_spark_opt_measure")
    registry = load_all()
    plans_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r13"))
    os.makedirs(plans_dir, exist_ok=True)

    count_s: dict[str, float] = {}
    noop_s: dict[str, float] = {}
    for pass_i in range(args.passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"opt[{args.tag}] {name}")
            try:
                rq = registry[name]
                t0 = time.perf_counter()
                rq.fn(spark, args.sf_dir).count()
                dt = time.perf_counter() - t0
                count_s[name] = min(count_s.get(name, dt), dt)
                if args.noop:
                    df = rq.fn(spark, args.sf_dir)
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    noop_s[name] = min(noop_s.get(name, dt), dt)
            except Exception as exc:  # noqa: BLE001 — record and continue
                print(f"OPT ERROR {name}: {exc}", file=sys.stderr)
                count_s.setdefault(name, -1.0)
            finally:
                spark.sparkContext.setJobDescription(None)
        print(f"-- pass {pass_i + 1}/{args.passes} done", file=sys.stderr)

    if args.tag and not args.no_plan:
        import contextlib
        import io

        for name in names:
            try:
                df = registry[name].fn(spark, args.sf_dir)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
                with open(path, "w") as fh:
                    fh.write(buf.getvalue())
            except Exception as exc:  # noqa: BLE001
                print(f"PLAN ERROR {name}: {exc}", file=sys.stderr)

    out = {name: {"count_s": round(count_s.get(name, -1.0), 3),
                  **({"noop_s": round(noop_s[name], 3)}
                     if name in noop_s else {})}
           for name in names}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
