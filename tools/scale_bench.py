"""Measured sf0.1 -> sf1 scaling ratios for the most expensive queries.

The 100x-design claims in SCALE.md argue from plan shapes; this harness
adds one measured decade: each selected query runs at the bench SF and at
the sf1 directory built by tools/make_scale_data.py, min-of-2 in separated
interleaved passes (same contention discipline as bench.py), and the
ratio t(sf1)/t(sf0.1) is recorded. With 10x the rows, a linear operator
plus fixed per-query overhead lands well under 10x; the verdict threshold
is ratio <= 12 (linear + overhead amortization). Anything above that is a
super-linear term no plan read can see — candidate-pair growth, state
growth, a driver-side loop — and gets investigated, not explained away.

Usage: python tools/scale_bench.py [--top 20] [--names a,b,c]
       [--sf1-dir .scale/sf1] [--out .scale/SCALE_RATIOS.json]
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
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--names", default="")
    ap.add_argument("--sf01-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1-dir",
                    default=os.path.join(REPO, ".scale", "sf1"))
    ap.add_argument("--out",
                    default=os.path.join(REPO, ".scale",
                                         "SCALE_RATIOS.json"))
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    names = ([n for n in args.names.split(",") if n] if args.names
             else _top_names(args.top))

    from streamalert_spark.queries import load_all
    from streamalert_spark.session import get_spark

    spark = get_spark(app_name="streamalert_spark_scale_bench")
    registry = load_all()

    def run_once(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).count()
        return time.perf_counter() - t0

    mins: dict[tuple[str, str], float] = {}
    # Interleave (query, sf) cells across separated passes so a transient
    # contention window cannot poison one whole SF column of the table.
    cells = [(n, sf) for n in names
             for sf in (args.sf01_dir, args.sf1_dir)]
    for pass_i in range(args.passes):
        for name, sf_dir in cells:
            try:
                dt = run_once(name, sf_dir)
            except Exception as exc:  # noqa: BLE001 — record, keep measuring
                print(f"SCALE ERROR {name} @ {sf_dir}: {exc}",
                      file=sys.stderr)
                mins.setdefault((name, sf_dir), -1.0)
                continue
            key = (name, sf_dir)
            mins[key] = min(mins.get(key, dt), dt)
            print(f"  pass{pass_i} {name} @ {os.path.basename(sf_dir)}: "
                  f"{dt:.2f}s", file=sys.stderr)

    # Generic decade labels: the same tool measures sf0.1->sf1, sf1->sf10,
    # and sf10->sf100 — the lo/hi directories are recorded alongside so the
    # JSON is self-describing at any pair of SFs.
    lo_label = os.path.basename(args.sf01_dir.rstrip("/"))
    hi_label = os.path.basename(args.sf1_dir.rstrip("/"))
    rows = []
    for name in names:
        t_lo = round(mins.get((name, args.sf01_dir), -1.0), 3)
        t_hi = round(mins.get((name, args.sf1_dir), -1.0), 3)
        ratio = round(t_hi / t_lo, 2) if t_lo > 0 and t_hi > 0 else None
        rows.append({
            "query": name, f"t_{lo_label}": t_lo, f"t_{hi_label}": t_hi,
            "ratio": ratio,
            "verdict": (None if ratio is None
                        else "linear-ok" if ratio <= 12 else "investigate"),
        })

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump({"rows": rows, "passes": args.passes,
                   "lo_dir": args.sf01_dir, "hi_dir": args.sf1_dir},
                  fh, indent=1)
    print(json.dumps(rows, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
