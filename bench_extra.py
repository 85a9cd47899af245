#!/usr/bin/env python
"""Round-7 optimization harness (guide §1.4): per-query noop-sink walls with
optional cache isolation, at any sf dir — bench.py stays FROZEN for the
driver; this file exists so optimization decisions are made on isolated
measurements (fresh caches, per-query load1, repeatable order).

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      [--queries a,b,c] [--repeats 2] [--isolate] [--out /tmp/r7.json]

--isolate releases all tracked persists BEFORE each query's passes, so each
wall includes its own cache-build cost (a cold, self-contained wall).
Without it, behavior matches bench.py (caches accumulate in bench order).
Prints one JSON line per query as it finishes (so a hung query still leaves
a record of everything before it), plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES, _load1  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default="")
    ap.add_argument("--repeats", type=int, default=2,
                    help="passes per query; first is the warm-up, min of the "
                         "rest is reported (1 = single cold pass)")
    ap.add_argument("--isolate", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from log_anomaly_detector_spark.operators import all_queries
    from log_anomaly_detector_spark.operators.caching import release_all
    from log_anomaly_detector_spark.session import get_spark, quiesce

    names = [q for q in args.queries.split(",") if q] or list(BENCH_QUERIES)
    spark = get_spark("bench_extra")
    qs = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        if args.isolate:
            release_all()
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls = []
        for i in range(max(args.repeats, 1)):
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
        rec = {
            "walls": walls,
            "cold": walls[0],
            "warm": min(walls[1:]) if len(walls) > 1 else None,
            "load1": _load1(),
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    spark.sparkContext.setJobDescription(None)
    result = {
        "sf_dir": args.sf_dir,
        "isolate": args.isolate,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": out,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({"summary": {k: v["warm"] or v["cold"] for k, v in out.items()}}))
    quiesce(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
