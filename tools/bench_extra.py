"""Per-query optimization bench (guide §1.4): times any subset of the
registry with the noop sink so the computation is isolated from the sink,
with load stamps and all rep walls recorded.

Does NOT replace bench.py (frozen driver contract) — this is the
iteration tool for the optimization rounds; OPTIMIZATION_r06.md cites its
numbers alongside the frozen-bench ones.

Usage:
  python tools/bench_extra.py [--sf DIR] [--reps N] [--sink noop|count] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webcrawler_spark.plans.queries import QUERIES, clear_clusters_cache  # noqa: E402
from webcrawler_spark.session import get_spark  # noqa: E402


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sink", choices=("noop", "count"), default="noop")
    ap.add_argument("queries", nargs="*", help="default: all registry entries")
    args = ap.parse_args()

    names = args.queries or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    load_before = _loadavg()
    spark = get_spark(
        "webcrawler-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(16, int(cpus)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm JVM + python workers (same protocol as bench.py)
    QUERIES["token_count"][0](spark, args.sf).count()

    walls: dict[str, list[float]] = {}
    for name in names:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        ws: list[float] = []
        for _ in range(args.reps):
            clear_clusters_cache()
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            ws.append(round(time.time() - t0, 3))
        walls[name] = ws
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: min={min(ws)} walls={ws}", file=sys.stderr)

    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "sink": args.sink,
                "queries_min": {n: min(w) for n, w in walls.items()},
                "rep_walls": walls,
                "total_min": round(sum(min(w) for w in walls.values()), 3),
                "cpus": int(cpus),
                "host_load_before": load_before,
                "host_load_after": _loadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
