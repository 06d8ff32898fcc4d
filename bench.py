"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the dedup pipeline (the engine's reason to exist) plus the
heaviest relational operators: extraction (Arrow UDF), brute-force n-gram
Jaccard (shuffle-heavy self-join), TPC-H-style aggregations/joins, window
sessionization, and embedding similarity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webcrawler_spark.plans.queries import QUERIES, clear_clusters_cache  # noqa: E402
from webcrawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "dedup_clusters",
    "extract_visible_text",
    "minhash_dup_pairs",
    "substring_dup_pairs",
    "ngram_jaccard_pairs",
    "exact_dup_groups",
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "sessionize",
    "events_hourly",
    "embedding_topk",
    "embedding_dup_pairs",
    "quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(
        "webcrawler-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(16, int(cpus)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + python workers once (tiny query, not timed)
    QUERIES["token_count"][0](spark, sf_dir).count()

    timings: dict[str, float] = {}
    n_docs = 0
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        best = None
        for _ in range(max(1, reps)):  # steady-state: min-of-N (JIT amortizes)
            # the clusters memo exists so dedup_filter reuses dedup_clusters
            # within one contract sweep — timed reps must each pay full cost
            clear_clusters_cache()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
        if name == "dedup_clusters":
            n_docs = n

    total = round(sum(timings.values()), 3)
    dedup_secs = timings["dedup_clusters"]
    print(
        json.dumps(
            {
                "metric": "headline_suite_secs",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "dedup_docs_per_sec": round(n_docs / dedup_secs, 1) if dedup_secs else None,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
