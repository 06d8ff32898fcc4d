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


def _dedup_stage_breakdown(spark, sf_dir: str) -> dict[str, float]:
    """Attribute the warm dedup_clusters wall to its stages by timing each
    sub-DAG's materialization in sequence (signatures -> edges -> clusters;
    sf tables are pre-extracted documents, so there is no extract stage
    here — the full-pipeline stage walls live in BENCH/BASELINE.md). Runs
    AFTER the timed reps, so caches are warm exactly like the recorded min:
    a drift in the flagship number is attributable to a stage without
    re-running anything."""
    from webcrawler_spark.config import DEFAULT_CONFIG
    from webcrawler_spark.operators.components import assign_clusters
    from webcrawler_spark.operators.lsh import build_edges
    from webcrawler_spark.plans.queries import _doc_signatures, load

    clear_clusters_cache()
    t0 = time.time()
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = _doc_signatures(spark, sf_dir)
    sigs.count()
    t1 = time.time()
    edges = build_edges(sigs, DEFAULT_CONFIG, docs=docs)
    edges.count()
    t2 = time.time()
    assign_clusters(docs, edges).select("doc_id", "cluster_id").count()
    t3 = time.time()
    return {
        "signatures": round(t1 - t0, 3),
        "edges": round(t2 - t1, 3),
        "clusters": round(t3 - t2, 3),
    }


def _loadavg() -> list[float]:
    """1/5/15-min host load — stamped into the output JSON so every recorded
    bench carries its own contention evidence (the round-4 quiet-window
    protocol, promoted into the harness). load1 >> 0 BEFORE the bench starts
    means other work was running and the walls are suspect."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_before = _loadavg()

    spark = get_spark(
        "webcrawler-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(16, int(cpus)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + python workers once (tiny query, not timed)
    QUERIES["token_count"][0](spark, sf_dir).count()

    # per-rep walls are RECORDED (not just the min): a contended recording
    # session must be distinguishable from a real regression after the fact.
    # Spread guard: if max/min across a query's reps exceeds 2x, up to two
    # extra reps run — noisy-neighbor spikes get outvoted instead of
    # silently contaminating (or being hidden by) the min.
    timings: dict[str, float] = {}
    rep_walls: dict[str, list[float]] = {}
    n_docs = 0
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        walls: list[float] = []
        while True:
            # the clusters memo exists so dedup_filter reuses dedup_clusters
            # within one contract sweep — timed reps must each pay full cost
            clear_clusters_cache()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
            if len(walls) >= reps and (
                min(walls) == 0  # sub-ms rep: spread undefined, don't extend
                or max(walls) / min(walls) <= 2.0
                or len(walls) >= reps + 2
            ):
                break
        timings[name] = min(walls)
        rep_walls[name] = walls
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
                "rep_walls": rep_walls,
                "dedup_stage_secs": _dedup_stage_breakdown(spark, sf_dir),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "dedup_docs_per_sec": round(n_docs / dedup_secs, 1) if dedup_secs else None,
                "cpus": int(cpus),
                # before = pre-existing contention; after = mostly our own
                # local[cpus] work plus anything that arrived mid-run
                "host_load_before": load_before,
                "host_load_after": _loadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
