"""spark-submit entry script: the dedup pipeline against an existing
SparkSession (cluster-provided). Shipped alongside --py-files
webcrawler_spark.zip — imports resolve from the zip on every executor."""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="submit0")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("webcrawler-dedup-submit").getOrCreate()

    from webcrawler_spark.plans.pipeline import run_pipeline

    t0 = time.time()
    out = run_pipeline(spark, args.input, args.warehouse, run_id=args.run_id)
    n_docs = out["signatures"].count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "docs": n_docs,
                "edges": out["edges"].count(),
                "clusters": out["clusters"].select("cluster_id").distinct().count(),
                "wall_secs": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
