"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dedup-clusters query at sf0.001; ``queries`` /
``oracle_sql`` expose the operator registry from
``webcrawler_spark.plans.queries`` (SURVEY.md section 2 coverage — one entry
per implemented operator; ALL 39 entries are DuckDB-checked, including the
flagship dedup path: clusters vs recursive-CTE components over brute-force
SQL edges, MinHash near-dup pairs vs the all-pairs Jaccard set, substring
pairs vs position() under the engine's stated preconditions, a
planted-variant recall gate, and SimHash via planted fingerprint-property
families (``simhash_consistency``; raw fingerprints are additionally
pytest-pinned bit-exact against the sequential numpy oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webcrawler_spark.plans.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: content-level dedup clusters over sf0.001 documents."""
    fn, _ = QUERIES["dedup_clusters"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
