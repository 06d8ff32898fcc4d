"""Distributed connected components: alternating large-star / small-star
(SURVEY.md B10; Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — see PAPERS.md). Pure DataFrame — no GraphFrames.

Converges in O(log^2 n) rounds (O(log n) in practice); every round is one
groupBy-min window + a projection. Each iteration localCheckpoints to cut
lineage (the reference's periodic-persistence analog, SURVEY.md section 4).

Node ids are int64; the final assignment maps every node to the minimum
doc_id of its component (the oracle's min-root convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return edges.unionByName(rev)


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: m = min(N(u) + {u}); emit (v, m) for v in N(u), v > u."""
    nbrs = _symmetrize(edges)
    w = Window.partitionBy("u")
    # no distinct here: duplicates don't affect the min and the small-star
    # pass dedupes — saves one exchange per round
    return (
        nbrs.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; for each u: m = min(N(u) + {u});
    emit (v, m) for v in N(u) plus (u, m), dropping self-loops."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    w = Window.partitionBy("u")
    with_min = oriented.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
    out_nbrs = with_min.select(F.col("v").alias("u"), F.col("m").alias("v"))
    out_self = with_min.select(F.col("u"), F.col("m").alias("v"))
    # single final distinct dedupes both branches
    return (
        out_nbrs.unionByName(out_self)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    # bit_xor is order-independent and cannot overflow (edges are distinct)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """edges(a, b) -> assignments(doc_id, cluster_id) for every node that
    appears in an edge (isolated nodes are absent — callers coalesce).

    Alternates large-star/small-star until the edge multiset reaches a
    fixpoint (count + order-independent xxhash64 fingerprint).

    Round-6 barrier optimization (guide §1.2): each round uses a LAZY
    localCheckpoint — the plan is truncated immediately (both star passes
    reference their input twice, so without truncation the lineage grows
    ~4x per round and analysis itself OOMs on deep inputs), but
    materialization is deferred to the fingerprint aggregation — ONE Spark
    job per round instead of eager-checkpoint-job + fingerprint-job. The
    round structure is unchanged (batching two star rounds per barrier was
    tried earlier and MEASURED SLOWER — real graphs converge in 1-3
    effective rounds)."""
    cur = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_fp = None
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        # the fingerprint job materializes the checkpoint as a side effect
        fp = _edge_fingerprint(nxt)
        cur = nxt
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iterations} iterations")

    # At the fixpoint every edge is (node, component-min). A node can also be
    # a root (appears only as v): roots map to themselves.
    members = cur.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = cur.select(F.col("v").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    return members.unionByName(roots).distinct()


def assign_clusters(docs: DataFrame, edges: DataFrame) -> DataFrame:
    """B11: every doc_id -> cluster_id (min id in component; singletons map
    to themselves)."""
    comp = connected_components(edges)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
