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


def _is_min_rooted_star_forest(edges: DataFrame) -> bool:
    """True iff the (distinct) edge set is a min-rooted star forest — the
    exact fixpoint shape of the alternating star algorithm: (a) every u has
    exactly ONE outgoing edge, (b) no node is both a u and a v (leaves
    point at roots, roots have no out-edge), (c) every edge points DOWN
    (u > v), which for a star forest forces each root to be its component's
    minimum. One aggregation job over a (node, role) projection — 2|E|
    narrow rows, no sort; the job also materializes the caller's lazy
    checkpoint exactly like the fingerprint job it replaces (the previous
    convergence check: stop when two consecutive rounds' count +
    order-independent bit_xor(xxhash64(u, v)) fingerprints matched)."""
    roles = edges.select(
        F.col("u").alias("n"),
        F.lit(1).alias("r"),
        (F.col("u") > F.col("v")).cast("int").alias("dn"),
    ).unionAll(
        edges.select(F.col("v").alias("n"), F.lit(0).alias("r"), F.lit(1).alias("dn"))
    )
    per = roles.groupBy("n").agg(
        F.sum("r").alias("cu"), F.count("*").alias("ct"), F.min("dn").alias("dn")
    )
    row = per.agg(
        F.coalesce(F.max("cu"), F.lit(0)).alias("max_cu"),
        F.coalesce(
            F.max(
                F.when((F.col("cu") > 0) & (F.col("ct") > F.col("cu")), 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("both_roles"),
        F.coalesce(F.min("dn"), F.lit(1)).alias("all_down"),
    ).collect()[0]
    return (
        int(row["max_cu"]) <= 1
        and int(row["both_roles"]) == 0
        and int(row["all_down"]) == 1
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """edges(a, b) -> assignments(doc_id, cluster_id) for every node that
    appears in an edge (isolated nodes are absent — callers coalesce).

    Alternates large-star/small-star until the edge set IS the fixpoint
    shape — a min-rooted star forest, tested directly on the current edge
    set (round 6). The previous stop ran rounds until two consecutive edge
    fingerprints matched, which by construction costs one full EXTRA star
    round (2 window sorts + a distinct exchange) just to confirm the
    fixpoint; the direct test replaces the fingerprint job one-for-one
    (same checkpoint-materializing aggregation slot, no extra job) and
    stops at the SAME state: the alternating algorithm's fixpoints are
    exactly the min-rooted star forests (Kiveris et al. §3), star forests
    are invariant under both passes, and `_is_min_rooted_star_forest` is a
    sound+complete test of that shape (see its docstring).

    Round-6 barrier optimization (guide §1.2): each round uses a LAZY
    localCheckpoint — the plan is truncated immediately (both star passes
    reference their input twice, so without truncation the lineage grows
    ~4x per round and analysis itself OOMs on deep inputs), but
    materialization is deferred to the convergence-test aggregation — ONE
    Spark job per round instead of eager-checkpoint-job + test-job. The
    round structure is unchanged (batching two star rounds per barrier was
    tried earlier and MEASURED SLOWER — real graphs converge in 1-3
    effective rounds)."""
    cur = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iterations):
        # the test job materializes the checkpoint as a side effect
        if _is_min_rooted_star_forest(cur):
            break
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iterations} iterations")

    # At the fixpoint every edge is (node, component-min). A node can also be
    # a root (appears only as v): roots map to themselves.
    #
    # No distinct over the union (round 6): the fixpoint is a min-rooted
    # star forest (Kiveris et al. §3 — the property the min-root assignment
    # below already relies on), so (a) each non-root node appears exactly
    # once as u (its single (u, component-min) edge; the edge multiset is
    # distinct and v is determined by u), (b) roots never appear as u (a
    # root's star edge would be the self-loop (min, min), filtered every
    # round), and (c) `roots` is deduped by its own distinct. The branches
    # are therefore disjoint and internally duplicate-free — the old
    # distinct was one full exchange of the assignment stream for nothing.
    members = cur.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = cur.select(F.col("v").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    return members.unionByName(roots)


def assign_clusters(docs: DataFrame, edges: DataFrame) -> DataFrame:
    """B11: every doc_id -> cluster_id (min id in component; singletons map
    to themselves)."""
    comp = connected_components(edges)
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
