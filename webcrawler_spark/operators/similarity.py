"""Similarity search over embedding columns (training-data pipeline ops).

Two paths:

- ``brute_force_topk``: exact cosine top-k via crossJoin + JVM-side
  higher-order functions (zip_with/aggregate — whole-stage codegen, no
  Python). Correctness baseline; O(n*q) — fine for moderate q.
- ``lsh_topk``: random-hyperplane LSH (sign sketch) scale path. Vectors are
  bucketed by b-bit hyperplane signatures over several independent tables;
  only same-bucket pairs are scored. Planes are seeded => deterministic.
  Recall is tunable via (n_tables, n_bits); candidates are exact-rescored,
  so precision is 1 by construction.

At 10^12 scale the bucketed join shuffles by signature key (no crossJoin
anywhere); brute force stays available for small query sets by broadcasting
the queries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cosine_col(qa: str, qb: str):
    """Exact cosine over two double-array columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(qa, qb, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(qa, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(qb, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, nbr_id, cosine, rank). ``queries`` is
    broadcast (small query sets)."""
    # round 6: norms once per vector (not per pair row) — same double math
    nrm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    e = _as_double(embeddings, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vb"), nrm.alias("nb")
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("va"), nrm.alias("na")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with("va", "vb", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("na") * F.col("nb")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, sig): sign-bit signature per hash table. Vectorized numpy
    over Arrow batches — one matmul per batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim)).astype(np.float64)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("sig", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # the input is pre-aliased to (vec_id, <vec_col>) below — always
            # read "vec_id", not the caller's id_col name
            mat = np.stack(pdf[vec_col].map(np.asarray).to_list()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy()
            out_ids, out_tbl, out_sig = [], [], []
            for t in range(n_tables):
                bits = (mat @ planes[t].T) > 0  # (n, n_bits)
                sigs = bits.astype(np.int64) @ weights
                out_ids.append(ids)
                out_tbl.append(np.full(len(ids), t, dtype=np.int32))
                out_sig.append(sigs)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_ids),
                    "table": np.concatenate(out_tbl),
                    "sig": np.concatenate(out_sig),
                }
            )

    return df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias(vec_col)).mapInPandas(
        gen, schema=schema
    )


def lsh_candidate_pairs(
    embeddings: DataFrame,
    n_tables: int = 48,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 5000,
) -> DataFrame:
    """Distinct candidate pairs (vec_id_a < vec_id_b) from hyperplane-LSH
    buckets — the scale path for all-pairs similarity thresholds: the only
    shuffle is by (table, sig) bucket key, never a crossJoin.

    Parameterized for HIGH thresholds (near-dup detection): at cosine 0.95
    the per-bit collision odds are 1 - acos(.95)/pi ~ 0.899, so a qualifying
    pair shares a 12-bit bucket with p ~ 0.28 per table and is missed by all
    48 tables with p ~ 1.7e-7 — recall is 1 up to that residual, and callers
    exact-rescore so precision is exactly 1."""
    dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    # persisted: the size aggregation and the bucket groupBy both consume
    # the Python signature stage (~16 bytes/row x tables rows/vector —
    # small); without it the mapInPandas stage runs twice per build
    sigs = hyperplane_signatures(
        embeddings, dim, n_tables, n_bits, seed, id_col, vec_col
    ).persist()
    # round 6 (guide §2.4): grouped pair explosion instead of a self-join —
    # the join's two inputs each re-ran the Python signature stage and the
    # bucket-size window (2 MapInPandas, 2 exchanges); now ONE signature
    # pass feeds one (table, sig) exchange. The bucket-size filter is a
    # partially-aggregated COUNT joined back onto the sig stream instead of
    # a count-over-window: no sort of the full sig stream (hash aggregate,
    # not window), the qualifying-key set is bounded by tables x 2^bits
    # regardless of corpus size, and oversize buckets are dropped BEFORE
    # any collect_list buffers them. Pair explosion streams slice() arrays
    # per row (O(bucket) memory, never the O(bucket^2) flattened pair
    # array — max_bucket here is 5000, so the lsh.py flatten-transform
    # pattern would materialize up to 12.5M structs per hot bucket). Same
    # distinct a < b pairs.
    ok = (
        sigs.groupBy("table", "sig")
        .agg(F.count("*").alias("_sz"))
        .filter((F.col("_sz") >= 2) & (F.col("_sz") <= max_bucket))
        .select("table", "sig")
    )
    # broadcast the qualifying-key set (bounded by tables x 2^bits at ANY
    # corpus size) so the sig stream pays exactly ONE exchange — the
    # groupBy's — with hash aggregation and no sort anywhere
    grouped = (
        sigs.join(F.broadcast(ok), ["table", "sig"])
        .groupBy("table", "sig")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
    )
    return (
        grouped.select(F.posexplode("ids").alias("i", "vec_id_a"), F.col("ids"))
        .select(
            "vec_id_a",
            F.explode(F.expr("slice(ids, i + 2, size(ids))")).alias("vec_id_b"),
        )
        .distinct()
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 2000,
) -> DataFrame:
    """Approximate all-pairs top-k: bucket by hyperplane signature, score
    only same-bucket pairs, exact-rescore, take top-k per vector."""
    dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    # round 6: one (persisted) signature pass + grouped ordered-pair
    # explosion, bucket-size filter via partial-aggregated count instead of
    # a count-over-window (no sort of the sig stream; oversize buckets are
    # dropped before collect_list — same rationale as lsh_candidate_pairs);
    # rescore joins carry a precomputed norm so the per-candidate work is
    # one dot product, not three array aggregates (identical double math).
    sigs = hyperplane_signatures(
        embeddings, dim, n_tables, n_bits, seed, id_col, vec_col
    ).persist()
    ok = (
        sigs.groupBy("table", "sig")
        .agg(F.count("*").alias("_sz"))
        .filter((F.col("_sz") >= 2) & (F.col("_sz") <= max_bucket))
        .select("table", "sig")
    )
    grouped = (
        sigs.join(F.broadcast(ok), ["table", "sig"])
        .groupBy("table", "sig")
        .agg(F.collect_list("vec_id").alias("ids"))
    )
    cand = (
        grouped.select(F.explode("ids").alias("query_id"), F.col("ids"))
        .select("query_id", F.explode("ids").alias("nbr_id"))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .distinct()
    )
    e = _as_double(embeddings, vec_col).withColumn(
        "_nrm",
        F.sqrt(
            F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )
    va = e.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("va"),
        F.col("_nrm").alias("na"),
    )
    vb = e.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    scored = (
        cand.join(va, "query_id")
        .join(vb, "nbr_id")
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with("va", "vb", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("na") * F.col("nb")),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
