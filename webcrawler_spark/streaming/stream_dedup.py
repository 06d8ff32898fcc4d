"""Structured Streaming variant (SURVEY.md section 2A T1-T5).

The reference is an endless loop over a seed file with per-domain pacing and
resumable progress (administrator.go:102-140, rate_limiter.go:64-78,
progress.txt). The streaming analog:

- T1 endless re-scan  -> ``readStream`` on the web_pages directory (new
  files picked up continuously; ``trigger(availableNow=True)`` for
  catch-up-then-stop processing of a snapshot)
- T2 per-domain pacing -> per-batch salted repartition by domain
- T3 backpressure     -> ``maxFilesPerTrigger`` source option + AQE
- T4 resume           -> ``checkpointLocation`` (WAL + offsets), exactly the
  role progress.txt played, but exactly-once
- incremental dedup: each micro-batch is signed (sha256 + MinHash) and
  appended to the signatures store; EXACT dups against all previously seen
  content are flagged per batch via an anti-join on sha256 (the stateful
  analog of the reference's persistent bloom filter, with no false
  positives). Full near-dup clustering stays a batch job over the
  accumulated signatures table (run the pipeline on a schedule).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.config import DEFAULT_CONFIG, DedupConfig
from webcrawler_spark.extract.spark_extract import PAGE_SCHEMA, extract_pages, good_pages
from webcrawler_spark.operators.signatures import compute_signatures


def stream_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    input_schema,
    cfg: DedupConfig = DEFAULT_CONFIG,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
):
    """web_pages files -> streaming extract+sign -> parquet signatures store
    with per-batch exact-dup flags. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        pages = good_pages(extract_pages(batch_df))
        # round 6: batch-scoped persist — the signature branch and the
        # url join-back both consume the Arrow extraction subtree, which
        # otherwise runs TWICE per micro-batch (guide §5 caching: reused
        # AND expensive to recompute); unpersisted before returning so
        # state never accumulates across batches
        docs = pages.select(
            F.xxhash64("url").alias("doc_id"), F.col("url"), F.col("text")
        ).persist()
        try:
            sigs = compute_signatures(docs, cfg).join(
                docs.select("doc_id", "url"), "doc_id"
            )
            seen_path = os.path.join(output_dir, "signatures")
            spark_ = batch_df.sparkSession
            try:
                seen = spark_.read.parquet(seen_path).select("sha256").distinct()
                flagged = sigs.join(
                    seen.withColumn("_dup", F.lit(True)), "sha256", "left"
                ).withColumn(
                    "is_exact_dup", F.coalesce("_dup", F.lit(False))
                ).drop("_dup")
            except Exception:  # first batch: nothing seen yet
                flagged = sigs.withColumn("is_exact_dup", F.lit(False))
            flagged.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(seen_path)
        finally:
            docs.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_domain_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    input_schema,
):
    """G1 as a streaming windowed aggregation: running per-domain page
    counts (the frontier gauge analog, administrator_helpers.go:36-38).
    Returns a memory-sink query named 'domain_counts'."""
    stream = (
        spark.readStream.schema(input_schema)
        .parquet(input_dir)
        .withColumn(
            "domain",
            F.regexp_replace(F.parse_url("url", F.lit("HOST")), r"^www\.", ""),
        )
    )
    agg = stream.groupBy("domain").agg(F.count("*").alias("n_pages"))
    return (
        agg.writeStream.format("memory")
        .queryName("domain_counts")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
