"""Custom stateful streaming operator (SURVEY.md T-coverage):
per-domain exact-dup flagging with ``applyInPandasWithState``.

The reference keeps a persistent in-process visited set (bloom filter,
filter/bloomfilter.go:85-109) consulted per URL. The streaming analog keeps
PER-DOMAIN state (the politeness/partitioning key, B13) holding the sha256
set of content already seen in that domain; each micro-batch's rows are
flagged ``is_dup_in_domain`` and the state updates — exactly-once via the
streaming checkpoint, with no false positives (the reference's bloom FP rate
was 1%).

State is bounded per key: an LRU cap (``max_hashes_per_domain``) evicts the
oldest hashes, mirroring how the reference's bloom filter saturates past
10^6 URLs — but deterministically and per-domain.

Also provides the watermarked tumbling-window ingest counter (late-data
handling per event time warc_ts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("is_dup_in_domain", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("hashes", T.ArrayType(T.StringType()))]
)

MAX_HASHES_PER_DOMAIN = 100_000


def _flag_dups(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (domain,) = key
    if state.exists:
        (hashes,) = state.get
        seen: dict[str, None] = dict.fromkeys(hashes)  # ordered (LRU-ish)
    else:
        seen = {}
    for pdf in pdfs:
        flags = []
        for sha in pdf["sha256"]:
            if sha in seen:
                flags.append(True)
            else:
                flags.append(False)
                seen[sha] = None
        yield pd.DataFrame(
            {
                "domain": domain,
                "url": pdf["url"],
                "sha256": pdf["sha256"],
                "is_dup_in_domain": flags,
            }
        )
    if len(seen) > MAX_HASHES_PER_DOMAIN:  # bounded state: evict oldest
        seen = dict.fromkeys(list(seen)[-MAX_HASHES_PER_DOMAIN:])
    state.update((list(seen),))


def stream_stateful_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    input_schema,
    query_name: str = "stateful_dedup",
    max_files_per_trigger: int = 2,
):
    """web_pages stream -> per-domain stateful exact-dup flags (memory sink).

    Uses update output mode; state persists across micro-batches through the
    checkpoint (resume = T4 analog)."""
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .withColumn(
            "domain",
            F.regexp_replace(F.parse_url("url", F.lit("HOST")), r"^www\.", ""),
        )
        .withColumn("sha256", F.sha2(F.col("text"), 256))
        .select("domain", "url", "sha256")
    )
    flagged = stream.groupBy("domain").applyInPandasWithState(
        _flag_dups,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        flagged.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_ingest(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    input_schema,
    query_name: str = "windowed_ingest",
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window ingest counts by domain (late rows beyond
    the watermark are dropped — the streaming G1/G3 analog)."""
    stream = (
        spark.readStream.schema(input_schema)
        .parquet(input_dir)
        .withColumn(
            "domain",
            F.regexp_replace(F.parse_url("url", F.lit("HOST")), r"^www\.", ""),
        )
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("domain"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            "domain",
            "n_pages",
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
