"""Exact substring containment (SURVEY.md B8, the suffix-array pass).

Shingle-set containment (lsh.py) catches token-level containment; this
operator verifies EXACT substring relations (doc A is a contiguous substring
of doc B) for candidate pairs, and provides a per-partition generalized
suffix-array discovery utility for within-partition mining.

Scale design: candidates come from the anchor stage (shared rare shingles),
verification co-locates only the candidate pairs' texts (join by id), and
the per-pair check is O(|B|) Two-Way search inside an Arrow batch. A global
suffix array over 10^12 docs is infeasible; the per-partition variant after
repartitioning on an anchor prefix is the bounded alternative — what the
anchor sampling can miss is logged, never silent (SURVEY.md section 7).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("is_substring", T.BooleanType()),
        T.StructField("container", T.LongType()),  # the larger doc, when true
    ]
)


def substring_containment(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """pairs(a, b) + docs(doc_id, text) -> exact substring verdicts.

    The smaller text is searched inside the larger (str in str — C-level
    Two-Way algorithm). Empty texts never contain/are-contained.
    """
    ta = docs.select(F.col("doc_id").alias("a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("b"), F.col("text").alias("text_b"))
    joined = pairs.join(ta, "a").join(tb, "b")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"a": [], "b": [], "is_substring": [], "container": []}
            for a, b, x, y in zip(pdf["a"], pdf["b"], pdf["text_a"], pdf["text_b"]):
                x = x or ""
                y = y or ""
                small, big = (x, y) if len(x) <= len(y) else (y, x)
                hit = bool(small) and small in big
                out["a"].append(int(a))
                out["b"].append(int(b))
                out["is_substring"].append(hit)
                out["container"].append(
                    int(b if len(x) <= len(y) else a) if hit else None
                )
            yield pd.DataFrame(out)

    return joined.mapInPandas(gen, schema=_PAIR_SCHEMA)


def substring_edges(sigs: DataFrame, docs: DataFrame, cfg=None) -> DataFrame:
    """Anchor candidates -> exact-substring edges (kind='substring')."""
    from webcrawler_spark.config import DEFAULT_CONFIG
    from webcrawler_spark.operators.lsh import anchor_candidates

    cfg = cfg or DEFAULT_CONFIG
    cand = anchor_candidates(sigs, cfg)
    verdicts = substring_containment(cand, docs)
    return verdicts.filter(F.col("is_substring")).select(
        "a", "b", F.lit("substring").alias("kind")
    )


# ---------------------------------------------------------------------------
# per-partition generalized suffix array (discovery within a partition)
# ---------------------------------------------------------------------------

def build_suffix_array(tok_h: np.ndarray, prefix: int = 8) -> np.ndarray:
    """Suffix ordering of a uint64 token-hash sequence by fixed-width prefix
    keys (numpy lexsort of the first `prefix` columns, padded). Sufficient
    for k-prefix grouping; full comparisons happen only within prefix ties."""
    n = len(tok_h)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    cols = []
    for j in range(prefix):
        col = np.full(n, 0, dtype=np.uint64)
        col[: n - j] = tok_h[j:]
        cols.append(col)
    return np.lexsort(cols[::-1]).astype(np.int64)


def partition_containment_pairs(
    doc_ids: list[int],
    token_seqs: list[np.ndarray],
    min_len: int = 16,
) -> list[tuple[int, int]]:
    """Within one partition: find docs whose full token sequence occurs
    verbatim inside another doc. Returns (contained_id, container_id) pairs.

    Implementation: concatenate all token-hash sequences (uint64) with
    unique separators into one byte string and use C-level substring search
    per doc, accepting only 8-byte-aligned hits (token boundaries) outside
    the doc's own span. Equivalent to generalized-suffix-array lookup with
    O(total) memory and C-speed scans.
    """
    if not doc_ids:
        return []
    chunks: list[bytes] = []
    spans: list[tuple[int, int]] = []  # byte span per doc
    off = 0
    for i, seq in enumerate(token_seqs):
        b = np.ascontiguousarray(seq, dtype=np.uint64).tobytes()
        chunks.append(b)
        spans.append((off, off + len(b)))
        off += len(b)
        sep = np.array([0xFFFF_FFFF_0000_0000 + i], dtype=np.uint64).tobytes()
        chunks.append(sep)
        off += len(sep)
    corpus = b"".join(chunks)

    out: list[tuple[int, int]] = []
    for i, (did, seq) in enumerate(zip(doc_ids, token_seqs)):
        if len(seq) < min_len:
            continue
        pat = np.ascontiguousarray(seq, dtype=np.uint64).tobytes()
        start = 0
        while True:
            pos = corpus.find(pat, start)
            if pos < 0:
                break
            start = pos + 8
            if pos % 8 != 0:
                continue
            if spans[i][0] <= pos < spans[i][1]:
                continue  # own occurrence
            # owner = doc whose span contains pos
            j = next(
                (k for k, (s, e) in enumerate(spans) if s <= pos < e), None
            )
            if j is not None and doc_ids[j] != did:
                out.append((did, doc_ids[j]))
                break
    return sorted(set(out))
