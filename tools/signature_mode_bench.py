"""verify_mode="signature" at scale: wall + shuffle bytes + planted recall
vs exact mode on the SAME 1M corpus (VERDICT r4 item 2).

The signature mode is the declared extreme-scale path (lsh.py: shingle
arrays never leave the signature stage; Jaccard/containment are estimated
from MinHash component agreement with tau lowered by signature_tau_margin).
Until now it was correctness-tested at contract scale only; this tool runs
the FULL pipeline in both modes, interleaved (exact, signature) x reps,
one fresh subprocess per run (fresh JVM — no cross-mode JIT bleed), and
records per-mode:

- warm-wall seconds (min over reps) and docs/sec;
- total shuffle read/write bytes (Spark REST API, summed over all stages —
  the signature mode's point is that the text-sized shingle arrays stay
  out of the verify exchanges);
- planted-family dup-pair recall against the corpus's dup_truth.parquet
  (a truth pair counts as found when ANY edge kind links it).

Writes BENCH/signature_mode.json. Run in a quiet window (same protocol as
tools/scaling_bench.py). Usage:

    python tools/signature_mode_bench.py [--docs 1000000] [--cores 16] [--reps 2]
    python tools/signature_mode_bench.py --inner --mode signature ...  # (internal)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _shuffle_totals(spark) -> dict[str, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
    }


def inner(args) -> None:
    from pyspark.sql import functions as F

    from webcrawler_spark.config import DEFAULT_CONFIG
    from webcrawler_spark.plans.pipeline import run_pipeline
    from webcrawler_spark.session import get_spark

    cfg = dataclasses.replace(DEFAULT_CONFIG, verify_mode=args.mode)
    spark = get_spark(
        f"sigmode-{args.mode}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.shuffle_partitions,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix=f"wh_sig_{args.mode}_", dir=args.base)
    t0 = time.time()
    out = run_pipeline(spark, args.input, wh, cfg=cfg, run_id=f"sig_{args.mode}")
    n_docs = out["signatures"].count()
    edge_pairs = out["edges"].select("a", "b").distinct()
    n_edges = edge_pairs.count()
    wall = round(time.time() - t0, 2)

    truth = spark.read.parquet(
        os.path.join(os.path.dirname(args.input), "dup_truth.parquet")
    ).select(
        F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")
    )
    n_truth = truth.count()
    n_found = truth.join(edge_pairs, ["a", "b"]).count()

    result = {
        "mode": args.mode,
        "wall_secs": wall,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / wall, 1),
        "edge_pairs": n_edges,
        "truth": n_truth,
        "found": n_found,
        "recall": round(n_found / n_truth, 5) if n_truth else None,
        **_shuffle_totals(spark),
    }
    shutil.rmtree(wh, ignore_errors=True)
    print(json.dumps(result))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--mode", choices=["exact", "signature"], default="exact")
    ap.add_argument("--input", default=None)
    ap.add_argument("--base", default="/tmp/webcrawler_scaling")
    args = ap.parse_args()

    if args.inner:
        inner(args)
        return

    from tools.scaling_bench import ensure_corpus

    input_path = ensure_corpus(args.docs, args.base)
    runs: dict[str, list[dict]] = {"exact": [], "signature": []}
    for rep in range(args.reps):
        for mode in ("exact", "signature"):
            cmd = [
                sys.executable, os.path.abspath(__file__), "--inner",
                "--mode", mode, "--input", input_path, "--base", args.base,
                "--cores", str(args.cores),
                "--shuffle-partitions", str(args.shuffle_partitions),
            ]
            env = dict(os.environ, PYTHONPATH=REPO, SPARK_LOCAL_DIRS="/dev/shm")
            proc = subprocess.run(
                cmd, capture_output=True, text=True, env=env, timeout=3600
            )
            if proc.returncode != 0:
                print(proc.stdout[-2000:], proc.stderr[-4000:], file=sys.stderr)
                raise RuntimeError(f"inner run failed: {mode} rep {rep}")
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            runs[mode].append(r)
            print(f"rep {rep} {mode}: wall={r['wall_secs']}s "
                  f"recall={r['recall']} shw={r['shuffle_write_bytes']}",
                  file=sys.stderr)

    def best(mode: str) -> dict:
        return min(runs[mode], key=lambda r: r["wall_secs"])

    ex, sig = best("exact"), best("signature")
    payload = {
        "generated": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "docs": args.docs,
        "cores": args.cores,
        "shuffle_partitions": args.shuffle_partitions,
        "reps": args.reps,
        "exact": {**ex, "all_walls": [r["wall_secs"] for r in runs["exact"]]},
        "signature": {**sig,
                      "all_walls": [r["wall_secs"] for r in runs["signature"]]},
        "wall_ratio_signature_over_exact": round(
            sig["wall_secs"] / ex["wall_secs"], 3
        ),
        "shuffle_write_ratio": round(
            sig["shuffle_write_bytes"] / max(1, ex["shuffle_write_bytes"]), 3
        ),
    }
    out = os.path.join(REPO, "BENCH", "signature_mode.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
