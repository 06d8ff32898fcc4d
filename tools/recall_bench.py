"""Planted-family recall at bench scale via the sequential oracle.

The numpy oracle shares every hashing primitive and cap policy with the
distributed engine (engine == oracle bit-for-bit is pytest-pinned), so its
recall on a large planted corpus IS the engine's recall — measured here
single-process so it can run off to the side of Spark benches. Writes
BENCH/recall.json, which tools/scaling_bench.py folds into BENCH/BASELINE.md.

Usage: python tools/recall_bench.py [--docs 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from webcrawler_spark.operators.oracle import run_oracle  # noqa: E402
from webcrawler_spark.sources.corpus import english_docs, generate_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    corpus = generate_corpus(args.docs, seed=args.seed)
    res = run_oracle(english_docs(corpus))
    truth = {(a, b): f for a, b, f in corpus.truth_pairs}
    fam_truth: dict[str, int] = defaultdict(int)
    fam_found: dict[str, int] = defaultdict(int)
    for (a, b), fam in truth.items():
        fam_truth[fam] += 1
        if (a, b) in res.all_pairs:
            fam_found[fam] += 1
    n_truth = len(truth)
    n_found = sum(fam_found.values())
    payload = {
        "generated": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "docs": args.docs,
        "truth": n_truth,
        "found": n_found,
        "recall": round(n_found / n_truth, 5) if n_truth else None,
        "families": {
            f: {"truth": fam_truth[f], "found": fam_found[f]}
            for f in sorted(fam_truth)
        },
    }
    out = os.path.join(REPO, "BENCH", "recall.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
