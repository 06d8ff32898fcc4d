"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The sandbox has no multi-node cluster, so N -> 4N executors is evidenced by
running the SAME pipeline on the SAME input at local[8] and local[32] on the
32-core host (driver instruction; BASELINE.md section C). Each run is a
fresh subprocess (fresh JVM, fresh warehouse); shuffle partitions are pinned
to the same value so the physical plan is identical and only available cores
differ. Results land in BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [--docs 20000] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_corpus(n_docs: int, base: str) -> str:
    out = os.path.join(base, f"scaling_corpus_{n_docs}")
    marker = os.path.join(out, "web_pages.parquet")
    if not os.path.exists(marker):
        from webcrawler_spark.sources.corpus import generate_corpus, write_parquet

        print(f"generating {n_docs}-doc corpus -> {out}", file=sys.stderr)
        write_parquet(generate_corpus(n_docs, seed=42), out)
    return marker


def run_once(input_path: str, cores: int, shuffle_partitions: int, base: str) -> dict:
    wh = tempfile.mkdtemp(prefix=f"wh_{cores}_", dir=base)
    cmd = [
        sys.executable,
        "-m",
        "webcrawler_spark.plans.pipeline",
        "--input", input_path,
        "--warehouse", wh,
        "--master", f"local[{cores}]",
        "--shuffle-partitions", str(shuffle_partitions),
        "--run-id", f"scal{cores}",
    ]
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_LOCAL_DIRS="/tmp")
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"pipeline failed at local[{cores}]")
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    result["cores"] = cores
    result["subprocess_secs"] = round(time.time() - t0, 1)
    result["warehouse"] = wh
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args()

    base = os.environ.get("SCALING_TMP", "/tmp/webcrawler_scaling")
    os.makedirs(base, exist_ok=True)
    input_path = ensure_corpus(args.docs, base)

    r8 = run_once(input_path, 8, args.shuffle_partitions, base)
    r32 = run_once(input_path, 32, args.shuffle_partitions, base)
    speedup = r8["wall_secs"] / r32["wall_secs"]
    efficiency = speedup / 4.0

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    now = datetime.now(timezone.utc).isoformat(timespec="seconds")
    with open(args.out, "w") as fh:
        fh.write(f"""# BENCH/BASELINE — scaling evidence (north rule: N -> 4N executors)

Protocol (BASELINE.md section C): identical input + config + physical plan
(shuffle partitions pinned to {args.shuffle_partitions}), fresh JVM and
warehouse per run; only the executor-thread count differs
(local[8] vs local[32] on the 32-core host — the sandbox stand-in for
N vs 4N executors, per driver instruction). Wall time measured inside the
job (after session startup), covering extract -> signatures -> candidates ->
verify -> edges -> union-find -> clusters, end to end.

Generated: {now} · corpus: {args.docs} synthetic web pages (seed=42,
planted dup families, 3 mega-domains at ~30% of rows)

| config | wall (s) | docs/sec | edges | clusters |
|---|---|---|---|---|
| local[8]  (N)  | {r8['wall_secs']} | {r8['docs_per_sec']} | {r8['edges']} | {r8['clusters']} |
| local[32] (4N) | {r32['wall_secs']} | {r32['docs_per_sec']} | {r32['edges']} | {r32['clusters']} |

- speedup T_8 / T_32 = **{speedup:.2f}x**
- scaling efficiency = speedup / 4 = **{efficiency:.3f}** (target >= 0.8)
- result parity across runs: edges {r8['edges']} == {r32['edges']},
  clusters {r8['clusters']} == {r32['clusters']} -> {"identical" if (r8['edges'], r8['clusters']) == (r32['edges'], r32['clusters']) else "MISMATCH"}
""")
    print(json.dumps({
        "t8": r8["wall_secs"], "t32": r32["wall_secs"],
        "speedup": round(speedup, 2), "efficiency": round(efficiency, 3),
        "parity": (r8["edges"], r8["clusters"]) == (r32["edges"], r32["clusters"]),
    }))


if __name__ == "__main__":
    main()
