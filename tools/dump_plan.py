"""Dump .explain('formatted') for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plan.py --suffix before [--sf DIR] [--tag r06] query [query ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from webcrawler_spark.plans.queries import QUERIES  # noqa: E402
from webcrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tag", default="r06")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.queries:
        df = QUERIES[name][0](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {args.sf} [{args.suffix}]\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
