#!/usr/bin/env python
"""Per-key oracle spot-check: run the named queries() keys against
their oracle_sql() at one or more SF dirs (default sf0.001) — the
fast per-change correctness gate used between full driver sweeps.

Usage: python scripts/check_keys.py KEY [KEY...] [--sf sf0.001,sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from kafkastreamsinteractivequeries_spark.session import get_spark  # noqa: E402
from tests.oracle import compare  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sfs = ["sf0.001"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    keys = args
    spark = get_spark("ksiq-check")
    spark.sparkContext.setLogLevel("ERROR")
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    failed = []
    for sf in sfs:
        d = f"/root/testdata/{sf}"
        for k in keys:
            try:
                compare(q[k](spark, d), o[k], d)
                print(f"MATCH   {sf} {k}", flush=True)
            except Exception as exc:
                failed.append((sf, k))
                print(f"FAIL    {sf} {k}: {exc}", flush=True)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
