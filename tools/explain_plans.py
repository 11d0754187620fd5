#!/usr/bin/env python3
"""Dump explain("formatted") for registered queries to a directory.

Usage: python tools/explain_plans.py OUT_DIR [SF_DIR] [query ...]

Plan-only (no execution) for normal queries; queries whose builders run
driver-side actions (iterative graph/kmeans loops) will execute those small
jobs. Used to produce the plans/r06/<query>_before|_after.txt evidence."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler4j_spark.operators.analytics import REGISTRY  # noqa: E402
from crawler4j_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    names = sys.argv[3:] or list(REGISTRY)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-plans")
    try:
        for name in names:
            fn, _ = REGISTRY[name]
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
            except Exception as e:  # keep going; record the failure
                plan = f"ERROR building plan: {e}\n"
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(f"# {name}  sf_dir={sf_dir}\n")
                f.write(plan)
            print(name, flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
