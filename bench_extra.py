#!/usr/bin/env python3
"""Noop-sink per-query isolation bench (guide §1.4) — r06 evidence harness.

``bench.py`` is the FROZEN driver contract (times ``fn(); df.count()`` in a
fresh JVM, one pass per query). This extra harness answers the questions the
frozen methodology can't:

* steady-state cost of the computation alone — ``noop`` sink (computes
  every column of every row, discards the result; ``count()`` lets the
  optimizer prune opaque-free projections), N repetitions, min+median
  reported so one host stall doesn't poison a comparison;
* first-run vs warm split (plan/codegen compile + lazy init vs the query).

Usage::

    python bench_extra.py [--sf-dir DIR] [--reps N] [query ...]

Prints one JSON line: {"queries": {name: {"first": s, "min": s,
"median": s, "samples": [...]}}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_DEFAULT = [
    "frontier_claim", "politeness_slots", "docid_mint", "seen_antijoin",
    "seed_offspring", "counters_rollup", "url_canonicalize",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "embedding_topk", "ann_lsh_buckets", "token_topn",
    "quality_score", "events_sessionize", "multimodal_decode",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    from crawler4j_spark.operators.analytics import REGISTRY
    from crawler4j_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    names = args.queries or HEADLINE_DEFAULT
    out = {}
    try:
        for name in names:
            fn, _ = REGISTRY[name]
            samples = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"noop: {name}")
                t0 = time.time()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite").save()
                samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            out[name] = {
                "first": samples[0],
                "min": min(samples[1:] or samples),
                "median": round(statistics.median(samples[1:] or samples), 3),
                "samples": samples,
            }
            print(f"[bench_extra] {name}: {samples}", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps({"queries": out, "sf_dir": args.sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
