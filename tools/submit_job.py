"""Example cluster job for ``spark-submit --py-files``.

This is the deployment shape the north rule asks for — the package rides
the ``--py-files`` archive, the session comes from spark-submit's confs
(no ``local[*]`` hardcoding here), and the job body is ordinary registry
calls::

    python tools/package_pyfiles.py
    spark-submit \
      --master <cluster-master> \
      --num-executors 1000 --executor-cores 4 --executor-memory 16g \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.shuffle.partitions=8192 \
      --py-files dist/crawler4j_spark.zip \
      tools/submit_job.py --sf-dir <data-dir> \
      --queries url_canonicalize,frontier_claim,dedup_minhash_lsh

Prints one ``RESULT {json}`` line with per-query row counts (the
integration test parses it). Queries that run pandas UDFs (e.g.
``url_canonicalize``) prove the executors import the package from the
shipped zip, not from a checkout.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True,
                    help="directory of the parquet tables")
    ap.add_argument("--queries", required=True,
                    help="comma-separated registry query names")
    args = ap.parse_args()

    # Session from spark-submit's --master/--conf: the job is cluster-agnostic.
    spark = SparkSession.builder.appName("crawler4j-spark-job").getOrCreate()

    # Import AFTER the session exists: resolves from the --py-files zip.
    from crawler4j_spark.operators.analytics import REGISTRY

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(
            f"unknown queries {unknown}; valid names: "
            + ", ".join(sorted(REGISTRY)))

    out = {}
    for name in names:
        fn, _ = REGISTRY[name]
        out[name] = fn(spark, args.sf_dir).count()
    print("RESULT " + json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
