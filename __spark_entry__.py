"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl-round pipeline shape; ``queries`` exposes
one DataFrame callable per implemented operator from SURVEY.md §2 plus the
training-data pipeline operators; ``oracle_sql`` gives the DuckDB-equivalent
SQL for each (None-oracle queries are registered without an entry and get
the driver's rows-only check). Implementations live in
``crawler4j_spark/operators/analytics.py``; the real crawl engine (frontier
+ politeness + seen-dedup round loop with reference parity) lives in
``crawler4j_spark/plans/engine.py`` and is exercised by pytest + bench.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawler4j_spark.operators.analytics import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the crawl-round plan shape (ordered claim → politeness
    slots → docid mint) over the sf0.001 synthetic frontier."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler4j_spark.operators.analytics import _frontier

    sf_dir = "/root/testdata/sf0.001"
    claimed = (
        _frontier(spark, sf_dir)
        .orderBy("priority", F.least(F.col("depth"), F.lit(127)), "docid")
        .limit(500)
    )
    w_host = Window.partitionBy("host").orderBy(
        "priority", F.least(F.col("depth"), F.lit(127)), "docid")
    w_all = Window.orderBy("eff_time", "priority", "depth", "docid")
    return (
        claimed
        .withColumn("slot", F.row_number().over(w_host))
        .withColumn("eff_time", ((F.col("slot") - 1) * 200).cast("long"))
        .withColumn("process_seq", F.row_number().over(w_all).cast("long"))
        .withColumn(
            "minted_docid",
            (F.lit(1_000_000) + F.col("process_seq")).cast("long"))
        .select("docid", "priority", "depth", "host", "slot", "eff_time",
                "process_seq", "minted_docid")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in REGISTRY.items()
        if oracle is not None
    }
