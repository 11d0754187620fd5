import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from crawler4j_spark.session import get_spark

    s = get_spark("crawler4j-tests", shuffle_partitions=8)
    yield s
    s.stop()


def make_corpus_dfs(spark, gen):
    """GeneratedCorpus → (corpus_df, robots_df) Spark DataFrames."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    )

    corpus_schema = StructType([
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(StructType([
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]))),
        StructField("status_code", IntegerType()),
        StructField("redirect_to", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
    ])
    corpus_df = spark.createDataFrame(gen.pages_records(), corpus_schema)
    robots_df = spark.createDataFrame(
        gen.robots_records(), "host string, body string")
    return corpus_df, robots_df
