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
    from crawler4j_spark.sources.corpus_spark import CORPUS_SCHEMA

    corpus_df = spark.createDataFrame(gen.pages_records(), CORPUS_SCHEMA)
    robots_df = spark.createDataFrame(
        gen.robots_records(), "host string, body string")
    return corpus_df, robots_df
