"""Streaming coverage (SURVEY §2.8): real Structured Streaming pipelines
over the events table, and the CrawlStream micro-batch wrapper."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawler4j_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    sessionize_stateful,
    windowed_counts,
)


EVENTS_FILE = "/root/testdata/sf0.001/events.parquet"


def _events_dir(tmp_path):
    # the SS file source needs a directory, not a bare parquet file
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(EVENTS_FILE, d / "part-0.parquet")
    return str(d)


@pytest.mark.slow
def test_windowed_counts_matches_batch(spark, tmp_path):
    events_dir = _events_dir(tmp_path)
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    agg = windowed_counts(stream)
    run_to_memory(agg, "win_counts", str(tmp_path / "ckpt1"), "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.table("win_counts").collect()
    }
    batch = (
        spark.read.parquet(EVENTS_FILE).withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .select(F.col("win.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert got == want
    assert len(got) > 5


@pytest.mark.slow
def test_stateful_sessionize_runs(spark, tmp_path):
    stream = read_events_stream(spark, _events_dir(tmp_path))
    sess = sessionize_stateful(stream)
    run_to_memory(sess, "sessions", str(tmp_path / "ckpt2"), "update")
    out = spark.table("sessions").collect()
    # closed sessions were emitted with positive event counts
    assert all(r["session_events"] > 0 for r in out)


@pytest.mark.slow
def test_crawlstream_wrapper(spark, tmp_path):
    from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
    from crawler4j_spark.plans.refsim import SimConfig
    from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus
    from crawler4j_spark.streaming.microbatch import CrawlStream
    from tests.conftest import make_corpus_dfs

    gen = generate_corpus(CorpusSpec(n_pages=60, n_hosts=4, seed=5))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    eng = CrawlEngine(
        spark, str(tmp_path / "cs"), corpus_df, robots_df,
        EngineConfig(sim=SimConfig(max_depth=2), round_size=25,
                     n_seen_buckets=4, expected_urls_per_bucket=1000,
                     mint_buckets=2))
    eng.add_seeds(gen.seeds)
    seen_batches = []
    stream = CrawlStream(eng, on_batch=lambda r, m: seen_batches.append(r))
    rounds = stream.run()
    assert rounds, "no rounds ran"
    assert seen_batches == [m["round"] for m in rounds]
    assert rounds[-1]["pending"] == 0
    assert eng.frontier_pending() == 0
