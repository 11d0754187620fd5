"""Snapshot time travel (the Iceberg VERSION AS OF analog): every
committed round's table state stays readable at its manifest version
until gc_unreferenced (the expire-snapshots analog) reclaims the files —
after which an expired read raises instead of returning a partial table."""

import pytest

from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
from crawler4j_spark.plans.refsim import SimConfig
from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus
from tests.conftest import make_corpus_dfs


@pytest.mark.slow
def test_read_at_walks_history_and_gc_expires(spark, tmp_path):
    gen = generate_corpus(CorpusSpec(n_pages=60, n_hosts=4, seed=21))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    cfg = EngineConfig(
        sim=SimConfig(max_depth=3, politeness_ms=200), round_size=20,
        n_seen_buckets=4, expected_urls_per_bucket=500, mint_buckets=4)
    eng = CrawlEngine(spark, str(tmp_path / "tt"), corpus_df, robots_df, cfg)
    eng.add_seeds(gen.seeds)
    for _ in range(3):
        eng.run_round()

    store = eng.store
    versions = store.snapshot_versions()
    assert versions == sorted(versions) and len(versions) >= 4

    # the current version must read identically through both paths
    cur = versions[-1]
    assert (store.read_at("seen", cur).count()
            == store.read("seen").count())

    # seen only ever grows; walking versions must show a nondecreasing
    # count reaching the current one
    counts = []
    for v in versions:
        df = store.read_at("seen", v)
        counts.append(df.count() if df is not None else 0)
    assert counts == sorted(counts)
    assert counts[-1] == store.read("seen").count()
    assert counts[0] < counts[-1]

    # per-version props carry that round's scalar checkpoint
    rounds = [int(store.manifest_at(v).get("props", {}).get("round", 0))
              for v in versions]
    assert rounds == sorted(rounds)

    # before GC, every retained frontier version is readable
    frontier_versions = [
        v for v in versions
        if store.manifest_at(v).get("tables", {}).get("frontier")]
    for v in frontier_versions:
        store.read_at("frontier", v)

    # expire: GC keeps only the current snapshot's files. seen is
    # append-only, so its history SURVIVES expiry (old snapshots' files
    # are subsets of the current ones); the frontier is rewritten every
    # claim, so at least one old frontier version must now raise.
    store.gc_unreferenced()
    assert store.read_at("seen", cur).count() == counts[-1]
    first_seen = next(v for v, c in zip(versions, counts) if c > 0)
    assert store.read_at("seen", first_seen).count() == min(
        c for c in counts if c > 0)
    expired = []
    for v in frontier_versions[:-1]:
        try:
            store.read_at("frontier", v)
        except ValueError as e:
            assert "expired" in str(e)
            expired.append(v)
    assert expired, "GC removed no rewritten frontier file?"

    # unknown version: clear error
    with pytest.raises(ValueError, match="no retained snapshot"):
        store.manifest_at(999999)
