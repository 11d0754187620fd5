"""Freshness re-crawl (CrawlEngine.reschedule — extension beyond the
reference, which never revisits a seen URL: DocIDServer.isSeenBefore makes
assignUrl reject them all). Re-inserted URLs keep their docids, flow
through the normal politeness/claim loop, append NEW fetch_log rows, and
leave the seen/docid state untouched."""

from pyspark.sql import functions as F

from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
from crawler4j_spark.plans.refsim import SimConfig
from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus
from tests.conftest import make_corpus_dfs


def _drained_engine(spark, tmp_path, gen):
    cfg = EngineConfig(
        sim=SimConfig(max_depth=3, politeness_ms=200),
        round_size=25, n_seen_buckets=8,
        expected_urls_per_bucket=2000, mint_buckets=4)
    eng = CrawlEngine(spark, str(tmp_path / "store"),
                      *make_corpus_dfs(spark, gen), cfg)
    eng.add_seeds(gen.seeds)
    eng.crawl(max_rounds=100)
    assert eng.frontier_pending() == 0
    return eng


def test_reschedule_revisits_without_minting(spark, tmp_path):
    gen = generate_corpus(CorpusSpec(n_pages=80, n_hosts=4, seed=5))
    eng = _drained_engine(spark, tmp_path, gen)

    visited = [(r.url, r.docid, r.depth) for r in
               eng.visited_log().select("url", "docid", "depth").collect()]
    assert len(visited) > 5
    targets = visited[:3]
    before_seen = len(eng.seen_map())
    before_docid = eng.last_docid
    before_processed = eng.processed_pages

    n = eng.reschedule([u for u, _, _ in targets], priority=-5)
    assert n == 3
    assert eng.frontier_pending() == 3

    # pending rows carry the ORIGINAL docids/depths and the new priority
    pend = {r.url: (r.docid, r.depth, r.priority) for r in
            eng.store.read("frontier").collect()}
    for u, d, dep in targets:
        assert pend[u] == (d, dep, -5)

    eng.crawl(max_rounds=10)
    assert eng.frontier_pending() == 0

    # revisited: a SECOND fetch_log/visited row per target, same docid
    vlog = eng.visited_log()
    for u, d, _ in targets:
        rows = vlog.filter(F.col("url") == u).select("docid").collect()
        assert len(rows) == 2 and {r.docid for r in rows} == {d}, u
    # the corpus is static: recrawl mints nothing, seen is untouched
    assert eng.last_docid == before_docid
    assert len(eng.seen_map()) == before_seen
    assert eng.processed_pages == before_processed + 3


def test_reschedule_ignores_unknown_and_pending(spark, tmp_path):
    gen = generate_corpus(CorpusSpec(n_pages=80, n_hosts=4, seed=5))
    eng = _drained_engine(spark, tmp_path, gen)
    some_url = eng.visited_log().select("url").first().url

    assert eng.reschedule(["http://never.seen.example.com/x"]) == 0
    assert eng.reschedule([some_url]) == 1
    # already pending: J3 — no duplicate frontier key, idempotent
    assert eng.reschedule([some_url]) == 0
    assert eng.frontier_pending() == 1

    # scheduled_pages survives a store reopen (committed via props)
    scheduled = eng.scheduled_pages
    eng2 = CrawlEngine(spark, str(tmp_path / "store"),
                       *make_corpus_dfs(spark, gen), eng.cfg)
    assert eng2.scheduled_pages == scheduled
    eng2.crawl(max_rounds=10)
    assert eng2.frontier_pending() == 0
