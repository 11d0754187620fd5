"""Authority feedback (VERDICT r4 #3): pagerank over the observed host
graph folded into frontier priority must shift the claim order, exactly as
the (priority, min(depth,127), docid) ordering dictates."""

from pyspark.sql import functions as F

from crawler4j_spark.operators.graph import pagerank
from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
from crawler4j_spark.plans.refsim import SimConfig
from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus
from tests.conftest import make_corpus_dfs


def _cfg(round_size=10):
    return EngineConfig(
        sim=SimConfig(max_depth=4, politeness_ms=200),
        round_size=round_size, n_seen_buckets=8,
        expected_urls_per_bucket=2000, mint_buckets=4)


def _claimed_docids(eng, rnd):
    log = eng.store.read("fetch_log", merge_schema=True)
    return {r.docid for r in
            log.filter(F.col("round") == rnd).select("docid").collect()}


def test_pagerank_reprioritization_shifts_claim_order(spark, tmp_path):
    # seed 1 chosen by sweep: its round-1 frontier reorders under the
    # computed rank (most seeds do; a few have rank order == docid order)
    gen = generate_corpus(CorpusSpec(n_pages=120, n_hosts=6, seed=1))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    eng = CrawlEngine(spark, str(tmp_path / "pr"), corpus_df, robots_df,
                      _cfg())
    eng.add_seeds(gen.seeds)
    eng.run_round()
    assert eng.frontier_pending() > eng.cfg.round_size, \
        "corpus too small to leave a contested frontier"

    # default order: next claim would be the top-K by (priority=0, depth,
    # docid) — compute it before reprioritizing
    frontier = eng.store.read("frontier")
    def top_k(df):
        return {r.docid for r in
                df.orderBy("priority", F.least(F.col("depth"), F.lit(127)),
                           "docid")
                .limit(eng.cfg.round_size).select("docid").collect()}
    default_claim = top_k(frontier)

    # computed authority: 2 pagerank iterations over the observed host graph
    edges = eng.host_link_edges()
    assert edges.count() > 0
    ranks = pagerank(edges, n_iter=2).withColumnRenamed("node", "host")
    n = eng.reprioritize_frontier(ranks, scale=8.0)
    assert n == eng.frontier_pending()

    # the rewritten frontier's priorities follow the computed rank (clamped
    # byte range), and rank order decides claim order
    new_frontier = eng.store.read("frontier")
    pris = {r.host: r.priority for r in
            new_frontier.select("host", "priority").distinct().collect()}
    rank_map = {r.node: r.pr for r in ranks.withColumnRenamed(
        "host", "node").collect()}
    for host, pri in pris.items():
        if host in rank_map:
            expect = max(-128, min(127, -int(round(rank_map[host] * 8.0))))
            assert pri == expect, (host, pri, expect)

    expected_claim = top_k(new_frontier)
    assert expected_claim != default_claim, \
        "pagerank produced no reordering on this corpus — pick another seed"

    r = eng.round + 1
    eng.run_round()
    assert _claimed_docids(eng, r) == expected_claim


def test_synthetic_rank_promotes_host(spark, tmp_path):
    """A hand-set rank on one host pulls ALL of its pending URLs to the
    front of the claim."""
    gen = generate_corpus(CorpusSpec(n_pages=80, n_hosts=4, seed=3))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    eng = CrawlEngine(spark, str(tmp_path / "syn"), corpus_df, robots_df,
                      _cfg(round_size=6))
    eng.add_seeds(gen.seeds)
    eng.run_round()

    hosts = [r.host for r in
             eng.store.read("frontier").groupBy("host").count()
             .filter(F.col("count") >= 3).limit(1).collect()]
    assert hosts, "no host with >=3 pending rows"
    favored = hosts[0]
    rank = spark.createDataFrame([(favored, 10.0)], "host string, pr double")
    eng.reprioritize_frontier(rank, scale=8.0)

    r = eng.round + 1
    eng.run_round()
    log = eng.store.read("fetch_log", merge_schema=True)
    claimed_hosts = {row.host for row in
                     log.filter(F.col("round") == r)
                     .select("host").collect()}
    # slots beyond the favored host's supply may spill to others; but the
    # favored host had >=3 pending rows at priority -80 vs everyone's 0,
    # so with round_size=6 it must fill at least 3 slots
    n_favored = (log.filter((F.col("round") == r)
                            & (F.col("host") == favored)).count())
    assert favored in claimed_hosts
    assert n_favored >= 3


def test_authority_every_knob_drives_feedback_in_crawl(spark, tmp_path):
    """EngineConfig.authority_every wires the pagerank→priority loop into
    crawl() itself: with UNBOUNDED depth (a depth cap makes reachability
    order-dependent — a URL first minted at a gated depth is seen forever,
    so reordering legitimately changes the visited SET), the knob must
    reorder the visit sequence while draining to the identical visited and
    seen sets."""
    gen = generate_corpus(CorpusSpec(n_pages=120, n_hosts=6, seed=1))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)

    def drain(name, **extra):
        cfg = EngineConfig(
            sim=SimConfig(max_depth=-1, politeness_ms=200),
            round_size=10, n_seen_buckets=8,
            expected_urls_per_bucket=2000, mint_buckets=4, **extra)
        eng = CrawlEngine(spark, str(tmp_path / name), corpus_df,
                          robots_df, cfg)
        eng.add_seeds(gen.seeds)
        eng.crawl(max_rounds=100)
        return eng

    base = drain("base")
    auth = drain("auth", authority_every=1, authority_iters=2)

    base_visits = [(r.url, r.round) for r in
                   base.visited_log().select("url", "round").collect()]
    auth_visits = [(r.url, r.round) for r in
                   auth.visited_log().select("url", "round").collect()]
    assert {u for u, _ in base_visits} == {u for u, _ in auth_visits}
    assert base_visits != auth_visits, \
        "authority feedback produced no reordering on this corpus"
    assert auth.frontier_pending() == 0
    assert auth.processed_pages == base.processed_pages
    assert set(auth.seen_map()) == set(base.seen_map())
