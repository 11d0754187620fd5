"""Parity: Spark engine vs reference simulator (the north-rule criterion).

Runs both on the same deterministic corpus + seed list + politeness budget
and asserts (SURVEY §5.3):
  (a) identical visited-URL set AND order (round-bucketed; exact total order
      under the parallelism-1 / batch-25 emulation the engine's round model
      reproduces);
  (b) identical URL→docid assignment (the full seen map, incl. never-visited
      depth-gated / robots-blocked URLs);
  (c) per-document span-sequence equality (kind, text, media_ref, order);
  (d) counter parity (scheduled/processed pages).
"""

import pytest

from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
from crawler4j_spark.plans.refsim import RefSim, SimConfig
from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus
from tests.conftest import make_corpus_dfs


def run_sim(gen, sim_cfg):
    sim = RefSim(gen.sim, sim_cfg)
    for s in gen.seeds:
        sim.add_seed(s["url"], docid=s.get("doc_id_override") or -1,
                     priority=s["priority"])
    sim.crawl()
    return sim


def run_engine(spark, tmp_path, gen, sim_cfg, round_size=25, **eng_kw):
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    cfg = EngineConfig(
        sim=sim_cfg, round_size=round_size,
        n_seen_buckets=8, expected_urls_per_bucket=2000, mint_buckets=4,
        **eng_kw)
    eng = CrawlEngine(spark, str(tmp_path / "store"), corpus_df, robots_df, cfg)
    eng.add_seeds(gen.seeds)
    eng.crawl(max_rounds=500)
    return eng


def assert_parity(sim, eng):
    # (b) URL→docid assignment
    eng_seen = eng.seen_map()
    assert eng_seen == sim.seen

    # (a) visited set + order
    vlog = eng.visited_log()
    eng_visited = [
        (r["url"], r["docid"], r["depth"])
        for r in vlog.select("url", "docid", "depth").collect()
    ] if vlog is not None else []
    sim_visited = [(v["url"], v["docid"], v["depth"]) for v in sim.visited]
    assert eng_visited == sim_visited

    # (c) span-sequence equality per visited document
    if vlog is not None:
        for r in vlog.select("url", "spans").collect():
            got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in (r["spans"] or [])]
            want = sim.documents[r["url"]]
            assert got == [tuple(w) for w in want], r["url"]

    # (d) counters
    assert eng.processed_pages == sim.processed_pages
    assert eng.scheduled_pages == sim.scheduled_pages
    assert eng.last_docid == sim.last_docid

    # (e) error channel parity (status-code routing incl. 404/too-big)
    err_df = eng.errors_log()
    eng_errors = set()
    if err_df is not None:
        eng_errors = {(r["url"], r["status"])
                      for r in err_df.select("url", "status").collect()}
    sim_errors = {(e["url"], e["status"]) for e in sim.errors}
    assert eng_errors == sim_errors

    # (f) seed-end events: same ended-seed set, each emitted exactly once
    ev_df = eng.seed_events()
    eng_ended = []
    if ev_df is not None:
        eng_ended = [r["seed_docid"]
                     for r in ev_df.select("seed_docid").collect()]
    assert sorted(eng_ended) == sorted(set(sim.seed_end_events))


@pytest.mark.slow
def test_parity_default_corpus(spark, tmp_path):
    gen = generate_corpus(CorpusSpec(n_pages=150, n_hosts=6, seed=11))
    sim_cfg = SimConfig(max_depth=3, politeness_ms=200)
    sim = run_sim(gen, sim_cfg)
    eng = run_engine(spark, tmp_path, gen, sim_cfg)
    assert len(sim.visited) > 10, "fixture too small to prove anything"
    assert_parity(sim, eng)


@pytest.mark.slow
def test_parity_hot_host_skew(spark, tmp_path):
    # one hot host ≈ half the corpus (Zipf s high) — politeness interleave
    # and within-round ordering must still match exactly
    gen = generate_corpus(CorpusSpec(n_pages=120, n_hosts=5, seed=23,
                                     zipf_s=2.5, frac_cross_host=0.4))
    sim_cfg = SimConfig(max_depth=4, politeness_ms=1000)
    sim = run_sim(gen, sim_cfg)
    eng = run_engine(spark, tmp_path, gen, sim_cfg)
    assert len(sim.visited) > 10
    assert_parity(sim, eng)


@pytest.mark.slow
def test_parity_max_pages(spark, tmp_path):
    gen = generate_corpus(CorpusSpec(n_pages=100, n_hosts=4, seed=31))
    sim_cfg = SimConfig(max_depth=-1, max_pages=30)
    sim = run_sim(gen, sim_cfg)
    eng = run_engine(spark, tmp_path, gen, sim_cfg)
    assert_parity(sim, eng)


@pytest.mark.slow
def test_parity_should_visit_pattern(spark, tmp_path):
    gen = generate_corpus(CorpusSpec(n_pages=100, n_hosts=4, seed=47))
    pattern = r"^(?!.*\.png$).*$"  # python-regex gate used by both sides

    import re

    rx = re.compile(pattern)
    sim_cfg = SimConfig(max_depth=3)
    sim = RefSim(gen.sim, sim_cfg, should_visit=lambda u: rx.search(u) is not None)
    for s in gen.seeds:
        sim.add_seed(s["url"], priority=s["priority"])
    sim.crawl()
    # engine uses java regex via rlike: use a simpler mutually-valid pattern
    # instead — restrict to host0/host1 only
    pattern2 = "^http://host[01]\\."
    sim2 = RefSim(gen.sim, sim_cfg,
                  should_visit=lambda u: re.search(pattern2, u) is not None)
    for s in gen.seeds:
        sim2.add_seed(s["url"], priority=s["priority"])
    sim2.crawl()
    eng = run_engine(spark, tmp_path, gen, sim_cfg,
                     should_visit_pattern=pattern2)
    assert_parity(sim2, eng)


@pytest.mark.slow
def test_parity_no_follow_redirects(spark, tmp_path):
    # redirects are neither followed nor errors (WebCrawler.java invokes no
    # error handler for 3xx regardless of followRedirects)
    gen = generate_corpus(CorpusSpec(n_pages=120, n_hosts=5, seed=59,
                                     frac_redirect=0.15))
    sim_cfg = SimConfig(max_depth=3, follow_redirects=False)
    sim = run_sim(gen, sim_cfg)
    eng = run_engine(spark, tmp_path, gen, sim_cfg)
    assert len(sim.visited) > 10
    assert_parity(sim, eng)


@pytest.mark.slow
def test_parity_charset_pages(spark, tmp_path):
    # X8: heavy text/plain mix → many ISO-8859-1 raw-payload pages whose
    # outlinks come from decode_content(charset_from_content_type(...))
    gen = generate_corpus(CorpusSpec(n_pages=120, n_hosts=5, seed=67,
                                     frac_text=0.5))
    n_charset = sum(1 for p in gen.pages if p.content_data is not None)
    assert n_charset > 5, "fixture must contain charset pages"
    sim_cfg = SimConfig(max_depth=4)
    sim = run_sim(gen, sim_cfg)
    # the fixture must also reach >=1 UNKNOWN-charset page so the
    # content-fetch-error channel (Page.java:129 UnsupportedCharset ->
    # onContentFetchError) is exercised end-to-end on both sides
    from crawler4j_spark.plans.refsim import CONTENT_FETCH_ERROR
    assert any(e["status"] == CONTENT_FETCH_ERROR for e in sim.errors), \
        "fixture must reach a bad-charset page"
    eng = run_engine(spark, tmp_path, gen, sim_cfg)
    assert len(sim.visited) > 10
    assert_parity(sim, eng)


def test_parity_binary_outlinks(spark, tmp_path):
    # S8/F10 outlink half (Parser.java:61-75): binary pages carry raw
    # payloads with embedded URL byte runs; include+process binary means
    # the Tika-analog rendering feeds extractUrls and those candidates are
    # minted/scheduled like any other — engine and simulator must agree on
    # the whole seen map, visit order and counters.
    gen = generate_corpus(CorpusSpec(n_pages=150, n_hosts=6, seed=23,
                                     frac_binary=0.20, binary_payloads=True))
    n_payload = sum(
        1 for p in gen.pages
        if p.content_data is not None and p.content_type.split(";")[0]
        in ("image/png", "application/pdf", "audio/mpeg"))
    assert n_payload > 5, "fixture must contain binary payload pages"
    sim_cfg = SimConfig(max_depth=4, include_binary=True,
                        process_binary=True)
    sim = run_sim(gen, sim_cfg)
    # the knob must change the crawl (else this fixture proves nothing):
    # with processing off the same corpus yields a smaller seen map
    sim_off = run_sim(gen, SimConfig(max_depth=4, include_binary=True,
                                     process_binary=False))
    assert len(sim.seen) > len(sim_off.seen), \
        "fixture must mint docids via binary-extracted outlinks"
    eng = run_engine(spark, tmp_path, gen, sim_cfg)
    assert len(sim.visited) > 10
    assert_parity(sim, eng)


def test_robots_ttl_refresh(spark, tmp_path):
    # J4 TTL (HostDirectives.java:25-41, the fork's 24-minute quirk scaled
    # down): rules serve from cache until the virtual clock passes the TTL,
    # then refresh_robots re-fetches from the (changed) transport table.
    gen = generate_corpus(CorpusSpec(n_pages=60, n_hosts=3, seed=7))
    sim_cfg = SimConfig(max_depth=2, politeness_ms=100)
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    cfg = EngineConfig(sim=sim_cfg, round_size=25, n_seen_buckets=8,
                       expected_urls_per_bucket=2000, mint_buckets=4,
                       robots_ttl_ms=1_000)
    eng = CrawlEngine(spark, str(tmp_path / "store"), corpus_df, robots_df, cfg)
    eng.add_seeds(gen.seeds)
    eng.run_round()

    # the web changes: every robots host now blocks everything
    hosts = sorted(gen.robots)
    assert hosts, "fixture must have robots hosts"
    block = spark.createDataFrame(
        [(h, "User-agent: crawler4j\nDisallow: /\n") for h in hosts],
        "host string, body string")
    eng.set_robots_bodies(block)

    # not expired yet -> refresh is a no-op (cache keeps serving)
    eng.clock = 500
    assert eng.refresh_robots() == 0

    # past the TTL -> all hosts re-fetched, stamped with the new clock
    eng.clock = 5_000
    assert eng.refresh_robots() == len(hosts)
    rules = {r["host"]: r for r in eng.store.read("robots_rules").collect()}
    assert set(rules) == set(hosts)
    for h in hosts:
        assert rules[h]["fetched_at"] == 5_000
        assert list(rules[h]["spec_disallow"]) == ["/"]

    # every robots body vanishes from the web: once the TTL passes again,
    # the stale rules must DROP OUT of the cache even though nothing was
    # refreshed (the round-2 bug kept them serving forever via the
    # n_refreshed == 0 early return)
    eng.set_robots_bodies(spark.createDataFrame([], "host string, body string"))
    eng.clock = 20_000
    assert eng.refresh_robots() == 0
    remaining = eng.store.read("robots_rules")
    assert remaining is None or remaining.count() == 0


def test_pluggable_fetch_transport(spark, tmp_path):
    # S5 transport slot (PageFetcher.java:263-347): the engine runs with NO
    # corpus table at all — a user fetch_fn (here a deterministic fake HTTP
    # transport as a mapInPandas UDF) supplies the fetch-result columns.
    # Web shape: http://tH.example.com/pK links to /p(K+1) for K<3.
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, BinaryType, IntegerType, LongType, StringType,
        StructField, StructType,
    )

    span_t = ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]))

    def fake_fetch(slotted):
        out_schema = StructType(list(slotted.schema.fields) + [
            StructField("spans", span_t),
            StructField("status_code", IntegerType()),
            StructField("redirect_to", StringType()),
            StructField("content_type", StringType()),
            StructField("content_length", LongType()),
            StructField("content_data", BinaryType()),
        ])

        def gen(batches):
            for pdf in batches:
                pdf = pdf.copy()
                spans = []
                for u in pdf["url"]:
                    k = int(u.rsplit("p", 1)[1])
                    spans.append(
                        [{"kind": "a", "text": "next",
                          "media_ref": f"/p{k + 1}", "offset": 0}]
                        if k < 3 else [])
                pdf["spans"] = spans
                pdf["status_code"] = 200
                pdf["redirect_to"] = None
                pdf["content_type"] = "text/html"
                pdf["content_length"] = 10
                pdf["content_data"] = None
                yield pdf

        return slotted.mapInPandas(gen, out_schema)

    cfg = EngineConfig(
        sim=SimConfig(max_depth=-1, robots_enabled=False, politeness_ms=100),
        round_size=25, n_seen_buckets=8, expected_urls_per_bucket=100,
        mint_buckets=4, fetch_fn=fake_fetch)
    eng = CrawlEngine(spark, str(tmp_path / "store"), None, None, cfg)
    seeds = [{"url": f"http://t{h}.example.com/p0", "priority": 0,
              "doc_id_override": None} for h in range(2)]
    assert eng.add_seeds(seeds) == [1, 2]
    eng.crawl(max_rounds=50)
    visited = [(r["url"], r["depth"])
               for r in eng.visited_log().select("url", "depth").collect()]
    want = {(f"http://t{h}.example.com/p{k}", k)
            for h in range(2) for k in range(4)}
    assert set(visited) == want
    assert eng.frontier_pending() == 0
