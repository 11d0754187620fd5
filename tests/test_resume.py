"""Exactly-once resume (SURVEY §5.4): a run killed between rounds — with
leftover uncommitted staging garbage, as after a mid-round crash — resumes
from the last committed snapshot and finishes byte-identical to an
uninterrupted run."""

import os

import pytest

from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
from crawler4j_spark.plans.refsim import SimConfig
from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus
from tests.conftest import make_corpus_dfs


def _cfg():
    return EngineConfig(
        sim=SimConfig(max_depth=3, politeness_ms=200),
        round_size=25, n_seen_buckets=8,
        expected_urls_per_bucket=2000, mint_buckets=4)


@pytest.mark.slow
def test_kill_and_resume_identical(spark, tmp_path):
    gen = generate_corpus(CorpusSpec(n_pages=100, n_hosts=5, seed=77))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)

    # uninterrupted reference run
    full = CrawlEngine(spark, str(tmp_path / "full"), corpus_df, robots_df, _cfg())
    full.add_seeds(gen.seeds)
    full.crawl(max_rounds=200)

    # interrupted run: 3 rounds, then "crash"
    eng_a = CrawlEngine(spark, str(tmp_path / "resume"), corpus_df, robots_df, _cfg())
    eng_a.add_seeds(gen.seeds)
    for _ in range(3):
        eng_a.run_round()
    # simulate a crash mid-round-4: orphan staged data + stale tmp pointer
    data_dir = tmp_path / "resume" / "data"
    (data_dir / "deadbeef-orphan.parquet").write_bytes(b"not a parquet file")
    (tmp_path / "resume" / "_current.tmp-crashed").write_text("bogus")

    # fresh engine object on the same store — no corpus/robots re-supply
    eng_b = CrawlEngine(spark, str(tmp_path / "resume"), config=_cfg())
    assert eng_b.round == 3
    removed = eng_b.store.gc_unreferenced()
    assert removed >= 1  # the orphan is swept
    eng_b.crawl(max_rounds=200)

    # identical terminal state
    assert eng_b.seen_map() == full.seen_map()
    assert eng_b.last_docid == full.last_docid
    assert eng_b.scheduled_pages == full.scheduled_pages
    assert eng_b.processed_pages == full.processed_pages
    assert eng_b.clock == full.clock

    va = [(r["url"], r["docid"], r["depth"])
          for r in full.visited_log().select("url", "docid", "depth").collect()]
    vb = [(r["url"], r["docid"], r["depth"])
          for r in eng_b.visited_log().select("url", "docid", "depth").collect()]
    assert va == vb

    # frontier fully drained in both
    assert full.frontier_pending() == 0
    assert eng_b.frontier_pending() == 0


@pytest.mark.slow
def test_snapshot_isolation_under_failed_commit(spark, tmp_path):
    """A snapshot pointer flip is the only commit point: staged-but-
    uncommitted files must never be visible to reads."""
    gen = generate_corpus(CorpusSpec(n_pages=60, n_hosts=4, seed=99))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    eng = CrawlEngine(spark, str(tmp_path / "s"), corpus_df, robots_df, _cfg())
    eng.add_seeds(gen.seeds)
    eng.run_round()
    before = eng.store.manifest()["version"]
    seen_before = eng.store.row_count("seen")
    # stage a dataframe but never commit it
    orphan = spark.range(100).selectExpr(
        "cast(id as string) url", "id docid", "cast(id % 8 as int) bucket")
    eng.store.stage_dataframe(orphan)
    assert eng.store.manifest()["version"] == before
    assert eng.store.row_count("seen") == seen_before
    assert eng.store.gc_unreferenced() >= 1


@pytest.mark.slow
def test_warm_start_matches_sim(spark, tmp_path):
    """S2: preloaded seen URLs are never re-minted nor visited, and the
    docid high-water mark carries — engine vs simulator."""
    from crawler4j_spark.plans.refsim import RefSim
    from tests.test_engine_parity import assert_parity

    gen = generate_corpus(CorpusSpec(n_pages=80, n_hosts=4, seed=13))
    # pre-see a handful of real corpus URLs with docids 100..
    pre = [(p.url, 100 + i) for i, p in enumerate(
        sorted(gen.pages, key=lambda p: p.url)[10:14])]

    sim = RefSim(gen.sim, SimConfig(max_depth=3))
    for u, d in pre:
        assert sim.add_seen_url(u, d)
    for s in gen.seeds:
        sim.add_seed(s["url"], priority=s["priority"])
    sim.crawl()

    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    cfg = EngineConfig(sim=SimConfig(max_depth=3), round_size=25,
                       n_seen_buckets=8, expected_urls_per_bucket=2000,
                       mint_buckets=4)
    eng = CrawlEngine(spark, str(tmp_path / "ws"), corpus_df, robots_df, cfg)
    assert eng.add_seen_urls(pre) == len(pre)
    eng.add_seeds(gen.seeds)
    eng.crawl(max_rounds=200)
    assert_parity(sim, eng)


@pytest.mark.slow
def test_hot_host_claim_cap(spark, tmp_path):
    """Anti-starvation: with max_host_slots_per_round set, a hot host cannot
    monopolize a round — its tail stays pending and the crawl still drains
    to the same visited SET (order differs from parity mode by design)."""
    gen = generate_corpus(CorpusSpec(n_pages=60, n_hosts=4, seed=23,
                                     zipf_s=3.0))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    cfg = EngineConfig(
        sim=SimConfig(max_depth=2), round_size=40,
        n_seen_buckets=8, expected_urls_per_bucket=2000, mint_buckets=4,
        max_host_slots_per_round=5)
    eng = CrawlEngine(spark, str(tmp_path / "cap"), corpus_df, robots_df, cfg)
    eng.add_seeds(gen.seeds)
    rounds = eng.crawl(max_rounds=300)
    assert eng.frontier_pending() == 0
    # no round claimed more than 5 URLs of any single host
    claimed_caps = []
    docs = eng.documents()
    from pyspark.sql import functions as F
    by_host_round = (
        docs.groupBy("round", F.expr("substring_index(substring_index(url, '/', 3), '//', -1)").alias("h"))
        .count().agg(F.max("count")).collect()[0][0])
    assert by_host_round <= 5

    # uncapped run visits the same SET of pages
    cfg2 = EngineConfig(
        sim=SimConfig(max_depth=2), round_size=40,
        n_seen_buckets=8, expected_urls_per_bucket=2000, mint_buckets=4)
    eng2 = CrawlEngine(spark, str(tmp_path / "nocap"), corpus_df, robots_df, cfg2)
    eng2.add_seeds(gen.seeds)
    eng2.crawl(max_rounds=300)
    v1 = {r["url"] for r in eng.documents().select("url").collect()}
    v2 = {r["url"] for r in eng2.documents().select("url").collect()}
    assert v1 == v2


@pytest.mark.slow
def test_scale_mode_same_visited_set(spark, tmp_path):
    """exact_claim=False + distributed process order (the 10^10 scale path)
    relaxes within-round composition but must still crawl exactly the same
    page SET to completion."""
    from crawler4j_spark.plans.refsim import RefSim

    gen = generate_corpus(CorpusSpec(n_pages=80, n_hosts=4, seed=51))
    sim = RefSim(gen.sim, SimConfig(max_depth=3))
    for s in gen.seeds:
        sim.add_seed(s["url"], priority=s["priority"])
    sim.crawl()

    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    cfg = EngineConfig(
        sim=SimConfig(max_depth=3), round_size=25,
        n_seen_buckets=8, expected_urls_per_bucket=2000, mint_buckets=4,
        exact_claim=False, dense_seq_distributed=True)
    eng = CrawlEngine(spark, str(tmp_path / "scale"), corpus_df, robots_df, cfg)
    eng.add_seeds(gen.seeds)
    eng.crawl(max_rounds=300)
    got = {r["url"] for r in eng.documents().select("url").collect()}
    want = {v["url"] for v in sim.visited}
    assert got == want
    assert eng.frontier_pending() == 0


@pytest.mark.slow
def test_resume_old_schema_store(spark, tmp_path):
    """A store written before seed_counts.ended_round / robots_rules.
    fetched_at / fetch_log.bad_charset existed must load, serve its result
    views, and keep crawling — the small tables are migrated once at init,
    the fetch log is schema-merged at read time."""
    from pyspark.sql import functions as F

    gen = generate_corpus(CorpusSpec(n_pages=80, n_hosts=4, seed=55))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    eng = CrawlEngine(spark, str(tmp_path / "old"), corpus_df, robots_df, _cfg())
    eng.add_seeds(gen.seeds)
    eng.run_round()
    eng.run_round()

    # strip the store back to the pre-round-3 on-disk layout: standalone
    # host_state/seed_counts tables (no round_state), seed_counts without
    # ended_round, robots_rules without fetched_at, fetch_log without
    # bad_charset
    store = eng.store
    rs = store.read("round_state")
    legacy_counts = (rs.filter(F.col("kind") == "seed")
                     .select("seed_docid", "cnt"))
    legacy_hosts = (rs.filter(F.col("kind") == "host")
                    .select("host", "next_time"))
    old_rules = store.read("robots_rules").drop("fetched_at")
    old_log = store.read("fetch_log").drop("bad_charset")
    store.commit(replaces={
        "round_state": [],
        "seed_counts": store.stage_dataframe(legacy_counts),
        "host_state": store.stage_dataframe(legacy_hosts),
        "robots_rules": store.stage_dataframe(old_rules),
        "fetch_log": store.stage_dataframe(old_log),
    })
    docs_before = {r["url"] for r in eng.documents().collect()} if (
        eng.documents() is not None) else set()

    # resume: init migrates seed_counts/robots_rules; views merge fetch_log
    eng2 = CrawlEngine(spark, str(tmp_path / "old"), config=_cfg())
    counts = eng2.store.read("seed_counts")
    assert "ended_round" in counts.columns
    assert eng2._seed_counts_view() is not None
    assert eng2._host_state_view() is not None
    rules = eng2.store.read("robots_rules")
    assert "fetched_at" in rules.columns
    assert rules.filter(F.col("fetched_at") != 0).count() == 0

    # old-file rows must read bad_charset=False, not null-drop
    docs = {r["url"] for r in eng2.documents().collect()}
    assert docs == docs_before
    assert eng2.errors_log() is not None  # view builds over old files

    # and the crawl continues: new rounds append NEW-schema fetch_log files
    # alongside the old ones — the merged view must still work
    eng2.crawl(max_rounds=50)
    assert eng2.documents().count() >= len(docs_before)
    assert eng2.seed_events() is not None


@pytest.mark.slow
def test_kill9_mid_staging_resumes(spark, tmp_path):
    """A SIGKILL landing right after a staging write (files on disk, no
    manifest commit — the round-2 tmpfs flake's worst-case timing) must
    leave the store resumable: the interrupted round replays and the crawl
    finishes byte-identical to an uninterrupted run."""
    import subprocess
    import sys

    gen = generate_corpus(CorpusSpec(n_pages=100, n_hosts=5, seed=77))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)

    # uninterrupted reference
    full = CrawlEngine(spark, str(tmp_path / "full9"), corpus_df, robots_df,
                       _cfg())
    full.add_seeds(gen.seeds)
    full.crawl(max_rounds=200)

    # child process crawls the same corpus and SIGKILLs itself right after
    # the Nth staging write (mid-round, post-write, pre-commit)
    store = str(tmp_path / "kill9")
    child = f"""
import os, sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from crawler4j_spark.sources.tableio import SnapshotStore
_orig = SnapshotStore.stage_dataframe
_calls = [0]
def _wrapped(self, df, stats_cols=None):
    entries = _orig(self, df, stats_cols)
    _calls[0] += 1
    if _calls[0] == 18:           # lands inside round 2
        os.kill(os.getpid(), 9)   # no atexit, no finally — hard death
    return entries
SnapshotStore.stage_dataframe = _wrapped

from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
from crawler4j_spark.plans.refsim import SimConfig
from crawler4j_spark.session import get_spark
from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus
from tests.conftest import make_corpus_dfs

spark = get_spark("kill9", master="local[4]", shuffle_partitions=4)
gen = generate_corpus(CorpusSpec(n_pages=100, n_hosts=5, seed=77))
corpus_df, robots_df = make_corpus_dfs(spark, gen)
cfg = EngineConfig(sim=SimConfig(max_depth=3, politeness_ms=200),
                   round_size=25, n_seen_buckets=8,
                   expected_urls_per_bucket=2000, mint_buckets=4)
eng = CrawlEngine(spark, {repr(store)}, corpus_df, robots_df, cfg)
eng.add_seeds(gen.seeds)
eng.crawl(max_rounds=200)
print("NOT KILLED — wrapper never hit call 18", file=sys.stderr)
sys.exit(3)
"""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.run([sys.executable, "-c", child], env=env,
                          cwd=repo_root, capture_output=True, text=True,
                          timeout=480)
    assert proc.returncode == -9, (proc.returncode, proc.stderr[-2000:])

    # resume on the same store: orphaned staging/data files are swept,
    # the half-done round replays, terminal state matches the full run
    eng2 = CrawlEngine(spark, store, corpus_df, robots_df, _cfg())
    eng2.store.gc_unreferenced()
    eng2.crawl(max_rounds=200)
    assert eng2.seen_map() == full.seen_map()
    assert eng2.last_docid == full.last_docid
    assert eng2.processed_pages == full.processed_pages
    va = [(r["url"], r["docid"]) for r in
          full.visited_log().select("url", "docid").collect()]
    vb = [(r["url"], r["docid"]) for r in
          eng2.visited_log().select("url", "docid").collect()]
    assert va == vb


@pytest.mark.slow
def test_seen_delta_docids_agree_with_frontier(spark, tmp_path):
    """Round-3 ADVICE: the seen-table delta and the admission gates each
    recompute mint's row_number window from Spark cache; their docid
    agreement rests on (process_seq, within_order) being a total order with
    a deterministic upstream. Assert the two consumptions actually agree —
    every (url, docid) the gates admitted (frontier rows and the visited
    log) must carry the SAME docid the seen table registered for that url —
    so a future change that breaks the total-order invariant fails loudly
    instead of silently skewing the seen table."""
    from pyspark.sql import functions as F

    gen = generate_corpus(CorpusSpec(n_pages=120, n_hosts=6, seed=123))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    eng = CrawlEngine(spark, str(tmp_path / "agree"), corpus_df, robots_df,
                      _cfg())
    eng.add_seeds(gen.seeds)

    def assert_docids_agree(admitted, label):
        seen = eng._read("seen").select(
            "url", F.col("docid").alias("seen_docid"))
        bad = (admitted.select("url", "docid")
               .join(seen, "url", "left")
               .filter(F.col("seen_docid").isNull()
                       | (F.col("seen_docid") != F.col("docid"))))
        assert bad.count() == 0, f"docid skew in {label}"

    rounds = 0
    while rounds < 6 and eng.run_round():
        rounds += 1
        frontier = eng._read("frontier")
        if frontier is not None:
            assert_docids_agree(frontier, f"frontier after round {rounds}")
    assert rounds >= 2  # the corpus must actually exercise multiple rounds
    assert_docids_agree(eng.visited_log(), "visited log")


@pytest.mark.slow
def test_resume_real_round2_store_artifact(spark, tmp_path):
    """Upgrade path from a REAL pre-round_state store (tests/fixtures/
    r2_store, written by the actual round-2 code at commit 5ad2c6c after 3
    rounds on the seed-77 corpus): the current engine must read the legacy
    host_state/seed_counts tables through the round_state views, resume,
    and finish byte-identical to an uninterrupted run of the CURRENT code
    on the same corpus. The synthetic migration unit test covers the view
    union; this covers the artifact a real round-2 user upgrades from."""
    import shutil

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "r2_store")
    store = str(tmp_path / "r2_store")
    shutil.copytree(fixture, store)

    eng = CrawlEngine(spark, store, config=_cfg())
    assert eng.round == 3
    # the legacy tables are really there (this is a round-2 artifact)
    tables = eng.store.manifest()["tables"]
    assert "host_state" in tables and "seed_counts" in tables
    assert "round_state" not in tables
    eng.crawl(max_rounds=200)
    # after the first post-upgrade round the legacy tables are folded away
    # (their manifest entries are emptied, content lives in round_state)
    tables = eng.store.manifest()["tables"]
    assert "round_state" in tables
    assert tables["host_state"]["files"] == []
    assert tables["seed_counts"]["files"] == []

    # uninterrupted current-code reference run on the same corpus
    gen = generate_corpus(CorpusSpec(n_pages=100, n_hosts=5, seed=77))
    corpus_df, robots_df = make_corpus_dfs(spark, gen)
    full = CrawlEngine(spark, str(tmp_path / "full"), corpus_df, robots_df,
                       _cfg())
    full.add_seeds(gen.seeds)
    full.crawl(max_rounds=200)

    assert eng.seen_map() == full.seen_map()
    assert eng.last_docid == full.last_docid
    assert eng.scheduled_pages == full.scheduled_pages
    assert eng.processed_pages == full.processed_pages
    va = [(r["url"], r["docid"], r["depth"])
          for r in full.visited_log().select("url", "docid", "depth").collect()]
    vb = [(r["url"], r["docid"], r["depth"])
          for r in eng.visited_log().select("url", "docid", "depth").collect()]
    assert va == vb
    assert eng.frontier_pending() == 0
