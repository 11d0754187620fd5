"""Distributed warm start (S2 bulk path): resolve_warm_batch must be
EXACTLY the sequential addSeenUrl walk (url-unseen + docid above the
running high-water mark, acceptances raise the mark), including the
revocation case where a docid-rejected duplicate url frees a later
occurrence and flips a provisionally-accepted later row. Property-tested
against a 10-line sequential model, then engine-level against
add_seen_urls on the same store shape."""

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from crawler4j_spark.operators.warm_start import resolve_warm_batch


def seq_model(rows, hwm0, seen):
    """The reference walk (engine.add_seen_urls inner loop, post-canon)."""
    existing, hwm, out = set(seen), hwm0, []
    for _, url, docid in sorted(rows):
        if url in existing or docid <= hwm:
            continue
        existing.add(url)
        hwm = docid
        out.append((url, docid))
    return sorted(out), hwm


def run_resolver(spark, rows, hwm0, seen):
    df = spark.createDataFrame(rows, "ord long, url string, docid long")
    seen_df = (
        spark.createDataFrame([(u,) for u in sorted(seen)], "url string")
        if seen else None
    )
    acc, hwm = resolve_warm_batch(df, hwm0, seen_df, n_buckets=4)
    got = sorted((r["url"], r["docid"]) for r in acc.collect())
    return got, hwm


pairs_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 30)), max_size=12)


@pytest.mark.slow
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
# the revocation case: A(10) acc, u0(5) rej, u0(20) acc -> B(15) REJECTED
# even though round 1's provisional record scan would have accepted it
@example(pairs=[(4, 10), (0, 5), (0, 20), (5, 15)], hwm0=0, seen=[])
# chained freeing events
@example(pairs=[(0, 5), (0, 20), (1, 3), (1, 30), (2, 25)], hwm0=0, seen=[])
# docid-sorted unique dump (the realistic input; 1 round)
@example(pairs=[(0, 1), (1, 2), (2, 3), (3, 4)], hwm0=0, seen=[])
# pre-seen url + initial high-water mark
@example(pairs=[(0, 7), (1, 8), (2, 9)], hwm0=7, seen=[1])
@given(pairs=pairs_strategy, hwm0=st.integers(0, 10),
       seen=st.lists(st.integers(0, 5), max_size=3))
def test_resolver_equals_sequential_walk(spark, pairs, hwm0, seen):
    rows = [(i, f"u{u}", d) for i, (u, d) in enumerate(pairs)]
    seen_urls = {f"u{u}" for u in seen}
    want, want_hwm = seq_model(rows, hwm0, seen_urls)
    got, got_hwm = run_resolver(spark, rows, hwm0, seen_urls)
    assert got == want
    assert got_hwm == want_hwm


@pytest.mark.slow
def test_engine_bulk_equals_sequential(spark, tmp_path):
    from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
    from crawler4j_spark.plans.refsim import SimConfig

    def _cfg():
        return EngineConfig(
            sim=SimConfig(), round_size=25, n_seen_buckets=4,
            expected_urls_per_bucket=500, mint_buckets=4)

    # dup urls (also dups post-canonicalization), out-of-order docids, an
    # invalid url, and a freeing event
    pairs = [
        ("http://A.example.com/x", 10),     # accepted (10 > hwm 3)
        ("http://b.example.com/y", 5),      # docid-rejected (5 <= 10)
        ("http://B.example.com/y", 20),     # freed canon-duplicate -> accepted
        ("http://c.example.com/z", 15),     # revoked by the freeing event
        ("mailto:nope@example.com", 99),    # canon-invalid -> skipped
        ("http://z.example.com/0", 50),     # pre-SEEN url -> rejected
        ("http://d.example.com/w", 30),     # accepted
    ]
    eng_seq = CrawlEngine(spark, str(tmp_path / "seq"), config=_cfg())
    eng_blk = CrawlEngine(spark, str(tmp_path / "blk"), config=_cfg())

    # warm both stores with a prior registration so the seen anti-join and
    # the initial high-water mark (3) are exercised
    prior = [("http://z.example.com/0", 2),
             ("http://z.example.com/1", 3)]
    assert eng_seq.add_seen_urls(prior) == eng_blk.add_seen_urls(prior) == 2

    n_seq = eng_seq.add_seen_urls(pairs)
    bulk_df = spark.createDataFrame(
        [(i, u, d) for i, (u, d) in enumerate(pairs)],
        "ord long, url string, docid long")
    n_blk = eng_blk.add_seen_urls_bulk(bulk_df)

    assert n_blk == n_seq
    assert eng_blk.last_docid == eng_seq.last_docid
    seen_seq = sorted(
        (r["url"], r["docid"])
        for r in eng_seq._read("seen").select("url", "docid").collect())
    seen_blk = sorted(
        (r["url"], r["docid"])
        for r in eng_blk._read("seen").select("url", "docid").collect())
    assert seen_blk == seen_seq


def test_duplicate_ord_rejected(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (1, "b", 6)], "ord long, url string, docid long")
    with pytest.raises(ValueError, match="unique"):
        resolve_warm_batch(df, 0, None, n_buckets=2)
