"""SnapshotStore unit tests: atomic commits, file-stat head pruning, GC."""

from crawler4j_spark.sources.tableio import SnapshotStore


def test_commit_add_remove_replace(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "s"), spark)
    a = st.stage_dataframe(spark.range(10).selectExpr("id", "id * 2 as v"))
    v1 = st.commit(adds={"t": a})
    assert v1 == 1
    assert st.row_count("t") == 10
    b = st.stage_dataframe(spark.range(5).selectExpr("id + 100 as id", "id as v"))
    st.commit(adds={"t": b})
    assert st.row_count("t") == 15
    st.commit(removes={"t": a})
    assert st.row_count("t") == 5
    st.commit(replaces={"t": a})
    assert st.row_count("t") == 10
    # props persist + update
    st.commit(props={"round": 7})
    assert st.props["round"] == 7


def test_head_pruning_by_stats(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "s2"), spark)
    entries = []
    # three files with disjoint (priority, depth, docid) ranges
    for base in (0, 1000, 2000):
        df = spark.range(base, base + 100).selectExpr(
            "cast(id / 1000 as int) as priority",
            "cast(id % 5 as int) as depth",
            "id as docid").coalesce(1)
        entries += st.stage_dataframe(
            df, stats_cols=["priority", "depth", "docid"])
    assert len(entries) == 3
    st.commit(replaces={"frontier": entries})
    head, rest = st.files_overlapping_head(
        "frontier", ["priority", "depth", "docid"], limit_rows=50)
    # the first file (priority 0) alone covers 50 rows; others pruned
    assert sum(e["rows"] for e in head) == 100
    assert len(rest) == 2
    got = st.read("frontier", files=head)
    assert got.agg({"priority": "max"}).collect()[0][0] == 0


def test_gc_and_atomicity(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "s3"), spark)
    a = st.stage_dataframe(spark.range(3))
    st.commit(adds={"t": a})
    orphan = st.stage_dataframe(spark.range(4))  # staged, never committed
    assert st.row_count("t") == 3
    removed = st.gc_unreferenced()
    assert removed >= len(orphan)
    # committed data survives GC
    assert st.read("t").count() == 3
