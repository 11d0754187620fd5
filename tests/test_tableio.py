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


def test_merged_read_widens_types_and_backfills(spark, tmp_path):
    """merge_schema=True unions file generations: columns added later read
    as null in old files, and int columns widened to bigint by a newer
    release (fetch_log.process_seq, round 5) read as bigint throughout."""
    st = SnapshotStore(str(tmp_path / "w"), spark)
    old = st.stage_dataframe(spark.range(3).selectExpr(
        "id", "CAST(id AS INT) AS process_seq"))
    new = st.stage_dataframe(spark.range(3, 6).selectExpr(
        "id", "CAST(id * 10 AS BIGINT) AS process_seq",
        "CAST(id AS STRING) AS extra"))
    st.commit(adds={"log": old + new})
    df = st.read("log", merge_schema=True)
    assert dict(df.dtypes)["process_seq"] == "bigint"
    rows = {r.id: (r.process_seq, r.extra) for r in df.collect()}
    assert rows[2] == (2, None) and rows[5] == (50, "5")
    # incompatible (non-promotable) types still fail loudly
    bad = st.stage_dataframe(spark.range(1).selectExpr(
        "id", "CAST(id AS STRING) AS process_seq"))
    st.commit(adds={"log": bad})
    try:
        st.read("log", merge_schema=True).collect()
        raise AssertionError("expected ValueError for string vs bigint")
    except ValueError as e:
        assert "process_seq" in str(e)
