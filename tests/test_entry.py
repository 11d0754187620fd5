"""Driver-contract harness: runs every queries() entry on Spark AND its
oracle_sql() on DuckDB over the same parquet (sf0.001 for speed; the driver
uses sf0.01) and compares row count, column names, and order-insensitive
values — the same gate CORRECTNESS_r{N}.json records."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_run(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def normalize(df):
    """Order-insensitive canonical form: sort columns by name, round floats,
    stringify, sort rows."""
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return cols, sorted(out)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


def test_every_query_has_impl():
    assert len(ALL_QUERIES) >= 30
    for name in ORACLES:
        assert name in ALL_QUERIES


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_against_oracle(spark, name):
    fn = ALL_QUERIES[name]
    sdf = fn(spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(sdf) >= 0
        assert len(sdf.columns) > 0
        return
    ddf = duck_run(ORACLES[name])
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} vs {len(ddf)}"
    scols, srows = normalize(sdf)
    dcols, drows = normalize(ddf)
    assert scols == dcols, f"{name}: columns {scols} vs {dcols}"
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.slow
def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["docid", "priority", "depth", "host", "slot",
                          "eff_time", "process_seq", "minted_docid"]
