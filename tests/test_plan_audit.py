"""Physical-plan scale-guard: every registered query's plan must stay free
of the shapes that kill a 100 TB run — cartesian products, nested-loop
joins with a non-tiny build side, and single-partition exchanges — except
where a bounded input makes the shape deliberate (allowlisted below with
the justification).

Planning-only (no job runs): a regression here fails in seconds, before a
bench ever sees the slow plan.
"""

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# BroadcastNestedLoopJoin is the *intended* shape where the build side is a
# single broadcast row (the query vector) or a k-row centroid/plane table:
# every input row pairs with the tiny broadcast side, no shuffle, and the
# "nested loop" degenerates to one pass. Anything else showing up here is a
# regression.
NESTED_LOOP_OK = {
    "embedding_topk",       # 1-row query vector broadcast
    "embedding_neardup",    # bounded-range candidate pairing (post-LSH check)
    "ann_lsh_buckets",      # 8-row hyperplane table broadcast
    "ann_ivf_assign",       # k-row centroid table broadcast
    "ann_ivf_probe",        # k-row centroid + 1-row probe vector
    "ann_ivf_probe_multi",  # k-row centroid + 1-row probe + 3-row cell set
    "ann_kmeans_step",      # k-row centroid table broadcast (assignment half)
    "quality_perplexity_bucket",  # 1-row corpus-total broadcast
}

# Single-partition exchanges allowed only where the partition is bounded by
# construction, never frontier/corpus-scale.
SINGLE_PARTITION_OK = {
    # arrival-order docid over ONE seed registration batch (bounded by the
    # caller's seed list; the engine's unbounded path is the distributed
    # mint, operators/mint.py, which this demo deliberately mirrors in its
    # reference-sequential form)
    "seed_pipeline",
    # the corpus-total scalar: partial sums map-side, the single partition
    # receives exactly one row per upstream partition (bounded by P, not
    # by data volume) and emits the 1-row broadcast total
    "quality_perplexity_bucket",
    # r6: the 8 hyperplanes are collect_list'd into ONE broadcast row
    # (replacing the 8x crossJoin row blowup + groupBy(vec_id) exchange);
    # the single partition receives at most 8 plane structs per upstream
    # partition — bounded by the plane count, never by data volume
    "ann_lsh_buckets",
}


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_plan_has_no_scale_killers(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()

    assert "CartesianProduct" not in plan, f"{name}: cartesian product"

    if "BroadcastNestedLoopJoin" in plan:
        assert name in NESTED_LOOP_OK, (
            f"{name}: BroadcastNestedLoopJoin outside the tiny-broadcast "
            f"allowlist")

    n_single = len(re.findall(r"Exchange SinglePartition", plan))
    if n_single:
        assert name in SINGLE_PARTITION_OK, (
            f"{name}: {n_single} single-partition exchange(s) in an "
            f"unbounded query")


def _claim_batch(spark):
    """A claimed-batch-shaped frame (the engine's claim-stage input)."""
    from crawler4j_spark.operators.analytics import _frontier

    return (_frontier(spark, SF_DIR)
            .withColumn("url", F.concat(F.lit("http://"), F.col("host"),
                                        F.lit("/p"), F.col("docid"))))


def test_engine_claim_stage_default_plan_is_distributed(spark):
    """The DEFAULT engine politeness/process-order stage must have no
    single-partition exchange — the distributed two-stage rank is the
    default path whenever politeness_ms > 0 (EngineConfig
    dense_seq_distributed=None auto-select)."""
    from crawler4j_spark.operators.politeness import assign_slots

    slotted = assign_slots(_claim_batch(spark), None, 0, 200)
    plan = slotted._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, (
        "default claim-stage plan has a single-partition exchange:\n" + plan)
    assert "CartesianProduct" not in plan


def test_assign_slots_distributed_equals_window(spark):
    """Distributed two-stage rank == single-partition window, row for row
    (process_seq, slot, eff_time), on a skewed multi-host batch with a
    carried host_state."""
    from crawler4j_spark.operators.politeness import assign_slots

    batch = _claim_batch(spark).limit(5000)
    host_state = spark.createDataFrame(
        [(f"h{i}", 1000 + 37 * i) for i in range(0, 40, 3)],
        "host string, next_time long")
    cols = ["docid", "host", "slot", "eff_time", "process_seq"]
    dist = assign_slots(batch, host_state, 900, 200,
                        dense_seq_distributed=True).select(cols)
    win = assign_slots(batch, host_state, 900, 200,
                       dense_seq_distributed=False).select(cols)
    assert sorted(map(tuple, dist.collect())) == \
        sorted(map(tuple, win.collect()))
