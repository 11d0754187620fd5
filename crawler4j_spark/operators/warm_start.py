"""Distributed warm-start registration (S2 at 10^8-seed scale).

The reference's warm start (``CrawlController.addSeenUrl``,
crawler/CrawlController.java:388-401) walks the batch sequentially: a pair
(url, docid) is registered iff the url was not already seen/accepted AND
docid is strictly greater than the running docid high-water mark; every
acceptance raises the mark. ``engine.add_seen_urls`` reproduces that walk
driver-side — exact but O(|batch|) driver memory. This module is the
distributed equivalent for dump-scale batches.

Why it distributes: among url-eligible rows, the sequential rule
"accept iff docid > running max of accepted docids" is equivalent to
"accept iff docid > running max of ALL prior eligible docids" (rejected
rows never exceed the mark at their position), i.e. a *record scan* —
computable with :func:`operators.mint.running_max_before` (per-bucket
windows + P-row prefix maxima; no global sort). The one sequential
dependency left is url feedback: a row docid-REJECTED leaves its url
unregistered, so a LATER duplicate of that url may be accepted. Such
"freeing events" require re-evaluating everything after them, so the
resolver confirms decisions prefix-wise up to the first freeing event per
round and iterates. Rounds = 1 + number of out-of-order duplicate-url
events in the batch — exactly 1 for any url-unique or docid-sorted dump
(the realistic warm-start inputs). Each round is two keyed shuffles plus
three scalar/P-row actions; the driver holds only scalars.

Equivalence to the sequential walk is property-tested
(tests/test_warm_start.py) including the revocation case where a freeing
event flips a later provisional acceptance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .mint import running_max_before

__all__ = ["resolve_warm_batch"]

#: Each round resolves at least one freeing event (an out-of-order
#: duplicate-url pair) plus the whole prefix before it; hitting this cap
#: means the batch is adversarially interleaved — raise rather than spin.
MAX_ROUNDS = 200


def resolve_warm_batch(
    df: DataFrame,          # (ord long, url string, docid long), ord unique
    hwm0: int,
    seen_df: DataFrame | None = None,
    n_buckets: int = 32,
) -> tuple[DataFrame, int]:
    """Resolve a warm-start batch to the exact rows the sequential walk
    would register. Returns ``(accepted_df(ord, url, docid), new_hwm)``.
    ``ord`` is the arrival order (use docid order for dumps) and must be
    unique; ``seen_df`` needs a ``url`` column."""
    spark = df.sparkSession
    empty = spark.createDataFrame([], "ord long, url string, docid long")
    pending = df.select("ord", "url", "docid")
    # ord ties would make every window below rank nondeterministically —
    # fail loudly instead (one bounded action against the batch).
    dup = pending.groupBy("ord").count().filter(F.col("count") > 1).limit(1)
    clash = dup.collect()
    if clash:
        raise ValueError(
            f"resolve_warm_batch: ord values must be unique; "
            f"ord={clash[0]['ord']} appears {clash[0]['count']} times")
    if seen_df is not None:
        pending = pending.join(
            seen_df.select("url"), "url", "left_anti")
    pending = pending.localCheckpoint()
    accepted_parts: list[DataFrame] = []
    hwm = hwm0

    for _ in range(MAX_ROUNDS):
        if pending.isEmpty():
            break
        w_first = Window.partitionBy("url").orderBy("ord")
        marked = pending.withColumn("_occ", F.row_number().over(w_first))
        eligible = marked.filter(F.col("_occ") == 1).drop("_occ")
        waiting = marked.filter(F.col("_occ") > 1).drop("_occ")

        # running_max_before returns an eagerly checkpointed frame (and
        # frees its internal cache), so the cheap _acc arithmetic on top
        # needs no second checkpoint here.
        decided = running_max_before(
            eligible, "ord", "docid", "_pm", n_buckets=n_buckets
        ).withColumn(
            "_acc",
            (F.col("docid") > F.lit(hwm))
            & (F.col("_pm").isNull() | (F.col("docid") > F.col("_pm"))),
        )

        # First freeing event: a docid-rejected first occurrence whose url
        # has a later pending occurrence — everything after it must be
        # re-evaluated with that url unblocked.
        f = (
            decided.filter(~F.col("_acc"))
            .join(waiting.select("url").distinct(), "url", "left_semi")
            .agg(F.min("ord")).first()[0]
        )
        if f is None:
            conf_acc = decided.filter(F.col("_acc")) \
                .select("ord", "url", "docid").localCheckpoint()
            pending = empty
        else:
            conf_acc = decided.filter(F.col("_acc") & (F.col("ord") < f)) \
                .select("ord", "url", "docid").localCheckpoint()
            # Rows after the freeing event go back to pending; duplicates
            # of urls confirmed-accepted this round can never be accepted
            # (url-dup by spec) and are dropped here.
            pending = (
                eligible.filter(F.col("ord") > f)
                .select("ord", "url", "docid")
                .union(waiting.filter(F.col("ord") > f)
                       .select("ord", "url", "docid"))
                .join(conf_acc.select("url"), "url", "left_anti")
                .localCheckpoint()
            )
        accepted_parts.append(conf_acc)
        mx = conf_acc.agg(F.max("docid")).first()[0]
        if mx is not None:
            hwm = max(hwm, int(mx))
        if f is None:
            break
    else:
        raise RuntimeError(
            f"resolve_warm_batch: {MAX_ROUNDS} rounds without a fixpoint "
            "(adversarially interleaved duplicate urls)")

    accepted = empty
    for part in accepted_parts:
        accepted = accepted.union(part)
    return accepted, hwm
