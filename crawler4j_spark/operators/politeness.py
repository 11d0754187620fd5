"""Politeness scheduling: per-host fetch slots as a window computation.

The reference serializes fetches per host with a mutex-guarded
``nextFetchTimes`` map and a greedy best-URL pick
(``fetcher/PageFetcher.java:173-261``). With zero-duration simulated fetches
and a single claim batch, that greedy loop is order-equivalent to sorting by
``(effective_time, priority, depth, docid)`` where

    effective_time(host, slot k) = max(carry[host] - clock, 0) + (k-1)*delay

— each host's URLs occupy politeness slots spaced ``delay`` apart, starting
at the host's carried-over next-allowed time; URLs on distinct hosts
interleave by time; ties resolve in frontier-key order exactly as the
greedy's first-in-list rule does. This turns the reference's inherently
sequential loop into a shuffle-free window over the claimed batch (O3/O4,
SURVEY §2.5) — the parity tests against the simulator validate the
equivalence empirically on skewed corpora.

``carry`` is the tiny per-host state table (#distinct hosts rows — broadcast
join); the new carry and clock advance are produced alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .mint import ordered_rank

__all__ = ["assign_slots", "new_host_carry"]

KEY_COLS = ["priority", "depth_key", "docid"]


def assign_slots(
    claimed: DataFrame,        # url, docid, priority, depth, ... + host
    host_state: DataFrame | None,  # (host, next_time) carried across rounds
    clock: int,
    politeness_ms: int,
    dense_seq_distributed: bool | None = None,
    persisted_out: list | None = None,
) -> DataFrame:
    """Adds ``slot``, ``eff_time`` and the round-total ``process_seq``
    ordering column to the claimed batch.

    ``dense_seq_distributed=None`` (the default) auto-selects: the
    distributed two-stage rank whenever ``politeness_ms > 0`` (the bucket
    formula needs the slot spacing), so the default round plan carries no
    single-partition exchange at ANY claim-batch size; the single-window
    form only as the ``politeness_ms == 0`` fallback (and on explicit
    ``False`` for A/B parity checks). Both paths order by
    ``(eff_time, priority, depth_key, docid)`` and produce the identical
    dense ``process_seq`` — equality is asserted in tests/test_plan_audit.py
    and the engine parity suite runs entirely through the distributed
    path."""
    df = claimed.withColumn("depth_key", F.least(F.col("depth"), F.lit(127)))
    if host_state is not None:
        df = df.join(F.broadcast(host_state), "host", "left")
        df = df.withColumn(
            "host_start",
            F.greatest(F.coalesce(F.col("next_time") - F.lit(clock), F.lit(0)),
                       F.lit(0)),
        ).drop("next_time")
    else:
        df = df.withColumn("host_start", F.lit(0))

    w_host = Window.partitionBy("host").orderBy(*KEY_COLS)
    df = df.withColumn("slot", F.row_number().over(w_host))
    df = df.withColumn(
        "eff_time",
        F.col("host_start") + (F.col("slot") - F.lit(1)) * F.lit(politeness_ms),
    )
    if dense_seq_distributed is None:
        dense_seq_distributed = politeness_ms > 0
    if dense_seq_distributed and politeness_ms > 0:
        # scale path (the default): floor(eff_time/delay) is order-consistent
        # (floor is monotone in eff_time), so the global process order is
        # computed as a distributed two-stage rank — no single-partition
        # window. Bucket sizes ≈ #hosts each (one slot per host per bucket):
        # well balanced.
        df = ordered_rank(
            df, F.floor(F.col("eff_time") / F.lit(politeness_ms)),
            ["eff_time"] + KEY_COLS, "process_seq",
            persisted_out=persisted_out)
        return df.drop("depth_key")
    w_all = Window.orderBy("eff_time", *KEY_COLS)
    # fallback/A-B path: a single-partition window over the claim batch
    # (≤ round_size rows, not the 10^10 frontier). Cast to long so both
    # paths write the same fetch_log column type (the merged read widens
    # pre-round-5 int files).
    return df.withColumn(
        "process_seq", F.row_number().over(w_all).cast("long")
    ).drop("depth_key")


def new_host_carry(slotted: DataFrame, clock: int, politeness_ms: int) -> DataFrame:
    """Per-host carried next-allowed fetch time after this round:
    clock + host_start + n_slots * delay  (PageFetcher.java:246: the entry is
    written even for the first, undelayed fetch)."""
    return (
        slotted.groupBy("host")
        .agg(
            F.max("slot").alias("n_slots"),
            F.first("host_start").alias("host_start"),
        )
        .select(
            "host",
            (
                F.lit(clock)
                + F.col("host_start")
                + F.col("n_slots") * F.lit(politeness_ms)
            ).alias("next_time"),
        )
    )
