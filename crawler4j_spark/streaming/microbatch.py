"""Micro-batch crawl stream: the reference's continuous loop as a
Structured-Streaming-style driver (SURVEY §2.8).

The reference crawl is a continuous loop — threads claim 25-URL batches until
a monitor sees an empty queue, waits, double-checks, and shuts down
(``CrawlController.java:172-247``, ``Frontier.java:105-128``). The frontier
is both source and sink of the same loop, which true Structured Streaming
does not model (self-feedback); the engine therefore drives rounds with a
``foreachBatch``-style loop whose trigger/termination semantics mirror the
monitor thread:

* trigger: immediately after the previous round commits (Trigger.Continuous
  analog) or on an interval;
* termination: a round that claims 0 and appends 0 — the monitor's
  empty-queue double-check is inherent (claim and append counts are both
  known at commit time);
* exactly-once: each round is one atomic snapshot commit; the checkpoint is
  the snapshot pointer (sources/tableio.py), giving the same resume
  guarantee as a Structured Streaming checkpoint directory.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Optional

from ..plans.engine import CrawlEngine

__all__ = ["CrawlStream"]


class CrawlStream:
    """foreachBatch-style wrapper: iterate rounds, invoke sinks per batch."""

    def __init__(
        self,
        engine: CrawlEngine,
        on_batch: Optional[Callable[[int, dict], None]] = None,
        trigger_interval_s: float = 0.0,
        max_rounds: int = 1_000_000,
    ) -> None:
        self.engine = engine
        self.on_batch = on_batch
        self.trigger_interval_s = trigger_interval_s
        self.max_rounds = max_rounds

    def rounds(self) -> Iterator[dict]:
        """Yield per-round metrics until the frontier drains."""
        n = 0
        while n < self.max_rounds:
            t0 = time.time()
            metrics = self.engine.run_round()
            if not metrics:
                # empty claim + empty append ⇒ the monitor's double-check:
                # nothing in flight can re-fill the queue — terminate
                return
            n += 1
            if self.on_batch is not None:
                self.on_batch(metrics["round"], metrics)
            yield metrics
            if metrics["pending"] == 0:
                return
            sleep = self.trigger_interval_s - (time.time() - t0)
            if sleep > 0:
                time.sleep(sleep)

    def run(self) -> list[dict]:
        return list(self.rounds())
