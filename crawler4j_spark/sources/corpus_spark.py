"""Spark-parallel deterministic corpus generator (bench scale).

The pure-Python generator (``sources/corpus.py``) builds the small parity
corpora; benchmarking at 10^5-10^7 URLs needs generation to be parallel.
This generator is *per-row deterministic*: page ``i``'s content depends only
on ``(seed, i)`` via a dedicated ``random.Random`` instance, so the output
is identical for any partitioning or parallelism — the same property the
engine's docid mint relies on.

Layout math mirrors the small generator: Zipf host sizes (one hot host),
page types by fixed fractions, same-host + cross-host links, /private/
paths for robots gating, nested paths, trap queries on some hrefs.
"""

from __future__ import annotations

import bisect
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["generate_corpus_spark", "bench_seeds", "bench_robots"]

CORPUS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]))),
    StructField("status_code", IntegerType()),
    StructField("redirect_to", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    # X8: raw undecoded payload; None for span-modeled pages
    StructField("content_data", BinaryType()),
])

_WORDS = (
    "spark frontier crawl queue shuffle partition bloom filter seen docid "
    "politeness robots depth priority anchor media span fetch parse link"
).split()


def _host_bounds(n_hosts: int, n_pages: int, s: float) -> list[int]:
    weights = [1.0 / (i + 1) ** s for i in range(n_hosts)]
    total = sum(weights)
    counts = [max(2, int(round(n_pages * w / total))) for w in weights]
    counts[0] += n_pages - sum(counts)
    bounds, acc = [], 0
    for c in counts:
        bounds.append(acc)
        acc += c
    bounds.append(acc)  # == adjusted n_pages
    return bounds


def _url_for(i: int, bounds: list[int]) -> tuple[str, int]:
    h = bisect.bisect_right(bounds, i) - 1
    j = i - bounds[h]
    if j % 9 == 4:
        path = f"/private/p{j}.html"
    elif j % 3 == 0:
        path = f"/a/b/p{j}.html"
    else:
        path = f"/p{j}.html"
    return f"http://host{h}.example.com{path}", h


def generate_corpus_spark(
    spark: SparkSession,
    n_pages: int = 1_000_000,
    n_hosts: int = 256,
    seed: int = 42,
    fanout: int = 10,
    zipf_s: float = 1.1,
    cross_host: float = 0.25,
) -> DataFrame:
    bounds = _host_bounds(n_hosts, n_pages, zipf_s)
    total = bounds[-1]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = random.Random((seed << 34) ^ i)
                url, h = _url_for(i, bounds)
                r = rng.random()
                if r < 0.05:  # redirect
                    target, _ = _url_for(rng.randrange(total), bounds)
                    rows.append((url, [], rng.choice([301, 302, 307]),
                                 target, "text/html", 0, None))
                    continue
                if r < 0.10:  # binary
                    rows.append((url, [],
                                 200, None,
                                 rng.choice(["image/png", "application/pdf"]),
                                 rng.randrange(1000, 50_000), None))
                    continue
                if r < 0.11:  # too big
                    rows.append((url, [], 200, None,
                                 "text/html; charset=UTF-8", 2_000_000, None))
                    continue
                # html page with interleaved spans
                spans = []
                off = 0
                spans.append({"kind": "text",
                              "text": " ".join(rng.sample(_WORDS, 4)) + " ",
                              "media_ref": None, "offset": off})
                off += 1
                for _ in range(fanout):
                    if rng.random() < cross_host:
                        t = rng.randrange(total)
                    else:
                        t = rng.randrange(bounds[h], bounds[h + 1])
                    href, _ = _url_for(t, bounds)
                    if rng.random() < 0.10:
                        href += "?b=2&a=1&jsessionid=Z"
                    kind = rng.choices(
                        ["a", "img", "iframe", "link", "meta"],
                        weights=[70, 15, 5, 5, 5])[0]
                    anchor = (" ".join(rng.sample(_WORDS, 2))
                              if kind in ("a", "link") else None)
                    spans.append({"kind": kind, "text": anchor,
                                  "media_ref": href, "offset": off})
                    off += 1
                rows.append((url, spans, 200, None,
                             "text/html; charset=UTF-8", 64 * len(spans),
                             None))
            yield pd.DataFrame(
                rows, columns=["doc_id", "spans", "status_code",
                               "redirect_to", "content_type",
                               "content_length", "content_data"])

    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    return (
        spark.range(0, total, numPartitions=n_parts)
        .mapInPandas(gen, CORPUS_SCHEMA)
    )


def bench_robots(spark: SparkSession, n_hosts: int) -> DataFrame:
    rows = []
    for h in range(n_hosts):
        host = f"host{h}.example.com"
        if h % 5 == 3:
            continue
        if h % 2 == 0:
            rows.append((host,
                         "User-agent: crawler4j\nDisallow: /private/\n"))
        else:
            rows.append((host, "User-agent: *\nDisallow: /\n"))  # fork no-op
    return spark.createDataFrame(rows, "host string, body string")


def bench_seeds(n_pages: int, n_hosts: int, zipf_s: float,
                n_seeds: int) -> list[dict]:
    bounds = _host_bounds(n_hosts, n_pages, zipf_s)
    total = bounds[-1]
    step = max(1, total // n_seeds)
    return [
        {"url": _url_for(i, bounds)[0], "priority": 0, "doc_id_override": None}
        for i in range(0, total, step)
    ]
