"""Parse stage: fetched pages → ordered outlink candidates (Arrow-batched).

Replaces the reference's per-thread ``Parser.parse`` + outlink loop
(``parser/Parser.java:59-175``, ``crawler/WebCrawler.java:464-479``) with one
``mapInPandas`` pass over the fetched-page batch. The per-page candidate
extraction calls the same kernels as the reference simulator
(``functions/spans.outlink_candidates``, ``functions/netkit.extract_urls``),
so engine and spec cannot drift.

Input rows (one per fetched 200-page): url, docid, depth, seed_docid,
process_seq, content_type, spans.
Output rows (one per within-page-unique candidate): parent fields +
candidate url/tag/anchor + ``within_order`` (first-occurrence document
order) — the second half of the docid mint key (J1, SURVEY §7).

Plain-text pages emit raw regex-extracted URLs (NOT canonicalized —
Parser.java:76-91); HTML pages emit canonicalized spans-derived candidates.
Binary pages emit nothing (Tika path out of scope, SURVEY §"out of scope").
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.netkit import (
    charset_from_content_type,
    decode_content,
    extract_urls,
    has_binary_content,
    has_plain_text_content,
)
from ..functions.spans import body_text, outlink_candidates

__all__ = ["extract_candidates", "CANDIDATE_SCHEMA"]

CANDIDATE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("tag", StringType()),
    StructField("anchor", StringType()),
    StructField("within_order", IntegerType()),
    StructField("parent_docid", LongType()),
    StructField("parent_url", StringType()),
    StructField("seed_docid", LongType()),
    StructField("parent_depth", IntegerType()),
    StructField("process_seq", LongType()),
])


def extract_candidates(
    fetched: DataFrame,
    max_outlinks: int,
    include_binary: bool,
) -> DataFrame:
    """Candidates of all 200-status pages, in mint order within each page."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                ctype = r.content_type
                spans = [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in (r.spans if r.spans is not None else [])
                ]
                cands: list[tuple[str, str, str, int]] = []
                if has_binary_content(ctype):
                    if not include_binary:
                        continue  # NotAllowedContent: no outlinks, no visit
                    # binary page: no outlinks (Tika path out of scope)
                elif has_plain_text_content(ctype):
                    data = getattr(r, "content_data", None)
                    if data is not None:
                        # X8: new String(contentData, charset from the
                        # Content-Type header) — Parser.java:79-82,
                        # Page.java:129-135
                        text = decode_content(
                            bytes(data), charset_from_content_type(ctype))
                    else:
                        text = body_text(spans)
                    for i, raw in enumerate(extract_urls(text)):
                        cands.append((raw, "", "", i))
                else:
                    for c in outlink_candidates(r.url, spans, max_outlinks):
                        cands.append((c.url, c.tag, c.anchor, c.order))
                for url, tag, anchor, order in cands:
                    rows.append((url, tag, anchor, order, r.docid, r.url,
                                 r.seed_docid, r.depth, r.process_seq))
            yield pd.DataFrame(
                rows, columns=[f.name for f in CANDIDATE_SCHEMA.fields]
            )

    cols = ["url", "docid", "depth", "seed_docid", "process_seq",
            "content_type", "spans"]
    if "content_data" in fetched.columns:  # X8 raw-payload pages
        cols.append("content_data")
    return fetched.select(*cols).mapInPandas(gen, CANDIDATE_SCHEMA)
