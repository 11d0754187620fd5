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
    UnsupportedCharsetError,
    charset_from_content_type,
    decode_content,
    extract_urls,
    has_binary_content,
    has_plain_text_content,
)
from ..functions.spans import body_text, candidates_from_canonical, link_hrefs
from ..functions.udfs import canonicalize_batch

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
            # Pass 1: junk-filter every HTML page's link spans (shared
            # link_hrefs kernel) into ONE flat batch of (href, page_url);
            # plain-text/binary pages are handled inline as before.
            html_pages = []          # (row, kinds, anchors, start, stop)
            flat_hrefs: list[str] = []
            flat_ctx: list[str] = []
            for r in pdf.itertuples(index=False):
                ctype = r.content_type
                spans = [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in (r.spans if r.spans is not None else [])
                ]
                if has_binary_content(ctype):
                    if not include_binary:
                        continue  # NotAllowedContent: no outlinks, no visit
                    # binary page: no outlinks (Tika path out of scope)
                elif has_plain_text_content(ctype):
                    data = getattr(r, "content_data", None)
                    if data is not None:
                        # X8: new String(contentData, charset from the
                        # Content-Type header) — Parser.java:79-82,
                        # Page.java:129-135. The engine pre-routes bad
                        # charsets to the error channel; guard anyway so
                        # direct library use on unfiltered pages degrades
                        # to "no outlinks" like fetchContent's
                        # catch(Exception), not an executor crash.
                        try:
                            charset = charset_from_content_type(ctype)
                        except UnsupportedCharsetError:
                            continue
                        text = decode_content(bytes(data), charset)
                    else:
                        text = body_text(spans)
                    for i, raw in enumerate(extract_urls(text)):
                        rows.append((raw, "", "", i, r.docid, r.url,
                                     r.seed_docid, r.depth, r.process_seq))
                else:
                    links = link_hrefs(spans)
                    start = len(flat_hrefs)
                    flat_hrefs.extend(h for _k, h, _a in links)
                    flat_ctx.extend(r.url for _ in links)
                    html_pages.append(
                        (r, [k for k, _h, _a in links],
                         [a for _k, _h, a in links], start, len(flat_hrefs)))
            # Batch canonicalize across ALL pages of the Arrow batch: the
            # _CANONICAL_FAST prescreen runs in C; only misses hit the
            # per-element kernel (was: one Python call per href —
            # Parser.java:146-150, the round-3 hot-path loop).
            if flat_hrefs:
                canon = canonicalize_batch(
                    pd.Series(flat_hrefs, dtype=object),
                    pd.Series(flat_ctx, dtype=object),
                ).to_numpy()
            else:
                canon = []
            # Pass 2: the reference's cap/dedup counting loop per page over
            # the precomputed canonical URLs (candidates_from_canonical).
            for r, kinds, anchors, start, stop in html_pages:
                for c in candidates_from_canonical(
                        zip(kinds, canon[start:stop], anchors), max_outlinks):
                    rows.append((c.url, c.tag, c.anchor, c.order, r.docid,
                                 r.url, r.seed_docid, r.depth, r.process_seq))
            yield pd.DataFrame(
                rows, columns=[f.name for f in CANDIDATE_SCHEMA.fields]
            )

    cols = ["url", "docid", "depth", "seed_docid", "process_seq",
            "content_type", "spans"]
    if "content_data" in fetched.columns:  # X8 raw-payload pages
        cols.append("content_data")
    return fetched.select(*cols).mapInPandas(gen, CANDIDATE_SCHEMA)
