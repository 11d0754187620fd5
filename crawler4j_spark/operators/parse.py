"""Parse stage: fetched pages → ordered outlink candidates.

Replaces the reference's per-thread ``Parser.parse`` + outlink loop
(``parser/Parser.java:59-175``, ``crawler/WebCrawler.java:464-479``) with a
DataFrame-native pipeline (round 4; rounds 1-3 ran a per-row Python loop
inside one mapInPandas — the last Python-rate stage on the hot path):

* HTML pages: ``posexplode(spans)`` + LINK_KINDS/null filtering run
  JVM-side; ONE Arrow-batched pandas UDF (``outlink_canonical_udf``) does
  the per-href Python work — strip + junk filter + canonicalize, with the
  C-speed ``_CANONICAL_FAST`` prescreen; the reference's outlink-cap
  counting (``urlCount++; if (urlCount > max) break;`` — the max+1
  off-by-one, Parser.java:152-155), within-page first-occurrence dedup and
  ``within_order`` assignment are window functions over ONE hash shuffle on
  the page docid. Whole-stage codegen covers everything but the UDF.
* plain-text pages: the regex URL extraction (Parser.java:76-91, raw — NOT
  canonicalized) needs the Python kernel; it runs in a mapInPandas over
  only the text-page subset.
* binary pages: with ``process_binary`` (processBinaryContentInCrawling,
  Parser.java:61-75) the raw payload is rendered to text with the
  Tika-analog ``binary_to_text`` and outlinks come from the SAME
  ``extract_urls`` regex as plain text (raw, NOT canonicalized) — a
  mapInPandas over only the binary subset. With it off, the reference
  parses ``"<html></html>"`` instead (Parser.java:67), which the regex
  never matches → no outlinks, so those pages are simply dropped here;
  when ``include_binary`` is false they are NotAllowedContent and emit
  nothing either way.

The reference simulator keeps using the pure-Python kernels
(``functions/spans.outlink_candidates``); the engine↔simulator parity
suite (tests/test_engine_parity.py) is the proof the two formulations
agree. The junk-filter/cap/dedup predicates here mirror
``functions/spans.link_hrefs``/``candidates_from_canonical`` line for
line; the strip/lower/contains pieces run with exact Python string
semantics inside the pandas UDF, not as JVM approximations.

Input rows (one per fetched 200-page): url, docid, depth, seed_docid,
process_seq, content_type, spans.
Output rows (one per within-page-unique candidate): parent fields +
candidate url/tag/anchor + ``within_order`` (first-occurrence document
order) — the second half of the docid mint key (J1, SURVEY §7).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.netkit import (
    UnsupportedCharsetError,
    binary_to_text,
    charset_from_content_type,
    decode_content,
    extract_urls,
)
from ..functions.spans import LINK_KINDS, body_text
from ..functions.udfs import outlink_canonical_udf

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

_PARENT_COLS = ["url", "docid", "depth", "seed_docid", "process_seq"]

# content-type routing, column form of netkit.has_binary_content /
# has_plain_text_content (X3); built lazily — Columns need a live session
def _is_binary():
    ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
    return ct.rlike("image|audio|video|application")


def _is_plain_text():
    ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
    return ct.contains("text") & ~ct.contains("html")


def _as_candidates(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("cand_url").alias("url"),
        "tag", "anchor",
        F.col("within_order").cast("int").alias("within_order"),
        F.col("docid").alias("parent_docid"),
        F.col("url").alias("parent_url"),
        "seed_docid",
        F.col("depth").cast("int").alias("parent_depth"),
        "process_seq",
    )


def _html_candidates(pages: DataFrame, max_outlinks: int) -> DataFrame:
    """The hot path, JVM-side except one vectorized canonicalize UDF."""
    spans = (
        pages
        .select(*_PARENT_COLS,
                F.posexplode("spans").alias("pos", "span"))
        .select(*_PARENT_COLS, "pos",
                F.col("span.kind").alias("kind"),
                F.col("span.text").alias("text"),
                F.col("span.media_ref").alias("media_ref"),
                F.col("span.offset").alias("offset"))
        .filter(F.col("kind").isin(list(LINK_KINDS))
                & F.col("media_ref").isNotNull())
    )
    # strip + junk + canonicalize in one Arrow batch; NULL = skipped row
    # (junk or canonicalize failure — neither counts toward the cap)
    cands = spans.withColumn(
        "cand_url", outlink_canonical_udf(F.col("media_ref"), F.col("url")))

    # Document order within a page = (offset, pos): the kernel's
    # sorted(key=offset) is a STABLE sort, so array position breaks ties.
    # All three windows share one hash partitioning on the page docid —
    # one shuffle, bounded by the round's candidate count.
    order = [F.col("offset"), F.col("pos")]
    w_cum = (Window.partitionBy("docid").orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # count() skips nulls: cum == the reference's urlCount AFTER this row.
    # Keep rows with cum <= max+1 — the row reaching max+1 is processed and
    # THEN the loop breaks (the reference's off-by-one).
    capped = (
        cands
        .withColumn("cum", F.count("cand_url").over(w_cum))
        .filter(F.col("cand_url").isNotNull()
                & (F.col("cum") <= max_outlinks + 1))
    )
    w_first = Window.partitionBy("docid", "cand_url").orderBy(*order)
    w_order = Window.partitionBy("docid").orderBy(*order)
    deduped = (
        capped
        .withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .withColumn("within_order", F.row_number().over(w_order) - 1)
        .withColumn("tag", F.col("kind"))
        .withColumn("anchor", F.coalesce(F.col("text"), F.lit("")))
    )
    return _as_candidates(deduped)


def _regex_candidates(pages: DataFrame, text_of_row) -> DataFrame:
    """Raw ``extract_urls`` candidates (NOT canonicalized) over a page
    subset; ``text_of_row(row, has_data) -> str | None`` produces the text
    to scan (None skips the page). Shared by the plain-text and binary
    branches — both end at Net.extractUrls in the reference
    (Parser.java:74, 84)."""
    has_data = "content_data" in pages.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["cand_url", "tag", "anchor", "within_order", "docid",
                "url", "seed_docid", "depth", "process_seq"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                text = text_of_row(r, has_data)
                if text is None:
                    continue
                for i, raw in enumerate(extract_urls(text)):
                    rows.append((raw, "", "", i, r.docid, r.url,
                                 r.seed_docid, r.depth, r.process_seq))
            yield pd.DataFrame(rows, columns=cols)

    schema = StructType([
        StructField("cand_url", StringType()),
        StructField("tag", StringType()),
        StructField("anchor", StringType()),
        StructField("within_order", IntegerType()),
        StructField("docid", LongType()),
        StructField("url", StringType()),
        StructField("seed_docid", LongType()),
        StructField("depth", IntegerType()),
        StructField("process_seq", LongType()),
    ])
    cols = [*_PARENT_COLS, "content_type", "spans"]
    if has_data:
        cols.append("content_data")
    return _as_candidates(pages.select(*cols).mapInPandas(gen, schema))


def _text_candidates(pages: DataFrame) -> DataFrame:
    """Plain-text pages: raw regex URL extraction (Parser.java:76-91) via
    the Python kernel, over the text subset only."""

    def text_of_row(r, has_data):
        data = getattr(r, "content_data", None) if has_data else None
        if data is not None:
            # X8: new String(contentData, charset from the Content-Type
            # header) — Parser.java:79-82, Page.java:129-135. The engine
            # pre-routes bad charsets to the error channel; guard anyway so
            # direct library use degrades to "no outlinks" like
            # fetchContent's catch(Exception), not an executor crash.
            try:
                charset = charset_from_content_type(r.content_type)
            except UnsupportedCharsetError:
                return None
            return decode_content(bytes(data), charset)
        return body_text([
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in (r.spans if r.spans is not None else [])
        ])

    return _regex_candidates(pages, text_of_row)


def _binary_candidates(pages: DataFrame) -> DataFrame:
    """Binary pages under processBinaryContentInCrawling
    (Parser.java:61-75): Tika-analog text rendering (``binary_to_text``)
    then the same raw regex extraction; pages with no payload behave like
    a failed Tika parse (html null → no outlinks)."""

    def text_of_row(r, has_data):
        data = getattr(r, "content_data", None) if has_data else None
        if data is None:
            return None
        return binary_to_text(bytes(data))

    return _regex_candidates(pages, text_of_row)


def extract_candidates(
    fetched: DataFrame,
    max_outlinks: int,
    include_binary: bool,
    process_binary: bool = False,
) -> DataFrame:
    """Candidates of all 200-status pages, in mint order within each page.

    ``include_binary`` gates the VISIT of binary pages (handled in the
    fetch log); ``process_binary`` (processBinaryContentInCrawling) gates
    whether visited binary pages also contribute outlinks via the
    Tika-analog rendering (Parser.java:61-75). With it off the reference
    extracts from ``"<html></html>"`` — zero matches — so binary pages are
    dropped from this stage entirely, keeping the default plan free of the
    extra mapInPandas branch."""
    cols = [*_PARENT_COLS, "content_type", "spans"]
    if "content_data" in fetched.columns:  # X8 raw-payload pages
        cols.append("content_data")
    base = fetched.select(*cols)
    html = base.filter(~_is_binary() & ~_is_plain_text())
    text = base.filter(~_is_binary() & _is_plain_text())
    out = _html_candidates(html, max_outlinks).unionByName(
        _text_candidates(text))
    if include_binary and process_binary:
        out = out.unionByName(_binary_candidates(base.filter(_is_binary())))
    return out
