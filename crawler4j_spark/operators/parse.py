"""Parse stage: fetched pages → ordered outlink candidates.

Replaces the reference's per-thread ``Parser.parse`` + outlink loop
(``parser/Parser.java:59-175``, ``crawler/WebCrawler.java:464-479``):

* HTML pages: ONE shuffle-free ``mapInArrow`` with every kernel
  vectorized (see ``_html_candidates``). A page's spans arrive grouped in
  its row, so per-page cap/dedup/order need no exchange; the spans
  ListArray flattens to per-field Arrow arrays, the cap
  (``urlCount++; if (urlCount > max) break;`` — the max+1 off-by-one,
  Parser.java:152-155) is a groupby-cumsum, dedup/within_order are
  ``duplicated``/``cumcount``, and the only per-element Python is the
  canonicalize slow path behind the ``_CANONICAL_FAST`` prescreen.
  (History: rounds 1-3 ran a per-row Python loop; round 5 briefly used
  posexplode + windows over a docid hash shuffle, which re-grouped rows
  that were never ungrouped and measured ~75% slower at the default
  bench spec.)
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
semantics inside the Arrow batch kernel, not as JVM approximations.

Input rows (one per fetched 200-page): url, docid, depth, seed_docid,
process_seq, content_type, spans.
Output rows (one per within-page-unique candidate): parent fields +
candidate url/tag/anchor + ``within_order`` (first-occurrence document
order) — the second half of the docid mint key (J1, SURVEY §7).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
from ..functions.udfs import outlink_canonical_batch

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


_CANDIDATE_ARROW_SCHEMA = None  # built lazily (pyarrow import)


def _candidate_arrow_schema():
    import pyarrow as pa

    global _CANDIDATE_ARROW_SCHEMA
    if _CANDIDATE_ARROW_SCHEMA is None:
        _CANDIDATE_ARROW_SCHEMA = pa.schema([
            ("url", pa.string()),
            ("tag", pa.string()),
            ("anchor", pa.string()),
            ("within_order", pa.int32()),
            ("parent_docid", pa.int64()),
            ("parent_url", pa.string()),
            ("seed_docid", pa.int64()),
            ("parent_depth", pa.int32()),
            ("process_seq", pa.int64()),
        ])
    return _CANDIDATE_ARROW_SCHEMA


def _html_candidates(pages: DataFrame, max_outlinks: int) -> DataFrame:
    """The hot path: one ``mapInArrow`` with every kernel vectorized.

    A page's spans arrive GROUPED in its own row, so the per-page
    cap/dedup/order semantics need no grouping shuffle at all (the
    round-5 window formulation re-grouped by docid through an exchange +
    three in-partition sorts and measured ~75% slower at the default
    bench spec; this version is embarrassingly page-parallel — the right
    shape at any scale). Python-rate work is gone too: the spans
    ListArray flattens to per-field Arrow arrays (no dict-per-span
    materialization), parent columns replicate with ``np.repeat``, the
    cap is a groupby-cumsum, the within-page first-occurrence dedup is
    ``DataFrame.duplicated``, and ``within_order`` is a groupby-cumcount
    — all C-speed; the only per-element Python left is the canonicalize
    slow path behind the ``_CANONICAL_FAST`` prescreen.

    Exact reference semantics (Parser.java:138-155, WebCrawler.java:
    464-479): document order = (offset, array position) stable sort; only
    non-null canonicals count toward the cap; the row reaching max+1 is
    processed and THEN the loop breaks (the off-by-one); first occurrence
    wins the within-page dedup; ``within_order`` numbers the kept rows."""
    import numpy as np
    import pyarrow as pa

    kinds = list(LINK_KINDS)
    schema_out = _candidate_arrow_schema()

    def gen(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            lc = batch.column(batch.schema.get_field_index("spans"))
            if isinstance(lc, pa.ChunkedArray):
                lc = lc.combine_chunks()
            lengths = lc.value_lengths().fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            total = int(lengths.sum())
            if total == 0:
                continue
            flat = lc.flatten()
            pdf = pd.DataFrame({
                "kind": flat.field("kind").to_pandas(),
                "text": flat.field("text").to_pandas(),
                "media_ref": flat.field("media_ref").to_pandas(),
                "offset": flat.field("offset").to_pandas(),
            })
            # per-span array position (pos) without a Python loop
            starts = np.cumsum(lengths) - lengths
            pdf["pos"] = np.arange(total) - np.repeat(starts, lengths)
            pdf["page"] = np.repeat(np.arange(len(lengths)), lengths)

            keep = pdf["kind"].isin(kinds) & pdf["media_ref"].notna()
            pdf = pdf[keep]
            if pdf.empty:
                continue
            # parent context for canonicalize + output columns
            def parent(name):
                col = batch.column(batch.schema.get_field_index(name))
                return col.to_numpy(zero_copy_only=False)[pdf["page"]]
            pdf = pdf.assign(parent_url=parent("url"))

            # document order = (offset, pos) per page; lexsort is stable
            order = np.lexsort(
                (pdf["pos"].to_numpy(), pdf["offset"].to_numpy(),
                 pdf["page"].to_numpy()))
            pdf = pdf.iloc[order]

            pdf["cand_url"] = outlink_canonical_batch(
                pdf["media_ref"], pdf["parent_url"])
            ok = pdf["cand_url"].notna()
            cum = ok.astype("int64").groupby(
                pdf["page"].to_numpy()).cumsum()
            pdf = pdf[ok & (cum <= max_outlinks + 1)]
            if pdf.empty:
                continue
            pdf = pdf[~pdf.duplicated(["page", "cand_url"])]
            within = pdf.groupby(pdf["page"].to_numpy()).cumcount()

            pages_idx = pdf["page"].to_numpy()
            out = {
                "url": pdf["cand_url"].to_numpy(),
                "tag": pdf["kind"].to_numpy(),
                "anchor": pdf["text"].fillna("").to_numpy(),
                "within_order": within.to_numpy().astype("int32"),
                "parent_docid": batch.column(
                    batch.schema.get_field_index("docid"))
                    .to_numpy(zero_copy_only=False)[pages_idx],
                "parent_url": pdf["parent_url"].to_numpy(),
                "seed_docid": batch.column(
                    batch.schema.get_field_index("seed_docid"))
                    .to_numpy(zero_copy_only=False)[pages_idx],
                "parent_depth": batch.column(
                    batch.schema.get_field_index("depth"))
                    .to_numpy(zero_copy_only=False)[pages_idx]
                    .astype("int32"),
                "process_seq": batch.column(
                    batch.schema.get_field_index("process_seq"))
                    .to_numpy(zero_copy_only=False)[pages_idx],
            }
            yield pa.RecordBatch.from_pydict(out, schema=schema_out)

    return pages.select(*_PARENT_COLS, "spans").mapInArrow(
        gen, CANDIDATE_SCHEMA)


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
