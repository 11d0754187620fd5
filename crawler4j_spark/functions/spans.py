"""Span kernels: interleaved-span payload → ordered outlink candidates.

The interleaved-span table (``BASELINE.json.input_hint``) is the
document-order output of the reference's SAX content handler
(``parser/HtmlContentHandler.java:60-158``): rows of
``(kind, text, media_ref, offset)`` where ``kind`` ∈ {text, a, area, link,
img, iframe, frame, embed, meta}, ``text`` is body text or anchor text,
``media_ref`` is the href/src.

``outlink_candidates`` replicates the reference's outlink pipeline
(``parser/Parser.java:123-158``):

* link spans processed in document order (``offset`` ascending);
* empty/``javascript:``/``mailto:``/``@`` hrefs skipped (Parser.java:138-144);
* canonicalization against the page URL (RFC1808 + URLCanonicalizer rules);
* the outgoing-link cap counts every non-null canonical URL *including
  within-page duplicates*, and breaks only after exceeding the cap — i.e. up
  to ``max_outlinks + 1`` candidates are collected (the reference's
  ``urlCount++; if (urlCount > max) break;`` off-by-one, Parser.java:152-155);
* within-page dedup keeps the FIRST occurrence (HashSet.add keeps the first
  inserted WebURL; document order is our parity definition, SURVEY §1.2).

This one function is called from the reference simulator and from the Spark
parse pandas UDF, so both sides share one executable definition.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Optional

from .urlkit import canonicalize

__all__ = [
    "Candidate",
    "outlink_candidates",
    "link_hrefs",
    "candidates_from_canonical",
    "LINK_KINDS",
    "body_text",
]

# kinds that carry an outgoing link (everything except pure body text)
LINK_KINDS = frozenset({"a", "area", "link", "img", "iframe", "frame", "embed", "meta"})

DEFAULT_MAX_OUTLINKS = 5000  # CrawlConfig.java:96


@dataclass
class Candidate:
    url: str                 # canonical URL
    tag: str                 # kind of the first occurrence
    anchor: str              # anchor text of the first occurrence ('' if none)
    order: int               # first-occurrence index among kept candidates


def link_hrefs(
    spans: Iterable[tuple[str, Optional[str], Optional[str], int]],
) -> list[tuple[str, str, str]]:
    """Pre-canonicalize half of the outlink pipeline: link spans in document
    order, junk-filtered (Parser.java:138-144) — (kind, href, anchor) tuples.
    Shared by the per-page kernel below and the vectorized parse stage
    (operators/parse.py), so the junk filter has ONE definition."""
    ordered = sorted(spans, key=lambda s: s[3])
    out: list[tuple[str, str, str]] = []
    for kind, text, media_ref, _offset in ordered:
        if kind not in LINK_KINDS or media_ref is None:
            continue
        href = media_ref.strip()
        if not href:
            continue
        low = href.lower()
        if "javascript:" in low or "mailto:" in low or "@" in low:
            continue
        out.append((kind, href, text or ""))
    return out


def candidates_from_canonical(
    items: Iterable[tuple[str, Optional[str], str]],   # (kind, canonical, anchor)
    max_outlinks: int = DEFAULT_MAX_OUTLINKS,
) -> list[Candidate]:
    """Post-canonicalize half: the reference's counting/cap/dedup loop over
    already-canonicalized candidates (Parser.java:146-158). The cap counts
    every non-null canonical URL INCLUDING within-page duplicates and breaks
    only after exceeding it (the ``urlCount++; if (urlCount > max) break;``
    max+1 off-by-one); dedup keeps the first occurrence. Canonicalizing a
    few extra hrefs past the cap and breaking here is output-identical to
    the reference's early break — the break only saves work."""
    seen: set[str] = set()
    out: list[Candidate] = []
    url_count = 0
    for kind, url, anchor in items:
        if url is None:
            continue
        if url not in seen:
            seen.add(url)
            out.append(Candidate(url=url, tag=kind, anchor=anchor, order=len(out)))
        url_count += 1
        if url_count > max_outlinks:
            break
    return out


def outlink_candidates(
    page_url: str,
    spans: Iterable[tuple[str, Optional[str], Optional[str], int]],
    max_outlinks: int = DEFAULT_MAX_OUTLINKS,
) -> list[Candidate]:
    """Ordered unique canonical outlink candidates of one page.

    ``spans``: iterable of (kind, text, media_ref, offset); need not be
    pre-sorted — sorted by offset here.
    """
    return candidates_from_canonical(
        ((kind, canonicalize(href, page_url), anchor)
         for kind, href, anchor in link_hrefs(spans)),
        max_outlinks,
    )


def body_text(
    spans: Iterable[tuple[str, Optional[str], Optional[str], int]]
) -> str:
    """Concatenated body text of the page's text spans in document order
    (HtmlContentHandler.getBodyText, trimmed as in Parser.java:117)."""
    ordered = sorted(spans, key=lambda s: s[3])
    return "".join(t or "" for k, t, _m, _o in ordered if k == "text").strip()
