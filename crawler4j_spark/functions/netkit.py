"""Text kernels: URL extraction from plain text, anchor normalization.

* ``extract_urls``: port of the reference's quirky URL regex
  (``util/Net.java:37-47``) — kept verbatim, including its oddities
  (``%[a-f\\d{2}]`` character classes containing literal braces, the
  2-letter-ccTLD alternation, ``www.`` with an unescaped dot). Matches are
  prefixed with ``http://`` when they don't start with ``http``
  (``Net.java:25-26``). The reference collects matches into a HashSet of
  WebURL (dedup by URL string); we return first-occurrence-ordered unique
  matches so downstream code can both dedup and preserve discovery order.
* ``normalize_anchor``: ``parser/HtmlContentHandler.java:166-173`` — newlines
  and tabs to spaces, trim, cap at 100 chars + ``"..."``.
* ``has_binary_content`` / ``has_plain_text_content``: ``util/Util.java:68-80``.
* ``binary_to_text``: deterministic stand-in for Tika's AutoDetectParser →
  XHTML rendering of a binary payload (``parser/BinaryParseData.java:64-79``).
"""

from __future__ import annotations

import re

__all__ = [
    "extract_urls",
    "binary_to_text",
    "normalize_anchor",
    "has_binary_content",
    "has_plain_text_content",
    "charset_from_content_type",
    "decode_content",
    "UnsupportedCharsetError",
    "bad_charset_mask",
    "MAX_ANCHOR_LENGTH",
]

# Verbatim port of Net.java:38-48 (Java and Python regex syntax align here).
_URL_PATTERN = re.compile(
    r"\b(((ht|f)tp(s?)\:\/\/|~\/|\/)|www.)"
    r"(\w+:\w+@)?(([-\w]+\.)+(com|org|net|gov"
    r"|mil|biz|info|mobi|name|aero|jobs|museum"
    r"|travel|[a-z]{2}))(:[\d]{1,5})?"
    r"(((\/([-\w~!$+|.,=]|%[a-f\d]{2})+)+|\/)+|\?|#)?"
    r"((\?([-\w~!$+|.,*:]|%[a-f\d{2}])+=?"
    r"([-\w~!$+|.,*:=]|%[a-f\d]{2})*)"
    r"(&(?:[-\w~!$+|.,*:]|%[a-f\d{2}])+=?"
    r"([-\w~!$+|.,*:=]|%[a-f\d]{2})*)*)*"
    r"(#([-\w~!$+|.,*:=]|%[a-f\d]{2})*)?\b"
)


def extract_urls(text: str | None) -> list[str]:
    """All URL-looking matches in ``text``, ``http://``-prefixed when bare,
    deduplicated keeping first occurrence (document order)."""
    if not text:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for m in _URL_PATTERN.finditer(text):
        url = m.group()
        if not url.startswith("http"):
            url = "http://" + url
        if url not in seen:
            seen.add(url)
            out.append(url)
    return out


MAX_ANCHOR_LENGTH = 100  # HtmlContentHandler.java:31


def normalize_anchor(anchor: str | None) -> str:
    """Whitespace-normalize and cap anchor text; returns '' for None."""
    if anchor is None:
        return ""
    a = anchor.replace("\n", " ").replace("\t", " ").strip()
    if len(a) > MAX_ANCHOR_LENGTH:
        a = a[:MAX_ANCHOR_LENGTH] + "..."
    return a


def has_binary_content(content_type: str | None) -> bool:
    t = (content_type or "").lower()
    return any(k in t for k in ("image", "audio", "video", "application"))


def has_plain_text_content(content_type: str | None) -> bool:
    t = (content_type or "").lower()
    return "text" in t and "html" not in t


# Tika-equivalent binary text extraction (S8/F10 outlink half).
#
# The reference's binary parse path (Parser.java:61-75) renders the raw
# payload to an HTML string with Tika's AutoDetectParser
# (BinaryParseData.java:64-79) and then extracts outlinks from that string
# with the SAME Net.extractUrls regex the plain-text path uses
# (Parser.java:74) — binary outlinks are "URL-looking character runs that
# survive the text rendering", not parsed hrefs. Tika is a format zoo we
# neither can ship here (no jar in the sandbox) nor should re-implement;
# the contract-preserving analog is strings(1): decode every printable-
# ASCII run of >= _MIN_PRINTABLE_RUN bytes, newline-joined in payload
# order. For payload formats that store URLs as plain bytes (PDF URI
# actions, EXIF/XMP fields, ID3 WXXX frames — the cases Tika surfaces),
# the URL bytes ARE a printable run, so extract_urls sees the same
# candidates Tika would expose. A real deployment can swap in tika-python
# via the same one-string-in/one-string-out seam.
_MIN_PRINTABLE_RUN = 4  # strings(1) default; shorter runs are format noise
_PRINTABLE_RUN = re.compile(rb"[\x20-\x7e\t]{%d,}" % _MIN_PRINTABLE_RUN)


def binary_to_text(data: bytes | None) -> str:
    """Printable-ASCII runs of ``data`` in payload order, newline-joined.

    Deterministic Tika-rendering analog for ``BinaryParseData.
    setBinaryContent`` (parser/BinaryParseData.java:64-79): the returned
    string plays the role of ``getHtml()`` — input to ``extract_urls``
    (Parser.java:74). Returns ``''`` for None/empty payloads (Tika parse
    failure leaves html null → no outlinks, BinaryParseData.java:76-78).
    """
    if not data:
        return ""
    return "\n".join(
        m.group().decode("ascii") for m in _PRINTABLE_RUN.finditer(data))


# --- X8 charset handling (crawler/Page.java:129-135, parser/Parser.java:
# 79-82,162-171) ------------------------------------------------------------

_CHARSET_PARAM = re.compile(r";\s*charset\s*=\s*\"?([^\";\s]+)\"?", re.I)


class UnsupportedCharsetError(LookupError):
    """A ``charset=`` parameter names a charset the codec registry doesn't
    know. The reference's ContentType.getOrDefault (Page.java:129) throws
    UnsupportedCharsetException for such names; PageFetchResult.fetchContent
    (PageFetchResult.java:76-85) catches it and returns false, so the page
    becomes a content-fetch error — no visit, no outlinks
    (WebCrawler.java:449-451 onContentFetchError)."""


def charset_from_content_type(content_type: str | None) -> str | None:
    """The ``charset=`` parameter of a Content-Type header value, or None
    when absent — Page.java:129-131 (httpclient ContentType.getOrDefault(
    entity).getCharset() is null when the header carries no charset
    parameter). Raises :class:`UnsupportedCharsetError` for a present-but-
    unknown charset name, mirroring ContentType's UnsupportedCharsetException
    (callers route the page to the content-fetch-error channel)."""
    if not content_type:
        return None
    m = _CHARSET_PARAM.search(content_type)
    if m is None:
        return None
    name = m.group(1).strip()
    import codecs

    try:
        codecs.lookup(name)
    except LookupError:
        raise UnsupportedCharsetError(name) from None
    return name


def bad_charset_mask(content_types) -> "object":
    """Vectorized batch form of the UnsupportedCharsetError check: a boolean
    pandas Series, True where the Content-Type carries a charset= parameter
    whose name the codec registry rejects. Prescreens with a C-speed
    ``str.extract`` (almost no row carries a charset param), then looks up
    only the UNIQUE charset names in the batch — the per-round cost in the
    engine's fetch staging is one regex pass plus a tiny dict probe."""
    import codecs

    import pandas as pd

    names = content_types.str.extract(_CHARSET_PARAM, expand=False)
    present = names.notna()
    if not present.any():
        return pd.Series(False, index=content_types.index)
    verdict: dict[str, bool] = {}
    for name in names[present].unique():
        n = name.strip()
        try:
            codecs.lookup(n)
            verdict[name] = False
        except LookupError:
            verdict[name] = True
    # dict.get keeps NaN (no charset param) rows False; building the result
    # in one pass avoids the partial boolean setitem pandas is deprecating
    return names.map(lambda n: verdict.get(n, False)).astype(bool)


def decode_content(data: bytes | None, charset: str | None) -> str:
    """Parser.java:79-82,162-167: ``new String(bytes, charset)``; a null
    charset falls back to the platform default (UTF-8 here). Java's String
    decoder replaces malformed input with U+FFFD — ``errors='replace'`` is
    the exact equivalent."""
    if data is None:
        return ""
    return data.decode(charset or "utf-8", errors="replace")


def charset_series(content_types) -> "object":
    """Vectorized :func:`charset_from_content_type` over a pandas Series of
    Content-Type header values: one C-speed ``str.extract`` pass, charset
    names stripped, None where the parameter is absent. Assumes the batch
    already passed :func:`bad_charset_mask` (unknown names were routed to
    the error channel upstream), so no registry lookup here."""
    names = content_types.str.extract(_CHARSET_PARAM, expand=False)
    return names.str.strip()


def decode_contents(data, charsets) -> "object":
    """Vectorized :func:`decode_content` over aligned pandas Series of raw
    payload bytes and charset names: rows are grouped by effective codec
    (None → platform default UTF-8) and each group decodes in one C-speed
    ``Series.str.decode`` call — per-batch cost is #distinct-charsets codec
    dispatches instead of #rows Python calls."""
    import pandas as pd

    out = pd.Series("", index=data.index, dtype=object)
    present = data.notna()
    if not present.any():
        return out
    eff = charsets.where(charsets.notna(), "utf-8")
    for codec, sub in data[present].groupby(eff[present]):
        out.loc[sub.index] = sub.str.decode(codec, errors="replace")
    return out
