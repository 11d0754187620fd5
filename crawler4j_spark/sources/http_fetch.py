"""Reference HTTP transport for the ``EngineConfig.fetch_fn`` slot.

The engine's S5 fetch stage is transport-agnostic: ``fetch_fn`` receives the
slotted claimed batch (url, host, slot, eff_time, …) and must return the
same rows plus the fetch-result columns (spans, status_code, redirect_to,
content_type, content_length, content_data) — see plans/engine.py:140-147.
This module is the real-deployment implementation the reference's
``fetcher/PageFetcher.java:263-347`` corresponds to:

* ``http_fetch_fn`` — a factory returning a DataFrame→DataFrame op that
  fetches each row over HTTP with urllib (stdlib; swap in httpx inside
  ``_fetch_one`` if available). Requests are grouped per host with
  ``groupBy("host").applyInPandas`` so ONE Arrow group = one host = one
  serialized request stream: the wall-clock politeness delay between two
  requests to the same host is enforced *inside* the group (the reference's
  PageFetcher synchronized politeness block, PageFetcher.java:263-283),
  while distinct hosts fetch concurrently across partitions. At cluster
  scale the group-by shuffles ≤round_size rows — negligible next to the
  network time it parallelizes.
* redirects are NOT auto-followed: 3xx statuses surface as
  ``(status_code, redirect_to)`` so the engine's redirect channel applies
  the reference semantics (follow_redirects config, depth-keeping, etc.) —
  PageFetcher disables httpclient's redirect strategy the same way
  (PageFetcher.java:118).
* bodies are read to ``max_download_size + 1`` bytes: the engine's size
  gate (content_length > max_download_size ⇒ page-bigger error channel)
  needs to see the overflow, mirroring fetchContent's truncation
  (PageFetcher.java:339-347).
* ``html_to_spans`` — a compact regex HTML scanner producing the engine's
  interleaved span rows (kind, text, media_ref, offset) in document order:
  an approximation of the reference's SAX HtmlContentHandler
  (parser/HtmlContentHandler.java:60-158) for deployments without a real
  HTML parser on the executors; swap in lxml/bs4 inside ``html_to_spans``
  for production fidelity.

No network leaves the sandbox in tests: tests/test_http_fetch.py drives
this transport against a loopback http.server stub.
"""

from __future__ import annotations

import re
import time
import urllib.error
import urllib.request
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["http_fetch_fn", "html_to_spans", "SPAN_TYPE", "FETCH_RESULT_FIELDS"]

SPAN_TYPE = ArrayType(StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
]))

FETCH_RESULT_FIELDS = [
    StructField("spans", SPAN_TYPE),
    StructField("status_code", IntegerType()),
    StructField("redirect_to", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("content_data", BinaryType()),
]

# tags carrying an outlink and the attribute that carries it, matching the
# engine's LINK_KINDS (functions/spans.py) / HtmlContentHandler's element set
_TAG_ATTR = {
    "a": "href", "area": "href", "link": "href",
    "img": "src", "iframe": "src", "frame": "src", "embed": "src",
}
_TAG_RE = re.compile(
    r"<(?P<tag>a|area|link|img|iframe|frame|embed|meta)\b(?P<attrs>[^>]*)>"
    r"(?:(?P<text>[^<]*)</(?P=tag)>)?",
    re.IGNORECASE | re.DOTALL)
_ATTR_RE = re.compile(
    r"""(?P<name>[a-zA-Z-]+)\s*=\s*(?:"(?P<dq>[^"]*)"|'(?P<sq>[^']*)'"""
    r"""|(?P<bare>[^\s>]+))""")
_STRIP_TAGS_RE = re.compile(r"<[^>]*>")


def _attrs(s: str) -> dict[str, str]:
    out = {}
    for m in _ATTR_RE.finditer(s):
        out[m.group("name").lower()] = (
            m.group("dq") or m.group("sq") or m.group("bare") or "")
    return out


def html_to_spans(html: Optional[str]) -> list[dict]:
    """Interleaved (kind, text, media_ref, offset) spans of an HTML page in
    document order — regex approximation of HtmlContentHandler (see module
    docstring). Text between link tags becomes ``text`` spans; a ``meta``
    tag contributes a span only for http-equiv refresh targets (the
    reference's meta-refresh handling, HtmlContentHandler.java:101-118)."""
    if not html:
        return []
    spans: list[dict] = []
    pos = 0
    offset = 0

    def emit(kind, text, media_ref):
        nonlocal offset
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": offset})
        offset += 1

    for m in _TAG_RE.finditer(html):
        between = _STRIP_TAGS_RE.sub("", html[pos:m.start()]).strip()
        if between:
            emit("text", between, None)
        pos = m.end()
        tag = m.group("tag").lower()
        a = _attrs(m.group("attrs") or "")
        if tag == "meta":
            # only a refresh redirect target is an outlink
            if a.get("http-equiv", "").lower() == "refresh":
                content = a.get("content", "")
                if "url=" in content.lower():
                    target = content[content.lower().index("url=") + 4:].strip()
                    # Quoted targets (content='0; url="http://x"') keep the
                    # value between the matching quotes; unquoted ones end
                    # at the next ';' parameter separator.
                    if target[:1] in ("'", '"'):
                        q_end = target.find(target[0], 1)
                        target = target[1:q_end if q_end != -1 else None]
                    else:
                        target = target.split(";", 1)[0]
                    target = target.strip()
                    if target:
                        emit("meta", None, target)
        else:
            ref = a.get(_TAG_ATTR[tag])
            if ref is not None:
                emit(tag, (m.group("text") or "").strip() or None, ref)
    tail = _STRIP_TAGS_RE.sub("", html[pos:]).strip()
    if tail:
        emit("text", tail, None)
    return spans


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


def _fetch_one(
    opener: urllib.request.OpenerDirector,
    url: str,
    user_agent: str,
    timeout_s: float,
    max_bytes: int,
) -> tuple[Optional[int], Optional[str], Optional[str], Optional[int],
           Optional[bytes]]:
    """(status_code, redirect_to, content_type, content_length,
    content_data) for one URL. Network/DNS failures return a None status —
    the engine routes those to the fetch-error channel exactly like any
    non-200 (WebCrawler.onUnhandledException path)."""
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            body = resp.read(max_bytes + 1)
            ctype = resp.headers.get("Content-Type")
            return resp.status, None, ctype, len(body), body
    except urllib.error.HTTPError as e:
        # 3xx lands here because redirects are not followed (_NoRedirect)
        loc = e.headers.get("Location") if e.headers else None
        if 300 <= e.code < 400:
            return e.code, loc, None, 0, None
        return e.code, None, None, 0, None
    except Exception:
        return None, None, None, None, None


def http_fetch_fn(
    user_agent: str = "crawler4j",
    timeout_s: float = 10.0,
    max_download_size: int = 1 << 20,
    politeness_ms: int = 200,
    parse_html: bool = True,
    url_rewrite: Optional[Callable[[str], str]] = None,
) -> Callable[[DataFrame], DataFrame]:
    """Build a fetch_fn for ``EngineConfig.fetch_fn`` (see module docstring).

    ``url_rewrite`` optionally maps the crawl-space URL to the URL actually
    requested (e.g. pointing a test crawl at a loopback stub) without
    changing the URLs the engine dedups/schedules on.
    """

    def fetch(slotted: DataFrame) -> DataFrame:
        import pandas as pd

        out_schema = StructType(
            list(slotted.schema.fields) + FETCH_RESULT_FIELDS)

        def one_host(key, pdf):
            # one group = one host: serialize in slot order, sleeping the
            # politeness delay between consecutive requests (the engine's
            # virtual clock handles *scheduling*; the transport enforces
            # the real-world gap the reference's synchronized block does)
            opener = urllib.request.build_opener(_NoRedirect)
            pdf = pdf.sort_values("slot") if "slot" in pdf else pdf
            cols = {n: [] for n in ("spans", "status_code", "redirect_to",
                                    "content_type", "content_length",
                                    "content_data")}
            last = 0.0
            for url in pdf["url"]:
                wait = politeness_ms / 1000.0 - (time.monotonic() - last)
                if last and wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
                target = url_rewrite(url) if url_rewrite else url
                status, redir, ctype, length, body = _fetch_one(
                    opener, target, user_agent, timeout_s, max_download_size)
                spans = None
                if (parse_html and status == 200 and body is not None
                        and ctype is not None and "html" in ctype.lower()):
                    try:
                        spans = html_to_spans(body.decode(
                            "utf-8", errors="replace"))
                    except Exception:
                        spans = []
                cols["spans"].append(spans)
                cols["status_code"].append(status)
                cols["redirect_to"].append(redir)
                cols["content_type"].append(ctype)
                cols["content_length"].append(length)
                cols["content_data"].append(body)
            for n, v in cols.items():
                pdf[n] = v
            return pdf

        return slotted.groupBy("host").applyInPandas(one_host, out_schema)

    return fetch
