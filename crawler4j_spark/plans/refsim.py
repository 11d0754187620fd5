"""Single-threaded pure-Python crawler4j simulator — the executable spec.

This module re-implements the reference's crawl loop semantics exactly
(`crawler/WebCrawler.java:271-497`, `frontier/Frontier.java:86-188`,
`frontier/WorkQueues.java:86-237`, `frontier/DocIDServer.java:87-99`,
`fetcher/PageFetcher.java:173-261`, `crawler/CrawlController.java:305-380`)
over a simulated corpus (FIXTURES.md §1), with a *virtual* clock for
politeness. It is the parity oracle for the Spark engine: same seed list +
politeness budget ⇒ same visited set, same docid assignment, same crawl
order, same per-document span sequences.

Semantics replicated (see SURVEY.md §4 for the full parity decision list):

* Frontier ordering: (priority asc, min(depth,127) asc, docid asc) — the
  6-byte BDB key of WorkQueues.java:196-209.
* Claim batches of ``batch_size`` (25); within a batch URLs are processed in
  the greedy politeness order of PageFetcher.getBestURL (first listed URL
  whose host is not delayed, else the min-delay URL).
* Docids minted in arrival order of first sight under a global counter
  (DocIDServer.getNewDocID); outlinks of a page mint during that page's
  processing in first-occurrence document order; depth-gated / shouldVisit-
  rejected / robots-blocked URLs still consume docids (WebCrawler.java:464-479).
* Redirect targets: registered as-is (NO canonicalization), same depth,
  priority 0, scheduled only if unseen and shouldVisit+robots pass
  (WebCrawler.java:399-430).
* Plain-text pages: outlinks come from the quirky URL regex and are NOT
  canonicalized (Parser.java:76-91, Net.java:17-34).
* Binary pages: visited only when include_binary; outlinks only when
  process_binary — the Tika rendering is replaced by the deterministic
  ``binary_to_text`` analog, then the same extractUrls regex
  (Parser.java:59-75, BinaryParseData.java:64-79).
* max_pages gates *scheduling* in arrival order (Frontier.java:86-129);
  max_depth gates scheduling but not docid minting.
* Robots decision incl. the fork's general/specific quirk (see
  functions/robots.py); missing robots.txt ⇒ allow-all.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Callable, Optional

from ..functions.netkit import (
    UnsupportedCharsetError,
    binary_to_text,
    charset_from_content_type,
    decode_content,
    extract_urls,
    has_binary_content,
    has_plain_text_content,
)
from ..functions.robots import HostDirectives, parse_robots, robots_allows
from ..functions.spans import body_text, outlink_candidates
from ..functions.urlkit import canonicalize, url_host, url_path

__all__ = ["SimConfig", "CorpusPage", "SimCorpus", "RefSim", "PAGE_TOO_BIG",
           "CONTENT_FETCH_ERROR"]

PAGE_TOO_BIG = 1001  # fetcher/CustomFetchStatus.java PageTooBig
# Model-side tag for the onContentFetchError channel (WebCrawler.java:449-451
# fires a callback with NO status code; CustomFetchStatus leaves 1007 unused,
# so the error-log views use it to keep one status-typed channel).
CONTENT_FETCH_ERROR = 1007
REDIRECT_CODES = {300, 301, 302, 303, 307, 308}


@dataclass
class SimConfig:
    """Mirror of crawler/CrawlConfig.java defaults."""

    max_depth: int = -1              # maxDepthOfCrawling
    max_pages: int = -1              # maxPagesToFetch
    politeness_ms: int = 200         # politenessDelay
    include_binary: bool = False     # includeBinaryContentInCrawling
    process_binary: bool = False     # processBinaryContentInCrawling
    max_outlinks: int = 5000         # maxOutgoingLinksToFollow
    max_download_size: int = 1048576 # maxDownloadSize
    follow_redirects: bool = True
    robots_enabled: bool = True
    ignore_robots_for_seed: bool = False
    user_agent: str = "crawler4j"
    batch_size: int = 25             # WebCrawler.java:277


@dataclass
class CorpusPage:
    """One fetchable document (FIXTURES.md §1)."""

    url: str
    status_code: int = 200
    content_type: str = "text/html; charset=UTF-8"
    redirect_to: Optional[str] = None
    content_length: int = 0
    # (kind, text, media_ref, offset) in document order — input_hint shape
    spans: list[tuple[str, Optional[str], Optional[str], int]] = field(default_factory=list)
    # X8: raw undecoded payload (Page.contentData). When set, the parse
    # stage decodes it with the Content-Type header's charset= parameter
    # (Page.java:129-135, Parser.java:79-82) instead of reading spans.
    content_data: Optional[bytes] = None


class SimCorpus:
    """The simulated web: pages by canonical URL + robots bodies by host."""

    def __init__(
        self,
        pages: dict[str, CorpusPage],
        robots: Optional[dict[str, str]] = None,
    ) -> None:
        self.pages = pages
        self.robots = robots or {}


@dataclass
class _WebUrl:
    url: str
    docid: int = -1
    parent_docid: int = -1
    parent_url: Optional[str] = None
    seed_docid: int = -1
    depth: int = 0
    priority: int = 0
    anchor: str = ""
    tag: str = ""

    def key(self) -> tuple[int, int, int]:
        # WorkQueues.java:196-209: priority (signed byte, biased), clamped
        # depth, docid — lower key crawls earlier
        return (self.priority, min(self.depth, 127), self.docid)


class RefSim:
    """The executable spec. Run with ``add_seed`` then ``crawl``."""

    def __init__(
        self,
        corpus: SimCorpus,
        config: Optional[SimConfig] = None,
        should_visit: Optional[Callable[[str], bool]] = None,
    ) -> None:
        self.corpus = corpus
        self.cfg = config or SimConfig()
        self.should_visit = should_visit or (lambda url: True)

        self.seen: dict[str, int] = {}
        self.last_docid = 0
        self.scheduled_pages = 0
        self.processed_pages = 0
        self._heap: list[tuple[tuple[int, int, int], _WebUrl]] = []
        self._frontier_keys: set[tuple[int, int, int]] = set()
        self.seed_count: dict[int, int] = {}

        # politeness (virtual clock, ms)
        self.now = 0
        self.next_fetch_times: dict[str, int] = {}

        self._robots_cache: dict[str, tuple[HostDirectives, HostDirectives]] = {}

        # ---- parity outputs (FIXTURES.md §6) ----
        self.visited: list[dict] = []      # url, docid, depth, seq, round
        self.process_log: list[dict] = []  # every processed URL in order
        self.documents: dict[str, list] = {}
        self.seed_end_events: list[int] = []
        self.errors: list[dict] = []

        self._seq = 0
        self._round = 0

    # -- DocIDServer ------------------------------------------------------

    def _get_new_docid(self, url: str) -> Optional[int]:
        """Mint a docid; None when seen before (URLSeenBefore)."""
        if url in self.seen:
            return None
        self.last_docid += 1
        self.seen[url] = self.last_docid
        return self.last_docid

    # -- Frontier ---------------------------------------------------------

    def _put(self, w: _WebUrl) -> bool:
        k = w.key()
        if k in self._frontier_keys:
            return False  # WorkQueues.java:222-229 key dedup
        self._frontier_keys.add(k)
        heapq.heappush(self._heap, (k, w))
        self.seed_count[w.seed_docid] = self.seed_count.get(w.seed_docid, 0) + 1
        return True

    def _schedule(self, w: _WebUrl) -> None:
        # Frontier.schedule (single): max-pages check then put
        if self.cfg.max_pages < 0 or self.scheduled_pages < self.cfg.max_pages:
            self._put(w)
            self.scheduled_pages += 1  # incremented regardless of put dedup

    def _schedule_all(self, urls: list[_WebUrl]) -> None:
        # Frontier.scheduleAll: arrival-order admission against max_pages
        new_scheduled = 0
        for w in urls:
            if self.cfg.max_pages > 0 and \
                    (self.scheduled_pages + new_scheduled) >= self.cfg.max_pages:
                break
            self._put(w)
            new_scheduled += 1  # Frontier.java:95-97 ignores put's dedup result
        self.scheduled_pages += new_scheduled

    def _shift(self, k: int) -> list[_WebUrl]:
        out = []
        while self._heap and len(out) < k:
            key, w = heapq.heappop(self._heap)
            self._frontier_keys.discard(key)
            out.append(w)
        return out

    def _set_processed(self, w: _WebUrl) -> None:
        self.processed_pages += 1
        c = self.seed_count.get(w.seed_docid, 0) - 1
        if c <= 0:
            self.seed_count.pop(w.seed_docid, None)
            self.seed_end_events.append(w.seed_docid)
        else:
            self.seed_count[w.seed_docid] = c

    # -- robots -----------------------------------------------------------

    def _robots_allows(self, url: str) -> bool:
        if not self.cfg.robots_enabled:
            return True
        host = url_host(url)
        if host is None:
            return True  # MalformedURLException path: allow
        if host not in self._robots_cache:
            body = self.corpus.robots.get(host)
            if body is None:
                self._robots_cache[host] = (HostDirectives(), HostDirectives())
            else:
                self._robots_cache[host] = parse_robots(body, self.cfg.user_agent)
        gen, spec = self._robots_cache[host]
        return robots_allows(gen, spec, url_path(url))

    # -- politeness (virtual clock) --------------------------------------

    def _best_url(self, assigned: list[_WebUrl]) -> _WebUrl:
        # PageFetcher.getBestURL: first URL whose host has no pending delay,
        # else the min-delay URL (first among ties); invalid URL immediately
        min_delay = None
        min_url = None
        for w in assigned:
            host = url_host(w.url)
            if host is None:
                return w
            target = self.next_fetch_times.get(host)
            if target is None:
                return w
            delay = target - self.now
            if delay <= 0:
                return w
            if min_delay is None or delay < min_delay:
                min_delay = delay
                min_url = w
        assert min_url is not None
        return min_url

    def _enforce_politeness(self, url: str) -> None:
        # PageFetcher.enforcePolitenessDelay with a virtual clock
        std = self.cfg.politeness_ms
        for h in [h for h, t in self.next_fetch_times.items() if t < self.now]:
            del self.next_fetch_times[h]
        # PageFetcher.java:219,236-239: the politeness key falls back to the
        # full URL string when the host cannot be parsed
        host = url_host(url) or url
        target = self.next_fetch_times.get(host, self.now)
        delay = max(target - self.now, 0)
        self.next_fetch_times[host] = target + std
        self.now += delay  # virtual sleep

    # -- seeds ------------------------------------------------------------

    def add_seen_url(self, url: str, docid: int) -> bool:
        """S2 warm start (CrawlController.addSeenUrl:398-409): register a
        URL→docid mapping without crawling it. Requires increasing docids."""
        canon = canonicalize(url)
        if canon is None or canon in self.seen or docid <= self.last_docid:
            return False
        self.seen[canon] = docid
        self.last_docid = docid
        return True

    def add_seed(self, url: str, docid: int = -1, priority: int = 0) -> int:
        canon = canonicalize(url)
        if canon is None:
            return -1
        if docid < 0:
            minted = self._get_new_docid(canon)
            if minted is None:
                return -1
            docid = minted
        else:
            if canon in self.seen or docid <= self.last_docid:
                return -1  # DocIDServer.addUrlAndDocId preconditions
            self.seen[canon] = docid
            self.last_docid = docid
        w = _WebUrl(url=canon, docid=docid, seed_docid=docid, depth=0,
                    priority=priority)
        if not self.cfg.ignore_robots_for_seed and not self._robots_allows(canon):
            return -1
        self._schedule(w)
        return docid

    # -- crawl loop -------------------------------------------------------

    def crawl(self, max_rounds: int = 10_000) -> None:
        while self._heap and self._round < max_rounds:
            assigned = self._shift(self.cfg.batch_size)
            self._round += 1
            while assigned:
                cur = self._best_url(assigned)
                assigned.remove(cur)
                self._process_page(cur)
                self._set_processed(cur)

    # -- processPage (WebCrawler.java:386-497) ----------------------------

    def _process_page(self, cur: _WebUrl) -> None:
        self._enforce_politeness(cur.url)
        self._seq += 1
        page = self.corpus.pages.get(cur.url)
        status = page.status_code if page is not None else 404
        entry = {
            "url": cur.url, "docid": cur.docid, "depth": cur.depth,
            "priority": cur.priority, "seed_docid": cur.seed_docid,
            "parent_docid": cur.parent_docid, "seq": self._seq,
            "round": self._round, "status": status, "time": self.now,
            "host": url_host(cur.url),
        }
        self.process_log.append(entry)

        if page is None:
            self.errors.append({"url": cur.url, "status": 404, "seq": self._seq})
            return

        if page.status_code in REDIRECT_CODES:
            if not self.cfg.follow_redirects:
                return
            moved_to = page.redirect_to
            if moved_to is None:
                return
            w = _WebUrl(url=moved_to, parent_docid=cur.parent_docid,
                        parent_url=cur.parent_url, seed_docid=cur.seed_docid,
                        depth=cur.depth, anchor=cur.anchor)
            minted = self._get_new_docid(w.url)
            if minted is not None:
                w.docid = minted
                if self.should_visit(w.url) and self._robots_allows(w.url):
                    self._schedule(w)
            return

        if page.status_code != 200:
            self.errors.append(
                {"url": cur.url, "status": page.status_code, "seq": self._seq})
            return

        if page.content_length > self.cfg.max_download_size:
            self.errors.append(
                {"url": cur.url, "status": PAGE_TOO_BIG, "seq": self._seq})
            return

        # ---- Page.load charset resolution (Page.java:129-135) ----
        # ContentType.getOrDefault throws UnsupportedCharsetException for an
        # unknown charset= name; fetchContent catches it and returns false →
        # onContentFetchError: no visit, no outlinks (WebCrawler.java:449-451).
        ctype = page.content_type
        try:
            content_charset = charset_from_content_type(ctype)
        except UnsupportedCharsetError:
            self.errors.append({"url": cur.url, "status": CONTENT_FETCH_ERROR,
                                "seq": self._seq})
            return

        # ---- parse (Parser.java:59-175) ----
        outlinks: list[_WebUrl] = []
        if has_binary_content(ctype):
            if not self.cfg.include_binary:
                return  # NotAllowedContentException: no visit, no schedule
            # Parser.java:61-75: with processBinaryContentInCrawling the
            # payload is Tika-rendered to text (binary_to_text analog) and
            # outlinks come from the same extractUrls regex; with it off
            # the rendering is "<html></html>" — zero regex matches.
            if self.cfg.process_binary and page.content_data is not None:
                for raw in extract_urls(binary_to_text(page.content_data)):
                    outlinks.append(_WebUrl(url=raw, tag="", anchor=""))
        elif has_plain_text_content(ctype):
            if page.content_data is not None:
                # X8: new String(contentData, contentCharset) —
                # Parser.java:79-82 with charset from Page.java:129-135
                text = decode_content(page.content_data, content_charset)
            else:
                text = body_text(page.spans)
            for raw in extract_urls(text):
                outlinks.append(_WebUrl(url=raw, tag="", anchor=""))
        else:
            for cand in outlink_candidates(cur.url, page.spans,
                                           self.cfg.max_outlinks):
                outlinks.append(_WebUrl(url=cand.url, tag=cand.tag,
                                        anchor=cand.anchor))

        # ---- outlink loop (WebCrawler.java:464-479) ----
        to_schedule: list[_WebUrl] = []
        for w in outlinks:
            w.parent_docid = cur.docid
            w.parent_url = cur.url
            w.seed_docid = cur.seed_docid
            minted = self._get_new_docid(w.url)
            if minted is None:
                continue
            w.docid = minted
            w.depth = cur.depth + 1
            if self.cfg.max_depth == -1 or cur.depth < self.cfg.max_depth:
                if self.should_visit(w.url) and self._robots_allows(w.url):
                    to_schedule.append(w)
        self._schedule_all(to_schedule)

        # ---- visit (user sink) ----
        spans_sorted = sorted(page.spans, key=lambda s: s[3])
        self.documents[cur.url] = spans_sorted
        self.visited.append({
            "url": cur.url, "docid": cur.docid, "depth": cur.depth,
            "seq": self._seq, "round": self._round,
        })
