"""Deterministic synthetic web-corpus generator (FIXTURES.md §1-§4).

Generates the fetchable universe both the reference simulator and the Spark
engine crawl: an interleaved-span document table per ``BASELINE.json.input_hint``
(``doc_id, spans:array<struct<kind,text,media_ref,offset>>`` plus fetch
metadata), per-host robots.txt bodies, and a seed list. Fixed seed ⇒
bit-identical corpus every run; no external data.

Knobs exercise every parity-relevant code path: Zipf host skew (hot host),
relative hrefs (RFC1808 resolution), session-id/unsorted-query traps
(canonicalization), duplicate links (URL-seen dedup), cross-host links,
redirect chains incl. redirect-to-seen, binary/text/missing/too-big pages,
robots exact-UA sections (the only kind that can block in this fork —
see functions/robots.py).
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass, field

from ..plans.refsim import CorpusPage, SimCorpus

__all__ = ["CorpusSpec", "GeneratedCorpus", "generate_corpus"]

_WORDS = (
    "spark frontier crawl queue shuffle partition bloom filter seen docid "
    "politeness robots depth priority anchor media span fetch parse link "
    "host domain page batch round commit snapshot resume skew salt hash"
).split()


@dataclass
class CorpusSpec:
    seed: int = 42
    n_hosts: int = 8
    n_pages: int = 400
    zipf_s: float = 1.2           # host-size skew exponent
    fanout: int = 6               # links per HTML page
    frac_text: float = 0.08       # text/plain pages
    frac_binary: float = 0.05     # image/application pages
    frac_redirect: float = 0.05
    frac_too_big: float = 0.01
    frac_relative_href: float = 0.35
    frac_trap_query: float = 0.10  # unsorted query + session id params
    frac_dup_link: float = 0.15    # same target linked twice in one page
    frac_cross_host: float = 0.25
    frac_missing_target: float = 0.04  # links to URLs not in the corpus
    frac_private: float = 0.12     # pages under /private/ (robots-gated)
    max_download_size: int = 1048576
    # Give binary pages a raw payload with URL bytes embedded between
    # non-printable runs (PDF URI actions / EXIF / ID3 style) so the
    # process_binary outlink path (Parser.java:61-75) has work to do.
    # Default OFF: the default corpus stays byte-identical to round 4
    # (pinned bench metrics + parity fixtures depend on the rng stream).
    binary_payloads: bool = False


@dataclass
class GeneratedCorpus:
    sim: SimCorpus
    pages: list[CorpusPage]
    robots: dict[str, str]
    seeds: list[dict]              # url, priority, doc_id_override
    hosts: list[str] = field(default_factory=list)

    def pages_records(self) -> list[dict]:
        """Rows for the Spark corpus table (input_hint shape + fetch meta)."""
        out = []
        for p in self.pages:
            out.append({
                "doc_id": p.url,
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in p.spans
                ],
                "status_code": p.status_code,
                "redirect_to": p.redirect_to,
                "content_type": p.content_type,
                "content_length": p.content_length,
                "content_data": p.content_data,
            })
        return out

    def robots_records(self) -> list[dict]:
        return [{"host": h, "body": b} for h, b in sorted(self.robots.items())]

    def seeds_records(self) -> list[dict]:
        return list(self.seeds)


def _zipf_counts(rng: random.Random, n_hosts: int, n_pages: int, s: float) -> list[int]:
    weights = [1.0 / (i + 1) ** s for i in range(n_hosts)]
    total = sum(weights)
    counts = [max(2, int(round(n_pages * w / total))) for w in weights]
    # fix rounding drift on the hot host
    counts[0] += n_pages - sum(counts)
    counts[0] = max(counts[0], 2)
    return counts


def generate_corpus(spec: CorpusSpec | None = None) -> GeneratedCorpus:
    spec = spec or CorpusSpec()
    rng = random.Random(spec.seed)

    hosts = [f"host{i}.example.com" for i in range(spec.n_hosts)]
    counts = _zipf_counts(rng, spec.n_hosts, spec.n_pages, spec.zipf_s)

    # --- URL universe ----------------------------------------------------
    urls: list[str] = []
    host_of: dict[str, str] = {}
    for host, cnt in zip(hosts, counts):
        for j in range(cnt):
            if rng.random() < spec.frac_private:
                path = f"/private/p{j}.html"
            elif j % 3 == 0:
                path = f"/a/b/p{j}.html"   # nested → exercises ../ resolution
            else:
                path = f"/p{j}.html"
            u = f"http://{host}{path}"
            urls.append(u)
            host_of[u] = host

    n = len(urls)
    rng.shuffle(urls)

    # --- page-type assignment -------------------------------------------
    types: dict[str, str] = {}
    i = 0

    def take(frac: float, label: str) -> None:
        nonlocal i
        k = int(n * frac)
        for u in urls[i : i + k]:
            types[u] = label
        i += k

    take(spec.frac_text, "text")
    take(spec.frac_binary, "binary")
    take(spec.frac_redirect, "redirect")
    take(spec.frac_too_big, "toobig")
    for u in urls[i:]:
        types[u] = "html"

    urls_sorted = sorted(urls)  # deterministic target-pick order

    def pick_target(src_host: str) -> str:
        if rng.random() < spec.frac_missing_target:
            return f"http://{src_host}/missing/m{rng.randrange(10_000)}.html"
        if rng.random() < spec.frac_cross_host:
            return rng.choice(urls_sorted)
        same = [u for u in rng.sample(urls_sorted, min(20, n))
                if host_of.get(u) == src_host]
        return same[0] if same else rng.choice(urls_sorted)

    def href_for(target: str, src_url: str) -> str:
        """Render target as an href, sometimes relative / trap-decorated."""
        href = target
        src_host = host_of.get(src_url)
        if host_of.get(target) == src_host and rng.random() < spec.frac_relative_href:
            path = target.split(src_host, 1)[1]
            style = rng.randrange(3)
            if style == 0:
                href = path                        # absolute path
            elif style == 1:
                href = path.lstrip("/")            # relative to site root ctx
                # only correct when src is at root depth; deliberately keep —
                # resolution from a nested src yields a (likely missing) URL,
                # exercising 404 handling identically on both sides
            else:
                href = "../.." + path if path.startswith("/a/b/") else "./" + path.lstrip("/")
        if rng.random() < spec.frac_trap_query:
            href += "?b=2&a=1&jsessionid=XYZ123"
        return href

    # --- build pages -----------------------------------------------------
    pages: list[CorpusPage] = []
    for u in urls_sorted:
        t = types[u]
        if t == "redirect":
            status = rng.choice([301, 302, 303, 307, 308])
            # mostly to a real page; sometimes chain to another redirect
            target = rng.choice(urls_sorted)
            pages.append(CorpusPage(
                url=u, status_code=status, redirect_to=target,
                content_type="text/html", content_length=0, spans=[]))
            continue
        if t == "toobig":
            pages.append(CorpusPage(
                url=u, status_code=200, content_type="text/html; charset=UTF-8",
                content_length=spec.max_download_size + 1, spans=[]))
            continue
        if t == "binary":
            ctype = rng.choice(["image/png", "application/pdf", "audio/mpeg"])
            if not spec.binary_payloads:
                pages.append(CorpusPage(
                    url=u, status_code=200, content_type=ctype,
                    content_length=rng.randrange(1000, 50_000), spans=[]))
                continue
            # Deterministic fake payload: format magic + opaque byte noise
            # with real target URLs stored as plain byte runs (the shape
            # Tika surfaces from PDF /URI actions, EXIF/XMP, ID3 WXXX).
            # A crc32-keyed third of binary pages stay payload-less to
            # cover the Tika-parse-failure branch (html null → no
            # outlinks, BinaryParseData.java:76-78).
            if zlib.crc32(b"binpay:" + u.encode()) % 3 == 0:
                pages.append(CorpusPage(
                    url=u, status_code=200, content_type=ctype,
                    content_length=rng.randrange(1000, 50_000), spans=[]))
                continue
            magic = {"image/png": b"\x89PNG\r\n\x1a\n",
                     "application/pdf": b"%PDF-1.4\n",
                     "audio/mpeg": b"ID3\x03\x00"}[ctype]
            parts = [magic]
            for _ in range(rng.randrange(1, 3)):
                parts.append(bytes(rng.randrange(256) for _ in range(24)))
                parts.append(b"\x00" + pick_target(host_of[u]).encode()
                             + b"\x00")
            parts.append(bytes(rng.randrange(256) for _ in range(16)))
            data = b"".join(parts)
            pages.append(CorpusPage(
                url=u, status_code=200, content_type=ctype,
                content_length=len(data), spans=[], content_data=data))
            continue
        if t == "text":
            # body text with embedded absolute URLs (regex-extractable)
            k = rng.randrange(1, 4)
            targets = [pick_target(host_of[u]) for _ in range(k)]
            words = rng.sample(_WORDS, 6)
            text = " ".join(words[:3]) + " " + \
                " see ".join(targets) + " " + " ".join(words[3:])
            if rng.random() < 0.5:
                # X8 charset page: raw ISO-8859-1 payload (non-ASCII chars),
                # decoded by the parse stage from the charset= header param
                text = "café ü§é " + text
                data = text.encode("iso-8859-1")
                ctype = "text/plain; charset=ISO-8859-1"
                # A deterministic slice declares an UNKNOWN charset name:
                # Page.load throws UnsupportedCharsetException -> content-
                # fetch error, no visit, no outlinks (crc32-keyed, not rng,
                # so the rest of the page population is unchanged).
                if zlib.crc32(u.encode()) % 11 == 0:
                    ctype = "text/plain; charset=x-bogus-ebcdic"
                pages.append(CorpusPage(
                    url=u, status_code=200, content_type=ctype,
                    content_length=len(data), spans=[], content_data=data))
                continue
            spans = [("text", text, None, 0)]
            pages.append(CorpusPage(
                url=u, status_code=200, content_type="text/plain",
                content_length=len(text), spans=spans))
            continue

        # html page: interleaved text and link spans in document order
        spans = []
        off = 0
        spans.append(("text", " ".join(rng.sample(_WORDS, 5)) + " ", None, off))
        off += 1
        fan = max(1, int(rng.gauss(spec.fanout, 2)))
        chosen: list[str] = []
        for _ in range(fan):
            target = pick_target(host_of[u])
            chosen.append(target)
            if chosen and rng.random() < spec.frac_dup_link:
                chosen.append(chosen[rng.randrange(len(chosen))])
        for tgt in chosen:
            kind = rng.choices(
                ["a", "img", "iframe", "link", "area", "embed", "frame", "meta"],
                weights=[60, 15, 5, 5, 4, 3, 3, 5])[0]
            href = href_for(tgt, u)
            anchor = None
            if kind in ("a", "area", "link"):
                anchor = " ".join(rng.sample(_WORDS, rng.randrange(1, 4)))
            spans.append((kind, anchor, href, off))
            off += 1
            if rng.random() < 0.5:
                spans.append(("text", " ".join(rng.sample(_WORDS, 3)) + " ", None, off))
                off += 1
        pages.append(CorpusPage(
            url=u, status_code=200, content_type="text/html; charset=UTF-8",
            content_length=sum(len(s[1] or "") for s in spans), spans=spans))

    # --- robots ----------------------------------------------------------
    robots: dict[str, str] = {}
    for idx, host in enumerate(hosts):
        if idx % 5 == 3:
            continue  # no robots.txt → allow all
        if idx % 7 == 6:
            robots[host] = "User-agent: crawler4j\nDisallow: /\n"  # block all
        elif idx % 2 == 0:
            robots[host] = (
                "# robots for " + host + "\n"
                "User-agent: *\nDisallow: /wildcard-noop/\n"
                "User-agent: crawler4j\nDisallow: /private/\n"
                "Allow: /private/open/\n"
            )
        else:
            # wildcard-only section: cannot block anything in this fork
            robots[host] = "User-agent: *\nDisallow: /\n"

    # --- seeds -----------------------------------------------------------
    seeds: list[dict] = []
    for idx in range(min(4, len(hosts))):
        host = hosts[idx]
        first = next(u for u in urls_sorted if host_of[u] == host)
        seeds.append({"url": first, "priority": 0, "doc_id_override": None})
    # duplicate seed (second add returns -1)
    seeds.append(dict(seeds[0]))
    # raw (uncanonical) seed → same canonical as a plain host URL
    seeds.append({"url": f"http://{hosts[0].upper()}/p1.html?b=2&a=1",
                  "priority": 1, "doc_id_override": None})
    # invalid seed
    seeds.append({"url": "not a url", "priority": 0, "doc_id_override": None})
    # robots-blocked seed (host idx 6 when present is disallow-all)
    if len(hosts) > 6:
        blocked_host = hosts[6]
        first_blocked = next(
            (u for u in urls_sorted if host_of[u] == blocked_host), None)
        if first_blocked and blocked_host in robots and \
                "Disallow: /\n" in robots[blocked_host] and \
                "crawler4j" in robots[blocked_host]:
            seeds.append({"url": first_blocked, "priority": 0,
                          "doc_id_override": None})

    sim = SimCorpus({p.url: p for p in pages}, robots)
    return GeneratedCorpus(sim=sim, pages=pages, robots=robots, seeds=seeds,
                           hosts=hosts)
