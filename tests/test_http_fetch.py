"""Reference HTTP transport (sources/http_fetch.py) driven end-to-end
against a loopback http.server stub — the closest a sandbox without
network can get to PageFetcher.java:263-347. Covers: per-host serialized
fetching with a real politeness gap, redirect surfacing (3xx NOT
auto-followed), HTML→spans extraction feeding the normal parse stage,
404 and size-overflow error channels."""

import http.server
import threading

import pytest

from crawler4j_spark.plans.engine import CrawlEngine, EngineConfig
from crawler4j_spark.plans.refsim import SimConfig
from crawler4j_spark.sources.http_fetch import html_to_spans, http_fetch_fn

# crawl-space host → pages. URLs crawl as http://siteN.example/...; the
# transport's url_rewrite points them at the loopback server, which routes
# on the path prefix.
# hrefs are CRAWL-SPACE paths (resolved against http://siteN.example/);
# only the transport's url_rewrite knows about the loopback server.
PAGES = {
    "/site0/": '<html><a href="/a">A</a> and '
               '<img src="/pic.png"> tail</html>',
    "/site0/a": '<html><a href="/redir">R</a>'
                '<a href="/missing">M</a><a href="/big">G</a></html>',
    "/site0/pic.png": "binary",          # image content-type
    "/site0/big": "x",                   # served oversized
    "/site1/": '<html><a href="/b">B</a>'
               '<a href="http://site0.example/">cross</a></html>',
    "/site1/b": "<html>leaf</html>",
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        path = self.path
        if path == "/site0/redir":
            self.send_response(301)
            self.send_header("Location", "http://site0.example/a")
            self.end_headers()
            return
        if path == "/site0/big":
            body = b"y" * 4096
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)
            return
        body = PAGES.get(path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        ctype = "image/png" if path.endswith(".png") else "text/html"
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def stub_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_port
    srv.shutdown()


def test_html_to_spans_document_order():
    spans = html_to_spans(
        'lead <a href="/x">anchor</a> mid <img src="/i.png"> '
        '<meta http-equiv="refresh" content="0;url=/next"> tail')
    got = [(s["kind"], s["media_ref"]) for s in spans]
    assert got == [
        ("text", None), ("a", "/x"), ("text", None), ("img", "/i.png"),
        ("meta", "/next"), ("text", None),
    ]
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets)
    assert spans[1]["text"] == "anchor"


def test_html_to_spans_meta_refresh_quoting():
    # Quoted targets must lose the surrounding quotes; unquoted targets
    # end at the next ';' parameter separator.
    cases = {
        '<meta http-equiv="refresh" content=\'0; url="http://x/q"\'>':
            "http://x/q",
        "<meta http-equiv='refresh' content=\"0; url='http://y/s'\">":
            "http://y/s",
        '<meta http-equiv="refresh" content="5; url=http://z/u; foo=bar">':
            "http://z/u",
    }
    for html, want in cases.items():
        spans = html_to_spans(html)
        assert [(s["kind"], s["media_ref"]) for s in spans] == [
            ("meta", want)], html
    # An empty target after stripping emits no span at all.
    assert html_to_spans(
        '<meta http-equiv="refresh" content="0; url=\'\'">') == []


def test_http_transport_end_to_end(spark, tmp_path, stub_server):
    port = stub_server

    def to_loopback(url: str) -> str:
        # http://siteN.example/p → http://127.0.0.1:port/siteN/p
        host, _, path = url.removeprefix("http://").partition("/")
        site = host.split(".", 1)[0]
        return f"http://127.0.0.1:{port}/{site}/{path}"

    fetch = http_fetch_fn(
        politeness_ms=50, max_download_size=1024,
        url_rewrite=to_loopback)
    cfg = EngineConfig(
        sim=SimConfig(max_depth=-1, robots_enabled=False, politeness_ms=50,
                      max_download_size=1024, include_binary=True),
        round_size=25, n_seen_buckets=8, expected_urls_per_bucket=100,
        mint_buckets=4, fetch_fn=fetch)
    eng = CrawlEngine(spark, str(tmp_path / "store"), None, None, cfg)
    seeds = [{"url": "http://site0.example/", "priority": 0,
              "doc_id_override": None},
             {"url": "http://site1.example/", "priority": 0,
              "doc_id_override": None}]
    assert eng.add_seeds(seeds) == [1, 2]
    eng.crawl(max_rounds=20)

    visited = {r["url"] for r in eng.visited_log().select("url").collect()}
    # redirect target /a reached via 301 (redirect channel, not auto-follow);
    # pic.png visited because include_binary=True; /big and /missing are
    # error-channel pages, never visited
    # 3xx pages themselves are never "visited" (no error handler, no
    # document — WebCrawler semantics); the redirect TARGET /a is already
    # reached via the direct link and dedups to one visit.
    assert visited == {
        "http://site0.example/", "http://site0.example/a",
        "http://site0.example/pic.png",
        "http://site1.example/", "http://site1.example/b",
    }

    errs = {(r["url"], r["status"]) for r in
            eng.errors_log().select("url", "status").collect()}
    assert ("http://site0.example/missing", 404) in errs
    # size overflow: 4096 > max_download_size 1024 → error channel
    assert any(u == "http://site0.example/big" for u, _ in errs)
    assert eng.frontier_pending() == 0
