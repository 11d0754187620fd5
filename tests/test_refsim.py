"""Reference-simulator unit tests: hand-computed mini-graphs (SURVEY §5.2)
plus structural checks on the generated corpus."""

from crawler4j_spark.plans.refsim import CorpusPage, RefSim, SimConfig, SimCorpus
from crawler4j_spark.sources.corpus import CorpusSpec, generate_corpus


def page(url, links=None, status=200, ctype="text/html; charset=UTF-8", **kw):
    spans = []
    off = 0
    for href, anchor in (links or []):
        spans.append(("a", anchor, href, off))
        off += 1
    return CorpusPage(url=url, status_code=status, content_type=ctype,
                      spans=spans, **kw)


def mini_corpus():
    pages = {
        "http://a.com/": page("http://a.com/", [
            ("/x.html", "to x"), ("/y.html", "to y"), ("/x.html", "dup x"),
        ]),
        "http://a.com/x.html": page("http://a.com/x.html", [
            ("y.html", "rel y"), ("http://b.com/", "to b"),
        ]),
        "http://a.com/y.html": page("http://a.com/y.html", []),
        "http://b.com/": page("http://b.com/", [("http://a.com/", "back")]),
    }
    return SimCorpus(pages, {})


def test_bfs_and_docids():
    sim = RefSim(mini_corpus())
    assert sim.add_seed("http://a.com/") == 1
    sim.crawl()
    # discovery order: seed=1; from seed: x=2, y=3; from x: b.com/=4
    assert sim.seen == {
        "http://a.com/": 1,
        "http://a.com/x.html": 2,
        "http://a.com/y.html": 3,
        "http://b.com/": 4,
    }
    assert [v["url"] for v in sim.visited] == [
        "http://a.com/", "http://a.com/x.html", "http://a.com/y.html",
        "http://b.com/",
    ]
    assert [v["docid"] for v in sim.visited] == [1, 2, 3, 4]
    assert sim.processed_pages == 4
    assert sim.scheduled_pages == 4


def test_duplicate_seed_rejected():
    sim = RefSim(mini_corpus())
    assert sim.add_seed("http://a.com/") == 1
    assert sim.add_seed("http://a.com/") == -1
    assert sim.add_seed("not a url") == -1


def test_depth_gate_still_mints_docids():
    sim = RefSim(mini_corpus(), SimConfig(max_depth=1))
    sim.add_seed("http://a.com/")
    sim.crawl()
    # depth0: a.com/ visits; depth1: x, y visit; x's outlinks minted but
    # NOT scheduled (cur.depth=1 == max_depth)
    assert [v["url"] for v in sim.visited] == [
        "http://a.com/", "http://a.com/x.html", "http://a.com/y.html"]
    # b.com/ consumed a docid despite never being scheduled
    assert sim.seen["http://b.com/"] == 4


def test_max_pages_gate():
    sim = RefSim(mini_corpus(), SimConfig(max_pages=2))
    sim.add_seed("http://a.com/")
    sim.crawl()
    # seed takes slot 1; only x admitted (slot 2); y/b never scheduled
    assert [v["url"] for v in sim.visited] == [
        "http://a.com/", "http://a.com/x.html"]


def test_priority_and_depth_ordering():
    pages = {
        f"http://h.com/p{i}.html": page(f"http://h.com/p{i}.html", [])
        for i in range(4)
    }
    sim = RefSim(SimCorpus(pages, {}))
    # higher byte value = later; lower priority value crawls first
    sim.add_seed("http://h.com/p0.html", priority=5)
    sim.add_seed("http://h.com/p1.html", priority=-3)
    sim.add_seed("http://h.com/p2.html", priority=0)
    sim.add_seed("http://h.com/p3.html", priority=0)
    sim.crawl()
    assert [v["url"] for v in sim.visited] == [
        "http://h.com/p1.html",   # priority -3
        "http://h.com/p2.html",   # priority 0, docid 3
        "http://h.com/p3.html",   # priority 0, docid 4
        "http://h.com/p0.html",   # priority 5
    ]


def test_redirect_same_depth_and_docid():
    pages = {
        "http://a.com/": page("http://a.com/", [("/r.html", "r")]),
        "http://a.com/r.html": CorpusPage(
            url="http://a.com/r.html", status_code=302,
            redirect_to="http://a.com/t.html"),
        "http://a.com/t.html": page("http://a.com/t.html", []),
    }
    sim = RefSim(SimCorpus(pages, {}), SimConfig(max_depth=1))
    sim.add_seed("http://a.com/")
    sim.crawl()
    # r.html is depth 1; its redirect target keeps depth 1 (not gated by
    # max_depth=1 since redirects skip the depth gate) and mints docid 3
    assert sim.seen["http://a.com/t.html"] == 3
    assert [v["url"] for v in sim.visited] == [
        "http://a.com/", "http://a.com/t.html"]
    assert sim.visited[-1]["depth"] == 1


def test_redirect_to_seen_dropped():
    pages = {
        "http://a.com/": page("http://a.com/", [("/r.html", "r")]),
        "http://a.com/r.html": CorpusPage(
            url="http://a.com/r.html", status_code=301,
            redirect_to="http://a.com/"),
    }
    sim = RefSim(SimCorpus(pages, {}))
    sim.add_seed("http://a.com/")
    sim.crawl()
    assert [v["url"] for v in sim.visited] == ["http://a.com/"]


def test_robots_exact_section_blocks_scheduling():
    pages = {
        "http://a.com/": page("http://a.com/", [
            ("/private/s.html", "secret"), ("/open.html", "open")]),
        "http://a.com/private/s.html": page("http://a.com/private/s.html", []),
        "http://a.com/open.html": page("http://a.com/open.html", []),
    }
    robots = {"a.com": "User-agent: crawler4j\nDisallow: /private/\n"}
    sim = RefSim(SimCorpus(pages, robots))
    sim.add_seed("http://a.com/")
    sim.crawl()
    assert [v["url"] for v in sim.visited] == [
        "http://a.com/", "http://a.com/open.html"]
    # blocked URL still minted a docid
    assert "http://a.com/private/s.html" in sim.seen


def test_politeness_interleaves_hosts():
    pages = {}
    links = []
    for i in range(3):
        pages[f"http://a.com/p{i}.html"] = page(f"http://a.com/p{i}.html", [])
        links.append((f"http://a.com/p{i}.html", "a"))
    pages["http://b.com/q.html"] = page("http://b.com/q.html", [])
    links.insert(2, ("http://b.com/q.html", "b"))
    pages["http://seed.com/"] = page("http://seed.com/", links)
    sim = RefSim(SimCorpus(pages, {}), SimConfig(politeness_ms=100))
    sim.add_seed("http://seed.com/")
    sim.crawl()
    order = [v["url"] for v in sim.visited]
    # a/p0 first (no delay), then b/q jumps ahead of a's backed-up queue
    assert order[0] == "http://seed.com/"
    assert order[1] == "http://a.com/p0.html"
    assert order[2] == "http://b.com/q.html"
    assert order[3:] == ["http://a.com/p1.html", "http://a.com/p2.html"]


def test_text_page_raw_urls():
    pages = {
        "http://a.com/": CorpusPage(
            url="http://a.com/", content_type="text/plain",
            spans=[("text", "read http://b.com/x.html now", None, 0)]),
        "http://b.com/x.html": page("http://b.com/x.html", []),
    }
    sim = RefSim(SimCorpus(pages, {}))
    sim.add_seed("http://a.com/")
    sim.crawl()
    assert sim.seen["http://b.com/x.html"] == 2
    assert [v["url"] for v in sim.visited] == [
        "http://a.com/", "http://b.com/x.html"]


def test_binary_not_included_by_default():
    pages = {
        "http://a.com/": page("http://a.com/", [("/i.png", None)]),
        "http://a.com/i.png": CorpusPage(
            url="http://a.com/i.png", content_type="image/png"),
    }
    sim = RefSim(SimCorpus(pages, {}))
    sim.add_seed("http://a.com/")
    sim.crawl()
    assert [v["url"] for v in sim.visited] == ["http://a.com/"]
    sim2 = RefSim(SimCorpus(pages, {}), SimConfig(include_binary=True))
    sim2.add_seed("http://a.com/")
    sim2.crawl()
    assert [v["url"] for v in sim2.visited] == [
        "http://a.com/", "http://a.com/i.png"]


def test_binary_outlinks_need_process_binary():
    # Parser.java:61-75: include_binary gates the visit; process_binary
    # gates the Tika-analog outlink extraction from the raw payload.
    payload = b"\x89PNG\x00\x00http://a.com/found.html\x00\xff"
    pages = {
        "http://a.com/": page("http://a.com/", [("/i.png", None)]),
        "http://a.com/i.png": CorpusPage(
            url="http://a.com/i.png", content_type="image/png",
            content_length=len(payload), content_data=payload),
        "http://a.com/found.html": page("http://a.com/found.html", []),
    }

    def crawl(cfg):
        sim = RefSim(SimCorpus(pages, {}), cfg)
        sim.add_seed("http://a.com/")
        sim.crawl()
        return [v["url"] for v in sim.visited]

    # visited but NOT processed: extractUrls("<html></html>") finds nothing
    assert crawl(SimConfig(include_binary=True)) == [
        "http://a.com/", "http://a.com/i.png"]
    # processed: the payload's URL run is extracted and scheduled
    assert crawl(SimConfig(include_binary=True, process_binary=True)) == [
        "http://a.com/", "http://a.com/i.png", "http://a.com/found.html"]


def test_seed_end_events():
    sim = RefSim(mini_corpus())
    sim.add_seed("http://a.com/")
    sim.crawl()
    assert sim.seed_end_events == [1]


def test_generated_corpus_runs():
    g = generate_corpus(CorpusSpec(n_pages=120, n_hosts=6, seed=7))
    sim = RefSim(g.sim, SimConfig(max_depth=4))
    for s in g.seeds:
        sim.add_seed(s["url"], priority=s["priority"])
    sim.crawl()
    assert len(sim.visited) > 20
    assert len(sim.seen) >= len(sim.visited)
    # every visited page has its span sequence recorded
    for v in sim.visited:
        assert v["url"] in sim.documents
    # deterministic: same spec → same crawl
    g2 = generate_corpus(CorpusSpec(n_pages=120, n_hosts=6, seed=7))
    sim2 = RefSim(g2.sim, SimConfig(max_depth=4))
    for s in g2.seeds:
        sim2.add_seed(s["url"], priority=s["priority"])
    sim2.crawl()
    assert [v["url"] for v in sim.visited] == [v["url"] for v in sim2.visited]
    assert sim.seen == sim2.seen


def test_warm_start_add_seen_url():
    sim = RefSim(mini_corpus())
    assert sim.add_seen_url("http://a.com/x.html", 5)
    assert not sim.add_seen_url("http://a.com/x.html", 6)   # dup
    assert not sim.add_seen_url("http://a.com/y.html", 3)   # non-increasing
    # next seed mints above the warm-start high-water mark
    assert sim.add_seed("http://a.com/") == 6
    sim.crawl()
    # x.html was pre-seen: never re-minted, never visited
    assert sim.seen["http://a.com/x.html"] == 5
    assert "http://a.com/x.html" not in [v["url"] for v in sim.visited]


def test_seed_doc_id_override():
    sim = RefSim(mini_corpus())
    assert sim.add_seed("http://a.com/", docid=10) == 10
    # later mints continue from the override
    sim.crawl()
    assert sim.seen["http://a.com/x.html"] == 11
