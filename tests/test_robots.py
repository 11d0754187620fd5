"""Robots kernel tests — fixtures derived from the reference semantics
(RobotstxtParser.java:37-110, RuleSet.java:28-52, HostDirectives.java:43-58,
RobotstxtServer.java:58-84). See FIXTURES.md §2.

IMPORTANT fork quirk, replicated faithfully: the decision rule at
RobotstxtServer.java:79 is

    specific.allows(path) || (general.allows(path) && !specific.disallows(path))

and ``HostDirectives.allows`` is ``!disallows.containsPrefixOf || allows...``.
When the robots.txt has NO exact ``User-agent: <agent>`` section, the
*specific* directives are empty, so ``specific.allows(path)`` is always true
and the whole expression short-circuits to ALLOW — i.e. in this fork,
wildcard/substring-matched sections can never block anything; only rules in an
exact-UA section are effective. (Upstream crawler4j used a single directives
object; the fork's general/specific split introduced this.) The engine
replicates this for parity; fixtures that need blocking use exact-UA sections.
"""

from crawler4j_spark.functions.robots import (
    HostDirectives,
    RuleSet,
    arrays_allow,
    directives_to_arrays,
    parse_robots,
    robots_allows,
)


def allows(body: str, path: str, ua: str = "crawler4j", **kw) -> bool:
    gen, spec = parse_robots(body, ua, **kw)
    return robots_allows(gen, spec, path)


EXACT = "User-agent: crawler4j\n"


def test_ruleset_minimal_prefix():
    rs = RuleSet()
    assert rs.add("/a/b")
    assert not rs.add("/a/b/c")          # covered by existing prefix
    assert rs.add("/a")                  # evicts /a/b
    assert rs.as_list() == ["/a"]
    assert rs.contains_prefix_of("/a/x/y")
    assert rs.contains_prefix_of("/a")
    assert not rs.contains_prefix_of("/b")


def test_ruleset_exact_boundary():
    rs = RuleSet()
    rs.add("/data")
    assert rs.contains_prefix_of("/data")       # exact match
    assert rs.contains_prefix_of("/database")   # prefix match
    assert not rs.contains_prefix_of("/dat")


def test_fork_quirk_wildcard_section_cannot_block():
    # No exact-UA section -> specific.allows() is vacuously true -> ALLOW,
    # even against a general disallow-all. This is the fork's behavior.
    body = "User-agent: *\nDisallow: /\n"
    assert allows(body, "/anything")
    assert allows(body, "/")


def test_exact_section_blocks():
    body = EXACT + "Disallow: /private/\n"
    assert not allows(body, "/private/x.html")
    assert allows(body, "/public/x.html")


def test_exact_disallow_all():
    body = EXACT + "Disallow: /\n"
    assert not allows(body, "/")
    assert not allows(body, "/any")


def test_substring_ua_is_general_only():
    # ua contains "crawler4j" -> matching (general bucket) but not exact,
    # so per the fork quirk its rules cannot block
    body = "User-agent: super-crawler4j-bot\nDisallow: /x/\n"
    gen, spec = parse_robots(body, "crawler4j")
    assert gen.disallows.as_list() == ["/x/"]
    assert spec.disallows.as_list() == []
    assert allows(body, "/x/1")


def test_allow_overrides_disallow_prefix_in_exact_section():
    body = EXACT + "Disallow: /shop/\nAllow: /shop/public/\n"
    assert not allows(body, "/shop/cart")
    assert allows(body, "/shop/public/item")


def test_trailing_star_stripped():
    body = EXACT + "Disallow: /tmp*\n"
    assert not allows(body, "/tmpfiles/x")
    assert not allows(body, "/tmp")
    assert allows(body, "/tm")


def test_disallow_star_alone_is_ignored():
    # "Disallow: *" strips to "" and is dropped by the length guard
    # (RobotstxtParser.java:80)
    body = EXACT + "Disallow: *\n"
    assert allows(body, "/anything")


def test_comments_and_html_markup_stripped():
    body = (
        "# top comment\n"
        + EXACT.rstrip("\n") + " # inline\n"
        + "<b>Disallow:</b> /secret/\n"
        + "Disallow: /real/ # because\n"
    )
    assert not allows(body, "/secret/a")
    assert not allows(body, "/real/a")
    assert allows(body, "/ok")


def test_empty_disallow_ignored():
    body = EXACT + "Disallow:\nDisallow: /x/\n"
    assert not allows(body, "/x/1")
    assert allows(body, "/y")


def test_case_insensitive_keywords():
    body = "USER-AGENT: crawler4j\nDISALLOW: /a/\nallow: /a/b/\n"
    assert not allows(body, "/a/z")
    assert allows(body, "/a/b/z")


def test_rules_outside_matching_section_ignored():
    body = "User-agent: otherbot\nDisallow: /\n"
    gen, spec = parse_robots(body, "crawler4j")
    assert gen.disallows.as_list() == []
    assert allows(body, "/anything")


def test_ignore_ua_in_allow():
    # Allow lines outside a matching section are picked up when the flag is
    # set; they land in the general bucket (not exact)
    body = "User-agent: otherbot\nAllow: /a/\n"
    gen, _ = parse_robots(body, "crawler4j", ignore_ua_in_allow=True)
    assert gen.allows.as_list() == ["/a/"]
    gen2, _ = parse_robots(body, "crawler4j")
    assert gen2.allows.as_list() == []


def test_empty_allow_allows_everything():
    # "Allow: *" strips to "" and IS added (no length guard on Allow);
    # "" is a prefix of every path
    body = EXACT + "Disallow: /\nAllow: *\n"
    assert allows(body, "/x")


def test_array_roundtrip():
    body = (
        "User-agent: *\n"
        "Disallow: /gen/\n"
        + EXACT
        + "Disallow: /shop/\n"
        "Allow: /shop/public/\n"
    )
    gen, spec = parse_robots(body, "crawler4j")
    arrs = directives_to_arrays(gen, spec)
    for path in ["/shop/cart", "/shop/public/a", "/gen/x", "/ok"]:
        assert arrays_allow(*arrs, path) == robots_allows(gen, spec, path)


def test_missing_robots_allow_all():
    # a host without robots.txt gets empty directives -> allow everything
    # (RobotstxtServer.java:121-126)
    gen, spec = HostDirectives(), HostDirectives()
    assert robots_allows(gen, spec, "/anything")
