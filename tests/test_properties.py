"""Property-based tests (hypothesis) for the URL and robots kernels —
robustness beyond the ported fixed vectors."""

import re
import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from crawler4j_spark.functions.robots import RuleSet
from crawler4j_spark.functions.urlkit import canonicalize, split_domain

_pathchars = st.text(
    alphabet=string.ascii_letters + string.digits + "/._-~%+ ?&=#:@!,;'()[]",
    max_size=60)
_hosts = st.from_regex(r"[a-zA-Z0-9]([a-zA-Z0-9-]{0,10}\.){1,3}[a-zA-Z]{2,6}",
                       fullmatch=True)


@settings(max_examples=300, deadline=None)
@given(host=_hosts, rest=_pathchars)
def test_canonicalize_idempotent(host, rest):
    """canonicalize is a projection: canonicalize(canonicalize(x)) ==
    canonicalize(x) whenever x canonicalizes at all."""
    url = f"http://{host}/{rest}"
    c = canonicalize(url)
    if c is not None:
        assert canonicalize(c) == c


# A '%' not followed by two hex digits is an invalid escape: the reference's
# percentEncodeRfc3986 catches the decode exception and returns the query
# param UNCHANGED (URLCanonicalizer.java:197-206), so raw spaces legally
# survive in such params. The space invariant below must admit that branch.
_BAD_ESCAPE = re.compile(r"%(?![0-9a-fA-F]{2})")


@settings(max_examples=300, deadline=None)
@example(host="0.AA", rest="? %")   # pinned: bad-escape passthrough keeps ' '
@given(host=_hosts, rest=_pathchars)
def test_canonicalize_never_crashes_and_shape(host, rest):
    url = f"http://{host}/{rest}"
    c = canonicalize(url)
    if c is not None:
        assert c.startswith(("http://", "https://", "ftp://"))
        assert "#" not in c          # fragments always dropped
        if not _BAD_ESCAPE.search(url):
            # spaces never survive — except via the reference's bad-percent-
            # escape passthrough (see _BAD_ESCAPE note above)
            assert " " not in c
        # host is lowercased
        auth = c.split("://", 1)[1].split("/", 1)[0]
        assert auth == auth.lower()


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=80))
def test_canonicalize_arbitrary_garbage_no_crash(s):
    canonicalize(s)            # None or a string — never an exception
    canonicalize(s, "http://base.example.com/a/b")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab/", min_size=1, max_size=8), max_size=12),
       st.text(alphabet="ab/", min_size=1, max_size=12))
def test_ruleset_matches_bruteforce(rules, probe):
    """Minimal-prefix RuleSet.contains_prefix_of == naive any-prefix scan."""
    rs = RuleSet()
    for r in rules:
        rs.add(r)
    naive = any(probe.startswith(r) for r in rules)
    assert rs.contains_prefix_of(probe) == naive


@settings(max_examples=200, deadline=None)
@given(host=_hosts)
def test_split_domain_reconstructs_host(host):
    d, sub, _ = split_domain(f"http://{host}/x")
    joined = f"{sub}.{d}" if sub else d
    assert joined.lower() == host.lower()
