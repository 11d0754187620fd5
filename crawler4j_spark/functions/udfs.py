"""Vectorized pandas/Arrow UDFs wrapping the pure-Python kernels.

Per ``BASELINE.json.input_hint`` every row-wise computation runs as an
Arrow-batched pandas UDF (one Python call per batch, never Spark's
row-at-a-time ``F.udf``). The kernels themselves live in ``urlkit``/
``robots``/``spans``/``netkit`` so the reference simulator and the Spark
engine share one executable definition of the semantics.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from . import urlkit
from .netkit import bad_charset_mask
from .robots import arrays_allow, directives_to_arrays, parse_robots

__all__ = [
    "canonicalize_udf",
    "canonicalize_with_context_udf",
    "outlink_canonical_udf",
    "host_udf",
    "path_udf",
    "domain_split_udf",
    "robots_allow_udf",
    "parse_robots_udf_factory",
    "bad_charset_udf",
    "DOMAIN_STRUCT",
]


# Batch-level prescreens: pandas str ops run in C over the whole Arrow
# batch; only the rows that miss the provably-identity fast pattern fall
# back to the per-element Python kernel. The canonicalize fast pattern is
# property-tested against the slow path (tests/test_urlkit.py); the
# host/path patterns are restricted to shapes where the capture IS the
# kernel result (no userinfo/brackets/params, lowercase host).
# '?' terminates the authority in _parse_rfc1808 ONLY when no '/' follows
# anywhere before '#' (RFC1808 finds the first '/' across the whole spec,
# query included — 'http://h?next=/home' has host 'h?next=' and path
# '/home').  So '?' is a valid fast-path terminator only under the
# negative lookahead (?![^#]*/); rows like '?next=/home' fall back to the
# per-element kernel.  Property-tested vs the kernel in
# tests/test_urlkit.py::test_simple_host_path_fast_paths_match_kernel.
_SIMPLE_HOST = re.compile(
    r"^[a-z][a-z0-9+.-]*://([a-z0-9.-]+)(?::\d+)?(?:[/#]|$|\?(?![^#]*/))")
_SIMPLE_PATH = re.compile(
    r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#;]*"
    r"(?:(/[^?#;]*)(?:[?#]|$)|(?:#|$|\?(?![^#]*/)))")


@F.pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """URLCanonicalizer.getCanonicalURL(url) — null for invalid URLs."""
    mask = urls.str.match(urlkit._CANONICAL_FAST).eq(True)
    out = urls.copy()
    slow = ~mask
    if slow.any():
        out[slow] = urls[slow].map(
            lambda u: urlkit.canonicalize(u) if u is not None else None)
    return out


def canonicalize_batch(hrefs: pd.Series, contexts: pd.Series) -> pd.Series:
    """Batch canonicalize(href, context): the _CANONICAL_FAST prescreen runs
    in C over the whole Arrow batch (a match is provably identity, context
    irrelevant — property-tested in tests/test_urlkit.py); only misses fall
    back to the per-element kernel. Shared by the context UDF below and the
    vectorized parse stage (operators/parse.py)."""
    mask = hrefs.str.match(urlkit._CANONICAL_FAST).eq(True)
    out = hrefs.copy()
    slow = ~mask
    if slow.any():
        out[slow] = [
            urlkit.canonicalize(h, c) if h is not None else None
            for h, c in zip(hrefs[slow], contexts[slow])
        ]
    return out


@F.pandas_udf(StringType())
def canonicalize_with_context_udf(hrefs: pd.Series, contexts: pd.Series) -> pd.Series:
    return canonicalize_batch(hrefs, contexts)


def outlink_canonical_batch(hrefs: pd.Series, contexts: pd.Series) -> pd.Series:
    """The parse stage's per-href Python work, batched: strip + junk filter
    (Parser.java:138-144, same predicate as functions.spans.link_hrefs —
    pandas .str ops have exact Python-string semantics, so engine and
    simulator cannot drift) + canonicalize (prescreened). Returns NULL for
    junk hrefs AND for canonicalize failures: the reference skips both
    without counting them toward the outlink cap (url_count++ only runs
    after a non-null canonical, Parser.java:146-155), so one null signal
    carries the exact downstream semantics."""
    s = hrefs.str.strip()
    low = s.str.lower()
    junk = (
        s.eq("")
        | low.str.contains("javascript:", regex=False)
        | low.str.contains("mailto:", regex=False)
        | low.str.contains("@", regex=False)
    )
    out = canonicalize_batch(s, contexts)
    out[junk] = None
    return out


@F.pandas_udf(StringType())
def outlink_canonical_udf(hrefs: pd.Series, contexts: pd.Series) -> pd.Series:
    return outlink_canonical_batch(hrefs, contexts)


@F.pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    """Politeness/robots key: lowercased host, falling back to the full URL
    string when unparseable (PageFetcher.java:219,236-239)."""
    fast = urls.str.extract(_SIMPLE_HOST, expand=False)
    slow = fast.isna() & urls.notna()
    if slow.any():
        fast[slow] = urls[slow].map(lambda u: urlkit.url_host(u) or u)
    return fast


@F.pandas_udf(StringType())
def path_udf(urls: pd.Series) -> pd.Series:
    matched = urls.str.match(_SIMPLE_PATH).eq(True)
    out = urls.str.extract(_SIMPLE_PATH, expand=False).fillna("")
    slow = ~matched & urls.notna()
    if slow.any():
        out[slow] = urls[slow].map(urlkit.url_path)
    return out.where(urls.notna(), None)


@F.pandas_udf(BooleanType())
def bad_charset_udf(content_types: pd.Series) -> pd.Series:
    """True where the Content-Type header names an unknown charset — the
    page becomes a content-fetch error (Page.java:129 ContentType.
    getOrDefault throws; PageFetchResult.java:76-85 returns false →
    onContentFetchError). C-speed prescreen inside bad_charset_mask; null
    content types (fetch misses) are False."""
    return bad_charset_mask(content_types.fillna(""))


DOMAIN_STRUCT = StructType([
    StructField("domain", StringType()),
    StructField("subdomain", StringType()),
    StructField("path", StringType()),
])


@F.pandas_udf(DOMAIN_STRUCT)
def domain_split_udf(urls: pd.Series) -> pd.DataFrame:
    """WebURL.setURL derived fields (registrable domain via public-suffix
    subset broadcast inside the batch)."""
    rows = [urlkit.split_domain(u) if u is not None else (None, None, None)
            for u in urls]
    return pd.DataFrame(rows, columns=["domain", "subdomain", "path"])


@F.pandas_udf(BooleanType())
def robots_allow_udf(
    paths: pd.Series,
    gen_dis: pd.Series, gen_alw: pd.Series,
    spec_dis: pd.Series, spec_alw: pd.Series,
) -> pd.Series:
    """RobotstxtServer.allows over joined robots_rules arrays; hosts with no
    robots row (null arrays) allow everything."""
    out = []
    for p, gd, ga, sd, sa in zip(paths, gen_dis, gen_alw, spec_dis, spec_alw):
        if gd is None and sd is None and ga is None and sa is None:
            out.append(True)
            continue
        out.append(
            arrays_allow(
                list(gd or []), list(ga or []), list(sd or []), list(sa or []),
                p if p is not None else "",
            )
        )
    return pd.Series(out)


ROBOTS_RULES_STRUCT = StructType([
    StructField("gen_disallow", ArrayType(StringType())),
    StructField("gen_allow", ArrayType(StringType())),
    StructField("spec_disallow", ArrayType(StringType())),
    StructField("spec_allow", ArrayType(StringType())),
])


def parse_robots_udf_factory(user_agent: str = "crawler4j",
                             ignore_ua_in_allow: bool = False):
    """Robots-body → sorted prefix arrays, as a pandas UDF (S9/X4)."""

    @F.pandas_udf(ROBOTS_RULES_STRUCT)
    def parse_udf(bodies: pd.Series) -> pd.DataFrame:
        rows = []
        for body in bodies:
            if body is None:
                rows.append(([], [], [], []))
            else:
                gen, spec = parse_robots(body, user_agent, ignore_ua_in_allow)
                rows.append(directives_to_arrays(gen, spec))
        return pd.DataFrame(
            rows,
            columns=["gen_disallow", "gen_allow", "spec_disallow", "spec_allow"],
        )

    return parse_udf
