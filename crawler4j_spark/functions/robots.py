"""robots.txt kernels: parser, minimal-prefix rule sets, allow decision.

Pure-Python re-implementation of the reference semantics
(``robotstxt/RobotstxtParser.java:37-110``, ``robotstxt/RuleSet.java:28-52``,
``robotstxt/HostDirectives.java:43-58``, ``robotstxt/RobotstxtServer.java:58-84``).
Used by the reference simulator, the Spark robots-refresh pandas UDF, and the
unit tests.

Semantics replicated exactly:

* ``#`` comments stripped, then any ``<...>`` HTML markup removed, then trim.
* Case-insensitive ``User-agent:`` / ``Disallow:`` / ``Allow:`` prefixes
  (``Disallow``/``Allow`` match anywhere-prefix via the reference's
  ``line.matches("(?i)Disallow:.*")`` — i.e. the line must START with the
  keyword since ``matches`` anchors the whole string... note the reference
  patterns lack a leading ``^`` but ``String.matches`` is full-match anchored,
  so the keyword must be at position 0 after trimming).
* A trailing ``*`` on a rule path is stripped; an empty ``Disallow:`` clears
  the accumulated disallow rules; an empty ``Allow:`` adds nothing ("" is
  dropped by RuleSet.add? — no: addAllow("") inserts the empty string, which
  is then a prefix of everything; replicated).
* Exact user-agent sections ("ua == agent") collect into the *specific*
  directives; any matching section ("*" or substring-contains) collects into
  the general directives.
* Rule sets keep a minimal prefix set: inserting a string covered by an
  existing prefix is a no-op; inserting a new prefix evicts entries it covers.
* Final decision (RobotstxtServer.allows:79):
  ``specific.allows(path) || (general.allows(path) && !specific.disallows(path))``
  where ``allows(p) = !disallows.containsPrefixOf(p) || allows.containsPrefixOf(p)``
  and ``disallows(p) = disallows.containsPrefixOf(p) && !allows.containsPrefixOf(p)``.
"""

from __future__ import annotations

import bisect
import re
from dataclasses import dataclass, field

__all__ = [
    "RuleSet",
    "HostDirectives",
    "parse_robots",
    "robots_allows",
    "directives_to_arrays",
    "arrays_allow",
]

_HTML_MARKUP = re.compile(r"<[^>]+>")
_UA_PREFIX_LEN = len("User-agent:")
_DISALLOW_PREFIX_LEN = len("Disallow:")
_ALLOW_PREFIX_LEN = len("Allow:")


class RuleSet:
    """Sorted minimal prefix set (reference RuleSet extends TreeSet)."""

    def __init__(self) -> None:
        self._items: list[str] = []

    def add(self, s: str) -> bool:
        i = bisect.bisect_left(self._items, s)
        # anything strictly before s that is a prefix of s makes s redundant
        if i > 0 and s.startswith(self._items[i - 1]):
            return False
        if i < len(self._items) and self._items[i] == s:
            return False
        self._items.insert(i, s)
        # evict following entries that s covers
        j = i + 1
        while j < len(self._items) and self._items[j].startswith(s):
            del self._items[j]
        return True

    def clear(self) -> None:
        self._items.clear()

    def contains_prefix_of(self, s: str) -> bool:
        i = bisect.bisect_left(self._items, s)
        if i > 0 and s.startswith(self._items[i - 1]):
            return True
        return i < len(self._items) and self._items[i] == s

    def as_list(self) -> list[str]:
        return list(self._items)


@dataclass
class HostDirectives:
    disallows: RuleSet = field(default_factory=RuleSet)
    allows: RuleSet = field(default_factory=RuleSet)

    def add_disallow(self, path: str) -> None:
        if path == "":
            self.disallows.clear()
        else:
            self.disallows.add(path)

    def add_allow(self, path: str) -> None:
        self.allows.add(path)

    def is_allowed(self, path: str) -> bool:
        return (not self.disallows.contains_prefix_of(path)) or \
            self.allows.contains_prefix_of(path)

    def is_disallowed(self, path: str) -> bool:
        return self.disallows.contains_prefix_of(path) and \
            not self.allows.contains_prefix_of(path)


def _strip_rule_path(line: str, prefix_len: int) -> str:
    path = line[prefix_len:].strip()
    if path.endswith("*"):
        path = path[:-1]
    return path.strip()


def parse_robots(
    content: str,
    user_agent: str = "crawler4j",
    ignore_ua_in_allow: bool = False,
) -> tuple[HostDirectives, HostDirectives]:
    """Parse robots.txt body → (general_directives, specific_directives)."""
    general = HostDirectives()
    specific = HostDirectives()
    in_matching = False
    in_exact = False

    for raw in content.split("\n"):
        line = raw
        hash_at = line.find("#")
        if hash_at > -1:
            line = line[:hash_at]
        line = _HTML_MARKUP.sub("", line).strip()
        if not line:
            continue
        lower = line.lower()
        if lower.startswith("user-agent:"):
            ua = line[_UA_PREFIX_LEN:].strip().lower()
            in_matching = ua == "*" or user_agent in ua
            in_exact = ua == user_agent
        elif lower.startswith("disallow:"):
            if not in_matching:
                continue
            path = _strip_rule_path(line, _DISALLOW_PREFIX_LEN)
            # NOTE: the reference guards `if (path.length() > 0)` before
            # calling addDisallow (RobotstxtParser.java:80), so an empty
            # `Disallow:` line (and `Disallow: *` after the trailing-`*`
            # strip) is silently ignored — HostDirectives' clear-on-empty
            # is unreachable from the parser. Replicated faithfully.
            if path:
                (specific if in_exact else general).add_disallow(path)
        elif lower.startswith("allow:"):
            if not in_matching and not ignore_ua_in_allow:
                continue
            path = _strip_rule_path(line, _ALLOW_PREFIX_LEN)
            (specific if in_exact else general).add_allow(path)
    return general, specific


def robots_allows(
    general: HostDirectives, specific: HostDirectives, path: str
) -> bool:
    """RobotstxtServer.allows decision rule (RobotstxtServer.java:79)."""
    return specific.is_allowed(path) or (
        general.is_allowed(path) and not specific.is_disallowed(path)
    )


# ---------------------------------------------------------------------------
# Array codecs for the Spark robots_rules table
# ---------------------------------------------------------------------------

def directives_to_arrays(
    general: HostDirectives, specific: HostDirectives
) -> tuple[list[str], list[str], list[str], list[str]]:
    """(gen_disallow, gen_allow, spec_disallow, spec_allow) sorted lists for
    storage in the robots_rules table; re-hydrated with ``arrays_allow``."""
    return (
        general.disallows.as_list(),
        general.allows.as_list(),
        specific.disallows.as_list(),
        specific.allows.as_list(),
    )


def _sorted_contains_prefix_of(items: list[str], s: str) -> bool:
    if not items:
        return False
    i = bisect.bisect_left(items, s)
    if i > 0 and s.startswith(items[i - 1]):
        return True
    return i < len(items) and items[i] == s


def arrays_allow(
    gen_dis: list[str], gen_alw: list[str],
    spec_dis: list[str], spec_alw: list[str],
    path: str,
) -> bool:
    """Same decision as robots_allows over stored sorted prefix arrays."""
    def allowed(dis, alw):
        return (not _sorted_contains_prefix_of(dis, path)) or \
            _sorted_contains_prefix_of(alw, path)

    def disallowed(dis, alw):
        return _sorted_contains_prefix_of(dis, path) and \
            not _sorted_contains_prefix_of(alw, path)

    return allowed(spec_dis, spec_alw) or (
        allowed(gen_dis, gen_alw) and not disallowed(spec_dis, spec_alw)
    )
