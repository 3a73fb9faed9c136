"""robots.txt parsing + path matching (RFC 9309, the Robots Exclusion
Protocol) — pure Python, zero Spark (kernel rules, CLAUDE.md).

The crawl-side counterpart of kernels/urlnorm.py: canonicalization
decides *which* URL names a page, robots decides *whether the crawler
may fetch it*.  The reference has no crawler (it consumes already-
fetched text), so this kernel is north-rule plumbing for the web-scale
input table (BASELINE.json input_hint: a crawl of url/html rows), not a
reference port.

Semantics implemented (RFC 9309 §2.2):

- groups: consecutive ``User-agent:`` lines share the following rules;
  the group chosen for an agent is the one whose user-agent token is
  the LONGEST case-insensitive prefix of the product token; ``*``
  matches any agent and is used only when no specific group matches.
  Multiple groups naming the same agent merge.
- matching: the rule whose pattern matches the longest prefix (octet
  count) wins; on a length tie an ``allow`` rule wins; no matching
  rule → allowed.  Empty ``Disallow:`` means allow-all (the historical
  form).
- wildcards: ``*`` matches any char sequence, ``$`` anchors the end —
  both per the RFC's extension every major crawler implements.
  Wildcard matching runs in Python ``re`` (regex kernels never run in
  Spark SQL regex, CLAUDE.md); match LENGTH for precedence is the
  PATTERN length, the RFC's deterministic proxy (Google's
  implementation does the same).

Lines are parsed tolerantly: ``#`` comments stripped, keys
case-insensitive, unknown keys ignored, BOM tolerated.
"""

from __future__ import annotations

import re
from typing import NamedTuple


class RobotsRule(NamedTuple):
    allow: bool         # True = Allow, False = Disallow
    path: str           # the raw pattern as written (after %-space strip)


def parse_robots(text: str, agent: str = '*') -> list[RobotsRule]:
    """robots.txt body → the merged rule list of the group(s) governing
    ``agent``.  Specific-agent groups beat the ``*`` group; among
    specific groups the longest matching user-agent token wins (RFC
    9309 §2.2.1)."""
    if text is None:
        return []
    agent_l = agent.lower()
    groups: dict[str, list[RobotsRule]] = {}
    current: list[str] = []
    in_group_header = False
    for raw in text.splitlines():
        line = raw.lstrip('﻿')
        hash_i = line.find('#')
        if hash_i >= 0:
            line = line[:hash_i]
        line = line.strip()
        if not line or ':' not in line:
            continue
        key, _, val = line.partition(':')
        key = key.strip().lower()
        val = val.strip()
        if key == 'user-agent':
            ua = val.lower()
            if not in_group_header:
                current = []
                in_group_header = True
            current.append(ua)
            for u in current:
                groups.setdefault(u, [])
            continue
        in_group_header = False
        if key in ('allow', 'disallow'):
            if not current:
                continue                      # rule before any group: ignored
            if key == 'disallow' and val == '':
                continue                      # empty Disallow = allow-all
            rule = RobotsRule(key == 'allow', val)
            for u in current:
                groups.setdefault(u, []).append(rule)
        # other keys (crawl-delay, sitemap, …) end the header run only

    best_ua = None
    for ua in groups:
        if ua != '*' and agent_l.startswith(ua):
            if best_ua is None or len(ua) > len(best_ua):
                best_ua = ua
    if best_ua is None and '*' in groups:
        best_ua = '*'
    return list(groups.get(best_ua, [])) if best_ua is not None else []


def _pattern_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith('$')
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split('*')]
    rx = '.*'.join(parts)
    return re.compile(rx + ('$' if anchored else ''))


def robots_allowed(path: str, rules: list[RobotsRule]) -> tuple[bool, str | None]:
    """(path, rules) → (allowed, deciding_pattern).  Longest-pattern
    match wins; allow wins ties; equal (len, allow) ties break to the
    lexicographically-smallest pattern so the reported pattern is
    identical to the declarative JVM path's (length desc, allow desc,
    pattern asc) window order — rule-set order never leaks into the
    verdict OR the deciding pattern.  No match → (True, None).
    ``path`` must include the leading '/' (query string included per
    RFC)."""
    if not path.startswith('/'):
        path = '/' + path
    best: tuple[int, int, str] | None = None    # (len, allow, pattern)
    for allow, pattern in rules:
        if not pattern:
            continue
        if ('*' in pattern) or pattern.endswith('$'):
            if _pattern_regex(pattern).match(path) is None:
                continue
        elif not path.startswith(pattern):
            continue
        key = (len(pattern), 1 if allow else 0)
        if (best is None or key > (best[0], best[1])
                or (key == (best[0], best[1]) and pattern < best[2])):
            best = (key[0], key[1], pattern)
    if best is None:
        return True, None
    return bool(best[1]), best[2]


class RobotsDirectives(NamedTuple):
    crawl_delay: float | None   # seconds, from the agent's governing group
    sitemaps: list[str]         # every Sitemap: line, global per RFC 9309


def parse_robots_directives(text: str,
                            agent: str = '*') -> RobotsDirectives:
    """robots.txt body → the non-rule directives crawl control consumes:

    - ``Sitemap:`` is GLOBAL (RFC 9309 §2.3 treats it as outside any
      group — every major search engine collects it wherever it
      appears), so every non-empty value is returned in file order,
      deduplicated case-sensitively (sitemap URLs are opaque).
    - ``Crawl-delay:`` is per-GROUP (non-standard but honored by most
      crawlers): the value returned is the FIRST parseable one in the
      group governing ``agent``, chosen by the same longest-prefix
      group-selection rule as :func:`parse_robots` — a specific
      group's delay beats ``*`` even when only ``*`` declares one
      (an explicit group match means the site addressed this agent).
      Non-numeric and negative values are ignored (tolerant parsing,
      like unknown keys).

    Group tracking mirrors parse_robots line-for-line so the governing
    group never disagrees between rules and directives.
    """
    if text is None:
        return RobotsDirectives(None, [])
    agent_l = agent.lower()
    delays: dict[str, float] = {}
    groups: list[str] = []
    sitemaps: list[str] = []
    seen: set[str] = set()
    current: list[str] = []
    in_group_header = False
    for raw in text.splitlines():
        line = raw.lstrip('﻿')
        hash_i = line.find('#')
        if hash_i >= 0:
            line = line[:hash_i]
        line = line.strip()
        if not line or ':' not in line:
            continue
        key, _, val = line.partition(':')
        key = key.strip().lower()
        val = val.strip()
        if key == 'user-agent':
            ua = val.lower()
            if not in_group_header:
                current = []
                in_group_header = True
            current.append(ua)
            for u in current:
                if u not in groups:
                    groups.append(u)
            continue
        in_group_header = False
        if key == 'sitemap':
            if val and val not in seen:
                seen.add(val)
                sitemaps.append(val)
            continue
        if key == 'crawl-delay' and current:
            try:
                d = float(val)
            except ValueError:
                continue
            if d >= 0:
                for u in current:
                    if u not in delays:
                        delays[u] = d
    best_ua = None
    for ua in groups:
        if ua != '*' and agent_l.startswith(ua):
            if best_ua is None or len(ua) > len(best_ua):
                best_ua = ua
    if best_ua is None and '*' in groups:
        best_ua = '*'
    return RobotsDirectives(
        delays.get(best_ua) if best_ua is not None else None, sitemaps)
