"""sitemaps.org protocol parsing — pure Python, zero Spark.

The discovery half of crawl control, pairing kernels/robots.py: robots
decides whether a URL may be fetched, the sitemap tells the crawler
which URLs exist and when they changed — the push input to frontier
planning (recrawl_plan consumes churn, sitemap ``lastmod`` is the
site's own churn declaration).  The reference has no crawler (it
consumes already-fetched text), so this kernel is north-rule plumbing
for the web-scale input table, not a reference port.

Parsing is a tolerant tag scan, not an XML parser (real-crawl sitemaps
are full of undeclared entities, stray bytes, and truncated tails that
break strict parsers; every major crawler scans):

- the document kind is the first root tag found — ``<urlset`` →
  page entries in ``<url>`` blocks, ``<sitemapindex`` → child sitemap
  pointers in ``<sitemap>`` blocks; neither → no entries;
- per block, ``<loc>`` (required — blocks without a non-empty loc are
  skipped), ``<lastmod>``, ``<changefreq>``, ``<priority>`` (optional
  → None); tags match case-insensitively, attributes tolerated,
  values whitespace-trimmed;
- ``<![CDATA[...]]>`` wrappers are stripped (their payload is literal
  — no entity decoding inside), otherwise the five standard XML
  entities plus numeric ``&#NN;``/``&#xHH;`` forms decode in ONE pass
  (one-pass decoding never double-decodes ``&amp;lt;``).

All regexes run in Python ``re`` only (CLAUDE.md kernel rule).
"""

from __future__ import annotations

import re
from typing import NamedTuple


class SitemapEntry(NamedTuple):
    loc: str
    lastmod: str | None
    changefreq: str | None
    priority: str | None


_URLSET_RE = re.compile(r'<\s*urlset[\s>]', re.I)
_INDEX_RE = re.compile(r'<\s*sitemapindex[\s>]', re.I)
_BLOCK_RE = {
    'urlset': re.compile(r'<url(?:\s[^>]*)?>(.*?)</\s*url\s*>',
                         re.I | re.S),
    'sitemapindex': re.compile(
        r'<sitemap(?:\s[^>]*)?>(.*?)</\s*sitemap\s*>', re.I | re.S),
}
_FIELD_RES = {
    f: re.compile(rf'<{f}(?:\s[^>]*)?>(.*?)</\s*{f}\s*>', re.I | re.S)
    for f in ('loc', 'lastmod', 'changefreq', 'priority')
}
_CDATA_RE = re.compile(r'^<!\[CDATA\[(.*)\]\]>$', re.S)
_ENTITY_RE = re.compile(
    r'&(#[xX][0-9a-fA-F]+|#[0-9]+|amp|lt|gt|quot|apos);')
_NAMED = {'amp': '&', 'lt': '<', 'gt': '>', 'quot': '"', 'apos': "'"}


def _decode(raw: str) -> str:
    """Trim, strip one CDATA wrapper (literal payload), else decode
    entities in one pass."""
    v = raw.strip()
    m = _CDATA_RE.match(v)
    if m:
        return m.group(1).strip()

    def sub(em: re.Match) -> str:
        e = em.group(1)
        if e.startswith('#'):
            # tolerant: an out-of-range code point (&#99999999; — real
            # feeds carry these) stays literal instead of raising
            try:
                cp = int(e[2:], 16) if e[:2].lower() == '#x' \
                    else int(e[1:])
                return chr(cp)
            except (ValueError, OverflowError):
                return em.group(0)
        return _NAMED[e.lower()]

    return _ENTITY_RE.sub(sub, v)


def sitemap_kind(text: str | None) -> str | None:
    """'urlset' | 'sitemapindex' | None — decided by the FIRST root
    tag present (a sitemapindex never nests a urlset, but junk bytes
    may mention either word; requiring the tag form avoids that)."""
    if not text:
        return None
    u = _URLSET_RE.search(text)
    i = _INDEX_RE.search(text)
    if u and (not i or u.start() < i.start()):
        return 'urlset'
    if i:
        return 'sitemapindex'
    return None


def parse_sitemap(text: str | None) -> tuple[str | None,
                                             list[SitemapEntry]]:
    """sitemap XML → (kind, entries).  kind None → no entries.  Entry
    order is document order (deterministic)."""
    kind = sitemap_kind(text)
    if kind is None:
        return None, []
    entries: list[SitemapEntry] = []
    for block in _BLOCK_RE[kind].finditer(text):
        body = block.group(1)
        vals = {}
        for f, rx in _FIELD_RES.items():
            m = rx.search(body)
            vals[f] = _decode(m.group(1)) if m else None
        if not vals['loc']:
            continue
        entries.append(SitemapEntry(vals['loc'], vals['lastmod'],
                                    vals['changefreq'],
                                    vals['priority']))
    return kind, entries
