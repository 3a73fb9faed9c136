"""Hyperlink extraction from raw HTML — the web-graph side of the KG
pipeline.

JioNLP's CleanHTML (reference ``rule/html_cleansing.py:68-120``) treats
anchors as boilerplate to delete; a web-scale KG pipeline needs the
opposite view of the same markup: the ``<a href>`` edges ARE the data
(host link graph, anchor-text alias table).  This kernel is therefore a
new capability, not a reference port — it follows the repo kernel rules
(pure Python, ``re`` only, no pyspark imports) so the Spark operator can
run it batch-vectorized inside the existing fused-UDF machinery.

Extraction contract (deterministic, documented — the DuckDB oracles
reproduce it closed-form over injected corpora):

- an anchor is ``<a ...href=VALUE...>INNER</a>`` (case-insensitive tag /
  attribute, VALUE double-quoted, single-quoted, or bare-to-whitespace);
- hrefs with a non-web scheme (``javascript:``, ``mailto:``, ``tel:``,
  ``data:``, ``ftp:`` …) and pure fragments (``#…``) are dropped;
- ``http(s)://`` and protocol-relative ``//`` hrefs resolve to their own
  authority; anything else (path-relative) resolves to the base URL's
  host — the same-host approximation of RFC 3986 resolution (path
  merging is irrelevant for a host-level graph);
- host = authority lowercased, userinfo and port stripped;
- anchor text = inner HTML with tags stripped and whitespace collapsed
  (``' '.join(split())``), entities left as-is (the cleaning stage owns
  entity decoding).
"""

from __future__ import annotations

import re

__all__ = ['extract_links', 'url_host']

_ANCHOR_RE = re.compile(
    r'<a\s[^>]*?href\s*=\s*'
    r'(?:"([^"]*)"|\'([^\']*)\'|([^\s>]+))'
    r'[^>]*>(.*?)</a\s*>',
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r'<[^>]*>')
# any scheme prefix (RFC 3986 scheme = ALPHA *( ALPHA / DIGIT / + / - / . ))
_SCHEME_RE = re.compile(r'^([a-zA-Z][a-zA-Z0-9+.-]*):')
_WEB_SCHEMES = ('http', 'https')


def url_host(url: str) -> str | None:
    """Lowercased host of an absolute or protocol-relative URL; None if
    the string has no web authority."""
    if url.startswith('//'):
        rest = url[2:]
    else:
        m = _SCHEME_RE.match(url)
        if m is None or m.group(1).lower() not in _WEB_SCHEMES:
            return None
        rest = url[m.end():]
        if not rest.startswith('//'):
            return None
        rest = rest[2:]
    authority = re.split(r'[/?#]', rest, maxsplit=1)[0]
    if '@' in authority:                      # strip userinfo
        authority = authority.rsplit('@', 1)[1]
    host = authority.rsplit(':', 1)[0] if re.search(r':\d*$', authority) \
        else authority
    host = host.lower()
    return host or None


def extract_links(html: str, base_url: str) -> list[dict]:
    """→ [{'href': raw href, 'dst_host': resolved host, 'anchor': text}]
    for every kept anchor, in document order (duplicates preserved —
    link multiplicity is the edge weight upstream)."""
    base_host = url_host(base_url)
    out = []
    for m in _ANCHOR_RE.finditer(html):
        href = next(g for g in m.group(1, 2, 3) if g is not None).strip()
        if not href or href.startswith('#'):
            continue
        sm = _SCHEME_RE.match(href)
        if href.startswith('//') or (
                sm is not None and sm.group(1).lower() in _WEB_SCHEMES):
            dst = url_host(href)
        elif sm is not None:          # non-web scheme (mailto:, js:, …)
            continue
        else:                         # path-relative → base host
            dst = base_host
        if dst is None:
            continue
        anchor = ' '.join(_TAG_RE.sub(' ', m.group(4)).split())
        out.append({'href': href, 'dst_host': dst, 'anchor': anchor})
    return out


_LINK_TAG_RE = re.compile(r'<link\s[^>]*>', re.IGNORECASE | re.DOTALL)
_REL_RE = re.compile(
    r'''\brel\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))''', re.IGNORECASE)
_HREF_RE = re.compile(
    r'''\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))''', re.IGNORECASE)


def extract_canonical(html: str) -> str | None:
    """The page's ``<link rel="canonical" href=...>`` declaration — the
    author-side dedup hint crawlers fold into URL canonicalization
    (url_dedup handles URL-shape variants; rel=canonical is the page
    saying "I am a copy of X" across DIFFERENT shapes).  First
    canonical link wins (browser behavior); rel may be a multi-token
    value (``rel="canonical nofollow"``); attribute order, case, and
    quoting are free; ``<link>`` tags without a canonical rel (icons,
    stylesheets) are ignored.  Returns the href as written (resolution
    is the operator's job), or None."""
    if not html:
        return None
    for tag in _LINK_TAG_RE.findall(html):
        rm = _REL_RE.search(tag)
        if rm is None:
            continue
        rel = (rm.group(1) or rm.group(2) or rm.group(3) or '')
        if 'canonical' not in rel.lower().split():
            continue
        hm = _HREF_RE.search(tag)
        if hm is None:
            continue
        href = (hm.group(1) or hm.group(2) or hm.group(3) or '').strip()
        return href or None
    return None
