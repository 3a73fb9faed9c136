"""Block-level main-content extraction (boilerplate removal) — pure
Python, zero Spark.

The step between raw crawl HTML and the reference's text cleaning:
``kernels/html_clean.clean_html`` (the reference-parity port) strips
markup but keeps ALL text — nav bars, footers, and link farms included
— which is exactly the layer ``dedup_paragraphs`` later has to cut
corpus-statistically.  This kernel removes them structurally per
document, the justext/Arc90-readability heuristic (Kohlschütter et al.
WSDM'10 boilerplate detection family): split the document into
block-level segments, score each by text length and LINK DENSITY
(anchor-text chars / text chars), and keep the long, low-link blocks.
North-rule plumbing for the web-scale input table — the reference has
no crawler-side extractor; not a reference port.

Deterministic and closed-form replayable: a block's verdict is
``kept`` iff ``n_chars >= min_len`` and ``link_chars * den_cap <=
n_chars * num_cap`` is avoided entirely — the density compare is
integer cross-multiplied (``link_chars * 2 <= n_chars`` for the 0.5
default), so no float threshold ever ties.  All regexes run in Python
``re`` (CLAUDE.md kernel rule).
"""

from __future__ import annotations

import re
from typing import NamedTuple

_DROP_RE = re.compile(
    r'<(script|style|noscript)(?:\s[^>]*)?>.*?</\1\s*>', re.I | re.S)
_COMMENT_RE = re.compile(r'<!--.*?-->', re.S)
_BLOCK_TAG_RE = re.compile(
    r'<(?:/?(?:p|div|td|th|li|ul|ol|dl|dt|dd|h[1-6]|table|tr|article|'
    r'section|header|footer|nav|aside|main|figure|figcaption|'
    r'blockquote|pre|form|body|html)(?:\s[^>]*)?|br\s*/?)>', re.I)
_A_RE = re.compile(r'<a(?:\s[^>]*)?>(.*?)</a\s*>', re.I | re.S)
_TAG_RE = re.compile(r'<[^>]*>')
_WS_RE = re.compile(r'\s+')
_ENTITY_RE = re.compile(
    r'&(#[xX][0-9a-fA-F]+|#[0-9]+|amp|lt|gt|quot|apos);')
_NAMED = {'amp': '&', 'lt': '<', 'gt': '>', 'quot': '"', 'apos': "'"}


def _text(fragment: str) -> str:
    """Inline tags stripped, entities decoded in one pass, whitespace
    collapsed to single spaces and trimmed."""
    t = _TAG_RE.sub(' ', fragment)

    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e[:2].lower() == '#x':
            return chr(int(e[2:], 16))
        if e.startswith('#'):
            return chr(int(e[1:]))
        return _NAMED[e.lower()]

    t = _ENTITY_RE.sub(sub, t)
    return _WS_RE.sub(' ', t).strip()


class ContentBlock(NamedTuple):
    text: str
    n_chars: int
    link_chars: int
    kept: bool


def content_blocks(html: str | None, min_len: int = 30,
                   link_num: int = 1, link_den: int = 2) -> list[ContentBlock]:
    """HTML → scored block list, document order.  A block is kept iff
    its collapsed text has ≥ ``min_len`` chars AND its link density is
    at most ``link_num/link_den`` — compared as ``link_chars *
    link_den <= n_chars * link_num`` (integer cross-multiply, the
    host_curation rule: no float-ratio tie risk)."""
    if not html:
        return []
    h = _COMMENT_RE.sub(' ', html)
    h = _DROP_RE.sub(' ', h)
    blocks = []
    for seg in _BLOCK_TAG_RE.split(h):
        txt = _text(seg)
        if not txt:
            continue
        link_chars = sum(len(_text(m.group(1)))
                         for m in _A_RE.finditer(seg))
        n = len(txt)
        kept = n >= min_len and link_chars * link_den <= n * link_num
        blocks.append(ContentBlock(txt, n, link_chars, kept))
    return blocks


def extract_content(html: str | None, min_len: int = 30,
                    link_num: int = 1,
                    link_den: int = 2) -> tuple[str, int, int]:
    """→ (content, n_kept, n_dropped): kept blocks joined with a
    single newline, in document order."""
    bs = content_blocks(html, min_len, link_num, link_den)
    kept = [b.text for b in bs if b.kept]
    return '\n'.join(kept), len(kept), len(bs) - len(kept)
