"""HTML → main-text kernel.

Pure Python; runs inside Arrow-batched pandas UDFs.  Reproduces the behavior
of the reference CleanHTML pipeline
(/root/reference/jionlp/rule/html_cleansing.py:68-120): collapse whitespace
runs, extract <meta> info, strip script/style/table/form/footer/meta/comment
blocks, iteratively remove nav/menu/sidebar <div> blocks by id/class keyword
with a nested-div stack walk (html_cleansing.py:157-253), turn <br> into
newlines and close-of-paragraph/heading tags into leading newlines, strip all
remaining tags, and unescape HTML entities.

Several reference regexes contain idiosyncrasies (e.g. the ``[NAME][name]=``
attribute pattern, html_rule_pattern.py:53) which are reproduced as-is —
behavior parity beats prettiness here.
"""

from __future__ import annotations

import html as _html
import re

# block-level elements whose whole content is dropped
# (html_rule_pattern.py:22-29)
_BLOCK = '(<{t}(.|\\n)*?>(.|\\n)*?</{t}>|<{T}(.|\\n)*?>(.|\\n)*?</{T}>)'

_SCRIPT = re.compile(_BLOCK.format(t='script', T='SCRIPT'))
_STYLE = re.compile(_BLOCK.format(t='style', T='STYLE'))
_TABLE = re.compile(_BLOCK.format(t='table', T='TABLE'))
_FORM = re.compile(_BLOCK.format(t='form', T='FORM'))
_FOOTER = re.compile(_BLOCK.format(t='footer', T='FOOTER'))

_META = re.compile('<meta.*?>')
_COMMENT = re.compile('<!--(.|\n)*?-->')
_BR = re.compile('(<br>|<BR>)')
_ANY_TAG = re.compile('<(.|\n)*?>')
_WS_RUN = re.compile('[\n\t]+')  # html_rule_pattern.py:62 (final definition)
_PARA_CLOSE = re.compile(r'(</p>|</h1>|</h2>|</h3>|</h4>|</h5>)')

_DIV_START = re.compile('(<(div|DIV)[^<>]*>)')
_DIV_END = re.compile('(</(div|DIV)>)')

# attribute extractors — quirks preserved (html_rule_pattern.py:53-57)
_NAME_ATTR = re.compile(r'[NAME][name]=(?P<Quote>["\']?)(?P<TagName>[\w\-] *?)(?P=Quote)')
_CONTENT_ATTR = re.compile(r'[Content][content]=(?P<Quote>["\']?)(?P<TagContent>[\w\- ]*?)(?P=Quote)')
_ID_ATTR = re.compile(r'[iI][dD]=(?P<Quote>["\']?)(?P<TagID>[\w\- ]*?)(?P=Quote)')
_CLASS_ATTR = re.compile(r'(CLASS|class)=(?P<Quote>["\']?)(?P<TagClass>[\w\- ]*?)(?P=Quote)')

# a div whose id/class contains any of these keywords is boilerplate
# (html_cleansing.py:41-46)
DIV_BOILERPLATE_KEYWORDS = (
    'menu', 'nav',
    'header', 'footer', 'after-content',
    'archive', 'bloglist', 'blog-list', 'catalog',
    'sidebar', 'side-bar', 'side-content',
    'cookie',
)

_META_KEYS = ('description', 'keywords', 'classification', 'language')


def extract_meta_info(html_text: str) -> dict:
    """Pull description/keywords/classification/language out of <meta> tags
    (html_cleansing.py:122-155)."""
    meta: dict = {}
    for item in _META.findall(html_text):
        name_m = _NAME_ATTR.search(item)
        if name_m is None:
            continue
        name = name_m.group('TagName')
        content_m = _CONTENT_ATTR.search(item)
        if content_m is None:
            continue
        if name in _META_KEYS:
            meta[name] = content_m.group('TagContent')
    return meta


def _find_boilerplate_div(html_text: str):
    """First <div ...> whose id/class hits a boilerplate keyword; returns the
    match object or None (html_cleansing.py:169-189)."""
    for m in _DIV_START.finditer(html_text):
        tag = m.group()
        id_m = _ID_ATTR.search(tag)
        class_m = _CLASS_ATTR.search(tag)
        for kw in DIV_BOILERPLATE_KEYWORDS:
            if id_m and kw in id_m.group('TagID').lower():
                return m
            if class_m and kw in class_m.group('TagClass').lower():
                return m
    return None


def remove_boilerplate_div(html_text: str):
    """Remove one boilerplate div block including nested divs; returns
    (new_html, changed).  Mirrors the stack walk of
    html_cleansing.py:157-253 including its edge-case branches."""
    m = _find_boilerplate_div(html_text)
    if m is None or m.span()[1] == 0:
        return html_text, False

    start_offset = m.span()[1]
    nested: list = []
    end_offset = 0
    while True:
        start_res = _DIV_START.search(html_text[start_offset:])
        end_res = _DIV_END.search(html_text[start_offset:])

        if start_res is not None and end_res is not None:
            if start_res.span()[0] < end_res.span()[0]:
                nested.append(start_res)
                start_offset += start_res.span()[1]
            elif start_res.span()[0] > end_res.span()[0]:
                if nested:
                    nested.pop()
                    if not nested:
                        end_offset = end_res.span()[1] + start_offset
                        break
                    start_offset += end_res.span()[1]
                else:
                    end_offset = start_offset  # no nested children
                    break
            else:
                break
        elif start_res is not None:
            break
        elif end_res is not None:
            if nested:
                nested.pop()
                if not nested:
                    end_offset = end_res.span()[1] + start_offset
                    break
                start_offset += end_res.span()[1]
            else:
                end_offset = start_offset
                break
        else:
            break

    if end_offset == 0:
        return html_text, False

    # consume the matching </div> of the opening boilerplate div
    tail = _DIV_END.search(html_text[end_offset:])
    if tail is not None:
        end_offset += tail.span()[1]
    return html_text[:m.span()[0]] + html_text[end_offset:], True


def clean_html(raw: str) -> tuple:
    """Full pipeline → (main_text, meta_info) (html_cleansing.py:68-120)."""
    text = _WS_RUN.sub('', raw)
    meta = extract_meta_info(text)

    for pat in (_SCRIPT, _STYLE, _TABLE, _FORM, _FOOTER, _META, _COMMENT):
        text = pat.sub('', text)

    while True:
        text, changed = remove_boilerplate_div(text)
        if not changed:
            break

    text = _BR.sub('\n', text)
    text = _PARA_CLOSE.sub(r'\n\1', text)
    text = _ANY_TAG.sub('', text)
    return _html.unescape(text), meta
