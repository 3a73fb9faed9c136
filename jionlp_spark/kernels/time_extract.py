"""Time mention extraction kernel.

Behavioral port of the reference TimeExtractor
(/root/reference/jionlp/algorithm/ner/time_extractor.py:96-283): a wide
char-class sweep proposes candidates (with fake-positive rejection, e.g.
`三点五度`), each candidate is grid-searched longest-first with a 35-char
bound, every trial substring passes boundary filters and then a strict
``parse_time`` — successful parse = acceptance.  Parse details ride along.

Note: time coverage = the TimeParser subset (see timeparse.py docstring);
strings from unported families simply fail to parse, exactly as an
unparseable string does in the reference.
"""

from __future__ import annotations

import re

from . import patterns as P
from .timeparse import get_time_parser

_NON_TIME_STRINGS = {'一点', '0时', '一日', '黎明', '十分', '百分', '万分'}
_SINGLE_CHAR_TIME = {'春', '夏', '秋', '冬'}


def _extract_brackets(s: str) -> list:
    pairs = {')': '(', '）': '（'}
    stack, starts, out = [], [], []
    for i, ch in enumerate(s):
        if ch in '(（':
            stack.append(ch)
            starts.append(i)
        elif ch in pairs:
            if stack and stack[-1] == pairs[ch]:
                stack.pop()
                out.append(s[starts.pop(): i + 1])
    return out


_BRACKET_RE = re.compile(r'\([^()]*\)|（[^（）]*）')


def _remove_brackets(s: str) -> str:
    prev = len(s)
    while True:
        s = _BRACKET_RE.sub('', s)
        if len(s) == prev:
            return s
        prev = len(s)


class TimeExtractor:
    def __init__(self) -> None:
        self.parser = get_time_parser()
        self._candidate = re.compile(P.TIME_CHAR_STRING)
        self._fake_positive = re.compile(P.FAKE_POSITIVE_TIME_PATTERN)
        self._fake_start = re.compile(P.FAKE_POSITIVE_START_STRING)
        self._fake_end = re.compile(P.FAKE_POSITIVE_END_STRING)
        self._num = re.compile(r'[０-９0-9一二三四五六七八九十百千万]')
        self._four_num_year = re.compile(r'^[\d]{4}$')
        self._unit = re.compile(r'(多)?[万亿元]')
        # single-char predicate caches: grid_search runs _fake_start/_fake_end
        # /_num on ONE char per trial — a dict hit replaces a regex search
        # (bounded by the distinct chars seen, i.e. the charset)
        self._fs_chars: dict = {}
        self._fe_chars: dict = {}
        self._num_chars: dict = {}

    def _is_fake_start(self, ch: str) -> bool:
        v = self._fs_chars.get(ch)
        if v is None:
            v = self._fs_chars[ch] = self._fake_start.search(ch) is not None
        return v

    def _is_fake_end(self, ch: str) -> bool:
        v = self._fe_chars.get(ch)
        if v is None:
            v = self._fe_chars[ch] = self._fake_end.search(ch) is not None
        return v

    def _is_num_char(self, ch: str) -> bool:
        v = self._num_chars.get(ch)
        if v is None:
            v = self._num_chars[ch] = self._num.search(ch) is not None
        return v

    def candidates(self, text: str) -> list:
        out = []
        idx = 0
        n = len(text)
        while idx < n:
            m = self._candidate.search(text[idx:])
            if m is None:
                break
            if self._fake_positive.search(m.group()) is not None:
                idx += m.span()[1]
                continue
            if len(m.group()) > 1 or m.group() in _SINGLE_CHAR_TIME:
                out.append({'time_candidate': m.group(),
                            'offset': [idx + m.span()[0],
                                       idx + m.span()[1]]})
            idx += m.span()[1]
        return out

    def _filter(self, sub: str) -> bool:
        # same predicates as the reference, single-char tests via the
        # char caches ('的' in sub[0] ≡ sub[0] == '的' for a 1-char string)
        if self._is_fake_start(sub[0]):
            return False
        if self._is_fake_end(sub[-1]) and sub[-2:] not in ('夏至', '冬至'):
            return False
        if len(sub) != len(sub.strip()):
            return False
        if sub[0] == '的' or sub[-1] == '的':
            return False
        if sub[0] in ')）' or sub[-1] in '(（':
            return False
        return True

    def grid_search(self, time_candidate: str, time_base):
        length = min(len(time_candidate), 35)
        for i in range(length):
            for j in range(i):
                offset = [j, length - i + j + 1]
                sub = time_candidate[j: offset[1]]
                try:
                    if not self._filter(sub):
                        continue
                    for_parse = sub.replace('的', '').replace(' ', '')
                    # _extract_brackets returns [] unless an OPENING bracket
                    # exists (a closer never matches an empty stack) — skip
                    # the char scan for the bracket-free common case
                    if '(' in for_parse or '（' in for_parse:
                        inner = _extract_brackets(for_parse)
                        if '周' in ''.join(inner) or '星期' in ''.join(inner):
                            for_parse = _remove_brackets(for_parse)
                    # digit-bounded strings glued to more digits are id
                    # fragments, not times (time_extractor.py:211-220)
                    if self._is_num_char(for_parse[0]) and j - 1 >= 0 and \
                            self._is_num_char(time_candidate[j - 1]):
                        continue
                    if self._is_num_char(for_parse[-1]) and \
                            offset[1] < length and \
                            self._is_num_char(time_candidate[offset[1]]):
                        continue
                    result = self.parser.parse(
                        for_parse, time_base=time_base, strict=True)
                    return sub, result, offset
                except (ValueError, Exception):
                    continue
        return None, None, None

    def extract(self, text: str, time_base, with_parsing: bool = True,
                ret_all: bool = False) -> list:
        out = []
        for candidate in self.candidates(text):
            offset = [0, 0]
            bias = 0
            while candidate['offset'][0] + offset[1] < candidate['offset'][1]:
                sub, result, offset = self.grid_search(
                    candidate['time_candidate'][bias:], time_base)
                if sub is None:
                    break
                if sub in _NON_TIME_STRINGS and not ret_all:
                    bias += offset[1]
                    continue
                if self._four_num_year.search(sub):
                    back = candidate['offset'][0] + bias + offset[1]
                    if self._unit.search(text[back: back + 2]):
                        bias += offset[1]
                        continue
                item = {'text': sub,
                        'offset': [candidate['offset'][0] + bias + offset[0],
                                   candidate['offset'][0] + bias + offset[1]],
                        'type': result['type']}
                if with_parsing:
                    item['detail'] = result
                out.append(item)
                bias += offset[1]
        return out


_SINGLETON: TimeExtractor | None = None


def get_time_extractor() -> TimeExtractor:
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = TimeExtractor()
    return _SINGLETON
