"""Money mention extraction kernel.

Behavioral port of the reference MoneyExtractor
(/root/reference/jionlp/algorithm/ner/money_extractor.py:77-281): a wide
char-class sweep proposes candidate substrings; each candidate is grid-
searched longest-first and every trial substring must pass the fake-positive
filters and then a full MoneyParser parse — a successful parse IS the
acceptance test.  Multiple entities per candidate are found by re-searching
the candidate tail after each hit.  (The optional jiojio word-boundary check
is off by default in the reference and not ported.)
"""

from __future__ import annotations

import re

from . import patterns as P
from .money import MoneyParseError, get_money_parser

_NON_MONEY_STRINGS = {'多元', '十分', '百分', '万分'}


class MoneyExtractor:
    def __init__(self) -> None:
        self.parser = get_money_parser()
        self._candidate = re.compile(P.MONEY_CHAR_STRING)
        self._num_only = re.compile(P.MONEY_NUM_STRING)
        self._unit = re.compile(P.MONEY_SUFFIX_CASE)
        self._span_seg = re.compile('[-~—－～]+')
        self._kuai_jiao_fen = re.compile(P.MONEY_KUAI_JIAO_FEN)
        self._qianwan_yuan_digit = re.compile(r'[k千仟w万萬亿]元[0-9]')
        # bounded memos: _filter is pure in s except the num-only branch
        # (which consults the candidate context — kept live via the 'num'
        # sentinel); parse failures are pure in the normalized substring
        self._filter_memo: dict = {}
        self._parse_fail_memo: set = set()

    def candidates(self, text: str) -> list:
        """Char-class sweep → candidate spans with ±5 chars of context
        (money_extractor.py:250-281)."""
        out = []
        idx = 0
        n = len(text)
        while idx < n:
            m = self._candidate.search(text[idx:])
            if m is None:
                break
            cand = m.group()
            if len(cand) > 1:
                # a lone 分/毛/角/块 with no 元/钱 anywhere is noise
                if len(''.join(self._kuai_jiao_fen.findall(cand))) == 1 and \
                        '元' not in cand and '钱' not in cand:
                    idx += m.span()[1]
                    continue
                out.append({
                    'money_candidate': cand,
                    'offset': [idx + m.span()[0], idx + m.span()[1]],
                    'context': text[max(0, idx - 5 + m.span()[0]):
                                    min(n, idx + 5 + m.span()[1])],
                })
            idx += m.span()[1]
        return out

    def _filter(self, s: str, candidate: dict) -> bool:
        """Fake-positive rules (money_extractor.py:147-189)."""
        v = self._filter_memo.get(s)
        if v is None:
            if s[0] in '，,' or s[-1] in '，,':
                v = False
            elif self._num_only.search(s):
                v = 'num'   # decided per-candidate below (context cue)
            elif self._qianwan_yuan_digit.search(s):
                v = False  # e.g. `359万元2`
            else:
                unit_m = self._unit.search(s)
                span_m = self._span_seg.search(s)
                v = True
                if unit_m is None:
                    if span_m is None:
                        v = False
                    elif len(self._span_seg.findall(s)) > 1:
                        v = False  # `132017-04-09`
                    elif 'k' not in s and 'w' not in s:
                        v = False  # need `12w~19w` style
                if v and unit_m:
                    a, b = unit_m.span()
                    if b - a == len(s):
                        v = False  # unit only, no amount
            if len(self._filter_memo) < 200000:
                self._filter_memo[s] = v
        if v == 'num':
            # bare numerals count only with 金额/钱 cue in context
            return '金额' in candidate['context'] or '钱' in candidate['context']
        return v

    def grid_search(self, money_candidate: str, candidate: dict):
        """Longest-first substring trial (money_extractor.py:198-225)."""
        length = len(money_candidate)
        for i in range(length):
            for j in range(i):
                offset = [j, length - i + j + 1]
                sub = money_candidate[j: offset[1]]
                if not self._filter(sub, candidate):
                    continue
                norm = sub.replace(' ', '')
                if norm in self._parse_fail_memo:
                    continue
                try:
                    result = self.parser.parse(norm)
                except (MoneyParseError, Exception):
                    if len(self._parse_fail_memo) < 200000:
                        self._parse_fail_memo.add(norm)
                    continue
                return sub, result, offset
        return None, None, None

    def extract(self, text: str, with_parsing: bool = True,
                ret_all: bool = False) -> list:
        out = []
        for candidate in self.candidates(text):
            offset = [0, 0]
            bias = 0
            while candidate['offset'][0] + offset[1] < candidate['offset'][1]:
                sub, result, offset = self.grid_search(
                    candidate['money_candidate'][bias:], candidate)
                if sub is None:
                    break
                if sub in _NON_MONEY_STRINGS and not ret_all:
                    bias += offset[1]
                    continue
                item = {'text': sub,
                        'offset': [candidate['offset'][0] + bias + offset[0],
                                   candidate['offset'][0] + bias + offset[1]],
                        'type': 'money'}
                if with_parsing:
                    item['detail'] = result
                out.append(item)
                bias += offset[1]
        return out


_SINGLETON: MoneyExtractor | None = None


def get_money_extractor() -> MoneyExtractor:
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = MoneyExtractor()
    return _SINGLETON
