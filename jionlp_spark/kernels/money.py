"""Money parsing kernel.

Behavioral port of the reference MoneyParser
(/root/reference/jionlp/gadget/money_parser.py:606-757 entry,
:670-741 single-money path, :463-604 span handling): normalizes any Chinese /
Arabic / mixed money expression into {'num': '2f'-formatted string (or
[lo, hi] for spans), 'case': canonical currency, 'definition':
accurate|blur|blur+|blur-}.

Decision flow (order is load-bearing):
  expand "五六百" → "五到六百"  →  split span on 从/到/至/~/- …
  per single money: strip punctuation & (含)-brackets → classify & strip
  precision modifiers (约/近/超过/以上…) → detect & strip currency case
  (alias → canonical) → handle 多/余/几/数 blur spans → numeric conversion
  (pure digits | digits+unit chars | full Chinese numeral recursion over
  亿→万→千百十 levels).
"""

from __future__ import annotations

import re

from . import patterns as P

_MULTI = {'分': 0.01, '角': 0.1, '毛': 0.1, '十': 10, '拾': 10,
          '百': 100, '佰': 100, '千': 1000, '仟': 1000,
          '万': 10000, '萬': 10000, '亿': 100000000}
_PLUS = {
    '〇': 0, 'O': 0, '零': 0, '０': 0,
    '一': 1, '二': 2, '两': 2, '三': 3, '四': 4, '五': 5, '六': 6,
    '七': 7, '八': 8, '九': 9,
    '壹': 1, '弌': 1, '贰': 2, '弍': 2, '俩': 2, '叁': 3, '弎': 3, '仨': 3,
    '肆': 4, '伍': 5, '陆': 6, '柒': 7, '捌': 8, '玖': 9,
    '1': 1, '2': 2, '3': 3, '4': 4, '5': 5, '6': 6, '7': 7, '8': 8, '9': 9,
    # reference maps fullwidth １ to 0 (money_parser.py:115) — kept verbatim
    '１': 0, '２': 2, '３': 3, '４': 4, '５': 5, '６': 6, '７': 7, '８': 8,
    '９': 9,
}
_SUFFIX = {
    '百': 100, '佰': 100, '千': 1000, '仟': 1000, 'k': 1000,
    '万': 10000, '萬': 10000, 'w': 10000, '亿': 100000000,
    '十万': 100000, '拾万': 100000, '百万': 1000000, '佰万': 1000000,
    '仟万': 10000000, '千万': 10000000, '万万': 100000000, '萬萬': 100000000,
    '十亿': 1000000000, '拾亿': 1000000000, '百亿': 10000000000,
    '佰亿': 10000000000, '千亿': 100000000000, '仟亿': 100000000000,
    '万亿': 1000000000000, '萬亿': 1000000000000, '兆': 1000000000000,
}

_CASE_ALIASES = (
    ('元', {'块钱人民币', '块钱', '人民币', '块', '元人民币', '圆', '圆整'}),
    ('港元', {'港币', '元港币'}),
    ('日元', {'日币', '元日币'}),
    ('韩元', {'韩币', '元韩币'}),
    ('新台币', {'台币', '元新台币', '元台币'}),
    ('澳元', {'澳大利亚元', '澳币', '元澳币'}),
    ('美元', {'美刀', '美金'}),
)


class MoneyParseError(ValueError):
    pass


class MoneyParser:
    def __init__(self) -> None:
        self._int = re.compile(r'\d+')
        self._float = re.compile(r'\d+(\.)?\d*')
        self._sep = re.compile(P.MONEY_NUM_SEP)
        self._bai = re.compile('百|佰')
        self._qian = re.compile('千|仟|k')
        self._wan = re.compile('万|萬|w')
        self._yi = re.compile('亿')
        self._yuan_cur = re.compile('(块钱|元|块)')
        self._jiao_cur = re.compile('(角|毛)')
        self._case = re.compile(P.CURRENCY_CASE)
        self._modifier = re.compile(P.MONEY_PREFIX[:-1] + '|' + P.MONEY_SUFFIX[1:])
        self._blur = re.compile('^' + P.MONEY_BLUR + '$')
        self._minus = re.compile('^' + P.MONEY_MINUS + '$')
        self._plus = re.compile('^' + P.MONEY_PLUS + '$')
        self._zero_seg = re.compile(r'0+\.00')
        self._valid_num = re.compile(
            P.MONEY_NUM_STRING[:-3] + '元钱' + P.MONEY_KUAI_JIAO_FEN[1:] + '+$')
        self._pure_num = re.compile(r'^\d+(\.)?\d*$')
        self._num_unit = re.compile(r'^\d+(\.)?\d*[十拾百佰k千仟w万萬亿兆]{1,2}$')
        # span split patterns (money_parser.py:97-104)
        self._span_first_1 = re.compile(
            r'(?<=(从))([^起到至\-—~]+)(?=(起|(?<![达不])到|至(?!少)|—|－|-|~))|'
            r'(?<=(从))([^起到至\-—~]+)')
        self._span_first_2 = re.compile(r'(.+)(?=(——|--|~~|－－))')
        self._span_first_3 = re.compile(
            r'([^起到至\-—~]+)(?=(起|(?<![达不])到|至(?!少)|－|—|-|~))')
        self._span_second_0 = re.compile(r'(?<=(——|--|~~|－－))(.+)')
        self._span_second_1 = re.compile(
            r'(?<=(起|(?<![达不])到|至(?!少)|\-|—|\~|－))([^起到至\-—~－]+)')
        self._sequential = re.compile(
            r'(一二|二三|两三|三四|三五|四五|五六|六七|七八|八九|'
            r'壹贰|弌弍|贰叁|贰弎|弍弎|贰仨|两叁|两弎|两仨|叁肆|弎肆|仨肆|叁伍|弎伍|仨伍|肆伍|伍陆|陆柒|柒捌|捌玖)')
        self._brackets = P.build_remove_brackets_pattern('()（）')
        self._bracket_chars = re.compile('[()（）]')

    # -- numeric conversion (util1/2/3 of the reference) ---------------------

    def _plus_multi(self, s: str) -> float:
        nums: list = []
        for ch in s:
            p = _PLUS.get(ch, 0)
            if p != 0:
                nums.append(p)
            m = _MULTI.get(ch, 1)
            if nums:
                nums[-1] = nums[-1] * m
        return sum(nums)

    def _level1(self, s) -> float:
        """千/百/十-level string → float (money_parser.py:171-222)."""
        if not s or not isinstance(s, str):
            return 0.0
        if s[0] in '十拾百佰千仟':
            s = '一' + s
        # normalize trailing 角/分 shorthand: 三块五 → 三块五角
        if self._yuan_cur.search(s):
            jiao_fen = self._yuan_cur.split(s)[-1]
            if self._jiao_cur.search(jiao_fen):
                fen = self._jiao_cur.split(jiao_fen)[-1]
                if '分' not in fen and len(fen) == 1:
                    s = s + '分'
            else:
                if '角' not in jiao_fen and len(jiao_fen) == 1:
                    s = s + '角'
        yuan = self._yuan_cur.split(s)[0]
        jiao_fen = self._yuan_cur.split(s)[-1]
        m = self._int.search(yuan)
        if m and m.span() == (0, len(yuan)):
            return int(yuan) + self._plus_multi(jiao_fen)
        return self._plus_multi(s)

    def _level2(self, s: str) -> float:
        """万-level recursion (money_parser.py:238-267)."""
        if '万' in s or '萬' in s:
            if s[0] in '万萬':
                s = '一' + s
            seg = self._wan.split(s)
            if len(seg) != 2:
                raise MoneyParseError(s)
            return self._level1(seg[0]) * 10000 + self._level1(seg[1])
        return self._level1(s)

    def _level3(self, s: str) -> float:
        """亿-level recursion (money_parser.py:269-298)."""
        if '亿' in s:
            if s.startswith('亿'):
                s = '一' + s
            seg = self._yi.split(s)
            if len(seg) != 2:
                raise MoneyParseError(s)
            return self._level2(seg[0]) * 100000000 + self._level2(seg[1])
        return self._level2(s)

    # -- classification steps -------------------------------------------------

    def _cleansing(self, s: str) -> str:
        s = self._sep.sub('', s)
        # drop （含） style brackets (money_parser.py:377-386)
        inner = self._extract_brackets(s)
        if '含' in ''.join(inner):
            prev = len(s)
            while True:
                s = self._brackets.sub('', s)
                if len(s) == prev:
                    break
                prev = len(s)
        return s

    def _extract_brackets(self, s: str) -> list:
        pairs = {')': '(', '）': '（'}
        stack, starts, out = [], [], []
        for m in self._bracket_chars.finditer(s):
            ch = m.group()
            if ch in pairs:
                if stack and stack[-1] == pairs[ch]:
                    stack.pop()
                    out.append(s[starts.pop(): m.start() + 1])
            else:
                stack.append(ch)
                starts.append(m.start())
        return out

    def _definition(self, s: str):
        mods = [m.group() for m in self._modifier.finditer(s)]
        if len(mods) == 0:
            minus = plus = blur = None
        elif len(mods) == 1:
            blur = self._blur.search(mods[0])
            minus = self._minus.search(mods[0])
            plus = self._plus.search(mods[0])
        elif len(mods) == 2:
            blur = self._blur.search(mods[0]) or self._blur.search(mods[1])
            minus = self._minus.search(mods[0]) or self._minus.search(mods[1])
            plus = self._plus.search(mods[0]) or self._plus.search(mods[1])
        else:
            raise MoneyParseError(s)
        definition = 'accurate'
        if minus:
            definition = 'blur-'
        elif plus:
            definition = 'blur+'
        elif blur:
            definition = 'blur'
        return self._modifier.sub('', s), definition

    def _currency_case(self, s: str, default_unit: str = '元'):
        hits = list(self._case.finditer(s))
        if not hits:
            return default_unit, s
        if len(hits) > 2:
            raise MoneyParseError(s)
        if len(hits) == 2:
            a, b = hits
            if a.group() == '元' and a.span()[1] == b.span()[0]:
                # “三万元欧元” — the second unit wins (money_parser.py:308-319)
                unit = b.group()
                s = s.replace('元', '', 1)
                return unit, self._case.sub('', s)
        res = hits[0]
        raw = res.group()
        unit = raw
        for canonical, aliases in _CASE_ALIASES:
            if raw in aliases:
                unit = canonical
                break
        if len(hits) == 1:
            if res.span()[1] == len(s) or res.span()[0] == 0:
                return unit, self._case.sub('', s)
            if ('分' not in s) and ('角' not in s) and ('毛' not in s):
                raise MoneyParseError(s)
            return unit, s
        # len(hits) == 2, non-adjacent
        if res.span()[0] != 0:
            raise MoneyParseError(s)
        if hits[1].span()[1] == len(s):
            return unit, self._case.sub('', s)
        if ('分' not in s) and ('角' not in s) and ('毛' not in s):
            raise MoneyParseError(s)
        return unit, self._case.sub('', s, 1)

    def _accuracy(self, s: str, definition: str):
        if '多' in s:
            return s.replace('多', ''), 'blur+span'
        if '余' in s:
            return s.replace('余', ''), 'blur+span'
        if '几' in s or '数' in s:
            if s[0] in '几数':
                return s.replace('几', '').replace('数', ''), 'blur++span'
            return s.replace('几', '').replace('数', ''), 'blur+span'
        return s, definition

    # -- span handling ---------------------------------------------------------

    def _expand_sequential(self, s: str) -> str:
        m = self._sequential.search(s)
        if m:
            seq = m.group()
            s = self._sequential.sub(seq[0] + '到' + seq[1], s, count=1)
        return s

    def _split_span(self, s: str):
        first = (self._span_first_1.search(s) or
                 self._span_first_2.search(s) or
                 self._span_first_3.search(s))
        second = (self._span_second_0.search(s) or
                  self._span_second_1.search(s))
        return (first.group() if first else None,
                second.group() if second else None)

    def _compensate_first(self, first: str, second: str) -> str:
        """Unit completion for span lows: 3到5万港币 → 3万 (…:489-604)."""
        if self._pure_num.search(first):
            first_num = float(first)
        elif self._num_unit.search(first):
            char_part = self._float.sub('', first)
            if char_part in _SUFFIX:
                return first
            raise MoneyParseError(first)
        else:
            hits = list(self._case.finditer(first))
            if hits and hits[-1].span()[1] == len(first):
                return first
            first_num = self._level3(first)

        second = self._cleansing(second)
        second, _definition = self._definition(second)
        _unit, second = self._currency_case(second)
        second, _definition = self._accuracy(second, _definition)

        if self._num_unit.search(second):
            char_part = self._float.sub('', second)
            if char_part not in _SUFFIX:
                raise MoneyParseError(second)
            num_part = second.replace(char_part, '')
            if not self._pure_num.search(num_part):
                raise MoneyParseError(second)
            if first_num < float(num_part):
                return first + char_part
            return first

        for pat, unit_char, level in (
                (self._yi, '亿', self._level2),
                (self._wan, '万', self._level1),
                (self._qian, '千', self._level1),
                (self._bai, '百', self._level1)):
            if pat.search(second):
                seg = pat.split(second)
                if len(seg) != 2:
                    raise MoneyParseError(second)
                if first_num < level(seg[0]):
                    return first + unit_char
                return first
        return first

    # -- public API --------------------------------------------------------------

    def parse(self, money_string: str, default_unit: str = '元') -> dict:
        """→ {'num': str | [lo, hi], 'case': str, 'definition': str};
        raises MoneyParseError on malformed input."""
        if not money_string:
            raise MoneyParseError(money_string)

        money_string = self._expand_sequential(money_string)
        first, second = self._split_span(money_string)
        if first is None or second is None:
            return self._parse_single(money_string, default_unit)

        first = self._compensate_first(first, second)
        a = self._parse_single(first, default_unit)
        b = self._parse_single(second, default_unit)

        if b['case'] != '元':
            unit = b['case']
        elif a['case'] != '元':
            unit = a['case']
        else:
            unit = '元'
        lo = a['num'] if isinstance(a['num'], str) else a['num'][0]
        hi = b['num'] if isinstance(b['num'], str) else b['num'][1]
        return {'num': [lo, hi], 'case': unit, 'definition': 'blur'}

    def _parse_single(self, s: str, default_unit: str = '元') -> dict:
        s = self._cleansing(s)
        s, definition = self._definition(s)
        unit, s = self._currency_case(s, default_unit=default_unit)
        s, definition = self._accuracy(s, definition)

        if s == '':
            raise MoneyParseError(s)
        if self._valid_num.search(s) is None:
            raise MoneyParseError(s)

        if self._pure_num.search(s):
            num = float(s)
        elif self._num_unit.search(s):
            char_part = self._float.sub('', s)
            if char_part not in _SUFFIX:
                raise MoneyParseError(s)
            num_part = s.replace(char_part, '')
            if not self._pure_num.search(num_part):
                raise MoneyParseError(s)
            num = float(num_part) * _SUFFIX[char_part]
        else:
            num = self._level3(s)

        std = '{:.2f}'.format(num)

        if 'span' in definition:
            if definition == 'blur+span':
                second_num = self._bump(std)
            else:  # blur++span
                second_num = '{:.2f}'.format(float(std) * 10)
            return {'num': [std, second_num], 'case': unit,
                    'definition': 'blur'}
        return {'num': std, 'case': unit, 'definition': definition}

    def _bump(self, num: str):
        """10→11-style upper bound for 多/余 spans (money_parser.py:743-752)."""
        m = self._zero_seg.search(num)
        if m is None:
            return None
        back = m.group()
        front = num.replace(back, '')
        return str(int(front) + 1) + back


_SINGLETON: MoneyParser | None = None


def get_money_parser() -> MoneyParser:
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = MoneyParser()
    return _SINGLETON
