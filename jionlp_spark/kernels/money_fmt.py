"""Numeric money → Chinese character rendering (inverse of the money
parser).

Behavioral port of the reference MoneyNum2Char
(/root/reference/jionlp/gadget/money_num2char.py): 4-digit grouping with
万/亿/兆 outer units, per-group 仟佰拾 inner units, zero-run compression,
leading 壹拾→拾 reduction, 2-decimal fraction after 點/点.
"""

from __future__ import annotations

import re

_SIM = {'0': '零', '1': '一', '2': '二', '3': '三', '4': '四',
        '5': '五', '6': '六', '7': '七', '8': '八', '9': '九'}
_TRA = {'0': '零', '1': '壹', '2': '贰', '3': '叁', '4': '肆',
        '5': '伍', '6': '陆', '7': '柒', '8': '捌', '9': '玖'}
_SIM_INNER = {3: '千', 2: '百', 1: '十', 0: ''}
_TRA_INNER = {3: '仟', 2: '佰', 1: '拾', 0: ''}
_SIM_OUTER = {0: '', 1: '万', 2: '亿', 3: '兆'}
_TRA_OUTER = {0: '', 1: '萬', 2: '亿', 3: '兆'}

_ZERO_CUT = re.compile('零+$')
_ZERO_SHORTEN = re.compile('零+')
_ALL_ZERO = re.compile('^0+$')
_SIM_DECI = re.compile('^(一十)')
_TRA_DECI = re.compile('^(壹拾)')


def _seg4(integer_part: str) -> list:
    segs = []
    flag = len(integer_part) % 4
    if flag:
        segs.append(integer_part[:flag])
    for i in range(flag, len(integer_part), 4):
        segs.append(integer_part[i: i + 4])
    return segs


def _seg2char(seg: str, chars: dict, inner: dict, deci_fix) -> str:
    parts = {0: '', 1: '', 2: '', 3: ''}
    for idx, i in enumerate(range(len(seg) - 1, -1, -1)):
        if seg[i] == '0':
            parts[idx] = '' if idx == 0 else '零'
        else:
            parts[idx] = chars[seg[i]] + inner[idx]
    out = parts[3] + parts[2] + parts[1] + parts[0]
    out = _ZERO_CUT.sub('', out)
    out = _ZERO_SHORTEN.sub('零', out)
    return deci_fix.sub(deci_fix.pattern[-2], out)


def money_num2char(num, sim_or_tra: str = 'tra') -> str:
    """120402810.03 → 壹亿贰仟零肆拾萬贰仟捌佰壹拾點零叁."""
    integer_part, float_part = None, None
    if isinstance(num, int):
        integer_part = str(num)
    elif isinstance(num, float):
        s = str(num)
        integer_part, float_part = s.split('.', 1)
    else:
        s = str(num).replace(',', '')
        if '.' in s:
            integer_part, float_part = s.split('.', 1)
        else:
            integer_part = s

    if sim_or_tra == 'sim':
        chars, inner, outer, deci_fix, dot = (_SIM, _SIM_INNER, _SIM_OUTER,
                                              _SIM_DECI, '点')
    else:
        chars, inner, outer, deci_fix, dot = (_TRA, _TRA_INNER, _TRA_OUTER,
                                              _TRA_DECI, '點')

    segs = _seg4(integer_part)
    out = []
    for idx, outer_idx in enumerate(range(len(segs) - 1, -1, -1)):
        out.append(_seg2char(segs[idx], chars, inner, deci_fix)
                   + outer[outer_idx])
    integer_string = ''.join(out)

    if float_part is not None:
        frac = float_part[:2]
        if _ALL_ZERO.match(frac):
            return integer_string
        return integer_string + dot + ''.join(chars[c] for c in frac)
    return integer_string
