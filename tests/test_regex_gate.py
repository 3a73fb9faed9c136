"""regex_gate: construction soundness on synthetic patterns + a sampled
differential check over the REAL timeparse battery patterns (gate says
skip ⇒ search must return None)."""

import random
import re

from jionlp_spark.kernels.regex_gate import required_chars


def test_synthetic_patterns():
    rc = required_chars
    assert rc(re.compile('abc')) == frozenset('a')          # smallest node
    assert rc(re.compile('a?b?')) is None                   # all optional
    assert rc(re.compile('(x|yz)')) == frozenset('xy')      # branch union
    assert rc(re.compile('a*[bc]')) == frozenset('bc')
    assert rc(re.compile(r'\d+年')) == frozenset('年')      # category → skip
    assert rc(re.compile(r'\d+')) is None
    assert rc(re.compile('[^a]b')) == frozenset('b')        # negated class
    assert rc(re.compile('(?:ab|cd)+')) == frozenset('ac')
    assert rc(re.compile('(?=x)y')) == frozenset('y')       # lookahead
    assert rc(re.compile('^$')) is None
    assert rc(re.compile('a|b*')) is None                   # one empty branch
    assert rc(re.compile('x', re.IGNORECASE)) is None       # flags → None
    assert rc(re.compile('[一-鿿]x')) == frozenset('x')     # huge range


def _sample_strings(n=4000):
    """Candidate-like strings: real time surfaces, digit runs, random
    mixes over the battery's own alphabet."""
    rng = random.Random(7)
    alphabet = ('0123456789一二三四五六七八九十百千万'
                '年月日号点时分秒周星期礼拜上下午晚早今明昨去前后内初'
                '春夏秋冬季度半个世纪元旦节清明-~:：.月abc ')
    out = ['2021年9月3日上午7点半', '13288561234', '202109', '9月3日',
           '上午十点', '三个月', '第3季度', '2021-09-03', '08:30:15',
           '明天下午', '2021年', '二零二一年九月', '7点半', '大前天']
    for _ in range(n):
        k = rng.randint(1, 12)
        out.append(''.join(rng.choice(alphabet) for _ in range(k)))
    return out


def test_battery_differential():
    from jionlp_spark.kernels.timeparse import get_time_parser
    tp = get_time_parser()
    pats = ([p for p, _f in tp.ymd_funcs] + [p for p, _f in tp.hms_funcs]
            + [tp.delta.standard_delta, tp.delta.law_delta,
               tp.delta.special_delta, tp.period_time])
    checked = skipped = 0
    for s in _sample_strings():
        chars = set(s)
        for p in pats:
            req = required_chars(p)
            if req is None:
                continue
            checked += 1
            if req.isdisjoint(chars):
                skipped += 1
                assert p.search(s) is None, (p.pattern[:80], s)
    # the gate must actually bite on this battery, not just be vacuous
    assert skipped > checked * 0.3, (skipped, checked)


def test_battery_gates_exist():
    """Most ymd/hms battery patterns should yield a usable gate —
    otherwise the prescreen is dead weight."""
    from jionlp_spark.kernels.timeparse import get_time_parser
    tp = get_time_parser()
    ymd = [required_chars(p) for p, _f in tp.ymd_funcs]
    hms = [required_chars(p) for p, _f in tp.hms_funcs]
    assert sum(r is not None for r in ymd) >= len(ymd) * 0.6
    assert sum(r is not None for r in hms) >= len(hms) * 0.6
