"""Seeded compositional fuzz parity: beyond the reference's own golden
files, random template compositions must parse identically (or fail
identically) in our kernels and the live reference."""

import datetime
import random

TB = datetime.datetime(2021, 9, 1, 10, 30)


def _outcome(fn, *args, **kw):
    try:
        return ('ok', fn(*args, **kw))
    except Exception as e:
        return ('exc', type(e).__name__)


def test_time_parse_fuzz(jio):
    from jionlp_spark.kernels.timeparse import get_time_parser
    tp = get_time_parser()
    rng = random.Random(12345)
    Y = ['2019年', '今年', '去年', '明年', '1997年', '二〇二一年', '98年', '']
    M = ['1月', '12月', '三月', '正月', '腊月', '上个月', '这个月', '']
    D = ['3日', '31号', '十五日', '今天', '明天', '大前天', '']
    H = ['上午8点', '下午三点', '晚上11点半', '8:30', '凌晨1点一刻', '']
    EXTRA = ['左右', '前后', '', '之前', '以来', '以后']
    checked = 0
    for _ in range(1200):
        s = (rng.choice(Y) + rng.choice(M) + rng.choice(D) + rng.choice(H)
             + rng.choice(EXTRA))
        if not s:
            continue
        checked += 1
        ref = _outcome(jio.parse_time, s, time_base=TB)
        got = _outcome(tp.parse, s, time_base=TB)
        # exception TYPES may differ (our kernel raises its own classes);
        # outcome kind and parsed values must match
        assert ref[0] == got[0], (s, ref, got)
        if ref[0] == 'ok':
            assert ref[1] == got[1], (s, ref, got)
    assert checked > 1000


def test_money_parse_fuzz(jio):
    from jionlp_spark.kernels.money import get_money_parser
    mp = get_money_parser()
    rng = random.Random(54321)
    NUMS = ['三', '十二', '一百零五', '3', '12.5', '3万', '五千', '8千万',
            '一个亿', '两', '俩', '仨', '半']
    UNITS = ['元', '块钱', '美元', '港币', '日元', '万元', '元整',
             '人民币', '欧元', '']
    PRE = ['', '约', '大概', '高达', '人民币', '不到']
    for _ in range(1500):
        s = (rng.choice(PRE) + rng.choice(NUMS) + rng.choice(NUMS)
             + rng.choice(UNITS))
        ref = _outcome(jio.parse_money, s)
        got = _outcome(mp.parse, s)
        assert ref[0] == got[0], (s, ref, got)
        if ref[0] == 'ok':
            assert ref[1] == got[1], (s, ref, got)


def test_extractor_fuzz(jio):
    """Random digit/letter/punct soup through the full extractor sweep vs
    the reference extract_* APIs (span-identical)."""
    from jionlp_spark.kernels.extractors import get_extractor
    ex = get_extractor()
    rng = random.Random(99)
    alphabet = ('0123456789' * 3 + 'abcxyz@._-：，。 '
                + '电话号码身份证预算元千军QQ微信号www')
    pairs = [(ex.extract_phone_number, jio.extract_phone_number),
             (ex.extract_email, jio.extract_email),
             (ex.extract_url, jio.extract_url),
             (ex.extract_id_card, jio.extract_id_card),
             (ex.extract_ip_address, jio.extract_ip_address),
             (ex.extract_qq, jio.extract_qq)]
    for _ in range(400):
        s = ''.join(rng.choice(alphabet) for _ in range(rng.randint(5, 80)))
        for ours, theirs in pairs:
            ref = _outcome(theirs, s, detail=True)
            got = _outcome(ours, s)
            assert ref[0] == got[0], (s, ref, got)
            if ref[0] == 'ok':
                ref_spans = [(m['text'], tuple(m['offset'])) for m in ref[1]]
                got_spans = [(m['text'], tuple(m['offset'])) for m in got[1]]
                assert ref_spans == got_spans, (s, ref_spans, got_spans)
