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


def test_location_parse_fuzz(jio):
    """Shuffled real admin-name compositions + detail noise through the
    full tie-breaking cascade, town/village mode randomly on (full dicts
    both sides)."""
    import os
    import pytest
    REF = '/root/reference/jionlp/dictionary'
    if not os.path.isdir(REF):
        pytest.skip('full dictionaries unavailable')
    from jionlp_spark import lexicons
    from jionlp_spark.kernels.location import LocationParser
    lp = LocationParser(lexicons.load_admin_divisions(REF),
                        lexicons.load_location_changes(REF),
                        lexicons.load_town_villages(REF))
    rows = lexicons.load_admin_divisions(REF)
    provs = sorted({r['province'] for r in rows if r['province']})
    cities = sorted({r['city'] for r in rows if r['city']})[:400]
    counties = sorted({r['county'] for r in rows if r['county']})[:800]
    rng = random.Random(777)
    noise = ['', '人民路88号', '附近', '某小区', '第二中学', '火车站',
             '高新区软件园']
    checked = 0
    for _ in range(800):
        parts = []
        if rng.random() < 0.7:
            parts.append(rng.choice(provs))
        if rng.random() < 0.7:
            parts.append(rng.choice(cities))
        if rng.random() < 0.7:
            parts.append(rng.choice(counties))
        rng.shuffle(parts)
        s = ''.join(parts) + rng.choice(noise)
        if not s:
            continue
        checked += 1
        tv = rng.random() < 0.3
        assert jio.parse_location(s, town_village=tv) == \
            lp.parse(s, town_village=tv), (s, tv)
    assert checked > 700


def test_grid_extractor_fuzz(jio):
    """Random compositions of time/money phrases + adversarial filler
    through BOTH grid-search extractors (with parsing); spans, types and
    parse details must match."""
    from jionlp_spark.kernels.money_extract import get_money_extractor
    from jionlp_spark.kernels.time_extract import get_time_extractor
    tex, mex = get_time_extractor(), get_money_extractor()
    rng = random.Random(31337)
    timey = ['2019年3月', '去年夏天', '下周三下午3点', '8点半', '三天后',
             '1997年', '腊月初八', '中秋节', '第二季度', '30分钟', '每周五',
             '01年3月']
    moneyy = ['3000元', '五万块钱', '12.5万美元', '三到五千元', '100万',
              '人民币两千元']
    fill = ['该项目', '于', '举行，预计', '完成。', '情况良好', '无关内容',
            '，', '。', '一点也不', '24点5度', '三块砖', 'ID110108', '87.53']

    def spans(lst):
        return [(m['text'], tuple(m['offset']), m.get('type'),
                 str(m.get('detail'))) for m in lst]

    for _ in range(500):
        parts = []
        for _ in range(rng.randint(2, 6)):
            r = rng.random()
            parts.append(rng.choice(timey) if r < 0.3 else
                         rng.choice(moneyy) if r < 0.5 else rng.choice(fill))
        s = ''.join(parts)
        assert spans(jio.ner.extract_time(s, time_base=TB,
                                          with_parsing=True)) == \
            spans(tex.extract(s, TB, with_parsing=True)), s
        assert spans(jio.ner.extract_money(s, with_parsing=True)) == \
            spans(mex.extract(s, with_parsing=True)), s


def test_time_flags_fuzz(jio):
    """ret_future / period_results_num flag combinations across time
    families must match the reference exactly."""
    from jionlp_spark.kernels.timeparse import get_time_parser
    tp = get_time_parser()
    cases = ['明天上午8点', '周五', '下个月3号', '每天早上7点', '每周一下午',
             '8月15日', '3月', '中秋节', '正月初一', '第三季度', '5点',
             '清明', '今天', '后天下午', '每月1号', '十一月', '2022年春节']
    for s in cases:
        for rf in (False, True):
            for prn in (None, 1, 2, 5):
                ref = _outcome(jio.parse_time, s, time_base=TB,
                               ret_future=rf, period_results_num=prn)
                got = _outcome(tp.parse, s, time_base=TB,
                               ret_future=rf, period_results_num=prn)
                assert ref[0] == got[0], (s, rf, prn, ref, got)
                if ref[0] == 'ok':
                    assert ref[1] == got[1], (s, rf, prn, ref, got)


def test_html_clean_fuzz(jio):
    """Random tag-soup documents: cleaned body AND meta dict must match."""
    from jionlp_spark.kernels.html_clean import clean_html
    rng = random.Random(4242)
    tags = ['<div id="nav">菜单</div>', '<p>正文段落', '</p>',
            '<script>var x=1;</script>', '<b>加粗</b>', '<br>',
            '<table><tr><td>表格</td></tr></table>', '<h1>标题</h1>',
            '<style>.x{color:red}</style>', '<div class="sidebar">侧边',
            '</div>', '<!-- comment -->', '&amp;&lt;&gt;',
            '<meta name="a" content="b">', '文本文字',
            '<a href="http://x.com">链接</a>', '<footer>页脚</footer>',
            '<span>行内</span>']
    for _ in range(300):
        s = ('<html><body>'
             + ''.join(rng.choice(tags) for _ in range(rng.randint(2, 12)))
             + '</body></html>')
        ref = _outcome(jio.clean_html, s)
        got = _outcome(clean_html, s)
        assert ref[0] == got[0], (s, ref, got)
        if ref[0] == 'ok':
            assert tuple(ref[1]) == tuple(got[1]), (s, ref, got)
