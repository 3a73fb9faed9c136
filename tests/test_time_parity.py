"""Time parser/extractor ⟷ reference parity over the supported families
(see kernels/timeparse.py docstring for coverage; unported families are the
documented round-2 gap)."""

import datetime

BASES = [datetime.datetime(2021, 9, 14, 10, 30, 0),
         datetime.datetime(2021, 1, 1, 0, 0, 0),
         datetime.datetime(2021, 12, 31, 23, 59, 59)]

PARSE_CASES = [
    '2021年9月21日', '2016-05-22', '1987.12-3', '20180209', '2009年5月31日',
    '一九九二年四月二十五日', '去年9月', '今年9月2日', '明年', '本月15号',
    '下个月9号', '上个月', '今天', '昨天', '明天', '大前天', '大后天', '后天',
    '下周三', '星期六', '上上周五', '周日', '本周二', '这个星期四',
    '8点半', '上午8点', '下午3点', '晚上八点', '14:30', '14:30:25',
    '23点一刻', '上午十点三十分', '今天上午8点半', '明天下午七八点', '凌晨',
    '中午', '深夜', '2021年9月21日上午8点半', '9月21日14:30',
    '去年9月2日晚上8点', '三个月', '一万个小时', '100天', '3天半', '俩星期',
    '半年', '两个半小时', '3年以上7年以下', '三天两夜', '一年四季',
    '从9月1日到9月10日', '9月1日至9月10日', '2014年11月到12月', '8点到10点',
    '9月20日下午3点到5点', '2021年9月1日以来', '10月以来', '每周五下午4点',
    '每天上午9点', '每个月15号', '现在', '此时此刻', '今明两天', '全年',
    '全月', '1997.02-2020.12', '2018-04-02', '13年8月', '零八年', '2021年9月',
    '9月', '21日', '15号', '这个月前两天', '五月前两天', '上个月后三天',
    '9点之前', '明天8点到10点', '昨天11点到明天晚上',
    '2017年9月10日11:00至2018年', '去年11月到今年3月', '十月一日',
    '6月30日晚上7点半', '正午12点', '2021.9.14', '清晨五点',
    # delta→point / delta→span families
    '三天前', '3天后', '三天之后', '10天以前', '5天内', '三天来', '半天前',
    '两天半后', '三周前', '两个星期后', '俩星期前', '一周内', '3个星期之后',
    '三个月前', '两个月后', '半个月前', '三个月内', '俩月后', '一个半月后',
    '两个季度前', '一个季度后', '三个季度内', '三年前', '五年后', '半年前',
    '三年内', '2025年内', '十年来', '两年半前', '三小时前', '两个小时后',
    '半小时前', '仨小时后', '两个半小时前', '48小时内', '十分钟前',
    '5分钟后', '半分钟前', '三分钟内', '十分钟来', '30秒前', '十秒后',
    '30秒内', '一刻钟前', '两刻钟后', '3刻钟内', '三个工作日后',
    '5个工作日内', '三个交易日后', '未来三天', '未来两个月', '今后三年',
    '未来48小时', '未来三个星期', '过去三天', '过去两年', '近三个月',
    '最近一周', '近三天', '前三个月', '过去24小时', '再过三天', '过三个月',
    '再过两年', '过两天', '第三年', '第五天', '2025年第三天',
    '2018年前三个月', '今年前三个月', '2019年后两个月', '首月', '第三个月',
    '2021年第100天', '去年前三个月',
]

EXTRACT_TEXTS = [
    '定于2021年9月21日上午8点半开会，请准时参加。',
    '于9月18日（星期六）上班，9月19日至21日放假调休，也就是从周日开始放假3天。',
    '一点也不好，三点五度，调高24点5度。',
    '会议时间是明天下午3点到5点，地点在二楼。',
    '他昨天上午10:30离开，预计下周三14:30-16:00回来。',
    '此前身份证号342127197212178212不含时间。',
    '活动将持续三个月，从10月1日开始。',
    '每周五下午4点例会。',
    '价格是2000万元，不是2000年。',
    '今年9月2日晚上8点的航班。',
]


def test_time_parser_parity(jio):
    from jionlp_spark.kernels.timeparse import get_time_parser
    tp = get_time_parser()
    for c in PARSE_CASES:
        for base in BASES:
            try:
                ref = jio.parse_time(c, time_base=base)
            except Exception:
                ref = ('ERR',)
            try:
                got = tp.parse(c, time_base=base)
            except Exception:
                got = ('ERR',)
            assert ref == got, (c, base, ref, got)


def test_time_extractor_parity(jio, sample_texts):
    from jionlp_spark.kernels.time_extract import get_time_extractor
    te = get_time_extractor()
    base = BASES[0]
    for t in EXTRACT_TEXTS + sample_texts[:80]:
        ref = jio.ner.extract_time(t, time_base=base, with_parsing=True)
        got = te.extract(t, base, with_parsing=True)
        ra = [(m['text'], tuple(m['offset']), m['type'],
               str(m.get('detail'))) for m in ref]
        rb = [(m['text'], tuple(m['offset']), m['type'],
               str(m.get('detail'))) for m in got]
        assert ra == rb, (t, ra, rb)
