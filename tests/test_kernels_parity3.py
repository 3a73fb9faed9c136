"""Parity suites for the remove/replace variants, predicates, parentheses
extraction, and stopword filtering."""

import os

import pytest

REF_DICTS = '/root/reference/jionlp/dictionary'

EXTRA = [
    '身份证520103201711090020，IP 10.0.12.255，加QQ 987654321',
    'QQ缺失时 987654321，电话13288568202，(021)32830431',
    'E-mail: a@b.com，网址 https://x.cn/p 。', '【新华社】（北京时间）从昨天...',
    'abc(nested(deep))end【外(内)】', '', '2022', '混合ｍｉｘ１２３',
]


def test_remove_replace_checker_parity(jio, sample_texts):
    from jionlp_spark.kernels.extractors import get_extractor
    ex = get_extractor()
    pairs = [
        (lambda t: jio.remove_id_card(t), ex.remove_id_card),
        (lambda t: jio.remove_ip_address(t), ex.remove_ip_address),
        (lambda t: jio.remove_qq(t), ex.remove_qq),
        (lambda t: jio.replace_email(t), ex.replace_email),
        (lambda t: jio.replace_id_card(t), ex.replace_id_card),
        (lambda t: jio.replace_ip_address(t), ex.replace_ip_address),
        (lambda t: jio.replace_phone_number(t), ex.replace_phone_number),
        (lambda t: jio.replace_qq(t), ex.replace_qq),
        (lambda t: jio.replace_url(t), ex.replace_url),
        (lambda t: jio.replace_chinese(t), ex.replace_chinese),
        (lambda t: jio.extract_parentheses(t), ex.extract_parentheses),
        (lambda t: jio.extract_parentheses(t, detail=True),
         lambda t: ex.extract_parentheses(t, detail=True)),
        (lambda t: jio.check_any_chinese_char(t), ex.check_any_chinese_char),
        (lambda t: jio.check_all_chinese_char(t), ex.check_all_chinese_char),
        (lambda t: jio.check_any_arabic_num(t), ex.check_any_arabic_num),
        (lambda t: jio.check_all_arabic_num(t), ex.check_all_arabic_num),
    ]
    for t in sample_texts[:100] + EXTRA:
        for rf, gf in pairs:
            assert rf(t) == gf(t), (rf, t)


@pytest.mark.skipif(not os.path.isdir(REF_DICTS),
                    reason='full dictionaries unavailable')
def test_stopword_filter_parity(jio):
    from jionlp_spark import lexicons
    from jionlp_spark.kernels.stopwords import StopwordFilter
    sw = StopwordFilter(*lexicons.load_stopword_sets(REF_DICTS))
    token_lists = [
        ['我', '不', '去', '北京', '了', '2021年', '三百', 'hello',
         '上午', '开会'],
        ['他', '没有', '在', '上海市', '工作', '9点半', '12.5', '美国',
         '巴黎', 'Spark'],
        ['第一季度', '财报', '显示', '增长', '百分之三十', '去年', '同期'],
        ['', ' ', '星期二', '杭州', '西湖', '真', '美'],
    ]
    flag_sets = [
        {}, {'remove_time': True}, {'remove_location': True},
        {'remove_number': True}, {'remove_non_chinese': True},
        {'save_negative_words': True},
        {'remove_time': True, 'remove_location': True,
         'remove_number': True, 'remove_non_chinese': True,
         'save_negative_words': True},
    ]
    for toks in token_lists:
        for flags in flag_sets:
            assert jio.remove_stopwords(toks, **flags) == \
                sw.filter(toks, **flags), (toks, flags)


def test_stopword_filter_vendored():
    """The vendored filter-word lists work standalone."""
    from jionlp_spark import lexicons
    from jionlp_spark.kernels.stopwords import StopwordFilter
    sw = StopwordFilter(*lexicons.load_stopword_sets())
    out = sw.filter(['我', '不', '去', '北京', '开会'],
                    remove_location=True, save_negative_words=True)
    assert '北京' not in out and '不' in out and '开会' in out
