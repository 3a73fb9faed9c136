"""LocationRecognizer parity vs the reference — the jiojio POS stage is
stubbed on the REFERENCE side to emit the same candidate words our port
takes directly, so outputs must match structure-for-structure."""

import os
import sys

import pytest

REF_DICTS = '/root/reference/jionlp/dictionary'

WORD_LISTS = [
    # the reference docstring example (:68-105)
    ['成都市', '中国', '日本', '日本', '日本', '韩国', '东京', '尚家村'],
    ['北京', '朝阳', '朝阳', '海淀区', '上海市'],
    ['斯里兰卡', '科伦坡', '西藏', '拉萨', '拉萨'],
    ['洪家村', '不存在地名'],
    [],
    ['襄阳市', '襄城区', '武汉', '湖北省', '湖北省'],
    ['美国', '华盛顿', '纽约', '法国', '巴黎', '巴黎'],
]


@pytest.fixture(scope='module')
def mine_full():
    from jionlp_spark import lexicons
    from jionlp_spark.kernels.locrec import (LocationRecognizer,
                                             build_china_map,
                                             build_world_map)
    china = build_china_map(lexicons.load_admin_divisions(REF_DICTS))
    world = build_world_map(lexicons.load_world_locations(REF_DICTS))
    return LocationRecognizer(china, world)


@pytest.mark.skipif(not os.path.isdir(REF_DICTS),
                    reason='full dictionaries unavailable')
def test_recognizer_parity_vs_reference(jio, mine_full):
    from jionlp.gadget.location_recognizer import LocationRecognizer \
        as RefRec

    ref = RefRec()
    for words in WORD_LISTS:
        sys.modules['jiojio'].cut = \
            lambda _text, _w=words: [(w, 'ns') for w in _w]
        got_ref = ref('占位文本')
        got_mine = mine_full(words)
        assert got_ref == got_mine, words


def test_recognizer_vendored_smoke():
    """Vendored-slice maps: the must-keep cities resolve and counts
    aggregate up-level."""
    from jionlp_spark import lexicons
    from jionlp_spark.kernels.locrec import (LocationRecognizer,
                                             build_china_map,
                                             build_world_map)
    rec = LocationRecognizer(
        build_china_map(lexicons.load_admin_divisions()),
        build_world_map(lexicons.load_world_locations()))
    res = rec(['北京市', '海淀区', '海淀区', '日本', '东京', 'xx村'])
    assert res['domestic'][0][0]['county'] == '海淀区'
    # 北京市 expands to a province-level AND a city-level candidate
    # (直辖市), each merging its count into the longer 海淀区: 2+1+1
    assert res['domestic'][0][1] == 4
    assert res['foreign'][0][0] == {'country': '日本', 'city': '东京'}
    assert res['others'] == {'xx村': 1}


def test_query_literals():
    """Pin the kg_recognize_location_full oracle literals to the kernel
    over the vendored maps (the operator's runtime configuration)."""
    import sys
    sys.path.insert(0, '/root/repo')
    import __spark_entry__ as entry
    from jionlp_spark import lexicons
    from jionlp_spark.kernels.locrec import (LocationRecognizer,
                                             build_china_map,
                                             build_world_map)
    rec = LocationRecognizer(
        build_china_map(lexicons.load_admin_divisions()),
        build_world_map(lexicons.load_world_locations()))
    for ws, want in zip(entry._LOCREC_CASES, entry._LOCREC_EXPECTED):
        res = rec(list(ws))
        dom = (res['domestic'] or [[{}, None]])[0]
        fr = (res['foreign'] or [[{}, None]])[0]
        others = ','.join(
            f'{w}:{c}' for w, c in sorted((res['others'] or {}).items()))
        got = (dom[0].get('province'), dom[0].get('city'),
               dom[0].get('county'), dom[1], fr[0].get('country'),
               fr[0].get('city'), fr[1], others)
        assert got == want, ws


@pytest.mark.skipif(not os.path.isdir(REF_DICTS),
                    reason='full dictionaries unavailable')
def test_recognizer_fuzz_parity(jio, mine_full):
    """300 random word lists from a mixed pool (ambiguous aliases,
    直辖市, world cities that shadow china names, unknowns) — structure
    equality against the reference on every one."""
    import random

    from jionlp.gadget.location_recognizer import LocationRecognizer \
        as RefRec

    pool = ['北京', '北京市', '朝阳', '朝阳区', '朝阳市', '海淀区',
            '上海', '上海市', '嘉定区', '广州', '广州市', '深圳',
            '武汉', '武汉市', '湖北省', '襄阳市', '襄樊市', '襄城区',
            '中国', '日本', '东京', '韩国', '首尔', '美国', '华盛顿',
            '纽约', '法国', '巴黎', '斯里兰卡', '科伦坡', '西藏',
            '拉萨', '尚家村', '红旗渠', '某某地', '成都市', '四川省']
    rng = random.Random(42)
    ref = RefRec()
    for _ in range(300):
        words = [rng.choice(pool)
                 for _ in range(rng.randrange(0, 12))]
        sys.modules['jiojio'].cut = \
            lambda _t, _w=words: [(w, 'ns') for w in _w]
        assert ref('x') == mine_full(words), words
