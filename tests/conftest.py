import sys
import types

import pytest


@pytest.fixture(scope='session')
def spark():
    from jionlp_spark.config import get_spark
    s = get_spark('tests', master='local[4]', shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope='session')
def jio():
    """The reference library as a live oracle.

    JioNLP pulls `jiojio` (a CWS model package, not installed and not needed
    for the rule/gadget paths we compare against); stub it so the import
    succeeds.  The reference tree is read-only public content used purely as
    an expected-output generator.
    """
    sys.path.insert(0, '/root/reference')
    fake = types.ModuleType('jiojio')
    fake.init = lambda *a, **k: None
    sys.modules.setdefault('jiojio', fake)
    import jionlp
    return jionlp


@pytest.fixture(scope='session')
def sample_texts():
    """Deterministic fixture texts: the synthetic corpus' sentence pool plus
    adversarial strings (nested brackets, full-width, redundant runs, fake
    positives)."""
    from jionlp_spark.sources.pages import _Pools, _make_row
    pools = _Pools()
    texts = [_make_row(i, 42, pools)[3] for i in range(300)]
    texts += [
        '',
        '（记者 小丽）ＡＢＣ全角　测试\n\n\n哈哈哈哈哈【套话】',
        'abc<span style="x">def</span>(nested(paren))end〔bracket〕',
        '一点也不好，三点五度，调高24点5度',  # time fake positives
        '三块砖不是钱，87.53元是钱',
        'QQ号不出现时 987654321 不是QQ',
        '加QQ 987654321 是QQ',
        'https://v.douyin.com/RtKFFah/ 和 www.baidu.com。',
        '电  话：19866220901，E-mail: zhang.san-01@sub.example.com。',
        '鄂A·1234x5 粤BD12345 川A23047B',
        '0.0.0.0 和 255.255.255.256 和 10.0.12.255',
        '<p>段落</p><br>文字<table><tr><td>表</td></tr></table>',
        'a<b，b>c 数学不是标签',
    ]
    return texts
