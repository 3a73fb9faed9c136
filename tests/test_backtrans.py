"""Back-translation orchestration parity vs the reference (network
clients stubbed with the same deterministic fake on both sides)."""

import pytest

TEXT = '用户可选择是否愿意多等外卖员五分钟，你愿意多等这五分钟吗？'


@pytest.fixture()
def fake_api():
    from jionlp_spark.kernels.backtrans import DeterministicFakeApi
    return DeterministicFakeApi('a')


def test_iter_api_parity(jio, fake_api):
    """Per-api language round-trip loop — exact list equality against the
    reference instance method driving the SAME fake client."""
    from jionlp.textaug.back_translation.back_translation import \
        BackTranslation as RefBT

    from jionlp_spark.kernels.backtrans import iter_api_by_language
    ref = RefBT(mt_apis=[])
    assert ref.iter_api_by_language(TEXT, fake_api) == \
        iter_api_by_language(TEXT, fake_api)


def test_filter_parity(jio):
    """filter_results membership parity (the reference iterates a hash
    set — order nondeterministic — so compare as sets; our port sorts)."""
    from jionlp.textaug.back_translation.back_translation import \
        BackTranslation as RefBT

    from jionlp_spark.kernels.backtrans import filter_back_translations
    results = ['短', TEXT + 'x', TEXT + 'x', '',
               TEXT * 4, TEXT[:len(TEXT) // 2]]
    ref = RefBT.filter_results(TEXT, list(results))
    got = filter_back_translations(TEXT, list(results))
    assert set(ref) == set(got)
    assert got == sorted(got)


def test_full_orchestration(fake_api):
    """Sequential fan-out over two fake apis: one result per (api,
    foreign lang) minus dedup/length-filter casualties."""
    from jionlp_spark.kernels.backtrans import (BackTranslation,
                                                DeterministicFakeApi)
    bt = BackTranslation([fake_api, DeterministicFakeApi('b')])
    out = bt(TEXT)
    assert len(out) > 0
    # at least one leg must actually mutate (the fr leg may no-op on
    # 的-free text, but en/de legs always edit)
    assert any(o != TEXT for o in out)
    # en leg: first ，→ 。; de leg: trailing 。 appended
    assert TEXT.replace('，', '。', 1) in out
    assert TEXT + '。' in out
    # both apis produce the same edits → dedup collapses them
    assert len(out) == len(set(out))


def test_api_failure_swallowed():
    """A lang whose round-trip raises is skipped (reference :158-163)."""
    from jionlp_spark.kernels.backtrans import (DeterministicFakeApi,
                                                iter_api_by_language)

    class Flaky(DeterministicFakeApi):
        def __call__(self, text, from_lang='zh', to_lang='zh'):
            if to_lang == 'de' or (from_lang == 'de'):
                raise RuntimeError('boom')
            return super().__call__(text, from_lang, to_lang)

    out = iter_api_by_language(TEXT, Flaky('f'))
    assert len(out) == 2  # en + fr survive, de swallowed


def test_query_literals():
    """Pin the textaug_backtrans oracle literals to the kernel (two fake
    clients 'a'/'b', same as the operator default)."""
    import sys
    sys.path.insert(0, '/root/repo')
    import __spark_entry__ as entry
    from jionlp_spark.kernels.backtrans import (BackTranslation,
                                                DeterministicFakeApi)
    bt = BackTranslation([DeterministicFakeApi('a'),
                          DeterministicFakeApi('b')])
    for t, want in zip(entry._BT_IN, entry._BT_OUT):
        assert '|'.join(bt(t)) == want
