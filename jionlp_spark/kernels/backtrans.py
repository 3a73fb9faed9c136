"""Back-translation augmentation — port of the reference BackTranslation
(/root/reference/jionlp/textaug/back_translation/back_translation.py:
21-186).

The reference fans one text out to several commercial translation APIs
(Baidu/Youdao/Google/Tencent/Xunfei), round-trips zh → each foreign
language → zh, and filters the union.  The NETWORK clients are the stub
boundary (translation_api.py is request-signing plumbing); everything
else is orchestration and filtering, ported here exactly:

- ``iter_api_by_language`` (:122-164): split an api's lang_pool into the
  Chinese tag (matched by the 'zh'/'cn' alias substrings, :73) and the
  foreign tags, round-trip each foreign tag, swallow per-language
  failures;
- ``filter_back_translations`` (:166-186): set-dedup + the 1/3..3×
  length-ratio filter.  The reference returns hash-set order
  (PYTHONHASHSEED-nondeterministic); this port sorts the surviving
  results so distributed runs are reproducible — set membership is
  identical (parity asserted set-wise in tests/test_backtrans.py);
- the api fan-out: the reference uses a process Pool because each api is
  a slow network call (:80-103); in the engine the parallel axis is
  documents/partitions, so per-document the apis iterate sequentially —
  same result set.

An api object is any callable ``(text, from_lang=..., to_lang=...) →
str`` with a ``lang_pool`` list — the reference's client interface
(translation_api.py:120-150).  ``DeterministicFakeApi`` is the in-repo
STUB standing in for the network clients (clearly marked; swap real
clients in unchanged).
"""

from __future__ import annotations

CHINESE_ALIAS = ('zh', 'cn')  # back_translation.py:73


def _filter_chinese(lang_list, chinese_alias=CHINESE_ALIAS):
    """(foreign_langs, chinese_lang) — reference :135-151."""
    chinese_lang = None
    foreign_lang_list = []
    for lang in lang_list:
        match_flag = False
        for ali in chinese_alias:
            if ali in lang:
                match_flag = True
                chinese_lang = lang
                break
        if not match_flag:
            foreign_lang_list.append(lang)
    return foreign_lang_list, chinese_lang


def iter_api_by_language(text: str, mt_api,
                         chinese_alias=CHINESE_ALIAS) -> list:
    """Round-trip ``text`` through every foreign language of one api
    (reference :122-164); per-language failures are swallowed."""
    foreign_lang_list, chinese_lang = _filter_chinese(
        mt_api.lang_pool, chinese_alias)
    api_result_list = []
    for foreign_lang in foreign_lang_list:
        try:
            tmp = mt_api(text, from_lang=chinese_lang,
                         to_lang=foreign_lang)
            result = mt_api(tmp, from_lang=foreign_lang,
                            to_lang=chinese_lang)
            api_result_list.append(result)
        except Exception:
            continue
    return api_result_list


def filter_back_translations(text: str, back_tran_results: list,
                             sort: bool = True) -> list:
    """Dedup + length-ratio filter (reference filter_results :166-186).
    sort=True replaces the reference's hash-set iteration order with a
    lexicographic one (membership identical, order deterministic)."""
    deduped = list(set(back_tran_results))
    if sort:
        deduped = sorted(deduped)

    def _length_filter(orig_text, trans_line):
        orig_len = len(orig_text)
        tran_len = len(trans_line)
        if tran_len == 0:
            return False
        if (orig_len / tran_len) < 1 / 3 or (orig_len / tran_len) > 3:
            return False
        return True

    return [line for line in deduped if _length_filter(text, line)]


class BackTranslation:
    """Sequential-per-document port of the reference orchestrator."""

    def __init__(self, mt_apis=()):
        self.chinese_alias = list(CHINESE_ALIAS)
        self.mt_apis = list(mt_apis)

    def __call__(self, text: str) -> list:
        results = []
        for api in self.mt_apis:
            results.extend(iter_api_by_language(
                text, api, self.chinese_alias))
        return filter_back_translations(text, results)


class DeterministicFakeApi:
    """STUB translation client (no network in this sandbox): the
    zh→foreign leg tags the text, the foreign→zh leg strips the tag and
    applies a deterministic language-keyed edit — standing in for a real
    client's paraphrase drift so the dedup/length filters are exercised.
    Replace with translation_api-style clients in production; the
    orchestration above runs unchanged."""

    def __init__(self, name: str = 'fake',
                 lang_pool=('zh', 'en', 'de', 'fr')):
        self.name = name
        self.lang_pool = list(lang_pool)

    def __call__(self, text: str, from_lang: str = 'zh',
                 to_lang: str = 'zh') -> str:
        if from_lang not in self.lang_pool:
            raise ValueError(f'unknown lang {from_lang}')
        if to_lang not in self.lang_pool:
            raise ValueError(f'unknown lang {to_lang}')
        if to_lang != 'zh':
            # --- STUB "translation": tag with the round-trip lang ------
            return f'⟨{self.name}:{to_lang}⟩{text}'
        if not text.startswith('⟨'):
            return text
        tag, payload = text[1:].split('⟩', 1)
        lang = tag.split(':', 1)[1]
        # --- STUB "back-translation": deterministic lang-keyed edit ----
        if lang == 'en':
            return payload.replace('，', '。', 1)
        if lang == 'de':
            return payload + '。'
        return payload.replace('的', '之', 1)