"""Per-character text features: pinyin and radical/structure lookup.

Behavioral ports of the reference Pinyin (/root/reference/jionlp/gadget/
pinyin.py:63-211: FMM over a phrase+char trie, <py_unk> for unknown,
standard/simple/detail render forms) and CharRadical (char_radical.py:27-75:
per-char radical/structure/corner/stroke/wubi lookup with <cr_unk>
defaults).  Dictionaries are injected from :mod:`jionlp_spark.lexicons`
(vendored ~4k-common-char subset, or the full JioNLP dictionary tree via
``dict_dir``).
"""

from __future__ import annotations

from .trie import CharTrie

PY_UNK = '<py_unk>'
PY_UNK_DETAIL = {'consonant': '', 'vowel': '', 'tone': ''}

_TONE_MAP = {
    'à': 'a4', 'á': 'a2', 'ā': 'a1', 'ǎ': 'a3',
    'ò': 'o4', 'ó': 'o2', 'ō': 'o1', 'ǒ': 'o3',
    'è': 'e4', 'é': 'e2', 'ē': 'e1', 'ě': 'e3',
    'ì': 'i4', 'í': 'i2', 'ī': 'i1', 'ǐ': 'i3',
    'ù': 'u4', 'ú': 'u2', 'ū': 'u1', 'ǔ': 'u3',
    'ǜ': 'v4', 'ǘ': 'v2', 'ǖ': 'v1', 'ǚ': 'v3',
    'ǹ': 'n4', 'ń': 'n2', 'ň': 'n3', 'ü': 'v',
    'ḿ': 'm2'}
_CONSONANTS = ['zh', 'ch', 'sh', 'ng', 'hm', 'hng'] + list('bcdfghjklmnpqrstwxyz')


def _standard2simple(standard: str) -> str:
    suffix = '5'
    out = []
    for ch in standard:
        mapped = _TONE_MAP.get(ch)
        if mapped:
            out.append(mapped[0])
            if len(mapped) == 2:
                suffix = mapped[1]
        else:
            out.append(ch)
    out.append(suffix)
    return ''.join(out)


def _consonant_vowel_tone(simple: str) -> dict:
    consonant = ''
    for c in _CONSONANTS:
        if simple.startswith(c):
            consonant = c
            break
    vowel_tone = simple.replace(consonant, '', 1)
    tone = ''
    for t in '12345':
        if t in vowel_tone:
            tone = t
            break
    return {'consonant': consonant, 'vowel': vowel_tone.replace(tone, '', 1),
            'tone': tone}


class Pinyin:
    def __init__(self, pinyin_phrase: dict, pinyin_char: dict) -> None:
        self.phrase = pinyin_phrase
        self.char = pinyin_char
        self.trie = CharTrie()
        for w in pinyin_phrase:
            self.trie.add(w, 'phrase')
        for w in pinyin_char:
            self.trie.add(w, 'char')
        all_pinyin = set()
        for v in pinyin_char.values():
            all_pinyin.update(v)
        for v in pinyin_phrase.values():
            all_pinyin.update(v)
        self.formater = {PY_UNK: [PY_UNK, PY_UNK_DETAIL]}
        for std in all_pinyin:
            if std == PY_UNK:
                continue  # phrase pinyin lists carry the unk marker too —
                # it must keep its identity mapping (ref pinyin.py:148-151),
                # not gain a default tone suffix
            simple = _standard2simple(std)
            self.formater[std] = [simple, _consonant_vowel_tone(simple)]

    def __call__(self, text: str, formater: str = 'standard') -> list:
        if formater not in ('standard', 'simple', 'detail'):
            raise ValueError("formater must be standard|simple|detail")
        out = []
        i = 0
        n = len(text)
        depth = self.trie.depth
        while i < n:
            window = text[i: i + depth]
            step, typing = self.trie.longest_prefix(window)
            if typing == 'phrase':
                cur = self.phrase[window[:step]]
                if formater == 'simple':
                    cur = [self.formater[p][0] for p in cur]
                elif formater == 'detail':
                    cur = [self.formater[p][1] for p in cur]
                out.extend(cur)
            elif typing == 'char':
                cur = self.char[window[:step]][0]
                if formater == 'simple':
                    cur = self.formater[cur][0]
                elif formater == 'detail':
                    cur = self.formater[cur][1]
                out.append(cur)
            else:
                out.append(PY_UNK_DETAIL if formater == 'detail' else PY_UNK)
            i += step
        return out


CR_UNK_ENTRY = {'radical': '<cr_unk>', 'structure': '一体结构',
                'corner_coding': '00000', 'stroke_order': '<so_unk>',
                'wubi_coding': 'XXXX'}


class CharRadical:
    def __init__(self, radical_map: dict) -> None:
        self.radicals = radical_map

    def __call__(self, text: str) -> list:
        return [self.radicals.get(ch, CR_UNK_ENTRY) for ch in text]
