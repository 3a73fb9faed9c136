"""One-shot vendoring: word_distribution.tsv for the homophone augmenter.

Reads ``word_distribution.json`` (JioNLP format: one ``["word", count]``
JSON line per word, insertion order significant — the homophone RNG's
``choice(p=...)`` depends on it) from a full JioNLP dictionary dir and
writes ``lexicons/data/word_distribution.tsv`` as::

    word <TAB> count <TAB> c1,v1|c2,v2|...

where the third field is the per-char no-tone (consonant, vowel) detail
pinyin computed ONCE here with the chartext Pinyin kernel over the FULL
dictionaries (kernel parity vs the reference is proven by
tests/test_chartext.py) — precomputed like idioms.tsv so runtime needs no
pinyin pass and matches the reference's in-process construction exactly.

Only words containing at least one Chinese char are vendored: everything
else has empty pinyin, can never be substituted (the reference skips
segments with any empty pinyin component), and ASCII/control junk in the
source file would corrupt a TSV.

Usage: python scripts/vendor_word_distribution.py <full_dict_dir>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from jionlp_spark import lexicons  # noqa: E402
from jionlp_spark.kernels.chartext import Pinyin  # noqa: E402

DATA = os.path.join(os.path.dirname(lexicons.__file__), 'data')


def main(dict_dir: str) -> None:
    phrase, pchar, _rad = lexicons.load_char_info(dict_dir)
    py = Pinyin(phrase, pchar)
    src = os.path.join(dict_dir, 'word_distribution.json')
    out = os.path.join(DATA, 'word_distribution.tsv')
    n_in = n_out = 0
    with open(src, encoding='utf-8') as f, \
            open(out, 'w', encoding='utf-8') as o:
        for line in f:
            n_in += 1
            word, cnt = json.loads(line)
            if not any('一' <= ch <= '鿿' for ch in word):
                continue
            detail = py(word, formater='detail')
            pairs = '|'.join(f"{d['consonant']},{d['vowel']}"
                             for d in detail)
            o.write(f'{word}\t{cnt}\t{pairs}\n')
            n_out += 1
    print(f'{n_in} words read, {n_out} vendored → {out}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1
         else os.environ['JIONLP_SPARK_DICT_DIR'])
