"""Stopword filtering kernel (post-tokenization).

Behavioral port of the reference RemoveStopwords
(/root/reference/jionlp/gadget/remove_stopwords.py:139-197): per-token
cascade — stopword list (with negation keep-list), full-token time regex,
location lexicon + suffix regex, full-token number regex, non-Chinese
filter.  Word lists are injected from :mod:`jionlp_spark.lexicons`.
"""

from __future__ import annotations

import re

from . import patterns as P


class StopwordFilter:
    def __init__(self, stopwords: set, negative_words: set,
                 location_words: set) -> None:
        self.stopwords = set(stopwords) | {'', ' ', '\t'}
        self.negative_words = set(negative_words)
        self.location_words = set(location_words)
        self._time = re.compile(P.STOPWORD_TIME_PATTERN)
        self._location = re.compile(P.LOCATION_PATTERN)
        self._number = re.compile(P.NUMBER_PATTERN)
        self._chinese = re.compile(P.CHINESE_CHAR)

    def _full_match(self, pattern: re.Pattern, word: str) -> bool:
        m = pattern.search(word)
        return m is not None and m.span()[1] - m.span()[0] == len(word)

    def filter(self, tokens: list, remove_time: bool = False,
               remove_location: bool = False, remove_number: bool = False,
               remove_non_chinese: bool = False,
               save_negative_words: bool = False) -> list:
        out = []
        for word in tokens:
            if word == '':
                continue
            if word in self.stopwords:
                if not (save_negative_words and word in self.negative_words):
                    continue
            if remove_time and self._full_match(self._time, word):
                continue
            if remove_location:
                if word in self.location_words:
                    continue
                if self._full_match(self._location, word):
                    continue
            if remove_number and self._full_match(self._number, word):
                continue
            if remove_non_chinese and self._chinese.search(word) is None:
                continue
            out.append(word)
        return out
