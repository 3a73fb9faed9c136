"""Lexicon-based sentiment scoring kernel.

Behavioral port of the reference LexiconSentiment
(/root/reference/jionlp/algorithm/sentiment/sentiment_analysis.py:94-201):
split sentences (coarse), per sentence drop everything before a transition
word (，但是/，可是/，但/，不过), FMM-scan sentiment/negation/multiplier
words, replay the Item/Items proximity state machine (:39-90) that decides
whether a multiplier adverb binds left or right, score with negation flips
(negative values doubled :161-162), average over sentences and squash with a
sigmoid.  Word lists are injected (vendored subset or the full reference
dictionaries via dict_dir).
"""

from __future__ import annotations

import math
import re

from .sentence import split_sentence
from .trie import build_trie

_BIAS_LEFT, _BIAS_MIDDLE, _BIAS_RIGHT = 0, 0.5, 1

_TRANSITION = re.compile(r'((，|\,)(但是|可是|但|不过))')


def _sigmoid(x: float) -> float:
    try:
        ans = math.exp(-x)
    except OverflowError:
        ans = float('inf')
    return 1 / (1 + ans)


class _Item:
    __slots__ = ('start_idx', 'end_idx', 'prev_len', 'next_len', 'bias',
                 'word')

    def __init__(self, start_idx, end_idx, prev_len, next_len, word):
        self.start_idx = start_idx
        self.end_idx = end_idx
        self.prev_len = prev_len
        self.next_len = next_len
        self.bias = _BIAS_MIDDLE
        self.word = word

    def _set_bias(self):
        if self.prev_len >= self.next_len and self.next_len < 6:
            self.bias = _BIAS_RIGHT
        elif self.prev_len < self.next_len and self.prev_len < 6:
            self.bias = _BIAS_LEFT

    def set_next_len(self, next_len):
        self.next_len = next_len
        self._set_bias()

    def set_prev_len(self, prev_len):
        self.prev_len = prev_len
        self._set_bias()


class SentimentAnalyzer:
    def __init__(self, sentiment_words: dict, negative_words: list,
                 expand_words: dict) -> None:
        self.sentiment_dict = dict(sentiment_words)
        self.negative_list = set(negative_words)
        self.weight_dict = dict(expand_words)
        # one FMM trie over all three word classes (the reference builds a
        # LexiconNER the same way, sentiment_analysis.py:120-123)
        self._trie = build_trie({
            'sentiment_word': list(self.sentiment_dict.keys()),
            'negative_word': list(self.negative_list),
            'expand_word': list(self.weight_dict.keys())})

    # --- reference Items.put_note (sentiment_analysis.py:63-90) -----------
    @staticmethod
    def _put_note(items_list, item):
        if not items_list:
            items_list.append(item)
            return
        tmp = items_list[-1]
        if item.start_idx < tmp.end_idx and not (
                item.start_idx > tmp.start_idx
                and item.end_idx == tmp.end_idx):
            prev_len = tmp.prev_len
            if item.end_idx == tmp.end_idx:
                prev_len -= abs(item.start_idx - tmp.start_idx)
            item.set_prev_len(prev_len)
            item.set_next_len(20)
            items_list[-1] = item
        elif not (item.start_idx > tmp.start_idx
                  and item.end_idx == tmp.end_idx):
            tmp_len = item.start_idx - tmp.end_idx
            item.set_prev_len(tmp_len)
            item.set_next_len(20)
            tmp.set_next_len(tmp_len)
            items_list[-1] = tmp
            items_list.append(item)

    def _sentence_sentiment(self, sentence: str) -> float:
        m = _TRANSITION.search(sentence)
        if m:
            parts = sentence.split(m.group())
            if len(parts) > 0:
                sentence = parts[-1]

        items_list: list = []
        for hit in self._trie.scan_fmm(sentence):
            self._put_note(items_list, _Item(
                hit['offset'][0], hit['offset'][1], 20, 20, hit['text']))

        val_list: list = []
        sentence_not = 1.0
        sentence_weight = 1.0
        for x in items_list:
            word = x.word
            if word in self.sentiment_dict:
                word_val = self.sentiment_dict[word]
                if sentence_weight != 1.0:
                    word_val *= sentence_weight
                if sentence_not != 1.0:
                    word_val *= sentence_not
                if word_val < 0:
                    word_val *= 2
                val_list.append(word_val)
                sentence_not = 1.0
                sentence_weight = 1.0
            elif word in self.negative_list:
                if x.next_len < 6:
                    sentence_not = -1.0
            elif word in self.weight_dict:
                word_weight = self.weight_dict[word]
                if x.bias == _BIAS_LEFT and val_list:
                    val_list[-1] = val_list[-1] * word_weight
                elif x.bias == _BIAS_RIGHT:
                    sentence_weight = word_weight
        return sum(val_list)

    def __call__(self, text: str) -> float:
        if not text:
            return 0.5
        sentence_list = split_sentence(text)
        total = 0.0
        for sen in sentence_list:
            total += self._sentence_sentiment(sen)
        return _sigmoid(total / len(sentence_list))
