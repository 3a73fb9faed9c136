"""Sentence splitting kernel.

Reproduces the reference SplitSentence state machine
(/root/reference/jionlp/gadget/split_sentence.py:48-142): split on a
punctuation class (coarse = sentence-enders + quotes, fine = all clause
punctuation), then re-merge fragments around quotes — an opening quote binds
to the sentence that FOLLOWS it (unless the preceding fragment lacks a
terminal punct, in which case it binds backwards), a closing quote binds to
the sentence before it, and the fragment after a closing quote starts a new
sentence only if a terminator precedes the quote.
"""

from __future__ import annotations

import re

_PUNCS_FINE = {'……', '\r\n', '，', '。', ';', '；', '…', '！', '!',
               '?', '？', '\r', '\n', '“', '”', '‘', '’', '：'}
_PUNCS_COARSE = {'。', '！', '？', '\n', '“', '”', '‘', '’'}
_FRONT_QUOTES = {'“', '‘'}
_BACK_QUOTES = {'”', '’'}

_COARSE_RE = re.compile('([。“”！？\n])')
_FINE_RE = re.compile('([，：。;“”；…！!?？\r\n])')


def split_sentence(text: str, criterion: str = 'coarse') -> list:
    if criterion == 'coarse':
        fragments = _COARSE_RE.split(text)
        puncs = _PUNCS_COARSE
    elif criterion == 'fine':
        fragments = _FINE_RE.split(text)
        puncs = _PUNCS_FINE
    else:
        raise ValueError("criterion must be 'coarse' or 'fine'")

    out: list = []
    quote_open = False
    for frag in fragments:
        if frag == '':
            continue

        if frag in puncs:
            if not out:
                if frag in _FRONT_QUOTES:
                    quote_open = True
                out.append(frag)
                continue
            if frag in _FRONT_QUOTES:
                if out[-1][-1] in puncs:
                    out.append(frag)       # fresh sentence led by the quote
                else:
                    out[-1] += frag        # no terminator → bind backwards
                quote_open = True
            else:
                out[-1] += frag            # ordinary punct joins prior text
            continue

        # non-punctuation fragment
        if not out:
            out.append(frag)
            continue
        if quote_open:
            out[-1] += frag                # quoted text follows its quote
            quote_open = False
            continue
        if out[-1][-1] in _BACK_QUOTES:
            if len(out[-1]) <= 1:
                out[-1] += frag
            elif out[-1][-2] in puncs:
                out.append(frag)           # 。” → new sentence
            else:
                out[-1] += frag
        else:
            out.append(frag)
    return out
