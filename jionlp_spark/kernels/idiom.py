"""Idiom-chain (成语接龙) kernel.

Behavioral port of the reference IdiomSolitaire
(/root/reference/jionlp/gadget/idiom_solitaire.py:46-137): given the
current idiom, pick the next one whose first syllable matches the last
syllable of the input (same_pinyin, optionally tone-insensitive) or whose
first CHARACTER matches (same_pinyin=False); frequency-weighted choice via
the global numpy RNG (with_prob=True) or uniform via stdlib random;
per-instance already-used state with restart.

Entries are injected as [{'idiom', 'freq', 'pinyin'}] in dictionary order
(order matters for RNG-stream parity — np.random.choice indexes the backup
list).  jionlp_spark.lexicons.load_idioms precomputes the pinyin column at
vendor time, so the kernel never needs the full pinyin dictionary.
"""

from __future__ import annotations

import random as _random

import numpy as np


class IdiomSolitaire:
    def __init__(self, idiom_entries: list, pinyin_fn=None,
                 rng_np=None, rng_py=None) -> None:
        """``pinyin_fn``: optional char→pinyin callable (the chartext Pinyin
        kernel) used to syllabify inputs that are NOT in the idiom table —
        the reference chains from any string (idiom_solitaire.py:88); the
        entry-table lookup alone covers known idioms.
        ``rng_np``/``rng_py``: injectable RNGs (default: the global numpy /
        stdlib streams the reference consumes) — pass per-row seeded
        instances for reproducible distributed runs."""
        self.idiom_list = idiom_entries
        self.pure_idiom_list = [e['idiom'] for e in idiom_entries]
        self.pinyin_fn = pinyin_fn
        self.rng_np = rng_np if rng_np is not None else np.random
        self.rng_py = rng_py if rng_py is not None else _random
        self.already_used_idioms: set = set()
        # O(1) membership + lazy first-syllable/char indexes whose per-key
        # lists preserve dictionary order, so the backup list (and hence the
        # np.random.choice stream) is unchanged; built on first use so any
        # malformed-entry error still surfaces on the call that needs it
        self._pure_set = set(self.pure_idiom_list)
        self._by_first_syl: dict | None = None
        self._by_first_syl_toneless: dict | None = None
        self._by_first_char: dict | None = None
        self._pinyin_last: dict | None = None

    def _syl_index(self) -> dict:
        if self._by_first_syl is None:
            idx: dict = {}
            for e in self.idiom_list:
                idx.setdefault(e['pinyin'][0], []).append(e)
            self._by_first_syl = idx
        return self._by_first_syl

    def _syl_toneless_index(self) -> dict:
        if self._by_first_syl_toneless is None:
            idx: dict = {}
            for e in self.idiom_list:
                idx.setdefault(e['pinyin'][0][:-1], []).append(e)
            self._by_first_syl_toneless = idx
        return self._by_first_syl_toneless

    def _char_index(self) -> dict:
        if self._by_first_char is None:
            idx: dict = {}
            for e in self.idiom_list:
                idx.setdefault(e['idiom'][0], []).append(e)
            self._by_first_char = idx
        return self._by_first_char

    def __call__(self, cur_idiom: str, same_pinyin: bool = True,
                 check_idiom: bool = False, same_tone: bool = True,
                 with_prob: bool = True, restart: bool = False) -> str:
        if cur_idiom == '' or type(cur_idiom) is not str:
            return ''
        if restart:
            self.already_used_idioms = set()

        if cur_idiom not in self._pure_set:
            if check_idiom:
                return 'wrong input idiom'
        else:
            self.already_used_idioms.add(cur_idiom)

        used = self.already_used_idioms
        if same_pinyin:
            # the reference recomputes the input's pinyin via Pinyin(); the
            # injected entry table carries the same values for known idioms
            cur_last = self._pinyin_of(cur_idiom)
            if cur_last is None:
                return 'can not find next'
            if same_tone:
                pool = self._syl_index().get(cur_last, ())
            else:
                pool = self._syl_toneless_index().get(cur_last[:-1], ())
            backup = [e for e in pool if e['idiom'] not in used]
        else:
            pool = self._char_index().get(cur_idiom[-1], ())
            backup = [e for e in pool if e['idiom'] not in used]

        if len(backup) == 0:
            return 'can not find next'

        if not with_prob:
            result = self.rng_py.choice(backup)
        else:
            freq = [e['freq'] for e in backup]
            total = sum(freq)
            prob = np.array([f / total for f in freq])
            result = self.rng_np.choice(backup, p=prob.ravel())
        self.already_used_idioms.add(result['idiom'])
        return result['idiom']

    def _pinyin_of(self, idiom: str):
        if self.pinyin_fn is not None:
            return self.pinyin_fn(idiom, formater='simple')[-1]
        if self._pinyin_last is None:
            # first occurrence wins, matching the linear scan it replaces
            tbl: dict = {}
            for e in self.idiom_list:
                tbl.setdefault(e['idiom'], e['pinyin'][-1])
            self._pinyin_last = tbl
        return self._pinyin_last.get(idiom)
