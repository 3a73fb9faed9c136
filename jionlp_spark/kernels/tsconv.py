"""Traditional ⟷ simplified Chinese conversion kernel.

Semantics follow the reference TSConversion
(/root/reference/jionlp/gadget/ts_conversion.py:53-160): ``char`` mode maps
characters through the char table one by one; ``word`` mode runs forward-
maximum-match over a joint trie of char+word entries tagged with their
direction and substitutes matched tokens.  Tables are injected (loaded by
:mod:`jionlp_spark.lexicons`).
"""

from __future__ import annotations

from .trie import CharTrie


class TSConverter:
    def __init__(self, tra2sim_char: dict, sim2tra_char: dict,
                 tra2sim_word: dict, sim2tra_word: dict) -> None:
        self.tra2sim_char = tra2sim_char
        self.sim2tra_char = sim2tra_char
        # char entries first, then word entries (word overrides char for
        # multi-char keys; single-char conflicts keep the char entry, same
        # net mapping as the reference dict merge ts_conversion.py:45-46)
        self.tra2sim_token = dict(tra2sim_char, **tra2sim_word)
        self.sim2tra_token = dict(sim2tra_char, **sim2tra_word)

        self.trie = CharTrie()
        for w in self.tra2sim_token:
            self.trie.add(w, 'tra')
        for w in self.sim2tra_token:
            self.trie.add(w, 'sim')

    def _convert_word(self, text: str, direction: str, table: dict) -> str:
        out = []
        i = 0
        n = len(text)
        depth = self.trie.depth
        while i < n:
            window = text[i: i + depth]
            step, typing = self.trie.longest_prefix(window)
            token = window[:step]
            if typing == direction:
                # .get guard: a lowercase variant of an uppercase dict key
                # (e.g. 'u盘' vs 'U盘') matches the case-folded trie but is
                # absent from the table; the reference raises KeyError there
                # (ts_conversion.py:99) — we pass the token through instead
                # of killing the executor task.
                out.append(table.get(token, token))
            else:
                out.append(token)
            i += step
        return ''.join(out)

    def tra2sim(self, text: str, mode: str = 'char') -> str:
        if mode == 'char':
            t = self.tra2sim_char
            return ''.join(t.get(ch, ch) for ch in text)
        return self._convert_word(text, 'tra', self.tra2sim_token)

    def sim2tra(self, text: str, mode: str = 'char') -> str:
        if mode == 'char':
            t = self.sim2tra_char
            return ''.join(t.get(ch, ch) for ch in text)
        return self._convert_word(text, 'sim', self.sim2tra_token)
