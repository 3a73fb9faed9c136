"""Character trie + forward-maximum-match (FMM) scanner.

Semantics match the reference TrieTree
(/root/reference/jionlp/gadget/trie_tree.py:13-77) and LexiconNER's scan loop
(/root/reference/jionlp/algorithm/ner/lexicon_ner.py:59-76): keys are
lowercased on insert and lookup, the scan is leftmost-longest,
non-overlapping, and resumes at the end of each match (or advances one char
on a miss).  The trie is built once on the driver, pickled into a Spark
broadcast, and queried inside pandas UDFs.

The per-node dict layout is deliberately flat (plain nested dicts, terminal
value under the reserved key ``1``) so pickling and broadcast stay cheap for
large lexicons (the full admin-division lexicon is ~700k entries).
"""

from __future__ import annotations

_LEAF = 1  # reserved terminal key; real keys are 1-char strings


class CharTrie:
    __slots__ = ('root', 'depth')

    def __init__(self) -> None:
        self.root: dict = {}
        self.depth = 0

    def add(self, word: str, value) -> None:
        word = word.strip()
        if word in ('', '\t', ' ', '\r'):
            return
        depth = len(word)
        node = self.root
        for ch in word.lower():
            node = node.setdefault(ch, {})
        if depth > self.depth:
            self.depth = depth
        # first value wins on conflict, like the reference's warning branch
        # (trie_tree.py:47-52 keeps the existing type)
        if _LEAF not in node:
            node[_LEAF] = value

    def add_all(self, words, value) -> None:
        for w in words:
            self.add(w, value)

    def longest_prefix(self, window: str):
        """(consumed_chars, value) for the longest dict word prefixing
        ``window``; (1, None) on miss (trie_tree.py:59-77)."""
        node = self.root
        best = None
        step = 0
        for ch in window:
            nxt = node.get(ch)
            if nxt is None:
                break
            node = nxt
            step += 1
            if _LEAF in node:
                best = (step, node[_LEAF])
        return best if best is not None else (1, None)

    def scan_all(self, text: str) -> set:
        """ALL dictionary words occurring anywhere in ``text`` (overlaps
        included) — used as the candidate prefilter index for the location
        parser.  O(len(text) · depth)."""
        found: set = set()
        n = len(text)
        for i in range(n):
            node = self.root
            j = i
            while j < n:
                node = node.get(text[j])
                if node is None:
                    break
                j += 1
                if _LEAF in node:
                    found.add(text[i:j])
        return found

    def scan_fmm(self, text: str) -> list:
        """Leftmost-longest non-overlapping matches →
        [{'type','text','offset':[s,e)}] (lexicon_ner.py:59-76)."""
        out = []
        i = 0
        n = len(text)
        depth = self.depth
        while i < n:
            window_orig = text[i: i + depth]
            step, value = self.longest_prefix(window_orig.lower())
            if value is not None:
                out.append({'type': value,
                            'text': window_orig[:step],
                            'offset': [i, i + step]})
            i += step
        return out


def build_trie(entity_dicts: dict) -> CharTrie:
    """{'type': [words...]} → CharTrie, insertion order preserved."""
    trie = CharTrie()
    for typing, words in entity_dicts.items():
        trie.add_all(words, typing)
    return trie
