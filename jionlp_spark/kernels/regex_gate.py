"""Sound must-contain-character prescreen for regex batteries.

``required_chars(pattern)`` returns a frozenset S such that EVERY string
matched by the pattern contains at least one character of S — or None when
no such (small) set can be proven.  A caller holding ``chars =
set(haystack)`` may then skip ``pattern.search(haystack)`` whenever
``S & chars`` is empty: the search provably returns None.

Soundness argument: a match of the pattern matches its top-level node
sequence in order.  If ONE node in the sequence is guaranteed to consume at
least one character drawn from a set S (a literal; a small character
class; a repeat with min >= 1 of such a node; an alternation whose every
branch guarantees some set — union), then the match contains a char of S.
Everything unprovable (min=0 repeats, negated/huge/category classes,
lookarounds, anchors, backrefs, '.', unknown opcodes) contributes nothing —
the analysis then tries the next node of the sequence, and returns None if
no node qualifies.  None means "always run the search"; a returned set can
only suppress searches that cannot match.

Used by the timeparse pattern batteries (~60 sequential .search calls per
candidate substring, most of which cannot match because the string lacks
every anchor character of the pattern — 年月日时点分秒…).  Flags other than
re.UNICODE (e.g. IGNORECASE) disable the analysis conservatively.
"""

from __future__ import annotations

import re
import warnings

with warnings.catch_warnings():
    warnings.simplefilter('ignore')
    import sre_parse
    try:
        from sre_constants import (ANY, BRANCH, IN, LITERAL, MAX_REPEAT,
                                   MIN_REPEAT, NEGATE, RANGE, SUBPATTERN)
    except ImportError:                                  # pragma: no cover
        from re._constants import (ANY, BRANCH, IN, LITERAL, MAX_REPEAT,
                                   MIN_REPEAT, NEGATE, RANGE, SUBPATTERN)

_MAX_CLASS = 128


def _class_chars(items, max_class: int):
    """IN-node items → set of member chars, or None (negated/category/
    too large)."""
    out: set = set()
    for op, av in items:
        if op is NEGATE:
            return None
        if op is LITERAL:
            out.add(chr(av))
        elif op is RANGE:
            lo, hi = av
            if hi - lo + 1 > max_class or len(out) + hi - lo + 1 > max_class:
                return None
            out.update(chr(c) for c in range(lo, hi + 1))
        else:           # CATEGORY (\d, \w, ...) or anything unknown
            return None
        if len(out) > max_class:
            return None
    return out


def _node_set(op, av, max_class: int):
    """One parsed node → guaranteed must-contain set, or None."""
    if op is LITERAL:
        return {chr(av)}
    if op is IN:
        return _class_chars(av, max_class)
    if op in (MAX_REPEAT, MIN_REPEAT):
        lo, _hi, sub = av
        if lo >= 1:
            return _seq_set(sub, max_class)
        return None
    if op is SUBPATTERN:
        # (group, add_flags, del_flags, subpattern); any flag change →
        # conservative None
        _g, add_f, del_f, sub = av
        if add_f or del_f:
            return None
        return _seq_set(sub, max_class)
    if op is BRANCH:
        _none, branches = av
        union: set = set()
        for b in branches:
            s = _seq_set(b, max_class)
            if s is None:
                return None
            union |= s
            if len(union) > max_class:
                return None
        return union
    if op is ANY:
        return None
    # AT (anchors), ASSERT/ASSERT_NOT (lookarounds), GROUPREF, NOT_LITERAL,
    # and anything unrecognized: no guarantee from this node
    return None


def _seq_set(seq, max_class: int):
    """Sequence of nodes → the smallest single-node guarantee, or None."""
    best = None
    for op, av in seq:
        s = _node_set(op, av, max_class)
        if s:
            if best is None or len(s) < len(best):
                best = s
    return best


def required_chars(pattern, max_class: int = _MAX_CLASS):
    """Compiled pattern or source string → frozenset S (see module doc)
    or None."""
    src = pattern.pattern if hasattr(pattern, 'pattern') else pattern
    flags = pattern.flags if hasattr(pattern, 'flags') else 0
    # UNICODE (always set on str patterns) is fine; anything else that can
    # change matching semantics (IGNORECASE, LOCALE, VERBOSE already baked
    # into parse, ...) → be conservative
    if flags & (re.IGNORECASE | re.LOCALE):
        return None
    try:
        parsed = sre_parse.parse(src, flags)
    except Exception:
        return None
    s = _seq_set(list(parsed), max_class)
    return frozenset(s) if s else None
