"""Phone-number canonicalization + geo lookup kernel.

Mirrors the reference PhoneLocation
(/root/reference/jionlp/gadget/phone_location.py:81-151): a cell number is
recognized by its check pattern, located by the longest known prefix of its
first 7 digits, and attributed to an operator by its first 4 digits; a
landline is located by its leading area code.  Lookup tables are injected
(built by :mod:`jionlp_spark.lexicons` on the driver and broadcast), keeping
this kernel import-light on executors.
"""

from __future__ import annotations

import re

from . import patterns as P
from .trie import CharTrie


class PhoneLocator:
    def __init__(self, cell_prefix_map: dict, area_code_map: dict,
                 operator_map: dict) -> None:
        """
        cell_prefix_map: 7-digit prefix -> "province city"
        area_code_map:   landline area code (e.g. '021') -> "province city"
        operator_map:    leading digits (e.g. '1328') -> operator name
        """
        self._cell_re = re.compile(P.CELL_PHONE_CHECK)
        self._landline_re = re.compile(P.LANDLINE_PHONE_CHECK)
        self._area_code_re = re.compile(P.LANDLINE_AREA_CODE)
        self._cell_trie = CharTrie()
        for num, loc in cell_prefix_map.items():
            self._cell_trie.add(num, loc)
        self._op_trie = CharTrie()
        for num, op in operator_map.items():
            self._op_trie.add(num, op)
        self._area_codes = area_code_map

    def locate(self, text: str) -> dict:
        """Locate a phone mention.

        The reference check pattern needs a non-digit before the number
        (rule_pattern.py:18 lookbehind), so callers there pass the number
        with leading context; we pad internally so a bare extracted mention
        still resolves, and report the unpadded mention as ``number``.

        Deliberate divergence: on a cell prefix absent from the lexicon the
        reference crashes (``location.split`` on None,
        phone_location.py:91); we return province/city = None instead so a
        distributed run never dies on one unknown prefix.  Asserted by
        tests/test_kernels_parity.py::test_phone_loc_unknown_prefix.
        """
        padded = P.PAD_GENERIC + text
        res = self._cell_re.search(padded)
        if res is not None:
            number = res.group()
            _, location = self._cell_trie.longest_prefix(number[:7])
            if location is not None:
                province, city = location.split(' ')
            else:
                province, city = None, None
            _, operator = self._op_trie.longest_prefix(number[:4])
            return {'number': text, 'province': province, 'city': city,
                    'type': 'cell_phone', 'operator': operator}

        res = self._landline_re.search(padded)
        if res is not None:
            code_m = self._area_code_re.search(padded)
            if code_m is not None:
                loc = self._area_codes.get(code_m.group(1), ' ')
                province, city = loc.split(' ')
                if province == '':
                    province, city = None, None
                return {'number': text, 'province': province, 'city': city,
                        'type': 'landline_phone'}
            return {'number': text, 'province': None, 'city': None,
                    'type': 'landline_phone'}

        return {'number': text, 'province': None, 'city': None,
                'type': 'unknown'}

    def canonical_number(self, text: str) -> str:
        """Canonical digit form: strip +86 and separators."""
        return re.sub(r'[^\d]', '', text).removeprefix('86') \
            if text.startswith(('+86', '86-', '86 ')) \
            else re.sub(r'[\(\)（） —\-]', '', text)
