"""Resident-ID parsing kernel.

Mirrors the reference IDCardParser
(/root/reference/jionlp/gadget/id_card_parser.py:67-100): validate against
the strict check pattern, resolve the 6-digit admin prefix with a 6→4→2 digit
fallback against the admin-division code map, derive birth date, gender from
the parity of digit 17, and lowercase a trailing 'X'.
"""

from __future__ import annotations

import re

from . import patterns as P


class IdCardParser:
    def __init__(self, admin_code_map: dict) -> None:
        """admin_code_map: 6-digit admin code -> (province, city, county),
        including province-level 'XX0000' and city-level 'XXXX00' rows."""
        self._check = re.compile(P.ID_CARD_CHECK)
        self._codes = admin_code_map

    def parse(self, id_card: str) -> dict | None:
        if self._check.match(id_card) is None:
            return None

        codes = self._codes
        if id_card[:6] in codes:
            prov, city, county = codes[id_card[:6]]
        elif id_card[:4] + '00' in codes:
            prov, city, county = codes[id_card[:4] + '00']
        elif id_card[:2] + '0000' in codes:
            prov, city, county = codes[id_card[:2] + '0000']
        else:
            return None

        gender = '男' if int(id_card[-2]) % 2 else '女'
        check_code = id_card[-1]
        if check_code == 'X':
            check_code = 'x'

        return {'province': prov, 'city': city, 'county': county,
                'birth_year': id_card[6:10],
                'birth_month': id_card[10:12],
                'birth_day': id_card[12:14],
                'gender': gender,
                'check_code': check_code}
