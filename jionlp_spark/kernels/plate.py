"""Mainland motor-vehicle licence-plate parser.

Behavioral port of the reference MotorVehicleLicencePlateParser
(/root/reference/jionlp/gadget/motor_vehicle_licence_plate.py:71-134):
plate → {car_loc: first two chars, car_type: GV|PEV|NPEV, car_size:
small|big|None}.  92-style plates (7 chars, or 8 with a gap char) are GV;
9-char (or gapless 8-char) plates are new-energy, typed by the letter
position (leading letter = small, trailing letter = big; A–E pure-electric,
F–K non-pure-electric).  Invalid input → None (the reference logs and
returns None, :79-82,:105-109).
"""

from __future__ import annotations

import re

from . import patterns as P

_PEV = 'PEV'
_NPEV = 'NPEV'
_NEV_LETTER = {'A': _PEV, 'B': _PEV, 'C': _PEV, 'D': _PEV, 'E': _PEV,
               'F': _NPEV, 'G': _NPEV, 'H': _NPEV, 'J': _NPEV, 'K': _NPEV}

_CHECK = re.compile(P.LICENCE_PLATE)
_SMALL_NEV = re.compile(
    r'([ABCDEFGHJK][A-HJ-NP-Za-hj-np-z]\d{4}|[ABCDEFGHJK]\d{5})$')
_BIG_NEV = re.compile(r'(\d{5}[ABCDEFGHJK])$')
_GAP_CHARS = '·. 　'  # incl. full- and half-width spaces


def _judge_new_energy(plate: str):
    small = _SMALL_NEV.search(plate)
    big = _BIG_NEV.search(plate)
    if small and big is None:
        return _NEV_LETTER[small.group()[0]], 'small'
    if small is None and big:
        return _NEV_LETTER[big.group()[-1]], 'big'
    return None, None


def parse_licence_plate(plate: str):
    """→ {'car_loc', 'car_type', 'car_size'} or None if not a valid plate."""
    if _CHECK.match(plate) is None:
        return None
    car_type, car_size = None, None
    length = len(plate)
    if length == 9:
        car_type, car_size = _judge_new_energy(plate)
    elif length == 8:
        if plate[2] in _GAP_CHARS:
            car_type = 'GV'
        else:
            car_type, car_size = _judge_new_energy(plate)
    elif length == 7:
        car_type = 'GV'
    else:
        return None
    return {'car_loc': plate[:2], 'car_type': car_type, 'car_size': car_size}
