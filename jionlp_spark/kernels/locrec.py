"""Document home-location recognizer — full port of the reference
LocationRecognizer (/root/reference/jionlp/gadget/location_recognizer.py:
44-450) with the jiojio POS stage as the injected boundary.

The reference's candidate words are the ``ns``-tagged tokens of
``jiojio.cut`` (:386-387) — a CWS model this sandbox doesn't have.
Everything downstream is model-free and ported exactly: the china/world
admin-map construction (:119-165), per-word candidate expansion
(:166-262), the hierarchical up/down-level merge (:263-379), and the
top-k / others aggregation (:379-450).  ``__call__`` takes the candidate
WORD LIST directly; callers supply it from any tagger — the engine's
operators feed lexicon-NER mention surfaces (the documented
substitution, SURVEY §2.4).

Reference quirks preserved:

- city aliases can never match a candidate: the loader stores them as a
  LIST (dictionary_loader.py:  city '_alias'), and the match loop
  compares each element of ``[city, alias_list]`` to the word with
  ``==`` (:186-190) — a list never equals a string;
- ``offset_list`` leaks from the match loop (:195-197): when a word
  matches multiple levels of one row, the LAST match's offsets win;
- the merge marks the shorter of two combinable locations non-final but
  still appends it (:299-320), so counts accumulate across levels.

Parity: tests/test_locrec.py drives the reference class with
``jiojio.cut`` stubbed to emit the same word list — outputs must be
equal structure-for-structure.
"""

from __future__ import annotations

import collections
import copy


def build_china_map(admin_rows) -> list:
    """admin_rows = lexicons.load_admin_divisions() →
    [[prov, alias], [city|None, alias_list|None], [county|None, alias|None]]
    per row, in file order (reference _mapping_china_location :119-147)."""
    out = []
    for r in admin_rows:
        out.append([
            [r['province'], r['province_alias']],
            [r['city'], r['city_alias']] if r['city'] else [None, None],
            [r['county'], r['county_alias']] if r['county']
            else [None, None]])
    return out


def build_world_map(world_loc: dict) -> list:
    """world_loc = lexicons.load_world_locations() →
    [[[country, full_name], city|None], ...] (reference
    _mapping_world_location :148-165)."""
    out = []
    for continent in world_loc:
        for country in world_loc[continent]:
            info = world_loc[continent][country]
            cities = [info['capital']]
            if 'main_city' in info:
                cities.extend(info['main_city'])
            out.append([[country, info['full_name']], None])
            for city in cities:
                out.append([[country, info['full_name']], city])
    return out


class LocationRecognizer:
    def __init__(self, china_map: list, world_map: list) -> None:
        self.china_administrative_map_list = china_map
        self.world_administrative_map_list = world_map

    def get_china_candidates(self, location: str) -> list:
        """Reference :166-212 (incl. the offset_list leak and the
        list-typed city alias that never matches)."""
        level_list = ['province', 'city', 'county']
        candidate_admin_list = []
        for admin_item in self.china_administrative_map_list:
            count = 0
            offset_list = None
            for idx, name_item in enumerate(admin_item):
                match_flag = False
                for name in name_item:
                    if name is not None and name == location:
                        match_flag = True
                        break
                if match_flag:
                    count += 1
                    offset_list = [1 if i <= idx else 0 for i in range(3)]
            if count > 0:
                cur_item = {}
                for level, offset, name in zip(level_list, offset_list,
                                               admin_item):
                    cur_item[level] = name[0] if offset == 1 else None
                if cur_item not in candidate_admin_list:
                    candidate_admin_list.append(cur_item)
        return candidate_admin_list

    def get_world_candidates(self, location: str) -> list:
        """Reference :213-262 (city matches either the bare name or the
        name with a trailing 市 stripped from the word)."""
        level_list = ['country', 'city']
        candidate_admin_list = []
        for admin_item in self.world_administrative_map_list:
            count = 0
            offset_list = None
            for idx, name_item in enumerate(admin_item):
                match_flag = False
                if idx == 0:
                    for name in name_item:
                        if name is not None and name == location:
                            match_flag = True
                            break
                else:
                    if name_item is not None and name_item in (
                            location, location.replace('市', '')):
                        match_flag = True
                if match_flag:
                    count += 1
                    offset_list = [1 if i <= idx else 0 for i in range(2)]
            if count > 0:
                cur_item = {}
                for level, offset, name in zip(level_list, offset_list,
                                               admin_item):
                    if offset == 1:
                        cur_item[level] = (name[0]
                                           if isinstance(name, list)
                                           else name)
                    else:
                        cur_item[level] = None
                if cur_item not in candidate_admin_list:
                    candidate_admin_list.append(cur_item)
        return candidate_admin_list

    @staticmethod
    def _combine_locations(combine_list: list, cur_location: list,
                           keys: tuple) -> list:
        """Reference :263-379 — the china and world variants are the
        same algorithm over different key tuples."""
        if len(combine_list) == 0:
            cur_location.append(True)
            combine_list.append(cur_location)
            return combine_list

        combine_flag = False
        for item in combine_list:
            cur_combine_flag = True
            for k in keys:
                if item[0][k] is not None \
                        and cur_location[0][k] is not None \
                        and item[0][k] != cur_location[0][k]:
                    cur_combine_flag = False
            if cur_combine_flag:
                none_num = len([v for v in item[0].values() if v is None])
                cur_none_num = len([v for v in cur_location[0].values()
                                    if v is None])
                if none_num < cur_none_num:
                    item[1] = item[1] + cur_location[1]
                    cur_location.append(False)
                    combine_flag = True
                else:
                    item[2] = False
                    cur_location[1] = item[1] + cur_location[1]
                    cur_location.append(True)
                    combine_flag = True
        if combine_flag:
            combine_list.append(cur_location)
        else:
            cur_location.append(True)
            combine_list.append(cur_location)
        return combine_list

    def __call__(self, candidate_words: list, top_k='default') -> dict:
        """Reference __call__ (:379-450) from the word list onward."""
        final_res = {'domestic': None, 'foreign': None, 'others': None}
        if len(candidate_words) == 0:
            return final_res

        location_count = dict(
            collections.Counter(candidate_words).most_common())
        not_matched_list = copy.deepcopy(location_count)

        china_combine_list: list = []
        for location, count in location_count.items():
            china_candidates = self.get_china_candidates(location)
            if len(china_candidates) > 0:
                not_matched_list.pop(location)
                for cand in china_candidates:
                    china_combine_list = self._combine_locations(
                        china_combine_list, [cand, count],
                        ('province', 'city', 'county'))
        domestic_locations = sorted(
            [item[:2] for item in china_combine_list if item[-1]],
            key=lambda i: i[1], reverse=True)

        world_combine_list: list = []
        for location, count in location_count.items():
            world_candidates = self.get_world_candidates(location)
            if len(world_candidates) > 0:
                if location in not_matched_list:
                    not_matched_list.pop(location)
                for cand in world_candidates:
                    world_combine_list = self._combine_locations(
                        world_combine_list, [cand, count],
                        ('country', 'city'))
        foreign_locations = sorted(
            [item[:2] for item in world_combine_list if item[-1]],
            key=lambda i: i[1], reverse=True)

        if len(domestic_locations) > 0:
            final_res['domestic'] = domestic_locations[:3] \
                if top_k == 'default' else domestic_locations[:top_k]
        if len(foreign_locations) > 0:
            final_res['foreign'] = foreign_locations[:3] \
                if top_k == 'default' else foreign_locations[:top_k]
        if len(not_matched_list) > 0:
            final_res['others'] = not_matched_list
        return final_res
