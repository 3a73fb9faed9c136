"""Location parsing / entity-linking kernel.

Behavioral port of the reference LocationParser
(/root/reference/jionlp/gadget/location_parser.py): given a Chinese address
or free-text string, resolve province/city/county via substring candidate
generation over the admin-division map (full names + aliases + old names)
and a tie-breaking cascade (steps 2.0–3.2), then assemble
{province, city, county, detail, full_location, orig_location} with
old→new renames applied.

Performance: the reference scans all ~4–5k admin rows per call with `in`
checks — its author flags this as the hotspot (location_parser.py:74-77).
We prefilter with a one-pass trie scan over the text (all matched names →
candidate row ids via an inverted index) and replay the EXACT per-row logic
only on rows that can match, preserving candidate order and every
tie-breaking rule.  Admin names are Chinese, so the trie's ASCII
case-folding cannot desync the prefilter from the exact `in` checks.
"""

from __future__ import annotations

import collections
import re

from .trie import CharTrie

MUNICIPALITIES = {'北京', '上海', '天津', '重庆', '香港', '澳门'}

_ALIAS_SENTINEL = '【loc_alias】'
_ALIAS_SUFFIX_RE = re.compile('(【loc_alias】(路|大街|街))')


class AdminRow:
    """One admin-map row: code, (prov, prov_alias), (city, city_alias),
    (county, county_alias), is_new (False = pre-2018 old name)."""
    __slots__ = ('code', 'levels', 'is_new')

    def __init__(self, code, prov, city, county, is_new) -> None:
        self.code = code
        self.levels = (prov, city, county)   # each a [name, alias] pair
        self.is_new = is_new


def build_admin_map(admin_rows: list, location_changes: list):
    """Build the expanded candidate row list from lexicon loader output
    (mirrors location_parser.py:73-133 _mapping):

    * municipality province-level rows are skipped (always match at city
      level);
    * one row per city alias;
    * county '…经济技术开发区' collapses to the bare suffix;
    * old names from the change log are appended with code '000000' and an
      old→new map keyed by concatenated full names.
    """
    rows: list = []
    for r in admin_rows:
        if r['city'] is None:
            if r['province_alias'] in MUNICIPALITIES:
                continue
            rows.append(AdminRow(r['province_code'],
                                 [r['province'], r['province_alias']],
                                 [None, None], [None, None], True))
        elif r['county'] is None:
            for alias in r['city_alias']:
                rows.append(AdminRow(r['city_code'],
                                     [r['province'], r['province_alias']],
                                     [r['city'], alias],
                                     [None, None], True))
        else:
            county = '经济技术开发区' if r['county'].endswith('经济技术开发区') \
                else r['county']
            for alias in r['city_alias']:
                rows.append(AdminRow(r['county_code'],
                                     [r['province'], r['province_alias']],
                                     [r['city'], alias],
                                     [county, r['county_alias']], True))

    old2new: dict = {}
    for ch in location_changes:
        old_full = [ch['old'][0], ch['old'][1], ch['old'][2]]
        old_alias = list(ch.get('old_alias') or (None, None, None))
        rows.append(AdminRow('000000',
                             [old_full[0], old_alias[0]],
                             [old_full[1], old_alias[1]],
                             [old_full[2], old_alias[2]], False))
        key = ''.join(n for n in old_full if n is not None)
        old2new[key] = list(ch['new'])
    return rows, old2new


class LocationParser:
    def __init__(self, admin_rows: list, location_changes: list,
                 town_village_dict: dict | None = None) -> None:
        # {prov+city+county: {town: {village: None}}}, same keying as the
        # reference (location_parser.py:118-122)
        self.town_village_dict = town_village_dict or {}
        self.rows, self.old2new = build_admin_map(admin_rows,
                                                  location_changes)
        # inverted index: name -> sorted row ids (prefilter only)
        self._name_index: dict = collections.defaultdict(list)
        self._trie = CharTrie()
        for idx, row in enumerate(self.rows):
            for name, alias in row.levels:
                for n in (name, alias):
                    if n:
                        self._name_index[n].append(idx)
                        self._trie.add(n, True)

    # -- candidate generation (location_parser.py:154-220) --------------------

    def _candidate_rows(self, text: str) -> list:
        hits = self._trie.scan_all(text)
        ids: set = set()
        for name in hits:
            ids.update(self._name_index.get(name, ()))
        return sorted(ids)

    @staticmethod
    def _alias_ok(name: str, text: str) -> bool:
        """Skip aliases immediately followed by 路/大街/街 (太原路 ≠ 太原)."""
        masked = text.replace(name, _ALIAS_SENTINEL)
        return _ALIAS_SUFFIX_RE.search(masked) is None

    def get_candidates(self, text: str) -> list:
        """→ [(row, count, offset_list)] preserving admin-map order."""
        out = []
        for idx in self._candidate_rows(text):
            row = self.rows[idx]
            count = 0
            offsets = [[-1, -1], [-1, -1], [-1, -1]]
            for lvl, name_pair in enumerate(row.levels):
                cur_name = cur_alias = None
                for alias_idx, name in enumerate(name_pair):
                    if name is not None and name in text:
                        if alias_idx == 1 and not self._alias_ok(name, text):
                            continue
                        cur_name, cur_alias = name, alias_idx
                        break
                if cur_name is None:
                    continue
                count += 1
                offsets[lvl][0] = text.index(cur_name)
                offsets[lvl][1] = cur_alias
                # adjacent-offset sanity: “青海西宁” must not yield 海西
                if lvl == 1 and offsets[0][0] >= 0 and \
                        offsets[1][0] - offsets[0][0] == 1:
                    count = 0
                    break
                if lvl == 2:
                    if offsets[1][0] >= 0 and \
                            offsets[2][0] - offsets[1][0] == 1:
                        count = 0
                        break
                    if offsets[0][0] >= 0 and \
                            offsets[2][0] - offsets[0][0] == 1:
                        count = 0
                        break
            if count > 0:
                if row.levels[0][1] in MUNICIPALITIES and \
                        row.levels[0][1] in text:
                    count -= 1
                out.append((row, count, offsets))
        return out

    # -- tie-breaking cascade (location_parser.py:234-420) ---------------------

    def parse(self, text: str, change2new: bool = True,
              town_village: bool = False) -> dict:
        candidates = self.get_candidates(text)
        if not candidates:
            res = {'province': None, 'city': None, 'county': None,
                   'detail': text, 'full_location': text,
                   'orig_location': text}
            if town_village:
                res.update({'town': None, 'village': None})
            return res

        # 2.0 drop rows where one offset matched a higher-level full name AND
        # a lower-level alias (湖南省长沙市 must not pull in 长沙县)
        kept = []
        for row, count, offsets in candidates:
            offs = [o[0] for o in offsets if o[0] > -1]
            if len(offs) != len(set(offs)):
                same = collections.Counter(offs).most_common()[0][0]
                same_locs = [o for o in offsets if o[0] == same]
                if same_locs[0][1] == 0 and same_locs[1][1] == 1:
                    continue
            kept.append((row, count, offsets))
        candidates = kept

        # 2.1 keep max match count
        max_count = max(c for _r, c, _o in candidates)
        candidates = [c for c in candidates if c[1] == max_count]

        # old/new same-shortname disambiguation
        if len(candidates) == 2:
            a, b = candidates
            if [o[0] for o in a[2]] == [o[0] for o in b[2]]:
                candidates = [c for c in candidates if c[0].is_new]
            elif [lv[1] for lv in a[0].levels] == [lv[1] for lv in b[0].levels]:
                candidates = [c for c in candidates if c[0].is_new]

        if len(candidates) == 1:
            return self._final(candidates[0], text, [], change2new,
                               town_village)

        # 2.2 earliest total offset first
        candidates = sorted(candidates, key=lambda c: sum(o[0] for o in c[2]))
        filtered = []
        for row, count, offsets in candidates:
            if row.levels[0][1] in MUNICIPALITIES:
                filtered.append((row, count, offsets))
            elif -1 not in (offsets[0][0], offsets[1][0], offsets[2][0]):
                if offsets[0][0] < offsets[1][0] < offsets[2][0]:
                    filtered.append((row, count, offsets))
            else:
                filtered.append((row, count, offsets))
        candidates = filtered
        if not candidates:
            res = {'province': None, 'city': None, 'county': None,
                   'detail': text, 'full_location': text,
                   'orig_location': text}
            if town_village:
                res.update({'town': None, 'village': None})
            return res

        min_offset = sum(o[0] for o in candidates[0][2])
        candidates = [c for c in candidates
                      if sum(o[0] for o in c[2]) == min_offset]

        # 2.3 prefer full names over aliases (min then sum of alias flags)
        flags = [min(o[1] for o in c[2] if o[1] > -1) for c in candidates]
        best = min(flags)
        candidates = [c for f, c in zip(flags, candidates) if f == best]
        sums = [sum(o[1] for o in c[2] if o[1] > -1) for c in candidates]
        best_sum = min(sums)
        candidates = [c for s, c in zip(sums, candidates) if s == best_sum]

        # 2.4 all-alias single matches prefer higher admin levels
        matched_nums = [len([o[0] for o in c[2] if o[0] > -1])
                        for c in candidates]
        if best == 1 and max(matched_nums) == 1:
            candidates = sorted(
                candidates,
                key=lambda c: [i for i, o in enumerate(c[2]) if o[0] != -1][0])

        # 3.1 drop old names whose mapped new name is also a candidate
        kept = []
        for row, count, offsets in candidates:
            if row.code == '000000':
                names = [lv[0] for lv in row.levels]
                if None in names:
                    kept.append((row, count, offsets))
                    continue
                new_loc = self.old2new.get(''.join(names))
                if new_loc is not None:
                    has_new = any(
                        r.code != '000000' and
                        new_loc[0] == r.levels[0][0] and
                        new_loc[1] == r.levels[1][0] and
                        new_loc[2] == r.levels[2][0]
                        for r, _c, _o in candidates)
                    if not has_new:
                        kept.append((row, count, offsets))
                else:
                    kept.append((row, count, offsets))
            else:
                kept.append((row, count, offsets))
        candidates = kept

        # 3.2 duplicated county names across different cities (鼓楼区, 高新区)
        county_names = [c[0].levels[2][c[2][2][1]] for c in candidates]
        exceptions = []
        for name in county_names:
            city_set = {c[0].levels[1][0] for c in candidates}
            if len(city_set) == 1:
                exceptions.append(name)
        dup_counts = collections.Counter(county_names).most_common()
        county_dups = [n for n, cnt in dup_counts
                       if cnt > 1 and n not in exceptions]

        return self._final(candidates[0], text, county_dups, change2new,
                           town_village)

    # -- final assembly (location_parser.py:422-491) ----------------------------

    def _final(self, candidate, text: str, county_dups: list,
               change2new: bool, town_village: bool = False) -> dict:
        row, _count, offsets = candidate
        detail_idx = 0
        prov = city = county = None
        for lvl, off in enumerate(offsets):
            if off[0] == -1:
                continue
            matched_name = row.levels[lvl][off[1]]
            detail_idx = off[0] + len(matched_name)
            if matched_name not in county_dups:
                prov = row.levels[0][0]
            if lvl >= 1 and matched_name not in county_dups:
                city = row.levels[1][0]
            if lvl >= 2 and matched_name not in county_dups:
                county = row.levels[2][0]
            else:
                county = row.levels[2][off[1]]

        if change2new:
            key = ''.join([prov or '', city or '', county or ''])
            if key in self.old2new:
                prov, city, county = self.old2new[key]

        detail = text[detail_idx:]
        if detail and detail[0] == '县':
            detail = detail[1:]

        if city is not None and '直辖' in city:
            city = None
        if county is not None and '直辖' in county:
            county = None

        admin_part = prov or ''
        if city is not None and not any(m in city for m in MUNICIPALITIES):
            admin_part += city
        if county is not None:
            admin_part += county

        res = {'province': prov, 'city': city, 'county': county,
               'detail': detail, 'full_location': admin_part + detail,
               'orig_location': text}
        if town_village:
            res = self._get_town_village(res)
        return res

    def _get_town_village(self, result: dict) -> dict:
        """Town/village lookup inside the detail remainder — port of
        location_parser.py:493-523 (first listed town contained in detail
        wins, then first village of that town)."""
        town = village = None
        prov = result['province'] if result['province'] is not None else ''
        city = result['city'] if result['city'] is not None \
            else '省直辖行政区划'
        county = result['county'] if result['county'] is not None \
            else '市直辖行政区划'
        key_name = ''.join([prov, city, county])

        tv = self.town_village_dict.get(key_name)
        if tv is None:
            result.update({'town': town, 'village': village})
            return result
        for _town in tv:
            if _town in result['detail']:
                town = _town
                break
        if town is not None:
            for _village in tv[town]:
                if _village in result['detail']:
                    village = _village
                    break
        result.update({'town': town, 'village': village})
        return result
