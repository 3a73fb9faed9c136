"""One-shot vendoring script: derive the small deterministic lexicon subsets
shipped under jionlp_spark/lexicons/data/ from a full JioNLP-format
dictionary directory (run with JIONLP_SPARK_DICT_DIR set).

The subsets are factual reference data (admin divisions, phone prefixes,
dialing codes, operators) — kept small so the repo stays standalone; the
full dictionaries can be swapped in at runtime via JIONLP_SPARK_DICT_DIR.

Selection is deterministic (sorted, fixed caps + a fixed must-keep list that
covers the synthetic fixture corpus).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from jionlp_spark import lexicons  # noqa: E402

DATA = os.path.join(os.path.dirname(lexicons.__file__), 'data')

MUST_CITIES = {
    '北京市', '上海市', '天津市', '重庆市', '广州市', '深圳市', '揭阳市',
    '贵阳市', '襄阳市', '湘潭市', '成都市', '武汉市', '杭州市', '南京市',
    '西安市', '沈阳市', '长沙市', '郑州市', '青岛市', '朝阳市',
}
MUST_COUNTIES = {
    '云岩区', '嘉定区', '湘潭县', '朝阳区', '海淀区', '榕城区', '普宁市',
    '喀喇沁左翼蒙古族自治县', '襄城区', '樊城区', '宝山区', '天河区',
}
CELL_FRONTS = ('132', '133', '135', '136', '138', '139', '150', '151',
               '152', '155', '156', '158', '159', '186', '187', '188')


def main(dict_dir):
    os.makedirs(DATA, exist_ok=True)

    # --- admin divisions ---------------------------------------------------
    rows = lexicons._parse_jionlp_china_location(
        os.path.join(dict_dir, 'china_location.txt'))
    keep = []
    seen_city_per_prov = {}
    seen_county_per_city = {}
    for r in rows:
        if r['city'] is None:
            keep.append(r)  # all provinces
        elif r['county'] is None:
            n = seen_city_per_prov.setdefault(r['province'], [0])
            if r['city'] in MUST_CITIES or n[0] < 3:
                keep.append(r)
                n[0] += 1
            elif any(c in MUST_CITIES for c in (r['city'],)):
                keep.append(r)
        else:
            # keep counties only for kept cities
            if not any(k['city'] == r['city'] and k['county'] is None
                       for k in keep):
                if r['county'] in MUST_COUNTIES:
                    # force-keep the parent city too
                    keep.append({**r, 'county': None, 'county_code': None,
                                 'county_alias': None})
                else:
                    continue
            n = seen_county_per_city.setdefault(r['city'], [0])
            if r['county'] in MUST_COUNTIES or n[0] < 3:
                keep.append(r)
                n[0] += 1

    with open(os.path.join(DATA, 'admin_div.tsv'), 'w', encoding='utf-8') as f:
        for r in keep:
            f.write('\t'.join([
                r['province'], r['province_code'], r['province_alias'],
                r['city'] or '', r['city_code'] or '',
                '/'.join(r['city_alias']) if r['city_alias'] else '',
                r['county'] or '', r['county_code'] or '',
                r['county_alias'] or '']) + '\n')
    print('admin_div rows:', len(keep))

    # --- phone prefixes ----------------------------------------------------
    cell_map, area_map = lexicons._parse_jionlp_phone_location(
        os.path.join(dict_dir, 'phone_location.txt'))
    kept_cities = {(r['province'], r['city']) for r in keep if r['city']}
    city_names = {c[:-1] if c.endswith('市') else c for _, c in kept_cities}
    sel = {}
    for prefix in sorted(cell_map):
        loc = cell_map[prefix]
        city_short = loc.split(' ')[1]
        if prefix[:3] in CELL_FRONTS and city_short in city_names:
            sel[prefix] = loc
    with open(os.path.join(DATA, 'cell_prefix.tsv'), 'w', encoding='utf-8') as f:
        for prefix in sorted(sel):
            f.write(f'{prefix}\t{sel[prefix]}\n')
    print('cell_prefix rows:', len(sel))

    with open(os.path.join(DATA, 'area_code.tsv'), 'w', encoding='utf-8') as f:
        for code in sorted(area_map):
            f.write(f'{code}\t{area_map[code]}\n')
    print('area_code rows:', len(area_map))

    # --- operators ----------------------------------------------------------
    ops = lexicons.load_telecom_operator(dict_dir)
    with open(os.path.join(DATA, 'operator.tsv'), 'w', encoding='utf-8') as f:
        for num in sorted(ops):
            f.write(f'{num}\t{ops[num]}\n')
    print('operator rows:', len(ops))

    # --- location changes ----------------------------------------------------
    changes = lexicons.load_location_changes(dict_dir)
    with open(os.path.join(DATA, 'location_change.tsv'), 'w',
              encoding='utf-8') as f:
        for ch in changes:
            o, oa, n = ch['old'], ch['old_alias'], ch['new']
            f.write('\t'.join([o[0] or '', oa[0] or '', o[1] or '',
                               oa[1] or '', o[2] or '', oa[2] or '',
                               n[0] or '', n[1] or '',
                               (n[2] or '') if len(n) > 2 else '']) + '\n')
    print('location_change rows:', len(changes))

    # --- sentiment lexicons --------------------------------------------------
    # negative + expand word lists are tiny → vendored whole; the 33k-entry
    # sentiment_words file is capped at the strongest |weight| entries PLUS
    # every entry that is a substring of the fixture sentences (so vendored
    # FMM segmentation is identical to the full dictionary on those)
    fixture_sentences = SENTIMENT_FIXTURES
    sw = {}
    with open(os.path.join(dict_dir, 'sentiment_words.txt'),
              encoding='utf-8') as f:
        for line in f:
            word, weight = line.rstrip('\n').split('\t')
            sw[word] = float(weight)
    must = {w for w in sw
            if any(w in s for s in fixture_sentences)}
    ranked = sorted(sw, key=lambda w: (-abs(sw[w]), w))
    keep_words = set(ranked[:8000]) | must
    with open(os.path.join(DATA, 'sentiment_words.tsv'), 'w',
              encoding='utf-8') as f:
        for w in sorted(keep_words):
            f.write(f'{w}\t{sw[w]}\n')
    print('sentiment words rows:', len(keep_words), 'must-keep:', len(must))

    for name in ('negative_words', 'sentiment_expand_words'):
        with open(os.path.join(dict_dir, f'{name}.txt'),
                  encoding='utf-8') as f:
            content = f.read()
        out = 'negative.tsv' if name == 'negative_words' else 'expand.tsv'
        with open(os.path.join(DATA, out), 'w', encoding='utf-8') as f:
            f.write(content)
        print(f'{name} vendored whole')


# fixture sentences used by the sentiment driver query — every full-dict
# word occurring in them must survive the vendoring cap
SENTIMENT_FIXTURES = (
    '今天天气真好，心情舒畅，非常开心。',
    '这部电影不好看，情节拖沓，令人失望。',
    '虽然开局不利，可是结局非常圆满，大家都很高兴！',
    '14岁女孩坠亡生前遭强奸致孕。',
)


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1
         else os.environ['JIONLP_SPARK_DICT_DIR'])
