"""Measure the recognize_location POS-boundary divergence on REALISTIC
text (r5 verdict item 6).

r5 quantified candidate RECALL over the admin vocabularies (0.998 china /
1.0 world).  The axis that measurement does not cover: on real documents
the reference's jiojio POS stage also surfaces OUT-OF-DICTIONARY place
words (长江, 中关村, ...) as candidates.  This script measures whether
those words can ever change the TOP domestic/foreign answer — the number
the north star's P/R target actually depends on.

Structural fact first (the measurement confirms it): in the reference,
candidates that match neither admin map go ONLY to ``not_matched_list``
→ the ``others`` bucket (location_recognizer.py:392-440 — domestic is
built solely from get_china_candidates hits :397-404, foreign solely
from get_world_candidates hits :411-421).  An out-of-dict word therefore
CANNOT enter the domestic/foreign rankings; the only output it can
change is the ``others`` listing.

Corpus: every long (≥120-char, majority-CJK) string literal in the
reference's own source tree — its demo/docstring news texts, the most
realistic Chinese text the sandbox ships (256 texts).

Per text:
  1. candidates = combined china+world trie FMM scan (the engine's
     production generator);
  2. oov = place-LIKE words the POS stage would plausibly add: maximal
     CJK runs ending in a geographic suffix char that the trie did NOT
     cover, plus a fixed probe list of famous out-of-dict toponyms
     found verbatim in the text;
  3. run the ported recognizer on candidates, then on candidates+oov;
  4. diverged ⇔ top domestic list or top foreign list differs.

Prints the divergence count (expected 0/N — making the structural
argument an observed number) and the others-bucket impact (texts where
``others`` WOULD list extra words the trie path cannot see — the real,
bounded divergence).
"""

import json
import re
import sys
from glob import glob
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_SUFFIX = '江河山湖海洋岛港湾峰滩碑村镇寺宫桥原漠谷洲'
_PROBES = ['长江', '黄河', '泰山', '珠穆朗玛峰', '太平洋', '中关村',
           '解放碑', '外滩', '天安门', '陆家嘴', '黄浦江', '华山',
           '长城', '故宫', '西湖']


def harvest_texts() -> list:
    texts = []
    for p in sorted(glob('/root/reference/**/*.py', recursive=True)):
        s = open(p, encoding='utf-8', errors='ignore').read()
        for m in re.findall(r"'([^']{120,})'", s) + \
                re.findall(r'"([^"]{120,})"', s):
            if sum(1 for ch in m if '一' <= ch <= '鿿') > 80:
                texts.append(m)
    return texts


def oov_place_words(text: str, covered: set) -> list:
    out = []
    for run in re.findall(r'[一-鿿]{2,5}', text):
        for i in range(len(run) - 1):
            for j in range(i + 2, min(i + 5, len(run)) + 1):
                w = run[i:j]
                if w[-1] in _SUFFIX and w not in covered:
                    out.append(w)
    out += [w for w in _PROBES if w in text and w not in covered]
    return sorted(set(out))


def main() -> None:
    from jionlp_spark import lexicons
    from jionlp_spark.kernels.locrec import (LocationRecognizer,
                                             build_china_map,
                                             build_world_map)
    from jionlp_spark.kernels.trie import build_trie

    china = lexicons.location_ner_words()
    world = lexicons.world_ner_words()
    trie = build_trie({'location': sorted(set(china) | set(world))})
    rec = LocationRecognizer(
        build_china_map(lexicons.load_admin_divisions()),
        build_world_map(lexicons.load_world_locations()))
    known = set(china) | set(world)

    texts = harvest_texts()
    n_div = n_oov_texts = n_loc_texts = 0
    for t in texts:
        cands = [m['text'] for m in trie.scan_fmm(t)]
        oov = oov_place_words(t, known)
        if cands:
            n_loc_texts += 1
        if oov:
            n_oov_texts += 1
        base = rec(list(cands))
        plus = rec(list(cands) + oov)
        if (base['domestic'] != plus['domestic']
                or base['foreign'] != plus['foreign']):
            n_div += 1
    print(json.dumps({
        'texts': len(texts),
        'texts_with_trie_candidates': n_loc_texts,
        'texts_with_oov_place_words': n_oov_texts,
        'top_domestic_or_foreign_changed_by_oov': n_div,
        'others_bucket_only_divergence_rate':
            round(n_oov_texts / len(texts), 3),
    }, ensure_ascii=False))


if __name__ == '__main__':
    main()
