"""Aggregate two full-suite bench artifacts (e.g. sf0.1 vs sf1) into the
per-family scale table BENCH/PLANS.md records (r5 verdict #9 protocol).

Usage: python scripts/bench_family_table.py BENCH/a.json BENCH/b.json

Reads the LAST line of each file (bench.py prints the compact summary
line last; the full detail line precedes it), buckets every per-query
time into a family by name, and prints the markdown table plus totals.
Queries folded into ``queries_omitted`` by the 1900-char cap are
recovered from the detail line's ``query_runs`` (min of runs) when
present, so family sums cover ALL queries, not just the listed head.
"""

from __future__ import annotations

import json
import sys

FAMILIES = [
    # (family label, matcher over query name)
    ('extraction/link (kg_extract/link/check/char/redact/paren/'
     'recognize + cache)', lambda q: q.startswith((
         'kg_extract', 'kg_link', 'kg_check', 'kg_char', 'kg_redact',
         'kg_parentheses', 'kg_mentions', 'kg_location',
         'kg_recognize', 'kg_span', 'kg_entity_compare',
         'shared_extraction', 'kg_entity_counts', 'kg_cooccurrence',
         'ner_dataset', 'cws_tags', 'dataset_split'))),
    ('cleaning/normalization/textaug', lambda q: q.startswith((
        'clean_', 'norm_', 'textaug', 'sentence_split', 'idiom',
        'sentiment'))),
    ('text stats / quality / curation', lambda q: q.startswith((
        'doc_stats', 'word_freq', 'token_idf', 'token_counts',
        'bigram_pmi', 'lang_', 'quality_', 'new_word', 'mellm',
        'vocab_coverage', 'length_quantiles', 'repetition',
        'ccnet', 'dsir', 'curate', 'incremental_curate', 'host_curation',
        'training_mix', 'decontam', 'leakage', 'pack_plan',
        'event_', 'events_daily', 'entity_bursts', 'doc_fingerprint'))),
    ('keyphrase/summary/topic', lambda q: q.startswith((
        'keyphrase', 'summary', 'topic_prominence'))),
    ('dedup', lambda q: q.startswith((
        'dedup_', 'doc_winnow', 'substring_dup', 'semdedup'))),
    ('ANN / retrieval (bm25, pq, hybrid, index maintenance)',
     lambda q: q.startswith((
         'ann_', 'bm25', 'hybrid', 'pq_index'))),
    ('graph / KG (pagerank, hits, ppr, kcore, triangles, transe, '
     'entity tables, edge index)', lambda q: q.startswith((
         'kg_entity_pagerank', 'kg_entity_salience', 'kg_entity_canon',
         'kg_entity_similarity', 'kg_entity_profiles',
         'kg_entity_types', 'kg_entity_timeline', 'kg_kcore',
         'kg_triangles', 'kg_link_predict', 'kg_transe',
         'kg_negative', 'kg_edge', 'web_host_pagerank',
         'web_host_hits', 'web_seed_ppr', 'web_random_walks'))),
    ('web crawl control (links, robots, sitemap, frontier, url ops, '
     'mirror, content extract)', lambda q: q.startswith((
         'web_', 'host_'))),
    ('LM (perplexity, backoff, windows, bpe)', lambda q: q.startswith((
        'lm_', 'window_perplexity', 'bpe'))),
    ('sketches (hll, cms, bloom)', lambda q: q.startswith((
        'hll_', 'cms_', 'bloom_'))),
    ('streaming (fixed micro-batch machinery)',
     lambda q: q.startswith('streaming_')),
    ('tpch / relational', lambda q: q.startswith('tpch')),
    ('catalog / source roundtrips', lambda q: q.startswith((
        'catalog', 'source_'))),
    ('multimodal', lambda q: q.startswith('multimodal')),
]


def load(path: str) -> dict:
    lines = [ln for ln in open(path).read().splitlines() if ln.strip()]
    compact = json.loads(lines[-1])
    times = dict(compact.get('queries', {}))
    # recover capped-out queries from the detail line when present
    for ln in lines[:-1]:
        try:
            detail = json.loads(ln)
        except ValueError:
            continue
        for q, runs in detail.get('query_runs', {}).items():
            if q not in times and runs:
                times[q] = min(runs)
    compact['queries'] = times
    return compact


def family_of(q: str) -> str:
    for label, match in FAMILIES:
        if match(q):
            return label
    return 'UNMATCHED'


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    fams: dict[str, list[float]] = {}
    n_q = 0
    for q, t in a['queries'].items():
        fams.setdefault(family_of(q), [0.0, 0.0])[0] += t
        n_q += 1
    for q, t in b['queries'].items():
        fams.setdefault(family_of(q), [0.0, 0.0])[1] += t
    unmatched = [q for q in a['queries'] if family_of(q) == 'UNMATCHED']
    if unmatched:
        print('UNMATCHED:', unmatched, file=sys.stderr)
    print('| family | %s sec | %s sec | ratio |' % (
        a.get('sf'), b.get('sf')))
    print('|---|---|---|---|')
    ta = tb = 0.0
    for label, _m in FAMILIES:
        if label not in fams:
            continue
        sa, sb = fams[label]
        ta += sa
        tb += sb
        print('| %s | %.1f | %.1f | %.1f× |' % (
            label, sa, sb, (sb / sa if sa else float('nan'))))
    print('| **total (%d queries, excl. e2e)** | **%.1f** | **%.1f** |'
          ' **%.1f×** |' % (n_q, ta, tb, tb / ta))
    for side, c in (('a', a), ('b', b)):
        print('%s: sf=%s e2e=%ss triples/s=%s' % (
            side, c.get('sf'), c.get('e2e_sec'),
            c.get('triples_per_sec')))


if __name__ == '__main__':
    main()
