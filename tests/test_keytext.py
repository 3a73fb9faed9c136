"""keyphrase / summary operator behavior (the MMR/greedy stages are
iterative per doc → covered here rather than by the SQL oracle)."""

import pytest


@pytest.fixture(scope='module')
def docs(spark):
    rows = [
        # doc 0: 'alpha beta' bigram dominates; singles fully overlap it
        (0, 'alpha beta alpha beta alpha beta gamma'),
        # doc 1: flat text, unique tokens
        (1, 'one two three four five six seven eight nine ten'),
        # doc 2: repeated rare phrase among filler
        (2, 'x y filler filler filler x y filler x y zeta'),
    ]
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_keyphrases_mmr_drops_full_overlap(docs):
    from jionlp_spark.operators.keytext import keyphrases
    res = keyphrases(docs, top_k=5, ns=(1, 2), mmr=True)
    by_doc = {}
    for r in res.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: the single tokens 'alpha'/'beta' are strict subsets of a kept
    # bigram token set → sim ratio 1.0 → dropped by the MMR loop
    phrases0 = {r.phrase for r in by_doc[0]}
    assert 'alpha beta' in phrases0
    # every single token fully overlaps some kept bigram ('alpha'/'beta' ⊂
    # 'alpha beta', 'gamma' ⊂ 'beta gamma') → sim ratio 1.0 → all dropped
    assert phrases0 == {p for p in phrases0 if ' ' in p}
    # doc 2's 'zeta' single overlaps nothing except 'y zeta' — also dropped;
    # 'filler filler' survives as a bigram
    phrases2 = {r.phrase for r in by_doc[2]}
    assert any(' ' in p for p in phrases2)
    # ranks are 1..k ordered by penalized weight desc
    for rows in by_doc.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: r.rank)
        assert all(ordered[i].weight >= ordered[i + 1].weight
                   for i in range(len(ordered) - 1))


def test_keyphrases_mmr_vs_plain_top1(docs):
    """MMR's first kept candidate is the longest n-gram set; the final top-1
    must still be a positive-weight phrase present in the plain ranking's
    candidate set."""
    from jionlp_spark.operators.keytext import keyphrases
    plain = {(r.doc_id, r.phrase) for r in
             keyphrases(docs, top_k=50, ns=(1, 2), mmr=False).collect()}
    mmr = keyphrases(docs, top_k=3, ns=(1, 2), mmr=True).collect()
    assert mmr
    for r in mmr:
        assert (r.doc_id, r.phrase) in plain
        assert r.weight > 0


def test_summarize_budget_and_order(spark, docs):
    from jionlp_spark.operators.keytext import summarize
    sentences = spark.createDataFrame(
        [(0, 0, 'alpha beta alpha beta'),
         (0, 1, 'alpha beta gamma'),
         (0, 2, 'gamma gamma gamma'),
         (1, 0, 'one two three'),
         (1, 1, 'four five six'),
         ],
        'doc_id long, sen_id int, sentence string')
    res = {r.doc_id: r.summary
           for r in summarize(sentences, docs, summary_length=25).collect()}
    assert set(res) == {0, 1}
    for doc_id, summary in res.items():
        assert 0 < len(summary) <= 25 + 21  # budget is soft only for pick #1
        # picked sentences appear in original order: reconstructable as a
        # subsequence of the doc's sentences by sen_id
        sens = [r.sentence for r in sorted(
            sentences.filter(f'doc_id = {doc_id}').collect(),
            key=lambda r: r.sen_id)]
        parts = summary.split(' ')
        # summary is a ' '-join of whole sentences
        joined = []
        i = 0
        for s in sens:
            toks = s.split(' ')
            if parts[i:i + len(toks)] == toks:
                joined.append(s)
                i += len(toks)
        assert i == len(parts), (summary, sens)


def test_topic_prominence_separates_source_bound_words(spark):
    """A word exclusive to one source has maximal p(source|word) sharpness
    (prominence 1 after min-max); a word spread evenly across sources has
    minimal (prominence 0).  theta>0 boosts source-bound phrases; theta=0
    must reproduce the no-topic ranking exactly (flag-off parity)."""
    from jionlp_spark.operators.keytext import (keyphrases,
                                                word_topic_prominence)
    rows = []
    for i in range(6):
        src = f's{i % 3}'
        # 'common' appears evenly everywhere; 'niche' only in source s0
        text = 'common filler' + (' niche' if src == 's0' else ' other')
        rows.append((i, text, src))
    docs = spark.createDataFrame(rows,
                                 'doc_id long, text string, source string')
    prom = {r.word: r.prominence
            for r in word_topic_prominence(docs).collect()}
    assert prom['niche'] == 1.0
    assert prom['common'] == 0.0 and prom['filler'] == 0.0
    assert 0.0 <= min(prom.values()) and max(prom.values()) <= 1.0

    off_a = sorted(map(tuple, keyphrases(
        docs, top_k=3, ns=(1, 2), mmr=False).collect()))
    off_b = sorted(map(tuple, keyphrases(
        docs, top_k=3, ns=(1, 2), mmr=False, topic_theta=0.0).collect()))
    assert off_a == off_b
    on = keyphrases(docs, top_k=3, ns=(1, 2), mmr=False, topic_theta=5.0)
    # with a large theta the source-bound word outranks the even spread
    top1 = {r.doc_id: r.phrase for r in on.collect() if r.rank == 1}
    assert 'niche' in top1[0]
