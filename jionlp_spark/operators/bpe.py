"""Distributed BPE merge training and application.

The reference ships only the byte-level codec (its merge algorithm is an
explicit TODO, algorithm/bpe/encoder_decoder.py:56); this module supplies
the missing half as a Spark job, from scratch:

- ``bpe_train``: classic BPE (Sennrich et al. 2016, "Neural Machine
  Translation of Rare Words with Subword Units") — iterate: count adjacent
  symbol pairs over the corpus word vocabulary, merge the most frequent
  pair (ties broken lexically for determinism), repeat.  Each iteration is
  ONE aggregation over the (word, freq) vocabulary table — the corpus is
  scanned once up front, so 50 merges = 1 corpus scan + 50 small-vocab aggs.
- ``bpe_encode``: apply the ordered merge list inside a pandas UDF
  (per-word greedy left-to-right replacement, identical to the trainer's
  merge semantics).

Scale shape: the vocabulary table (distinct words + counts) is the working
set, usually 10⁴–10⁷ rows even for a 100 TB corpus — per-iteration aggs are
cheap; the single corpus scan dominates, as it should.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from jionlp_spark.functions.ndet import ndet as _ndet


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(symbols array<string>, freq) — one corpus scan."""
    return (docs
            .select(F.explode(F.split(F.col(text_col), ' ')).alias('w'))
            .filter(F.col('w') != '')
            .groupBy('w').agg(F.count('*').alias('freq'))
            .select(F.expr("split(w, '')").alias('symbols'), 'freq'))


def _merge_expr(a: str, b: str):
    """Array-level merge of adjacent (a, b) → a||b, greedy left-to-right
    (aggregate fold keeps per-row state: 'was the previous symbol consumed')
    — same result as the sequential scan a single-node BPE does."""
    a_lit, b_lit = a.replace("'", "\\'"), b.replace("'", "\\'")
    return F.expr(f"""
        aggregate(symbols,
                  struct(cast(array() as array<string>) as acc,
                         false as pending),
                  (s, x) -> case
                      when s.pending and x = '{b_lit}' then
                          struct(concat(s.acc, array('{a_lit}{b_lit}'))
                                     as acc,
                                 false as pending)
                      when s.pending and x = '{a_lit}' then
                          struct(concat(s.acc, array('{a_lit}')) as acc,
                                 true as pending)
                      when s.pending then
                          struct(concat(s.acc, array('{a_lit}', x)) as acc,
                                 false as pending)
                      when x = '{a_lit}' then
                          struct(s.acc as acc, true as pending)
                      else struct(concat(s.acc, array(x)) as acc,
                                  false as pending)
                  end,
                  s -> case when s.pending
                            then concat(s.acc, array('{a_lit}'))
                            else s.acc end)
    """)


def _select_merge_batch(rows, k: int) -> list:
    """Largest prefix of the ordered pair list that sequential BPE is
    GUARANTEED to merge next, in order (byte-identical batching).

    Sound because merging pair p only changes counts of pairs sharing one
    of {p.a, p.b, p.a+p.b}: (1) take the maximal pairwise-compatible
    (symbol-disjoint) PREFIX — every conflicting or unseen pair therefore
    ranks below it; (2) new pairs created by a merge are bounded by the old
    counts of pairs conflicting with it, i.e. by the first excluded
    candidate's count c_excl — so truncate the batch to counts STRICTLY
    above c_excl (kills boundary ties that lexical tie-breaking could
    reorder); (3) if truncation empties the batch, the global top-1 alone
    is always the exact next merge."""
    sel: list = []
    used: set = set()
    c_excl = 0
    for r in rows:
        if len(sel) >= k or r['c'] < 2:
            c_excl = r['c']
            break
        syms = {r['a'], r['b'], r['a'] + r['b']}
        if used & syms:
            c_excl = r['c']
            break
        sel.append(r)
        used |= syms
    batch = [(r['a'], r['b']) for r in sel if r['c'] > c_excl]
    if not batch and sel:
        batch = [(sel[0]['a'], sel[0]['b'])]
    return batch


def _greedy_merge(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right (a, b) → a+b — same semantics as _merge_expr
    and bpe_encode's per-word scan."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_on_driver(rows, n_merges: int) -> list:
    """Exact sequential BPE over the collected (symbols, freq) vocabulary
    with incremental pair-count maintenance: O(affected words) per merge.
    Tie-break identical to the distributed path: (count desc, a, b)."""
    from collections import defaultdict
    words = [(list(r['symbols']), r['freq']) for r in rows]
    pair_counts: dict = defaultdict(int)
    where: dict = defaultdict(set)          # pair -> word indices
    for wi, (syms, fr) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += fr
        for p in set(zip(syms, syms[1:])):
            where[p].add(wi)
    merges: list = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), c = min(pair_counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < 2:
            break
        merges.append((a, b))
        for wi in list(where[(a, b)]):
            syms, fr = words[wi]
            old = list(zip(syms, syms[1:]))
            for p in set(old):
                where[p].discard(wi)
            for p in old:
                pair_counts[p] -= fr
                if pair_counts[p] == 0:
                    del pair_counts[p]
            syms = _greedy_merge(syms, a, b)
            words[wi] = (syms, fr)
            new = list(zip(syms, syms[1:]))
            for p in new:
                pair_counts[p] += fr
            for p in set(new):
                where[p].add(wi)
    return merges


# vocab tables up to this many distinct words train on the driver (a 5M-word
# vocab is ~200 MB of Python state — the corpus scan, not the merge loop, is
# the distributed-scale part of BPE training)
DRIVER_VOCAB_LIMIT = 5_000_000


def bpe_train(docs: DataFrame, n_merges: int = 50,
              text_col: str = 'text', batch_size: int = 16,
              stats: dict | None = None, mode: str = 'auto') -> list:
    """→ ordered [(left, right), ...] merge list, byte-identical to
    sequential BPE (Sennrich et al. 2016) in every mode.

    ``mode='driver'`` (chosen by ``'auto'`` whenever the distinct-word
    vocabulary fits ``DRIVER_VOCAB_LIMIT``): ONE Spark job builds the
    (word, freq) table — the only part that scales with corpus size — and
    the inherently sequential merge loop runs on the driver with
    incremental pair counts.  A 30k-merge production vocab is therefore 1
    corpus-scan job, not 30k driver round-trips.

    ``mode='distributed'`` (vocabularies beyond driver memory): each round
    is one pair-count job collecting the top batch_size+1 pairs and commits
    every merge the count table already PROVES sequential BPE would perform
    (see _select_merge_batch), then rewrites the vocab once.

    ``stats['rounds']`` reports the Spark-job cadence when provided."""
    if mode not in ('auto', 'driver', 'distributed'):
        raise ValueError(f'unknown mode {mode!r}')
    if mode != 'distributed':
        vocab_df = _word_vocab(docs, text_col)
        if mode == 'auto':
            n_words = vocab_df.limit(DRIVER_VOCAB_LIMIT + 1).count()
            mode = 'driver' if n_words <= DRIVER_VOCAB_LIMIT \
                else 'distributed'
        if mode == 'driver':
            rows = vocab_df.collect()
            if stats is not None:
                stats['rounds'] = 1
            return _train_on_driver(rows, n_merges)

    # localCheckpoint truncates lineage each round — without it the plan
    # nests one fold expression per merge and analysis time grows
    # quadratically with n_merges
    vocab = _word_vocab(docs, text_col).localCheckpoint(eager=False)
    merges: list = []
    rounds = 0
    while len(merges) < n_merges:
        k = min(batch_size, n_merges - len(merges))
        pairs = (vocab
                 .select('freq', F.explode(F.expr(
                     # guard: sequence(0, -1) would DESCEND for 1-symbol
                     # words
                     'case when size(symbols) >= 2 then '
                     'transform(sequence(0, size(symbols) - 2), '
                     'i -> struct(symbols[i] as a, symbols[i+1] as b)) '
                     'else array() end'))
                     .alias('p'))
                 .groupBy('p.a', 'p.b').agg(F.sum('freq').alias('c'))
                 .orderBy(F.desc('c'), 'a', 'b')
                 .limit(k + 1).collect())
        rounds += 1
        if not pairs or pairs[0]['c'] < 2:
            break
        batch = _select_merge_batch(pairs, k)
        merges.extend(batch)
        for a, b in batch:  # compatible merges: one fused rewrite, then
            vocab = vocab.select(_merge_expr(a, b).alias('symbols'), 'freq')
        vocab = vocab.localCheckpoint(eager=False)  # one checkpoint per ROUND
    if stats is not None:
        stats['rounds'] = rounds
    return merges


def bpe_encode(docs: DataFrame, merges: list, text_col: str = 'text',
               id_col: str = 'doc_id') -> DataFrame:
    """Apply the ordered merge list per word → (doc_id, tokens, n_tokens).

    Replays the merges in training order with the same greedy left-to-right
    scan the trainer's fold uses, so encoding is vocabulary-consistent with
    bpe_train by construction."""
    from pyspark.sql.functions import pandas_udf

    merge_list = [tuple(m) for m in merges]

    @_ndet
    @pandas_udf('array<string>')
    def encode_udf(text: pd.Series) -> pd.Series:
        def enc_word(word):
            syms = list(word)
            for a, b in merge_list:
                if len(syms) < 2:
                    break
                out = []
                i = 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return text.map(lambda t: [s for w in t.split(' ') if w
                                   for s in enc_word(w)])

    return docs.select(F.col(id_col).alias('doc_id'),
                       encode_udf(F.col(text_col)).alias('tokens')) \
        .withColumn('n_tokens', F.size('tokens'))
