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


def bpe_train(docs: DataFrame, n_merges: int = 50,
              text_col: str = 'text') -> list:
    """→ ordered [(left, right), ...] merge list."""
    # localCheckpoint truncates lineage each round — without it the plan
    # nests one fold expression per merge and analysis time grows
    # quadratically with n_merges
    vocab = _word_vocab(docs, text_col).localCheckpoint()
    merges: list = []
    for _ in range(n_merges):
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
                 .limit(1).collect())
        if not pairs or pairs[0]['c'] < 2:
            break
        a, b = pairs[0]['a'], pairs[0]['b']
        merges.append((a, b))
        vocab = vocab.select(_merge_expr(a, b).alias('symbols'),
                             'freq').localCheckpoint()
    return merges


def bpe_encode(docs: DataFrame, merges: list, text_col: str = 'text',
               id_col: str = 'doc_id') -> DataFrame:
    """Apply the ordered merge list per word → (doc_id, tokens, n_tokens).

    Replays the merges in training order with the same greedy left-to-right
    scan the trainer's fold uses, so encoding is vocabulary-consistent with
    bpe_train by construction."""
    from pyspark.sql.functions import pandas_udf

    merge_list = [tuple(m) for m in merges]

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
