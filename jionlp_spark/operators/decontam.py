"""Benchmark decontamination: flag corpus docs that overlap an eval set.

Before a crawl corpus becomes training data, every serious pipeline runs
a *decontamination* pass: documents sharing long verbatim n-grams with
held-out evaluation benchmarks are flagged (and usually dropped) so the
eval numbers stay meaningful.  The standard scheme (popularized by the
GPT-3 appendix and used by most open-data pipelines since) is exact
token-n-gram overlap with n around 8-13.

Spark shape — the corpus must NOT shuffle:

- the benchmark n-gram set is tiny relative to the corpus (benchmarks
  are ~1e5 examples vs ~1e9 docs): build it once (one distinct over
  benchmark-sized data) and BROADCAST it;
- the corpus side is a per-row higher-order-function shingle expression
  (transform over a sequence — no explode until the join) followed by a
  broadcast-hash join, so corpus rows never move between executors;
- only *matched* (doc_id, gram) rows — a set bounded by
  |benchmark grams| × duplication, not by corpus size — reach the
  per-doc aggregation, and the final verdict join is doc_id-keyed with
  a hit table small enough for AQE to broadcast.

``broadcast_bench=False`` degrades to a plain shuffle equi-join on the
gram key for the (rare) case of a benchmark suite too large to
broadcast; results are identical (covered by the unit test).

Reference: JioNLP has no decontamination entry point — this is
pipeline-side functionality the brief's training-data scope adds; the
n-gram construction mirrors operators/dedup.shingles (word n-grams via
slice) so the two share oracle conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(df: DataFrame, n: int, text_col: str = 'text') -> 'F.Column':
    """Column: DISTINCT word n-grams of ``text_col`` as array<string>.

    Only exact-length n-grams are emitted (docs shorter than n tokens
    yield an empty array) — decontamination wants full-length verbatim
    runs, unlike dedup shingles which clamp at the tail.
    """
    toks = F.split(F.col(text_col), ' ')
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(' ', F.slice(toks, i + 1, n)))),
    ).otherwise(F.array().cast('array<string>'))


def benchmark_ngrams(bench: DataFrame, n: int = 8,
                     text_col: str = 'text') -> DataFrame:
    """→ (gram) — the distinct n-gram set of the benchmark corpus."""
    return (bench
            .select(F.explode(word_ngrams(bench, n, text_col))
                    .alias('gram'))
            .distinct())


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 8,
                  text_col: str = 'text', id_col: str = 'doc_id',
                  broadcast_bench: bool = True) -> DataFrame:
    """→ (doc_id, n_ngrams, n_hit, contaminated) for EVERY corpus doc.

    n_ngrams = the doc's distinct full-length n-gram count;
    n_hit = how many of those appear verbatim in the benchmark;
    contaminated = n_hit > 0 (callers wanting a laxer threshold filter
    on n_hit themselves — the audit row keeps the evidence).
    """
    bg = benchmark_ngrams(bench, n, text_col)
    if broadcast_bench:
        bg = F.broadcast(bg)

    grams = docs.select(F.col(id_col).alias('doc_id'),
                        word_ngrams(docs, n, text_col).alias('grams'))
    hits = (grams.select('doc_id', F.explode('grams').alias('gram'))
            .join(bg, 'gram')
            .groupBy('doc_id')
            .agg(F.count('*').alias('n_hit')))  # grams pre-distinct per doc

    return (grams.select('doc_id', F.size('grams').alias('n_ngrams'))
            .join(hits, 'doc_id', 'left')
            .select('doc_id',
                    F.col('n_ngrams').cast('long').alias('n_ngrams'),
                    F.coalesce('n_hit', F.lit(0)).cast('long')
                    .alias('n_hit'),
                    (F.coalesce('n_hit', F.lit(0)) > 0)
                    .alias('contaminated')))
