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

    # corpus-side n-grams via ONE Arrow batch pass (identical values to
    # the word_ngrams expression: str.split(' ') ≡ split(text, ' '),
    # first-occurrence distinct, exact-length grams only, null/short →
    # []), non-deterministic-marked so a caller's filter on the output
    # cannot relocate the heavy projection below the spread-repartition
    # (the audited single-scan-task collapse).  explode_outer keeps
    # every doc (null gram for empty arrays), the broadcast left join
    # marks benchmark hits without moving corpus rows, and ONE
    # map-side-combined doc-grain aggregation replaces the old
    # hits-groupBy + second doc-keyed join.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from jionlp_spark.functions.ndet import ndet as _ndet

    def _grams(text):
        out = []
        for t in text:
            if t is None:
                out.append([])
                continue
            toks = t.split(' ')
            if len(toks) < n:
                out.append([])
                continue
            out.append(list(dict.fromkeys(
                ' '.join(toks[i:i + n])
                for i in range(len(toks) - n + 1))))
        return pd.Series(out)

    _grams.__annotations__ = {'text': pd.Series, 'return': pd.Series}
    grams_udf = _ndet(pandas_udf(_grams, 'array<string>'))

    ex = (docs.select(F.col(id_col).alias('doc_id'),
                      grams_udf(F.col(text_col)).alias('grams'))
          .select('doc_id', F.size('grams').alias('n_ngrams'),
                  F.explode_outer('grams').alias('gram')))
    return (ex.join(bg.withColumn('_hit', F.lit(1)), 'gram', 'left')
            .groupBy('doc_id', 'n_ngrams')
            .agg(F.count('_hit').alias('n_hit'))
            .select('doc_id',
                    F.col('n_ngrams').cast('long').alias('n_ngrams'),
                    F.col('n_hit').cast('long').alias('n_hit'),
                    (F.col('n_hit') > 0).alias('contaminated')))


def fuzzy_decontaminate(docs: DataFrame, bench: DataFrame,
                        threshold: float = 0.8, n: int = 3,
                        num_hashes: int = 16, bands: int = 4,
                        text_col: str = 'text', id_col: str = 'doc_id',
                        bench_id_col: str = 'bench_id') -> DataFrame:
    """→ (doc_id, bench_id, n_doc, n_bench, n_inter, jaccard, flagged)
    — FUZZY benchmark decontamination: corpus docs whose shingle-set
    Jaccard against an eval example clears ``threshold`` are flagged,
    catching the paraphrased/reformatted eval leakage exact n-gram
    overlap (``decontaminate``) misses — the complement every modern
    open-data pipeline runs next to the exact pass (Dolma, the Llama
    reports' "fuzzy dedup against evals").

    One row per LSH CANDIDATE pair (a corpus doc and a bench example
    sharing ≥ 1 minhash band), with the exact Jaccard verification and
    the threshold verdict — candidates below threshold stay in the
    output as audit rows (``flagged = false``), exactly like
    ``decontaminate`` keeps its evidence counts.

    Spark shape — the corpus must NOT shuffle (the exact-decontam
    rule, applied to the banded representation):

    - both sides reuse the dedup ladder's machinery verbatim
      (``shingles`` → ``minhash_signatures`` → ``lsh_bands``: per-row
      higher-order expressions, no shuffle);
    - the benchmark's band table AND shingle table are benchmark-sized
      → BROADCAST; the candidate join and the intersection join leave
      corpus rows in place;
    - only shingle rows that MATCH a benchmark shingle reach the
      intersection aggregation — bounded by |bench shingles| ×
      duplication, never corpus-sized (the decontaminate bound);
    - the per-pair aggregation keys on (doc_id, bench_id) over that
      bounded set.

    Engine parity: shingle/minhash/band arithmetic is the oracle-gated
    md5 chain of dedup_lsh_pairs; n_doc/n_bench/n_inter are exact
    bigints; jaccard is ONE per-row double tree
    (``cast(inter as double) / cast(nd + nb - inter as double)``) and
    the threshold enters as a float literal / cast('<repr>' as
    double), so verdicts split identically in both engines.
    """
    from jionlp_spark.operators.dedup import (lsh_bands,
                                              minhash_signatures,
                                              shingles)
    dsh = shingles(docs, text_col, id_col, n).persist()
    bsh = shingles(bench, text_col, bench_id_col, n).persist()
    dband = lsh_bands(minhash_signatures(dsh, num_hashes), bands)
    bband = (lsh_bands(minhash_signatures(bsh, num_hashes), bands)
             .withColumnRenamed('doc_id', 'bench_id'))
    cands = (dband.join(F.broadcast(bband), ['band_id', 'band_hash'])
             .select('doc_id', 'bench_id').distinct())

    dtok = dsh.select('doc_id', F.explode('shingles').alias('t'))
    btok = bsh.select(F.col('doc_id').alias('bench_id'),
                      F.explode('shingles').alias('t'))
    nd = dsh.select('doc_id',
                    F.size('shingles').cast('long').alias('n_doc'))
    nb = bsh.select(F.col('doc_id').alias('bench_id'),
                    F.size('shingles').cast('long').alias('n_bench'))
    inter = (dtok.join(F.broadcast(btok), 't')
             .groupBy('doc_id', 'bench_id')
             .agg(F.count('*').cast('long').alias('n_inter')))

    # pair the bounded tables first (candidates ⋈ intersections are both
    # bench-bounded), then stream the corpus-derived size table past a
    # BROADCAST of the pairs — the r7 scale bench caught the unhinted
    # version sort-merge-shuffling the corpus-sized nd (500k records at
    # 100×) for a bench-bounded output, breaking this docstring's claim.
    paired = cands.join(inter, ['doc_id', 'bench_id'], 'left')
    out = (nd.join(F.broadcast(paired), 'doc_id')
           .join(F.broadcast(nb), 'bench_id')
           .select('doc_id', 'bench_id', 'n_doc', 'n_bench',
                   F.coalesce('n_inter', F.lit(0)).cast('long')
                   .alias('n_inter'))
           .select('doc_id', 'bench_id', 'n_doc', 'n_bench', 'n_inter',
                   (F.col('n_inter').cast('double')
                    / (F.col('n_doc') + F.col('n_bench')
                       - F.col('n_inter')).cast('double'))
                   .alias('jaccard')))
    return out.select('*', (F.col('jaccard') >= F.lit(float(threshold)))
                      .alias('flagged'))
