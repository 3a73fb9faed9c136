"""Scale curves for the round-6 fifth-session operators at 1x/10x/100x
of sf0.1 (wall, rows, REAL shuffle-write records) — results go into
BENCH/PLANS.md.

Claims each measurement backs:

- containment_pairs: postings are corpus-linear; with a FIXED
  hot-shingle cap the pair self-join moves at most cap·|postings| rows
  no matter how the corpus grows (Σ df² ≤ cap·Σ df over kept
  shingles) — the df-capped stop-shingle rule is what separates this
  from a quadratic posting join.  The injection mirrors the gated
  query (docs ≡ 4 mod 9 prepend their predecessor's full text).
- negative_samples → transe_scores: work is edges × draws, never
  edges × V; the TransE layer on top adds (near-)ZERO shuffle — the
  records delta between the two rows is the claim.  The entity
  vocabulary grows with the corpus (97·factor cold keys + the hub),
  so the edge table genuinely scales.
- hits: per half-round one node-keyed join + one map-side-combined
  sum — records scale with edges, state with nodes.  The host count
  grows with the corpus (50·factor hosts).
- personalized_pagerank: pagerank's audited shape with seed-confined
  teleport — per-round records ∝ edges, independent of seed count.
- entity_salience: the linear reference point (one groupBy + one
  doc-partitioned window over reduced rows).

Scaled corpora come from dedup_scale_bench.build_scale_dir (cached
under /tmp/jionlp_scale_bench).

Usage: python scripts/kg_scale_bench.py [factors...]  (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup_scale_bench import BASE_SF, build_scale_dir, shuffle_records  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    from pyspark.sql import functions as F

    from jionlp_spark.config import get_spark
    spark = get_spark('kg-scale-bench')
    spark.sparkContext.setLogLevel('ERROR')

    def run(name, fn):
        s0 = shuffle_records(spark)
        t0 = time.time()
        rows = fn().count()
        cold = time.time() - t0
        s1 = shuffle_records(spark)
        rec = (s1 - s0) if (s0 >= 0 and s1 >= 0) else -1
        print(json.dumps({'op': name, 'cold_sec': round(cold, 2),
                          'rows': rows, 'shuffle_records': rec,
                          'load1': round(os.getloadavg()[0], 2)}))

    for factor in factors:
        sf_dir = BASE_SF if factor == 1 else build_scale_dir(spark, factor)
        docs = spark.read.parquet(f'{sf_dir}/documents.parquet') \
            .select('doc_id', 'text')
        n_docs = docs.count()
        print(json.dumps({'scale': factor, 'docs': n_docs}))

        # --- containment with the gated query's prefix injection and
        # the FIXED cap (the bounded-pair-stage claim)
        from jionlp_spark.operators.dedup import containment_pairs, shingles
        prev = docs.select((F.col('doc_id') + 1).alias('doc_id'),
                           F.col('text').alias('p_text'))
        inj = (docs.join(prev, 'doc_id', 'left')
               .select('doc_id',
                       F.when((F.col('doc_id') % 9 == 4)
                              & F.col('p_text').isNotNull(),
                              F.concat(F.col('p_text'), F.lit(' '),
                                       F.col('text')))
                       .otherwise(F.col('text')).alias('text')))
        run(f'containment_pairs@x{factor} (cap=4)',
            lambda: containment_pairs(shingles(inj, n=3), threshold=0.8,
                                      max_shingle_df=4))

        # --- negative sampling + the TransE layer (vocab grows with
        # the corpus so the edge table scales)
        from jionlp_spark.operators.graph import (negative_samples,
                                                  transe_scores)
        vocab = 97 * factor
        m = (docs.select('doc_id')
             .select('doc_id',
                     F.explode(F.sequence(F.lit(0), F.lit(9))).alias('k'))
             .select('doc_id',
                     F.when((F.col('doc_id') + F.col('k')) % 2 == 0,
                            F.lit('北京市'))
                     .otherwise(F.concat(
                         F.lit('city_'),
                         F.pmod(F.col('doc_id') * 10 + F.col('k'),
                                F.lit(vocab)))).alias('obj'))
             .distinct())
        a, b = m.alias('a'), m.alias('b')
        prs = (a.join(b, 'doc_id')
               .filter(F.col('a.obj') < F.col('b.obj'))
               .select(F.col('a.obj').alias('src'),
                       F.col('b.obj').alias('dst')).distinct())
        edges = (prs.union(prs.select(F.col('dst').alias('src'),
                                      F.col('src').alias('dst')))
                 .distinct().localCheckpoint())
        run(f'negative_samples@x{factor} (vocab={vocab + 1})',
            lambda: negative_samples(edges, k=3, draws=6))
        run(f'transe_scores@x{factor} (vocab={vocab + 1})',
            lambda: transe_scores(
                negative_samples(edges, k=3, draws=6), dim=4))

        # --- HITS + PPR over a corpus-growing host graph
        from jionlp_spark.operators.graph import (hits,
                                                  personalized_pagerank)
        hosts = 50 * factor
        d = F.col('doc_id')
        links = docs.select(
            F.concat(F.lit('h'), (d % hosts).cast('string')).alias('src'),
            F.concat(F.lit('h'), ((d * 7 + 1) % hosts).cast('string'))
            .alias('dst'))
        hedges = (links.filter(F.col('src') != F.col('dst'))
                  .groupBy('src', 'dst')
                  .agg(F.count('*').cast('long').alias('w'))
                  .localCheckpoint())
        run(f'hits@x{factor} (hosts={hosts})',
            lambda: hits(hedges, iters=2, weight_col='w'))
        seeds = spark.range(5).select(
            F.concat(F.lit('h'), F.col('id').cast('string')).alias('v'))
        run(f'personalized_pagerank@x{factor} (hosts={hosts})',
            lambda: personalized_pagerank(hedges, seeds, iters=3,
                                          weight_col='w'))

        # --- salience: the linear reference
        from jionlp_spark.operators.graph import entity_salience
        ments = (docs.select('doc_id')
                 .select('doc_id',
                         F.explode(F.sequence(F.lit(0), F.lit(9)))
                         .alias('k'))
                 .select('doc_id', 'k',
                         F.when((F.col('doc_id') + F.col('k')) % 2 == 0,
                                F.lit('北京市'))
                         .otherwise(F.concat(
                             F.lit('city_'),
                             F.pmod(F.col('doc_id') * 10 + F.col('k'),
                                    F.lit(vocab)))).alias('obj')))
        run(f'entity_salience@x{factor}',
            lambda: entity_salience(ments, pos_col='k'))

    spark.stop()


if __name__ == '__main__':
    main()
