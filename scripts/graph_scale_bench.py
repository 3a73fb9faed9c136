"""Scale curve for the round-6 second-session operators whose cost
shape is non-trivial at 100 TB: run at 1x/10x/100x the sf0.1 corpus and
record wall time, output rows, and REAL shuffle-write records (Spark UI
status API) — results go into BENCH/PLANS.md.

Operators under test and the claim each measurement backs:

- dedup_substring_spans: the (doc, pos, md5-gram) table is corpus×length
  — the inherent cost of substring exactness.  Claim: linear in corpus
  bytes (no quadratic pair blowup; the duplicate-key agg kills the
  singleton tail before the join back).  Boilerplate is injected exactly
  like the gated query (doc_id%7==3 docs take their predecessor's first
  25 tokens), so the hit join has real work at every scale.
- entity_neighbor_similarity: pair generation is Sigma_z deg(z)^2.  The
  mention synthesis scales the ENTITY VOCABULARY with the corpus
  (97*factor cold keys + one hub in half the slots), so the hub's degree
  grows with the graph — the adversarial shape.  Claim: the uncapped
  cost is hub-quadratic and max_hub_degree restores linearity, with the
  capped result losing only hub-mediated pairs (graph stopwords).
- window_perplexity: model is bigram-type-sized; scoring is one
  bigram-keyed join.  Claim: linear.

Scaled corpora come from dedup_scale_bench.build_scale_dir (cached under
/tmp/jionlp_scale_bench).

Usage: python scripts/graph_scale_bench.py [factors...]  (default 1 10 100)
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
    spark = get_spark('graph-scale-bench')
    spark.sparkContext.setLogLevel('ERROR')

    def run(name, fn, cold_only=False):
        s0 = shuffle_records(spark)
        t0 = time.time()
        rows = fn().count()
        cold = time.time() - t0
        s1 = shuffle_records(spark)
        rec = (s1 - s0) if (s0 >= 0 and s1 >= 0) else -1
        out = {'op': name, 'cold_sec': round(cold, 2), 'rows': rows,
               'shuffle_records': rec,
               'load1': round(os.getloadavg()[0], 2)}
        if not cold_only:
            best = None
            for _ in range(2):
                t0 = time.time()
                fn().count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            out['warm_sec'] = round(best, 2)
        print(json.dumps(out))

    for factor in factors:
        sf_dir = BASE_SF if factor == 1 else build_scale_dir(spark, factor)
        docs = spark.read.parquet(f'{sf_dir}/documents.parquet') \
            .select('doc_id', 'text')
        n_docs = docs.count()
        print(json.dumps({'scale': factor, 'docs': n_docs}))

        # --- substring spans (injected boilerplate, as the gated query)
        from jionlp_spark.operators.dedup import duplicate_substring_spans
        prev = docs.select((F.col('doc_id') + 1).alias('doc_id'),
                           F.col('text').alias('prev_text'))
        inj = (docs.join(prev, 'doc_id', 'left')
               .select('doc_id',
                       F.when((F.col('doc_id') % 7 == 3)
                              & F.col('prev_text').isNotNull(),
                              F.concat_ws(
                                  ' ',
                                  F.array_join(
                                      F.slice(F.split('prev_text', ' '),
                                              1, 25), ' '),
                                  F.col('text')))
                       .otherwise(F.col('text')).alias('text')))
        # cold only: the operator checkpoints its gram table, so a warm
        # repeat re-checkpoints — same workload, no cache advantage
        run(f'dedup_substring_spans@x{factor}',
            lambda: duplicate_substring_spans(inj, n=20), cold_only=True)

        # --- neighbor similarity with a corpus-growing vocabulary
        from jionlp_spark.operators.graph import entity_neighbor_similarity
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
                                F.lit(vocab)))).alias('obj')))
        run(f'entity_similarity@x{factor} (vocab={vocab + 1}, uncapped)',
            lambda: entity_neighbor_similarity(m), cold_only=True)
        run(f'entity_similarity@x{factor} (hub cap 500)',
            lambda: entity_neighbor_similarity(m, max_hub_degree=500),
            cold_only=True)

        # --- window perplexity (linear reference point)
        from jionlp_spark.operators.textstats import window_perplexity
        run(f'window_perplexity@x{factor}',
            lambda: window_perplexity(docs, window=20), cold_only=True)

    spark.stop()


if __name__ == '__main__':
    main()
