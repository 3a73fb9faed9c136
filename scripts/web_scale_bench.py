"""Scale curve for the round-6 fourth-session operators (paragraph
dedup, bloom filter, robots filter, label propagation): run at
1x/10x/100x the sf0.1 corpus and record wall time, output rows, and
REAL shuffle-write records — results go into BENCH/PLANS.md.

Claims each measurement backs:

- paragraph_dedup: the distinct-(paragraph, doc) df count is the ONLY
  corpus-sized shuffle (linear records); the boilerplate broadcast is
  set-sized and removal is per-row — no reassembly shuffle.
- bloom_build: shuffle records are BOUNDED by m × partitions (partial
  distinct combines map-side to ≤ m rows per task), not corpus-sized —
  the sketch-state contract.
- robots_filter: rules are hosts-sized (broadcast); the only URL-sized
  exchange is the url-keyed precedence window — linear.
- label_propagation: per-round state is node-sized and the vote join
  is edge-table-sized; with a FIXED entity vocabulary the rounds'
  shuffle records stay bounded as the corpus grows (the graph stops
  growing once every co-occurrence pair is seen).

Scaled corpora come from dedup_scale_bench.build_scale_dir (cached
under /tmp/jionlp_scale_bench).

Usage: python scripts/web_scale_bench.py [factors...]
       (default 1 10 100)
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
    spark = get_spark('web-scale-bench')
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
        print(json.dumps({'scale': factor, 'docs': docs.count()}))
        d = F.col('doc_id')

        # --- paragraph dedup (injected boilerplate, gate corpus shape)
        from jionlp_spark.operators.dedup import paragraph_dedup
        t = F.concat(
            F.format_string('copyright host %s all rights reserved\n',
                            d % 20),
            F.col('text'),
            F.when(d % 3 == 0, F.lit('\nsubscribe to our newsletter'))
            .otherwise(F.lit('')))
        pages = docs.select('doc_id', t.alias('text'))
        run(f'paragraph_dedup@x{factor}',
            lambda: paragraph_dedup(pages, min_df=5))

        # --- bloom build over every token occurrence
        from jionlp_spark.operators.sketches import bloom_build
        toks = docs.select(F.explode(F.split('text', ' ')).alias('token'))
        run(f'bloom_build@x{factor}',
            lambda: bloom_build(toks, k=3, m=4096))

        # --- robots permission filter (50-host rule table)
        from jionlp_spark.operators.weblinks import robots_filter
        rules = spark.range(50).selectExpr(
            "concat('h', cast(id as string), '.example.com') as host",
            'false as allow', "'/private/' as pattern")
        urls = docs.select(
            F.when(d % 2 == 0,
                   F.format_string('http://h%s.example.com/p/%s',
                                   d % 50, d))
            .otherwise(F.format_string(
                'http://h%s.example.com/private/%s', d % 50, d))
            .alias('url'))
        run(f'robots_filter@x{factor}', lambda: robots_filter(urls, rules))

        # --- label propagation over the fixed-vocab co-occurrence graph
        from jionlp_spark.operators.graph import label_propagation
        m = docs.select(
            'doc_id',
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias('k'))
        ents = (m.select(
            'doc_id',
            F.concat(F.lit('city_'),
                     F.pmod(d * 10 + F.col('k'), F.lit(97)))
            .alias('obj')).distinct())
        a, b = ents.alias('a'), ents.alias('b')
        prs = (a.join(b, 'doc_id')
               .filter(F.col('a.obj') < F.col('b.obj'))
               .groupBy(F.col('a.obj').alias('ea'),
                        F.col('b.obj').alias('eb'))
               .agg(F.countDistinct('doc_id').cast('long').alias('w')))
        edges = (prs.select(F.col('ea').alias('src'),
                            F.col('eb').alias('dst'), 'w')
                 .union(prs.select(F.col('eb').alias('src'),
                                   F.col('ea').alias('dst'), 'w')))
        seeds = (spark.range(97).filter(F.col('id') % 10 == 0)
                 .select(F.concat(F.lit('city_'),
                                  F.col('id').cast('string')).alias('v'),
                         F.concat(F.lit('t'), (F.col('id') % 3)
                                  .cast('string')).alias('label')))
        run(f'label_propagation@x{factor}',
            lambda: label_propagation(edges, seeds, rounds=3,
                                      weight_col='w'))

    spark.stop()


if __name__ == '__main__':
    main()
