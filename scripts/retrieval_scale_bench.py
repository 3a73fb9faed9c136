"""Scale curve for the round-6 third-session operators (PQ ANN + BM25
family + URL dedup): run at 1x/10x/100x the sf0.1 corpus and record
wall time, output rows, and REAL shuffle-write records — results go
into BENCH/PLANS.md.

Claims each measurement backs:

- bm25_topk: the tf build is the only corpus-sized shuffle; matched
  posting rows grow with the query terms' document frequency (linear
  in corpus), never corpus×queries.
- publish_text_index / query_text_index: publish is linear (one tf
  shuffle + bucketed write); the QUERY touches only matched postings
  of a bucketed scan — its cost must stay far below publish and scale
  with df, proving the index amortizes (the serving claim).
- pq_encode / pq_topk: encode is a ZERO-shuffle Arrow map (shuffle
  records ≈ 0, linear); the ADC scan reads 8 code ids per vector
  (linear, with the scored-join shuffle bounded by q·N part rows).
- url_dedup: one map-side-combined groupBy on the canonical key
  (linear; the MapInPandas kernel is the only Python node).

Scaled corpora come from dedup_scale_bench.build_scale_dir (cached
under /tmp/jionlp_scale_bench).

Usage: python scripts/retrieval_scale_bench.py [factors...]
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
    spark = get_spark('retrieval-scale-bench')
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
        emb = spark.read.parquet(f'{sf_dir}/embeddings.parquet')
        print(json.dumps({'scale': factor, 'docs': docs.count(),
                          'vecs': emb.count()}))

        # --- BM25 one-shot (tf shuffle + matched postings)
        from jionlp_spark.operators.retrieval import (bm25_topk,
                                                      publish_text_index,
                                                      query_terms_from_docs,
                                                      query_text_index)
        run(f'bm25_topk@x{factor}', lambda: bm25_topk(docs, k=10))

        # --- published index: publish once, then the serving query
        base = f'/tmp/jionlp_scale_bench/textidx_x{factor}'
        run(f'bm25_publish@x{factor}',
            lambda: publish_text_index(
                spark, base, docs,
                input_fingerprint=f'x{factor}')['postings'])
        q = query_terms_from_docs(docs, n_queries=3, n_terms=4)
        run(f'bm25_index_query@x{factor}',
            lambda: query_text_index(spark, base, q, k=10))

        # --- PQ: train (bounded), encode (zero-shuffle Arrow), ADC scan
        from jionlp_spark.operators.ann import (pq_codebooks, pq_encode,
                                                pq_topk)
        cb = pq_codebooks(emb)          # checkpointed; reported via train
        run(f'pq_train@x{factor}', lambda: pq_codebooks(emb))
        run(f'pq_encode@x{factor}', lambda: pq_encode(emb, cb))
        run(f'pq_topk@x{factor}', lambda: pq_topk(emb, codebooks=cb, k=3))

        # --- URL canonical dedup (five syntactic variants per group)
        from jionlp_spark.operators.weblinks import url_dedup
        d = F.col('doc_id')
        g = (d / 5).cast('long')
        url = F.when(d % 5 == 4, F.format_string(
            'http://h%s.example.com/p/%s?b=2&a=1', g % 50, g)) \
            .otherwise(F.format_string(
                'HTTP://H%s.EXAMPLE.COM:80/a/../p/%s#f', g % 50, g))
        pages = docs.select('doc_id', url.alias('url'))
        run(f'url_dedup@x{factor}', lambda: url_dedup(pages))

    spark.stop()


if __name__ == '__main__':
    main()
