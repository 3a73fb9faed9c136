"""Second-scale-point bench for the bucketed dedup/ANN family (r4 verdict
item 8): run the same operators at 1×, 10×, and 100× the sf0.1 corpus and
record wall time, output rows, and REAL shuffle-write records (from the
Spark UI status API) — the empirical scaling curve behind the "bucketed,
not all-pairs" claim.  Results go into BENCH/PLANS.md.

Synthetic scale-up (written under /tmp, deterministic):
- documents: `factor` copies of the sf0.1 table; copy 0 is verbatim,
  copy k>0 perturbs CONTENT, not just order: each word is independently
  char-rotated with prob 1/2 (seeded by (doc_id, k)) and the sequence
  shuffled — so copies differ in token SETS, and stay non-near-dup under
  order-invariant fingerprints too (simhash/minhash over unigrams; a
  shuffle-only copy is bit-identical under those, which fakes a 10-way
  duplicated corpus instead of a 10× bigger one), doc_id offset
  k*10_000_000.
- embeddings: fresh unit-normal vectors seeded per vec_id (dim matches
  sf0.1); every 50th id pair (2i, 2i+1) is a planted near-dup (copy +
  1% noise) so the pair stage has real work at every scale.

Scale rule applied (and thereby demonstrated): embedding_near_dups /
IVF n_centroids ∝ N (docstring rule, operators/dedup.py) — occupancy
per bucket stays ~constant as N grows.

Usage: python scripts/dedup_scale_bench.py [factors...]   (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = '/root/testdata/sf0.1'
WORK = '/tmp/jionlp_scale_bench'


def shuffle_records(spark) -> int:
    """Total shuffle-write records across all completed stages so far
    (Spark UI status API on the driver — local REST, no external net)."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return -1
    try:
        apps = json.load(urllib.request.urlopen(f'{base}/api/v1/applications'))
        app_id = apps[0]['id']
        stages = json.load(urllib.request.urlopen(
            f'{base}/api/v1/applications/{app_id}/stages?status=complete'))
        return sum(s.get('shuffleWriteRecords', 0) for s in stages)
    except Exception:
        return -1


def build_scale_dir(spark, factor: int) -> str:
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    out = f'{WORK}/x{factor}'
    if os.path.exists(f'{out}/documents.parquet') and \
            os.path.exists(f'{out}/embeddings.parquet'):
        return out

    docs = spark.read.parquet(f'{BASE_SF}/documents.parquet')
    n_docs = docs.count()

    def shuf(doc_id: pd.Series, text: pd.Series, copy: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for d, t, k in zip(doc_id, text, copy):
            if k == 0:
                out.append(t)
                continue
            rng = np.random.RandomState(
                (int(d) % 10_000_000) * 1000 + int(k))
            words = [w[1:] + w[:1] if len(w) > 1 and rng.random() < 0.5
                     else w for w in t.split(' ')]
            rng.shuffle(words)
            out.append(' '.join(words))
        return pd.Series(out)

    shuf.__annotations__ = {'doc_id': pd.Series, 'text': pd.Series,
                            'copy': pd.Series, 'return': pd.Series}
    shuf = pandas_udf(shuf, 'string')

    copies = spark.range(factor).select(F.col('id').alias('copy'))
    big_docs = (docs.crossJoin(F.broadcast(copies))
                .select((F.col('doc_id') + F.col('copy') * 10_000_000)
                        .alias('doc_id'),
                        shuf(F.col('doc_id'), F.col('text'), F.col('copy'))
                        .alias('text'),
                        'lang', 'source', 'n_chars'))
    big_docs.repartition(32).write.mode('overwrite') \
        .parquet(f'{out}/documents.parquet')

    emb = spark.read.parquet(f'{BASE_SF}/embeddings.parquet')
    n_emb = emb.count()
    dim = len(emb.select('embedding').first()[0])

    def gen(vec_id: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for v in vec_id:
            v = int(v)
            base_seed = v
            if (v // 2) % 50 == 0 and v % 2 == 1:
                base_seed = v - 1  # planted near-dup of the even sibling
            vec = np.random.RandomState(base_seed).standard_normal(dim)
            if base_seed != v:
                vec = vec + 0.01 * np.random.RandomState(v).standard_normal(dim)
            vec = vec / np.linalg.norm(vec)
            out.append(vec.astype('float32'))
        return pd.Series(out)

    gen.__annotations__ = {'vec_id': pd.Series, 'return': pd.Series}
    gen = pandas_udf(gen, 'array<float>')

    big_emb = (spark.range(n_emb * factor)
               .select(F.col('id').alias('vec_id'),
                       gen(F.col('id')).alias('embedding'),
                       (F.col('id') % 8).cast('int').alias('label')))
    big_emb.repartition(32).write.mode('overwrite') \
        .parquet(f'{out}/embeddings.parquet')
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    from jionlp_spark.config import get_spark
    spark = get_spark('dedup-scale-bench')
    spark.sparkContext.setLogLevel('ERROR')

    import __spark_entry__ as entry
    qs = entry.queries()

    def run(name, fn):
        # cold run recorded too: several operators persist() intermediate
        # tables (winnow fps, IVF assignments) and Spark reuses shuffle
        # files across identical stages, so warm times measure only the
        # post-cache stages — the cold number is the full pipeline cost
        s0 = shuffle_records(spark)
        t0 = time.time()
        fn().count()
        cold = time.time() - t0
        s1 = shuffle_records(spark)
        cold_rec = (s1 - s0) if (s0 >= 0 and s1 >= 0) else -1
        best = None
        for _ in range(2):
            t0 = time.time()
            rows = fn().count()
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, rows)
        print(json.dumps({'op': name, 'cold_sec': round(cold, 2),
                          'warm_sec': round(best[0], 2),
                          'rows': best[1], 'shuffle_records': cold_rec,
                          'load1': round(os.getloadavg()[0], 2)}))

    for factor in factors:
        sf_dir = BASE_SF if factor == 1 else build_scale_dir(spark, factor)
        n_docs = spark.read.parquet(f'{sf_dir}/documents.parquet').count()
        n_emb = spark.read.parquet(f'{sf_dir}/embeddings.parquet').count()
        print(json.dumps({'scale': factor, 'docs': n_docs, 'vectors': n_emb}))

        for qname in ('dedup_minhash_sig', 'dedup_lsh_pairs',
                      'dedup_simhash_wide_pairs', 'dedup_winnow_pairs'):
            run(f'{qname}@x{factor}',
                lambda qname=qname: qs[qname](spark, sf_dir))

        # embedding near-dups with the documented n_centroids ∝ N rule
        from jionlp_spark.operators.dedup import embedding_near_dups
        k = max(8, n_emb // 250)
        emb_df = spark.read.parquet(f'{sf_dir}/embeddings.parquet') \
            .repartition(spark.sparkContext.defaultParallelism)
        run(f'dedup_embedding_pairs@x{factor} (k={k})',
            lambda: embedding_near_dups(emb_df, threshold=0.4,
                                        n_centroids=k))
        # the coarse-assignment stage dominates at k ∝ N — the vectorized
        # Arrow assigner (row-identical to the expression path, parity
        # test in tests/test_ann_recall.py) is the production setting
        run(f'dedup_embedding_pairs@x{factor} (k={k}, arrow-assign)',
            lambda: embedding_near_dups(emb_df, threshold=0.4,
                                        n_centroids=k,
                                        assign_impl='arrow'))

        # incremental dedup vs a factor-sized HISTORY index: the claim
        # under test is that per-batch cost does not re-hash history —
        # the new batch (always the 5k base docs, id-offset) is banded
        # and joined against the stored index; only the index SCAN grows
        # with history (columnar I/O), never the signature work or the
        # shuffle of history (equi-join build side is the batch)
        from pyspark.sql import functions as SF

        from jionlp_spark.operators.dedup import (incremental_lsh_dedup,
                                                  lsh_bands,
                                                  minhash_signatures,
                                                  shingles)
        from jionlp_spark.sources import catalog as cat
        idx_path = f'{WORK}/lsh_index_x{factor}'
        hist = spark.read.parquet(f'{sf_dir}/documents.parquet') \
            .select('doc_id', 'text')
        t0 = time.time()
        if cat.read_manifest(idx_path) is None:
            bands_hist = lsh_bands(minhash_signatures(
                shingles(hist, n=3), 16), 4)
            cat.run_stage(spark, idx_path, 'lsh_index',
                          lambda: bands_hist,
                          input_fingerprint=f'hist-x{factor}',
                          bucket_by=('band_id', 'band_hash'))
        print(json.dumps({'op': f'index_seed@x{factor}',
                          'sec': round(time.time() - t0, 2)}))
        batch = (spark.read.parquet(f'{BASE_SF}/documents.parquet')
                 .select((SF.col('doc_id') + 900_000_000).alias('doc_id'),
                         'text'))
        # COLD ONLY: a warm repeat would measure a different workload —
        # the first call publishes the probe's survivor bands, so repeats
        # fingerprint-resume the publish and scan a probe-polluted index
        s0 = shuffle_records(spark)
        t0 = time.time()
        rows = incremental_lsh_dedup(
            spark, idx_path, batch,
            batch_id=f'probe-x{factor}')['dups'].count()
        dt = time.time() - t0
        s1 = shuffle_records(spark)
        print(json.dumps({'op': f'incremental_batch_vs_x{factor}_index',
                          'cold_sec': round(dt, 2), 'rows': rows,
                          'shuffle_records': (s1 - s0)
                          if (s0 >= 0 and s1 >= 0) else -1,
                          'load1': round(os.getloadavg()[0], 2)}))

    spark.stop()


if __name__ == '__main__':
    main()
