"""Build a deterministic sf1 corpus (10x sf0.1) under /tmp for the
second-scale-point FULL-SUITE bench (r5 verdict item 9).

TPC-H-style scaling: fact tables (customer, supplier, part, orders,
lineitem, events) are replicated 10x with every key column — primary AND
foreign — offset by copy*10_000_000, so join cardinalities scale linearly
and referential integrity holds across copies; region/nation stay fixed
(dimension tables do not scale with SF in TPC-H either).

documents/embeddings reuse scripts/scale_bench.build_scale_dir —
copy k>0 of each document perturbs CONTENT (seeded char-rotation +
word shuffle), so minhash/simhash see a genuinely 10x-bigger corpus, not
a 10-way-duplicated one; embeddings are fresh seeded unit-normals with
planted near-dup pairs (same distribution, 10x rows).

Usage: python scripts/build_sf1.py      (writes /tmp/jionlp_sf1, idempotent)
Then:  SPARK_GRAFT_SF_DIR=/tmp/jionlp_sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts'))

BASE_SF = '/root/testdata/sf0.1'
OUT = '/tmp/jionlp_sf1'
FACTOR = 10
OFFSET = 10_000_000

# (table, [key columns to offset per copy]); [] = copy verbatim (dims)
TABLES = [
    ('region', []),
    ('nation', []),
    ('customer', ['c_custkey']),
    ('supplier', ['s_suppkey']),
    ('part', ['p_partkey']),
    ('orders', ['o_orderkey', 'o_custkey']),
    ('lineitem', ['l_orderkey', 'l_partkey', 'l_suppkey']),
    ('events', ['event_id', 'user_id']),
]


def main() -> None:
    from pyspark.sql import functions as F

    from scale_bench import build_scale_dir  # consolidated in r6 (r8 repair)
    from jionlp_spark.config import get_spark

    done = [f'{OUT}/{t}.parquet' for t, _ in TABLES] + \
        [f'{OUT}/documents.parquet', f'{OUT}/embeddings.parquet']
    if all(os.path.exists(p) for p in done):
        print(f'{OUT} already built')
        return

    spark = get_spark('build_sf1', master='local[32]')
    spark.sparkContext.setLogLevel('ERROR')
    os.makedirs(OUT, exist_ok=True)

    copies = spark.range(FACTOR).withColumnRenamed('id', 'copy')
    for table, keys in TABLES:
        dst = f'{OUT}/{table}.parquet'
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f'{BASE_SF}/{table}.parquet')
        if keys:
            df = df.crossJoin(F.broadcast(copies))
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.col('copy') * OFFSET)
            df = df.drop('copy')
        df.write.mode('overwrite').parquet(f'{dst}.tmp')
        os.rename(f'{dst}.tmp', dst)
        print(table, spark.read.parquet(dst).count())

    # documents + embeddings: the content-perturbed 10x build
    scale_dir = build_scale_dir(spark, FACTOR)
    for t in ('documents', 'embeddings'):
        dst = f'{OUT}/{t}.parquet'
        if not os.path.exists(dst):
            shutil.copytree(f'{scale_dir}/{t}.parquet', f'{dst}.tmp')
            os.rename(f'{dst}.tmp', dst)
        print(t, spark.read.parquet(dst).count())
    spark.stop()


if __name__ == '__main__':
    main()
