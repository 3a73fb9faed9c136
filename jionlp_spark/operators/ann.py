"""Similarity search over embedding columns.

Brute-force cosine top-k (the exactness baseline) and an IVF-style
bucketed variant for scale: assign every vector to its nearest of K
centroids (sampled deterministically), then search only within the probe's
bucket(s) — turning the O(N·Q) cross join into a bucket-partitioned join.
All vector math is JVM-side (aggregate/zip_with over array<float>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)")
_NORM = ("sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
         "cast(0.0 as double), (acc, v) -> acc + v))")


def _cosine(a: str, b: str):
    return F.expr(f"{_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)})")


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     vec_col: str = 'embedding',
                     id_col: str = 'vec_id') -> DataFrame:
    """Exact cosine top-k: queries(qid, qe) × emb → (qid, vec_id, cos)."""
    from pyspark.sql.window import Window
    joined = (
        queries.crossJoin(emb)
        .filter(F.col('qid') != F.col(id_col))
        .select('qid', id_col,
                F.round(_cosine('qe', vec_col), 6).alias('cos'))
    )
    w = Window.partitionBy('qid').orderBy(F.desc('cos'), F.col(id_col))
    return (joined.withColumn('rn', F.row_number().over(w))
            .filter(F.col('rn') <= k).drop('rn'))


def ivf_assign(emb: DataFrame, n_centroids: int = 16,
               vec_col: str = 'embedding',
               id_col: str = 'vec_id') -> tuple:
    """Deterministic IVF bucketing: centroids = the n lowest-id vectors
    (a stand-in for trained k-means — the plumbing, partitioning and join
    shape are the point at this scale)."""
    centroids = (emb.orderBy(id_col).limit(n_centroids)
                 .select(F.col(id_col).alias('centroid_id'),
                         F.col(vec_col).alias('centroid')))
    bc = F.broadcast(centroids)
    assigned = (
        emb.crossJoin(bc)
        # rounded before ranking: keeps the assignment deterministic across
        # engines/summation orders
        .select(id_col, vec_col, 'centroid_id',
                F.round(_cosine(vec_col, 'centroid'), 6).alias('sim'))
    )
    from pyspark.sql.window import Window
    w = Window.partitionBy(id_col).orderBy(F.desc('sim'), 'centroid_id')
    assigned = (assigned.withColumn('rn', F.row_number().over(w))
                .filter(F.col('rn') == 1)
                .select(id_col, vec_col, F.col('centroid_id').alias('bucket')))
    return assigned, centroids


def ivf_topk(assigned: DataFrame, queries_assigned: DataFrame,
             k: int = 5, vec_col: str = 'embedding',
             id_col: str = 'vec_id') -> DataFrame:
    """Search only within the query's bucket (single-probe IVF)."""
    from pyspark.sql.window import Window
    joined = (
        queries_assigned.alias('q')
        .join(assigned.alias('e'), 'bucket')
        .filter(F.col(f'q.{id_col}') != F.col(f'e.{id_col}'))
        .select(F.col(f'q.{id_col}').alias('qid'),
                F.col(f'e.{id_col}').alias(id_col),
                F.round(_cosine(f'q.{vec_col}', f'e.{vec_col}'), 6)
                .alias('cos'))
    )
    w = Window.partitionBy('qid').orderBy(F.desc('cos'), F.col(id_col))
    return (joined.withColumn('rn', F.row_number().over(w))
            .filter(F.col('rn') <= k).drop('rn'))
