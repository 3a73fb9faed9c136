"""Stage 4 — triple materialization.

entities → triples(subj, subj_type, pred, obj, obj_type, url, offset_start,
offset_end).  Two triple families:

  (url, mentions_<type>, canonical_entity)   — provenance edges
  (entity, <relation>, derived_entity)       — facts from canonicalization
        phone  —located_in→   'province city'
        phone  —operated_by→  operator
        id     —issued_in→    'province/city/county'
        id     —born_on→      'YYYY-MM-DD'
        email  —has_domain→   domain

Everything is column-level Catalyst work (get_json_object over the norm
column + unions) — no Python in this stage, so it whole-stage-codegens.
Output is written partitioned by pred, bucketed-by-hash on url via
repartition, matching the north_rule graph-table layout.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROVENANCE = ['subj', 'subj_type', 'pred', 'obj', 'obj_type', 'url',
              'offset_start', 'offset_end']


def _mention_edges(entities: DataFrame) -> DataFrame:
    return entities.select(
        F.col('url').alias('subj'),
        F.lit('page').alias('subj_type'),
        F.concat(F.lit('mentions_'), F.col('obj_type')).alias('pred'),
        F.col('obj'),
        F.col('obj_type'),
        F.col('url'),
        F.col('offset_start'),
        F.col('offset_end'),
    )


def _fact_edges(entities: DataFrame) -> list:
    norm = F.col('norm')
    out = []

    phones = entities.filter(F.col('obj_type') == 'phone')
    out.append(phones.select(
        F.col('obj').alias('subj'), F.lit('phone').alias('subj_type'),
        F.lit('located_in').alias('pred'),
        F.get_json_object(norm, '$.geo').alias('obj'),
        F.lit('region').alias('obj_type'),
        'url', 'offset_start', 'offset_end',
    ).filter(F.col('obj').isNotNull()))
    out.append(phones.select(
        F.col('obj').alias('subj'), F.lit('phone').alias('subj_type'),
        F.lit('operated_by').alias('pred'),
        F.get_json_object(norm, '$.operator').alias('obj'),
        F.lit('operator').alias('obj_type'),
        'url', 'offset_start', 'offset_end',
    ).filter(F.col('obj').isNotNull()))

    ids = entities.filter(F.col('obj_type') == 'id_card')
    out.append(ids.select(
        F.col('obj').alias('subj'), F.lit('id_card').alias('subj_type'),
        F.lit('issued_in').alias('pred'),
        F.concat_ws('/',
                    F.get_json_object(norm, '$.province'),
                    F.get_json_object(norm, '$.city'),
                    F.get_json_object(norm, '$.county')).alias('obj'),
        F.lit('region').alias('obj_type'),
        'url', 'offset_start', 'offset_end',
    ).filter(F.col('obj') != ''))
    out.append(ids.select(
        F.col('obj').alias('subj'), F.lit('id_card').alias('subj_type'),
        F.lit('born_on').alias('pred'),
        F.concat_ws('-',
                    F.get_json_object(norm, '$.birth_year'),
                    F.get_json_object(norm, '$.birth_month'),
                    F.get_json_object(norm, '$.birth_day')).alias('obj'),
        F.lit('date').alias('obj_type'),
        'url', 'offset_start', 'offset_end',
    ).filter(F.col('obj') != ''))

    emails = entities.filter(F.col('obj_type') == 'email')
    out.append(emails.select(
        F.col('obj').alias('subj'), F.lit('email').alias('subj_type'),
        F.lit('has_domain').alias('pred'),
        F.get_json_object(norm, '$.domain_name').alias('obj'),
        F.lit('domain').alias('obj_type'),
        'url', 'offset_start', 'offset_end',
    ).filter(F.col('obj').isNotNull()))

    return out


def build_triples(entities: DataFrame) -> DataFrame:
    parts = [_mention_edges(entities)] + _fact_edges(entities)
    return reduce(DataFrame.unionByName, parts).select(*PROVENANCE)


def write_triples(triples: DataFrame, path: str,
                  url_buckets: int = 64) -> None:
    """Partition layout: pred directory-partitioned (partition pruning for
    per-predicate queries), url-hash bucketed files within each pred."""
    (
        triples
        .repartition(url_buckets, F.col('pred'), F.xxhash64('url'))
        .write.mode('overwrite')
        .partitionBy('pred')
        .parquet(path)
    )
