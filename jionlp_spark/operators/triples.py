"""Stage 4 — triple materialization.

entities → triples(subj, subj_type, pred, obj, obj_type, url, offset_start,
offset_end).  Edge families:

  (url, mentions_<type>, canonical_entity)   — provenance edges
  (entity, <relation>, derived_entity)       — facts from canonicalization
        phone  —located_in→   'province city'
        phone  —operated_by→  operator
        id     —issued_in→    'province/city/county'
        id     —born_on→      'YYYY-MM-DD'
        email  —has_domain→   domain

Single-pass design: every entity row emits an ARRAY of candidate edges
(mention edge + type-specific fact edges) which is exploded and null-
filtered.  One scan of the entities table, no self-unions (a naive
union-of-branches plan recomputes the upstream UDF chain once per branch —
6× the work), all column-level Catalyst expressions (get_json_object), fully
whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROVENANCE = ['subj', 'subj_type', 'pred', 'obj', 'obj_type', 'url',
              'offset_start', 'offset_end']


def _edge(subj, subj_type: str, pred: str, obj, obj_type: str):
    return F.struct(
        subj.alias('subj'), F.lit(subj_type).alias('subj_type'),
        F.lit(pred).alias('pred'), obj.alias('obj'),
        F.lit(obj_type).alias('obj_type'))


def _when_type(entity_type: str, edge):
    """Edge applies only to rows of one obj_type; others yield null (dropped
    after explode)."""
    return F.when(F.col('obj_type') == entity_type, edge)


def build_triples(entities: DataFrame) -> DataFrame:
    norm = F.col('norm')
    obj = F.col('obj')
    j = lambda p: F.get_json_object(norm, '$.' + p)  # noqa: E731

    edges = F.array(
        # provenance: (url, mentions_<type>, entity) — pred is dynamic
        F.struct(F.col('url').alias('subj'), F.lit('page').alias('subj_type'),
                 F.concat(F.lit('mentions_'), F.col('obj_type')).alias('pred'),
                 obj.alias('obj'), F.col('obj_type').alias('obj_type')),
        # phone facts
        _when_type('phone', _edge(obj, 'phone', 'located_in',
                                  j('geo'), 'region')),
        _when_type('phone', _edge(obj, 'phone', 'operated_by',
                                  j('operator'), 'operator')),
        # id-card facts
        _when_type('id_card', _edge(
            obj, 'id_card', 'issued_in',
            F.when(j('province').isNotNull(),
                   F.concat_ws('/', j('province'), j('city'), j('county'))),
            'region')),
        _when_type('id_card', _edge(
            obj, 'id_card', 'born_on',
            F.when(j('birth_year').isNotNull(),
                   F.concat_ws('-', j('birth_year'), j('birth_month'),
                               j('birth_day'))),
            'date')),
        # email facts
        _when_type('email', _edge(obj, 'email', 'has_domain',
                                  j('domain_name'), 'domain')),
        # location facts
        _when_type('location', _edge(obj, 'location', 'in_province',
                                     j('province'), 'province')),
    )

    return (
        entities
        .select('url', 'offset_start', 'offset_end',
                F.explode(edges).alias('e'))
        .filter(F.col('e.obj').isNotNull() & (F.col('e.obj') != ''))
        .select(F.col('e.subj').alias('subj'),
                F.col('e.subj_type').alias('subj_type'),
                F.col('e.pred').alias('pred'),
                F.col('e.obj').alias('obj'),
                F.col('e.obj_type').alias('obj_type'),
                'url', 'offset_start', 'offset_end')
    )


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
