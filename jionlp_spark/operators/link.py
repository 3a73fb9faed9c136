"""Stage 3 — entity linking / canonicalization.

mentions → entities(url, text, offset_start, offset_end, mention_type,
obj, obj_type, norm): every mention annotated with its canonical entity key
and a JSON canonical detail (phone geo/operator, id-card region/birth/gender,
email domain, ...), via one pandas UDF over broadcast lexicons.

Hot-entity hygiene: canonical keys are heavily skewed (e.g. a handful of
provinces dominate).  ``entity_counts`` shows the two-phase salted
aggregation pattern used wherever a groupBy on a canonical key feeds a wide
shuffle; AQE skew-join handles the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jionlp_spark.functions.udfs import LexiconBundle, make_link_udf


_BUNDLE_CACHE: dict = {}


def build_bundle(spark: SparkSession, dict_dir: str | None = None):
    """Load lexicons on the driver and broadcast once per session."""
    # applicationId, not id(): CPython can recycle a dead context's id
    key = (spark.sparkContext.applicationId, dict_dir)
    if key not in _BUNDLE_CACHE:
        _BUNDLE_CACHE[key] = LexiconBundle(dict_dir).broadcast(spark)
    return _BUNDLE_CACHE[key]


def link_mentions(mentions: DataFrame, bundle_broadcast) -> DataFrame:
    link_udf = make_link_udf(bundle_broadcast)
    norm_in = F.col('norm') if 'norm' in mentions.columns \
        else F.lit(None).cast('string')
    keep = [c for c in mentions.columns if c != 'norm']
    return (
        mentions
        .withColumn('l', link_udf(F.col('mention_type'), F.col('text'),
                                  norm_in))
        .select(*keep,
                F.col('l.obj').alias('obj'),
                F.col('l.obj_type').alias('obj_type'),
                F.col('l.norm').alias('norm'))
    )


def recognize_location(linked: DataFrame,
                       id_col: str = 'doc_id') -> DataFrame:
    """Per-document home location: the majority vote over its linked
    location mentions.

    Distributed skeleton of the reference LocationRecognizer's merge step
    (gadget/location_recognizer.py:44-450): the reference counts the
    candidate (province, city, county) expansions of every place word and
    returns the top-frequency merged address; here the candidates come from
    the lexicon-NER → LocationParser linking already in the mentions table
    (the reference's jiojio POS tagging stage is model-bound and out of
    scope — SURVEY §2.4), and the vote is a groupBy + per-doc top-1 window.
    Ties break lexically on (province, city, county) for determinism.

    Scale shape: one shuffle keyed (doc, region) with map-side combine,
    then a per-doc window over a handful of rows — no driver state.
    """
    from pyspark.sql.window import Window
    votes = (
        linked.filter(F.col('obj_type') == 'location')
        .select(id_col,
                F.get_json_object('norm', '$.province').alias('province'),
                F.get_json_object('norm', '$.city').alias('city'),
                F.get_json_object('norm', '$.county').alias('county'))
        .groupBy(id_col, 'province', 'city', 'county')
        .agg(F.count('*').alias('votes'))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc('votes'),
        F.coalesce('province', F.lit('')),
        F.coalesce('city', F.lit('')),
        F.coalesce('county', F.lit('')))
    return (votes.withColumn('_rn', F.row_number().over(w))
            .filter(F.col('_rn') == 1).drop('_rn'))


def entity_counts(entities: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Count mentions per canonical entity with two-phase salted agg.

    Phase 1 groups on (obj, obj_type, salt) — map-side partial aggregation
    spreads a hot key over ``salt_buckets`` reducers; phase 2 merges the
    per-salt partials.  Equivalent plan to a plain groupBy for uniform keys,
    strictly better under skew (north_rule: salted-key dedup for hot
    entities).
    """
    salted = entities.withColumn(
        'salt', F.pmod(F.xxhash64('url'), F.lit(salt_buckets)))
    partial = (
        salted.groupBy('obj', 'obj_type', 'salt')
        .agg(F.count('*').alias('partial_cnt'),
             F.countDistinct('url').alias('partial_urls'))
    )
    # the per-salt distinct-url sum is EXACT: salt is a function of url, so
    # no url can appear under two salts of the same entity
    return (
        partial.groupBy('obj', 'obj_type')
        .agg(F.sum('partial_cnt').alias('mention_cnt'),
             F.sum('partial_urls').alias('url_cnt'))
    )
