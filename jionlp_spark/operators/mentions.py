"""Stage 2 — mention detection.

clean(url, warc_ts, clean) → mentions(url, warc_ts, text, offset_start,
offset_end, mention_type): one row per typed mention, long format.

The rule sweep is a single fused pandas UDF (all extractor types in one pass
per Arrow batch); lexicon NER (FMM over a broadcast trie) is a second UDF
only when a lexicon is supplied.  Both produce the same mention struct and
are unioned column-wise (array concat) BEFORE the explode, so each document
row is scanned exactly once per family and exploded exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jionlp_spark.functions.udfs import (
    make_lexicon_mentions_udf,
    rule_mentions_udf,
)


def extract_mentions(clean_df: DataFrame,
                     text_col: str = 'extract_text',
                     lexicon_trie_broadcast=None,
                     keep_cols=('url', 'warc_ts')) -> DataFrame:
    ts_col = F.col('warc_ts') if 'warc_ts' in clean_df.columns \
        else F.lit(None).cast('timestamp')
    arrays = [rule_mentions_udf(F.col(text_col), ts_col)]
    if lexicon_trie_broadcast is not None:
        lex_udf = make_lexicon_mentions_udf(lexicon_trie_broadcast)
        arrays.append(lex_udf(F.col(text_col)))

    mention_array = arrays[0] if len(arrays) == 1 else F.concat(*arrays)

    keep = [F.col(c) for c in keep_cols if c in clean_df.columns]
    return (
        clean_df
        .select(*keep, F.explode(mention_array).alias('m'))
        .select(*keep, 'm.text', 'm.offset_start', 'm.offset_end',
                'm.mention_type', 'm.norm')
    )
