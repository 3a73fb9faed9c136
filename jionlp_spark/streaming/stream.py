"""Structured Streaming variant of the mention pipeline.

The reference is batch-only (no streaming anywhere in JioNLP); this module
exists because a crawl is naturally a stream: pages arrive, mentions are
extracted incrementally, and per-entity counts are maintained with
watermarked windows.  The same stage-1/2 UDFs run unchanged — the pipeline
is declared once and bound to either a batch or a streaming source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jionlp_spark.operators.clean import clean_pages
from jionlp_spark.operators.mentions import extract_mentions


def streaming_mentions(pages_stream: DataFrame,
                       lexicon_trie_broadcast=None) -> DataFrame:
    """pages stream → mention stream (same operators as batch)."""
    clean = clean_pages(pages_stream, lang='zh', use_html=True)
    return extract_mentions(clean,
                            lexicon_trie_broadcast=lexicon_trie_broadcast)


def windowed_entity_counts(mentions_stream: DataFrame,
                           window: str = '10 minutes',
                           watermark: str = '30 minutes') -> DataFrame:
    """Tumbling-window mention counts per (type, text) with a watermark for
    late pages."""
    return (
        mentions_stream
        .withWatermark('warc_ts', watermark)
        .groupBy(F.window('warc_ts', window),
                 'mention_type', 'text')
        .agg(F.count('*').alias('mention_cnt'))
    )


def run_file_stream(spark: SparkSession, source_dir: str, out_dir: str,
                    checkpoint_dir: str, trie_broadcast=None):
    """File-source streaming job: watch a directory of page parquet drops,
    write mention deltas — the local stand-in for a Kafka crawl feed."""
    from jionlp_spark.sources.pages import PAGES_SCHEMA
    pages = (spark.readStream.schema(PAGES_SCHEMA)
             .parquet(source_dir))
    mentions = streaming_mentions(pages, trie_broadcast)
    return (mentions.writeStream
            .format('parquet')
            .option('path', out_dir)
            .option('checkpointLocation', checkpoint_dir)
            .outputMode('append')
            .trigger(availableNow=True)
            .start())
