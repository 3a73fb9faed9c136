"""Temporal trend operators over keyed event streams: burst detection.

The KG-side consumer is entity-mention timelines (an entity whose daily
mention count jumps against its own trailing baseline is an emerging
event — the corpus-level analog of the reference's new_word_discovery,
which finds bursts in the VOCABULARY where this finds them in the
ENTITY stream).  The operator is generic over any (key, timestamp)
stream; the gated query runs it on the driver's events table.

Engine-parity design: daily counts and the trailing sums are exact
bigints (a RANGE window over the integer epoch-day keeps calendar gaps
out of the frame arithmetic — absent days contribute zero by
construction, not by fill); the burst ratio is ONE per-row double tree
over those integers, so both engines produce bit-identical doubles.

Scale shape: one map-side-combined groupBy to the (key, day) grain —
the only corpus-sized shuffle — then windows over per-key partitions
of the (tiny) daily table.  Hot keys are day-bounded (a key's
partition is its day count, not its event count), so the skew ceiling
is days-of-history, not traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burst_scores(events: DataFrame, key_col: str = 'event_type',
                 ts_col: str = 'ts', window_days: int = 7,
                 min_ratio: float = 0.0) -> DataFrame:
    """→ (key, day, n, trail_n, days_present, burst) — per-key daily
    counts scored against the trailing ``window_days`` calendar days:
    ``burst = n · window_days / trail_n`` (ratio vs the zero-filled
    trailing mean — exactly 1.0 for steady traffic, k for a k× jump).
    Days whose trailing window holds no data are omitted (no baseline,
    no verdict); ``days_present`` reports how many of the trailing
    calendar days actually had traffic.
    """
    daily = (events
             .groupBy(F.col(key_col).alias('key'),
                      F.to_date(F.col(ts_col)).alias('day'))
             .agg(F.count('*').cast('long').alias('n')))
    day_num = F.datediff(F.col('day'), F.lit('1970-01-01').cast('date'))
    w = (Window.partitionBy('key').orderBy(day_num)
         .rangeBetween(-int(window_days), -1))
    scored = (daily
              .withColumn('trail_n',
                          F.sum('n').over(w).cast('long'))
              .withColumn('days_present',
                          F.count('n').over(w).cast('long')))
    burst = (F.col('n').cast('double') * F.lit(int(window_days))
             / F.col('trail_n'))
    return (scored
            .filter(F.col('trail_n').isNotNull())
            .select('key', 'day', 'n', 'trail_n', 'days_present',
                    burst.alias('burst'))
            .filter(F.col('burst') >= F.lit(float(min_ratio))))
