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


def ntz_epoch_us(ts_col: str):
    """TZ-independent epoch micros for NAIVE (timestamp_ntz) columns —
    ≡ DuckDB's epoch_us on the same parquet: unix_micros() rejects NTZ,
    and casting NTZ→timestamp re-interprets the wall clock in the
    session tz — field arithmetic instead (datediff/hour/minute are
    calendar-exact; extract(SECOND) is a decimal(8,6) carrying the
    microsecond fraction, so the ×1e6 is exact decimal math, never a
    float).  Takes a column NAME (extract needs one); null in → null
    out."""
    c = F.col(ts_col)
    return (F.datediff(F.to_date(c),
                       F.lit('1970-01-01').cast('date')).cast('long')
            * F.lit(86_400_000_000)
            + F.hour(c).cast('long') * F.lit(3_600_000_000)
            + F.minute(c).cast('long') * F.lit(60_000_000)
            + (F.expr(f'extract(SECOND FROM `{ts_col}`)')
               * F.lit(1_000_000)).cast('long'))


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


def sessionize(events: DataFrame, user_col: str = 'user_id',
               ts_col: str = 'ts',
               gap_minutes: int = 30) -> DataFrame:
    """→ (user_id, sess_idx, start_us, end_us, n_events, duration_us) —
    gap-based sessionization of a keyed event stream: a user's events
    sorted by time split into sessions wherever the inter-event gap
    exceeds ``gap_minutes``.  All arithmetic runs on epoch-MICROSECOND
    bigints derived tz-independently from the naive timestamp's own
    calendar fields (≡ DuckDB epoch_us on the same naive value), so
    session boundaries, counts, and durations are integer-exact and
    sub-second gaps are never truncated.  Equal-timestamp ties are
    safe: the boundary flag depends only on the (tied) values, so any
    tie order yields the same sessions.

    Scale shape: ONE shuffle on the user key; each user's partition is
    their event history (the classic sessionization skew is a bot user
    — cap upstream or salt by day if one key dominates); the rollup
    reuses the same partitioning (no second exchange).
    """
    from pyspark.sql import Window
    gap_us = int(gap_minutes) * 60 * 1_000_000
    ev = events.select(F.col(user_col).alias('user_id'),
                       ntz_epoch_us(ts_col).alias('ts_us'))
    w = Window.partitionBy('user_id').orderBy('ts_us')
    flagged = ev.withColumn(
        'new_sess',
        F.when(F.col('ts_us') - F.lag('ts_us').over(w) > F.lit(gap_us),
               1).otherwise(0))
    sess = flagged.withColumn(
        'sess_idx',
        F.sum('new_sess')
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast('long'))
    return (sess.groupBy('user_id', 'sess_idx')
            .agg(F.min('ts_us').cast('long').alias('start_us'),
                 F.max('ts_us').cast('long').alias('end_us'),
                 F.count('*').cast('long').alias('n_events'),
                 (F.max('ts_us') - F.min('ts_us')).cast('long')
                 .alias('duration_us')))


def winsorized_stats(events: DataFrame, key_col: str = 'event_type',
                     val_col: str = 'value', p: int = 99) -> DataFrame:
    """→ (key, n, cut, n_capped, win_sum, win_mean) — per-key
    winsorized value statistics: the EXACT per-key p-th percentile
    (lower-rank discrete rule) caps outliers before the sum/mean — the
    robust rollup a metrics pipeline runs on heavy-tailed event values
    (one pathological measurement must not move the mean).

    Exactness at scale: measured values live on a SMALL distinct
    domain (fixed-precision readings), so the percentile reduces over
    a (key, value) count table — map-side combine, distinct-domain-
    sized shuffle, never a per-key corpus sort (same formulation as
    textstats.length_quantiles).  The cut table is key-count-sized and
    broadcast back; capped values are stored doubles (either the
    original or the cut), so the winsorized sum routes through
    decimal(38,18)-via-string (exact, order-independent) and the mean
    is one per-row double tree.  Null measurements are EXCLUDED
    before counting (a null would otherwise join the cumulative order
    at an engine-dependent position and shift the percentile rank);
    n counts actual measurements only.
    """
    from pyspark.sql import Window
    ev = (events.select(F.col(key_col).alias('key'),
                        F.col(val_col).alias('v'))
          .filter(F.col('v').isNotNull()))
    counts = (ev.groupBy('key', 'v')
              .agg(F.count('*').cast('long').alias('cnt')))
    w = Window.partitionBy('key').orderBy('v') \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (counts
           .withColumn('cum', F.sum('cnt').over(w).cast('long'))
           .withColumn('n', F.sum('cnt').over(
               Window.partitionBy('key')).cast('long')))
    num = int(p)
    cuts = cum.groupBy('key').agg(
        F.max('n').cast('long').alias('n'),
        F.min(F.when(F.col('cum') >= F.expr(f'(n * {num} + 99) div 100'),
                     F.col('v'))).alias('cut'))
    capped = (ev.join(F.broadcast(cuts), 'key')
              .select('key', 'n', 'cut',
                      F.least(F.col('v'), F.col('cut')).alias('cv'),
                      (F.col('v') > F.col('cut')).cast('int')
                      .alias('over')))
    agg = (capped.groupBy('key', 'n', 'cut')
           .agg(F.sum('over').cast('long').alias('n_capped'),
                F.sum(F.col('cv').cast('string').cast('decimal(38,18)'))
                .alias('s')))
    win_sum = F.col('s').cast('string').cast('double')
    return agg.select('key', 'n', 'cut',
                      'n_capped', win_sum.alias('win_sum'),
                      (win_sum / F.col('n')).alias('win_mean'))


def asof_join(left: DataFrame, right: DataFrame,
              by_col: str = 'user_id', ts_col: str = 'ts',
              payload_cols: tuple = ('value',),
              tolerance_sec: int | None = None) -> DataFrame:
    """Point-in-time (as-of) join: every ``left`` row picks up the
    ``right`` row with the greatest ``ts`` at-or-before its own, per
    ``by_col`` — the feature-store join every training pipeline needs
    (label events joined to the feature/profile snapshot that was
    CURRENT when the event happened; joining on the latest snapshot
    instead leaks the future into the features).  → left columns +
    ``asof_ts`` + ``asof_<payload>``... (+ nulls when no prior right
    row, or when the match is older than ``tolerance_sec``).

    Idiomatic-Spark shape — the union-tag trick, ONE shuffle: a naive
    range join explodes to |left|·|right| per key before filtering and
    a per-key sort-merge-with-state needs imperative code, but tagging
    right rows (side 0) and left rows (side 1), unioning, and taking
    ``last(payload, ignorenulls)`` over a (by) window ordered by
    (ts, side) gives every left row the most recent right payload ≤
    its ts in one window pass (right sorts BEFORE left at equal ts —
    the ≤ tie).  One exchange on ``by_col``, per-key cost is the sorted
    scan, hot keys are sort-bounded, zero Python.  DuckDB's native
    ASOF LEFT JOIN is the oracle — two engines, two algorithms, same
    rows.

    ``right`` must be unique per (by, ts) — pre-reduce it (the gated
    query groupBy-max's its snapshot table; this operator doesn't
    hide a dedup the caller should see).  Ties at equal (by, ts)
    inside ``right`` would otherwise make the picked payload
    partition-order-dependent.
    """
    pay = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(by_col).alias('_by'), F.col(ts_col).alias('_ts'),
        F.lit(0).alias('_side'), pay.alias('_pay'))
    lcols = left.columns
    l = left.select(
        F.col(by_col).alias('_by'), F.col(ts_col).alias('_ts'),
        F.lit(1).alias('_side'), F.lit(None).cast(r.schema['_pay'].dataType).alias('_pay'),
        F.struct(*[F.col(c) for c in lcols]).alias('_row'))
    u = r.select('_by', '_ts', '_side', '_pay',
                 F.lit(None).cast(l.schema['_row'].dataType)
                 .alias('_row')).unionByName(l)
    w = (Window.partitionBy('_by').orderBy('_ts', '_side')
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u
               .withColumn('_m', F.last('_pay', ignorenulls=True).over(w))
               .withColumn('_mts', F.last(
                   F.when(F.col('_side') == 0, F.col('_ts')),
                   ignorenulls=True).over(w))
               .filter(F.col('_side') == 1))
    if tolerance_sec is not None:
        stale = (F.unix_timestamp('_ts') - F.unix_timestamp('_mts')
                 > int(tolerance_sec))
        matched = (matched
                   .withColumn('_m', F.when(stale, F.lit(None))
                               .otherwise(F.col('_m')))
                   .withColumn('_mts', F.when(stale, F.lit(None))
                               .otherwise(F.col('_mts'))))
    out = [F.col(f'_row.{c}').alias(c) for c in lcols]
    out.append(F.col('_mts').alias('asof_ts'))
    out += [F.col(f'_m.{c}').alias(f'asof_{c}') for c in payload_cols]
    return matched.select(*out)
