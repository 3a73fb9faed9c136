"""Plan-shape regression guards: filter pushdown and column pruning must
reach the parquet scan (the BENCH/PLANS.md audit, protected by CI), and
the bench/oracle registries must stay complete."""

import re


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    """tpch_pricing_summary's shipdate filter must appear in
    PushedFilters, and the scan must NOT read unprojected columns
    (l_comment etc.) — a scan reading all columns for an aggregation
    projection is wrong at any scale."""
    import __spark_entry__ as entry
    df = entry.queries()['tpch_pricing_summary'](
        spark, '/root/testdata/sf0.01')
    plan = _plan(df)
    m = re.search(r'PushedFilters: \[([^\]]*)\]', plan)
    assert m, 'no PushedFilters in the scan node'
    assert 'l_shipdate' in m.group(1), m.group(1)
    m = re.search(r'FileScan parquet \[([^\]]*)\]', plan)
    assert m, 'no FileScan node'
    read_cols = {c.split('#')[0] for c in m.group(1).split(',')}
    assert 'l_comment' not in read_cols
    assert 'l_orderkey' not in read_cols
    assert 'l_extendedprice' in read_cols


def test_partition_column_pruning_events(spark):
    """events_daily reads only the columns its rollup needs."""
    import __spark_entry__ as entry
    df = entry.queries()['events_daily'](spark, '/root/testdata/sf0.01')
    plan = _plan(df)
    m = re.search(r'FileScan parquet \[([^\]]*)\]', plan)
    assert m
    read_cols = {c.split('#')[0] for c in m.group(1).split(',')}
    # events carries a wide props string column the rollup never touches
    assert 'props' not in read_cols, read_cols
    assert 'event_id' not in read_cols, read_cols


def test_bench_and_oracle_registries_complete():
    """Every queries() entry is benched and has an oracle — drift guard
    (two queries sat unbenched for four rounds before this existed)."""
    import __spark_entry__ as entry
    import bench
    qs = set(entry.queries())
    assert qs <= set(bench.HEADLINE), qs - set(bench.HEADLINE)
    assert qs == set(entry.oracle_sql()), \
        qs ^ set(entry.oracle_sql())
