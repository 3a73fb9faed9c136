"""Spot-check named queries() entries against their DuckDB oracle at
sf0.01 — same compare as tests/test_oracle_contract.py, but only for the
names given on argv (fast iteration while developing a query).

Usage: python scripts/check_queries.py q1 q2 ...
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR_TEST', '/root/testdata/sf0.01')
TABLES = ('region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings')


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return 'nan'
        return format(v, '.6f')
    if v is None:
        return ''
    return str(v)


def _rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted('\x01'.join(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print('usage: check_queries.py <query> [...]')
        return 2

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f'{SF_DIR}/{t}.parquet'
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')")

    from jionlp_spark.config import get_spark
    spark = get_spark('check', master='local[8]', shuffle_partitions=8)
    spark.sparkContext.setLogLevel('ERROR')

    import __spark_entry__ as mod
    qs, oracles = mod.queries(), mod.oracle_sql()

    rc = 0
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        got_cols = df.columns
        got = df.collect()
        if name not in oracles:
            print(f'{name}: rows-only, {len(got)} rows '
                  f'({time.time()-t0:.1f}s)')
            continue
        res = con.execute(oracles[name])
        want_cols = [d[0] for d in res.description]
        want = res.fetchall()
        if sorted(got_cols) != sorted(want_cols):
            print(f'{name}: COLUMNS differ {got_cols} vs {want_cols}')
            rc = 1
            continue
        if len(got) != len(want):
            print(f'{name}: ROWCOUNT {len(got)} vs {len(want)}')
            rc = 1
            continue
        g = _rows_to_set([tuple(r) for r in got], got_cols)
        w = _rows_to_set(want, want_cols)
        if g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f'{name}: VALUES differ, e.g. {diff}')
            rc = 1
            continue
        print(f'{name}: OK {len(got)} rows ({time.time()-t0:.1f}s)')
    spark.stop()
    return rc


if __name__ == '__main__':
    sys.exit(main())
