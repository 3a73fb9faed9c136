"""Scale curves for the round-6-close web/storage operators (wall,
rows, REAL shuffle-write records) — results go into BENCH/PLANS.md.

Claims each measurement backs:

- resolve_redirects: POINTER DOUBLING — resolving n chains of length L
  costs ⌈log₂ L⌉ join rounds, so wall/records grow ~log in L at fixed
  edge count and ~linearly in edge count at fixed L.  The L sweep
  holds edges constant (n·L = const) — a hop-at-a-time walker would be
  LINEAR in L here; the doubling rows should stay nearly flat.
- pack_plan_bfd: one shard shuffle then a per-shard greedy —
  shuffle records exactly linear in docs, wall dominated by the
  Python greedy (linear per shard at bounded open-pack counts).
- read_warc_segments: ONE mapInPandas, ZERO shuffle at any scale —
  the parse is embarrassingly parallel over segments.

Usage: python scripts/webstorage_scale_bench.py [factors...]
       (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dedup_scale_bench import shuffle_records  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    from pyspark.sql import functions as F

    from jionlp_spark.config import get_spark
    from jionlp_spark.operators.curate import pack_plan_bfd
    from jionlp_spark.operators.weblinks import resolve_redirects
    from jionlp_spark.sources.pages import read_warc_segments

    spark = get_spark('webstorage-scale-bench')
    spark.sparkContext.setLogLevel('ERROR')

    def run(name, fn):
        s0 = shuffle_records(spark)
        t0 = time.time()
        rows = fn().count()
        cold = time.time() - t0
        s1 = shuffle_records(spark)
        rec = (s1 - s0) if (s0 >= 0 and s1 >= 0) else -1
        print(json.dumps({'op': name, 'cold_sec': round(cold, 2),
                          'rows': rows, 'shuffle_records': rec,
                          'load1': round(os.getloadavg()[0], 2)}))

    # --- redirect chains: L sweep at CONSTANT edge count (100k edges)
    # — the log-vs-linear-in-L claim — then an edge-count sweep at
    # fixed L=10
    total_edges = 100_000
    for chain_len in (10, 100, 1000):
        n_chains = total_edges // chain_len
        g = F.col('id') % n_chains
        i = (F.col('id') / n_chains).cast('long')
        edges = (spark.range(n_chains * chain_len)
                 .select(F.format_string('http://r/%s/%s', g, i)
                         .alias('src'),
                         F.format_string('http://r/%s/%s', g, i + 1)
                         .alias('dst')))
        run(f'resolve_redirects@L{chain_len}_edges{total_edges}',
            lambda e=edges: resolve_redirects(e))

    for factor in factors:
        n_edges = 10_000 * factor
        n_chains = n_edges // 10
        g = F.col('id') % n_chains
        i = (F.col('id') / n_chains).cast('long')
        edges = (spark.range(n_edges)
                 .select(F.format_string('http://r/%s/%s', g, i)
                         .alias('src'),
                         F.format_string('http://r/%s/%s', g, i + 1)
                         .alias('dst')))
        run(f'resolve_redirects@L10_x{factor}',
            lambda e=edges: resolve_redirects(e))

    # --- BFD packing + WARC parse: docs/segments sweep
    for factor in factors:
        n = 5_000 * factor
        d = F.col('id')
        docs = spark.range(n).select(
            d.alias('doc_id'),
            F.concat(F.lit('w '),
                     F.repeat(F.lit('w '), (d % 90 + 5).cast('int')))
            .alias('text'))
        run(f'pack_plan_bfd@x{factor}',
            lambda dd=docs: pack_plan_bfd(dd, max_len=128))

        body = F.concat(F.lit('<p>doc '), d.cast('string'),
                        F.lit('</p>'))
        http = F.concat(
            F.lit('HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n'
                  '\r\n'), body)
        rec = F.concat(
            F.lit('WARC/1.0\r\nWARC-Type: response\r\n'
                  'WARC-Target-URI: '),
            F.format_string('http://h%s/p/%s', d % 50, d),
            F.lit('\r\nContent-Type: application/http\r\n'
                  'Content-Length: '),
            F.length(http).cast('string'), F.lit('\r\n\r\n'),
            http, F.lit('\r\n\r\n'))
        segs = spark.range(n).select(
            d.alias('segment_id'), rec.cast('binary').alias('warc'))
        run(f'read_warc_segments@x{factor}',
            lambda ss=segs: read_warc_segments(ss))

    spark.stop()


if __name__ == '__main__':
    main()
