"""Graph operators over the KG edge table: weighted PageRank.

After co-occurrence edge extraction (``kg_cooccurrence``), the next KG
construction step is ranking entities by graph centrality — PageRank
over the weighted co-occurrence graph is the standard importance prior
for entity salience, seed selection, and triple-confidence weighting.

Engine-parity design (every iteration is DuckDB-mirrorable):

- per-edge contribution ``pr(u) * w / wdeg(u)`` is a per-row double
  tree over exact integer weights and the previous iteration's pr
  (itself engine-identical by induction) → bit-identical in both
  engines;
- the per-target reduction routes through ``decimal(38,18)`` via
  string (exact and order-independent — a cross-row double sum would
  be partitioning-dependent);
- teleport and damping constants enter as Python-float literals on the
  Spark side and ``cast('<repr>' as double)`` on the SQL side (DuckDB
  would otherwise parse ``0.85`` as DECIMAL and compute ``1.0 - 0.85``
  exactly where IEEE doubles give 0.15000000000000002).

Scale shape: the edge table (with precomputed out-weight) is persisted
once and reused every round; each round is ONE join (edges × pr, both
keyed on the node id — co-partitionable) + ONE map-side-combined
aggregation, with a ``localCheckpoint`` per round so the iterative plan
never nests (CLAUDE.md iterative-driver rule).  Rounds are a fixed
small count; state is node-table-sized, never corpus-sized.  Hot hub
nodes skew the groupBy key — AQE skew-join applies; extreme hubs can
ride the salted two-phase pattern of operators/link.entity_counts.

Reference: JioNLP has no graph runtime — this is KG-side functionality
the pipeline adds on top of the reference's extraction operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src_col: str = 'src', dst_col: str = 'dst',
             weight_col: str = 'weight') -> DataFrame:
    """→ (v, pr) — weighted PageRank after ``iters`` rounds.

    ``edges`` must be out-degree-complete: every node appears as a
    source at least once (symmetrized co-occurrence graphs are, by
    construction).  Dangling-node mass redistribution is deliberately
    out of scope — feed both directions of an undirected graph.
    """
    tele = 1.0 - damping

    e = edges.select(F.col(src_col).alias('src'),
                     F.col(dst_col).alias('dst'),
                     F.col(weight_col).cast('long').alias('w'))
    wdeg = e.groupBy('src').agg(F.sum('w').alias('wdeg'))
    ew = e.join(wdeg, 'src').persist()

    nodes = ew.select(F.col('src').alias('v')).distinct().localCheckpoint()
    n_nodes = nodes.agg(F.count('*').cast('long').alias('n'))

    pr = (nodes.crossJoin(F.broadcast(n_nodes))
          .select('v', (F.lit(1.0) / F.col('n')).alias('pr'))
          .localCheckpoint())
    for _ in range(iters):
        contrib = (
            ew.join(pr, ew['src'] == pr['v'])
            .select(F.col('dst'),
                    (F.col('pr') * F.col('w') / F.col('wdeg')).alias('c'))
            .groupBy('dst')
            .agg(F.sum(F.col('c').cast('string').cast('decimal(38,18)'))
                 .alias('s')))
        pr = (nodes.join(contrib, nodes['v'] == contrib['dst'], 'left')
              .crossJoin(F.broadcast(n_nodes))
              .select(nodes['v'],
                      (F.lit(tele) / F.col('n')
                       + F.lit(damping)
                       * F.coalesce(F.col('s').cast('string')
                                    .cast('double'), F.lit(0.0)))
                      .alias('pr'))
              .localCheckpoint())
    ew.unpersist()
    return pr
