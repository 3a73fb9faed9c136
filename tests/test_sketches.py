"""HLL distinct sketch: accuracy envelope, linear-counting branch,
grouping, determinism (the gated hll_token_distinct query pins engine
parity; these pin estimator behavior)."""

import pyspark.sql.functions as F


def _sketch(spark, n_distinct, dup=1, key='k'):
    from jionlp_spark.operators.sketches import hll_distinct
    df = (spark.range(n_distinct * dup)
          .selectExpr(f"'{key}' as g",
                      f"concat('v', id % {n_distinct}) as v"))
    return hll_distinct(df, group_cols=('g',), value_col='v').collect()[0]


def test_hll_large_range_accuracy(spark):
    # m=256 → standard error 1.04/sqrt(256) ≈ 6.5%; assert a loose 3σ
    row = _sketch(spark, 20000)
    assert abs(row.hll_distinct - 20000) / 20000 < 0.2
    assert row.v_empty == 0


def test_hll_duplicates_do_not_move_the_estimate(spark):
    a = _sketch(spark, 5000, dup=1)
    b = _sketch(spark, 5000, dup=7)
    assert a.z_scaled == b.z_scaled and a.hll_distinct == b.hll_distinct


def test_hll_linear_counting_small_range(spark):
    # 3 distinct values: the raw estimate collapses, the linear-counting
    # branch (m·ln(m/V)) is near-exact for n ≪ m
    row = _sketch(spark, 3)
    assert row.v_empty >= 253
    assert abs(row.hll_distinct - 3) < 0.5


def test_hll_grouped_independent_sketches(spark):
    from jionlp_spark.operators.sketches import hll_distinct
    df = (spark.range(3000)
          .selectExpr("case when id % 3 = 0 then 'a' else 'b' end as g",
                      "concat('t', id) as v"))
    rows = {r.g: r for r in
            hll_distinct(df, group_cols=('g',), value_col='v').collect()}
    assert set(rows) == {'a', 'b'}
    assert abs(rows['a'].hll_distinct - 1000) / 1000 < 0.25
    assert abs(rows['b'].hll_distinct - 2000) / 2000 < 0.25


def test_hll_estimate_matches_reference_formula(spark):
    # recompute the finalizer in Python from the exact sketch state
    import math
    from jionlp_spark.operators.sketches import (
        HLL_M, _NUMER, _SCALE)
    row = _sketch(spark, 1000)
    raw = _NUMER / float(row.z_scaled)
    want = (HLL_M * math.log(HLL_M / float(row.v_empty))
            if raw <= 2.5 * HLL_M and row.v_empty > 0 else raw)
    assert abs(row.hll_distinct - want) < 1e-9 * max(1.0, want)
    assert row.z_scaled > 0 and 0 <= row.v_empty <= HLL_M
