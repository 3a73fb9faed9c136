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


def test_cms_upper_bound_and_exactness_when_sparse(spark):
    from jionlp_spark.operators.sketches import cms_estimate, cms_sketch
    # 50 distinct values with known counts: value v_i appears i+1 times
    df = (spark.range(50)
          .selectExpr("explode(sequence(0, cast(id as int))) as rep",
                      "concat('val', id) as token")
          .select('token'))
    sk = cms_sketch(df)
    q = spark.range(50).selectExpr("concat('val', id) as token")
    est = {r.token: r.cms_est for r in cms_estimate(sk, q).collect()}
    for i in range(50):
        true = i + 1
        assert est[f'val{i}'] >= true          # CMS never underestimates
    # 50 values over 4×1024 cells: collisions are overwhelmingly unlikely
    # to hit ALL 4 rows of any value → min is exact here
    assert all(est[f'val{i}'] == i + 1 for i in range(50))


def test_cms_absent_value_estimates_zero(spark):
    from jionlp_spark.operators.sketches import cms_estimate, cms_sketch
    df = spark.range(100).selectExpr("concat('x', id) as token")
    q = spark.createDataFrame([('never-seen-value-qqq',)], 'token string')
    est = cms_estimate(cms_sketch(df), q).collect()
    assert len(est) == 1 and est[0].cms_est in (0, 1)  # 0 unless collision


def test_bloom_never_false_negative(spark):
    # every inserted value MUST hit, at any fill level (m=64 over 300
    # inserts is heavily loaded — the guarantee still holds)
    from jionlp_spark.operators.sketches import bloom_build, bloom_contains
    df = spark.range(300).selectExpr("concat('u', id) as token")
    bloom = bloom_build(df, k=3, m=64)
    hits = bloom_contains(bloom, df, k=3, m=64).collect()
    assert len(hits) == 300 and all(r.bloom_hit for r in hits)


def test_bloom_state_bounded_and_misses_possible(spark):
    from jionlp_spark.operators.sketches import bloom_build, bloom_contains
    df = spark.range(40).selectExpr("concat('v', id) as token")
    bloom = bloom_build(df, k=3, m=4096)
    assert bloom.count() <= min(40 * 3, 4096)
    probes = spark.range(200).selectExpr("concat('absent', id) as token")
    hits = bloom_contains(bloom, probes, k=3, m=4096).collect()
    # 120/4096 lit bits → FP rate ≈ (0.03)^3 ≈ 3e-5; 200 probes must
    # overwhelmingly miss (a single collision-FP would still pass)
    assert sum(r.bloom_hit for r in hits) <= 2


def test_bloom_merge_is_union(spark):
    # building over A ∪ B == union-distinct of the two partial filters —
    # the mergeability that lets per-batch filters combine at publish
    from jionlp_spark.operators.sketches import bloom_build
    a = spark.range(50).selectExpr("concat('a', id) as token")
    b = spark.range(50).selectExpr("concat('b', id) as token")
    merged = (bloom_build(a, k=3, m=512)
              .union(bloom_build(b, k=3, m=512)).distinct())
    whole = bloom_build(a.union(b), k=3, m=512)
    assert (sorted(r.pos for r in merged.collect())
            == sorted(r.pos for r in whole.collect()))


def test_cms_sketch_state_is_bounded(spark):
    from jionlp_spark.operators.sketches import cms_sketch
    df = spark.range(20000).selectExpr("concat('t', id % 5000) as token")
    sk = cms_sketch(df)
    n = sk.count()
    assert n <= 4 * 1024
    total = sk.agg(F.sum('cnt').alias('s')).collect()[0].s
    assert total == 4 * 20000                 # every insert hits d rows
