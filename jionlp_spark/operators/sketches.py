"""Distributed sketches — deterministic HyperLogLog distinct counting.

At 100 TB, ``count(distinct token)`` per key is the classic shuffle
killer: the exact plan must co-locate every (key, token) pair before it
can count, so the shuffle is corpus-sized.  The HLL register table is
``keys × 256`` rows regardless of corpus size, the register aggregation
map-side combines (``max`` per bucket), and merging partial register
tables is associative — the same reason Spark's own
``approx_count_distinct`` uses HLL++.  We implement the sketch from
scratch (Flajolet et al. 2007, the standard HLL with the m ≥ 128 alpha
constant and the small-range linear-counting correction) instead of
calling the built-in because the whole point of this repo's gate is an
engine-independent oracle: every stage below is a deterministic md5
expression tree DuckDB reproduces bit-for-bit, so the DRIVER can verify
the sketch — Spark's HLL++ is a JVM-private binary sketch no other
engine can replay.

Determinism/parity design (CLAUDE.md float rules):

- hash = md5(value), lowercase hex in both engines; bucket = first two
  hex chars (m = 256, kept as a STRING key — no hex→int needed for the
  group key); w = next eight hex chars parsed to a 32-bit integer with
  an instr()-based positional expansion (both engines lack a portable
  hex→int — the generated sum of per-nibble terms is exact bigint
  arithmetic);
- rho = leading-zero count of w in 32 bits + 1 (33 when w = 0), as a
  generated threshold CASE over the w column — integer-exact, no
  log2/float bit tricks;
- the harmonic denominator is kept SCALED: Σ 2^(33 − r) as an exact
  bigint (r ≤ 33 ⇒ each term ≤ 2^32, total ≤ 2^42 — no overflow, no
  order-sensitive double sum); empty buckets contribute 2^33 each,
  added arithmetically from the observed-bucket count;
- the estimate α·m²·2^33 / z_scaled is ONE per-row double division
  whose numerator is a Python-computed literal injected via
  cast('<repr>' as double) — bit-identical; the linear-counting branch
  (raw ≤ 2.5 m and empty buckets exist → m·ln(m/V)) uses ln, where the
  engines' libm differ at ~1e-9 relative — inside the gate's '.6f'
  tolerance, same as every existing ln-based query (token_idf,
  lm_perplexity, kg_link_predict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 256                       # 2 hex chars of bucket key
_SCALE_POW = 33                   # max rho; z is scaled by 2^33
_SCALE = 1 << _SCALE_POW          # 8589934592
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_NUMER = _ALPHA * HLL_M * HLL_M * float(_SCALE)
_HEX = '0123456789abcdef'


def hll_bucket_sql(h: str = 'h') -> str:
    return f"substr({h}, 1, 2)"


def hll_w32_sql(h: str = 'h') -> str:
    """Hex chars 3..10 of the md5 → 32-bit integer (exact bigint sum of
    per-nibble positional terms)."""
    terms = ' + '.join(
        f"cast(instr('{_HEX}', substr({h}, {3 + i}, 1)) - 1 as bigint)"
        f" * {16 ** (7 - i)}"
        for i in range(8))
    return f"({terms})"


def hll_rho_sql(w: str = 'w') -> str:
    """Leading-zero count of the 32-bit value + 1; 33 when w = 0."""
    cases = ' '.join(f"when {w} >= {1 << i} then {32 - i}"
                     for i in range(31, -1, -1))
    return f"(case {cases} else 33 end)"


def hll_estimate_sql(z: str = 'z_scaled', v: str = 'v_empty') -> str:
    """Finalizer over the exact scaled denominator + empty-bucket count."""
    raw = f"cast('{_NUMER!r}' as double) / cast({z} as double)"
    lin = f"{float(HLL_M)!r} * ln({float(HLL_M)!r} / cast({v} as double))"
    return (f"(case when {raw} <= {2.5 * HLL_M!r} and {v} > 0 "
            f"then {lin} else {raw} end)")


def cms_sketch(df: DataFrame, value_col: str = 'token',
               d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a value
    column → (row_i, bucket, cnt): ``d`` independent md5-seeded hash
    rows × ``w`` counters.  The sketch table is ≤ d·w rows whatever the
    corpus size, the counter aggregation map-side combines, and partial
    sketches merge by cell-wise addition — the frequency-estimation
    companion of the HLL sketch (state bounded, one pass, mergeable).
    All arithmetic is exact bigint: hash row i buckets a value by the
    32-bit md5 slice of ``concat(i, value)`` mod w — deterministic, so
    DuckDB replays every cell."""
    rows = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias('row_i'),
        F.col(value_col).alias('v'))
    return (rows
            .selectExpr('row_i',
                        "md5(concat(cast(row_i as string), v)) as h")
            .selectExpr('row_i', f"{hll_w32_sql('h')} % {w} as bucket")
            .groupBy('row_i', 'bucket')
            .agg(F.count('*').cast('long').alias('cnt')))


def cms_estimate(sketch: DataFrame, queries: DataFrame,
                 value_col: str = 'token', d: int = 4,
                 w: int = 1024) -> DataFrame:
    """→ (value, cms_est): point-frequency upper bounds for the query
    values — min over the d counters each value hashes to.  The sketch
    side is ≤ d·w rows → broadcast; absent cells read 0 (a value never
    inserted estimates 0, the CMS guarantee est ≥ true keeps holding)."""
    q = queries.select(F.col(value_col).alias('v')).distinct()
    qb = (q.select(
        'v',
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias('row_i'))
        .selectExpr('v', 'row_i',
                    "md5(concat(cast(row_i as string), v)) as h")
        .selectExpr('v', 'row_i', f"{hll_w32_sql('h')} % {w} as bucket"))
    return (qb.join(F.broadcast(sketch), ['row_i', 'bucket'], 'left')
            .groupBy('v')
            .agg(F.min(F.coalesce(F.col('cnt'), F.lit(0)))
                 .cast('long').alias('cms_est'))
            .withColumnRenamed('v', value_col))


def bloom_build(df: DataFrame, value_col: str = 'token',
                k: int = 3, m: int = 4096) -> DataFrame:
    """Bloom filter (Bloom 1970) over a value column → (pos,) — the SET
    of lit bit positions, i.e. the sparse encoding of the m-bit array.

    The membership companion of the HLL/CMS sketches: ≤ m rows whatever
    the corpus size, the position aggregation map-side combines
    (distinct), and partial filters merge by union — a crawl frontier's
    "have we ever fetched this URL" check becomes a broadcast join
    against ≤ m rows instead of a corpus-sized anti-join against the
    full fetch history.  Guarantee: no false negatives ever; false
    positives at rate ≈ (1 − e^{−kn/m})^k, tunable via m.

    Hash i of value v lights position w32(md5(i ‖ v)) mod m — the same
    md5 slice arithmetic as the CMS rows (``hll_w32_sql``), exact bigint
    end-to-end, so DuckDB replays every position.  A bit-packed bigint
    encoding would be 64× narrower but 1<<63 overflows DuckDB's signed
    shift — the position-set form keeps the oracle engine-identical."""
    rows = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias('row_i'),
        F.col(value_col).alias('v'))
    return (rows
            .selectExpr("md5(concat(cast(row_i as string), v)) as h")
            .selectExpr(f"cast({hll_w32_sql('h')} % {m} as bigint) as pos")
            .distinct())


def bloom_contains(bloom: DataFrame, queries: DataFrame,
                   value_col: str = 'token',
                   k: int = 3, m: int = 4096) -> DataFrame:
    """→ (value_col, bloom_hit): membership verdicts for the query
    values — hit iff ALL k positions are lit.  The filter side is ≤ m
    rows → broadcast; the k-way position probe is an equi-join, never a
    scan of the insert history."""
    q = queries.select(F.col(value_col).alias('v')).distinct()
    qpos = (q.select(
        'v',
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias('row_i'))
        .selectExpr('v',
                    "md5(concat(cast(row_i as string), v)) as h")
        .selectExpr('v', f"cast({hll_w32_sql('h')} % {m} as bigint)"
                         " as pos"))
    lit = bloom.select('pos', F.lit(1).alias('_hit'))
    return (qpos.join(F.broadcast(lit), 'pos', 'left')
            .groupBy('v')
            .agg((F.sum(F.coalesce(F.col('_hit'), F.lit(0))) == k)
                 .alias('bloom_hit'))
            .withColumnRenamed('v', value_col))


def hll_distinct(df: DataFrame, group_cols=('lang',),
                 value_col: str = 'token') -> DataFrame:
    """→ (group_cols…, z_scaled, v_empty, hll_distinct): per-group
    distinct-``value_col`` estimate.  ``z_scaled``/``v_empty`` are the
    exact-integer sketch state (mergeable evidence the oracle checks
    bit-for-bit); ``hll_distinct`` is the double estimate."""
    gl = list(group_cols)
    regs = (df
            .selectExpr(*gl, f"md5({value_col}) as h")
            .selectExpr(*gl, f"{hll_bucket_sql('h')} as bucket",
                        f"{hll_w32_sql('h')} as w")
            .selectExpr(*gl, 'bucket', f"{hll_rho_sql('w')} as rho")
            .groupBy(*gl, 'bucket').agg(F.max('rho').alias('r')))
    agg = regs.groupBy(*gl).agg(
        F.expr(f"sum(cast(power(2.0, {_SCALE_POW} - r) as bigint))")
        .alias('z_obs'),
        F.count('*').alias('n_obs'))
    return (agg
            .selectExpr(
                *gl,
                f"cast(z_obs + ({HLL_M} - n_obs) * {_SCALE} as bigint)"
                " as z_scaled",
                f"cast({HLL_M} - n_obs as bigint) as v_empty")
            .selectExpr(*gl, 'z_scaled', 'v_empty',
                        f"{hll_estimate_sql()} as hll_distinct"))
