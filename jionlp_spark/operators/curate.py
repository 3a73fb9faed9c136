"""Corpus curation: the composed training-data admission pipeline.

A production crawl corpus is curated in stages — language allow-list,
quality floor, exact dedup, near-dup dedup — and every dropped document
needs an auditable reason (data governance wants "why did doc X not make
the training set?" answerable without re-running the pipeline).  This
operator composes the repo's existing primitives (quality_score features,
MinHash+LSH candidate pairs, large-star/small-star connected components)
into ONE DataFrame job emitting a per-doc verdict:

    (doc_id, status)   status ∈ {kept, dropped_lang, dropped_quality,
                                 dropped_exact, dropped_neardup}

Stage order (each stage sees only the previous stage's survivors, so a
low-quality doc that is ALSO a near-dup reports the earlier, cheaper
reason — and the expensive LSH stage runs over the smallest set):

1. lang      — allow-list on the lang column (no text scan).
2. quality   — the quality_score composite (length + distinct-token
               ratio), per-row expression, threshold compare.
3. exact     — md5(text) groupBy, keep min doc_id per hash.
4. near-dup  — 3-gram shingle MinHash (16 hashes, 4 bands) LSH candidate
               pairs over exact survivors → connected components
               (keep-min) → non-keep members drop.

Scale shape: one scan of the corpus; lang/quality are per-row expressions
(no shuffle); exact dedup is one hash-partitioned groupBy with map-side
combine; the LSH stage shuffles only survivors' band rows (bounded
candidates — 3-gram shingles, see operators/dedup.py); components run
O(log n) star rounds over the pair table (pairs-sized, not corpus-sized);
the final status assembly is doc_id-keyed left joins that AQE broadcasts
when the drop sets are small.  Nothing here is quadratic in corpus size.

Reference: JioNLP has no single curation entry point — this is the
composition a user of clean_text + dedup primitives builds by hand; the
stage semantics reuse the repo's oracle-proven parts verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LANGS = ('en', 'es', 'fr', 'de')


def quality_expr(text_col: str = 'text'):
    """The quality_score composite as a reusable Column (same expression
    tree as operators/textstats.quality_score — per-row, engine-portable
    float parity per the repo's oracle rules)."""
    toks = F.split(F.col(text_col), ' ')
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(
        n_tokens, F.lit(1))
    return (F.least(n_tokens / F.lit(256.0), F.lit(1.0)) * 0.5
            + distinct_ratio * 0.5)


def curate_corpus(docs: DataFrame, langs=DEFAULT_LANGS,
                  min_quality: float = 0.35,
                  text_col: str = 'text', id_col: str = 'doc_id',
                  lang_col: str = 'lang',
                  num_hashes: int = 16, bands: int = 4,
                  shingle_n: int = 3) -> DataFrame:
    """→ (doc_id, status) for EVERY input doc — the curation audit table.

    Filtering the corpus is `result.filter("status = 'kept'")` joined back
    on doc_id; the audit rows for dropped docs are the governance record.
    """
    from jionlp_spark.operators.dedup import (dedup_keep_list,
                                              lsh_candidate_pairs,
                                              minhash_signatures, shingles)

    base = docs.select(F.col(id_col).alias('doc_id'),
                       F.col(text_col).alias('text'),
                       F.col(lang_col).alias('lang'))

    lang_ok = F.col('lang').isin(*langs)
    qual_ok = quality_expr('text') >= F.lit(float(min_quality))
    # each stage table is REUSED downstream (the audit column + the next
    # stage's input) — Spark plans are trees, not DAGs, so without a
    # materialization every reuse re-derives the whole upstream subtree
    # (first cut of this operator: 21 scans / 36 exchanges).  persist()
    # on the staged table + localCheckpoint on the (eagerly-consumed
    # anyway — dedup_keep_list's components loop runs at build time)
    # exact-dedup survivors collapse that to a handful; both are tables
    # a production admission pipeline would materialize regardless.
    staged = base.select(
        'doc_id', 'text',
        F.when(~lang_ok, F.lit('dropped_lang'))
        .when(~qual_ok, F.lit('dropped_quality'))
        .otherwise(F.lit(None).cast('string')).alias('early')).persist()

    # exact dedup over lang+quality survivors: keep = min doc_id per hash
    surv1 = staged.filter(F.col('early').isNull()) \
        .withColumn('h', F.md5(F.col('text')))
    exact_keep = surv1.groupBy('h').agg(F.min('doc_id').alias('keep_id'))
    surv1 = (surv1.join(exact_keep, 'h')
             .select('doc_id', 'text',
                     (F.col('doc_id') != F.col('keep_id'))
                     .alias('exact_dup'))
             .localCheckpoint(eager=False))

    # near-dup over exact survivors only (LSH sees the smallest set)
    surv2 = surv1.filter(~F.col('exact_dup')).select('doc_id', 'text')
    pairs = lsh_candidate_pairs(
        minhash_signatures(shingles(surv2, n=shingle_n), num_hashes),
        bands=bands).localCheckpoint(eager=False)
    clusters = dedup_keep_list(pairs)
    # a pair member is dropped iff it is not ANY cluster's keep
    # (components assign each member exactly one cluster)
    members = (pairs.select(F.col('doc_a').alias('doc_id'))
               .union(pairs.select(F.col('doc_b').alias('doc_id')))
               .distinct())
    near_drop = members.join(
        clusters.select(F.col('keep_doc_id').alias('doc_id')),
        'doc_id', 'left_anti')

    verdict = (staged.select('doc_id', 'early')
               .join(surv1.select('doc_id', 'exact_dup'), 'doc_id', 'left')
               .join(near_drop.withColumn('near_dup', F.lit(True)),
                     'doc_id', 'left')
               .select(
                   F.col('doc_id').cast('long').alias('doc_id'),
                   F.coalesce(
                       F.col('early'),
                       F.when(F.col('exact_dup'), 'dropped_exact'),
                       F.when(F.col('near_dup'), 'dropped_neardup'),
                       F.lit('kept')).alias('status')))
    return verdict


def incremental_curate(spark, state_path: str, new_docs, batch_id: str,
                       langs=DEFAULT_LANGS, min_quality: float = 0.35,
                       text_col: str = 'text', id_col: str = 'doc_id',
                       lang_col: str = 'lang',
                       num_hashes: int = 16, bands: int = 4,
                       shingle_n: int = 3) -> dict:
    """The daily-crawl shape of curate_corpus: verdict a NEW batch against
    persistent admission state, then publish the updated state.

    State (two catalog tables under ``state_path``, snapshot-versioned):
    - ``hashes``      (doc_id, h): md5 of every ADMITTED doc, bucketed on
      h — the exact-dedup history join is exchange-free on the history
      side, exactly like the LSH index below.
    - ``lsh_index``   (doc_id, band_id, band_hash): admitted docs' bands,
      bucketed on the join key (same layout incremental_lsh_dedup
      publishes — the two operators' indexes are interchangeable).

    Verdict stages (same priority as curate_corpus): lang → quality →
    exact (within-batch keep-min OR any history hash hit) → near-dup
    (within-batch components non-keep OR any history band hit) → kept.
    Only KEPT docs' hashes/bands are appended to the state, so the state
    is exactly "everything admitted so far"; the identity filters
    (n.doc_id != i.doc_id) keep a re-published batch's verdict correct
    while the batch_id fingerprint makes the publish itself a no-op.

    Scale shape: history is never re-hashed, re-banded, or re-shuffled —
    both history joins scan co-located buckets; per-batch cost is
    O(batch) expressions + signatures + O(candidates) verification, flat
    in history size (measured for the shared layout in BENCH/PLANS.md).

    → {'verdict': (doc_id, status), 'hashes': ..., 'index': ...}
    """
    from jionlp_spark.operators.dedup import (dedup_components, lsh_bands,
                                              minhash_signatures, shingles)
    from jionlp_spark.sources import catalog

    hashes_path = f'{state_path}/hashes'
    index_path = f'{state_path}/lsh_index'
    have_state = catalog.read_manifest(hashes_path) is not None

    base = new_docs.select(F.col(id_col).alias('doc_id'),
                           F.col(text_col).alias('text'),
                           F.col(lang_col).alias('lang'))
    lang_ok = F.col('lang').isin(*langs)
    qual_ok = quality_expr('text') >= F.lit(float(min_quality))
    staged = base.select(
        'doc_id', 'text',
        F.when(~lang_ok, F.lit('dropped_lang'))
        .when(~qual_ok, F.lit('dropped_quality'))
        .otherwise(F.lit(None).cast('string')).alias('early')).persist()

    surv1 = staged.filter(F.col('early').isNull()) \
        .withColumn('h', F.md5(F.col('text')))
    keep_h = surv1.groupBy('h').agg(F.min('doc_id').alias('keep_id'))
    surv1 = (surv1.join(keep_h, 'h')
             .select('doc_id', 'text', 'h',
                     (F.col('doc_id') != F.col('keep_id'))
                     .alias('exact_within'))
             .localCheckpoint(eager=False))

    exact_drop = surv1.filter('exact_within').select('doc_id')
    if have_state:
        hist_h = catalog.read_table(spark, hashes_path)
        exact_hist = (surv1.alias('n')
                      .join(hist_h.alias('i'), 'h')
                      .filter(F.col('n.doc_id') != F.col('i.doc_id'))
                      .select(F.col('n.doc_id').alias('doc_id')))
        exact_drop = exact_drop.union(exact_hist)
    exact_drop = exact_drop.distinct().localCheckpoint(eager=False)

    surv2 = surv1.join(exact_drop, 'doc_id', 'left_anti') \
        .select('doc_id', 'text')
    bands_new = lsh_bands(
        minhash_signatures(shingles(surv2, n=shingle_n), num_hashes),
        bands=bands).localCheckpoint(eager=False)

    within = (bands_new.alias('a')
              .join(bands_new.alias('b'), ['band_id', 'band_hash'])
              .filter(F.col('a.doc_id') < F.col('b.doc_id'))
              .select(F.col('a.doc_id').alias('doc_a'),
                      F.col('b.doc_id').alias('doc_b'))
              .distinct())
    comp = dedup_components(within)
    near_drop = (comp.filter(F.col('doc_id') != F.col('cluster'))
                 .select('doc_id'))
    if have_state:
        idx = catalog.read_table(spark, index_path)
        near_hist = (bands_new.alias('n')
                     .join(idx.alias('i'), ['band_id', 'band_hash'])
                     .filter(F.col('n.doc_id') != F.col('i.doc_id'))
                     .select(F.col('n.doc_id').alias('doc_id')))
        near_drop = near_drop.union(near_hist)
    near_drop = near_drop.distinct().localCheckpoint(eager=False)

    verdict = (staged.select('doc_id', 'early')
               .join(exact_drop.withColumn('_ex', F.lit(True)),
                     'doc_id', 'left')
               .join(near_drop.withColumn('_nd', F.lit(True)),
                     'doc_id', 'left')
               .select(
                   F.col('doc_id').cast('long').alias('doc_id'),
                   F.coalesce(
                       F.col('early'),
                       F.when(F.col('_ex'), 'dropped_exact'),
                       F.when(F.col('_nd'), 'dropped_neardup'),
                       F.lit('kept')).alias('status'))
               .localCheckpoint())   # before the publishes retire files

    kept = verdict.filter("status = 'kept'").select('doc_id')
    new_h = surv1.join(kept, 'doc_id').select('doc_id', 'h')
    new_b = bands_new.join(kept, 'doc_id')
    upd_h = hist_h.union(new_h) if have_state else new_h
    upd_b = idx.union(new_b) if have_state else new_b
    hashes = catalog.run_stage(spark, hashes_path, 'curate_hashes',
                               lambda: upd_h,
                               input_fingerprint=batch_id,
                               bucket_by=('h',))
    index = catalog.run_stage(spark, index_path, 'lsh_index',
                              lambda: upd_b,
                              input_fingerprint=batch_id,
                              bucket_by=('band_id', 'band_hash'))
    staged.unpersist()
    return {'verdict': verdict, 'hashes': hashes, 'index': index}


def training_mix_sample(docs: DataFrame, quotas: dict,
                        id_col: str = 'doc_id',
                        lang_col: str = 'lang') -> DataFrame:
    """Deterministic per-language training-mix sampling: exactly
    ``min(quota, available)`` docs per language, chosen by md5(doc_id)
    order → (doc_id, lang, rk).

    Training mixes are specified as per-domain/per-language doc budgets;
    the sample must be reproducible run-to-run and machine-to-machine
    (hash order, not RNG), and adding docs to the corpus must not evict
    already-chosen docs unless they hash earlier — both properties of
    hash-ordered top-K.

    Scale shape: a naive `row_number over (partition by lang)` funnels
    EVERY row of a language through one reducer — at 100 TB a single
    'en' reducer sees most of the corpus.  Instead: exact two-phase
    top-K.  Phase 1 takes the per-(lang, input-partition) local top-K
    (any partitioning works — a local top-K always contains the global
    top-K members in that partition), bounding phase 2's global
    per-lang window to ≤ quota × n_partitions candidate rows.  The
    quota table is broadcast.
    """
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    qdf = F.broadcast(spark.createDataFrame(
        [(str(k), int(v)) for k, v in quotas.items()],
        'lang string, quota long'))

    d = (docs.select(F.col(id_col).alias('doc_id'),
                     F.col(lang_col).alias('lang'),
                     F.md5(F.col(id_col).cast('string')).alias('hk'))
         .join(qdf, 'lang')
         .withColumn('pid', F.spark_partition_id()))

    local = Window.partitionBy('lang', 'pid').orderBy('hk', 'doc_id')
    cand = (d.withColumn('lrk', F.row_number().over(local))
            .filter(F.col('lrk') <= F.col('quota')))

    final = Window.partitionBy('lang').orderBy('hk', 'doc_id')
    return (cand.withColumn('rk', F.row_number().over(final))
            .filter(F.col('rk') <= F.col('quota'))
            .select('doc_id', 'lang', F.col('rk').cast('long').alias('rk')))


def mixing_weights(docs: DataFrame, alpha: float = 0.5,
                   target_tokens: int = 1_000_000, max_epochs: float = 4.0,
                   source_col: str = 'source',
                   text_col: str = 'text') -> DataFrame:
    """→ (source, n_docs, n_tokens, weight, budget_tokens, epochs,
    capped) — temperature-based source mixing: the step that DECIDES a
    training mix before ``training_mix_sample`` materializes it.

    Sampling proportional to raw size lets one giant crawl source
    drown curated sources; uniform sampling over-trains tiny ones.
    The standard compromise (multilingual BERT's exponent-smoothed
    sampling, XLM-R §3, Gopher's mixing tables) samples source i with
    ``p_i = c_i^alpha / sum_j c_j^alpha`` for token counts ``c_i`` and
    a temperature ``alpha`` in [0, 1] (1 = proportional, 0 = uniform).
    ``budget_tokens_i = p_i * target_tokens``; ``epochs_i =
    budget_i / c_i`` is how many passes over source i the budget
    implies, capped at ``max_epochs`` (repeating data beyond ~4 epochs
    stops buying loss — Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models"), with ``capped`` flagging
    sources whose demanded repetition exceeded the cap.

    Scale shape: ONE map-side-combinable aggregation over the corpus to
    the sources-grain table (tens of rows at any corpus size); the
    normalization constant is a cross-row sum over sources, reduced as
    exact ``decimal(38,18)`` via string (cross-row double sums are
    order-sensitive; the decimal route is the repo's engine-parity
    rule) and re-emitted as the shortest-round-trip double.  Everything
    downstream is one per-row double tree over engine-identical inputs.
    alpha enters as ``pow(c, <repr>)`` in both engines.
    """
    per = (docs.groupBy(F.col(source_col).alias('source'))
           .agg(F.count('*').cast('long').alias('n_docs'),
                F.sum(F.size(F.split(F.col(text_col), ' '))
                      .cast('long')).cast('long').alias('n_tokens')))
    term = F.pow(F.col('n_tokens').cast('double'), F.lit(float(alpha)))
    per = per.withColumn('term', term)
    denom = (per.agg(
        F.sum(F.col('term').cast('string').cast('decimal(38,18)'))
        .cast('string').cast('double').alias('denom')))
    out = (per.join(F.broadcast(denom))
           .withColumn('weight', F.col('term') / F.col('denom'))
           .withColumn('budget_tokens',
                       F.col('weight') * F.lit(float(target_tokens)))
           .withColumn('epochs_raw',
                       F.col('budget_tokens')
                       / F.col('n_tokens').cast('double')))
    return (out.select(
        'source', 'n_docs', 'n_tokens', 'weight', 'budget_tokens',
        F.least(F.col('epochs_raw'), F.lit(float(max_epochs)))
        .alias('epochs'),
        (F.col('epochs_raw') > F.lit(float(max_epochs))).alias('capped')))


def epoch_expand(docs: DataFrame, mix: DataFrame,
                 source_col: str = 'source', id_col: str = 'doc_id',
                 seed: str = 'ep') -> DataFrame:
    """→ (doc_id, source, epoch) — materialize a fractional-epoch mix:
    one output row per (doc, repetition).

    ``mixing_weights`` decides "2.6 epochs of source X"; a training
    run needs actual rows.  Every doc of a source with ``epochs = f``
    appears ``floor(f)`` times, and a deterministic ``f - floor(f)``
    fraction of the source's docs appears once more — chosen by
    ``u(doc) < frac`` with u the md5-nibble uniform of (seed, id), so
    the extra-copy subset is reproducible, independent across seeds,
    and every doc's inclusion is decided locally (no sampling shuffle;
    expected total tokens = the source budget).  Repeating data this
    way (full passes + a partial pass) is how data-constrained
    training schedules realize non-integer epoch counts (Muennighoff
    et al. 2023).

    Scale shape: ONE broadcast join of the sources-grain mix table +
    a per-row ``explode(sequence)`` — zero shuffles; output size is
    Σ_i ceil-ish(f_i)·|source_i| rows, the training set itself.
    ``epoch`` is 0-based; downstream ``training_shards`` can key on
    (doc_id, epoch) to spread copies across shards.
    """
    m = F.broadcast(mix.select(F.col('source').alias('source'),
                               F.col('epochs').alias('epochs')))
    h = F.md5(F.concat(F.lit(f'{seed}:'),
                       F.col(id_col).cast('string')))
    u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast('double')
          + F.lit(0.5)) / F.lit(4294967296.0))
    n_full = F.floor(F.col('epochs')).cast('int')
    frac = F.col('epochs') - F.floor(F.col('epochs'))
    n_copies = n_full + F.when(u < frac, F.lit(1)).otherwise(F.lit(0))
    return (docs.select(F.col(id_col).alias('doc_id'),
                        F.col(source_col).alias('source'))
            .join(m, 'source')
            .withColumn('n_copies', n_copies)
            .filter(F.col('n_copies') >= 1)
            .select('doc_id', 'source',
                    F.explode(F.sequence(
                        F.lit(0), F.col('n_copies') - 1)).alias('e'))
            .select('doc_id', 'source',
                    F.col('e').cast('long').alias('epoch')))


def cluster_mix_sample(assigned: DataFrame, quota: int,
                       id_col: str = 'vec_id',
                       bucket_col: str = 'bucket') -> DataFrame:
    """→ (vec_id, bucket, rk) — cluster-balanced selection: exactly
    ``min(quota, |cluster|)`` items per embedding cluster, chosen by
    md5(id) order.

    Proportional sampling reproduces the corpus's semantic skew (a
    crawl is mostly its few giant topic clusters); per-CLUSTER quotas
    flatten it — the diversity-preserving selection move cluster-based
    pipelines run after SemDeDup's per-cluster dedup (both consume the
    same k-means assignment, e.g. Abbas et al. 2023 §3; Tirumala et
    al. 2023's D4 pairs exactly this with its dedup).  Input is an
    assignment table (``ann.ivf_assign`` / ``query_ann_index`` output
    — train centroids once, reuse for dedup AND selection).

    Deterministic (hash order, not RNG) and scale-shaped like
    ``training_mix_sample``: exact two-phase top-K — per-(cluster,
    input-partition) local cut first, so the global per-cluster window
    sees ≤ quota × n_partitions rows, never a giant cluster's full
    membership through one reducer.
    """
    from pyspark.sql.window import Window

    d = (assigned.select(F.col(id_col).alias('vec_id'),
                         F.col(bucket_col).alias('bucket'),
                         F.md5(F.col(id_col).cast('string')).alias('hk'))
         .withColumn('pid', F.spark_partition_id()))
    local = Window.partitionBy('bucket', 'pid').orderBy('hk', 'vec_id')
    cand = (d.withColumn('lrk', F.row_number().over(local))
            .filter(F.col('lrk') <= quota))
    final = Window.partitionBy('bucket').orderBy('hk', 'vec_id')
    return (cand.withColumn('rk', F.row_number().over(final))
            .filter(F.col('rk') <= quota)
            .select('vec_id', F.col('bucket').cast('long').alias('bucket'),
                    F.col('rk').cast('long').alias('rk')))


def weighted_sample(items: DataFrame, k: int, logweight_col: str,
                    id_col: str = 'doc_id',
                    seed: str = 'ws') -> DataFrame:
    """→ (doc_id, gumbel_key, rk) — DETERMINISTIC weighted sampling
    without replacement: the top-``k`` rows by Gumbel-perturbed log
    weight, which is distributed exactly as sequential sampling with
    probability ∝ exp(logweight) without replacement (the Gumbel
    top-k trick — Vieira 2014; equivalently Efraimidis & Spirakis
    2006 with keys on the log scale).  This is the materialization
    step importance-weighting schemes pair with their scores — DSIR
    (Xie et al. 2023) resamples its pool exactly this way — and the
    weighted complement of ``training_mix_sample``'s per-group
    quotas.

    Determinism: the Gumbel noise ``-ln(-ln(u))`` uses
    ``u = (first-8-md5-hex-nibbles-of(seed:id) + 0.5) / 2^32`` — a
    pure function of (seed, id), so the sample is reproducible
    run-to-run and machine-to-machine and re-draws per epoch by seed
    (``orderBy(rand())`` is neither); u > 0 by the +0.5 so ln never
    sees zero; u is an exact dyadic double, so both engines perturb
    bit-identical inputs.

    Scale shape: a global ``row_number`` funnels the corpus through
    ONE reducer — instead, exact two-phase top-K (the
    ``training_mix_sample`` pattern): per-input-partition local top-K
    first, so the final unpartitioned window sees ≤ k × n_partitions
    candidate rows, never the corpus.  Ties break by id for a total
    order.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f'{seed}:'),
                       F.col(id_col).cast('string')))
    u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast('double')
          + F.lit(0.5)) / F.lit(4294967296.0))
    key = F.col(logweight_col) + (-F.log(-F.log(u)))

    d = (items.select(F.col(id_col).alias('doc_id'),
                      key.alias('gumbel_key'))
         .withColumn('pid', F.spark_partition_id()))
    local = Window.partitionBy('pid').orderBy(F.desc('gumbel_key'),
                                              'doc_id')
    cand = (d.withColumn('lrk', F.row_number().over(local))
            .filter(F.col('lrk') <= k))
    final = Window.orderBy(F.desc('gumbel_key'), 'doc_id')
    return (cand.withColumn('rk', F.row_number().over(final))
            .filter(F.col('rk') <= k)
            .select('doc_id', 'gumbel_key',
                    F.col('rk').cast('long').alias('rk')))


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    text_col: str = 'text') -> DataFrame:
    """→ (doc_id, n_grams, dsir_logweight) — Data Selection with
    Importance Resampling (Xie et al., NeurIPS 2023) log-importance
    weights for every raw-pool document.

    DSIR scores a crawl document by how target-like its hashed-n-gram
    distribution is: unigrams + bigrams hash into 256 buckets (first two
    hex chars of md5 — a string bucket key both engines derive
    identically), bucket unigram models with add-one smoothing are
    fitted on the TARGET set and the RAW pool, and

        logweight(doc) = Σ_grams  ln p_target(b(g)) − ln p_raw(b(g))

    Resampling docs ∝ exp(logweight) shifts the pool toward the target
    distribution; deterministic top-K by weight is the greedy variant
    (compose with training_mix_sample for quota-constrained selection).

    Engine parity: bucket counts are exact bigints; each bucket's
    log-ratio is ONE per-row double tree (int sums cast to double once
    per division); the per-doc reduction routes through
    ``decimal(38,18)`` via string (cross-row double sums are
    order-sensitive) and re-emerges as double via string.

    Scale shape: the two models are 256-row tables built by
    map-side-combined gram counts (one scan each over raw/target); the
    scoring pass explodes grams and BROADCAST-joins the 256-row model,
    and its ``groupBy(doc_id)`` partial-aggregates within the generating
    partition — every gram of a doc lives where the doc row was, so the
    exchange carries ~one partial row per document, not per gram.
    Nothing is collected to the driver.
    """
    def grams(df: DataFrame) -> DataFrame:
        d = df.select('doc_id', F.split(F.col(text_col), ' ').alias('w'))
        # sequence(1, 0) is DESCENDING in Spark — guard 1-token docs
        bi = F.when(F.size('w') > 1, F.expr(
            "transform(sequence(1, size(w)-1),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i+1)))")) \
            .otherwise(F.expr("array()"))
        return d.select(
            'doc_id',
            F.explode(F.concat(F.col('w'), bi)).alias('g'))

    raw_b = grams(raw).select(
        'doc_id', F.substring(F.md5('g'), 1, 2).alias('b'))
    tgt_b = grams(target).select(F.substring(F.md5('g'), 1, 2).alias('b'))

    # the ≤256-row model tables are checkpointed (one eager corpus pass
    # each) and totals roll up from them as exact bigint sums: a lazy
    # model would re-derive the corpus explode per consumer — model join
    # + each scalar total is its own subtree (first cut: 5 scans / 10
    # exchanges → 1 live scan / 2 model-build passes)
    tm = tgt_b.groupBy('b').agg(F.count('*').cast('long').alias('ct')) \
        .localCheckpoint(eager=False)
    tt = tm.agg(F.sum('ct').cast('long').alias('tt'))
    rm = raw_b.groupBy('b').agg(F.count('*').cast('long').alias('cr')) \
        .localCheckpoint(eager=False)
    rt = rm.agg(F.sum('cr').cast('long').alias('rt'))

    model = (rm.join(tm, 'b', 'left')
             .crossJoin(F.broadcast(tt)).crossJoin(F.broadcast(rt))
             .select('b', (
                 F.log((F.coalesce(F.col('ct'), F.lit(0)) + F.lit(1))
                       .cast('double')
                       / (F.col('tt') + F.lit(256)).cast('double'))
                 - F.log((F.col('cr') + F.lit(1)).cast('double')
                         / (F.col('rt') + F.lit(256)).cast('double'))
             ).alias('lnr')))

    return (raw_b.join(F.broadcast(model), 'b')
            .groupBy('doc_id')
            .agg(F.count('*').cast('long').alias('n_grams'),
                 F.sum(F.col('lnr').cast('string').cast('decimal(38,18)'))
                 .cast('string').cast('double').alias('dsir_logweight')))


def pack_plan(docs: DataFrame, max_len: int = 1024, n_shards: int = 16,
              text_col: str = 'text') -> DataFrame:
    """→ (doc_id, shard, start_off, pack_first, pack_last) — the
    concat-and-chunk sequence-packing plan (GPT-style LM training data
    layout): within each shard, docs are concatenated in a
    deterministic hash order and cut into ``max_len``-token windows; a
    doc starting at token offset ``start_off`` occupies packs
    ``start_off div max_len`` through ``(start_off+len-1) div max_len``
    (docs straddle pack boundaries — the standard causal-LM packing).

    Determinism and engine parity: shard = first md5 hex char of the
    doc id (16-way), order within a shard = (md5 hex, doc_id) — string
    ordering both engines share; offsets are cumulative bigint sums in
    that order.  Everything is integer — zero float surface.

    Scale shape: ONE shuffle into shards, then a per-shard window (the
    cumulative offset is inherently sequential WITHIN a shard — that is
    the packing contract; shards are the parallelism unit, so size
    n_shards to the cluster, e.g. one shard per output file).  No
    global sort ever happens.
    """
    d = docs.select(
        'doc_id',
        F.size(F.split(F.col(text_col), ' ')).cast('long').alias('len'),
        F.md5(F.col('doc_id').cast('string')).alias('h'))
    d = d.withColumn('shard', F.substring('h', 1, 1))
    from pyspark.sql import Window
    w = (Window.partitionBy('shard').orderBy('h', 'doc_id')
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = d.withColumn('cum', F.sum('len').over(w).cast('long'))
    return cum.select(
        'doc_id', 'shard',
        (F.col('cum') - F.col('len')).cast('long').alias('start_off'),
        F.expr(f'(cum - len) div {max_len}').cast('long')
        .alias('pack_first'),
        F.expr(f'(cum - 1) div {max_len}').cast('long')
        .alias('pack_last'))


def pack_plan_bfd(docs: DataFrame, max_len: int = 1024,
                  text_col: str = 'text') -> DataFrame:
    """→ (doc_id, shard, pack_id, pack_off, oversize) — the NON-SPLITTING
    best-fit-decreasing packing plan, the other standard LM layout next
    to :func:`pack_plan`'s concat-and-chunk: no document straddles a
    pack boundary (no cross-doc attention contamination and no mid-doc
    truncation), at the cost of per-pack slack.  Within each shard, docs
    are sorted by (len DESC, md5 hex, doc_id) and greedily placed into
    the OPEN pack with the smallest remaining capacity that still fits
    (classic BFD, ≤ 11/9·OPT + 4 packs); no fit opens a new pack.  Docs
    longer than ``max_len`` never fit anything and nothing ever fits
    their pack, so they come out as flagged solo packs (``oversize``)
    with no special-casing — downstream chooses truncate/split policy.

    Determinism and engine parity: lens are bigint token counts, the
    sort key and the tie rule (best load, then LOWEST pack id) are
    total orders both engines share, so the whole plan is
    integer-deterministic; the oracle replays the same greedy as a
    DuckDB recursive CTE carrying the per-shard open-pack loads as a
    LIST(BIGINT).

    Scale shape: ONE shuffle into 16 md5 shards, then a per-shard
    greedy in applyInPandas — BFD is inherently sequential WITHIN a
    pack stream (same contract as pack_plan's cumulative sum); shards
    are the parallelism unit (a production run shards finer — the
    shard key is one md5 substring away from 256/4096-way).  The
    greedy is O(docs·log open_packs) per shard via a sorted-loads
    index (open packs grow ∝ shard tokens — with max_len fixed, most
    packs stay open forever since later, smaller docs still fit; a
    naive all-bins scan is quadratic per shard, caught at the 100×
    bench point).
    """
    import pandas as pd

    d = docs.select(
        'doc_id',
        F.size(F.split(F.col(text_col), ' ')).cast('long').alias('len'),
        F.md5(F.col('doc_id').cast('string')).alias('h'))
    d = d.withColumn('shard', F.substring('h', 1, 1))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # O(docs·log bins) best-fit: loads kept in a bisectable sorted
        # list, each load mapping to a min-heap of bin ids — "largest
        # load that fits, lowest bin id on load ties", identical to
        # the naive scan (the scale bench caught the O(docs·bins)
        # linear scan going quadratic per shard at 100×: most bins
        # stay open forever because later, SMALLER docs still fit).
        import bisect
        import heapq

        pdf = pdf.sort_values(
            ['len', 'h', 'doc_id'], ascending=[False, True, True])
        n_bins = 0
        loads: list[int] = []            # sorted distinct load values
        by_load: dict = {}               # load -> min-heap of bin ids
        bin_load: list[int] = []         # bin id -> current load
        pack_id, pack_off = [], []

        def _take(load):
            heap = by_load[load]
            b = heapq.heappop(heap)
            if not heap:
                del by_load[load]
                loads.pop(bisect.bisect_left(loads, load))
            return b

        def _put(load, b):
            if load not in by_load:
                by_load[load] = []
                bisect.insort(loads, load)
            heapq.heappush(by_load[load], b)

        for ln in pdf['len']:
            ln = int(ln)
            pos = bisect.bisect_right(loads, max_len - ln) - 1
            if pos < 0:
                pack_id.append(n_bins)
                pack_off.append(0)
                bin_load.append(ln)
                _put(ln, n_bins)
                n_bins += 1
            else:
                load = loads[pos]
                b = _take(load)
                pack_id.append(b)
                pack_off.append(load)
                bin_load[b] = load + ln
                _put(load + ln, b)
        pdf = pdf.assign(pack_id=pack_id, pack_off=pack_off,
                         oversize=pdf['len'] > max_len)
        return pdf[['doc_id', 'shard', 'pack_id', 'pack_off',
                    'oversize']]

    return d.groupBy('shard').applyInPandas(
        pack, 'doc_id long, shard string, pack_id long, pack_off long, '
              'oversize boolean')


def leakage_safe_split(docs: DataFrame, pairs: DataFrame,
                       id_col: str = 'doc_id',
                       a_col: str = 'doc_a', b_col: str = 'doc_b',
                       ratios=(80, 85), max_iter: int = 20) -> DataFrame:
    """→ (doc_id, group_id, split) — deterministic train/valid/test
    assignment with the LEAKAGE guarantee: near-dup candidate pairs
    (LSH/simhash/winnow/embedding — any pair table) are collapsed into
    connected components, the component (min member id) is the
    assignment UNIT, and the split is the Knuth-multiplicative hash of
    the GROUP id — so two docs a benchmark-style eval would treat as
    the same content can never land one in train and one in test (the
    dominant contamination path a doc-id hash split leaves open).
    Unpaired docs are their own group (group_id = doc_id), which makes
    the rule a strict refinement of dataset_split_stats' doc-id split.

    Scale shape: components run over the pair graph only; the corpus
    cost is ONE left join of ids against the (dup-sized) label table
    plus a per-row hash projection — no corpus shuffle beyond the join,
    and the same 31-bit mask keeps both engines' bigint products from
    wrapping (see dataset_split_stats).
    """
    from jionlp_spark.operators.dedup import dedup_components
    comp = dedup_components(pairs, a_col, b_col, max_iter=max_iter)
    ids = docs.select(F.col(id_col).alias('doc_id'))
    labeled = (ids.join(comp, 'doc_id', 'left')
               .select('doc_id',
                       F.coalesce('cluster', F.col('doc_id'))
                       .cast('long').alias('group_id')))
    bucket = F.pmod(F.pmod(F.col('group_id'), F.lit(2147483648))
                    * F.lit(2654435761), F.lit(100))
    split = (F.when(bucket < int(ratios[0]), 'train')
             .when(bucket < int(ratios[1]), 'valid')
             .otherwise('test'))
    return labeled.select('doc_id', 'group_id', split.alias('split'))


def host_curation(docs: DataFrame, min_avg_quality: str = '0.55',
                  max_dup_pct: int = 20, url_col: str = 'url',
                  text_col: str = 'text',
                  id_col: str = 'doc_id') -> DataFrame:
    """Per-host (domain-level) curation verdicts — the RefinedWeb-style
    step that blocks whole domains instead of re-judging every page:
    (host, n_docs, n_dups, sum_quality, verdict).

    n_dups = pages that are exact copies of an earlier page ANYWHERE in
    the corpus (global md5 keep-min — mirror hosts get charged for
    copying, the original host doesn't); sum_quality = decimal-exact
    sum of the per-row quality composite.  Verdicts use exact
    arithmetic only: quality blocks when sum_quality <
    min_avg_quality·n_docs (decimal × bigint — no float average), dups
    block when n_dups·100 > max_dup_pct·n_docs (integer cross-multiply
    — no float ratio), quality judged first.  Two corpus-sized
    shuffles (hash groupBy, host groupBy), both map-side combined."""
    host = F.split(F.element_at(F.split(F.col(url_col), '://'), 2),
                   '/')[0]
    hashed = docs.select(
        id_col, F.md5(F.col(text_col)).alias('_h'),
        host.alias('host'),
        quality_expr(text_col).cast('string').cast('decimal(38,18)')
        .alias('_q'))
    # keep-min via a hash-keyed window, not a groupBy + join back —
    # the join re-derived the corpus-sized hashed subtree per consumer
    # (audited 8 scans / 14 exchanges → 2 scans / 2 exchanges)
    from pyspark.sql.window import Window
    wk = Window.partitionBy('_h')
    flagged = hashed.withColumn(
        '_dup', (F.col(id_col) != F.min(id_col).over(wk)).cast('long'))
    per_host = (flagged.groupBy('host')
                .agg(F.count('*').cast('long').alias('n_docs'),
                     F.sum('_dup').alias('n_dups'),
                     F.sum('_q').cast('decimal(38,18)')
                     .alias('_sum_q')))
    # decimal(10,6) × decimal(10,0) → decimal(21,6): exact, no overflow
    # (a 38,18 product would exceed precision 38 and round)
    thresh = F.lit(min_avg_quality).cast('decimal(10,6)')
    verdict = (
        F.when(F.col('_sum_q') <
               thresh * F.col('n_docs').cast('decimal(10,0)'),
               F.lit('blocked_quality'))
        .when(F.col('n_dups') * 100 > max_dup_pct * F.col('n_docs'),
              F.lit('blocked_dup'))
        .otherwise(F.lit('kept')))
    return per_host.select(
        'host', 'n_docs', 'n_dups',
        F.col('_sum_q').cast('string').cast('double')
        .alias('sum_quality'),
        verdict.alias('verdict'))


def training_shards(docs: DataFrame, n_shards: int = 16,
                    seed: str = '', id_col: str = 'doc_id') -> DataFrame:
    """Deterministic global training shuffle → (shard, pos, doc_id):
    every doc lands in a pseudorandom shard with a pseudorandom
    position, reproducible run-to-run and machine-to-machine — the
    pre-training data-ordering step (training quality is sensitive to
    data order; the shuffle must be REPRODUCIBLE for restarts and
    ablations, which ``orderBy(rand())`` is not, and seeded so epochs
    can reshuffle by changing ``seed``).

    shard = the first FOUR md5 hex nibbles of (seed ':' doc_id) read
    as an integer (0..65535) mod ``n_shards`` — balanced in
    expectation; pos = row_number within the shard ordered by (md5
    hex, doc_id), a string order both engines share.  Reading shards
    round-robin reproduces one global pseudorandom permutation.

    Scale shape: the naive global shuffle is ``orderBy(rand())`` — a
    full sort AND nondeterministic.  Here: ONE exchange on shard, then
    per-shard windows (shards are the parallelism unit — size
    n_shards ≥ cluster cores, e.g. one shard per output file, and
    compose with pack_plan per shard).  No global sort ever happens,
    nothing is ever single-reducer.  Everything is integer/string —
    zero float surface, exact engine parity (the pack_plan nibble
    rule)."""
    if not 1 <= int(n_shards) <= 65536:
        raise ValueError('n_shards must be in [1, 65536]')
    from pyspark.sql.window import Window
    h = F.md5(F.concat(F.lit(str(seed)), F.lit(':'),
                       F.col(id_col).cast('string')))
    d = docs.select(F.col(id_col).alias('doc_id'), h.alias('_h'))
    nib = [F.expr(f"instr('0123456789abcdef', substring(_h, {i}, 1)) - 1")
           for i in (1, 2, 3, 4)]
    v = nib[0] * 4096 + nib[1] * 256 + nib[2] * 16 + nib[3]
    d = d.withColumn('shard', (v % int(n_shards)).cast('long'))
    w = Window.partitionBy('shard').orderBy('_h', 'doc_id')
    return (d.withColumn('pos', (F.row_number().over(w) - 1)
                         .cast('long'))
            .select('shard', 'pos', 'doc_id'))


def shard_manifest(docs: DataFrame, shards: DataFrame,
                   text_col: str = 'text', source_col: str = 'source',
                   id_col: str = 'doc_id') -> DataFrame:
    """→ (shard, n_docs, n_tokens, n_chars, n_sources, pos_max,
    checksum) — the per-shard DATACARD + integrity manifest over a
    ``training_shards`` assignment: how many docs/tokens/chars each
    training shard carries, how many distinct sources feed it, the max
    position (``pos_max == n_docs - 1`` is the contiguity invariant a
    verifier checks), and an order-independent content checksum —
    ``sum(w32(md5('man|' doc_id)))`` as an exact bigint — so a shard
    file can be re-verified after transfer or republish without
    re-reading the corpus that produced it.

    This is the manifest a training job reads before consuming a
    shard (token budget per shard → step accounting; source mix →
    datacard reporting) and the artifact a catalog publish pins next
    to the shard files.

    Engine parity: everything is exact integers — token counts are the
    whitespace rule (``size(split(text, ' '))``), the checksum folds
    md5 hex nibbles positionally (the HLL w32 rule), sums stay bigint.
    Zero float surface.

    Scale shape: ONE join of the assignment with the corpus on the doc
    id (both sides corpus-sized — the honest composition cost; a
    caller holding docs WITH their shard column skips it), then ONE
    map-side-combined groupBy at the shard grain — output is
    n_shards rows.  The distinct-source count is a two-phase agg at
    the same grain.  Zero Python.
    """
    from jionlp_spark.operators.sketches import hll_w32_sql

    d = docs.select(
        F.col(id_col).alias('doc_id'),
        F.size(F.split(F.col(text_col), ' ')).cast('long').alias('_tok'),
        F.length(text_col).cast('long').alias('_chr'),
        F.col(source_col).alias('_src'),
        F.md5(F.concat(F.lit('man|'), F.col(id_col).cast('string')))
        .alias('_mh'))
    d = d.withColumn('_w32', F.expr(hll_w32_sql('_mh')))
    j = shards.select('shard', 'pos', 'doc_id').join(d, 'doc_id')
    return (j.groupBy('shard')
            .agg(F.count('*').cast('long').alias('n_docs'),
                 F.sum('_tok').cast('long').alias('n_tokens'),
                 F.sum('_chr').cast('long').alias('n_chars'),
                 F.countDistinct('_src').cast('long').alias('n_sources'),
                 F.max('pos').cast('long').alias('pos_max'),
                 F.sum('_w32').cast('long').alias('checksum')))
