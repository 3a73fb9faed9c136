"""BM25 text retrieval over a document table.

The classic sparse-retrieval scorer (Robertson & Zaragoza 2009; the
Lucene idf variant) as a pure DataFrame pipeline: one token explode →
(doc, term) tf table, document-frequency and corpus scalars as
broadcast aggregates, scoring restricted to the query's terms BEFORE
any corpus-sized join (the inverted-index access pattern — at 100 TB
only the posting lists of the query terms are touched after the tf
shuffle), and a per-query window top-k.

Engine-exactness: every score input (tf, df, doclen, N, total_len) is
an exact bigint; the score is one per-row double tree written
identically in the DuckDB oracle (identical trees are bit-identical),
and the per-term parts are summed as decimals via the string route
(cross-row double addition is order-sensitive; decimal is exact and
order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BM25 per-(doc, term) part — identical tree in the DuckDB oracle.
# Lucene idf: ln(1 + (N - df + 0.5)/(df + 0.5)); k1=1.2, b=0.75.
_BM25_PART = (
    'round('
    'ln(1.0 + ((cast({N} as double) - cast(df as double)) + 0.5)'
    ' / (cast(df as double) + 0.5))'
    ' * ((cast(tf as double) * 2.2)'
    ' / (cast(tf as double) + 1.2 * ((1.0 - 0.75) + 0.75'
    ' * ((cast(doclen as double) * cast({N} as double))'
    ' / cast({total_len} as double))))), 6)')


def term_frequencies(docs: DataFrame, text_col: str = 'text',
                     id_col: str = 'doc_id') -> DataFrame:
    """(doc_id, token, tf, doclen) — the posting-list table.  One
    explode + one (doc, token)-keyed shuffle with map-side combine;
    doclen rides along (constant per doc, max() is exact)."""
    toks = F.split(F.col(text_col), ' ')
    return (docs
            .select(id_col, F.size(toks).cast('long').alias('doclen'),
                    F.explode(toks).alias('token'))
            .groupBy(id_col, 'token')
            .agg(F.count('*').cast('long').alias('tf'),
                 F.max('doclen').alias('doclen')))


def query_terms_from_docs(docs: DataFrame, n_queries: int = 3,
                          n_terms: int = 4, text_col: str = 'text',
                          id_col: str = 'doc_id') -> DataFrame:
    """More-like-this query construction: for each query doc (id <
    n_queries), its first ``n_terms`` DISTINCT tokens in first-occurrence
    order — deterministic and replayable in SQL (min(pos) per token,
    ties impossible)."""
    from pyspark.sql.window import Window
    toks = F.split(F.col(text_col), ' ')
    first = (docs.filter(F.col(id_col) < n_queries)
             .select(F.col(id_col).alias('qid'),
                     F.posexplode(toks).alias('pos', 'token'))
             .groupBy('qid', 'token')
             .agg(F.min('pos').alias('fp')))
    w = Window.partitionBy('qid').orderBy('fp', 'token')
    return (first.withColumn('_rn', F.row_number().over(w))
            .filter(F.col('_rn') <= n_terms).select('qid', 'token'))


def bm25_topk(docs: DataFrame, queries: DataFrame | None = None,
              n_queries: int = 3, n_terms: int = 4, k: int = 10,
              text_col: str = 'text', id_col: str = 'doc_id') -> DataFrame:
    """BM25 top-k: (qid, doc_id, score), score desc / doc_id tiebreak,
    the query's own document excluded.

    Plan shape: tf shuffle (corpus-sized, map-side combined) → df
    computed ONLY for the query terms (broadcast semi-restriction: the
    query-term table is tiny, so df comes from the tf table filtered by
    a broadcast join — the inverted-index read) → per-row score tree →
    decimal-exact per-(qid, doc) sum → window top-k.  Nothing
    corpus-sized crosses a second shuffle except the matched posting
    rows."""
    from pyspark.sql.window import Window
    if queries is None:
        queries = query_terms_from_docs(docs, n_queries, n_terms,
                                        text_col, id_col)
    # every small intermediate feeds ≥2 consumers — plans are trees, so
    # lazy reuse re-derives the corpus subtree per consumer (audited
    # 12 scans / 28 exchanges); checkpointing the query-term table
    # (q·terms rows), the 1-row scalars, and the MATCHED posting lists
    # (query-term-bounded, never corpus-bounded) collapses the plan to
    # the three eager build passes + tiny downstream joins
    queries = queries.localCheckpoint(eager=False)
    tf = term_frequencies(docs, text_col, id_col)
    scalars = docs.select(
        F.count('*').cast('long').alias('n_docs'),
        F.sum(F.size(F.split(F.col(text_col), ' ')).cast('long'))
        .alias('total_len')).localCheckpoint(eager=False)
    # posting lists of query terms only — broadcast the tiny term list
    posts = tf.join(F.broadcast(queries.select('token').distinct()),
                    'token').localCheckpoint(eager=False)
    df_tbl = (posts.groupBy('token')
              .agg(F.count('*').cast('long').alias('df')))
    part = _BM25_PART.format(N='n_docs', total_len='total_len')
    parts = (posts.join(F.broadcast(queries), 'token')
             .filter(F.col('qid') != F.col(id_col))
             .join(F.broadcast(df_tbl), 'token')
             .crossJoin(F.broadcast(scalars))
             .select('qid', id_col, F.expr(part).alias('part')))
    scored = (parts.groupBy('qid', id_col)
              .agg(F.sum(F.col('part').cast('string')
                         .cast('decimal(38,18)'))
                   .cast('string').cast('double').alias('score')))
    w = Window.partitionBy('qid').orderBy(F.desc('score'), F.col(id_col))
    return (scored.withColumn('_rn', F.row_number().over(w))
            .filter(F.col('_rn') <= k).drop('_rn'))


# ---------------------------------------------------------------------------
# persistent inverted index through the catalog — the serving-side
# counterpart of publish_ann_index: tokenize/aggregate the corpus once,
# publish the posting lists BUCKETED on token, then every query batch
# reads only the matched postings with no exchange on the index side.

def publish_text_index(spark, base_path: str, docs: DataFrame,
                       text_col: str = 'text', id_col: str = 'doc_id',
                       input_fingerprint: str | None = None) -> dict:
    """Publish a BM25-servable inverted index: a `postings` table
    (doc_id, token, tf, doclen) BUCKETED on token and a 1-row `stats`
    table (n_docs, total_len), both through the catalog (atomic
    publish, lineage, snapshot history).

    The bucketed layout is the scale lever: per-token document
    frequency aggregates WITHOUT an exchange (the groupBy key is the
    bucket key), and a large query-term batch equi-joins the postings
    with the single shuffle on the query side.  Re-publishing under a
    new fingerprint snapshots the previous index."""
    from jionlp_spark.sources import catalog

    posts = catalog.run_stage(
        spark, f'{base_path}/postings', 'text_postings',
        lambda: term_frequencies(docs, text_col, id_col),
        input_fingerprint=input_fingerprint, bucket_by=('token',))
    stats = catalog.run_stage(
        spark, f'{base_path}/stats', 'text_stats',
        lambda: docs.select(
            F.count('*').cast('long').alias('n_docs'),
            F.sum(F.size(F.split(F.col(text_col), ' ')).cast('long'))
            .alias('total_len')),
        input_fingerprint=input_fingerprint)
    return {'postings': posts, 'stats': stats}


def query_text_index(spark, base_path: str, queries: DataFrame,
                     k: int = 10, id_col: str = 'doc_id') -> DataFrame:
    """BM25 top-k against a published inverted index: identical scoring
    to bm25_topk (same trees, same decimal sums) but the corpus side is
    a bucketed postings scan — nothing corpus-sized is recomputed."""
    from pyspark.sql.window import Window

    from jionlp_spark.sources import catalog

    tf = catalog.read_table(spark, f'{base_path}/postings')
    scalars = catalog.read_table(spark, f'{base_path}/stats')
    # the query-term table feeds three joins — checkpoint the tiny rows
    # so its (possibly corpus-sized) derivation runs once; the postings
    # scans stay LAZY on purpose: they are bucketed (exchange-free) and
    # a checkpoint would erase the bucket info the plan guard pins
    queries = queries.localCheckpoint(eager=False)
    posts = tf.join(F.broadcast(queries.select('token').distinct()),
                    'token')
    df_tbl = (posts.groupBy('token')
              .agg(F.count('*').cast('long').alias('df')))
    part = _BM25_PART.format(N='n_docs', total_len='total_len')
    parts = (posts.join(F.broadcast(queries), 'token')
             .filter(F.col('qid') != F.col(id_col))
             .join(F.broadcast(df_tbl), 'token')
             .crossJoin(F.broadcast(scalars))
             .select('qid', id_col, F.expr(part).alias('part')))
    scored = (parts.groupBy('qid', id_col)
              .agg(F.sum(F.col('part').cast('string')
                         .cast('decimal(38,18)'))
                   .cast('string').cast('double').alias('score')))
    w = Window.partitionBy('qid').orderBy(F.desc('score'), F.col(id_col))
    return (scored.withColumn('_rn', F.row_number().over(w))
            .filter(F.col('_rn') <= k).drop('_rn'))


def extend_text_index(spark, base_path: str, new_docs: DataFrame,
                      batch_id: str, text_col: str = 'text',
                      id_col: str = 'doc_id') -> dict:
    """Append a NEW document batch to a published inverted index
    without re-tokenizing history: the batch's posting rows
    (term_frequencies over the batch only — per-doc computation, so
    batch postings ∪ stored postings ≡ from-scratch postings) union
    into the bucketed table, and the corpus scalars advance by the
    batch's exact bigint counts.  O(batch) per day; the batch_id
    fingerprint makes a re-publish a no-op (both stages share it, so
    postings and stats can never drift apart).  Assumes batch doc ids
    are new — same contract as extend_ann_index."""
    from jionlp_spark.sources import catalog

    posts = catalog.read_table(spark, f'{base_path}/postings')
    new_tf = term_frequencies(new_docs, text_col, id_col)
    updated = posts.union(new_tf.select(*posts.columns))
    posts = catalog.run_stage(
        spark, f'{base_path}/postings', 'text_postings',
        lambda: updated, input_fingerprint=batch_id,
        bucket_by=('token',))

    old = catalog.read_table(spark, f'{base_path}/stats')
    batch = new_docs.select(
        F.count('*').cast('long').alias('_n'),
        F.sum(F.size(F.split(F.col(text_col), ' ')).cast('long'))
        .alias('_len'))
    merged = (old.crossJoin(batch)
              .select((F.col('n_docs') + F.col('_n')).alias('n_docs'),
                      (F.col('total_len') + F.col('_len'))
                      .alias('total_len')))
    stats = catalog.run_stage(
        spark, f'{base_path}/stats', 'text_stats',
        lambda: merged, input_fingerprint=batch_id)
    return {'postings': posts, 'stats': stats}


# ---------------------------------------------------------------------------
# hybrid retrieval — reciprocal rank fusion of the sparse (BM25) and
# dense (cosine) rankings: rrf(d) = Σ_lists 1/(C + rank_d), C = 60
# (Cormack et al. 2009).  Rank fusion is the production pattern for
# combining lexical and embedding retrieval without score calibration —
# only the integer RANKS cross the seam, so the fused score is exactly
# reproducible however each list was scored.

def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame, k: int = 10,
             c: int = 60, id_col: str = 'doc_id') -> DataFrame:
    """Fuse two (qid, id, rank) lists: (qid, id, rrf) top-k.

    rrf = 1/(C+rank_a) + 1/(C+rank_b), each term 0 when the doc is
    absent from that list — ONE per-row double tree in fixed a-then-b
    order (bit-identical across engines; no cross-row float addition),
    ties broken by id.  The join is rank-list-sized (q·depth rows),
    never corpus-sized."""
    from pyspark.sql.window import Window
    a = ranked_a.select('qid', id_col, F.col('rank').alias('_ra'))
    b = ranked_b.select('qid', id_col, F.col('rank').alias('_rb'))
    fused = (a.join(b, ['qid', id_col], 'full_outer')
             .select('qid', id_col,
                     (F.coalesce(
                         F.lit(1.0) / (F.lit(float(c)) +
                                       F.col('_ra').cast('double')),
                         F.lit(0.0))
                      + F.coalesce(
                         F.lit(1.0) / (F.lit(float(c)) +
                                       F.col('_rb').cast('double')),
                         F.lit(0.0))).alias('rrf')))
    w = Window.partitionBy('qid').orderBy(F.desc('rrf'), F.col(id_col))
    return (fused.withColumn('_rn', F.row_number().over(w))
            .filter(F.col('_rn') <= k).drop('_rn'))


def _with_rank(topk: DataFrame, score_col: str,
               id_col: str) -> DataFrame:
    """Attach 1-based ranks to a top-k list under the list's own
    (score desc, id) total order."""
    from pyspark.sql.window import Window
    w = Window.partitionBy('qid').orderBy(F.desc(score_col), F.col(id_col))
    return topk.withColumn('rank', F.row_number().over(w))


def hybrid_topk(docs: DataFrame, emb: DataFrame, k: int = 10,
                depth: int = 20, n_queries: int = 3, n_terms: int = 4,
                text_col: str = 'text') -> DataFrame:
    """Hybrid top-k over a corpus with aligned doc_id/vec_id: BM25
    depth-20 (more-like-this queries from docs < n_queries) fused with
    exact-cosine depth-20 (the same ids as embedding queries) by RRF.
    Each branch is the already-certified operator; only integer ranks
    meet at the fusion join."""
    from jionlp_spark.operators.ann import brute_force_topk
    # both rank lists are q·depth rows feeding a full-outer join (two
    # consumers of each side's corpus subtree) — checkpoint them so the
    # fusion plan starts from 120 rows, not two corpus pipelines
    sparse = _with_rank(
        bm25_topk(docs, n_queries=n_queries, n_terms=n_terms, k=depth,
                  text_col=text_col),
        'score', 'doc_id').localCheckpoint(eager=False)
    dense_q = emb.filter(F.col('vec_id') < n_queries).select(
        F.col('vec_id').alias('qid'), F.col('embedding').alias('qe'))
    dense = _with_rank(
        brute_force_topk(emb, dense_q, k=depth)
        .withColumnRenamed('vec_id', 'doc_id'),
        'cos', 'doc_id').localCheckpoint(eager=False)
    return rrf_fuse(sparse, dense, k=k)
