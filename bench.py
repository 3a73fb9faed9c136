"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the end-to-end KG
pipeline over the deterministic synthetic page corpus, and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" {name: sec}, "sf",
plus informational throughput extras}.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
scripts/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
# pages for the e2e pipeline benchmark; ~4 pages per lineitem-scale 'row
# unit'.  40k amortizes fixed per-job overhead to <10% of a run at
# local[32] (20k runs were ~35% overhead, understating throughput vs the
# 160k-page BASELINE.md measurement).
N_PAGES = int(os.environ.get('BENCH_PAGES', '40000'))

HEADLINE = [
    'kg_extract_phone', 'kg_extract_money', 'kg_extract_time',
    'kg_link_phone_geo', 'kg_link_idcard_region', 'kg_link_location',
    'kg_entity_counts', 'clean_text', 'sentence_split', 'doc_stats',
    'word_freq_by_source', 'token_idf', 'bigram_pmi', 'lang_id_eval',
    'quality_score', 'dedup_exact', 'dedup_minhash_sig', 'dedup_lsh_pairs',
    'dedup_simhash_pairs', 'dedup_jaccard_pairs', 'ann_cosine_topk',
    'ann_ivf_topk', 'multimodal_features', 'events_daily',
    'norm_tra2sim', 'norm_stopwords', 'norm_money_num2char',
    'norm_pinyin_radical', 'kg_link_plate', 'kg_check_person',
    'sentiment_score', 'keyphrase_topk', 'summary_top_sentence',
    'new_word_scores', 'bpe_byte_codec', 'kg_location_town',
    'kg_mentions_bioes', 'tpch_pricing_summary', 'tpch_top_orders',
    'textaug_swap', 'idiom_next', 'dedup_embedding_pairs', 'ann_lsh_topk',
    'doc_fingerprint',
    'token_counts', 'multimodal_frames',
    # round 3 additions
    'kg_extract_email', 'kg_extract_url', 'kg_extract_wechat',
    'kg_extract_qq', 'kg_extract_ip', 'clean_html',
    'dedup_simhash_wide_pairs', 'kg_recognize_location',
    'kg_redact', 'kg_parentheses', 'kg_char_checks', 'norm_lunar_solar',
    'cws_tags', 'streaming_dedup', 'streaming_window_counts', 'doc_winnow',
    'dedup_winnow_pairs', 'kg_span_f1', 'catalog_roundtrip',
    'dataset_split_stats', 'quality_keyword_filter', 'kg_entity_compare', 'ner_dataset_stats',
    # round 4 additions
    'kg_entity_counts_skew', 'keyphrase_topk_topic', 'summary_top_topic',
    'streaming_state_bounded', 'textaug_homophone', 'mellm_scores',
    'textaug_backtrans', 'kg_recognize_location_full',
    # round 5 additions (+ two queries that had never been benched)
    'dedup_cluster_keep', 'dedup_incremental', 'kg_cooccurrence',
    'streaming_lsh_pairs', 'source_roundtrip',
    'lang_distribution', 'kg_extract_idcard',
    # round 6 additions
    'streaming_to_incremental', 'curate_corpus', 'ann_index_topk',
    'incremental_curate', 'ann_index_extend', 'decontam_report',
    'lm_perplexity', 'kg_entity_pagerank', 'training_mix',
    'repetition_filters',
    # late round-6 additions
    'kg_edge_pmi', 'kg_edge_confidence', 'dsir_weights', 'semdedup_keep',
    'streaming_curate', 'length_quantiles', 'pack_plan',
    'kg_entity_similarity', 'kg_entity_canon', 'leakage_safe_split',
    'dedup_substring_spans', 'entity_bursts', 'event_sessions',
    'window_perplexity', 'kg_triangles', 'kg_link_predict',
    'vocab_coverage', 'ccnet_buckets', 'kg_entity_profiles',
    'substring_dup_rate', 'event_winsorized', 'streaming_sessions',
    'web_link_graph', 'web_host_pagerank', 'web_anchor_stats',
    'hll_token_distinct', 'cms_heavy_hitters', 'kg_kcore',
    'ann_pq_topk', 'bm25_topk', 'web_url_dedup', 'bm25_index_topk',
    'bm25_index_extend', 'hybrid_topk', 'web_frontier_plan', 'host_curation',
    'pq_index_extend', 'streaming_url_dedup', 'catalog_snapshot_diff',
    'lm_stupid_backoff', 'web_random_walks', 'web_mirror_pairs',
    'bloom_seen_tokens', 'web_robots_filter', 'kg_entity_types',
    'dedup_paragraphs', 'kg_entity_timeline', 'catalog_recrawl_plan',
    'web_url_templates', 'web_frontier_pipeline', 'multimodal_audio',
    'kg_negative_samples', 'kg_transe_scores', 'web_host_hits',
    'kg_entity_salience', 'dedup_containment_pairs',
    'web_sitemap_urls', 'web_seed_ppr', 'web_content_extract',
    'quality_gopher', 'web_ingest_pipeline', 'kg_edges_extend',
    # round-6 close additions
    'pack_plan_bfd', 'web_sitemap_discover', 'streaming_ingest',
    'web_robots_directives', 'web_warc_records',
    'web_discovery_bootstrap', 'web_warc_ingest',
    'web_politeness_schedule', 'web_cdx_index',
    'web_robots_wildcard', 'web_redirect_resolve',
    'web_canonical_map',
    # round-7 additions
    'event_asof_features', 'training_shards', 'kg_pagerank_warm',
    'kg_neighbor_agg', 'shard_manifest', 'fuzzy_decontam',
    'training_mix_weights', 'dsir_resample', 'cluster_mix',
    'epoch_expansion',
    # round-7 session-2 additions (KG fusion tier + classifier filter)
    'kg_schema_stats', 'kg_conflicts', 'kg_closure', 'kg_disambiguate',
    'kg_typecheck', 'quality_logit', 'streaming_conflicts',
    'kg_fact_intervals', 'kg_align', 'kg_rule_mining', 'kg_rule_infer',
    'kg_truth_discovery', 'streaming_fact_intervals', 'kg_align_iterated',
    'kg_rule_mining3',
]


def main() -> None:
    from jionlp_spark.config import get_spark
    spark = get_spark('bench', master=f'local[{CPUS}]',
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel('ERROR')

    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()

    timings: dict = {}
    total = 0.0

    # ---- end-to-end KG pipeline ------------------------------------------
    from jionlp_spark.plans.pipeline import run_pipeline
    from jionlp_spark.sources.pages import generate_pages

    # warmup: spin up JVM stages + the full Python UDF worker pool once
    # (measurement protocol in BASELINE.md discards the cold run).  2048
    # pages ≥ one Arrow batch per core, so every worker in the pool is
    # warm — a 512-page warmup left most of local[32]'s workers cold and
    # the first measured run paid their startup.
    run_pipeline(spark, generate_pages(spark, 2048))['triples'].count()

    # best-of-3 e2e / best-of-2 per query: this box is shared and
    # neighbor load arrives in multi-minute waves (protocol in
    # BENCH/PLANS.md); the min of the warm runs is the throughput the
    # plan actually delivers.  Per-row load context (r4 verdict item 2):
    # every row records its runs AND the 1-min load before each, so a
    # reader rejects load-contaminated rows from the artifact alone.
    query_runs: dict = {}
    query_load: dict = {}

    # Materialize the input corpus once, as its own reported row — the
    # measured e2e job is read→triples, the SAME protocol BASELINE.md
    # and scripts/scaling_bench.py use (a production pipeline reads an
    # existing table; synthesizing pages inside the timed section was
    # charging corpus generation to the pipeline).
    from jionlp_spark.sources.pages import write_pages
    pages_path = f'/tmp/bench_pages_{N_PAGES}_p256'
    t0 = time.time()
    if not os.path.exists(pages_path):
        # pid-suffixed staging: concurrent bench processes must not race
        # on one .tmp dir; the rename publish is atomic, losers ignore
        tmp = f'{pages_path}.tmp{os.getpid()}'
        write_pages(spark, tmp, N_PAGES, num_partitions=256)
        try:
            os.rename(tmp, pages_path)
        except OSError:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    timings['e2e_corpus_materialize'] = round(time.time() - t0, 3)
    query_runs['e2e_corpus_materialize'] = [timings['e2e_corpus_materialize']]
    query_load['e2e_corpus_materialize'] = [round(os.getloadavg()[0], 2)]
    total += timings['e2e_corpus_materialize']

    e2e_runs, e2e_load = [], []
    for _ in range(3):
        e2e_load.append(round(os.getloadavg()[0], 2))
        t0 = time.time()
        res = run_pipeline(spark, spark.read.parquet(pages_path))
        n_triples = res['triples'].count()
        e2e_runs.append(time.time() - t0)
    e2e = min(e2e_runs)
    timings['kg_pipeline_e2e'] = round(e2e, 3)
    query_runs['kg_pipeline_e2e'] = [round(t, 3) for t in e2e_runs]
    query_load['kg_pipeline_e2e'] = e2e_load
    total += e2e

    # ---- e2e at the BASELINE.md scale (r6 verdict #4) ---------------------
    # The 40k-page e2e above carries ~1.5-2 s of fixed session overhead
    # that BASELINE.md's 160k-page figure has amortized away — reading
    # only the driver artifact at 40k misreads a 0.74× "regression".
    # Measure BOTH scales and label them; best-of-2 here (the row costs
    # ~4× the 40k one).  BENCH_BASELINE_PAGES=0 disables.
    BASELINE_PAGES = int(os.environ.get('BENCH_BASELINE_PAGES', '160000'))
    baseline_e2e = baseline_triples = None
    if BASELINE_PAGES and BASELINE_PAGES != N_PAGES:
        bp_path = f'/tmp/bench_pages_{BASELINE_PAGES}_p256'
        t0 = time.time()
        if not os.path.exists(bp_path):
            tmp = f'{bp_path}.tmp{os.getpid()}'
            write_pages(spark, tmp, BASELINE_PAGES, num_partitions=256)
            try:
                os.rename(tmp, bp_path)
            except OSError:
                import shutil
                shutil.rmtree(tmp, ignore_errors=True)
        timings['e2e_baseline_corpus_materialize'] = \
            round(time.time() - t0, 3)
        query_runs['e2e_baseline_corpus_materialize'] = \
            [timings['e2e_baseline_corpus_materialize']]
        query_load['e2e_baseline_corpus_materialize'] = \
            [round(os.getloadavg()[0], 2)]
        total += timings['e2e_baseline_corpus_materialize']
        b_runs, b_load = [], []
        for _ in range(2):
            b_load.append(round(os.getloadavg()[0], 2))
            t0 = time.time()
            bres = run_pipeline(spark, spark.read.parquet(bp_path))
            baseline_triples = bres['triples'].count()
            b_runs.append(time.time() - t0)
        baseline_e2e = min(b_runs)
        timings['kg_pipeline_e2e_baseline_scale'] = round(baseline_e2e, 3)
        query_runs['kg_pipeline_e2e_baseline_scale'] = \
            [round(t, 3) for t in b_runs]
        query_load['kg_pipeline_e2e_baseline_scale'] = b_load
        total += baseline_e2e

    # ---- headline queries -------------------------------------------------
    # The kg_* family shares one cached fused-extraction pass
    # (__spark_entry__._extracted); build it HERE as an explicitly-reported
    # row so the first kg_* query measured (bench-order-dependent) doesn't
    # silently absorb the whole corpus extraction cost.  Same for the IVF
    # centroid training pass (r4 verdict item 3): the `ann_ivf_topk` row
    # should measure bucket-join + verify, not k-means.
    for row_name, warm in (
            ('shared_extraction_cache_build',
             lambda: [getattr(entry_mod, f)(spark, SF_DIR).count()
                      for f in ('_extracted', '_extracted_qq_ip')]),
            ('ann_ivf_centroid_train',
             lambda: entry_mod._ivf_centroids(spark, SF_DIR).count()),
            ('ann_pq_codebook_train',
             lambda: entry_mod._pq_codebooks(spark, SF_DIR).count()),
            ('topic_prominence_build',
             lambda: entry_mod._topic_prominence(spark, SF_DIR).count())):
        query_load[row_name] = [round(os.getloadavg()[0], 2)]
        t0 = time.time()
        warm()
        dt = time.time() - t0
        timings[row_name] = round(dt, 3)
        query_runs[row_name] = [round(dt, 3)]
        total += dt

    # best-of-2 per query, both runs + per-run load recorded: the min of
    # two warm runs is the throughput the plan delivers; a reader compares
    # runs (and their loads) to tell neighbor load from plan cost.
    # Every plan is digest-forced: a bare count() lets Catalyst prune
    # value columns that don't change cardinality (pure per-group
    # aggregates, unused windows — countDistinct/score trees vanish and
    # the timing measures a gutted plan; the CLAUDE.md count-pruning
    # rule).  The data-dependent filter makes the row count depend on
    # every column; md5+json per OUTPUT row is a small uniform cost.
    from pyspark.sql import functions as _F

    def _force_full(df):
        return (df.withColumn('__d', _F.md5(_F.to_json(_F.struct('*'))))
                .filter(_F.col('__d') >= '0'))

    for name in HEADLINE:
        fn = qs[name]
        runs, loads = [], []
        for _ in range(2):
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.time()
            n = _force_full(fn(spark, SF_DIR)).count()
            runs.append(time.time() - t0)
        dt = min(runs)
        timings[name] = round(dt, 3)
        query_runs[name] = [round(t, 3) for t in runs]
        query_load[name] = loads
        total += dt
        _ = n

    out = {
        'metric': 'kg_e2e_plus_headline_queries',
        'value': round(total, 3),
        'unit': 'sec',
        'queries': timings,
        'sf': SF_DIR.rstrip('/').rsplit('sf', 1)[-1],
        'pages': N_PAGES,
        'triples': n_triples,
        'triples_per_sec': round(n_triples / e2e, 1),
        'pages_per_sec': round(N_PAGES / e2e, 1),
        'e2e_runs': [round(t, 3) for t in e2e_runs],
        'query_runs': query_runs,
        'query_load': query_load,
        'cpus': CPUS,
    }
    if baseline_e2e is not None:
        out['baseline_scale'] = {
            'pages': BASELINE_PAGES,
            'e2e_sec': round(baseline_e2e, 3),
            'triples': baseline_triples,
            'triples_per_sec': round(baseline_triples / baseline_e2e, 1),
            'pages_per_sec': round(BASELINE_PAGES / baseline_e2e, 1),
        }
    print(json.dumps(out))
    # Persist the full record in-repo too — stdout is not the system of
    # record for the per-run detail.
    try:
        os.makedirs('BENCH', exist_ok=True)
        with open('BENCH/bench_last.json', 'w') as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass

    # Compact summary printed LAST: the driver keeps only the final 2000
    # chars of stdout and can parse the last line only when it is complete
    # inside that window (rounds 3-5 lost their headline numbers because
    # the single detail line outgrew it).  Keep this line under 1900
    # chars: every scalar, then per-query times sorted descending; if the
    # full dict doesn't fit, fold the cheapest rows into
    # queries_omitted {n, total_sec, max_sec} — every omitted query is
    # bounded above by the smallest listed time, so nothing slow can hide.
    ordered = sorted(timings.items(), key=lambda kv: -kv[1])
    kept = {k: round(v, 2) for k, v in ordered}
    while True:
        compact = {
            'metric': 'kg_e2e_plus_headline_queries',
            'value': round(total, 3),
            'unit': 'sec',
            'sf': out['sf'],
            'pages': N_PAGES,
            'triples': n_triples,
            'triples_per_sec': out['triples_per_sec'],
            'pages_per_sec': out['pages_per_sec'],
            'e2e_sec': round(e2e, 3),
            'cpus': CPUS,
            'n_queries': len(timings),
            'queries': kept,
        }
        if baseline_e2e is not None:
            # the BASELINE.md-scale figure, labeled — the 40k-page e2e
            # above carries fixed session overhead this one amortizes
            compact['baseline_pages'] = BASELINE_PAGES
            compact['baseline_e2e_sec'] = round(baseline_e2e, 3)
            compact['baseline_triples_per_sec'] = \
                round(baseline_triples / baseline_e2e, 1)
        if len(kept) < len(timings):
            omitted = [v for k, v in ordered if k not in kept]
            compact['queries_omitted'] = {
                'n': len(omitted),
                'total_sec': round(sum(omitted), 2),
                'max_sec': round(max(omitted), 2),
            }
        line = json.dumps(compact, separators=(',', ':'))
        if len(line) <= 1900 or len(kept) <= 1:
            break
        kept.pop(next(reversed(kept)))
    print(line)
    spark.stop()


if __name__ == '__main__':
    main()
